package graft.io

import java.nio.file.Files

import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.SparkSpec

/** JSONL ingest with quarantine: every input line lands exactly once —
  * parseable rows typed under the explicit schema, broken lines kept
  * raw for repair, nothing dropped, nothing fatal. */
class JsonLSpec extends SparkSpec {
  import spark.implicits._

  private val schema = new StructType()
    .add("doc_id", LongType).add("text", StringType)

  test("good and corrupt lines split exactly-once; corrupt keeps the raw line") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    val lines = Seq(
      """{"doc_id": 1, "text": "alpha"}""",
      """{"doc_id": 2 "text": "missing comma"}""", // malformed
      """{"doc_id": 3, "text": "gamma"}""",
      """not json at all""")
    Files.write(java.nio.file.Paths.get(dir, "part0.jsonl"),
      String.join("\n", lines: _*).getBytes("UTF-8"))

    val scope = graft.util.CacheScope()
    try {
      val in = JsonL.sourceWithQuarantine(spark, dir, schema, scope)
      val good = in.good.as[(Long, String)].collect().toSet
      assert(good == Set(1L -> "alpha", 3L -> "gamma"),
        s"typed rows must carry only parseable lines: $good")
      assert(in.good.columns.toSeq == Seq("doc_id", "text"),
        "the quarantine column must not leak into the good schema")
      assert(in.corrupt.columns.toSeq == Seq(JsonL.RawCol),
        "quarantine exposes the raw line under a re-readable name")
      val corrupt = in.corrupt.as[String].collect().toSet
      assert(corrupt == Set(lines(1), lines(3)),
        s"quarantine must keep each broken line verbatim: $corrupt")
      assert(good.size + corrupt.size == lines.size,
        "every input line lands exactly once")
    } finally scope.unpersistAll()
  }

  test("a declared _corrupt_record column in the schema is rejected") {
    val bad = schema.add(JsonL.CorruptCol, StringType)
    val e = intercept[IllegalArgumentException] {
      JsonL.sourceWithQuarantine(spark, "/nonexistent", bad,
        graft.util.CacheScope.unmanaged)
    }
    assert(e.getMessage.contains(JsonL.CorruptCol))
  }

  test("round-trip: sink then re-ingest yields the same rows, zero corrupt") {
    val dir = Files.createTempDirectory("graft-jsonl-rt").toString + "/out"
    val df = Seq((10L, "alpha beta"), (11L, "gamma delta"))
      .toDF("doc_id", "text")
    JsonL.sink(df, dir)
    val scope = graft.util.CacheScope()
    try {
      val in = JsonL.sourceWithQuarantine(spark, dir, schema, scope)
      assert(in.good.as[(Long, String)].collect().toSet ==
        Set(10L -> "alpha beta", 11L -> "gamma delta"))
      assert(in.corrupt.isEmpty)
    } finally scope.unpersistAll()
  }
}
