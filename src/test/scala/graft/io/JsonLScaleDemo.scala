package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Ingestion-at-scale check for the JSONL quarantine source (test
  * scope): `sbt "Test/runMain graft.io.JsonLScaleDemo [lines]"`
  * generates a dirty crawl file (default 100k lines, exactly 1%
  * deterministically corrupted), runs [[JsonL.sourceWithQuarantine]],
  * and prints throughput plus the split counts. The claims under test:
  * the exactly-once split holds at volume (good + corrupt == input
  * lines — FAILFAST would have killed the job at the first bad line,
  * DROPMALFORMED would have silently lost 1% of the crawl), the
  * quarantine dir round-trips through its own JSONL sink (repair jobs
  * can read their input), and parse throughput is wide-scan bound, not
  * per-row-overhead bound. Results are recorded in STATUS.md the way
  * ProbeScaleDemo's probe curve is. */
object JsonLScaleDemo {
  def main(args: Array[String]): Unit = {
    val lines = if (args.length > 0) args(0).toInt else 100000
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic dirty crawl: every 100th line (i % 100 == 7) is a
    // truncated JSON object — the shape a died-mid-write crawler leaves
    val work = java.nio.file.Files.createTempDirectory("jsonl-scale")
    val input = work.resolve("crawl.jsonl")
    val w = java.nio.file.Files.newBufferedWriter(input)
    try {
      (0 until lines).foreach { i =>
        if (i % 100 == 7) w.write(s"""{"doc_id": $i, "text": "truncated""")
        else {
          val words = (0 until 20).map(j => s"w${(i * 31 + j * 7) % 9973}")
          w.write(s"""{"doc_id": $i, "text": "${words.mkString(" ")}"}""")
        }
        w.newLine()
      }
    } finally w.close()
    val expectedCorrupt = (0 until lines).count(_ % 100 == 7)

    val schema = new StructType()
      .add("doc_id", LongType).add("text", StringType)
    val scope = graft.util.CacheScope()
    try {
      val t0 = System.nanoTime()
      val in = JsonL.sourceWithQuarantine(
        spark, input.toString, schema, scope)
      val good = in.good.count()
      val corrupt = in.corrupt.count()
      val parseSec = (System.nanoTime() - t0) / 1e9
      require(good + corrupt == lines.toLong,
        s"exactly-once split broken: $good + $corrupt != $lines")
      require(corrupt == expectedCorrupt.toLong,
        s"quarantine must catch exactly the corrupted lines: " +
          s"$corrupt != $expectedCorrupt")

      // quarantine round-trip: the repair job must be able to read its
      // own input back (RawCol, not the reader-internal corrupt column)
      val qDir = s"$work/quarantine"
      JsonL.sink(in.corrupt, qDir)
      val reread = spark.read.text(qDir).count()

      println(f"[jsonlscale] lines=$lines good=$good corrupt=$corrupt " +
        f"quarantineReread=$reread parseSec=$parseSec%.2f " +
        f"linesPerSec=${lines / parseSec}%.0f")
    } finally scope.unpersistAll()
    spark.stop()
  }
}
