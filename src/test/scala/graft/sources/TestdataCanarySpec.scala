package graft.sources

import graft.SparkSpec

/** Testdata-encoding canary (VERDICT r10 item 2). The driver regenerates
  * `/root/testdata` between rounds and has already switched physical
  * encodings once (events.ts: TIMESTAMP(NANOS) → timestamp[us], Aug 13),
  * which silently dropped 14 gate queries at round end. This suite opens
  * every table at every SF through the `Tables` readers and asserts the
  * schema analyzes — one footer read each, no Spark jobs — so an
  * encoding change fails loudly at round START instead.
  */
class TestdataCanarySpec extends SparkSpec {

  private val sfDirs = Seq(
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1")

  private val readers: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
    "region"     -> Tables.region _,
    "nation"     -> Tables.nation _,
    "customer"   -> Tables.customer _,
    "supplier"   -> Tables.supplier _,
    "part"       -> Tables.part _,
    "orders"     -> Tables.orders _,
    "lineitem"   -> Tables.lineitem _,
    "events"     -> Tables.events _,
    "documents"  -> Tables.documents _,
    "embeddings" -> Tables.embeddings _)

  for (dir <- sfDirs; name <- Tables.all) {
    test(s"$name analyzes at $dir") {
      val df = readers(name)(spark, dir)
      // .schema forces analysis (footer read + any withColumn rewrites);
      // an encoding the reader can't handle throws here, loudly.
      assert(df.schema.fields.nonEmpty, s"$name at $dir: empty schema")
    }
  }

  test("events.ts surfaces as a timestamp type under either encoding") {
    for (dir <- sfDirs) {
      val ts = Tables.events(spark, dir).schema.fields.find(_.name == "ts")
      assert(ts.isDefined, s"$dir: events has no ts column")
      val tn = ts.get.dataType.typeName
      assert(tn.startsWith("timestamp"),
        s"$dir: events.ts analyzed as $tn, expected a timestamp type")
    }
  }

  test("events reader does not leak nanosAsLong into the session (modern encoding)") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val before = spark.conf.getOption(key)
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    val tsIsTimestamp =
      df.schema.fields.find(_.name == "ts").exists(_.dataType.typeName.startsWith("timestamp"))
    val after = spark.conf.getOption(key)
    // On the modern (timestamp[us]) encoding the conf must be restored;
    // on the legacy nanos encoding it must stay set (execution-time need)
    // — in that case this test only checks the read still analyzes.
    if (tsIsTimestamp && !df.queryExecution.analyzed.toString.contains("timestamp_micros"))
      assert(after == before, s"conf leaked: before=$before after=$after")
  }
}
