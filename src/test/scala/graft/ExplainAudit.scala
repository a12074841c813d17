package graft

import org.apache.spark.sql.SparkSession

/** Plan audit tool (test scope):
  * `sbt "Test/runMain graft.ExplainAudit [query ...]"` prints the
  * formatted physical plan of each named gate query (default: all of
  * them) over sf0.01 — the ".explain and iterate" loop the engine's
  * operators are held to: pushed filters reach the scan, ReadSchema is
  * pruned to the referenced columns, no unexpected exchange, codegen
  * spans cover the hot path. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    for (n <- names) {
      println(s"\n===================== $n =====================")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
      graft.util.CacheScope.sweep(spark)
    }
    spark.stop()
  }
}
