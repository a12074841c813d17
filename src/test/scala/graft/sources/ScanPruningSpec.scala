package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Scan-side pruning beyond directory partitioning — the two
  * mechanisms that decide how much of a 100 TB table a selective
  * query actually reads:
  *
  *  - row-group skipping: a range-sorted layout gives each parquet row
  *    group a narrow min/max key span, so a pushed-down range filter
  *    skips groups wholesale (PartitioningSpec covers the coarser
  *    file/directory level);
  *  - runtime bloom filters: a selective dimension filter is turned
  *    into a bloom-filter predicate on the fact side BEFORE the join
  *    shuffle, so non-joining fact rows never enter the exchange.
  */
class ScanPruningSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  /** Rows the parquet reader materialized (scan output AFTER row-group
    * skipping, BEFORE Spark's re-applied filter). */
  private def scanOutputRows(df: DataFrame): Long = {
    // collect() runs THIS QueryExecution (count() would plan a new
    // one, leaving these metrics untouched)
    df.collect()
    val scan = (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).collect { case s: FileSourceScanExec => s }.head
    scan.metrics("numOutputRows").value
  }

  test("range-sorted layout: pushed range filter skips row groups; shuffled layout reads everything") {
    val base = Files.createTempDirectory("layout").toString
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity", "l_extendedprice")

    // 64 KB row groups stand in for 128 MB ones at sf0.01 — what
    // matters is MANY groups per file, each spanning a narrow
    // (sorted) vs full (shuffled) key range
    Bucketing.writeRangeSorted(li, s"$base/sorted", Seq("l_orderkey"),
      numFiles = 4, rowGroupBytes = 64L << 10)
    li.repartition(4) // round-robin: every file+group spans the whole key range
      .write.option("parquet.block.size", 64L << 10).parquet(s"$base/shuffled")

    val total = li.count()
    val pred = col("l_orderkey").between(10000, 10500)
    val sortedRows = scanOutputRows(spark.read.parquet(s"$base/sorted").filter(pred))
    val shuffledRows = scanOutputRows(spark.read.parquet(s"$base/shuffled").filter(pred))

    assert(sortedRows < total / 4,
      s"sorted layout must skip most row groups: scanned $sortedRows of $total")
    assert(sortedRows < shuffledRows,
      s"sorted scan ($sortedRows) must read fewer rows than shuffled ($shuffledRows)")
    // identical answers either way
    val a = spark.read.parquet(s"$base/sorted").filter(pred).count()
    val b = spark.read.parquet(s"$base/shuffled").filter(pred).count()
    assert(a == b)
  }

  test("runtime bloom filter: selective dim filter prunes the fact scan before the join shuffle") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      // force a shuffle join (bloom injection targets the pre-shuffle
      // scan) and drop the size thresholds that gate it at toy scale
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")

      val orders = Tables.orders(spark, sf)
        .filter(col("o_orderstatus") === "P") // selective creation side
        .select("o_orderkey", "o_totalprice")
      val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      val joined = li.join(orders, col("l_orderkey") === col("o_orderkey"))

      val withBloom = joined.queryExecution.optimizedPlan.toString
      assert(withBloom.contains("might_contain") &&
             withBloom.contains("bloom_filter_agg"),
        s"expected a runtime bloom filter on the fact side:\n$withBloom")

      // the filter is a pure optimization — result must be unchanged
      val expected = {
        conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "10GB")
        val e = li.join(orders, col("l_orderkey") === col("o_orderkey")).count()
        conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
        e
      }
      assert(joined.count() == expected)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
