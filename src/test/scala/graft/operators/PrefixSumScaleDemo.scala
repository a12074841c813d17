package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical check of the r14 prefix-sum migration's scale claim
  * (test scope):
  * `sbt "Test/runMain graft.operators.PrefixSumScaleDemo [nKeys]"`
  * runs [[Retail.abcClassification]] (now on
  * [[Relational.chunkedPrefixSum]]) against its pre-migration
  * global-window form over a synthetic catalog far above the gate's
  * ~20 k keys (default 10 M — the 10⁷+ item cardinality the r13
  * verdict named as the scale killer). The chunked form's cumulative
  * work spreads across range partitions (every window bounded at one
  * shuffle partition / the chunk-summary frame); the window form
  * moves ALL keys to ONE task. Both produce identical rows
  * (spot-compared on a deterministic sample) — the demo measures the
  * shape difference the migration exists to deliver.
  *
  * Revenue values are deterministic (hash-mixed, near-unique — the
  * no-tie worst case for the sort), so reruns time the same work.
  */
object PrefixSumScaleDemo {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.DataFrame
    val items = spark.range(n).select(col("id").as("key"),
      (pmod(xxhash64(col("id")), lit(1000000L)).cast("double") / 100.0
        + 1.0).as("amt"))
      .localCheckpoint() // generation variance out of the timings
    def time(label: String)(df: => DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      val out = df
      out.write.format("noop").mode("overwrite").save()
      println(f"[pfxdemo] $label%-10s ${(System.nanoTime() - t0) / 1e9}%.1f s")
      out
    }
    val chunked = time("chunked") {
      Retail.abcClassification(items, "key", "amt")
    }
    // the pre-migration shape, inlined: one global cumulative window
    // over the ranked catalog (single task by construction)
    val windowed = time("window") {
      val dec = org.apache.spark.sql.types.DecimalType(28, 2)
      val stable = org.apache.spark.sql.types.DecimalType(18, 8)
      val perKey = items.groupBy(col("key"))
        .agg(sum(col("amt").cast(dec)).as("revenue"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("revenue").desc, col("key"))
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val tot = org.apache.spark.sql.expressions.Window.partitionBy()
      val share = round((sum(col("revenue")).over(w).cast("double")
        / sum(col("revenue")).over(tot).cast("double")).cast(stable), 6)
      perKey.select(col("key"),
        round(col("revenue").cast("double"), 2).as("revenue"),
        share.cast("double").as("cum_share"),
        when(share <= 0.8, "A").when(share <= 0.95, "B").otherwise("C")
          .as("abc_class"))
    }
    // equivalence spot-check on a deterministic key sample
    val sample = (0L until 1000L).map(i => i * (n / 1000L))
    val a = chunked.filter(col("key").isin(sample: _*))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getString(3))).toMap
    val b = windowed.filter(col("key").isin(sample: _*))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getString(3))).toMap
    require(a == b, s"chunked != window on the sample: ${
      a.toSeq.sortBy(_._1).take(3)} vs ${b.toSeq.sortBy(_._1).take(3)}")
    println(s"[pfxdemo] n=$n rows, sample of ${sample.size}: identical")
    spark.stop()
  }
}
