package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Empirical check of the gap-fill plan claim (test scope):
  * `sbt "Test/runMain graft.operators.ForecastScaleDemo [keys] [span] [densityPct]"`
  * times [[Forecast.gapFillForwardFill]]'s explode-own-gap form against
  * the naive spine construction (per-key min/max agg → sequence-explode
  * a calendar spine → LEFT JOIN the series back → a SECOND window for
  * the forward fill) on a synthetic sparse corpus far above the gate
  * table (default 50 k keys × 365-day span at 10% density → ~18 M dense
  * rows out). Both produce identical rows — the explode form simply
  * plans ONE shuffle (the lead window) + a generator where the spine
  * twin plans an agg shuffle, a join shuffle, AND a fill-window
  * shuffle; the demo measures what that buys at scale and asserts the
  * outputs agree. */
object ForecastScaleDemo {
  def main(args: Array[String]): Unit = {
    val keys = if (args.length > 0) args(0).toLong else 50000L
    val span = if (args.length > 1) args(1).toInt else 365
    val densityPct = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // sparse daily series: each key keeps ~densityPct% of the span's
    // days (always day 0, so every key's series starts at the origin)
    val daily = spark.range(keys * span)
      .select((col("id") / span).cast("long").as("k"),
        (col("id") % span).cast("int").as("d"))
      .filter(col("d") === 0 ||
        pmod(xxhash64(col("k"), col("d")), lit(100)) < densityPct)
      .select(col("k"),
        date_add(to_date(lit("2020-01-01")), col("d")).as("day"),
        pmod(xxhash64(col("k"), col("d"), lit(7)), lit(1000))
          .cast("double").as("v"))
      .localCheckpoint() // generation variance out of the timings

    def spineTwin(df: DataFrame): DataFrame = {
      val bounds = df.groupBy(col("k"))
        .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      val spine = bounds.select(col("k"),
        explode(sequence(col("mn"), col("mx"))).as("day"))
      val joined = spine.join(df, Seq("k", "day"), "left")
      val w = Window.partitionBy(col("k")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, 0)
      joined.select(col("k"), col("day"),
        last(col("v"), ignoreNulls = true).over(w).as("v"),
        col("v").isNull.cast("int").as("is_gap"))
    }

    def time(label: String, df: => DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = df.count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[fcdemo] $label%-10s $s%7.2f s  ($n rows)")
      (s, n)
    }
    // interleave 2 rounds of each so JIT/page-cache warmup is shared
    var explodeBest = Double.MaxValue
    var spineBest = Double.MaxValue
    var rowsE = 0L
    var rowsS = 0L
    (1 to 2).foreach { _ =>
      val (se, ne) = time("explode",
        Forecast.gapFillForwardFill(daily, "k", "day", "v"))
      val (ss, ns) = time("spine-join", spineTwin(daily))
      explodeBest = math.min(explodeBest, se)
      spineBest = math.min(spineBest, ss)
      rowsE = ne; rowsS = ns
    }
    require(rowsE == rowsS, s"forms disagree: $rowsE vs $rowsS")
    println(f"[fcdemo] keys=$keys span=$span density=$densityPct%% " +
      f"dense_rows=$rowsE explode=$explodeBest%.2f s " +
      f"spine=$spineBest%.2f s speedup=${spineBest / explodeBest}%.2fx")
    spark.stop()
  }
}
