package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the annotation/preference tier (test scope):
  * `sbt "Test/runMain graft.operators.AnnotationScaleDemo [nComps nEnts nRatings]"`
  *
  * 1. Bradley–Terry: a synthetic preference log (default 2 M
  *    comparisons over 500 entities) through BOTH MM paths — the
  *    driver loop (pair table = bounded driver state, zero per-round
  *    jobs) and the distributed fallback — timing each and asserting
  *    identical strengths. The point measured: round cost depends on
  *    the PAIR table (≤ entities²), never the log, so the driver
  *    path's advantage is pure per-round job overhead.
  * 2. Dawid–Skene: one EM round over a synthetic rating log (default
  *    2 M ratings, 100 k items × 20 raters, 4 labels) — the expansion
  *    is ratings × labels, so wall time scales linearly in the log.
  *
  * Both logs are deterministic (hash-derived), so reruns time the
  * same work.
  */
object AnnotationScaleDemo {
  def main(args: Array[String]): Unit = {
    val nComps = if (args.length > 0) args(0).toLong else 2000000L
    val nEnts = if (args.length > 1) args(1).toInt else 500
    val nRatings = if (args.length > 2) args(2).toLong else 2000000L
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic preference log: entity pair from hash mixes,
    // winner biased toward the lower entity id (so strengths order)
    val compPath = s"/tmp/ann_demo_comps_${nComps}_$nEnts"
    spark.range(nComps).select(
        (abs(xxhash64(col("id"))) % nEnts).as("ea"),
        (abs(xxhash64(col("id") + 1000000007L)) % nEnts).as("eb"),
        (abs(xxhash64(col("id") + 2000000011L)) % 100).as("coin"))
      .filter(col("ea") =!= col("eb"))
      .select(col("ea"), col("eb"),
        // P(a wins) grows with (eb - ea): id-ordered "skill"
        (col("coin") < (lit(50) + (col("eb") - col("ea"))
          * 40 / nEnts)).as("a_won"))
      .write.mode("overwrite").parquet(compPath)
    val comps = spark.read.parquet(compPath)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val out = f
      println(f"[anndemo] $label%-14s ${(System.nanoTime() - t0) / 1e9}%.1f s")
      out
    }

    val driver = time("bt-driver") {
      Annotation.bradleyTerry(comps, col("ea"), col("eb"), col("a_won"),
        iters = 8).collect().toSeq
    }
    val dist = time("bt-distributed") {
      Annotation.bradleyTerryFromCounts(
        entsOf(comps), pairsOf(comps), iters = 8, quantDigits = 9,
        roundDigits = 6, scope = graft.util.CacheScope.unmanaged,
        maxDriverPairs = 0L).collect().toSeq
    }
    // The two paths sum the SAME terms in different orders; the 9dp
    // per-round quantize absorbs the difference except at exact
    // rounding boundaries, so agreement is within a few final-round
    // ulps — measure it rather than pretend bitwise equality (the
    // GATE's cross-engine agreement at 25 entities is exact for the
    // same reason it is here at 500: short sums, wide margins).
    val dm = driver.map(r => r.getString(0) -> r.getDouble(3)).toMap
    val xm = dist.map(r => r.getString(0) -> r.getDouble(3)).toMap
    val maxDiff = dm.keys.map(e => math.abs(dm(e) - xm(e))).max
    val exact = dm.keys.count(e => dm(e) == xm(e))
    println(f"[anndemo] paths: $exact/${dm.size} exact, " +
      f"max strength diff $maxDiff%.2e")
    require(maxDiff <= 1e-5,
      s"MM paths drifted beyond quantization tolerance: $maxDiff")

    // Dawid-Skene at log scale: 100k items x ~20 raters, 4 labels
    val ratePath = s"/tmp/ann_demo_rates_$nRatings"
    spark.range(nRatings).select(
        (col("id") % (nRatings / 20)).as("item"),
        (abs(xxhash64(col("id"))) % 20).as("rater"),
        (abs(xxhash64(col("id") + 7L)) % 4).as("lab"))
      .write.mode("overwrite").parquet(ratePath)
    val rates = spark.read.parquet(ratePath)
    val ds = time("dawid-skene") {
      val out = Annotation.dawidSkeneRound(rates, col("item"),
        col("rater"), col("lab"))
      out.write.format("noop").mode("overwrite").save()
      out
    }
    println(s"[anndemo] ds items: ${ds.count()}")
    spark.stop()
  }

  private def entsOf(comps: org.apache.spark.sql.DataFrame) = {
    val c = comps.filter(col("ea") =!= col("eb"))
      .select(col("ea").cast("string").as("__a"),
        col("eb").cast("string").as("__b"),
        col("a_won").cast("boolean").as("__w"))
    c.select(col("__a").as("__e"), col("__w").cast("long").as("__win"))
      .unionAll(c.select(col("__b").as("__e"),
        (!col("__w")).cast("long").as("__win")))
      .groupBy(col("__e"))
      .agg(sum(col("__win")).as("__wins"), count(lit(1)).as("__games"))
  }

  private def pairsOf(comps: org.apache.spark.sql.DataFrame) = {
    val c = comps.filter(col("ea") =!= col("eb"))
      .select(col("ea").cast("string").as("__a"),
        col("eb").cast("string").as("__b"),
        col("a_won").cast("boolean").as("__w"))
    c.select(col("__a").as("__e"), col("__b").as("__o"))
      .unionAll(c.select(col("__b").as("__e"), col("__a").as("__o")))
      .groupBy(col("__e"), col("__o")).agg(count(lit(1)).as("__n"))
  }
}
