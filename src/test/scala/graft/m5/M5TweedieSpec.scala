package graft.m5

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.config.YamlConfig

/** The M5 DAG under the reference's REAL objective (`full.yaml:4`
  * `objective: tweedie`) — previously a declared divergence, now routed
  * to [[graft.ml.TweedieGbt]]. Pins (a) the tweedie path end-to-end
  * through train → model save/load → predict → submission, and (b) the
  * VERDICT-r10-requested forecast-delta study vs the squared-loss
  * stand-in, so the divergence decision is measured, not silent. */
class M5TweedieSpec extends SparkSpec {

  private lazy val inputDir = {
    val d = Files.createTempDirectory("m5in-tw").toString
    MiniM5Fixture.write(d)
    d
  }

  /** `histogram = Some(b)` pins the fitter explicitly; None leaves the
    * key out, which since r13 means fromLgbParams routes tweedie to
    * the HISTOGRAM path by default. */
  private def pipeline(objective: Option[String],
      histogram: Option[Boolean] = None,
      numLeaves: Option[Int] = None,
      extra: Map[String, Object] = Map.empty): (M5Pipeline, String) = {
    val outDir = Files.createTempDirectory("m5out-tw").toString
    val base = MiniM5Fixture.config(inputDir, outDir)
    val lgb = new java.util.HashMap[String, Object](
      base("lgb_params").asInstanceOf[java.util.Map[String, Object]])
    objective.foreach { o =>
      lgb.put("objective", o)
      lgb.put("n_estimators", Int.box(8))
      lgb.put("early_stopping_rounds", Int.box(8))
      lgb.put("tweedie_variance_power", Double.box(1.1))
    }
    histogram.foreach {
      case true =>
        lgb.put("histogram", "true")
        lgb.put("min_child_samples", Int.box(5)) // mini-fixture scale
      case false =>
        lgb.put("histogram", "false") // sentinel Spark ML fitter
    }
    numLeaves.foreach(n => lgb.put("num_leaves", Int.box(n)))
    extra.foreach { case (k, v) => lgb.put(k, v) }
    val cfg = base.updated("lgb_params", lgb: Object)
    (new M5Pipeline(spark, YamlConfig.fromMap(cfg)), outDir)
  }

  test("tweedie objective runs the full DAG; forecast delta vs squared loss is measured") {
    val (tw, twOut) = pipeline(Some("tweedie"), histogram = Some(false))
    val report = tw.run(log = _ => ())
    assert(report.ran.size == 23, report.ran.mkString(", "))

    val preds = spark.read.parquet(s"$twOut/predictions.parquet")
    assert(preds.count() == 2 * 6 * 7 * 2) // stores × items × days × weeks
    // log link: every tweedie forecast strictly positive — the property
    // the reference's objective choice buys on intermittent demand
    assert(preds.filter(col("pred_units_sold") <= 0).isEmpty,
      "tweedie predictions must be strictly positive")

    // rerun memoization must hold on this path too
    val report2 = tw.run(log = _ => ())
    assert(report2.ran.isEmpty, s"rerun must skip everything: ${report2.ran}")

    // ── forecast-delta study (VERDICT r10 item 7) ──────────────────
    val (sq, sqOut) = pipeline(None) // fixture default: squared-loss GBT
    sq.run(log = _ => ())
    val sqPreds = spark.read.parquet(s"$sqOut/predictions.parquet")
      .withColumnRenamed("pred_units_sold", "pred_sq")
    val joined = preds.join(sqPreds, Seq("id", "date", "pred_date"))
    assert(joined.count() == preds.count(), "prediction grids must align")
    val row = joined.agg(
      avg(abs(col("pred_units_sold") - col("pred_sq"))).as("mad"),
      avg(col("pred_units_sold")).as("mean_tw"),
      avg(col("pred_sq")).as("mean_sq")).head()
    val (mad, meanTw, meanSq) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    info(f"forecast delta tweedie vs squared: mean|Δ|=$mad%.4f, " +
      f"mean(tweedie)=$meanTw%.4f, mean(squared)=$meanSq%.4f, " +
      f"relative=${mad / math.max(meanSq.abs, 1e-9)}%.2f")
    // the objectives MUST diverge materially on intermittent demand —
    // if they agreed, the declared divergence would have been free and
    // this path pointless; if they disagree wildly (>10× the level),
    // something is broken in the link/scale handling
    assert(mad > 1e-6, "objectives cannot be identical on this data")
    assert(mad < 10 * math.max(meanSq.abs, 1.0),
      s"tweedie forecasts are on the wrong scale: mean|Δ|=$mad vs level $meanSq")
  }

  test("histogram fitter (LightGBM split finding + learned missing routing) runs the DAG; delta vs sentinel path measured") {
    val (hist, histOut) = pipeline(Some("tweedie"), histogram = Some(true))
    val report = hist.run(log = _ => ())
    assert(report.ran.size == 23, report.ran.mkString(", "))
    val preds = spark.read.parquet(s"$histOut/predictions.parquet")
    assert(preds.count() == 2 * 6 * 7 * 2)
    assert(preds.filter(col("pred_units_sold") <= 0).isEmpty,
      "tweedie predictions must be strictly positive")

    // ── missing-routing + histogram-split delta study (VERDICT r11
    // item 6): same objective, same trees-count — the only change is
    // the fitter (sentinel-imputed Spark ML splits vs histogram splits
    // with per-split learned missing directions over the REAL NaNs the
    // M5 lag/rolling warm-up rows carry) ───────────────────────────
    val (tw, twOut) = pipeline(Some("tweedie"), histogram = Some(false))
    tw.run(log = _ => ())
    val sentinel = spark.read.parquet(s"$twOut/predictions.parquet")
      .withColumnRenamed("pred_units_sold", "pred_sent")
    val joined = preds.join(sentinel, Seq("id", "date", "pred_date"))
    assert(joined.count() == preds.count(), "prediction grids must align")
    val row = joined.agg(
      avg(abs(col("pred_units_sold") - col("pred_sent"))).as("mad"),
      avg(col("pred_units_sold")).as("mean_hist"),
      avg(col("pred_sent")).as("mean_sent")).head()
    val (mad, meanH, meanS) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    info(f"forecast delta histogram-vs-sentinel fitter: mean|Δ|=$mad%.4f, " +
      f"mean(hist)=$meanH%.4f, mean(sentinel)=$meanS%.4f, " +
      f"relative=${mad / math.max(meanS.abs, 1e-9)}%.3f")
    // the fitters must stay on the same scale (same objective, same
    // link); a zero delta would mean the missing routing and binned
    // splits changed nothing — possible in principle, so only the
    // scale bound is asserted, the delta itself is the reported number
    assert(mad < 10 * math.max(meanS.abs, 1.0),
      s"histogram forecasts on the wrong scale: mean|Δ|=$mad vs level $meanS")
  }

  test("leaf-wise growth (num_leaves, LightGBM's frontier) runs the full DAG") {
    val (lw, lwOut) = pipeline(Some("tweedie"), histogram = Some(true),
      numLeaves = Some(8))
    val report = lw.run(log = _ => ())
    assert(report.ran.size == 23, report.ran.mkString(", "))
    val preds = spark.read.parquet(s"$lwOut/predictions.parquet")
    assert(preds.count() == 2 * 6 * 7 * 2)
    assert(preds.filter(col("pred_units_sold") <= 0).isEmpty,
      "tweedie predictions must be strictly positive")
  }

  test("full.yaml verbatim routes to the leaf-wise histogram fitter by default") {
    // the reference's real parameter block (full.yaml:4-14) with only
    // n_estimators scaled down — NO histogram key anywhere, exactly
    // what a user porting the yaml would run. Since r13 fromLgbParams
    // must take the LightGBM-parity path on its own: num_leaves: 50,
    // min_child_weight: 300 and colsample_bytree: 0.8 all map.
    val lgb = Map[String, Any](
      "objective" -> "tweedie", "n_estimators" -> 8,
      "learning_rate" -> 0.1, "subsample" -> 0.8,
      "colsample_bytree" -> 0.8, "max_depth" -> 8,
      "num_leaves" -> 50, "min_child_weight" -> 300,
      "metric" -> "rmse", "verbose" -> 10)
    val tp = graft.ml.TweedieGbt.fromLgbParams(lgb)
    assert(tp.histogram, "tweedie must default to the histogram fitter")
    assert(tp.numLeaves == 50 && tp.maxDepth == 8)
    assert(tp.minChildWeight == 300.0 && tp.colsampleBytree == 0.8)

    val (fy, fyOut) = pipeline(Some("tweedie"),
      numLeaves = Some(50),
      extra = Map(
        "colsample_bytree" -> Double.box(0.8),
        "max_depth" -> Int.box(8),
        "min_child_weight" -> Int.box(300),
        "subsample" -> Double.box(0.8)))
    val report = fy.run(log = _ => ())
    assert(report.ran.size == 23, report.ran.mkString(", "))
    val preds = spark.read.parquet(s"$fyOut/predictions.parquet")
    assert(preds.count() == 2 * 6 * 7 * 2)
    // min_child_weight 300 dwarfs the mini fixture's hessian mass, so
    // trees are intercept-only here — the point is the ROUTE (histogram
    // leaf-wise, constraints enforced), and the log link still holds
    assert(preds.filter(col("pred_units_sold") <= 0).isEmpty,
      "tweedie predictions must be strictly positive")
  }
}
