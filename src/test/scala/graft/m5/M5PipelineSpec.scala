package graft.m5

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.config.YamlConfig

/** Golden pipeline test (SURVEY §5.2.4): the full M5 DAG on the
  * synthetic mini-M5, quick-config shaped. Asserts checkpoint schemas,
  * row counts, memoized reruns, and deterministic submission bytes
  * under the fixed seed.
  */
class M5PipelineSpec extends SparkSpec {

  private lazy val inputDir = {
    val d = Files.createTempDirectory("m5in").toString
    MiniM5Fixture.write(d)
    d
  }

  private def freshPipeline(): (M5Pipeline, String) = {
    val outDir = Files.createTempDirectory("m5out").toString
    val cfg = YamlConfig.fromMap(MiniM5Fixture.config(inputDir, outDir))
    (new M5Pipeline(spark, cfg), outDir)
  }

  test("golden run: full DAG end-to-end, checkpoint schemas and row counts") {
    val (pipeline, outDir) = freshPipeline()
    val report = pipeline.run(log = _ => ())
    // ingest + 2 stores × (base + ts) + 2 stores × 2 weeks × (train,
    // test, model, pred) + predictions + submission = 1 + 4 + 16 + 2 = 23
    assert(report.ran.size == 23, report.ran.mkString(", "))
    assert(report.ran.count(_ == "IngestSales") == 1,
      "the sales CSV must be scanned exactly once, by IngestSales")

    // the per-store read prunes to one partition directory — the store
    // predicate must be a PartitionFilter over the ingested layout, so
    // no sales byte outside the store is opened (file-level, not row)
    {
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      val read = spark.read.parquet(s"$outDir/sales_wide_by_store.parquet")
        .filter(col("store_id") === "CA_1")
      val scan = (read.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).collect { case s: FileSourceScanExec => s }.head
      assert(scan.partitionFilters.nonEmpty, "store_id must partition-prune")
      assert(scan.selectedPartitions.totalNumberOfFiles <
        scan.relation.location.inputFiles.length,
        "pruned scan must touch fewer files than the full layout")
    }

    // params.yaml manifest written (O6)
    assert(Files.exists(Paths.get(outDir, "params.yaml")))

    // ProcessInputFiles: items × days minus price-missing rows.
    // 60 days; items 0,1 missing first 3 weeks (21 days) → 39 days.
    val base = spark.read.parquet(s"$outDir/features_sales_base_store_CA_1.parquet")
    val expectBase = 2 * 39 + 4 * 60
    assert(base.count() == expectBase)
    assert(base.columns.contains("sell_price") && base.columns.contains("wm_yr_wk"))
    assert(base.schema("d").dataType.typeName == "long")
    assert(base.schema("date").dataType.typeName == "date")
    assert(base.filter(col("sell_price").isNull).count() == 0)

    // SalesTimeSeriesFeatures: same rows, event/snap dropped, features added
    val ts = spark.read.parquet(s"$outDir/features_sales_ts_store_CA_1.parquet")
    assert(ts.count() == expectBase)
    val tsCols = ts.columns.toSet
    assert(!tsCols.contains("event_name_1") && !tsCols.contains("snap_CA"))
    val expected = Seq("quarter", "week", "day", "dayofweek", "is_weekend") ++
      Seq(1, 2, 7, 14, 28).map(k => s"units_sold_lag_$k") ++
      Seq(7, 14, 28).map(w => s"units_sold_roll_mean_$w")
    expected.foreach(c => assert(tsCols.contains(c), s"missing ts feature $c"))

    // lag semantics inside the pipeline output: lag_1 at day d = units at
    // previous PRESENT day (price-filtered rows drop out first, exactly
    // like the reference which lags AFTER the notnull filter)
    val lagCheck = ts.filter(col("id") === MiniM5Fixture.saleId("item_2", "CA_1"))
      .orderBy("d").select("units_sold", "units_sold_lag_1").collect()
    assert(lagCheck.head.isNullAt(1))
    (1 until lagCheck.length).foreach { i =>
      assert(lagCheck(i).getInt(1) == lagCheck(i - 1).getInt(0))
    }

    // PrepareTrainData: train window 2016-01-01..2016-02-15 = 46 days;
    // lead(7) drops the last 7 present days per id
    val train = spark.read.parquet(s"$outDir/train_store_CA_1_week_1.parquet")
    assert(train.columns.contains("pred_units_sold") && train.columns.contains("pred_date"))
    val perId = train.groupBy("id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perId(MiniM5Fixture.saleId("item_2", "CA_1")) == 46 - 7)
    assert(perId(MiniM5Fixture.saleId("item_0", "CA_1")) == 46 - 21 - 7)

    // predictions: one row per (id, test day, week)
    val preds = spark.read.parquet(s"$outDir/predictions.parquet")
    assert(preds.count() == 2 * 6 * 7 * 2) // stores × items × test days × weeks
    assert(preds.columns.sorted.toSeq == Seq("date", "id", "pred_date", "pred_units_sold"))

    // submission: all sample ids present, F1..F28 filled only where
    // predictions exist (evaluation ids); validation ids untouched 0.0
    val sub = spark.read.option("header", "true").csv(s"$outDir/submission.csv")
    assert(sub.count() == 24) // 12 evaluation + 12 validation ids
    val f8 = sub.filter(col("id").endsWith("_validation"))
      .select("F8").distinct().collect().map(_.getString(0)).toSeq
    assert(f8 == Seq("0.0"), s"validation rows must stay 0.0, got $f8")
    // week-1 preds land on F8..F14 (pred day numbers 8..14 relative to
    // min pred_date = test_start + 7)
    val evalF8 = sub.filter(col("id") === MiniM5Fixture.saleId("item_2", "CA_1"))
      .select("F8").head().getString(0)
    assert(evalF8 != "0.0", "evaluation F8 must be updated by week-1 predictions")

    // score the week-1 forecasts with the competition's own metric:
    // pred_dates 02-23..02-29 are days 54-60 of the 60-day fixture, so
    // REAL held-out actuals exist. train = sales through the test
    // window end (02-22); the WRMSSE is pinned golden under the fixed
    // seed, and must beat the all-zeros forecast's 1.0-ish baseline on
    // this fixture (the model has to have learned SOMETHING).
    val sales = Seq("CA_1", "TX_1")
      .map(s => spark.read.parquet(s"$outDir/features_sales_base_store_$s.parquet"))
      .reduce(_ unionByName _)
      .select(col("id"), col("date"), col("units_sold"))
    val trainSales = sales.filter(col("date") <= "2016-02-22")
    val holdout = sales.filter(col("date") > "2016-02-22")
    val week1 = preds
      .filter(col("pred_date").between("2016-02-23", "2016-02-29"))
      .select(col("id"), col("pred_date").as("date"), col("pred_units_sold"))
    val per = graft.operators.Forecast.wrmsse(
      trainSales, holdout, week1,
      "id", "date", "units_sold", "pred_units_sold", horizon = 7)
    val tot = graft.operators.Forecast.wrmsseTotal(per).head()
    val zeros = week1.withColumn("pred_units_sold", lit(0.0))
    val zeroTot = graft.operators.Forecast.wrmsseTotal(
      graft.operators.Forecast.wrmsse(trainSales, holdout, zeros,
        "id", "date", "units_sold", "pred_units_sold", horizon = 7)).head()
    info(f"WRMSSE model=${tot.getDouble(0)}%.4f zeros=${zeroTot.getDouble(0)}%.4f over ${tot.getLong(1)} series")
    // item_5's units formula is constant per store ((i+2) ≡ 0 mod 7),
    // so 2 of the 12 series have zero naive scale and are excluded —
    // the metric's new-product rule exercised for real
    assert(tot.getLong(1) == 10L, s"10 of 12 series must score: $tot")
    // the fixture's formula is period-7, so the lag-7 feature predicts
    // it exactly — the golden model lands at 0.0 while all-zeros sits
    // above 1; both pins together say "the metric discriminates and
    // the model actually learned the seasonality"
    assert(tot.getDouble(0) == 0.0 && zeroTot.getDouble(0) > 1.0,
      s"model WRMSSE ${tot.getDouble(0)} vs zeros ${zeroTot.getDouble(0)}")
  }

  test("rerun is fully memoized; deleting one checkpoint reruns only its cone") {
    val (pipeline, outDir) = freshPipeline()
    pipeline.run(log = _ => ())
    val report2 = pipeline.run(log = _ => ())
    assert(report2.ran.isEmpty, s"second run must skip everything, ran: ${report2.ran}")

    // knock out one mid-DAG target → only its dependents rerun
    TaskRunnerLikeDelete.delete(s"$outDir/pred_store_CA_1_week_1.parquet")
    TaskRunnerLikeDelete.delete(s"$outDir/predictions.parquet")
    TaskRunnerLikeDelete.delete(s"$outDir/submission.csv")
    val report3 = pipeline.run(log = _ => ())
    assert(report3.ran.toSet ==
      Set("RunPredictionStoreWeek(CA_1, 1)", "RunPredictionAll", "RunSubmission"))
  }

  test("submission bytes are deterministic across independent runs (fixed seed)") {
    val (p1, out1) = freshPipeline()
    val (p2, out2) = freshPipeline()
    p1.run(log = _ => ())
    p2.run(log = _ => ())
    val b1 = Files.readAllBytes(Paths.get(out1, "submission.csv"))
    val b2 = Files.readAllBytes(Paths.get(out2, "submission.csv"))
    assert(java.util.Arrays.equals(b1, b2), "submission.csv must be byte-identical")
  }
}

private object TaskRunnerLikeDelete {
  def delete(path: String): Unit = {
    val p = Paths.get(path)
    if (Files.exists(p)) {
      if (Files.isDirectory(p))
        Files.walk(p).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => Files.delete(f))
      else Files.delete(p)
    }
  }
}
