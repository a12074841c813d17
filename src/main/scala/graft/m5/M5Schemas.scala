package graft.m5

import org.apache.spark.sql.types._

/** Explicit schemas for the M5 input CSVs (the engine never infers —
  * SURVEY.md §1.3). Shapes mirror the public M5 files the reference
  * ingests: sales_train_evaluation.csv, calendar.csv, sell_prices.csv,
  * sample_submission.csv (pipeline.py:26-31, 362).
  */
object M5Schemas {

  val salesIdCols: Seq[String] =
    Seq("id", "item_id", "dept_id", "cat_id", "store_id", "state_id")

  /** Wide sales: 6 id columns + d_1..d_nDays integer day columns. */
  def sales(nDays: Int): StructType =
    StructType(
      salesIdCols.map(StructField(_, StringType)) ++
        (1 to nDays).map(i => StructField(s"d_$i", IntegerType)))

  val calendar: StructType = StructType(Seq(
    StructField("date", StringType),
    StructField("wm_yr_wk", IntegerType),
    StructField("weekday", StringType),
    StructField("wday", IntegerType),
    StructField("month", IntegerType),
    StructField("year", IntegerType),
    StructField("d", StringType),
    StructField("event_name_1", StringType),
    StructField("event_type_1", StringType),
    StructField("event_name_2", StringType),
    StructField("event_type_2", StringType),
    StructField("snap_CA", IntegerType),
    StructField("snap_TX", IntegerType),
    StructField("snap_WI", IntegerType)))

  val prices: StructType = StructType(Seq(
    StructField("store_id", StringType),
    StructField("item_id", StringType),
    StructField("wm_yr_wk", IntegerType),
    StructField("sell_price", DoubleType)))

  /** id + F1..F28 prediction slots. */
  def submission(nF: Int = 28): StructType =
    StructType(
      StructField("id", StringType) +:
        (1 to nF).map(i => StructField(s"F$i", DoubleType)))
}
