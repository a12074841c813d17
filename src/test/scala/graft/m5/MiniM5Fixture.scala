package graft.m5

import java.nio.file.{Files, Paths}
import java.time.LocalDate
import java.time.format.TextStyle
import java.util.Locale

/** Deterministic synthetic mini-M5 inputs (FIXTURES.md §2): 2 stores ×
  * 6 items × 60 train days (+8 future calendar days), value formulas
  * pure functions of indices — no RNG, so golden outputs are stable
  * byte-for-byte across runs and JVMs.
  */
object MiniM5Fixture {

  val stores: Seq[String] = Seq("CA_1", "TX_1")
  val items: Seq[String] = Seq("item_0", "item_1", "item_2", "item_3", "item_4", "item_5")
  val nDays = 60
  val nCalendarDays = 68
  val startDate: LocalDate = LocalDate.of(2016, 1, 1)

  /** Same generator at arbitrary shape (M5ScaleDemo): `write(dir)`
    * remains the golden-test fixture shape. */
  def writeSized(dir: String, storesN: Int, itemsN: Int, days: Int): Unit =
    writeImpl(dir,
      (0 until storesN).map(i => s"ST_$i"),
      (0 until itemsN).map(i => s"item_$i"),
      days, days + 8)

  def saleId(item: String, store: String) = s"${item}_${store}_evaluation"

  /** units sold on day d (1-based) for (store s, item i) — small ints
    * with weekly seasonality. */
  def units(s: Int, i: Int, d: Int): Int = (i + s + d * (i + 2)) % 7

  def wmYrWk(d: Int): Int = 11601 + (d - 1) / 7

  /** sell price per (store, item, week) — missing for the first 3 weeks
    * of items 0 and 1 to exercise the notnull filter (pipeline.py:72). */
  def price(s: Int, i: Int, wk: Int): Option[Double] = {
    val wkIdx = wk - 11601
    if (i < 2 && wkIdx < 3) None
    else Some(math.round((1.0 + i * 0.5 + s * 0.25 + (wkIdx % 4) * 0.1) * 100).toDouble / 100)
  }

  def write(dir: String): Unit = writeImpl(dir, stores, items, nDays, nCalendarDays)

  private def writeImpl(dir: String, stores: Seq[String], items: Seq[String],
      nDays: Int, nCalendarDays: Int): Unit = {
    Files.createDirectories(Paths.get(dir))
    // Streamed row-by-row: at reference width (3,049 items × 1,941
    // days) the sales CSV is ~120 MB and sell_prices ~8.5M rows —
    // building either as one driver-side string would need GBs of
    // transient heap for no reason.
    def writeCsv(name: String, header: String)(
        rows: java.io.BufferedWriter => Unit): Unit = {
      val w = Files.newBufferedWriter(Paths.get(dir, name))
      try { w.write(header); w.write("\n"); rows(w) } finally w.close()
    }

    // sales_train_evaluation.csv — wide, one row per (item, store)
    val dayHeader = (1 to nDays).map(d => s"d_$d").mkString(",")
    writeCsv("sales_train_evaluation.csv",
      s"id,item_id,dept_id,cat_id,store_id,state_id,$dayHeader") { w =>
      for {
        (store, s) <- stores.zipWithIndex
        (item, i) <- items.zipWithIndex
      } {
        val dept = s"dept_${i % 2}"; val cat = s"cat_${i % 2}"
        val state = store.take(2)
        w.write(s"${saleId(item, store)},$item,$dept,$cat,$store,$state")
        var d = 1
        while (d <= nDays) { w.write(","); w.write(units(s, i, d).toString); d += 1 }
        w.write("\n")
      }
    }

    // calendar.csv — nDays train + 8 future rows
    writeCsv("calendar.csv",
      "date,wm_yr_wk,weekday,wday,month,year,d,event_name_1,event_type_1,event_name_2,event_type_2,snap_CA,snap_TX,snap_WI") { w =>
      (1 to nCalendarDays).foreach { d =>
        val date = startDate.plusDays(d - 1)
        val weekday = date.getDayOfWeek.getDisplayName(TextStyle.FULL, Locale.US)
        val wday = date.getDayOfWeek.getValue % 7 + 1 // M5: Sat=1..Fri=7-ish, any stable convention
        val event = if (d % 20 == 0) s"event_$d,cultural" else ","
        val snap = s"${d % 2},${(d + 1) % 2},${d % 3 min 1}"
        w.write(s"${date},${wmYrWk(d)},$weekday,$wday,${date.getMonthValue},${date.getYear},d_$d,$event,,,$snap")
        w.write("\n")
      }
    }

    // sell_prices.csv — per (store, item, week)
    val weeks = (1 to nCalendarDays).map(wmYrWk).distinct
    writeCsv("sell_prices.csv", "store_id,item_id,wm_yr_wk,sell_price") { w =>
      for {
        (store, s) <- stores.zipWithIndex
        (item, i) <- items.zipWithIndex
        wk <- weeks
        p <- price(s, i, wk)
      } { w.write(s"$store,$item,$wk,$p"); w.write("\n") }
    }

    // sample_submission.csv — evaluation AND validation ids (the
    // validation rows exercise partial keyed update, pipeline.py:374-378)
    val fHeader = (1 to 28).map(i => s"F$i").mkString(",")
    val zeros = Seq.fill(28)("0.0").mkString(",")
    val subRows = for {
      store <- stores; item <- items
      suffix <- Seq("evaluation", "validation")
    } yield s"${item}_${store}_$suffix,$zeros"
    Files.writeString(Paths.get(dir, "sample_submission.csv"),
      (s"id,$fHeader" +: subRows.sorted).mkString("", "\n", "\n"))
  }

  /** quick_one-shaped config over the fixture (1 store × 1 week in the
    * reference; here 2 stores × 2 weeks to exercise the fan-out and
    * union while staying seconds-fast). */
  def config(inputDir: String, outputDir: String): Map[String, Any] = Map(
    "input_dir" -> inputDir,
    "output_dir" -> outputDir,
    "target_col" -> "units_sold",
    "pred_target_col" -> "pred_units_sold",
    "pred_date_col" -> "pred_date",
    "train_start_date" -> "2016-01-01",
    "train_end_date" -> "2016-02-15",
    "test_start_date" -> "2016-02-16",
    "test_end_date" -> "2016-02-22",
    "valid_num_days" -> 10,
    "store_list" -> java.util.List.of("CA_1", "TX_1"),
    "pred_week_list" -> java.util.List.of(1, 2),
    "lgb_params" -> java.util.Map.of(
      "n_estimators", 2, "learning_rate", 0.1, "subsample", 0.8,
      "colsample_bytree", 0.8, "max_depth", 4),
    "cleanup_intermediates" -> "false")
}
