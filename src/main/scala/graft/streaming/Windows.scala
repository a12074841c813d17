package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X11 — event-time window aggregations with batch/streaming parity
  * (SURVEY §2.5, §5.2.6).
  *
  * The SAME operator body serves both modes: `window()` /
  * `session_window()` group batch DataFrames and streaming DataFrames
  * identically; only the watermark (mandatory for streaming append
  * output, meaningless in batch) differs. Late rows beyond the
  * watermark are dropped in streaming — the one declared divergence
  * from batch, pinned by StreamingParitySpec.
  *
  * Scale notes: tumbling/sliding aggregation is a plain hash aggregate
  * on (window, keys) — one shuffle, map-side partial aggregation.
  * Sliding windows multiply rows by (length/slide) at the Expand;
  * choose slide ratios accordingly. Session windows need a per-key
  * sort-merge; keys with pathological event counts dominate — salt or
  * pre-bucket those upstream.
  */
object Windows {

  private def withWatermarkOpt(df: DataFrame, tsCol: String, wm: Option[String]) =
    wm.fold(df)(w => df.withWatermark(tsCol, w))

  /** Tumbling window: one row per (window, keys) per `width`. */
  def tumbling(
      df: DataFrame, tsCol: String, width: String,
      keys: Seq[Column], aggs: Seq[Column],
      watermark: Option[String] = None): DataFrame =
    withWatermarkOpt(df, tsCol, watermark)
      .groupBy(window(col(tsCol), width) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  /** Sliding window: rows fall into length/slide overlapping windows. */
  def sliding(
      df: DataFrame, tsCol: String, length: String, slide: String,
      keys: Seq[Column], aggs: Seq[Column],
      watermark: Option[String] = None): DataFrame =
    withWatermarkOpt(df, tsCol, watermark)
      .groupBy(window(col(tsCol), length, slide) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  /** Session window: gap-based sessions per key. */
  def sessionized(
      df: DataFrame, tsCol: String, gap: String,
      keys: Seq[Column], aggs: Seq[Column],
      watermark: Option[String] = None): DataFrame =
    withWatermarkOpt(df, tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("session_window.start"))
      .withColumn("session_end", col("session_window.end"))
      .drop("session_window")

  /** Stream-stream (or batch-batch — the SAME body serves both) interval
    * join: left rows pair with right rows of equal `keys` whose
    * timestamp falls in [left.ts − before, left.ts + after].
    *
    * Streaming needs BOTH watermarks plus the time-range predicate so
    * each side's state store can evict rows that can no longer match —
    * without the interval bound the state is unbounded and Spark
    * rejects the query in append mode. Scale: state per side ≈ rate ×
    * (watermark + interval) per key partition; the join itself is the
    * usual keyed exchange. */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      before: String, after: String,
      watermark: Option[String] = None): DataFrame = {
    val l = withWatermarkOpt(left, leftTs, watermark)
    val r = withWatermarkOpt(right, rightTs, watermark)
    val keyCond = keys.map(k => l(k) === r(k)).reduce(_ && _)
    val range =
      r(rightTs) >= l(leftTs) - expr(s"INTERVAL $before") &&
      r(rightTs) <= l(leftTs) + expr(s"INTERVAL $after")
    // expression joins keep BOTH key columns — drop the right copies so
    // the output resolves unqualified key references
    keys.foldLeft(l.join(r, keyCond && range))((df, k) => df.drop(r(k)))
  }
}
