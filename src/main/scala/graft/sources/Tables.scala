package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table registry over the driver-generated test data
  * (TESTDATA.md). One parquet file per table; at production scale these
  * would be partitioned directories — the reader API is identical.
  *
  * Design note (100 TB): always read through `spark.read.parquet` so
  * Catalyst can push filters/column pruning into the scan; never load a
  * table eagerly. Callers `.select(...)` the columns they need and rely
  * on ReadSchema pruning.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` has been generated with two different physical
    * encodings across driver testdata regenerations:
    *   - parquet TIMESTAMP(NANOS) — Spark's vectorized reader rejects it
    *     unless `spark.sql.legacy.parquet.nanosAsLong=true`, which
    *     surfaces it as int64 nanos; we then truncate to µs (integer
    *     `div` — a double division would lose precision at 2^60-scale
    *     nano values). The oracle only uses `ts` day-truncated or as a
    *     sort key, so µs truncation is semantics-preserving.
    *   - parquet timestamp[us] — a plain TimestampType/TimestampNTZ
    *     column; pass it through unchanged.
    * We sniff the footer schema under the legacy conf (footer-only, no
    * job): if `ts` arrives as LongType the file is nanos-encoded and the
    * div-1000 rewrite applies; otherwise the modern path. The conf is
    * restored on the modern path (where it is irrelevant) so it does not
    * leak into the shared session; on the nanos path it MUST stay set,
    * because Spark's parquet scan re-reads it from the session conf at
    * execution time, not at DataFrame-creation time. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.LongType
    val key  = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "true")
    val raw = load(s, d, "events")
    val tsIsNanosLong =
      raw.schema.fields.find(_.name == "ts").exists(_.dataType == LongType)
    if (tsIsNanosLong) {
      // Legacy nanos encoding: the conf must remain set for the lifetime
      // of this plan's execution — leaving it set is the documented cost
      // of supporting this encoding at all.
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else {
      prev match {
        case Some(v) => s.conf.set(key, v)
        case None    => s.conf.unset(key)
      }
      // Modern encoding: re-read without the legacy conf so the plan
      // captures the standard timestamp read path. Parquet timestamp[us]
      // without a UTC-adjusted flag infers as TIMESTAMP_NTZ; every
      // downstream consumer (unix_micros, session_window, the oracle)
      // expects plain TIMESTAMP, so normalize. The session timezone is
      // pinned to UTC engine-wide, so NTZ→LTZ is value-preserving.
      val modern = load(s, d, "events")
      val tsIsNtz = modern.schema.fields.find(_.name == "ts")
        .exists(_.dataType == org.apache.spark.sql.types.TimestampNTZType)
      if (tsIsNtz)
        modern.withColumn("ts",
          modern("ts").cast(org.apache.spark.sql.types.TimestampType))
      else modern
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
