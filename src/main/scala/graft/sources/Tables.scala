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
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Read nanos as long (legacy conf) and
    * truncate to µs (integer `div` — a double division would lose
    * precision at 2^60-scale nano values). DuckDB-oracle queries only
    * ever use `ts` day-truncated or as a sort key, so µs truncation is
    * semantics-preserving (no two events share a microsecond). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
