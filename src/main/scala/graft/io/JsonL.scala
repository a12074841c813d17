package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructType}

/** JSON-lines source with corrupt-row quarantine — the ingestion shape
  * a web-crawl/training-data pipeline needs: JSONL is the dominant
  * interchange format for document corpora, crawls are never clean,
  * and the two failure responses Spark offers out of the box are both
  * wrong at scale (FAILFAST kills a 100 TB job for one bad line;
  * DROPMALFORMED silently loses data with no audit trail). Here every
  * line lands exactly once: parseable rows in `good` (explicit schema,
  * like [[Csv.source]] — inference is an extra full pass and a
  * correctness hazard), unparseable raw lines in `corrupt` for
  * quarantine/repair, neither dropped nor fatal. */
object JsonL {

  /** The reader-internal corrupt-record column name. */
  val CorruptCol = "_corrupt_record"

  /** The column name `corrupt` exposes the raw line under. NOT
    * `_corrupt_record`: any JSON re-read of a column by that name is
    * treated as the internal corrupt column and trips Spark's
    * corrupt-only-query guard — a quarantine dir sunk as JSONL would
    * be unreadable by its own repair job. */
  val RawCol = "raw"

  final case class Ingested(good: DataFrame, corrupt: DataFrame)

  /** Schema-explicit JSONL scan. PERMISSIVE parse: a malformed line
    * yields nulls + the raw line in [[CorruptCol]]; `good` strips the
    * quarantine column, `corrupt` keeps only the raw line as
    * [[RawCol]].
    *
    * The source frame is persisted via `scope` before the split —
    * REQUIRED, not an optimization: Spark refuses plans that filter on
    * only the internal corrupt-record column of a streaming-parsed
    * JSON relation (SPARK-26156), and without a materialization the
    * good/corrupt consumers would each re-parse the full input anyway.
    * The caller's scope owns the block lifetime. */
  def sourceWithQuarantine(
      spark: SparkSession, path: String, schema: StructType,
      scope: graft.util.CacheScope): Ingested = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not declare $CorruptCol — it is added by the reader")
    val raw = scope.persist(
      spark.read
        .schema(schema.add(CorruptCol, StringType))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CorruptCol)
        .json(path))
    Ingested(
      good = raw.filter(col(CorruptCol).isNull).drop(CorruptCol),
      corrupt = raw.filter(col(CorruptCol).isNotNull)
        .select(col(CorruptCol).as(RawCol)))
  }

  /** Distributed JSONL sink (one part per partition) — the round-trip
    * partner for parquet-shy interchange. */
  def sink(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").json(dir)
}
