package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed-table layout for co-located joins and aggregations.
  *
  * At 100 TB the dominant cost of a fact-fact equi-join is shuffling
  * both sides; if the tables are WRITTEN bucketed by the join key
  * (same key, same bucket count), Spark's scan reports the hash
  * partitioning and the join planner drops both exchanges — the join
  * runs bucket-to-bucket. Same for groupBy on the bucket key (no
  * exchange before the final aggregate).
  *
  * Bucketing rules of thumb:
  *  - bucket count ≈ target parallelism at the biggest consumer; both
  *    join sides MUST use the same count (or a divisor, with AQE off);
  *  - `sortBy` the bucket key inside buckets so sort-merge joins skip
  *    their sort too;
  *  - bucketed writes require the table catalog (`saveAsTable`) — a
  *    plain `.parquet(path)` write silently loses bucket metadata.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted catalog table. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      buckets: Int,
      keys: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Write `df` range-partitioned then sorted by `keys`, so every
    * parquet row group covers a narrow key interval and its min/max
    * footer stats become a coarse index: a point or range filter on
    * the leading key skips whole row groups (files too, since range
    * partitioning makes file key-spans disjoint) instead of decoding
    * them. This is the layout for fact tables queried by range (time,
    * id) when directory partitioning is too coarse — at 100 TB the
    * difference is scanning ~the matching fraction of the table
    * instead of all of it. `rowGroupBytes` trades stat granularity
    * against metadata overhead (parquet default 128 MB; smaller groups
    * skip more precisely). */
  def writeRangeSorted(
      df: DataFrame,
      path: String,
      keys: Seq[String],
      numFiles: Int,
      rowGroupBytes: Long = 128L << 20,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.repartitionByRange(numFiles, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
      .write
      .mode(mode)
      .option("parquet.block.size", rowGroupBytes)
      .parquet(path)
}
