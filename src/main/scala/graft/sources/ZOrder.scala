package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — multi-dimensional data skipping for
  * parquet lakes. Sorting a table by the bit-interleaved key of two or
  * more filter columns clusters rows so that EVERY interleaved column
  * gets tight per-file (and per-row-group) min/max ranges; a point or
  * range predicate on ANY of them then prunes most files at planning
  * time, where a single-column sort only serves its one leading column.
  * This is the layout layer under the engine's scan operators — at
  * 100 TB the fastest scan is the one that never opens the file.
  */
object ZOrder {

  /** Morton key: interleave the low `bits` bits of each column
    * round-robin (column 0 owns the lowest lane). Values are cast to
    * long and masked to `bits`, so negative or oversized values fold
    * rather than corrupt the key — callers pick `bits` to cover their
    * domain. Built entirely from shift/and/or arithmetic, so the key
    * is one codegen'd expression (no UDF) and any engine can mirror it
    * with the same integer ops. `bits * cols` must fit in 63 bits. */
  def zorderKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, "zorderKey needs at least two columns")
    require(bits > 0 && bits * cols.size <= 63,
      s"bits * cols must be in (0, 63], got $bits * ${cols.size}")
    val k = cols.size
    val terms = for {
      i <- 0 until bits
      (c, ci) <- cols.zipWithIndex
    } yield shiftleft(
      shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * k + ci)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Write `df` to parquet z-ordered on `cols`: range-partition by the
    * Morton key into `numFiles` files, sort within each, drop the key.
    * Range partitioning makes files own disjoint key ranges (global
    * clustering, not just per-file), which is what gives every
    * interleaved column its tight min/max stats. One shuffle, one
    * sort — the standard price of any layout rewrite. */
  def writeZOrdered(df: DataFrame, cols: Seq[String], bits: Int,
      path: String, numFiles: Int): Unit = {
    require(numFiles > 0, s"numFiles must be positive: $numFiles")
    df.withColumn("__z", zorderKey(cols.map(col), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file min/max of `column` in a parquet dir — the footer-stats
    * view a pruning assertion needs: `filesTouched` below counts how
    * many files could contain `value`, i.e. how many a predicate scan
    * must open. Reads the data (not footers) — a TEST/diagnostic
    * helper, not a production path. */
  def fileRanges(df: DataFrame, column: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(col(column)).as("lo"), max(col(column)).as("hi"))

  def filesTouched(df: DataFrame, column: String, value: Long): Long =
    fileRanges(df, column)
      .filter(col("lo") <= value && col("hi") >= value)
      .count()
}
