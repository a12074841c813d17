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

  /** Morton key over DOMAIN-SCALED columns: each column is first
    * linearly mapped from its own [lo, hi] onto the full `bits`-wide
    * range, then interleaved. This is the form a LAYOUT must use: raw
    * interleaving hands the top lanes to whichever column has the
    * widest domain (a 15-bit part key over a 10-bit supplier key leaves
    * the supplier's top-6 lanes constant zero), and the range
    * partitioner then splits files on that column alone — measured on
    * sf0.1 lineitem, the supplier dimension pruned 30.8/32 files, i.e.
    * not at all. Scaling gives every column equal say in every prefix
    * of the key. Linear min/max scaling assumes roughly uniform value
    * spread; heavily skewed layout columns want quantile bucketing
    * before the interleave (the Delta OPTIMIZE ZORDER approach).
    * Constant columns (hi = lo) contribute zero bits, harmlessly. */
  def zorderKeyScaled(cols: Seq[Column], bits: Int,
      bounds: Seq[(Double, Double)]): Column = {
    require(cols.size == bounds.size, "one (lo, hi) bound per column")
    val top = (1L << bits) - 1
    val scaled = cols.zip(bounds).map { case (c, (lo, hi)) =>
      if (hi <= lo) lit(0L)
      else floor((c.cast("double") - lit(lo)) * top / (hi - lo)).cast("long")
    }
    zorderKey(scaled, bits)
  }

  /** Write `df` to parquet z-ordered on `cols`: domain-scale each
    * column (one 1-row min/max agg), range-partition by the Morton key
    * into `numFiles` files, sort within each, drop the key. Range
    * partitioning makes files own disjoint key ranges (global
    * clustering, not just per-file), which is what gives every
    * interleaved column its tight min/max stats. One extra bounds agg,
    * one shuffle, one sort — the standard price of a layout rewrite. */
  def writeZOrdered(df: DataFrame, cols: Seq[String], bits: Int,
      path: String, numFiles: Int): Unit = {
    require(numFiles > 0, s"numFiles must be positive: $numFiles")
    val aggExprs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"__lo_$c"),
        max(col(c).cast("double")).as(s"__hi_$c")))
    val boundsRow = df.agg(aggExprs.head, aggExprs.tail: _*).head()
    val bounds = cols.indices.map { i =>
      (Option(boundsRow.get(2 * i)).fold(0.0)(_.asInstanceOf[Double]),
        Option(boundsRow.get(2 * i + 1)).fold(0.0)(_.asInstanceOf[Double]))
    }
    df.withColumn("__z", zorderKeyScaled(cols.map(col), bits, bounds))
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
