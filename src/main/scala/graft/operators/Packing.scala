package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing: assign variable-length items (chunks, documents)
  * to fixed-capacity bins — the batch-assembly stage that turns a
  * chunked corpus into dense training sequences with minimal padding.
  *
  * Exact bin packing is NP-hard and inherently sequential, so the
  * distributed form is PARTITION-LOCAL first-fit-decreasing: each
  * partition packs its own items; bin ids are globally unique via a
  * (partition, local-bin) encoding. That matches production practice —
  * packing quality needs only locally-full bins, not a global optimum,
  * and per-partition imperative state is exactly the case where
  * `mapPartitions` is the sanctioned shape (a Catalyst expression
  * cannot carry bin state across rows; a single global window would
  * serialize the corpus through one task).
  *
  * Determinism: for a FIXED partitioning the result is deterministic
  * (items are packed in (size desc, id asc) order within each
  * partition). Different partitionings pack differently — like any
  * partition-local operator; pin the layout upstream (repartition by a
  * stable key) when bit-stable bins matter across runs.
  */
object Packing {

  /** Max-segment tree over bin free-capacities: `firstFit(need)` finds
    * the LEFTMOST bin with room in O(log bins) — first-fit semantics,
    * identical output to a linear scan, without the O(bins) probe per
    * item that turns million-chunk partitions quadratic. Grows by
    * doubling as bins are appended. */
  private final class BinIndex {
    private var cap = 1024
    private var tree = new Array[Long](2 * cap) // max of subtree
    private var n = 0

    def size: Int = n

    private def grow(): Unit = {
      val old = tree
      val oldCap = cap
      cap *= 2
      tree = new Array[Long](2 * cap)
      System.arraycopy(old, oldCap, tree, cap, n) // leaves
      var i = cap - 1
      while (i >= 1) { tree(i) = math.max(tree(2 * i), tree(2 * i + 1)); i -= 1 }
    }

    def update(idx: Int, free: Long): Unit = {
      var i = idx + cap
      tree(i) = free
      i /= 2
      while (i >= 1) { tree(i) = math.max(tree(2 * i), tree(2 * i + 1)); i /= 2 }
    }

    def append(free: Long): Int = {
      if (n == cap) grow()
      update(n, free)
      n += 1
      n - 1
    }

    /** Leftmost bin with free >= need, or -1. (Empty leaves hold 0, so
      * they can only match need <= 0 — guarded by the n == 0 check plus
      * real bins sorting before them.) */
    def firstFit(need: Long): Int = {
      if (n == 0 || tree(1) < need) return -1
      var i = 1
      while (i < cap) {
        i = if (tree(2 * i) >= need) 2 * i else 2 * i + 1
      }
      i - cap
    }

    def freeAt(idx: Int): Long = tree(idx + cap)
  }

  /** First-fit-decreasing within each partition. Items larger than
    * `capacity` get a singleton bin (they must be truncated downstream;
    * dropping them silently would skew the corpus). Output:
    * (idCol, bin_id) with bin_id bigint — encoded (partition << 32) |
    * local-bin, collision-free up to 2^32 bins per partition.
    *
    * Preconditions: `idCol` must be non-null, numeric (castable to
    * long) and unique — ids identify packed items downstream; `sizeCol`
    * must be >= 0 (a negative size would corrupt the free-capacity
    * tree's accounting, so it fails fast like the capacity guard). */
  def packFirstFitDecreasing(
      df: DataFrame, idCol: String, sizeCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    val spark = df.sparkSession
    import spark.implicits._
    // the projection + spark_partition_id is narrow, so every row in a
    // mapPartitions batch carries the same partition id
    val in = df.select(col(idCol).cast("long"), col(sizeCol).cast("long"),
      spark_partition_id().cast("long")).as[(Long, Long, Long)]
    in.mapPartitions { rows =>
      val items = rows.toArray
      if (items.isEmpty) Iterator.empty
      else {
        val part = items.head._3
        // FFD: largest first, id tiebreak for determinism
        val sorted = items.sortBy { case (id, sz, _) => (-sz, id) }
        val bins = new BinIndex
        sorted.iterator.map { case (id, sz, _) =>
          require(sz >= 0, s"item size must be >= 0: id=$id size=$sz")
          val b = bins.firstFit(sz)
          val bin =
            if (b >= 0) { bins.update(b, bins.freeAt(b) - sz); b }
            else bins.append(math.max(capacity - sz, 0L))
          (id, (part << 32) | bin.toLong)
        }
      }
    }.toDF(idCol, "bin_id")
  }
}
