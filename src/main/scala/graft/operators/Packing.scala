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

  /** First-fit-decreasing within each partition. Items larger than
    * `capacity` get a singleton bin (they must be truncated downstream;
    * dropping them silently would skew the corpus). Output:
    * (idCol, bin_id) with bin_id bigint. */
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
        val binFree = scala.collection.mutable.ArrayBuffer.empty[Long]
        sorted.iterator.map { case (id, sz, _) =>
          val b = binFree.indexWhere(_ >= sz)
          val bin =
            if (b >= 0) { binFree(b) -= sz; b }
            else { binFree += math.max(capacity - sz, 0L); binFree.length - 1 }
          (id, part * 1000000L + bin)
        }
      }
    }.toDF(idCol, "bin_id")
  }
}
