package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical check of k-means' per-iteration cost claim (test scope):
  * `sbt "Test/runMain graft.operators.KmeansScaleDemo [nVecs] [dim] [k] [iters]"`
  * times each Lloyd's round via the operator's onRound hook over a
  * synthetic corpus (default 1 M × 32-dim, k=16) far above the gate
  * table's 2 k rows. The claimed shape — assignment MAP-ONLY against
  * k×dim driver-state centroid literals, the only exchange a
  * k×dim-group partial-agg mean, driver traffic k×dim rows per round —
  * predicts flat per-round cost; growth across rounds would mean the
  * plan re-derives lineage or shuffles the corpus per round and
  * falsify the design. Vectors are deterministic (hash-mixed, no
  * cluster structure — the no-shortcut worst case), so reruns time the
  * same work. */
object KmeansScaleDemo {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val dim = if (args.length > 1) args(1).toInt else 32
    val k = if (args.length > 2) args(2).toInt else 16
    val iters = if (args.length > 3) args(3).toInt else 5
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vecs = spark.range(n).select(col("id").as("vec_id"),
      expr(s"transform(sequence(0, ${dim - 1}), " +
        "p -> cast(pmod(xxhash64(id, p), 1000000) as float) / 1000000.0)")
        .as("embedding"))
      .localCheckpoint() // generation variance out of the timings
    val times = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    Similarity.kmeansCentroids(vecs, "vec_id", "embedding", k, iters,
      onRound = (r, s) => times += (r -> s))
    println(f"[kmdemo] n=$n dim=$dim k=$k per-round seconds: " +
      times.map { case (r, s) => f"$r:$s%.2f" }.mkString(" "))
    val early = times.slice(1, 3).map(_._2).sum / 2 // rounds 2-3 (1 warms codegen)
    val late = times.takeRight(2).map(_._2).sum / 2
    println(f"[kmdemo] avg rounds 2-3: $early%.2f s; avg last 2: $late%.2f s; " +
      f"ratio ${late / early}%.2f (flat ≈ 1.0)")
    spark.stop()
  }
}
