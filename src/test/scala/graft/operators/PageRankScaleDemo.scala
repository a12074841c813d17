package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical check of PageRank's per-round cost claim (test scope):
  * `sbt "Test/runMain graft.operators.PageRankScaleDemo"` runs 12
  * iterations over the sf0.1 part–supplier graph (1.2 M directed edges
  * after symmetrization) and reports each round's wall time via the
  * operator's onRound hook. The claimed shape — edge table + degrees
  * materialized ONCE pre-partitioned, each round one thin-rank join +
  * map-side-combinable agg + bounded-size checkpoint — predicts flat
  * per-round cost; growth across rounds would mean the plan re-shuffles
  * or re-derives the edge table per round and falsify the design.
  * (An earlier variant inferred marginal cost from SEPARATE sequential
  * runs at 2/5/10 iterations and read JVM-lifetime debris — GC, shuffle
  * files, block-manager pressure — as superlinear rounds; the in-run
  * hook measures the rounds themselves.) */
object PageRankScaleDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val fwd = li.select(concat(lit("p"), col("l_partkey")).as("src"),
      concat(lit("s"), col("l_suppkey")).as("dst"))
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint() // scan variance out of the timings
    val times = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    Graph.pageRank(edges, "src", "dst", iterations = 12,
      onRound = (r, s) => times += (r -> s)).count()
    println(s"[prdemo] edges=${edges.count()} per-round seconds: " +
      times.map { case (r, s) => f"$r:$s%.2f" }.mkString(" "))
    // rounds chain lazily between cuts on this no-sinks graph (r16:
    // cut every 3rd round), so the flat-cost unit is the CHAIN — a
    // chain's wall lands on its cut round and lazy rounds report ~0
    val chains = times.map(_._2).grouped(3).map(_.sum).toSeq
    println(s"[prdemo] per-chain (3 rounds) seconds: " +
      chains.map(s => f"$s%.2f").mkString(" "))
    val early = chains(1) // chain 1 warms codegen
    val late = chains.last
    println(f"[prdemo] chain 2: $early%.2f s; last chain: $late%.2f s; " +
      f"ratio ${late / early}%.2f (flat ≈ 1.0)")
    spark.stop()
  }
}
