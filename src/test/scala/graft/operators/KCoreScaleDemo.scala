package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical check of k-core's per-round claim (test scope):
  * `sbt "Test/runMain graft.operators.KCoreScaleDemo [k]"` peels the
  * sf0.1 part–supplier bipartite graph (~760 k distinct undirected
  * edges) and reports each round's edge count and wall time. The
  * design claim is MONOTONE SHRINK: every round's work (one degree
  * agg + two semi-joins) is bounded by the PREVIOUS round's surviving
  * edges, so per-round wall should track the shrinking frontier — a
  * round that grows, or flat wall over a collapsing graph, would mean
  * the plan re-derives the full input each round (exactly the lineage
  * explosion the per-round checkpoint cut exists to prevent; without
  * the cut this demo OOMs in the ANALYZER around round 8).
  *
  * Also measures the linkPrediction wedge bound on the same graph:
  * Σ deg² with and without the maxDegree hub cap — the knob that keeps
  * the wedge join's output finite when a hub would explode it.
  */
object KCoreScaleDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = args.headOption.map(_.toInt).getOrElse(8)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val edges = li.select(concat(lit("p"), col("l_partkey")).as("src"),
      concat(lit("s"), col("l_suppkey")).as("dst"))
      .distinct().localCheckpoint()
    println(s"[kcore] input edges=${edges.count()}, k=$k")

    // instrumented copy of the operator loop: same cut discipline,
    // per-round (edges, wall) reported
    def degrees(e: org.apache.spark.sql.DataFrame) =
      e.select(col("a").as("n")).union(e.select(col("b").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("d"))
    var cur = edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint(true)
    var curCount = cur.count()
    var round = 0
    var converged = false
    while (round < 30 && !converged) {
      val t0 = System.nanoTime()
      val keep = degrees(cur).filter(col("d") >= k).select(col("n"))
      val next = cur
        .join(keep.withColumnRenamed("n", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("n", "b"), Seq("b"), "left_semi")
        .select(col("a"), col("b")).localCheckpoint(true)
      val nextCount = next.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[kcore] round ${round + 1}: edges $curCount%,d -> " +
        f"$nextCount%,d  (${secs}%.2f s)")
      if (nextCount == curCount) converged = true
      else { cur = next; curCount = nextCount }
      round += 1
    }
    println(s"[kcore] converged=$converged after $round rounds; " +
      s"surviving edges=$curCount")

    // wedge-bound measurement for linkPrediction's maxDegree guard
    val canon = edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val adj = canon.select(col("a").as("z"))
      .union(canon.select(col("b").as("z")))
      .groupBy("z").agg(count(lit(1)).as("d"))
    def wedges(cap: Long): Long = {
      val kept = if (cap > 0) adj.filter(col("d") <= cap) else adj
      kept.agg(sum((col("d") * (col("d") - 1) / 2).cast("long")))
        .head().getLong(0)
    }
    val full = wedges(0)
    for (cap <- Seq(1000L, 200L, 50L)) {
      val w = wedges(cap)
      println(f"[kcore] wedge bound: cap=$cap%4d -> $w%,15d " +
        f"(${100.0 * w / full}%.1f%% of uncapped $full%,d)")
    }
    spark.stop()
  }
}
