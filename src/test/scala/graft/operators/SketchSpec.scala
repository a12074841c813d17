package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Sketch aggregates (the approximate tier for 100 TB cardinality /
  * quantile work — sketches can't be oracle-hashed against DuckDB
  * because sketch internals differ, so they're accuracy-tested against
  * the exact answers instead). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct (HLL++) within its rsd bound of the exact count") {
    val li = Tables.lineitem(spark, dir)
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx")).head()
    val (exact, approx) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    val err = math.abs(approx - exact) / exact
    info(f"HLL: exact=${exact.toLong} approx=${approx.toLong} err=$err%.4f")
    assert(err < 0.06, s"HLL error out of bound: $err") // 3× rsd headroom
  }

  test("approx_percentile within rank tolerance of the exact percentile") {
    val li = Tables.lineitem(spark, dir)
    val n = li.count()
    val accuracy = 1000 // rank error ≤ n / accuracy
    val row = li.agg(
      percentile(col("l_extendedprice"), lit(0.5)).as("exact"),
      approx_percentile(col("l_extendedprice"), lit(0.5), lit(accuracy)).as("approx")).head()
    val (exact, approx) = (row.getDouble(0), row.getDouble(1))
    // translate the rank guarantee into a value bound via the exact
    // quantiles at the tolerated ranks
    val tol = n.toDouble / accuracy / n // fraction of rank space
    val bounds = li.agg(
      percentile(col("l_extendedprice"), lit(0.5 - 2 * tol)).as("lo"),
      percentile(col("l_extendedprice"), lit(0.5 + 2 * tol)).as("hi")).head()
    info(f"p50: exact=$exact%.2f approx=$approx%.2f window=[${bounds.getDouble(0)}%.2f, ${bounds.getDouble(1)}%.2f]")
    assert(approx >= bounds.getDouble(0) && approx <= bounds.getDouble(1),
      s"approx p50 $approx outside rank-tolerance window")
  }

  test("HLL sketches MERGE: per-shard sketches union to the global estimate") {
    // the incremental-cardinality pattern at 100 TB: each day/shard
    // keeps a tiny hll_sketch_agg state; the corpus-wide distinct count
    // is a union of sketches — the raw shards are never rescanned. Here
    // the shards are l_orderkey ranges (disjoint, all parts appear in
    // several shards) and the merged estimate must match the global
    // exact count within datasketches' ~2% band at lgK=12.
    val li = Tables.lineitem(spark, dir)
    val sharded = li.withColumn("__shard", col("l_orderkey") % 8)
    val perShard = sharded.groupBy(col("__shard"))
      .agg(hll_sketch_agg(col("l_partkey"), lit(12)).as("sk"))
    assert(perShard.count() == 8)
    val merged = perShard
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0).toDouble
    val exact = li.agg(countDistinct(col("l_partkey"))).head().getLong(0).toDouble
    val err = math.abs(merged - exact) / exact
    info(f"merged HLL: exact=${exact.toLong} est=${merged.toLong} err=$err%.4f")
    assert(err < 0.05, s"merged-sketch error out of bound: $err")
    // NOTE deliberately NOT asserted: estimate-level idempotence of
    // self-union. Datasketches' union estimator is HIP-based, and HIP
    // updates with every inserted sketch — re-inserting the same sketch
    // legally shifts the estimate within the error band. What IS stable
    // is the merge result for a fixed input set:
    val again = perShard
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0).toDouble
    assert(again == merged, "same shard set must merge deterministically")
  }

  test("count_min_sketch term frequencies: never undercount, within eps*N over") {
    // the heavy-hitter sketch shape for corpus-scale term stats: ONE
    // aggregation builds the mergeable sketch (executors each sketch a
    // partition, partial-merge combines), the driver probes candidates
    val terms = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("term"))
    val eps = 0.001
    val sketchBytes = terms
      .agg(count_min_sketch(col("term"), lit(eps), lit(0.99), lit(42)).as("s"))
      .head().getAs[Array[Byte]]("s")
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchBytes))
    val n = terms.count()
    val truth = terms.groupBy("term").count()
      .orderBy(col("count").desc).limit(20)
      .as[(String, Long)].collect()
    truth.foreach { case (t, exact) =>
      val est = cms.estimateCount(t) // String probes hash the same UTF-8 bytes the agg added
      assert(est >= exact, s"CMS undercounted '$t': $est < $exact")
      assert(est <= exact + (eps * 2 * n).toLong,
        s"CMS overcount for '$t' beyond 2*eps*N: $est vs $exact (N=$n)")
    }
  }
}
