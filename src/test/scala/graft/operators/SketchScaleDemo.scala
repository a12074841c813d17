package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical check of the sketch tier's scale claim (test scope):
  * `sbt "Test/runMain graft.operators.SketchScaleDemo [nRows] [nKeys]"`
  * runs the cardinality sketches against their exact twins over a
  * synthetic key stream far above the gates' cardinalities (default
  * 50 M rows / 20 M distinct keys). What the numbers should show:
  *
  *  - exact `count(distinct)`'s shuffle carries EVERY distinct key —
  *    its cost grows with cardinality;
  *  - HLL's shuffle carries ≤ m register rows per mapper and KMV's
  *    ≤ k candidate rows per partition — their cost is the SCAN, flat
  *    in cardinality at fixed input size;
  *  - the estimates land within the published error bounds
  *    (1.04/√m ≈ 3.3% at m = 1024; ~1/√k ≈ 6% at k = 256).
  *
  * Keys are deterministic (hash-mixed hex, collision-free by
  * construction), so reruns time the same work.
  */
object SketchScaleDemo {
  def main(args: Array[String]): Unit = {
    val nRows = if (args.length > 0) args(0).toLong else 50000000L
    val nKeys = if (args.length > 1) args(1).toLong else 20000000L
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = s"/tmp/sketch_demo_${nRows}_$nKeys"
    spark.range(nRows).select(
        concat(lit("k_"), lpad(hex(xxhash64(pmod(col("id"),
          lit(nKeys)))), 16, "0")).as("k"))
      .write.mode("overwrite").parquet(path)
    val rows = spark.read.parquet(path)
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val out = body
      println(f"[sketchdemo] $label%-14s ${(System.nanoTime() - t0) / 1e9}%.1f s")
      out
    }
    val exact = time("exact-distinct") {
      rows.agg(countDistinct(col("k"))).collect().head.getLong(0)
    }
    // estimate-only paths (no truth ride-along — the production shape)
    val hll = time("hll-m1024") {
      Sketch.hllEstimateFromRegisters(
          Sketch.hllRegisterTable(rows, col("k"), 1024), 1024)
        .collect().head.getAs[Double]("estimate")
    }
    val kmv = time("kmv-k256") {
      val sk = Sketch.kmvBottomK(rows, col("k"), 256)
        .agg(count(lit(1)).as("n"), max(col("__h")).as("u"))
        .collect().head
      if (sk.getLong(0) < 256) sk.getLong(0).toDouble
      else 255.0d * 281474976710656.0d / sk.getLong(1).toDouble
    }
    val f2 = time("ams-d9") {
      Sketch.amsSignSums(rows, col("k"), 9)
        .agg(expr("percentile(__s * __s, 0.5)")).collect().head.getDouble(0)
    }
    def err(e: Double) = math.abs(e - exact) / exact.toDouble
    println(f"[sketchdemo] exact=$exact hll=$hll%.0f (${err(hll) * 100}%.2f%%) " +
      f"kmv=$kmv%.0f (${err(kmv) * 100}%.2f%%) amsF2=$f2%.3g")
    require(err(hll) < 0.10, s"HLL off by ${err(hll)}")
    require(err(kmv) < 0.20, s"KMV off by ${err(kmv)}")
    spark.stop()
  }
}
