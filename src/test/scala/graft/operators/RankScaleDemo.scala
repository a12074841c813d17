package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical check of the r15 chunked-rank migration's scale claim
  * (test scope):
  * `sbt "Test/runMain graft.operators.RankScaleDemo [nKeys]"`
  * runs [[Relational.labelEncode]] (now on [[Relational.chunkedRank]])
  * against its single-partition `Window.orderBy` twin over a synthetic
  * vocabulary far above the gate's ~5 k values (default 10 M — the
  * billion-key-vocabulary direction the labelEncode scaladoc names).
  * The chunked form's rank work spreads across range partitions
  * (every window bounded at the chunk-count summary); the window form
  * moves the WHOLE vocabulary to ONE task. Codes are spot-compared on
  * a deterministic sample — the demo measures the shape difference
  * the migration exists to preserve, now without the zipWithIndex RDD
  * round-trip.
  *
  * Values are deterministic (hash-mixed hex strings, near-unique), so
  * reruns time the same work.
  */
object RankScaleDemo {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.DataFrame
    val path = s"/tmp/rank_demo_vocab_$n"
    spark.range(n).select(
        concat(lit("v_"), lpad(hex(xxhash64(col("id"))), 16, "0"),
          lit("_"), col("id")).as("v"))
      .write.mode("overwrite").parquet(path)
    val vocab = spark.read.parquet(path)
    def time(label: String)(df: => DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      val out = df
      out.write.format("noop").mode("overwrite").save()
      println(f"[rankdemo] $label%-10s ${(System.nanoTime() - t0) / 1e9}%.1f s")
      out
    }
    val chunked = time("chunked") { Relational.labelEncode(vocab, "v") }
    val windowed = time("window") {
      Relational.labelEncodeWindow(vocab, "v")
    }
    // equivalence spot-check on a deterministic key sample
    val sampleIds = (0L until 1000L).map(i => i * (n / 1000L))
    val sampleKeys = spark.range(n)
      .filter(col("id").isin(sampleIds: _*))
      .select(concat(lit("v_"), lpad(hex(xxhash64(col("id"))), 16, "0"),
        lit("_"), col("id")).as("v"))
      .collect().map(_.getString(0)).toSeq
    val a = chunked.filter(col("v").isin(sampleKeys: _*))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = windowed.filter(col("v").isin(sampleKeys: _*))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(a == b, s"chunked != window codes on the sample: ${
      a.toSeq.sortBy(_._1).take(3)} vs ${b.toSeq.sortBy(_._1).take(3)}")
    println(s"[rankdemo] n=$n keys, sample of ${sampleKeys.size}: identical")
    spark.stop()
  }
}
