package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical check of X41's cost claim (test scope):
  * `sbt "Test/runMain graft.operators.ProbeScaleDemo"` probes the SAME
  * fixed-size batch against persisted near-dup indexes over corpora
  * 100× apart (sf0.001 → sf0.1). If the probe is O(batch + candidates)
  * as documented — corpus contributes stored band keys to candidate
  * generation and stored sets for candidate docs only, never a text
  * scan — probe time should stay near-flat while the corpus grows
  * 100×; anything close to linear growth would falsify the design.
  * Index builds are untimed (the one-time cost the index amortizes). */
object ProbeScaleDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // fixed batch: the sf0.001 batch slice (last 10% of its id space) —
    // identical rows probed at every scale, so only the corpus varies.
    // localCheckpoint: the probe must not re-read sf0.001 parquet and
    // muddy the timing with scan variance.
    val small = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bMax = small.agg(coalesce(max(col("doc_id")), lit(-1L))).head().getLong(0)
    val batch = small.filter(col("doc_id") >= (bMax + 1L) * 9L / 10L)
      .select(col("doc_id"), col("text")).localCheckpoint()
    val batchN = batch.count()

    val work = java.nio.file.Files.createTempDirectory("probe-scale").toString
    // the driver's documents table is 500 rows at sf0.001 AND sf0.01,
    // 5,000 at sf0.1 — so the provided corpora only span 10×. The
    // "sf0.1x10" point replicates sf0.1 with shifted ids (same texts,
    // disjoint id space — every shingle set appears 10×, so the band
    // side sees the densest-possible growth) to stretch the corpus
    // range to 100× over the smallest point.
    val lines = Seq("sf0.001", "sf0.01", "sf0.1", "sf0.1x10").map { sf =>
      val docs =
        if (sf == "sf0.1x10") {
          val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
          (0 until 10).map(i => base.select(
              (col("doc_id") + lit(i * 10000L)).as("doc_id"), col("text")))
            .reduce(_ unionByName _)
        } else spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      val cMax = docs.agg(coalesce(max(col("doc_id")), lit(-1L))).head().getLong(0)
      val corpus = docs.filter(col("doc_id") < (cMax + 1L) * 9L / 10L)
      val corpusN = corpus.count()
      val index = Dedup.ensurePersistedIndex(
        corpus, "doc_id", "text", s"$work/idx_$sf")
      def once(): (Double, Long) = {
        val scope = graft.util.CacheScope()
        try {
          val t0 = System.nanoTime()
          val n = Dedup.minhashNearDupsAgainstIndex(
            batch, index, "doc_id", "text", threshold = 0.35, scope).count()
          ((System.nanoTime() - t0) / 1e9, n)
        } finally scope.unpersistAll()
      }
      once() // warm (codegen, parquet footers)
      val runs = (1 to 3).map(_ => once())
      val median = runs.map(_._1).sorted.apply(1)
      f"[probescale] sf=$sf corpusDocs=$corpusN batchDocs=$batchN " +
        f"pairs=${runs.head._2} probeMedianSec=$median%.2f " +
        f"runs=${runs.map(r => f"${r._1}%.2f").mkString(",")}"
    }
    lines.foreach(println)
    spark.stop()
  }
}
