package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical check of the distributed BPE trainer's scale claim (r17
  * verdict #4 — BpeSpec pins driver ≡ distributed on fixtures; this
  * demo executes the distributed rounds path at real width):
  * `sbt "Test/runMain graft.operators.BpeScaleDemo [nWords] [merges]"`
  *
  * Two arms, both requiring BIT-IDENTICAL merge tables:
  *  1. the sf0.1 documents corpus with `maxDriverWords = 1` — the
  *     distributed path on the real gate data (its ~50-word synthetic
  *     vocabulary is tiny; this arm proves path identity, not scale);
  *  2. a synthetic vocabulary of `nWords` DISTINCT 16-hex-char words
  *     (default 1 M — 200× the driver threshold's design margin per
  *     round of magnitude, far above any gate fixture), driver path
  *     vs distributed path (`maxDriverWords` forced below nWords),
  *     timing both. The distributed path's cost = merges × (one
  *     pair-count aggregate bounded by distinct adjacent pairs after
  *     map-side combine + one 1-row argmax + one map-only rewrite),
  *     checkpoint-cut every 16 rounds — the word frame never exceeds
  *     the distinct vocabulary regardless of corpus size, which is
  *     the whole 100 TB story: the corpus collapses to its word
  *     histogram in ONE pass and every round after that is
  *     vocabulary-bounded.
  */
object BpeScaleDemo {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val merges = if (args.length > 1) args(1).toInt else 24
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val out = f
      println(f"[bpedemo] $label%-22s ${(System.nanoTime() - t0) / 1e9}%.1f s")
      out
    }

    // arm 1: the real sf0.1 corpus, distributed path forced
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val realDriver = time("sf0.1 driver") {
      TextAnalysis.bpeTrainMerges(docs, "text", merges)
    }
    val realDist = time("sf0.1 distributed") {
      TextAnalysis.bpeTrainMerges(docs, "text", merges, maxDriverWords = 1L)
    }
    require(realDriver == realDist,
      s"sf0.1 paths diverged:\n$realDriver\n$realDist")
    println(s"[bpedemo] sf0.1 corpus: ${realDriver.size} merges, " +
      "driver == distributed bit-identical")

    // arm 2: a 1M-distinct-word vocabulary (every word one row; BPE
    // collapses the corpus to its histogram first, so row multiplicity
    // only changes counts, not the shape being measured)
    val path = s"/tmp/bpe_demo_vocab_$n"
    spark.range(n)
      .select(lower(lpad(hex(xxhash64(col("id"))), 16, "0")).as("text"))
      .write.mode("overwrite").parquet(path)
    val wide = spark.read.parquet(path)
    val nDistinct = wide.distinct().count()
    val wideDriver = time(s"wide($n) driver") {
      TextAnalysis.bpeTrainMerges(wide, "text", merges)
    }
    val wideDist = time(s"wide($n) distributed") {
      TextAnalysis.bpeTrainMerges(wide, "text", merges,
        maxDriverWords = 1000L)
    }
    require(wideDriver == wideDist,
      s"wide paths diverged:\n$wideDriver\n$wideDist")
    println(s"[bpedemo] wide corpus: $nDistinct distinct words, " +
      s"${wideDriver.size} merges trained, driver == distributed " +
      s"bit-identical; first 5: ${wideDriver.take(5)}")
    spark.stop()
  }
}
