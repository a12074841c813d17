package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The size-ratio prefilter (VERDICT r2 §2): J(A,B) ≤ min/max of the set
  * sizes, so pruning pairs under the threshold's ratio BEFORE the
  * array-verify join must change the verified-pair count, never the
  * thresholded output. */
class DedupPrefilterSpec extends SparkSpec {
  import spark.implicits._

  // c duplicates a (J=1); b embeds a's tokens in a 4× longer doc, so the
  // (a,b)/(b,c) pairs are LSH candidates but size-ratio-prunable at 0.5
  private lazy val docs = {
    val base = (1 to 8).map(i => s"tok$i").mkString(" ")
    val long = base + " " + (9 to 40).map(i => s"tok$i").mkString(" ")
    Seq((1L, base), (2L, long), (3L, base)).toDF("doc_id", "text")
  }

  test("prefiltered jaccard: identical thresholded rows, fewer verified pairs") {
    val sh = Dedup.shingleHashes(docs, "doc_id", "text", 3)
    val la = sh.select(col("doc").as("a"), col("h"))
    val rb = sh.select(col("doc").as("b"), col("h"))
    val pairs = la.join(rb, Seq("h")).where(col("a") < col("b"))
      .select("a", "b").distinct()

    val full = Dedup.jaccard(sh, pairs)
    val pruned = Dedup.jaccard(sh, pairs, minJaccard = 0.5)
    // raw output rows = pairs that reached the verify join
    assert(pruned.count() < full.count(),
      s"prefilter should verify fewer pairs: ${pruned.count()} vs ${full.count()}")

    val t = (df: org.apache.spark.sql.DataFrame) =>
      df.where(col("jac") >= 0.5).orderBy("a", "b")
        .as[(Long, Long, Double)].collect().toSeq
    assert(t(pruned) == t(full), "thresholded output must be identical")
    assert(t(full) == Seq((1L, 3L, 1.0)), "only the exact duplicate survives 0.5")
  }

  test("ngramJaccardPairs end-to-end matches its unprefiltered self") {
    val out = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .orderBy("a", "b").as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 3L, 1.0)))
  }

  test("contamination of a corpus against itself is total (frac 1.0 everywhere)") {
    val corpus = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val got = Dedup.contamination(corpus, corpus, "doc_id", "text", n = 3)
    val withGrams = corpus.filter(size(split(col("text"), " ")) >= 3).count()
    assert(got.count() == withGrams, "every doc with >=1 gram must self-hit")
    assert(got.filter(col("frac") =!= 1.0).count() == 0)
  }

  test("contamination reports hit count and fraction, omits clean docs") {
    // corpus 10: grams {w1w2w3, w2w3w4}; ref shares w2w3w4 -> 1/2
    val corpus = Seq((10L, "w1 w2 w3 w4"), (11L, "a b c d")).toDF("doc_id", "text")
    val ref = Seq((1L, "w2 w3 w4 w9")).toDF("doc_id", "text")
    val got = Dedup.contamination(corpus, ref, "doc_id", "text", n = 3)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((10L, 1L, 0.5)))
  }
}
