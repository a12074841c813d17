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

  test("editDistancePairs: short-string arm catches pairs the gram arm cannot see") {
    val df = Seq(
      "ab", "cd",            // distance 2, ZERO shared bigrams — short arm only
      "kettle", "kettles",   // distance 1, long enough for the gram arm
      "battle",              // two substitutions from kettle; 3 from kettles
      "xylophone")           // no partner
      .toDF("s")
    val got = Dedup.editDistancePairs(df, "s", maxDist = 2)
      .orderBy("a", "b").as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("ab", "cd", 2L), ("battle", "kettle", 2L),
      ("kettle", "kettles", 1L)), s"got $got")
    assert(levenshteinRef("battle", "kettle") == 2 &&
      levenshteinRef("battle", "kettles") == 3) // the excluded pair
  }

  test("editDistancePairs prefilter is lossless vs brute force on a dense set") {
    // 60 deterministic strings over a 3-letter alphabet, lengths 2-7:
    // dense in edit space, so every prefilter hole would show
    val strs = (0 until 60).map { i =>
      val len = 2 + i % 6
      (0 until len).map(j => ('a' + (i * 7 + j * 3) % 3).toChar).mkString
    }.distinct
    val df = strs.toDF("s")
    val fast = Dedup.editDistancePairs(df, "s", maxDist = 2)
      .as[(String, String, Long)].collect().toSet
    val brute = (for {
      a <- strs; b <- strs if a < b
      d = levenshteinRef(a, b) if d <= 2
    } yield (a, b, d.toLong)).toSet
    assert(fast == brute,
      s"prefilter lost ${(brute -- fast).take(5)} / invented ${(fast -- brute).take(5)}")
  }

  test("crossSourceDuplication: shared texts counted per source pair, singletons absent") {
    // textA in s1+s2+s3, textB in s1+s2, textC in s1 only:
    // (s1,s2)=2, (s1,s3)=1, (s2,s3)=1; textC creates no pair
    val docs = Seq(
      ("A", "s1"), ("A", "s2"), ("A", "s3"),
      ("B", "s1"), ("B", "s2"),
      ("C", "s1"),
      // duplicate rows within one source must not inflate counts
      ("A", "s1"))
      .toDF("text", "source")
    val got = Dedup.crossSourceDuplication(docs, "text", "source")
      .orderBy("source_a", "source_b")
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("s1", "s2", 2L), ("s1", "s3", 1L),
      ("s2", "s3", 1L)), s"got $got")
  }

  test("minhashCalibration: identical docs estimate 1.0 exactly with zero error") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "a completely different sentence about spark engines here"))
      .toDF("doc_id", "text")
    val got = Dedup.minhashCalibration(docs, "doc_id", "text")
      .orderBy("a", "b")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    // identical docs collide in every band and agree on all 16 mins
    assert(got.exists(r => r._1 == 1L && r._2 == 2L &&
      r._3 == 1.0 && r._4 == 1.0 && r._5 == 0.0), s"got $got")
    // every estimate is a multiple of 1/16 and errors are |est-exact|
    assert(got.forall(r => (r._3 * 16).round.toDouble == r._3 * 16),
      s"estimates must be dyadic sixteenths: $got")
  }

  test("nearDupThresholdCurve: cumulative counts descend from the top band") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "the quick brown fox jumps over the lazy cat tonight"),
      (4L, "unrelated words about completely different things entirely"))
      .toDF("doc_id", "text")
    val got = Dedup.nearDupThresholdCurve(docs, "doc_id", "text")
      .orderBy("threshold")
      .as[(Double, Long, Long)].collect().toSeq
    // the identical pair lands in the top band (jac 1.0 -> band 0.9,
    // top-inclusive); cumulative counts are non-increasing upward
    assert(got.exists(r => r._1 == 0.9 && r._2 >= 1), s"got $got")
    val cums = got.map(_._3)
    assert(cums == cums.sorted(Ordering[Long].reverse),
      s"cumulative must be non-increasing in threshold: $got")
    assert(got.map(_._2).sum == got.map(_._3).max,
      "top cumulative must equal total pairs")
  }

  test("containmentPairs: the quote scores 1.0 inside its host, the host scores its fraction back") {
    import spark.implicits._
    // A's 3 shingles are all inside B's 6: containment(A in B) = 1.0,
    // containment(B in A) = 3/6 = 0.5 — the asymmetry Jaccard (3/6)
    // cannot express directionally
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e f g h"),
      (3L, "x y z w")) // unrelated: shares nothing
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .containmentPairs(docs, "doc_id", "text", shingleSize = 3,
        threshold = 0.4)
      .orderBy("a", "b")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 3L, 3L, 1.0),
      (2L, 1L, 6L, 3L, 0.5)), s"got $got")
    // raise the bar: only the full containment survives
    val tight = graft.operators.Dedup
      .containmentPairs(docs, "doc_id", "text", shingleSize = 3,
        threshold = 0.8)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(tight == Seq((1L, 2L, 3L, 3L, 1.0)), s"got $tight")
  }

  test("lshBlockingProfile: bucket counts, exact pair budget, skew") {
    import spark.implicits._
    // band 0: one bucket of 3 docs + one singleton -> C(3,2)=3 pairs,
    // skew = max/avg = 3 / (4/2) = 1.5; band 1: two singletons -> 0
    val bk = Seq(
      (1L, 0L, "k1"), (2L, 0L, "k1"), (3L, 0L, "k1"), (4L, 0L, "k2"),
      (1L, 1L, "a"), (2L, 1L, "b"))
      .toDF("doc", "band", "bkey")
    val got = graft.operators.Dedup.lshBlockingProfile(bk)
      .orderBy("band")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 3L, 3L, 1.5),
      (1L, 2L, 1L, 0L, 1.0)), s"got $got")
  }

  /** Textbook DP reference implementation for the property test. */
  test("dupClusterProfile: hand size histogram and non-canonical char savings") {
    import spark.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L),
        (5L, 4L), (6L, 6L))
      .toDF("doc_id", "cluster")
    val weights = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 5L),
        (5L, 7L), (6L, 9L))
      .toDF("doc_id", "n_chars")
    val got = Dedup.dupClusterProfile(clusters, "doc_id", "cluster",
        weights, "doc_id", "n_chars")
      .orderBy("cluster_size")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 1L, 0L),   // singleton: nothing to save
      (2L, 1L, 2L, 7L),   // doc 5's chars
      (3L, 1L, 3L, 50L)), // docs 2+3
      s"got $got")
  }

  private def levenshteinRef(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("prefixDupRate: corpus-wide prefix groups, per-source rates") {
    import spark.implicits._
    // "aaaaa" prefix shared across THREE docs spanning two sources —
    // the group is corpus-wide, so s2's lone member still counts dup
    val docs = Seq(
      (1L, "aaaaaX", "s1"), (2L, "aaaaaY", "s1"), (3L, "bbbbbZ", "s1"),
      (4L, "aaaaaQ", "s2"), (5L, "cccccW", "s2"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.prefixDupRate(docs, "doc_id", "text", "source",
        prefixLen = 5)
      .orderBy("source")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("s1", 3L, 2L, 0.666667), ("s2", 2L, 1L, 0.5)),
      s"got $got")
  }

  test("crossSourceDupMatrix: pairwise shared texts, null text excluded, pairs keyed once") {
    val docs = Seq(
      (1L, "alpha", "s1"), (2L, "beta", "s1"),
      (3L, "alpha", "s2"), (4L, "gamma", "s2"),
      (5L, "alpha", "s3"), (6L, null.asInstanceOf[String], "s3"),
      (7L, "alpha", "s1") // duplicate within s1: still ONE distinct text
    ).toDF("doc_id", "text", "source")
    val got = Dedup.crossSourceDupMatrix(docs, "text", "source")
      .orderBy("source_a", "source_b")
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("s1", "s2", 1L), ("s1", "s3", 1L), ("s2", "s3", 1L)),
      s"got $got")
  }
}
