package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Winnowing's defining property (SIGMOD'03 §2): any shared token run
  * of length ≥ w+k-1 guarantees a shared fingerprint. */
class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  test("a shared w+k-1 token run yields a shared fingerprint across docs") {
    val shared = "q1 q2 q3 q4 q5 q6" // 6 tokens = w+k-1 for k=3, w=4
    val docs = Seq(
        (1L, s"a1 a2 a3 $shared b1 b2"),
        (2L, s"c1 $shared d1 d2 d3 d4")).toDF("doc_id", "text")
    val fps = Dedup.winnowedFingerprints(docs, "doc_id", "text")
    val f1 = fps.filter(col("doc") === 1).select("fp").as[Long].collect().toSet
    val f2 = fps.filter(col("doc") === 2).select("fp").as[Long].collect().toSet
    assert((f1 & f2).nonEmpty, "guaranteed shared fingerprint missing")
  }

  test("short docs: <k tokens yield none, <w grams yield exactly one") {
    val docs = Seq((1L, "a b"), (2L, "a b c d")).toDF("doc_id", "text")
    val fps = Dedup.winnowedFingerprints(docs, "doc_id", "text")
    assert(fps.filter(col("doc") === 1).count() == 0) // 2 tokens < k=3
    assert(fps.filter(col("doc") === 2).count() == 1) // 2 grams < w=4
  }

  test("WinnowedMins kernel equals the HOF spec on the real corpus") {
    import org.apache.spark.sql.graft.ColumnBridge
    val toks = graft.functions.Text.tokens(col("text"))
    val grams = ColumnBridge.column(graft.functions.expressions.WordShingleHashes(
      ColumnBridge.expression(toks), 3))
    val base = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), grams.as("g"))
    val kernel = ColumnBridge.column(graft.functions.expressions.WinnowedMins(
      ColumnBridge.expression(col("g")), 4))
    // null-safe inequality: =!= is NULL when either side is NULL, which
    // would silently drop exactly the rows where the twins could
    // diverge on null handling
    val diff = base.select(col("doc_id"),
        kernel.as("a"), graft.functions.Text.winnowedMins(col("g"), 4).as("b"))
      .filter(!(col("a") <=> col("b"))).count()
    assert(diff == 0, "kernel and HOF winnowing must agree on every doc")
  }

  test("near-dup pairs: identical docs share all fingerprints, disjoint docs none") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val other = (31 to 60).map(i => s"v$i").mkString(" ")
    val docs = Seq((1L, base), (2L, base), (3L, other)).toDF("doc_id", "text")
    val pairs = Dedup.winnowingNearDupPairs(docs, "doc_id", "text")
      .select("a", "b").as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L)))
  }
}
