package graft

import org.apache.spark.sql.functions.lit

/** The bench harness's measurement contract (r7 VERDICT "What's wrong"
  * #1/#2): deterministic query order, loud setup failures that fail the
  * query rather than silently absorbing the one-time build into the
  * timed runs, and SPARK_GRAFT_ONLY validation. */
class BenchSpec extends SparkSpec {

  test("selectQueries runs in sorted name order, stable across additions") {
    val names = Bench.selectQueries(None).map(_._1)
    assert(names == names.sorted,
      "bench order must be sorted so adding a query never reshuffles " +
        "every other query's JVM/GC neighborhood")
    assert(!names.contains("x44_embedding_neardup"),
      "gateOnly oracle twins stay out of the default bench")
  }

  test("explicit SPARK_GRAFT_ONLY overrides the gateOnly exclusion") {
    val names = Bench.selectQueries(Some(Set("x44_embedding_neardup"))).map(_._1)
    assert(names == Seq("x44_embedding_neardup"),
      "naming a query explicitly is a request to time it, gateOnly or not")
  }

  test("SPARK_GRAFT_ONLY with an unknown name fails instead of benching nothing") {
    val e = intercept[RuntimeException] {
      Bench.selectQueries(Some(Set("x41_minhash_neardup", "x99_typo")))
    }
    assert(e.getMessage.contains("x99_typo"),
      s"the unknown name must be reported: ${e.getMessage}")
  }

  test("a broken benchSetup fails the query with -1, never a timed run") {
    val t = Bench.measure(spark, "/nonexistent", "q_broken",
      (s, _) => s.range(1).toDF(),
      setup = Some((_, _) => sys.error("setup exploded")))
    assert(t.median == -1.0 && t.runs.forall(_ == -1.0),
      s"setup failure must yield the -1 sentinel, got $t")
  }

  test("a healthy query measures a positive median over all runs, with telemetry") {
    val t = Bench.measure(spark, "unused", "q_ok",
      (s, _) => s.range(10).toDF().withColumn("c", lit(1)), setup = None)
    assert(t.median > 0 && t.runs.size == 3 && t.runs.forall(_ > 0),
      s"expected 3 positive runs, got $t")
    // degradation telemetry (r13 verdict #1): GC delta is non-negative
    // by construction, heap-in-use is a real positive reading
    assert(t.gcMs >= 0 && t.heapMb > 0, s"telemetry must be sane: $t")
  }

  test("a query that throws mid-run records -1 for the whole query") {
    val t = Bench.measure(spark, "unused", "q_fail",
      (_, _) => sys.error("query exploded"), setup = None)
    assert(t.median == -1.0)
  }
}
