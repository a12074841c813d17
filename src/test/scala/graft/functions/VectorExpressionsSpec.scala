package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The codegen'd expressions must agree exactly with their readable
  * built-in/HOF specifications — these tests pin that equivalence. */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def floatVecs(n: Int, dim: Int): Seq[Array[Float]] =
    (0 until n).map(i => Array.tabulate(dim)(j =>
      (math.sin(i * 31 + j * 7) * 10).toFloat))

  test("DotProduct == HOF aggregate over float64-cast arrays, bit for bit") {
    val df = floatVecs(50, 64).zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("id", "v")
    val paired = df.select(col("id"), col("v"))
      .crossJoin(df.select(col("id").as("id2"), col("v").as("w")))
      .filter(col("id") < col("id2"))
    val cmp = paired.select(
      Vectors.dot(col("v"), col("w")).as("fast"),
      Vectors.dotHof(Vectors.toDouble(col("v")), Vectors.toDouble(col("w"))).as("spec"))
      .filter(col("fast") =!= col("spec"))
    assert(cmp.count() == 0, "codegen dot must equal the HOF spec exactly")
  }

  test("DotProduct on double arrays and norm identity") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val r = df.select(Vectors.dot(col("a"), col("b")), Vectors.norm(col("a"))).head()
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-12)
  }

  test("DotProduct: mismatched lengths yield NULL, matching the HOF form") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f)),   // ragged → null
      (Array(1.0f, 2.0f), Array(3.0f, 4.0f)))          // well-formed → 11
      .toDF("a", "b")
    val rows = df.select(
      Vectors.dot(col("a"), col("b")).as("fast"),
      Vectors.dotHof(Vectors.toDouble(col("a")), Vectors.toDouble(col("b"))).as("spec"))
      .collect()
    assert(rows(0).isNullAt(0), "ragged input must surface as NULL, not a partial dot")
    assert(rows(0).isNullAt(1), "HOF spec should also be NULL on ragged input")
    assert(rows(1).getDouble(0) == 11.0 && rows(1).getDouble(1) == 11.0)
  }

  test("WordShingleHashes == charHash of the joined shingle string, per window") {
    import org.apache.spark.sql.graft.ColumnBridge
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b", "a b c", "one", "",
      "double  space here",             // empty token from the double space
      "trailing space ", " leading",
      "punct, mid-token! and 123 mixed").toDF("text")
    val fast = texts.select(explode(ColumnBridge.column(
        graft.functions.expressions.WordShingleHashes(
          ColumnBridge.expression(Text.tokens(col("text"))), 3))).as("h"))
      .collect().map(_.getLong(0)).toSeq
    val spec = texts.select(explode(Text.shingles(col("text"), 3)).as("s"))
      .select(Hashing.charHash(col("s")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(fast == spec)
  }

  test("SortedIntersectCount == size(array_intersect) on sorted distinct arrays") {
    val gen = (0 until 30).map { i =>
      val a = (0 until 40).map(j => ((i * 31 + j * 17) % 97).toLong).distinct.sorted.toArray
      val b = (0 until 40).map(j => ((i * 13 + j * 23) % 97).toLong).distinct.sorted.toArray
      (a, b)
    }
    val df = gen.toDF("a", "b")
    import org.apache.spark.sql.graft.ColumnBridge
    val inter = ColumnBridge.column(
      graft.functions.expressions.SortedIntersectCount(
        ColumnBridge.expression(col("a")), ColumnBridge.expression(col("b"))))
    val bad = df.select(inter.as("fast"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("spec"))
      .filter(col("fast") =!= col("spec"))
    assert(bad.count() == 0)
  }

  test("NgramDistinctCount == size(array_distinct(grams)) incl. edge cases") {
    // repeated grams, all-same tokens, fewer tokens than n, empty string
    val texts = Seq("a b a b a", "x x x x", "one", "", "a b c d e",
      "p q p q p q p q")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for (n <- Seq(1, 2, 3)) {
      val fast = graft.operators.TextAnalysis
        .repetitionStats(df, "doc_id", "text", n)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      val spec = graft.operators.TextAnalysis
        .repetitionStatsHof(df, "doc_id", "text", n)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(fast == spec, s"n=$n")
    }
    // and on the real corpus at the gate's n=2
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
    val a = graft.operators.TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = graft.operators.TextAnalysis.repetitionStatsHof(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("int8 quantize: dequantized cosine >= 0.995 vs exact on every corpus vector") {
    import org.apache.spark.sql.functions.{col, min => sqlMin}
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
      .withColumn("scale", Vectors.int8Scale(col("embedding")))
      .withColumn("q", Vectors.quantizeInt8(col("embedding"), col("scale")))
      .withColumn("deq", Vectors.dequantizeInt8(col("q"), col("scale")))
    val worst = e.select(Vectors.cosine(
        Vectors.toDouble(col("embedding")), col("deq")).as("c"))
      .agg(sqlMin(col("c"))).head().getDouble(0)
    assert(worst >= 0.995, s"int8 reconstruction too lossy: worst cosine $worst")
    val zeros = Seq((1L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
      .select(Vectors.quantizeInt8(col("embedding"),
        Vectors.int8Scale(col("embedding"))).as("q"))
      .head().getSeq[Byte](0)
    assert(zeros == Seq(0, 0), "zero vector must quantize to zeros, not NaN")
  }
}
