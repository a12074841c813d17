package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Approximate/exact nearest-neighbor search over an embedding column
  * (`array<float>`), SURVEY.md §2.5 X15.
  *
  * Scale design: the query set is always the small side → broadcast it;
  * the candidate scan is embarrassingly parallel. Top-k selection is
  * TWO-PHASE so no single reducer ever sees the full candidate set:
  * phase 1 ranks within (query, input-partition) — parallel width =
  * #queries × #partitions; phase 2 ranks the surviving k × #partitions
  * rows per query. At 100 TB the phase-2 input is tiny.
  */
object Similarity {

  /** Per-row normalized float64 view of an embeddings table. */
  def prepared(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).as("vec_id"), Vectors.toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))

  /** Brute-force cosine top-k for a fixed set of query ids. Cosines are
    * rounded to `roundDigits` BEFORE ranking (ties broken by vec_id
    * ascending) so the ranking is reproducible across engines. */
  def cosineTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: Seq[Int],
      k: Int,
      roundDigits: Int = 4): DataFrame = {
    val base = prepared(emb, idCol, vecCol)
    val q = base.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = base.join(broadcast(q), col("vec_id") =!= col("q"))
      .withColumn("cos",
        round(Vectors.cosineWithNorms(col("qv"), col("v"), col("qn"), col("nrm")),
          roundDigits))
      .select(col("q"), col("vec_id"), col("cos"))
    twoPhaseTopK(scored, k)
  }

  /** LSH-bucketed ANN: random-hyperplane sign buckets (planes = a fixed,
    * deterministic subset of the corpus itself so both engines derive
    * identical planes). Candidates are restricted to the query's bucket
    * — the scan cost drops by ~2^numPlanes at the cost of recall. */
  def annLshTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: Seq[Int],
      planeIds: Seq[Int],
      k: Int,
      roundDigits: Int = 4): DataFrame = {
    val base = prepared(emb, idCol, vecCol)
    val planes = base.filter(col("vec_id").isin(planeIds: _*))
      .select(col("vec_id").as("pid"), col("v").as("pv"))
    // bucket = sum_j [dot(v, plane_j) > 0] * 2^rank_j  (rank_j = order of
    // planeIds as given). Planes are tiny → broadcast, one pass.
    val planeRank = planeIds.zipWithIndex.map { case (id, i) => (id, i) }
    val rankExpr = planeRank.foldLeft(lit(0)) { case (acc, (id, i)) =>
      acc + when(col("pid") === id, lit(1 << i)).otherwise(0)
    }
    val bucketed = base.join(broadcast(planes))
      .withColumn("bit", when(Vectors.dot(col("v"), col("pv")) > 0d, rankExpr).otherwise(0))
      .groupBy(col("vec_id"), col("v"), col("nrm"))
      .agg(sum(col("bit")).cast("bigint").as("bucket"))
    val q = bucketed.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q"), col("v").as("qv"), col("nrm").as("qn"),
        col("bucket").as("qbucket"))
    val scored = bucketed.join(broadcast(q),
        col("bucket") === col("qbucket") && col("vec_id") =!= col("q"))
      .withColumn("cos",
        round(Vectors.cosineWithNorms(col("qv"), col("v"), col("qn"), col("nrm")),
          roundDigits))
      .select(col("q"), col("vec_id"), col("cos"))
    twoPhaseTopK(scored, k)
  }

  /** Embedding near-duplicate pairs: all (a < b) with rounded cosine ≥
    * threshold. Brute-force O(n²) form — the LSH-bucketed variant above
    * is the scale path; this is the oracle-checkable exact form. */
  def cosineNearDupPairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      roundDigits: Int = 4): DataFrame = {
    val base = prepared(emb, idCol, vecCol)
    val right = base.select(col("vec_id").as("b_id"), col("v").as("bv"),
      col("nrm").as("bn"))
    base.join(right, col("vec_id") < col("b_id"))
      .withColumn("cos",
        round(Vectors.cosineWithNorms(col("v"), col("bv"), col("nrm"), col("bn")),
          roundDigits))
      .filter(col("cos") >= threshold)
      .select(col("vec_id").as("a"), col("b_id").as("b"), col("cos"))
  }

  /** Two-phase distributed top-k per query group (see object doc). */
  private def twoPhaseTopK(scored: DataFrame, k: Int): DataFrame = {
    val local = scored.withColumn("__part", spark_partition_id())
    val w1 = Window.partitionBy(col("q"), col("__part"))
      .orderBy(col("cos").desc, col("vec_id"))
    val survivors = local
      .withColumn("__r", row_number().over(w1)).filter(col("__r") <= k)
    val w2 = Window.partitionBy(col("q")).orderBy(col("cos").desc, col("vec_id"))
    survivors
      .withColumn("rank", row_number().over(w2).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("q"), col("rank"), col("vec_id"), col("cos"))
  }
}
