package graft.ml

import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collaborative-filtering recommender (ALS matrix factorization) over
  * implicit feedback — the "customers who bought X also buy Y" layer a
  * retail demand engine (the reference's M5 domain) sits next to, and
  * the complement of [[graft.operators.Retail.marketBasket]]: basket
  * rules see only DIRECT co-occurrence, factorization generalizes
  * through the latent space to pairs never seen in one basket.
  *
  * Scale notes: ALS is THE block-partitioned distributed factorizer —
  * each iteration solves per-user / per-item least squares against
  * block-local factor copies, shuffling factors not ratings; cost
  * scales with nnz(ratings)·rank per sweep, and `setNumBlocks`
  * controls the parallel grain on a real cluster. Implicit-feedback
  * mode (Hu-Koren-Volinsky) treats counts as CONFIDENCE, not values —
  * the right likelihood for purchase logs, where absence is weak (not
  * negative) evidence. Training is seeded and deterministic under a
  * fixed seed + fixed partitioning (golden-testable, like the GBT
  * tier — ML fits are spec/golden-checked, never oracle-hashed,
  * SURVEY §5.3).
  */
object Recommender {

  /** Aggregate a transaction log to implicit-feedback ratings:
    * (user, item, count). One map-side-combinable agg — the only
    * data-sized pass; ALS then touches only this matrix. */
  def implicitRatings(
      transactions: DataFrame,
      userCol: String,
      itemCol: String): DataFrame =
    transactions.groupBy(
        col(userCol).cast("int").as("user"),
        col(itemCol).cast("int").as("item"))
      .agg(count(lit(1)).cast("float").as("rating"))

  /** Fit implicit-feedback ALS. Cold-start rows (users/items unseen at
    * fit time) yield NaN predictions by default; we drop them — the
    * contract a top-k recommender needs. */
  def fitImplicit(
      ratings: DataFrame,
      rank: Int = 8,
      maxIter: Int = 10,
      regParam: Double = 0.1,
      alpha: Double = 10.0,
      seed: Long = 42L): ALSModel =
    new ALS()
      .setUserCol("user").setItemCol("item").setRatingCol("rating")
      .setImplicitPrefs(true)
      .setRank(rank).setMaxIter(maxIter).setRegParam(regParam)
      .setAlpha(alpha).setSeed(seed)
      .setColdStartStrategy("drop")
      .fit(ratings)

  /** Top-k item recommendations per user, EXCLUDING items the user
    * already interacted with (the standard serving filter — without
    * it the model mostly recommends the user's own history back).
    * Returns (user, item, score, rank). */
  def recommendTopK(
      model: ALSModel,
      seen: DataFrame,
      k: Int): DataFrame = {
    // guaranteed headroom: k unseen survivors need k + (max items any
    // user has seen) candidates, because the seen-filter can strike at
    // most that many per user; a fixed multiple (k*2 etc.) silently
    // under-delivers for heavy users
    val maxSeen = seen.groupBy(col("user")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head().getLong(0).toInt
    val recs = model.recommendForAllUsers(k + maxSeen)
      .select(col("user"), explode(col("recommendations")).as("r"))
      .select(col("user"), col("r.item").as("item"),
        col("r.rating").as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user"))
      .orderBy(col("score").desc, col("item"))
    recs.join(seen.select(col("user"), col("item")).distinct(),
        Seq("user", "item"), "left_anti")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
