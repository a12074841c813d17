package graft.ml

import graft.SparkSpec

/** ALS recommender on planted block structure: two disjoint taste
  * communities; held-out in-community items must outrank every
  * cross-community item, and the seen-filter must hold. ML tier —
  * spec/golden-checked under a fixed seed, never oracle-hashed
  * (SURVEY §5.3). */
class RecommenderSpec extends SparkSpec {
  import spark.implicits._

  // community A: users 0-9 × items 0-9; community B: users 10-19 ×
  // items 10-19. Each user misses TWO in-community items (held out).
  private def transactions = (for {
    u <- 0 until 20
    i <- 0 until 20
    if (u < 10) == (i < 10)              // same community only
    if i != (u * 3) % 10 + (if (u < 10) 0 else 10)       // holdout 1
    if i != (u * 3 + 1) % 10 + (if (u < 10) 0 else 10)   // holdout 2
    rep <- 1 to 1 + (u + i) % 3          // varying counts
  } yield (u, i, rep)).toDF("cust", "part", "rep")

  test("ALS on planted communities: held-out items recommended in-community, seen items excluded") {
    val ratings = Recommender.implicitRatings(transactions, "cust", "part")
    val model = Recommender.fitImplicit(ratings, rank = 4, maxIter = 10)
    val seen = ratings.select($"user", $"item")
    val recs = Recommender.recommendTopK(model, seen, k = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(recs.nonEmpty)
    // 1) no recommendation repeats a seen item
    val seenSet = seen.as[(Int, Int)].collect().toSet
    assert(recs.forall(p => !seenSet.contains(p)),
      "seen items must be filtered out of recommendations")
    // 2) every rank-1 recommendation stays inside the user's community
    //    (the two held-out items are the only unseen in-community ones)
    val crossCommunity = recs.filter { case (u, i) => (u < 10) != (i < 10) }
    assert(crossCommunity.isEmpty,
      s"block structure must dominate, got cross-community recs: $crossCommunity")
    // 3) per-user exactly k = 2 and they are exactly the two holdouts
    recs.groupBy(_._1).foreach { case (u, rs) =>
      val expect = Set((u * 3) % 10 + (if (u < 10) 0 else 10),
        (u * 3 + 1) % 10 + (if (u < 10) 0 else 10))
      assert(rs.map(_._2).toSet == expect,
        s"user $u must get its two held-out items, got ${rs.map(_._2)}")
    }
  }

  test("ALS fit is deterministic under the fixed seed") {
    val ratings = Recommender.implicitRatings(transactions, "cust", "part")
    def run() = Recommender.recommendTopK(
        Recommender.fitImplicit(ratings, rank = 4, maxIter = 5),
        ratings.select($"user", $"item"), k = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(3))).toSet
    assert(run() == run(), "same seed + same data must reproduce the ranking")
  }
}
