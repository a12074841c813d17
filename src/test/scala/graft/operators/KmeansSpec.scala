package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** [[Similarity.kmeans]] — hand-checkable Lloyd's fixpoints, the
  * empty-cluster carry-over rule, and the map-only assignment plan
  * (the 100 TB property: no join/exchange on the assignment path). */
class KmeansSpec extends SparkSpec {

  private def emb(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("two well-separated groups converge to the hand-computed clustering") {
    // init c0=(0,0), c1=(0,1); round 1 pulls c1 to the far group's side
    // (mean of (0,1),(10,10),(10,11)), round 2 separates cleanly.
    val e = emb(
      0L -> Seq(0f, 0f), 1L -> Seq(0f, 1f),
      2L -> Seq(10f, 10f), 3L -> Seq(10f, 11f))
    val out = Similarity.kmeans(e, "vec_id", "embedding", k = 2, iters = 2)
      .orderBy("vec_id")
      .select("vec_id", "cluster").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("exact-distance ties assign to the lowest cluster index") {
    // duplicate init vectors: every point is equidistant to c0 and c1
    // at round 1 — all must land on cidx 0, never split by plan order.
    val e = emb(0L -> Seq(1f, 1f), 1L -> Seq(1f, 1f), 2L -> Seq(5f, 5f))
    val out = Similarity.kmeans(e, "vec_id", "embedding", k = 2, iters = 0)
    // iters=0: assignment under the raw init centroids (both (1,1))
    assert(out.select("cluster").distinct().collect().map(_.getLong(0)).toSet === Set(0L))
  }

  test("a cluster that loses all members keeps its previous centroid") {
    // k=3 with three identical points at 0 and one at 5: ties send all
    // of 0,1,2 to cidx 0 in round 1, so clusters 1 and 2 go empty and
    // must carry their init centroid (0,0) instead of vanishing. Round
    // 2 then re-attracts the 0-points to cluster 1 (dist 0 beats the
    // moved c0), proving the carried centroid stays live.
    val e = emb(
      0L -> Seq(0f, 0f), 1L -> Seq(0f, 0f), 2L -> Seq(0f, 0f),
      3L -> Seq(5f, 0f))
    val out = Similarity.kmeans(e, "vec_id", "embedding", k = 3, iters = 1)
      .orderBy("vec_id")
      .select("vec_id", "cluster").collect().map(r => (r.getLong(0), r.getLong(1)))
    // after 1 update: c0=(1.25,0) (mean of all four), c1=c2=(0,0) carried
    // → 0,1,2 land on c1 (dist 0, lowest tied index), 3 stays on c0.
    assert(out.toSeq === Seq(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 0L))
  }

  test("dist2 is the squared distance to the final centroid") {
    val e = emb(0L -> Seq(0f, 0f), 1L -> Seq(0f, 2f))
    // k=1: centroid after 1 round = (0,1); both points at dist² 1.
    val out = Similarity.kmeans(e, "vec_id", "embedding", k = 1, iters = 1)
      .orderBy("vec_id").select("dist2").collect().map(_.getDouble(0))
    assert(out.toSeq === Seq(1.0, 1.0))
  }

  test("assignment path is map-only: no exchange below the final sort") {
    val e = Tables100
    val plan = Similarity.kmeans(e, "vec_id", "embedding", k = 4, iters = 0)
      .queryExecution.executedPlan.toString
    // iters=0 isolates the assignment stage: one scan → project; the
    // argmin over centroid literals must not introduce a join, window,
    // or aggregate-driven exchange.
    assert(!plan.contains("Join"), s"assignment plan joined:\n$plan")
    assert(!plan.contains("Window"), s"assignment plan windowed:\n$plan")
  }

  private def Tables100 = {
    import spark.implicits._
    (0L until 100L).map(i => (i, Seq.tabulate(8)(j => (i * 7 + j).toFloat % 13)))
      .toDF("vec_id", "embedding")
  }

  test("semanticDedupKmeans keeps the component member farthest from centroid") {
    // k=1, iters=0 → centroid = vec 0 = (1,1).
    // dist²: v0=0, v1=82, v2=83.81, v3=17.
    // cos ≥ 0.99 pairs within the cluster: only (1,2) (colinear);
    // v0=(1,1) sits at 45° to both. Components: {1,2} keeps v2 (the
    // FARTHEST from centroid — the SemDeDup prune rule, not lowest id);
    // singletons 0 and 3 survive untouched.
    val e = emb(
      0L -> Seq(1f, 1f), 1L -> Seq(10f, 0f),
      2L -> Seq(10.1f, 0f), 3L -> Seq(0f, 5f))
    val out = Similarity.semanticDedupKmeans(e, "vec_id", "embedding",
        k = 1, iters = 0, threshold = 0.99)
      .orderBy("vec_id")
      .select("vec_id").collect().map(_.getLong(0))
    assert(out.toSeq === Seq(0L, 2L, 3L))
  }

  test("knnLabelConsistency matches the hand-computed neighbor fractions") {
    import spark.implicits._
    // single cluster (k=1, iters=0). x-axis trio mutually cos 1.0;
    // v3 orthogonal (cos 0 to all). k=2 neighbors, cos ties → lowest id.
    val e = Seq(
      (0L, Seq(1f, 0f), 0), (1L, Seq(2f, 0f), 0),
      (2L, Seq(3f, 0f), 1), (3L, Seq(0f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.knnLabelConsistency(e, "vec_id", "embedding", "label",
        kNeighbors = 2, kClusters = 1, iters = 0)
      .orderBy("vec_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (0L, 0L, 2L, 0.5), // neighbors v1 (label 0), v2 (label 1)
      (1L, 0L, 2L, 0.5), // v0, v2
      (2L, 1L, 2L, 0.0), // v0, v1 — mislabeled point scores 0
      (3L, 1L, 2L, 0.0))) // cos ties at 0.0 → ids 0,1 win → labels 0,0
  }

  test("matches the gate query shape on real embeddings (all rows assigned)") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Similarity.kmeans(e, "vec_id", "embedding", k = 4, iters = 2)
    val n = e.count()
    assert(out.count() === n)
    assert(out.filter(col("cluster").isNull || col("dist2") < 0).count() === 0)
  }

  test("embeddingStats: orthogonal basis scores anisotropy 0.5, a collapsed cone scores 1.0") {
    import spark.implicits._
    val ortho = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val g1 = Similarity.embeddingStats(ortho, "vec_id", "embedding")
      .as[(Long, Double, Double, Double)].head()
    val sqrtHalf = BigDecimal(math.sqrt(0.5))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(g1 == ((2L, 1.0, sqrtHalf, 0.5)), s"got $g1")
    // every vector identical: expected random-pair cosine is 1
    val cone = Seq((1L, Seq(3.0, 4.0)), (2L, Seq(3.0, 4.0)))
      .toDF("vec_id", "embedding")
    val g2 = Similarity.embeddingStats(cone, "vec_id", "embedding")
      .as[(Long, Double, Double, Double)].head()
    assert(g2 == ((2L, 5.0, 5.0, 1.0)), s"got $g2")
  }

  test("principalComponent: rank-1 data recovers the exact direction; iterating is a fixpoint") {
    import spark.implicits._
    // points t·(0.6, 0.8): centered data is rank-1, so ONE iteration
    // lands exactly on the direction (positive sign because v0 = e_x
    // and d_x > 0); the 6-dp quantize snaps the ulp noise
    val pts = Seq(-2.0, -1.0, 0.0, 1.0, 3.0).zipWithIndex.map {
      case (t, i) => (i.toLong, Seq(0.6 * t, 0.8 * t))
    }.toDF("vec_id", "embedding")
    val got = Similarity.principalComponent(pts, "vec_id", "embedding",
        iters = 1)
      .orderBy("pos").as[(Long, Double)].collect().toSeq
    assert(got == Seq((0L, 0.6), (1L, 0.8)), s"got $got")
    val more = Similarity.principalComponent(pts, "vec_id", "embedding",
        iters = 3)
      .orderBy("pos").as[(Long, Double)].collect().toSeq
    assert(more == got, s"extra iterations moved a converged PC: $more")
  }

  test("embeddingDrift: same-distribution eras read cosine 1, a " +
      "flipped era reads -1 with full share below threshold") {
    import spark.implicits._
    val same = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(1.0, 0.0)),
      (2L, Seq(1.0, 0.0)), (3L, Seq(1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val s = Similarity.embeddingDrift(same, "vec_id", "embedding",
      col("vec_id") % 2 === 0).head()
    assert(s.getAs[Long]("n_ref") === 2L)
    assert(s.getAs[Double]("mean_cosine") === 1.0)
    assert(s.getAs[Double]("share_below") === 0.0)
    val flip = Seq((0L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.0)),
      (1L, Seq(-1.0, 0.0)), (3L, Seq(-1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val f = Similarity.embeddingDrift(flip, "vec_id", "embedding",
      col("vec_id") % 2 === 0).head()
    assert(f.getAs[Double]("mean_cosine") === -1.0)
    assert(f.getAs[Double]("share_below") === 1.0)
  }

  test("silhouetteSimplified: well-separated 1-D clusters score " +
      "0.995, coincident points score 0") {
    import spark.implicits._
    // after 2 rounds: centroids 0.05 and 10.05; every point sits 0.05
    // from its own centroid and ~10 from the other
    val emb = Seq((0L, Seq(0.0)), (1L, Seq(0.1)), (2L, Seq(10.0)),
      (3L, Seq(10.1))).toDF("vec_id", "embedding")
    val out = Similarity.silhouetteSimplified(emb, "vec_id",
      "embedding", k = 2, iters = 2).collect()
    assert(out.length === 2)
    assert(out.forall(_.getAs[Double]("mean_silhouette") === 0.995))
    assert(out.map(_.getAs[Long]("n")).toSeq === Seq(2L, 2L))
    // all points identical: a = b = 0 -> s defined as 0
    val same = Seq((0L, Seq(1.0)), (1L, Seq(1.0)), (2L, Seq(1.0)))
      .toDF("vec_id", "embedding")
    val deg = Similarity.silhouetteSimplified(same, "vec_id",
      "embedding", k = 2, iters = 1).collect()
    assert(deg.map(_.getAs[Double]("mean_silhouette")).forall(_ === 0.0))
  }
}
