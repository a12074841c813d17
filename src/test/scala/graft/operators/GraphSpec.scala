package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PageRank: hand-computed fixpoint properties on tiny graphs. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: symmetric 2-cycle splits rank evenly") {
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val r = Graph.pageRank(edges, "src", "dst", iterations = 5)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    // perfect symmetry: each node holds exactly half the mass at every
    // iteration, so the fixed-point value is exact
    assert(math.abs(r("a") - 0.5) < 1e-12)
    assert(math.abs(r("b") - 0.5) < 1e-12)
  }

  test("pageRank: hub receives more rank than spokes; total mass = 1") {
    // star: three spokes all point at hub; hub points back at one spoke
    val edges = Seq(("s1", "h"), ("s2", "h"), ("s3", "h"), ("h", "s1"))
      .toDF("src", "dst")
    // the h↔s1 cycle makes early iterates oscillate (rank sloshes
    // between them each round, contraction 0.85² per 2 rounds) — 30
    // rounds is safely inside the fixpoint for either parity
    val r = Graph.pageRank(edges, "src", "dst", iterations = 30)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("h") > r("s1") && r("s1") > r("s2"))
    assert(r("s2") == r("s3")) // symmetric spokes stay identical
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("pageRank: dangling sink's mass is redistributed, not lost") {
    // a -> b, b is a sink; without the dangling correction total mass
    // decays toward the teleport floor instead of staying 1
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val r = Graph.pageRank(edges, "src", "dst", iterations = 20)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    assert(r("b") > r("a")) // b receives a's full contribution
  }

  test("pageRank: one-iteration update matches the formula exactly") {
    // a->b, b->a, c->a : N=3, after 1 round from uniform 1/3:
    //   r(a) = 0.15/3 + 0.85*(1/3 + 1/3) = 0.05 + 0.85*2/3
    //   r(b) = 0.15/3 + 0.85*(1/3)
    //   r(c) = 0.15/3 (no in-edges; c is NOT a sink)
    val edges = Seq(("a", "b"), ("b", "a"), ("c", "a")).toDF("src", "dst")
    val r = Graph.pageRank(edges, "src", "dst", iterations = 1)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(r("a") - (0.05 + 0.85 * (1.0 / 3 + 1.0 / 3))) < 1e-12)
    assert(math.abs(r("b") - (0.05 + 0.85 * (1.0 / 3))) < 1e-12)
    assert(math.abs(r("c") - 0.05) < 1e-12)
  }

  test("triangleCount: K4 has 4, triangle+tail has 1, square has 0") {
    def count(es: Seq[(String, String)]): (Long, Long, Long) = {
      val r = Graph.triangleCount(es.toDF("src", "dst"), "src", "dst").head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val k4 = Seq("a" -> "b", "a" -> "c", "a" -> "d",
      "b" -> "c", "b" -> "d", "c" -> "d")
    assert(count(k4) == ((4L, 6L, 4L)))
    val triTail = Seq("a" -> "b", "b" -> "c", "c" -> "a", "c" -> "d")
    assert(count(triTail) == ((4L, 4L, 1L)))
    val square = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a")
    assert(count(square) == ((4L, 4L, 0L)))
  }

  test("triangleCount orientation: a hub emits no wedges (the Σ outdeg² bound is real)") {
    // star: hub h — 200 leaves, plus one leaf-leaf edge closing one
    // triangle. Naive wedge enumeration centered anywhere would emit
    // C(200,2) ≈ 20k wedges at the hub; degree-ordering orients every
    // star edge INTO the hub (it has the highest degree), so the hub's
    // out-degree is 0 and total wedges stay O(m). The count is still
    // exact: the one triangle is found from its lowest-degree corner.
    val leaves = (1 to 200).map(i => (f"l$i%03d", "hub"))
    val closing = Seq(("l001", "l002"))
    val df = (leaves ++ closing).toDF("src", "dst")
    val r = Graph.triangleCount(df, "src", "dst").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((201L, 201L, 1L)))
    // pin the mechanism, not just the count: every star edge orients
    // INTO the max-degree hub, so its out-degree — and wedge
    // contribution — is exactly zero
    val canon = df.select(
      least(col("src"), col("dst")).as("a"),
      greatest(col("src"), col("dst")).as("b")).distinct()
    val deg = canon.select(col("a").as("n"))
      .union(canon.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val hubOut = Graph.orientByDegree(canon, deg)
      .filter(col("u") === "hub").count()
    assert(hubOut == 0L, s"hub emitted $hubOut oriented edges")
  }

  test("triangleCount canonicalizes: reversed duplicates, self-loops, multi-edges collapse") {
    val messy = Seq(
      "a" -> "b", "b" -> "a", "a" -> "b",   // one undirected edge
      "b" -> "c", "c" -> "a",
      "a" -> "a")                           // self-loop dropped
      .toDF("src", "dst")
    val r = Graph.triangleCount(messy, "src", "dst").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 3L, 1L)))
  }

  test("clusteringCoefficient: K4 cores at 1.0, tail dilutes its anchor, leaves null") {
    import spark.implicits._
    // K4 on {a,b,c,d} + tail edge a-e: b,c,d keep coeff 1.0 (all 3
    // neighbor pairs closed); a has degree 4 with 3 of 6 pairs closed
    // -> 0.5; e has degree 1 -> undefined (null)
    val k4 = for {
      x <- Seq("a", "b", "c", "d"); y <- Seq("a", "b", "c", "d")
      if x < y
    } yield (x, y)
    val df = (k4 :+ ("a" -> "e")).toDF("src", "dst")
    val got = Graph.clusteringCoefficient(df, "src", "dst")
      .orderBy("node")
      .as[(String, Long, Long, Option[Double])].collect().toSeq
    assert(got == Seq(
      ("a", 4L, 3L, Some(0.5)),
      ("b", 3L, 3L, Some(1.0)),
      ("c", 3L, 3L, Some(1.0)),
      ("d", 3L, 3L, Some(1.0)),
      ("e", 1L, 0L, None)), s"got $got")
  }

  test("clusteringCoefficient: a star center closes no neighbor pairs -> 0.0") {
    import spark.implicits._
    val star = Seq("hub" -> "l1", "hub" -> "l2", "hub" -> "l3")
      .toDF("src", "dst")
    val got = Graph.clusteringCoefficient(star, "src", "dst")
      .filter(col("node") === "hub")
      .as[(String, Long, Long, Option[Double])].head()
    assert(got == (("hub", 3L, 0L, Some(0.0))), s"got $got")
  }

  test("linkPrediction: hand-computed RA scores, adjacent pairs excluded") {
    import spark.implicits._
    // path a-b-c-d plus hub edge b-e:
    //   (a,c) share b, deg(b)=3 -> RA 1/3; (b,d) share c, deg(c)=2 ->
    //   RA 1/2; (a,e)/(c,e) share b -> 1/3; (b,d) must outrank the
    //   1/3 pairs; adjacent pairs never appear
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "d", "b" -> "e")
      .toDF("src", "dst")
    val got = Graph.linkPrediction(edges, "src", "dst", topK = 10)
      .orderBy("node_a", "node_b")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("a", "c", 1L, 0.333333), ("a", "e", 1L, 0.333333),
      ("b", "d", 1L, 0.5), ("c", "e", 1L, 0.333333)), s"got $got")
  }

  test("personalizedPageRank: mass flows from the seeds only; dangling returns to them") {
    import spark.implicits._
    // s -> {t1, t2}, u -> t3; teleport {s}: u's branch never gains
    // mass, and sink mass teleports back to s, not uniformly
    val edges = Seq("s" -> "t1", "s" -> "t2", "u" -> "t3")
      .toDF("src", "dst")
    val seeds = Seq("s").toDF("seed")
    def r6(x: Double) = BigDecimal(x)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val base = 1.0 - 0.85
    val got1 = Graph.personalizedPageRank(edges, "src", "dst", seeds,
        "seed", iterations = 1)
      .orderBy("node").as[(String, Double)].collect().toSeq
    val r1t = base * 0.0 + 0.85 * (1.0 / 2 + 0.0 * 0.0)
    assert(got1 == Seq(("s", r6(base * 1.0 + 0.85 * (0.0 + 0.0 * 1.0))),
      ("t1", r6(r1t)), ("t2", r6(r1t)), ("t3", 0.0), ("u", 0.0)),
      s"got $got1")
    // round 2: the 0.85 of mass parked on the sinks teleports to s
    val r1s = base * 1.0 + 0.85 * (0.0 + 0.0 * 1.0)
    val dm1 = r1t + r1t + 0.0
    val r2s = base * 1.0 + 0.85 * (0.0 + dm1 * 1.0)
    val r2t = base * 0.0 + 0.85 * (r1s / 2 + dm1 * 0.0)
    val got2 = Graph.personalizedPageRank(edges, "src", "dst", seeds,
        "seed", iterations = 2)
      .orderBy("node").as[(String, Double)].collect().toSeq
    assert(got2 == Seq(("s", r6(r2s)), ("t1", r6(r2t)), ("t2", r6(r2t)),
      ("t3", 0.0), ("u", 0.0)), s"got $got2")
    // a teleport set disjoint from the graph is a caller error
    val bad = Seq("zz").toDF("seed")
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(edges, "src", "dst", bad, "seed", 1)
    }
  }

  test("shortestHops: multi-source BFS layers, maxHops horizon, unreachable absent") {
    import spark.implicits._
    // path a-b-c-d-e plus isolated pair x-y; seeds {a, e}: hops
    // min(from a, from e) -> a:0 b:1 c:2 d:1 e:0; x,y unreachable
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e",
      "x" -> "y").toDF("src", "dst")
    val seeds = Seq("a", "e").toDF("seed")
    val got = Graph.shortestHops(edges, "src", "dst", seeds, "seed")
      .orderBy("node").as[(String, Long)].collect().toSeq
    assert(got == Seq("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 1L,
      "e" -> 0L), s"got $got")
    // horizon: maxHops=1 from {a} reaches only a, b
    val one = Graph.shortestHops(edges, "src", "dst",
        Seq("a").toDF("seed"), "seed", maxHops = 1)
      .orderBy("node").as[(String, Long)].collect().toSeq
    assert(one == Seq("a" -> 0L, "b" -> 1L), s"got $one")
    intercept[IllegalArgumentException] {
      Graph.shortestHops(edges, "src", "dst",
        Seq("zz").toDF("seed"), "seed")
    }
  }

  test("kCore: the peel cascades (a chain peels to nothing), cycles survive") {
    import spark.implicits._
    // path a-b-c-d-e at k=2: ends have degree 1; peeling them exposes
    // new degree-1 ends — a single threshold pass would KEEP b,c,d,
    // the iterative peel must remove everything
    val path = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e")
      .toDF("src", "dst")
    assert(Graph.kCore(path, "src", "dst", k = 2).isEmpty,
      "chain must peel to nothing at k=2")
    // a 4-cycle is its own 2-core
    val cycle = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a")
      .toDF("src", "dst")
    val got = Graph.kCore(cycle, "src", "dst", k = 2)
      .orderBy("node").as[(String, Long)].collect().toSeq
    assert(got == Seq("a", "b", "c", "d").map(_ -> 2L), s"got $got")
  }

  test("kCore: K4 survives a hanging tail at k=3; degrees are in-core degrees") {
    import spark.implicits._
    val k4 = for {
      x <- Seq("a", "b", "c", "d"); y <- Seq("a", "b", "c", "d")
      if x < y
    } yield (x, y)
    val df = (k4 :+ ("a" -> "e")).toDF("src", "dst")
    val got = Graph.kCore(df, "src", "dst", k = 3)
      .orderBy("node").as[(String, Long)].collect().toSeq
    // e peels (degree 1); a's degree drops from 4 to its IN-CORE 3
    assert(got == Seq("a", "b", "c", "d").map(_ -> 3L), s"got $got")
  }

  test("kCore: maxRounds cuts deterministically mid-peel (the oracle-parity contract)") {
    import spark.implicits._
    val path = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e")
      .toDF("src", "dst")
    // ONE peel of the 5-path at k=2 removes the ends only: b-c, c-d
    // remain with degrees b:1 c:2 d:1
    val got = Graph.kCore(path, "src", "dst", k = 2, maxRounds = 1)
      .orderBy("node").as[(String, Long)].collect().toSeq
    assert(got == Seq("b" -> 1L, "c" -> 2L, "d" -> 1L), s"got $got")
  }

  test("linkPrediction: maxDegree drops hub centers; multi-neighbor sums are exact") {
    import spark.implicits._
    // square a-b-c-d-a: (a,c) share b AND d (deg 2 each) -> RA 1.0;
    // with maxDegree=1 every center is dropped -> empty
    val sq = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a")
      .toDF("src", "dst")
    val got = Graph.linkPrediction(sq, "src", "dst", topK = 10)
      .orderBy("node_a", "node_b")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(("a", "c", 2L, 1.0), ("b", "d", 2L, 1.0)), s"got $got")
    assert(Graph.linkPrediction(sq, "src", "dst", topK = 10, maxDegree = 1)
      .isEmpty)
  }

  test("degreeAssortativity: star graph is perfectly disassortative, regular graph has no variance") {
    import org.apache.spark.sql.functions.col
    // star: hub h - a/b/c, degrees (3,1,1,1): every edge pairs 3 with 1
    // in both orientations -> r = -1 exactly
    val star = Seq(("h", "a"), ("h", "b"), ("h", "c")).toDF("src", "dst")
    val s = Graph.degreeAssortativity(star, "src", "dst").head()
    assert(s.getLong(0) == 3L && s.getDouble(1) == -1.0, s"got $s")
    // triangle: all degrees 2 -> zero variance -> null r, never NaN
    val k3 = Seq(("a", "b"), ("b", "c"), ("a", "c")).toDF("src", "dst")
    val t = Graph.degreeAssortativity(k3, "src", "dst").head()
    assert(t.getLong(0) == 3L && t.isNullAt(1), s"got $t")
    // duplicate + self-loop edges canonicalize away like triangleCount
    val messy = Seq(("a", "b"), ("b", "a"), ("a", "a"), ("b", "c"))
      .toDF("src", "dst")
    assert(Graph.degreeAssortativity(messy, "src", "dst")
      .head().getLong(0) == 2L)
  }

  test("powerLawAlpha matches the hand MLE and dedups parallel edges") {
    import spark.implicits._
    // degrees 2, 1, 4 -> alpha = 1 + 3/ln(64) = 1.721348
    val edges = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("c", "x"),
      ("c", "y"), ("c", "z"), ("c", "w"), ("c", "w")) // dup edge
      .toDF("src", "dst")
    val r = Graph.powerLawAlpha(edges, "src", "dst").head()
    assert(r.getAs[Long]("n_nodes") === 3L)
    assert(r.getAs[Long]("max_degree") === 4L)
    assert(r.getAs[Double]("alpha") === 1.721348)
  }

  test("hits converges to the hand fixed point on the bipartite " +
      "fan and zeroes the unreachable sides") {
    import spark.implicits._
    // h1 -> {a1, a2}, h2 -> {a2, a3}: a2 is doubly endorsed
    val edges = Seq(("h1", "a1"), ("h1", "a2"), ("h2", "a2"),
      ("h2", "a3")).toDF("src", "dst")
    val out = Graph.hits(edges, "src", "dst", iterations = 3)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("hub"), r.getAs[Double]("authority"))).toMap
    assert(out("h1") === ((0.5, 0.0)))
    assert(out("h2") === ((0.5, 0.0)))
    assert(out("a2") === ((0.0, 0.5)))
    assert(out("a1") === ((0.0, 0.25)))
    assert(out("a3") === ((0.0, 0.25)))
  }

  test("labelPropagation: planted two-clique graph with one bridge " +
      "recovers both communities; sizes are member counts") {
    import spark.implicits._
    // K4 on {a1..a4}, K4 on {b1..b4}, one bridge a4-b1
    def clique(ns: Seq[String]) =
      for { x <- ns; y <- ns if x < y } yield (x, y)
    val edges = (clique(Seq("a1", "a2", "a3", "a4")) ++
      clique(Seq("b1", "b2", "b3", "b4")) ++ Seq(("a4", "b1")))
      .toDF("src", "dst")
    val out = Graph.labelPropagation(edges, "src", "dst", rounds = 5)
      .collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(Seq("a1", "a2", "a3", "a4").map(out(_)._1).distinct ===
      Seq("a1"))
    assert(Seq("b1", "b2", "b3", "b4").map(out(_)._1).distinct ===
      Seq("b1"))
    assert(out("a1")._2 === 4L && out("b1")._2 === 4L)
  }

  test("modularity: two planted cliques grade 0.211538 each " +
      "(hand Newman terms); one-community partition grades 0") {
    import spark.implicits._
    def clique(ns: Seq[String]) =
      for { x <- ns; y <- ns if x < y } yield (x, y)
    val edges = (clique(Seq("a1", "a2", "a3", "a4")) ++
      clique(Seq("b1", "b2", "b3", "b4")) ++ Seq(("a4", "b1")))
      .toDF("src", "dst")
    // m=13; each clique: L=6, D=13 -> Q_c = 6/13 - (13/26)^2 = .211538
    val twoWay = Seq(("a1", "A"), ("a2", "A"), ("a3", "A"), ("a4", "A"),
      ("b1", "B"), ("b2", "B"), ("b3", "B"), ("b4", "B"))
      .toDF("node", "community")
    val out = Graph.modularity(edges, "src", "dst", twoWay,
      "node", "community").collect()
      .map(r => r.getAs[String]("community") ->
        (r.getAs[Long]("internal_edges"), r.getAs[Long]("degree_sum"),
          r.getAs[Double]("q_contrib"), r.getAs[Double]("q_total"),
          r.getAs[Long]("n_unassigned_nodes"))).toMap
    assert(out("A") === ((6L, 13L, 0.211538, 0.423076, 0L)))
    assert(out("B") === ((6L, 13L, 0.211538, 0.423076, 0L)))
    // everything in one community: L=m, D=2m -> Q = 1 - 1 = 0
    val oneWay = twoWay.select($"node", lit("ALL").as("community"))
    val q1 = Graph.modularity(edges, "src", "dst", oneWay,
      "node", "community").collect().head.getAs[Double]("q_total")
    assert(q1 === 0.0)
    // partial assignment surfaces the unassigned count
    val partial = twoWay.filter($"node" =!= "b4")
    val u = Graph.modularity(edges, "src", "dst", partial,
      "node", "community").collect().head
      .getAs[Long]("n_unassigned_nodes")
    assert(u === 1L)
  }

  test("plan pin: a persisted pre-partitioned edge copy is never " +
      "re-exchanged by the half-round join (the hits/hyperBall/" +
      "labelPropagation per-round shape)") {
    import spark.implicits._
    // force the shuffle-join path: broadcast would hide the edge
    // side's partitioning question entirely
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val edges = (1 to 200).map(i => (s"s${i % 20}", s"d${i % 33}"))
        .toDF("src", "dst")
      val eBySrc = edges.repartition(col("src"))
        .dropDuplicates("src", "dst").persist()
      eBySrc.count()
      val hub = (0 until 20).map(i => (s"s$i", 0.05)).toDF("node", "__s")
      val contrib = eBySrc
        .join(hub.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst")).agg(sum(col("__s")).as("__c"))
      val plan = contrib.queryExecution.executedPlan.toString
      // count only planner-inserted exchanges (ENSURE_REQUIREMENTS):
      // the InMemoryRelation dump embeds its own REPARTITION_BY_COL
      // build exchange (printed twice, initial + final plan) which is
      // exactly the pre-partitioning under test, not a re-shuffle
      val exchanges = plan.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning") &&
          l.contains("ENSURE_REQUIREMENTS"))
      // exactly two: the thin score frame onto the join key and the
      // aggregate onto the group key — an edge-side re-shuffle would
      // make it three (what every half-round paid before r17)
      assert(exchanges === 2,
        s"expected score-side + agg exchanges only:\n$plan")
      eBySrc.unpersist()
      ()
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("labelPropagation: symmetric pair collapses to the smaller " +
      "label (the self-vote anti-oscillation contract)") {
    import spark.implicits._
    val out = Graph.labelPropagation(
      Seq(("n2", "n1")).toDF("src", "dst"), "src", "dst", rounds = 4)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out === Map("n1" -> "n1", "n2" -> "n1"))
  }

  /** Two K4s with a bridge node 9: one edge into clique A (node 1),
    * TWO into clique B (nodes 5, 6). The true partition has 9 in B;
    * LPA's min-label tie-break puts it in A (round 1: 9's
    * neighborhood {1,5,6,9} is all distinct labels → min "1", and
    * every later round re-ties 2×"1" vs 2×"5" → min again). One
    * modularityRefine sweep must repair it: 9's move to B scores
    * 2m(k_iD−k_iC′) − k_i(D_D−D_C+k_i) = 30(2−1) − 3(14−16+3) = 27,
    * the only positive proposal, so locally-dominant acceptance
    * takes exactly it. Exact numerators hand-computed:
    * before Σ(4m·L−D²) = (60·7−16²)+(60·6−14²) = 328, after =
    * (60·6−13²)+(60·8−17²) = 382, gain 54 = 2·27. */
  private def bridgeFixture = {
    val cliqueA = Seq(("1", "2"), ("1", "3"), ("1", "4"), ("2", "3"),
      ("2", "4"), ("3", "4"))
    val cliqueB = Seq(("5", "6"), ("5", "7"), ("5", "8"), ("6", "7"),
      ("6", "8"), ("7", "8"))
    cliqueA ++ cliqueB ++ Seq(("1", "9"), ("5", "9"), ("6", "9"))
  }

  test("modularityRefine: one sweep repairs the bridge node LPA " +
      "tie-breaks onto the wrong clique (the planted-fixture " +
      "contract, r17 verdict #2)") {
    import spark.implicits._
    val edges = bridgeFixture.toDF("src", "dst")
    val lpa = Graph.labelPropagation(edges, "src", "dst", rounds = 5)
    val lpaMap = lpa.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // LPA's mistake is the precondition: 9 lands with clique A
    assert(lpaMap("9") === lpaMap("1"),
      s"fixture requires LPA to misplace the bridge node: $lpaMap")
    assert(lpaMap("5") !== lpaMap("1"), s"two communities expected: $lpaMap")
    val refined = Graph.modularityRefine(edges, "src", "dst",
      lpa, "node", "community", sweeps = 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(refined("9") === refined("5"),
      s"one sweep must move 9 to clique B: $refined")
    assert(Seq("2", "3", "4").forall(n => refined(n) === refined("1")) &&
      Seq("6", "7", "8").forall(n => refined(n) === refined("5")),
      s"no other node may move: $refined")
  }

  test("modularityExactNumerator: hand-computed before/after on the " +
      "bridge fixture (328 -> 382, gain 54 = 2x the move score)") {
    import spark.implicits._
    val edges = bridgeFixture.toDF("src", "dst")
    val before = Seq("1", "2", "3", "4", "9").map(_ -> "A") ++
      Seq("5", "6", "7", "8").map(_ -> "B")
    val after = Seq("1", "2", "3", "4").map(_ -> "A") ++
      Seq("5", "6", "7", "8", "9").map(_ -> "B")
    def num(asg: Seq[(String, String)]): Long =
      Graph.modularityExactNumerator(edges, "src", "dst",
        asg.toDF("node", "community"), "node", "community")
        .head().getAs[Long]("q_num_4m2")
    assert(num(before) === 328L)
    assert(num(after) === 382L)
  }

  test("modularityRefine: a sweep on a single-community assignment " +
      "is a fixed point (isolation scores -k_i^2 < 0)") {
    import spark.implicits._
    val edges = bridgeFixture.toDF("src", "dst")
    val mono = (1 to 9).map(i => (i.toString, "ALL")).toDF("node", "c")
    val out = Graph.modularityRefine(edges, "src", "dst",
      mono, "node", "c", sweeps = 2)
      .collect().map(r => r.getString(1)).distinct
    assert(out === Array("ALL"), s"no move target exists: ${out.toSeq}")
  }

  test("communityConnectedness: LPA floods a chain into one label and " +
      "the guard flags it; cliques and pairs pass (the Leiden-failure " +
      "screen, r17 verdict #7)") {
    import spark.implicits._
    // a 6-node path — label "1" floods the whole chain under min-label
    // LPA — plus a K4 and an isolated edge pair, all in one graph
    val edges = Seq(("p1", "p2"), ("p2", "p3"), ("p3", "p4"),
      ("p4", "p5"), ("p5", "p6"),
      ("k1", "k2"), ("k1", "k3"), ("k1", "k4"), ("k2", "k3"),
      ("k2", "k4"), ("k3", "k4"),
      ("e1", "e2")).toDF("src", "dst")
    val lpa = Graph.labelPropagation(edges, "src", "dst", rounds = 6)
    val lpaMap = lpa.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert((1 to 6).map(i => lpaMap(s"p$i")).distinct.size === 1,
      s"fixture requires LPA to flood the chain: $lpaMap")
    val out = Graph.communityConnectedness(edges, "src", "dst",
        lpa, "node", "community")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    val chain = out(lpaMap("p1"))
    assert(chain === ((6L, 5L, 1L, false)),
      s"the flooded chain (5 edges < 6 nodes) must flag: $chain")
    assert(out(lpaMap("k1")) === ((4L, 6L, 3L, true)),
      s"the K4 community must pass: $out")
    assert(out(lpaMap("e1")) === ((2L, 1L, 1L, true)),
      s"a pair with its edge is already a clique: $out")
  }

  test("communityConnectedness: a disconnected member flags even a " +
      "dense community; singletons pass") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("x", "y"))
      .toDF("src", "dst")
    // force-assign the stranded node z (and x) into the triangle's
    // community; y alone; z has NO intra edge anywhere
    val asg = Seq("a" -> "T", "b" -> "T", "c" -> "T", "x" -> "T",
      "y" -> "S").toDF("node", "c")
    val out = Graph.communityConnectedness(edges, "src", "dst",
        asg, "node", "c")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    assert(out("T") === ((4L, 3L, 0L, false)),
      s"x has no intra-T edge -> disconnected community: $out")
    assert(out("S") === ((1L, 0L, 0L, true)),
      s"a singleton is trivially connected: $out")
  }

  test("louvain: the aggregation phase breaks the resolution limit " +
      "node-local moves cannot (Fortunato ring-of-cliques; r18)") {
    import spark.implicits._
    // ring of 10 triangles T0..T9, single bridge edges between
    // consecutive triangles: m = 30 + 10 = 40. Per-triangle Q
    // numerator 4m·L − D² = 160·3 − 8² = 416 (×10 = 4160); merging
    // adjacent triangle PAIRS scores 160·7 − 16² = 864 (×5 = 4320) —
    // strictly better. But any SINGLE NODE move out of a triangle
    // scores negative (ring node into the neighbor triangle:
    // 2m(1−2) − 3·(8−8+3) = −89), so modularityRefine alone is a
    // fixed point at 4160; only aggregated whole-triangle moves
    // reach 4320.
    val edges = (0 until 10).flatMap { t =>
      val (x, y, z) = (s"t${t}a", s"t${t}b", s"t${t}c")
      Seq((x, y), (x, z), (y, z),
        (z, s"t${(t + 1) % 10}a")) // bridge to the next triangle
    }.toDF("src", "dst")
    val seed = (0 until 10).flatMap(t =>
      Seq("a", "b", "c").map(s => (s"t$t$s", s"T$t")))
      .toDF("node", "community")
    def num(asg: org.apache.spark.sql.DataFrame): Long =
      Graph.modularityExactNumerator(edges, "src", "dst",
        asg, "node", "community").head().getAs[Long]("q_num_4m2")
    assert(num(seed) === 4160L)
    // node-local refinement is stuck at the seed
    val refined = Graph.modularityRefine(edges, "src", "dst",
      seed, "node", "community", sweeps = 3)
    assert(num(refined) === 4160L,
      "single-node moves must not escape the resolution limit")
    // the full two-phase pass merges triangle pairs; equal-score ties
    // chain under the deterministic tie-break, so give the matching
    // enough sweeps to pair the whole ring
    val merged = Graph.louvain(edges, "src", "dst",
      seed, "node", "community", sweepsPerLevel = 5)
    val byComm = merged.collect()
      .map(r => r.getString(0) -> r.getString(1))
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byComm.size === 5, s"expected 5 merged pairs: $byComm")
    assert(byComm.values.forall(_.size === 6),
      s"every super-community must be a triangle pair: $byComm")
    assert(num(merged) === 4320L,
      s"merged pairing must grade 4320: ${num(merged)}")
  }

  test("modularityRefine: every sweep is monotone under " +
      "locally-dominant acceptance (exact numerator never drops, " +
      "sweeps compose)") {
    import spark.implicits._
    // a denser mixed graph: three triangles chained by single bridges
    // plus LPA's assignment — whatever LPA produced, each sweep's
    // exact numerator must be non-decreasing
    val tri = Seq(("a1", "a2"), ("a1", "a3"), ("a2", "a3"),
      ("b1", "b2"), ("b1", "b3"), ("b2", "b3"),
      ("c1", "c2"), ("c1", "c3"), ("c2", "c3"),
      ("a3", "b1"), ("b3", "c1"))
    val edges = tri.toDF("src", "dst")
    val lpa = Graph.labelPropagation(edges, "src", "dst", rounds = 5)
    def num(asg: org.apache.spark.sql.DataFrame): Long =
      Graph.modularityExactNumerator(edges, "src", "dst",
        asg, "node", "community").head().getAs[Long]("q_num_4m2")
    val n0 = num(lpa)
    val r1 = Graph.modularityRefine(edges, "src", "dst", lpa,
      "node", "community", sweeps = 1)
    val n1 = num(r1)
    val r2 = Graph.modularityRefine(edges, "src", "dst", lpa,
      "node", "community", sweeps = 2)
    val n2 = num(r2)
    assert(n1 >= n0, s"sweep 1 dropped Q: $n0 -> $n1")
    assert(n2 >= n1, s"sweep 2 dropped Q: $n1 -> $n2")
  }

  test("repairCommunities: a disconnected community splits into its " +
      "components, a stranded member becomes a singleton, connected " +
      "communities keep their labels (the Leiden repair, r18 #1)") {
    import spark.implicits._
    // two disjoint triangles forced into ONE community D; a triangle
    // community K carrying a stranded edge-less member s; a pair P
    val edges = Seq(("d1", "d2"), ("d1", "d3"), ("d2", "d3"),
      ("d4", "d5"), ("d4", "d6"), ("d5", "d6"),
      ("k1", "k2"), ("k1", "k3"), ("k2", "k3"),
      ("p1", "p2")).toDF("src", "dst")
    val asg = (Seq("d1", "d2", "d3", "d4", "d5", "d6").map(_ -> "D") ++
      Seq("k1", "k2", "k3", "s").map(_ -> "K") ++
      Seq("p1", "p2").map(_ -> "P")).toDF("node", "c")
    val out = Graph.repairCommunities(edges, "src", "dst",
        asg, "node", "c")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(Seq("d1", "d2", "d3").forall(out(_) === "D#d1") &&
      Seq("d4", "d5", "d6").forall(out(_) === "D#d4"),
      s"D must split into its two triangles: $out")
    assert(Seq("k1", "k2", "k3").forall(out(_) === "K#k1") &&
      out("s") === "K#s",
      s"the stranded member must become its own part: $out")
    assert(out("p1") === "P" && out("p2") === "P",
      s"a connected community keeps its label untouched: $out")
    // Q-monotone by construction: internal edges preserved, ΣD²
    // shrinks — hand numbers at m=10: before 96+84+36 = 216, after
    // 84+84+84+0+36 = 288
    def num(a: org.apache.spark.sql.DataFrame): Long =
      Graph.modularityExactNumerator(edges, "src", "dst",
        a, "node", "c").head().getAs[Long]("q_num_4m2")
    val repaired = Graph.repairCommunities(edges, "src", "dst",
      asg, "node", "c").withColumnRenamed("community", "c")
    assert(num(asg) === 216L)
    assert(num(repaired) === 288L)
    // the screen guarantee: every repaired community passes at γ=0.5
    val screen = Graph.communityConnectedness(edges, "src", "dst",
        repaired, "node", "c", gamma = 0.5)
      .collect().map(r => r.getString(0) -> r.getBoolean(4)).toMap
    assert(screen.values.forall(identity),
      s"every repaired community must pass the γ=0.5 screen: $screen")
  }

  test("repairCommunities: a connected chain community stays whole — " +
      "density failures are the screen's report, disconnection is " +
      "the repaired defect") {
    import spark.implicits._
    val edges = Seq(("p1", "p2"), ("p2", "p3"), ("p3", "p4"))
      .toDF("src", "dst")
    val asg = Seq("p1", "p2", "p3", "p4").map(_ -> "C").toDF("node", "c")
    val out = Graph.repairCommunities(edges, "src", "dst",
        asg, "node", "c")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out.values.toSet === Set("C"),
      s"a connected community is untouched, label preserved: $out")
    // still flags at γ=1 (3 edges < 4 nodes) — by design
    val g1 = Graph.communityConnectedness(edges, "src", "dst",
        asg, "node", "c").head()
    assert(!g1.getBoolean(4), "the chain still fails the γ=1 floor")
    // passes at the guarantee bound γ=0.5
    val g05 = Graph.communityConnectedness(edges, "src", "dst",
        asg, "node", "c", gamma = 0.5).head()
    assert(g05.getBoolean(4), "a connected chain passes at γ=0.5")
  }

  test("weightedModularity: w = 1 reproduces modularity; the hand " +
      "fixture grades by the weighted formula (r18 #4)") {
    import spark.implicits._
    val edges = bridgeFixture.toDF("src", "dst").withColumn("w", lit(1L))
    val asg = (Seq("1", "2", "3", "4").map(_ -> "A") ++
      Seq("5", "6", "7", "8", "9").map(_ -> "B")).toDF("node", "c")
    val unw = Graph.modularity(edges, "src", "dst", asg, "node", "c")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getDouble(7))).sortBy(_._1)
    val w1 = Graph.weightedModularity(edges, "src", "dst", "w",
        asg, "node", "c")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getDouble(7))).sortBy(_._1)
    assert(unw.toSeq === w1.toSeq,
      s"w≡1 must degenerate to the unweighted grade: ${w1.toSeq}")
    // hand fixture: A = {a,b} w=3 inside, B = {c,d} w=1 inside,
    // cross (b,c) w=2; W=6, S_A=8, S_B=4 ->
    // Q = (3/6 − (8/12)²) + (1/6 − (4/12)²) = 0.055556 + 0.055556
    val we = Seq(("a", "b", 3L), ("c", "d", 1L), ("b", "c", 2L))
      .toDF("src", "dst", "w")
    val wasg = Seq("a" -> "A", "b" -> "A", "c" -> "B", "d" -> "B")
      .toDF("node", "c")
    val rows = Graph.weightedModularity(we, "src", "dst", "w",
        wasg, "node", "c")
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(6), r.getDouble(7))).toMap
    assert(rows("A") === ((3L, 8L, 6L, 0.055556d, 0.111112d)), s"$rows")
    assert(rows("B") === ((1L, 4L, 6L, 0.055556d, 0.111112d)), s"$rows")
  }

  test("weightedModularityRefine: edge weight tips the bridge node " +
      "to the heavier side where the unweighted sweep sees a dead tie") {
    import spark.implicits._
    // triangles A and B, bridge node x: x–a1 carries w=1, x–b1 w=5.
    // Unweighted move score for x (A→B) is exactly 0 (not strictly
    // positive -> stay); weighted: 2·12·(5−1) − 6·(11−13+6) = 72 > 0
    val tri = Seq(("a1", "a2", 1L), ("a1", "a3", 1L), ("a2", "a3", 1L),
      ("b1", "b2", 1L), ("b1", "b3", 1L), ("b2", "b3", 1L),
      ("x", "a1", 1L), ("x", "b1", 5L))
    val edges = tri.toDF("src", "dst", "w")
    val seed = (Seq("a1", "a2", "a3", "x").map(_ -> "A") ++
      Seq("b1", "b2", "b3").map(_ -> "B")).toDF("node", "c")
    val unmoved = Graph.modularityRefine(edges, "src", "dst",
        seed, "node", "c", sweeps = 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(unmoved("x") === unmoved("a1"),
      s"the unweighted sweep must see score 0 and stay: $unmoved")
    val moved = Graph.weightedModularityRefine(edges, "src", "dst", "w",
        seed, "node", "c", sweeps = 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(moved("x") === moved("b1"),
      s"the weighted sweep must move x to the heavy side: $moved")
    assert(Seq("a1", "a2", "a3").forall(n => moved(n) === moved("a1")) &&
      Seq("b1", "b2", "b3").forall(n => moved(n) === moved("b1")),
      s"no other node may move: $moved")
  }

  test("deltaLabelPropagation: edge ADDITIONS re-propagate only the " +
      "changed neighborhood yet equal the full re-run bit-for-bit; " +
      "new nodes join, far clusters keep their labels (r18 #7)") {
    import spark.implicits._
    // two far-apart components: a 3-triangle chain and a K4; the
    // delta adds one edge inside the chain plus a brand-new node n9
    val base = Seq(("a1", "a2"), ("a1", "a3"), ("a2", "a3"),
      ("b1", "b2"), ("b1", "b3"), ("b2", "b3"), ("a3", "b1"),
      ("k1", "k2"), ("k1", "k3"), ("k1", "k4"), ("k2", "k3"),
      ("k2", "k4"), ("k3", "k4"))
    val delta = Seq(("a1", "b3"), ("n9", "a2"))
    val all = (base ++ delta).toDF("src", "dst")
    val prev = Graph.labelPropagation(base.toDF("src", "dst"),
      "src", "dst", rounds = 4)
    val inc = Graph.deltaLabelPropagation(all, "src", "dst",
        delta.toDF("src", "dst"), "src", "dst",
        prev, "node", "community", rounds = 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    val full = Graph.labelPropagation(all, "src", "dst", rounds = 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(inc.toSeq === full.toSeq,
      s"delta must equal the full re-run: $inc vs $full")
    assert(inc.exists(_._1 == "n9"), "the new node must join")
  }

  test("deltaLabelPropagation: edge REMOVALS — a node losing its " +
      "last edge leaves the assignment, the rest equals the full " +
      "re-run on the shrunk graph") {
    import spark.implicits._
    val base = Seq(("a1", "a2"), ("a1", "a3"), ("a2", "a3"),
      ("a3", "x9"), // x9 hangs by one edge
      ("k1", "k2"), ("k1", "k3"), ("k2", "k3"))
    val removed = Seq(("a3", "x9"))
    val remaining = base.filterNot(removed.contains)
    val prev = Graph.labelPropagation(base.toDF("src", "dst"),
      "src", "dst", rounds = 3)
    val inc = Graph.deltaLabelPropagation(remaining.toDF("src", "dst"),
        "src", "dst", removed.toDF("src", "dst"), "src", "dst",
        prev, "node", "community", rounds = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    val full = Graph.labelPropagation(remaining.toDF("src", "dst"),
      "src", "dst", rounds = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(inc.toSeq === full.toSeq,
      s"delta must equal the full re-run: $inc vs $full")
    assert(!inc.exists(_._1 == "x9"),
      "a node with no remaining edge must leave the assignment")
  }

  test("weightedLouvain: w = 1 equals louvain bit-for-bit on the " +
      "ring of cliques (SUM(1) = COUNT end-to-end)") {
    import spark.implicits._
    val edges = (0 until 10).flatMap { t =>
      val (x, y, z) = (s"t${t}a", s"t${t}b", s"t${t}c")
      Seq((x, y), (x, z), (y, z), (z, s"t${(t + 1) % 10}a"))
    }.toDF("src", "dst")
    val seed = (0 until 10).flatMap(t =>
      Seq("a", "b", "c").map(s => (s"t$t$s", s"T$t")))
      .toDF("node", "community")
    val plain = Graph.louvain(edges, "src", "dst",
        seed, "node", "community", sweepsPerLevel = 5)
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    val weighted = Graph.weightedLouvain(
        edges.withColumn("w", lit(1L)), "src", "dst", "w",
        seed, "node", "community", sweepsPerLevel = 5)
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(plain.toSeq === weighted.toSeq,
      "w≡1 weightedLouvain must replay louvain exactly")
  }
}
