package graft.operators

import org.apache.spark.sql.functions.{col, conv, md5, substring}

import graft.SparkSpec

/** Count–min sketch contract: never undercounts, exact when the
  * counter table dwarfs the key domain, sane on unseen keys. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("countMin: estimate >= true always, exact at width >> domain, unseen keys bounded") {
    // 10 keys with known frequencies 1..10
    val rows = (1 to 10).flatMap(k => Seq.fill(k)(s"k$k")).toDF("key")
    val wide = Sketch.countMinFrequencies(rows, col("key"),
        (1 to 10).map(i => s"k$i") :+ "never_seen",
        depth = 4, width = 4096)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    (1 to 10).foreach { k =>
      val (est, tru, over) = wide(s"k$k")
      assert(tru == k.toLong && est >= tru && over == est - tru,
        s"k$k: $est vs $tru")
      // 4096 buckets for 10 keys: collisions vanish, estimate exact
      assert(est == tru, s"wide sketch must be exact: k$k -> $est vs $tru")
    }
    assert(wide("never_seen")._2 == 0L && wide("never_seen")._1 >= 0L)
    // a deliberately TINY sketch still never undercounts
    val tiny = Sketch.countMinFrequencies(rows, col("key"),
        (1 to 10).map(i => s"k$i"), depth = 2, width = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(tiny.forall { case (est, tru) => est >= tru },
      s"CMS must never undercount: ${tiny.toSeq}")
  }

  test("countMin: deterministic across reruns (portable md5 buckets)") {
    val rows = (1 to 50).map(i => s"id_${i % 7}").toDF("key")
    def run() = Sketch.countMinFrequencies(rows, col("key"),
      Seq("id_0", "id_3"), depth = 3, width = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(run() == run())
  }

  test("hll: Scala bucket/rank twins ≡ engine register table") {
    val keys = (1 to 300).map(i => s"doc_$i")
    val engine = Sketch.hllRegisterTable(keys.toDF("key"), col("key"),
      m = 128).collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val scala = keys.groupBy(k => Sketch.hllBucketOf(k, 128))
      .map { case (b, ks) => (b, ks.map(Sketch.hllRankOf).max) }.toSet
    assert(engine == scala, s"engine registers != Scala twins")
  }

  test("hll: ~1.04/sqrt(m) accuracy at 20k keys, exact-twin determinism") {
    val keys = (1 to 20000).map(i => s"u$i")
    val out = Sketch.hllDistinct(keys.toDF("key"), col("key"), m = 1024)
      .collect().head
    val est = out.getAs[Double]("estimate")
    val err = math.abs(est - 20000.0) / 20000.0
    // 3 standard errors at 1.04/sqrt(1024) ≈ 3.25%: generous 10% bound
    assert(err < 0.10, s"HLL estimate $est off by ${err * 100}%%")
    assert(out.getAs[Long]("true_distinct") == 20000L)
  }

  test("hll: linear-counting branch on small cardinalities") {
    val keys = (1 to 150).map(i => s"s$i")
    val out = Sketch.hllDistinct(keys.toDF("key"), col("key"), m = 1024)
      .collect().head
    // raw <= 2.5m and zeros > 0 → m·ln(m/Z), which is much tighter
    // than the raw harmonic estimate down here
    val est = out.getAs[Double]("estimate")
    assert(math.abs(est - 150.0) / 150.0 < 0.10,
      s"linear counting estimate $est")
    assert(out.getAs[Long]("nonempty") < 1024L)
  }

  test("hll: registers of a union = max-merge of the parts' registers") {
    val a = (1 to 400).map(i => s"k$i")
    val b = (200 to 700).map(i => s"k$i")
    def regs(ks: Seq[String]) = Sketch.hllRegisterTable(
        ks.toDF("key"), col("key"), m = 128)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val merged = (regs(a).keySet ++ regs(b).keySet).map(k =>
      k -> math.max(regs(a).getOrElse(k, 0), regs(b).getOrElse(k, 0))).toMap
    assert(regs(a ++ b) == merged, "HLL registers must merge by MAX")
  }

  test("kmv: bounded per-partition fold ≡ distinct-sort-limit reference") {
    val df = (1 to 5000).map(i => s"k${i % 1200}").toDF("key")
      .repartition(13)
    val got = Sketch.kmvBottomK(df, col("key"), k = 64)
      .collect().map(_.getLong(0)).toSeq
    val ref = df.select(
        conv(substring(md5(col("key")), 1, 12), 16, 10).cast("long")
          .as("h"))
      .distinct().orderBy("h").limit(64)
      .collect().map(_.getLong(0)).toSeq
    assert(got == ref, "TreeSet prefilter must be lossless for bottom-k")
  }

  test("kmv: exact below k, ~1/sqrt(k) accurate above") {
    val small = Sketch.kmvDistinct((1 to 100).map(i => s"a$i").toDF("key"),
      col("key"), k = 256).collect().head
    assert(small.getAs[Double]("estimate") == 100.0 &&
      small.getAs[Long]("sketch_size") == 100L,
      "below k the sketch is the exact distinct set")
    val big = Sketch.kmvDistinct((1 to 30000).map(i => s"b$i").toDF("key"),
      col("key"), k = 256).collect().head
    val err = math.abs(big.getAs[Double]("estimate") - 30000.0) / 30000.0
    assert(err < 0.20, s"KMV estimate ${big.getAs[Double]("estimate")}")
  }

  test("kmvSetOps: overlap estimates near truth, truths exact") {
    val a = (1 to 3000).map(i => s"u$i").toDF("key")
    val b = (1501 to 4500).map(i => s"u$i").toDF("key")
    val out = Sketch.kmvSetOps(a, b, col("key"), k = 256).collect().head
    assert(out.getAs[Long]("true_union") == 4500L &&
      out.getAs[Long]("true_intersection") == 1500L)
    val j = out.getAs[Double]("jaccard_estimate")
    assert(math.abs(j - 1.0 / 3.0) < 0.12, s"jaccard estimate $j")
    val u = out.getAs[Double]("union_estimate")
    assert(math.abs(u - 4500.0) / 4500.0 < 0.25, s"union estimate $u")
    val x = out.getAs[Double]("intersection_estimate")
    assert(math.abs(x - 1500.0) / 1500.0 < 0.35, s"intersection $x")
  }

  test("amsF2: exact truth, signs match Scala twin, estimate unbiased-ish") {
    val keys = (1 to 40).flatMap(k => Seq.fill(k % 5 + 1)(s"k$k"))
    val out = Sketch.amsF2(keys.toDF("key"), col("key"), depth = 9)
      .collect().head
    val trueF2 = keys.groupBy(identity).values.map(g => g.size.toLong * g.size)
      .sum
    assert(out.getAs[Long]("f2_true") == trueF2)
    // engine sign-sums == Scala-twin sums, seed for seed
    val engine = Sketch.amsSignSums(keys.toDF("key"), col("key"), 9)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val scala = (0 until 9).map(j =>
      j -> keys.map(k => Sketch.amsSignOf(j, k)).sum).toMap
    assert(engine == scala, s"engine sums $engine != Scala twin $scala")
    assert(out.getAs[Double]("f2_estimate") >= 0.0)
  }

  test("amsF2: estimate within 3 std errors on a uniform domain") {
    // F2 ≈ n for near-unique keys; relative std error ~ sqrt(2/depth)
    val keys = (1 to 20000).map(i => s"u$i")
    val est = Sketch.amsF2(keys.toDF("key"), col("key"), depth = 9)
      .collect().head.getAs[Double]("f2_estimate")
    assert(math.abs(est - 20000.0) / 20000.0 < 3.0 * math.sqrt(2.0 / 9.0),
      s"F2 estimate $est vs 20000")
  }

  test("amsJoinSize: truth is the exact join count, disjoint keys give zero truth") {
    val a = (1 to 300).map(i => s"id${i % 50}").toDF("key") // f=6 each
    val b = (1 to 100).map(i => s"id${i % 25}").toDF("key") // f=4 each
    val out = Sketch.amsJoinSize(a, b, col("key"), col("key"), depth = 9)
      .collect().head
    // 25 shared keys × 6 × 4
    assert(out.getAs[Long]("join_true") == 25L * 6L * 4L)
    val dj = Sketch.amsJoinSize(
      (1 to 50).map(i => s"l$i").toDF("key"),
      (1 to 50).map(i => s"r$i").toDF("key"),
      col("key"), col("key"), depth = 9).collect().head
    assert(dj.getAs[Long]("join_true") == 0L)
  }

  test("hllDistinctBy: per-group estimates match per-group hllDistinct") {
    val df = ((1 to 900).map(i => ("a", s"k${i % 300}"))
      ++ (1 to 400).map(i => ("b", s"q${i % 170}"))).toDF("g", "key")
    val grouped = Sketch.hllDistinctBy(df, col("key"), Seq("g"), m = 128)
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Double]("estimate"), r.getAs[Long]("true_distinct"))).toMap
    Seq("a" -> 300L, "b" -> 170L).foreach { case (g, n) =>
      val solo = Sketch.hllDistinct(df.filter(col("g") === g), col("key"),
        m = 128).collect().head
      assert(grouped(g)._1 == solo.getAs[Double]("estimate"),
        s"group $g: grouped != solo")
      assert(grouped(g)._2 == n)
    }
  }

  test("kmvSetOps: disjoint sides estimate zero intersection") {
    val a = (1 to 500).map(i => s"left$i").toDF("key")
    val b = (1 to 500).map(i => s"right$i").toDF("key")
    val out = Sketch.kmvSetOps(a, b, col("key"), k = 256).collect().head
    assert(out.getAs[Long]("true_intersection") == 0L)
    // the union sketch samples the union; a disjoint pair can only
    // show in-both hashes on a 48-bit collision (never, here)
    assert(out.getAs[Double]("jaccard_estimate") == 0.0)
  }

  test("hyperBall: monotone growth, saturation fixpoint, coverage flags") {
    // undirected path a-b-c-d (diameter 3): exact balls grow
    // 4 -> 10 -> 14 -> 16 and freeze
    val fwd = Seq(("a", "b"), ("b", "c"), ("c", "d"))
    val edges = (fwd ++ fwd.map(_.swap)).toDF("s", "d")
    val got = Sketch.hyperBall(edges, "s", "d", rounds = 4, m = 16)
      .orderBy("r").collect()
    assert(got.map(_.getAs[Long]("r")).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    val reached = got.map(_.getAs[Double]("n_reached")).toSeq
    assert(reached.zip(reached.tail).forall { case (a, b) => a <= b },
      s"N(r) must be monotone: $reached")
    // singleton balls at r=0: 4 linear-counting estimates of 1
    assert(math.abs(reached.head - 4.0) < 0.5, s"N(0) = ${reached.head}")
    // diameter 3: round 4 adds nothing — the register fixpoint
    assert(reached(3) == reached(4),
      s"saturated rounds must agree exactly: ${reached(3)} vs ${reached(4)}")
    // the final round covers everything by definition
    assert(got.last.getAs[Double]("reach_frac") == 1.0 &&
      got.last.getAs[Int]("covered_90") == 1)
    assert(got.head.getAs[Int]("covered_90") == 0,
      "singleton balls cannot cover 90% of a path's reachability")
    intercept[IllegalArgumentException] {
      Sketch.hyperBall(edges, "s", "d", rounds = 3, m = 20)
    }
    intercept[IllegalArgumentException] {
      Sketch.hyperBall(edges, "s", "d", rounds = 0)
    }
  }

  test("kmvDifference: exact below k, nested zero, accuracy above k") {
    // union below k: the sketch IS the exact sets
    val a = (1 to 100).map(i => s"k$i").toDF("key")
    val b = (51 to 150).map(i => s"k$i").toDF("key")
    val out = Sketch.kmvDifference(a, b, col("key"), k = 256).head()
    assert(out.getAs[Long]("true_a_not_b") == 50L &&
      out.getAs[Long]("true_b_not_a") == 50L)
    assert(out.getAs[Double]("a_not_b_estimate") == 50.0 &&
      out.getAs[Double]("b_not_a_estimate") == 50.0,
      s"below k the difference must be exact: $out")
    // nested side: B ⊂ A → b-not-a is exactly zero
    val sub = (1 to 40).map(i => s"k$i").toDF("key")
    val nested = Sketch.kmvDifference(a, sub, col("key"), k = 256).head()
    assert(nested.getAs[Double]("b_not_a_estimate") == 0.0 &&
      nested.getAs[Double]("a_not_b_estimate") == 60.0)
    // above k: ~1/sqrt(k) sampling accuracy on both directions
    val bigA = (1 to 5000).map(i => s"u$i").toDF("key")
    val bigB = (2501 to 7500).map(i => s"u$i").toDF("key")
    val big = Sketch.kmvDifference(bigA, bigB, col("key"), k = 256).head()
    Seq("a_not_b_estimate" -> 2500.0, "b_not_a_estimate" -> 2500.0)
      .foreach { case (c, t) =>
        val e = big.getAs[Double](c)
        assert(math.abs(e - t) / t < 0.3, s"$c: $e vs $t")
      }
  }

  test("ddsketch: relative-error guarantee, Scala twin ≡ engine buckets") {
    val vals = (1 to 5000).map(_.toDouble * 0.37)
    val df = vals.toDF("v")
    val got = Sketch.ddsketchQuantiles(df, col("v"), alpha = 0.01).collect()
    assert(got.map(_.getAs[Double]("q")).toSeq == Seq(0.5, 0.95, 0.99))
    val sorted = vals.sorted
    got.foreach { r =>
      val q = r.getAs[Double]("q")
      val est = r.getAs[Double]("estimate")
      val truth = sorted(math.ceil(q * vals.size).toInt - 1)
      assert(math.abs(est - truth) / truth <= 0.0105,
        s"q=$q: est $est vs true $truth breaks the alpha guarantee")
    }
    // the streaming monitor's Scala bucket twin must key EXACTLY like
    // the in-plan expression
    val engine = Sketch.ddBucketCounts(df, col("v"), 0.01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val twin = vals.groupBy(v => Sketch.ddBucketOf(v, 0.01))
      .view.mapValues(_.size.toLong).toMap
    assert(engine == twin, "Scala bucket twin diverges from the engine")
    // non-positive values are outside the sketch support
    val withJunk = (vals ++ Seq(-5.0, 0.0)).toDF("v")
    val n = Sketch.ddsketchQuantiles(withJunk, col("v")).collect()
      .head.getAs[Long]("n")
    assert(n == vals.size, s"support filter must drop 2 rows: n=$n")
    intercept[IllegalArgumentException] {
      Sketch.ddsketchQuantiles(df, col("v"), qs = Seq(0.0))
    }
  }

  test("ddsketchQuantilesBy: grouped ≡ per-group solo quantiles") {
    val rows = (1 to 1000).map(i => ("a", i.toDouble * 0.37)) ++
      (1 to 300).map(i => ("b", i.toDouble * 2.11))
    val df = rows.toDF("g", "v")
    val grouped = Sketch.ddsketchQuantilesBy(df, col("v"), Seq("g"))
      .collect()
      .map(r => (r.getString(0), r.getAs[Double]("q")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("bucket"),
          r.getAs[Double]("estimate"))).toMap
    Seq("a", "b").foreach { g =>
      Sketch.ddsketchQuantiles(df.filter(col("g") === g), col("v"))
        .collect().foreach { r =>
          val solo = (r.getAs[Long]("n"), r.getAs[Long]("bucket"),
            r.getAs[Double]("estimate"))
          assert(grouped((g, r.getAs[Double]("q"))) == solo,
            s"group $g q=${r.getAs[Double]("q")}: grouped != solo")
        }
    }
  }

  test("hyperBallHarmonic: hub tops a star, symmetric pair ties exactly") {
    // star: hub-l1..l5 (undirected). H(hub) = 5 exactly; each leaf
    // H = 1 + 4/2 = 3 — the hub must rank first under the estimate too
    val leaves = (1 to 5).map(i => s"l$i")
    val fwd = leaves.map(l => ("hub", l))
    val edges = (fwd ++ fwd.map(_.swap)).toDF("s", "d")
    val got = Sketch.hyperBallHarmonic(edges, "s", "d", rounds = 3, m = 16)
      .collect()
    assert(got.length == 6)
    assert(got.head.getAs[String]("node") == "hub",
      s"hub must rank first: ${got.toSeq}")
    // topK limits the output
    val top3 = Sketch.hyperBallHarmonic(edges, "s", "d", rounds = 3,
      m = 16, topK = 3).collect()
    assert(top3.length == 3 && top3.head.getAs[String]("node") == "hub")
    // K2: both vertices see the SAME ball sets at every radius, so the
    // register estimates — and the harmonic scores — tie exactly
    val pair = Seq(("a", "b"), ("b", "a")).toDF("s", "d")
    val two = Sketch.hyperBallHarmonic(pair, "s", "d", rounds = 2, m = 16)
      .collect()
    assert(two.length == 2 &&
      two(0).getAs[Double]("harmonic") == two(1).getAs[Double]("harmonic"),
      s"symmetric pair must tie exactly: ${two.toSeq}")
    assert(two.map(_.getAs[String]("node")).toSeq == Seq("a", "b"),
      "ties must break by node for determinism")
  }
}
