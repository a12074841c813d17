package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("profile: exact per-column stats from one agg, nulls counted, strings rendered") {
    val df = Seq(
      (Option(1L), Option("a")),
      (Option(2L), Option("a")),
      (Option(2L), None),
      (None, Option("b"))
    ).toDF("id", "tag")
    val got = Profiling.profile(df, Seq("id", "tag"))
      .orderBy("col_name")
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().toSeq
    assert(got == Seq(
      ("id", 4L, 1L, 2L, Some("1"), Some("2")),
      ("tag", 4L, 1L, 2L, Some("a"), Some("b"))), s"got $got")
  }

  test("profile: approx form agrees with exact on small-cardinality input") {
    val df = (1 to 200).map(i => (i.toLong, s"s${i % 7}")).toDF("id", "s")
    val exact = Profiling.profile(df, Seq("id", "s"))
      .orderBy("col_name")
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().toSeq
    val approx = Profiling.profile(df, Seq("id", "s"), approx = true)
      .orderBy("col_name")
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().toSeq
    // everything but the sketched distinct count must be identical
    assert(exact.map(r => (r._1, r._2, r._3, r._5, r._6)) ==
      approx.map(r => (r._1, r._2, r._3, r._5, r._6)))
    exact.zip(approx).foreach { case (e, a) =>
      val err = math.abs(e._4 - a._4).toDouble / e._4
      assert(err <= 0.05, s"approx distinct off by ${err * 100}%: $e vs $a")
    }
    // the approx plan must NOT expand the input (the exact form's cost)
    val plan = Profiling.profile(df, Seq("id", "s"), approx = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx profile must not Expand:\n$plan")
  }

  test("skewReport: heaviest keys ranked, deterministic ties, NULL keys rendered, no full sort") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++
        Seq[String](null, "d")).toDF("k")
    val got = Profiling.skewReport(df, Seq("k"), topK = 3)
      .as[(Long, String, Long, Double)].collect().toSeq
    // b/c tie on 3 breaks lexicographically; 13 rows total
    assert(got == Seq(
      (1L, "a", 5L, 0.3846),
      (2L, "b", 3L, 0.2308),
      (3L, "c", 3L, 0.2308)), s"got $got")
    val withNull = Profiling.skewReport(df, Seq("k"), topK = 10)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(withNull.exists(r => r._2 == "NULL" && r._3 == 1L),
      s"null key must appear as literal NULL: $withNull")
    // top-k must be TakeOrderedAndProject on the counts, not a global sort
    val plan = Profiling.skewReport(df, Seq("k"), topK = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }

  test("corrMatrix: signs and exact values on hand-built columns, one agg") {
    // b = 2a (corr +1), c = -a (corr -1), d constant (corr NULL)
    val df = Seq((1.0, 2.0, -1.0, 5.0), (2.0, 4.0, -2.0, 5.0),
        (3.0, 6.0, -3.0, 5.0))
      .toDF("a", "b", "c", "d")
    val got: Map[(String, String), Option[Double]] =
      Profiling.corrMatrix(df, Seq("a", "b", "c", "d"))
        .collect().map(r =>
          (r.getString(0), r.getString(1)) ->
            (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got(("a", "b")) == Some(1.0))
    assert(got(("a", "c")) == Some(-1.0))
    assert(got(("b", "c")) == Some(-1.0))
    assert(got(("a", "d")) == None, "constant column must yield NULL corr")
    assert(got.size == 6) // strict upper triangle of 4 columns
    // the whole matrix must come from ONE aggregate over one scan
    val plan = Profiling.corrMatrix(df, Seq("a", "b", "c", "d"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"corrMatrix must not join per pair:\n$plan")
  }

  test("validate: row rules, NULL-constraint-is-violation, uniqueness, one scan") {
    val df = Seq(
      (1L, Some(10.0), "ok"),
      (2L, Some(-3.0), "ok"),   // range violation
      (3L, None, "ok"),         // NULL constraint result → violation
      (3L, Some(5.0), "bad"),   // dup key + set violation
      (4L, Some(7.0), "ok"))
      .toDF("id", "v", "status")
    val got = Profiling.validate(df,
        rowRules = Seq(
          "v_positive" -> (col("v") > 0),
          "status_ok" -> (col("status") === "ok")),
        uniqueRules = Seq("id"))
      .orderBy("rule")
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("status_ok", 1L, 0.2),
      ("unique_id", 1L, 0.2),    // 5 non-null keys, 4 distinct
      ("v_positive", 2L, 0.4)), s"got $got") // the -3 AND the null
    // the whole contract is ONE aggregate — no joins, no extra scans
    val plan = Profiling.validate(df,
        Seq("v_positive" -> (col("v") > 0)), Seq("id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"validate must not join per rule:\n$plan")
  }

  test("equidepthHistogram: scalable zipWithIndex form ≡ ntile window twin, remainder case") {
    import spark.implicits._
    // 11 rows into 3 buckets: ntile gives sizes 4, 4, 3
    val df = (1 to 11).map(i => (i.toDouble * 10, i.toLong)).toDF("v", "id")
    val got = Profiling.equidepthHistogram(df, "v", "id", 3)
      .orderBy("bucket")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 10.0, 40.0), (2L, 4L, 50.0, 80.0), (3L, 3L, 90.0, 110.0)),
      s"got $got")
    val twin = Profiling.equidepthHistogramNtile(df, "v", "id", 3)
      .orderBy("bucket")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got == twin, s"scalable $got != ntile twin $twin")
    // fewer rows than buckets: one singleton bucket per row
    val tiny = Seq((5.0, 1L), (3.0, 2L)).toDF("v", "id")
    val gotTiny = Profiling.equidepthHistogram(tiny, "v", "id", 5)
      .orderBy("bucket").as[(Long, Long, Double, Double)].collect().toSeq
    val twinTiny = Profiling.equidepthHistogramNtile(tiny, "v", "id", 5)
      .orderBy("bucket").as[(Long, Long, Double, Double)].collect().toSeq
    assert(gotTiny == Seq((1L, 1L, 3.0, 3.0), (2L, 1L, 5.0, 5.0)))
    assert(gotTiny == twinTiny)
  }

  test("chiSquare: zero for a perfectly independent table, hand value with a zero cell") {
    import spark.implicits._
    // independent 2x2: rows a=40, b=80; cols x=30, y=90; every
    // observed count equals its expectation -> chi2 = 0
    val ind = (Seq.fill(10)(("a", "x")) ++ Seq.fill(30)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(60)(("b", "y")))
      .toDF("ca", "cb")
    val r1 = Profiling.chiSquare(ind, "ca", "cb").collect()(0)
    assert(r1.getDouble(0) == 0.0 && r1.getLong(1) == 1L && r1.getLong(2) == 120L)
    // fully dependent diagonal with ABSENT off-diagonal cells: the
    // zero cells must still contribute (0-exp)^2/exp -> chi2 = n
    val dep = (Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("b", "y")))
      .toDF("ca", "cb")
    val r2 = Profiling.chiSquare(dep, "ca", "cb").collect()(0)
    assert(r2.getDouble(0) == 20.0 && r2.getLong(1) == 1L && r2.getLong(2) == 20L,
      s"got $r2 — zero cells dropped from the grid?")
  }

  test("exactQuantiles: scalable path matches the percentile aggregate, interpolates between ranks") {
    import spark.implicits._
    val df = (1 to 10).map(_.toDouble).toDF("v")
    val got = Profiling.exactQuantiles(df, "v", Seq(0.0, 0.25, 0.5, 1.0))
      .orderBy("prob")
      .as[(Double, Double)].collect().toSeq
    // pos = p*(n-1) on 1..10: p25 -> pos 2.25 -> 3 + 0.25*(4-3) = 3.25
    assert(got == Seq((0.0, 1.0), (0.25, 3.25), (0.5, 5.5), (1.0, 10.0)),
      s"got $got")
    // must agree with the single-buffer percentile aggregate
    val agg = df.select(
      org.apache.spark.sql.functions.percentile(col("v"),
        org.apache.spark.sql.functions.array(
          org.apache.spark.sql.functions.lit(0.25),
          org.apache.spark.sql.functions.lit(0.5))))
      .head().getSeq[Double](0)
    assert(agg == Seq(3.25, 5.5), s"percentile twin disagrees: $agg")
  }

  test("fdReport: a held dependency scores 0, a broken one counts its violating groups") {
    import spark.implicits._
    val df = Seq(
      (1, "alpha", "b1"), (1, "alpha", "b1"),   // key 1 consistent
      (2, "beta", "b1"), (2, "beta", "b2"),     // name->brand broken
      (3, "gamma", "b3"))
      .toDF("k", "name", "brand")
    val got = Profiling.fdReport(df,
        Seq(("k", "name"), ("name", "brand")))
      .orderBy("lhs")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5)))
      .toSeq
    assert(got == Seq(
      ("k", "name", 3L, 0L, 0.0, 1L),
      ("name", "brand", 3L, 1L, 0.333333, 2L)), s"got $got")
  }

  test("infoGainReport: a label copy is a perfect leak, noise is ballast") {
    import spark.implicits._
    // noise is CONSTANT: zero feature entropy -> MI 0, NMI null
    val df = Seq(("x", "x", "p"), ("x", "x", "p"), ("y", "y", "p"),
      ("y", "y", "p"))
      .toDF("label", "leak", "noise")
    val got = Profiling.infoGainReport(df, "label",
        Seq("leak", "noise"))
      .orderBy("feature")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toSeq
    // leak ≡ label -> MI = H(label), NMI = 1; noise constant -> MI 0,
    // NMI null (zero feature entropy)
    assert(got.map(_._1) == Seq("leak", "noise"))
    assert(got(0)._3.contains(1.0), s"leak must score NMI 1: $got")
    assert(got(1)._2 == 0.0 && got(1)._3.isEmpty, s"got $got")
  }

  test("robustOutliers: hand MAD screen; zero-MAD group yields no outliers") {
    import spark.implicits._
    // 1..9 + 100: median 5.5, MAD 2.5; only the 100 crosses
    // 0.6745*|v-med|/MAD > 3.5 (z(9) = 0.944, z(100) = 25.5)
    val df = ((1 to 9).map(_.toDouble) :+ 100.0).map(("g", _))
      .toDF("grp", "v")
    val got = Profiling.robustOutliers(df, Seq("grp"), "v").collect()(0)
    assert((got.getString(0), got.getLong(1), got.getDouble(2),
      got.getDouble(3), got.getLong(4)) == (("g", 10L, 5.5, 2.5, 1L)),
      s"got $got")
    // > 50% identical values -> MAD 0 -> no outliers, no crash
    val flat = Seq(5.0, 5.0, 5.0, 9.0).map(("g", _)).toDF("grp", "v")
    val g2 = Profiling.robustOutliers(flat, Seq("grp"), "v").collect()(0)
    assert(g2.getDouble(3) == 0.0 && g2.getLong(4) == 0L, s"got $g2")
  }

  test("benford: exact-cent leading digits, all 9 rows present, nonpositive dropped") {
    import spark.implicits._
    // digits: 1.00->1, 1.50->1, 19.99->1, 2.00->2, 0.50->5;
    // 0 and negatives are excluded
    val df = Seq(1.0, 1.5, 19.99, 2.0, 0.5, 0.0, -3.0).toDF("v")
    val got = Profiling.benford(df, "v")
      .orderBy("digit")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(got.map(_._1) == (1L to 9L), s"missing digits: $got")
    assert(got.map(_._2) == Seq(3L, 1L, 0L, 0L, 1L, 0L, 0L, 0L, 0L),
      s"got $got")
    assert(got(0)._3 == 0.6 && got(1)._3 == 0.2 && got(4)._3 == 0.2,
      s"got $got")
  }

  test("mutualInfo: independent columns score 0; identical columns reach NMI 1") {
    import spark.implicits._
    // perfectly independent 2x2 (uniform product measure)
    val ind = (Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(10)(("b", "y")))
      .toDF("ca", "cb")
    val r1 = Profiling.mutualInfo(ind, "ca", "cb").collect()(0)
    assert(r1.getDouble(0) == 0.0, s"independent MI should be 0: $r1")
    // identical columns: MI = H(a) = ln 2, NMI = 1
    val same = (Seq.fill(10)(("a", "a")) ++ Seq.fill(10)(("b", "b")))
      .toDF("ca", "cb")
    val r2 = Profiling.mutualInfo(same, "ca", "cb").collect()(0)
    val ln2 = BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r2.getDouble(0) == ln2 && r2.getDouble(1) == ln2 &&
      r2.getDouble(2) == ln2 && r2.getDouble(3) == 1.0, s"got $r2")
    // a constant column carries zero entropy: MI 0, NMI null (0/0)
    val const = Seq.fill(5)(("a", "x")).toDF("ca", "cb")
    val r3 = Profiling.mutualInfo(const, "ca", "cb").collect()(0)
    assert(r3.getDouble(0) == 0.0 && r3.isNullAt(3), s"got $r3")
    // NULL is a category of its own (the chiSquare contract): with
    // a <-> b a bijection where one level of a is NULL, MI = H = ln 2
    // and NMI = 1 — an equi-join that dropped the NULL level's cells
    // would report MI = 0 against h_a = ln 2 (the r12 ADVICE bug)
    val withNull = (Seq.fill(10)((Option("a"), "x")) ++
      Seq.fill(10)((Option.empty[String], "y")))
      .toDF("ca", "cb")
    val r4 = Profiling.mutualInfo(withNull, "ca", "cb").collect()(0)
    val ln2b = BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r4.getDouble(0) == ln2b && r4.getDouble(1) == ln2b &&
      r4.getDouble(3) == 1.0, s"got $r4")
  }

  test("groupedWeightedQuantile: lower weighted quantile crosses the cumulative-weight threshold") {
    import spark.implicits._
    // g=a: values (1,w=1), (2,w=1), (3,w=2): W=4
    // p=0.5 -> theta=2 -> cum at v=2 is 2 >= 2 -> median 2
    // p=0.75 -> theta=3 -> first crossing at v=3 (cum 4)
    val df = Seq(("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 2.0))
      .toDF("g", "v", "w")
    val m = Profiling.groupedWeightedQuantile(df, Seq("g"), "v", "w", 0.5)
      .as[(String, Long, Double, Double)].collect()(0)
    assert(m == (("a", 3L, 4.0, 2.0)), s"got $m")
    val q3 = Profiling.groupedWeightedQuantile(df, Seq("g"), "v", "w", 0.75)
      .as[(String, Long, Double, Double)].collect()(0)
    assert(q3._4 == 3.0, s"got $q3")
    // zero/negative weights drop; all weight on one value selects it
    val skew = Seq(("a", 1.0, 0.0), ("a", 5.0, 9.0), ("a", 9.0, 1.0))
      .toDF("g", "v", "w")
    val s = Profiling.groupedWeightedQuantile(skew, Seq("g"), "v", "w", 0.5)
      .as[(String, Long, Double, Double)].collect()(0)
    assert(s == (("a", 2L, 10.0, 5.0)), s"got $s")
    // r13 verdict #1 plan pin: no per-group running-sum window over the
    // data — every Window in the plan is the bounded chunk machinery
    val plan = Profiling.groupedWeightedQuantile(df, Seq("g"), "v", "w",
      0.5).queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.forall(_.contains("__pfx_c")),
      s"no group-keyed running-sum Window expected in:\n$plan")
  }

  test("fkOrphans: counts rows, null keys, and orphans exactly") {
    import spark.implicits._
    val child = Seq(Some(1L), Some(2L), Some(3L), None).toDF("ck")
    val parent = Seq(1L, 2L, 2L).toDF("pk") // duplicate parent keys fine
    val got = Profiling.fkOrphans(child, "ck", parent, "pk", "t")
      .as[(String, Long, Long, Long, Double)].collect()(0)
    assert(got == (("t", 4L, 1L, 1L, 0.25)), s"got $got")
    // clean edge: zero orphans, zero rate
    val clean = Profiling.fkOrphans(Seq(1L, 2L).toDF("ck"), "ck",
        parent, "pk", "c")
      .as[(String, Long, Long, Long, Double)].collect()(0)
    assert(clean == (("c", 2L, 0L, 0L, 0.0)), s"got $clean")
  }

  test("profileDrift: per-column both-side stats from one scan, null-rate deltas") {
    val df = Seq(
      ("a", Option(1L), Option("x")),
      ("a", Option(2L), None),
      ("a", Option(2L), Option("y")),
      ("b", None, Option("x")),
      ("b", Option(5L), Option("x")),
      ("c", Option(9L), None) // in neither slice -> ignored
    ).toDF("era", "id", "tag")
    val got = Profiling.profileDrift(df,
        col("era") === "a", col("era") === "b", Seq("id", "tag"))
      .orderBy("col_name")
      .as[(String, Long, Long, Long, Long, Long, Long,
        Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      // id: a has 3 rows 0 null 2 distinct; b has 2 rows 1 null 1 distinct
      ("id", 3L, 2L, 0L, 1L, 2L, 1L, 0.0, 0.5, 0.5),
      // tag: a has 1 null 2 distinct; b has 0 null 1 distinct
      ("tag", 3L, 2L, 1L, 0L, 2L, 1L, 0.333333, 0.0, -0.333333)),
      s"got $got")
  }

  test("valueEntropy: uniform maxes normalized entropy, constant is zero, nulls are a category") {
    val df = Seq(
      ("u", Some("a")), ("u", Some("b")), ("u", Some("c")), ("u", Some("d")),
      ("k", Some("x")), ("k", Some("x")), ("k", Some("x")),
      ("n", Some("y")), ("n", None), ("n", None)
    ).toDF("g", "v")
    val got = Profiling.valueEntropy(df, Seq("g"), "v")
      .orderBy("g")
      .as[(String, Long, Long, Double, Option[Double])].collect().toSeq
    // k: one value -> H = 0, norm undefined
    assert(got(0) == (("k", 1L, 3L, 0.0, None)), s"got ${got(0)}")
    // n: {y:1, null:2} -> null is a real category: H = -(1/3)ln(1/3)-(2/3)ln(2/3)
    val hN = -(1.0 / 3 * math.log(1.0 / 3) + 2.0 / 3 * math.log(2.0 / 3))
    assert(got(1)._1 == "n" && got(1)._2 == 2L &&
      math.abs(got(1)._4 - hN) < 1e-3, s"got ${got(1)} want H≈$hN")
    // u: uniform over 4 -> H = ln 4, normalized 1
    assert(got(2)._1 == "u" && math.abs(got(2)._4 - math.log(4)) < 1e-3 &&
      got(2)._5.exists(n => math.abs(n - 1.0) < 1e-3), s"got ${got(2)}")
  }

  test("probRational: recovers intended fractions, rejects garbage") {
    assert(Profiling.probRational(0.2) == ((1L, 5L)))
    assert(Profiling.probRational(0.5) == ((1L, 2L)))
    assert(Profiling.probRational(1.0 / 3.0) == ((1L, 3L)))
    assert(Profiling.probRational(2.0 / 7.0) == ((2L, 7L)))
    assert(Profiling.probRational(0.123) == ((123L, 1000L)))
    assert(Profiling.probRational(0.0) == ((0L, 1L)))
    assert(Profiling.probRational(1.0) == ((1L, 1L)))
    intercept[IllegalArgumentException](Profiling.probRational(-0.1))
    intercept[IllegalArgumentException](Profiling.probRational(1.5))
  }

  test("groupedExactQuantiles: arbitrary probabilities (1/3, 1/7) match percentile") {
    // the r12 form required thousandths and threw deep in the quantile
    // code for psi(k=3) / newsvendor(1/3) — arbitrary p must now work
    // and agree with Spark's interpolating percentile to round noise
    val df = (1 to 22).map(i => ("g", i.toDouble)).toDF("g", "v")
    for (p <- Seq(1.0 / 3.0, 2.0 / 7.0, 0.123)) {
      val exact = Profiling
        .groupedExactQuantiles(df, Seq("g"), col("v"), Seq("q" -> p))
        .select(col("q").cast("double")).as[Double].collect()(0)
      val ref = df.agg(
          org.apache.spark.sql.functions.percentile(col("v"),
            org.apache.spark.sql.functions.lit(p)))
        .as[Double].collect()(0)
      assert(math.abs(exact - ref) < 1e-4, s"p=$p: exact $exact vs $ref")
    }
  }

  test("multiExactQuantiles: one ranked pass ≡ per-column calls, scope releases cache") {
    val df = Seq(("a", 1.0, 10.0), ("a", 2.0, 20.0), ("a", 3.0, 40.0),
        ("b", 5.0, 1.0), ("b", 7.0, 3.0))
      .toDF("g", "x", "y")
    val before = spark.sparkContext.getPersistentRDDs.size
    val scope = graft.util.CacheScope()
    val multi = Profiling.multiExactQuantiles(df, Seq("g"),
        Seq("x" -> col("x"), "y" -> col("y")),
        Seq("p50" -> 0.5, "p90" -> 0.9), scope = scope)
      .select(col("g"), col("__metric"),
        col("p50").cast("double"), col("p90").cast("double"))
      .as[(String, String, Double, Double)].collect().toSet
    scope.unpersistAll(blocking = true)
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "scope.unpersistAll must release the ranked frame")
    val single = Seq("x", "y").flatMap { c =>
      val s = graft.util.CacheScope()
      val rows = Profiling.groupedExactQuantiles(df, Seq("g"), col(c),
          Seq("p50" -> 0.5, "p90" -> 0.9), scope = s)
        .select(col("g"), org.apache.spark.sql.functions.lit(c),
          col("p50").cast("double"), col("p90").cast("double"))
        .as[(String, String, Double, Double)].collect()
      s.unpersistAll()
      rows
    }.toSet
    assert(multi == single, s"multi $multi vs single $single")
  }

  test("valueCoverage: head values covering 50/90/99 percent, exact integer crossings") {
    import spark.implicits._
    // a×5, b×3, c×1, d×1: cum desc 5, 8, 9, 10 over N=10
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c", "d"))
      .toDF("v")
    val r = Profiling.valueCoverage(df, "v").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((10L, 4L, 1L, 3L, 4L)), s"got $r")
    // count ties order by value: b2 a2 c1 -> desc (a,b pick by value),
    // k50 crossing at the second value regardless of tie order
    val tied = (Seq.fill(2)("b") ++ Seq.fill(2)("a") ++ Seq("c")).toDF("v")
    val t = Profiling.valueCoverage(tied, "v", Seq(50)).head()
    assert((t.getLong(0), t.getLong(1), t.getLong(2)) == ((5L, 3L, 2L)),
      s"got $t")
  }

  test("cramersV: perfect association scores 1, constant column yields null V") {
    import spark.implicits._
    val df = (1 to 8).map(i =>
      (if (i % 2 == 0) "x" else "y",
        if (i % 2 == 0) "u" else "v", "k")).toDF("a", "b", "c")
    val got = Profiling.cramersV(df, Seq("a", "b", "c"))
      .orderBy("col_a", "col_b")
      .as[(String, String, Long, Double, Long, Option[Double])]
      .collect().toSeq
    assert(got.map(g => (g._1, g._2)) ==
      Seq(("a", "b"), ("a", "c"), ("b", "c")))
    // a <-> b bijection: chi2 = n = 8, V = sqrt(8/(8*1)) = 1
    assert(got(0)._4 == 8.0 && got(0)._6.contains(1.0), s"got ${got(0)}")
    // constant c: min(r-1, c-1) = 0 -> null V, dof 0
    assert(got(1)._5 == 0L && got(1)._6.isEmpty, s"got ${got(1)}")
    assert(got(2)._6.isEmpty, s"got ${got(2)}")
  }

  test("robustNormalize: modified z per row, constant group yields null not a blow-up") {
    import spark.implicits._
    val df = ((1 to 7).map(i => ("g", i.toLong, i.toDouble)) ++
      Seq(("c", 10L, 5.0), ("c", 11L, 5.0))).toDF("grp", "id", "v")
    val got = Profiling.robustNormalize(df, Seq("grp"), "id", "v")
      .orderBy("id")
      .as[(Long, String, Double, Option[Double])].collect().toSeq
    // g: median 4, MAD 2 -> z(7) = 0.6745·3/2 = 1.01175 -> 1.0118
    val g = got.filter(_._2 == "g")
    assert(g.find(_._1 == 4L).get._4.contains(0.0), s"got $g")
    assert(g.find(_._1 == 7L).get._4.contains(1.0118), s"got $g")
    assert(g.find(_._1 == 1L).get._4.contains(-1.0118), s"got $g")
    // constant group: MAD 0 -> null z
    assert(got.filter(_._2 == "c").forall(_._4.isEmpty), s"got $got")
  }

  test("trimmedMean: the 10% band drops the outlier tail, hand means") {
    val df = ((1 to 9).map(i => ("g", i.toDouble)) :+ ("g", 1000.0))
      .toDF("k", "v")
    val got = Profiling.trimmedMean(df, Seq("k"), col("v"), alpha = 0.1)
      .as[(String, Long, Long, Double, Double)].head()
    // cutoffs q10 = 1.9, q90 = 108.1 -> keeps 2..9: mean 5.5
    assert(got == (("g", 10L, 8L, 104.5, 5.5)), s"got $got")
  }

  test("quantileDrift: identical eras shift zero, constant shift propagates exactly") {
    val same = ((1 to 100).map(i => (i.toDouble, "a")) ++
      (1 to 100).map(i => (i.toDouble, "b"))).toDF("v", "era")
    val z = Profiling.quantileDrift(same, col("era") === "a",
        col("era") === "b", col("v"))
      .orderBy("prob").as[(String, Double, Double, Double)].collect().toSeq
    assert(z.size == 4 && z.forall(r => r._4 == 0.0 && r._2 == r._3),
      s"got $z")
    val shift = ((1 to 4).map(i => (i.toDouble, "a")) ++
      (3 to 6).map(i => (i.toDouble, "b"))).toDF("v", "era")
    val s = Profiling.quantileDrift(shift, col("era") === "a",
        col("era") === "b", col("v"))
      .orderBy("prob").as[(String, Double, Double, Double)].collect().toSeq
    assert(s.forall(r => r._4 == 2.0 && r._3 - r._2 == 2.0), s"got $s")
  }

  test("benfordDigitOf: Scala twin ≡ engine digit counts incl. cent rounding edges") {
    import spark.implicits._
    // 0.005 rounds UP to cent 1 (HALF_UP on both sides); 0.004 drops
    // to cent 0 and leaves the support; 9.995 crosses into digit 1
    val vals = Seq(1.0, 0.005, 0.004, 9.995, 9.994, 123.456, 0.01,
      2.675, 19.99, 0.0, -3.2, 899.999, 900.0)
    val engine = Profiling.benford(vals.toDF("v"), "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val twin = vals.map(Profiling.benfordDigitOf).filter(_ > 0)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    (1 to 9).foreach { d =>
      assert(engine(d.toLong) == twin.getOrElse(d, 0L),
        s"digit $d: engine ${engine(d.toLong)} vs twin ${twin.get(d)}")
    }
    assert(twin.values.sum == vals.count(_ >= 0.005),
      "exactly the positive-cent values stay in support")
  }

  test("fanoFactor: constant buckets read 0, a 1-vs-3 split reads 0.5") {
    import spark.implicits._
    val df = (Seq(("g", "b1")) ++ Seq.fill(3)(("g", "b2")) ++
      Seq.fill(2)(("c", "b1")) ++ Seq.fill(2)(("c", "b2")))
      .toDF("grp", "bkt")
    val out = Profiling.fanoFactor(df, col("grp"), col("bkt"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("mean"), r.getAs[Double]("variance"),
          r.getAs[Double]("fano"))).toMap
    assert(out("g") === ((2.0, 1.0, 0.5)))
    assert(out("c") === ((2.0, 0.0, 0.0)))
  }

  test("gTest: 0 under independence, 8·ln2 under 2x2 determinism") {
    import spark.implicits._
    val det = Seq(("a", 1), ("a", 1), ("b", 2), ("b", 2)).toDF("x", "y")
    val d = Profiling.gTest(det, "x", "y").head()
    assert(d.getAs[Long]("dof") === 1L)
    assert(d.getAs[Double]("g_stat") === 5.545177) // 8 ln 2
    val ind = Seq(("a", 1), ("a", 2), ("b", 1), ("b", 2)).toDF("x", "y")
    assert(Profiling.gTest(ind, "x", "y").head()
      .getAs[Double]("g_stat") === 0.0)
  }

  test("featureDriftReport: unit-variance shift reads SMD 2, " +
      "zero-variance columns read null") {
    import spark.implicits._
    val df = Seq((true, 1.0, 5.0), (true, 2.0, 5.0), (true, 3.0, 5.0),
      (false, 3.0, 5.0), (false, 4.0, 5.0), (false, 5.0, 5.0))
      .toDF("base", "a", "c")
    val out = Profiling.featureDriftReport(df, Seq("a", "c"),
      col("base")).collect()
    val a = out.find(_.getString(0) == "a").get
    assert(a.getAs[Double]("mean_base") === 2.0)
    assert(a.getAs[Double]("mean_current") === 4.0)
    assert(a.getAs[Double]("smd") === 2.0)
    val c = out.find(_.getString(0) == "c").get
    assert(c.isNullAt(c.fieldIndex("smd")))
  }

  test("uncertaintyCoefficient: 1 under determinism, 0 under " +
      "independence") {
    import spark.implicits._
    val det = Seq(("a", 1), ("a", 1), ("b", 2), ("b", 2)).toDF("x", "y")
    val d = Profiling.uncertaintyCoefficient(det, col("x"), col("y"))
      .head()
    assert(d.getAs[Double]("uncertainty") === 1.0)
    assert(d.getAs[Double]("h_x") === 0.693147)
    val ind = Seq(("a", 1), ("a", 2), ("b", 1), ("b", 2)).toDF("x", "y")
    val i = Profiling.uncertaintyCoefficient(ind, col("x"), col("y"))
      .head()
    assert(i.getAs[Double]("uncertainty") === 0.0)
  }
}
