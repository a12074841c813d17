package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Annotation-QA tier: agreement coefficients, Bradley–Terry, bias
  * audit, rater screen — hand-computed fixtures (mirrored in an
  * independent Python implementation with identical quantization). */
class AnnotationSpec extends SparkSpec {
  import spark.implicits._

  private def ratings(rows: (String, String, String)*) =
    rows.toDF("item", "rater", "lab")

  test("fleissKappa matches the hand-computed 4x3 fixture and drops " +
      "items at the wrong rater count") {
    val df = ratings(
      ("i1", "r1", "a"), ("i1", "r2", "a"), ("i1", "r3", "a"),
      ("i2", "r1", "a"), ("i2", "r2", "b"), ("i2", "r3", "b"),
      ("i3", "r1", "b"), ("i3", "r2", "b"), ("i3", "r3", "b"),
      ("i4", "r1", "a"), ("i4", "r2", "b"), ("i4", "r3", "c"),
      // only 2 raters -> excluded from the n=3 statistic
      ("i5", "r1", "a"), ("i5", "r2", "a"))
    val out = Annotation.fleissKappa(df, $"item", $"rater", $"lab",
      raters = 3).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("items") === 4L)
    assert(r.getAs[Double]("p_bar") === 0.583333)
    assert(r.getAs[Double]("p_e") === 0.430556)
    assert(r.getAs[Double]("kappa") === 0.268293)
  }

  test("fleissKappa is 1 at perfect agreement") {
    val df = ratings(
      ("i1", "r1", "a"), ("i1", "r2", "a"), ("i1", "r3", "a"),
      ("i2", "r1", "b"), ("i2", "r2", "b"), ("i2", "r3", "b"))
    val r = Annotation.fleissKappa(df, $"item", $"rater", $"lab",
      raters = 3).collect().head
    assert(r.getAs[Double]("p_bar") === 1.0)
    assert(r.getAs[Double]("kappa") === 1.0)
  }

  test("krippendorffAlpha matches the variable-m fixture exactly " +
      "(integer-scaled arithmetic)") {
    val df = ratings(
      ("u1", "r1", "a"), ("u1", "r2", "a"),
      ("u2", "r1", "a"), ("u2", "r2", "b"), ("u2", "r3", "b"),
      ("u3", "r1", "b"), ("u3", "r2", "b"), ("u3", "r3", "b"),
      ("u3", "r4", "b"),
      ("u4", "r1", "c"), // singleton: unpairable, drops out
      ("u5", "r1", "a"), ("u5", "r2", "c"), ("u5", "r3", "c"))
    val r = Annotation.krippendorffAlpha(df, $"item", $"rater", $"lab")
      .collect().head
    assert(r.getAs[Long]("items") === 4L)
    assert(r.getAs[Long]("pairable") === 12L)
    assert(r.getAs[Double]("d_o") === 0.333333)
    assert(r.getAs[Double]("d_e") === 0.666667)
    assert(r.getAs[Double]("alpha") === 0.5)
  }

  test("krippendorffAlpha is 1 at perfect agreement within items") {
    val df = ratings(
      ("u1", "r1", "a"), ("u1", "r2", "a"),
      ("u2", "r1", "b"), ("u2", "r2", "b"), ("u2", "r3", "b"))
    val r = Annotation.krippendorffAlpha(df, $"item", $"rater", $"lab")
      .collect().head
    assert(r.getAs[Double]("d_o") === 0.0)
    assert(r.getAs[Double]("alpha") === 1.0)
  }

  test("bradleyTerry reproduces the Python-mirrored MM fixture " +
      "(8 rounds, 9-digit quantization)") {
    val comps = (Seq.fill(3)(("A", "B", true)) ++ Seq(("A", "B", false))
      ++ Seq.fill(2)(("A", "C", true))
      ++ Seq.fill(2)(("B", "C", true)) ++ Seq.fill(2)(("B", "C", false)))
      .toDF("a", "b", "a_won")
    val out = Annotation.bradleyTerry(comps, $"a", $"b", $"a_won",
      iters = 8).orderBy("rank").collect()
    assert(out.map(_.getAs[String]("entity")).toSeq === Seq("A", "B", "C"))
    assert(out.map(_.getAs[Long]("wins")).toSeq === Seq(5L, 3L, 2L))
    assert(out.map(_.getAs[Long]("games")).toSeq === Seq(6L, 8L, 6L))
    assert(out.map(_.getAs[Double]("strength")).toSeq
      === Seq(0.71597, 0.161784, 0.122246))
    assert(out.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L, 3L))
  }

  test("bradleyTerry: a never-winner sits at strength 0") {
    val comps = (Seq.fill(2)(("A", "B", true)) ++ Seq.fill(2)(("C", "B", true)))
      .toDF("a", "b", "a_won")
    val out = Annotation.bradleyTerry(comps, $"a", $"b", $"a_won",
      iters = 4).collect()
    val b = out.find(_.getAs[String]("entity") == "B").get
    assert(b.getAs[Long]("wins") === 0L)
    assert(b.getAs[Double]("strength") === 0.0)
  }

  test("positionalBias flags a 60/100 first-win log and clears 50/100") {
    val biased = (Seq.fill(60)(true) ++ Seq.fill(40)(false)).toDF("fw")
    val r1 = Annotation.positionalBias(biased, $"fw").collect().head
    assert(r1.getAs[Long]("trials") === 100L)
    assert(r1.getAs[Double]("first_rate") === 0.6)
    assert(r1.getAs[Double]("wilson_lo") > 0.5)
    assert(r1.getAs[Boolean]("biased"))
    val fair = (Seq.fill(50)(true) ++ Seq.fill(50)(false)).toDF("fw")
    val r2 = Annotation.positionalBias(fair, $"fw").collect().head
    assert(!r2.getAs[Boolean]("biased"))
    assert(r2.getAs[Double]("wilson_lo") < 0.5
      && r2.getAs[Double]("wilson_hi") > 0.5)
  }

  test("raterConsensus: the systematic dissenter gets agree_rate 0 " +
      "and a negative z; ties break to the smallest label") {
    // r1,r2 always 'a'; r3 always 'b'. r1's LOO pool is {a(r2), b(r3)}
    // -> tie -> 'a' (lexicographic), so r1/r2 agree everywhere.
    val df = ratings((1 to 4).flatMap { i =>
      Seq((s"i$i", "r1", "a"), (s"i$i", "r2", "a"), (s"i$i", "r3", "b"))
    }: _*)
    val out = Annotation.raterConsensus(df, $"item", $"rater", $"lab")
      .collect()
    val by = out.map(r => r.getAs[String]("rater") -> r).toMap
    assert(by("r1").getAs[Double]("agree_rate") === 1.0)
    assert(by("r2").getAs[Double]("agree_rate") === 1.0)
    assert(by("r3").getAs[Double]("agree_rate") === 0.0)
    assert(by("r1").getAs[Double]("pooled_rate") === 0.666667)
    assert(by("r1").getAs[Double]("z") === 1.414214)
    assert(by("r3").getAs[Double]("z") === -2.828427)
  }

  test("raterConfusion shows WHICH class the dissenter substitutes") {
    val df = ratings((1 to 4).flatMap { i =>
      Seq((s"i$i", "r1", "a"), (s"i$i", "r2", "a"), (s"i$i", "r3", "b"))
    }: _*)
    val out = Annotation.raterConfusion(df, $"item", $"rater", $"lab")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2), r.getAs[Long]("n"), r.getAs[Double]("rate")))
    // r3's LOO consensus is 'a' everywhere, but r3 always says 'b'
    assert(out.contains(("r3", "a", "b", 4L, 1.0)))
    assert(out.contains(("r1", "a", "a", 4L, 1.0)))
    assert(!out.exists(t => t._1 == "r3" && t._3 == "a"))
  }

  test("dawidSkeneRound flips exactly the item where noisy raters " +
      "outvoted a reliable one (Python-mirrored fixture)") {
    val rows = (1 to 8).flatMap { i =>
      Seq((f"i$i%02d", "r1", "a"), (f"i$i%02d", "r2", "a"),
        (f"i$i%02d", "r3", "a"), (f"i$i%02d", "r4", "b"),
        (f"i$i%02d", "r5", "b"))
    } ++ Seq(9, 10).flatMap { i =>
      Seq((f"i$i%02d", "r1", "b"), (f"i$i%02d", "r2", "b"),
        (f"i$i%02d", "r3", "b"), (f"i$i%02d", "r4", "b"),
        (f"i$i%02d", "r5", "b"))
    } ++ Seq(("i11", "r1", "a"), ("i11", "r4", "b"), ("i11", "r5", "b"))
    val out = Annotation.dawidSkeneRound(ratings(rows: _*),
      $"item", $"rater", $"lab").collect()
    val changed = out.filter(_.getAs[Boolean]("changed"))
    assert(changed.map(_.getString(0)).toSeq === Seq("i11"))
    val i11 = changed.head
    assert(i11.getAs[String]("majority_label") === "b")
    assert(i11.getAs[String]("ds_label") === "a")
    assert(out.length === 11)
  }

  test("winRateMatrix canonicalizes pair orientation and brackets " +
      "the rate") {
    import org.apache.spark.sql.functions.col
    // A beats B 3 of 4 — once with B listed first
    val comps = Seq(("A", "B", true), ("A", "B", true),
      ("B", "A", false), ("A", "B", false)).toDF("a", "b", "w")
    val r = Annotation.winRateMatrix(comps, col("a"), col("b"),
      col("w")).collect()
    assert(r.length === 1)
    assert(r.head.getAs[String]("entity_a") === "A")
    assert(r.head.getAs[Long]("games") === 4L)
    assert(r.head.getAs[Long]("wins_a") === 3L)
    assert(r.head.getAs[Double]("rate_a") === 0.75)
    assert(r.head.getAs[Double]("wilson_lo") < 0.75
      && r.head.getAs[Double]("wilson_hi") > 0.75)
  }

  test("lengthBiasAudit: hand paired-t on a longer-always-wins log") {
    import org.apache.spark.sql.functions.col
    val pairs = Seq((5.0, 4.0, true), (7.0, 4.0, true))
      .toDF("la", "lb", "aw")
    val r = Annotation.lengthBiasAudit(pairs, col("la"), col("lb"),
      col("aw")).head()
    assert(r.getAs[Double]("mean_len_winner") === 6.0)
    assert(r.getAs[Double]("mean_len_loser") === 4.0)
    assert(r.getAs[Double]("mean_delta") === 2.0)
    assert(r.getAs[Double]("paired_t") === 2.0) // d={1,3}: 2/sqrt(2/2)
    assert(r.getAs[Double]("longer_win_rate") === 1.0)
  }

  test("plan pin: the annotation chains never fall back to " +
      "CartesianProduct (the class expansion is a broadcast)") {
    import org.apache.spark.sql.functions.col
    val df = ratings((1 to 6).flatMap { i =>
      Seq((s"i$i", "r1", "a"), (s"i$i", "r2", "b"))
    }: _*)
    val plans = Seq(
      Annotation.dawidSkeneRound(df, $"item", $"rater", $"lab"),
      Annotation.raterConfusion(df, $"item", $"rater", $"lab"),
      Annotation.winRateMatrix(
        Seq(("A", "B", true)).toDF("a", "b", "w"),
        col("a"), col("b"), col("w")))
      .map(_.queryExecution.executedPlan.toString)
    plans.foreach(p => assert(!p.contains("CartesianProduct"),
      s"plan fell back to CartesianProduct:\n$p"))
  }

  test("raterConsensus drops ratings with no other rater on the item") {
    val df = ratings(("i1", "r1", "a"), ("i1", "r2", "a"),
      ("solo", "r1", "b"))
    val out = Annotation.raterConsensus(df, $"item", $"rater", $"lab")
      .collect()
    val r1 = out.find(_.getAs[String]("rater") == "r1").get
    assert(r1.getAs[Long]("rated") === 1L) // the solo item dropped
  }

  test("paired-field near-dups deflate Fleiss kappa: planted " +
      "near-identical comparison rows inflate agreement until " +
      "pairedFieldNearDups removes them") {
    // comparison items: i1 and three near-copies (identical prompt,
    // one response word swapped) — all rated unanimously, the way
    // duplicated rows in a preference log echo one easy judgment;
    // i2-i4 are genuinely distinct items with real disagreement
    val p1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val r1 = "one two three four five six seven eight nine ten"
    val items = Seq(
      ("1", p1, r1),
      ("5", p1, r1.replace("ten", "eleven")),
      ("6", p1, r1.replace("one", "zero")),
      ("7", p1, r1.replace("ten", "twelve")),
      ("2", "totally different words live here in this prompt row two",
        "completely other response text with nothing shared at all ok"),
      ("3", "third prompt talks about warehouses and shipping manifests",
        "third response covers customs duty rates and port schedules"),
      ("4", "fourth prompt asks about quarterly revenue recognition",
        "fourth response explains deferred income and accrual timing"))
      .toDF("item", "prompt", "response")
    val dups = Dedup.pairedFieldNearDups(items, "item",
        Seq("prompt", "response"), shingleSize = 3, numHashes = 16,
        rowsPerBand = 4, threshold = 0.5)
      .collect().map(r => (r.getAs[String]("a"), r.getAs[String]("b")))
    // every copy pairs with the original (and with each other)
    val losers = dups.map(_._2).toSet
    assert(losers === Set("5", "6", "7"), s"found $dups")
    val rates = ratings(
      // unanimous echoes on the duplicated item
      ("1", "r1", "a"), ("1", "r2", "a"), ("1", "r3", "a"),
      ("5", "r1", "a"), ("5", "r2", "a"), ("5", "r3", "a"),
      ("6", "r1", "a"), ("6", "r2", "a"), ("6", "r3", "a"),
      ("7", "r1", "a"), ("7", "r2", "a"), ("7", "r3", "a"),
      // genuine disagreement on the distinct items
      ("2", "r1", "a"), ("2", "r2", "b"), ("2", "r3", "c"),
      ("3", "r1", "b"), ("3", "r2", "b"), ("3", "r3", "c"),
      ("4", "r1", "a"), ("4", "r2", "c"), ("4", "r3", "c"))
    def kappa(df: org.apache.spark.sql.DataFrame): Double =
      Annotation.fleissKappa(df, $"item", $"rater", $"lab", raters = 3)
        .collect().head.getAs[Double]("kappa")
    val inflated = kappa(rates)
    val honest = kappa(rates.filter(!$"item".isin(losers.toSeq: _*)))
    assert(inflated > honest + 0.1,
      s"dedup must deflate kappa: inflated=$inflated honest=$honest")
  }
}
