package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Unit parity for the TF-IDF keyword extract (hand-computed corpus). */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tfidfTopTerms matches hand-computed tf*ln(N/df), top-k by (score, term)") {
    val docs = Seq((1L, "a b a"), (2L, "a c"), (3L, "b b d"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", k = 1)
      .orderBy("doc_id")
      .as[(Long, String, Double)].collect().toSeq
    // N=3; df: a=2 b=2 c=1 d=1; ln(3/2)=0.4055, ln(3)=1.0986
    assert(got === Seq(
      (1L, "a", 0.8109),  // tf=2 beats b's tf=1
      (2L, "c", 1.0986),  // rarer term beats the common 'a'
      (3L, "d", 1.0986))) // tf=2 common 'b' (0.8109) loses to rare 'd'
  }

  test("bigramLogProb matches the hand-computed add-one bigram NLL") {
    val ref = Seq((0L, "a b a b")).toDF("doc_id", "text")
    // model: c2(a,b)=2, c2(b,a)=1; ctx: c1(a)=2, c1(b)=1; V=2
    val batch = Seq(
      (10L, "a b x"), // (a,b): ln(3/4); (b,x): ln(1/3) → nll 0.6931
      (11L, "p q"),   // fully OOV: ln(1/(0+2)) → nll ln2 = 0.6931
      (12L, "z")      // single token: no bigrams, no row
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLogProb(batch, ref, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(got === Seq((10L, 2L, 0.6931), (11L, 1L, 0.6931)))
  }

  test("bigramLogProb flags shuffled word-salad the unigram model cannot") {
    // reference text has strict bigram structure; the scrambled doc
    // reuses exactly the same unigrams with alien transitions.
    val ref = Seq((0L, "the cat sat on the mat the cat sat on the mat"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the cat sat on the mat"),
      (11L, "mat the on sat cat the")).toDF("doc_id", "text")
    val uni = TextAnalysis.unigramLogProb(batch, ref, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    val bi = TextAnalysis.bigramLogProb(batch, ref, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    // unigram: identical token multisets → identical scores
    assert(uni(0)._3 === uni(1)._3)
    // bigram: the scramble must score strictly worse
    assert(bi(1)._3 > bi(0)._3)
  }

  test("normalized collapses case/punct/space variants to one form") {
    import org.apache.spark.sql.functions.col
    val got = Seq("Hello,  World!", "hello world", "HELLO -- WORLD.",
        "hello\tworld\n", "hello\u000Bworld")
      .toDF("t").select(graft.functions.Text.normalized(col("t")))
      .as[String].collect().toSet
    assert(got === Set("hello world")) // tab/newline/VT separate words, never fuse them
  }

  test("tfidfTopTerms serves tf to both consumers from one cached build") {
    // column pruning gives the df-agg and scoring-join branches different
    // exchanges, so ReuseExchange can't dedupe them — the persist must:
    // both branches read InMemoryTableScan, one corpus explode total
    val df = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("text"))
    val q = TextAnalysis.tfidfTopTerms(df, "doc_id", "text", k = 5)
    q.write.format("noop").mode("overwrite").save()
    val plan = q.queryExecution.executedPlan.toString
    assert("InMemoryTableScan".r.findAllIn(plan).length >= 2,
      "tf must be consumed from cache by both branches")
    spark.catalog.clearCache()
  }

  test("redactPii replaces emails and IPs with typed tags, leaves clean text") {
    val got = Seq(
        "mail bob.smith+x@corp.example.org now",
        "host 192.168.0.1 and 10.0.0.255 up",
        "no pii here at all")
      .toDF("t").select(graft.functions.Text.redactPii(col("t")))
      .as[String].collect().toSeq
    assert(got === Seq(
      "mail <EMAIL> now",
      "host <IP> and <IP> up",
      "no pii here at all"))
  }

  test("tfidfTopTerms k larger than vocab returns every term once") {
    val docs = Seq((1L, "x y"), (2L, "y z")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", k = 10)
    assert(got.count() === 4L)
    assert(got.select("term").distinct().count() === 3L)
  }

  test("tfidfTopTerms: a term in every doc scores exactly 0 (ln N/N)") {
    val docs = Seq((1L, "common a"), (2L, "common b")).toDF("doc_id", "text")
    val zeros = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", k = 10)
      .filter(col("term") === "common").select("tfidf")
      .as[Double].collect().toSeq
    assert(zeros === Seq(0.0, 0.0))
  }

  test("nfcNormalized: decomposed sequences collapse to composed; ASCII unchanged; dedup sees one form") {
    import spark.implicits._
    val composed = "caf\u00e9 r\u00e9sum\u00e9"          // é as U+00E9
    val decomposed = "cafe\u0301 re\u0301sume\u0301"     // e + COMBINING ACUTE
    val docs = Seq(
      (1L, composed), (2L, decomposed), (3L, "plain ascii"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = docs
      .select(col("doc_id"), graft.functions.Text.nfcNormalized(col("text")).as("nfc"))
      .orderBy("doc_id").as[(Long, Option[String])].collect().toSeq
    assert(out(0)._2.get == composed, "already-NFC text must pass through")
    assert(out(1)._2.get == composed, "decomposed text must collapse to the composed form")
    assert(out(2)._2.get == "plain ascii")
    assert(out(3)._2.isEmpty, "null stays null")
    // java.text.Normalizer is the semantics authority (same pin the
    // oracle's nfc_normalize is held to)
    assert(out(1)._2.get ==
      java.text.Normalizer.normalize(decomposed, java.text.Normalizer.Form.NFC))

    // the point of the op: byte dedup misses the pair, NFC dedup finds it
    val nonNull = docs.filter(col("text").isNotNull)
    assert(Dedup.exactDedup(nonNull, "doc_id", "text").count() == 3)
    val reps = Dedup.exactDedup(
        nonNull.withColumn("__nfc",
          graft.functions.Text.nfcNormalized(col("text"))),
        "doc_id", "__nfc")
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(reps == Seq((1L, 2L), (3L, 1L)),
      s"NFC dedup must collapse the composed/decomposed pair: $reps")

    // SQL surface parity
    graft.GraftExtensions.register(spark)
    docs.createOrReplaceTempView("nfc_docs")
    val sqlOut = spark.sql(
      "SELECT doc_id, graft_nfc(text) AS nfc FROM nfc_docs ORDER BY doc_id")
      .as[(Long, Option[String])].collect().toSeq
    assert(sqlOut == out, "graft_nfc must match the DataFrame form")
  }

  test("unigramLogProb matches hand-computed add-one smoothed mean NLL") {
    val ref = Seq((1L, "a a b")).toDF("doc_id", "text")
    val batch = Seq((10L, "a c"), (11L, "b b")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProb(batch, ref, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    // model: a→2, b→1; T=3, V=2 → p(a)=3/5, p(b)=2/5, OOV floor=1/5
    // doc10: -(ln .6 + ln .2)/2 = 1.0601  (the OOV 'c' takes the floor)
    // doc11: -ln .4 = 0.9163              (tf=2 weights one distinct term)
    assert(got == Seq((10L, 2L, 1.0601), (11L, 2L, 0.9163)), s"got $got")
  }

  test("topNgramCharFraction: hand-computed argmax, tie to smallest gram, short docs zero") {
    val docs = Seq(
      (1L, "a b a b c"), // "a b"×2, "b a"×1, "b c"×1 → top "a b", 2·3/9
      (2L, "x y z"),     // "x y"×1, "y z"×1 → tie, smallest gram wins
      (3L, "solo"),      // one token: no 2-gram
      (4L, "q q q q")    // overlap: "q q"×3, 3·3/7 > 1 stays uncapped
    ).toDF("doc_id", "text")
    val got = TextAnalysis.topNgramCharFraction(docs, "doc_id", "text", n = 2)
      .orderBy("doc_id").as[(Long, String, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, "a b", 2L, 0.6667),
      (2L, "x y", 1L, 0.6),
      (3L, "", 0L, 0.0),
      (4L, "q q", 3L, 1.2857)), s"got $got")
  }

  test("lineRepetition: hand-computed dup line/char fractions, empty-safe, no shuffle") {
    val docs = Seq(
      // 4 non-empty lines, "nav bar" repeats twice (1 dup of 4 lines);
      // chars: 7+4+7+6=24 total, 7 duplicated → 0.25 / 0.2917
      (1L, "nav bar\nbody\nnav bar\nfooter"),
      (2L, "a\nb\nc"),       // no repeats
      (3L, "x\n\n\nx"),      // empty lines dropped: 2 lines, 1 dup
      (4L, ""),              // no lines at all: zeros, no div-by-zero
      (5L, "same\nsame\nsame") // 3 lines, 2 dups; chars 12, 8 dup
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lineRepetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 0.25, 0.2917),
      (2L, 3L, 0.0, 0.0),
      (3L, 2L, 0.5, 0.5),
      (4L, 0L, 0.0, 0.0),
      (5L, 3L, 0.6667, 0.6667)), s"got $got")
    // narrow per-row map: the plan must contain no exchange at all
    val plan = TextAnalysis.withLineRepetition(docs, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"lineRepetition must not shuffle:\n$plan")
  }

  test("classifierQualityFilter: clean prose scores above junk, threshold drops it, no shuffle") {
    val docs = Seq(
      (1L, ("the quick brown fox jumps over the lazy dog and keeps " * 10).trim),
      (2L, "!!! ### $$$ %%% ^^^ &&& *** ((( ))) @@@ ~~ ??"),
      (3L, "short")).toDF("doc_id", "text")
    val scored = TextAnalysis.classifierQualityFilter(
      docs, "doc_id", "text", threshold = 0.0)
    val byId = scored.select("doc_id", "ql_score")
      .as[(Long, Double)].collect().toMap
    assert(byId(1L) > byId(2L),
      s"clean prose must outscore symbol junk: $byId")
    assert(byId.values.forall(s => s >= 0.0 && s <= 1.0), s"sigmoid range: $byId")

    // the default threshold keeps the prose and drops the junk
    val kept = TextAnalysis.classifierQualityFilter(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L) && !kept.contains(2L),
      s"threshold 0.5 must separate prose from junk: $kept")

    // production shape: a stateless per-row filter — no Exchange
    val plan = TextAnalysis.classifierQualityFilter(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"classifier filter must not shuffle:\n$plan")
  }

  test("dsirResample: target-like docs win, deterministic across runs, keepN respected") {
    import spark.implicits._
    // target domain speaks {apple, banana}; off-domain speaks {qqq, www}.
    // 12 on-domain tokens per doc put the log-weight gap far above any
    // Gumbel draw, so the selection is forced — and reproducible, since
    // the noise is md5-derived, not a PRNG.
    val target = (1L to 5L).map(i => (i, "apple banana apple banana"))
      .toDF("doc_id", "text")
    val cands = Seq(
      (101L, Seq.fill(6)("apple banana").mkString(" ")),
      (102L, Seq.fill(6)("banana apple").mkString(" ")),
      (103L, Seq.fill(6)("qqq www").mkString(" ")),
      (104L, Seq.fill(6)("www qqq").mkString(" ")))
      .toDF("doc_id", "text")
    def run() = TextAnalysis.dsirResample(
        cands, target, cands, "doc_id", "text", keepN = 2)
      .select("doc_id").as[Long].collect().toSet
    val first = run()
    assert(first == Set(101L, 102L), s"on-domain docs must win: $first")
    assert(run() == first, "md5-Gumbel selection must be deterministic")
  }

  test("pmiCollocations: hand PMI, support floor, single-token docs count as unigrams") {
    import spark.implicits._
    // unigrams: a:3 b:3 c:2 (doc3's lone c COUNTS), NU=8;
    // bigrams: (a,b):3 (b,a):1 (b,c):1, NB=5; minCount=2 keeps only
    // (a,b): PMI = ln(3*8*8 / (5*3*3))
    val df = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "c"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.pmiCollocations(df, "text", minCount = 2,
        topK = 10)
      .as[(String, String, Long, Double)].collect().toSeq
    val expected = BigDecimal(math.log(3.0 * 8 * 8 / (5.0 * 3 * 3)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(("b", "a", 3L, expected)) ||
      got == Seq(("a", "b", 3L, expected)), s"got $got")
  }

  test("pmiCollocations: topK orders on rounded PMI desc with pair tiebreak") {
    import spark.implicits._
    // (x,y) appears 4/5 bigrams, (y,x) 1/5 -> PMI(x,y) > PMI(y,x);
    // topK=1 must keep the glued pair
    val df = Seq((1L, "x y x y x y x y x")).toDF("doc_id", "text")
    val got = TextAnalysis.pmiCollocations(df, "text", minCount = 1,
        topK = 1)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got.map(t => (t._1, t._2, t._3)) == Seq(("x", "y", 4L)), s"got $got")
  }

  test("bm25: hand-computed score, rarity outranks frequency, zero-score docs drop") {
    import spark.implicits._
    // 3 docs; query = {q, r}: doc1 has q once (df 2), doc2 has rare r
    // once (df 1) at the SAME length -> doc2 must outrank doc1;
    // doc3 matches nothing and must be absent
    val docs = Seq((1L, "q a b c"), (2L, "r a b c"), (3L, "a b c d"),
      (4L, "q x y z")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(docs, "doc_id", "text", Seq("q", "r"),
        topK = 10)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._1).toSet == Set(1L, 2L, 4L), s"doc3 leaked: $got")
    // every doc is length 4 = avgdl -> norm = k1; tf = 1
    val k1 = 1.2; val n = 4.0
    def score(dfq: Double) =
      math.log(1.0 + (n - dfq + 0.5) / (dfq + 0.5)) * (1.0 * (k1 + 1.0)) /
        (1.0 + k1 * (1.0 - 0.75 + 0.75 * 4.0 / 4.0))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byDoc = got.map(t => t._1 -> t._3).toMap
    assert(byDoc(2L) == r6(score(1.0)) && byDoc(1L) == r6(score(2.0)),
      s"got $got")
    assert(byDoc(2L) > byDoc(1L), "rare term must outscore common term")
  }

  test("zipfFit: an exact power law recovers its own slope") {
    import spark.implicits._
    // frequencies 16, 8, 4, 2, 1 over ranks 1..5: ln f = ln 16 −
    // (ln 2)·ln r / ln 2... construct f = 2^(4) / r^1? Use f_r = 16/r
    // rounded to ints 16, 8, 5, 4, 3 — not exact. Instead pin the
    // EXACT algebra: f_r = c·r^s with s = −1 via f = {12, 6, 4, 3}
    // for r = {1, 2, 3, 4}: ln f = ln 12 − 1·ln r exactly, so the OLS
    // slope is −1 and the intercept ln 12 (to rounding)
    val words = Seq("a" -> 12, "b" -> 6, "c" -> 4, "d" -> 3)
    val text = words.flatMap { case (w, n) => Seq.fill(n)(w) }
      .mkString(" ")
    val got = TextAnalysis.zipfFit(Seq((1L, text)).toDF("id", "text"),
        "text")
      .as[(Long, Double, Double)].head()
    assert(got._1 == 4L, s"got $got")
    assert(got._2 == -1.0, s"slope must be exactly -1 after round: $got")
    val expInt = BigDecimal(math.log(12.0))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got._3 - expInt) < 2e-4, s"intercept ~ ln 12: $got")
  }

  test("oovRate: hand fractions against a minCount-thresholded vocabulary") {
    import spark.implicits._
    // reference: a x5, b x3, c x1 -> vocab at minCount=2 is {a, b}
    val ref = Seq((1L, "a a a a a b b b c")).toDF("doc_id", "text")
    val batch = Seq((10L, "a c d"), (11L, "a b"), (12L, "z z"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.oovRate(batch, ref, "doc_id", "text",
        minCount = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((10L, 3L, 2L, 0.666667), (11L, 2L, 0L, 0.0),
      (12L, 2L, 2L, 1.0)), s"got $got")
  }

  test("langConfusion: mislabeled docs land off-diagonal with shares") {
    import spark.implicits._
    val docs = Seq(
      ("en", "the cat and the dog is not in"),
      ("en", "the a of and is not to in"),
      ("de", "the a of and is not to in")) // declared de, clearly en
      .toDF("lang", "text")
    val got = TextAnalysis.langConfusion(docs, "lang", "text")
      .orderBy("declared", "detected")
      .as[(String, String, Long, Double, Long)].collect().toSeq
    assert(got == Seq(
      ("de", "en", 1L, 0.3333, 0L),
      ("en", "en", 2L, 0.6667, 1L)), s"got $got")
  }

  test("noveltyByBatch: first batch all novel, repeats in later batches are not") {
    import spark.implicits._
    // batch 1: grams {abc, bcd}; batch 2: {abc, bce} -> 1 of 2 novel
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b c e"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.noveltyByBatch(docs, col("doc_id"), "text", n = 3)
      .orderBy("batch")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L, 1.0), (2L, 2L, 1L, 0.5)), s"got $got")
  }

  test("compressionRatio: repetitive text compresses far below varied text, deterministic") {
    import spark.implicits._
    val rep = "spam ham " * 200
    val varied = (1 to 200).map(i => s"w${i * 7919 % 9973}").mkString(" ")
    val df = Seq((1L, rep), (2L, varied), (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.compressionRatio(df, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Option[Double])].collect().toSeq
    val (r, v, e) = (got(0)._3.get, got(1)._3.get, got(2)._3)
    assert(r < 0.1, s"repetitive text must crush: $r")
    assert(v > 3 * r, s"varied ($v) must compress far worse than repetitive ($r)")
    assert(e.isEmpty, "empty text has no ratio")
    // determinism: identical input, identical ratio
    val again = TextAnalysis.compressionRatio(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Option[Double])].collect().toSeq
    assert(again == got)
    // codegen Expression == the UDF executable spec (r13 verdict #6),
    // including non-ASCII text where char length != UTF-8 byte length
    val multi = df.union(Seq((4L, "héllo wörld ☃ " * 50)).toDF("doc_id", "text"))
    val fast = TextAnalysis.compressionRatio(multi, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Option[Double])].collect().toSeq
    val spec = TextAnalysis.compressionRatioUdf(multi, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Option[Double])].collect().toSeq
    assert(fast == spec, s"codegen $fast != udf spec $spec")
    // and no serde row-trip in the plan: no ScalaUDF / DeserializeToObject
    val plan = TextAnalysis.compressionRatio(multi, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF") && !plan.contains("Deserialize"),
      s"expected a codegen-only plan:\n$plan")
  }

  test("tokenEntropy: degenerate repetition scores zero, balanced pair scores ln 2") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a a a"),   // H = 0, norm undefined
      (2L, "a b a b"),   // two types 50/50 -> H = ln 2, norm 1
      (3L, "a b c d")    // uniform 4 -> H = ln 4, norm 1
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(df, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Option[Double])].collect().toSeq
    assert(got(0) == ((1L, 4L, 1L, 0.0, None)), s"got ${got(0)}")
    assert(math.abs(got(1)._4 - math.log(2)) < 1e-3 &&
      got(1)._5.exists(n => math.abs(n - 1.0) < 1e-3), s"got ${got(1)}")
    assert(math.abs(got(2)._4 - math.log(4)) < 1e-3, s"got ${got(2)}")
  }

  test("lexicalRichness: hand token/type/hapax counts; empty text is one empty token") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a c"),      // 4 tokens, 3 types {a:2, b:1, c:1}, 2 hapax
      (2L, "x x x"),        // 3 tokens, 1 type, 0 hapax
      (3L, "")              // split("", " ") = [""] -> 1/1/1
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lexicalRichness(df, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 3L, 2L, 0.75, 0.5),
      (2L, 3L, 1L, 0L, 0.3333, 0.0),
      (3L, 1L, 1L, 1L, 1.0, 1.0)), s"got $got")
  }

  test("readability: hand Flesch counts; fragment floors at one sentence; empty text null") {
    import spark.implicits._
    val df = Seq(
      (1L, "Hello world. It is fun!"), // 5 words, 2 sentences, 6 syllables
      (2L, "no punctuation here"),     // fragment -> 1 sentence
      (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.readability(df, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Option[Double])].collect().toSeq
    assert(got(0)._2 == 5L && got(0)._3 == 2L && got(0)._4 == 6L,
      s"got ${got(0)}")
    val f = 206.835 - 1.015 * (5.0 / 2.0) - 84.6 * (6.0 / 5.0)
    assert(got(0)._5.exists(v => math.abs(v - f) < 1e-9), s"got ${got(0)}")
    assert(got(1)._3 == 1L && got(1)._5.nonEmpty, s"got ${got(1)}")
    assert(got(2)._5.isEmpty, s"empty text has no score: ${got(2)}")
  }

  test("encodingQuality: mojibake, control chars, and non-ASCII rates per source") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "clean ascii text", "good"),
      (2L, "more clean text!", "good"),
      (3L, "broken \ufffd decode \ufffd here", "bad"),   // 2 replacement chars
      (4L, "ctrl\u0001and\u0002bytes", "bad"),           // 2 control chars
      (5L, null.asInstanceOf[String], "bad")             // excluded
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.encodingQuality(docs, "text", "source")
      .orderBy("source")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    val bad = got.head; val good = got.last
    assert(good == (("good", 2L, 0.0, 0.0, 0.0)), s"got $good")
    assert(bad._1 == "bad" && bad._2 == 2L, s"null text must be excluded: $bad")
    assert(bad._3 == 0.5, s"1 of 2 docs carries U+FFFD: $bad")
    // 2 control chars over 22+14=36 chars -> round6(2/36)
    assert(bad._4 == 0.055556, s"got $bad")
    // 2 replacement chars are the only non-ASCII -> round6(2/36)
    assert(bad._5 == 0.055556, s"got $bad")
  }

  test("creditCardScan: Luhn separates cards from id-like runs, redacts only valid") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      // a real (test) card number + an invalid same-length run + short noise
      (1L, "pay 4532015112830366 not 4532015112830367 ref 123"),
      (2L, "visa test 4111111111111111 ok"),
      (3L, "order id 1234567890123 only"), // 13 digits, fails checksum
      (4L, "no digits at all"),
      (5L, "short 123 4567 runs")).toDF("id", "text")
    val got = TextAnalysis.creditCardScan(docs, "id", "text")
      .orderBy("id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L),
      "docs without card-length runs must drop")
    val byId = got.map(r => r.getLong(0) ->
      (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(byId(1L)._1 == 2 && byId(1L)._2 == 1)
    assert(byId(1L)._3 == "pay <CARD> not 4532015112830367 ref 123",
      s"only the checksum-valid run redacts: ${byId(1L)._3}")
    assert(byId(2L) == ((1, 1, "visa test <CARD> ok")))
    assert(byId(3L) == ((1, 0, "order id 1234567890123 only")),
      "an id-like run that fails Luhn must pass through")
    // the checksum itself, off the classic test vectors
    val luhn = Seq("4532015112830366", "79927398713", "4532015112830367")
      .toDF("s").select(graft.functions.Text.luhnValid(col("s")))
      .collect().map(_.getBoolean(0)).toSeq
    assert(luhn == Seq(true, true, false))
  }

  test("ngramOverlap: hand clipped P/R/F1, BLEU clipping, one-sided pairs") {
    import spark.implicits._
    val pairs = Seq(
      (1L, "a b c d", "a b c x"),   // 2 of 3 bigrams match both ways
      (2L, "a b", "a b a b"),       // clipping: repeated cand gram counts once
      (3L, "a b c", "x"),           // candidate under n tokens: no cand grams
      (4L, "q", "q")                // both under n: no gram rows -> drops
    ).toDF("id", "ref", "cand")
    val got = TextAnalysis.ngramOverlap(pairs, "id", "ref", "cand", n = 2)
      .orderBy("id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val r1 = got(0)
    assert(r1.getAs[Long]("clipped") == 2L &&
      r1.getAs[Double]("precision") == 0.666667 &&
      r1.getAs[Double]("recall") == 0.666667 &&
      r1.getAs[Double]("f1") == 0.666667, s"got $r1")
    val r2 = got(1)
    assert(r2.getAs[Long]("cand_ngrams") == 3L &&
      r2.getAs[Long]("clipped") == 1L, s"clipping must cap repeats: $r2")
    assert(r2.getAs[Double]("precision") == 0.333333 &&
      r2.getAs[Double]("recall") == 1.0 && r2.getAs[Double]("f1") == 0.5)
    val r3 = got(2)
    assert(r3.getAs[Long]("cand_ngrams") == 0L &&
      r3.isNullAt(r3.fieldIndex("precision")) &&
      r3.getAs[Double]("recall") == 0.0 &&
      r3.isNullAt(r3.fieldIndex("f1")), s"one-sided pair: $r3")
  }

  test("stupidBackoffTrigram: three score tiers, hand NLLs, short docs drop") {
    import spark.implicits._
    // reference "a b c a b d": c3 each 1; c2 ab=2, bc=1, ca=1, bd=1;
    // c1 a=2 b=2 c=1 d=1; N=6, V=4
    val ref = Seq((1L, "a b c a b d")).toDF("id", "text")
    val batch = Seq(
      (10L, "a b c"),   // trigram tier: 1 / c2(ab)=2
      (11L, "a b x"),   // unigram floor: 0.16 * (0+1)/(6+4)
      (12L, "x b c"),   // bigram backoff: 0.4 * c2(bc)/c1(b) = 0.4*0.5
      (13L, "b c a b"), // two seen trigrams at score exactly 1
      (14L, "a b")      // under 3 tokens: dropped
    ).toDF("id", "text")
    val got = TextAnalysis.stupidBackoffTrigram(batch, ref, "id", "text")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == Seq(10L, 11L, 12L, 13L))
    assert(got.map(_._2).toSeq == Seq(1L, 1L, 1L, 2L))
    val nll = got.map(_._3)
    assert(nll(0) == math.rint(-math.log(0.5) * 1e4) / 1e4, s"got ${nll(0)}")
    assert(math.abs(nll(1) -
      -math.log(0.16000000000000003 * 0.1)) < 1e-4, s"got ${nll(1)}")
    assert(math.abs(nll(2) - -math.log(0.2)) < 1e-4, s"got ${nll(2)}")
    assert(nll(3) == 0.0, s"fully-seen doc must score exactly 0: ${nll(3)}")
    // deeper context discriminates: a bigram-fluent trigram salad
    // scores WORSE than the original under the trigram model
    val ref2 = Seq((1L, "the cat sat on the mat")).toDF("id", "text")
    val pair = Seq((20L, "the cat sat on the mat"),
      (21L, "the cat the cat sat on")).toDF("id", "text")
    val scored = TextAnalysis.stupidBackoffTrigram(pair, ref2, "id", "text")
      .orderBy("id").collect().map(_.getDouble(2))
    assert(scored(0) < scored(1),
      s"original ${scored(0)} must beat the salad ${scored(1)}")
  }

  test("chao1Coverage matches the hand frequency-of-frequencies") {
    import spark.implicits._
    // tokens: a:2 b:2 c:1 d:1 -> N=6 S=4 f1=2 f2=2
    val df = Seq("a b a c", "d b").toDF("text")
    val r = TextAnalysis.chao1Coverage(df, "text").head()
    assert(r.getAs[Long]("tokens") === 6L)
    assert(r.getAs[Long]("vocab") === 4L)
    assert(r.getAs[Long]("f1") === 2L)
    assert(r.getAs[Long]("f2") === 2L)
    assert(r.getAs[Double]("chao1") === 4.333333)
    assert(r.getAs[Double]("gt_unseen_mass") === 0.333333)
    assert(r.getAs[Double]("coverage") === 0.666667)
  }

  test("rakeKeywords: degree/frequency scoring on the hand fixture, " +
      "ties break to phrase text") {
    import spark.implicits._
    // phrases: "deep learning", "deep networks" — deep deg 4 freq 2,
    // others deg 2 freq 1 -> every word scores 2, each phrase 4
    val df = Seq("deep learning of deep networks").toDF("text")
    val out = TextAnalysis.rakeKeywords(df, "text",
      stopwords = Seq("of"), topK = 10).collect()
    assert(out.map(_.getString(0)).toSeq
      === Seq("deep learning", "deep networks"))
    assert(out.forall(_.getAs[Double]("score") === 4.0))
    assert(out.forall(_.getAs[Long]("occurrences") === 1L))
  }

  test("vocabKlDrift: identical eras read 0, disjoint eras read the " +
      "hand smoothed KL symmetrically") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val same = Seq((0L, "x x y"), (1L, "x x y")).toDF("doc_id", "text")
    val s = TextAnalysis.vocabKlDrift(same, "text",
      col("doc_id") % 2 === 0).head()
    assert(s.getAs[Double]("kl_ab") === 0.0)
    assert(s.getAs[Double]("kl_ba") === 0.0)
    // A = xxx, B = yyy: KL = .8 ln4 + .2 ln(1/4) = .6 ln4 both ways
    val dis = Seq((0L, "x x x"), (1L, "y y y")).toDF("doc_id", "text")
    val d = TextAnalysis.vocabKlDrift(dis, "text",
      col("doc_id") % 2 === 0).head()
    assert(d.getAs[Double]("kl_ab") === 0.831777)
    assert(d.getAs[Double]("kl_ba") === 0.831777)
    assert(d.getAs[Long]("vocab") === 2L)
  }

  test("fightinWords: an A-exclusive token z-scores above a balanced " +
      "one; min-count drops the tail") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (true, ("x " * 10) + ("y " * 5).trim),
      (false, ("y " * 5) + ("rare " * 2).trim))
      .toDF("inA", "text")
    val out = TextAnalysis.fightinWords(docs, "text", col("inA"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("count_a"), r.getAs[Long]("count_b"),
          r.getAs[Double]("z"))).toMap
    assert(!out.contains("rare")) // below minCount = 5
    assert(out("x")._1 === 10L && out("x")._2 === 0L)
    assert(out("x")._3 > 0.0, "A-exclusive token must lean positive")
    assert(out("x")._3 > out("y")._3,
      "exclusive token must out-z the balanced one")
  }

  test("sourceVocabCosine: identical vocabularies read 1, half-shared " +
      "read 0.5, disjoint pairs are absent") {
    import spark.implicits._
    val df = Seq(("s1", "a b"), ("s2", "a b"), ("s4", "a c"),
      ("s9", "zz")).toDF("source", "text")
    val out = TextAnalysis.sourceVocabCosine(df, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("cosine")).toMap
    assert(out(("s1", "s2")) === 1.0)
    assert(out(("s1", "s4")) === 0.5)
    assert(out(("s2", "s4")) === 0.5)
    assert(out.size === 3) // s9 shares nothing: no rows at all
  }

  test("distinctN: repeated unigrams lower distinct-1, single-token " +
      "sources carry a null distinct-2") {
    import spark.implicits._
    val df = Seq(("s1", "a b a"), ("s2", "x")).toDF("source", "text")
    val out = TextAnalysis.distinctN(df, "source", "text")
      .orderBy("source").collect()
    val s1 = out(0)
    assert(s1.getAs[Long]("unigram_total") === 3L)
    assert(s1.getAs[Long]("unigram_distinct") === 2L)
    assert(s1.getAs[Double]("distinct_1") === 0.666667)
    assert(s1.getAs[Long]("bigram_total") === 2L)
    assert(s1.getAs[Double]("distinct_2") === 1.0)
    val s2 = out(1)
    assert(s2.getAs[Long]("bigram_total") === 0L)
    assert(s2.isNullAt(s2.fieldIndex("distinct_2")))
  }

  test("chao1Coverage stays defined with no doubletons (f2 = 0)") {
    import spark.implicits._
    val r = TextAnalysis.chao1Coverage(Seq("a b c").toDF("text"), "text")
      .head()
    // S=3, f1=3, f2=0 -> chao1 = 3 + 3*2/2 = 6
    assert(r.getAs[Double]("chao1") === 6.0)
    assert(r.getAs[Double]("gt_unseen_mass") === 1.0)
  }

  test("bm25TopDocs matches the hand-computed Okapi fixture: length " +
      "normalization outranks raw tf, zero-match docs drop") {
    import spark.implicits._
    // N=3, avgdl=10/3; idf(cat, df=2) = round8(ln(1+1.5/2.5))
    // d1: tf=2 dl=6 -> 0.527555; d3: tf=1 dl=2 -> 0.561961 — the
    // SHORT doc outranks the long one despite half the tf (the b
    // normalization doing its job); d2 never matches and drops
    val docs = Seq(
      (1L, "cat sat on the mat cat"),
      (2L, "dog sat"),
      (3L, "a cat")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopDocs(docs, "doc_id", "text",
      terms = Seq("cat"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3)))
    // n_matched counts matched TERMS (one here), not occurrences
    assert(out.toSeq === Seq((3L, 2L, 1, 0.561961),
      (1L, 6L, 1, 0.527555)))
  }

  /** Shared fixture for the two BM25 forms: enough vocabulary overlap
    * that every query matches several docs, plus an absent term. */
  private def bm25Corpus = Seq(
    (1L, "cat sat on the mat cat"),
    (2L, "dog sat on a log"),
    (3L, "a cat and a dog"),
    (4L, "the mat the log the cat"),
    (5L, "fish swim"))

  test("bm25TopDocsForQueries equals N independent bm25TopDocs calls " +
      "(the query-table/literal-form equivalence, r17 verdict #3)") {
    import spark.implicits._
    val docs = bm25Corpus.toDF("doc_id", "text")
    val queries = Seq((10L, "cat mat"), (20L, "dog log fish"),
      (30L, "cat unicorn"), (40L, "sat"))
    val (postings, lens) = TextAnalysis.bm25Index(docs, "doc_id", "text")
    val batch = TextAnalysis.bm25TopDocsForQueries(postings, lens,
        queries.toDF("qid", "qtext"), "qid", "qtext", topK = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getDouble(4)))
      .groupBy(_._1)
      .map { case (q, rows) => q -> rows.map(t =>
        (t._2, t._3, t._4, t._5)).sortBy(x => (-x._4, x._1)).toSeq }
    queries.foreach { case (qid, qtext) =>
      val single = TextAnalysis.bm25TopDocs(docs, "doc_id", "text",
          terms = qtext.split(" ").toSeq, topK = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getDouble(3))).toSeq
      assert(batch.getOrElse(qid, Seq.empty) === single,
        s"query $qid '$qtext': batch ${batch.get(qid)} != single $single")
    }
  }

  test("bm25TopDocsForQueries: corpus scan count is independent of the " +
      "query count, and the per-query top-k plans as WindowGroupLimit " +
      "(one job, never one scan per query)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bm25qt").toString
    bm25Corpus.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(dir)
    val docs = spark.read.parquet(dir)
    def planOf(n: Int): String = {
      val qs = (1 to n).map(i => (i.toLong, "cat dog mat"))
        .toDF("qid", "qtext")
      val (postings, lens) = TextAnalysis.bm25Index(docs, "doc_id", "text")
      TextAnalysis.bm25TopDocsForQueries(postings, lens, qs,
        "qid", "qtext").queryExecution.executedPlan.toString
    }
    def scans(plan: String): Int =
      plan.linesIterator.count(l => l.contains("FileScan parquet") ||
        l.contains("Scan parquet"))
    val p1 = planOf(1)
    val p16 = planOf(16)
    assert(scans(p16) === scans(p1),
      s"query-table BM25 must not scan per query: 1 query -> " +
        s"${scans(p1)} scans, 16 queries -> ${scans(p16)}:\n$p16")
    assert(p16.contains("WindowGroupLimit"),
      s"rank<=k must push into the shuffle as WindowGroupLimit:\n$p16")
  }

  test("ensureBm25IndexBucketed: the probe reads both index sides " +
      "from BUCKETED scans and drops their exchanges — the " +
      "bucketBy(term) steady-state claim, proven on the plan " +
      "(r18 #3); scores identical to the in-memory index") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, ShuffleQueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val corpus = Seq(
      ("d1", "cat sat on the mat cat"), ("d2", "dog sat on a log"),
      ("d3", "a cat and a dog"), ("d4", "the mat the log the cat"),
      ("d5", "cat cat dog dog mat"), ("d6", "log on the mat"))
      .toDF("doc_id", "text")
    Seq("bm25bkt_stamp", "bm25bkt_postings", "bm25bkt_lens")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val (bp, blens) = TextAnalysis.ensureBm25IndexBucketed(
      corpus, "doc_id", "text", "bm25bkt", numBuckets = 4)
    // a fresh ensure is a stamp read, not a rebuild: the returned
    // frames must come from the SAME table files
    val again = TextAnalysis.ensureBm25IndexBucketed(
      corpus, "doc_id", "text", "bm25bkt", numBuckets = 4)
    assert(again._1.inputFiles.sorted.toSeq ==
      bp.inputFiles.sorted.toSeq, "second ensure must not rewrite")
    val queries = Seq((1L, "cat mat"), (2L, "dog log mat"))
      .toDF("qid", "qt")
    // force the shuffle-join path: broadcast would hide the bucket
    // question entirely
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      def planOf(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
      def shuffles(df: org.apache.spark.sql.DataFrame): Int =
        planOf(df).collect {
          case s: ShuffleExchangeExec => s
          case s: ShuffleQueryStageExec => s
        }.size
      val probe = TextAnalysis.bm25TopDocsForQueries(bp, blens,
        queries, "qid", "qt", topK = 3)
      val plan = planOf(probe)
      // all three index reads are bucketed scans (postings feeds the
      // df aggregate AND the term join; lens feeds the doc_id join)
      val bucketedScans = plan.collect {
        case f: FileSourceScanExec if f.bucketedScan => f
      }
      assert(bucketedScans.size == 3,
        s"expected 3 bucketed index scans, got ${bucketedScans.size}:\n$plan")
      // and their exchanges are GONE: the same probe over the
      // PARQUET-DIR index (read-back scans — the portable fallback,
      // so the comparison is probe-path against probe-path, no build
      // shuffles in either count) pays exactly 2 more shuffles
      // (postings df-aggregate, lens doc_id-join side). r19: the
      // probe's query-side joins are broadcast BY CONTRACT (the
      // per-(term, doc) contribution restructure), so the postings
      // term-join exchange the r18 pin counted no longer exists in
      // EITHER path — bucketing now elides the two remaining
      // index-side exchanges.
      val dir = java.nio.file.Files
        .createTempDirectory("bm25bkt_ctl").toString
      val (pp, pl) = TextAnalysis.ensureBm25Index(
        corpus, "doc_id", "text", dir)
      val plain = TextAnalysis.bm25TopDocsForQueries(pp, pl,
        queries, "qid", "qt", topK = 3)
      assert(shuffles(plain) - shuffles(probe) == 2,
        s"bucketing must elide the 2 index-side exchanges: " +
          s"plain=${shuffles(plain)} bucketed=${shuffles(probe)}\n$plan")
      // identical scores (columns: query_id, doc_id, doc_len,
      // n_matched, bm25)
      val a = probe.orderBy(col("query_id"), col("doc_id"))
        .collect().toSeq
      val b = plain.orderBy(col("query_id"), col("doc_id"))
        .collect().toSeq
      assert(a == b, s"bucketed $a != plain $b")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
}
