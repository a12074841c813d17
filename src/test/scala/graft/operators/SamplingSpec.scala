package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("deterministicSample: reproducible, partition-invariant, ~fraction sized") {
    val docs = Tables.documents(spark, dir)
    val s1 = Sampling.deterministicSample(docs, "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.deterministicSample(docs.repartition(13), "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2, "sample must not depend on partitioning")
    val frac = s1.size.toDouble / docs.count()
    assert(frac > 0.2 && frac < 0.4, s"fraction off: $frac")
    // a different seed picks a different set
    val s3 = Sampling.deterministicSample(docs, "doc_id", 0.3, seed = 7L)
      .select("doc_id").as[Long].collect().toSet
    assert(s3 != s1)
  }

  test("portableSample: partition-invariant, ~cut-proportional, nested by cut") {
    val docs = Tables.documents(spark, dir)
    val s1 = Sampling.portableSample(docs, "doc_id", "2aaa")
      .select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.portableSample(docs.repartition(13), "doc_id", "2aaa")
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2, "sample must not depend on partitioning")
    val frac = s1.size.toDouble / docs.count()
    // E[frac] = 0x2aaa/0x10000 = 1/6
    assert(frac > 0.1 && frac < 0.25, s"fraction off: $frac")
    // widening the cut only ADDS keys — a frozen sample stays frozen
    // when the rate is later raised (training-data freeze contract)
    val wider = Sampling.portableSample(docs, "doc_id", "5555")
      .select("doc_id").as[Long].collect().toSet
    assert(s1.subsetOf(wider), "narrow-cut sample must nest inside wider cut")
  }

  test("splitByHash: disjoint, exhaustive, weight-proportional") {
    val docs = Tables.documents(spark, dir)
    val Seq(train, valid, test) = Sampling.splitByHash(docs, "doc_id", Seq(8, 1, 1))
    val (tr, va, te) = (
      train.select("doc_id").as[Long].collect().toSet,
      valid.select("doc_id").as[Long].collect().toSet,
      test.select("doc_id").as[Long].collect().toSet)
    assert((tr & va).isEmpty && (tr & te).isEmpty && (va & te).isEmpty, "splits overlap")
    assert(tr.size + va.size + te.size == docs.count(), "splits must partition the corpus")
    assert(tr.size > va.size * 4, s"train ${tr.size} not ~8x valid ${va.size}")
  }

  test("splitByHash: disjoint + exhaustive on non-integer boundaries (1:1:1)") {
    // 1/3 and 2/3 boundaries don't land on integer buckets — the
    // regression was split i's rounded upper bound overlapping split
    // i+1's truncated lower bound, double-counting the boundary bucket.
    val docs = Tables.documents(spark, dir)
    val splits = Sampling.splitByHash(docs, "doc_id", Seq(1, 1, 1))
    val sets = splits.map(_.select("doc_id").as[Long].collect().toSet)
    for (i <- sets.indices; j <- sets.indices if i < j)
      assert((sets(i) & sets(j)).isEmpty, s"splits $i and $j overlap")
    assert(sets.map(_.size).sum == docs.count(), "splits must partition the corpus")
  }

  test("stratifiedTakeN: exactly n per stratum (or all when smaller), deterministic") {
    val docs = Tables.documents(spark, dir)
    val out = Sampling.stratifiedTakeN(docs, Seq("lang"), 20, "doc_id")
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val available = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    available.foreach { case (lang, avail) =>
      assert(counts(lang) == math.min(20L, avail), s"lang=$lang")
    }
    val again = Sampling.stratifiedTakeN(docs, Seq("lang"), 20, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
  }

  test("stratifiedTakeNPortable: n per stratum, nested by n, partition-invariant") {
    val docs = Tables.documents(spark, dir)
    val out = Sampling.stratifiedTakeNPortable(docs, Seq("lang"), 15, "doc_id")
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val available = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    available.foreach { case (lang, avail) =>
      assert(counts(lang) == math.min(15L, avail), s"lang=$lang")
    }
    val ids = out.select("doc_id").as[Long].collect().toSet
    val repart = Sampling.stratifiedTakeNPortable(docs.repartition(13), Seq("lang"), 15, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(repart == ids, "sample must not depend on partitioning")
    // raising n only ADDS rows — the md5 order freezes a prefix
    val wider = Sampling.stratifiedTakeNPortable(docs, Seq("lang"), 25, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(ids.subsetOf(wider), "take-15 must nest inside take-25")
  }

  test("mixSourcesPortable: pass-through on None, cut-sampled otherwise, no row invented") {
    val docs = Tables.documents(spark, dir)
    val a = docs.filter(col("source") === "src0")
    val b = docs.filter(col("source") === "src1")
    val mixed = Sampling.mixSourcesPortable(Seq((a, None), (b, Some("8000"))), "doc_id")
    assert(mixed.filter(col("source") === "src0").count() == a.count())
    val nb = mixed.filter(col("source") === "src1").count()
    assert(nb < b.count() && nb > 0, s"cut-8000 source must shrink: $nb of ${b.count()}")
    // the sampled subset is exactly the portableSample of that source
    val expected = Sampling.portableSample(b, "doc_id", "8000")
      .select("doc_id").as[Long].collect().toSet
    val got = mixed.filter(col("source") === "src1")
      .select("doc_id").as[Long].collect().toSet
    assert(got == expected)
  }

  test("mixSources: pass-through at rate 1, sampled below, union of both") {
    val docs = Tables.documents(spark, dir)
    val a = docs.filter(col("source") === "src0")
    val b = docs.filter(col("source") === "src1")
    val mixed = Sampling.mixSources(Seq((a, 1.0), (b, 0.5)), "doc_id")
    val na = mixed.filter(col("source") === "src0").count()
    val nb = mixed.filter(col("source") === "src1").count()
    assert(na == a.count(), "rate-1.0 source must pass through whole")
    assert(nb < b.count() && nb > 0, s"rate-0.5 source must shrink: $nb of ${b.count()}")
  }

  test("takeTokenBudgetPortable: per-stratum sum <= budget, md5-prefix closed") {
    val docs = Tables.documents(spark, dir)
      .withColumn("tok", graft.functions.Text.tokenCount(col("text")))
    val budget = 700L
    val kept = Sampling.takeTokenBudgetPortable(
      docs, Seq("source"), col("tok"), budget, "doc_id")
    val sums = kept.groupBy("source").agg(sum("tok").as("s"))
      .as[(String, Long)].collect()
    assert(sums.nonEmpty && sums.forall(_._2 <= budget))
    // prefix-closed: every kept doc's md5 order rank precedes every
    // dropped doc's within its source (the take is a prefix, not a subset)
    val ranked = docs.withColumn("__k",
      concat(md5(col("doc_id").cast("string")), col("doc_id").cast("string")))
    val keptMax = ranked.join(kept.select("doc_id"), Seq("doc_id"))
      .groupBy("source").agg(max("__k").as("kmax"))
    val dropMin = ranked.join(kept.select("doc_id"), Seq("doc_id"), "left_anti")
      .groupBy("source").agg(min("__k").as("dmin"))
    val viol = keptMax.join(dropMin, "source")
      .filter(col("kmax") >= col("dmin")).count()
    assert(viol == 0, "kept set must be an order-prefix per source")
  }

  test("temperatureResample: smallest group whole, larger groups -> sqrt-rate, partition-invariant") {
    val docs = Tables.documents(spark, dir)
    val before = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val minN = before.values.min
    val smallest = before.minBy(_._2)._1

    val kept = Sampling.temperatureResample(docs, "doc_id", "lang", alpha = 0.5)
    val after = kept.groupBy("lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap

    // the rarest language passes whole (rate = 1)
    assert(after(smallest) == minN,
      s"smallest group must survive intact: ${after(smallest)} vs $minN")
    // every other group lands near its sqrt(n_min/n) expectation
    before.foreach { case (lang, n) =>
      val expected = n * math.sqrt(minN.toDouble / n)
      val got = after.getOrElse(lang, 0L).toDouble
      assert(math.abs(got - expected) < 4 * math.sqrt(expected) + 8,
        s"$lang: kept $got, expected ≈ $expected of $n")
    }
    // balance direction: the max/min group ratio must shrink
    val ratioBefore = before.values.max.toDouble / before.values.min
    val ratioAfter = after.values.max.toDouble / after.values.min
    assert(ratioAfter < ratioBefore,
      s"resampling must move toward balance: $ratioBefore -> $ratioAfter")

    // deterministic + partition-invariant key set
    val a = kept.select("doc_id").as[Long].collect().toSet
    val b = Sampling.temperatureResample(
        docs.repartition(13), "doc_id", "lang", alpha = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "kept set must not depend on partitioning")

    // alpha = 1 equalizes: every group within noise of n_min
    val eq = Sampling.temperatureResample(docs, "doc_id", "lang", alpha = 1.0)
      .groupBy("lang").agg(count(lit(1)).as("n")).as[(String, Long)].collect()
    eq.foreach { case (lang, n) =>
      assert(math.abs(n.toDouble - minN) < 4 * math.sqrt(minN.toDouble) + 8,
        s"alpha=1 must equalize $lang to ≈ $minN, got $n")
    }
  }

  test("shuffleToShards: every row placed once, pos contiguous per shard, partition-invariant") {
    val docs = Tables.documents(spark, dir)
    val n = docs.count()
    val sharded = Sampling.shuffleToShards(docs, "doc_id", shards = 8)
    assert(sharded.count() == n, "a shuffle must not drop or invent rows")
    // shard ids in range, every shard's positions are exactly 1..count
    val perShard = sharded.groupBy("shard")
      .agg(count(lit(1)).as("c"), min("pos").as("lo"), max("pos").as("hi"))
      .as[(Long, Long, Long, Long)].collect()
    assert(perShard.forall { case (s, _, _, _) => s >= 0 && s < 8 })
    assert(perShard.forall { case (_, c, lo, hi) => lo == 1L && hi == c },
      s"positions must be contiguous 1..count per shard: ${perShard.toSeq}")
    assert(perShard.length > 1, "500 docs should land in more than one shard")
    // deterministic + partition-invariant: identical (key, shard, pos)
    val a = sharded.select("doc_id", "shard", "pos")
      .as[(Long, Long, Long)].collect().toSet
    val b = Sampling.shuffleToShards(docs.repartition(13), "doc_id", 8)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect().toSet
    assert(a == b, "placement must not depend on input partitioning")
  }

  test("weightedSamplePortable: deterministic, weight-dominant, nonpositive weights excluded") {
    import spark.implicits._
    // a weight 9 orders of magnitude above the rest pins its key to
    // ~0 (the A-ES maximum); run-to-run and partitioning-invariant
    val rows = (1L to 50L).map(i => (i, if (i == 7L) 1e9 else 1e-3)) ++
      Seq((51L, 0.0), (52L, -5.0))
    val df = rows.toDF("id", "w")
    val got = Sampling.weightedSamplePortable(df, "id", "w", k = 10)
      .select("id").as[Long].collect().toSeq
    assert(got.head == 7L, s"dominant weight must rank first: $got")
    assert(!got.contains(51L) && !got.contains(52L),
      "nonpositive weights must be excluded")
    assert(got.length == 10)
    val again = Sampling.weightedSamplePortable(df.repartition(7), "id",
      "w", k = 10).select("id").as[Long].collect().toSeq
    assert(got == again, "sample must be reproducible")
  }

  test("neymanAllocation: zero-variance strata get nothing, the " +
      "dispersed stratum takes the whole budget") {
    import spark.implicits._
    val df = Seq(("A", 5.0), ("A", 5.0), ("B", 0.0), ("B", 10.0))
      .toDF("g", "v")
    val out = Sampling.neymanAllocation(df, col("g"), col("v"),
      budget = 1000).collect().map(r => r.getString(0) ->
        (r.getAs[Double]("share"), r.getAs[Long]("alloc"))).toMap
    assert(out("A") === ((0.0, 0L)))
    assert(out("B") === ((1.0, 1000L)))
  }

  test("effectiveSampleSize: equal weights read full n, a dominant " +
      "weight collapses the ESS") {
    import spark.implicits._
    val df = Seq(("eq", 2.0), ("eq", 2.0), ("eq", 2.0),
      ("skew", 1.0), ("skew", 1.0), ("skew", 8.0),
      ("skew", 0.0)) // non-positive weights drop
      .toDF("g", "w")
    val out = Sampling.effectiveSampleSize(df, col("g"), col("w"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Double]("ess"),
          r.getAs[Double]("ess_ratio"))).toMap
    assert(out("eq") === ((3L, 3.0, 1.0)))
    assert(out("skew") === ((3L, 1.515152, 0.505051))) // 100/66
  }
}
