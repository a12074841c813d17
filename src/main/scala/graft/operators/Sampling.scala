package graft.operators


import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Everything here is HASH-based, never `rand()`: a sample must be
  * reproducible across reruns, resumable mid-pipeline, and stable when
  * partitioning changes — none of which hold for per-row RNG. The unit
  * of sampling is a caller-chosen key column (sample by DOCUMENT, not
  * by row-fragment, when rows are chunks of a document).
  *
  * Scale notes: hash-mod sampling and splits are stateless per-row
  * filters (no shuffle, fully pushed into the scan stage). Stratified
  * take-n shuffles once on the strata; the per-stratum window sees only
  * that stratum.
  */
object Sampling {

  private def bucket(key: Column, seed: Long, buckets: Int): Column =
    pmod(xxhash64(key, lit(seed)), lit(buckets))

  /** Keep ~`fraction` of distinct keys, deterministically: a key is in
    * the sample iff xxhash64(key, seed) mod 1e6 < fraction·1e6. The
    * SAME key set survives across runs, partitionings, and engines
    * implementing xxhash64. */
  def deterministicSample(
      df: DataFrame, keyCol: String, fraction: Double, seed: Long = 42L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of range: $fraction")
    df.filter(bucket(col(keyCol), seed, 1000000) < (fraction * 1000000).toLong)
  }

  /** Deterministic disjoint splits (train/valid/test …): weights are
    * normalized; each key lands in exactly one split by its hash
    * bucket. Returns one DataFrame per weight, in order. */
  def splitByHash(
      df: DataFrame, keyCol: String, weights: Seq[Double], seed: Long = 42L): Seq[DataFrame] = {
    require(weights.nonEmpty && weights.forall(_ > 0), "weights must be positive")
    val total = weights.sum
    val bounds = weights.map(_ / total).scanLeft(0.0)(_ + _) // 0, c1, c2, …, 1
    // One rounding for BOTH sides of every boundary: split i's upper cut
    // is bit-identical to split i+1's lower cut, so no bucket can satisfy
    // two adjacent filters (disjointness) or neither (coverage).
    val cuts = bounds.map(x => math.round(x * 1000000))
    val b = bucket(col(keyCol), seed, 1000000)
    cuts.sliding(2).toSeq.map { case Seq(lo, hi) =>
      df.filter(b >= lo && b < hi)
    }
  }

  /** Engine-portable deterministic sample: keep a key iff the first
    * `prefixLen` hex chars of md5(key-as-string) sort below `hexCut`
    * (lower-case). Unlike [[deterministicSample]]'s xxhash64 (fastest,
    * but Spark-specific), md5-of-UTF-8 renders the same lower-case hex
    * on every engine, so the SAME key set survives a Spark↔DuckDB↔
    * anything migration — the reproducibility contract a training-data
    * freeze needs. Kept fraction ≈ int(hexCut,16) / 16^prefixLen.
    * Still a stateless per-row filter: no shuffle, runs in the scan. */
  def portableSample(
      df: DataFrame, keyCol: String, hexCut: String, prefixLen: Int = 4): DataFrame = {
    require(hexCut.length == prefixLen && hexCut.matches("[0-9a-f]+"),
      s"hexCut must be $prefixLen lower-case hex chars: $hexCut")
    df.filter(substring(md5(col(keyCol).cast("string")), 1, prefixLen) < hexCut)
  }

  /** Exactly-n-per-stratum sample, chosen deterministically: rank rows
    * within each stratum by (hash, tiebreak) and keep the first n.
    * The hash ordering is an unbiased deterministic shuffle. */
  def stratifiedTakeN(
      df: DataFrame, strata: Seq[String], n: Int, keyCol: String,
      seed: Long = 42L): DataFrame = {
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(xxhash64(col(keyCol), lit(seed)), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Engine-portable stratified take-n: [[stratifiedTakeN]]'s contract
    * with the hash ordering switched from xxhash64 to md5 hex (same
    * rendering on every engine — see [[portableSample]]), so a frozen
    * per-stratum sample can be reproduced bit-for-bit outside Spark.
    * Same plan shape: one shuffle on the strata, ranking window sees
    * only its stratum. */
  def stratifiedTakeNPortable(
      df: DataFrame, strata: Seq[String], n: Int, keyCol: String): DataFrame = {
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Weighted source mixing: sample each source at a rate proportional
    * to target weight over its share, then union — the standard
    * "mix web/books/code at w1:w2:w3" pipeline stage. `rates` are
    * per-source KEEP probabilities (caller derives them from target
    * mixture and corpus sizes); sources with rate ≥ 1 pass through. */
  def mixSources(
      sources: Seq[(DataFrame, Double)], keyCol: String, seed: Long = 42L): DataFrame = {
    require(sources.nonEmpty, "no sources to mix")
    sources.zipWithIndex.map { case ((df, rate), i) =>
      if (rate >= 1.0) df
      else deterministicSample(df, keyCol, rate, seed + i)
    }.reduce(_ unionByName _)
  }

  /** Engine-portable source mixing: each source keeps keys whose md5
    * prefix sorts below its own hex cut (rate ≈ int(cut,16)/16^len;
    * `None` = pass through). Unlike [[mixSources]] there is no
    * per-source seed, so the SAME key draws the same hash in every
    * source — fine when sources partition the key space (the normal
    * case: a document lives in one source), correlated otherwise.
    * Still per-row filters + union: no shuffle anywhere. */
  def mixSourcesPortable(
      sources: Seq[(DataFrame, Option[String])], keyCol: String,
      prefixLen: Int = 4): DataFrame = {
    require(sources.nonEmpty, "no sources to mix")
    sources.map {
      case (df, Some(cut)) => portableSample(df, keyCol, cut, prefixLen)
      case (df, None)      => df
    }.reduce(_ unionByName _)
  }

  /** Temperature-based group resampling (the XLM-R / mT5 multilingual
    * balancing shape): group `l` is kept at rate (n_min / n_l)^α, so the
    * smallest group passes whole and larger groups are subsampled toward
    * balance — α → 0 keeps the original proportions, α = 1 equalizes
    * every group to ≈ n_min. The keep
    * decision is the [[portableSample]] md5 filter with a PER-GROUP
    * cutoff computed in-plan: one tiny count agg → broadcast join →
    * stateless per-row filter; no data-sized shuffle, no driver action.
    *
    * Determinism across engines (the oracle twin must agree bit-for-bit
    * on the cutoff): for α = 0.5 the rate is computed as
    * `sqrt(n_min / n_l)` — division and sqrt are IEEE correctly-rounded
    * in BOTH Spark (java.lang.Math) and DuckDB (libm), so the doubles
    * are identical; `pow`, by contrast, is not correctly-rounded and
    * may differ in the last ulp between libms. Other α use pow and are
    * Spark-reproducible but not oracle-pinned. The double rate becomes
    * an integer cutoff `floor(rate · 16^4)` rendered as 4 lower-case
    * hex chars; rows survive iff their md5 prefix sorts below it
    * (rate ≥ 1 → the whole group passes). */
  def temperatureResample(
      df: DataFrame, keyCol: String, groupCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1]: $alpha")
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("double").as("__n"))
    val minN = counts.agg(min(col("__n")).as("__minn"))
    val rates = counts.crossJoin(broadcast(minN))
      .withColumn("__rate",
        if (alpha == 0.5) sqrt(col("__minn") / col("__n"))
        else pow(col("__minn") / col("__n"), alpha))
      .withColumn("__cut",
        format_string("%04x", floor(col("__rate") * lit(65536.0d)).cast("int")))
      .select(col(groupCol), col("__rate"), col("__cut"))
    df.join(broadcast(rates), Seq(groupCol))
      .filter(col("__rate") >= 1.0d ||
        substring(md5(col(keyCol).cast("string")), 1, 4) < col("__cut"))
      .drop("__rate", "__cut")
  }

  /** Deterministic shuffle into `shards` training shards — the
    * write-ready layout of a training-data freeze. Shard id is the
    * first 8 hex chars of md5(key) parsed as an integer mod `shards`
    * (balanced in expectation with no global ordering step); `pos` is
    * the row's rank within its shard in md5-of-key order (the portable
    * deterministic shuffle — see [[portableSample]] on why md5 hex and
    * not xxhash64). Every engine reproduces the same (shard, pos) for
    * every key, so shard files are bit-stable across reruns and
    * engines. Plan: one shuffle on shard; the ranking window never
    * leaves its shard partition. To write: repartition by shard, sort
    * within partitions by pos. `keyCol` must be row-unique. */
  def shuffleToShards(df: DataFrame, keyCol: String, shards: Int): DataFrame = {
    require(shards > 0, s"shards must be positive: $shards")
    val hex = md5(col(keyCol).cast("string"))
    val w = Window.partitionBy(col("shard")).orderBy(hex, col(keyCol))
    df.withColumn("shard",
        pmod(conv(substring(hex, 1, 8), 16, 10).cast("long"), lit(shards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Per-stratum TOKEN-budget take: walk each stratum's rows in
    * md5-of-key order (the portable deterministic shuffle) and keep
    * rows while the running token total stays ≤ `budget` — "give me
    * ~N tokens of web, ~M of code" data mixing, where quotas are
    * token counts, not document counts. The row that would overflow
    * the budget is excluded (its successors too: the cumulative sum is
    * monotone, sizes being nonneg). One shuffle on the strata; the
    * running-sum window never leaves its stratum partition.
    *
    * `keyCol` must uniquely identify a row WITHIN its stratum (as with
    * the other portable samplers): rows tied on (md5(key), key) have no
    * defined order, so a budget boundary falling inside a tied run
    * would keep a run-dependent subset. Chunked inputs should pass a
    * chunk-unique key (e.g. concat(doc_id, chunk_id)), not doc_id. */
  def takeTokenBudgetPortable(
      df: DataFrame, strata: Seq[String], sizeCol: Column, budget: Long,
      keyCol: String): DataFrame = {
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(sizeCol).over(w))
      .filter(col("__cum") <= budget)
      .drop("__cum")
  }

  /** X122 — weighted sampling without replacement, deterministic
    * (Efraimidis–Spirakis A-ES, IPL 2006): each row draws
    * `u ∈ (0,1)` and ranks by `ln(u)/w` descending — the top-k of
    * those keys IS an exact weight-proportional sample without
    * replacement (quality-weighted corpus subsets, importance-weighted
    * eval slices). The noise is the x131 DSIR trick: `u` comes from
    * the row key's md5 prefix, so the sample is REPRODUCIBLE and
    * engine-portable (md5-of-UTF-8 renders identically everywhere) —
    * same contract as [[portableSample]], but weighted.
    *
    * One stateless map + TakeOrderedAndProject on the ROUNDED key (the
    * 6-dp round through DECIMAL(18,8) is what makes the float `ln`
    * comparable across engines; key ties break on the row key). Rows
    * with non-positive weights are excluded (their key is undefined).
    */
  def weightedSamplePortable(
      df: DataFrame, keyCol: String, weightCol: String, k: Int,
      roundDigits: Int = 6): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val u = (conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10)
      .cast("double") + 0.5d) / 4294967296.0d
    val key = round((log(u) / col(weightCol).cast("double")).cast(stable),
      roundDigits).cast("double")
    df.filter(col(weightCol).cast("double") > 0)
      .withColumn("es_key", key)
      .orderBy(col("es_key").desc, col(keyCol))
      .limit(k)
  }

  /** Neyman optimal stratified-sample allocation (Neyman 1934):
    * sampling budget proportional to `N_h·σ_h` — strata that are big
    * OR internally varied get the samples; a uniform-rate sample
    * wastes budget on homogeneous strata. The planning read before
    * any stratified eval/labeling pass over a corpus. One moment
    * aggregate per stratum (population σ), shares from the stratum
    * cell table, `alloc` = floor(share × budget).
    */
  def neymanAllocation(df: DataFrame, stratum: Column, value: Column,
      budget: Long, roundDigits: Int = 6): DataFrame = {
    require(budget > 0, s"budget must be > 0: $budget")
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val cells = df.filter(stratum.isNotNull && value.isNotNull)
      .select(stratum.cast("string").as("__g"),
        value.cast("double").as("__v"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n"), sum(col("__v")).as("__s"),
        sum(col("__v") * col("__v")).as("__s2"))
    val nD = col("n").cast("double")
    val sd = sqrt(greatest((col("__s2") - col("__s") * col("__s") / nD)
      / nD, lit(0.0d)))
    // N_h·σ_h rides DECIMAL(28,8): price-scale strata overflow (18,8)
    val withSd = cells.select(col("__g"), col("n"),
      round((nD * sd).cast(org.apache.spark.sql.types.DecimalType(28, 8)),
        8).as("__w"))
    val tot = withSd.agg(sum(col("__w")).as("__tw"))
    withSd.crossJoin(broadcast(tot))
      .filter(col("__tw").cast("double") > 0)
      .select(col("__g").as("stratum"), col("n"),
        round((col("__w").cast("double") / col("__tw").cast("double"))
          .cast(stable), roundDigits).cast("double").as("share"),
        floor(col("__w").cast("double") / col("__tw").cast("double")
          * budget).cast("long").as("alloc"))
      .orderBy(col("stratum"))
  }

  /** Kish effective sample size per group: `ESS = (Σw)²/Σw²` (Kish
    * 1965) — how many EQUAL-weight rows this weighted group is worth.
    * The sanity gauge on every weighted mix (x62/x68 source weights,
    * DSIR importance weights x131): an `ess_ratio` near 0 means a few
    * huge weights dominate and the "million-document" source
    * contributes the information of a handful. One moment aggregate;
    * shuffle bounded by groups.
    */
  def effectiveSampleSize(df: DataFrame, group: Column, weight: Column,
      roundDigits: Int = 6): DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val cells = df.filter(group.isNotNull && weight.isNotNull)
      .select(group.cast("string").as("__g"),
        weight.cast("double").as("__w"))
      .filter(col("__w") > 0)
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n"), sum(col("__w")).as("__s"),
        sum(col("__w") * col("__w")).as("__s2"))
    val ess = col("__s") * col("__s") / col("__s2")
    cells.filter(col("__s2") > 0)
      .select(col("__g").as("group"), col("n"),
        round(ess.cast(stable), roundDigits).cast("double").as("ess"),
        round((ess / col("n").cast("double")).cast(stable), roundDigits)
          .cast("double").as("ess_ratio"))
      .orderBy(col("group"))
  }
}
