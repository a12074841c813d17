package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed probabilistic sketches with ENGINE-PORTABLE hashing —
  * the md5-hex discipline of [[Sampling]] (lower-case hex renders
  * identically everywhere, so a DuckDB oracle reproduces every bucket
  * decision bit-for-bit). Each sketch is a plain DataFrame of
  * counters: build = one map-side-combinable aggregate, merge = union
  * + re-aggregate, query = a bounded join — no custom state, no UDAF,
  * nothing that can't checkpoint/restart like any other frame.
  */
object Sketch {

  /** Bucket of `key` under seed row `j`: the first 8 hex chars of
    * md5("j:key") as an integer, mod `width` — non-negative by
    * construction (8 hex chars < 2³²). */
  private def bucket(j: Column, key: Column, width: Int): Column =
    pmod(conv(substring(md5(concat(j.cast("string"), lit(":"),
      key.cast("string"))), 1, 8), 16, 10).cast("long"), lit(width.toLong))

  /** The SAME bucket computed driver/executor-side in plain Scala
    * (java MessageDigest MD5 over UTF-8, lower-case hex — identical
    * bytes to Spark's `md5` and DuckDB's) — the streaming twin
    * ([[graft.streaming.Stateful.countMinMonitor]]) keys its state
    * store with it; SketchSpec pins Scala ≡ engine bucket equality. */
  private[graft] def bucketOf(j: Int, key: String, width: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j:$key".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16) % width
  }

  /** The depth×width counter table alone (build side of
    * [[countMinFrequencies]], shared with the streaming twin's
    * parity spec): one map-side-combinable aggregate, at most
    * depth·width rows out. */
  private[graft] def counterTable(
      df: DataFrame, key: Column, depth: Int, width: Int): DataFrame = {
    val rows = df.filter(key.isNotNull)
      .select(key.cast("string").as("__k"))
    val seeds = array((0 until depth).map(j => lit(j)): _*)
    rows
      .select(col("__k"), explode(seeds).as("__j"))
      .groupBy(col("__j"), bucket(col("__j"), col("__k"), width).as("__b"))
      .agg(count(lit(1)).as("__c"))
  }

  /** X215 — count–min sketch (Cormode–Muthukrishnan '05): estimate
    * per-key frequencies from a `depth × width` counter table instead
    * of a key-cardinality aggregate — THE bounded-memory heavy-hitter
    * primitive when the key domain is unbounded (URLs, n-grams,
    * user agents) and an exact groupBy's shuffle would carry every
    * distinct key. Estimates NEVER undercount; they overcount by
    * colliding keys' mass with probability ≤ (1/e)^depth of exceeding
    * ε·N at width = e/ε (the paper's guarantee).
    *
    * Build: each row emits `depth` (seed, bucket) pairs — exploded
    * BEFORE the aggregate so map-side combine collapses them to the
    * depth·width counter table inside the scan stage; the shuffle
    * carries at most depth·width rows per mapper, never the data.
    * Query: the key list (driver-bounded) hashes the same way and
    * takes the MIN counter across seeds via one broadcast join. True
    * counts ride along from one key-filtered exact aggregate so the
    * overcount is visible in the output. All counts exact integers.
    */
  /** HLL bucket of `key`: first 8 hex chars of md5("b:key") as an
    * integer, mod `m` — the register index. A SEPARATE md5 call
    * ("r:" prefix) supplies the rank bits, so bucket and rank are
    * independent hash draws (reusing one 32-bit word for both would
    * correlate them and bias the estimate). */
  private def hllBucket(key: Column, m: Int): Column =
    pmod(conv(substring(md5(concat(lit("b:"), key.cast("string"))), 1, 8),
      16, 10).cast("long"), lit(m.toLong))

  /** HLL rank ρ(w) of `key`: position of the leftmost 1-bit in the
    * 32-bit word w = first 8 hex chars of md5("r:key"), i.e.
    * 33 − significant_bits(w) via the binary-string length (`bin`
    * renders identically in Spark and DuckDB); w = 0 → 33 (all 32
    * bits zero) — exact integer arithmetic, no log2 float. */
  private def hllRank(key: Column): Column = {
    val w = conv(substring(md5(concat(lit("r:"), key.cast("string"))), 1, 8),
      16, 10).cast("long")
    when(w === 0L, lit(33)).otherwise(lit(33) - length(bin(w)))
  }

  /** Driver/executor-side Scala twins of [[hllBucket]]/[[hllRank]]
    * (java MD5 over UTF-8 — identical bytes to Spark's `md5` and
    * DuckDB's); the streaming register monitor
    * ([[graft.streaming.Stateful.hllRegisterMonitor]]) keys its state
    * with them; SketchSpec pins Scala ≡ engine equality. */
  private[graft] def hllBucketOf(key: String, m: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"b:$key".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16) % m
  }

  private[graft] def hllRankOf(key: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"r:$key".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val w = java.lang.Long.parseLong(
      d.take(4).map(b => f"$b%02x").mkString, 16)
    if (w == 0L) 33 else 33 - (64 - java.lang.Long.numberOfLeadingZeros(w))
  }

  /** The m-register table alone (build side of [[hllDistinct]],
    * shared with the streaming twin's parity spec): one map-side-
    * combinable MAX aggregate, at most m rows out — the whole sketch
    * state, regardless of input cardinality. */
  private[graft] def hllRegisterTable(
      df: DataFrame, key: Column, m: Int): DataFrame =
    df.filter(key.isNotNull)
      .select(key.cast("string").as("__k"))
      .groupBy(hllBucket(col("__k"), m).as("__b"))
      .agg(max(hllRank(col("__k"))).as("__r"))

  /** Estimate from an (already-built) register table — the SHARED
    * rollup both the batch sketch and the streaming register monitor
    * finish through, so stream ≡ batch by construction. The harmonic
    * sum is kept EXACT: Σ 2^(−M_j) is scaled by 2⁴⁰ so every term
    * 2^(40−M_j) is an integer (M_j ≤ 33), empty registers contribute
    * 2⁴⁰ each, and the one float chain divides at the end (×2⁴⁰ is a
    * power-of-two scale — exact in IEEE). Small-range correction
    * (Flajolet et al. '07): E ≤ 2.5m with empty registers → linear
    * counting m·ln(m/Z), the ln rounded through DECIMAL(18,8) before
    * the multiply so the one non-correctly-rounded libm call is
    * pinned to 8 dp on every engine. */
  private[graft] def hllEstimateFromRegisters(
      regs: DataFrame, m: Int): DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val two40 = 1099511627776L // 2^40
    val agg = regs.agg(
      count(lit(1)).as("nonempty"),
      (sum(expr("shiftleft(1L, 40 - __r)"))
        + (lit(m.toLong) - count(lit(1))) * lit(two40)).as("__s"))
    val raw = alpha * lit((m.toLong * m).toDouble) * lit(two40.toDouble) /
      col("__s").cast("double")
    val zeros = lit(m.toLong) - col("nonempty")
    val lin = lit(m.toDouble) *
      round(log(lit(m.toDouble) / zeros.cast("double")).cast(stable), 8)
        .cast("double")
    agg.select(
      lit(m).as("m"), col("nonempty"),
      round(raw.cast(stable), 6).cast("double").as("raw_estimate"),
      round(when(raw <= lit(2.5) * lit(m.toDouble) && zeros > 0L, lin)
        .otherwise(raw).cast(stable), 6).cast("double").as("estimate"))
  }

  /** X227 — HyperLogLog-style distinct-count sketch (Flajolet–Fusy–
    * Gandouet–Meunier '07) with ENGINE-PORTABLE register arithmetic:
    * estimate |distinct keys| from m max-rank registers instead of a
    * distinct aggregate — the bounded-memory cardinality primitive
    * when the key domain is unbounded (URLs, n-grams, user ids) and
    * an exact `count(distinct)` would shuffle every distinct key.
    * Relative error ≈ 1.04/√m. The register table is one map-side-
    * combinable MAX aggregate (shuffle carries ≤ m rows per mapper,
    * never the keys); registers merge across corpora/batches by MAX —
    * the same additivity story as [[countMinFrequencies]], which is
    * what makes the sketch a monitoring primitive and not just a
    * query. True distinct rides along from one exact aggregate so the
    * error is visible in the output (drop it at production scale).
    */
  def hllDistinct(df: DataFrame, key: Column, m: Int = 1024): DataFrame = {
    require(m >= 128 && (m & (m - 1)) == 0,
      s"m must be a power of two >= 128: $m")
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val est = hllEstimateFromRegisters(hllRegisterTable(df, key, m), m)
    val truth = df.filter(key.isNotNull)
      .agg(countDistinct(key.cast("string")).as("true_distinct"))
    est.crossJoin(truth)
      .select(col("m"), col("nonempty"), col("raw_estimate"),
        col("estimate"), col("true_distinct"),
        round(((col("estimate") - col("true_distinct").cast("double"))
          / col("true_distinct").cast("double")).cast(stable), 6)
          .cast("double").as("rel_error"))
  }

  /** X231 — per-group HLL distinct counts ([[hllDistinct]] grouped):
    * ONE scan builds every group's m-register sketch (groupBy
    * (group, bucket) max-rank — ≤ m rows per group out of the
    * aggregate, never the keys), then a bounded per-group finishing
    * aggregate — the "distinct users per segment / distinct n-grams
    * per source" profile that an exact per-group `count(distinct)`
    * answers only by shuffling every (group, key) pair. Exact truths
    * ride along for visible error. */
  def hllDistinctBy(
      df: DataFrame, key: Column, groupCols: Seq[String],
      m: Int = 1024): DataFrame = {
    require(m >= 128 && (m & (m - 1)) == 0,
      s"m must be a power of two >= 128: $m")
    require(groupCols.nonEmpty, "need at least one group column")
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val gcols = groupCols.map(col)
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val two40 = 1099511627776L // 2^40
    val base = df.filter(key.isNotNull)
      .select(gcols :+ key.cast("string").as("__k"): _*)
    val regs = base
      .groupBy(gcols :+ hllBucket(col("__k"), m).as("__b"): _*)
      .agg(max(hllRank(col("__k"))).as("__r"))
    val agg = regs.groupBy(gcols: _*).agg(
      count(lit(1)).as("nonempty"),
      (sum(expr("shiftleft(1L, 40 - __r)"))
        + (lit(m.toLong) - count(lit(1))) * lit(two40)).as("__s"))
    val raw = alpha * lit((m.toLong * m).toDouble) * lit(two40.toDouble) /
      col("__s").cast("double")
    val zeros = lit(m.toLong) - col("nonempty")
    val lin = lit(m.toDouble) *
      round(log(lit(m.toDouble) / zeros.cast("double")).cast(stable), 8)
        .cast("double")
    val est = agg.select(gcols ++ Seq(lit(m).as("m"), col("nonempty"),
      round(when(raw <= lit(2.5) * lit(m.toDouble) && zeros > 0L, lin)
        .otherwise(raw).cast(stable), 6).cast("double").as("estimate")): _*)
    val truth = base.groupBy(gcols: _*)
      .agg(countDistinct(col("__k")).as("true_distinct"))
    est.join(truth, groupCols)
      .select(gcols ++ Seq(col("m"), col("nonempty"), col("estimate"),
        col("true_distinct"),
        round(((col("estimate") - col("true_distinct").cast("double"))
          / col("true_distinct").cast("double")).cast(stable), 6)
          .cast("double").as("rel_error")): _*)
  }

  /** AMS ±1 sign of `key` under seed `j`: +1 iff the first hex char
    * of md5("j:key") sorts below '8' (the top bit of the digest) —
    * a fair coin, rendered identically on every engine. */
  private def amsSign(j: Column, key: Column): Column =
    when(substring(md5(concat(j.cast("string"), lit(":"),
      key.cast("string"))), 1, 1) < "8", lit(1L)).otherwise(lit(-1L))

  /** The depth sign-sums S_j = Σ_rows sign_j(key) (build side of the
    * AMS sketches, shared with the streaming twin's parity spec):
    * one map-side-combinable SUM, exactly `depth` rows out. */
  private[graft] def amsSignSums(
      df: DataFrame, key: Column, depth: Int): DataFrame = {
    val rows = df.filter(key.isNotNull)
      .select(key.cast("string").as("__k"))
    val seeds = array((0 until depth).map(j => lit(j)): _*)
    rows.select(col("__k"), explode(seeds).as("__j"))
      .groupBy(col("__j"))
      .agg(sum(amsSign(col("__j"), col("__k"))).as("__s"))
  }

  /** The SAME sign computed driver/executor-side (java MD5, identical
    * bytes) — the streaming twin folds with it; SketchSpec pins
    * Scala ≡ engine equality. */
  private[graft] def amsSignOf(j: Int, key: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j:$key".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if (((d(0) >> 7) & 1) == 0) 1L else -1L
  }

  /** X230 — AMS F₂ sketch (Alon–Matias–Szegedy '96): estimate the
    * second frequency moment Σ f_k² — the SELF-JOIN SIZE — from
    * `depth` ±1 sign-sums instead of a per-key count aggregate. Each
    * S_j² is an unbiased F₂ estimate; the median over an odd `depth`
    * tames the variance. This is THE classical pre-join size
    * estimator: at 100 TB the optimizer question "how big is this
    * join" must be answered by a sketch (depth counters per mapper,
    * merged by plain addition), not by running the join. True F₂
    * rides along from one exact aggregate for visible error. */
  def amsF2(df: DataFrame, key: Column, depth: Int = 9): DataFrame = {
    require(depth >= 1 && depth % 2 == 1 && depth <= 99,
      s"depth must be odd in [1,99]: $depth")
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val est = amsSignSums(df, key, depth)
      .agg(expr("percentile(__s * __s, 0.5)").as("__e"))
    val truth = df.filter(key.isNotNull)
      .select(key.cast("string").as("__k"))
      .groupBy(col("__k")).agg(count(lit(1)).as("__f"))
      .agg(sum(col("__f") * col("__f")).as("f2_true"))
    est.crossJoin(truth).select(
      lit(depth).as("depth"),
      round(col("__e").cast(stable), 6).cast("double").as("f2_estimate"),
      col("f2_true"),
      round(((col("__e") - col("f2_true").cast("double"))
        / col("f2_true").cast("double")).cast(stable), 6)
        .cast("double").as("rel_error"))
  }

  /** X230 (cross form) — AMS join-size estimate: |A ⋈ B on key| =
    * Σ_k fA(k)·fB(k), estimated by median_j(SA_j · SB_j) where each
    * side's sign-sums use the SAME seeds (AGMS; Alon et al. '99, the
    * join-size extension). Two scans, depth counters each, one
    * depth-row join — the cost of knowing a join's size before
    * paying for it. The exact truth (one per-side count aggregate +
    * key join) rides along. */
  def amsJoinSize(
      dfA: DataFrame, dfB: DataFrame, keyA: Column, keyB: Column,
      depth: Int = 9): DataFrame = {
    require(depth >= 1 && depth % 2 == 1 && depth <= 99,
      s"depth must be odd in [1,99]: $depth")
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val sa = amsSignSums(dfA, keyA, depth).withColumnRenamed("__s", "__sa")
    val sb = amsSignSums(dfB, keyB, depth).withColumnRenamed("__s", "__sb")
    val est = sa.join(sb, "__j")
      .agg(expr("percentile(__sa * __sb, 0.5)").as("__e"))
    val fa = dfA.filter(keyA.isNotNull)
      .select(keyA.cast("string").as("__k"))
      .groupBy(col("__k")).agg(count(lit(1)).as("__fa"))
    val fb = dfB.filter(keyB.isNotNull)
      .select(keyB.cast("string").as("__k"))
      .groupBy(col("__k")).agg(count(lit(1)).as("__fb"))
    val truth = fa.join(fb, "__k")
      .agg(coalesce(sum(col("__fa") * col("__fb")), lit(0L))
        .as("join_true"))
    est.crossJoin(truth).select(
      lit(depth).as("depth"),
      round(col("__e").cast(stable), 6).cast("double")
        .as("join_estimate"),
      col("join_true"),
      round(when(col("join_true") > 0L,
        (col("__e") - col("join_true").cast("double"))
          / col("join_true").cast("double")).cast(stable), 6)
        .cast("double").as("rel_error"))
  }

  /** 48-bit portable hash of `key`: first 12 hex chars of md5 as an
    * integer — exact in BIGINT and in DOUBLE (< 2⁵³), renders
    * identically in Spark and DuckDB. */
  private def h48(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 12), 16, 10).cast("long")

  /** Bottom-k DISTINCT 48-bit hashes of `key` — the KMV sketch body.
    * Scale path: a per-partition bounded fold (TreeSet capped at k —
    * O(k) memory per task) prefilters to ≤ k candidates per partition
    * BEFORE any shuffle, so the exchange carries ≤ k·partitions rows
    * instead of every distinct key (a global bottom-k distinct hash
    * is necessarily a bottom-k within its partition — lossless). The
    * tiny candidate union then dedupes and takes the global bottom k.
    */
  private[graft] def kmvBottomK(
      df: DataFrame, key: Column, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val hashes = df.filter(key.isNotNull).select(h48(key).as("__h"))
    val candidates = hashes.as[Long].mapPartitions { it =>
      val set = new java.util.TreeSet[java.lang.Long]()
      it.foreach { h =>
        if (set.size < k) { set.add(h); () }
        else if (h < set.last) { set.add(h); if (set.size > k) set.pollLast(); () }
      }
      scala.jdk.CollectionConverters.IteratorHasAsScala(set.iterator())
        .asScala.map(_.longValue())
    }.toDF("__h")
    candidates.distinct().orderBy(col("__h")).limit(k)
  }

  /** X228 — KMV / bottom-k distinct-count sketch (Bar-Yossef et al.
    * '02; the theta-sketch family): keep the k minimum 48-bit hash
    * values; the k-th smallest, normalized to (0,1), estimates
    * cardinality as (k−1)/u₍ₖ₎ — here as the EXACT float chain
    * (k−1)·2⁴⁸/u₍ₖ₎ (every op correctly rounded, u < 2⁴⁸ exact in
    * double, so the estimate is bit-identical on any engine — no ln,
    * no pow). Fewer than k distinct hashes means the sketch IS the
    * exact distinct set, and the estimate is exact. Unlike HLL the
    * sketch retains actual hash SAMPLES, which is what buys set
    * operations ([[kmvSetOps]]) — the two sketches are complements,
    * not substitutes. True distinct rides along for visible error. */
  def kmvDistinct(df: DataFrame, key: Column, k: Int = 256): DataFrame = {
    require(k >= 16, s"k must be >= 16: $k")
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val sk = kmvBottomK(df, key, k)
    val est = sk.agg(count(lit(1)).as("sketch_size"),
        max(col("__h")).as("__u"))
      .select(lit(k).as("k"), col("sketch_size"),
        round(when(col("sketch_size") < k,
            col("sketch_size").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(281474976710656.0d)
            / col("__u").cast("double")).cast(stable), 6)
          .cast("double").as("estimate"))
    val truth = df.filter(key.isNotNull)
      .agg(countDistinct(key.cast("string")).as("true_distinct"))
    est.crossJoin(truth)
      .select(col("k"), col("sketch_size"), col("estimate"),
        col("true_distinct"),
        round(((col("estimate") - col("true_distinct").cast("double"))
          / col("true_distinct").cast("double")).cast(stable), 6)
          .cast("double").as("rel_error"))
  }

  /** X229 — KMV set operations (the theta-sketch union/intersection
    * estimators): from two bottom-k sketches, the UNION sketch is the
    * bottom k of the merged hash sets; Jaccard ≈ |union sketch ∩ A ∩
    * B| / |union sketch| (each union-sketch hash is a uniform sample
    * of the union, membership in both sides is exact — the hash IS
    * the identity); |A∪B| from the union sketch's k-th value;
    * |A∩B| = J·|A∪B|. Everything downstream of the two bottom-k
    * builds touches ≤ 3k rows — estimating the overlap of two
    * 100 TB corpora costs two scans and a k-row join, no
    * key-level shuffle between the sides. Exact truths ride along
    * (one distinct-flag aggregate) for visible error. */
  def kmvSetOps(
      dfA: DataFrame, dfB: DataFrame, key: Column, k: Int = 256): DataFrame = {
    require(k >= 16, s"k must be >= 16: $k")
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val skA = kmvBottomK(dfA, key, k).withColumnRenamed("__h", "__ha")
    val skB = kmvBottomK(dfB, key, k).withColumnRenamed("__h", "__hb")
    val union = skA.select(col("__ha").as("__h"))
      .union(skB.select(col("__hb").as("__h")))
      .distinct().orderBy(col("__h")).limit(k)
    val marked = union
      .join(skA, union("__h") === skA("__ha"), "left")
      .join(skB, union("__h") === skB("__hb"), "left")
      .select(col("__h"),
        (col("__ha").isNotNull && col("__hb").isNotNull)
          .cast("long").as("__both"))
    val agg = marked.agg(count(lit(1)).as("__n"), max(col("__h")).as("__u"),
      sum(col("__both")).as("__c"))
    val unionEst = when(col("__n") < k, col("__n").cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(281474976710656.0d)
        / col("__u").cast("double"))
    val jac = col("__c").cast("double") / col("__n").cast("double")
    // exact truths: one distinct-key aggregate with side flags
    val keys = dfA.filter(key.isNotNull)
      .select(key.cast("string").as("__k"), lit(1L).as("__a"), lit(0L).as("__b"))
      .union(dfB.filter(key.isNotNull)
        .select(key.cast("string").as("__k"), lit(0L).as("__a"), lit(1L).as("__b")))
      .groupBy(col("__k"))
      .agg(max(col("__a")).as("__ina"), max(col("__b")).as("__inb"))
    val truth = keys.agg(count(lit(1)).as("true_union"),
      sum((col("__ina") === 1L && col("__inb") === 1L).cast("long"))
        .as("true_intersection"))
    agg.crossJoin(truth).select(
      lit(k).as("k"),
      round(unionEst.cast(stable), 6).cast("double").as("union_estimate"),
      round(jac.cast(stable), 6).cast("double").as("jaccard_estimate"),
      round((jac * unionEst).cast(stable), 6).cast("double")
        .as("intersection_estimate"),
      col("true_union"), col("true_intersection"),
      round((col("true_intersection").cast("double")
        / col("true_union").cast("double")).cast(stable), 6)
        .cast("double").as("true_jaccard"))
  }

  /** X244 (r16) — KMV set-difference cardinality ([[kmvSetOps]]'s
    * missing direction): estimate |A\B| and |B\A| from the same two
    * bottom-k sketches — "which corpus has content the other lacks,
    * and how much" answered at two scans + a k-row join, the
    * theta-sketch a-not-b operation (Datasketches' AnotB). The union
    * sketch is a uniform sample of A∪B, so the in-A-only share of its
    * rows scales the union estimate; the ln/pow-free estimator stays
    * bit-identical on any engine. Exact truths ride along (drop at
    * production scale).
    */
  def kmvDifference(
      dfA: DataFrame, dfB: DataFrame, key: Column, k: Int = 256)
    : DataFrame = {
    require(k >= 16, s"k must be >= 16: $k")
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val skA = kmvBottomK(dfA, key, k).withColumnRenamed("__h", "__ha")
    val skB = kmvBottomK(dfB, key, k).withColumnRenamed("__h", "__hb")
    val union = skA.select(col("__ha").as("__h"))
      .union(skB.select(col("__hb").as("__h")))
      .distinct().orderBy(col("__h")).limit(k)
    val marked = union
      .join(skA, union("__h") === skA("__ha"), "left")
      .join(skB, union("__h") === skB("__hb"), "left")
      .select(col("__h"),
        (col("__ha").isNotNull && col("__hb").isNull)
          .cast("long").as("__aonly"),
        (col("__ha").isNull && col("__hb").isNotNull)
          .cast("long").as("__bonly"))
    val agg = marked.agg(count(lit(1)).as("__n"), max(col("__h")).as("__u"),
      sum(col("__aonly")).as("__ca"), sum(col("__bonly")).as("__cb"))
    val unionEst = when(col("__n") < k, col("__n").cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(281474976710656.0d)
        / col("__u").cast("double"))
    val keys = dfA.filter(key.isNotNull)
      .select(key.cast("string").as("__k"), lit(1L).as("__a"),
        lit(0L).as("__b"))
      .union(dfB.filter(key.isNotNull)
        .select(key.cast("string").as("__k"), lit(0L).as("__a"),
          lit(1L).as("__b")))
      .groupBy(col("__k"))
      .agg(max(col("__a")).as("__ina"), max(col("__b")).as("__inb"))
    val truth = keys.agg(
      sum((col("__ina") === 1L && col("__inb") === 0L).cast("long"))
        .as("true_a_not_b"),
      sum((col("__ina") === 0L && col("__inb") === 1L).cast("long"))
        .as("true_b_not_a"))
    agg.crossJoin(truth).select(
      lit(k).as("k"),
      round(unionEst.cast(stable), 6).cast("double").as("union_estimate"),
      round((col("__ca").cast("double") / col("__n").cast("double")
        * unionEst).cast(stable), 6).cast("double").as("a_not_b_estimate"),
      round((col("__cb").cast("double") / col("__n").cast("double")
        * unionEst).cast(stable), 6).cast("double").as("b_not_a_estimate"),
      col("true_a_not_b"), col("true_b_not_a"))
  }

  def countMinFrequencies(
      df: DataFrame, key: Column, queryKeys: Seq[String],
      depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16]: $depth")
    require(width >= 2, s"width must be >= 2: $width")
    require(queryKeys.nonEmpty, "need at least one query key")
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.filter(key.isNotNull)
      .select(key.cast("string").as("__k"))
    val seeds = array((0 until depth).map(j => lit(j)): _*)
    val counters = counterTable(df, key, depth, width)
    // the probe: queryKeys × depth literals, hashed IDENTICALLY
    val probe = queryKeys.toDF("key")
      .select(col("key"), explode(seeds).as("__j"))
      .select(col("key"), col("__j"),
        bucket(col("__j"), col("key"), width).as("__b"))
    val est = broadcast(probe)
      .join(counters, Seq("__j", "__b"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("__c"), lit(0L))).as("estimate"))
    val truth = rows.filter(col("__k").isin(queryKeys: _*))
      .groupBy(col("__k").as("key")).agg(count(lit(1)).as("__t"))
    est.join(truth, Seq("key"), "left")
      .select(col("key"), col("estimate"),
        coalesce(col("__t"), lit(0L)).as("true_count"),
        (col("estimate") - coalesce(col("__t"), lit(0L)))
          .as("overcount"))
  }

  /** Per-vertex HLL estimate over a PACKED register frame — one row
    * per vertex, `__a` an m-int array of max ranks with 0 = empty
    * (the [[hyperBall]] representation). Map-only: both the harmonic
    * sum and the nonempty count fold over the array with the
    * `aggregate` HOF, so reading every round's estimates costs zero
    * shuffles. Arithmetic is bit-identical to
    * [[hllEstimateFromRegisters]]'s sparse form: an empty register's
    * `shiftleft(1, 40 − 0)` IS the 2⁴⁰ term the sparse form adds for
    * each absent bucket (all terms exact integers ≤ 2⁴⁰, the sum
    * < 2⁴⁶ — order-free), and the raw/linear-counting branch pins the
    * same 8 dp ln. */
  private def packedEstimate(regs: DataFrame, m: Int): DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val two40 = 1099511627776L // 2^40
    val folded = regs.select(col("__v"),
      expr("aggregate(__a, CAST(0 AS BIGINT), " +
        "(acc, x) -> acc + shiftleft(CAST(1 AS BIGINT), 40 - x))")
        .as("__s"),
      expr("aggregate(__a, 0, (acc, x) -> acc + IF(x > 0, 1, 0))")
        .as("__ne"))
    val raw = alpha * lit((m.toLong * m).toDouble) * lit(two40.toDouble) /
      col("__s").cast("double")
    val zeros = lit(m.toLong) - col("__ne")
    val lin = lit(m.toDouble) *
      round(log(lit(m.toDouble) / zeros.cast("double")).cast(stable), 8)
        .cast("double")
    folded.select(col("__v"),
      round(when(raw <= lit(2.5) * lit(m.toDouble) && zeros > 0L, lin)
        .otherwise(raw).cast(stable), 6).cast("double").as("__est"))
  }

  /** X239 (r16) — HyperBall neighborhood function (Boldi & Vigna,
    * "In-Core Computation of Geometric Centralities with HyperBall",
    * 2013; the HyperANF/WebGraph lineage): estimate |ball(v, r)| for
    * every vertex simultaneously by giving each vertex an m-register
    * HLL sketch of its ball and iterating register MAX-merge along
    * edges — B(v, r+1) = B(v, r) ∪ ⋃_{(v,u)∈E} B(u, r) becomes one
    * join + one max aggregate per round. THE way to read reachability
    * volume, effective diameter, and connectivity health off a
    * 100 TB-scale graph: exact per-vertex BFS is O(V·E) and per-
    * vertex frontiers are data-sized, while the register frame is
    * bounded at V rows FOREVER — m registers bit-packed into one
    * array per vertex (m = 32 ⇒ ~18% per-ball error, the paper's own
    * operating point) — and each round's shuffle is the edge join,
    * never the ball contents.
    *
    * Registers are [[hllDistinct]]'s engine-portable arithmetic
    * (md5 bucket/rank, exact 2^(40−r) harmonic terms, 8dp-pinned
    * linear-counting ln), so a DuckDB oracle replays every round
    * bit-for-bit. Per-round totals N(r) = Σ_v est(v, r) sum the
    * 6dp-rounded per-vertex estimates exactly (round-then-add);
    * `reach_frac` = N(r)/N(rounds) and the first row with
    * frac ≥ 0.9 reads off the effective-diameter estimate.
    *
    * Each round's register frame is persisted via `scope` (two
    * consumers: the estimate pass and the next round's join); rounds
    * is a small literal by contract — the caller picks the radius the
    * question needs, the frame never grows past V packed rows.
    */
  /** The HyperBall propagation loop, factored: per-round per-vertex
    * ball-size estimates (__v, __est) for r = 0..rounds — the shared
    * core of [[hyperBall]] (totals curve) and
    * [[hyperBallHarmonic]] (per-vertex centrality). Each round's
    * register frame is persisted via `scope` (two consumers: the
    * estimate pass and the next round's join). */
  private def ballEstimatesByRound(
      edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int, m: Int, scope: graft.util.CacheScope)
    : IndexedSeq[DataFrame] = {
    require(rounds >= 1 && rounds <= 8, s"rounds must be in [1,8]: $rounds")
    require(m >= 16 && (m & (m - 1)) == 0,
      s"m must be a power of two >= 16: $m")
    // Pre-partitioned on __w, the per-round join key, so no round pays
    // an edge-side exchange (the [[Dedup]] connected-components trick);
    // dedup runs INSIDE the partitioned copy — HashPartitioning(__w)
    // clusters (__u, __w), so one exchange builds the deduped frame.
    val e = scope.persist(edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).cast("string").as("__u"),
        col(dstCol).cast("string").as("__w"))
      .repartition(col("__w"))
      .dropDuplicates("__u", "__w"))
    val verts = e.select(col("__u").as("__v"))
      .union(e.select(col("__w").as("__v"))).distinct()
    // radius 0: every ball is {v} — registers BIT-PACKED into ONE
    // m-int array row per vertex (0 = empty; ranks are 1..33), so the
    // register frame is V rows, not V·m: the per-round shuffle carries
    // E+V array rows instead of (E+V)·m register rows (~m× fewer rows,
    // the r16 verdict's named win), and the per-round merge is m
    // element-wise MAX aggregates — all map-side combinable.
    val init = verts
      .select(col("__v"), hllBucket(col("__v"), m).as("__b"),
        hllRank(col("__v")).as("__r"))
      .select(col("__v"), array((0 until m).map(i =>
        when(col("__b") === i, col("__r")).otherwise(lit(0))): _*)
        .as("__a"))
    var regs = scope.persist(init)
    val out = scala.collection.mutable.Buffer(packedEstimate(regs, m))
    for (_ <- 1 to rounds) {
      val prop = e.join(regs.withColumnRenamed("__v", "__w"), Seq("__w"))
        .select(col("__u").as("__v"), col("__a"))
      regs = scope.persist(regs.select(col("__v"), col("__a")).union(prop)
        .groupBy(col("__v"))
        .agg(array((0 until m).map(i =>
          max(element_at(col("__a"), i + 1))): _*).as("__a")))
      out += packedEstimate(regs, m)
    }
    out.toIndexedSeq
  }

  def hyperBall(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int, m: Int = 32,
      scope: graft.util.CacheScope = graft.util.CacheScope.unmanaged)
    : DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val ests = ballEstimatesByRound(edges, srcCol, dstCol, rounds, m, scope)
    def roundTotal(r: Int): DataFrame =
      ests(r).agg(
        count(lit(1)).as("__nv"),
        sum(round(col("__est").cast(stable), 6)).as("__tot"))
        .select(lit(r.toLong).as("r"),
          round(col("__tot").cast(stable), 6).cast("double")
            .as("n_reached"),
          round((col("__tot").cast("double") / col("__nv").cast("double"))
            .cast(stable), 6).cast("double").as("avg_ball"))
    val curve = (0 to rounds).map(roundTotal).reduce(_.union(_))
    val wAll = Window.partitionBy()
    val last = max(struct(col("r"), col("n_reached"))).over(wAll)
    curve
      .withColumn("__final", last.getField("n_reached"))
      .select(col("r"), col("n_reached"), col("avg_ball"),
        round((col("n_reached") / col("__final")).cast(stable), 6)
          .cast("double").as("reach_frac"),
        (col("n_reached") >= lit(0.9) * col("__final")).cast("int")
          .as("covered_90"))
  }

  /** DDSketch log-bucket index of a positive double under accuracy
    * `alpha`: i = ⌈round₈(ln x / ln γ)⌉ with γ = (1+α)/(1−α) — the
    * 8 dp pin makes the ONLY libm call in the bucket decision agree
    * across engines (the [[hllEstimateFromRegisters]] linear-counting
    * convention). */
  private[graft] def ddLnGamma(alpha: Double): Double = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    math.log((1.0 + alpha) / (1.0 - alpha))
  }

  /** The Scala twin of the in-plan bucket expression (BigDecimal
    * HALF_UP at 8 dp ≡ Spark/DuckDB ROUND) — the streaming bucket
    * monitor keys its state with it; SketchSpec pins twin ≡ engine. */
  private[graft] def ddBucketOf(x: Double, alpha: Double): Long = {
    val q = BigDecimal(math.log(x) / ddLnGamma(alpha))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP)
    q.setScale(0, BigDecimal.RoundingMode.CEILING).toLong
  }

  /** X243 (r16) — DDSketch quantiles (Masson–Rim–Lee, VLDB 2019;
    * Datadog's production sketch): fully-mergeable quantile estimates
    * with a RELATIVE-error guarantee |x̂−x| ≤ α·x — the latency/price
    * distribution read where rank-error sketches blur exactly the
    * tail you care about. Values land in log-spaced buckets
    * i = ⌈log_γ x⌉ (γ = (1+α)/(1−α)); the sketch IS the bucket-count
    * table: one map-side-combinable aggregate, ≤ ln(max/min)/ln γ
    * rows out (~1k buckets for 9 decades at α = 0.01) regardless of
    * input size, merging across corpora/batches by count addition.
    * Quantile q = the first bucket whose cumulative count reaches
    * q·n, estimated at 2γⁱ/(γ+1).
    *
    * Portability: the bucket index pins its ln quotient to 8 dp
    * before ⌈·⌉; the estimate's γⁱ runs as exp(round₈(i·ln γ)) with
    * ln γ and 2/(γ+1) Scala-printed literals shared with the oracle.
    * The cumulative walk is a window over the BUCKET-bounded table
    * (the audited bounded-frame class); all quantiles read from ONE
    * pass via a literal-exploded quantile frame. Non-positive values
    * are outside the sketch's support and excluded (count visible as
    * n vs input rows).
    */
  def ddsketchQuantiles(df: DataFrame, value: Column,
      alpha: Double = 0.01,
      qs: Seq[Double] = Seq(0.5, 0.95, 0.99)): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q < 1),
      s"quantiles must be in (0,1): $qs")
    val counts = ddBucketCounts(df, value, alpha)
    ddQuantilesFromBuckets(counts, alpha, qs)
  }

  /** The bucket-count table alone (build side of
    * [[ddsketchQuantiles]], shared with the streaming twin's parity
    * spec): one map-side-combinable aggregate, bucket-bounded out. */
  private[graft] def ddBucketCounts(
      df: DataFrame, value: Column, alpha: Double): DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val lnG = ddLnGamma(alpha)
    df.filter(value.isNotNull && value > 0)
      .select(ceil(round((log(value.cast("double")) / lit(lnG))
        .cast(stable), 8)).cast("long").as("__i"))
      .groupBy(col("__i")).agg(count(lit(1)).as("__c"))
  }

  /** The quantile walk over an (already-built) bucket-count table —
    * the SHARED rollup both the batch sketch and the streaming bucket
    * monitor finish through, so stream ≡ batch by construction. */
  private[graft] def ddQuantilesFromBuckets(
      counts: DataFrame, alpha: Double, qs: Seq[Double]): DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val lnG = ddLnGamma(alpha)
    val gamma = (1.0 + alpha) / (1.0 - alpha)
    val coef = 2.0 / (gamma + 1.0)
    val ord = Window.orderBy(col("__i"))
    val cum = counts
      .withColumn("__cum",
        sum(col("__c")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy()))
    val qFrame = counts.sparkSession.range(1)
      .select(explode(array(qs.map(lit): _*)).as("q"))
    val hit = cum.crossJoin(qFrame)
      .groupBy(col("q"))
      .agg(first(col("__n")).as("n"),
        min(when(col("__cum") >= col("q") * col("__n").cast("double"),
          col("__i"))).as("bucket"))
    hit.select(col("q"), col("n"), col("bucket"),
      round((exp(round((col("bucket").cast("double") * lit(lnG))
          .cast(stable), 8).cast("double")) * lit(coef)).cast(stable), 6)
        .cast("double").as("estimate"))
      .orderBy(col("q"))
  }

  /** X248 (r16) — per-group DDSketch quantiles ([[ddsketchQuantiles]]
    * grouped): every segment's p50/p95/p99 from ONE scan — the
    * "latency per endpoint / price per category" read, where an exact
    * per-group percentile would sort every group's rows. The
    * aggregate emits ≤ buckets rows per group; the cumulative walk
    * partitions by group (windows over per-group BUCKET-bounded
    * frames — the audited bounded class); all quantiles still read
    * from one pass via the literal-exploded q frame. */
  def ddsketchQuantilesBy(df: DataFrame, value: Column,
      groupCols: Seq[String], alpha: Double = 0.01,
      qs: Seq[Double] = Seq(0.5, 0.95, 0.99)): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q < 1),
      s"quantiles must be in (0,1): $qs")
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val lnG = ddLnGamma(alpha)
    val gamma = (1.0 + alpha) / (1.0 - alpha)
    val coef = 2.0 / (gamma + 1.0)
    val gcols = groupCols.map(col)
    val counts = df.filter(value.isNotNull && value > 0)
      .select(gcols :+ ceil(round((log(value.cast("double")) / lit(lnG))
        .cast(stable), 8)).cast("long").as("__i"): _*)
      .groupBy(gcols :+ col("__i"): _*).agg(count(lit(1)).as("__c"))
    val ord = Window.partitionBy(gcols: _*).orderBy(col("__i"))
    val grp = Window.partitionBy(gcols: _*)
    val cum = counts
      .withColumn("__cum",
        sum(col("__c")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__n", sum(col("__c")).over(grp))
    val qFrame = counts.sparkSession.range(1)
      .select(explode(array(qs.map(lit): _*)).as("q"))
    val hit = cum.crossJoin(qFrame)
      .groupBy(gcols :+ col("q"): _*)
      .agg(first(col("__n")).as("n"),
        min(when(col("__cum") >= col("q") * col("__n").cast("double"),
          col("__i"))).as("bucket"))
    hit.select(gcols ++ Seq(col("q"), col("n"), col("bucket"),
      round((exp(round((col("bucket").cast("double") * lit(lnG))
          .cast(stable), 8).cast("double")) * lit(coef)).cast(stable), 6)
        .cast("double").as("estimate")): _*)
      .orderBy(gcols :+ col("q"): _*)
  }

  /** The telescoped harmonic coefficients: H(v) = Σ_{r=1..R}
    * (|B(v,r)| − |B(v,r−1)|)/r = Σ_r est_r·c_r with c_0 = −1,
    * c_r = 1/r − 1/(r+1) for r < R, c_R = 1/R — shared with the
    * oracle generator so both engines multiply IDENTICAL doubles. */
  private[graft] def harmonicCoefs(rounds: Int): IndexedSeq[Double] =
    (0 to rounds).map { r =>
      if (r == 0) -1.0
      else if (r == rounds) 1.0 / rounds
      else 1.0 / r - 1.0 / (r + 1)
    }

  /** X242 (r16) — harmonic centrality via HyperBall (Boldi & Vigna
    * 2013 — estimating exactly this, at web scale, is the paper's
    * stated purpose): H(v) = Σ_{u≠v} 1/d(u,v), approximated from the
    * per-round ball sizes as Σ_r (|B(v,r)| − |B(v,r−1)|)/r — every
    * vertex's centrality from the SAME register iteration that powers
    * [[hyperBall]], at V·m-bounded state, where exact all-pairs
    * distances are O(V·E) and unthinkable at graph scale. The
    * telescoped form Σ est_r·c_r makes the score ONE grouped sum over
    * the unioned round frames; per-term products round to 8 dp before
    * the exact-decimal sum (round-then-add). Top-k by the ROUNDED
    * score (ties by node) via TakeOrderedAndProject — never a full
    * sort of the vertex set.
    */
  def hyperBallHarmonic(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int, m: Int = 32, topK: Int = 20,
      scope: graft.util.CacheScope = graft.util.CacheScope.unmanaged)
    : DataFrame = {
    require(topK > 0, s"topK must be positive: $topK")
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val ests = ballEstimatesByRound(edges, srcCol, dstCol, rounds, m, scope)
    val coefs = harmonicCoefs(rounds)
    val terms = (0 to rounds).map { r =>
      ests(r).select(col("__v"),
        round((col("__est") * lit(coefs(r))).cast(stable), 8).as("__t"))
    }.reduce(_.union(_))
    terms.groupBy(col("__v"))
      .agg(round(sum(col("__t")).cast(stable), 6).cast("double")
        .as("harmonic"))
      .select(col("__v").as("node"), col("harmonic"))
      .orderBy(col("harmonic").desc, col("node"))
      .limit(topK)
  }
}
