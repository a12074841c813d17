package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, Text}

/** Deduplication suite for large text corpora (SURVEY.md §2.5 X12/X14):
  * exact, MinHash+LSH, SimHash, and exact n-gram Jaccard.
  *
  * Scale design notes:
  *  - Exact dedup is a single hash-aggregate on the text (or a digest of
  *    it) — one shuffle, map-side partial aggregation.
  *  - MinHash: shingle explode → per-(doc, hashIdx) min-aggregate →
  *    band-key join. Candidate generation never compares all pairs; the
  *    only quadratic step is per-bucket, and LSH banding keeps buckets
  *    small. Signatures are 16 longs/doc regardless of doc size.
  *  - SimHash: one explode + one aggregate per doc → 30-bit fingerprint;
  *    near-dup candidates via band buckets (pigeonhole: hamming ≤ 2 over
  *    3 bands ⇒ one band matches exactly), verified with bit_count(xor).
  *  - All hashing is the portable arithmetic in [[Hashing]] so results
  *    are reproducible across engines.
  */
object Dedup {

  /** X12 — exact dedup with deterministic representative: smallest id
    * per distinct text (dropDuplicates keeps an arbitrary row; min is
    * reproducible). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(col(idCol), col("n_copies"))

  /** Distinct (doc, shingle-hash) pairs — the set representation used by
    * both MinHash and exact Jaccard. */
  def shingleHashes(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("doc"), explode(Text.shingles(col(textCol), n)).as("sh"))
      .select(col("doc"), Hashing.charHash(col("sh")).as("h"))
      .distinct()

  /** MinHash signatures: (doc, j, mh) for j in [0, numHashes). */
  def minhashSignatures(shingles: DataFrame, numHashes: Int): DataFrame =
    shingles
      .withColumn("j", explode(lit((0 until numHashes).map(_.toLong).toArray)))
      .withColumn("hj", Hashing.permHash(col("h"), col("j")))
      .groupBy(col("doc"), col("j"))
      .agg(min(col("hj")).as("mh"))

  /** LSH banding: bucket key per (doc, band) = comma-joined minhash
    * values of the band's rows, in hash-index order (sort_array on the
    * (j, mh) structs — collect_list order is not deterministic). */
  def lshBandKeys(sig: DataFrame, rowsPerBand: Int): DataFrame =
    sig.withColumn("band", (col("j") / rowsPerBand).cast("long"))
      .groupBy(col("doc"), col("band"))
      .agg(concat_ws(",",
        transform(array_sort(collect_list(struct(col("j"), col("mh")))),
          s => s.getField("mh").cast("string"))).as("bkey"))

  /** Candidate pairs (a < b) sharing at least one LSH bucket. */
  def lshCandidatePairs(bandKeys: DataFrame): DataFrame = {
    val l = bandKeys.select(col("band"), col("bkey"), col("doc").as("a"))
    val r = bandKeys.select(col("band"), col("bkey"), col("doc").as("b"))
    l.join(r, Seq("band", "bkey")).where(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
  }

  /** Exact Jaccard over shingle sets, computed ONLY for the given
    * candidate pairs: |A∩B| by routing each pair's A-side shingles
    * through a (b, h) equi-join against the B-side; |A∪B| = |A|+|B|−|A∩B|.
    *
    * Scale note: the intersection MUST NOT be a raw `sh ⋈ sh` self-join
    * on the shingle hash — that is O(df²) per shingle (a stop-shingle's
    * posting list alone blows up) and does the same quadratic work the
    * candidate generation exists to avoid. Cost here is
    * Σ_pairs |A| join-probe rows — linear in candidate volume. */
  def jaccard(shingles: DataFrame, pairs: DataFrame, roundDigits: Int = 4): DataFrame = {
    val sizes = shingles.groupBy(col("doc")).agg(count(lit(1)).as("sz"))
    val inter = pairs
      .join(shingles.select(col("doc").as("a"), col("h")), Seq("a"))
      .join(shingles.select(col("doc").as("b"), col("h")), Seq("b", "h"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
    pairs
      .join(inter, Seq("a", "b"), "inner")
      .join(sizes.withColumnRenamed("doc", "a").withColumnRenamed("sz", "sa"), Seq("a"))
      .join(sizes.withColumnRenamed("doc", "b").withColumnRenamed("sz", "sb"), Seq("b"))
      .withColumn("jac", round(
        col("inter").cast("double") /
          (col("sa") + col("sb") - col("inter")).cast("double"), roundDigits))
      .select(col("a"), col("b"), col("jac"))
  }

  /** X14 — full MinHash-LSH near-dup pipeline: shingle → sign → band →
    * candidate pairs → exact-Jaccard verify ≥ threshold. */
  def minhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val sh = shingleHashes(df, idCol, textCol, shingleSize)
    val pairs = lshCandidatePairs(lshBandKeys(minhashSignatures(sh, numHashes), rowsPerBand))
    jaccard(sh, pairs).where(col("jac") >= threshold)
  }

  /** Exact n-gram Jaccard near-dups. Candidates = pairs sharing ≥1
    * shingle whose document frequency is ≤ `maxShingleDf` (0 = no cap).
    * The cap is the standard corpus-scale guard: without it a single
    * high-df shingle ("the of the") contributes O(df²) candidate pairs.
    * Jaccard itself is still computed over the FULL shingle sets, so
    * scores are exact; the cap only bounds which pairs are examined —
    * a pair sharing exclusively >df shingles has near-zero Jaccard
    * against any realistic threshold. */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, threshold: Double = 0.5,
      maxShingleDf: Int = 0): DataFrame = {
    val sh = shingleHashes(df, idCol, textCol, shingleSize)
    val candSh =
      if (maxShingleDf <= 0) sh
      else sh.join(
        sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
          .where(col("df") <= maxShingleDf).select("h"),
        Seq("h"), "left_semi")
    val la = candSh.select(col("doc").as("a"), col("h"))
    val rb = candSh.select(col("doc").as("b"), col("h"))
    val pairs = la.join(rb, Seq("h")).where(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    jaccard(sh, pairs).where(col("jac") >= threshold)
  }

  /** SimHash fingerprint (30-bit): per token-occurrence hash, each bit
    * votes ±1; fingerprint bit j set iff the vote sum is positive. */
  def simhash(df: DataFrame, idCol: String, textCol: String, bits: Int = 30): DataFrame = {
    val tok = df.select(col(idCol).as("doc"), explode(Text.tokens(col(textCol))).as("t"))
      .withColumn("h", Hashing.charHash(col("t")))
    val votes: Seq[Column] = (0 until bits).map { j =>
      sum(shiftright(col("h"), j).bitwiseAND(1) * 2 - 1).as(s"s_$j")
    }
    val agg = tok.groupBy(col("doc")).agg(votes.head, votes.tail: _*)
    val fp = (0 until bits).map { j =>
      when(col(s"s_$j") > 0, lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)
    agg.select(col("doc"), fp.as("fp"))
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxDist, candidates
    * via 3-band bucketing (exact for maxDist ≤ 2 by pigeonhole). */
  def simhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 2): DataFrame = {
    val fps = simhash(df, idCol, textCol)
    val banded = fps.select(col("doc"), col("fp"),
      explode(array((0 until 3).map { b =>
        struct(lit(b).as("band"), shiftright(col("fp"), b * 10).bitwiseAND(0x3FF).as("key"))
      }: _*)).as("bk"))
      .select(col("doc"), col("fp"), col("bk.band").as("band"), col("bk.key").as("key"))
    val l = banded.select(col("band"), col("key"), col("doc").as("a"), col("fp").as("fa"))
    val r = banded.select(col("band"), col("key"), col("doc").as("b"), col("fp").as("fb"))
    l.join(r, Seq("band", "key")).where(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("fa").bitwiseXOR(col("fb"))).cast("bigint").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxDist)
  }
}
