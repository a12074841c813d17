package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
