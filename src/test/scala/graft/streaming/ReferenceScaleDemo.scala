package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** A/B evidence that the reference digest sidecar removed the
  * streaming exact layer's O(reference) per-batch cost (test scope):
  * `sbt "Test/runMain graft.streaming.ReferenceScaleDemo"` dedups the
  * SAME 500-doc batch against frozen references of growing size
  * (sf0.1's documents table replicated under shifted ids to span
  * 100×), timing both forms:
  *
  *  - `sidecar` — [[Dedup.dedupAgainstDigests]] over the persisted
  *    digest sidecar (one-time [[Dedup.ensureReferenceDigests]] build,
  *    untimed, like the fuzzy index build in ProbeScaleDemo). The
  *    per-batch plan reads 32-byte digests only.
  *  - `rehash` — [[Dedup.dedupAgainstReference]], the pre-r9 streaming
  *    shape: scans and sha256-hashes every reference text per call.
  *  - `bloom` (r10) — [[Dedup.dedupAgainstDigestsBloom]]: the sidecar
  *    anti-join fronted by the broadcast Bloom filter (one-time
  *    [[Dedup.ensureDigestBloom]] build, untimed + memoized). Only
  *    bloom-positive rows reach the join, so the per-batch cost tracks
  *    the batch's duplicate fraction, not its size.
  *
  * The claim: sidecar and bloom time stay flat while rehash grows with
  * the reference — the curve pair that proves the r8 `weak` is cleared
  * by construction, not by a small demo reference. Median of 3 timed
  * runs after one discarded warm-up, per arm. */
object ReferenceScaleDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    // widen each doc to ~2.5 KB so the 100x reference carries >1 GB of
    // text — at the raw table's ~300 B/doc the sha pass hides inside
    // scan noise and the curve pair proves nothing
    def widen(marker: String) =
      concat(repeat(concat(col("text"), lit(" ")), 8), lit(marker))
    // fixed probe batch, CRAWL-shaped: 50,000 docs of which 2,500 (5%)
    // are present in every reference and the rest are novel — the
    // regime the bloom prefilter is for (most rows new, so skipping
    // the batch-side shuffle on definite misses is the win; a tiny
    // batch would only measure the bloom literal's fixed cost)
    val batch = docs.filter(col("doc_id") < 2500)
      .select(col("doc_id"), widen("v0").as("text"))
      .union((0 until 10).map(m => docs.filter(col("doc_id") < 4750)
          .select((col("doc_id") + lit(1000000L * (m + 1))).as("doc_id"),
            widen(s"vx$m").as("text")))
        .reduce(_ union _))
      .localCheckpoint()
    batch.count()

    def timed(fn: => Long): Double = {
      fn // warm-up discarded
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
      }
      runs.sorted.apply(1)
    }

    // replicas of the full table under shifted ids AND shifted text
    // (replica m > 0 appends a version marker, so distinct digests grow
    // with the reference — the sidecar cannot cheat via collapse):
    // 1× = 5,000 docs, 10× = 50,000, 30× = 150,000, 100× = 500,000
    Seq(("sf0.1 x1", 1), ("sf0.1 x10", 10), ("sf0.1 x30", 30),
        ("sf0.1 x100", 100))
      .foreach { case (label, mult) =>
        val work = java.nio.file.Files.createTempDirectory("refscale").toString
        val refDir = s"$work/ref"; val digDir = s"$work/refdig"
        val reference = (0 until mult).map(m => docs.select(
            (col("doc_id") + lit(m.toLong * (maxId + 1))).as("doc_id"),
            widen(if (m == 0) "v0" else s"v$m").as("text")))
          .reduce(_ union _)
        reference.write.parquet(refDir)
        val refRows = spark.read.parquet(refDir).count()

        // one-time build, untimed (the production steady state reads it)
        Dedup.ensureReferenceDigests(spark, refDir, digDir, "text")
        val sidecar = timed {
          Dedup.dedupAgainstDigests(batch,
            Dedup.ensureReferenceDigests(spark, refDir, digDir, "text"),
            "doc_id", "text").count()
        }
        val rehash = timed {
          Dedup.dedupAgainstReference(batch,
            spark.read.parquet(refDir), "doc_id", "text").count()
        }
        Dedup.ensureDigestBloom(spark, digDir) // one-time build, untimed
        val bloom = timed {
          Dedup.dedupAgainstDigestsBloom(batch,
            Dedup.ensureReferenceDigests(spark, refDir, digDir, "text"),
            "doc_id", "text",
            Dedup.ensureDigestBloom(spark, digDir)).count()
        }
        println(f"[refscale] ref=$label docs=$refRows " +
          f"sidecarSec=$sidecar%.2f rehashSec=$rehash%.2f bloomSec=$bloom%.2f")
      }
    spark.stop()
  }
}
