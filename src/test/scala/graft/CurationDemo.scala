package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dag.TaskRunner
import graft.dag.TaskRunner.{external, FileTarget, ParquetTarget, Task}
import graft.operators.{Dedup, Packing, Relational, Sampling, TextAnalysis}

/** End-to-end corpus-curation pipeline demo (test scope):
  * `sbt "Test/runMain graft.CurationDemo [sfDir]"`.
  *
  * The LLM-data stages composed through the SAME task-DAG layer the M5
  * pipeline uses — checkpointed parquet between stages, memoized
  * reruns, eager cleanup of consumed intermediates:
  *
  *   documents ─▶ dedup (digest-first reps) ─▶ signals (lang/quality/
  *   repetition on ONE scan + thresholds) ─▶ sample (portable md5) ─▶
  *   chunks (64/16 sliding windows) ─▶ pack (FFD bins) ─▶ manifest
  *
  * Prints per-stage row counts and total wall time; a second run hits
  * the memoized targets and does nothing.
  */
object CurationDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // --cleanup turns on eager gc of consumed intermediates (O41);
    // with it on, a rerun re-materializes the gc'd cone (the DAG's
    // documented cone-rerun semantics) instead of skipping everything
    val doCleanup = args.contains("--cleanup")
    val out = Files.createTempDirectory("curation_out").toString

    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(p: String): DataFrame = spark.read.parquet(p)
    def write(df: DataFrame, p: String): Unit = df.write.mode("overwrite").parquet(p)

    // the driver test data is a single parquet FILE (no _SUCCESS), so
    // plain file existence is the right completeness bit
    val docsT = external("documents", FileTarget(s"$sfDir/documents.parquet"))
    val dedupP = s"$out/deduped"
    val signalsP = s"$out/signals"
    val sampleP = s"$out/sampled"
    val chunksP = s"$out/chunks"
    val packedP = s"$out/packed"
    val manifestP = s"$out/manifest.txt"

    val dedupT = Task("dedup", ParquetTarget(dedupP), Seq(docsT), () => {
      val docs = read(docsT.target.path)
      val reps = Dedup.exactDedupByDigest(docs, "doc_id", "text").select("doc_id")
      write(docs.join(reps, Seq("doc_id"), "left_semi"), dedupP)
    })

    val signalsT = Task("signals", ParquetTarget(signalsP), Seq(dedupT), () => {
      // every per-row signal stacks on ONE scan of the deduped corpus
      val scored = TextAnalysis.withRepetition(
        TextAnalysis.withQuality(
          TextAnalysis.withLangId(read(dedupP), "text"), "text"), "text")
      write(scored.filter(col("quality") >= 0.4 && col("dup_ratio") <= 0.3), signalsP)
    }, cleanup = Seq(ParquetTarget(dedupP)))

    val sampleT = Task("sample", ParquetTarget(sampleP), Seq(signalsT), () => {
      write(Sampling.portableSample(read(signalsP), "doc_id", "aaaa"), sampleP)
    }, cleanup = Seq(ParquetTarget(signalsP)))

    val chunksT = Task("chunks", ParquetTarget(chunksP), Seq(sampleT), () => {
      write(TextAnalysis.chunkTokens(read(sampleP), "doc_id", "text",
        chunkSize = 64, overlap = 16), chunksP)
    })

    val packT = Task("pack", ParquetTarget(packedP), Seq(chunksT), () => {
      // monotonically_increasing_id is NONDETERMINISTIC — pin it with a
      // persist before using the frame on both sides of the join, or
      // the two subtrees could re-enumerate ids differently
      val chunks = read(chunksP)
        .select(monotonically_increasing_id().as("item_id"),
          col("doc_id"), col("chunk_id"), col("n_chunk_tokens"))
        .persist()
      write(Packing.packFirstFitDecreasing(
        chunks, "item_id", "n_chunk_tokens", capacity = 256L)
        .join(chunks, "item_id"), packedP)
      chunks.unpersist()
    })

    val manifestT = Task("manifest", FileTarget(manifestP), Seq(packT), () => {
      val packed = read(packedP)
      val bins = packed.groupBy("bin_id").agg(sum("n_chunk_tokens").as("fill"))
      val stats = bins.agg(count(lit(1)).as("n_bins"), avg("fill").as("avg_fill"))
        .collect().head
      val lines = Seq(
        s"chunks=${packed.count()}",
        s"bins=${stats.getLong(0)}",
        f"avg_fill=${stats.getDouble(1)}%.1f/256")
      Files.write(java.nio.file.Paths.get(manifestP),
        lines.mkString("\n").getBytes)
      lines.foreach(l => println(s"[curation] $l"))
    }, cleanup = Seq(ParquetTarget(chunksP)))

    val t0 = System.nanoTime()
    val report = TaskRunner.run(Seq(manifestT), log = s => println(s"[dag] $s"),
      doCleanup = doCleanup)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[curation] ran=${report.ran.size} skipped=${report.skipped.size} in $secs%.1f s")

    val t1 = System.nanoTime()
    val rerun = TaskRunner.run(Seq(manifestT), doCleanup = doCleanup)
    val expect = if (doCleanup) "gc'd cone" else "0"
    println(f"[curation] rerun: ran=${rerun.ran.size} (expect $expect) " +
      f"in ${(System.nanoTime() - t1) / 1e9}%.1f s")
    spark.stop()
  }
}
