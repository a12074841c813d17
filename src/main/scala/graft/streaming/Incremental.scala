package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Dedup

/** Incremental corpus curation over a document stream — the production
  * ingest shape: each micro-batch is deduped against the FROZEN
  * reference corpus and against everything already curated, then
  * appended to the curated store. `foreachBatch` (not a plain sink)
  * because the dedup needs an arbitrary batch join against growing
  * state that outlives executors — the curated parquet dir IS the
  * state, so a restarted query resumes exactly (appends are atomic per
  * batch via the parquet committer, and replayed batches re-dedup
  * against what they already wrote, making the sink idempotent in the
  * only way that matters: no duplicate text ever lands).
  *
  * Intra-batch duplicates collapse to the min-id representative first
  * ([[Dedup.exactDedup]] contract), mirroring the batch pipeline, so
  * stream and batch curation of the same data agree (spec-pinned).
  *
  * Scale shape per batch: digest-first anti-joins only — the shuffle
  * carries (digest, id), never text (see
  * [[Dedup.dedupAgainstReference]]); the curated-store read prunes to
  * the digest/text columns actually compared.
  */
object Incremental {

  /** Start the curation stream. `curatedDir` doubles as output and
    * dedup state; `referenceDir` is the frozen corpus (never written). */
  def curateStream(
      docs: DataFrame, idCol: String, textCol: String,
      referenceDir: String, curatedDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        curateBatch(spark, batch, idCol, textCol, referenceDir, curatedDir)
      }
      .start()

  /** One micro-batch: representative-dedup within the batch, then
    * anti-join against reference + already-curated, then append.
    * Factored out so batch pipelines (and specs) can call it directly. */
  private[streaming] def curateBatch(
      spark: SparkSession, batch: DataFrame, idCol: String, textCol: String,
      referenceDir: String, curatedDir: String): Unit = {
    val reps = Dedup.exactDedup(batch, idCol, textCol).select(idCol)
    val deduped = batch.join(reps, Seq(idCol), "left_semi")
    val vsRef = Dedup.dedupAgainstReference(
      deduped, spark.read.parquet(referenceDir), idCol, textCol)
    val existing = curatedParquet(spark, curatedDir)
    val fresh = existing match {
      case Some(cur) => Dedup.dedupAgainstReference(vsRef, cur, idCol, textCol)
      case None      => vsRef
    }
    fresh.write.mode("append").parquet(curatedDir)
  }

  /** The curated store, if any batch has landed yet (first batch of a
    * fresh run has no directory to read). */
  private def curatedParquet(
      spark: SparkSession, dir: String): Option[DataFrame] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path) && fs.listStatus(path).exists(
        _.getPath.getName.endsWith(".parquet")))
      Some(spark.read.parquet(dir))
    else None
  }
}
