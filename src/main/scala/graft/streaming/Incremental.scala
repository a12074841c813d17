package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, sha2}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Dedup

/** Incremental corpus curation over a document stream — the production
  * ingest shape: each micro-batch is deduped against the FROZEN
  * reference corpus and against everything already curated, then
  * appended to the curated store. `foreachBatch` (not a plain sink)
  * because the dedup needs an arbitrary batch join against growing
  * state that outlives executors — the curated parquet dir IS the
  * state, so a restarted query resumes exactly: a replayed batch
  * re-dedups against what it already wrote and appends only what is
  * missing, making the sink idempotent in the only way that matters
  * (no duplicate text ever lands; spec-pinned by the replay test).
  *
  * Null-text rows are DROPPED up front: a null digest matches nothing
  * in any anti-join, so they would bypass every dedup layer and
  * re-land on each replay — and a curation pipeline has no use for a
  * document with no content.
  *
  * Representative choice: min-id WITHIN a batch ([[Dedup.exactDedup]]
  * contract), first-curated ACROSS batches (arrival order) — so stream
  * and batch curation of the same data keep the same TEXT set always,
  * and the same rows exactly when each text's min id arrives in its
  * earliest batch (both pinned in IncrementalSpec).
  *
  * Scale shape per batch: digest-first anti-joins only — the shuffle
  * carries (digest, id), never text. The curated store persists each
  * row's sha2 digest at append time, so re-curation joins the stored
  * digest column and never re-hashes curated text (per-batch hashing
  * is O(batch + reference), not O(total store)); hashing of the frozen
  * reference can likewise be hoisted into a one-time digest sidecar if
  * it dominates.
  */
object Incremental {

  /** The digest column persisted in the curated store. */
  val DigestCol = "__dig"

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

  /** One micro-batch: drop null text, representative-dedup within the
    * batch, anti-join against reference + already-curated (stored
    * digests), append with this batch's digests. Factored out so batch
    * pipelines (and specs) can call it directly. */
  private[streaming] def curateBatch(
      spark: SparkSession, batch: DataFrame, idCol: String, textCol: String,
      referenceDir: String, curatedDir: String): Unit = {
    val clean = batch.filter(col(textCol).isNotNull)
    val reps = Dedup.exactDedup(clean, idCol, textCol).select(idCol)
    val deduped = clean.join(reps, Seq(idCol), "left_semi")
    val vsRef = Dedup.dedupAgainstReference(
      deduped, spark.read.parquet(referenceDir), idCol, textCol)
    val existing = curatedParquet(spark, curatedDir)
    val fresh = existing match {
      case Some(cur) => Dedup.dedupAgainstDigestedReference(
        vsRef, cur, idCol, textCol, DigestCol)
      case None => vsRef
    }
    fresh.withColumn(DigestCol, sha2(col(textCol), 256))
      .write.mode("append").parquet(curatedDir)
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
