package graft.util

import org.apache.spark.sql.DataFrame

/** Materialization barrier for frames whose ROWS bake in
  * partition-dependent values (`spark_partition_id`,
  * `monotonically_increasing_id` over a sampled range shuffle).
  *
  * Why persist() is NOT enough (r14, caught by PrefixSumScaleDemo at
  * 10 M keys): a cached plan is a lazy promise, and two consumers of
  * the same persisted DataFrame can still independently RE-EVALUATE
  * its lineage (AQE replanning around the not-yet-materialized cache)
  * — and RangePartitioner's boundary sample is seeded by the rdd id,
  * so each evaluation assigns DIFFERENT partition ids. A downstream
  * (group, chunk) self-join then silently drops or misplaces rows.
  *
  * checkpoint()/localCheckpoint() fix the physical RDD INSTANCE at
  * call time: every consumer of the returned frame reads the same
  * RDD, so partition-dependent columns are frozen by construction,
  * lazily (eager = false — materialization still happens at the first
  * action, shared by all consumers). Reliable checkpoint when a
  * checkpoint dir is configured (survives executor loss — the
  * pageRank/connectedComponents discipline), executor-local blocks
  * otherwise; storage is reclaimed by the ContextCleaner when the
  * plan is collected (Verify/Bench sweep per query regardless).
  */
object Cut {
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = false)
    else df.localCheckpoint(eager = false)

  /** Release the storage behind a cut frame: the checkpoint RDD's
    * persisted blocks (localCheckpoint) and/or its files (reliable
    * checkpoint). `DataFrame.unpersist` alone cannot reach these —
    * they belong to the underlying RDD, not the plan cache — so
    * [[graft.util.CacheScope.unpersistAll]] calls this for every held
    * frame (a no-op on plans with no LogicalRDD). */
  def release(df: DataFrame): Unit = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(false)
        lr.rdd.getCheckpointFile.foreach { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          p.getFileSystem(conf).delete(p, true); ()
        }
      case _ => ()
    }
  }
}
