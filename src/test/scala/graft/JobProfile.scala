package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Structural profile of a query's execution (test scope):
  * `sbt "Test/runMain graft.JobProfile <sfDir> <query> [query ...]"`
  * runs each named gate query once through the noop sink (after one
  * untimed warm-up materialization that also builds any memo state)
  * and prints JOB / STAGE / TASK counts plus total shuffle read/write
  * bytes — the host-noise-immune evidence for "this rewrite removed
  * N shuffles per sweep" claims on queries whose iterative internals
  * materialize during plan construction and are therefore invisible
  * in the final explain() output. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: JobProfile <sfDir> <query> [query ...]")
    val dir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shufRead = new AtomicLong
    val shufWrite = new AtomicLong
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    }
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      // untimed warm-up: builds memo state and JIT, like Bench's
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[jobprofile] warm-up failed for $n: $e") }
      graft.util.CacheScope.sweep(spark)
      jobs.set(0); stages.set(0); tasks.set(0)
      shufRead.set(0); shufWrite.set(0)
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // drain queued listener events before reading the counters
      // (listenerBus is private[spark] — a short sleep suffices for a
      // local-mode run whose last job has completed)
      Thread.sleep(1500)
      spark.sparkContext.removeSparkListener(listener)
      println(f"[jobprofile] $n jobs=${jobs.get} stages=${stages.get} " +
        f"tasks=${tasks.get} shuffleReadMB=${shufRead.get / 1e6}%.1f " +
        f"shuffleWriteMB=${shufWrite.get / 1e6}%.1f wall=$wall%.2f")
      graft.util.CacheScope.sweep(spark)
    }
    spark.stop()
  }
}
