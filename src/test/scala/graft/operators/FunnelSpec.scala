package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Funnel accounting: per-stage counts must match recounts, arrive from
  * the caller's ONE action, and the uninstrumented twin must stay
  * fusable. */
class FunnelSpec extends SparkSpec {

  private val stages: Seq[(String, DataFrame => DataFrame)] = Seq(
    "keep_even" -> (df => df.filter(col("id") % 2 === 0)),
    "keep_small" -> (df => df.filter(col("id") < 50)),
    "dedup_bucket" -> (df => df.withColumn("b", col("id") % 10)
      .dropDuplicates("b").drop("b")))

  test("instrumented funnel: counts match per-stage recounts through a shuffle stage") {
    val input = spark.range(100).toDF()
    val (df, report) = Funnel.instrument(input, stages)
    df.write.format("noop").mode("overwrite").save() // the ONE action
    val got = report().counts
    val expected = ("input", 100L) +: stages.indices.map { i =>
      stages(i)._1 ->
        Funnel.compose(spark.range(100).toDF(), stages.take(i + 1)).count()
    }
    assert(got == expected, s"got $got expected $expected")
    // even ids < 50 hit only 5 of the 10 buckets: 25 → 5 rows
    assert(Funnel.Report(got.toList).dropped ==
      Seq("input" -> 0L, "keep_even" -> 50L, "keep_small" -> 25L,
        "dedup_bucket" -> 20L))
  }

  test("instrumented narrow funnel costs exactly the caller's one job") {
    // narrow stages only: a shuffle stage would legitimately add AQE
    // stage-jobs and say nothing about the instrumentation's cost
    val narrow = stages.take(2)
    val (df, report) = Funnel.instrument(spark.range(100).toDF(), narrow)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val marker = new java.util.concurrent.atomic.AtomicBoolean(false)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val group = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
        if (group.contains("graft-funnel-marker")) marker.set(true)
        else jobs.incrementAndGet(): Unit
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      df.write.format("noop").mode("overwrite").save()
      assert(report().counts == Seq(
        "input" -> 100L, "keep_even" -> 50L, "keep_small" -> 25L))
      // flush: the listener bus is FIFO, so once the marker lands every
      // job the funnel submitted has been counted
      spark.sparkContext.setJobGroup("graft-funnel-marker", "flush")
      try spark.range(1).count() finally spark.sparkContext.clearJobGroup()
      val deadline = System.nanoTime() + 10_000_000_000L
      while (!marker.get && System.nanoTime() < deadline) Thread.sleep(20)
      assert(marker.get, "listener bus never delivered the marker job")
      assert(jobs.get == 1,
        s"a 3-point funnel report must ride the ONE action, saw ${jobs.get} jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("uninstrumented twin fuses: same rows, no CollectMetrics barrier") {
    val filterOnly = stages.take(2)
    val plain = Funnel.compose(spark.range(100).toDF(), filterOnly)
    val (inst, report) = Funnel.instrument(spark.range(100).toDF(), filterOnly)
    assert(plain.collect().map(_.getLong(0)).sorted
      sameElements inst.collect().map(_.getLong(0)).sorted)
    report() // consume so the observation doesn't dangle
    val plan = plain.queryExecution.executedPlan.toString
    assert(!plan.contains("CollectMetrics"), s"plain twin instrumented:\n$plan")
  }

  test("streaming funnel: per-micro-batch observed counts, batch-local not cumulative") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val narrow = stages.take(2)
    val df = Funnel.instrumentStreaming(mem.toDS().toDF("id"), narrow)
    val sink = s"funnel_stream_${System.nanoTime()}"
    val q = df.writeStream.format("memory").queryName(sink).start()
    try {
      mem.addData(0L until 100L: _*)
      q.processAllAvailable()
      val p1 = q.recentProgress.filter(_.numInputRows > 0).last
      assert(Funnel.progressCounts(p1, narrow.map(_._1)) ==
        Seq("input" -> 100L, "keep_even" -> 50L, "keep_small" -> 25L))
      // second batch: counts are THIS batch's, not running totals
      mem.addData(100L until 140L: _*) // all >= 50: keep_small drops every survivor
      q.processAllAvailable()
      val p2 = q.recentProgress.filter(_.numInputRows > 0).last
      assert(Funnel.progressCounts(p2, narrow.map(_._1)) ==
        Seq("input" -> 40L, "keep_even" -> 20L, "keep_small" -> 0L))
    } finally q.stop()
  }

  test("duplicate stage names refuse loudly") {
    val err = intercept[IllegalArgumentException] {
      Funnel.instrument(spark.range(1).toDF(),
        Seq("a" -> identity[DataFrame] _, "a" -> identity[DataFrame] _))
    }
    assert(err.getMessage.contains("unique"))
  }
}
