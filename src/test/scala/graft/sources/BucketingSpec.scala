package graft.sources

import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, ShuffleQueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed layout must remove the shuffles from co-located joins and
  * aggregations — asserted on the PHYSICAL PLAN, not just results. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  // count shuffle exchanges through the AQE wrapper (before execution
  // they appear as ShuffleExchangeExec, after as ShuffleQueryStageExec)
  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect {
      case s: ShuffleExchangeExec => s
      case s: ShuffleQueryStageExec => s
    }.size
  }

  test("bucketed fact-fact join plans with zero exchanges; results match shuffle join") {
    val left = (1L to 2000L).map(i => (i % 97, i, i * 2.0)).toDF("k", "id", "v")
    val right = (1L to 500L).map(i => (i % 97, s"r$i")).toDF("k", "tag")
    spark.sql("DROP TABLE IF EXISTS b_left")
    spark.sql("DROP TABLE IF EXISTS b_right")
    Bucketing.writeBucketed(left, "b_left", 8, Seq("k"))
    Bucketing.writeBucketed(right, "b_right", 8, Seq("k"))
    val bl = Bucketing.table(spark, "b_left")
    val br = Bucketing.table(spark, "b_right")

    // disable auto-broadcast so the join strategy is genuinely SMJ/SHJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketedJoin = bl.join(br, Seq("k"))
      assert(shuffles(bucketedJoin) == 0,
        s"bucketed join must be exchange-free:\n${bucketedJoin.queryExecution.executedPlan}")

      val plainJoin = left.join(right, Seq("k"))
      assert(shuffles(plainJoin) > 0, "control: unbucketed join must shuffle")

      val a = bucketedJoin.groupBy("k").count().orderBy("k").collect().toSeq
      val b = plainJoin.groupBy("k").count().orderBy("k").collect().toSeq
      assert(a == b)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("groupBy on the bucket key needs no pre-aggregate exchange") {
    val agg = Bucketing.table(spark, "b_left").groupBy("k").agg(sum(col("v")))
    assert(shuffles(agg) == 0,
      s"bucket-key aggregation must be exchange-free:\n${agg.queryExecution.executedPlan}")
  }

  test("window over the bucket key needs no exchange (M5 feature-window shape)") {
    // the per-key lag/lead/rolling windows of the feature pipeline
    // cluster on the entity id; a layout bucketed by that id feeds the
    // WindowExec its required distribution straight from the scan
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("k").orderBy("id")
    val windowed = Bucketing.table(spark, "b_left")
      .withColumn("lag_v", lag(col("v"), 1).over(w))
    assert(shuffles(windowed) == 0,
      s"bucket-key window must be exchange-free:\n${windowed.queryExecution.executedPlan}")
    // control: the same window over the unbucketed frame shuffles
    val plain = (1L to 2000L).map(i => (i % 97, i, i * 2.0)).toDF("k", "id", "v")
      .withColumn("lag_v", lag(col("v"), 1).over(w))
    assert(shuffles(plain) > 0, "control: unbucketed window must shuffle")
  }
}
