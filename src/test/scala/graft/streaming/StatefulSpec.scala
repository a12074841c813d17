package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class StatefulSpec extends SparkSpec {
  import spark.implicits._

  test("firstSeen: streaming dedup emits only the first occurrence per key, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)] // (contentHash, docId)
    val out = Stateful.firstSeen[Long, (Long, String)](mem.toDS(), _._1)
    val sink = s"firstseen_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((10L, "a1"), (10L, "a2"), (20L, "b1"))
      q.processAllAvailable()
      mem.addData((10L, "a3"), (20L, "b2"), (30L, "c1"))
      q.processAllAvailable()
    } finally q.stop()
    val seen = spark.table(sink).as[(Long, String)].collect().toSet
    assert(seen == Set((10L, "a1"), (20L, "b1"), (30L, "c1")))
  }

  test("runningCount: per-key state accumulates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Int)]
    val out = Stateful.runningCount[String, (String, Int)](mem.toDS(), _._1)
    val sink = s"runcount_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(("u1", 1), ("u1", 2), ("u2", 3))
      q.processAllAvailable()
      mem.addData(("u1", 4))
      q.processAllAvailable()
    } finally q.stop()
    // Update-mode sink keeps the latest row per key per batch; the
    // final state for u1 must be 3 events total
    val last = spark.table(sink).as[(String, Long)].collect()
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    assert(last == Map("u1" -> 3L, "u2" -> 1L))
  }
}
