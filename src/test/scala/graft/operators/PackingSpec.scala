package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("packFirstFitDecreasing: capacity respected, all items placed exactly once") {
    val chunks = TextAnalysis.chunkTokens(
        Tables.documents(spark, dir), "doc_id", "text", chunkSize = 64, overlap = 0)
      .select(monotonically_increasing_id().as("item_id"), col("n_chunk_tokens"))
      .persist()
    val packed = Packing.packFirstFitDecreasing(chunks, "item_id", "n_chunk_tokens", 256L)
    val joined = packed.join(chunks, "item_id").persist()

    // every input item appears exactly once
    assert(packed.count() == chunks.count())
    assert(packed.select("item_id").distinct().count() == chunks.count())

    // no bin exceeds capacity (items here are <= 64 <= capacity)
    val over = joined.groupBy("bin_id").agg(sum("n_chunk_tokens").as("tot"))
      .filter(col("tot") > 256L).count()
    assert(over == 0, "a bin exceeded capacity")

    // FFD actually packs: average fill must beat naive one-item-per-bin
    val bins = joined.groupBy("bin_id").agg(sum("n_chunk_tokens").as("tot"))
    val avgFill = bins.agg(avg("tot")).as[Double].collect().head
    assert(avgFill > 128.0, s"bins too empty: avg fill $avgFill of 256")
    chunks.unpersist(); joined.unpersist()
  }

  test("packFirstFitDecreasing: oversized items get singleton bins, never dropped") {
    val items = Seq((1L, 300L), (2L, 100L), (3L, 100L)).toDF("id", "sz")
      .repartition(1)
    val packed = Packing.packFirstFitDecreasing(items, "id", "sz", 256L)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(packed.map(_._1) == Seq(1L, 2L, 3L))
    val binOf = packed.toMap
    assert(binOf(1L) != binOf(2L), "oversized item must sit alone")
    assert(binOf(2L) == binOf(3L), "the two small items fit one bin")
  }

  test("packFirstFitDecreasing: deterministic for a fixed partitioning") {
    val items = (1L to 500L).map(i => (i, (i * 37 % 120) + 8)).toDF("id", "sz")
      .repartition(4, col("id"))
    val a = Packing.packFirstFitDecreasing(items, "id", "sz", 256L)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val b = Packing.packFirstFitDecreasing(items, "id", "sz", 256L)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(a == b)
  }
}
