package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** The precomputed fuzzy-dedup index (X40 production path): the probe
  * must reproduce the recompute form exactly, and its plan must never
  * scan the frozen corpus. */
class NearDupIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"
  private def docs = Tables.documents(spark, dir)

  test("index probe == recompute form (pairs and drop form)") {
    val corpus = docs.filter(col("doc_id") < 400)
    val batch = docs.filter(col("doc_id") >= 400)
    val recompute = Dedup.minhashNearDupsAgainstReference(
        batch, corpus, "doc_id", "text", threshold = 0.35)
      .as[(Long, Long, Double)].collect().toSet
    val index = Dedup.buildNearDupIndex(corpus, "doc_id", "text")
    val probed = Dedup.minhashNearDupsAgainstIndex(
        batch, index, "doc_id", "text", threshold = 0.35)
      .as[(Long, Long, Double)].collect().toSet
    assert(probed == recompute)

    val dropRecompute = Dedup.dropNearDupsAgainstReference(
        batch, corpus, "doc_id", "text", threshold = 0.35)
      .select("doc_id").as[Long].collect().toSet
    val dropProbed = Dedup.dropNearDupsAgainstIndex(
        batch, index, "doc_id", "text", threshold = 0.35)
      .select("doc_id").as[Long].collect().toSet
    assert(dropProbed == dropRecompute)
  }

  test("probe plan scans the corpus ZERO times (only batch + stored index)") {
    val tmp = java.nio.file.Files.createTempDirectory("ndidx").toString
    val corpusPath = s"$tmp/corpus.parquet"
    docs.filter(col("doc_id") < 400).write.parquet(corpusPath)
    val corpus = spark.read.parquet(corpusPath)
    Dedup.buildNearDupIndex(corpus, "doc_id", "text").write(s"$tmp/index")
    val index = Dedup.NearDupIndex.read(spark, s"$tmp/index")

    val probe = Dedup.minhashNearDupsAgainstIndex(
      docs.filter(col("doc_id") >= 400), index, "doc_id", "text",
      threshold = 0.35)
    probe.count() // force planning end-to-end (AQE finalizes subplans)
    val physical = probe.queryExecution.executedPlan.toString
    assert(!physical.contains("corpus.parquet"),
      "probe plan must not re-read the frozen corpus — that is the " +
        "O(batches × corpus) trap the index exists to remove")
    assert(physical.contains("bands") && physical.contains("sets"),
      "probe plan reads the stored index relations")
  }

  test("append: the index grows with the curated store and new dups are caught") {
    val tmp = java.nio.file.Files.createTempDirectory("ndidx2").toString
    // slice 1 indexed at build time; slice 2 appended later (the
    // incremental-store lifecycle: each admitted batch is indexed once)
    Dedup.buildNearDupIndex(docs.filter(col("doc_id") < 200), "doc_id", "text")
      .write(s"$tmp/index")
    Dedup.buildNearDupIndex(
        docs.filter(col("doc_id") >= 200 && col("doc_id") < 400), "doc_id", "text")
      .append(s"$tmp/index")
    val index = Dedup.NearDupIndex.read(spark, s"$tmp/index")
    val probed = Dedup.minhashNearDupsAgainstIndex(
        docs.filter(col("doc_id") >= 400), index, "doc_id", "text",
        threshold = 0.35)
      .as[(Long, Long, Double)].collect().toSet
    val recompute = Dedup.minhashNearDupsAgainstReference(
        docs.filter(col("doc_id") >= 400), docs.filter(col("doc_id") < 400),
        "doc_id", "text", threshold = 0.35)
      .as[(Long, Long, Double)].collect().toSet
    assert(probed == recompute,
      "a two-slice appended index must equal the one-shot index over the union")
    assert(probed.exists(_._2 < 200) || probed.exists(_._2 >= 200),
      "sanity: matches exist")
  }
}
