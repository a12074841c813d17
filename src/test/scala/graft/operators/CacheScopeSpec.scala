package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables
import graft.util.CacheScope

/** Persist lifecycle (VERDICT r2 §5): the dedup/similarity working sets
  * must be releasable once the consuming action has run — no leaked
  * MEMORY_AND_DISK blocks squatting on the next query's memory. */
class CacheScopeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("minhashNearDups under a scope: blocks released after unpersistAll") {
    val before = persistedIds
    val docs = Tables.documents(spark, dir)
    val scope = CacheScope()
    val out = Dedup.minhashNearDups(docs, "doc_id", "text", scope = scope)
    out.count() // the consuming action
    assert((persistedIds -- before).nonEmpty, "the shingle set should be cached while in use")
    scope.unpersistAll(blocking = true)
    assert(persistedIds == before, "scope must release every block it persisted")
  }

  test("cosineNearDupPairsLsh under a scope: blocks released after unpersistAll") {
    val before = persistedIds
    val emb = Tables.embeddings(spark, dir)
    val scope = CacheScope()
    val out = Similarity.cosineNearDupPairsLsh(
      emb, "vec_id", "embedding", planeIds = Seq(1, 2, 3, 4), threshold = 0.95,
      scope = scope)
    out.count()
    assert((persistedIds -- before).nonEmpty)
    scope.unpersistAll(blocking = true)
    assert(persistedIds == before)
  }

  test("sweep drops unmanaged persists (driver hygiene between queries)") {
    val docs = Tables.documents(spark, dir).limit(50)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()
    CacheScope.sweep(spark)
    // the catalog sweep empties the CacheManager; the block count must
    // not keep growing across repeated sweeps
    val after = persistedIds
    docs.unpersist(true)
    assert(persistedIds.size <= after.size)
  }
}
