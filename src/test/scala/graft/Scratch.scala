package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, Text}
import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** Ad-hoc perf scratch (test scope, not shipped). */
object Scratch {
  def time(name: String)(df: DataFrame): Unit = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
  }

  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, dir)
    time("warmup count")(docs)

    val toks = docs.select(col("doc_id").as("doc"), explode(Text.tokens(col("text"))).as("t"))
    time("tokenize+explode")(toks)
    time("tokens+charHash")(toks.withColumn("h", Hashing.charHash(col("t"))))

    val shRaw = docs.select(col("doc_id").as("doc"),
      explode(Text.shingles(col("text"), 3)).as("sh"))
    time("shingles+explode")(shRaw)
    val sh = Dedup.shingleHashes(docs, "doc_id", "text", 3)
    time("shingleHashes(distinct)")(sh)
    val sig = Dedup.minhashSignatures(sh, 16)
    time("minhashSignatures")(sig)
    val bands = Dedup.lshBandKeys(sig, 16, 4)
    time("lshBandKeys")(bands)
    val pairs = Dedup.lshCandidatePairs(bands)
    time("lshCandidatePairs")(pairs)
    println("pairs count: " + pairs.count())
    time("jaccard(pairs)")(Dedup.jaccard(sh, pairs))

    val emb = Tables.embeddings(spark, dir)
    val base = Similarity.prepared(emb, "vec_id", "embedding")
    time("emb prepared")(base)
    time("x51 lsh pairs")(Similarity.cosineNearDupPairsLsh(emb, "vec_id", "embedding",
      Seq(10, 11, 12, 13), 0.45))
    time("x44 brute pairs")(Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.45))
    spark.stop()
  }
}
