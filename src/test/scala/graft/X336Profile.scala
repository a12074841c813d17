package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for the x336 decontamination pipeline: times each
  * stage of the composition in isolation (noop-sink materialization)
  * so the ~20 s isolated bench median can be attributed. Not a test —
  * run with `Test/runMain graft.X336Profile`. */
object X336Profile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.TextAnalysis
    import graft.sources.Tables

    def time(label: String)(f: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try f.write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          println(s"[x336prof] $label FAILED: ${e.toString.take(150)}") }
        val dt = (System.nanoTime() - t0) / 1e9
        graft.util.CacheScope.sweep(spark)
        dt
      }
      println(f"[x336prof] $label%-28s ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }

    val docs = Tables.documents(spark, dir)
    val prompts = docs
      .filter(col("doc_id") % 40 === 0 && col("text").isNotNull)
      .select(col("doc_id").as("prompt_id"),
        col("text").substr(1, 120).as("ptext"))

    def candOf(): DataFrame = {
      val (p0, l0) = TextAnalysis.bm25Index(docs, "doc_id", "text")
      val p = p0.persist(); val l = l0.persist()
      TextAnalysis.bm25TopDocsForQueries(p, l, prompts, "prompt_id",
        "ptext", topK = 10)
        .select(col("query_id"), col("doc_id"), col("bm25"))
    }

    time("retrieve (cand)")(candOf())
    time("verify tier (given cand)") {
      val cand = candOf().persist()
      cand.count()
      val candDocs = docs.join(
        cand.select(col("doc_id").as("doc_id")).distinct(), Seq("doc_id"),
        "left_semi")
      val dg = graft.operators.Dedup.shingleHashes(candDocs, "doc_id", "text", 3)
      val qg = graft.operators.Dedup.shingleHashes(prompts, "prompt_id", "ptext", 3)
      val qsz = qg.groupBy(col("doc").as("query_id"))
        .agg(count(lit(1)).as("__qn"))
      val hits = cand.select(col("query_id"), col("doc_id"))
        .join(qg.withColumnRenamed("doc", "query_id"), Seq("query_id"))
        .join(dg.select(col("doc").as("doc_id"), col("h")),
          Seq("doc_id", "h"), "left_semi")
        .groupBy(col("query_id"), col("doc_id"))
        .agg(count(lit(1)).as("ngram_hits"))
      cand.join(hits, Seq("query_id", "doc_id"), "left")
        .join(qsz, Seq("query_id"))
        .select(col("query_id"), col("doc_id"), col("bm25"),
          coalesce(col("ngram_hits"), lit(0L)).as("ngram_hits"))
    }
    time("full x336") {
      graft.queries.Queries.all("x336_decontam_pipeline")(spark, dir)
    }
    time("shingle prompts") {
      graft.operators.Dedup.shingleHashes(prompts, "prompt_id", "ptext", 3)
    }
    spark.stop()
  }
}
