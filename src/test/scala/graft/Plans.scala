package graft

import org.apache.spark.sql.SparkSession

import graft.queries.Queries

/** Plan audit harness (test scope): dump formatted physical plans for
  * the scale-critical queries so pushdown / broadcast / codegen /
  * top-k physical strategies can be inspected. */
object Plans {
  def main(args: Array[String]): Unit = {
    // usage: Plans [sfDir] [queryName...] — args are classified by
    // whether they name a known query; anything else is the data dir
    val picked = args.filter(Queries.all.contains).toSeq
    val dirArgs = args.filterNot(Queries.all.contains)
    require(dirArgs.length <= 1,
      s"unrecognized query names: ${dirArgs.mkString(", ")} " +
        s"(known: ${Queries.all.keys.toSeq.sorted.mkString(", ")})")
    val dir = dirArgs.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val targets = Seq("t02_filter_eq", "t03_filter_range", "t04_join_chain",
      "t06_left_join_cond", "t08_composite_join", "t21_topk", "t27_group_topk",
      "x45_ann_lsh", "t37_stats_agg", "t38_percentile", "t39_string_funcs",
      "t40_datetime_funcs", "t41_conditional", "t42_window_frames",
      "x50_simhash_neardup", "x52_exact_dedup_digest", "t36_salted_join",
      // round-3 changed paths: scalable encode, heap-based nth, struct
      // as-of (plain + tolerance), prefiltered Jaccard verify
      "t28_label_encode", "t17_nth_from_last", "t43_asof_join",
      "t47_asof_tolerance", "x41_minhash_neardup", "x42_ngram_jaccard",
      // round-3 additions: session window, deterministic IVF, portable
      // sample, repetition, composed curation pipeline
      "t48_session_window", "x53_ivf_ann", "x54_hash_sample",
      "x55_repetition", "x56_curation_pipeline",
      // round-3 curation tier: cached-tf TF-IDF, broadcast-gram
      // decontamination, centroid re-join, winnowing inverted index,
      // null-safe fence join
      "x64_tfidf", "x65_decontamination", "x66_centroid_outliers",
      "x70_winnowing", "x71_winnowing_neardup", "x74_iqr_outliers",
      // cross-side LSH + candidate-only verify + (x76) anti-join
      "x75_neardup_incremental", "x76_neardup_drop",
      // round-9 additions: sidecar-probe dedup, duplicated spans +
      // redaction (positional grams, island merge, HOF rewrite)
      "x79_refdigest_dedup", "x80_duplicated_spans", "x81_span_redaction",
      "x82_nfc_dedup")
    (if (picked.nonEmpty) picked else targets).foreach { name =>
      println(s"\n════════ $name ════════")
      println(Queries.all(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
