package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Curation-funnel accounting: how many rows survive each stage of a
  * filter pipeline — the report every production curation run publishes
  * (N ingested → N after lang-ID → N after dedup → …).
  *
  * The naive version recounts after every stage: one extra JOB per
  * stage, each re-running all upstream stages — O(stages²) scans of a
  * 100 TB input. This instruments stage boundaries with
  * `Dataset.observe` (Catalyst `CollectMetrics`): the counts are
  * accumulated DURING the caller's single terminal action, so the full
  * funnel report costs ZERO extra scans and zero extra jobs.
  *
  * Trade-off, stated plainly: a `CollectMetrics` node is an optimizer
  * boundary, so a downstream filter no longer pushes through an
  * instrumented stage into the scan. That is semantically REQUIRED (the
  * report must count rows as they existed between stages); run the
  * uninstrumented composition when you want maximum fusion and no
  * report. Both forms share the same stage functions, so they cannot
  * drift.
  */
object Funnel {

  final case class Report(counts: Seq[(String, Long)]) {
    /** rows dropped by each stage (input name → 0). */
    def dropped: Seq[(String, Long)] =
      counts.zip(counts.head +: counts).map { case ((n, c), (_, prev)) =>
        n -> (prev - c)
      }
  }

  /** The instrumented composition: `input` observed as "input", then
    * each named stage applied and observed under its name. Returns the
    * composed frame plus a `Report` thunk — call it AFTER running an
    * action on the frame (the observations complete with the action;
    * reading earlier blocks, reading with no action ever run would
    * block forever, so the thunk is the caller's explicit step). */
  def instrument(input: DataFrame,
      stages: Seq[(String, DataFrame => DataFrame)])
    : (DataFrame, () => Report) = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val names = "input" +: stages.map(_._1)
    require(names.distinct.size == names.size,
      s"stage names must be unique: $names")
    val obs = names.map(n => n -> new Observation(s"funnel_$n"))
    val obsMap = obs.toMap
    val instrumented = stages.foldLeft(
        input.observe(obsMap("input"), count(lit(1)).as("rows"))) {
      case (df, (name, fn)) =>
        fn(df).observe(obsMap(name), count(lit(1)).as("rows"))
    }
    val report = () => Report(obs.map { case (n, o) =>
      n -> o.get.apply("rows").asInstanceOf[Long]
    })
    (instrumented, report)
  }

  /** Plain composition of the same stages — the uninstrumented twin for
    * when fusion/pushdown across stages matters more than the report. */
  def compose(input: DataFrame,
      stages: Seq[(String, DataFrame => DataFrame)]): DataFrame =
    stages.foldLeft(input) { case (df, (_, fn)) => fn(df) }

  /** Streaming form: the same per-stage observation on an unbounded
    * frame. `Observation` refuses streaming Datasets, so the metric
    * points are named (`funnel_<stage>`) and surface PER MICRO-BATCH in
    * each `StreamingQueryProgress.observedMetrics` — read them with
    * [[progressCounts]] from `query.lastProgress`/`recentProgress` or a
    * listener. Same zero-extra-scans property per batch, and the
    * per-batch funnel is exactly what a curation stream's monitoring
    * wants (drop-rate spikes localize to a batch, not a lifetime
    * average). */
  def instrumentStreaming(input: DataFrame,
      stages: Seq[(String, DataFrame => DataFrame)]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val names = "input" +: stages.map(_._1)
    require(names.distinct.size == names.size,
      s"stage names must be unique: $names")
    stages.foldLeft(
        input.observe("funnel_input", count(lit(1)).as("rows"))) {
      case (df, (name, fn)) =>
        fn(df).observe(s"funnel_$name", count(lit(1)).as("rows"))
    }
  }

  /** Decode one micro-batch's funnel from its progress object: the
    * (stage, rows) counts in stage order, input first. Stages whose
    * metric is absent from this batch (empty batch planning) are
    * omitted. */
  def progressCounts(
      progress: org.apache.spark.sql.streaming.StreamingQueryProgress,
      stageNames: Seq[String]): Seq[(String, Long)] = {
    val metrics = progress.observedMetrics
    ("input" +: stageNames).flatMap { n =>
      Option(metrics.get(s"funnel_$n"))
        .map(row => n -> row.getAs[Long]("rows"))
    }
  }
}
