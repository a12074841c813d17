package graft

import org.apache.spark.sql.DataFrame

import graft.queries.Queries
import graft.sources.Tables

/** SQL-text front end, end-to-end (VERDICT r2 §7): a representative
  * subset of the gate queries rendered as `spark.sql` strings — with the
  * graft_* extension functions where the DataFrame form uses the custom
  * codegen expressions — must produce row-identical output to the
  * DataFrame programs. Proves the engine's whole query surface is
  * reachable from SQL, not only from the Scala API. */
class SqlSurfaceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def registerViews(): Unit = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    Tables.embeddings(spark, dir).createOrReplaceTempView("embeddings")
    Tables.documents(spark, dir).createOrReplaceTempView("documents")
    Tables.events(spark, dir).createOrReplaceTempView("events")
    GraftExtensions.register(spark)
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  private def assertSame(name: String, sql: String): Unit = {
    registerViews()
    val viaSql = rows(spark.sql(sql))
    val viaDf = rows(Queries.all(name)(spark, dir))
    assert(viaSql == viaDf, s"$name: SQL text and DataFrame program diverge")
    assert(viaSql.nonEmpty, s"$name: empty result proves nothing")
  }

  test("t02 equality filter as SQL text") {
    assertSame("t02_filter_eq",
      """SELECT o_orderkey, o_custkey,
        |  ROUND(CAST(o_totalprice AS DOUBLE), 2) AS price
        |FROM orders WHERE o_orderstatus = 'F' ORDER BY o_orderkey""".stripMargin)
  }

  test("t09 hash aggregate as SQL text") {
    assertSame("t09_hash_agg",
      """SELECT l_returnflag, l_linestatus,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price,
        |  COUNT(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  test("t21 global top-k as SQL text") {
    assertSame("t21_topk",
      """SELECT o_orderkey, ROUND(CAST(o_totalprice AS DOUBLE), 2) AS price
        |FROM orders ORDER BY price DESC, o_orderkey LIMIT 10""".stripMargin)
  }

  test("t26 rollup as SQL text") {
    assertSame("t26_rollup",
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |  COALESCE(l_linestatus, 'ALL') AS ls, COUNT(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin)
  }

  test("t46 intersect as SQL text") {
    assertSame("t46_intersect",
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin)
  }

  test("t34 cosine top-k as SQL text via graft_dot") {
    // the custom codegen expression carries the SQL form end-to-end:
    // same dot kernel, same rounding, same two-phase-equivalent ranking
    assertSame("t34_cosine_topk",
      """WITH base AS (
        |  SELECT vec_id, embedding,
        |         SQRT(graft_dot(embedding, embedding)) AS nrm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q, embedding AS qv, nrm AS qn
        |      FROM base WHERE vec_id IN (0, 1, 2)),
        |scored AS (
        |  SELECT q.q, b.vec_id,
        |         ROUND(graft_dot(q.qv, b.embedding) / (q.qn * b.nrm), 4) AS cos
        |  FROM base b JOIN q ON b.vec_id <> q.q),
        |ranked AS (
        |  SELECT q, vec_id, cos,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY q ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT q, rank, vec_id, cos FROM ranked WHERE rank <= 3
        |ORDER BY q, rank""".stripMargin)
  }

  test("t48 session windows as SQL text via session_window") {
    assertSame("t48_session_window",
      """SELECT user_id,
        |  unix_micros(session_window.start) AS start_us,
        |  unix_micros(session_window.end) AS end_us,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM events
        |GROUP BY session_window(ts, '30 minutes'), user_id
        |ORDER BY user_id, start_us""".stripMargin)
  }

  test("x54 portable md5 sample as SQL text") {
    assertSame("x54_hash_sample",
      """SELECT doc_id, lang, source FROM documents
        |WHERE SUBSTRING(MD5(CAST(doc_id AS STRING)), 1, 4) < '2aaa'
        |ORDER BY doc_id""".stripMargin)
  }

  test("x55 repetition as SQL text via graft_ngram_distinct") {
    assertSame("x55_repetition",
      """SELECT doc_id,
        |  CAST(GREATEST(SIZE(SPLIT(text, ' ')) - 1, 0) AS BIGINT) AS n_grams,
        |  CASE WHEN SIZE(SPLIT(text, ' ')) > 1
        |       THEN ROUND(1.0D - CAST(graft_ngram_distinct(SPLIT(text, ' '), 2) AS DOUBLE)
        |                   / CAST(SIZE(SPLIT(text, ' ')) - 1 AS DOUBLE), 4)
        |       ELSE 0.0D END AS dup_ratio
        |FROM documents ORDER BY doc_id""".stripMargin)
  }

  test("x67 normalized dedup as SQL text via graft_normalize") {
    assertSame("x67_normalized_dedup",
      """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        |FROM (SELECT doc_id, graft_normalize(text) AS nt FROM documents)
        |GROUP BY nt ORDER BY doc_id""".stripMargin)
  }

  test("x70 winnowed fingerprints as SQL text via graft_winnow") {
    assertSame("x70_winnowing",
      """SELECT doc_id, fp FROM (
        |  SELECT doc_id,
        |    EXPLODE(graft_winnow(graft_shingle_hashes(SPLIT(text, ' '), 3), 4)) AS fp
        |  FROM documents)
        |ORDER BY doc_id, fp""".stripMargin)
  }

  test("x108 classifier quality filter as SQL text") {
    assertSame("x108_quality_classifier",
      """WITH t AS (
        |  SELECT doc_id, lang, SPLIT(text, ' ') AS w,
        |    LEAST(CAST(LENGTH(text) AS DOUBLE) / 500.0, 1.0) AS len_score,
        |    CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[^A-Za-z0-9 ]', ''))
        |        AS DOUBLE) / GREATEST(CAST(LENGTH(text) AS DOUBLE), 1.0) AS punct_ratio
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, lang,
        |    ROUND(1.0 / (1.0 + EXP(-(-2.0 + 2.5 * len_score +
        |      1.5 * (1.0 - punct_ratio) +
        |      1.5 * (CAST(SIZE(FILTER(w, x -> x RLIKE '^[A-Za-z]+$')) AS DOUBLE)
        |        / GREATEST(CAST(SIZE(w) AS DOUBLE), 1.0))))), 4) AS ql_score
        |  FROM t)
        |SELECT doc_id, lang, ql_score FROM s
        |WHERE ql_score >= 0.5 ORDER BY doc_id""".stripMargin)
  }

  test("x109 temperature rebalancing as SQL text") {
    assertSame("x109_temperature_mix",
      """WITH c AS (
        |  SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n FROM documents GROUP BY lang),
        |k AS (
        |  SELECT lang, SQRT((SELECT MIN(n) FROM c) / n) AS rate,
        |    FORMAT_STRING('%04x',
        |      CAST(FLOOR(SQRT((SELECT MIN(n) FROM c) / n) * 65536.0) AS INT)) AS cut
        |  FROM c)
        |SELECT d.doc_id, d.lang, d.source
        |FROM documents d JOIN k USING (lang)
        |WHERE k.rate >= 1.0 OR SUBSTRING(MD5(CAST(d.doc_id AS STRING)), 1, 4) < k.cut
        |ORDER BY d.doc_id""".stripMargin)
  }

  test("x72 PII redaction as SQL text via graft_redact_pii") {
    assertSame("x72_pii_redaction",
      """WITH p AS (SELECT doc_id,
        |  CONCAT(lang, '@', source, '.com from 10.1.2.',
        |    CAST(PMOD(doc_id, 254) AS STRING), ' ', SUBSTRING(text, 1, 40)) AS t
        |  FROM documents)
        |SELECT doc_id, graft_redact_pii(t) AS redacted,
        |  CAST(regexp_count(t, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}') AS BIGINT) AS n_email,
        |  CAST(regexp_count(t, '([0-9]{1,3}\\.){3}[0-9]{1,3}') AS BIGINT) AS n_ip
        |FROM p ORDER BY doc_id""".stripMargin)
  }

  test("x118 CDC changelog apply as SQL text") {
    assertSame("x118_cdc_apply",
      """WITH r AS (SELECT user_id, event_type, value, ts,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_type, value, unix_micros(ts) AS ts_us
        |FROM r WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin)
  }

  test("x121 rolling z-score as SQL text (WINDOW clause)") {
    assertSame("x121_rolling_zscore",
      """WITH r AS (SELECT event_id, user_id, value,
        |  COUNT(value) OVER w AS c, AVG(value) OVER w AS m,
        |  stddev_samp(value) OVER w AS sd
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)),
        |z AS (SELECT event_id, user_id,
        |  ROUND(CASE WHEN c = 10 AND sd > 0 THEN (value - m) / sd END, 4)
        |    AS zscore FROM r)
        |SELECT event_id, user_id, zscore,
        |  CASE WHEN zscore IS NOT NULL THEN
        |    CAST(CASE WHEN ABS(zscore) > 2.0D THEN 1 ELSE 0 END AS BIGINT)
        |  END AS is_anomaly
        |FROM z ORDER BY event_id""".stripMargin)
  }

  test("x116 demand classification as SQL text") {
    assertSame("x116_demand_classes",
      """WITH daily AS (SELECT user_id,
        |  to_date(date_trunc('DAY', ts)) AS day,
        |  SUM(CAST(value AS DECIMAL(18,2))) AS demand
        |  FROM events GROUP BY 1, 2),
        |agg AS (SELECT user_id, COUNT(*) AS nz,
        |  datediff(MAX(day), MIN(day)) + 1 AS span,
        |  AVG(CAST(demand AS DOUBLE)) AS mean,
        |  var_samp(CAST(demand AS DOUBLE)) AS vr
        |  FROM daily GROUP BY 1),
        |r AS (SELECT user_id, nz, span,
        |  ROUND(CAST(span AS DOUBLE) / nz, 4) AS adi,
        |  ROUND(vr / (mean * mean), 4) AS cv2 FROM agg)
        |SELECT user_id, nz AS demand_days, CAST(span AS BIGINT) AS span_days,
        |  adi, cv2,
        |  CASE WHEN cv2 IS NULL THEN 'n/a'
        |       WHEN adi < 1.32D AND cv2 < 0.49D THEN 'smooth'
        |       WHEN adi >= 1.32D AND cv2 < 0.49D THEN 'intermittent'
        |       WHEN adi < 1.32D THEN 'erratic'
        |       ELSE 'lumpy' END AS demand_class
        |FROM r ORDER BY user_id""".stripMargin)
  }
}
