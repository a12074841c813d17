package graft.queries

/** DuckDB oracle SQL twins of [[Queries]] — the driver runs these on the
  * same parquet tables and hash-compares against our Spark results
  * (columns sorted by name, so names must match EXACTLY; every query
  * ends in a total ORDER BY over a unique output key).
  *
  * Dialect mappings used (SURVEY.md §2.6): Spark `weekday(d)` ≡ DuckDB
  * `isodow(d)-1`; Spark `datediff(b,a)` ≡ `date_diff('day',a,b)`; Spark
  * `get_json_object(p,'$.k')` ≡ `json_extract_string(p,'$.k')`; Spark
  * `size(split(t,' '))` ≡ `len(string_split(t,' '))`; float math in
  * float64 with `ROUND(_,4)`; money sums through DECIMAL(18,2).
  *
  * The portable hash functions (graft.functions.Hashing) are reproduced
  * here as inline `list_reduce` folds over code points — identical
  * arithmetic mod 1e9+7, so dedup/fingerprint results match bit-for-bit
  * including hash collisions.
  *
  * Negative-zero convention: Spark's ROUND goes through BigDecimal and
  * can never emit -0.0; DuckDB's is IEEE and rounds tiny negatives to
  * -0.0, which renders differently and fails the hash. Any rounded
  * DOUBLE output column whose value can approach zero from below must
  * add `+ 0.0` in the DuckDB twin (see t44) — a no-op everywhere except
  * exactly -0.0.
  */
object OracleSql {

  private val P = "1000000007"

  /** charHash(s): fold (acc*31 + codepoint) % P over the characters. */
  private def chash(expr: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(string_split($expr,'')::VARCHAR[], ch -> ascii(ch)::BIGINT)), (acc,x) -> (acc*31+x)%$P)"

  /** Distinct (doc, shingle-hash) pairs over word 3-grams — the set
    * representation shared by the minhash/jaccard oracles. */
  private def shingleCte(n: Int): String =
    shingleCteFor("sh", "documents", "doc_id", "text", n)

  /** [[shingleCte]] over an arbitrary (id, text) source — the x336
    * pipeline shingles the prompt table and the candidate docs with
    * the same Dedup.shingleHashes twin. */
  private def shingleCteFor(name: String, src: String, id: String,
      text: String, n: Int): String =
    s"""$name AS (
       |  SELECT DISTINCT $id AS doc, ${chash("s")} AS h
       |  FROM (SELECT $id,
       |          unnest([array_to_string(w[i:i+${n - 1}], ' ') for i in range(1, len(w)-${n - 2})]) AS s
       |        FROM (SELECT $id, string_split($text,' ') AS w FROM $src) tw) ts)""".stripMargin

  /** Winnowed fingerprints (k=3 grams, window w=4), positional gram
    * hashes → per-window minima, deduped; <w-gram docs take one
    * whole-doc window, <k-token docs have none. */
  private val winnowCte =
    s"""t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
       |g AS (SELECT doc_id,
       |  [${chash("array_to_string(w[i:i+2], ' ')")}
       |   for i in range(1, len(w) - 1)] AS gh FROM t),
       |f AS (SELECT doc_id,
       |  CASE WHEN len(gh) >= 4
       |         THEN list_distinct([list_min(gh[i:i+3])
       |                             for i in range(1, len(gh) - 2)])
       |       WHEN len(gh) > 0 THEN [list_min(gh)]
       |       ELSE [] END AS fps FROM g),
       |fpt AS (SELECT doc_id AS doc, unnest(fps) AS fp FROM f)""".stripMargin

  /** Unrolled PageRank rounds (x99): r0 = 1/N, each round
    * r_k = (1-0.85)/N + 0.85 · Σ_incoming r_{k-1}/deg — literally the
    * operator's update expression, which a fixed iteration count makes
    * SQL-expressible. */
  private def pageRankSql(iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      s"""r$k AS (
         |  SELECT nd.node,
         |    (SELECT (1 - 0.85)/cnt FROM n) + 0.85 * coalesce(s.c, 0.0) AS r
         |  FROM nodes nd LEFT JOIN (
         |    SELECT e.dst AS node, sum(p.r / dg.deg) AS c
         |    FROM e JOIN r${k - 1} p ON e.src = p.node
         |           JOIN deg dg ON dg.node = e.src
         |    GROUP BY e.dst) s ON s.node = nd.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT DISTINCT 'p' || l_partkey::VARCHAR AS src,
       |                  's' || l_suppkey::VARCHAR AS dst FROM lineitem
       |  UNION
       |  SELECT DISTINCT 's' || l_suppkey::VARCHAR,
       |                  'p' || l_partkey::VARCHAR FROM lineitem),
       |nodes AS (SELECT DISTINCT src AS node FROM e),
       |deg AS (SELECT src AS node, COUNT(*)::DOUBLE AS deg FROM e GROUP BY 1),
       |n AS (SELECT COUNT(*)::DOUBLE AS cnt FROM nodes),
       |r0 AS (SELECT node, (SELECT 1.0/cnt FROM n) AS r FROM nodes),
       |$rounds
       |SELECT node, ROUND(r * (SELECT cnt FROM n), 6) AS rank_norm
       |FROM r$iters ORDER BY node""".stripMargin
  }

  /** Unrolled PageRank over the DIRECTED customer→order graph (x105):
    * every order is a sink, so each round carries the dangling-mass
    * scalar — d_k = Σ r_{k-1} over sink nodes, redistributed as
    * d_k/N inside the damped term, exactly the operator's update. */
  /** X118 personalized PageRank oracle: x105's dangling machinery with
    * the restart/dangling mass landing on the teleport set (nation-1
    * customers). Same float contract: per-round sums in double, ROUND
    * at 6 dp on the |S|-scaled rank, zero-rank rows dropped AFTER the
    * round (mirroring the engine's filter on the rounded value). */
  private def pprSql(iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      s"""d$k AS (
         |  SELECT coalesce(sum(p.r), 0.0) AS dm
         |  FROM r${k - 1} p LEFT JOIN deg d ON d.node = p.node
         |  WHERE d.node IS NULL),
         |r$k AS (
         |  SELECT nd.node, nd.tele,
         |    (1.0e0 - 0.85e0) * nd.tele
         |    + 0.85e0 * (coalesce(s.c, 0.0)
         |                + (SELECT dm FROM d$k) * nd.tele) AS r
         |  FROM nodes nd LEFT JOIN (
         |    SELECT e.dst AS node, sum(p.r / dg.deg) AS c
         |    FROM e JOIN r${k - 1} p ON e.src = p.node
         |           JOIN deg dg ON dg.node = e.src
         |    GROUP BY e.dst) s ON s.node = nd.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT DISTINCT 'c' || o_custkey::VARCHAR AS src,
       |                  'o' || o_orderkey::VARCHAR AS dst FROM orders),
       |nodes0 AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |deg AS (SELECT src AS node, COUNT(*)::DOUBLE AS deg FROM e GROUP BY 1),
       |sd AS (SELECT DISTINCT 'c' || c_custkey::VARCHAR AS node
       |  FROM customer WHERE c_nationkey = 1),
       |sg AS (SELECT n.node FROM nodes0 n JOIN sd ON n.node = sd.node),
       |sc AS (SELECT COUNT(*)::DOUBLE AS scnt FROM sg),
       |nodes AS (SELECT n.node,
       |  CASE WHEN s.node IS NOT NULL THEN (SELECT 1.0e0 / scnt FROM sc)
       |    ELSE 0.0e0 END AS tele
       |  FROM nodes0 n LEFT JOIN sg s ON n.node = s.node),
       |r0 AS (SELECT node, tele, tele AS r FROM nodes),
       |$rounds,
       |fin AS (SELECT node,
       |  CAST(ROUND(CAST(r * (SELECT scnt FROM sc) AS DECIMAL(18,8)), 6)
       |    AS DOUBLE) AS rank_scaled
       |  FROM r$iters)
       |SELECT node, rank_scaled FROM fin WHERE rank_scaled > 0
       |ORDER BY node""".stripMargin
  }

  private def pageRankDanglingSql(iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      s"""d$k AS (
         |  SELECT coalesce(sum(p.r), 0.0) AS dm
         |  FROM r${k - 1} p LEFT JOIN deg d ON d.node = p.node
         |  WHERE d.node IS NULL),
         |r$k AS (
         |  SELECT nd.node,
         |    (SELECT (1 - 0.85)/cnt FROM n)
         |    + 0.85 * (coalesce(s.c, 0.0)
         |              + (SELECT dm FROM d$k) / (SELECT cnt FROM n)) AS r
         |  FROM nodes nd LEFT JOIN (
         |    SELECT e.dst AS node, sum(p.r / dg.deg) AS c
         |    FROM e JOIN r${k - 1} p ON e.src = p.node
         |           JOIN deg dg ON dg.node = e.src
         |    GROUP BY e.dst) s ON s.node = nd.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT DISTINCT 'c' || o_custkey::VARCHAR AS src,
       |                  'o' || o_orderkey::VARCHAR AS dst FROM orders),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |deg AS (SELECT src AS node, COUNT(*)::DOUBLE AS deg FROM e GROUP BY 1),
       |n AS (SELECT COUNT(*)::DOUBLE AS cnt FROM nodes),
       |r0 AS (SELECT node, (SELECT 1.0/cnt FROM n) AS r FROM nodes),
       |$rounds
       |SELECT node, ROUND(r * (SELECT cnt FROM n), 6) AS rank_norm
       |FROM r$iters ORDER BY node""".stripMargin
  }

  /** Morton-interleave arithmetic (x100): bit i of column c lands at
    * position i·k + c; emitted as explicit shift/mask/or terms. */
  private def zorderTerms(a: String, b: String, bits: Int): String =
    (0 until bits).flatMap(i => Seq(
      s"((($a >> $i) & 1) << ${i * 2})",
      s"((($b >> $i) & 1) << ${i * 2 + 1})"))
      .mkString(" | ")

  private def jaccardTail(threshold: Double): String =
    s"""sizes AS (SELECT doc, COUNT(*) AS sz FROM sh GROUP BY doc),
       |inter AS (
       |  SELECT x.doc AS a, y.doc AS b, COUNT(*) AS i
       |  FROM sh x JOIN sh y ON x.h = y.h AND x.doc < y.doc
       |  GROUP BY x.doc, y.doc)
       |SELECT p.a, p.b,
       |       ROUND(i.i::DOUBLE / (sa.sz + sb.sz - i.i)::DOUBLE, 4) AS jac
       |FROM pairs p
       |JOIN inter i ON p.a = i.a AND p.b = i.b
       |JOIN sizes sa ON sa.doc = p.a
       |JOIN sizes sb ON sb.doc = p.b
       |WHERE ROUND(i.i::DOUBLE / (sa.sz + sb.sz - i.i)::DOUBLE, 4) >= $threshold
       |ORDER BY p.a, p.b""".stripMargin

  /** js/sig/bands minhash-banding CTEs over `sh` — ONE copy of the
    * permHash arithmetic and band-key format, shared by x41's within-
    * corpus pairs and the cross-side x75/x76 (a seed or band-width
    * change edited in one gate but not the other would let the two
    * silently diverge from the Spark implementation). */
  private val minhashBandsCtes: String =
    s"""js AS (SELECT unnest(range(16)) AS j),
       |sig AS (
       |  SELECT doc, j, MIN(((2*j+3)*h + 7*j+1) % $P) AS mh
       |  FROM sh CROSS JOIN js GROUP BY doc, j),
       |bands AS (
       |  SELECT doc, j // 4 AS band, string_agg(mh::VARCHAR, ',' ORDER BY j) AS bkey
       |  FROM sig GROUP BY doc, j // 4)""".stripMargin

  /** Cross-side minhash-LSH near-dup pipeline, shared by x75 (pair
    * list) and x76 (drop form): `matched` = (a = batch id, b =
    * reference id, jac ≥ 0.35). The frozen/batch boundary is the last
    * 10% of the id space — `(MAX(doc_id)+1)*9//10`, mirroring
    * Queries.crossSplit — so the batch stays small relative to the
    * corpus at every SF (the production shape). */
  private val crossNearDupCtes: String =
    s"""${shingleCte(3)},
       |$minhashBandsCtes,
       |thr AS (SELECT (MAX(doc_id)+1)*9//10 AS t FROM documents),
       |pairs AS (
       |  SELECT DISTINCT x.doc AS a, y.doc AS b
       |  FROM bands x JOIN bands y ON x.band = y.band AND x.bkey = y.bkey
       |  WHERE x.doc >= (SELECT t FROM thr) AND y.doc < (SELECT t FROM thr)),
       |sizes AS (SELECT doc, COUNT(*) AS sz FROM sh GROUP BY doc),
       |inter AS (
       |  SELECT x.doc AS a, y.doc AS b, COUNT(*) AS i
       |  FROM sh x JOIN sh y ON x.h = y.h
       |  WHERE x.doc >= (SELECT t FROM thr) AND y.doc < (SELECT t FROM thr)
       |  GROUP BY x.doc, y.doc),
       |matched AS (
       |  SELECT p.a, p.b,
       |    ROUND(i.i::DOUBLE / (sa.sz + sb.sz - i.i)::DOUBLE, 4) AS jac
       |  FROM pairs p
       |  JOIN inter i ON p.a = i.a AND p.b = i.b
       |  JOIN sizes sa ON sa.doc = p.a
       |  JOIN sizes sb ON sb.doc = p.b
       |  WHERE ROUND(i.i::DOUBLE / (sa.sz + sb.sz - i.i)::DOUBLE, 4) >= 0.35)""".stripMargin

  /** float64 view of embeddings + cosine helper. */
  private val embCte =
    "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)"
  private val embLabelCte =
    "e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)"
  private def cos(a: String, b: String): String =
    s"ROUND(list_dot_product($a,$b)/(sqrt(list_dot_product($a,$a))*sqrt(list_dot_product($b,$b))),4)"

  /** Hyperplane-sign bucket per vector (planes = corpus vecs 10..13,
    * bit weights 1,2,4,8 in that order) — mirrors Similarity.lshBucketed. */
  private val lshBucketCte = {
    val rank = "CASE pid WHEN 10 THEN 1 WHEN 11 THEN 2 WHEN 12 THEN 4 WHEN 13 THEN 8 END"
    s"""planes AS (SELECT vec_id AS pid, v AS pv FROM e WHERE vec_id IN (10,11,12,13)),
       |bucketed AS (
       |  SELECT e.vec_id, e.v,
       |    CAST(SUM(CASE WHEN list_dot_product(e.v, pv) > 0 THEN $rank ELSE 0 END) AS BIGINT) AS bucket
       |  FROM e CROSS JOIN planes GROUP BY e.vec_id, e.v)""".stripMargin
  }

  /** Stopword-vote language-ID over documents (no ORDER BY — reused as
    * a subquery by the composed-curation oracle). Mirrors
    * TextAnalysis.langId. */
  private val langIdSql: String = {
    val langs = graft.operators.TextAnalysis.stopwords
    val hits = langs.map { case (lang, words) =>
      val set = words.map(w => s"'$w'").mkString(",")
      s"len(list_filter(w, t -> t IN ($set)))::BIGINT AS hit_$lang"
    }.mkString(",\n    ")
    val best = s"GREATEST(${langs.map(l => s"hit_${l._1}").mkString(", ")}, 0)"
    val pred = langs.map { case (lang, _) =>
      s"WHEN hit_$lang = best AND best > 0 THEN '$lang'"
    }.mkString(" ")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |hits AS (
       |  SELECT doc_id,
       |    $hits
       |  FROM toks),
       |b AS (SELECT *, $best AS best FROM hits)
       |SELECT doc_id, CASE $pred ELSE 'und' END AS pred_lang FROM b""".stripMargin
  }

  /** Quality score over documents (no ORDER BY — reused as a subquery).
    * Mirrors TextAnalysis.qualityScore. */
  private val qualitySql: String =
    """WITH t AS (
      |  SELECT doc_id, text, string_split(text, ' ') AS w,
      |    LEAST(LENGTH(text)::DOUBLE / 500.0, 1.0) AS len_score,
      |    (LENGTH(text) - LENGTH(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')))::DOUBLE
      |      / GREATEST(LENGTH(text)::DOUBLE, 1.0) AS punct_ratio
      |  FROM documents)
      |SELECT doc_id,
      |  ROUND(len_score * 0.4 + (1.0 - punct_ratio) * 0.3 +
      |    (len(list_filter(w, x -> regexp_matches(x, '^[A-Za-z]+$')))::DOUBLE
      |      / GREATEST(len(w)::DOUBLE, 1.0)) * 0.3, 4) AS quality
      |FROM t""".stripMargin

  /** 30-bit SimHash fingerprints per doc — mirrors Dedup.simhash. */
  private val simhashFpsCte = {
    val votes = (0 until 30)
      .map(j => s"SUM(((h >> $j) & 1) * 2 - 1) AS s_$j").mkString(",\n    ")
    val fp = (0 until 30)
      .map(j => s"CASE WHEN s_$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    s"""tok AS (
       |  SELECT doc_id AS doc, ${chash("t")} AS h
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents) u),
       |votes AS (
       |  SELECT doc,
       |    $votes
       |  FROM tok GROUP BY doc),
       |fps AS (SELECT doc, CAST($fp AS BIGINT) AS fp FROM votes)""".stripMargin
  }

  /** Rank-arithmetic exact-quantile CTE block — the oracle twin of
    * [[graft.operators.Profiling.groupedExactQuantiles]] (r11 lesson:
    * quantile_cont's float interpolation is DuckDB-version-sensitive,
    * so any quantile that reaches output or a membership compare must
    * interpolate in exact decimal on BOTH engines). Emits CTEs
    * `<p>rk`, `<p>b`, `<p>q`; `<p>q` holds the partition columns plus
    * one DECIMAL quantile column per (name, thousandths). `src` must
    * expose the partition columns and `valExpr`; NULL values are
    * excluded like the Spark side's isNotNull filter.
    */
  private def exactQuantileCtes(
      src: String, partCols: Seq[String], valExpr: String,
      probs: Seq[(String, Int)], outScale: Int, p: String): String = {
    val parts = partCols.mkString(", ")
    val partSel = if (partCols.isEmpty) "" else s"$parts, "
    val overRank =
      if (partCols.isEmpty) "ORDER BY CAST(" + valExpr + " AS DECIMAL(18,6))"
      else s"PARTITION BY $parts ORDER BY CAST($valExpr AS DECIMAL(18,6))"
    val overCnt = if (partCols.isEmpty) "" else s"PARTITION BY $parts"
    val posDefs = probs.map { case (nm, num) =>
      s"""  ($num*(__n-1)) // 1000 AS __lo_$nm,
         |  LEAST(($num*(__n-1)) // 1000 + 1, __n-1) AS __hi_$nm,
         |  ($num*(__n-1)) % 1000 AS __rem_$nm""".stripMargin
    }.mkString(",\n")
    val qDefs = probs.map { case (nm, _) =>
      s"""  ROUND((MIN(CASE WHEN __r = __lo_$nm THEN __v END)
         |      * CAST(1000 - __rem_$nm AS DECIMAL(4,0))
         |    + MIN(CASE WHEN __r = __hi_$nm THEN __v END)
         |      * CAST(__rem_$nm AS DECIMAL(4,0)))
         |    * CAST(0.001 AS DECIMAL(4,3)), $outScale) AS $nm""".stripMargin
    }.mkString(",\n")
    val grpExtra = probs.flatMap { case (nm, _) =>
      Seq(s"__lo_$nm", s"__hi_$nm", s"__rem_$nm") }.mkString(", ")
    val grp = if (partCols.isEmpty) grpExtra else s"$parts, $grpExtra"
    s"""${p}rk AS (SELECT ${partSel}CAST($valExpr AS DECIMAL(18,6)) AS __v,
       |  ROW_NUMBER() OVER ($overRank) - 1 AS __r,
       |  COUNT(*) OVER ($overCnt) AS __n
       |  FROM $src WHERE $valExpr IS NOT NULL),
       |${p}b AS (SELECT ${partSel}__v, __r,
       |$posDefs FROM ${p}rk),
       |${p}q AS (SELECT $partSel
       |$qDefs FROM ${p}b GROUP BY $grp)""".stripMargin
  }

  /** 2^f as the same fixed-order Horner polynomial the Spark side
    * evaluates (TimeSeries.Exp2Coeffs, shared verbatim) — libm pow is
    * not bit-portable across engines (r12 x165 lesson), a literal
    * polynomial is. */
  private def exp2PolySql(f: String): String = {
    val cs = graft.operators.TimeSeries.Exp2Coeffs
      .map(s => s"CAST('$s' AS DOUBLE)")
    cs.reverse.tail.foldLeft(cs.last)((acc, c) => s"($acc * $f + $c)")
  }

  val all: Map[String, String] = Map(
    "t01_scan_project" ->
      "SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name FROM region ORDER BY r_regionkey",

    "t02_filter_eq" ->
      """SELECT o_orderkey, o_custkey, ROUND(CAST(o_totalprice AS DOUBLE), 2) AS price
        |FROM orders WHERE o_orderstatus = 'F' ORDER BY o_orderkey""".stripMargin,

    "t03_filter_range" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, CAST(l_shipdate AS DATE) AS d
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1998-01-01' AND CAST(l_shipdate AS DATE) < DATE '1999-01-01'
        |ORDER BY l_orderkey, l_linenumber, d""".stripMargin,

    "t04_join_chain" ->
      """SELECT n.n_name, COUNT(*) AS cnt
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA' GROUP BY n.n_name ORDER BY n.n_name""".stripMargin,

    "t05_regex_extract" ->
      """SELECT c_custkey, TRY_CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS code
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "t06_left_join_cond" ->
      """SELECT o.o_orderkey, c.c_mktsegment
        |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_acctbal > 5000
        |ORDER BY o_orderkey""".stripMargin,

    "t07_notnull_filter" ->
      """SELECT o.o_orderkey, c.c_mktsegment
        |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_acctbal > 5000
        |WHERE c.c_mktsegment IS NOT NULL ORDER BY o_orderkey""".stripMargin,

    "t08_composite_join" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    ROUND(CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS min_price
        |  FROM lineitem GROUP BY l_partkey, l_suppkey)
        |SELECT l.l_orderkey, CAST(l.l_linenumber AS BIGINT) AS l_linenumber, ps.min_price
        |FROM lineitem l LEFT JOIN ps ON l.l_partkey = ps.l_partkey AND l.l_suppkey = ps.l_suppkey
        |ORDER BY l_orderkey, l_linenumber, min_price""".stripMargin,

    "t09_hash_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price,
        |  COUNT(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "t10_unpivot" ->
      """WITH wide AS (
        |  SELECT l_orderkey,
        |    ROUND(CAST(SUM(CASE WHEN l_returnflag='A' THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS qty_A,
        |    ROUND(CAST(SUM(CASE WHEN l_returnflag='N' THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS qty_N,
        |    ROUND(CAST(SUM(CASE WHEN l_returnflag='R' THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS qty_R
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT l_orderkey, flag, qty FROM (
        |  SELECT l_orderkey, 'qty_A' AS flag, qty_A AS qty FROM wide
        |  UNION ALL SELECT l_orderkey, 'qty_N', qty_N FROM wide
        |  UNION ALL SELECT l_orderkey, 'qty_R', qty_R FROM wide) u
        |ORDER BY l_orderkey, flag""".stripMargin,

    "t11_pivot" ->
      """SELECT o_custkey,
        |  ROUND(CAST(COALESCE(SUM(CASE WHEN o_orderstatus='F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE), 2) AS tot_F,
        |  ROUND(CAST(COALESCE(SUM(CASE WHEN o_orderstatus='O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE), 2) AS tot_O,
        |  ROUND(CAST(COALESCE(SUM(CASE WHEN o_orderstatus='P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE), 2) AS tot_P
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "t12_grouped_lag" ->
      """SELECT event_id, user_id,
        |  ROUND(value - LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS dv
        |FROM events ORDER BY event_id""".stripMargin,

    "t13_grouped_lead" ->
      """SELECT event_id, LEAD(event_type, 7) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS future_type
        |FROM events ORDER BY event_id""".stripMargin,

    "t14_rolling_min_periods" ->
      """SELECT event_id,
        |  CASE WHEN COUNT(value) OVER w = 7 THEN ROUND(AVG(value) OVER w, 4) END AS roll7
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
        |ORDER BY event_id""".stripMargin,

    "t15_distinct_agg" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nparts
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "t16_distinct_sort" ->
      "SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders ORDER BY d",

    "t17_nth_from_last" ->
      """WITH dd AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders),
        |r AS (SELECT d, ROW_NUMBER() OVER (ORDER BY d DESC) AS rn FROM dd)
        |SELECT d FROM r WHERE rn = 20""".stripMargin,

    "t18_time_features" ->
      """SELECT o_orderkey,
        |  CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS q,
        |  CAST(EXTRACT(WEEK FROM o_orderdate) AS BIGINT) AS wk,
        |  CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS dom,
        |  CAST(isodow(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS dow,
        |  CAST(CASE WHEN isodow(CAST(o_orderdate AS DATE)) - 1 IN (5,6) THEN 1 ELSE 0 END AS BIGINT) AS is_weekend
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "t19_date_arith" ->
      """WITH m AS (SELECT MIN(CAST(o_orderdate AS DATE)) AS mn FROM orders)
        |SELECT o_orderkey,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 7 DAY AS DATE) AS plus7,
        |  CAST(date_diff('day', mn, CAST(o_orderdate AS DATE)) + 1 AS BIGINT) AS day_num
        |FROM orders CROSS JOIN m ORDER BY o_orderkey""".stripMargin,

    "t20_string_concat" ->
      """SELECT o_orderkey, 'F' || CAST(o_orderkey % 28 + 1 AS VARCHAR) AS day_id
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "t21_topk" ->
      """SELECT o_orderkey, ROUND(CAST(o_totalprice AS DOUBLE), 2) AS price
        |FROM orders ORDER BY price DESC, o_orderkey LIMIT 10""".stripMargin,

    "t22_union_all" ->
      """SELECT src, o_orderkey FROM (
        |  SELECT 'hi' AS src, o_orderkey FROM orders WHERE o_totalprice > 450000
        |  UNION ALL SELECT 'lo' AS src, o_orderkey FROM orders WHERE o_totalprice < 2000) u
        |ORDER BY src, o_orderkey""".stripMargin,

    "t23_keyed_update" ->
      """WITH sub AS (SELECT c_custkey, CAST(0 AS DOUBLE) AS f1 FROM customer),
        |upd AS (
        |  SELECT o_custkey AS c_custkey, ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS f1
        |  FROM orders WHERE o_orderstatus = 'P' GROUP BY o_custkey)
        |SELECT s.c_custkey, COALESCE(u.f1, s.f1) AS f1
        |FROM sub s LEFT JOIN upd u ON s.c_custkey = u.c_custkey
        |ORDER BY s.c_custkey""".stripMargin,

    "t24_semi_join" ->
      """SELECT c_custkey FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "t25_anti_join" ->
      """SELECT c.c_custkey FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "t26_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls, COUNT(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY rf, ls""".stripMargin,

    "t27_group_topk" ->
      """SELECT c_mktsegment, c_custkey, rnk FROM (
        |  SELECT c_mktsegment, c_custkey,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rnk
        |  FROM customer) t
        |WHERE rnk <= 3 ORDER BY c_mktsegment, rnk""".stripMargin,

    "t28_label_encode" ->
      """SELECT lang, CAST(ROW_NUMBER() OVER (ORDER BY lang) - 1 AS BIGINT) AS code
        |FROM (SELECT DISTINCT lang FROM documents WHERE lang IS NOT NULL) t ORDER BY lang""".stripMargin,

    "t29_except" ->
      """SELECT o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'P') t
        |ORDER BY o_custkey""".stripMargin,

    "t30_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "t31_tumbling_window" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type, COUNT(*) AS cnt,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,

    "t32_dedup_stats" ->
      """SELECT lang, source, COUNT(*) AS n, COUNT(DISTINCT text) AS n_distinct
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    "t33_text_stats" ->
      """SELECT doc_id, n_chars, CAST(LENGTH(text) AS BIGINT) AS len,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t34_cosine_topk" ->
      s"""WITH $embCte,
         |q AS (SELECT vec_id AS q, v AS qv FROM e WHERE vec_id IN (0,1,2)),
         |scored AS (
         |  SELECT q.q, e.vec_id, ${cos("qv", "v")} AS cos
         |  FROM e CROSS JOIN q WHERE e.vec_id <> q.q),
         |r AS (SELECT q, vec_id, cos,
         |        CAST(ROW_NUMBER() OVER (PARTITION BY q ORDER BY cos DESC, vec_id) AS BIGINT) AS "rank"
         |      FROM scored)
         |SELECT q, "rank", vec_id, cos FROM r WHERE "rank" <= 3 ORDER BY q, "rank"""".stripMargin,

    "t35_project_except" ->
      """SELECT c_custkey, ROUND(c_acctbal, 4) AS c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,

    // oracle is the UNSALTED join — salting must be output-invariant
    "t36_salted_join" ->
      """SELECT c.c_custkey, n.n_name
        |FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        |ORDER BY c_custkey""".stripMargin,

    "t37_stats_agg" ->
      """SELECT l_returnflag,
        |  ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
        |  ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
        |  ROUND(AVG(l_discount), 4) AS avg_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // Percentile battery via EXACT rank-arithmetic decimal
    // interpolation on both engines (r12: quantile_cont's float
    // kernel is DuckDB-version-sensitive — the x152 ULP lesson).
    "t38_percentile" ->
      s"""WITH ${exactQuantileCtes("lineitem", Seq("l_linestatus"),
             "l_quantity", Seq("p50" -> 500, "p90" -> 900), 4, "a")},
         |${exactQuantileCtes("lineitem", Seq("l_linestatus"),
             "l_extendedprice", Seq("price_p25" -> 250), 4, "c")}
         |SELECT aq.l_linestatus,
         |  CAST(aq.p50 AS DOUBLE) AS p50,
         |  CAST(aq.p90 AS DOUBLE) AS p90,
         |  CAST(cq.price_p25 AS DOUBLE) AS price_p25
         |FROM aq JOIN cq USING (l_linestatus)
         |ORDER BY l_linestatus""".stripMargin,

    "t39_string_funcs" ->
      """SELECT c_custkey,
        |  UPPER(c_name) AS up,
        |  regexp_replace(c_name, 'Customer', 'Cst', 'g') AS repl,
        |  LPAD(CAST(c_custkey AS VARCHAR), 12, '0') AS padded,
        |  CAST(levenshtein(c_mktsegment, 'BUILDING') AS BIGINT) AS lev,
        |  SUBSTRING(c_name, 10, 5) AS mid
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "t40_datetime_funcs" ->
      """SELECT o_orderkey,
        |  CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,
        |  CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS eom,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m,
        |  CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_start
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "t41_conditional" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 300000 THEN 'high'
        |       WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS bucket,
        |  COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open,
        |  CAST(FLOOR(GREATEST(o_totalprice, 50000)) AS BIGINT) AS floor50k,
        |  CAST(LEAST(o_orderkey % 7, o_orderkey % 5) AS BIGINT) AS lmod
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "t42_window_frames" ->
      """SELECT event_id,
        |  ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cum_value,
        |  CAST(DENSE_RANK() OVER w AS BIGINT) AS drk,
        |  ROUND(PERCENT_RANK() OVER w, 4) AS prk,
        |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "t43_asof_join" ->
      """SELECT e.event_id, ROUND(p.value, 4) AS last_purchase
        |FROM events e
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY event_id""".stripMargin,

    "t47_asof_tolerance" ->
      """SELECT e.event_id,
        |  CASE WHEN date_diff('day', CAST(p.ts AS DATE), CAST(e.ts AS DATE)) <= 7
        |       THEN ROUND(p.value, 4) END AS recent_purchase
        |FROM events e
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY event_id""".stripMargin,

    // + 0.0 canonicalizes negative zero: DuckDB's ROUND is IEEE
    // (round(-2e-5, 4) = -0.0) while Spark's BigDecimal round renders
    // +0.0 — first seen on the sf0.1 sweep (vec 1753), invisible at
    // sf0.01. IEEE -0.0 + 0.0 = +0.0; every other value is unchanged.
    "t44_array_funcs" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS dim,
        |  ROUND(CAST(embedding[1] AS DOUBLE), 4) + 0.0 AS first,
        |  ROUND(CAST(embedding[-1] AS DOUBLE), 4) + 0.0 AS "last",
        |  CAST(len(embedding[5:12]) AS BIGINT) AS slice_len
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "t45_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
        |  COUNT(*) AS cnt
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus) ORDER BY rf, ls""".stripMargin,

    "t46_intersect" ->
      """SELECT o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') t
        |ORDER BY o_custkey""".stripMargin,

    // ─────────────────────── extension tier ───────────────────────

    "x40_exact_dedup" ->
      """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin,

    // digest-first scale twin: same contract, same oracle
    "x52_exact_dedup_digest" ->
      """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin,

    "x41_minhash_neardup" ->
      s"""WITH ${shingleCte(3)},
         |$minhashBandsCtes,
         |pairs AS (
         |  SELECT DISTINCT x.doc AS a, y.doc AS b
         |  FROM bands x JOIN bands y ON x.band = y.band AND x.bkey = y.bkey AND x.doc < y.doc),
         |${jaccardTail(0.35)}""".stripMargin,

    "x42_ngram_jaccard" ->
      s"""WITH ${shingleCte(3)},
         |rare AS (SELECT h FROM sh GROUP BY h HAVING COUNT(*) <= 50),
         |pairs AS (
         |  SELECT DISTINCT x.doc AS a, y.doc AS b
         |  FROM sh x JOIN rare f ON x.h = f.h
         |  JOIN sh y ON x.h = y.h AND x.doc < y.doc),
         |${jaccardTail(0.35)}""".stripMargin,

    "x43_simhash" ->
      s"""WITH $simhashFpsCte
         |SELECT doc AS doc_id, fp FROM fps ORDER BY doc_id""".stripMargin,

    "x50_simhash_neardup" ->
      s"""WITH $simhashFpsCte
         |SELECT x.doc AS a, y.doc AS b,
         |  CAST(bit_count(xor(x.fp, y.fp)) AS BIGINT) AS hamming
         |FROM fps x JOIN fps y ON x.doc < y.doc
         |WHERE bit_count(xor(x.fp, y.fp)) <= 2
         |ORDER BY a, b""".stripMargin,

    "x44_embedding_neardup" ->
      s"""WITH $embCte
         |SELECT x.vec_id AS a, y.vec_id AS b, ${cos("x.v", "y.v")} AS cos
         |FROM e x JOIN e y ON x.vec_id < y.vec_id
         |WHERE ${cos("x.v", "y.v")} >= 0.45
         |ORDER BY a, b""".stripMargin,

    "x51_embedding_neardup_lsh" ->
      s"""WITH $embCte,
         |$lshBucketCte
         |SELECT x.vec_id AS a, y.vec_id AS b, ${cos("x.v", "y.v")} AS cos
         |FROM bucketed x JOIN bucketed y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
         |WHERE ${cos("x.v", "y.v")} >= 0.45
         |ORDER BY a, b""".stripMargin,

    "x45_ann_lsh" ->
      s"""WITH $embCte,
         |$lshBucketCte,
         |q AS (SELECT vec_id AS q, v AS qv, bucket AS qbucket FROM bucketed WHERE vec_id IN (0,1,2)),
         |scored AS (
         |  SELECT q.q, b.vec_id, ${cos("qv", "b.v")} AS cos
         |  FROM bucketed b JOIN q ON b.bucket = q.qbucket AND b.vec_id <> q.q),
         |r AS (SELECT q, vec_id, cos,
         |        CAST(ROW_NUMBER() OVER (PARTITION BY q ORDER BY cos DESC, vec_id) AS BIGINT) AS "rank"
         |      FROM scored)
         |SELECT q, "rank", vec_id, cos FROM r WHERE "rank" <= 3 ORDER BY q, "rank"""".stripMargin,

    "x46_lang_id" -> s"$langIdSql ORDER BY doc_id",

    "x47_quality_score" -> s"$qualitySql ORDER BY doc_id",

    "x48_token_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]', 0)) AS BIGINT) AS n_pieces,
        |  CAST(LENGTH(text) AS BIGINT) AS n_chars_computed
        |FROM documents ORDER BY doc_id""".stripMargin,

    "x49_fingerprint" ->
      s"""SELECT doc_id,
         |  list_reduce(list_prepend(0::BIGINT, list_transform(string_split(text, ' '), t -> ${chash("t")})),
         |    (acc,x) -> (acc*31+x)%$P) AS fp
         |FROM documents ORDER BY doc_id""".stripMargin,

    // Session windows, gaps-and-islands form: a session breaks when the
    // gap to the previous event reaches 30 min (Spark's session_window
    // merges an event iff it lands strictly BEFORE prev_end = last+gap);
    // session_end = last event + gap, matching Spark's window bounds.
    "t48_session_window" ->
      """WITH o AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o)
        |SELECT user_id,
        |  epoch_us(MIN(ts))::BIGINT AS start_us,
        |  epoch_us(MAX(ts) + INTERVAL 30 MINUTE)::BIGINT AS end_us,
        |  COUNT(*)::BIGINT AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, start_us""".stripMargin,

    // Deterministic-quantizer IVF: centroids are corpus vecs 20..23;
    // assignment = argmax rounded cosine (ties -> lowest cell), queries
    // probe their 2 best cells, exact cosine ranked within.
    "x53_ivf_ann" ->
      s"""WITH $embCte,
         |c AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id IN (20,21,22,23)),
         |a0 AS (
         |  SELECT e.vec_id, e.v, c.cell,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |                       ORDER BY ${cos("e.v", "cv")} DESC, c.cell) AS rn
         |  FROM e CROSS JOIN c),
         |assigned AS (SELECT vec_id, v, cell FROM a0 WHERE rn = 1),
         |q AS (SELECT vec_id AS q, v AS qv FROM e WHERE vec_id IN (0,1,2)),
         |p0 AS (
         |  SELECT q.q, q.qv, c.cell,
         |    ROW_NUMBER() OVER (PARTITION BY q.q
         |                       ORDER BY ${cos("qv", "cv")} DESC, c.cell) AS rn
         |  FROM q CROSS JOIN c),
         |probes AS (SELECT q, qv, cell FROM p0 WHERE rn <= 2),
         |scored AS (
         |  SELECT p.q, a.vec_id, ${cos("p.qv", "a.v")} AS cos
         |  FROM assigned a JOIN probes p ON a.cell = p.cell AND a.vec_id <> p.q),
         |r AS (SELECT q, vec_id, cos,
         |        CAST(ROW_NUMBER() OVER (PARTITION BY q ORDER BY cos DESC, vec_id) AS BIGINT) AS "rank"
         |      FROM scored)
         |SELECT q, "rank", vec_id, cos FROM r WHERE "rank" <= 3 ORDER BY q, "rank"""".stripMargin,

    // md5 renders identical lower-case hex on both engines, so the kept
    // key set is bit-identical — the sampling reproducibility contract.
    "x54_hash_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE substr(md5(doc_id::VARCHAR), 1, 4) < '2aaa'
        |ORDER BY doc_id""".stripMargin,

    // Gopher-style repetition: fraction of duplicated word 2-grams.
    "x55_repetition" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))] AS grams
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) t)
        |SELECT doc_id, len(grams)::BIGINT AS n_grams,
        |  CASE WHEN len(grams) > 0
        |       THEN ROUND(1.0 - len(list_distinct(grams))::DOUBLE / len(grams)::DOUBLE, 4)
        |       ELSE 0.0 END AS dup_ratio
        |FROM g ORDER BY doc_id""".stripMargin,

    // Composed curation pipeline: dedup-representative ∩ lang='en' ∩
    // quality ≥ 0.5, then the portable md5 sample — one plan chaining
    // four pipeline stages; each stage's oracle is reused verbatim.
    "x56_curation_pipeline" ->
      s"""WITH rep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
         |l AS ($langIdSql),
         |qs AS ($qualitySql)
         |SELECT d.doc_id, qs.quality,
         |  len(string_split(d.text, ' '))::BIGINT AS n_tokens
         |FROM documents d
         |JOIN rep ON rep.doc_id = d.doc_id
         |JOIN l ON l.doc_id = d.doc_id
         |JOIN qs ON qs.doc_id = d.doc_id
         |WHERE l.pred_lang = 'en' AND qs.quality >= 0.5
         |  AND substr(md5(d.doc_id::VARCHAR), 1, 4) < 'aaaa'
         |ORDER BY d.doc_id""".stripMargin,

    // Sliding-window chunking: chunk i covers tokens [i*48+1, i*48+64]
    // (1-based inclusive, clamped); 1 + ceil(max(0,n-64)/48) chunks.
    "x57_chunking" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |n AS (SELECT doc_id, w,
        |        1 + (GREATEST(len(w) - 64, 0) + 47) // 48 AS nc FROM t),
        |i AS (SELECT unnest(range(0, 1000)) AS chunk_id)
        |SELECT doc_id, chunk_id::BIGINT AS chunk_id,
        |  array_to_string(w[(chunk_id*48 + 1):(chunk_id*48 + 64)], ' ') AS chunk,
        |  len(w[(chunk_id*48 + 1):(chunk_id*48 + 64)])::BIGINT AS n_chunk_tokens
        |FROM n JOIN i ON i.chunk_id < n.nc
        |ORDER BY doc_id, chunk_id""".stripMargin,

    "x58_vocabulary" ->
      """WITH c AS (
        |  SELECT t AS word, COUNT(*)::BIGINT AS cnt
        |  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents) u
        |  GROUP BY t)
        |SELECT word, cnt,
        |  ROW_NUMBER() OVER (ORDER BY cnt DESC, word)::BIGINT AS "rank"
        |FROM c ORDER BY "rank" LIMIT 100""".stripMargin,

    // Relative curation: keep docs at/above their language's median
    // quality — median via EXACT rank-arithmetic decimal interpolation
    // (r12: no float quantile kernel on either engine).
    "x59_quantile_filter" ->
      s"""WITH qs AS ($qualitySql),
         |d AS (SELECT doc.doc_id, doc.lang, qs.quality
         |      FROM documents doc JOIN qs ON qs.doc_id = doc.doc_id),
         |${exactQuantileCtes("d", Seq("lang"), "quality",
             Seq("med" -> 500), 4, "m")}
         |SELECT d.doc_id, d.lang, d.quality
         |FROM d JOIN mq ON mq.lang IS NOT DISTINCT FROM d.lang
         |WHERE d.quality >= mq.med
         |ORDER BY d.doc_id""".stripMargin,

    // Union-find over simhash near-dup pairs: transitive closure via
    // recursive CTE, cluster = min reachable node. Mirrors
    // Dedup.connectedComponents' min-label fixpoint.
    "x60_dup_clusters" ->
      s"""WITH RECURSIVE $simhashFpsCte,
         |edges AS (
         |  SELECT x.doc AS a, y.doc AS b FROM fps x JOIN fps y
         |  ON x.doc <> y.doc AND bit_count(xor(x.fp, y.fp)) <= 2),
         |reach(node, r) AS (
         |  SELECT doc, doc FROM fps
         |  UNION
         |  SELECT reach.node, e.b FROM reach JOIN edges e ON e.a = reach.r)
         |SELECT node AS doc_id, MIN(r)::BIGINT AS cluster
         |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin,

    // Interval join (batch twin of the stream-stream form): purchases
    // within [click, click + 2h] per user.
    "t49_interval_join" ->
      """SELECT c.event_id, epoch_us(p.ts)::BIGINT AS buy_us,
        |  ROUND(p.value, 4) AS value
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 2 HOUR
        |ORDER BY c.event_id, buy_us, value""".stripMargin,

    // Incremental ingest dedup: new batch minus texts already frozen.
    "x61_incremental_dedup" ->
      """SELECT b.doc_id, b.lang, b.source FROM documents b
        |WHERE b.doc_id >= 400 AND NOT EXISTS (
        |  SELECT 1 FROM documents r WHERE r.doc_id < 400 AND r.text = b.text)
        |ORDER BY b.doc_id""".stripMargin,

    // Portable source mixing: per-source md5-prefix cuts, pass-through
    // for the last group.
    "x62_source_mix" ->
      """SELECT doc_id, source FROM documents
        |WHERE (source IN ('src0','src1','src2')
        |        AND substr(md5(doc_id::VARCHAR), 1, 4) < '8000')
        |   OR (source IN ('src3','src4')
        |        AND substr(md5(doc_id::VARCHAR), 1, 4) < 'c000')
        |   OR source = 'src5'
        |ORDER BY doc_id""".stripMargin,

    // Portable stratified take-n: first 15 docs per language in
    // md5-hex order (doc_id tiebreak).
    "x63_stratified_sample" ->
      """SELECT doc_id, lang, source FROM (
        |  SELECT doc_id, lang, source,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 15 ORDER BY doc_id""".stripMargin,

    // TF-IDF top terms: rank by the ROUNDED score in both engines so
    // tie-breaking is identical (ln differs in the last ulp across
    // libm builds; 4-decimal rounding absorbs it).
    "x64_tfidf" ->
      """WITH tf AS (
        |  SELECT doc_id, t AS term, COUNT(*)::BIGINT AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |        FROM documents) u
        |  GROUP BY doc_id, t),
        |dfreq AS (SELECT term, COUNT(*)::BIGINT AS df FROM tf GROUP BY term),
        |n AS (SELECT COUNT(*)::BIGINT AS n FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term,
        |    ROUND(tf.tf * LN(CAST(n.n AS DOUBLE) / dfreq.df), 4) AS tfidf
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, term, tfidf, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
        |  FROM scored)
        |SELECT doc_id, term, tfidf FROM ranked
        |WHERE rn <= 5 ORDER BY doc_id, term""".stripMargin,

    // Benchmark decontamination: corpus docs (id >= 400) sharing any
    // word 3-gram with the frozen eval set (id < 400); hits = distinct
    // shared grams, frac = hits over the doc's distinct gram count.
    "x65_decontamination" ->
      s"""WITH ${shingleCte(3)},
         |ref AS (SELECT DISTINCT h FROM sh WHERE doc < 400),
         |m AS (
         |  SELECT c.doc, COUNT(*) AS sz, COUNT(r.h) AS hits
         |  FROM sh c LEFT JOIN ref r ON c.h = r.h
         |  WHERE c.doc >= 400 GROUP BY c.doc)
         |SELECT doc AS doc_id, hits::BIGINT AS hits,
         |  ROUND(hits::DOUBLE / sz, 4) AS frac
         |FROM m WHERE hits > 0 ORDER BY doc_id""".stripMargin,

    // Embedding outlier score: cosine of each vector to its label's
    // element-wise-mean centroid.
    "x66_centroid_outliers" ->
      s"""WITH $embLabelCte,
         |u AS (SELECT label, generate_subscripts(v, 1) AS pos, unnest(v) AS x
         |      FROM e),
         |c AS (SELECT label, pos, AVG(x) AS m FROM u GROUP BY label, pos),
         |cv AS (SELECT label, list(m ORDER BY pos) AS cvec FROM c GROUP BY label)
         |SELECT e.vec_id, e.label::BIGINT AS label, ${cos("e.v", "cv.cvec")} AS cos
         |FROM e JOIN cv USING (label) ORDER BY vec_id""".stripMargin,

    // Dedup on the canonical text form (lowercase / strip punctuation /
    // collapse spaces); Spark regexp_replace is global, DuckDB needs 'g'.
    "x82_nfc_dedup" ->
      """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        |FROM (SELECT doc_id, nfc_normalize(text) AS nt FROM documents) t
        |GROUP BY nt ORDER BY doc_id""".stripMargin,

    "x67_normalized_dedup" ->
      """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        |FROM (SELECT doc_id,
        |        trim(regexp_replace(regexp_replace(regexp_replace(lower(text),
        |          '[ \t\n\x0B\f\r]+', ' ', 'g'), '[^a-z0-9 ]+', '', 'g'),
        |          ' +', ' ', 'g')) AS nt
        |      FROM documents) t
        |GROUP BY nt ORDER BY doc_id""".stripMargin,

    // Token-budget mixing: running per-source token sum in md5 order,
    // keep while cum <= 700.
    "x68_token_budget_mix" ->
      """SELECT doc_id, source, tok FROM (
        |  SELECT doc_id, source, len(string_split(text, ' '))::BIGINT AS tok,
        |    SUM(len(string_split(text, ' '))) OVER (PARTITION BY source
        |      ORDER BY md5(doc_id::VARCHAR), doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM documents) z
        |WHERE cum <= 700 ORDER BY doc_id""".stripMargin,

    // Cross-modal curation: x56's text gates composed with x66's
    // embedding-outlier gate over doc_id = vec_id.
    "x69_multimodal_curation" ->
      s"""WITH rep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
         |l AS ($langIdSql),
         |qs AS ($qualitySql),
         |$embLabelCte,
         |u AS (SELECT label, generate_subscripts(v, 1) AS pos, unnest(v) AS x
         |      FROM e),
         |c AS (SELECT label, pos, AVG(x) AS m FROM u GROUP BY label, pos),
         |cv AS (SELECT label, list(m ORDER BY pos) AS cvec FROM c GROUP BY label),
         |emb AS (
         |  SELECT e.vec_id, ${cos("e.v", "cv.cvec")} AS cos
         |  FROM e JOIN cv USING (label))
         |SELECT d.doc_id, qs.quality, emb.cos
         |FROM documents d
         |JOIN rep ON rep.doc_id = d.doc_id
         |JOIN l ON l.doc_id = d.doc_id
         |JOIN qs ON qs.doc_id = d.doc_id
         |JOIN emb ON emb.vec_id = d.doc_id
         |WHERE l.pred_lang = 'en' AND qs.quality >= 0.5 AND emb.cos >= 0.15
         |ORDER BY d.doc_id""".stripMargin,

    // Winnowed fingerprints (SIGMOD'03): per-window minima of the
    // positional 3-gram hash sequence, window 4.
    "x70_winnowing" ->
      s"""WITH $winnowCte
         |SELECT doc AS doc_id, fp FROM fpt ORDER BY doc_id, fp""".stripMargin,

    // Winnowing near-dup pairs: >= 2 shared df-capped fingerprints.
    "x71_winnowing_neardup" ->
      s"""WITH $winnowCte,
         |rare AS (SELECT fp FROM fpt GROUP BY fp HAVING COUNT(*) <= 50),
         |fr AS (SELECT p.doc, p.fp FROM fpt p JOIN rare r ON p.fp = r.fp)
         |SELECT x.doc AS a, y.doc AS b, COUNT(*)::BIGINT AS shared
         |FROM fr x JOIN fr y ON x.fp = y.fp AND x.doc < y.doc
         |GROUP BY x.doc, y.doc HAVING COUNT(*) >= 2
         |ORDER BY a, b""".stripMargin,

    // PII redaction over an in-query derived column (emails then IPv4s;
    // Spark regexp_replace is global, DuckDB needs 'g').
    "x72_pii_redaction" ->
      """WITH p AS (SELECT doc_id,
        |  lang || '@' || source || '.com from 10.1.2.' ||
        |    (doc_id % 254)::VARCHAR || ' ' || substr(text, 1, 40) AS t
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(t,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |    '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g') AS redacted,
        |  len(regexp_extract_all(t,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'))::BIGINT AS n_email,
        |  len(regexp_extract_all(t,
        |    '([0-9]{1,3}\.){3}[0-9]{1,3}'))::BIGINT AS n_ip
        |FROM p ORDER BY doc_id""".stripMargin,

    // Symmetric int8 quantization: scale = max|x|/127 (floored at
    // 1e-30), codes = round(x/scale); codes computed with the
    // UNROUNDED scale on both engines, only the reported scale is
    // rounded. Flattened to scalar (vec_id, scale, pos, code) rows —
    // gate outputs may not contain array/list cells (SURVEY §2.6).
    "x73_int8_quantize" ->
      s"""WITH $embCte,
         |s AS (SELECT vec_id, v,
         |  greatest(list_max(list_transform(v, x -> abs(x))), 1e-30) / 127
         |    AS scale_raw FROM e),
         |u AS (SELECT vec_id, scale_raw, v,
         |  UNNEST(range(1, len(v)+1)) AS pos FROM s)
         |SELECT vec_id, ROUND(scale_raw, 6) AS scale, pos::BIGINT AS pos,
         |  round(v[pos] / scale_raw)::BIGINT AS code
         |FROM u ORDER BY vec_id, pos""".stripMargin,

    // Per-nation IQR outliers (Tukey fences, 0.4×IQR — uniform data
    // has no 1.5× tails) on rounded balances; quartiles via EXACT
    // rank-arithmetic decimal interpolation and fence arithmetic in
    // DECIMAL (r12: no float quantile kernel on either engine).
    "x74_iqr_outliers" ->
      s"""WITH c AS (SELECT c_custkey::BIGINT AS c_custkey,
         |    c_nationkey::BIGINT AS c_nationkey,
         |    ROUND(CAST(c_acctbal AS DOUBLE), 2) AS bal FROM customer),
         |${exactQuantileCtes("c", Seq("c_nationkey"), "bal",
             Seq("q1" -> 250, "q3" -> 750), 6, "g")},
         |f AS (SELECT c_nationkey,
         |    ROUND(q1 - CAST(0.4 AS DECIMAL(2,1)) * (q3 - q1), 4) AS lo,
         |    ROUND(q3 + CAST(0.4 AS DECIMAL(2,1)) * (q3 - q1), 4) AS hi
         |  FROM gq)
         |SELECT c.c_custkey, c.c_nationkey, c.bal
         |FROM c JOIN f ON c.c_nationkey IS NOT DISTINCT FROM f.c_nationkey
         |WHERE c.bal < f.lo OR c.bal > f.hi
         |ORDER BY c_custkey""".stripMargin,

    // Fuzzy incremental dedup: batch (last 10% of ids) vs frozen
    // (first 90%) LSH band collisions, exact Jaccard verify — pairs
    // oriented (a = batch, b = reference), so the intersection is
    // computed cross-side, not with the a < b convention of x41/x42.
    "x75_neardup_incremental" ->
      s"""WITH $crossNearDupCtes
         |SELECT a, b, jac FROM matched ORDER BY a, b""".stripMargin,

    // Drop form of x75: the batch minus docs with any cross-side match.
    "x76_neardup_drop" ->
      s"""WITH $crossNearDupCtes
         |SELECT d.doc_id, d.lang, d.source FROM documents d
         |WHERE d.doc_id >= (SELECT t FROM thr) AND NOT EXISTS (
         |  SELECT 1 FROM matched m WHERE m.a = d.doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // x77/x78 probe a precomputed index instead of re-shingling the
    // frozen corpus; the RESULT contracts are identical to x75/x76, so
    // the oracles are the same SQL (index vs recompute is a plan
    // property, pinned by NearDupIndexSpec's zero-corpus-scan
    // assertion).
    "x77_neardup_index" ->
      s"""WITH $crossNearDupCtes
         |SELECT a, b, jac FROM matched ORDER BY a, b""".stripMargin,

    "x78_neardup_drop_index" ->
      s"""WITH $crossNearDupCtes
         |SELECT d.doc_id, d.lang, d.source FROM documents d
         |WHERE d.doc_id >= (SELECT t FROM thr) AND NOT EXISTS (
         |  SELECT 1 FROM matched m WHERE m.a = d.doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // x79 anti-joins a persisted digest sidecar instead of re-hashing
    // the frozen corpus; the RESULT contract is x61's (sha256 equality
    // == text equality absent an engineered collision), so the oracle
    // is the same text anti-join — sidecar vs re-hash is a plan
    // property, pinned by IncrementalSpec's no-reference-scan
    // assertion.
    "x79_refdigest_dedup" ->
      """SELECT b.doc_id, b.lang, b.source FROM documents b
        |WHERE b.doc_id >= 400 AND NOT EXISTS (
        |  SELECT 1 FROM documents r WHERE r.doc_id < 400 AND r.text = b.text)
        |ORDER BY b.doc_id""".stripMargin,

    // x80 duplicated spans: positional 8-gram hashes (same charHash
    // fold as the winnowing/minhash CTEs), corpus-wide occurrence df,
    // gaps-and-islands merge of hit windows (the t48 session pattern)
    "x80_duplicated_spans" ->
      s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
         |g AS (SELECT doc_id,
         |  [${chash("array_to_string(w[i:i+7], ' ')")}
         |   for i in range(1, len(w) - 6)] AS gh FROM t),
         |p AS (SELECT doc_id AS doc,
         |  unnest([{'pos': i-1, 'h': gh[i]}
         |          for i in range(1, len(gh)+1)], recursive := true) FROM g),
         |hits AS (SELECT doc, pos, h FROM p WHERE h IN (
         |  SELECT h FROM p GROUP BY h HAVING COUNT(*) >= 2)),
         |m AS (SELECT doc, pos,
         |  CASE WHEN pos - lag(pos) OVER (PARTITION BY doc ORDER BY pos) <= 8
         |       THEN 0 ELSE 1 END AS newgrp FROM hits),
         |grp AS (SELECT doc, pos,
         |  SUM(newgrp) OVER (PARTITION BY doc ORDER BY pos) AS grp FROM m)
         |SELECT doc AS doc_id, MIN(pos)::BIGINT AS span_start,
         |       (MAX(pos) + 7)::BIGINT AS span_end, COUNT(*) AS n_windows
         |FROM grp GROUP BY doc, grp
         |ORDER BY doc_id, span_start""".stripMargin,

    // x81 applies x80's spans back to the text: tokens whose 0-based
    // index falls inside any merged span are dropped (merged spans are
    // disjoint, so the redacted count is the plain span-length sum)
    "x81_span_redaction" ->
      s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
         |g AS (SELECT doc_id,
         |  [${chash("array_to_string(w[i:i+7], ' ')")}
         |   for i in range(1, len(w) - 6)] AS gh FROM t),
         |p AS (SELECT doc_id AS doc,
         |  unnest([{'pos': i-1, 'h': gh[i]}
         |          for i in range(1, len(gh)+1)], recursive := true) FROM g),
         |hits AS (SELECT doc, pos, h FROM p WHERE h IN (
         |  SELECT h FROM p GROUP BY h HAVING COUNT(*) >= 2)),
         |m AS (SELECT doc, pos,
         |  CASE WHEN pos - lag(pos) OVER (PARTITION BY doc ORDER BY pos) <= 8
         |       THEN 0 ELSE 1 END AS newgrp FROM hits),
         |grp AS (SELECT doc, pos,
         |  SUM(newgrp) OVER (PARTITION BY doc ORDER BY pos) AS grp FROM m),
         |spans AS (SELECT doc AS doc_id, MIN(pos) AS lo, MAX(pos) + 7 AS hi
         |  FROM grp GROUP BY doc, grp),
         |agg AS (SELECT doc_id, list({'lo': lo, 'hi': hi}) AS sp
         |  FROM spans GROUP BY doc_id)
         |SELECT t.doc_id,
         |  -- coalesce: DuckDB renders an EMPTY list as NULL through
         |  -- array_to_string; Spark's array_join gives '' (a fully
         |  -- redacted doc is an empty string, not an absent one)
         |  coalesce(array_to_string([w[i] for i in range(1, len(w)+1)
         |    if NOT coalesce(list_bool_or(
         |      [(i-1) BETWEEN s.lo AND s.hi for s in a.sp]), false)], ' '), '')
         |    AS redacted,
         |  len(w)::BIGINT AS n_tokens,
         |  coalesce(list_sum([s.hi - s.lo + 1 for s in a.sp]), 0)::BIGINT
         |    AS n_redacted
         |FROM t JOIN agg a ON t.doc_id = a.doc_id
         |ORDER BY t.doc_id""".stripMargin,

    // x83 unigram LM scoring: add-one-smoothed unigram model over the
    // frozen reference (id < 400), batch docs (id ≥ 400) scored by mean
    // negative ln-prob. OOV takes the smoothing floor 1/(T+V). ROUND
    // after the mean absorbs libm/order ulp (same policy as x64).
    "x83_unigram_lm" ->
      """WITH rt AS (SELECT unnest(string_split(text, ' ')) AS term
        |            FROM documents WHERE doc_id < 400),
        |model AS (SELECT term, COUNT(*)::BIGINT AS c FROM rt GROUP BY term),
        |tot AS (SELECT SUM(c)::DOUBLE AS t, COUNT(*)::DOUBLE AS v FROM model),
        |bt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |       FROM documents WHERE doc_id >= 400),
        |tf AS (SELECT doc_id, term, COUNT(*)::BIGINT AS tf
        |       FROM bt GROUP BY doc_id, term)
        |SELECT tf.doc_id, SUM(tf.tf)::BIGINT AS n_tokens,
        |  ROUND(-SUM(tf.tf * ln((coalesce(m.c, 0) + 1)::DOUBLE / (tot.t + tot.v)))
        |          / SUM(tf.tf), 4) AS avg_nll
        |FROM tf LEFT JOIN model m USING (term) CROSS JOIN tot
        |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin,

    // x84 per-source cap: top 5 per source by (quality desc, id).
    "x84_source_cap" ->
      s"""WITH qs AS ($qualitySql),
         |d AS (SELECT doc.doc_id, doc.source, qs.quality
         |      FROM documents doc JOIN qs ON doc.doc_id = qs.doc_id),
         |r AS (SELECT doc_id, source, quality,
         |        ROW_NUMBER() OVER (PARTITION BY source
         |          ORDER BY quality DESC, doc_id) AS rnk
         |      FROM d)
         |SELECT doc_id, source, quality, rnk FROM r
         |WHERE rnk <= 5 ORDER BY doc_id""".stripMargin,

    // x85 bloom-prefiltered sidecar dedup: the bloom trades shuffle
    // volume, never rows (no false negatives; positives are verified
    // exactly), so the RESULT contract is x61/x79's text anti-join —
    // prefilter vs direct anti-join is a plan property, pinned by
    // ScaleOpsSpec's single-join + parity assertions.
    "x85_bloom_dedup" ->
      """SELECT b.doc_id, b.lang, b.source FROM documents b
        |WHERE b.doc_id >= 400 AND NOT EXISTS (
        |  SELECT 1 FROM documents r WHERE r.doc_id < 400 AND r.text = b.text)
        |ORDER BY b.doc_id""".stripMargin,

    // x86 semantic dedup: LSH-bucketed cosine pairs ≥ 0.45 (x51's
    // candidate scheme), transitive closure (x60's recursive reach),
    // keep the min-id representative of each component.
    "x86_semantic_dedup" ->
      s"""WITH RECURSIVE $embCte,
         |$lshBucketCte,
         |pairs AS (
         |  SELECT x.vec_id AS a, y.vec_id AS b
         |  FROM bucketed x JOIN bucketed y
         |    ON x.bucket = y.bucket AND x.vec_id < y.vec_id
         |  WHERE ${cos("x.v", "y.v")} >= 0.45),
         |edges AS (SELECT a, b FROM pairs
         |          UNION ALL SELECT b AS a, a AS b FROM pairs),
         |reach(node, r) AS (
         |  SELECT vec_id, vec_id FROM e
         |  UNION
         |  SELECT reach.node, e2.b FROM reach JOIN edges e2 ON e2.a = reach.r),
         |lab AS (SELECT node, MIN(r) AS cluster FROM reach GROUP BY node)
         |SELECT l.node AS vec_id, emb.label::BIGINT AS label
         |FROM lab l JOIN embeddings emb ON emb.vec_id = l.node
         |WHERE l.cluster = l.node
         |ORDER BY vec_id""".stripMargin,

    // x87 curation pipeline v2: batch rep-dedup ∩ lang ∩ quality ∩
    // reference anti-join ∩ LM-score gate, then the per-source cap —
    // every stage's oracle reused verbatim (x56's policy).
    "x87_curation_pipeline_v2" ->
      s"""WITH rep AS (SELECT MIN(doc_id) AS doc_id FROM documents
         |            WHERE doc_id >= 400 GROUP BY text),
         |l AS ($langIdSql),
         |qs AS ($qualitySql),
         |rt AS (SELECT unnest(string_split(text, ' ')) AS term
         |       FROM documents WHERE doc_id < 400),
         |model AS (SELECT term, COUNT(*)::BIGINT AS c FROM rt GROUP BY term),
         |tot AS (SELECT SUM(c)::DOUBLE AS t, COUNT(*)::DOUBLE AS v FROM model),
         |bt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
         |       FROM documents WHERE doc_id >= 400),
         |tf AS (SELECT doc_id, term, COUNT(*)::BIGINT AS tf
         |       FROM bt GROUP BY doc_id, term),
         |lm AS (SELECT tf.doc_id,
         |         ROUND(-SUM(tf.tf * ln((coalesce(m.c, 0) + 1)::DOUBLE
         |                 / (tot.t + tot.v))) / SUM(tf.tf), 4) AS avg_nll
         |       FROM tf LEFT JOIN model m USING (term) CROSS JOIN tot
         |       GROUP BY tf.doc_id),
         |gated AS (
         |  SELECT d.doc_id, d.source, qs.quality, lm.avg_nll
         |  FROM documents d
         |  JOIN rep ON rep.doc_id = d.doc_id
         |  JOIN l ON l.doc_id = d.doc_id
         |  JOIN qs ON qs.doc_id = d.doc_id
         |  JOIN lm ON lm.doc_id = d.doc_id
         |  WHERE l.pred_lang = 'en' AND qs.quality >= 0.5
         |    AND lm.avg_nll <= 3.41
         |    AND NOT EXISTS (SELECT 1 FROM documents r
         |                    WHERE r.doc_id < 400 AND r.text = d.text)),
         |r AS (SELECT doc_id, source, quality, avg_nll,
         |        ROW_NUMBER() OVER (PARTITION BY source
         |          ORDER BY quality DESC, doc_id) AS rnk
         |      FROM gated)
         |SELECT doc_id, source, quality, avg_nll, rnk FROM r
         |WHERE rnk <= 3 ORDER BY doc_id""".stripMargin,

    // x88 deterministic shard shuffle: shard = first-8-hex-of-md5 mod 8
    // (DuckDB parses hex via '0x'-prefixed cast; Spark via conv(,16,10)
    // — both non-negative, so % ≡ pmod), pos = rank within shard in
    // md5-of-key order.
    "x88_shard_shuffle" ->
      """WITH s AS (
        |  SELECT doc_id, source, md5(doc_id::VARCHAR) AS h,
        |    (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 8) AS shard
        |  FROM documents)
        |SELECT doc_id, shard,
        |  ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) AS pos,
        |  source
        |FROM s ORDER BY doc_id""".stripMargin,

    // x89 Gopher top-2-gram coverage: most frequent 2-gram per doc
    // (ties → lexicographically smallest), frac = cnt·len(gram)/len(text).
    "x89_top_ngram_frac" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    unnest([array_to_string(w[i:i+1], ' ') for i in range(1, len(w))]) AS gram
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) t),
        |c AS (SELECT doc_id, gram, COUNT(*)::BIGINT AS cnt FROM g GROUP BY 1, 2),
        |r AS (SELECT doc_id, gram, cnt,
        |        ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram) AS rn
        |      FROM c)
        |SELECT d.doc_id,
        |  coalesce(r.gram, '') AS top_gram,
        |  coalesce(r.cnt, 0)::BIGINT AS top_count,
        |  CASE WHEN length(d.text) > 0
        |       THEN ROUND(coalesce(r.cnt, 0) * length(coalesce(r.gram, ''))
        |                  / length(d.text)::DOUBLE, 4)
        |       ELSE 0.0 END AS top_frac
        |FROM documents d
        |LEFT JOIN r ON r.doc_id = d.doc_id AND r.rn = 1
        |ORDER BY d.doc_id""".stripMargin,

    // x90 equi-width histogram: both engines bucket in IEEE float64
    // with the same (v-lo)/((hi-lo)/10) expression, max folded into
    // the last bucket.
    "x90_histogram" ->
      """WITH mm AS (SELECT min(l_extendedprice::DOUBLE) AS lo,
        |                   max(l_extendedprice::DOUBLE) AS hi
        |            FROM lineitem)
        |SELECT (CASE WHEN hi = lo THEN 0
        |        ELSE LEAST(floor((l_extendedprice::DOUBLE - lo)
        |                         / ((hi - lo) / 10)), 9) END)::BIGINT AS bucket,
        |  COUNT(*)::BIGINT AS cnt
        |FROM lineitem, mm
        |WHERE l_extendedprice IS NOT NULL
        |GROUP BY 1 ORDER BY bucket""".stripMargin,

    // x91 column profile: one row per column; BIGINT/VARCHAR casts
    // render identically in both engines.
    "x91_profile" ->
      """SELECT * FROM (
        |  SELECT 'doc_id' AS col_name, COUNT(*)::BIGINT AS n_rows,
        |    (COUNT(*) - COUNT(doc_id))::BIGINT AS n_null,
        |    COUNT(DISTINCT doc_id)::BIGINT AS n_distinct,
        |    MIN(doc_id)::VARCHAR AS min_str, MAX(doc_id)::VARCHAR AS max_str
        |  FROM documents
        |  UNION ALL
        |  SELECT 'lang', COUNT(*)::BIGINT, (COUNT(*) - COUNT(lang))::BIGINT,
        |    COUNT(DISTINCT lang)::BIGINT, MIN(lang), MAX(lang) FROM documents
        |  UNION ALL
        |  SELECT 'source', COUNT(*)::BIGINT, (COUNT(*) - COUNT(source))::BIGINT,
        |    COUNT(DISTINCT source)::BIGINT, MIN(source), MAX(source) FROM documents
        |  UNION ALL
        |  SELECT 'n_chars', COUNT(*)::BIGINT, (COUNT(*) - COUNT(n_chars))::BIGINT,
        |    COUNT(DISTINCT n_chars)::BIGINT,
        |    MIN(n_chars)::VARCHAR, MAX(n_chars)::VARCHAR FROM documents
        |) ORDER BY col_name""".stripMargin,

    // x92 join-key skew report: top-5 heaviest user_id keys with share.
    "x92_skew_report" ->
      """WITH c AS (
        |  SELECT coalesce(user_id::VARCHAR, 'NULL') AS key_str,
        |         COUNT(*)::BIGINT AS cnt
        |  FROM events GROUP BY user_id),
        |t AS (SELECT COUNT(*)::DOUBLE AS total FROM events),
        |r AS (SELECT key_str, cnt,
        |        ROW_NUMBER() OVER (ORDER BY cnt DESC, key_str) AS rank
        |      FROM c)
        |SELECT rank, key_str, cnt, ROUND(cnt / total, 4) AS share
        |FROM r, t WHERE rank <= 5 ORDER BY rank""".stripMargin,

    // x93 cross-side embedding near-dup: both sides share the reference
    // planes (ids 10-13 are < 250), so the corpus-wide bucket CTE is
    // reused; the join keeps only batch-x-reference collisions.
    "x93_embedding_neardup_ref" ->
      s"""WITH $embCte,
         |$lshBucketCte
         |SELECT x.vec_id AS a, y.vec_id AS b, ${cos("x.v", "y.v")} AS cos
         |FROM bucketed x JOIN bucketed y ON x.bucket = y.bucket
         |WHERE x.vec_id >= 250 AND y.vec_id < 250
         |  AND ${cos("x.v", "y.v")} >= 0.3
         |ORDER BY a, b""".stripMargin,

    // x94 drop form of x93: batch rows with no embedding match survive.
    "x94_embedding_neardup_drop" ->
      s"""WITH $embCte,
         |$lshBucketCte,
         |dups AS (
         |  SELECT DISTINCT x.vec_id
         |  FROM bucketed x JOIN bucketed y ON x.bucket = y.bucket
         |  WHERE x.vec_id >= 250 AND y.vec_id < 250
         |    AND ${cos("x.v", "y.v")} >= 0.3)
         |SELECT emb.vec_id, emb.label::BIGINT AS label
         |FROM embeddings emb
         |WHERE emb.vec_id >= 250
         |  AND emb.vec_id NOT IN (SELECT vec_id FROM dups)
         |ORDER BY emb.vec_id""".stripMargin,

    // x95 index-probe form of x93 — identical rows by construction,
    // so the oracle is x93's verbatim.
    "x95_embedding_neardup_index" ->
      s"""WITH $embCte,
         |$lshBucketCte
         |SELECT x.vec_id AS a, y.vec_id AS b, ${cos("x.v", "y.v")} AS cos
         |FROM bucketed x JOIN bucketed y ON x.bucket = y.bucket
         |WHERE x.vec_id >= 250 AND y.vec_id < 250
         |  AND ${cos("x.v", "y.v")} >= 0.3
         |ORDER BY a, b""".stripMargin,

    // t50 full-outer join: the side filters force both null sides live
    // (order-less customers AND orphan orders in the 'NONE' segment).
    "t50_full_outer_join" ->
      """SELECT coalesce(c_mktsegment, 'NONE') AS segment,
        |  COUNT(o_orderkey)::BIGINT AS n_orders,
        |  COUNT(*)::BIGINT AS n_rows
        |FROM (SELECT * FROM orders WHERE o_totalprice > 450000) o
        |FULL JOIN (SELECT * FROM customer WHERE c_custkey < 1000) c
        |  ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY segment""".stripMargin,

    // x96 line repetition: both engines derive the same line structure
    // (two words per line via one global regex) then count repeated
    // lines/chars with list functions — set semantics, order-free.
    "x96_line_repetition" ->
      """WITH l AS (
        |  SELECT doc_id,
        |    list_filter(
        |      string_split(
        |        regexp_replace(text, '(\S+ \S+) ', '\1' || chr(10), 'g'),
        |        chr(10)),
        |      x -> length(x) > 0) AS lines
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    len(lines) AS n, len(list_distinct(lines)) AS nd,
        |    coalesce(list_sum(list_transform(lines, x -> length(x))), 0) AS chars,
        |    coalesce(list_sum(list_transform(list_distinct(lines),
        |      x -> length(x))), 0) AS chars_d
        |  FROM l)
        |SELECT doc_id, n::BIGINT AS n_lines,
        |  CASE WHEN n > 0
        |       THEN ROUND((n - nd)::DOUBLE / n, 4) ELSE 0.0 END AS dup_line_frac,
        |  CASE WHEN chars > 0
        |       THEN ROUND((chars - chars_d)::DOUBLE / chars, 4)
        |       ELSE 0.0 END AS dup_char_frac
        |FROM s ORDER BY doc_id""".stripMargin,

    // x97 correlation matrix: Pearson corr is invariant to the n vs
    // n-1 variance convention, so both engines agree to float noise;
    // ROUND(_, 6) both sides.
    "x97_corr_matrix" ->
      """SELECT * FROM (
        |  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
        |    ROUND(corr(l_quantity, l_extendedprice), 6) AS corr FROM lineitem
        |  UNION ALL
        |  SELECT 'l_quantity', 'l_discount',
        |    ROUND(corr(l_quantity, l_discount), 6) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_quantity', 'l_tax',
        |    ROUND(corr(l_quantity, l_tax), 6) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', 'l_discount',
        |    ROUND(corr(l_extendedprice, l_discount), 6) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', 'l_tax',
        |    ROUND(corr(l_extendedprice, l_tax), 6) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', 'l_tax',
        |    ROUND(corr(l_discount, l_tax), 6) FROM lineitem
        |) ORDER BY col_a, col_b""".stripMargin,

    // x98 SCD2: change points via lag over (user, ts, event_id), then
    // validity intervals via lead — same two-window shape as the
    // operator; IS DISTINCT FROM ≡ Spark's null-safe <=> negated.
    "x98_scd2" ->
      """WITH ordered AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER w AS prev,
        |    ROW_NUMBER() OVER w AS rn
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |points AS (
        |  SELECT user_id, event_type, ts AS valid_from, event_id
        |  FROM ordered
        |  WHERE rn = 1 OR event_type IS DISTINCT FROM prev),
        |iv AS (
        |  SELECT user_id, event_type, valid_from,
        |    lead(valid_from) OVER
        |      (PARTITION BY user_id ORDER BY valid_from, event_id) AS valid_to
        |  FROM points)
        |SELECT user_id::BIGINT AS user_id, event_type,
        |  valid_from::DATE AS valid_from, valid_to::DATE AS valid_to,
        |  (valid_to IS NULL) AS is_current
        |FROM iv
        |ORDER BY user_id, valid_from::DATE, event_type, valid_to::DATE
        |""".stripMargin,

    // x99 PageRank: 5 unrolled damped rounds over the symmetrized
    // part–supplier graph — same (1-d)/N + d·Σ r/deg arithmetic in
    // float64; symmetric graph → no dangling mass on either side.
    "x99_pagerank" -> pageRankSql(5),

    // x100 Morton key: the same 16-bit interleave, unrolled to shift/
    // mask/or terms.
    "x100_zorder_key" ->
      s"""SELECT l_partkey::BIGINT AS l_partkey,
         |  l_suppkey::BIGINT AS l_suppkey,
         |  (${zorderTerms("l_partkey::BIGINT", "l_suppkey::BIGINT", 16)})::BIGINT AS zkey
         |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
         |ORDER BY l_partkey, l_suppkey""".stripMargin,

    // t51 grouping sets: detail + a non-rollup-prefix slice + total;
    // money through DECIMAL for exact sums, rendered as float64.
    "t51_grouping_sets" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS cnt,
        |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |  (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin,

    // x101 boilerplate paragraphs: same derived 3-word lines on both
    // sides; a line in >= 5 distinct docs is struck, text rebuilt in
    // original paragraph order.
    "x101_boilerplate_paras" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(
        |      string_split(
        |        regexp_replace(text, '(\S+ \S+ \S+) ', '\1' || chr(10), 'g'),
        |        chr(10)),
        |      x -> length(x) > 0) AS paras
        |  FROM documents),
        |p AS (
        |  SELECT doc_id,
        |    unnest([{'pos': i, 'para': paras[i]}
        |            for i in range(1, len(paras)+1)], recursive := true)
        |  FROM d),
        |b AS (SELECT para FROM p GROUP BY para
        |      HAVING COUNT(DISTINCT doc_id) >= 5),
        |k AS (
        |  SELECT doc_id, string_agg(para, chr(10) ORDER BY pos) AS text,
        |    COUNT(*) AS kept
        |  FROM p WHERE para NOT IN (SELECT para FROM b)
        |  GROUP BY doc_id)
        |SELECT d.doc_id,
        |  coalesce(k.text, '') AS text,
        |  len(d.paras)::BIGINT AS n_paras,
        |  (len(d.paras) - coalesce(k.kept, 0))::BIGINT AS n_dropped
        |FROM d LEFT JOIN k ON d.doc_id = k.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // x102 sequence funnel: greedy earliest chain, one filtered agg per
    // step; CAST(ts AS TIMESTAMP) truncates DuckDB's ns read to the µs
    // precision Spark's parquet reader delivers, so the epoch doubles
    // compare identically.
    "x102_sequence_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(epoch(CAST(ts AS TIMESTAMP))) AS t1
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (
        |  SELECT s1.user_id, s1.t1,
        |    min(CASE WHEN epoch(CAST(e.ts AS TIMESTAMP)) > s1.t1
        |              AND epoch(CAST(e.ts AS TIMESTAMP)) <= s1.t1 + 86400
        |             THEN epoch(CAST(e.ts AS TIMESTAMP)) END) AS t2
        |  FROM s1 LEFT JOIN events e
        |    ON e.user_id = s1.user_id AND e.event_type = 'view'
        |  GROUP BY s1.user_id, s1.t1),
        |s3 AS (
        |  SELECT s2.user_id, s2.t1, s2.t2,
        |    min(CASE WHEN epoch(CAST(e.ts AS TIMESTAMP)) > s2.t2
        |              AND epoch(CAST(e.ts AS TIMESTAMP)) <= s2.t2 + 86400
        |             THEN epoch(CAST(e.ts AS TIMESTAMP)) END) AS t3
        |  FROM s2 LEFT JOIN events e
        |    ON e.user_id = s2.user_id AND e.event_type = 'purchase'
        |  GROUP BY s2.user_id, s2.t1, s2.t2)
        |SELECT user_id, floor(t1)::BIGINT AS step_1,
        |  floor(t2)::BIGINT AS step_2, floor(t3)::BIGINT AS step_3,
        |  ((t1 IS NOT NULL)::INT + (t2 IS NOT NULL)::INT +
        |   (t3 IS NOT NULL)::INT)::BIGINT AS completed
        |FROM s3 ORDER BY user_id""".stripMargin,

    // x103 retention triangle: Monday week truncation on both engines,
    // offsets exact multiples of 7 days.
    "x103_retention_cohorts" ->
      """WITH f AS (
        |  SELECT user_id,
        |    date_trunc('week', min(CAST(ts AS TIMESTAMP))) AS cohort
        |  FROM events GROUP BY user_id),
        |a AS (
        |  SELECT e.user_id, f.cohort,
        |    date_trunc('week', CAST(e.ts AS TIMESTAMP)) AS wk
        |  FROM events e JOIN f ON e.user_id = f.user_id)
        |SELECT cohort::DATE AS cohort_week,
        |  ((wk::DATE - cohort::DATE) / 7)::BIGINT AS week_offset,
        |  COUNT(DISTINCT user_id)::BIGINT AS n_users
        |FROM a GROUP BY cohort, wk ORDER BY cohort_week, week_offset""".stripMargin,

    // x104 incremental boilerplate strike: the list comes from the
    // reference slice only; the batch is struck against it.
    "x104_boilerplate_incremental" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(
        |      string_split(
        |        regexp_replace(text, '(\S+ \S+ \S+) ', '\1' || chr(10), 'g'),
        |        chr(10)),
        |      x -> length(x) > 0) AS paras
        |  FROM documents),
        |p AS (
        |  SELECT doc_id,
        |    unnest([{'pos': i, 'para': paras[i]}
        |            for i in range(1, len(paras)+1)], recursive := true)
        |  FROM d),
        |b AS (SELECT para FROM p WHERE doc_id < 400 GROUP BY para
        |      HAVING COUNT(DISTINCT doc_id) >= 4),
        |k AS (
        |  SELECT doc_id, string_agg(para, chr(10) ORDER BY pos) AS text,
        |    COUNT(*) AS kept
        |  FROM p WHERE doc_id >= 400 AND para NOT IN (SELECT para FROM b)
        |  GROUP BY doc_id)
        |SELECT d.doc_id,
        |  coalesce(k.text, '') AS text,
        |  len(d.paras)::BIGINT AS n_paras,
        |  (len(d.paras) - coalesce(k.kept, 0))::BIGINT AS n_dropped
        |FROM d LEFT JOIN k ON d.doc_id = k.doc_id
        |WHERE d.doc_id >= 400
        |ORDER BY d.doc_id""".stripMargin,

    // x105 PageRank with dominant dangling mass (directed, 3 rounds).
    "x105_pagerank_dangling" -> pageRankDanglingSql(3),
    "x158_ppr" -> pprSql(3),
    "x170_shortest_hops" -> shortestHopsSql(6),
    "x171_principal_component" -> principalComponentSql(2),

    // x106 edit-distance pairs: the oracle is deliberately ALL-PAIRS —
    // matching it proves the Spark-side prefilter lossless.
    "x106_edit_distance_pairs" ->
      """WITH d AS (
        |  SELECT DISTINCT p_name AS s FROM part WHERE p_name IS NOT NULL)
        |SELECT a.s AS a, b.s AS b,
        |  levenshtein(a.s, b.s)::BIGINT AS dist
        |FROM d a JOIN d b ON a.s < b.s AND levenshtein(a.s, b.s) <= 2
        |ORDER BY a, b""".stripMargin,

    // x107 validation contract: one agg row, unpivoted; an
    // unevaluable (NULL) constraint counts as a violation.
    "x107_validation_contract" ->
      """WITH a AS (
        |  SELECT COUNT(*)::DOUBLE AS total,
        |    COUNT(CASE WHEN NOT coalesce(
        |      o_totalprice > 0 AND o_totalprice <= 450000, FALSE)
        |      THEN 1 END)::BIGINT AS v_price,
        |    COUNT(CASE WHEN NOT coalesce(
        |      o_orderstatus IN ('F', 'O', 'P'), FALSE)
        |      THEN 1 END)::BIGINT AS v_status,
        |    COUNT(CASE WHEN NOT coalesce(
        |      regexp_matches(o_orderpriority, '^[1-5]-[A-Z]+$'), FALSE)
        |      THEN 1 END)::BIGINT AS v_prio,
        |    COUNT(CASE WHEN o_orderdate IS NULL THEN 1 END)::BIGINT AS v_date,
        |    (COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey))::BIGINT AS v_uniq
        |  FROM orders)
        |SELECT rule, n_violations, ROUND(n_violations / total, 4) AS frac
        |FROM (
        |  SELECT 'price_in_range' AS rule, v_price AS n_violations, total FROM a
        |  UNION ALL SELECT 'status_known', v_status, total FROM a
        |  UNION ALL SELECT 'priority_shape', v_prio, total FROM a
        |  UNION ALL SELECT 'date_present', v_date, total FROM a
        |  UNION ALL SELECT 'unique_o_orderkey', v_uniq, total FROM a)
        |ORDER BY rule""".stripMargin,

    // Logistic score over the x47 quality features; the z-expression
    // term order mirrors TextAnalysis.classifierQualityFilter exactly
    // (+, ×, / are correctly-rounded so the doubles agree bit-for-bit;
    // exp agrees to <1 ulp — see the operator's determinism note).
    "x108_quality_classifier" ->
      """WITH t AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS w,
        |    LEAST(LENGTH(text)::DOUBLE / 500.0, 1.0) AS len_score,
        |    (LENGTH(text) - LENGTH(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')))::DOUBLE
        |      / GREATEST(LENGTH(text)::DOUBLE, 1.0) AS punct_ratio
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, lang,
        |    ROUND(1.0 / (1.0 + exp(-(-2.0 + 2.5 * len_score +
        |      1.5 * (1.0 - punct_ratio) +
        |      1.5 * (len(list_filter(w, x -> regexp_matches(x, '^[A-Za-z]+$')))::DOUBLE
        |        / GREATEST(len(w)::DOUBLE, 1.0))))), 4) AS ql_score
        |  FROM t)
        |SELECT doc_id, lang, ql_score FROM s
        |WHERE ql_score >= 0.5 ORDER BY doc_id""".stripMargin,

    // Temperature rebalancing: rate = sqrt(n_min/n_lang) (division and
    // sqrt are IEEE correctly-rounded in both engines — this is why the
    // gate pins alpha = 0.5), cutoff = 4-hex-char floor(rate·16^4),
    // survival = the portable md5-prefix filter.
    "x109_temperature_mix" ->
      """WITH c AS (
        |  SELECT lang, COUNT(*)::DOUBLE AS n FROM documents GROUP BY lang),
        |k AS (
        |  SELECT lang, sqrt((SELECT MIN(n) FROM c) / n) AS rate,
        |    printf('%04x', CAST(FLOOR(sqrt((SELECT MIN(n) FROM c) / n) * 65536.0) AS INT)) AS cut
        |  FROM c)
        |SELECT d.doc_id, d.lang, d.source
        |FROM documents d JOIN k USING (lang)
        |WHERE k.rate >= 1.0 OR substr(md5(d.doc_id::VARCHAR), 1, 4) < k.cut
        |ORDER BY d.doc_id""".stripMargin,

    // k-means (k=4, 2 Lloyd's rounds, lowest-id init, centroids
    // quantized to 6 digits between rounds): the assignment expression
    // term order mirrors Similarity.kmeans exactly — both engines'
    // sequential list dot products agree bit-for-bit, and the round-6
    // centroid quantize makes each round's inputs identical doubles,
    // so the argmin (ties → lowest cluster index) cannot diverge.
    "x110_kmeans" ->
      s"""WITH $embCte,
         |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, v AS c
         |       FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 4)),
         |a1 AS (${kmeansAssign("c0")}),
         |c1 AS (${kmeansUpdate("a1", "c0")}),
         |a2 AS (${kmeansAssign("c1")}),
         |c2 AS (${kmeansUpdate("a2", "c1")}),
         |af AS (${kmeansAssign("c2")})
         |SELECT vec_id, cidx::BIGINT AS cluster, ROUND(d, 4) AS dist2
         |FROM af ORDER BY vec_id""".stripMargin,

    // Canonical-doc selection: x60's simhash-pair components, survivor
    // = highest quality (x47's score) with doc_id ascending tie-break.
    "x111_canonical_dedup" ->
      s"""WITH RECURSIVE $simhashFpsCte,
         |edges AS (
         |  SELECT x.doc AS a, y.doc AS b FROM fps x JOIN fps y
         |  ON x.doc <> y.doc AND bit_count(xor(x.fp, y.fp)) <= 2),
         |reach(node, r) AS (
         |  SELECT doc, doc FROM fps
         |  UNION
         |  SELECT reach.node, e.b FROM reach JOIN edges e ON e.a = reach.r),
         |cl AS (SELECT node AS doc_id, MIN(r)::BIGINT AS cluster
         |       FROM reach GROUP BY node),
         |qs AS ($qualitySql),
         |j AS (SELECT cl.cluster, cl.doc_id, qs.quality
         |      FROM cl JOIN qs USING (doc_id)),
         |r AS (SELECT cluster, doc_id, quality,
         |        ROW_NUMBER() OVER (PARTITION BY cluster
         |          ORDER BY quality DESC, doc_id) AS rn,
         |        COUNT(*) OVER (PARTITION BY cluster) AS n_members
         |      FROM j)
         |SELECT cluster, doc_id, quality, n_members::BIGINT AS n_members
         |FROM r WHERE rn = 1 ORDER BY cluster""".stripMargin,

    // Bigram LM, add-one smoothed: P(w2|w1) = (c(w1w2)+1)/(c(w1·)+V),
    // V = reference unigram vocab; context counts derive from the
    // bigram model (so both engines share one definition). Bigrams via
    // positional self-join (pos+1); docs with < 2 tokens drop on both
    // sides (no bigrams → no group).
    "x112_bigram_lm" ->
      """WITH rp AS (
        |  SELECT doc_id, generate_subscripts(w, 1) AS pos, unnest(w) AS tok
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w
        |        FROM documents WHERE doc_id < 400)),
        |rb AS (SELECT a.tok AS w1, b.tok AS w2 FROM rp a JOIN rp b
        |       ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
        |model AS (SELECT w1, w2, COUNT(*)::BIGINT AS c2 FROM rb GROUP BY w1, w2),
        |ctx AS (SELECT w1, SUM(c2)::BIGINT AS c1 FROM model GROUP BY w1),
        |voc AS (SELECT COUNT(DISTINCT tok)::DOUBLE AS v FROM rp),
        |bp AS (
        |  SELECT doc_id, generate_subscripts(w, 1) AS pos, unnest(w) AS tok
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w
        |        FROM documents WHERE doc_id >= 400)),
        |bb AS (SELECT a.doc_id, a.tok AS w1, b.tok AS w2 FROM bp a JOIN bp b
        |       ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
        |tf AS (SELECT doc_id, w1, w2, COUNT(*)::BIGINT AS tf
        |       FROM bb GROUP BY doc_id, w1, w2)
        |SELECT tf.doc_id, SUM(tf.tf)::BIGINT AS n_bigrams,
        |  ROUND(-SUM(tf.tf * ln((coalesce(m.c2, 0) + 1)::DOUBLE
        |      / (coalesce(c.c1, 0)::DOUBLE + voc.v)))
        |    / SUM(tf.tf), 4) AS avg_nll
        |FROM tf
        |LEFT JOIN model m ON tf.w1 = m.w1 AND tf.w2 = m.w2
        |LEFT JOIN ctx c ON tf.w1 = c.w1
        |CROSS JOIN voc
        |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin,

    // SemDeDup, paper prune rule: within-k-means-cluster cosine pairs
    // at 0.4 → connected components (recursive CTE over the symmetric
    // edge closure) → survivor = max rounded dist² (farthest from
    // centroid), tie lowest vec_id. Reuses the x110 kmeans CTEs.
    "x113_semdedup_kmeans" ->
      s"""WITH RECURSIVE $embCte,
         |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, v AS c
         |       FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 4)),
         |a1 AS (${kmeansAssign("c0")}),
         |c1 AS (${kmeansUpdate("a1", "c0")}),
         |a2 AS (${kmeansAssign("c1")}),
         |c2 AS (${kmeansUpdate("a2", "c1")}),
         |af AS (${kmeansAssign("c2")}),
         |ar AS (SELECT vec_id, v, cidx, ROUND(d, 4) AS dist2 FROM af),
         |p AS (SELECT a.vec_id AS pa, b.vec_id AS pb FROM ar a JOIN ar b
         |      ON a.cidx = b.cidx AND a.vec_id < b.vec_id
         |      AND ${cos("a.v", "b.v")} >= 0.4),
         |ed AS (SELECT pa AS ea, pb AS eb FROM p
         |       UNION ALL SELECT pb, pa FROM p),
         |reach(node, r) AS (
         |  SELECT vec_id, vec_id FROM ar
         |  UNION
         |  SELECT reach.node, ed.eb FROM reach JOIN ed ON ed.ea = reach.r),
         |comp AS (SELECT node AS vec_id, MIN(r) AS component
         |         FROM reach GROUP BY node),
         |rk AS (SELECT ar.vec_id, ar.cidx, ar.dist2,
         |         ROW_NUMBER() OVER (PARTITION BY comp.component
         |           ORDER BY ar.dist2 DESC, ar.vec_id) AS rn
         |       FROM ar JOIN comp ON ar.vec_id = comp.vec_id)
         |SELECT vec_id, cidx::BIGINT AS cluster, dist2
         |FROM rk WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    // kNN label consistency: within-kmeans-cluster candidates ranked
    // by rounded cosine (ties → lowest neighbor id), top 5, fraction
    // sharing the row's label. Rows in singleton clusters drop on both
    // sides (inner join, a <> b).
    "x114_knn_label_consistency" ->
      s"""WITH $embLabelCte,
         |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, v AS c
         |       FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 4)),
         |a1 AS (${kmeansAssign("c0")}),
         |c1 AS (${kmeansUpdate("a1", "c0")}),
         |a2 AS (${kmeansAssign("c1")}),
         |c2 AS (${kmeansUpdate("a2", "c1")}),
         |af AS (${kmeansAssign("c2")}),
         |ar AS (SELECT af.vec_id, e.label::BIGINT AS label, af.v, af.cidx
         |       FROM af JOIN e USING (vec_id)),
         |cand AS (
         |  SELECT a.vec_id, a.label, b.label AS b_label,
         |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
         |      ORDER BY ${cos("a.v", "b.v")} DESC, b.vec_id) AS rn
         |  FROM ar a JOIN ar b ON a.cidx = b.cidx AND a.vec_id <> b.vec_id)
         |SELECT vec_id, label, COUNT(*)::BIGINT AS n_neighbors,
         |  ROUND(AVG(CASE WHEN b_label = label THEN 1.0 ELSE 0.0 END), 4)
         |    AS frac_same
         |FROM cand WHERE rn <= 5
         |GROUP BY vec_id, label ORDER BY vec_id""".stripMargin,

    // Forecasting tier (x115-x119) shares the decimal-exact daily
    // demand series CTE below; all double math downstream consumes
    // identical decimal->double casts, so engines agree to float
    // noise and ROUND settles the rest.
    "x115_gap_fill" ->
      s"""WITH $dailyCte,
         |led AS (SELECT user_id, day AS d0, demand,
         |  lead(day) OVER (PARTITION BY user_id ORDER BY day) AS nxt
         |  FROM daily),
         |gen AS (SELECT user_id, d0, demand,
         |  CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
         |    CAST(COALESCE(nxt - 1, d0) AS TIMESTAMP),
         |    INTERVAL 1 DAY)) AS DATE) AS day
         |  FROM led)
         |SELECT user_id, day, ROUND(CAST(demand AS DOUBLE), 2) AS demand,
         |  CAST(CASE WHEN day <> d0 THEN 1 ELSE 0 END AS BIGINT) AS is_gap
         |FROM gen ORDER BY user_id, day""".stripMargin,

    // adi/cv2 are rounded BEFORE the quadrant compare on both engines,
    // so the class label is a function of the portable rounded values.
    "x116_demand_classes" ->
      s"""WITH $dailyCte,
         |agg AS (SELECT user_id, COUNT(*) AS nz,
         |  date_diff('day', MIN(day), MAX(day)) + 1 AS span,
         |  AVG(CAST(demand AS DOUBLE)) AS mean,
         |  var_samp(CAST(demand AS DOUBLE)) AS vr
         |  FROM daily GROUP BY 1),
         |r AS (SELECT user_id, nz, span,
         |  ROUND(CAST(span AS DOUBLE) / nz, 4) AS adi,
         |  ROUND(vr / (mean * mean), 4) AS cv2
         |  FROM agg)
         |SELECT user_id, nz AS demand_days, CAST(span AS BIGINT) AS span_days,
         |  adi, cv2,
         |  CASE WHEN cv2 IS NULL THEN 'n/a'
         |       WHEN adi < 1.32 AND cv2 < 0.49 THEN 'smooth'
         |       WHEN adi >= 1.32 AND cv2 < 0.49 THEN 'intermittent'
         |       WHEN adi < 1.32 THEN 'erratic'
         |       ELSE 'lumpy' END AS demand_class
         |FROM r ORDER BY user_id""".stripMargin,

    // The zero-filled dense series comes from the same explode-own-gap
    // construction as the Spark plan: each observed row generates
    // [day, next-1] (the last row extends to the global max), value y
    // is the observed demand on its own day and 0.0 in the gap.
    "x117_scaled_error" ->
      s"""WITH $dailyCte,
         |b AS (SELECT MAX(day) AS gmax, MAX(day) - 7 AS splitd FROM daily),
         |led AS (SELECT user_id, day AS d0, demand,
         |  lead(day) OVER (PARTITION BY user_id ORDER BY day) AS nxt
         |  FROM daily),
         |dense AS (SELECT user_id, d0, demand,
         |  CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
         |    CAST(COALESCE(nxt - 1, (SELECT gmax FROM b)) AS TIMESTAMP),
         |    INTERVAL 1 DAY)) AS DATE) AS day
         |  FROM led),
         |ser AS (SELECT user_id, day,
         |  CASE WHEN day = d0 THEN CAST(demand AS DOUBLE) ELSE 0.0 END AS y
         |  FROM dense),
         |fc AS (SELECT user_id, day, y,
         |  COALESCE(MAX(CASE WHEN day = (SELECT splitd FROM b) THEN y END)
         |    OVER (PARTITION BY user_id), 0.0) AS f,
         |  lag(y) OVER (PARTITION BY user_id ORDER BY day) AS prev
         |  FROM ser),
         |pk AS (SELECT user_id,
         |  AVG(CASE WHEN day <= (SELECT splitd FROM b)
         |      THEN (y - prev) * (y - prev) END) AS sc,
         |  AVG(CASE WHEN day > (SELECT splitd FROM b)
         |      THEN (y - f) * (y - f) END) AS mse,
         |  SUM(CASE WHEN day <= (SELECT splitd FROM b)
         |       AND day > (SELECT splitd FROM b) - 28 THEN y END) AS wsum
         |  FROM fc GROUP BY 1)
         |SELECT user_id,
         |  ROUND(CASE WHEN sc > 0 THEN sqrt(mse / sc) END, 4) AS rmsse,
         |  ROUND(wsum / (SELECT SUM(wsum) FROM pk), 6) + 0.0 AS weight
         |FROM pk ORDER BY user_id""".stripMargin,

    "x118_cdc_apply" ->
      """WITH r AS (SELECT user_id, event_type, value, ts,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_type, value, epoch_us(ts) AS ts_us
        |FROM r WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin,

    // x is the day offset from the corpus' first day (1-row origin):
    // centering keeps the intercept at value magnitude instead of
    // amplifying slope noise by the ~2e4 epoch-day offset.
    "x119_linear_trend" ->
      s"""WITH $dailyCte
         |SELECT user_id, COUNT(*) AS n_days,
         |  ROUND(regr_slope(CAST(demand AS DOUBLE),
         |    CAST(date_diff('day', (SELECT MIN(day) FROM daily), day)
         |      AS DOUBLE)), 6) + 0.0 AS slope,
         |  ROUND(regr_intercept(CAST(demand AS DOUBLE),
         |    CAST(date_diff('day', (SELECT MIN(day) FROM daily), day)
         |      AS DOUBLE)), 6) + 0.0 AS intercept,
         |  ROUND(regr_r2(CAST(demand AS DOUBLE),
         |    CAST(date_diff('day', (SELECT MIN(day) FROM daily), day)
         |      AS DOUBLE)), 6) + 0.0 AS r2
         |FROM daily GROUP BY 1 ORDER BY user_id""".stripMargin,

    "x120_equidepth_hist" ->
      """WITH r AS (SELECT o_totalprice,
        |  ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
        |  FROM orders)
        |SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n,
        |  MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        |FROM r GROUP BY 1 ORDER BY bucket""".stripMargin,

    // zscore rounds before the |z| > 2 compare on both engines (the
    // flag is a function of the portable rounded value); + 0.0 settles
    // DuckDB's IEEE round of tiny negatives to -0.0.
    "x121_rolling_zscore" ->
      """WITH r AS (SELECT event_id, user_id, value,
        |  COUNT(value) OVER w AS c,
        |  AVG(value) OVER w AS m,
        |  stddev_samp(value) OVER w AS sd
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)),
        |z AS (SELECT event_id, user_id,
        |  ROUND(CASE WHEN c = 10 AND sd > 0 THEN (value - m) / sd END, 4)
        |    + 0.0 AS zscore
        |  FROM r)
        |SELECT event_id, user_id, zscore,
        |  CASE WHEN zscore IS NOT NULL
        |       THEN CAST(CASE WHEN ABS(zscore) > 2.0 THEN 1 ELSE 0 END
        |         AS BIGINT) END AS is_anomaly
        |FROM z ORDER BY event_id""".stripMargin,

    // exp = (CAST(ra AS DOUBLE) * cb) / n in the SAME operation order
    // as the Spark plan, so the cell terms agree to float noise. The
    // sum runs over the full r×c marginal grid (absent combinations
    // are zero cells that still owe (0-exp)^2/exp).
    "x122_chi_square" ->
      """WITH cells AS (SELECT lang AS a, source AS b, COUNT(*) AS o
        |  FROM documents GROUP BY 1, 2),
        |rt AS (SELECT a, SUM(o) AS ra FROM cells GROUP BY 1),
        |ct AS (SELECT b, SUM(o) AS cb FROM cells GROUP BY 1),
        |t AS (SELECT SUM(o) AS n, COUNT(DISTINCT a) AS r,
        |  COUNT(DISTINCT b) AS c FROM cells),
        |grid AS (SELECT a, b, ra, cb, COALESCE(o, 0) AS o
        |  FROM rt CROSS JOIN ct LEFT JOIN cells USING (a, b))
        |SELECT
        |  ROUND(SUM((o - CAST(ra AS DOUBLE) * cb / n)
        |          * (o - CAST(ra AS DOUBLE) * cb / n)
        |          / (CAST(ra AS DOUBLE) * cb / n)), 4) AS chi2,
        |  CAST((MAX(r) - 1) * (MAX(c) - 1) AS BIGINT) AS dof,
        |  CAST(MAX(n) AS BIGINT) AS n
        |FROM grid CROSS JOIN t
        |ORDER BY chi2""".stripMargin,

    // The two carried columns null out on the SAME rows (one shared
    // channel predicate), so independent last_value calls stay
    // consistent — no struct carry needed.
    "x123_attribution" ->
      """WITH r AS (SELECT event_id, user_id, ts, event_type,
        |  last_value(CASE WHEN event_type IN ('click', 'view')
        |    THEN epoch_us(ts) END IGNORE NULLS) OVER w AS tts,
        |  last_value(CASE WHEN event_type IN ('click', 'view')
        |    THEN event_type END IGNORE NULLS) OVER w AS ttype
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id,
        |  CASE WHEN epoch_us(ts) - tts <= 3600000000 THEN ttype END
        |    AS channel,
        |  CASE WHEN epoch_us(ts) - tts <= 3600000000
        |    THEN epoch_us(ts) - tts END AS gap_us
        |FROM r WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    // Kaplan-Meier: product-limit survival as exp of a running ln-sum
    // (the portable cumulative product); non-positive factors never
    // enter the sum and the running-min guard zeroes rows at/after an
    // everyone-churns duration, mirroring the Spark formulation
    // exactly (Spark ln(0) = NULL, DuckDB -inf — both paths dodged).
    "x132_kaplan_meier" ->
      """WITH pu AS (SELECT user_id,
        |  CAST(date_trunc('day', MIN(ts)) AS DATE) AS firstd,
        |  CAST(date_trunc('day', MAX(ts)) AS DATE) AS lastd
        |  FROM events GROUP BY 1),
        |g AS (SELECT CAST(date_trunc('day', MAX(ts)) AS DATE) AS gmax
        |  FROM events),
        |lt AS (SELECT
        |  CAST(date_diff('day', firstd, lastd) AS BIGINT) AS dur,
        |  CAST(date_diff('day', lastd, gmax) >= 3 AS BIGINT) AS ev
        |  FROM pu CROSS JOIN g),
        |bd AS (SELECT dur, COUNT(*) AS n, SUM(ev) AS d FROM lt GROUP BY 1),
        |r AS (SELECT dur, n, d,
        |  (SELECT COUNT(*) FROM lt)
        |    - COALESCE(SUM(n) OVER (ORDER BY dur
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS risk
        |  FROM bd),
        |f AS (SELECT dur, risk, d,
        |  1.0 - CAST(d AS DOUBLE) / risk AS fac FROM r)
        |SELECT dur AS duration_days, CAST(risk AS BIGINT) AS n_risk,
        |  CAST(d AS BIGINT) AS n_events,
        |  ROUND(CASE WHEN MIN(fac) OVER w <= 0 THEN 0.0
        |    ELSE exp(SUM(CASE WHEN fac > 0 THEN ln(fac) END) OVER w)
        |    END, 6) AS survival
        |FROM f
        |WINDOW w AS (ORDER BY dur
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY duration_days""".stripMargin,

    // ROC AUC via rank-sum: every intermediate is an integer count or
    // an exact multiple of 0.5 (midranks), so the sums are order-free
    // and the one float division at the end is engine-portable.
    "x133_roc_auc" ->
      """WITH s AS (SELECT value AS sc,
        |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL),
        |g AS (SELECT sc, COUNT(*) AS n, SUM(y) AS p FROM s GROUP BY 1),
        |r AS (SELECT p,
        |  COALESCE(SUM(n) OVER (ORDER BY sc
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + (n + 1) / 2.0 AS midrank
        |  FROM g),
        |a AS (SELECT SUM(p * midrank) AS rs, SUM(p) AS np,
        |  (SELECT COUNT(*) FROM s) AS nt FROM r)
        |SELECT CAST(np AS BIGINT) AS n_pos,
        |  CAST(nt - np AS BIGINT) AS n_neg,
        |  ROUND(CASE WHEN np > 0 AND nt > np
        |    THEN (rs - np * (np + 1) / 2.0) / (np * (nt - np)) END, 6)
        |    AS auc
        |FROM a""".stripMargin,

    // KS: the max ECDF gap's numerator stays in exact integers
    // (|ca·Tb − cb·Ta|); one division at the end.
    "x134_ks_drift" ->
      """WITH s AS (SELECT value AS v,
        |  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a,
        |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS b
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL),
        |g AS (SELECT v, SUM(a) AS na, SUM(b) AS nb FROM s GROUP BY 1),
        |c AS (SELECT
        |  SUM(na) OVER w AS ca, SUM(nb) OVER w AS cb,
        |  SUM(na) OVER () AS ta, SUM(nb) OVER () AS tb
        |  FROM g WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT CAST(MAX(ta) AS BIGINT) AS n_a,
        |  CAST(MAX(tb) AS BIGINT) AS n_b,
        |  ROUND(CASE WHEN MAX(ta) > 0 AND MAX(tb) > 0
        |    THEN CAST(MAX(ABS(ca * tb - cb * ta)) AS DOUBLE)
        |      / (MAX(ta) * MAX(tb)) END, 6) AS d_stat
        |FROM c""".stripMargin,

    // PSI: bins from the BASELINE's deciles via EXACT rank-arithmetic
    // decimal interpolation (r12: no float quantile kernel on either
    // engine); cutoffs compare at their decimal value.
    "x135_psi_drift" ->
      s"""WITH b AS (SELECT CAST(o_totalprice AS DOUBLE) AS v,
         |  CASE WHEN o_orderdate < DATE '1998-01-01' THEN 1 ELSE 0 END
         |    AS isb,
         |  CASE WHEN o_orderdate >= DATE '1998-01-01' THEN 1 ELSE 0 END
         |    AS isc
         |  FROM orders WHERE o_totalprice IS NOT NULL),
         |${exactQuantileCtes("(SELECT v FROM b WHERE isb = 1) bsrc",
             Seq(), "v",
             (1 to 9).map(i => s"c$i" -> i * 100), 6, "d")},
         |bn AS (SELECT 1
         |  + CAST(v > c1 AS INT) + CAST(v > c2 AS INT)
         |  + CAST(v > c3 AS INT) + CAST(v > c4 AS INT)
         |  + CAST(v > c5 AS INT) + CAST(v > c6 AS INT)
         |  + CAST(v > c7 AS INT) + CAST(v > c8 AS INT)
         |  + CAST(v > c9 AS INT) AS bin, isb, isc
         |  FROM b CROSS JOIN dq),
        |g AS (SELECT bin, SUM(isb) AS nb, SUM(isc) AS nc
        |  FROM bn GROUP BY 1),
        |t AS (SELECT CAST(SUM(nb) AS DOUBLE) AS tb,
        |  CAST(SUM(nc) AS DOUBLE) AS tc FROM g)
        |SELECT CAST(bin AS BIGINT) AS bin, CAST(nb AS BIGINT) AS n_base,
        |  CAST(nc AS BIGINT) AS n_cur,
        |  ROUND((GREATEST(nc / tc, 1e-6) - GREATEST(nb / tb, 1e-6))
        |    * (LN(GREATEST(nc / tc, 1e-6)) - LN(GREATEST(nb / tb, 1e-6))),
        |    6) AS psi_term
        |FROM g CROSS JOIN t ORDER BY bin""".stripMargin,

    // Gini: moment sums in DECIMAL — exact and order-free on both
    // engines — then one float division; rank via the same
    // (value, custkey) total order the Spark zipWithIndex path sorts.
    "x136_gini" ->
      """WITH spend AS (SELECT o_custkey,
        |  SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
        |  FROM orders GROUP BY 1),
        |x AS (SELECT CAST(spend AS DECIMAL(28,6)) AS x,
        |  ROW_NUMBER() OVER (ORDER BY spend, o_custkey) AS i
        |  FROM spend),
        |a AS (SELECT COUNT(*) AS n, SUM(x) AS s, SUM(i * x) AS ws
        |  FROM x)
        |SELECT CAST(n AS BIGINT) AS n,
        |  ROUND(CAST(s AS DOUBLE), 2) AS total,
        |  ROUND(CASE WHEN n > 0 AND s > 0
        |    THEN 2.0 * CAST(ws AS DOUBLE) / (n * CAST(s AS DOUBLE))
        |      - (n + 1) / CAST(n AS DOUBLE) END, 6) AS gini
        |FROM a""".stripMargin,

    // Sessionization: session starts where the user's gap exceeds 30
    // min; seq = running sum of start flags; all time math in exact
    // epoch micros (epoch_us ≡ Spark unix_micros, the x123 parity).
    "x137_sessions" ->
      """WITH g AS (SELECT user_id, ts, event_id,
        |  epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |m AS (SELECT user_id, ts,
        |  SUM(CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0
        |    END) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS session_seq
        |  FROM g)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  CAST(MIN(epoch_us(ts)) AS BIGINT) AS start_us,
        |  CAST(MAX(epoch_us(ts)) AS BIGINT) AS end_us,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS BIGINT)
        |    AS duration_us
        |FROM m GROUP BY 1, 2 ORDER BY user_id, session_seq""".stripMargin,

    // PMI: the ln argument is ONE left-associated double expression
    // (((n_ab·nu)·nu)/((nb·ca)·cb)) on both engines; top-k on the
    // ROUNDED score, ties by pair. Bigrams via the x112 positional
    // self-join; unigram counts include single-token docs on both
    // sides.
    "x138_pmi_collocations" ->
      """WITH tp AS (SELECT doc_id, generate_subscripts(w, 1) AS pos,
        |  unnest(w) AS tok
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w
        |        FROM documents)),
        |uc AS (SELECT tok, COUNT(*) AS cu FROM tp GROUP BY 1),
        |nu AS (SELECT CAST(SUM(cu) AS DOUBLE) AS nu FROM uc),
        |bg AS (SELECT a.tok AS w1, b.tok AS w2 FROM tp a JOIN tp b
        |       ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
        |bc AS (SELECT w1, w2, COUNT(*) AS n_ab FROM bg GROUP BY 1, 2),
        |nb AS (SELECT CAST(SUM(n_ab) AS DOUBLE) AS nb FROM bc),
        |p AS (SELECT w1, w2, n_ab,
        |    ROUND(LN(CAST(n_ab AS DOUBLE) * nu.nu * nu.nu
        |      / (nb.nb * a.cu * b.cu)), 4) AS pmi
        |  FROM bc JOIN uc a ON bc.w1 = a.tok JOIN uc b ON bc.w2 = b.tok
        |  CROSS JOIN nu CROSS JOIN nb
        |  WHERE n_ab >= 5),
        |top AS (SELECT * FROM p ORDER BY pmi DESC, w1, w2 LIMIT 50)
        |SELECT w1, w2, CAST(n_ab AS BIGINT) AS n_ab, pmi FROM top
        |ORDER BY w1, w2""".stripMargin,

    // Seasonal decomposition: trend ROUNDs to 6 dp BEFORE detrending
    // (engine-identical doubles downstream); weekday is Mon=0
    // (isodow-1 ≡ Spark weekday, the t18 parity); edge days with no
    // full 7-day window keep NULL trend/resid like pandas.
    "x139_seasonal_decompose" ->
      s"""WITH $decomposeCtes
         |SELECT dw.user_id, dw.day, ROUND(y, 2) AS y,
         |  ROUND(trend, 4) AS trend,
         |  ROUND(seasonal, 4) AS seasonal,
         |  ROUND(y - trend - seasonal, 4) AS resid
         |FROM dw JOIN se ON dw.user_id = se.user_id AND dw.dow = se.dow
         |ORDER BY dw.user_id, dw.day""".stripMargin,

    // Changepoint scan: prefix sums in DECIMAL (exact, order-free),
    // ONE double division per mean, argmax on the ROUNDED statistic
    // with the earliest day winning ties.
    "x140_changepoint" ->
      s"""WITH $dailyCte,
         |led AS (SELECT user_id, day AS d0, demand,
         |  lead(day) OVER (PARTITION BY user_id ORDER BY day) AS nxt
         |  FROM daily),
         |dense AS (SELECT user_id, d0, demand,
         |  CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
         |    CAST(COALESCE(nxt - 1, d0) AS TIMESTAMP),
         |    INTERVAL 1 DAY)) AS DATE) AS day
         |  FROM led),
         |ser AS (SELECT user_id, day,
         |  CASE WHEN day = d0 THEN CAST(demand AS DECIMAL(28,6))
         |    ELSE CAST(0 AS DECIMAL(28,6)) END AS y
         |  FROM dense),
         |sc AS (SELECT user_id, day,
         |  SUM(y) OVER wc AS ca, COUNT(*) OVER wc AS t,
         |  SUM(y) OVER wa AS s, COUNT(*) OVER wa AS n
         |  FROM ser
         |  WINDOW wc AS (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |  wa AS (PARTITION BY user_id)),
         |f AS (SELECT user_id, day,
         |  CAST(ca AS DOUBLE) / t AS ml,
         |  CAST(s - ca AS DOUBLE) / (n - t) AS mr, t, n
         |  FROM sc WHERE t >= 7 AND t <= n - 7),
         |r AS (SELECT user_id, day,
         |  CAST(ROUND(CAST(ml AS DECIMAL(18,8)), 4) AS DOUBLE)
         |    AS mean_left,
         |  CAST(ROUND(CAST(mr AS DECIMAL(18,8)), 4) AS DOUBLE)
         |    AS mean_right,
         |  CAST(ROUND(CAST(ABS(ml - mr)
         |    * SQRT(CAST(t * (n - t) AS DOUBLE) / n) AS DECIMAL(18,8)),
         |    4) AS DOUBLE) AS stat,
         |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY
         |    ROUND(CAST(ABS(ml - mr)
         |      * SQRT(CAST(t * (n - t) AS DOUBLE) / n) AS DECIMAL(18,8)),
         |      4) DESC, day) AS rn
         |  FROM f)
         |SELECT user_id, day AS split_day, mean_left, mean_right, stat
         |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // Clustering coefficient: x129's orientation CTEs with the wedge
    // CENTER carried through; each closed triangle credits its three
    // corners; coeff stabilized through DECIMAL(18,8) (the x140
    // boundary contract — 2T/(d(d−1)) is rational).
    "x141_clustering_coeff" ->
      """WITH oi AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i
        |  FROM lineitem),
        |e0 AS (SELECT l.i AS x, r.i AS y
        |  FROM oi l JOIN oi r ON l.o = r.o AND l.i < r.i
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |canon AS (SELECT DISTINCT
        |    least(CAST(x AS VARCHAR), CAST(y AS VARCHAR)) AS a,
        |    greatest(CAST(x AS VARCHAR), CAST(y AS VARCHAR)) AS b
        |  FROM e0 WHERE CAST(x AS VARCHAR) <> CAST(y AS VARCHAR)),
        |deg AS (SELECT n, COUNT(*) AS d FROM (
        |    SELECT a AS n FROM canon UNION ALL SELECT b FROM canon)
        |  GROUP BY 1),
        |ori AS (SELECT
        |    CASE WHEN (da.d, c.a) < (db.d, c.b) THEN c.a ELSE c.b END AS u,
        |    CASE WHEN (da.d, c.a) < (db.d, c.b) THEN c.b ELSE c.a END AS v
        |  FROM canon c JOIN deg da ON c.a = da.n JOIN deg db ON c.b = db.n),
        |wed AS (SELECT e1.u AS u, e1.v AS wa, e2.v AS wb
        |  FROM ori e1 JOIN ori e2 ON e1.u = e2.u AND e1.v < e2.v),
        |tri0 AS (SELECT u, wa, wb FROM wed
        |  WHERE EXISTS (SELECT 1 FROM canon
        |                WHERE a = wed.wa AND b = wed.wb)),
        |nt AS (SELECT n, COUNT(*) AS tri FROM (
        |    SELECT u AS n FROM tri0 UNION ALL SELECT wa FROM tri0
        |    UNION ALL SELECT wb FROM tri0) GROUP BY 1)
        |SELECT deg.n AS node, CAST(d AS BIGINT) AS degree,
        |  CAST(COALESCE(tri, 0) AS BIGINT) AS n_triangles,
        |  CASE WHEN d >= 2 THEN CAST(ROUND(CAST(
        |    2.0 * COALESCE(tri, 0) / (d * (d - 1))
        |    AS DECIMAL(18,8)), 4) AS DOUBLE) END AS coeff
        |FROM deg LEFT JOIN nt ON deg.n = nt.n ORDER BY node""".stripMargin,

    // Welch's t: per-side moments from ONE conditional aggregate; the
    // t/dof expressions mirror the Spark association exactly (sa, sb
    // named once in a CTE), and stabilize via DECIMAL(18,8).
    "x142_welch_ttest" ->
      """WITH s AS (SELECT value AS v,
        |  event_type = 'click' AS ia, event_type = 'purchase' AS ib
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL),
        |a AS (SELECT
        |  COUNT(CASE WHEN ia THEN 1 END) AS na,
        |  AVG(CASE WHEN ia THEN v END) AS ma,
        |  VAR_SAMP(CASE WHEN ia THEN v END) AS va,
        |  COUNT(CASE WHEN ib THEN 1 END) AS nb,
        |  AVG(CASE WHEN ib THEN v END) AS mb,
        |  VAR_SAMP(CASE WHEN ib THEN v END) AS vb
        |  FROM s),
        |m AS (SELECT na, nb, ma, mb, va / na AS sa, vb / nb AS sb FROM a)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  CAST(ROUND(CAST(
        |    CASE WHEN na >= 2 AND nb >= 2 AND sa + sb > 0
        |      THEN (ma - mb) / SQRT(sa + sb) END
        |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS t_stat,
        |  CAST(ROUND(CAST(
        |    CASE WHEN na >= 2 AND nb >= 2 AND sa > 0 AND sb > 0
        |      THEN (sa + sb) * (sa + sb)
        |        / (sa * sa / (na - 1) + sb * sb / (nb - 1)) END
        |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS dof
        |FROM m""".stripMargin,

    // Markov transitions: one lead window per user, counts collapse to
    // type² rows; prob stabilized via DECIMAL(18,8).
    "x143_markov_transitions" ->
      """WITH p AS (SELECT event_type AS from_type,
        |  lead(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |g AS (SELECT from_type, to_type, COUNT(*) AS n FROM p
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, to_type, n,
        |  SUM(n) OVER (PARTITION BY from_type) AS tot FROM g)
        |SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
        |  CAST(ROUND(CAST(CAST(n AS DOUBLE) / tot AS DECIMAL(18,8)), 6)
        |    AS DOUBLE) AS prob
        |FROM t ORDER BY from_type, to_type""".stripMargin,

    // ABC/Pareto: exact decimal revenue + running total; the share
    // rounds through DECIMAL(18,8) BEFORE the class thresholds.
    "x144_abc_pareto" ->
      """WITH pk AS (SELECT l_partkey AS key,
        |  SUM(ROUND(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(28,6)), 2)) AS rev
        |  FROM lineitem GROUP BY 1),
        |w AS (SELECT key, rev,
        |  SUM(rev) OVER (ORDER BY rev DESC, key
        |    ROWS UNBOUNDED PRECEDING) AS cum,
        |  SUM(rev) OVER () AS tot FROM pk),
        |s AS (SELECT key, rev,
        |  ROUND(CAST(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE)
        |    AS DECIMAL(18,8)), 6) AS sh FROM w)
        |SELECT key, ROUND(CAST(rev AS DOUBLE), 2) AS revenue,
        |  CAST(sh AS DOUBLE) AS cum_share,
        |  CASE WHEN sh <= 0.8 THEN 'A' WHEN sh <= 0.95 THEN 'B'
        |    ELSE 'C' END AS abc_class
        |FROM s ORDER BY key""".stripMargin,

    // Cohort LTV: month index = year·12 + month (exact integers);
    // revenue in DECIMAL(28,2); cum_ltv via DECIMAL(18,8).
    "x145_cohort_ltv" ->
      """WITH fm AS (SELECT o_custkey AS c,
        |  MIN(year(o_orderdate) * 12 + month(o_orderdate)) AS m0
        |  FROM orders GROUP BY 1),
        |cs AS (SELECT m0, COUNT(*) AS cohort_n FROM fm GROUP BY 1),
        |f AS (SELECT fm.m0,
        |  (year(o_orderdate) * 12 + month(o_orderdate)) - fm.m0 AS moff,
        |  COUNT(DISTINCT o_custkey) AS active_customers,
        |  SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS rev
        |  FROM orders JOIN fm ON o_custkey = fm.c GROUP BY 1, 2),
        |w AS (SELECT m0, moff, active_customers, rev,
        |  SUM(rev) OVER (PARTITION BY m0 ORDER BY moff
        |    ROWS UNBOUNDED PRECEDING) AS cum FROM f)
        |SELECT printf('%04d-%02d', (m0 - 1) // 12, (m0 - 1) % 12 + 1)
        |    AS cohort_month,
        |  CAST(moff AS BIGINT) AS month_offset,
        |  cs.cohort_n AS cohort_size, active_customers,
        |  ROUND(CAST(rev AS DOUBLE), 2) AS revenue,
        |  CAST(ROUND(CAST(CAST(cum AS DOUBLE) / CAST(cs.cohort_n AS DOUBLE)
        |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS cum_ltv
        |FROM w JOIN cs USING (m0)
        |ORDER BY cohort_month, month_offset""".stripMargin,

    // Item-item cosine: n_ab/sqrt(n_a·n_b) on exact integer counts
    // (sqrt is correctly rounded — identical doubles on both engines).
    "x146_item_cosine" ->
      """WITH oi AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i
        |  FROM lineitem),
        |pairs AS (SELECT l.i AS item_a, r.i AS item_b, COUNT(*) AS n_ab
        |  FROM oi l JOIN oi r ON l.o = r.o AND l.i < r.i
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |ic AS (SELECT i, COUNT(*) AS n FROM oi GROUP BY 1),
        |sc AS (SELECT item_a, item_b, n_ab,
        |  ROUND(n_ab / SQRT(CAST(a.n AS DOUBLE) * b.n), 6) AS cosine
        |  FROM pairs JOIN ic a ON pairs.item_a = a.i
        |    JOIN ic b ON pairs.item_b = b.i),
        |top AS (SELECT * FROM sc
        |  ORDER BY cosine DESC, item_a, item_b LIMIT 100)
        |SELECT * FROM top ORDER BY item_a, item_b""".stripMargin,

    // Resource-allocation link prediction on the support-≥2 co-purchase
    // graph: each 1/deg term is one IEEE division cast to
    // DECIMAL(18,10), summed exactly — no float-order dependence.
    "x147_link_prediction" ->
      """WITH oi AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i
        |  FROM lineitem),
        |e0 AS (SELECT l.i AS x, r.i AS y
        |  FROM oi l JOIN oi r ON l.o = r.o AND l.i < r.i
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |canon AS (SELECT DISTINCT
        |    least(CAST(x AS VARCHAR), CAST(y AS VARCHAR)) AS a,
        |    greatest(CAST(x AS VARCHAR), CAST(y AS VARCHAR)) AS b
        |  FROM e0 WHERE CAST(x AS VARCHAR) <> CAST(y AS VARCHAR)),
        |adj AS (SELECT a AS z, b AS nb FROM canon
        |  UNION ALL SELECT b, a FROM canon),
        |deg AS (SELECT z, COUNT(*) AS d FROM adj GROUP BY 1),
        |ctr AS (SELECT adj.z, adj.nb, deg.d FROM adj JOIN deg USING (z)),
        |wed AS (SELECT l.nb AS x, r.nb AS y, COUNT(*) AS n_common,
        |  SUM(CAST(CAST(1.0 AS DOUBLE) / l.d AS DECIMAL(18,10))) AS ra
        |  FROM ctr l JOIN ctr r ON l.z = r.z AND l.nb < r.nb
        |  GROUP BY 1, 2),
        |nonadj AS (SELECT * FROM wed WHERE NOT EXISTS
        |  (SELECT 1 FROM canon WHERE a = wed.x AND b = wed.y)),
        |top AS (SELECT x AS node_a, y AS node_b, n_common,
        |  ROUND(CAST(ra AS DOUBLE), 6) AS ra_score
        |  FROM nonadj ORDER BY ra_score DESC, node_a, node_b LIMIT 100)
        |SELECT * FROM top ORDER BY node_a, node_b""".stripMargin,

    // Spearman: midranks from distinct-value cumulative windows (the
    // rocAuc machinery per side); moment sums exact in DECIMAL(28,6),
    // cast to double ONCE, then one shared float expression.
    "x148_spearman" ->
      """WITH raw AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
        |  CAST(l_extendedprice AS DOUBLE) AS y FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |gx AS (SELECT x, COUNT(*) AS n FROM raw GROUP BY 1),
        |rx AS (SELECT x, COALESCE(SUM(n) OVER (ORDER BY x
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + (n + 1) / 2.0 AS rnk FROM gx),
        |gy AS (SELECT y, COUNT(*) AS n FROM raw GROUP BY 1),
        |ry AS (SELECT y, COALESCE(SUM(n) OVER (ORDER BY y
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + (n + 1) / 2.0 AS rnk FROM gy),
        |j AS (SELECT rx.rnk AS rkx, ry.rnk AS rky
        |  FROM raw JOIN rx ON raw.x = rx.x JOIN ry ON raw.y = ry.y),
        |m AS (SELECT COUNT(*) AS nr,
        |  SUM(CAST(rkx AS DECIMAL(28,6))) AS sx,
        |  SUM(CAST(rky AS DECIMAL(28,6))) AS sy,
        |  SUM(CAST(rkx * rky AS DECIMAL(28,6))) AS sxy,
        |  SUM(CAST(rkx * rkx AS DECIMAL(28,6))) AS sxx,
        |  SUM(CAST(rky * rky AS DECIMAL(28,6))) AS syy FROM j),
        |d AS (SELECT CAST(nr AS DOUBLE) AS n, nr,
        |  CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
        |  CAST(sxy AS DOUBLE) AS sxy, CAST(sxx AS DOUBLE) AS sxx,
        |  CAST(syy AS DOUBLE) AS syy FROM m)
        |SELECT CAST(nr AS BIGINT) AS n,
        |  CAST(ROUND(CAST(CASE
        |    WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |    THEN (n * sxy - sx * sy)
        |      / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)) END
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS rho
        |FROM d""".stripMargin,

    // Mutual information: each cell/marginal term is ONE left-
    // associated double expression cast to DECIMAL(18,10), summed
    // exactly; only observed cells enter (0·ln0 = 0 convention).
    "x149_mutual_info" ->
      """WITH cells AS (SELECT o_orderstatus AS a, o_orderpriority AS b,
        |  COUNT(*) AS o FROM orders GROUP BY 1, 2),
        |ra AS (SELECT a, SUM(o) AS ra FROM cells GROUP BY 1),
        |cb AS (SELECT b, SUM(o) AS cb FROM cells GROUP BY 1),
        |nn AS (SELECT CAST(SUM(o) AS DOUBLE) AS n FROM cells),
        |mi AS (SELECT SUM(CAST((o / nn.n)
        |    * ln(nn.n * o / (CAST(ra.ra AS DOUBLE) * cb.cb))
        |    AS DECIMAL(18,10))) AS mi
        |  FROM cells
        |  JOIN ra ON ra.a IS NOT DISTINCT FROM cells.a
        |  JOIN cb ON cb.b IS NOT DISTINCT FROM cells.b
        |  CROSS JOIN nn),
        |ha AS (SELECT SUM(CAST((-(ra / nn.n)) * ln(ra / nn.n)
        |    AS DECIMAL(18,10))) AS ha FROM ra CROSS JOIN nn),
        |hb AS (SELECT SUM(CAST((-(cb / nn.n)) * ln(cb / nn.n)
        |    AS DECIMAL(18,10))) AS hb FROM cb CROSS JOIN nn)
        |SELECT ROUND(CAST(mi AS DOUBLE), 6) AS mi,
        |  ROUND(CAST(ha AS DOUBLE), 6) AS h_a,
        |  ROUND(CAST(hb AS DOUBLE), 6) AS h_b,
        |  CAST(ROUND(CAST(CASE WHEN CAST(least(ha, hb) AS DOUBLE) > 0
        |    THEN CAST(mi AS DOUBLE) / CAST(least(ha, hb) AS DOUBLE) END
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS nmi
        |FROM mi CROSS JOIN ha CROSS JOIN hb""".stripMargin,

    // BM25: per-doc tfs are list_filter counts (no explode); constants
    // written as e-notation DOUBLE literals and combined in the exact
    // association the engine uses, so both sides run one identical
    // IEEE sequence per doc before the DECIMAL(18,8) stabilize.
    "x150_bm25" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents),
        |t AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
        |  CAST(len(list_filter(toks, x -> x = 'spark')) AS BIGINT) AS tf0,
        |  CAST(len(list_filter(toks, x -> x = 'join')) AS BIGINT) AS tf1,
        |  CAST(len(list_filter(toks, x -> x = 'dup')) AS BIGINT) AS tf2
        |  FROM d),
        |s AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl,
        |  SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
        |  SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
        |  SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2 FROM t),
        |sc AS (SELECT doc_id, dl AS n_tokens,
        |  CAST(ROUND(CAST(
        |    ln(1.0e0 + (n - df0 + 0.5e0) / (df0 + 0.5e0))
        |      * (tf0 * (1.2e0 + 1.0e0))
        |      / (tf0 + 1.2e0 * (0.25e0 + 0.75e0 * dl / avgdl))
        |    + ln(1.0e0 + (n - df1 + 0.5e0) / (df1 + 0.5e0))
        |      * (tf1 * (1.2e0 + 1.0e0))
        |      / (tf1 + 1.2e0 * (0.25e0 + 0.75e0 * dl / avgdl))
        |    + ln(1.0e0 + (n - df2 + 0.5e0) / (df2 + 0.5e0))
        |      * (tf2 * (1.2e0 + 1.0e0))
        |      / (tf2 + 1.2e0 * (0.25e0 + 0.75e0 * dl / avgdl))
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS score
        |  FROM t CROSS JOIN s),
        |top AS (SELECT * FROM sc WHERE score > 0
        |  ORDER BY score DESC, doc_id LIMIT 50)
        |SELECT * FROM top ORDER BY doc_id""".stripMargin,

    // OOV rate: vocabulary = English terms at support >= 50; the
    // fraction stabilizes through DECIMAL(18,8).
    "x151_oov_rate" ->
      """WITH vocab AS (SELECT t AS term FROM (
        |    SELECT unnest(string_split(text, ' ')) AS t FROM documents
        |    WHERE lang = 'en')
        |  GROUP BY 1 HAVING COUNT(*) >= 50),
        |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents WHERE lang <> 'en'),
        |j AS (SELECT toks.doc_id,
        |  CASE WHEN vocab.term IS NULL THEN 1 ELSE 0 END AS oov
        |  FROM toks LEFT JOIN vocab ON toks.term = vocab.term),
        |g AS (SELECT doc_id, COUNT(*) AS n_tokens, SUM(oov) AS n_oov
        |  FROM j GROUP BY 1)
        |SELECT doc_id, n_tokens, CAST(n_oov AS BIGINT) AS n_oov,
        |  CAST(ROUND(CAST(CAST(n_oov AS DOUBLE) / n_tokens
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS oov_rate
        |FROM g ORDER BY doc_id""".stripMargin,

    // Winsorize: fences via EXACT rank-arithmetic decimal
    // interpolation — p as thousandths, rank pos = pNum·(n−1) in
    // integer arithmetic, (v_lo·(1000−rem) + v_hi·rem)·0.001 entirely
    // in DECIMAL — no quantile_cont, no float kernel (the r11 ULP
    // lesson: one DuckDB release's interpolation flipped the rounded
    // fence another release kept). Mirrors groupedExactQuantiles.
    "x152_winsorize" ->
      """WITH rws AS (SELECT o_orderpriority AS g,
        |  CAST(o_totalprice AS DECIMAL(18,6)) AS v
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |rk AS (SELECT g, v,
        |  ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) - 1 AS r,
        |  COUNT(*) OVER (PARTITION BY g) AS n FROM rws),
        |b AS (SELECT g, v, r,
        |  (50*(n-1)) // 1000 AS llo,
        |  LEAST((50*(n-1)) // 1000 + 1, n-1) AS lhi,
        |  (50*(n-1)) % 1000 AS lrem,
        |  (950*(n-1)) // 1000 AS hlo,
        |  LEAST((950*(n-1)) // 1000 + 1, n-1) AS hhi,
        |  (950*(n-1)) % 1000 AS hrem FROM rk),
        |f AS (SELECT g,
        |  ROUND((MIN(CASE WHEN r = llo THEN v END)
        |      * CAST(1000 - lrem AS DECIMAL(4,0))
        |    + MIN(CASE WHEN r = lhi THEN v END)
        |      * CAST(lrem AS DECIMAL(4,0)))
        |    * CAST(0.001 AS DECIMAL(4,3)), 6) AS lo,
        |  ROUND((MIN(CASE WHEN r = hlo THEN v END)
        |      * CAST(1000 - hrem AS DECIMAL(4,0))
        |    + MIN(CASE WHEN r = hhi THEN v END)
        |      * CAST(hrem AS DECIMAL(4,0)))
        |    * CAST(0.001 AS DECIMAL(4,3)), 6) AS hi
        |  FROM b GROUP BY g, llo, lhi, lrem, hlo, hhi, hrem),
        |j AS (SELECT r.g, r.v, f.lo, f.hi
        |  FROM rws r JOIN f ON r.g = f.g)
        |SELECT g AS o_orderpriority, COUNT(*) AS n,
        |  CAST(lo AS DOUBLE) AS fence_lo, CAST(hi AS DOUBLE) AS fence_hi,
        |  CAST(SUM(CASE WHEN v < lo THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_clipped_low,
        |  CAST(SUM(CASE WHEN v > hi THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_clipped_high,
        |  CAST(ROUND(CAST(CAST(SUM(CAST(
        |    LEAST(GREATEST(v, lo), hi)
        |    AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)
        |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS winsorized_mean
        |FROM j GROUP BY g, lo, hi ORDER BY o_orderpriority""".stripMargin,

    "x154_kcore" -> kcoreSql,

    // Exact-quantile scalable path vs native quantile_cont (the t38
    // percentile parity), stabilized through DECIMAL(18,8).
    "x159_exact_quantiles" ->
      """WITH v AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL)
        |SELECT prob, CAST(ROUND(CAST(q AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS value
        |FROM (
        |  SELECT 0.5e0 AS prob, quantile_cont(v, 0.5) AS q FROM v
        |  UNION ALL SELECT 0.9e0, quantile_cont(v, 0.9) FROM v
        |  UNION ALL SELECT 0.99e0, quantile_cont(v, 0.99) FROM v)
        |ORDER BY prob""".stripMargin,

    // Calibration + Brier over the x108 classifier scores (same
    // sigmoid CTE, threshold 0): decimal bin sums, DECIMAL(18,8)
    // ratios, Brier terms summed exactly in DECIMAL(18,10).
    "x168_calibration" ->
      """WITH t AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS w,
        |    LEAST(LENGTH(text)::DOUBLE / 500.0, 1.0) AS len_score,
        |    (LENGTH(text) - LENGTH(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')))::DOUBLE
        |      / GREATEST(LENGTH(text)::DOUBLE, 1.0) AS punct_ratio
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, lang,
        |    ROUND(1.0 / (1.0 + exp(-(-2.0 + 2.5 * len_score +
        |      1.5 * (1.0 - punct_ratio) +
        |      1.5 * (len(list_filter(w, x -> regexp_matches(x, '^[A-Za-z]+$')))::DOUBLE
        |        / GREATEST(len(w)::DOUBLE, 1.0))))), 4) AS p
        |  FROM t),
        |r AS (SELECT LEAST(CAST(floor(p * 10) AS BIGINT), 9) AS bin, p,
        |  CASE WHEN lang = 'en' THEN CAST(1.0 AS DOUBLE)
        |    ELSE CAST(0.0 AS DOUBLE) END AS y FROM s),
        |br AS (SELECT CAST(ROUND(CAST(
        |  CAST(SUM(CAST((p - y) * (p - y) AS DECIMAL(18,10))) AS DOUBLE)
        |    / COUNT(*) AS DECIMAL(18,8)), 6) AS DOUBLE) AS brier FROM r)
        |SELECT bin, COUNT(*) AS n,
        |  CAST(ROUND(CAST(CAST(SUM(CAST(p AS DECIMAL(18,10))) AS DOUBLE)
        |    / COUNT(*) AS DECIMAL(18,8)), 6) AS DOUBLE) AS avg_pred,
        |  CAST(ROUND(CAST(CAST(SUM(CAST(y AS DECIMAL(18,10))) AS DOUBLE)
        |    / COUNT(*) AS DECIMAL(18,8)), 6) AS DOUBLE) AS obs_rate,
        |  MIN(br.brier) AS brier
        |FROM r CROSS JOIN br GROUP BY bin ORDER BY bin""".stripMargin,

    // FD audit: one (lhs -> distinct rhs) aggregate per rule.
    "x169_fd_report" ->
      """WITH r1 AS (SELECT 'p_partkey' AS lhs, 'p_name' AS rhs,
        |  COUNT(*) AS n_groups,
        |  SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS n_violating,
        |  MAX(k) AS max_rhs_per_lhs FROM (
        |    SELECT p_partkey, COUNT(DISTINCT p_name) AS k FROM part
        |    GROUP BY 1)),
        |r2 AS (SELECT 'p_name', 'p_brand', COUNT(*),
        |  SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END), MAX(k) FROM (
        |    SELECT p_name, COUNT(DISTINCT p_brand) AS k FROM part
        |    GROUP BY 1)),
        |r3 AS (SELECT 'p_brand', 'p_type', COUNT(*),
        |  SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END), MAX(k) FROM (
        |    SELECT p_brand, COUNT(DISTINCT p_type) AS k FROM part
        |    GROUP BY 1)),
        |u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2
        |  UNION ALL SELECT * FROM r3)
        |SELECT lhs, rhs, CAST(n_groups AS BIGINT) AS n_groups,
        |  CAST(n_violating AS BIGINT) AS n_violating,
        |  CAST(ROUND(CAST(CAST(n_violating AS DOUBLE) / n_groups
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS violation_rate,
        |  CAST(max_rhs_per_lhs AS BIGINT) AS max_rhs_per_lhs
        |FROM u ORDER BY lhs, rhs""".stripMargin,

    // Embedding-geometry health: per-dimension decimal sums, fixed
    // per-dimension reduction order, DECIMAL(18,8) stabilize.
    "x184_embedding_stats" ->
      s"""WITH $embCte,
         |pd AS (SELECT pos,
         |  SUM(CAST(x AS DECIMAL(28,8))) AS sx,
         |  SUM(CAST(x * x AS DECIMAL(28,8))) AS sxx,
         |  COUNT(*) AS n
         |  FROM (SELECT generate_subscripts(v, 1) AS pos, unnest(v) AS x
         |    FROM e) GROUP BY pos),
         |ag AS (SELECT
         |  SUM(CAST((CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)
         |    AS DECIMAL(28,8))) AS mu2,
         |  SUM(sxx) AS exx, MIN(n) AS n FROM pd)
         |SELECT CAST(n AS BIGINT) AS n_vectors,
         |  CAST(ROUND(CAST(sqrt(CAST(exx AS DOUBLE) / n)
         |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS rms_norm,
         |  CAST(ROUND(CAST(sqrt(CAST(mu2 AS DOUBLE))
         |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS mean_vector_norm,
         |  CAST(ROUND(CAST(CAST(mu2 AS DOUBLE)
         |    / (CAST(exx AS DOUBLE) / n) AS DECIMAL(18,8)), 6)
         |    AS DOUBLE) AS anisotropy
         |FROM ag""".stripMargin,

    // Threshold operating curve: one banding + one exact verify, then
    // 0.1-wide bands with a descending cumulative window (10 rows).
    "x185_neardup_threshold_curve" ->
      s"""WITH ${shingleCte(3)},
         |$minhashBandsCtes,
         |pairs AS (
         |  SELECT DISTINCT x.doc AS a, y.doc AS b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.bkey = y.bkey AND x.doc < y.doc),
         |sizes AS (SELECT doc, COUNT(*) AS sz FROM sh GROUP BY doc),
         |inter AS (SELECT x.doc AS a, y.doc AS b, COUNT(*) AS i
         |  FROM sh x JOIN sh y ON x.h = y.h AND x.doc < y.doc
         |  GROUP BY 1, 2),
         |jv AS (SELECT p.a, p.b,
         |  ROUND(COALESCE(i.i, 0)::DOUBLE
         |    / (sa.sz + sb.sz - COALESCE(i.i, 0))::DOUBLE, 4) AS jac
         |  FROM pairs p
         |  LEFT JOIN inter i ON p.a = i.a AND p.b = i.b
         |  JOIN sizes sa ON sa.doc = p.a JOIN sizes sb ON sb.doc = p.b),
         |pb AS (SELECT LEAST(CAST(floor(jac * 10) AS BIGINT), 9) AS b,
         |  COUNT(*) AS n FROM jv GROUP BY 1)
         |SELECT CAST(b AS DOUBLE) / 10 AS threshold,
         |  CAST(n AS BIGINT) AS n_in_band,
         |  CAST(SUM(n) OVER (ORDER BY b DESC
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_at_or_above
         |FROM pb ORDER BY threshold""".stripMargin,

    // MinHash calibration: the x41 shingle/signature/band CTEs verbatim
    // (the deployed sketch, not a reimplementation); estimate = exact
    // dyadic agree/16, exact Jaccard via the posting intersection.
    "x183_minhash_calibration" ->
      s"""WITH ${shingleCte(3)},
         |$minhashBandsCtes,
         |pairs AS (
         |  SELECT DISTINCT x.doc AS a, y.doc AS b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.bkey = y.bkey AND x.doc < y.doc),
         |agr AS (SELECT p.a, p.b,
         |  SUM(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS ag
         |  FROM pairs p JOIN sig sa ON sa.doc = p.a
         |  JOIN sig sb ON sb.doc = p.b AND sa.j = sb.j
         |  GROUP BY 1, 2),
         |est AS (SELECT a, b, ROUND(CAST(ag AS DOUBLE) / 16, 4)
         |  AS est_jaccard FROM agr),
         |sizes AS (SELECT doc, COUNT(*) AS sz FROM sh GROUP BY doc),
         |inter AS (SELECT x.doc AS a, y.doc AS b, COUNT(*) AS i
         |  FROM sh x JOIN sh y ON x.h = y.h AND x.doc < y.doc
         |  GROUP BY 1, 2),
         |ex AS (SELECT p.a, p.b,
         |  ROUND(COALESCE(i.i, 0)::DOUBLE
         |    / (sa.sz + sb.sz - COALESCE(i.i, 0))::DOUBLE, 4)
         |    AS exact_jaccard
         |  FROM pairs p
         |  LEFT JOIN inter i ON p.a = i.a AND p.b = i.b
         |  JOIN sizes sa ON sa.doc = p.a JOIN sizes sb ON sb.doc = p.b)
         |SELECT est.a AS a, est.b AS b, est_jaccard, exact_jaccard,
         |  ROUND(abs(est_jaccard - exact_jaccard), 4) AS abs_err
         |FROM est JOIN ex ON est.a = ex.a AND est.b = ex.b
         |ORDER BY est.a, est.b""".stripMargin,

    // Cross-source duplication: sha256 digests, pair join bounded by
    // sources-per-digest; exact integer counts.
    "x181_cross_source_dups" ->
      """WITH ds AS (SELECT DISTINCT sha256(text) AS dig,
        |  CAST(source AS VARCHAR) AS s FROM documents)
        |SELECT a.s AS source_a, b.s AS source_b,
        |  COUNT(DISTINCT a.dig) AS n_shared_texts
        |FROM ds a JOIN ds b ON a.dig = b.dig AND a.s < b.s
        |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin,

    // Top-down vs bottom-up reconciliation: exact decimal history,
    // shares and the top-down product through DECIMAL(18,8).
    "x182_reconcile_topdown" ->
      s"""WITH $dailyCte,
         |g AS (SELECT MAX(day) AS dmax FROM daily),
         |ks AS (SELECT DISTINCT user_id FROM daily),
         |grid AS (SELECT user_id, CAST(h AS BIGINT) AS h_day,
         |  dmax + CAST(h AS INTEGER) AS target,
         |  dmax + CAST(h - 7 AS INTEGER) AS lag7
         |  FROM ks CROSS JOIN g
         |  CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS h)),
         |ad AS (SELECT day, SUM(demand) AS tot FROM daily GROUP BY 1),
         |sh AS (SELECT user_id,
         |  CAST(ROUND(CAST(CAST(ksum AS DOUBLE) / CAST(gsum AS DOUBLE)
         |    AS DECIMAL(18,8)), 8) AS DOUBLE) AS share
         |  FROM (SELECT user_id, SUM(demand) AS ksum FROM daily
         |    GROUP BY 1)
         |  CROSS JOIN (SELECT SUM(demand) AS gsum FROM daily))
         |SELECT grid.user_id, h_day,
         |  ROUND(COALESCE(CAST(d.demand AS DOUBLE), CAST(0.0 AS DOUBLE)),
         |    2) AS bottom_up,
         |  CAST(ROUND(CAST(
         |    COALESCE(CAST(ad.tot AS DOUBLE), CAST(0.0 AS DOUBLE))
         |      * share AS DECIMAL(18,8)), 4) AS DOUBLE) AS top_down
         |FROM grid
         |LEFT JOIN daily d ON grid.user_id = d.user_id
         |  AND grid.lag7 = d.day
         |LEFT JOIN ad ON grid.lag7 = ad.day
         |JOIN sh ON grid.user_id = sh.user_id
         |ORDER BY grid.user_id, h_day""".stripMargin,

    // Stickiness: exact (user, day)/(user, week) distinct counts,
    // divisions through DECIMAL(18,8). Mirrors the Spark association
    // (active_days/7 first, then /wau).
    "x186_stickiness" ->
      """WITH dau AS (SELECT w, COUNT(*) AS active_days FROM (
        |    SELECT DISTINCT user_id,
        |      CAST(date_trunc('day', ts) AS DATE) AS d,
        |      CAST(date_trunc('week', ts) AS DATE) AS w FROM events)
        |  GROUP BY 1),
        |wau AS (SELECT w, COUNT(*) AS wau FROM (
        |    SELECT DISTINCT user_id,
        |      CAST(date_trunc('week', ts) AS DATE) AS w FROM events)
        |  GROUP BY 1)
        |SELECT wau.w AS week, CAST(wau.wau AS BIGINT) AS wau,
        |  CAST(ROUND(CAST(CAST(active_days AS DOUBLE) / 7
        |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS avg_dau,
        |  CAST(ROUND(CAST(CAST(active_days AS DOUBLE) / 7 / wau.wau
        |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS stickiness
        |FROM wau JOIN dau USING (w) ORDER BY week""".stripMargin,

    // SES: the ordered-fold parity gate — DuckDB list_reduce folds
    // left from the first element with (accumulator, element) lambda
    // args, exactly Spark's aggregate(slice(...,2,...), first, ...);
    // α and β are the SAME Scala-computed shortest-round-trip double
    // literals on both sides (β is NOT re-derived as 1−α per engine —
    // that subtraction can land on a different double).
    "x187_ses_forecast" ->
      s"""WITH $dailyCte,
         |ag AS (SELECT user_id, COUNT(*) AS n_obs,
         |  list(CAST(CAST(demand AS DECIMAL(18,6)) AS DOUBLE)
         |    ORDER BY day) AS ys
         |  FROM daily GROUP BY 1)
         |SELECT user_id, n_obs,
         |  CAST(ROUND(CAST(list_reduce(ys,
         |    (acc, x) -> CAST('${0.3}' AS DOUBLE) * x
         |      + CAST('${1.0 - 0.3}' AS DOUBLE) * acc)
         |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS ses_forecast
         |FROM ag ORDER BY user_id""".stripMargin,

    // Max drawdown: decimal running max, decimal differences, argmax
    // day via MIN(CASE WHEN dd = mdd) — exact end to end.
    "x188_max_drawdown" ->
      s"""WITH $dailyCte,
         |r AS (SELECT user_id, day,
         |  CAST(demand AS DECIMAL(18,2)) AS y FROM daily),
         |w1 AS (SELECT user_id, day, y,
         |  MAX(y) OVER (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
         |  FROM r),
         |w2 AS (SELECT user_id, day, y, peak - y AS dd FROM w1),
         |w3 AS (SELECT user_id, day, y, dd,
         |  MAX(dd) OVER (PARTITION BY user_id) AS mdd FROM w2)
         |SELECT user_id, COUNT(*) AS n_obs,
         |  CAST(MAX(y) AS DOUBLE) AS peak,
         |  CAST(MAX(dd) AS DOUBLE) AS max_drawdown,
         |  MIN(CASE WHEN dd = mdd THEN day END) AS drawdown_at
         |FROM w3 GROUP BY user_id ORDER BY user_id""".stripMargin,

    // Rolling exact median: per-window sorted decimal list, median
    // picked/interpolated in DECIMAL ((a+b)·0.5 scale-1 literal —
    // exact); NULL until the window is full (min_periods = 7).
    "x189_rolling_median" ->
      s"""WITH $dailyCte,
         |r AS (SELECT user_id, day,
         |  CAST(demand AS DECIMAL(18,2)) AS y FROM daily),
         |w AS (SELECT user_id, day, y,
         |  COUNT(*) OVER win AS n,
         |  list_sort(list(y) OVER win) AS wv
         |  FROM r WINDOW win AS (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
         |SELECT user_id, day, CAST(y AS DOUBLE) AS demand,
         |  CASE WHEN n = 7 THEN CAST(wv[4] AS DOUBLE) END
         |    AS rolling_median
         |FROM w ORDER BY user_id, day""".stripMargin,

    // Containment: shared-shingle inverted index, per-(a,b) distinct
    // intersection count over |Sa| — directed, both orders emit.
    "x190_containment" ->
      s"""WITH ${shingleCte(3)},
         |sz AS (SELECT doc, COUNT(*) AS sz FROM sh GROUP BY 1),
         |shared AS (SELECT x.doc AS a, y.doc AS b, COUNT(*) AS shared
         |  FROM sh x JOIN sh y ON x.h = y.h AND x.doc <> y.doc
         |  GROUP BY 1, 2),
         |c AS (SELECT a, b, sz.sz AS sz_a, shared,
         |  CAST(ROUND(CAST(CAST(shared AS DOUBLE) / sz.sz
         |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS containment
         |  FROM shared JOIN sz ON sz.doc = shared.a)
         |SELECT a, b, sz_a, shared, containment FROM c
         |WHERE containment >= 0.5 ORDER BY a, b""".stripMargin,

    // FK orphan audit: one distinct-parent left join + 1-row agg per
    // edge, unioned; events→customer genuinely carries orphans.
    "x191_fk_orphans" -> {
      def audit(label: String, child: String, ck: String,
          parent: String, pk: String): String =
        s"""(SELECT '$label' AS fk, COUNT(*) AS n_rows,
           |  CAST(SUM(CASE WHEN c.$ck IS NULL THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_null_keys,
           |  CAST(SUM(CASE WHEN c.$ck IS NOT NULL AND p.k IS NULL
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
           |  FROM $child c LEFT JOIN
           |    (SELECT DISTINCT $pk AS k FROM $parent) p
           |    ON c.$ck = p.k)""".stripMargin
      s"""WITH u AS (
         |${audit("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey")}
         |UNION ALL
         |${audit("orders_customer", "orders", "o_custkey", "customer", "c_custkey")}
         |UNION ALL
         |${audit("customer_nation", "customer", "c_nationkey", "nation", "n_nationkey")}
         |UNION ALL
         |${audit("events_customer", "events", "user_id", "customer", "c_custkey")})
         |SELECT fk, n_rows, n_null_keys, n_orphans,
         |  CAST(ROUND(CAST(CAST(n_orphans AS DOUBLE) / n_rows
         |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS orphan_rate
         |FROM u ORDER BY fk""".stripMargin
    },

    // Price endings: exact integer cents (the x144 money contract),
    // one counting aggregate to ≤100 rows.
    "x192_price_endings" ->
      """WITH c AS (SELECT CAST(ROUND(CAST(o_totalprice
        |    AS DECIMAL(28,6)), 2) * 100 AS BIGINT) AS cents
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |e AS (SELECT cents % 100 AS ending, COUNT(*) AS n
        |  FROM c GROUP BY 1)
        |SELECT CAST(ending AS BIGINT) AS ending, n,
        |  CAST(ROUND(CAST(CAST(n AS DOUBLE) / SUM(n) OVER ()
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS share,
        |  CAST(CASE WHEN ending % 10 = 9 THEN 1 ELSE 0 END AS BIGINT)
        |    AS is_charm
        |FROM e ORDER BY ending""".stripMargin,

    // Reach curve: first-appearance day per user, then new counts and
    // one running sum over the day-cardinality table — exact integers.
    "x193_reach_curve" ->
      """WITH f AS (SELECT user_id,
        |  MIN(CAST(date_trunc('day', ts) AS DATE)) AS d0
        |  FROM events GROUP BY 1),
        |p AS (SELECT d0 AS day, COUNT(*) AS n_new FROM f GROUP BY 1)
        |SELECT day, n_new,
        |  CAST(SUM(n_new) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cum_reach
        |FROM p ORDER BY day""".stripMargin,

    // Weighted median: decimal cumulative weights, integer-scaled
    // threshold compare, the selected value is a DATA value — exact
    // end to end, no interpolation. Window sums contract to
    // DECIMAL(24,6) before the scaling (the precision-38 lesson).
    "x194_weighted_median" ->
      """WITH r AS (SELECT l_returnflag AS g,
        |  CAST(l_extendedprice AS DECIMAL(18,6)) AS v,
        |  CAST(l_quantity AS DECIMAL(18,6)) AS w
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |    AND l_quantity IS NOT NULL AND l_quantity > 0),
        |c AS (SELECT g, v, w,
        |  CAST(SUM(w) OVER (PARTITION BY g ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DECIMAL(24,6)) AS cw,
        |  CAST(SUM(w) OVER (PARTITION BY g) AS DECIMAL(24,6)) AS tw
        |  FROM r)
        |SELECT g AS l_returnflag, COUNT(*) AS n,
        |  CAST(MIN(tw) AS DOUBLE) AS total_weight,
        |  CAST(MIN(CASE WHEN cw * CAST(1000 AS DECIMAL(4,0))
        |      >= tw * CAST(500 AS DECIMAL(4,0)) THEN v END)
        |    AS DOUBLE) AS weighted_median
        |FROM c GROUP BY g ORDER BY l_returnflag""".stripMargin,

    // LSH blocking profile: exact integer bucket stats per band over
    // the deployed 16-hash/4-row banding twins.
    "x195_lsh_blocking" ->
      s"""WITH ${shingleCte(3)},
         |$minhashBandsCtes,
         |bsz AS (SELECT band, bkey, COUNT(*) AS sz
         |  FROM bands GROUP BY 1, 2)
         |SELECT band, COUNT(*) AS n_buckets, MAX(sz) AS max_bucket,
         |  CAST(SUM(sz * (sz - 1)) / 2 AS BIGINT) AS candidate_pairs,
         |  CAST(ROUND(CAST(CAST(MAX(sz) AS DOUBLE) * COUNT(*) / SUM(sz)
         |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS skew
         |FROM bsz GROUP BY band ORDER BY band""".stripMargin,

    // Novelty per id-range batch: distinct (batch, gram), first-seen
    // batch per gram, exact integer counts.
    "x196_novelty_rate" ->
      s"""WITH ${shingleCte(3)},
         |bg AS (SELECT DISTINCT doc // 100 AS b, h FROM sh),
         |f AS (SELECT h, MIN(b) AS b0 FROM bg GROUP BY 1)
         |SELECT bg.b AS batch, COUNT(*) AS n_grams,
         |  CAST(SUM(CASE WHEN bg.b = f.b0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_novel,
         |  CAST(ROUND(CAST(
         |    CAST(SUM(CASE WHEN bg.b = f.b0 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / COUNT(*) AS DECIMAL(18,8)), 4) AS DOUBLE) AS novelty_rate
         |FROM bg JOIN f USING (h) GROUP BY 1 ORDER BY batch""".stripMargin,

    // Newsvendor: the exact rank-arithmetic 0.8 quantile (the r12
    // machinery as a user-facing op) + decimal mean + safety stock.
    "x197_newsvendor" ->
      s"""WITH $dailyCte,
         |${exactQuantileCtes("daily", Seq("user_id"), "demand",
             Seq("op" -> 800), 6, "q")},
         |m AS (SELECT user_id, COUNT(*) AS n_periods,
         |  ROUND(CAST(CAST(SUM(CAST(demand AS DECIMAL(18,6))) AS DOUBLE)
         |    / COUNT(*) AS DECIMAL(18,8)), 4) AS mean_d
         |  FROM daily GROUP BY 1)
         |SELECT m.user_id, n_periods,
         |  CAST(mean_d AS DOUBLE) AS mean_demand,
         |  CAST(qq.op AS DOUBLE) AS order_point,
         |  CAST(ROUND(CAST(CAST(qq.op AS DOUBLE) - CAST(mean_d AS DOUBLE)
         |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS safety_stock
         |FROM m JOIN qq ON qq.user_id = m.user_id
         |ORDER BY m.user_id""".stripMargin,

    // Holt: the ARRAY-accumulator ordered fold — init prepended as
    // the first element (list_reduce has no explicit init), values
    // pair-wrapped so the lambda shape matches Spark's aggregate.
    // NOT a struct accumulator: DuckDB evaluates struct-returning
    // lambdas field-by-field with the accumulator mutated in place
    // (observed live — the second field saw the first already
    // overwritten); list construction reads the original accumulator.
    "x198_holt_forecast" ->
      s"""WITH $dailyCte,
         |ag AS (SELECT user_id, COUNT(*) AS n_obs,
         |  list(CAST(CAST(demand AS DECIMAL(18,6)) AS DOUBLE)
         |    ORDER BY day) AS ys
         |  FROM daily GROUP BY 1),
         |h AS (SELECT user_id, n_obs, ys,
         |  CASE WHEN len(ys) = 1 THEN NULL
         |  ELSE list_reduce(
         |    list_prepend([ys[2], ys[2] - ys[1]],
         |      [[v, 0.0e0] for v in ys[3:]]),
         |    (acc, x) -> [
         |      CAST('0.3' AS DOUBLE) * x[1]
         |        + CAST('${1.0 - 0.3}' AS DOUBLE) * (acc[1] + acc[2]),
         |      CAST('0.1' AS DOUBLE)
         |        * ((CAST('0.3' AS DOUBLE) * x[1]
         |          + CAST('${1.0 - 0.3}' AS DOUBLE) * (acc[1] + acc[2]))
         |          - acc[1])
         |        + CAST('${1.0 - 0.1}' AS DOUBLE) * acc[2]]) END AS rs
         |  FROM ag)
         |SELECT user_id, n_obs,
         |  CAST(ROUND(CAST(CASE WHEN n_obs = 1 THEN ys[1]
         |    ELSE rs[1] + rs[2] END AS DECIMAL(18,8)), 4) AS DOUBLE)
         |    AS holt_forecast
         |FROM h ORDER BY user_id""".stripMargin,

    // Retention triangle: exact distinct user-week arithmetic; week
    // age = day diff // 7 (weeks are Monday-truncated, always a
    // multiple of 7 apart).
    "x199_retention_triangle" ->
      """WITH act AS (SELECT DISTINCT user_id AS u,
        |  CAST(date_trunc('week', ts) AS DATE) AS w FROM events),
        |f AS (SELECT u, MIN(w) AS c FROM act GROUP BY 1),
        |sz AS (SELECT c, COUNT(*) AS n0 FROM f GROUP BY 1),
        |j AS (SELECT f.c,
        |  CAST(date_diff('day', f.c, a.w) // 7 AS BIGINT) AS age
        |  FROM act a JOIN f ON a.u = f.u),
        |g AS (SELECT c, age, COUNT(*) AS n_active FROM j GROUP BY 1, 2)
        |SELECT g.c AS cohort_week, age AS age_weeks, n_active,
        |  CAST(n0 AS BIGINT) AS cohort_size,
        |  CAST(ROUND(CAST(CAST(n_active AS DOUBLE) / n0
        |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS retention
        |FROM g JOIN sz USING (c)
        |ORDER BY cohort_week, age_weeks""".stripMargin,

    // Language confusion: the x46 detector joined back to the declared
    // label; counts + whole-relation shares.
    "x200_lang_confusion" ->
      s"""WITH li AS ($langIdSql),
         |j AS (SELECT d.lang AS declared, li.pred_lang AS detected
         |  FROM documents d JOIN li ON li.doc_id = d.doc_id),
         |cg AS (SELECT declared, detected, COUNT(*) AS n
         |  FROM j GROUP BY 1, 2)
         |SELECT declared, detected, n,
         |  CAST(ROUND(CAST(CAST(n AS DOUBLE) / SUM(n) OVER ()
         |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS share,
         |  CAST(CASE WHEN declared = detected THEN 1 ELSE 0 END
         |    AS BIGINT) AS is_match
         |FROM cg ORDER BY declared, detected""".stripMargin,

    // Session stats: the x137 gaps-and-islands sessions + the exact
    // rank-arithmetic median duration.
    "x201_session_stats" ->
      s"""WITH g AS (SELECT user_id, ts, event_id,
         |  epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |m AS (SELECT user_id, ts,
         |  SUM(CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0
         |    END) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS session_seq
         |  FROM g),
         |sess AS (SELECT user_id, session_seq,
         |  CAST(COUNT(*) AS BIGINT) AS n_events,
         |  CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS BIGINT)
         |    AS duration_us
         |  FROM m GROUP BY 1, 2),
         |${exactQuantileCtes("sess", Seq(), "duration_us",
             Seq("med_us" -> 500), 6, "q")},
         |st AS (SELECT COUNT(*) AS n_sessions,
         |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_bounce,
         |  CAST(SUM(n_events) AS BIGINT) AS ev FROM sess)
         |SELECT n_sessions, n_bounce,
         |  CAST(ROUND(CAST(CAST(n_bounce AS DOUBLE) / n_sessions
         |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS bounce_rate,
         |  CAST(ROUND(CAST(CAST(ev AS DOUBLE) / n_sessions
         |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS events_per_session,
         |  CAST(ROUND(CAST(CAST(qq.med_us AS DOUBLE) / 1000000.0e0
         |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS median_duration_s
         |FROM st CROSS JOIN qq""".stripMargin,

    // Repurchase: per-customer consecutive-order gaps (same-day
    // repeats contribute zero-day gaps under any tie order) + the
    // exact median gap.
    "x202_repurchase" ->
      s"""WITH w1 AS (SELECT o_custkey,
         |  date_diff('day',
         |    lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
         |      ORDER BY o_orderdate),
         |    CAST(o_orderdate AS DATE)) AS gap
         |  FROM orders),
         |gp AS (SELECT CAST(gap AS BIGINT) AS gap FROM w1
         |  WHERE gap IS NOT NULL),
         |${exactQuantileCtes("gp", Seq(), "gap",
             Seq("med" -> 500), 6, "q")},
         |pc AS (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY 1),
         |st AS (SELECT COUNT(*) AS n_customers,
         |  CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_repeat,
         |  CAST(SUM(n) AS BIGINT) AS orders FROM pc)
         |SELECT n_customers, n_repeat,
         |  CAST(ROUND(CAST(CAST(n_repeat AS DOUBLE) / n_customers
         |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS repeat_rate,
         |  CAST(ROUND(CAST(CAST(orders AS DOUBLE) / n_customers
         |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS orders_per_customer,
         |  CAST(qq.med AS DOUBLE) AS median_gap_days
         |FROM st CROSS JOIN qq""".stripMargin,

    // Profile drift: per-column conditional stats on both slices from
    // one scan; every SUM(CASE) cast to BIGINT (the x152 HUGEINT
    // lesson); rate deltas as ONE left-associated double expression.
    "x203_profile_drift" -> {
      def colSql(c: String): String =
        s"""SELECT '$c' AS col_name,
           |  CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           |  CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           |  CAST(SUM(CASE WHEN a AND $c IS NULL THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_null_a,
           |  CAST(SUM(CASE WHEN b AND $c IS NULL THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_null_b,
           |  COUNT(DISTINCT CASE WHEN a THEN $c END) AS n_distinct_a,
           |  COUNT(DISTINCT CASE WHEN b THEN $c END) AS n_distinct_b,
           |  CAST(ROUND(CAST(
           |    CAST(SUM(CASE WHEN a AND $c IS NULL THEN 1 ELSE 0 END)
           |      AS DOUBLE)
           |    / SUM(CASE WHEN a THEN 1 ELSE 0 END)
           |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS null_rate_a,
           |  CAST(ROUND(CAST(
           |    CAST(SUM(CASE WHEN b AND $c IS NULL THEN 1 ELSE 0 END)
           |      AS DOUBLE)
           |    / SUM(CASE WHEN b THEN 1 ELSE 0 END)
           |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS null_rate_b,
           |  CAST(ROUND(CAST(
           |    CAST(SUM(CASE WHEN b AND $c IS NULL THEN 1 ELSE 0 END)
           |      AS DOUBLE)
           |    / SUM(CASE WHEN b THEN 1 ELSE 0 END)
           |    - CAST(SUM(CASE WHEN a AND $c IS NULL THEN 1 ELSE 0 END)
           |      AS DOUBLE)
           |    / SUM(CASE WHEN a THEN 1 ELSE 0 END)
           |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS null_rate_delta
           |FROM s""".stripMargin
      s"""WITH s AS (SELECT *,
         |  o_orderstatus = 'F' AS a, o_orderstatus = 'O' AS b
         |  FROM orders WHERE o_orderstatus IN ('F', 'O'))
         |SELECT * FROM (
         |${colSql("o_custkey")}
         |UNION ALL
         |${colSql("o_orderpriority")}
         |UNION ALL
         |${colSql("o_totalprice")}
         |) ORDER BY col_name""".stripMargin
    },

    // Mann–Kendall: S is exact integer sign arithmetic over the
    // theilSen pair set; one division for tau through DECIMAL(18,8).
    "x204_mann_kendall" ->
      s"""WITH $dailyCte,
         |p AS (SELECT a.user_id AS u,
         |  CASE WHEN b.demand > a.demand THEN 1
         |       WHEN b.demand < a.demand THEN -1 ELSE 0 END AS sg
         |  FROM daily a JOIN daily b
         |    ON a.user_id = b.user_id AND a.day < b.day),
         |s AS (SELECT u, CAST(SUM(sg) AS BIGINT) AS s_stat
         |  FROM p GROUP BY 1),
         |n AS (SELECT user_id, COUNT(*) AS n_obs FROM daily GROUP BY 1)
         |SELECT n.user_id, n.n_obs, s.s_stat,
         |  CAST(ROUND(CAST(
         |    2.0e0 * CAST(s.s_stat AS DOUBLE)
         |      / CAST(n.n_obs * (n.n_obs - 1) AS DOUBLE)
         |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS tau
         |FROM s JOIN n ON s.u = n.user_id
         |ORDER BY n.user_id""".stripMargin,

    // CUSUM drift: μ/σ from exact decimal moments (one sqrt, IEEE),
    // the max-clipped recursion as the ordered-fold parity pattern
    // (x187/x198) with an ARRAY accumulator [S+, S-, maxS+, maxS-].
    "x205_cusum_drift" ->
      s"""WITH $dailyCte,
         |ag AS (SELECT user_id, COUNT(*) AS n_obs,
         |  CAST(SUM(CAST(demand AS DECIMAL(18,6))) AS DECIMAL(24,6))
         |    AS sv,
         |  CAST(SUM(CAST(CAST(demand AS DECIMAL(18,6))
         |      * CAST(demand AS DECIMAL(18,6)) AS DECIMAL(24,12)))
         |    AS DECIMAL(24,12)) AS svv,
         |  list(CAST(CAST(demand AS DECIMAL(18,6)) AS DOUBLE)
         |    ORDER BY day) AS ys
         |  FROM daily GROUP BY 1),
         |m AS (SELECT user_id, n_obs, ys,
         |  CAST(ROUND(CAST(CAST(sv AS DOUBLE) / n_obs
         |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS mu,
         |  CASE WHEN n_obs < 2 THEN 0.0e0
         |  ELSE CAST(ROUND(CAST(SQRT(GREATEST(0.0e0,
         |    (CAST(svv AS DOUBLE)
         |      - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / n_obs)
         |    / (n_obs - 1)))
         |    AS DECIMAL(18,8)), 6) AS DOUBLE) END AS sd
         |  FROM ag),
         |f AS (SELECT user_id, n_obs, mu, sd,
         |  list_reduce(
         |    list_prepend([0.0e0, 0.0e0, 0.0e0, 0.0e0],
         |      [[y, 0.0e0, 0.0e0, 0.0e0] for y in ys]),
         |    (acc, xw) -> [
         |      GREATEST(0.0e0, acc[1] + (xw[1] - mu - 0.5e0 * sd)),
         |      GREATEST(0.0e0, acc[2] + (mu - 0.5e0 * sd - xw[1])),
         |      GREATEST(acc[3], GREATEST(0.0e0,
         |        acc[1] + (xw[1] - mu - 0.5e0 * sd))),
         |      GREATEST(acc[4], GREATEST(0.0e0,
         |        acc[2] + (mu - 0.5e0 * sd - xw[1])))]) AS rs
         |  FROM m)
         |SELECT user_id, n_obs, mu AS mean, sd,
         |  CAST(ROUND(CAST(rs[3] AS DECIMAL(18,8)), 4) AS DOUBLE)
         |    AS max_cusum_up,
         |  CAST(ROUND(CAST(rs[4] AS DECIMAL(18,8)), 4) AS DOUBLE)
         |    AS max_cusum_down,
         |  CAST(ROUND(CAST(GREATEST(rs[3], rs[4]) AS DECIMAL(18,8)), 4)
         |    > ROUND(CAST(4.0e0 * sd AS DECIMAL(18,8)), 4) AS BIGINT)
         |    AS drift
         |FROM f ORDER BY user_id""".stripMargin,

    // Lexical richness: whitespace tokens (the repo-wide convention,
    // split('', ' ') = [''] on both engines), exact counts, two
    // divisions through DECIMAL(18,8).
    "x206_lexical_richness" ->
      """WITH tk AS (SELECT doc_id,
        |  unnest(string_split(text, ' ')) AS t FROM documents),
        |ct AS (SELECT doc_id, t, COUNT(*) AS n FROM tk GROUP BY 1, 2),
        |d AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens,
        |  COUNT(*) AS n_types,
        |  CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hapax
        |  FROM ct GROUP BY 1)
        |SELECT doc_id, n_tokens, n_types, n_hapax,
        |  CAST(ROUND(CAST(CAST(n_types AS DOUBLE) / n_tokens
        |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS ttr,
        |  CAST(ROUND(CAST(CAST(n_hapax AS DOUBLE) / n_tokens
        |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS hapax_rate
        |FROM d ORDER BY doc_id""".stripMargin,

    // Deterministic mode: rank by count desc, null-last, value asc —
    // the engine's min(struct(−n, nullFlag, v)) argmin, spelled as a
    // window.
    "x207_mode_per_group" ->
      """WITH c AS (SELECT o_orderstatus, o_orderpriority AS v,
        |  COUNT(*) AS n FROM orders GROUP BY 1, 2),
        |t AS (SELECT o_orderstatus, CAST(SUM(n) AS BIGINT) AS tot
        |  FROM c GROUP BY 1),
        |r AS (SELECT o_orderstatus, v, n, ROW_NUMBER() OVER (
        |  PARTITION BY o_orderstatus
        |  ORDER BY n DESC, (v IS NULL), v) AS rk FROM c)
        |SELECT r.o_orderstatus, r.v AS mode, r.n AS n_mode,
        |  CAST(ROUND(CAST(CAST(r.n AS DOUBLE) / t.tot
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS mode_share
        |FROM r JOIN t ON r.o_orderstatus = t.o_orderstatus
        |WHERE r.rk = 1 ORDER BY r.o_orderstatus""".stripMargin,

    // Value entropy: each −p·ln p term rounds to DECIMAL(18,8) BEFORE
    // the exact decimal sum (round-then-add — double addition order
    // differs between engines, decimal addition cannot).
    "x209_value_entropy" ->
      """WITH c AS (SELECT o_orderstatus, o_orderpriority AS v,
        |  COUNT(*) AS n FROM orders GROUP BY 1, 2),
        |w AS (SELECT o_orderstatus, n,
        |  SUM(n) OVER (PARTITION BY o_orderstatus) AS tot FROM c),
        |t AS (SELECT o_orderstatus, n, tot,
        |  CAST(ROUND(CAST(
        |    -(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)
        |      * ln(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)))
        |    AS DECIMAL(18,8)), 8) AS DECIMAL(18,8)) AS term FROM w),
        |g AS (SELECT o_orderstatus, COUNT(*) AS n_values,
        |  CAST(MIN(tot) AS BIGINT) AS n_rows, SUM(term) AS h
        |  FROM t GROUP BY 1)
        |SELECT o_orderstatus, n_values, n_rows,
        |  CAST(ROUND(CAST(h AS DECIMAL(18,8)), 4) AS DOUBLE) AS entropy,
        |  CASE WHEN n_values > 1 THEN
        |    CAST(ROUND(CAST(CAST(h AS DOUBLE)
        |      / ln(CAST(n_values AS DOUBLE))
        |      AS DECIMAL(18,8)), 4) AS DOUBLE) END AS norm_entropy
        |FROM g ORDER BY o_orderstatus""".stripMargin,

    // Token entropy: x209's discipline per document over whitespace
    // tokens.
    "x210_token_entropy" ->
      """WITH tk AS (SELECT doc_id,
        |  unnest(string_split(text, ' ')) AS t FROM documents),
        |c AS (SELECT doc_id, t, COUNT(*) AS n FROM tk GROUP BY 1, 2),
        |w AS (SELECT doc_id, n,
        |  SUM(n) OVER (PARTITION BY doc_id) AS tot FROM c),
        |tt AS (SELECT doc_id, n, tot,
        |  CAST(ROUND(CAST(
        |    -(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)
        |      * ln(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)))
        |    AS DECIMAL(18,8)), 8) AS DECIMAL(18,8)) AS term FROM w),
        |g AS (SELECT doc_id, COUNT(*) AS n_types,
        |  CAST(MIN(tot) AS BIGINT) AS n_tokens, SUM(term) AS h
        |  FROM tt GROUP BY 1)
        |SELECT doc_id, n_tokens, n_types,
        |  CAST(ROUND(CAST(h AS DECIMAL(18,8)), 4) AS DOUBLE) AS entropy,
        |  CASE WHEN n_types > 1 THEN
        |    CAST(ROUND(CAST(CAST(h AS DOUBLE)
        |      / ln(CAST(n_types AS DOUBLE))
        |      AS DECIMAL(18,8)), 4) AS DOUBLE) END AS norm_entropy
        |FROM g ORDER BY doc_id""".stripMargin,

    // Holt–Winters additive seasonal: the x198 list_reduce fold with a
    // ROTATING ring accumulator [l, b, S_next..S_last] (length 9 for
    // the weekly season); init arithmetic spelled as the engine's
    // left-associated doubles; smoothing literals shared via CAST of
    // the Scala-rendered strings (never re-derived per engine).
    "x211_holt_winters" -> {
      val s = 7
      val (alpha, gamma, delta) = (0.3, 0.1, 0.2)
      val (bA, bG, bD) = (1.0 - alpha, 1.0 - gamma, 1.0 - delta)
      def lit(d: Double) = s"CAST('$d' AS DOUBLE)"
      def seasonMean(off: Int): String =
        "(" + (1 to s).map(i => s"ys[${off + i}]").mkString(" + ") +
          ") / 7.0e0"
      val l0 = s"(${seasonMean(0)})"
      val b0 = s"((${seasonMean(s)}) - ${seasonMean(0)}) / 7.0e0"
      val initArr = (Seq(l0, b0) ++
        (1 to s).map(i => s"ys[$i] - $l0")).mkString(", ")
      val newL = s"${lit(alpha)} * (xw[1] - acc[3]) " +
        s"+ ${lit(bA)} * (acc[1] + acc[2])"
      val newB = s"${lit(gamma)} * (($newL) - acc[1]) " +
        s"+ ${lit(bG)} * acc[2]"
      val newS = s"${lit(delta)} * (xw[1] - ($newL)) " +
        s"+ ${lit(bD)} * acc[3]"
      val rotated = (4 to s + 2).map(i => s"acc[$i]").mkString(", ")
      val zeros = (1 to s + 1).map(_ => "0.0e0").mkString(", ")
      s"""WITH $dailyCte,
         |ag AS (SELECT user_id, COUNT(*) AS n_obs,
         |  list(CAST(CAST(demand AS DECIMAL(18,6)) AS DOUBLE)
         |    ORDER BY day) AS ys
         |  FROM daily GROUP BY 1),
         |f AS (SELECT user_id, n_obs,
         |  list_reduce(
         |    list_prepend([$initArr],
         |      [[v, $zeros] for v in ys[${s + 1}:]]),
         |    (acc, xw) -> [$newL, $newB, $rotated, $newS]) AS r
         |  FROM ag WHERE n_obs >= ${2 * s})
         |SELECT user_id, n_obs,
         |  CAST(ROUND(CAST(r[1] AS DECIMAL(18,8)), 4) AS DOUBLE)
         |    AS level,
         |  CAST(ROUND(CAST(r[2] AS DECIMAL(18,8)), 4) AS DOUBLE)
         |    AS trend,
         |  CAST(ROUND(CAST(r[1] + r[2] + r[3] AS DECIMAL(18,8)), 4)
         |    AS DOUBLE) AS hw_forecast
         |FROM f ORDER BY user_id""".stripMargin
    },

    // Seasonal/trend strength: the x139 decomposition chain, components
    // quantized to DECIMAL(12,4), exact moment sums, one double chain
    // per variance mirrored in the engine's association.
    "x212_seasonal_strength" ->
      s"""WITH $decomposeCtes,
         |parts AS (SELECT dw.user_id,
         |  CAST(ROUND(y - trend - seasonal, 4) AS DECIMAL(12,4)) AS r,
         |  CAST(ROUND(seasonal, 4) AS DECIMAL(12,4))
         |    + CAST(ROUND(y - trend - seasonal, 4) AS DECIMAL(12,4))
         |    AS sr,
         |  CAST(ROUND(trend, 4) AS DECIMAL(12,4))
         |    + CAST(ROUND(y - trend - seasonal, 4) AS DECIMAL(12,4))
         |    AS tr2
         |  FROM dw JOIN se ON dw.user_id = se.user_id
         |    AND dw.dow = se.dow
         |  WHERE trend IS NOT NULL),
         |m AS (SELECT user_id, COUNT(*) AS n_days,
         |  CAST(SUM(r) AS DECIMAL(18,4)) AS s_r,
         |  CAST(SUM(CAST(r * r AS DECIMAL(24,8))) AS DECIMAL(24,8))
         |    AS q_r,
         |  CAST(SUM(sr) AS DECIMAL(18,4)) AS s_sr,
         |  CAST(SUM(CAST(sr * sr AS DECIMAL(24,8))) AS DECIMAL(24,8))
         |    AS q_sr,
         |  CAST(SUM(tr2) AS DECIMAL(18,4)) AS s_tr,
         |  CAST(SUM(CAST(tr2 * tr2 AS DECIMAL(24,8))) AS DECIMAL(24,8))
         |    AS q_tr
         |  FROM parts GROUP BY 1 HAVING COUNT(*) >= 2),
         |v AS (SELECT user_id, n_days,
         |  (CAST(q_r AS DOUBLE) - CAST(s_r AS DOUBLE)
         |    * CAST(s_r AS DOUBLE) / n_days) / (n_days - 1) AS vr,
         |  (CAST(q_sr AS DOUBLE) - CAST(s_sr AS DOUBLE)
         |    * CAST(s_sr AS DOUBLE) / n_days) / (n_days - 1) AS vsr,
         |  (CAST(q_tr AS DOUBLE) - CAST(s_tr AS DOUBLE)
         |    * CAST(s_tr AS DOUBLE) / n_days) / (n_days - 1) AS vtr
         |  FROM m)
         |SELECT user_id, n_days,
         |  CASE WHEN vsr > 0 THEN
         |    CAST(ROUND(CAST(GREATEST(0.0e0, 1.0e0 - vr / vsr)
         |      AS DECIMAL(18,8)), 4) AS DOUBLE) END AS strength_seasonal,
         |  CASE WHEN vtr > 0 THEN
         |    CAST(ROUND(CAST(GREATEST(0.0e0, 1.0e0 - vr / vtr)
         |      AS DECIMAL(18,8)), 4) AS DOUBLE) END AS strength_trend
         |FROM v ORDER BY user_id""".stripMargin,

    // Lead–lag cross-correlation: the portable `corr` (the x126
    // precedent) over one windowed pass; per-lag rows via UNION ALL.
    // day-lag semantics (r13 ADVICE): y replicates across lags with
    // its day shifted, ONE calendar-day equijoin pairs x_d with
    // y_{d+k} — a gap in either series yields no pair, never a
    // positionally mis-aligned one
    "x213_leadlag_corr" ->
      """WITH d AS (SELECT event_type AS k,
        |  CAST(date_trunc('day', ts) AS DATE) AS day,
        |  SUM(CAST(value AS DECIMAL(18,2))) AS v
        |  FROM events GROUP BY 1, 2),
        |a AS (SELECT day, CAST(CAST(v AS DECIMAL(18,6)) AS DOUBLE)
        |  AS x FROM d WHERE k = 'signup'),
        |b AS (SELECT day, CAST(CAST(v AS DECIMAL(18,6)) AS DOUBLE)
        |  AS y FROM d WHERE k = 'purchase'),
        |spine AS (SELECT CAST(g AS BIGINT) AS lag
        |  FROM generate_series(-7, 7) t(g)),
        |bs AS (SELECT s.lag, b.day - CAST(s.lag AS INT) AS ds, b.y
        |  FROM b CROSS JOIN spine s),
        |p AS (SELECT bs.lag, a.x, bs.y
        |  FROM a JOIN bs ON a.day = bs.ds),
        |g AS (SELECT lag, COUNT(*) AS n_pairs,
        |  ROUND(corr(x, y), 4) AS xcorr FROM p GROUP BY 1)
        |SELECT spine.lag, COALESCE(g.n_pairs, 0) AS n_pairs, g.xcorr
        |FROM spine LEFT JOIN g USING (lag)
        |ORDER BY lag""".stripMargin,

    // ABC–XYZ: x144's revenue classes crossed with weekly-CV classes;
    // cv through one mirrored double chain, ROUNDed before the class
    // compare.
    "x214_abc_xyz" ->
      """WITH li AS (SELECT l_partkey AS key, l_shipdate,
        |  ROUND(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(28,6)), 2) AS amount, l_quantity AS qty
        |  FROM lineitem),
        |pk AS (SELECT key, SUM(CAST(amount AS DECIMAL(28,2))) AS rev
        |  FROM li GROUP BY 1),
        |w AS (SELECT key, rev,
        |  SUM(rev) OVER (ORDER BY rev DESC, key
        |    ROWS UNBOUNDED PRECEDING) AS cum,
        |  SUM(rev) OVER () AS tot FROM pk),
        |s AS (SELECT key, rev,
        |  ROUND(CAST(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE)
        |    AS DECIMAL(18,8)), 6) AS sh FROM w),
        |abc AS (SELECT key, ROUND(CAST(rev AS DOUBLE), 2) AS revenue,
        |  CASE WHEN sh <= 0.8 THEN 'A' WHEN sh <= 0.95 THEN 'B'
        |    ELSE 'C' END AS abc_class FROM s),
        |wk AS (SELECT key, date_trunc('week', l_shipdate) AS w,
        |  CAST(SUM(CAST(qty AS DECIMAL(12,6))) AS DECIMAL(12,6)) AS q
        |  FROM li GROUP BY 1, 2),
        |m AS (SELECT key, COUNT(*) AS n_weeks,
        |  CAST(SUM(q) AS DECIMAL(18,6)) AS sq,
        |  CAST(SUM(CAST(q * q AS DECIMAL(24,12))) AS DECIMAL(24,12))
        |    AS qq
        |  FROM wk GROUP BY 1),
        |c AS (SELECT key, n_weeks,
        |  CASE WHEN n_weeks >= 2 AND sq > 0 THEN
        |    ROUND(CAST(
        |      SQRT((CAST(qq AS DOUBLE) - CAST(sq AS DOUBLE)
        |          * CAST(sq AS DOUBLE) / n_weeks) / (n_weeks - 1))
        |      / (CAST(sq AS DOUBLE) / n_weeks)
        |      AS DECIMAL(18,8)), 4) END AS cv
        |  FROM m)
        |SELECT abc.key, revenue, abc_class, c.n_weeks,
        |  CAST(cv AS DOUBLE) AS cv,
        |  CASE WHEN cv IS NULL THEN 'Z' WHEN cv <= 0.5 THEN 'X'
        |    WHEN cv <= 1.0 THEN 'Y' ELSE 'Z' END AS xyz_class,
        |  abc_class || CASE WHEN cv IS NULL THEN 'Z'
        |    WHEN cv <= 0.5 THEN 'X' WHEN cv <= 1.0 THEN 'Y'
        |    ELSE 'Z' END AS cell
        |FROM abc JOIN c ON abc.key = c.key
        |ORDER BY abc.key""".stripMargin,

    // Dup-cluster profile: exact-dup clusters (min doc_id per text),
    // size histogram + non-canonical char savings — all exact ints.
    "x215_dup_cluster_profile" ->
      """WITH cl AS (SELECT doc_id,
        |  MIN(doc_id) OVER (PARTITION BY text) AS cluster, n_chars
        |  FROM documents),
        |per AS (SELECT cluster, COUNT(*) AS sz,
        |  CAST(SUM(CASE WHEN doc_id <> cluster THEN n_chars ELSE 0 END)
        |    AS BIGINT) AS saved
        |  FROM cl GROUP BY 1)
        |SELECT sz AS cluster_size, COUNT(*) AS n_clusters,
        |  CAST(SUM(sz) AS BIGINT) AS n_docs,
        |  CAST(SUM(saved) AS BIGINT) AS chars_saved
        |FROM per GROUP BY 1 ORDER BY cluster_size""".stripMargin,

    // Price-change profile: weekly unit price as ONE stabilized
    // division to exact cents, then pure decimal delta arithmetic.
    "x216_price_changes" ->
      """WITH wk AS (SELECT l_partkey AS key,
        |  date_trunc('week', l_shipdate) AS w,
        |  CAST(ROUND(CAST(
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
        |    / CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
        |    AS DECIMAL(18,8)), 2) AS DECIMAL(19,2)) AS p
        |  FROM lineitem
        |  WHERE l_quantity > 0 AND l_extendedprice IS NOT NULL
        |  GROUP BY 1, 2),
        |d AS (SELECT key, p,
        |  p - lag(p) OVER (PARTITION BY key ORDER BY w) AS dp FROM wk),
        |g AS (SELECT key, COUNT(*) AS n_weeks,
        |  CAST(SUM(CASE WHEN dp IS NOT NULL AND dp <> 0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
        |  MAX(ABS(dp)) AS maxj, SUM(ABS(dp)) AS sumj,
        |  COUNT(dp) AS nd
        |  FROM d GROUP BY 1 HAVING COUNT(*) >= 2)
        |SELECT key, n_weeks, n_changes,
        |  CAST(maxj AS DOUBLE) AS max_abs_jump,
        |  CAST(ROUND(CAST(CAST(sumj AS DOUBLE) / nd
        |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS mean_abs_change
        |FROM g ORDER BY key""".stripMargin,

    // Conversion latency: first click → first purchase at/after it;
    // µs → seconds in ONE double division, exact p50/p90 via the
    // shared quantile CTEs.
    "x217_conversion_latency" ->
      s"""WITH c AS (SELECT user_id, MIN(ts) AS c FROM events
         |  WHERE event_type = 'click' GROUP BY 1),
         |p AS (SELECT e.user_id, c.c, MIN(e.ts) AS p
         |  FROM events e JOIN c ON e.user_id = c.user_id
         |  WHERE e.event_type = 'purchase' AND e.ts >= c.c
         |  GROUP BY 1, 2),
         |l AS (SELECT
         |  CAST(epoch_us(p) - epoch_us(c) AS DOUBLE) / 1000000.0e0
         |    AS lat FROM p),
         |${exactQuantileCtes("l", Seq(), "lat",
             Seq("p50_seconds" -> 500, "p90_seconds" -> 900), 6, "q")},
         |n AS (SELECT COUNT(*) AS n_conversions FROM l)
         |SELECT n.n_conversions,
         |  CAST(qq.p50_seconds AS DOUBLE) AS p50_seconds,
         |  CAST(qq.p90_seconds AS DOUBLE) AS p90_seconds
         |FROM n CROSS JOIN qq""".stripMargin,

    // Degree assortativity: the x141 canon co-purchase edges, both
    // orientations, Pearson r from exact decimal degree moments.
    "x218_assortativity" ->
      """WITH oi AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i
        |  FROM lineitem),
        |e0 AS (SELECT l.i AS x, r.i AS y
        |  FROM oi l JOIN oi r ON l.o = r.o AND l.i < r.i
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |canon AS (SELECT DISTINCT
        |    least(CAST(x AS VARCHAR), CAST(y AS VARCHAR)) AS a,
        |    greatest(CAST(x AS VARCHAR), CAST(y AS VARCHAR)) AS b
        |  FROM e0 WHERE CAST(x AS VARCHAR) <> CAST(y AS VARCHAR)),
        |deg AS (SELECT n, COUNT(*) AS d FROM (
        |    SELECT a AS n FROM canon UNION ALL SELECT b FROM canon)
        |  GROUP BY 1),
        |m AS (SELECT COUNT(*) AS ne,
        |  SUM(CAST(da.d + db.d AS DECIMAL(28,6))) AS s,
        |  SUM(CAST(da.d * db.d AS DECIMAL(28,6))) AS sp,
        |  SUM(CAST(da.d * da.d + db.d * db.d AS DECIMAL(28,6))) AS sq
        |  FROM canon c JOIN deg da ON c.a = da.n
        |  JOIN deg db ON c.b = db.n)
        |SELECT CAST(ne AS BIGINT) AS n_edges,
        |  CAST(ROUND(CAST(CASE WHEN
        |      CAST(ne * 2 AS DOUBLE) * CAST(sq AS DOUBLE)
        |        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) > 0
        |    THEN (CAST(ne * 2 AS DOUBLE)
        |        * (2.0e0 * CAST(sp AS DOUBLE))
        |        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
        |      / (CAST(ne * 2 AS DOUBLE) * CAST(sq AS DOUBLE)
        |        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
        |    END AS DECIMAL(18,8)), 4) AS DOUBLE) AS assortativity
        |FROM m""".stripMargin,

    // Kruskal-Wallis: midranks per distinct value (cumulative window
    // over VALUE cardinality), exact decimal rank sums, round-then-add
    // group terms, tie correction.
    "x219_kruskal_wallis" ->
      """WITH raw AS (SELECT CAST(event_type AS VARCHAR) AS g,
        |  CAST(value AS DOUBLE) AS v FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |pv AS (SELECT v, COUNT(*) AS n FROM raw GROUP BY 1),
        |rk AS (SELECT v,
        |  COALESCE(SUM(n) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + (n + 1) / 2.0e0 AS r FROM pv),
        |bg AS (SELECT g, COUNT(*) AS ng,
        |  SUM(CAST(r AS DECIMAL(28,6))) AS sr
        |  FROM raw JOIN rk USING (v) GROUP BY 1),
        |tt AS (SELECT SUM(n) AS nn, SUM(n*n*n - n) AS t FROM pv),
        |tm AS (SELECT COUNT(*) AS ngroups,
        |  SUM(ROUND(CAST(CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / ng
        |    AS DECIMAL(28,8)), 8)) AS s FROM bg)
        |SELECT CAST(nn AS BIGINT) AS n,
        |  CAST(ngroups AS BIGINT) AS n_groups,
        |  CAST(ROUND(CAST(12.0e0 * CAST(s AS DOUBLE)
        |      / (CAST(nn AS DOUBLE) * (nn + 1)) - 3.0e0 * (nn + 1)
        |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS h,
        |  CAST(ROUND(CAST(CASE WHEN nn*nn*nn - nn > t THEN
        |      (12.0e0 * CAST(s AS DOUBLE)
        |        / (CAST(nn AS DOUBLE) * (nn + 1)) - 3.0e0 * (nn + 1))
        |      / (1.0e0 - CAST(t AS DOUBLE)
        |        / (CAST(nn AS DOUBLE) * nn * nn - nn))
        |    END AS DECIMAL(18,8)), 4) AS DOUBLE) AS h_tie_corrected
        |FROM tm CROSS JOIN tt""".stripMargin,

    // Log-rank: kaplanMeier lifetimes split by the x167 md5 halves;
    // at-risk via duration-cardinality cumulative windows; E and V
    // terms round-then-add at 8dp.
    "x220_logrank" ->
      """WITH pu AS (SELECT user_id,
        |  CAST(MIN(ts) AS DATE) AS f, CAST(MAX(ts) AS DATE) AS l,
        |  MAX(CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
        |    < '8' THEN 1 ELSE 0 END) AS ga
        |  FROM events GROUP BY 1),
        |g AS (SELECT CAST(MAX(ts) AS DATE) AS gmax FROM events),
        |lt AS (SELECT
        |  CAST(date_diff('day', f, l) AS BIGINT) AS dur,
        |  CASE WHEN date_diff('day', l, gmax) >= 3 THEN 1 ELSE 0 END
        |    AS ev, ga
        |  FROM pu CROSS JOIN g),
        |bd AS (SELECT dur, COUNT(*) AS n, SUM(ev) AS d,
        |  SUM(ga) AS na, SUM(ev * ga) AS da FROM lt GROUP BY 1),
        |t AS (SELECT COUNT(*) AS tot, SUM(ga) AS tota FROM lt),
        |rk AS (SELECT dur, n, d, na, da, tot, tota,
        |  tot - COALESCE(SUM(n) OVER (ORDER BY dur
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS risk,
        |  tota - COALESCE(SUM(na) OVER (ORDER BY dur
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS riska
        |  FROM bd CROSS JOIN t),
        |f2 AS (SELECT * FROM rk WHERE d >= 1),
        |s AS (SELECT MAX(tota) AS na2, MAX(tot) AS tot2,
        |  CAST(SUM(da) AS BIGINT) AS observed_a,
        |  SUM(ROUND(CAST(CAST(d AS DOUBLE)
        |    * (CAST(riska AS DOUBLE) / CAST(risk AS DOUBLE))
        |    AS DECIMAL(18,8)), 8)) AS e,
        |  SUM(ROUND(CAST(CASE WHEN risk > 1 THEN
        |      CAST(d AS DOUBLE)
        |      * (CAST(riska AS DOUBLE) / CAST(risk AS DOUBLE))
        |      * (1.0e0 - CAST(riska AS DOUBLE) / CAST(risk AS DOUBLE))
        |      * CAST(risk - d AS DOUBLE) / CAST(risk - 1 AS DOUBLE)
        |    ELSE 0.0e0 END AS DECIMAL(18,8)), 8)) AS v
        |  FROM f2)
        |SELECT CAST(na2 AS BIGINT) AS n_a,
        |  CAST(tot2 - na2 AS BIGINT) AS n_b, observed_a,
        |  CAST(ROUND(CAST(e AS DECIMAL(18,8)), 4) AS DOUBLE)
        |    AS expected_a,
        |  CAST(ROUND(CAST(CASE WHEN v > 0 THEN
        |      (CAST(observed_a AS DOUBLE) - CAST(e AS DOUBLE))
        |      * (CAST(observed_a AS DOUBLE) - CAST(e AS DOUBLE))
        |      / CAST(v AS DOUBLE)
        |    END AS DECIMAL(18,8)), 4) AS DOUBLE) AS chi2
        |FROM s""".stripMargin,

    // Gains/lift: exact-quantile decile cutoffs (the x128 machinery),
    // band = k - (# cutoffs exceeded), bounded cumulative over the
    // 10-row band table.
    "x221_gains_table" -> {
      val cuts = (1 to 9).map(i => s"q$i" -> i * 100)
      val bandExpr = (1 to 9).map(i => s"CAST(s > q$i AS INT)")
        .mkString(" + ")
      s"""WITH rws AS (SELECT CAST(o_totalprice AS DOUBLE) AS s,
         |  CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
         |    AS y
         |  FROM orders
         |  WHERE o_totalprice IS NOT NULL
         |    AND o_orderpriority IS NOT NULL),
         |${exactQuantileCtes("rws", Seq(), "s", cuts, 6, "g")},
         |b AS (SELECT 10 - ($bandExpr) AS band, y
         |  FROM rws CROSS JOIN gq),
         |bb AS (SELECT band, COUNT(*) AS n, SUM(y) AS n_pos
         |  FROM b GROUP BY 1),
         |c AS (SELECT band, n, n_pos,
         |  SUM(n) OVER (ORDER BY band
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
         |  SUM(n_pos) OVER (ORDER BY band
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
         |  SUM(n) OVER () AS tn, SUM(n_pos) OVER () AS tp FROM bb)
         |SELECT CAST(band AS BIGINT) AS band, CAST(n AS BIGINT) AS n,
         |  CAST(n_pos AS BIGINT) AS n_pos,
         |  CAST(ROUND(CAST(CASE WHEN tp > 0 THEN
         |      CAST(cp AS DOUBLE) / CAST(tp AS DOUBLE)
         |    END AS DECIMAL(18,8)), 6) AS DOUBLE) AS cum_capture,
         |  CAST(ROUND(CAST(CASE WHEN tp > 0 AND cn > 0 THEN
         |      (CAST(cp AS DOUBLE) / CAST(cn AS DOUBLE))
         |      / (CAST(tp AS DOUBLE) / CAST(tn AS DOUBLE))
         |    END AS DECIMAL(18,8)), 6) AS DOUBLE) AS cum_lift
         |FROM c ORDER BY band""".stripMargin
    },

    // Value coverage: distinct values by (count desc, value), integer-
    // exact crossing compares (cum*100 vs pct*N).
    "x222_value_coverage" ->
      """WITH pv AS (SELECT CAST(l_partkey AS VARCHAR) AS v,
        |  COUNT(*) AS n FROM lineitem WHERE l_partkey IS NOT NULL
        |  GROUP BY 1),
        |c AS (SELECT v, n, SUM(n) OVER (ORDER BY n DESC, v
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM pv),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS nrows,
        |  COUNT(*) AS nd FROM pv)
        |SELECT t.nrows AS n_rows, t.nd AS n_distinct,
        |  CAST(SUM(CASE WHEN cum * 100 < 50 * t.nrows THEN 1 ELSE 0
        |    END) + 1 AS BIGINT) AS k50,
        |  CAST(SUM(CASE WHEN cum * 100 < 90 * t.nrows THEN 1 ELSE 0
        |    END) + 1 AS BIGINT) AS k90,
        |  CAST(SUM(CASE WHEN cum * 100 < 99 * t.nrows THEN 1 ELSE 0
        |    END) + 1 AS BIGINT) AS k99
        |FROM c CROSS JOIN t GROUP BY 1, 2""".stripMargin,

    // Flesch readability: whitespace words, [.!?]+ sentence runs
    // (floored at 1), vowel-group syllables over the whole text.
    "x223_readability" ->
      """WITH c AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
        |  CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
        |    AS BIGINT) AS sn,
        |  CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))
        |    AS BIGINT) AS sy,
        |  LENGTH(text) AS lc
        |  FROM documents)
        |SELECT doc_id, w AS n_words, sn AS n_sentences,
        |  sy AS n_syllables,
        |  CAST(ROUND(CAST(CASE WHEN lc > 0 AND sy > 0 THEN
        |      206.835e0 - 1.015e0 * (CAST(w AS DOUBLE)
        |        / CAST(sn AS DOUBLE))
        |      - 84.6e0 * (CAST(sy AS DOUBLE) / CAST(w AS DOUBLE))
        |    END AS DECIMAL(18,8)), 4) AS DOUBLE) AS flesch
        |FROM c ORDER BY doc_id""".stripMargin,

    // Periodicity scan: fold positions t mod p for p in 2..10, exact
    // per-position decimal sums, round-then-add SS_between terms,
    // one float R2 per (key, period).
    "x224_periodicity_scan" ->
      s"""WITH $dailyCte,
         |r AS (SELECT user_id AS k, day AS d,
         |  CAST(demand AS DECIMAL(18,6)) AS y FROM daily
         |  WHERE demand IS NOT NULL),
         |f0 AS (SELECT k, MIN(d) AS d0 FROM r GROUP BY 1),
         |ix AS (SELECT r.k, date_diff('day', f0.d0, r.d) AS t, y
         |  FROM r JOIN f0 ON r.k = f0.k),
         |mo AS (SELECT k, COUNT(*) AS n,
         |  CAST(SUM(y) AS DECIMAL(24,6)) AS s,
         |  CAST(SUM(CAST(y * y AS DECIMAL(24,12))) AS DECIMAL(24,12))
         |    AS ss FROM ix GROUP BY 1),
         |fo AS (SELECT ix.k, pp.p, ix.t % pp.p AS j,
         |  COUNT(*) AS nj, CAST(SUM(y) AS DECIMAL(24,6)) AS sj
         |  FROM ix CROSS JOIN (SELECT CAST(gg AS INT) AS p
         |    FROM generate_series(2, 10) tt(gg)) pp
         |  GROUP BY 1, 2, 3),
         |wm AS (SELECT fo.k, fo.p,
         |  ROUND(CAST(fo.nj
         |    * (CAST(ROUND(CAST(CAST(fo.sj AS DOUBLE) / fo.nj
         |        AS DECIMAL(18,8)), 6) AS DOUBLE)
         |      - CAST(ROUND(CAST(CAST(mo.s AS DOUBLE) / mo.n
         |        AS DECIMAL(18,8)), 6) AS DOUBLE))
         |    * (CAST(ROUND(CAST(CAST(fo.sj AS DOUBLE) / fo.nj
         |        AS DECIMAL(18,8)), 6) AS DOUBLE)
         |      - CAST(ROUND(CAST(CAST(mo.s AS DOUBLE) / mo.n
         |        AS DECIMAL(18,8)), 6) AS DOUBLE))
         |    AS DECIMAL(18,8)), 8) AS term,
         |  mo.n, mo.s, mo.ss
         |  FROM fo JOIN mo ON fo.k = mo.k),
         |ag AS (SELECT k, p, MAX(n) AS n_obs, SUM(term) AS ssb,
         |  MAX(ss) AS ss2, MAX(s) AS s2 FROM wm GROUP BY 1, 2)
         |SELECT k AS user_id, CAST(p AS BIGINT) AS period,
         |  CAST(n_obs AS BIGINT) AS n_obs,
         |  CAST(ROUND(CAST(CASE WHEN
         |      CAST(ss2 AS DOUBLE) - CAST(n_obs AS DOUBLE)
         |        * CAST(ROUND(CAST(CAST(s2 AS DOUBLE) / n_obs
         |          AS DECIMAL(18,8)), 6) AS DOUBLE)
         |        * CAST(ROUND(CAST(CAST(s2 AS DOUBLE) / n_obs
         |          AS DECIMAL(18,8)), 6) AS DOUBLE) > 0
         |    THEN CAST(ssb AS DOUBLE)
         |      / (CAST(ss2 AS DOUBLE) - CAST(n_obs AS DOUBLE)
         |        * CAST(ROUND(CAST(CAST(s2 AS DOUBLE) / n_obs
         |          AS DECIMAL(18,8)), 6) AS DOUBLE)
         |        * CAST(ROUND(CAST(CAST(s2 AS DOUBLE) / n_obs
         |          AS DECIMAL(18,8)), 6) AS DOUBLE))
         |    END AS DECIMAL(18,8)), 4) AS DOUBLE) AS r2
         |FROM ag ORDER BY user_id, period""".stripMargin,

    // EWMA chart: the x205 moment/fold machinery with an EWMA
    // recursion and steady-state limits; the limit multiplier is the
    // SAME Scala-computed shortest-round-trip double literal the Spark
    // side folds with, so the violation compares see identical bits.
    "x225_ewma_chart" -> {
      val lambda = 0.2
      val beta = 1.0 - lambda
      val lim = 3.0 * math.sqrt(lambda / (2.0 - lambda))
      val z = s"${lambda}e0 * xw[1] + ${beta}e0 * acc[1]"
      val viol = s"CASE WHEN ($z) > mu + ${lim}e0 * sd " +
        s"OR ($z) < mu - ${lim}e0 * sd THEN 1.0e0 ELSE 0.0e0 END"
      s"""WITH $dailyCte,
         |ag AS (SELECT user_id, COUNT(*) AS n_obs,
         |  CAST(SUM(CAST(demand AS DECIMAL(18,6))) AS DECIMAL(24,6))
         |    AS sv,
         |  CAST(SUM(CAST(CAST(demand AS DECIMAL(18,6))
         |      * CAST(demand AS DECIMAL(18,6)) AS DECIMAL(24,12)))
         |    AS DECIMAL(24,12)) AS svv,
         |  list(CAST(CAST(demand AS DECIMAL(18,6)) AS DOUBLE)
         |    ORDER BY day) AS ys
         |  FROM daily GROUP BY 1),
         |m AS (SELECT user_id, n_obs, ys,
         |  CAST(ROUND(CAST(CAST(sv AS DOUBLE) / n_obs
         |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS mu,
         |  CASE WHEN n_obs < 2 THEN 0.0e0
         |  ELSE CAST(ROUND(CAST(SQRT(GREATEST(0.0e0,
         |    (CAST(svv AS DOUBLE)
         |      - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / n_obs)
         |    / (n_obs - 1)))
         |    AS DECIMAL(18,8)), 6) AS DOUBLE) END AS sd
         |  FROM ag),
         |f AS (SELECT user_id, n_obs, mu, sd,
         |  list_reduce(
         |    list_prepend([mu, 0.0e0, 0.0e0, 1.0e0],
         |      [[y, 0.0e0, 0.0e0, 0.0e0] for y in ys]),
         |    (acc, xw) -> [
         |      $z,
         |      acc[2] + ($viol),
         |      CASE WHEN acc[3] > 0.0e0 THEN acc[3]
         |           WHEN ($viol) = 1.0e0 THEN acc[4]
         |           ELSE 0.0e0 END,
         |      acc[4] + 1.0e0]) AS rs
         |  FROM m)
         |SELECT user_id, n_obs, mu AS mean, sd,
         |  CAST(ROUND(CAST(rs[1] AS DECIMAL(18,8)), 4) AS DOUBLE)
         |    AS ewma_final,
         |  CAST(rs[2] AS BIGINT) AS n_violations,
         |  CASE WHEN rs[3] > 0.0e0 THEN CAST(rs[3] AS BIGINT) END
         |    AS first_violation
         |FROM f ORDER BY user_id""".stripMargin
    },

    // Discount-depth response: exact DECIMAL(4,2) levels, decimal
    // volume sums, one division per share, zero-discount baseline via
    // a left join so a baseline-free input keeps every level.
    "x226_discount_response" ->
      """WITH r AS (SELECT CAST(l_discount AS DECIMAL(4,2)) AS disc,
        |  CAST(l_quantity AS DECIMAL(28,2)) AS q,
        |  CAST(l_extendedprice * (1.0e0 - l_discount)
        |    AS DECIMAL(28,2)) AS rev
        |  FROM lineitem
        |  WHERE l_discount IS NOT NULL AND l_quantity IS NOT NULL),
        |bl AS (SELECT disc, COUNT(*) AS n_lines, SUM(q) AS qty,
        |  SUM(rev) AS rv FROM r GROUP BY 1),
        |t AS (SELECT SUM(q) AS tq, SUM(rev) AS tr FROM r),
        |base AS (SELECT CAST(ROUND(CAST(CAST(qty AS DOUBLE) / n_lines
        |  AS DECIMAL(18,8)), 6) AS DOUBLE) AS b FROM bl
        |  WHERE disc = CAST(0 AS DECIMAL(4,2)))
        |SELECT CAST(bl.disc AS DOUBLE) AS discount, bl.n_lines,
        |  ROUND(CAST(bl.qty AS DOUBLE), 2) AS total_qty,
        |  CAST(ROUND(CAST(CAST(bl.qty AS DOUBLE) / bl.n_lines
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS avg_qty,
        |  CAST(ROUND(CAST(CAST(bl.qty AS DOUBLE) / CAST(t.tq AS DOUBLE)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS qty_share,
        |  CAST(ROUND(CAST(CAST(bl.rv AS DOUBLE) / CAST(t.tr AS DOUBLE)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS rev_share,
        |  CAST(ROUND(CAST(CASE WHEN base.b > 0 THEN
        |      CAST(ROUND(CAST(CAST(bl.qty AS DOUBLE) / bl.n_lines
        |        AS DECIMAL(18,8)), 6) AS DOUBLE) / base.b
        |    END AS DECIMAL(18,8)), 6) AS DOUBLE) AS qty_uplift
        |FROM bl CROSS JOIN t LEFT JOIN base ON TRUE
        |ORDER BY discount""".stripMargin,

    // Cramer's V matrix: one x122 grid per column pair, V from the
    // 4dp-pinned chi2 in one float chain.
    "x228_cramers_v" -> {
      def pair(a: String, b: String, p: String): String =
        s"""${p}c AS (SELECT $a AS a, $b AS b, COUNT(*) AS o FROM li
           |  GROUP BY 1, 2),
           |${p}rt AS (SELECT a, SUM(o) AS ra FROM ${p}c GROUP BY 1),
           |${p}ct AS (SELECT b, SUM(o) AS cb FROM ${p}c GROUP BY 1),
           |${p}t AS (SELECT SUM(o) AS n, COUNT(DISTINCT a) AS r,
           |  COUNT(DISTINCT b) AS c FROM ${p}c),
           |${p}g AS (SELECT a, b, ra, cb, COALESCE(o, 0) AS o
           |  FROM ${p}rt CROSS JOIN ${p}ct
           |  LEFT JOIN ${p}c USING (a, b)),
           |${p}s AS (SELECT
           |  ROUND(SUM((o - CAST(ra AS DOUBLE) * cb / n)
           |      * (o - CAST(ra AS DOUBLE) * cb / n)
           |      / (CAST(ra AS DOUBLE) * cb / n)), 4) AS chi2,
           |  CAST((MAX(r) - 1) * (MAX(c) - 1) AS BIGINT) AS dof,
           |  CAST(MAX(n) AS BIGINT) AS n,
           |  MAX(r) - 1 AS rm1, MAX(c) - 1 AS cm1
           |  FROM ${p}g CROSS JOIN ${p}t)""".stripMargin
      def row(a: String, b: String, p: String): String =
        s"""SELECT '$a' AS col_a, '$b' AS col_b, n, chi2, dof,
           |  CAST(ROUND(CAST(CASE WHEN LEAST(rm1, cm1) >= 1 AND n > 0
           |    THEN SQRT(chi2 / (n * LEAST(rm1, cm1)))
           |    END AS DECIMAL(18,8)), 4) AS DOUBLE) AS cramers_v
           |FROM ${p}s""".stripMargin
      s"""WITH li AS (SELECT l_returnflag, l_linestatus,
         |  'Q' || CAST(quarter(l_shipdate) AS VARCHAR) AS ship_q
         |  FROM lineitem),
         |${pair("l_returnflag", "l_linestatus", "p1")},
         |${pair("l_returnflag", "ship_q", "p2")},
         |${pair("l_linestatus", "ship_q", "p3")}
         |SELECT * FROM (
         |${row("l_returnflag", "l_linestatus", "p1")}
         |UNION ALL
         |${row("l_returnflag", "ship_q", "p2")}
         |UNION ALL
         |${row("l_linestatus", "ship_q", "p3")}
         |) ORDER BY col_a, col_b""".stripMargin
    },

    // HHI: exact decimal entity/group sums, round-then-add share^2
    // terms, top share a max over the same exact shares.
    "x229_hhi" ->
      """WITH j AS (SELECT s.s_nationkey AS nation,
        |  l.l_suppkey AS e,
        |  CAST(l.l_extendedprice AS DECIMAL(28,2)) AS v
        |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE l.l_extendedprice IS NOT NULL),
        |pe AS (SELECT nation, e, SUM(v) AS v FROM j GROUP BY 1, 2),
        |t AS (SELECT nation, SUM(v) AS tot, COUNT(*) AS ne
        |  FROM pe GROUP BY 1)
        |SELECT t.nation, CAST(t.ne AS BIGINT) AS n_entities,
        |  ROUND(CAST(t.tot AS DOUBLE), 2) AS total,
        |  CAST(ROUND(CAST(MAX(CASE WHEN t.tot > 0 THEN
        |      CAST(pe.v AS DOUBLE) / CAST(t.tot AS DOUBLE)
        |    END) AS DECIMAL(18,8)), 6) AS DOUBLE) AS top_share,
        |  CAST(ROUND(CAST(SUM(ROUND(CAST(CASE WHEN t.tot > 0 THEN
        |      (CAST(pe.v AS DOUBLE) / CAST(t.tot AS DOUBLE))
        |      * (CAST(pe.v AS DOUBLE) / CAST(t.tot AS DOUBLE))
        |    END AS DECIMAL(18,8)), 8)) AS DECIMAL(18,8)), 6)
        |    AS DOUBLE) AS hhi
        |FROM pe JOIN t USING (nation)
        |GROUP BY t.nation, t.ne, t.tot ORDER BY 1""".stripMargin,

    // Prefix-duplication rate: one corpus-wide prefix-group count,
    // per-source conditional count, one stabilized division.
    "x230_prefix_dups" ->
      """WITH r AS (SELECT doc_id, source,
        |  substr(text, 1, 40) AS pfx FROM documents),
        |g AS (SELECT pfx, COUNT(*) AS gsz FROM r GROUP BY 1)
        |SELECT r.source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN g.gsz >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_prefix_dup,
        |  CAST(ROUND(CAST(
        |    CAST(SUM(CASE WHEN g.gsz >= 2 THEN 1 ELSE 0 END)
        |      AS DOUBLE) / COUNT(*)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS dup_rate
        |FROM r JOIN g USING (pfx) GROUP BY 1
        |ORDER BY source""".stripMargin,

    // Average precision: cumulative-from-top windows over DISTINCT
    // score cardinality, round-then-add (dTP/P)*precision terms.
    "x232_average_precision" ->
      """WITH s AS (SELECT CAST(value AS DOUBLE) AS sc,
        |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL),
        |g AS (SELECT sc, COUNT(*) AS n, SUM(y) AS p FROM s GROUP BY 1),
        |c AS (SELECT sc, n, p,
        |  SUM(n) OVER (ORDER BY sc DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
        |  SUM(p) OVER (ORDER BY sc DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
        |  SUM(p) OVER () AS np, SUM(n) OVER () AS nt FROM g)
        |SELECT CAST(MAX(np) AS BIGINT) AS n_pos,
        |  CAST(MAX(nt) - MAX(np) AS BIGINT) AS n_neg,
        |  CAST(ROUND(CAST(CASE WHEN MAX(np) > 0 THEN
        |      CAST(SUM(ROUND(CAST(
        |        (CAST(p AS DOUBLE) / np) * (CAST(cp AS DOUBLE) / cn)
        |        AS DECIMAL(18,8)), 8)) AS DOUBLE)
        |    END AS DECIMAL(18,8)), 6) AS DOUBLE) AS average_precision
        |FROM c""".stripMargin,

    // Turning points: strict local extrema via per-key lag/lead,
    // exact counts, one float chain each for E and z.
    "x233_turning_points" ->
      s"""WITH $dailyCte,
         |r AS (SELECT user_id AS k, day AS o,
         |  CAST(demand AS DECIMAL(18,6)) AS y FROM daily
         |  WHERE demand IS NOT NULL),
         |l AS (SELECT k, y,
         |  LAG(y) OVER (PARTITION BY k ORDER BY o) AS pv,
         |  LEAD(y) OVER (PARTITION BY k ORDER BY o) AS nx FROM r),
         |a AS (SELECT k, COUNT(*) AS n_obs,
         |  SUM(CASE WHEN pv IS NOT NULL AND nx IS NOT NULL
         |    AND ((pv < y AND nx < y) OR (pv > y AND nx > y))
         |    THEN 1 ELSE 0 END) AS n_turning FROM l GROUP BY 1)
         |SELECT k AS user_id, n_obs, CAST(n_turning AS BIGINT)
         |    AS n_turning,
         |  CAST(ROUND(CAST(CASE WHEN n_obs >= 3 THEN
         |      2.0e0 * (n_obs - 2) / 3.0e0
         |    END AS DECIMAL(18,8)), 4) AS DOUBLE) AS expected,
         |  CAST(ROUND(CAST(CASE WHEN n_obs >= 3
         |      AND (16.0e0 * n_obs - 29) / 90.0e0 > 0 THEN
         |      (n_turning - 2.0e0 * (n_obs - 2) / 3.0e0)
         |      / SQRT((16.0e0 * n_obs - 29) / 90.0e0)
         |    END AS DECIMAL(18,8)), 4) AS DOUBLE) AS z
         |FROM a ORDER BY user_id""".stripMargin,

    // Theil T: positive values only, 6dp mean, round-then-add
    // (x/mu)ln(x/mu) terms, one final 1/n float step.
    "x231_theil" ->
      """WITH r AS (SELECT event_type AS g,
        |  CAST(value AS DECIMAL(28,6)) AS v FROM events
        |  WHERE value IS NOT NULL AND value > 0),
        |t AS (SELECT g, COUNT(*) AS n, SUM(v) AS s FROM r GROUP BY 1),
        |m AS (SELECT g, n,
        |  CAST(ROUND(CAST(CAST(s AS DOUBLE) / n AS DECIMAL(18,8)), 6)
        |    AS DOUBLE) AS mu FROM t)
        |SELECT m.g AS event_type, CAST(MAX(m.n) AS BIGINT) AS n,
        |  MAX(m.mu) AS mean,
        |  CAST(ROUND(CAST(
        |    CAST(SUM(ROUND(CAST(
        |      (CAST(r.v AS DOUBLE) / m.mu)
        |        * LN(CAST(r.v AS DOUBLE) / m.mu)
        |      AS DECIMAL(18,8)), 8)) AS DOUBLE) / MAX(m.n)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS theil
        |FROM r JOIN m ON r.g = m.g GROUP BY 1
        |ORDER BY event_type""".stripMargin,

    // Robust per-source normalization: the x156 median/MAD exact-
    // quantile chain per source, z emitted per document.
    "x227_robust_normalize" -> {
      s"""WITH rws AS (SELECT doc_id, source AS g,
         |  CAST(n_chars AS DOUBLE) AS vd,
         |  CAST(n_chars AS DECIMAL(18,6)) AS v
         |  FROM documents WHERE n_chars IS NOT NULL),
         |${exactQuantileCtes("rws", Seq("g"), "v",
             Seq("med" -> 500), 6, "m")},
         |ad AS (SELECT r.doc_id, r.g, r.vd, q.med,
         |  CAST(ABS(r.v - q.med) AS DECIMAL(18,6)) AS av
         |  FROM rws r JOIN mq q ON r.g = q.g),
         |${exactQuantileCtes("ad", Seq("g"), "av",
             Seq("mad" -> 500), 6, "d")}
         |SELECT a.doc_id, a.g AS source, a.vd AS value,
         |  CASE WHEN d.mad > 0 THEN
         |    CAST(ROUND(CAST(0.6745e0 * (a.vd - CAST(a.med AS DOUBLE))
         |      / CAST(d.mad AS DOUBLE) AS DECIMAL(18,8)), 4) AS DOUBLE)
         |  END AS robust_z
         |FROM ad a JOIN dq d ON a.g = d.g
         |ORDER BY a.doc_id""".stripMargin
    },

    // Basket-size profile: two exact count aggregates, one division.
    "x208_basket_profile" ->
      """WITH po AS (SELECT l_orderkey, COUNT(*) AS n_lines
        |  FROM lineitem GROUP BY 1),
        |c AS (SELECT n_lines, COUNT(*) AS n_orders FROM po GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS tot FROM c)
        |SELECT c.n_lines, c.n_orders,
        |  CAST(ROUND(CAST(CAST(c.n_orders AS DOUBLE) / t.tot
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS share
        |FROM c CROSS JOIN t ORDER BY c.n_lines""".stripMargin,

    // Growth accounting: distinct (user, week) self-joins, exact
    // integer counts; churn-only weeks survive the full outer join.
    "x179_growth_accounting" ->
      """WITH act AS (SELECT DISTINCT user_id AS u,
        |  CAST(date_trunc('week', ts) AS DATE) AS w FROM events),
        |fst AS (SELECT u, MIN(w) AS w0 FROM act GROUP BY 1),
        |prv AS (SELECT u, w + 7 AS w FROM act),
        |cls AS (SELECT a.w,
        |  SUM(CASE WHEN a.w = fst.w0 THEN 1 ELSE 0 END) AS n_new,
        |  SUM(CASE WHEN a.w <> fst.w0 AND p.u IS NOT NULL
        |    THEN 1 ELSE 0 END) AS n_retained,
        |  SUM(CASE WHEN a.w <> fst.w0 AND p.u IS NULL
        |    THEN 1 ELSE 0 END) AS n_resurrected,
        |  COUNT(*) AS wau
        |  FROM act a JOIN fst ON a.u = fst.u
        |  LEFT JOIN (SELECT DISTINCT u, w FROM prv) p
        |    ON a.u = p.u AND a.w = p.w
        |  GROUP BY a.w),
        |mxw AS (SELECT MAX(w) AS wmax FROM act),
        |chn AS (SELECT p.w, COUNT(*) AS n_churned FROM prv p
        |  LEFT JOIN act ON p.u = act.u AND p.w = act.w
        |  CROSS JOIN mxw
        |  WHERE act.u IS NULL AND p.w <= mxw.wmax GROUP BY 1)
        |SELECT COALESCE(cls.w, chn.w) AS week,
        |  CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new,
        |  CAST(COALESCE(n_retained, 0) AS BIGINT) AS n_retained,
        |  CAST(COALESCE(n_resurrected, 0) AS BIGINT) AS n_resurrected,
        |  CAST(COALESCE(n_churned, 0) AS BIGINT) AS n_churned,
        |  CAST(COALESCE(wau, 0) AS BIGINT) AS wau
        |FROM cls FULL OUTER JOIN chn ON cls.w = chn.w
        |ORDER BY week""".stripMargin,

    // Sequence likelihood: per-user mean of −ln(n_ij/n_i·) terms,
    // each cast DECIMAL(18,10) and summed exactly.
    "x180_sequence_likelihood" ->
      """WITH tr AS (SELECT user_id AS u, event_type AS f,
        |  lead(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS t FROM events),
        |tr2 AS (SELECT u, f, t FROM tr WHERE t IS NOT NULL),
        |mx AS (SELECT f, t, COUNT(*) AS n FROM tr2 GROUP BY 1, 2),
        |ft AS (SELECT f, SUM(n) AS nf FROM mx GROUP BY 1)
        |SELECT u AS user_id, COUNT(*) AS n_transitions,
        |  CAST(ROUND(CAST(
        |    CAST(SUM(CAST((-(ln(n / CAST(nf AS DOUBLE))))
        |      AS DECIMAL(18,10))) AS DOUBLE) / COUNT(*)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS avg_nll
        |FROM tr2 JOIN mx USING (f, t) JOIN ft USING (f)
        |GROUP BY u ORDER BY user_id""".stripMargin,

    // Time-to-convert: two conditional per-user aggregates; integer
    // floor division to seconds on both engines.
    "x176_time_to_convert" ->
      """WITH f AS (SELECT user_id, MIN(epoch_us(ts)) AS fus
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS cus
        |  FROM events e JOIN f ON e.user_id = f.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= f.fus
        |  GROUP BY 1)
        |SELECT user_id,
        |  CAST((cus - fus) // 1000000 AS BIGINT) AS latency_s
        |FROM f LEFT JOIN c USING (user_id)
        |ORDER BY user_id""".stripMargin,

    // Price elasticity: daily revenue quantizes to cents (x144 money
    // contract); ln-moment terms in DECIMAL(28,10), closed-form slope
    // on exact sums with a zero-variance guard.
    "x177_price_elasticity" ->
      """WITH d AS (SELECT l_partkey AS i,
        |  CAST(date_trunc('day', l_shipdate) AS DATE) AS day,
        |  SUM(ROUND(CAST(l_extendedprice AS DECIMAL(28,6)), 2)) AS p,
        |  SUM(CAST(l_quantity AS DECIMAL(28,6))) AS q
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
        |  GROUP BY 1, 2),
        |dd AS (SELECT i, CAST(p AS DOUBLE) AS pd, CAST(q AS DOUBLE) AS qd
        |  FROM d WHERE p > 0 AND q > 0),
        |m AS (SELECT i, COUNT(*) AS n,
        |  SUM(CAST(ln(pd / qd) AS DECIMAL(28,10))) AS sx,
        |  SUM(CAST(ln(qd) AS DECIMAL(28,10))) AS sy,
        |  SUM(CAST(ln(pd / qd) * ln(qd) AS DECIMAL(28,10))) AS sxy,
        |  SUM(CAST(ln(pd / qd) * ln(pd / qd) AS DECIMAL(28,10))) AS sxx
        |  FROM dd GROUP BY 1),
        |z AS (SELECT i, n, CAST(n AS DOUBLE) AS nd,
        |  CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
        |  CAST(sxy AS DOUBLE) AS sxy, CAST(sxx AS DOUBLE) AS sxx FROM m)
        |SELECT i AS l_partkey, CAST(n AS BIGINT) AS n_days,
        |  CAST(ROUND(CAST(CASE
        |    WHEN n >= 3 AND nd * sxx - sx * sx > 1e-9
        |    THEN (nd * sxy - sx * sy) / (nd * sxx - sx * sx) END
        |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS elasticity
        |FROM z ORDER BY l_partkey""".stripMargin,

    // Longest zero-run: gap-explode densify (zero fill), one
    // gaps-and-islands window, argmax run by (len desc, start desc).
    "x178_zero_runs" ->
      s"""WITH $dailyCte,
         |led AS (SELECT user_id, day AS d0, CAST(demand AS DOUBLE)
         |    AS obs,
         |  lead(day) OVER (PARTITION BY user_id ORDER BY day) AS nxt
         |  FROM daily),
         |dense AS (SELECT user_id, d0 + CAST(off AS INTEGER) AS day,
         |  CASE WHEN off = 0 THEN obs ELSE CAST(0.0 AS DOUBLE) END AS v
         |  FROM (SELECT user_id, d0, obs,
         |    unnest(generate_series(0, CASE WHEN nxt IS NULL THEN 0
         |      ELSE date_diff('day', d0, nxt) - 1 END)) AS off
         |    FROM led)),
         |runs0 AS (SELECT user_id, day, v,
         |  SUM(CASE WHEN v <> 0 THEN 1 ELSE 0 END) OVER (
         |    PARTITION BY user_id ORDER BY day
         |    ROWS UNBOUNDED PRECEDING) AS grp FROM dense),
         |runs AS (SELECT user_id, grp, COUNT(*) AS len,
         |  MIN(day) AS start FROM runs0 WHERE v = 0 GROUP BY 1, 2),
         |best AS (SELECT user_id, len, start FROM (
         |  SELECT user_id, len, start, ROW_NUMBER() OVER (
         |    PARTITION BY user_id ORDER BY len DESC, start DESC) AS rn
         |  FROM runs) WHERE rn = 1),
         |tot AS (SELECT user_id, COUNT(*) AS n_days,
         |  SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS n_zero
         |  FROM dense GROUP BY 1)
         |SELECT tot.user_id, CAST(n_days AS BIGINT) AS n_days,
         |  CAST(n_zero AS BIGINT) AS n_zero_days,
         |  CAST(COALESCE(best.len, 0) AS BIGINT) AS zero_run_days,
         |  best.start AS run_start
         |FROM tot LEFT JOIN best USING (user_id)
         |ORDER BY user_id""".stripMargin,

    // Markov entropy rate: one lead window, type²-cardinality counts,
    // each −p·ln P term cast DECIMAL(18,10) and summed exactly.
    "x174_entropy_rate" ->
      """WITH p AS (SELECT event_type AS f,
        |  lead(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS t FROM events),
        |g AS (SELECT f, t, COUNT(*) AS n FROM p WHERE t IS NOT NULL
        |  GROUP BY 1, 2),
        |ft AS (SELECT f, SUM(n) AS nf FROM g GROUP BY 1),
        |tt AS (SELECT CAST(SUM(n) AS DOUBLE) AS nt,
        |  CAST(SUM(n) AS BIGINT) AS nti,
        |  CAST(COUNT(DISTINCT f) AS BIGINT) AS states FROM g)
        |SELECT tt.nti AS n_transitions, tt.states AS n_states,
        |  ROUND(CAST(SUM(CAST((-(n / tt.nt))
        |    * ln(n / CAST(nf AS DOUBLE)) AS DECIMAL(18,10)))
        |    AS DOUBLE), 6) AS entropy_rate
        |FROM g JOIN ft USING (f) CROSS JOIN tt
        |GROUP BY tt.nti, tt.states""".stripMargin,

    "x175_info_gain" ->
      s"""SELECT * FROM (
         |${miBlockSql(
            "CAST(CAST(floor(o_totalprice / 50000) AS BIGINT) AS VARCHAR)",
            "o_band")}
         |UNION ALL
         |${miBlockSql("o_orderpriority", "o_orderpriority")}
         |UNION ALL
         |${miBlockSql("CAST(year(o_orderdate) AS VARCHAR)", "o_year")})
         |ORDER BY feature""".stripMargin,

    // Zipf fit: rank by (count desc, word) mirrors the zipWithIndex
    // sort; ln-moment terms in DECIMAL(28,10), closed-form OLS on the
    // exact sums.
    "x172_zipf_fit" ->
      """WITH c AS (SELECT t AS w, COUNT(*) AS c FROM (
        |    SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        |  GROUP BY 1),
        |r AS (SELECT c, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, w)
        |    AS BIGINT) AS rk FROM c),
        |m AS (SELECT COUNT(*) AS n,
        |  SUM(CAST(ln(CAST(rk AS DOUBLE)) AS DECIMAL(28,10))) AS sx,
        |  SUM(CAST(ln(CAST(c AS DOUBLE)) AS DECIMAL(28,10))) AS sy,
        |  SUM(CAST(ln(CAST(rk AS DOUBLE)) * ln(CAST(c AS DOUBLE))
        |    AS DECIMAL(28,10))) AS sxy,
        |  SUM(CAST(ln(CAST(rk AS DOUBLE)) * ln(CAST(rk AS DOUBLE))
        |    AS DECIMAL(28,10))) AS sxx FROM r),
        |d AS (SELECT n, CAST(n AS DOUBLE) AS nd,
        |  CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
        |  CAST(sxy AS DOUBLE) AS sxy, CAST(sxx AS DOUBLE) AS sxx FROM m)
        |SELECT CAST(n AS BIGINT) AS n_words,
        |  CAST(ROUND(CAST(CASE WHEN nd * sxx - sx * sx > 0
        |    THEN (nd * sxy - sx * sy) / (nd * sxx - sx * sx) END
        |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS zipf_slope,
        |  CAST(ROUND(CAST(CASE WHEN nd * sxx - sx * sx > 0
        |    THEN (sy - (nd * sxy - sx * sy) / (nd * sxx - sx * sx) * sx)
        |      / nd END
        |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS zipf_intercept
        |FROM d""".stripMargin,

    // Nelson–Aalen: x132's lifetime construction; each d/n increment
    // casts to DECIMAL(18,10) and running-sums exactly.
    "x166_nelson_aalen" ->
      """WITH pu AS (SELECT user_id,
        |  CAST(date_trunc('day', MIN(ts)) AS DATE) AS firstd,
        |  CAST(date_trunc('day', MAX(ts)) AS DATE) AS lastd
        |  FROM events GROUP BY 1),
        |g AS (SELECT CAST(date_trunc('day', MAX(ts)) AS DATE) AS gmax
        |  FROM events),
        |lt AS (SELECT
        |  CAST(date_diff('day', firstd, lastd) AS BIGINT) AS dur,
        |  CAST(date_diff('day', lastd, gmax) >= 3 AS BIGINT) AS ev
        |  FROM pu CROSS JOIN g),
        |bd AS (SELECT dur, COUNT(*) AS n, SUM(ev) AS d FROM lt GROUP BY 1),
        |r AS (SELECT dur, n, d,
        |  (SELECT COUNT(*) FROM lt)
        |    - COALESCE(SUM(n) OVER (ORDER BY dur
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS risk
        |  FROM bd)
        |SELECT dur AS duration_days, CAST(risk AS BIGINT) AS n_risk,
        |  CAST(d AS BIGINT) AS n_events,
        |  ROUND(CAST(SUM(CAST(CAST(d AS DOUBLE) / risk
        |    AS DECIMAL(18,10))) OVER w AS DOUBLE), 6) AS hazard
        |FROM r
        |WINDOW w AS (ORDER BY dur
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY duration_days""".stripMargin,

    // Two-proportion z: everything enters the shared float expression
    // as exact integer counts; md5 parity gives the deterministic A/B.
    "x167_two_proportion_z" ->
      """WITH u AS (SELECT user_id,
        |  MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    AS conv FROM events GROUP BY 1),
        |f AS (SELECT conv,
        |  substr(md5(user_id::VARCHAR), 1, 1) < '8' AS ia FROM u),
        |a AS (SELECT
        |  COUNT(CASE WHEN ia THEN 1 END) AS na,
        |  COUNT(CASE WHEN ia AND conv = 1 THEN 1 END) AS ca,
        |  COUNT(CASE WHEN NOT ia THEN 1 END) AS nb,
        |  COUNT(CASE WHEN NOT ia AND conv = 1 THEN 1 END) AS cb
        |  FROM f),
        |d AS (SELECT na, ca, nb, cb,
        |  CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd FROM a)
        |SELECT na AS n_a, ca AS conv_a, nb AS n_b, cb AS conv_b,
        |  CAST(ROUND(CAST(CASE WHEN na > 0 THEN ca / nad END
        |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS rate_a,
        |  CAST(ROUND(CAST(CASE WHEN nb > 0 THEN cb / nbd END
        |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS rate_b,
        |  CAST(ROUND(CAST(CASE WHEN na > 0 AND nb > 0
        |      AND (ca + cb) / (nad + nbd) > 0
        |      AND (ca + cb) / (nad + nbd) < 1
        |    THEN (ca / nad - cb / nbd)
        |      / SQRT((ca + cb) / (nad + nbd)
        |        * (CAST(1.0 AS DOUBLE) - (ca + cb) / (nad + nbd))
        |        * (CAST(1.0 AS DOUBLE) / nad
        |          + CAST(1.0 AS DOUBLE) / nbd)) END
        |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS z_stat
        |FROM d""".stripMargin,

    // Decayed counts: each 2^(−Δ/h) term casts to DECIMAL(18,10) and
    // sums exactly; pow's cross-engine ulp absorbs in the 4-dp round.
    // Linear factored form (r12): per-user half-life segments, rebased
    // weights 2^(rem/h) summed exactly in DECIMAL (window + segment
    // aggregates), 36-segment bounded lookback — mirrors
    // TimeSeries.decayedCounts' arithmetic op for op; no pair join,
    // and 2^f is the shared Horner polynomial, not libm pow.
    "x165_decayed_counts" ->
      s"""WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t,
         |  event_id AS id FROM events),
         |e2 AS (SELECT u, t, id,
         |  t - MIN(t) OVER (PARTITION BY u) AS x FROM e),
         |e3 AS (SELECT u, t, id,
         |  x % 3600000000 AS rem, x // 3600000000 AS seg,
         |  CAST(x % 3600000000 AS DOUBLE) / 3600000000.0e0 AS fr
         |  FROM e2),
         |e4 AS (SELECT u, t, id, seg, fr,
         |  CAST(${exp2PolySql("fr")}
         |    AS DECIMAL(18,7)) AS w FROM e3),
         |rr AS (SELECT u, t, id, seg, fr, w,
         |  SUM(w) OVER (PARTITION BY u, seg ORDER BY t, id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r
         |  FROM e4),
         |ws AS (SELECT u, seg, SUM(w) AS tw FROM e4 GROUP BY 1, 2),
         |sm AS (SELECT u, t, id,
         |  CAST((1.0e0 / ${exp2PolySql("fr")})
         |    * CAST(r AS DOUBLE) AS DECIMAL(28,10)) AS same FROM rr),
         |cr AS (SELECT e4.u, e4.t, e4.id,
         |  SUM(CAST(((1.0e0 / CAST((CAST(1 AS BIGINT) << d.d) AS DOUBLE))
         |      / ${exp2PolySql("e4.fr")})
         |    * CAST(ws.tw AS DOUBLE) AS DECIMAL(28,10))) AS cx
         |  FROM e4
         |  CROSS JOIN (SELECT UNNEST(range(1, 37)) AS d) d
         |  JOIN ws ON ws.u = e4.u AND ws.seg = e4.seg - d.d
         |  GROUP BY 1, 2, 3)
         |SELECT sm.u AS user_id, sm.t AS ts_us, sm.id AS event_id,
         |  CAST(ROUND(sm.same + COALESCE(CAST(cr.cx AS DECIMAL(28,10)),
         |    CAST(0 AS DECIMAL(28,10))), 4) AS DOUBLE) AS decayed_count
         |FROM sm LEFT JOIN cr
         |  ON cr.u = sm.u AND cr.t = sm.t AND cr.id = sm.id
         |ORDER BY user_id, ts_us, event_id""".stripMargin,

    // Two-regressor OLS: nine exact decimal moments per key, Cramer
    // determinants expanded in the engine's association, DECIMAL(18,8)
    // stabilize. Weekend flag = isodow in (6,7), the t18 parity.
    "x173_ols_trend_weekend" ->
      s"""WITH $dailyCte,
         |g AS (SELECT MIN(day) AS d0 FROM daily),
         |rws AS (SELECT user_id AS k,
         |  CAST(date_diff('day', d0, day) AS DOUBLE) AS x1,
         |  CASE WHEN isodow(day) IN (6, 7) THEN CAST(1.0 AS DOUBLE)
         |    ELSE CAST(0.0 AS DOUBLE) END AS x2,
         |  CAST(demand AS DOUBLE) AS y
         |  FROM daily CROSS JOIN g),
         |mm AS (SELECT k, COUNT(*) AS n,
         |  SUM(CAST(x1 AS DECIMAL(28,6))) AS s1,
         |  SUM(CAST(x2 AS DECIMAL(28,6))) AS s2,
         |  SUM(CAST(y AS DECIMAL(28,6))) AS sy,
         |  SUM(CAST(x1 * x1 AS DECIMAL(28,6))) AS s11,
         |  SUM(CAST(x2 * x2 AS DECIMAL(28,6))) AS s22,
         |  SUM(CAST(x1 * x2 AS DECIMAL(28,6))) AS s12,
         |  SUM(CAST(x1 * y AS DECIMAL(28,6))) AS s1y,
         |  SUM(CAST(x2 * y AS DECIMAL(28,6))) AS s2y
         |  FROM rws GROUP BY 1),
         |dd AS (SELECT k, n, CAST(n AS DOUBLE) AS nd,
         |  CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2,
         |  CAST(sy AS DOUBLE) AS sy, CAST(s11 AS DOUBLE) AS s11,
         |  CAST(s22 AS DOUBLE) AS s22, CAST(s12 AS DOUBLE) AS s12,
         |  CAST(s1y AS DOUBLE) AS s1y, CAST(s2y AS DOUBLE) AS s2y
         |  FROM mm),
         |dets AS (SELECT k, n,
         |  nd * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
         |    + s2 * (s1 * s12 - s11 * s2) AS det,
         |  sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
         |    + s2 * (s1y * s12 - s11 * s2y) AS det0,
         |  nd * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
         |    + s2 * (s1 * s2y - s1y * s2) AS det1,
         |  nd * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
         |    + sy * (s1 * s12 - s11 * s2) AS det2
         |  FROM dd)
         |SELECT k AS user_id, CAST(n AS BIGINT) AS n_days,
         |  CAST(ROUND(CAST(CASE WHEN n >= 3 AND abs(det) > 1e-6
         |    THEN det0 / det END AS DECIMAL(18,8)), 4) AS DOUBLE) AS b0,
         |  CAST(ROUND(CAST(CASE WHEN n >= 3 AND abs(det) > 1e-6
         |    THEN det1 / det END AS DECIMAL(18,8)), 4) AS DOUBLE)
         |    AS b1_day,
         |  CAST(ROUND(CAST(CASE WHEN n >= 3 AND abs(det) > 1e-6
         |    THEN det2 / det END AS DECIMAL(18,8)), 4) AS DOUBLE)
         |    AS b2_weekend
         |FROM dets ORDER BY user_id""".stripMargin,

    // Theil–Sen: pairwise slopes round through DECIMAL(18,8) before
    // the per-key exact median (quantile_cont ≡ percentile, t38).
    "x163_theil_sen" ->
      s"""WITH $dailyCte,
         |d2 AS (SELECT user_id, day, CAST(demand AS DOUBLE) AS y
         |  FROM daily),
         |p AS (SELECT a.user_id AS k,
         |  CAST(ROUND(CAST((b.y - a.y) / (b.day - a.day)
         |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS s
         |  FROM d2 a JOIN d2 b
         |    ON a.user_id = b.user_id AND a.day < b.day),
         |nd AS (SELECT user_id AS k, COUNT(DISTINCT day) AS n_days
         |  FROM d2 GROUP BY 1),
         |${exactQuantileCtes("p", Seq("k"), "s",
             Seq("ts_slope" -> 500), 6, "q")},
         |ag AS (SELECT k, COUNT(*) AS n_pairs FROM p GROUP BY 1)
         |SELECT ag.k AS user_id, n_days, n_pairs,
         |  CAST(qq.ts_slope AS DOUBLE) AS ts_slope
         |FROM ag JOIN nd USING (k) JOIN qq ON qq.k = ag.k
         |ORDER BY user_id""".stripMargin,

    // Rolling correlation: inputs quantize to 6 dp, the five moments
    // are DECIMAL window sums (exact under any sliding association),
    // the correlation assembles once from the exact operands.
    "x164_rolling_corr" ->
      """WITH daily AS (SELECT l_partkey AS k,
        |  CAST(date_trunc('day', l_shipdate) AS DATE) AS day,
        |  SUM(CAST(l_quantity AS DECIMAL(18,2))) AS x,
        |  SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS y
        |  FROM lineitem GROUP BY 1, 2),
        |q AS (SELECT k, day,
        |  CAST(ROUND(CAST(x AS DOUBLE), 6) AS DECIMAL(18,6)) AS xq,
        |  CAST(ROUND(CAST(y AS DOUBLE), 6) AS DECIMAL(18,6)) AS yq
        |  FROM daily),
        |w AS (SELECT k, day,
        |  COUNT(*) OVER win AS n,
        |  CAST(SUM(xq) OVER win AS DOUBLE) AS sx,
        |  CAST(SUM(yq) OVER win AS DOUBLE) AS sy,
        |  CAST(SUM(CAST(CAST(xq AS DECIMAL(19,6)) * yq AS DECIMAL(37,12))) OVER win AS DOUBLE)
        |    AS sxy,
        |  CAST(SUM(CAST(CAST(xq AS DECIMAL(19,6)) * xq AS DECIMAL(37,12))) OVER win AS DOUBLE)
        |    AS sxx,
        |  CAST(SUM(CAST(CAST(yq AS DECIMAL(19,6)) * yq AS DECIMAL(37,12))) OVER win AS DOUBLE)
        |    AS syy
        |  FROM q WINDOW win AS (PARTITION BY k ORDER BY day
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)),
        |c AS (SELECT k, day, n, CAST(n AS DOUBLE) AS nd,
        |  sx, sy, sxy, sxx, syy FROM w)
        |SELECT k AS l_partkey, day,
        |  CASE WHEN n = 5 AND nd * sxx - sx * sx > 0
        |      AND nd * syy - sy * sy > 0
        |    THEN CAST(ROUND(CAST((nd * sxy - sx * sy)
        |      / SQRT((nd * sxx - sx * sx) * (nd * syy - sy * sy))
        |      AS DECIMAL(18,8)), 6) AS DOUBLE) END AS rolling_corr
        |FROM c ORDER BY l_partkey, day""".stripMargin,

    // Leave-one-out target encoding: (Σ−y+m·prior)/(n−1+m) assembled
    // in the engine's association over exact decimal sums.
    "x161_target_encode" ->
      """WITH rws AS (SELECT l_orderkey, l_linenumber, l_partkey,
        |  ROUND(CAST(l_quantity AS DOUBLE), 6) AS y FROM lineitem
        |  WHERE l_quantity IS NOT NULL),
        |pc AS (SELECT l_partkey, COUNT(*) AS n,
        |  SUM(CAST(y AS DECIMAL(28,6))) AS s FROM rws GROUP BY 1),
        |pr AS (SELECT CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE)
        |  / COUNT(*) AS prior FROM rws)
        |SELECT r.l_orderkey, CAST(r.l_linenumber AS BIGINT)
        |    AS l_linenumber, r.l_partkey,
        |  CAST(ROUND(CAST((CAST(s AS DOUBLE) - y + 10.0e0 * prior)
        |    / (n - 1 + 10.0e0) AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS target_enc
        |FROM rws r JOIN pc USING (l_partkey) CROSS JOIN pr
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // A-ES weighted sample: u from the md5 prefix (x131 idiom, doubles
    // forced explicitly), key = ln(u)/w rounded through DECIMAL(18,8).
    "x162_weighted_sample" ->
      """WITH t AS (SELECT o_orderkey,
        |  CAST(ROUND(CAST(
        |    ln((('0x' || substr(md5(o_orderkey::VARCHAR), 1, 8))::BIGINT
        |        + CAST(0.5 AS DOUBLE)) / CAST(4294967296.0 AS DOUBLE))
        |    / CAST(o_totalprice AS DOUBLE)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS es_key
        |  FROM orders WHERE CAST(o_totalprice AS DOUBLE) > 0),
        |top AS (SELECT * FROM t ORDER BY es_key DESC, o_orderkey
        |  LIMIT 100)
        |SELECT * FROM top ORDER BY o_orderkey""".stripMargin,

    // Linear multi-touch attribution: per-credit 1/k is one IEEE
    // division cast to DECIMAL(18,10) and summed exactly.
    "x160_linear_attribution" ->
      """WITH conv AS (SELECT user_id AS u, epoch_us(ts) AS cts,
        |  event_id AS cid FROM events WHERE event_type = 'purchase'),
        |tch AS (SELECT user_id AS u, epoch_us(ts) AS tts,
        |  event_type AS channel FROM events
        |  WHERE event_type IN ('click', 'view', 'signup')),
        |j AS (SELECT conv.u, cts, cid, tts, channel
        |  FROM conv JOIN tch ON conv.u = tch.u
        |  AND tts < cts AND tts >= cts - 604800000000),
        |k AS (SELECT *, COUNT(*) OVER (PARTITION BY u, cts, cid) AS k
        |  FROM j),
        |cr AS (SELECT channel,
        |  ROUND(CAST(SUM(CAST(CAST(1.0 AS DOUBLE) / k
        |    AS DECIMAL(18,10))) AS DOUBLE), 6) AS credit
        |  FROM k GROUP BY 1),
        |cd AS (SELECT channel, COUNT(*) AS n_conversions FROM (
        |    SELECT DISTINCT channel, u, cts, cid FROM k) GROUP BY 1)
        |SELECT cr.channel, credit, n_conversions
        |FROM cr JOIN cd USING (channel) ORDER BY channel""".stripMargin,

    // MAD robust outliers: median and MAD via EXACT rank-arithmetic
    // decimal interpolation (mirrors groupedExactQuantiles — no
    // quantile_cont, no float kernel; the r11 ULP lesson); only the
    // z-score itself is float, over engine-identical operands,
    // stabilized through DECIMAL(18,8) before the 3.5 compare.
    "x156_robust_outliers" ->
      """WITH rws AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS vd,
        |  CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events WHERE value IS NOT NULL),
        |rk AS (SELECT g, v,
        |  ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) - 1 AS r,
        |  COUNT(*) OVER (PARTITION BY g) AS n FROM rws),
        |b AS (SELECT g, v, r,
        |  (500*(n-1)) // 1000 AS mlo,
        |  LEAST((500*(n-1)) // 1000 + 1, n-1) AS mhi,
        |  (500*(n-1)) % 1000 AS mrem FROM rk),
        |med AS (SELECT g,
        |  ROUND((MIN(CASE WHEN r = mlo THEN v END)
        |      * CAST(1000 - mrem AS DECIMAL(4,0))
        |    + MIN(CASE WHEN r = mhi THEN v END)
        |      * CAST(mrem AS DECIMAL(4,0)))
        |    * CAST(0.001 AS DECIMAL(4,3)), 6) AS med
        |  FROM b GROUP BY g, mlo, mhi, mrem),
        |ad AS (SELECT r.g, r.vd, m.med,
        |  CAST(ABS(r.v - m.med) AS DECIMAL(18,6)) AS av
        |  FROM rws r JOIN med m ON r.g = m.g),
        |rk2 AS (SELECT g, av,
        |  ROW_NUMBER() OVER (PARTITION BY g ORDER BY av) - 1 AS r,
        |  COUNT(*) OVER (PARTITION BY g) AS n FROM ad),
        |b2 AS (SELECT g, av, r,
        |  (500*(n-1)) // 1000 AS mlo,
        |  LEAST((500*(n-1)) // 1000 + 1, n-1) AS mhi,
        |  (500*(n-1)) % 1000 AS mrem FROM rk2),
        |mad AS (SELECT g,
        |  ROUND((MIN(CASE WHEN r = mlo THEN av END)
        |      * CAST(1000 - mrem AS DECIMAL(4,0))
        |    + MIN(CASE WHEN r = mhi THEN av END)
        |      * CAST(mrem AS DECIMAL(4,0)))
        |    * CAST(0.001 AS DECIMAL(4,3)), 6) AS mad
        |  FROM b2 GROUP BY g, mlo, mhi, mrem)
        |SELECT a.g AS event_type, COUNT(*) AS n,
        |  CAST(MIN(a.med) AS DOUBLE) AS median,
        |  CAST(MIN(d.mad) AS DOUBLE) AS mad,
        |  CAST(SUM(CASE WHEN d.mad > 0 AND abs(ROUND(CAST(
        |      0.6745e0 * (a.vd - CAST(a.med AS DOUBLE))
        |        / CAST(d.mad AS DOUBLE)
        |      AS DECIMAL(18,8)), 4)) > 3.5 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM ad a JOIN mad d ON a.g = d.g
        |GROUP BY a.g ORDER BY event_type""".stripMargin,

    // Benford: exact integer cents via the x144 money contract; the
    // expected shares are shared rounded literals (no runtime log10).
    "x157_benford" ->
      """WITH c AS (SELECT CAST(ROUND(CAST(o_totalprice
        |    AS DECIMAL(28,6)), 2) * 100 AS BIGINT) AS c FROM orders),
        |d AS (SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INT)
        |    AS digit, COUNT(*) AS n
        |  FROM c WHERE c > 0 GROUP BY 1),
        |e AS (SELECT * FROM (VALUES
        |  (1, CAST(0.3010299957 AS DOUBLE)),
        |  (2, CAST(0.1760912591 AS DOUBLE)),
        |  (3, CAST(0.1249387366 AS DOUBLE)),
        |  (4, CAST(0.0969100130 AS DOUBLE)),
        |  (5, CAST(0.0791812460 AS DOUBLE)),
        |  (6, CAST(0.0669467896 AS DOUBLE)),
        |  (7, CAST(0.0579919470 AS DOUBLE)),
        |  (8, CAST(0.0511525224 AS DOUBLE)),
        |  (9, CAST(0.0457574906 AS DOUBLE))) v(digit, expected_p)),
        |j AS (SELECT e.digit, COALESCE(d.n, 0) AS n, e.expected_p
        |  FROM e LEFT JOIN d ON d.digit = e.digit),
        |o AS (SELECT digit, n,
        |  CAST(ROUND(CAST(CAST(n AS DOUBLE) / SUM(n) OVER ()
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS observed_p, expected_p
        |  FROM j)
        |SELECT CAST(digit AS BIGINT) AS digit, CAST(n AS BIGINT) AS n,
        |  observed_p, expected_p,
        |  CAST(ROUND(CAST(observed_p - expected_p AS DECIMAL(18,8)), 6)
        |    AS DOUBLE) AS deviation
        |FROM o ORDER BY digit""".stripMargin,

    // Inter-arrival stats: gaps in exact integer micros; Σg and Σg² in
    // DECIMAL (g² squared in DECIMAL(19,0) — int64 overflows beyond
    // ~54-minute gaps); variance assembled from the exact sums in one
    // shared float expression, stabilized through DECIMAL(18,8).
    "x155_interarrival" ->
      """WITH g AS (SELECT user_id,
        |  epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS g
        |  FROM events),
        |a AS (SELECT user_id, COUNT(*) AS n,
        |  SUM(CAST(g AS DECIMAL(38,0))) AS sg,
        |  SUM(CAST(g AS DECIMAL(19,0)) * CAST(g AS DECIMAL(19,0))) AS sgg
        |  FROM g WHERE g IS NOT NULL GROUP BY 1),
        |d AS (SELECT user_id, n, CAST(n AS DOUBLE) AS nd,
        |  CAST(sg AS DOUBLE) AS sg, CAST(sgg AS DOUBLE) AS sgg FROM a)
        |SELECT user_id, n AS n_gaps,
        |  CAST(ROUND(CAST(sg / nd / 1000000.0e0 AS DECIMAL(18,8)), 4)
        |    AS DOUBLE) AS mean_gap_s,
        |  CAST(ROUND(CAST(CASE WHEN n >= 2 AND sg / nd > 0
        |    THEN SQRT((nd * sgg - sg * sg) / (nd * (nd - 1))) / (sg / nd)
        |    END AS DECIMAL(18,8)), 4) AS DOUBLE) AS cv_gap,
        |  CAST(ROUND(CAST(CASE WHEN n >= 2
        |      AND (SQRT((nd * sgg - sg * sg) / (nd * (nd - 1)))
        |        + sg / nd) > 0
        |    THEN (SQRT((nd * sgg - sg * sg) / (nd * (nd - 1))) - sg / nd)
        |      / (SQRT((nd * sgg - sg * sg) / (nd * (nd - 1))) + sg / nd)
        |    END AS DECIMAL(18,8)), 4) AS DOUBLE) AS burstiness
        |FROM d ORDER BY user_id""".stripMargin,

    // Reconcile: keyed diff of the per-customer rollup at two cutoffs;
    // money quantizes through DECIMAL(28,6) (x144 contract) so both
    // engines build identical snapshots before comparing them.
    "x153_reconcile" ->
      """WITH a AS (SELECT o_custkey AS k, COUNT(*) AS n_orders,
        |  ROUND(CAST(SUM(ROUND(CAST(o_totalprice AS DECIMAL(28,6)), 2))
        |    AS DOUBLE), 2) AS total
        |  FROM orders WHERE o_orderdate < DATE '1997-07-01' GROUP BY 1),
        |b AS (SELECT o_custkey AS k, COUNT(*) AS n_orders,
        |  ROUND(CAST(SUM(ROUND(CAST(o_totalprice AS DECIMAL(28,6)), 2))
        |    AS DOUBLE), 2) AS total
        |  FROM orders WHERE o_orderdate < DATE '1998-01-01' GROUP BY 1)
        |SELECT COALESCE(a.k, b.k) AS o_custkey,
        |  CASE WHEN b.k IS NULL THEN 'removed'
        |    WHEN a.k IS NULL THEN 'added'
        |    ELSE 'changed' END AS status,
        |  CASE WHEN a.k IS NOT NULL AND b.k IS NOT NULL THEN concat_ws(',',
        |    CASE WHEN a.n_orders IS DISTINCT FROM b.n_orders
        |      THEN 'n_orders' END,
        |    CASE WHEN a.total IS DISTINCT FROM b.total THEN 'total' END)
        |  END AS changed_cols
        |FROM a FULL OUTER JOIN b ON a.k = b.k
        |WHERE a.k IS NULL OR b.k IS NULL
        |  OR a.n_orders IS DISTINCT FROM b.n_orders
        |  OR a.total IS DISTINCT FROM b.total
        |ORDER BY o_custkey""".stripMargin,

    "x124_croston" -> crostonSql,
    "x125_backtest" -> backtestSql,

    // corr ignores null-lag rows on both engines; + 0.0 settles
    // DuckDB's IEEE round of tiny negative correlations to -0.0.
    "x126_autocorrelation" ->
      s"""WITH $dailyCte,
         |led AS (SELECT user_id, day AS d0, demand,
         |  lead(day) OVER (PARTITION BY user_id ORDER BY day) AS nxt
         |  FROM daily),
         |dense AS (SELECT user_id, d0, demand,
         |  CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
         |    CAST(COALESCE(nxt - 1, d0) AS TIMESTAMP),
         |    INTERVAL 1 DAY)) AS DATE) AS day
         |  FROM led),
         |ser AS (SELECT user_id, day,
         |  CASE WHEN day = d0 THEN CAST(demand AS DOUBLE) ELSE 0.0 END AS y
         |  FROM dense),
         |lg AS (SELECT user_id, day, y,
         |  lag(y, 1) OVER w1 AS l1, lag(y, 7) OVER w1 AS l7
         |  FROM ser WINDOW w1 AS (PARTITION BY user_id ORDER BY day))
         |SELECT user_id, COUNT(*) AS n_days,
         |  ROUND(corr(y, l1), 4) + 0.0 AS acf_1,
         |  ROUND(corr(y, l7), 4) + 0.0 AS acf_7
         |FROM lg GROUP BY 1 ORDER BY user_id""".stripMargin,

    "x127_market_basket" ->
      """WITH oi AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i
        |  FROM lineitem),
        |pairs AS (SELECT l.i AS item_a, r.i AS item_b, COUNT(*) AS n_ab
        |  FROM oi l JOIN oi r ON l.o = r.o AND l.i < r.i GROUP BY 1, 2),
        |top AS (SELECT * FROM pairs
        |  ORDER BY n_ab DESC, item_a, item_b LIMIT 100),
        |ic AS (SELECT i, COUNT(*) AS n FROM oi GROUP BY 1),
        |t AS (SELECT CAST(COUNT(DISTINCT o) AS DOUBLE) AS total FROM oi)
        |SELECT item_a, item_b, n_ab,
        |  ROUND(n_ab / total, 6) AS support,
        |  ROUND(n_ab / CAST(a.n AS DOUBLE), 6) AS confidence,
        |  ROUND(n_ab * total / (CAST(a.n AS DOUBLE) * b.n), 6) AS lift
        |FROM top JOIN ic a ON top.item_a = a.i
        |  JOIN ic b ON top.item_b = b.i CROSS JOIN t
        |ORDER BY item_a, item_b""".stripMargin,

    // quintile cutoffs via EXACT rank-arithmetic decimal interpolation
    // (r12: no float quantile kernel on either engine); scoring is
    // 1 + Σ(v > q_i), recency inverted.
    "x128_rfm_segments" ->
      s"""WITH pc AS (SELECT o_custkey, MAX(o_orderdate) AS lastd,
         |  COUNT(*) AS f,
         |  SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS md
         |  FROM orders GROUP BY 1),
         |g AS (SELECT MAX(o_orderdate) AS gmax FROM orders),
         |rfm AS (SELECT o_custkey,
         |  CAST(date_diff('day', CAST(lastd AS DATE), CAST(gmax AS DATE))
         |    AS BIGINT) AS r,
         |  f, CAST(md AS DOUBLE) AS m FROM pc CROSS JOIN g),
         |${exactQuantileCtes("rfm", Seq(), "r",
             Seq("qr1" -> 200, "qr2" -> 400, "qr3" -> 600, "qr4" -> 800),
             6, "xr")},
         |${exactQuantileCtes("rfm", Seq(), "f",
             Seq("qf1" -> 200, "qf2" -> 400, "qf3" -> 600, "qf4" -> 800),
             6, "xf")},
         |${exactQuantileCtes("rfm", Seq(), "m",
             Seq("qm1" -> 200, "qm2" -> 400, "qm3" -> 600, "qm4" -> 800),
             6, "xm")},
         |sc AS (SELECT o_custkey, r, f, m,
         |  6 - (1 + CAST(r > qr1 AS INT) + CAST(r > qr2 AS INT)
         |    + CAST(r > qr3 AS INT) + CAST(r > qr4 AS INT)) AS r_score,
         |  1 + CAST(f > qf1 AS INT) + CAST(f > qf2 AS INT)
         |    + CAST(f > qf3 AS INT) + CAST(f > qf4 AS INT) AS f_score,
         |  1 + CAST(m > qm1 AS INT) + CAST(m > qm2 AS INT)
         |    + CAST(m > qm3 AS INT) + CAST(m > qm4 AS INT) AS m_score
         |  FROM rfm CROSS JOIN xrq CROSS JOIN xfq CROSS JOIN xmq)
        |SELECT o_custkey, r, f, ROUND(m, 2) AS m,
        |  CAST(r_score AS BIGINT) AS r_score,
        |  CAST(f_score AS BIGINT) AS f_score,
        |  CAST(m_score AS BIGINT) AS m_score,
        |  CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
        |         THEN 'champion'
        |       WHEN r_score >= 3 AND f_score >= 3 THEN 'loyal'
        |       WHEN r_score >= 4 THEN 'recent'
        |       WHEN f_score >= 4 THEN 'frequent_lapsed'
        |       WHEN r_score <= 2 AND f_score <= 2 THEN 'at_risk'
        |       ELSE 'regular' END AS segment
        |FROM sc ORDER BY o_custkey""".stripMargin,

    // Mirrors Graph.triangleCount exactly: string-canonicalized
    // undirected edges, (degree, id) tuple-ordered orientation, wedge
    // join on the center, EXISTS against the canon edge set (keeps
    // wedge multiplicity — one hit per distinct center).
    "x129_triangle_count" ->
      """WITH oi AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i
        |  FROM lineitem),
        |e0 AS (SELECT l.i AS x, r.i AS y
        |  FROM oi l JOIN oi r ON l.o = r.o AND l.i < r.i
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |canon AS (SELECT DISTINCT
        |    least(CAST(x AS VARCHAR), CAST(y AS VARCHAR)) AS a,
        |    greatest(CAST(x AS VARCHAR), CAST(y AS VARCHAR)) AS b
        |  FROM e0 WHERE CAST(x AS VARCHAR) <> CAST(y AS VARCHAR)),
        |deg AS (SELECT n, COUNT(*) AS d FROM (
        |    SELECT a AS n FROM canon UNION ALL SELECT b FROM canon)
        |  GROUP BY 1),
        |ori AS (SELECT
        |    CASE WHEN (da.d, c.a) < (db.d, c.b) THEN c.a ELSE c.b END AS u,
        |    CASE WHEN (da.d, c.a) < (db.d, c.b) THEN c.b ELSE c.a END AS v
        |  FROM canon c JOIN deg da ON c.a = da.n JOIN deg db ON c.b = db.n),
        |wed AS (SELECT e1.v AS wa, e2.v AS wb
        |  FROM ori e1 JOIN ori e2 ON e1.u = e2.u AND e1.v < e2.v)
        |SELECT
        |  (SELECT COUNT(*) FROM deg) AS n_nodes,
        |  (SELECT COUNT(*) FROM canon) AS n_edges,
        |  (SELECT COUNT(*) FROM wed
        |     WHERE EXISTS (SELECT 1 FROM canon
        |                   WHERE a = wed.wa AND b = wed.wb)) AS n_triangles
        |ORDER BY n_triangles""".stripMargin,

    // w = 10 (even) -> both medians are the mean of sorted[5] and
    // sorted[6]; every op (sort, abs, subtract, the (a+b)/2.0 and the
    // 3.0*1.4826 constant fold) is the same IEEE sequence the Spark
    // expressions compile, so the unrounded outlier compare is
    // bit-portable.
    "x130_hampel" ->
      """WITH r AS (SELECT event_id, user_id, value,
        |  list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING) AS win
        |  FROM events),
        |m AS (SELECT event_id, user_id, value, win,
        |  CASE WHEN len(win) = 10 THEN
        |    (list_sort(win)[5] + list_sort(win)[6]) / 2.0 END AS med
        |  FROM r),
        |d AS (SELECT event_id, user_id, value, med,
        |  CASE WHEN med IS NOT NULL THEN
        |    (list_sort(list_transform(win, x -> abs(x - med)))[5]
        |     + list_sort(list_transform(win, x -> abs(x - med)))[6]) / 2.0
        |  END AS mad FROM m)
        |SELECT event_id, user_id,
        |  ROUND(CASE WHEN med IS NOT NULL
        |    THEN ABS(value - med) END, 4) AS deviation,
        |  CASE WHEN med IS NOT NULL THEN
        |    CAST(CASE WHEN ABS(value - med) > (3.0 * 1.4826) * mad
        |      THEN 1 ELSE 0 END AS BIGINT) END AS is_outlier
        |FROM d ORDER BY event_id""".stripMargin,

    // DSIR: per-doc log-weight = Σ tf·(ln p_tgt − ln p_raw) (add-one,
    // x83's smoothing), Gumbel-top-k with the deterministic md5
    // uniform (x88's hex-prefix trick); the rank compares ROUNDED
    // scores with id tiebreak, so the kept set is ulp-stable.
    "x131_dsir_resample" ->
      """WITH mt AS (SELECT term, COUNT(*)::BIGINT AS c FROM (
        |    SELECT unnest(string_split(text, ' ')) AS term
        |    FROM documents WHERE doc_id < 400 AND lang = 'en')
        |  GROUP BY term),
        |mr AS (SELECT term, COUNT(*)::BIGINT AS c FROM (
        |    SELECT unnest(string_split(text, ' ')) AS term
        |    FROM documents WHERE doc_id >= 400)
        |  GROUP BY term),
        |tf AS (SELECT doc_id, term, COUNT(*)::BIGINT AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |    FROM documents WHERE doc_id >= 400)
        |  GROUP BY doc_id, term),
        |sc AS (SELECT tf.doc_id, SUM(tf.tf)::BIGINT AS n_tokens,
        |  ROUND(SUM(tf.tf * (
        |    ln((coalesce(mt.c, 0) + 1)::DOUBLE /
        |       ((SELECT SUM(c)::DOUBLE FROM mt) + (SELECT COUNT(*)::DOUBLE FROM mt)))
        |    - ln((coalesce(mr.c, 0) + 1)::DOUBLE /
        |       ((SELECT SUM(c)::DOUBLE FROM mr) + (SELECT COUNT(*)::DOUBLE FROM mr)))
        |  )), 4) AS log_weight
        |  FROM tf LEFT JOIN mt USING (term) LEFT JOIN mr USING (term)
        |  GROUP BY tf.doc_id),
        |g AS (SELECT doc_id, n_tokens, log_weight,
        |  ROUND(log_weight + (-ln(-ln(
        |    (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT + 0.5)
        |      / 4294967296.0))), 4) AS gumbel_score
        |  FROM sc)
        |SELECT doc_id, n_tokens, log_weight + 0.0 AS log_weight,
        |  gumbel_score + 0.0 AS gumbel_score FROM (
        |  SELECT * FROM g ORDER BY gumbel_score DESC, doc_id LIMIT 100)
        |ORDER BY doc_id""".stripMargin,

    // Kendall τ-b over (quantity, price) cells with BOTH sides binned
    // to 32 (each by its own min/max — the bins knob's oracle twin):
    // concordant/discordant from the x1<x2 cell-pair join, tie terms
    // from the marginals, HUGEINT-exact integer counts.
    "x234_kendall_tau" ->
      """WITH r0 AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
        |  CAST(l_extendedprice AS DOUBLE) AS y FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |ex AS (SELECT MIN(x) AS lo, MAX(x) AS hi FROM r0),
        |r1 AS (SELECT CASE WHEN ex.hi > ex.lo THEN
        |    CAST(LEAST(FLOOR((x - ex.lo) * 32 / (ex.hi - ex.lo)),
        |      31) AS DOUBLE) ELSE 0.0e0 END AS x, y
        |  FROM r0 CROSS JOIN ex),
        |ey AS (SELECT MIN(y) AS lo, MAX(y) AS hi FROM r1),
        |r AS (SELECT x, CASE WHEN ey.hi > ey.lo THEN
        |    CAST(LEAST(FLOOR((y - ey.lo) * 32 / (ey.hi - ey.lo)),
        |      31) AS DOUBLE) ELSE 0.0e0 END AS y
        |  FROM r1 CROSS JOIN ey),
        |c AS (SELECT x, y, COUNT(*) AS n FROM r GROUP BY 1, 2),
        |pq AS (SELECT
        |  SUM(CASE WHEN a.y < b.y THEN a.n * b.n ELSE 0 END) AS p,
        |  SUM(CASE WHEN a.y > b.y THEN a.n * b.n ELSE 0 END) AS q
        |  FROM c a JOIN c b ON a.x < b.x),
        |tx AS (SELECT SUM((nx * (nx - 1)) // 2) AS tx FROM (
        |  SELECT SUM(n) AS nx FROM c GROUP BY x)),
        |ty AS (SELECT SUM((ny * (ny - 1)) // 2) AS ty FROM (
        |  SELECT SUM(n) AS ny FROM c GROUP BY y)),
        |tt AS (SELECT SUM(n) AS nr, (SUM(n) * (SUM(n) - 1)) // 2 AS n0
        |  FROM c)
        |SELECT CAST(nr AS BIGINT) AS n,
        |  CAST(ROUND(CAST(CASE WHEN n0 > tx AND n0 > ty THEN
        |      CAST(p - q AS DOUBLE)
        |      / SQRT(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE))
        |    END AS DECIMAL(18,8)), 6) AS DOUBLE) AS tau_b
        |FROM pq CROSS JOIN tt CROSS JOIN tx CROSS JOIN ty""".stripMargin,

    // Mann–Whitney U: pooled midranks over distinct values (the x219
    // machinery), exact decimal rank sum, tie cube in HUGEINT, one
    // float chain each for U and z.
    "x235_mann_whitney" ->
      """WITH s AS (SELECT CAST(value AS DOUBLE) AS v,
        |  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a
        |  FROM events WHERE (event_type = 'click' OR event_type = 'view')
        |    AND value IS NOT NULL),
        |g AS (SELECT v, COUNT(*) AS n, SUM(a) AS na FROM s GROUP BY 1),
        |rk AS (SELECT na, n,
        |  COALESCE(SUM(n) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + (n + 1) / 2.0e0 AS r FROM g),
        |ag AS (SELECT SUM(na) AS na2, SUM(n - na) AS nb2, SUM(n) AS nt,
        |  SUM(CAST(na * r AS DECIMAL(28,6))) AS ra,
        |  SUM(n*n*n - n) AS t FROM rk)
        |SELECT CAST(na2 AS BIGINT) AS n_a, CAST(nb2 AS BIGINT) AS n_b,
        |  CAST(ROUND(CAST(CASE WHEN na2 > 0 AND nb2 > 0 THEN
        |      CAST(ra AS DOUBLE)
        |        - CAST(na2 AS DOUBLE) * (CAST(na2 AS DOUBLE) + 1) / 2.0e0
        |    END AS DECIMAL(18,8)), 4) AS DOUBLE) AS u_a,
        |  CAST(ROUND(CAST(CASE WHEN na2 > 0 AND nb2 > 0 AND nt > 1
        |      AND CAST(na2 AS DOUBLE) * CAST(nb2 AS DOUBLE) / 12.0e0
        |        * ((CAST(nt AS DOUBLE) + 1) - CAST(t AS DOUBLE)
        |          / (CAST(nt AS DOUBLE) * (CAST(nt AS DOUBLE) - 1))) > 0
        |    THEN
        |      (CAST(ra AS DOUBLE)
        |        - CAST(na2 AS DOUBLE) * (CAST(na2 AS DOUBLE) + 1) / 2.0e0
        |        - CAST(na2 AS DOUBLE) * CAST(nb2 AS DOUBLE) / 2.0e0)
        |      / SQRT(CAST(na2 AS DOUBLE) * CAST(nb2 AS DOUBLE) / 12.0e0
        |        * ((CAST(nt AS DOUBLE) + 1) - CAST(t AS DOUBLE)
        |          / (CAST(nt AS DOUBLE) * (CAST(nt AS DOUBLE) - 1))))
        |    END AS DECIMAL(18,8)), 4) AS DOUBLE) AS z
        |FROM ag""".stripMargin,

    // Jensen–Shannon: category cells + 1-row totals, per-category KL
    // terms round-then-add at 8dp, absent side contributes 0; norm
    // divides by the Scala Math.log(2) literal (libm-independent).
    "x236_jensen_shannon" ->
      """WITH r AS (SELECT o_orderpriority AS v,
        |  CASE WHEN CAST(o_orderdate AS DATE) < DATE '1997-07-01'
        |    THEN 1 ELSE 0 END AS a,
        |  CASE WHEN CAST(o_orderdate AS DATE) >= DATE '1997-07-01'
        |    THEN 1 ELSE 0 END AS b
        |  FROM orders
        |  WHERE CAST(o_orderdate AS DATE) < DATE '1997-07-01'
        |    OR CAST(o_orderdate AS DATE) >= DATE '1997-07-01'),
        |c AS (SELECT v, SUM(a) AS na, SUM(b) AS nb FROM r GROUP BY 1),
        |t AS (SELECT SUM(na) AS tna, SUM(nb) AS tnb FROM c),
        |k AS (SELECT
        |  SUM(CASE WHEN na > 0 THEN ROUND(CAST(
        |    (CAST(na AS DOUBLE) / tna) * LN((CAST(na AS DOUBLE) / tna)
        |      / ((CAST(na AS DOUBLE) / tna + CAST(nb AS DOUBLE) / tnb)
        |        / 2.0e0)) AS DECIMAL(18,8)), 8)
        |    ELSE CAST(0 AS DECIMAL(18,8)) END) AS ka,
        |  SUM(CASE WHEN nb > 0 THEN ROUND(CAST(
        |    (CAST(nb AS DOUBLE) / tnb) * LN((CAST(nb AS DOUBLE) / tnb)
        |      / ((CAST(na AS DOUBLE) / tna + CAST(nb AS DOUBLE) / tnb)
        |        / 2.0e0)) AS DECIMAL(18,8)), 8)
        |    ELSE CAST(0 AS DECIMAL(18,8)) END) AS kb,
        |  MAX(tna) AS tna, MAX(tnb) AS tnb
        |  FROM c CROSS JOIN t)
        |SELECT CAST(tna AS BIGINT) AS n_a, CAST(tnb AS BIGINT) AS n_b,
        |  CAST(ROUND(CAST(CASE WHEN tna > 0 AND tnb > 0 THEN
        |      (CAST(ka AS DOUBLE) + CAST(kb AS DOUBLE)) / 2.0e0
        |    END AS DECIMAL(18,8)), 6) AS DOUBLE) AS jsd,
        |  CAST(ROUND(CAST(CASE WHEN tna > 0 AND tnb > 0 THEN
        |      ((CAST(ka AS DOUBLE) + CAST(kb AS DOUBLE)) / 2.0e0)
        |        / 0.6931471805599453e0
        |    END AS DECIMAL(18,8)), 6) AS DOUBLE) AS jsd_norm
        |FROM k""".stripMargin,

    // Page–Hinkley: the cusum-style list_reduce fold — running mean by
    // division inside the fold, deviation accumulate, running min, max
    // excursion; identical IEEE sequence to Spark's aggregate().
    "x237_page_hinkley" ->
      s"""WITH $dailyCte,
         |ag AS (SELECT user_id, COUNT(*) AS n_obs,
         |  list(CAST(CAST(demand AS DECIMAL(18,6)) AS DOUBLE)
         |    ORDER BY day) AS ys
         |  FROM daily WHERE demand IS NOT NULL GROUP BY 1),
         |f AS (SELECT user_id, n_obs,
         |  list_reduce(
         |    list_prepend([0.0e0, 0.0e0, 0.0e0, 0.0e0, 0.0e0],
         |      [[y, 0.0e0, 0.0e0, 0.0e0, 0.0e0] for y in ys]),
         |    (acc, xw) -> [
         |      (acc[1] + 1),
         |      (acc[2] + xw[1]),
         |      (acc[3] + (xw[1] - (acc[2] + xw[1]) / (acc[1] + 1)
         |        - 0.0e0)),
         |      LEAST(acc[4], (acc[3] + (xw[1]
         |        - (acc[2] + xw[1]) / (acc[1] + 1) - 0.0e0))),
         |      GREATEST(acc[5], (acc[3] + (xw[1]
         |          - (acc[2] + xw[1]) / (acc[1] + 1) - 0.0e0))
         |        - LEAST(acc[4], (acc[3] + (xw[1]
         |          - (acc[2] + xw[1]) / (acc[1] + 1) - 0.0e0))))]) AS rs
         |  FROM ag)
         |SELECT user_id, n_obs,
         |  CAST(ROUND(CAST(rs[5] AS DECIMAL(18,8)), 4) AS DOUBLE)
         |    AS ph_stat,
         |  CAST(ROUND(CAST(rs[5] AS DECIMAL(18,8)), 4) > 5.0e0 AS BIGINT)
         |    AS detected
         |FROM f ORDER BY user_id""".stripMargin,

    // Lorenz curve: global rank (value, tiebreak) → k equal-population
    // buckets by ⌊rank·k/n⌋ (double floor — exact below 2^53), exact
    // decimal bucket sums, bounded k-row cumulative window.
    "x238_lorenz_curve" ->
      """WITH spend AS (SELECT o_custkey AS t,
        |  SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sp
        |  FROM orders GROUP BY 1),
        |r AS (SELECT CAST(sp AS DECIMAL(28,6)) AS x,
        |  ROW_NUMBER() OVER (ORDER BY CAST(sp AS DECIMAL(28,6)), t) - 1
        |    AS i,
        |  COUNT(*) OVER () AS n FROM spend WHERE sp IS NOT NULL),
        |b AS (SELECT LEAST(CAST(FLOOR(CAST(i AS DOUBLE) * 10 / n)
        |    AS BIGINT) + 1, 10) AS bucket, x FROM r),
        |g AS (SELECT bucket, COUNT(*) AS n, SUM(x) AS s FROM b
        |  GROUP BY 1),
        |w AS (SELECT bucket, n, s,
        |  SUM(s) OVER (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs,
        |  SUM(s) OVER () AS ts FROM g)
        |SELECT bucket, n, CAST(ROUND(CAST(s AS DOUBLE), 2) AS DOUBLE)
        |    AS total,
        |  CAST(ROUND(CAST(CASE WHEN ts > 0 THEN
        |      CAST(cs AS DOUBLE) / CAST(ts AS DOUBLE)
        |    END AS DECIMAL(18,8)), 6) AS DOUBLE) AS cum_share
        |FROM w ORDER BY bucket""".stripMargin,

    // Inter-purchase cadence: distinct (customer, day) → lag gaps,
    // exact integer moments, one IEEE chain each for mean and CV.
    "x239_purchase_cadence" ->
      """WITH d AS (SELECT DISTINCT o_custkey AS k,
        |  CAST(o_orderdate AS DATE) AS dy FROM orders
        |  WHERE o_orderdate IS NOT NULL),
        |g AS (SELECT k,
        |  CAST(dy - LAG(dy) OVER (PARTITION BY k ORDER BY dy)
        |    AS BIGINT) AS gap FROM d),
        |a AS (SELECT k, COUNT(*) AS nd, COUNT(gap) AS ng,
        |  SUM(gap) AS sg, SUM(gap * gap) AS sgg FROM g GROUP BY 1)
        |SELECT k AS o_custkey, nd AS n_purchase_days,
        |  CAST(ROUND(CAST(CASE WHEN ng >= 1 THEN
        |      CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)
        |    END AS DECIMAL(18,8)), 4) AS DOUBLE) AS mean_gap_days,
        |  CAST(ROUND(CAST(CASE WHEN ng >= 2
        |      AND CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) > 0
        |      AND (CAST(sgg AS DOUBLE) - CAST(sg AS DOUBLE)
        |          * CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE))
        |        / (CAST(ng AS DOUBLE) - 1) >= 0 THEN
        |      SQRT((CAST(sgg AS DOUBLE) - CAST(sg AS DOUBLE)
        |          * CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE))
        |        / (CAST(ng AS DOUBLE) - 1))
        |      / (CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE))
        |    END AS DECIMAL(18,8)), 4) AS DOUBLE) AS cv_gap
        |FROM a ORDER BY o_custkey""".stripMargin,

    // Rank stability: one conditional-sum aggregate, per-era top-20
    // row_number ranks (ties by key), full outer join of the two
    // k-row lists, depth grid from VALUES.
    "x240_rank_stability" ->
      """WITH bk AS (SELECT l_partkey AS k,
        |  SUM(CASE WHEN year(CAST(l_shipdate AS DATE)) <= 1997
        |    THEN CAST(l_extendedprice AS DECIMAL(28,6))
        |    ELSE CAST(0 AS DECIMAL(28,6)) END) AS ma,
        |  SUM(CASE WHEN year(CAST(l_shipdate AS DATE)) >= 1998
        |    THEN CAST(l_extendedprice AS DECIMAL(28,6))
        |    ELSE CAST(0 AS DECIMAL(28,6)) END) AS mb
        |  FROM lineitem
        |  WHERE (year(CAST(l_shipdate AS DATE)) <= 1997
        |      OR year(CAST(l_shipdate AS DATE)) >= 1998)
        |    AND l_extendedprice IS NOT NULL
        |  GROUP BY 1),
        |ra AS (SELECT k, r FROM (SELECT k,
        |  ROW_NUMBER() OVER (ORDER BY ma DESC, k) AS r FROM bk)
        |  WHERE r <= 20),
        |rb AS (SELECT k, r FROM (SELECT k,
        |  ROW_NUMBER() OVER (ORDER BY mb DESC, k) AS r FROM bk)
        |  WHERE r <= 20),
        |j AS (SELECT ra.r AS r_a, rb.r AS r_b
        |  FROM ra FULL OUTER JOIN rb ON ra.k = rb.k),
        |dg AS (SELECT * FROM (VALUES (5), (10), (20)) AS t(depth))
        |SELECT CAST(depth AS BIGINT) AS depth,
        |  CAST(COALESCE(SUM(CASE WHEN r_a <= depth AND r_b <= depth
        |    THEN 1 END), 0) AS BIGINT) AS overlap,
        |  CAST(ROUND(CAST(CAST(COALESCE(SUM(CASE WHEN r_a <= depth
        |      AND r_b <= depth THEN 1 END), 0) AS DOUBLE)
        |      / depth AS DECIMAL(18,8)), 6) AS DOUBLE) AS overlap_share
        |FROM dg CROSS JOIN j GROUP BY depth ORDER BY depth""".stripMargin,

    // Cross-source duplicate matrix: distinct (source, text) self-join
    // on the text (the engine shuffles a sha256 digest instead — same
    // grouping, 32-byte keys), unordered pairs once.
    "x241_cross_source_dups" ->
      """WITH p AS (SELECT DISTINCT source AS s, text AS t
        |  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL)
        |SELECT a.s AS source_a, b.s AS source_b,
        |  COUNT(*) AS n_shared_texts
        |FROM p a JOIN p b ON a.t = b.t AND a.s < b.s
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Trimmed mean: exact interpolated [10%, 90%] cutoffs per group
    // (the t38 rank-arithmetic CTEs), inclusive band filter on the
    // decimal grid, exact decimal sums, one float division each.
    "x242_trimmed_mean" ->
      s"""WITH ${exactQuantileCtes("lineitem", Seq("l_returnflag"),
             "l_extendedprice",
             Seq("__qlo" -> 100, "__qhi" -> 900), 6, "q")},
         |r AS (SELECT l_returnflag,
         |  CAST(l_extendedprice AS DECIMAL(28,6)) AS v FROM lineitem
         |  WHERE l_extendedprice IS NOT NULL),
         |j AS (SELECT r.l_returnflag, r.v, qq.__qlo AS lo,
         |  qq.__qhi AS hi FROM r JOIN qq USING (l_returnflag))
         |SELECT l_returnflag, COUNT(*) AS n,
         |  CAST(SUM(CASE WHEN v >= lo AND v <= hi THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_kept,
         |  CAST(ROUND(CAST(CAST(SUM(v) AS DOUBLE) / COUNT(*)
         |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS mean,
         |  CAST(ROUND(CAST(CASE
         |      WHEN SUM(CASE WHEN v >= lo AND v <= hi THEN 1 ELSE 0 END)
         |        > 0 THEN
         |      CAST(SUM(CASE WHEN v >= lo AND v <= hi THEN v
         |        ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
         |      / SUM(CASE WHEN v >= lo AND v <= hi THEN 1 ELSE 0 END)
         |    END AS DECIMAL(18,8)), 6) AS DOUBLE) AS trimmed_mean
         |FROM j GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    // Quantile drift: the t38 exact-quantile CTEs once per era; the
    // gap is a decimal subtraction of the two exact cutoffs.
    "x243_quantile_drift" ->
      s"""WITH base AS (SELECT l_extendedprice FROM lineitem
         |  WHERE year(CAST(l_shipdate AS DATE)) <= 1997
         |    AND l_extendedprice IS NOT NULL),
         |cur AS (SELECT l_extendedprice FROM lineitem
         |  WHERE year(CAST(l_shipdate AS DATE)) >= 1998
         |    AND l_extendedprice IS NOT NULL),
         |${exactQuantileCtes("base", Seq(), "l_extendedprice",
             Seq("p25" -> 250, "p50" -> 500, "p75" -> 750,
               "p90" -> 900), 6, "b")},
         |${exactQuantileCtes("cur", Seq(), "l_extendedprice",
             Seq("p25" -> 250, "p50" -> 500, "p75" -> 750,
               "p90" -> 900), 6, "c")}
         |SELECT prob, q_base, q_cur, abs_shift FROM (
         |  SELECT 'p25' AS prob, CAST(bq.p25 AS DOUBLE) AS q_base,
         |    CAST(cq.p25 AS DOUBLE) AS q_cur,
         |    CAST(ABS(cq.p25 - bq.p25) AS DOUBLE) AS abs_shift
         |  FROM bq CROSS JOIN cq
         |  UNION ALL SELECT 'p50', CAST(bq.p50 AS DOUBLE),
         |    CAST(cq.p50 AS DOUBLE), CAST(ABS(cq.p50 - bq.p50) AS DOUBLE)
         |  FROM bq CROSS JOIN cq
         |  UNION ALL SELECT 'p75', CAST(bq.p75 AS DOUBLE),
         |    CAST(cq.p75 AS DOUBLE), CAST(ABS(cq.p75 - bq.p75) AS DOUBLE)
         |  FROM bq CROSS JOIN cq
         |  UNION ALL SELECT 'p90', CAST(bq.p90 AS DOUBLE),
         |    CAST(cq.p90 AS DOUBLE), CAST(ABS(cq.p90 - bq.p90) AS DOUBLE)
         |  FROM bq CROSS JOIN cq)
         |ORDER BY prob""".stripMargin,

    // η²: per-group exact decimal moments, round-then-add (Σv)²/n
    // terms (the x219 discipline), one float chain for the ratio.
    "x244_eta_squared" ->
      """WITH r AS (SELECT CAST(event_type AS VARCHAR) AS g,
        |  CAST(value AS DECIMAL(18,6)) AS v FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |bg AS (SELECT g, COUNT(*) AS ng,
        |  CAST(SUM(v) AS DECIMAL(24,6)) AS sv,
        |  CAST(SUM(CAST(v * v AS DECIMAL(24,12))) AS DECIMAL(24,12))
        |    AS svv FROM r GROUP BY 1),
        |m AS (SELECT SUM(ng) AS nn, COUNT(*) AS ngroups,
        |  CAST(SUM(sv) AS DECIMAL(24,6)) AS svt,
        |  CAST(SUM(svv) AS DECIMAL(24,12)) AS svvt,
        |  SUM(ROUND(CAST(CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / ng
        |    AS DECIMAL(28,8)), 8)) AS s FROM bg)
        |SELECT CAST(nn AS BIGINT) AS n, CAST(ngroups AS BIGINT)
        |    AS n_groups,
        |  CAST(ROUND(CAST(CASE WHEN CAST(svvt AS DOUBLE)
        |      - CAST(svt AS DOUBLE) * CAST(svt AS DOUBLE)
        |        / CAST(nn AS DOUBLE) > 0 THEN
        |      (CAST(s AS DOUBLE) - CAST(svt AS DOUBLE)
        |        * CAST(svt AS DOUBLE) / CAST(nn AS DOUBLE))
        |      / (CAST(svvt AS DOUBLE) - CAST(svt AS DOUBLE)
        |        * CAST(svt AS DOUBLE) / CAST(nn AS DOUBLE))
        |    END AS DECIMAL(18,8)), 6) AS DOUBLE) AS eta_sq
        |FROM m""".stripMargin,

    // Cramér–von Mises: pooled distinct-value ECDF gaps, per-value
    // n·(Fa−Fb)² terms round-then-add at 8dp, one prefactor chain.
    "x245_cramer_von_mises" ->
      """WITH s AS (SELECT CAST(value AS DOUBLE) AS v,
        |  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a,
        |  CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS b
        |  FROM events WHERE (event_type = 'click' OR event_type = 'view')
        |    AND value IS NOT NULL),
        |g AS (SELECT v, COUNT(*) AS n, SUM(a) AS na, SUM(b) AS nb
        |  FROM s GROUP BY 1),
        |c AS (SELECT n, na, nb,
        |  SUM(na) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
        |  SUM(nb) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
        |  SUM(na) OVER () AS ta, SUM(nb) OVER () AS tb FROM g),
        |ag AS (SELECT MAX(ta) AS ta, MAX(tb) AS tb,
        |  SUM(CASE WHEN ta > 0 AND tb > 0 THEN ROUND(CAST(
        |    CAST(n AS DOUBLE)
        |      * (CAST(ca AS DOUBLE) / ta - CAST(cb AS DOUBLE) / tb)
        |      * (CAST(ca AS DOUBLE) / ta - CAST(cb AS DOUBLE) / tb)
        |    AS DECIMAL(18,8)), 8) END) AS sm FROM c)
        |SELECT CAST(ta AS BIGINT) AS n_a, CAST(tb AS BIGINT) AS n_b,
        |  CAST(ROUND(CAST(CASE WHEN ta > 0 AND tb > 0 THEN
        |      CAST(ta AS DOUBLE) * tb
        |        / (CAST(ta + tb AS DOUBLE) * CAST(ta + tb AS DOUBLE))
        |        * CAST(sm AS DOUBLE)
        |    END AS DECIMAL(18,8)), 6) AS DOUBLE) AS cvm
        |FROM ag""".stripMargin,

    // Encoding quality: RE2 char-class counts (hex escapes agree with
    // Java regex), U+FFFD via chr(65533) containment, exact counts.
    "x246_encoding_quality" ->
      """WITH r AS (SELECT source,
        |  CASE WHEN contains(text, chr(65533)) THEN 1 ELSE 0 END
        |    AS repl,
        |  CAST(len(regexp_extract_all(text,
        |    '[\x00-\x08\x0B\x0C\x0E-\x1F]')) AS BIGINT) AS ctrl,
        |  CAST(len(regexp_extract_all(text, '[^\x00-\x7F]'))
        |    AS BIGINT) AS nonascii,
        |  CAST(LENGTH(text) AS BIGINT) AS chars FROM documents
        |  WHERE text IS NOT NULL AND source IS NOT NULL)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(ROUND(CAST(CAST(SUM(repl) AS DOUBLE) / COUNT(*)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS replacement_doc_rate,
        |  CAST(ROUND(CAST(CASE WHEN SUM(chars) > 0 THEN
        |      CAST(SUM(ctrl) AS DOUBLE) / SUM(chars)
        |    END AS DECIMAL(18,8)), 6) AS DOUBLE) AS control_char_rate,
        |  CAST(ROUND(CAST(CASE WHEN SUM(chars) > 0 THEN
        |      CAST(SUM(nonascii) AS DOUBLE) / SUM(chars)
        |    END AS DECIMAL(18,8)), 6) AS DOUBLE) AS non_ascii_rate
        |FROM r GROUP BY 1 ORDER BY source""".stripMargin,

    // Cohen's κ: cells + marginals from one grouping, chance term in
    // HUGEINT-exact integer products, κ one float chain.
    "x247_cohen_kappa" ->
      """WITH r AS (SELECT
        |  CASE WHEN l_quantity > 25 THEN 'hi' ELSE 'lo' END AS ra,
        |  CASE WHEN l_extendedprice > 30000 THEN 'hi' ELSE 'lo' END
        |    AS rb FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |c AS (SELECT ra, rb, COUNT(*) AS n FROM r GROUP BY 1, 2),
        |ag AS (SELECT SUM(n) AS nn,
        |  SUM(CASE WHEN ra = rb THEN n ELSE 0 END) AS d FROM c),
        |ma AS (SELECT ra, SUM(n) AS na FROM c GROUP BY 1),
        |mb AS (SELECT rb, SUM(n) AS nb FROM c GROUP BY 1),
        |ch AS (SELECT COALESCE(SUM(ma.na * mb.nb), 0) AS pe
        |  FROM ma JOIN mb ON ma.ra = mb.rb)
        |SELECT CAST(nn AS BIGINT) AS n,
        |  CAST(ROUND(CAST(CAST(d AS DOUBLE) / CAST(nn AS DOUBLE)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS p_observed,
        |  CAST(ROUND(CAST(CAST(pe AS DOUBLE)
        |    / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE))
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS p_expected,
        |  CAST(ROUND(CAST(CASE WHEN nn > 0 AND CAST(pe AS DOUBLE)
        |      / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)) < 1.0e0 THEN
        |      (CAST(d AS DOUBLE) / CAST(nn AS DOUBLE)
        |        - CAST(pe AS DOUBLE)
        |          / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)))
        |      / (1.0e0 - CAST(pe AS DOUBLE)
        |          / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)))
        |    END AS DECIMAL(18,8)), 6) AS DOUBLE) AS kappa
        |FROM ag CROSS JOIN ch""".stripMargin,

    // Count–min sketch: identical md5-hex bucket arithmetic (first 8
    // hex chars as int mod width), depth×width counters, MIN across
    // seeds per probed key; exact integer counts throughout.
    "x248_count_min" ->
      """WITH r AS (SELECT CAST(l_partkey AS VARCHAR) AS k
        |  FROM lineitem WHERE l_partkey IS NOT NULL),
        |sd AS (SELECT unnest(range(4)) AS j),
        |c AS (SELECT j,
        |  ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || k), 1, 8))
        |    ::BIGINT % 512 AS b, COUNT(*) AS cnt
        |  FROM r CROSS JOIN sd GROUP BY 1, 2),
        |q AS (SELECT t.k, sd.j,
        |  ('0x' || substr(md5(CAST(sd.j AS VARCHAR) || ':' || t.k),
        |    1, 8))::BIGINT % 512 AS b
        |  FROM (VALUES ('1'), ('2'), ('42'), ('199')) AS t(k)
        |  CROSS JOIN sd),
        |est AS (SELECT q.k AS key, MIN(COALESCE(c.cnt, 0)) AS estimate
        |  FROM q LEFT JOIN c ON q.j = c.j AND q.b = c.b GROUP BY 1),
        |tr AS (SELECT k AS key, COUNT(*) AS t FROM r
        |  WHERE k IN ('1', '2', '42', '199') GROUP BY 1)
        |SELECT est.key, CAST(estimate AS BIGINT) AS estimate,
        |  CAST(COALESCE(t, 0) AS BIGINT) AS true_count,
        |  CAST(estimate - COALESCE(t, 0) AS BIGINT) AS overcount
        |FROM est LEFT JOIN tr USING (key) ORDER BY key""".stripMargin,

    // Holt–Winters: the cusum-style list_reduce fold with state
    // [i, l, b, s1..s7]; every sub-expression re-derives from acc,
    // literals are the Spark side's Scala-printed doubles.
    "x249_holt_winters" -> holtWintersSql(0.3, 0.1, 0.2, 7),

    // Ranking metrics: two per-query rank windows (score desc /
    // relevance desc, event_id ties), round-then-add DCG terms with
    // the ln2 literal, one float chain per metric.
    "x250_ranking_metrics" ->
      """WITH r AS (SELECT user_id AS g, CAST(value AS DOUBLE) AS s,
        |  CASE WHEN event_type = 'purchase' THEN 1.0e0 ELSE 0.0e0 END
        |    AS rel, event_id AS t
        |  FROM events WHERE value IS NOT NULL),
        |rk AS (SELECT g, rel,
        |  ROW_NUMBER() OVER (PARTITION BY g ORDER BY s DESC, t) AS r,
        |  ROW_NUMBER() OVER (PARTITION BY g ORDER BY rel DESC, t)
        |    AS ri FROM r),
        |a AS (SELECT g, COUNT(*) AS n_items,
        |  SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS npos,
        |  SUM(CASE WHEN r <= 5 THEN ROUND(CAST(rel
        |    / (LN(CAST(r AS DOUBLE) + 1) / 0.6931471805599453e0)
        |    AS DECIMAL(18,8)), 8)
        |    ELSE CAST(0 AS DECIMAL(18,8)) END) AS dcg,
        |  SUM(CASE WHEN ri <= 5 THEN ROUND(CAST(rel
        |    / (LN(CAST(ri AS DOUBLE) + 1) / 0.6931471805599453e0)
        |    AS DECIMAL(18,8)), 8)
        |    ELSE CAST(0 AS DECIMAL(18,8)) END) AS idcg,
        |  MIN(CASE WHEN r <= 5 AND rel > 0 THEN r END) AS fr,
        |  SUM(CASE WHEN r <= 5 AND rel > 0 THEN 1 ELSE 0 END) AS hits
        |  FROM rk GROUP BY 1)
        |SELECT g AS query, n_items,
        |  CAST(ROUND(CAST(CASE WHEN idcg > 0 THEN
        |      CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE)
        |    END AS DECIMAL(18,8)), 6) AS DOUBLE) AS ndcg_5,
        |  CAST(ROUND(CAST(CASE WHEN fr IS NOT NULL THEN 1.0e0 / fr
        |    END AS DECIMAL(18,8)), 6) AS DOUBLE) AS mrr_5,
        |  CAST(ROUND(CAST(CAST(hits AS DOUBLE) / 5
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS precision_5,
        |  CAST(ROUND(CAST(CASE WHEN npos > 0 THEN
        |      CAST(hits AS DOUBLE) / npos
        |    END AS DECIMAL(18,8)), 6) AS DOUBLE) AS recall_5
        |FROM a ORDER BY query""".stripMargin,

    // Beta-binomial shrinkage: per-key exact counts, 1-row
    // method-of-moments prior with round-then-add rate/rate² terms,
    // one float chain per output.
    "x251_beta_shrinkage" ->
      """WITH bk AS (SELECT l_partkey,
        |  SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS s,
        |  COUNT(*) AS t FROM lineitem GROUP BY 1),
        |k0 AS (SELECT l_partkey, s, t FROM bk WHERE t > 0),
        |mo AS (SELECT COUNT(*) AS k,
        |  SUM(ROUND(CAST(CAST(s AS DOUBLE) / t AS DECIMAL(18,8)), 8))
        |    AS sr,
        |  SUM(ROUND(CAST((CAST(s AS DOUBLE) / t)
        |    * (CAST(s AS DOUBLE) / t) AS DECIMAL(18,8)), 8)) AS srr
        |  FROM k0),
        |pr AS (SELECT
        |  CASE WHEN k > 1
        |    AND (CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE)
        |      * CAST(sr AS DOUBLE) / CAST(k AS DOUBLE))
        |      / (CAST(k AS DOUBLE) - 1) > 0
        |    AND (CAST(sr AS DOUBLE) / CAST(k AS DOUBLE))
        |      * (1.0e0 - CAST(sr AS DOUBLE) / CAST(k AS DOUBLE))
        |      / ((CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE)
        |        * CAST(sr AS DOUBLE) / CAST(k AS DOUBLE))
        |        / (CAST(k AS DOUBLE) - 1)) - 1 > 0
        |  THEN (CAST(sr AS DOUBLE) / CAST(k AS DOUBLE))
        |    * ((CAST(sr AS DOUBLE) / CAST(k AS DOUBLE))
        |      * (1.0e0 - CAST(sr AS DOUBLE) / CAST(k AS DOUBLE))
        |      / ((CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE)
        |        * CAST(sr AS DOUBLE) / CAST(k AS DOUBLE))
        |        / (CAST(k AS DOUBLE) - 1)) - 1)
        |  END AS alpha,
        |  CASE WHEN k > 1
        |    AND (CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE)
        |      * CAST(sr AS DOUBLE) / CAST(k AS DOUBLE))
        |      / (CAST(k AS DOUBLE) - 1) > 0
        |    AND (CAST(sr AS DOUBLE) / CAST(k AS DOUBLE))
        |      * (1.0e0 - CAST(sr AS DOUBLE) / CAST(k AS DOUBLE))
        |      / ((CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE)
        |        * CAST(sr AS DOUBLE) / CAST(k AS DOUBLE))
        |        / (CAST(k AS DOUBLE) - 1)) - 1 > 0
        |  THEN (1.0e0 - CAST(sr AS DOUBLE) / CAST(k AS DOUBLE))
        |    * ((CAST(sr AS DOUBLE) / CAST(k AS DOUBLE))
        |      * (1.0e0 - CAST(sr AS DOUBLE) / CAST(k AS DOUBLE))
        |      / ((CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE)
        |        * CAST(sr AS DOUBLE) / CAST(k AS DOUBLE))
        |        / (CAST(k AS DOUBLE) - 1)) - 1)
        |  END AS beta
        |  FROM mo)
        |SELECT l_partkey, CAST(t AS BIGINT) AS trials,
        |  CAST(s AS BIGINT) AS successes,
        |  CAST(ROUND(CAST(CAST(s AS DOUBLE) / t AS DECIMAL(18,8)), 6)
        |    AS DOUBLE) AS raw_rate,
        |  CAST(ROUND(CAST((alpha + s) / (alpha + beta + t)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS shrunk_rate
        |FROM k0 CROSS JOIN pr ORDER BY l_partkey""".stripMargin,

    // Wilson score interval: exact per-key counts, single float
    // chains with the z = 1.96 literal.
    "x252_wilson_interval" ->
      """WITH bk AS (SELECT l_partkey,
        |  SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS s,
        |  COUNT(*) AS t FROM lineitem GROUP BY 1)
        |SELECT l_partkey, CAST(t AS BIGINT) AS trials,
        |  CAST(s AS BIGINT) AS successes,
        |  CAST(ROUND(CAST(CAST(s AS DOUBLE) / CAST(t AS DOUBLE)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS rate,
        |  CAST(ROUND(CAST(
        |    (CAST(s AS DOUBLE) / CAST(t AS DOUBLE)
        |      + 3.8415999999999997e0 / (2.0e0 * CAST(t AS DOUBLE))
        |      - 1.96e0 * SQRT(
        |        (CAST(s AS DOUBLE) / CAST(t AS DOUBLE))
        |          * (1.0e0 - CAST(s AS DOUBLE) / CAST(t AS DOUBLE))
        |          / CAST(t AS DOUBLE)
        |        + 3.8415999999999997e0
        |          / (4.0e0 * CAST(t AS DOUBLE) * CAST(t AS DOUBLE))))
        |    / (1.0e0 + 3.8415999999999997e0 / CAST(t AS DOUBLE))
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS wilson_lo,
        |  CAST(ROUND(CAST(
        |    (CAST(s AS DOUBLE) / CAST(t AS DOUBLE)
        |      + 3.8415999999999997e0 / (2.0e0 * CAST(t AS DOUBLE))
        |      + 1.96e0 * SQRT(
        |        (CAST(s AS DOUBLE) / CAST(t AS DOUBLE))
        |          * (1.0e0 - CAST(s AS DOUBLE) / CAST(t AS DOUBLE))
        |          / CAST(t AS DOUBLE)
        |        + 3.8415999999999997e0
        |          / (4.0e0 * CAST(t AS DOUBLE) * CAST(t AS DOUBLE))))
        |    / (1.0e0 + 3.8415999999999997e0 / CAST(t AS DOUBLE))
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS wilson_hi
        |FROM bk WHERE t > 0 ORDER BY l_partkey""".stripMargin,

    // CUPED: per-unit conditional pre/post sums (one scan), exact
    // decimal moments, theta and the reduction as single float chains.
    "x253_cuped" ->
      """WITH pu AS (SELECT user_id,
        |  CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN
        |    CAST(value AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6))
        |    END) AS DECIMAL(18,6)) AS x,
        |  CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN
        |    CAST(value AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6))
        |    END) AS DECIMAL(18,6)) AS y
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |m AS (SELECT COUNT(*) AS n,
        |  CAST(SUM(x) AS DECIMAL(24,6)) AS sx,
        |  CAST(SUM(y) AS DECIMAL(24,6)) AS sy,
        |  CAST(SUM(CAST(CAST(x AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6))
        |    AS DECIMAL(28,12))) AS DECIMAL(28,12)) AS sxy,
        |  CAST(SUM(CAST(CAST(x AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6))
        |    AS DECIMAL(28,12))) AS DECIMAL(28,12)) AS sxx,
        |  CAST(SUM(CAST(CAST(y AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6))
        |    AS DECIMAL(28,12))) AS DECIMAL(28,12)) AS syy FROM pu)
        |SELECT CAST(n AS BIGINT) AS n_units,
        |  CAST(ROUND(CAST(CASE WHEN CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |        / CAST(n AS DOUBLE) > 0 THEN
        |      (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
        |        * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
        |        * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |    END AS DECIMAL(18,8)), 6) AS DOUBLE) AS theta,
        |  CAST(ROUND(CAST(CASE WHEN n > 1 THEN
        |      (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
        |        * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - 1)
        |    END AS DECIMAL(18,8)), 6) AS DOUBLE) AS var_post,
        |  CAST(ROUND(CAST(CASE WHEN CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |        / CAST(n AS DOUBLE) > 0
        |      AND CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
        |        * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) > 0
        |      AND n > 1 THEN
        |      ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
        |        * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |      - (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
        |        * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |        * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
        |          * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |        / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
        |          * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
        |      / (CAST(n AS DOUBLE) - 1)
        |    END AS DECIMAL(18,8)), 6) AS DOUBLE) AS var_adjusted,
        |  CAST(ROUND(CAST(CASE WHEN CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |        / CAST(n AS DOUBLE) > 0
        |      AND CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
        |        * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) > 0 THEN
        |      (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
        |        * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
        |        * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |      / ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
        |        * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |        * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
        |          * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
        |    END AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS variance_reduction
        |FROM m""".stripMargin,

    // mSPRT: per-arm exact-decimal moments (one scan), then the
    // mixture-likelihood chain as staged DOUBLE columns — identical
    // op sequence to Evaluation.msprtFromMoments; τ² and ln(1/α) are
    // the SAME Scala doubles the engine embeds (0.1*0.1 =
    // 1.0000000000000002e-2, ln(1/0.05) = 2.995732273553991e0).
    "x254_msprt" ->
      """WITH r AS (SELECT
        |  CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t,
        |  CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
        |m AS (SELECT SUM(t) AS na, SUM(1 - t) AS nb,
        |  CAST(SUM(CASE WHEN t = 1 THEN v
        |    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(24,6)) AS sa,
        |  CAST(SUM(CASE WHEN t = 0 THEN v
        |    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(24,6)) AS sb,
        |  CAST(SUM(CASE WHEN t = 1 THEN
        |      CAST(CAST(v AS DECIMAL(19,6)) * CAST(v AS DECIMAL(19,6))
        |        AS DECIMAL(28,12))
        |    ELSE CAST(0 AS DECIMAL(28,12)) END) AS DECIMAL(28,12)) AS saa,
        |  CAST(SUM(CASE WHEN t = 0 THEN
        |      CAST(CAST(v AS DECIMAL(19,6)) * CAST(v AS DECIMAL(19,6))
        |        AS DECIMAL(28,12))
        |    ELSE CAST(0 AS DECIMAL(28,12)) END) AS DECIMAL(28,12)) AS sbb
        |  FROM r),
        |g AS (SELECT na, nb,
        |  CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) AS ma,
        |  CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS mb,
        |  (CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
        |    / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1) AS va,
        |  (CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
        |    / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1) AS vb
        |  FROM m),
        |h AS (SELECT na, nb, ma, mb,
        |  va / CAST(na AS DOUBLE) + vb / CAST(nb AS DOUBLE) AS vv,
        |  ma - mb AS delta FROM g),
        |k AS (SELECT na, nb, ma, mb, vv, delta,
        |  5e-1 * LN(vv / (vv + 1.0000000000000002e-2))
        |    + delta * delta * 1.0000000000000002e-2
        |      / (2.0e0 * vv * (vv + 1.0000000000000002e-2)) AS loglam,
        |  (na > 1 AND nb > 1 AND vv > 0) AS ok FROM h)
        |SELECT CAST(na AS BIGINT) AS n_treat, CAST(nb AS BIGINT) AS n_control,
        |  CAST(ROUND(CAST(CASE WHEN na > 0 THEN ma END
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS mean_treat,
        |  CAST(ROUND(CAST(CASE WHEN nb > 0 THEN mb END
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS mean_control,
        |  CAST(ROUND(CAST(CASE WHEN ok THEN delta END
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS delta,
        |  CAST(ROUND(CAST(CASE WHEN ok THEN loglam END
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS log_lambda,
        |  CAST(ROUND(CAST(CASE WHEN ok THEN EXP(LEAST(0.0e0, -loglam)) END
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS p_always_valid,
        |  CASE WHEN ok THEN CASE WHEN loglam >= 2.995732273553991e0
        |    THEN 1 ELSE 0 END END AS reject
        |FROM k""".stripMargin,

    // SRM: per-arm counts vs the designed split; per-arm chi-square
    // terms round to DECIMAL(18,8) before the exact sum (round-then-
    // add), flag vs the published df-1 critical value.
    "x255_srm_check" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |c AS (SELECT CASE WHEN SUBSTR(MD5(CAST(user_id AS VARCHAR)), 1, 1)
        |    < '8' THEN 'A' ELSE 'B' END AS arm, COUNT(*) AS n
        |  FROM u GROUP BY 1),
        |d AS (SELECT * FROM (VALUES ('A', 0.5e0), ('B', 0.5e0))
        |  AS t(arm, r)),
        |tot AS (SELECT SUM(n) AS nt FROM c),
        |j AS (SELECT d.arm, d.r, COALESCE(c.n, 0) AS n, tot.nt
        |  FROM d LEFT JOIN c USING (arm) CROSS JOIN tot),
        |chi AS (SELECT MIN(nt) AS n_total,
        |  SUM(ROUND(CAST((CAST(n AS DOUBLE) - r * CAST(nt AS DOUBLE))
        |    * (CAST(n AS DOUBLE) - r * CAST(nt AS DOUBLE))
        |    / (r * CAST(nt AS DOUBLE)) AS DECIMAL(18,8)), 8)) AS x
        |  FROM j)
        |SELECT CAST(n_total AS BIGINT) AS n_total, 1 AS dof,
        |  CAST(ROUND(CAST(x AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS chi_square,
        |  CASE WHEN n_total > 0 THEN CASE WHEN
        |    CAST(ROUND(CAST(x AS DECIMAL(18,8)), 6) AS DOUBLE) > 3.841e0
        |    THEN 1 ELSE 0 END END AS srm_flag
        |FROM chi""".stripMargin,

    // BH-FDR over per-source mSPRT p-values: the x254 statistic chain
    // GROUP BY source, then rank/step-up with the no-division compare
    // p*m <= rank*q.
    "x256_bh_fdr" ->
      """WITH r AS (SELECT source,
        |  CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS t,
        |  CAST(n_chars AS DECIMAL(18,6)) AS v
        |  FROM documents WHERE n_chars IS NOT NULL),
        |m AS (SELECT source, SUM(t) AS na, SUM(1 - t) AS nb,
        |  CAST(SUM(CASE WHEN t = 1 THEN v
        |    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(24,6)) AS sa,
        |  CAST(SUM(CASE WHEN t = 0 THEN v
        |    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(24,6)) AS sb,
        |  CAST(SUM(CASE WHEN t = 1 THEN
        |      CAST(CAST(v AS DECIMAL(19,6)) * CAST(v AS DECIMAL(19,6))
        |        AS DECIMAL(28,12))
        |    ELSE CAST(0 AS DECIMAL(28,12)) END) AS DECIMAL(28,12)) AS saa,
        |  CAST(SUM(CASE WHEN t = 0 THEN
        |      CAST(CAST(v AS DECIMAL(19,6)) * CAST(v AS DECIMAL(19,6))
        |        AS DECIMAL(28,12))
        |    ELSE CAST(0 AS DECIMAL(28,12)) END) AS DECIMAL(28,12)) AS sbb
        |  FROM r GROUP BY source),
        |g AS (SELECT source, na, nb,
        |  CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) AS ma,
        |  CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS mb,
        |  (CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
        |    / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1) AS va,
        |  (CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
        |    / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1) AS vb
        |  FROM m),
        |h AS (SELECT source, na, nb, ma, mb,
        |  va / CAST(na AS DOUBLE) + vb / CAST(nb AS DOUBLE) AS vv,
        |  ma - mb AS delta FROM g),
        |k AS (SELECT source, na, nb, vv, delta,
        |  5e-1 * LN(vv / (vv + 1.0000000000000002e-2))
        |    + delta * delta * 1.0000000000000002e-2
        |      / (2.0e0 * vv * (vv + 1.0000000000000002e-2)) AS loglam,
        |  (na > 1 AND nb > 1 AND vv > 0) AS ok FROM h),
        |p AS (SELECT source,
        |  CAST(ROUND(CAST(CASE WHEN ok THEN EXP(LEAST(0.0e0, -loglam)) END
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS pv FROM k),
        |q AS (SELECT source, pv,
        |  ROW_NUMBER() OVER (ORDER BY pv, source) AS rnk,
        |  COUNT(*) OVER () AS mt FROM p WHERE pv IS NOT NULL),
        |s AS (SELECT *, MAX(CASE WHEN pv * CAST(mt AS DOUBLE)
        |    <= CAST(rnk AS DOUBLE) * 1e-1 THEN rnk END) OVER () AS kk
        |  FROM q)
        |SELECT source,
        |  CAST(ROUND(CAST(pv AS DECIMAL(18,8)), 6) AS DOUBLE) AS p_value,
        |  CAST(rnk AS BIGINT) AS rank, CAST(mt AS BIGINT) AS m_tests,
        |  CAST(ROUND(CAST(CAST(rnk AS DOUBLE) * 1e-1 / CAST(mt AS DOUBLE)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS bh_threshold,
        |  CAST(COALESCE(rnk <= kk, FALSE) AS INT) AS rejected
        |FROM s ORDER BY source""".stripMargin,

    // Sample-size planner: baseline rate per part, the Fleiss
    // two-proportion n with z literals 1.96 / 0.8416 and the SAME
    // double 1.1 lift multiplier, CEILed in both engines.
    "x257_sample_size" ->
      """WITH bk AS (SELECT l_partkey,
        |  SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS s,
        |  COUNT(*) AS t FROM lineitem GROUP BY 1),
        |g AS (SELECT l_partkey, t,
        |  CAST(s AS DOUBLE) / CAST(t AS DOUBLE) AS p1,
        |  CAST(s AS DOUBLE) / CAST(t AS DOUBLE) * 1.1e0 AS p2
        |  FROM bk WHERE t > 0),
        |h AS (SELECT l_partkey, t, p1, p2,
        |  1.96e0 * SQRT(2.0e0 * ((p1 + p2) / 2.0e0)
        |      * (1.0e0 - (p1 + p2) / 2.0e0))
        |    + 0.8416e0 * SQRT(p1 * (1.0e0 - p1) + p2 * (1.0e0 - p2))
        |    AS num FROM g)
        |SELECT l_partkey, CAST(t AS BIGINT) AS trials,
        |  CAST(ROUND(CAST(p1 AS DECIMAL(18,8)), 6) AS DOUBLE) AS rate,
        |  CAST(ROUND(CAST(CASE WHEN p2 < 1 THEN p2 END
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS target_rate,
        |  CASE WHEN p1 > 0 AND p2 < 1 THEN
        |    CAST(CEIL(num * num / ((p2 - p1) * (p2 - p1))) AS BIGINT)
        |  END AS n_per_arm
        |FROM h ORDER BY l_partkey""".stripMargin,

    // Delta-method ratio CI: per-unit conditional sums (one scan),
    // exact decimal moments, the KDD'18 variance as one float chain.
    "x258_ratio_metric" ->
      """WITH pu AS (SELECT user_id,
        |  CAST(SUM(COALESCE(CASE WHEN event_type = 'purchase' THEN
        |    CAST(value AS DECIMAL(18,6)) END, CAST(0 AS DECIMAL(18,6))))
        |    AS DECIMAL(18,6)) AS y,
        |  CAST(SUM(CAST(1 AS DECIMAL(18,6)))
        |    AS DECIMAL(18,6)) AS x
        |  FROM events GROUP BY 1),
        |m AS (SELECT COUNT(*) AS n,
        |  CAST(SUM(y) AS DECIMAL(24,6)) AS sy,
        |  CAST(SUM(x) AS DECIMAL(24,6)) AS sx,
        |  CAST(SUM(CAST(CAST(y AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6))
        |    AS DECIMAL(28,12))) AS DECIMAL(28,12)) AS syy,
        |  CAST(SUM(CAST(CAST(x AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6))
        |    AS DECIMAL(28,12))) AS DECIMAL(28,12)) AS sxx,
        |  CAST(SUM(CAST(CAST(y AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6))
        |    AS DECIMAL(28,12))) AS DECIMAL(28,12)) AS syx FROM pu),
        |g AS (SELECT n,
        |  CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar,
        |  CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE) AS r,
        |  CAST(sx AS DOUBLE) AS sxd,
        |  (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
        |    / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) AS vy,
        |  (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |    / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) AS vx,
        |  (CAST(syx AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sx AS DOUBLE)
        |    / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) AS cyx
        |  FROM m),
        |h AS (SELECT n, r, sxd,
        |  SQRT(GREATEST((vy - 2.0e0 * r * cyx + r * r * vx)
        |    / (CAST(n AS DOUBLE) * xbar * xbar), 0.0e0)) AS se
        |  FROM g)
        |SELECT CAST(n AS BIGINT) AS n_units,
        |  CAST(ROUND(CAST(CASE WHEN sxd <> 0.0e0 THEN r END
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS ratio,
        |  CAST(ROUND(CAST(CASE WHEN n > 1 AND sxd <> 0.0e0 THEN se END
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS se,
        |  CAST(ROUND(CAST(CASE WHEN n > 1 AND sxd <> 0.0e0 THEN
        |    r - 1.96e0 * se END AS DECIMAL(18,8)), 6) AS DOUBLE) AS ci_lo,
        |  CAST(ROUND(CAST(CASE WHEN n > 1 AND sxd <> 0.0e0 THEN
        |    r + 1.96e0 * se END AS DECIMAL(18,8)), 6) AS DOUBLE) AS ci_hi
        |FROM h""".stripMargin,

    // HLL sketch: identical md5-hex register arithmetic — bucket from
    // md5('b:'||k) mod m, rank 33 − length(bin(w)) from md5('r:'||k)
    // (exact integer significant-bits, no log2 float), harmonic sum
    // exact via 2^(40−r) BIGINT terms; alpha and the float chain are
    // the same IEEE op sequence; the one libm ln (linear counting)
    // pins to 8 dp before the multiply.
    "x259_hll_distinct" ->
      """WITH r AS (SELECT DISTINCT CAST(l_orderkey AS VARCHAR) AS k
        |  FROM lineitem WHERE l_orderkey IS NOT NULL),
        |w AS (SELECT k,
        |  ('0x' || substr(md5('b:' || k), 1, 8))::BIGINT % 1024 AS b,
        |  ('0x' || substr(md5('r:' || k), 1, 8))::BIGINT AS wd FROM r),
        |reg AS (SELECT b, MAX(CASE WHEN wd = 0 THEN 33
        |  ELSE 33 - length(bin(wd)) END) AS rk FROM w GROUP BY 1),
        |ag AS (SELECT COUNT(*) AS nonempty,
        |  CAST(SUM(1::BIGINT << (40 - rk)) AS BIGINT)
        |    + (1024 - COUNT(*)) * (1::BIGINT << 40) AS s FROM reg),
        |e AS (SELECT nonempty, 1024 - nonempty AS z,
        |  (0.7213e0 / (1.0e0 + 1.079e0 / 1024.0e0)) * 1048576.0e0
        |    * 1099511627776.0e0 / CAST(s AS DOUBLE) AS raw FROM ag),
        |f AS (SELECT nonempty, raw,
        |  CASE WHEN raw <= 2.5e0 * 1024.0e0 AND z > 0 THEN
        |    1024.0e0 * CAST(ROUND(CAST(LN(1024.0e0 / CAST(z AS DOUBLE))
        |      AS DECIMAL(18,8)), 8) AS DOUBLE)
        |  ELSE raw END AS est FROM e),
        |tr AS (SELECT COUNT(*) AS true_distinct FROM r)
        |SELECT 1024 AS m, CAST(nonempty AS BIGINT) AS nonempty,
        |  CAST(ROUND(CAST(raw AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS raw_estimate,
        |  CAST(ROUND(CAST(est AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS estimate,
        |  CAST(true_distinct AS BIGINT) AS true_distinct,
        |  CAST(ROUND(CAST((CAST(ROUND(CAST(est AS DECIMAL(18,8)), 6)
        |      AS DOUBLE) - CAST(true_distinct AS DOUBLE))
        |    / CAST(true_distinct AS DOUBLE) AS DECIMAL(18,8)), 6)
        |    AS DOUBLE) AS rel_error
        |FROM f CROSS JOIN tr""".stripMargin,

    // KMV sketch: bottom-k distinct 48-bit md5-prefix hashes (exact
    // in BIGINT and DOUBLE), estimate (k−1)·2^48/u as one
    // correctly-rounded float chain — no ln, no pow; below k distinct
    // the sketch is the exact set.
    "x260_kmv_distinct" ->
      """WITH h AS (SELECT DISTINCT ('0x' || substr(
        |    md5(CAST(l_partkey AS VARCHAR)), 1, 12))::BIGINT AS h
        |  FROM lineitem WHERE l_partkey IS NOT NULL),
        |sk AS (SELECT h FROM h ORDER BY h LIMIT 256),
        |ag AS (SELECT COUNT(*) AS sketch_size, MAX(h) AS u FROM sk),
        |e AS (SELECT sketch_size,
        |  CAST(ROUND(CAST(CASE WHEN sketch_size < 256 THEN
        |      CAST(sketch_size AS DOUBLE)
        |    ELSE 255.0e0 * 281474976710656.0e0 / CAST(u AS DOUBLE) END
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS estimate FROM ag),
        |tr AS (SELECT COUNT(DISTINCT CAST(l_partkey AS VARCHAR))
        |    AS true_distinct
        |  FROM lineitem WHERE l_partkey IS NOT NULL)
        |SELECT 256 AS k, CAST(sketch_size AS BIGINT) AS sketch_size,
        |  estimate, CAST(true_distinct AS BIGINT) AS true_distinct,
        |  CAST(ROUND(CAST((estimate - CAST(true_distinct AS DOUBLE))
        |    / CAST(true_distinct AS DOUBLE) AS DECIMAL(18,8)), 6)
        |    AS DOUBLE) AS rel_error
        |FROM e CROSS JOIN tr""".stripMargin,

    // KMV set ops: union sketch = bottom-k of the merged bottom-k
    // sets; Jaccard = in-both share of the union sketch; raw (not
    // rounded) j·ue feeds the intersection round, mirroring the
    // engine's expression tree.
    "x261_kmv_setops" ->
      """WITH ha AS (SELECT DISTINCT ('0x' || substr(
        |    md5(CAST(o_custkey AS VARCHAR)), 1, 12))::BIGINT AS h
        |  FROM orders WHERE o_orderpriority = '1-URGENT'
        |    AND o_custkey IS NOT NULL),
        |hb AS (SELECT DISTINCT ('0x' || substr(
        |    md5(CAST(o_custkey AS VARCHAR)), 1, 12))::BIGINT AS h
        |  FROM orders WHERE o_orderpriority = '2-HIGH'
        |    AND o_custkey IS NOT NULL),
        |ska AS (SELECT h FROM ha ORDER BY h LIMIT 256),
        |skb AS (SELECT h FROM hb ORDER BY h LIMIT 256),
        |un AS (SELECT DISTINCT h FROM
        |  (SELECT h FROM ska UNION ALL SELECT h FROM skb)
        |  ORDER BY h LIMIT 256),
        |mk AS (SELECT un.h, CASE WHEN ska.h IS NOT NULL
        |    AND skb.h IS NOT NULL THEN 1 ELSE 0 END AS bo
        |  FROM un LEFT JOIN ska ON un.h = ska.h
        |  LEFT JOIN skb ON un.h = skb.h),
        |ag AS (SELECT COUNT(*) AS n, MAX(h) AS u, SUM(bo) AS c FROM mk),
        |e AS (SELECT
        |  CASE WHEN n < 256 THEN CAST(n AS DOUBLE)
        |    ELSE 255.0e0 * 281474976710656.0e0 / CAST(u AS DOUBLE) END
        |    AS ue,
        |  CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS j FROM ag),
        |tr AS (SELECT COUNT(*) AS true_union,
        |  CAST(SUM(CASE WHEN ina = 1 AND inb = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS true_intersection
        |  FROM (SELECT CAST(o_custkey AS VARCHAR) AS kk,
        |    MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0
        |      END) AS ina,
        |    MAX(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0
        |      END) AS inb
        |    FROM orders WHERE o_orderpriority IN
        |      ('1-URGENT', '2-HIGH') AND o_custkey IS NOT NULL
        |    GROUP BY 1))
        |SELECT 256 AS k,
        |  CAST(ROUND(CAST(ue AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS union_estimate,
        |  CAST(ROUND(CAST(j AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS jaccard_estimate,
        |  CAST(ROUND(CAST(j * ue AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS intersection_estimate,
        |  CAST(true_union AS BIGINT) AS true_union, true_intersection,
        |  CAST(ROUND(CAST(CAST(true_intersection AS DOUBLE)
        |    / CAST(true_union AS DOUBLE) AS DECIMAL(18,8)), 6)
        |    AS DOUBLE) AS true_jaccard
        |FROM e CROSS JOIN tr""".stripMargin,

    // AMS F2: ±1 sign from the md5 top hex char ('0'..'7' → +1),
    // depth sign-sums, median of S² over an odd depth (quantile_cont
    // at the exact middle — no interpolation), exact true Σf².
    "x262_ams_f2" ->
      """WITH r AS (SELECT CAST(l_suppkey AS VARCHAR) AS k
        |  FROM lineitem WHERE l_suppkey IS NOT NULL),
        |sd AS (SELECT unnest(range(9)) AS j),
        |s AS (SELECT j, CAST(SUM(CASE WHEN substr(md5(
        |    CAST(j AS VARCHAR) || ':' || k), 1, 1) < '8'
        |  THEN 1 ELSE -1 END) AS BIGINT) AS ss
        |  FROM r CROSS JOIN sd GROUP BY 1),
        |e AS (SELECT quantile_cont(ss * ss, 0.5) AS est FROM s),
        |tr AS (SELECT CAST(SUM(f * f) AS BIGINT) AS f2_true FROM
        |  (SELECT COUNT(*) AS f FROM r GROUP BY k))
        |SELECT 9 AS depth,
        |  CAST(ROUND(CAST(est AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS f2_estimate,
        |  f2_true,
        |  CAST(ROUND(CAST((est - CAST(f2_true AS DOUBLE))
        |    / CAST(f2_true AS DOUBLE) AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS rel_error
        |FROM e CROSS JOIN tr""".stripMargin,

    // AMS join size: same-seed sign-sums per side, median of SA·SB;
    // the exact truth is the per-key count join.
    "x263_ams_join_size" ->
      """WITH ra AS (SELECT CAST(user_id AS VARCHAR) AS k
        |  FROM events WHERE user_id IS NOT NULL),
        |rb AS (SELECT CAST(o_custkey AS VARCHAR) AS k
        |  FROM orders WHERE o_custkey IS NOT NULL),
        |sd AS (SELECT unnest(range(9)) AS j),
        |sa AS (SELECT j, CAST(SUM(CASE WHEN substr(md5(
        |    CAST(j AS VARCHAR) || ':' || k), 1, 1) < '8'
        |  THEN 1 ELSE -1 END) AS BIGINT) AS ssa
        |  FROM ra CROSS JOIN sd GROUP BY 1),
        |sb AS (SELECT j, CAST(SUM(CASE WHEN substr(md5(
        |    CAST(j AS VARCHAR) || ':' || k), 1, 1) < '8'
        |  THEN 1 ELSE -1 END) AS BIGINT) AS ssb
        |  FROM rb CROSS JOIN sd GROUP BY 1),
        |e AS (SELECT quantile_cont(ssa * ssb, 0.5) AS est
        |  FROM sa JOIN sb USING (j)),
        |tr AS (SELECT CAST(COALESCE(SUM(fa * fb), 0) AS BIGINT)
        |    AS join_true FROM
        |  (SELECT k, COUNT(*) AS fa FROM ra GROUP BY 1) a
        |  JOIN (SELECT k, COUNT(*) AS fb FROM rb GROUP BY 1) b
        |  USING (k))
        |SELECT 9 AS depth,
        |  CAST(ROUND(CAST(est AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS join_estimate,
        |  join_true,
        |  CAST(ROUND(CAST(CASE WHEN join_true > 0 THEN
        |    (est - CAST(join_true AS DOUBLE))
        |      / CAST(join_true AS DOUBLE) END AS DECIMAL(18,8)), 6)
        |    AS DOUBLE) AS rel_error
        |FROM e CROSS JOIN tr""".stripMargin,

    // Grouped HLL: x259's register arithmetic with the group key in
    // every GROUP BY; per-group finishing and exact truths.
    "x264_hll_grouped" ->
      """WITH r AS (SELECT DISTINCT o_orderpriority AS g,
        |    CAST(o_custkey AS VARCHAR) AS k
        |  FROM orders WHERE o_custkey IS NOT NULL),
        |w AS (SELECT g, k,
        |  ('0x' || substr(md5('b:' || k), 1, 8))::BIGINT % 1024 AS b,
        |  ('0x' || substr(md5('r:' || k), 1, 8))::BIGINT AS wd FROM r),
        |reg AS (SELECT g, b, MAX(CASE WHEN wd = 0 THEN 33
        |  ELSE 33 - length(bin(wd)) END) AS rk FROM w GROUP BY 1, 2),
        |ag AS (SELECT g, COUNT(*) AS nonempty,
        |  CAST(SUM(1::BIGINT << (40 - rk)) AS BIGINT)
        |    + (1024 - COUNT(*)) * (1::BIGINT << 40) AS s
        |  FROM reg GROUP BY 1),
        |e AS (SELECT g, nonempty, 1024 - nonempty AS z,
        |  (0.7213e0 / (1.0e0 + 1.079e0 / 1024.0e0)) * 1048576.0e0
        |    * 1099511627776.0e0 / CAST(s AS DOUBLE) AS raw FROM ag),
        |f AS (SELECT g, nonempty,
        |  CASE WHEN raw <= 2.5e0 * 1024.0e0 AND z > 0 THEN
        |    1024.0e0 * CAST(ROUND(CAST(LN(1024.0e0 / CAST(z AS DOUBLE))
        |      AS DECIMAL(18,8)), 8) AS DOUBLE)
        |  ELSE raw END AS est FROM e),
        |tr AS (SELECT g, COUNT(*) AS true_distinct FROM r GROUP BY 1)
        |SELECT f.g AS o_orderpriority,
        |  1024 AS m, CAST(nonempty AS BIGINT) AS nonempty,
        |  CAST(ROUND(CAST(est AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS estimate,
        |  CAST(true_distinct AS BIGINT) AS true_distinct,
        |  CAST(ROUND(CAST((CAST(ROUND(CAST(est AS DECIMAL(18,8)), 6)
        |      AS DOUBLE) - CAST(true_distinct AS DOUBLE))
        |    / CAST(true_distinct AS DOUBLE) AS DECIMAL(18,8)), 6)
        |    AS DOUBLE) AS rel_error
        |FROM f JOIN tr ON f.g = tr.g ORDER BY o_orderpriority""".stripMargin,

    // Poisson bootstrap: md5-uniform u scaled by exact 2^-48, the
    // inverse-CDF CASE over the SAME full-precision Poisson(1)
    // cumulative literals, exact-decimal weighted sums, and the CI
    // read at exact order-statistic indices ((81-1)*q integral — no
    // interpolation arithmetic on either engine).
    "x265_bootstrap_ci" ->
      """WITH r AS (SELECT CAST(l_orderkey AS VARCHAR) || '-' ||
        |    CAST(l_linenumber AS VARCHAR) AS k,
        |  CAST(l_extendedprice AS DECIMAL(18,6)) AS v
        |  FROM lineitem WHERE l_orderkey IS NOT NULL
        |    AND l_linenumber IS NOT NULL
        |    AND l_extendedprice IS NOT NULL),
        |sd AS (SELECT unnest(range(81)) AS b),
        |u AS (SELECT b, v, CAST(('0x' || substr(md5(
        |    CAST(b AS VARCHAR) || ':' || k), 1, 12))::BIGINT AS DOUBLE)
        |  / 281474976710656.0e0 AS uu FROM r CROSS JOIN sd),
        |w AS (SELECT b, v,
        |  CASE WHEN uu < 0.36787944117144233e0 THEN 0
        |    WHEN uu < 0.7357588823428847e0 THEN 1
        |    WHEN uu < 0.9196986029286058e0 THEN 2
        |    WHEN uu < 0.9810118431238463e0 THEN 3
        |    WHEN uu < 0.9963401531726563e0 THEN 4
        |    WHEN uu < 0.9994058151824183e0 THEN 5
        |    WHEN uu < 0.999916758850712e0 THEN 6
        |    WHEN uu < 0.9999897508033253e0 THEN 7
        |    WHEN uu < 0.999998874797402e0 THEN 8
        |    WHEN uu < 0.9999998885745216e0 THEN 9
        |    ELSE 10 END AS w FROM u),
        |m AS (SELECT b, CAST(SUM(w) AS BIGINT) AS n,
        |  SUM(CAST(w * v AS DECIMAL(28,6))) AS s FROM w GROUP BY 1),
        |mm AS (SELECT b, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m
        |  FROM m),
        |ci AS (SELECT quantile_cont(m, 0.025) AS lo,
        |  quantile_cont(m, 0.975) AS hi FROM mm),
        |pt AS (SELECT COUNT(*) AS n, CAST(SUM(v) AS DOUBLE)
        |  / CAST(COUNT(*) AS DOUBLE) AS mean FROM r)
        |SELECT CAST(pt.n AS BIGINT) AS n, 81 AS b,
        |  CAST(ROUND(CAST(mean AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS mean,
        |  CAST(ROUND(CAST(lo AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS ci_lo,
        |  CAST(ROUND(CAST(hi AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS ci_hi
        |FROM pt CROSS JOIN ci""".stripMargin,

    // Kaplan–Meier: per-duration (deaths, censored) table, risk sets
    // from a reverse running sum BEFORE the event-time filter, the
    // product as exp of an exact-decimal sum of 8dp-rounded ln terms,
    // exhausted risk sets pinned to survival 0.
    "x266_kaplan_meier" ->
      """WITH pu AS (SELECT user_id, MIN(ts) AS t0,
        |  MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
        |  FROM events GROUP BY 1),
        |hz AS (SELECT MAX(ts) AS e FROM events),
        |su AS (SELECT CASE WHEN tp IS NOT NULL THEN
        |    datediff('day', CAST(t0 AS DATE), CAST(tp AS DATE))
        |  ELSE datediff('day', CAST(t0 AS DATE), CAST(e AS DATE))
        |  END AS dur,
        |  CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
        |  FROM pu CROSS JOIN hz),
        |bt AS (SELECT CAST(dur AS BIGINT) AS t,
        |  CAST(SUM(ev) AS BIGINT) AS d,
        |  CAST(SUM(1 - ev) AS BIGINT) AS c FROM su
        |  WHERE dur IS NOT NULL GROUP BY 1),
        |rk AS (SELECT t, d, c, CAST(SUM(d + c) OVER (ORDER BY t
        |  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |  AS BIGINT) AS n FROM bt),
        |evt AS (SELECT * FROM rk WHERE d > 0),
        |lt AS (SELECT t, n, d, c,
        |  CASE WHEN d < n THEN ROUND(CAST(LN(1.0e0
        |    - CAST(d AS DOUBLE) / CAST(n AS DOUBLE))
        |    AS DECIMAL(18,8)), 8) END AS l,
        |  MAX(CASE WHEN d = n THEN 1 ELSE 0 END) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead
        |  FROM evt)
        |SELECT t, n AS n_risk, d AS d_events, c AS c_censored,
        |  CASE WHEN dead = 1 THEN 0.0e0 ELSE
        |    CAST(ROUND(CAST(EXP(SUM(l) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |      AS DECIMAL(18,8)), 6) AS DOUBLE) END AS survival
        |FROM lt ORDER BY t""".stripMargin,

    // Kaplan–Meier with Greenwood bands: the x266 chain plus the
    // 8dp-rounded Greenwood increments d/(n(n−d)), se = the ALREADY-
    // 6dp survival × √(running G), bands clamped to [0,1] from the
    // ROUNDED se — round-then-combine at every float step.
    "x267_km_greenwood" ->
      (kmSubjectsCte +
      """bt AS (SELECT CAST(dur AS BIGINT) AS t,
        |  CAST(SUM(ev) AS BIGINT) AS d,
        |  CAST(SUM(1 - ev) AS BIGINT) AS c FROM su
        |  WHERE dur IS NOT NULL GROUP BY 1),
        |rk AS (SELECT t, d, c, CAST(SUM(d + c) OVER (ORDER BY t
        |  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |  AS BIGINT) AS n FROM bt),
        |evt AS (SELECT * FROM rk WHERE d > 0),
        |lt AS (SELECT t, n, d,
        |  CASE WHEN d < n THEN ROUND(CAST(LN(1.0e0
        |    - CAST(d AS DOUBLE) / CAST(n AS DOUBLE))
        |    AS DECIMAL(18,8)), 8) END AS l,
        |  CASE WHEN d < n THEN ROUND(CAST(CAST(d AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * CAST(n - d AS DOUBLE))
        |    AS DECIMAL(18,8)), 8) END AS g,
        |  MAX(CASE WHEN d = n THEN 1 ELSE 0 END) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead
        |  FROM evt),
        |cu AS (SELECT t, n, d, dead,
        |  CASE WHEN dead = 1 THEN 0.0e0 ELSE
        |    CAST(ROUND(CAST(EXP(SUM(l) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |      AS DECIMAL(18,8)), 6) AS DOUBLE) END AS s,
        |  SUM(g) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gg
        |  FROM lt),
        |sr AS (SELECT t, n, d, dead, s,
        |  CAST(ROUND(CAST(s * SQRT(CAST(gg AS DOUBLE))
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS ser FROM cu)
        |SELECT t, n AS n_risk, d AS d_events, s AS survival,
        |  CASE WHEN dead = 0 THEN ser END AS se,
        |  CASE WHEN dead = 0 THEN CAST(ROUND(CAST(
        |    GREATEST(0.0e0, s - 1.96e0 * ser)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) END AS ci_lo,
        |  CASE WHEN dead = 0 THEN CAST(ROUND(CAST(
        |    LEAST(1.0e0, s + 1.96e0 * ser)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) END AS ci_hi
        |FROM sr ORDER BY t""".stripMargin),

    // RMST at τ = 30: the x266 curve, one lag window, each interval's
    // 6dp-survival × integer width rounded to 8dp before the exact
    // sum; tail = last survival × (τ − t_last) when the curve ends
    // early; an empty curve integrates survival 1 to exactly τ.
    "x268_rmst" ->
      (kmSubjectsCte +
      """bt AS (SELECT CAST(dur AS BIGINT) AS t,
        |  CAST(SUM(ev) AS BIGINT) AS d,
        |  CAST(SUM(1 - ev) AS BIGINT) AS c FROM su
        |  WHERE dur IS NOT NULL GROUP BY 1),
        |rk AS (SELECT t, d, c, CAST(SUM(d + c) OVER (ORDER BY t
        |  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |  AS BIGINT) AS n FROM bt),
        |evt AS (SELECT * FROM rk WHERE d > 0),
        |lt AS (SELECT t, n, d,
        |  CASE WHEN d < n THEN ROUND(CAST(LN(1.0e0
        |    - CAST(d AS DOUBLE) / CAST(n AS DOUBLE))
        |    AS DECIMAL(18,8)), 8) END AS l,
        |  MAX(CASE WHEN d = n THEN 1 ELSE 0 END) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead
        |  FROM evt),
        |km AS (SELECT t,
        |  CASE WHEN dead = 1 THEN 0.0e0 ELSE
        |    CAST(ROUND(CAST(EXP(SUM(l) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |      AS DECIMAL(18,8)), 6) AS DOUBLE) END AS survival
        |  FROM lt),
        |lg AS (SELECT t, survival,
        |  LAG(t, 1, CAST(0 AS BIGINT)) OVER (ORDER BY t) AS pt,
        |  LAG(survival, 1, 1.0e0) OVER (ORDER BY t) AS ps FROM km),
        |ar AS (SELECT t, survival,
        |  CASE WHEN pt < 30 THEN ROUND(CAST(ps
        |      * CAST(LEAST(t, 30) - pt AS DOUBLE) AS DECIMAL(18,8)), 8)
        |    ELSE CAST(0 AS DECIMAL(18,8)) END AS a FROM lg)
        |SELECT CAST(30 AS BIGINT) AS tau, COUNT(*) AS n_steps,
        |  CAST(ROUND(CAST(CAST(COALESCE(SUM(a),
        |      CAST(0 AS DECIMAL(18,8))) AS DOUBLE)
        |    + CASE WHEN MAX(t) IS NULL THEN 30.0e0
        |        WHEN MAX(t) < 30 THEN max_by(survival, t)
        |          * CAST(30 - MAX(t) AS DOUBLE)
        |        ELSE 0.0e0 END AS DECIMAL(18,8)), 6) AS DOUBLE) AS rmst
        |FROM ar""".stripMargin),

    // CMH: per-stratum 2×2 margins, E and hypergeometric Var rounded
    // to 8dp before the exact sums, χ² and the MH odds ratio as final
    // float chains; N = 1 strata contribute E but zero variance.
    "x269_cmh_test" ->
      """WITH pu AS (SELECT user_id,
        |  MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
        |  FROM events GROUP BY 1),
        |r AS (SELECT user_id % 3 AS s,
        |  CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t, y FROM pu),
        |ce AS (SELECT s, COUNT(*) AS n, SUM(t) AS r1, SUM(y) AS c1,
        |  SUM(t * y) AS a FROM r GROUP BY 1),
        |g AS (SELECT n, a,
        |  ROUND(CAST(CAST(r1 AS DOUBLE) * CAST(c1 AS DOUBLE)
        |    / CAST(n AS DOUBLE) AS DECIMAL(18,8)), 8) AS e,
        |  CASE WHEN n > 1 THEN ROUND(CAST(CAST(r1 AS DOUBLE)
        |      * CAST(n - r1 AS DOUBLE) * CAST(c1 AS DOUBLE)
        |      * CAST(n - c1 AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |        * (CAST(n AS DOUBLE) - 1.0e0)) AS DECIMAL(18,8)), 8)
        |    ELSE CAST(0 AS DECIMAL(18,8)) END AS v,
        |  ROUND(CAST(CAST(a AS DOUBLE) * CAST(n - r1 - c1 + a AS DOUBLE)
        |    / CAST(n AS DOUBLE) AS DECIMAL(18,8)), 8) AS onum,
        |  ROUND(CAST(CAST(r1 - a AS DOUBLE) * CAST(c1 - a AS DOUBLE)
        |    / CAST(n AS DOUBLE) AS DECIMAL(18,8)), 8) AS oden
        |  FROM ce),
        |f AS (SELECT COUNT(*) AS k_strata, SUM(n) AS n_total,
        |  SUM(a) AS observed, SUM(e) AS se_, SUM(v) AS sv,
        |  SUM(onum) AS son, SUM(oden) AS sod FROM g)
        |SELECT CAST(k_strata AS BIGINT) AS k_strata,
        |  CAST(n_total AS BIGINT) AS n_total,
        |  CAST(observed AS BIGINT) AS observed,
        |  CAST(ROUND(CAST(se_ AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS expected,
        |  CAST(ROUND(CAST(sv AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS variance,
        |  CAST(ROUND(CAST(CASE WHEN sv > 0 THEN
        |    (CAST(observed AS DOUBLE) - CAST(se_ AS DOUBLE))
        |    * (CAST(observed AS DOUBLE) - CAST(se_ AS DOUBLE))
        |    / CAST(sv AS DOUBLE) END AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS cmh_chi2,
        |  CAST(ROUND(CAST(CASE WHEN sod > 0 THEN
        |    CAST(son AS DOUBLE) / CAST(sod AS DOUBLE) END
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS mh_odds_ratio
        |FROM f""".stripMargin,

    // Holm step-down over the x256 mSPRT family: steps
    // (m−rank+1)·p rounded to 8dp, adjusted p = clamped running max,
    // FWER rejection at α = 0.1.
    "x270_holm" ->
      """WITH r AS (SELECT source,
        |  CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS t,
        |  CAST(n_chars AS DECIMAL(18,6)) AS v
        |  FROM documents WHERE n_chars IS NOT NULL),
        |m AS (SELECT source, SUM(t) AS na, SUM(1 - t) AS nb,
        |  CAST(SUM(CASE WHEN t = 1 THEN v
        |    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(24,6)) AS sa,
        |  CAST(SUM(CASE WHEN t = 0 THEN v
        |    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(24,6)) AS sb,
        |  CAST(SUM(CASE WHEN t = 1 THEN
        |      CAST(CAST(v AS DECIMAL(19,6)) * CAST(v AS DECIMAL(19,6))
        |        AS DECIMAL(28,12))
        |    ELSE CAST(0 AS DECIMAL(28,12)) END) AS DECIMAL(28,12)) AS saa,
        |  CAST(SUM(CASE WHEN t = 0 THEN
        |      CAST(CAST(v AS DECIMAL(19,6)) * CAST(v AS DECIMAL(19,6))
        |        AS DECIMAL(28,12))
        |    ELSE CAST(0 AS DECIMAL(28,12)) END) AS DECIMAL(28,12)) AS sbb
        |  FROM r GROUP BY source),
        |g AS (SELECT source, na, nb,
        |  CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) AS ma,
        |  CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS mb,
        |  (CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
        |    / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1) AS va,
        |  (CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
        |    / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1) AS vb
        |  FROM m),
        |h AS (SELECT source, na, nb, ma, mb,
        |  va / CAST(na AS DOUBLE) + vb / CAST(nb AS DOUBLE) AS vv,
        |  ma - mb AS delta FROM g),
        |k AS (SELECT source, na, nb, vv, delta,
        |  5e-1 * LN(vv / (vv + 1.0000000000000002e-2))
        |    + delta * delta * 1.0000000000000002e-2
        |      / (2.0e0 * vv * (vv + 1.0000000000000002e-2)) AS loglam,
        |  (na > 1 AND nb > 1 AND vv > 0) AS ok FROM h),
        |p AS (SELECT source,
        |  CAST(ROUND(CAST(CASE WHEN ok THEN EXP(LEAST(0.0e0, -loglam)) END
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS pv FROM k),
        |q AS (SELECT source, pv,
        |  ROW_NUMBER() OVER (ORDER BY pv, source) AS rnk,
        |  COUNT(*) OVER () AS mt FROM p WHERE pv IS NOT NULL),
        |st AS (SELECT source, pv, rnk, mt,
        |  ROUND(CAST(CAST(mt - rnk + 1 AS DOUBLE) * pv
        |    AS DECIMAL(18,8)), 8) AS step FROM q),
        |ha AS (SELECT *, LEAST(1.0e0, CAST(MAX(step) OVER (ORDER BY rnk
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE)) AS adj FROM st)
        |SELECT source,
        |  CAST(ROUND(CAST(pv AS DECIMAL(18,8)), 6) AS DOUBLE) AS p_value,
        |  CAST(rnk AS BIGINT) AS rank, CAST(mt AS BIGINT) AS m_tests,
        |  CAST(ROUND(CAST(adj AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS holm_adjusted,
        |  CAST(adj <= 1e-1 AS INT) AS rejected
        |FROM ha ORDER BY source""".stripMargin,

    // DiD: per-(user, half-year) value sums as units, four
    // (group × period) cells from ONE aggregate, 8dp-rounded squares
    // and 6dp cell means, effect = signed mean sum, SE = pooled
    // √(Σ s²/n).
    "x271_did" ->
      """WITH uv AS (SELECT user_id,
        |  CASE WHEN MONTH(ts) >= 7 THEN 1 ELSE 0 END AS p,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS g,
        |  p, v FROM uv),
        |ce AS (SELECT g, p, COUNT(*) AS n,
        |  SUM(CAST(v AS DECIMAL(28,8))) AS s,
        |  SUM(ROUND(CAST(v * v AS DECIMAL(28,8)), 8)) AS q
        |  FROM r GROUP BY 1, 2),
        |m AS (SELECT g, p, n, q,
        |  CAST(ROUND(CAST(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS mean FROM ce),
        |vv AS (SELECT g, p, n, mean,
        |  CASE WHEN n > 1 THEN (CAST(q AS DOUBLE)
        |    - CAST(n AS DOUBLE) * mean * mean)
        |    / (CAST(n AS DOUBLE) - 1.0e0) END AS var FROM m),
        |en AS (SELECT n, CAST((g * 2 - 1) * (p * 2 - 1) AS DOUBLE)
        |    AS sign, mean,
        |  ROUND(CAST(var / CAST(n AS DOUBLE) AS DECIMAL(28,8)), 8)
        |    AS vn FROM vv),
        |f AS (SELECT COUNT(*) AS k_cells, SUM(n) AS n_rows,
        |  SUM(ROUND(CAST(sign * mean AS DECIMAL(18,8)), 8)) AS eff,
        |  SUM(vn) AS se2, MIN(n) AS minn FROM en)
        |SELECT CAST(k_cells AS BIGINT) AS k_cells,
        |  CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(ROUND(CAST(CASE WHEN k_cells = 4 THEN
        |    CAST(eff AS DOUBLE) END AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS did_effect,
        |  CAST(ROUND(CAST(CASE WHEN k_cells = 4 AND minn > 1 THEN
        |    SQRT(CAST(se2 AS DOUBLE)) END AS DECIMAL(18,8)), 6)
        |    AS DOUBLE) AS se,
        |  CAST(ROUND(CAST(CASE WHEN k_cells = 4 AND minn > 1
        |      AND se2 > 0 THEN CAST(eff AS DOUBLE)
        |      / SQRT(CAST(se2 AS DOUBLE)) END AS DECIMAL(18,8)), 6)
        |    AS DOUBLE) AS t_stat
        |FROM f""".stripMargin,

    // Stupid-backoff trigram: positional self-joins build the three
    // count tables (the x112 idiom one step deeper); score tiers
    // trigram-ML → 0.4·bigram-ML → α²·add-one unigram, α² printed as
    // the exact Scala double 0.4*0.4.
    "x273_trigram_lm" ->
      """WITH rp AS (
        |  SELECT doc_id, generate_subscripts(w, 1) AS pos, unnest(w) AS tok
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w
        |        FROM documents WHERE doc_id < 400)),
        |r3 AS (SELECT a.tok AS w1, b.tok AS w2, c.tok AS w3
        |  FROM rp a JOIN rp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |            JOIN rp c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2),
        |m3 AS (SELECT w1, w2, w3, COUNT(*)::BIGINT AS c3 FROM r3
        |  GROUP BY 1, 2, 3),
        |rb AS (SELECT a.tok AS wa, b.tok AS wb FROM rp a JOIN rp b
        |  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
        |m2 AS (SELECT wa, wb, COUNT(*)::BIGINT AS c2 FROM rb GROUP BY 1, 2),
        |m1 AS (SELECT tok, COUNT(*)::BIGINT AS c1 FROM rp GROUP BY 1),
        |nv AS (SELECT SUM(c1)::DOUBLE AS n, COUNT(*)::DOUBLE AS v FROM m1),
        |bp AS (
        |  SELECT doc_id, generate_subscripts(w, 1) AS pos, unnest(w) AS tok
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w
        |        FROM documents WHERE doc_id >= 400)),
        |b3 AS (SELECT a.doc_id, a.tok AS w1, b.tok AS w2, c.tok AS w3
        |  FROM bp a JOIN bp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |            JOIN bp c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2),
        |tf AS (SELECT doc_id, w1, w2, w3, COUNT(*)::BIGINT AS tf
        |  FROM b3 GROUP BY 1, 2, 3, 4),
        |sc AS (SELECT tf.doc_id, tf.tf,
        |  CASE WHEN coalesce(m3.c3, 0) > 0 THEN
        |      m3.c3::DOUBLE / m12.c2::DOUBLE
        |    WHEN coalesce(m23.c2, 0) > 0 THEN
        |      0.4e0 * m23.c2::DOUBLE / u2.c1::DOUBLE
        |    ELSE 0.16000000000000003e0
        |      * (coalesce(u3.c1, 0)::DOUBLE + 1.0e0) / (nv.n + nv.v)
        |  END AS score
        |  FROM tf
        |  LEFT JOIN m3 ON tf.w1 = m3.w1 AND tf.w2 = m3.w2 AND tf.w3 = m3.w3
        |  LEFT JOIN m2 m12 ON tf.w1 = m12.wa AND tf.w2 = m12.wb
        |  LEFT JOIN m2 m23 ON tf.w2 = m23.wa AND tf.w3 = m23.wb
        |  LEFT JOIN m1 u2 ON tf.w2 = u2.tok
        |  LEFT JOIN m1 u3 ON tf.w3 = u3.tok
        |  CROSS JOIN nv)
        |SELECT doc_id, SUM(tf)::BIGINT AS n_trigrams,
        |  ROUND(-SUM(tf * ln(score)) / SUM(tf), 4) AS avg_nll
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // HyperBall: per-vertex HLL registers max-merged along edges for
    // 3 unrolled rounds (x259's portable bucket/rank/harmonic-sum
    // arithmetic), per-round totals from 6dp-rounded per-vertex
    // estimates summed exactly, reach fraction against the last round.
    "x272_hyperball" -> hyperBallSql(rounds = 3, m = 32),

    // NB method-of-moments fit: per-event-type moments over per-user
    // counts under the didEstimate decimal discipline (8dp-rounded
    // squares, 6dp-pinned mean), r = m²/(v−m) / p = m/v only in the
    // overdispersed regime, null fits for degenerate keys.
    "x274_negbinomial" ->
      """WITH cu AS (SELECT event_type, user_id, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |ce AS (SELECT event_type, COUNT(*) AS n,
        |  SUM(CAST(CAST(c AS DOUBLE) AS DECIMAL(28,8))) AS s,
        |  SUM(ROUND(CAST(CAST(c AS DOUBLE) * CAST(c AS DOUBLE)
        |    AS DECIMAL(28,8)), 8)) AS q
        |  FROM cu GROUP BY 1),
        |m AS (SELECT event_type, n, q,
        |  CAST(ROUND(CAST(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS mean FROM ce),
        |vv AS (SELECT event_type, n, mean,
        |  CASE WHEN n > 1 THEN (CAST(q AS DOUBLE)
        |    - CAST(n AS DOUBLE) * mean * mean)
        |    / (CAST(n AS DOUBLE) - 1.0e0) END AS var FROM m)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  CAST(ROUND(CAST(mean AS DECIMAL(18,8)), 6) AS DOUBLE) AS mean,
        |  CAST(ROUND(CAST(var AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS variance,
        |  CAST(ROUND(CAST(CASE WHEN mean > 0 THEN var / mean END
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS dispersion,
        |  CASE WHEN var IS NOT NULL AND mean > 0 THEN
        |    CAST(var > mean AS INT) END AS overdispersed,
        |  CAST(ROUND(CAST(CASE WHEN var > mean AND mean > 0 THEN
        |    mean * mean / (var - mean) END AS DECIMAL(18,8)), 6)
        |    AS DOUBLE) AS nb_r,
        |  CAST(ROUND(CAST(CASE WHEN var > mean AND mean > 0 THEN
        |    mean / var END AS DECIMAL(18,8)), 6) AS DOUBLE) AS nb_p
        |FROM vv ORDER BY event_type""".stripMargin,

    // WOE/IV: the shared equal-width quantize grid, one cell
    // aggregate, totals + IV sum over the bins-bounded frame; bins
    // empty on either side carry null WOE and no IV mass.
    "x279_woe_iv" ->
      """WITH r AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v,
        |  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |ext AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM r),
        |b AS (SELECT CAST(CASE WHEN hi > lo THEN
        |    LEAST(FLOOR((v - lo) * 10 / (hi - lo)), 9.0e0)
        |  ELSE 0.0e0 END AS DOUBLE) AS bin, y FROM r CROSS JOIN ext),
        |ce AS (SELECT bin, COUNT(*) AS n, SUM(y) AS e FROM b GROUP BY 1),
        |tt AS (SELECT bin, n, e, SUM(e) OVER () AS g,
        |  SUM(n - e) OVER () AS bt FROM ce),
        |sc AS (SELECT bin, n, e, g, bt,
        |  CAST(ROUND(CAST(CASE WHEN e > 0 AND n - e > 0
        |      AND g > 0 AND bt > 0 THEN
        |    LN((CAST(e AS DOUBLE) / CAST(g AS DOUBLE))
        |      / (CAST(n - e AS DOUBLE) / CAST(bt AS DOUBLE))) END
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS woe FROM tt),
        |iv AS (SELECT bin, n, e, g, bt, woe,
        |  ROUND(CAST((CAST(e AS DOUBLE) / CAST(g AS DOUBLE)
        |    - CAST(n - e AS DOUBLE) / CAST(bt AS DOUBLE)) * woe
        |    AS DECIMAL(18,8)), 8) AS ivt FROM sc)
        |SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n,
        |  CAST(e AS BIGINT) AS events,
        |  CAST(ROUND(CAST(CAST(e AS DOUBLE) / CAST(g AS DOUBLE)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS event_share,
        |  woe,
        |  CAST(ROUND(CAST(ivt AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS iv_term,
        |  CAST(ROUND(CAST(SUM(ivt) OVER () AS DECIMAL(18,8)), 6)
        |    AS DOUBLE) AS iv_total
        |FROM iv ORDER BY bin""".stripMargin,

    // Per-group DDSketch: the x276 bucket/estimate arithmetic with the
    // group key in the aggregate and the cumulative walk PARTITIONed
    // by group.
    "x281_ddsketch_by" -> ddsketchBySql(alpha = 0.01,
      qs = Seq(0.5, 0.99)),

    // Canonical-URL dedup: the full normalizer chain replayed regex
    // for regex (fragment, lowercase scheme+host, www, default port,
    // tracking-param filter + sort, trailing slash).
    "x287_url_dedup" ->
      """WITH d AS (SELECT doc_id,
        |  'HTTPS://WWW.' || source || '.Example.COM:443/docs/'
        |    || CAST(n_chars % 20 AS VARCHAR)
        |    || '/?utm_source=feed&b=2&a=' || CAST(n_chars % 3 AS VARCHAR)
        |    || '&gclid=x#sec' AS url
        |  FROM documents WHERE doc_id IS NOT NULL),
        |s1 AS (SELECT doc_id, url,
        |  regexp_replace(trim(url), '#.*', '') AS nf FROM d),
        |s2 AS (SELECT doc_id, url, nf,
        |  lower(regexp_extract(nf,
        |    '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)) AS pre0 FROM s1),
        |s3 AS (SELECT doc_id, url, nf, pre0,
        |  regexp_replace(regexp_replace(regexp_replace(pre0,
        |    '://www\.', '://'),
        |    '^(https://[^/:?#]*):443$', '\1'),
        |    '^(http://[^/:?#]*):80$', '\1') AS pre,
        |  substr(nf, length(pre0) + 1) AS rest FROM s2),
        |s4 AS (SELECT doc_id, url, pre,
        |  regexp_replace(regexp_extract(rest, '^([^?]*)', 1),
        |    '/+$', '') AS pth,
        |  array_to_string(list_sort(list_filter(
        |    string_split(regexp_extract(rest, '\?(.*)$', 1), '&'),
        |    x -> x <> '' AND NOT regexp_matches(x,
        |      '^(utm_[^=]*|gclid|fbclid)(=.*)?$'))), '&') AS prm
        |  FROM s3),
        |c AS (SELECT doc_id, url, pre || pth ||
        |  CASE WHEN prm <> '' THEN '?' || prm ELSE '' END AS canon
        |  FROM s4)
        |SELECT canon AS canonical_url,
        |  CAST(MIN(doc_id) AS BIGINT) AS keeper_id,
        |  CAST(COUNT(*) AS BIGINT) AS docs,
        |  CAST(COUNT(DISTINCT url) AS BIGINT) AS raw_spellings
        |FROM c GROUP BY 1 ORDER BY canonical_url""".stripMargin,

    // Qini curve: x234's equal-width quantize + x221's cumulative
    // walk, arms split by supplier parity.
    "x288_qini_curve" ->
      """WITH r0 AS (SELECT CAST(l_extendedprice AS DOUBLE) AS s,
        |  (l_suppkey % 2 = 0) AS t,
        |  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |    AND l_suppkey IS NOT NULL AND l_returnflag IS NOT NULL),
        |ex AS (SELECT MIN(s) AS lo, MAX(s) AS hi FROM r0),
        |r AS (SELECT CASE WHEN ex.hi > ex.lo THEN
        |    CAST(LEAST(FLOOR((s - ex.lo) * 20 / (ex.hi - ex.lo)),
        |      19) AS DOUBLE) ELSE 0.0e0 END AS s, t, y
        |  FROM r0 CROSS JOIN ex),
        |c AS (SELECT s, SUM(CASE WHEN t THEN 1 ELSE 0 END) AS nt,
        |  SUM(CASE WHEN NOT t THEN 1 ELSE 0 END) AS nc,
        |  SUM(CASE WHEN t THEN y ELSE 0 END) AS pt,
        |  SUM(CASE WHEN NOT t THEN y ELSE 0 END) AS pc
        |  FROM r GROUP BY 1),
        |cm AS (SELECT s, SUM(nt) OVER w AS cnt, SUM(nc) OVER w AS cnc,
        |  SUM(pt) OVER w AS cpt, SUM(pc) OVER w AS cpc FROM c
        |  WINDOW w AS (ORDER BY s DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT s AS score_bin, CAST(cnt AS BIGINT) AS cum_treated,
        |  CAST(cnc AS BIGINT) AS cum_control,
        |  CAST(cpt AS BIGINT) AS cum_pos_treated,
        |  CAST(cpc AS BIGINT) AS cum_pos_control,
        |  CAST(ROUND(CAST(CASE WHEN cnc > 0 THEN
        |    CAST(cpt AS DOUBLE) - CAST(cpc AS DOUBLE)
        |      * CAST(cnt AS DOUBLE) / CAST(cnc AS DOUBLE)
        |    END AS DECIMAL(18,8)), 6) AS DOUBLE) AS qini,
        |  CAST(ROUND(CAST(CASE WHEN cnt > 0 AND cnc > 0 THEN
        |    CAST(cpt AS DOUBLE) / CAST(cnt AS DOUBLE)
        |      - CAST(cpc AS DOUBLE) / CAST(cnc AS DOUBLE)
        |    END AS DECIMAL(18,8)), 6) AS DOUBLE) AS uplift
        |FROM cm ORDER BY score_bin""".stripMargin,

    // Stratified + IPW ATE: per-stratum arm cells, 8dp-rounded
    // per-stratum terms into exact decimal sums (the theil idiom).
    "x289_stratified_ate" ->
      """WITH r AS (SELECT CAST(l_extendedprice AS DOUBLE) AS y,
        |  (l_suppkey % 2 = 0) AS t,
        |  FLOOR((CAST(l_quantity AS DOUBLE) - 1) / 5) AS g
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |    AND l_suppkey IS NOT NULL AND l_quantity IS NOT NULL),
        |c AS (SELECT g, SUM(CASE WHEN t THEN 1 ELSE 0 END) AS nt,
        |  SUM(CASE WHEN NOT t THEN 1 ELSE 0 END) AS nc,
        |  SUM(CASE WHEN t THEN y ELSE 0.0e0 END) AS yt,
        |  SUM(CASE WHEN NOT t THEN y ELSE 0.0e0 END) AS yc
        |  FROM r GROUP BY 1
        |  HAVING SUM(CASE WHEN t THEN 1 ELSE 0 END) > 0
        |    AND SUM(CASE WHEN NOT t THEN 1 ELSE 0 END) > 0),
        |ag AS (SELECT COUNT(*) AS strata, SUM(nt + nc) AS n,
        |  SUM(ROUND(CAST((yt / nt - yc / nc) * (nt + nc)
        |    AS DECIMAL(18,8)), 8)) AS wd,
        |  SUM(ROUND(CAST(yt * (nt + nc) / nt - yc * (nt + nc) / nc
        |    AS DECIMAL(18,8)), 8)) AS ipw
        |  FROM c)
        |SELECT CAST(strata AS BIGINT) AS strata, CAST(n AS BIGINT) AS n,
        |  CAST(ROUND(CAST(CAST(wd AS DOUBLE) / CAST(n AS DOUBLE)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS ate_stratified,
        |  CAST(ROUND(CAST(CAST(ipw AS DOUBLE) / CAST(n AS DOUBLE)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS ate_ipw
        |FROM ag WHERE n > 0""".stripMargin,

    // Chao1 + Good-Turing: frequency-of-frequencies over the token
    // counts; everything integer until the three final ratios.
    "x290_chao1_coverage" ->
      """WITH tk AS (SELECT unnest(string_split(text, ' ')) AS tok
        |  FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT tok, COUNT(*) AS n FROM tk WHERE tok <> ''
        |  GROUP BY 1),
        |a AS (SELECT SUM(n) AS nn, COUNT(*) AS s,
        |  SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS f1,
        |  SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS f2 FROM c)
        |SELECT CAST(nn AS BIGINT) AS tokens, CAST(s AS BIGINT) AS vocab,
        |  CAST(f1 AS BIGINT) AS f1, CAST(f2 AS BIGINT) AS f2,
        |  CAST(ROUND(CAST(CAST(s AS DOUBLE)
        |    + CAST(f1 * (f1 - 1) AS DOUBLE)
        |      / (2.0e0 * CAST(f2 + 1 AS DOUBLE))
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS chao1,
        |  CAST(ROUND(CAST(CAST(f1 AS DOUBLE) / CAST(nn AS DOUBLE)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS gt_unseen_mass,
        |  CAST(ROUND(CAST(1.0e0 - CAST(f1 AS DOUBLE)
        |    / CAST(nn AS DOUBLE)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS coverage
        |FROM a WHERE nn > 0""".stripMargin,

    // Bilateral price indexes: matched-model cells, 8dp-rounded
    // per-item value terms into exact decimal sums.
    "x291_price_index" ->
      """WITH cells AS (SELECT CAST(l_partkey AS VARCHAR) AS i,
        |  (year(l_shipdate) <= 1994) AS b,
        |  SUM(CAST(l_extendedprice AS DOUBLE)) AS val,
        |  SUM(CAST(l_quantity AS DOUBLE)) AS q
        |  FROM lineitem WHERE l_partkey IS NOT NULL
        |    AND l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
        |    AND l_shipdate IS NOT NULL
        |  GROUP BY 1, 2 HAVING SUM(CAST(l_quantity AS DOUBLE)) > 0),
        |m AS (SELECT b0.i, b0.val / b0.q AS p0, b0.q AS q0,
        |  b1.val / b1.q AS p1, b1.q AS q1
        |  FROM (SELECT * FROM cells WHERE b) b0
        |  JOIN (SELECT * FROM cells WHERE NOT b) b1 ON b0.i = b1.i),
        |t AS (SELECT COUNT(*) AS items,
        |  SUM(ROUND(CAST(p1 * q0 AS DECIMAL(18,8)), 8)) AS l1,
        |  SUM(ROUND(CAST(p0 * q0 AS DECIMAL(18,8)), 8)) AS l0,
        |  SUM(ROUND(CAST(p1 * q1 AS DECIMAL(18,8)), 8)) AS p1s,
        |  SUM(ROUND(CAST(p0 * q1 AS DECIMAL(18,8)), 8)) AS p0s FROM m)
        |SELECT CAST(items AS BIGINT) AS items,
        |  CAST(ROUND(CAST(CAST(l1 AS DOUBLE) / CAST(l0 AS DOUBLE)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS laspeyres,
        |  CAST(ROUND(CAST(CAST(p1s AS DOUBLE) / CAST(p0s AS DOUBLE)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS paasche,
        |  CAST(ROUND(CAST(SQRT((CAST(l1 AS DOUBLE)
        |      / CAST(l0 AS DOUBLE))
        |    * (CAST(p1s AS DOUBLE) / CAST(p0s AS DOUBLE)))
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS fisher
        |FROM t WHERE items > 0 AND l0 > 0 AND p0s > 0""".stripMargin,

    // Embedding drift: x110's rounded per-dim centroid, per-row 8dp
    // cosines, list_dot_product's sequential sum matching the driver
    // fold bit-for-bit.
    "x321_embedding_drift" ->
      """WITH e AS (SELECT (vec_id % 2 = 0) AS r,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings WHERE vec_id IS NOT NULL),
        |cm AS (SELECT list(m ORDER BY pos) AS c FROM (
        |  SELECT pos, ROUND(AVG(x), 6) AS m FROM (
        |    SELECT generate_subscripts(v, 1) AS pos, unnest(v) AS x
        |    FROM e WHERE r) GROUP BY pos)),
        |nr AS (SELECT COUNT(*) AS n FROM e WHERE r),
        |cs AS (SELECT ROUND(list_dot_product(v, c)
        |    / (SQRT(list_dot_product(v, v))
        |      * SQRT(list_dot_product(c, c))), 8) AS cos
        |  FROM e CROSS JOIN cm WHERE NOT r),
        |a AS (SELECT COUNT(*) AS nc, SUM(cos) AS sc,
        |  SUM(CASE WHEN cos < 0.9e0 THEN 1 ELSE 0 END) AS bt
        |  FROM cs WHERE cos IS NOT NULL)
        |SELECT (SELECT CAST(n AS BIGINT) FROM nr) AS n_ref,
        |  CAST(nc AS BIGINT) AS n_current,
        |  CAST(ROUND(CAST(sc / CAST(nc AS DOUBLE) AS DECIMAL(18,8)), 6)
        |    AS DOUBLE) AS mean_cosine,
        |  CAST(bt AS BIGINT) AS below_threshold,
        |  CAST(ROUND(CAST(CAST(bt AS DOUBLE) / CAST(nc AS DOUBLE)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS share_below
        |FROM a WHERE nc > 0""".stripMargin,

    // BBSE 2-class: q = (mu - fpr)/(tpr - fpr) from one conditional
    // aggregate per side; raw next to the [0,1] clamp.
    "x322_label_shift" ->
      """WITH r AS (SELECT (l_suppkey % 2 = 0) AS v,
        |  (l_returnflag = 'R') AS y, (l_discount >= 0.05) AS p
        |  FROM lineitem WHERE l_suppkey IS NOT NULL
        |    AND l_discount IS NOT NULL AND l_returnflag IS NOT NULL),
        |a AS (SELECT
        |  SUM(CASE WHEN v THEN 1 ELSE 0 END) AS nv,
        |  SUM(CASE WHEN NOT v THEN 1 ELSE 0 END) AS nt,
        |  SUM(CASE WHEN v AND y THEN 1 ELSE 0 END) AS pos,
        |  SUM(CASE WHEN v AND y AND p THEN 1 ELSE 0 END) AS tp,
        |  SUM(CASE WHEN v AND NOT y THEN 1 ELSE 0 END) AS neg,
        |  SUM(CASE WHEN v AND NOT y AND p THEN 1 ELSE 0 END) AS fp,
        |  SUM(CASE WHEN NOT v AND p THEN 1 ELSE 0 END) AS mp FROM r),
        |f AS (SELECT nv, nt, pos,
        |  CAST(tp AS DOUBLE) / CAST(pos AS DOUBLE) AS tpr,
        |  CAST(fp AS DOUBLE) / CAST(neg AS DOUBLE) AS fpr,
        |  CAST(mp AS DOUBLE) / CAST(nt AS DOUBLE) AS mu
        |  FROM a WHERE nv > 0 AND nt > 0 AND pos > 0 AND neg > 0)
        |SELECT CAST(nv AS BIGINT) AS n_valid,
        |  CAST(nt AS BIGINT) AS n_target,
        |  CAST(ROUND(CAST(CAST(pos AS DOUBLE) / CAST(nv AS DOUBLE)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS valid_prior,
        |  CAST(ROUND(CAST(mu AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS target_pred_rate,
        |  CAST(ROUND(CAST(CASE WHEN tpr <> fpr THEN
        |    (mu - fpr) / (tpr - fpr) END AS DECIMAL(18,8)), 6)
        |    AS DOUBLE) AS shifted_prior,
        |  CAST(ROUND(CAST(CASE WHEN tpr <> fpr THEN
        |    GREATEST(LEAST((mu - fpr) / (tpr - fpr), 1.0e0), 0.0e0)
        |    END AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS shifted_prior_clamped
        |FROM f""".stripMargin,

    // Paired-field near-dup: per-field 3-gram shingles tagged into
    // disjoint ranges (+0 / +P), then x41's minhash-band machinery
    // verbatim over the union set.
    "x324_paired_neardup" ->
      s"""WITH d2 AS (SELECT doc_id AS doc,
         |    substr(text, 1, CAST(FLOOR(length(text)/2) AS BIGINT))
         |      AS f0,
         |    substr(text, CAST(FLOOR(length(text)/2) AS BIGINT) + 1)
         |      AS f1
         |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
         |sh0 AS (SELECT DISTINCT doc, ${chash("s")} AS h FROM
         |  (SELECT doc, unnest([array_to_string(w[i:i+2], ' ')
         |     for i in range(1, len(w)-1)]) AS s
         |   FROM (SELECT doc, string_split(f0,' ') AS w FROM d2) t0) ts0),
         |sh1 AS (SELECT DISTINCT doc, ${chash("s")} AS h FROM
         |  (SELECT doc, unnest([array_to_string(w[i:i+2], ' ')
         |     for i in range(1, len(w)-1)]) AS s
         |   FROM (SELECT doc, string_split(f1,' ') AS w FROM d2) t1) ts1),
         |sh AS (SELECT doc, h FROM sh0
         |  UNION ALL SELECT doc, h + $P FROM sh1),
         |$minhashBandsCtes,
         |pairs AS (
         |  SELECT DISTINCT x.doc AS a, y.doc AS b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.bkey = y.bkey AND x.doc < y.doc),
         |${jaccardTail(0.3)}""".stripMargin,

    // BM25 top-20: HOF token passes, one 1-row stats broadcast,
    // 8dp-pinned idf ln, per-term 8dp round-then-add.
    "x326_bm25" -> bm25Sql(Seq("spark", "data", "join"),
      k1 = 1.2, b = 0.75, topK = 20),

    // Synchronous min-label label propagation: 5 unrolled rounds over
    // the symmetrized support->=2 co-purchase graph — all-integer
    // counts and string tie-breaks, so the replay is exact.
    "x323_label_propagation" -> labelPropSql(5),

    // Modularity of the x323 assignment: exact integer counting, one
    // float chain per community, round-then-add total.
    "x325_modularity" -> modularitySql(5),

    // One Louvain-style local-move sweep over the LPA assignment,
    // graded before/after: the argmax rides the 2m²-scaled all-long
    // gain score, so the replay is exact; only the two Q totals are
    // floats (6-dp decimal-pinned like x325).
    "x327_modularity_refine" -> modularityRefineSql(5, sweeps = 3),

    // Full two-phase Louvain: 2 node-local + 2 whole-community
    // weighted sweeps over the LPA seed; summary row like x327.
    "x330_louvain" -> louvainSql(5, sweeps = 2),

    // Well-connectedness screen over the LPA assignment: exact
    // integer intra-community counts, INT pass/fail flag.
    "x331_community_connectedness" -> connectednessSql(5),

    // The same screen over the louvain output — the
    // guard→optimizer→guard loop closed as a gate.
    "x332_louvain_connectedness" -> louvainConnectednessSql(5, sweeps = 2),

    // Leiden repair over the louvain output, graded before/after —
    // q_gain_4m2 >= 0 is a theorem for this pass.
    "x333_community_repair" -> repairSql(5, sweeps = 2),

    // the repaired output screened at gamma=0.5: every row must read
    // well_connected = 1 (the repair's gamma <= 2/3 guarantee).
    "x334_repair_connectedness" -> repairConnectednessSql(5, sweeps = 2),

    // weighted two-phase louvain, pair count as edge weight; weighted
    // sweeps at both levels, weighted modularity grades.
    "x335_weighted_louvain" -> weightedLouvainSql(5, sweeps = 2),

    // end-to-end decontamination: prompts = 120-char prefixes of every
    // 40th doc; BM25 top-10 retrieve, 3-gram containment verify,
    // flag at >= 0.05 of the prompt's distinct grams.
    "x336_decontam_pipeline" -> decontamPipelineSql(
      promptMod = 40, promptChars = 120, n = 3, topK = 10,
      minFrac = 0.05),

    // delta-LPA maintenance: the oracle is DELIBERATELY x323's
    // full-run SQL — the gate's claim IS delta ≡ full re-run
    // (the fixed-round locality theorem, independently replayed).
    "x337_delta_lpa" -> labelPropSql(5),

    // Query-table BM25: five queries in one job against the inverted
    // index; scoring chain identical to x326's.
    "x328_bm25_query_table" -> bm25QueryTableSql(
      graft.queries.Queries.x328Queries, k1 = 1.2, b = 0.75, topK = 20),

    // Persisted-index probe: identical scores to x328 — the oracle IS
    // x328's (the parquet round-trip must not move a single score).
    "x329_bm25_index_probe" -> bm25QueryTableSql(
      graft.queries.Queries.x328Queries, k1 = 1.2, b = 0.75, topK = 20),

    // Cochran-Armitage: integer dose-moment sums, one z at the end;
    // float grouping mirrors Spark's operator order exactly.
    "x316_cochran_armitage" ->
      """WITH c AS (SELECT CAST(FLOOR((CAST(l_quantity AS DOUBLE) - 1)
        |    / 10) AS BIGINT) AS d,
        |  COUNT(*) AS n,
        |  SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS r
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_returnflag IS NOT NULL GROUP BY 1),
        |a AS (SELECT SUM(n) AS nn, SUM(r) AS rr, COUNT(*) AS doses,
        |  SUM(d * n) AS dn, SUM(d * d * n) AS d2n, SUM(d * r) AS dr
        |  FROM c),
        |f AS (SELECT nn, doses,
        |  CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE) AS p,
        |  CAST(dr AS DOUBLE) - CAST(dn AS DOUBLE)
        |    * (CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE)) AS num,
        |  (CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE))
        |    * ((1.0e0 - CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE))
        |      * (CAST(d2n AS DOUBLE) - CAST(dn AS DOUBLE)
        |        * CAST(dn AS DOUBLE) / CAST(nn AS DOUBLE))) AS vr
        |  FROM a WHERE nn > 0 AND doses >= 2)
        |SELECT CAST(nn AS BIGINT) AS n, CAST(doses AS BIGINT) AS doses,
        |  CAST(ROUND(CAST(p AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS event_rate,
        |  CAST(ROUND(CAST(CASE WHEN vr > 0 THEN num / SQRT(vr) END
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS z
        |FROM f""".stripMargin,

    // G-test: per-cell DECIMAL(18,10) o·ln(o/e) terms, 2x at the end.
    "x317_g_test" ->
      """WITH cells AS (SELECT CAST(l_returnflag AS VARCHAR) AS x,
        |  CAST(l_linestatus AS VARCHAR) AS y, COUNT(*) AS o
        |  FROM lineitem WHERE l_returnflag IS NOT NULL
        |    AND l_linestatus IS NOT NULL GROUP BY 1, 2),
        |nn AS (SELECT SUM(o) AS n FROM cells),
        |rt AS (SELECT x, SUM(o) AS rx FROM cells GROUP BY 1),
        |ct AS (SELECT y, SUM(o) AS cy FROM cells GROUP BY 1),
        |g AS (SELECT MAX(nn.n) AS n,
        |  SUM(CAST(CAST(o AS DOUBLE) * LN(CAST(o AS DOUBLE)
        |    / (CAST(rx AS DOUBLE) * CAST(cy AS DOUBLE)
        |      / CAST(nn.n AS DOUBLE))) AS DECIMAL(18,10))) AS gg
        |  FROM cells JOIN rt USING (x) JOIN ct USING (y) CROSS JOIN nn),
        |d AS (SELECT (COUNT(DISTINCT x) - 1)
        |  * (COUNT(DISTINCT y) - 1) AS dof FROM cells)
        |SELECT CAST(n AS BIGINT) AS n, CAST(dof AS BIGINT) AS dof,
        |  CAST(ROUND(CAST(2.0e0 * CAST(gg AS DOUBLE)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS g_stat
        |FROM g CROSS JOIN d WHERE n > 0""".stripMargin,

    // Hellinger: equal-width bins, per-bin DECIMAL(18,10) sqrt terms.
    "x318_hellinger" ->
      """WITH r AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v,
        |  (l_suppkey % 2 = 0) AS a FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_suppkey IS NOT NULL),
        |ex AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM r),
        |c AS (SELECT CASE WHEN ex.hi > ex.lo THEN
        |    LEAST(FLOOR((v - ex.lo) * 20 / (ex.hi - ex.lo)), 19)
        |    ELSE 0 END AS b,
        |  SUM(CASE WHEN a THEN 1 ELSE 0 END) AS na,
        |  SUM(CASE WHEN NOT a THEN 1 ELSE 0 END) AS nb
        |  FROM r CROSS JOIN ex GROUP BY 1),
        |t AS (SELECT SUM(na) AS ta, SUM(nb) AS tb FROM c),
        |bc AS (SELECT MAX(t.ta) AS ta, MAX(t.tb) AS tb,
        |  SUM(CAST(SQRT((CAST(na AS DOUBLE) / CAST(t.ta AS DOUBLE))
        |    * (CAST(nb AS DOUBLE) / CAST(t.tb AS DOUBLE)))
        |    AS DECIMAL(18,10))) AS bc
        |  FROM c CROSS JOIN t)
        |SELECT CAST(ta AS BIGINT) AS n_a, CAST(tb AS BIGINT) AS n_b,
        |  CAST(ROUND(CAST(CAST(bc AS DOUBLE) AS DECIMAL(18,8)), 6)
        |    AS DOUBLE) AS bhattacharyya,
        |  CAST(ROUND(CAST(SQRT(GREATEST(1.0e0 - CAST(bc AS DOUBLE),
        |    0.0e0)) AS DECIMAL(18,8)), 6) AS DOUBLE) AS hellinger
        |FROM bc WHERE ta > 0 AND tb > 0""".stripMargin,

    // Neyman allocation: N_h*sigma_h in DECIMAL(28,8), floor alloc.
    "x319_neyman_alloc" ->
      """WITH c AS (SELECT CAST(l_returnflag AS VARCHAR) AS g,
        |  COUNT(*) AS n, SUM(CAST(l_extendedprice AS DOUBLE)) AS s,
        |  SUM(CAST(l_extendedprice AS DOUBLE)
        |    * CAST(l_extendedprice AS DOUBLE)) AS s2
        |  FROM lineitem WHERE l_returnflag IS NOT NULL
        |    AND l_extendedprice IS NOT NULL GROUP BY 1),
        |w AS (SELECT g, n, ROUND(CAST(CAST(n AS DOUBLE)
        |  * SQRT(GREATEST((s2 - s * s / CAST(n AS DOUBLE))
        |    / CAST(n AS DOUBLE), 0.0e0)) AS DECIMAL(28,8)), 8) AS wt
        |  FROM c),
        |t AS (SELECT SUM(wt) AS tw FROM w)
        |SELECT g AS stratum, CAST(n AS BIGINT) AS n,
        |  CAST(ROUND(CAST(CAST(wt AS DOUBLE) / CAST(tw AS DOUBLE)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS share,
        |  CAST(FLOOR(CAST(wt AS DOUBLE) / CAST(tw AS DOUBLE) * 1000)
        |    AS BIGINT) AS alloc
        |FROM w CROSS JOIN t WHERE CAST(tw AS DOUBLE) > 0
        |ORDER BY stratum""".stripMargin,

    // Operating point: cumulative confusion over score cells, argmax
    // by 8dp-rounded J / utility, ties to the lowest threshold.
    "x320_optimal_threshold" ->
      """WITH r AS (SELECT CAST(l_discount AS DOUBLE) AS s,
        |  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem WHERE l_discount IS NOT NULL
        |    AND l_returnflag IS NOT NULL),
        |c AS (SELECT s, COUNT(*) AS n, SUM(y) AS p FROM r GROUP BY 1),
        |t AS (SELECT SUM(n) AS tn, SUM(p) AS tp FROM c),
        |cm AS (SELECT s, SUM(n) OVER w AS cn, SUM(p) OVER w AS cp
        |  FROM c WINDOW w AS (ORDER BY s DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |sc AS (SELECT s,
        |  ROUND(CAST(CAST(cp AS DOUBLE) / CAST(t.tp AS DOUBLE)
        |    - CAST(cn - cp AS DOUBLE) / CAST(t.tn - t.tp AS DOUBLE)
        |    AS DECIMAL(18,8)), 8) AS j,
        |  ROUND(CAST((CAST(cp AS DOUBLE) * 1.0e0
        |    + CAST(t.tn - cn - t.tp + cp AS DOUBLE) * 0.0e0
        |    - CAST(cn - cp AS DOUBLE) * 1.0e0
        |    - CAST(t.tp - cp AS DOUBLE) * 1.0e0)
        |    / CAST(t.tn AS DOUBLE) AS DECIMAL(18,8)), 8) AS u
        |  FROM cm CROSS JOIN t WHERE t.tp > 0 AND t.tn > t.tp),
        |bj AS (SELECT s, j FROM sc ORDER BY j DESC, s LIMIT 1),
        |bu AS (SELECT s, u FROM sc ORDER BY u DESC, s LIMIT 1)
        |SELECT bj.s AS threshold_j,
        |  CAST(ROUND(CAST(bj.j AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS youden_j,
        |  bu.s AS threshold_utility,
        |  CAST(ROUND(CAST(bu.u AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS utility
        |FROM bj CROSS JOIN bu""".stripMargin,

    // RAKE: stopword-regex phrase split, corpus word degree/freq,
    // top-20 by ROUNDED score (ties to phrase text).
    "x312_rake_keywords" ->
      """WITH ph0 AS (SELECT unnest(string_split(regexp_replace(
        |    lower(text), '\b(the|a|and|of|to|is|in|it)\b', '|', 'g'),
        |    '|')) AS p0
        |  FROM documents WHERE text IS NOT NULL),
        |ph AS (SELECT trim(p0) AS ph FROM ph0 WHERE trim(p0) <> ''),
        |phl AS (SELECT ph, ws, len(ws) AS l FROM
        |  (SELECT ph, list_filter(string_split_regex(ph, ' +'),
        |     w -> w <> '') AS ws FROM ph)
        |  WHERE len(ws) > 0),
        |wstat AS (SELECT w, COUNT(*) AS freq, SUM(l) AS deg FROM
        |  (SELECT unnest(ws) AS w, l FROM phl) GROUP BY 1),
        |dph AS (SELECT ph, COUNT(*) AS occ FROM phl GROUP BY 1),
        |dw AS (SELECT ph, occ, unnest(list_filter(
        |    string_split_regex(ph, ' +'), w -> w <> '')) AS w FROM dph),
        |sc AS (SELECT ph, occ,
        |  CAST(ROUND(CAST(SUM(CAST(deg AS DOUBLE)
        |    / CAST(freq AS DOUBLE)) AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS score
        |  FROM dw JOIN wstat USING (w) GROUP BY 1, 2)
        |SELECT ph AS phrase, CAST(occ AS BIGINT) AS occurrences, score
        |FROM sc ORDER BY score DESC, phrase LIMIT 20""".stripMargin,

    // Vocab KL drift: add-one smoothing over the union vocabulary,
    // per-term DECIMAL(18,10) sums, both directions.
    "x313_vocab_kl_drift" ->
      """WITH t AS (SELECT (doc_id % 2 = 0) AS a,
        |  unnest(string_split(text, ' ')) AS tok FROM documents
        |  WHERE text IS NOT NULL AND doc_id IS NOT NULL),
        |c AS (SELECT tok,
        |  SUM(CASE WHEN a THEN 1 ELSE 0 END) AS ca,
        |  SUM(CASE WHEN NOT a THEN 1 ELSE 0 END) AS cb
        |  FROM t WHERE tok <> '' GROUP BY 1),
        |tt AS (SELECT SUM(ca) AS na, SUM(cb) AS nb, COUNT(*) AS v
        |  FROM c),
        |s AS (SELECT MAX(v) AS vocab, MAX(na) AS ta, MAX(nb) AS tb,
        |  SUM(CAST(
        |    ((CAST(ca AS DOUBLE) + 1.0e0)
        |      / (CAST(na AS DOUBLE) + CAST(v AS DOUBLE)))
        |    * LN(((CAST(ca AS DOUBLE) + 1.0e0)
        |        / (CAST(na AS DOUBLE) + CAST(v AS DOUBLE)))
        |      / ((CAST(cb AS DOUBLE) + 1.0e0)
        |        / (CAST(nb AS DOUBLE) + CAST(v AS DOUBLE))))
        |    AS DECIMAL(18,10))) AS klab,
        |  SUM(CAST(
        |    ((CAST(cb AS DOUBLE) + 1.0e0)
        |      / (CAST(nb AS DOUBLE) + CAST(v AS DOUBLE)))
        |    * LN(((CAST(cb AS DOUBLE) + 1.0e0)
        |        / (CAST(nb AS DOUBLE) + CAST(v AS DOUBLE)))
        |      / ((CAST(ca AS DOUBLE) + 1.0e0)
        |        / (CAST(na AS DOUBLE) + CAST(v AS DOUBLE))))
        |    AS DECIMAL(18,10))) AS klba
        |  FROM c CROSS JOIN tt)
        |SELECT CAST(vocab AS BIGINT) AS vocab,
        |  CAST(ta AS BIGINT) AS tokens_a, CAST(tb AS BIGINT)
        |    AS tokens_b,
        |  CAST(ROUND(CAST(CAST(klab AS DOUBLE) AS DECIMAL(18,8)), 6)
        |    AS DOUBLE) AS kl_ab,
        |  CAST(ROUND(CAST(CAST(klba AS DOUBLE) AS DECIMAL(18,8)), 6)
        |    AS DOUBLE) AS kl_ba
        |FROM s WHERE vocab > 0""".stripMargin,

    // Length-bias audit with the hash-coin judge (x54's md5 idiom).
    "x314_length_bias" ->
      """WITH a AS (SELECT doc_id AS ida, n_chars AS la FROM documents
        |  WHERE doc_id % 2 = 0),
        |b AS (SELECT doc_id - 1 AS ida, doc_id AS idb, n_chars AS lb
        |  FROM documents),
        |p AS (SELECT CAST(la AS DOUBLE) AS la, CAST(lb AS DOUBLE) AS lb,
        |  substr(md5(CAST(ida AS VARCHAR) || '|'
        |    || CAST(idb AS VARCHAR)), 1, 4) < '8000' AS awon
        |  FROM a JOIN b USING (ida)),
        |r AS (SELECT CASE WHEN awon THEN la ELSE lb END AS wl,
        |  CASE WHEN awon THEN lb ELSE la END AS ll FROM p),
        |ag AS (SELECT COUNT(*) AS n, SUM(wl - ll) AS sd,
        |  SUM((wl - ll) * (wl - ll)) AS sd2, SUM(wl) AS sw,
        |  SUM(ll) AS sl,
        |  SUM(CASE WHEN wl - ll > 0 THEN 1 ELSE 0 END) AS lw,
        |  SUM(CASE WHEN wl - ll <> 0 THEN 1 ELSE 0 END) AS dec_
        |  FROM r),
        |f AS (SELECT n, sd / CAST(n AS DOUBLE) AS md,
        |  (sd2 - sd * sd / CAST(n AS DOUBLE))
        |    / (CAST(n AS DOUBLE) - 1.0e0) AS vd,
        |  sw, sl, lw, dec_ FROM ag WHERE n > 1)
        |SELECT CAST(n AS BIGINT) AS n,
        |  CAST(ROUND(CAST(sw / CAST(n AS DOUBLE) AS DECIMAL(18,8)), 6)
        |    AS DOUBLE) AS mean_len_winner,
        |  CAST(ROUND(CAST(sl / CAST(n AS DOUBLE) AS DECIMAL(18,8)), 6)
        |    AS DOUBLE) AS mean_len_loser,
        |  CAST(ROUND(CAST(md AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS mean_delta,
        |  CAST(ROUND(CAST(CASE WHEN vd > 0 THEN
        |    md / SQRT(vd / CAST(n AS DOUBLE)) END
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS paired_t,
        |  CAST(ROUND(CAST(CASE WHEN dec_ > 0 THEN
        |    CAST(lw AS DOUBLE) / CAST(dec_ AS DOUBLE) END
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS longer_win_rate
        |FROM f""".stripMargin,

    // Dedup attrition: keeper = min (id, src) per text, matrix of
    // who loses docs to whom.
    "x315_dedup_attrition" ->
      """WITH r AS (SELECT doc_id AS id, source AS src, text AS t
        |  FROM documents WHERE text IS NOT NULL
        |    AND doc_id IS NOT NULL AND source IS NOT NULL),
        |k AS (SELECT t, id AS kid, src AS ksrc FROM
        |  (SELECT t, id, src, ROW_NUMBER() OVER (PARTITION BY t
        |    ORDER BY id, src) AS rn FROM r) WHERE rn = 1)
        |SELECT k.ksrc AS keeper_source, r.src AS loser_source,
        |  CAST(COUNT(*) AS BIGINT) AS docs_lost
        |FROM r JOIN k ON r.t = k.t WHERE r.id <> k.kid
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Levene (mean-centered): ANOVA on |x - mean_g|, 8dp-rounded
    // group terms into exact decimal sums.
    "x308_levene" ->
      """WITH r AS (SELECT CAST(l_returnflag AS VARCHAR) AS g,
        |  CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
        |  WHERE l_returnflag IS NOT NULL
        |    AND l_extendedprice IS NOT NULL),
        |mn AS (SELECT g, COUNT(*) AS n,
        |  SUM(v) / CAST(COUNT(*) AS DOUBLE) AS mu FROM r GROUP BY 1),
        |z AS (SELECT r.g, mn.n, ABS(r.v - mn.mu) AS z FROM r
        |  JOIN mn ON r.g = mn.g),
        |zg AS (SELECT g, MAX(n) AS n, SUM(z) AS zs, SUM(z * z) AS zs2
        |  FROM z GROUP BY 1),
        |tt AS (SELECT SUM(n) AS tn, COUNT(*) AS k,
        |  SUM(ROUND(CAST(zs AS DECIMAL(28,8)), 8)) AS tzs FROM zg),
        |tm AS (SELECT tn, k,
        |  SUM(ROUND(CAST(CAST(n AS DOUBLE)
        |    * (zs / CAST(n AS DOUBLE)
        |      - CAST(tzs AS DOUBLE) / CAST(tn AS DOUBLE))
        |    * (zs / CAST(n AS DOUBLE)
        |      - CAST(tzs AS DOUBLE) / CAST(tn AS DOUBLE))
        |    AS DECIMAL(28,8)), 8)) AS bb,
        |  SUM(ROUND(CAST(zs2 - zs * zs / CAST(n AS DOUBLE)
        |    AS DECIMAL(28,8)), 8)) AS ww
        |  FROM zg CROSS JOIN tt GROUP BY 1, 2)
        |SELECT CAST(tn AS BIGINT) AS n, CAST(k AS BIGINT) AS groups,
        |  CAST(ROUND(CAST(CASE WHEN CAST(ww AS DOUBLE) > 0 THEN
        |    (CAST(tn AS DOUBLE) - CAST(k AS DOUBLE))
        |      / (CAST(k AS DOUBLE) - 1.0e0)
        |      * CAST(bb AS DOUBLE) / CAST(ww AS DOUBLE) END
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS w_stat
        |FROM tm WHERE k >= 2 AND tn > k""".stripMargin,

    // One-way ANOVA F from per-group moment sums — one scan.
    "x309_anova_f" ->
      """WITH c AS (SELECT event_type AS g, COUNT(*) AS n,
        |  SUM(CAST(value AS DOUBLE)) AS s,
        |  SUM(CAST(value AS DOUBLE) * CAST(value AS DOUBLE)) AS s2
        |  FROM events WHERE event_type IS NOT NULL
        |    AND value IS NOT NULL GROUP BY 1),
        |t AS (SELECT SUM(n) AS tn, COUNT(*) AS k,
        |  SUM(ROUND(CAST(s AS DECIMAL(28,8)), 8)) AS ts FROM c),
        |tm AS (SELECT tn, k,
        |  SUM(ROUND(CAST(CAST(n AS DOUBLE)
        |    * (s / CAST(n AS DOUBLE)
        |      - CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE))
        |    * (s / CAST(n AS DOUBLE)
        |      - CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE))
        |    AS DECIMAL(28,8)), 8)) AS bb,
        |  SUM(ROUND(CAST(s2 - s * s / CAST(n AS DOUBLE)
        |    AS DECIMAL(28,8)), 8)) AS ww
        |  FROM c CROSS JOIN t GROUP BY 1, 2),
        |f AS (SELECT tn, k,
        |  CAST(bb AS DOUBLE) / (CAST(k AS DOUBLE) - 1.0e0) AS msb,
        |  CAST(ww AS DOUBLE)
        |    / (CAST(tn AS DOUBLE) - CAST(k AS DOUBLE)) AS msw
        |  FROM tm WHERE k >= 2 AND tn > k)
        |SELECT CAST(tn AS BIGINT) AS n, CAST(k AS BIGINT) AS groups,
        |  CAST(ROUND(CAST(msb AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS ms_between,
        |  CAST(ROUND(CAST(msw AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS ms_within,
        |  CAST(ROUND(CAST(CASE WHEN msw > 0 THEN msb / msw END
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS f_stat
        |FROM f""".stripMargin,

    // Kish ESS: one moment aggregate per group.
    "x310_effective_n" ->
      """WITH c AS (SELECT source AS g, COUNT(*) AS n,
        |  SUM(CAST(n_chars AS DOUBLE)) AS s,
        |  SUM(CAST(n_chars AS DOUBLE) * CAST(n_chars AS DOUBLE)) AS s2
        |  FROM documents WHERE source IS NOT NULL
        |    AND n_chars IS NOT NULL AND CAST(n_chars AS DOUBLE) > 0
        |  GROUP BY 1)
        |SELECT g AS "group", CAST(n AS BIGINT) AS n,
        |  CAST(ROUND(CAST(s * s / s2 AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS ess,
        |  CAST(ROUND(CAST(s * s / s2 / CAST(n AS DOUBLE)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS ess_ratio
        |FROM c WHERE s2 > 0 ORDER BY "group"""".stripMargin,

    // Per-segment calibration: x300's cells with the group key.
    "x311_calibration_by_group" ->
      """WITH r AS (SELECT CAST(l_linestatus AS VARCHAR) AS g,
        |  l_discount * 10 AS p,
        |  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem WHERE l_linestatus IS NOT NULL
        |    AND l_discount IS NOT NULL AND l_returnflag IS NOT NULL
        |    AND l_discount * 10 >= 0 AND l_discount * 10 <= 1),
        |c AS (SELECT g, LEAST(FLOOR(p * 10), 9) AS b, COUNT(*) AS n,
        |  SUM(y) AS s, SUM(p) AS sp, SUM((p - y) * (p - y)) AS se
        |  FROM r GROUP BY 1, 2),
        |a AS (SELECT g, SUM(n) AS nn,
        |  SUM(ROUND(CAST(se AS DECIMAL(18,8)), 8)) AS tse,
        |  SUM(ROUND(CAST(CAST(n AS DOUBLE)
        |    * ABS(sp / n - CAST(s AS DOUBLE) / n)
        |    AS DECIMAL(18,8)), 8)) AS tce,
        |  MAX(ROUND(CAST(ABS(sp / n - CAST(s AS DOUBLE) / n)
        |    AS DECIMAL(18,8)), 8)) AS tmce
        |  FROM c GROUP BY 1)
        |SELECT g AS "group", CAST(nn AS BIGINT) AS n,
        |  CAST(ROUND(CAST(CAST(tse AS DOUBLE) / CAST(nn AS DOUBLE)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS brier,
        |  CAST(ROUND(CAST(CAST(tce AS DOUBLE) / CAST(nn AS DOUBLE)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS ece,
        |  CAST(ROUND(CAST(CAST(tmce AS DOUBLE) AS DECIMAL(18,8)), 6)
        |    AS DOUBLE) AS mce
        |FROM a ORDER BY "group"""".stripMargin,

    // Dawid-Skene one round: majority via the argmax-string idiom,
    // smoothed confusion + priors, per-(item,class) DECIMAL(18,10)
    // log sums, 8dp-rounded scores before the re-vote argmax.
    "x303_dawid_skene" ->
      s"""WITH $annRatingsCte,
         |cls AS MATERIALIZED (SELECT DISTINCT l AS g FROM rr),
         |lc AS (SELECT COUNT(*) AS lk FROM cls),
         |mj AS MATERIALIZED (SELECT i, substr(MIN(
         |    lpad(CAST(999999999999 - n AS VARCHAR), 12, '0')
         |    || '|' || l), 14) AS g FROM
         |  (SELECT i, l, COUNT(*) AS n FROM rr GROUP BY 1, 2)
         |  GROUP BY 1),
         |ni AS (SELECT COUNT(*) AS n_items FROM mj),
         |pri AS MATERIALIZED (SELECT cls.g,
         |  LN((CAST(COALESCE(m.cnt, 0) AS DOUBLE) + 1.0e0)
         |    / (n_items + 1.0e0 * lk)) AS lpi
         |  FROM cls LEFT JOIN
         |    (SELECT g, COUNT(*) AS cnt FROM mj GROUP BY 1) m
         |    ON cls.g = m.g CROSS JOIN ni CROSS JOIN lc),
         |cf AS MATERIALIZED (SELECT rr.r, mj.g, rr.l, COUNT(*) AS c
         |  FROM rr JOIN mj ON rr.i = mj.i GROUP BY 1, 2, 3),
         |cft AS MATERIALIZED (SELECT r, g, SUM(c) AS ct FROM cf
         |  GROUP BY 1, 2),
         |ex AS (SELECT rr.i, cls.g,
         |  CAST(LN((CAST(COALESCE(cf.c, 0) AS DOUBLE) + 1.0e0)
         |    / (CAST(COALESCE(cft.ct, 0) AS DOUBLE)
         |      + (SELECT 1.0e0 * lk FROM lc))) AS DECIMAL(18,10)) AS ll
         |  FROM rr CROSS JOIN cls
         |  LEFT JOIN cf ON cf.r = rr.r AND cf.g = cls.g AND cf.l = rr.l
         |  LEFT JOIN cft ON cft.r = rr.r AND cft.g = cls.g),
         |sc AS (SELECT i, ex.g,
         |  ROUND(CAST(CAST(SUM(ll) AS DOUBLE) + MAX(lpi)
         |    AS DECIMAL(18,8)), 8) AS score
         |  FROM ex JOIN pri ON ex.g = pri.g GROUP BY 1, 2),
         |vt AS (SELECT i, g, ROW_NUMBER() OVER (PARTITION BY i
         |  ORDER BY score DESC, g) AS rn FROM sc)
         |SELECT mj.i AS item, mj.g AS majority_label,
         |  vt.g AS ds_label, (mj.g <> vt.g) AS changed
         |FROM mj JOIN vt ON mj.i = vt.i AND vt.rn = 1
         |ORDER BY item""".stripMargin,

    // McNemar with continuity correction: discordant-pair counts.
    "x304_mcnemar" ->
      """WITH r AS (SELECT
        |  ((l_discount >= 0.05) = (l_returnflag = 'R')) AS a,
        |  ((l_tax >= 0.04) = (l_returnflag = 'R')) AS b
        |  FROM lineitem WHERE l_discount IS NOT NULL
        |    AND l_tax IS NOT NULL AND l_returnflag IS NOT NULL),
        |ag AS (SELECT COUNT(*) AS n,
        |  SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS b_,
        |  SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS c_ FROM r)
        |SELECT CAST(n AS BIGINT) AS n, CAST(b_ AS BIGINT) AS b,
        |  CAST(c_ AS BIGINT) AS c,
        |  CAST(ROUND(CAST(CASE WHEN b_ + c_ > 0 THEN
        |    (ABS(CAST(b_ AS DOUBLE) - CAST(c_ AS DOUBLE)) - 1.0e0)
        |    * (ABS(CAST(b_ AS DOUBLE) - CAST(c_ AS DOUBLE)) - 1.0e0)
        |    / (CAST(b_ AS DOUBLE) + CAST(c_ AS DOUBLE)) END
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS chi2
        |FROM ag WHERE n > 0""".stripMargin,

    // Cochran's Q: integer sums end-to-end, one exact division.
    "x305_cochran_q" ->
      """WITH r AS (SELECT CAST(l_orderkey AS VARCHAR) AS i,
        |  CAST(l_linenumber AS VARCHAR) AS rt,
        |  MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS x
        |  FROM lineitem GROUP BY 1, 2),
        |kk AS (SELECT COUNT(DISTINCT rt) AS k FROM r),
        |f AS (SELECT i, COUNT(*) AS m, SUM(x) AS ri FROM r GROUP BY 1),
        |fl AS (SELECT f.i, f.ri FROM f CROSS JOIN kk WHERE f.m = kk.k),
        |rw AS (SELECT COUNT(*) AS items, COALESCE(SUM(ri), 0) AS n,
        |  COALESCE(SUM(ri * ri), 0) AS r2 FROM fl),
        |cj AS (SELECT rt, SUM(x) AS c FROM r
        |  JOIN (SELECT i FROM fl) fi ON r.i = fi.i GROUP BY 1),
        |c2 AS (SELECT COALESCE(SUM(c * c), 0) AS c2 FROM cj)
        |SELECT CAST(items AS BIGINT) AS items,
        |  CAST(kk.k AS BIGINT) AS k, CAST(n AS BIGINT) AS successes,
        |  CAST(ROUND(CAST(CASE WHEN kk.k * CAST(n AS DOUBLE)
        |      - CAST(r2 AS DOUBLE) > 0 THEN
        |    (kk.k - 1.0e0) * (kk.k * CAST(c2 AS DOUBLE)
        |      - CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
        |    / (kk.k * CAST(n AS DOUBLE) - CAST(r2 AS DOUBLE)) END
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS q
        |FROM rw CROSS JOIN c2 CROSS JOIN kk WHERE items > 0""".stripMargin,

    // Head-to-head win-rate matrix: canonical pair + x252's Wilson.
    "x306_winrate_matrix" ->
      s"""WITH $prefCmpCte,
         |cn AS (SELECT LEAST(CAST(ea AS VARCHAR), CAST(eb AS VARCHAR))
         |    AS a, GREATEST(CAST(ea AS VARCHAR), CAST(eb AS VARCHAR))
         |    AS b,
         |  CASE WHEN CAST(ea AS VARCHAR) < CAST(eb AS VARCHAR) THEN
         |    CASE WHEN awon THEN 1 ELSE 0 END
         |  ELSE CASE WHEN awon THEN 0 ELSE 1 END END AS wa FROM cmp),
         |cl AS (SELECT a, b, COUNT(*) AS g, SUM(wa) AS w FROM cn
         |  GROUP BY 1, 2),
         |f AS (SELECT a, b, g, w,
         |  CAST(w AS DOUBLE) / CAST(g AS DOUBLE) AS p,
         |  CAST(g AS DOUBLE) AS n FROM cl)
         |SELECT a AS entity_a, b AS entity_b, CAST(g AS BIGINT)
         |    AS games, CAST(w AS BIGINT) AS wins_a,
         |  CAST(ROUND(CAST(p AS DECIMAL(18,8)), 6) AS DOUBLE)
         |    AS rate_a,
         |  CAST(ROUND(CAST(
         |    (p + 3.8415999999999997e0 / (2.0e0 * n)
         |      - 1.96e0 * SQRT(p * (1.0e0 - p) / n
         |        + 3.8415999999999997e0 / (4.0e0 * n * n)))
         |    / (1.0e0 + 3.8415999999999997e0 / n)
         |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS wilson_lo,
         |  CAST(ROUND(CAST(
         |    (p + 3.8415999999999997e0 / (2.0e0 * n)
         |      + 1.96e0 * SQRT(p * (1.0e0 - p) / n
         |        + 3.8415999999999997e0 / (4.0e0 * n * n)))
         |    / (1.0e0 + 3.8415999999999997e0 / n)
         |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS wilson_hi
         |FROM f ORDER BY entity_a, entity_b""".stripMargin,

    // Fightin' Words: pooled-prior log-odds z, pure per-token math
    // over the merged count cells.
    "x307_fightin_words" ->
      """WITH t AS (SELECT (source = 'src0') AS a,
        |  unnest(string_split(text, ' ')) AS tok FROM documents
        |  WHERE text IS NOT NULL AND source IS NOT NULL),
        |cells AS (SELECT tok,
        |  SUM(CASE WHEN a THEN 1 ELSE 0 END) AS ya,
        |  SUM(CASE WHEN NOT a THEN 1 ELSE 0 END) AS yb
        |  FROM t WHERE tok <> '' GROUP BY 1
        |  HAVING COUNT(*) >= 5),
        |tot AS (SELECT SUM(ya) AS na, SUM(yb) AS nb,
        |  SUM(ya + yb) AS nt FROM cells),
        |w AS (SELECT tok, ya, yb, na, nb,
        |  100.0e0 * CAST(ya + yb AS DOUBLE) / CAST(nt AS DOUBLE) AS aw
        |  FROM cells CROSS JOIN tot),
        |f AS (SELECT tok, ya, yb,
        |  CAST(ya AS DOUBLE) + aw AS pa, CAST(yb AS DOUBLE) + aw AS pb,
        |  CAST(na AS DOUBLE) + 100.0e0 - CAST(ya AS DOUBLE) - aw AS qa,
        |  CAST(nb AS DOUBLE) + 100.0e0 - CAST(yb AS DOUBLE) - aw AS qb
        |  FROM w)
        |SELECT tok AS token, CAST(ya AS BIGINT) AS count_a,
        |  CAST(yb AS BIGINT) AS count_b,
        |  CAST(ROUND(CAST(LN(pa / qa) - LN(pb / qb)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS log_odds,
        |  CAST(ROUND(CAST((LN(pa / qa) - LN(pb / qb))
        |    / SQRT(1.0e0 / pa + 1.0e0 / pb) AS DECIMAL(18,8)), 6)
        |    AS DOUBLE) AS z
        |FROM f WHERE qa > 0 AND qb > 0 ORDER BY token""".stripMargin,

    // Simplified silhouette: the x110 centroid chain, then nearest +
    // second-nearest per vector via one ranked cross join.
    "x299_silhouette" ->
      s"""WITH $embCte,
         |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx,
         |  v AS c FROM (SELECT vec_id, v FROM e ORDER BY vec_id
         |    LIMIT 4)),
         |a1 AS (${kmeansAssign("c0")}),
         |c1 AS (${kmeansUpdate("a1", "c0")}),
         |a2 AS (${kmeansAssign("c1")}),
         |c2 AS (${kmeansUpdate("a2", "c1")}),
         |dd AS (SELECT e.vec_id, c2.cidx,
         |  list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c2.c)
         |    + list_dot_product(c2.c, c2.c) AS d,
         |  ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
         |    list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c2.c)
         |      + list_dot_product(c2.c, c2.c), c2.cidx) AS rn
         |  FROM e CROSS JOIN c2),
         |p AS (SELECT a.vec_id, a.cidx,
         |  SQRT(GREATEST(a.d, 0.0e0)) AS sa,
         |  SQRT(GREATEST(b.d, 0.0e0)) AS sb
         |  FROM dd a JOIN dd b ON a.vec_id = b.vec_id
         |  WHERE a.rn = 1 AND b.rn = 2),
         |sc AS (SELECT cidx, CASE WHEN GREATEST(sa, sb) > 0.0e0 THEN
         |  (sb - sa) / GREATEST(sa, sb) ELSE 0.0e0 END AS s FROM p)
         |SELECT CAST(cidx AS BIGINT) AS cluster,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(ROUND(CAST(SUM(s) / COUNT(*) AS DECIMAL(18,8)), 6)
         |    AS DOUBLE) AS mean_silhouette
         |FROM sc GROUP BY 1 ORDER BY cluster""".stripMargin,

    // Brier/Murphy decomposition + ECE/MCE: one binned cell table,
    // 8dp-rounded per-cell terms into exact decimal sums.
    "x300_brier_decomposition" ->
      """WITH r AS (SELECT l_discount * 10 AS p,
        |  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem WHERE l_discount IS NOT NULL
        |    AND l_returnflag IS NOT NULL
        |    AND l_discount * 10 >= 0 AND l_discount * 10 <= 1),
        |c AS (SELECT LEAST(FLOOR(p * 10), 9) AS b, COUNT(*) AS n,
        |  SUM(y) AS s, SUM(p) AS sp, SUM((p - y) * (p - y)) AS se
        |  FROM r GROUP BY 1),
        |t AS (SELECT SUM(n) AS nn, SUM(s) AS ss,
        |  SUM(ROUND(CAST(se AS DECIMAL(18,8)), 8)) AS sse FROM c),
        |q AS (SELECT
        |  SUM(ROUND(CAST(CAST(n AS DOUBLE)
        |    * (sp / n - CAST(s AS DOUBLE) / n)
        |    * (sp / n - CAST(s AS DOUBLE) / n) AS DECIMAL(18,8)), 8))
        |    AS rel,
        |  SUM(ROUND(CAST(CAST(n AS DOUBLE)
        |    * (CAST(s AS DOUBLE) / n - CAST(ss AS DOUBLE) / nn)
        |    * (CAST(s AS DOUBLE) / n - CAST(ss AS DOUBLE) / nn)
        |    AS DECIMAL(18,8)), 8)) AS res,
        |  SUM(ROUND(CAST(CAST(n AS DOUBLE)
        |    * ABS(sp / n - CAST(s AS DOUBLE) / n) AS DECIMAL(18,8)), 8))
        |    AS ce,
        |  MAX(ROUND(CAST(ABS(sp / n - CAST(s AS DOUBLE) / n)
        |    AS DECIMAL(18,8)), 8)) AS mce,
        |  MAX(nn) AS nn, MAX(ss) AS ss, MAX(sse) AS sse
        |  FROM c CROSS JOIN t)
        |SELECT CAST(nn AS BIGINT) AS n,
        |  CAST(ROUND(CAST(CAST(sse AS DOUBLE) / CAST(nn AS DOUBLE)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS brier,
        |  CAST(ROUND(CAST(CAST(rel AS DOUBLE) / CAST(nn AS DOUBLE)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS reliability,
        |  CAST(ROUND(CAST(CAST(res AS DOUBLE) / CAST(nn AS DOUBLE)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS resolution,
        |  CAST(ROUND(CAST((CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE))
        |    * (1.0e0 - CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE))
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS uncertainty,
        |  CAST(ROUND(CAST(CAST(ce AS DOUBLE) / CAST(nn AS DOUBLE)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS ece,
        |  CAST(ROUND(CAST(CAST(mce AS DOUBLE) AS DECIMAL(18,8)), 6)
        |    AS DOUBLE) AS mce
        |FROM q WHERE nn > 0""".stripMargin,

    // Power-law MLE (CSN 2009 eq. 3.7): per-node DECIMAL(18,10) log
    // terms into an exact sum; one division at the end.
    "x301_powerlaw_alpha" ->
      """WITH deg AS (SELECT s, COUNT(*) AS d FROM
        |  (SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS s,
        |     'p' || CAST(l_partkey AS VARCHAR) AS p FROM lineitem
        |   WHERE l_suppkey IS NOT NULL AND l_partkey IS NOT NULL)
        |  GROUP BY 1 HAVING COUNT(*) >= 1),
        |a AS (SELECT COUNT(*) AS n,
        |  SUM(CAST(LN(CAST(d AS DOUBLE) / 0.5e0) AS DECIMAL(18,10)))
        |    AS ls,
        |  MAX(d) AS md FROM deg)
        |SELECT CAST(n AS BIGINT) AS n_nodes, 1 AS dmin,
        |  CAST(md AS BIGINT) AS max_degree,
        |  CAST(ROUND(CAST(CASE WHEN ls > 0 THEN
        |    1.0e0 + CAST(n AS DOUBLE) / CAST(ls AS DOUBLE) END
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS alpha
        |FROM a WHERE n > 0""".stripMargin,

    // Feature drift: era moment cells per column (UNION-unpivoted),
    // Welch-style SMD with n-1 variances.
    "x302_feature_drift" ->
      """WITH u AS (
        |  SELECT (year(l_shipdate) <= 1994) AS b, 'l_quantity' AS c,
        |    CAST(l_quantity AS DOUBLE) AS v FROM lineitem
        |    WHERE l_shipdate IS NOT NULL
        |  UNION ALL
        |  SELECT (year(l_shipdate) <= 1994), 'l_extendedprice',
        |    CAST(l_extendedprice AS DOUBLE) FROM lineitem
        |    WHERE l_shipdate IS NOT NULL
        |  UNION ALL
        |  SELECT (year(l_shipdate) <= 1994), 'l_discount',
        |    CAST(l_discount AS DOUBLE) FROM lineitem
        |    WHERE l_shipdate IS NOT NULL
        |  UNION ALL
        |  SELECT (year(l_shipdate) <= 1994), 'l_tax',
        |    CAST(l_tax AS DOUBLE) FROM lineitem
        |    WHERE l_shipdate IS NOT NULL),
        |cells AS (SELECT c, b, COUNT(*) AS n, SUM(v) AS s,
        |  SUM(v * v) AS s2 FROM u WHERE v IS NOT NULL GROUP BY 1, 2),
        |m AS (SELECT b0.c, b0.n AS n0, b1.n AS n1, b0.s AS s0,
        |  b1.s AS s1, b0.s2 AS s20, b1.s2 AS s21
        |  FROM (SELECT * FROM cells WHERE b) b0
        |  JOIN (SELECT * FROM cells WHERE NOT b) b1 ON b0.c = b1.c
        |  WHERE b0.n > 1 AND b1.n > 1),
        |f AS (SELECT c, n0, n1, s0 / n0 AS m0, s1 / n1 AS m1,
        |  (s20 - s0 * s0 / n0) / (n0 - 1.0e0) AS v0,
        |  (s21 - s1 * s1 / n1) / (n1 - 1.0e0) AS v1 FROM m),
        |g AS (SELECT c, n0, n1, m0, m1,
        |  SQRT(GREATEST((v0 + v1) / 2.0e0, 0.0e0)) AS pooled FROM f)
        |SELECT c AS "column", CAST(n0 AS BIGINT) AS n_base,
        |  CAST(n1 AS BIGINT) AS n_current,
        |  CAST(ROUND(CAST(m0 AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS mean_base,
        |  CAST(ROUND(CAST(m1 AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS mean_current,
        |  CAST(ROUND(CAST(CASE WHEN pooled > 0.0e0 THEN
        |    (m1 - m0) / pooled END AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS smd
        |FROM g ORDER BY "column"""".stripMargin,

    // Rater confusion vs LOO consensus: x286's argmax-string idiom,
    // cells keyed (rater, consensus, label), rate within the block.
    "x294_rater_confusion" ->
      s"""WITH $annRatingsCte,
         |cells AS (SELECT i, l AS c, COUNT(*) AS n FROM rr
         |  GROUP BY 1, 2),
         |lo AS (SELECT rr.i, rr.r, rr.l, cells.c,
         |  cells.n - CASE WHEN cells.c = rr.l THEN 1 ELSE 0 END AS loon
         |  FROM rr JOIN cells ON rr.i = cells.i),
         |ag AS (SELECT i, r, l,
         |  MIN(lpad(CAST(999999999999 - loon AS VARCHAR), 12, '0')
         |    || '|' || c) AS bk
         |  FROM lo GROUP BY 1, 2, 3 HAVING SUM(loon) > 0),
         |cf AS (SELECT r, substr(bk, 14) AS c, l, COUNT(*) AS n
         |  FROM ag GROUP BY 1, 2, 3),
         |bl AS (SELECT r, c, SUM(n) AS tot FROM cf GROUP BY 1, 2)
         |SELECT cf.r AS rater, cf.c AS consensus_label,
         |  cf.l AS rater_label, CAST(cf.n AS BIGINT) AS n,
         |  CAST(ROUND(CAST(CAST(cf.n AS DOUBLE) / CAST(tot AS DOUBLE)
         |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS rate
         |FROM cf JOIN bl ON cf.r = bl.r AND cf.c = bl.c
         |ORDER BY rater, consensus_label, rater_label""".stripMargin,

    // Fano factor: integer moment sums over (group, day) count cells.
    "x295_fano_factor" ->
      """WITH c AS (SELECT event_type AS g,
        |  CAST(CAST(ts AS DATE) AS VARCHAR) AS b, COUNT(*) AS n
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |m AS (SELECT g, COUNT(*) AS buckets, SUM(n) AS s,
        |  SUM(n * n) AS s2 FROM c GROUP BY 1)
        |SELECT g AS "group", CAST(buckets AS BIGINT) AS buckets,
        |  CAST(ROUND(CAST(CAST(s AS DOUBLE) / CAST(buckets AS DOUBLE)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS mean,
        |  CAST(ROUND(CAST(CAST(s2 AS DOUBLE) / CAST(buckets AS DOUBLE)
        |    - (CAST(s AS DOUBLE) / CAST(buckets AS DOUBLE))
        |      * (CAST(s AS DOUBLE) / CAST(buckets AS DOUBLE))
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS variance,
        |  CAST(ROUND(CAST(CASE WHEN s > 0 THEN
        |    (CAST(s2 AS DOUBLE) / CAST(buckets AS DOUBLE)
        |      - (CAST(s AS DOUBLE) / CAST(buckets AS DOUBLE))
        |        * (CAST(s AS DOUBLE) / CAST(buckets AS DOUBLE)))
        |    / (CAST(s AS DOUBLE) / CAST(buckets AS DOUBLE)) END
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS fano
        |FROM m ORDER BY "group"""".stripMargin,

    // Uncertainty coefficient: the x175 per-term DECIMAL(18,10)
    // entropy/MI discipline over one (x,y) cell table.
    "x296_uncertainty_coef" ->
      """WITH cells AS (SELECT CAST(l_returnflag AS VARCHAR) AS x,
        |  CAST(year(l_shipdate) AS VARCHAR) AS y, COUNT(*) AS o
        |  FROM lineitem WHERE l_returnflag IS NOT NULL
        |    AND l_shipdate IS NOT NULL GROUP BY 1, 2),
        |nn AS (SELECT SUM(o) AS n FROM cells),
        |rt AS (SELECT x, SUM(o) AS rx FROM cells GROUP BY 1),
        |ct AS (SELECT y, SUM(o) AS cy FROM cells GROUP BY 1),
        |mi AS (SELECT SUM(CAST((o / CAST(n AS DOUBLE))
        |    * LN(CAST(n AS DOUBLE) * o
        |      / (CAST(rx AS DOUBLE) * cy)) AS DECIMAL(18,10))) AS mi
        |  FROM cells JOIN rt USING (x) JOIN ct USING (y) CROSS JOIN nn),
        |hx AS (SELECT SUM(CAST(-(rx / CAST(n AS DOUBLE))
        |    * LN(rx / CAST(n AS DOUBLE)) AS DECIMAL(18,10))) AS hx,
        |  MAX(n) AS n FROM rt CROSS JOIN nn)
        |SELECT CAST(hx.n AS BIGINT) AS n,
        |  ROUND(CAST(hx AS DOUBLE), 6) AS h_x,
        |  ROUND(CAST(mi AS DOUBLE), 6) AS mi,
        |  CAST(ROUND(CAST(CASE WHEN hx > 0 THEN
        |    CAST(mi AS DOUBLE) / CAST(hx AS DOUBLE) END
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS uncertainty
        |FROM hx CROSS JOIN mi WHERE hx.n > 0""".stripMargin,

    // Source vocab cosine: integer dots/norms over (source, token)
    // count cells; float math only in the final cosine.
    "x297_source_vocab_cosine" ->
      """WITH cells AS (SELECT s, tok, COUNT(*) AS n FROM
        |  (SELECT source AS s, unnest(string_split(text, ' ')) AS tok
        |   FROM documents WHERE source IS NOT NULL
        |     AND text IS NOT NULL)
        |  WHERE tok <> '' GROUP BY 1, 2),
        |norms AS (SELECT s, SUM(n * n) AS n2 FROM cells GROUP BY 1),
        |dots AS (SELECT a.s AS source_a, b.s AS source_b,
        |  SUM(a.n * b.n) AS dot
        |  FROM cells a JOIN cells b ON a.tok = b.tok AND a.s < b.s
        |  GROUP BY 1, 2)
        |SELECT source_a, source_b,
        |  CAST(ROUND(CAST(CAST(dot AS DOUBLE)
        |    / (SQRT(CAST(na.n2 AS DOUBLE)) * SQRT(CAST(nb.n2 AS DOUBLE)))
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS cosine
        |FROM dots JOIN norms na ON dots.source_a = na.s
        |JOIN norms nb ON dots.source_b = nb.s
        |ORDER BY source_a, source_b""".stripMargin,

    // Distinct-n diversity: unigram counts + positional-join bigrams
    // (the x280 idiom) per source; integer until the final ratios.
    "x298_distinct_n" ->
      """WITH u AS (SELECT s, g, COUNT(*) AS n FROM
        |  (SELECT source AS s, unnest(string_split(text, ' ')) AS g
        |   FROM documents WHERE source IS NOT NULL
        |     AND text IS NOT NULL)
        |  WHERE g <> '' GROUP BY 1, 2),
        |us AS (SELECT s, SUM(n) AS ut, COUNT(*) AS ud FROM u
        |  GROUP BY 1),
        |wp AS (SELECT doc_id, s, generate_subscripts(w, 1) AS pos,
        |  unnest(w) AS tok FROM
        |  (SELECT doc_id, source AS s, string_split(text, ' ') AS w
        |   FROM documents WHERE source IS NOT NULL
        |     AND text IS NOT NULL)),
        |bg AS (SELECT a.s, a.tok || ' ' || b.tok AS g FROM wp a
        |  JOIN wp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
        |bc AS (SELECT s, g, COUNT(*) AS n FROM bg WHERE g <> ''
        |  GROUP BY 1, 2),
        |bs AS (SELECT s, SUM(n) AS bt, COUNT(*) AS bd FROM bc
        |  GROUP BY 1)
        |SELECT us.s AS source, CAST(ut AS BIGINT) AS unigram_total,
        |  CAST(ud AS BIGINT) AS unigram_distinct,
        |  CAST(ROUND(CAST(CAST(ud AS DOUBLE) / CAST(ut AS DOUBLE)
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS distinct_1,
        |  CAST(COALESCE(bt, 0) AS BIGINT) AS bigram_total,
        |  CAST(COALESCE(bd, 0) AS BIGINT) AS bigram_distinct,
        |  CAST(ROUND(CAST(CASE WHEN bt > 0 THEN
        |    CAST(bd AS DOUBLE) / CAST(bt AS DOUBLE) END
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS distinct_2
        |FROM us LEFT JOIN bs ON us.s = bs.s
        |ORDER BY source""".stripMargin,

    // HITS: 5 unrolled hub/authority half-round pairs, L1-normalized
    // + 9dp-quantized per half-round (the x110/x284 discipline).
    "x292_hits" -> hitsSql(iters = 5),

    // Hurst R/S: block stats per (w, block), OLS over the ROUNDED
    // per-w means so both engines regress identical points.
    "x293_hurst" ->
      """WITH s0 AS (SELECT o_orderdate AS t,
        |  CAST(COUNT(*) AS DOUBLE) AS v FROM orders
        |  WHERE o_orderdate IS NOT NULL GROUP BY 1),
        |si AS (SELECT t, v, row_number() OVER (ORDER BY t, v) AS idx
        |  FROM s0),
        |f AS (SELECT idx, v, w, (idx - 1) // w AS blk FROM si
        |  CROSS JOIN (SELECT unnest([8, 16, 32, 64]) AS w)),
        |b AS (SELECT w, blk, COUNT(*) AS cnt, SUM(v) AS sm FROM f
        |  GROUP BY 1, 2),
        |bm AS (SELECT w, blk, sm / w AS mu FROM b WHERE cnt = w),
        |d AS (SELECT f.w, f.blk, f.idx, f.v - bm.mu AS dev FROM f
        |  JOIN bm ON f.w = bm.w AND f.blk = bm.blk),
        |z AS (SELECT w, blk, dev, SUM(dev) OVER (PARTITION BY w, blk
        |  ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND
        |  CURRENT ROW) AS zz FROM d),
        |rs AS (SELECT w,
        |  (MAX(zz) - MIN(zz)) / SQRT(SUM(dev * dev) / w) AS rs
        |  FROM z GROUP BY w, blk HAVING SUM(dev * dev) > 0),
        |pw AS (SELECT w, COUNT(*) AS blocks,
        |  CAST(ROUND(CAST(SUM(rs) / COUNT(*) AS DECIMAL(18,8)), 6)
        |    AS DOUBLE) AS mean_rs FROM rs GROUP BY 1),
        |pt AS (SELECT ln(CAST(w AS DOUBLE)) AS lx, ln(mean_rs) AS ly
        |  FROM pw WHERE mean_rs > 0),
        |sl AS (SELECT COUNT(*) AS k, SUM(lx) AS sx, SUM(ly) AS sy,
        |  SUM(lx * lx) AS sxx, SUM(lx * ly) AS sxy FROM pt),
        |hv AS (SELECT CASE WHEN k * sxx - sx * sx > 0 THEN
        |  (k * sxy - sx * sy) / (k * sxx - sx * sx) END AS h FROM sl)
        |SELECT CAST(w AS BIGINT) AS w, CAST(blocks AS BIGINT) AS blocks,
        |  mean_rs,
        |  CAST(ROUND(CAST(h AS DECIMAL(18,8)), 6) AS DOUBLE) AS hurst
        |FROM pw CROSS JOIN hv ORDER BY w""".stripMargin,

    // Fleiss' kappa at n = 3: both numerators are integer sums over
    // (item,label) cells; the only divisions are the final three.
    "x282_fleiss_kappa" ->
      s"""WITH $annRatingsCte,
         |cells AS (SELECT i, l, COUNT(*) AS n FROM rr GROUP BY 1, 2),
         |kept AS (SELECT i, SUM(n) AS m, SUM(n*n) AS s2 FROM cells
         |  GROUP BY 1 HAVING SUM(n) = 3),
         |ag AS (SELECT COUNT(*) AS ni, COALESCE(SUM(s2), 0) AS ss
         |  FROM kept),
         |mg AS (SELECT COALESCE(SUM(mj*mj), 0) AS mm FROM
         |  (SELECT c.l, SUM(c.n) AS mj FROM cells c
         |   JOIN kept k ON c.i = k.i GROUP BY 1)),
         |f AS (SELECT ni,
         |  (CAST(ss AS DOUBLE) - CAST(ni AS DOUBLE) * 3.0e0)
         |    / (CAST(ni AS DOUBLE) * 3.0e0 * 2.0e0) AS pb,
         |  CAST(mm AS DOUBLE) / (CAST(ni AS DOUBLE) * 3.0e0
         |    * CAST(ni AS DOUBLE) * 3.0e0) AS pe
         |  FROM ag, mg WHERE ni > 0)
         |SELECT CAST(ni AS BIGINT) AS items, 3 AS raters,
         |  CAST(ROUND(CAST(pb AS DECIMAL(18,8)), 6) AS DOUBLE) AS p_bar,
         |  CAST(ROUND(CAST(pe AS DECIMAL(18,8)), 6) AS DOUBLE) AS p_e,
         |  CAST(ROUND(CAST(CASE WHEN pe < 1.0e0 THEN
         |    (pb - pe) / (1.0e0 - pe) END AS DECIMAL(18,8)), 6)
         |    AS DOUBLE) AS kappa
         |FROM f""".stripMargin,

    // Krippendorff nominal alpha: per-item disagreement scaled by
    // lcm(1..9) = 2520 so the observed-disagreement sum is an exact
    // integer (2520 // (m-1) is integral for every kept item).
    "x283_kripp_alpha" ->
      s"""WITH $annRatingsCte,
         |cells AS (SELECT i, l, COUNT(*) AS n FROM rr GROUP BY 1, 2),
         |it AS (SELECT i, SUM(n) AS m, SUM(n*n) AS s2 FROM cells
         |  GROUP BY 1 HAVING SUM(n) BETWEEN 2 AND 10),
         |ds AS (SELECT COALESCE(SUM((2520 // (m - 1)) * (m*m - s2)), 0)
         |    AS sdo,
         |  COALESCE(SUM(m), 0) AS np, COUNT(*) AS items FROM it),
         |mg AS (SELECT COALESCE(SUM(nc*nc), 0) AS cc FROM
         |  (SELECT c.l, SUM(c.n) AS nc FROM cells c
         |   JOIN it ON c.i = it.i GROUP BY 1)),
         |f AS (SELECT items, np, CAST(sdo AS DOUBLE) AS sdod,
         |  CAST(np AS DOUBLE) AS nd, CAST(cc AS DOUBLE) AS ccd
         |  FROM ds, mg WHERE np >= 2)
         |SELECT CAST(items AS BIGINT) AS items,
         |  CAST(np AS BIGINT) AS pairable,
         |  CAST(ROUND(CAST(sdod / (2520.0e0 * nd) AS DECIMAL(18,8)), 6)
         |    AS DOUBLE) AS d_o,
         |  CAST(ROUND(CAST((nd*nd - ccd) / (nd * (nd - 1.0e0))
         |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS d_e,
         |  CAST(ROUND(CAST(CASE WHEN nd*nd - ccd > 0.0e0 THEN
         |    1.0e0 - sdod * (nd - 1.0e0) / (2520.0e0 * (nd*nd - ccd))
         |    END AS DECIMAL(18,8)), 6) AS DOUBLE) AS alpha
         |FROM f""".stripMargin,

    // Bradley-Terry MM, 8 unrolled rounds (the x110 k-means idiom):
    // strengths quantized to 9 decimals after every round.
    "x284_bradley_terry" -> btSql(iters = 8),

    // Positional bias: Wilson interval (x252's literals) on the
    // first-listed win rate of the derived preference log.
    "x285_positional_bias" ->
      s"""WITH $prefCmpCte,
         |ag AS (SELECT COUNT(*) AS t,
         |  SUM(CASE WHEN awon THEN 1 ELSE 0 END) AS s FROM cmp),
         |f AS (SELECT t, s, CAST(s AS DOUBLE) / CAST(t AS DOUBLE) AS p,
         |  CAST(t AS DOUBLE) AS n FROM ag WHERE t > 0),
         |w AS (SELECT t, s, p,
         |  CAST(ROUND(CAST(
         |    (p + 3.8415999999999997e0 / (2.0e0 * n)
         |      - 1.96e0 * SQRT(p * (1.0e0 - p) / n
         |        + 3.8415999999999997e0 / (4.0e0 * n * n)))
         |    / (1.0e0 + 3.8415999999999997e0 / n)
         |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS lo,
         |  CAST(ROUND(CAST(
         |    (p + 3.8415999999999997e0 / (2.0e0 * n)
         |      + 1.96e0 * SQRT(p * (1.0e0 - p) / n
         |        + 3.8415999999999997e0 / (4.0e0 * n * n)))
         |    / (1.0e0 + 3.8415999999999997e0 / n)
         |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS hi
         |  FROM f)
         |SELECT CAST(t AS BIGINT) AS trials, CAST(s AS BIGINT)
         |    AS first_wins,
         |  CAST(ROUND(CAST(p AS DECIMAL(18,8)), 6) AS DOUBLE)
         |    AS first_rate,
         |  lo AS wilson_lo, hi AS wilson_hi,
         |  (lo > 0.5e0 OR hi < 0.5e0) AS biased
         |FROM w""".stripMargin,

    // Leave-one-out consensus per rater slot: the argmax-with-tiebreak
    // rides a MIN over an order-encoding string (padded inverted count
    // || label) — same order as Spark's min(struct(-n, c)).
    "x286_rater_consensus" ->
      s"""WITH $annRatingsCte,
         |cells AS (SELECT i, l AS c, COUNT(*) AS n FROM rr
         |  GROUP BY 1, 2),
         |lo AS (SELECT rr.i, rr.r, rr.l, cells.c,
         |  cells.n - CASE WHEN cells.c = rr.l THEN 1 ELSE 0 END AS loon
         |  FROM rr JOIN cells ON rr.i = cells.i),
         |ag AS (SELECT i, r, l,
         |  MIN(lpad(CAST(999999999999 - loon AS VARCHAR), 12, '0')
         |    || '|' || c) AS bk
         |  FROM lo GROUP BY 1, 2, 3 HAVING SUM(loon) > 0),
         |pr AS (SELECT r, COUNT(*) AS n,
         |  SUM(CASE WHEN substr(bk, 14) = l THEN 1 ELSE 0 END) AS a
         |  FROM ag GROUP BY 1),
         |tt AS (SELECT SUM(n) AS tn, SUM(a) AS ta FROM pr),
         |f AS (SELECT r, n, a,
         |  CAST(a AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
         |  CAST(ta AS DOUBLE) / CAST(tn AS DOUBLE) AS pbar,
         |  CAST(n AS DOUBLE) AS nd FROM pr, tt)
         |SELECT r AS rater, CAST(n AS BIGINT) AS rated,
         |  CAST(a AS BIGINT) AS agreements,
         |  CAST(ROUND(CAST(rate AS DECIMAL(18,8)), 6) AS DOUBLE)
         |    AS agree_rate,
         |  CAST(ROUND(CAST(pbar AS DECIMAL(18,8)), 6) AS DOUBLE)
         |    AS pooled_rate,
         |  CAST(ROUND(CAST(CASE WHEN pbar > 0.0e0 AND pbar < 1.0e0
         |    THEN (rate - pbar) / SQRT(pbar * (1.0e0 - pbar) / nd)
         |    END AS DECIMAL(18,8)), 6) AS DOUBLE) AS z
         |FROM f ORDER BY rater""".stripMargin,

    // Clipped bigram overlap: positional-join bigrams per side (the
    // x112 idiom), full-outer (pair, gram) join, LEAST-clipped
    // counts; F1 assembled from the ROUNDED P/R.
    "x280_ngram_overlap" ->
      """WITH d AS (SELECT doc_id, text AS ref,
        |  array_to_string(string_split(text, ' ')[1:15], ' ')
        |    || ' alpha beta' AS cand FROM documents
        |  WHERE text IS NOT NULL),
        |rp AS (SELECT doc_id, generate_subscripts(w, 1) AS pos,
        |  unnest(w) AS tok
        |  FROM (SELECT doc_id, string_split(ref, ' ') AS w FROM d)),
        |rg AS (SELECT doc_id, g, COUNT(*) AS rc FROM
        |  (SELECT a.doc_id, a.tok || ' ' || b.tok AS g FROM rp a
        |   JOIN rp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1)
        |  GROUP BY 1, 2),
        |cp AS (SELECT doc_id, generate_subscripts(w, 1) AS pos,
        |  unnest(w) AS tok
        |  FROM (SELECT doc_id, string_split(cand, ' ') AS w FROM d)),
        |cg AS (SELECT doc_id, g, COUNT(*) AS cc FROM
        |  (SELECT a.doc_id, a.tok || ' ' || b.tok AS g FROM cp a
        |   JOIN cp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1)
        |  GROUP BY 1, 2),
        |j AS (SELECT COALESCE(rg.doc_id, cg.doc_id) AS doc_id,
        |  COALESCE(rc, 0) AS rc, COALESCE(cc, 0) AS cc
        |  FROM rg FULL OUTER JOIN cg
        |    ON rg.doc_id = cg.doc_id AND rg.g = cg.g),
        |s AS (SELECT doc_id, SUM(rc) AS rs, SUM(cc) AS cs,
        |  SUM(LEAST(rc, cc)) AS cl FROM j GROUP BY 1),
        |pr AS (SELECT doc_id, rs, cs, cl,
        |  CAST(ROUND(CAST(CASE WHEN cs > 0 THEN CAST(cl AS DOUBLE)
        |    / CAST(cs AS DOUBLE) END AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS p,
        |  CAST(ROUND(CAST(CASE WHEN rs > 0 THEN CAST(cl AS DOUBLE)
        |    / CAST(rs AS DOUBLE) END AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS r FROM s)
        |SELECT doc_id, CAST(rs AS BIGINT) AS ref_ngrams,
        |  CAST(cs AS BIGINT) AS cand_ngrams,
        |  CAST(cl AS BIGINT) AS clipped,
        |  p AS precision, r AS recall,
        |  CAST(ROUND(CAST(CASE WHEN p + r > 0.0e0 THEN
        |    2.0e0 * p * r / (p + r) END AS DECIMAL(18,8)), 6)
        |    AS DOUBLE) AS f1
        |FROM pr ORDER BY doc_id""".stripMargin,

    // Luhn card scan: all-digit runs length-gated in a list filter
    // (no {13,19} regex clipping, no lookaround), checksum replayed as
    // the same integer HOF arithmetic, reduce-replace redaction.
    "x278_luhn_scan" ->
      """WITH d AS (SELECT o_orderkey, 'ref 123 card '
        |    || lpad(CAST(o_orderkey AS VARCHAR), 16, '4')
        |    || ' end' AS t FROM orders),
        |c AS (SELECT o_orderkey, t,
        |  list_filter(regexp_extract_all(t, '[0-9]+'),
        |    x -> length(x) BETWEEN 13 AND 19) AS cands FROM d),
        |v AS (SELECT o_orderkey, t, cands,
        |  list_filter(cands, x -> list_sum(list_transform(
        |    generate_series(1, length(reverse(x))), i ->
        |      CASE WHEN i % 2 = 0 THEN
        |        CASE WHEN CAST(substr(reverse(x), i, 1) AS INT) * 2 > 9
        |          THEN CAST(substr(reverse(x), i, 1) AS INT) * 2 - 9
        |          ELSE CAST(substr(reverse(x), i, 1) AS INT) * 2 END
        |      ELSE CAST(substr(reverse(x), i, 1) AS INT) END))
        |    % 10 = 0) AS vals FROM c)
        |SELECT o_orderkey,
        |  CAST(len(cands) AS INT) AS n_candidates,
        |  CAST(len(vals) AS INT) AS n_valid,
        |  list_reduce(list_prepend(t, vals),
        |    (acc, x) -> replace(acc, x, '<CARD>')) AS redacted
        |FROM v WHERE len(cands) > 0 ORDER BY o_orderkey""".stripMargin,

    // KMV a-not-b: the x261 union sketch with side-exclusive marks;
    // difference estimates scale the ln/pow-free union estimator by
    // the exclusive shares; exact truths ride along.
    "x277_kmv_difference" ->
      """WITH ha AS (SELECT DISTINCT ('0x' || substr(
        |    md5(CAST(o_custkey AS VARCHAR)), 1, 12))::BIGINT AS h
        |  FROM orders WHERE o_orderpriority = '1-URGENT'
        |    AND o_custkey IS NOT NULL),
        |hb AS (SELECT DISTINCT ('0x' || substr(
        |    md5(CAST(o_custkey AS VARCHAR)), 1, 12))::BIGINT AS h
        |  FROM orders WHERE o_orderpriority = '2-HIGH'
        |    AND o_custkey IS NOT NULL),
        |ska AS (SELECT h FROM ha ORDER BY h LIMIT 256),
        |skb AS (SELECT h FROM hb ORDER BY h LIMIT 256),
        |un AS (SELECT DISTINCT h FROM
        |  (SELECT h FROM ska UNION ALL SELECT h FROM skb)
        |  ORDER BY h LIMIT 256),
        |mk AS (SELECT un.h,
        |  CASE WHEN ska.h IS NOT NULL AND skb.h IS NULL
        |    THEN 1 ELSE 0 END AS aonly,
        |  CASE WHEN ska.h IS NULL AND skb.h IS NOT NULL
        |    THEN 1 ELSE 0 END AS bonly
        |  FROM un LEFT JOIN ska ON un.h = ska.h
        |          LEFT JOIN skb ON un.h = skb.h),
        |ag AS (SELECT COUNT(*) AS n, MAX(h) AS u,
        |  SUM(aonly) AS ca, SUM(bonly) AS cb FROM mk),
        |e AS (SELECT n, ca, cb,
        |  CASE WHEN n < 256 THEN CAST(n AS DOUBLE)
        |    ELSE 255.0e0 * 281474976710656.0e0 / CAST(u AS DOUBLE)
        |  END AS ue FROM ag),
        |ks AS (SELECT kk, MAX(a) AS ina, MAX(b) AS inb FROM
        |  (SELECT CAST(o_custkey AS VARCHAR) AS kk, 1 AS a, 0 AS b
        |     FROM orders WHERE o_orderpriority = '1-URGENT'
        |       AND o_custkey IS NOT NULL
        |   UNION ALL
        |   SELECT CAST(o_custkey AS VARCHAR), 0, 1
        |     FROM orders WHERE o_orderpriority = '2-HIGH'
        |       AND o_custkey IS NOT NULL) GROUP BY 1),
        |tr AS (SELECT
        |  CAST(SUM(CASE WHEN ina = 1 AND inb = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS ta,
        |  CAST(SUM(CASE WHEN ina = 0 AND inb = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS tb FROM ks)
        |SELECT 256 AS k,
        |  CAST(ROUND(CAST(ue AS DECIMAL(18,8)), 6) AS DOUBLE)
        |    AS union_estimate,
        |  CAST(ROUND(CAST(CAST(ca AS DOUBLE) / CAST(n AS DOUBLE) * ue
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS a_not_b_estimate,
        |  CAST(ROUND(CAST(CAST(cb AS DOUBLE) / CAST(n AS DOUBLE) * ue
        |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS b_not_a_estimate,
        |  ta AS true_a_not_b, tb AS true_b_not_a
        |FROM e CROSS JOIN tr""".stripMargin,

    // DDSketch: log-bucket counts (⌈8dp-pinned ln quotient⌉), one
    // cumulative walk over the bucket-bounded table, estimates via
    // exp(round₈(i·lnγ)) with lnγ / 2/(γ+1) printed from the engine's
    // own Scala doubles.
    "x276_ddsketch" -> ddsketchSql(alpha = 0.01,
      qs = Seq(0.5, 0.95, 0.99)),

    // Harmonic centrality via HyperBall: the same unrolled register
    // rounds, telescoped per-vertex sum Σ est_r·c_r with coefficients
    // printed from the ENGINE's own Scala doubles, top-20 by rounded
    // score.
    "x275_harmonic_centrality" ->
      hyperBallHarmonicSql(rounds = 3, m = 32, topK = 20),
  )

  /** Unrolled HyperBall over the x99 part⇄supplier graph: g0 = each
    * vertex's own register, round k = edge join + (v, bucket) MAX,
    * estimate CTE per round replaying [[graft.operators.Sketch]]'s
    * register arithmetic (exact 2^(40−r) harmonic terms, 8dp-pinned
    * linear-counting ln, 6dp per-vertex rounds). */
  /** The shared HyperBall CTE chain (edges → per-vertex registers →
    * `rounds` unrolled max-merge rounds → per-round per-vertex
    * estimates ef0..efN + per-round totals tt0..ttN), used by both
    * the x272 totals curve and the x275 centrality. */
  private def hyperBallCtes(rounds: Int, m: Int): String = {
    val alpha = s"(0.7213e0 / (1.0e0 + 1.079e0 / $m.0e0))"
    val two40 = "1099511627776"
    val mm = (m.toLong * m).toDouble
    def estCte(k: Int): String =
      s"""es$k AS (SELECT v, COUNT(*) AS ne,
         |  CAST(SUM(1::BIGINT << (40 - r)) AS BIGINT)
         |    + ($m - COUNT(*)) * (1::BIGINT << 40) AS s
         |  FROM g$k GROUP BY 1),
         |ee$k AS (SELECT v, $m - ne AS z,
         |  $alpha * ${mm}e0 * $two40.0e0 / CAST(s AS DOUBLE) AS raw
         |  FROM es$k),
         |ef$k AS (SELECT v, CAST(ROUND(CAST(
         |  CASE WHEN raw <= 2.5e0 * $m.0e0 AND z > 0 THEN
         |    $m.0e0 * CAST(ROUND(CAST(LN($m.0e0 / CAST(z AS DOUBLE))
         |      AS DECIMAL(18,8)), 8) AS DOUBLE)
         |  ELSE raw END AS DECIMAL(18,8)), 6) AS DOUBLE) AS est
         |  FROM ee$k),
         |tt$k AS (SELECT CAST($k AS BIGINT) AS r, COUNT(*) AS nv,
         |  SUM(CAST(est AS DECIMAL(18,8))) AS tot FROM ef$k)""".stripMargin
    val roundCtes = (1 to rounds).map { k =>
      s"""g$k AS (SELECT v, b, MAX(r) AS r FROM (
         |  SELECT v, b, r FROM g${k - 1}
         |  UNION ALL
         |  SELECT e.u AS v, p.b, p.r FROM e
         |    JOIN g${k - 1} p ON p.v = e.w) GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val estCtes = (0 to rounds).map(estCte).mkString(",\n")
    s"""e AS (
       |  SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS u,
       |                  's' || CAST(l_suppkey AS VARCHAR) AS w
       |  FROM lineitem
       |  UNION
       |  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR),
       |                  'p' || CAST(l_partkey AS VARCHAR) FROM lineitem),
       |vt AS (SELECT DISTINCT vv AS v FROM
       |  (SELECT u AS vv FROM e UNION ALL SELECT w FROM e)),
       |g0w AS (SELECT v,
       |  ('0x' || substr(md5('b:' || v), 1, 8))::BIGINT % $m AS b,
       |  ('0x' || substr(md5('r:' || v), 1, 8))::BIGINT AS wd FROM vt),
       |g0 AS (SELECT v, b, CASE WHEN wd = 0 THEN 33
       |  ELSE 33 - length(bin(wd)) END AS r FROM g0w),
       |$roundCtes,
       |$estCtes""".stripMargin
  }

  private def hyperBallSql(rounds: Int, m: Int): String = {
    val curve = (0 to rounds).map(k => s"SELECT * FROM tt$k")
      .mkString("\nUNION ALL\n")
    s"""WITH ${hyperBallCtes(rounds, m)},
       |curve AS ($curve),
       |cv AS (SELECT r,
       |  CAST(ROUND(CAST(tot AS DECIMAL(18,8)), 6) AS DOUBLE)
       |    AS n_reached,
       |  CAST(ROUND(CAST(CAST(tot AS DOUBLE) / CAST(nv AS DOUBLE)
       |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS avg_ball FROM curve),
       |fin AS (SELECT n_reached AS f FROM cv ORDER BY r DESC LIMIT 1)
       |SELECT r, n_reached, avg_ball,
       |  CAST(ROUND(CAST(n_reached / f AS DECIMAL(18,8)), 6) AS DOUBLE)
       |    AS reach_frac,
       |  CAST(n_reached >= 0.9e0 * f AS INT) AS covered_90
       |FROM cv CROSS JOIN fin ORDER BY r""".stripMargin
  }

  /** DDSketch oracle over lineitem extended price: literals printed
    * from the SAME Scala doubles the engine compiles in
    * ([[graft.operators.Sketch.ddLnGamma]]). */
  private def ddsketchSql(alpha: Double, qs: Seq[Double]): String = {
    val lnG = graft.operators.Sketch.ddLnGamma(alpha)
    val gamma = (1.0 + alpha) / (1.0 - alpha)
    val coef = 2.0 / (gamma + 1.0)
    val qList = qs.map(q => s"${q}e0").mkString(", ")
    s"""WITH r AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v
       |  FROM lineitem
       |  WHERE l_extendedprice IS NOT NULL AND l_extendedprice > 0),
       |b AS (SELECT CAST(CEIL(ROUND(CAST(LN(v) / ${lnG}e0
       |  AS DECIMAL(18,8)), 8)) AS BIGINT) AS i FROM r),
       |c AS (SELECT i, COUNT(*) AS c FROM b GROUP BY 1),
       |cu AS (SELECT i, SUM(c) OVER (ORDER BY i
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |  SUM(c) OVER () AS n FROM c),
       |qq AS (SELECT unnest([$qList]) AS q),
       |h AS (SELECT q, MAX(n) AS n,
       |  MIN(CASE WHEN CAST(cum AS DOUBLE) >= q * CAST(n AS DOUBLE)
       |    THEN i END) AS bucket
       |  FROM cu CROSS JOIN qq GROUP BY q)
       |SELECT q, CAST(n AS BIGINT) AS n, bucket,
       |  CAST(ROUND(CAST(EXP(CAST(ROUND(CAST(CAST(bucket AS DOUBLE)
       |      * ${lnG}e0 AS DECIMAL(18,8)), 8) AS DOUBLE))
       |    * ${coef}e0 AS DECIMAL(18,8)), 6) AS DOUBLE) AS estimate
       |FROM h ORDER BY q""".stripMargin
  }

  /** Per-return-flag DDSketch oracle — the x276 literals with a
    * partitioned cumulative walk. */
  private def ddsketchBySql(alpha: Double, qs: Seq[Double]): String = {
    val lnG = graft.operators.Sketch.ddLnGamma(alpha)
    val gamma = (1.0 + alpha) / (1.0 - alpha)
    val coef = 2.0 / (gamma + 1.0)
    val qList = qs.map(q => s"${q}e0").mkString(", ")
    s"""WITH r AS (SELECT l_returnflag AS g,
       |  CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
       |  WHERE l_extendedprice IS NOT NULL AND l_extendedprice > 0),
       |b AS (SELECT g, CAST(CEIL(ROUND(CAST(LN(v) / ${lnG}e0
       |  AS DECIMAL(18,8)), 8)) AS BIGINT) AS i FROM r),
       |c AS (SELECT g, i, COUNT(*) AS c FROM b GROUP BY 1, 2),
       |cu AS (SELECT g, i, SUM(c) OVER (PARTITION BY g ORDER BY i
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |  SUM(c) OVER (PARTITION BY g) AS n FROM c),
       |qq AS (SELECT unnest([$qList]) AS q),
       |h AS (SELECT g, q, MAX(n) AS n,
       |  MIN(CASE WHEN CAST(cum AS DOUBLE) >= q * CAST(n AS DOUBLE)
       |    THEN i END) AS bucket
       |  FROM cu CROSS JOIN qq GROUP BY g, q)
       |SELECT g AS l_returnflag, q, CAST(n AS BIGINT) AS n, bucket,
       |  CAST(ROUND(CAST(EXP(CAST(ROUND(CAST(CAST(bucket AS DOUBLE)
       |      * ${lnG}e0 AS DECIMAL(18,8)), 8) AS DOUBLE))
       |    * ${coef}e0 AS DECIMAL(18,8)), 6) AS DOUBLE) AS estimate
       |FROM h ORDER BY l_returnflag, q""".stripMargin
  }

  /** Harmonic-centrality finish over the shared HyperBall CTEs: the
    * telescoped Σ est_r·c_r with coefficients printed from the SAME
    * Scala doubles the engine multiplies
    * ([[graft.operators.Sketch.harmonicCoefs]]). */
  private def hyperBallHarmonicSql(rounds: Int, m: Int,
      topK: Int): String = {
    val coefs = graft.operators.Sketch.harmonicCoefs(rounds)
    val terms = (0 to rounds).map { k =>
      s"""SELECT v, ROUND(CAST(est * ${coefs(k)}e0
         |  AS DECIMAL(18,8)), 8) AS t FROM ef$k""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ${hyperBallCtes(rounds, m)},
       |tm AS ($terms),
       |h AS (SELECT v, CAST(ROUND(CAST(SUM(t) AS DECIMAL(18,8)), 6)
       |  AS DOUBLE) AS harmonic FROM tm GROUP BY 1)
       |SELECT v AS node, harmonic FROM h
       |ORDER BY harmonic DESC, node LIMIT $topK""".stripMargin
  }

  /** The x266/x267/x268 shared subject CTE: per-user first event,
    * first purchase, right-censor at the corpus horizon. */
  private def kmSubjectsCte: String =
    """WITH pu AS (SELECT user_id, MIN(ts) AS t0,
      |  MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
      |  FROM events GROUP BY 1),
      |hz AS (SELECT MAX(ts) AS e FROM events),
      |su AS (SELECT CASE WHEN tp IS NOT NULL THEN
      |    datediff('day', CAST(t0 AS DATE), CAST(tp AS DATE))
      |  ELSE datediff('day', CAST(t0 AS DATE), CAST(e AS DATE))
      |  END AS dur,
      |  CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
      |  FROM pu CROSS JOIN hz),
      |""".stripMargin

  /** Croston/SBA with α = 0.5: every SES weight is a power of two
    * (pow(0.5, k) is IEEE-exact on any libm), so the exponential fit
    * agrees bit-for-bit; weight layout mirrors Forecast.sesWeight —
    * position 1 takes the full tail (1-α)^(n-1). */
  /** Additive Holt–Winters oracle: the cusum-style `list_reduce`
    * fold mirroring Forecast.holtWinters step-for-step — state
    * `[i, l, b, s1..sm]`, every sub-expression re-derived from `acc`,
    * smoothing literals printed from the SAME Scala doubles the
    * engine uses. */
  private def holtWintersSql(
      alpha: Double, beta: Double, gamma: Double, m: Int): String = {
    def dl(x: Double) = s"${x}e0"
    val idxPos = s"(4 + CAST(acc[1] % ${dl(m.toDouble)} AS INT))"
    val sIdx = s"acc[$idxPos]"
    val lNew = s"(${dl(alpha)} * (xw[1] - $sIdx) + ${dl(1.0 - alpha)} * " +
      "(acc[2] + acc[3]))"
    val bNew = s"(${dl(beta)} * ($lNew - acc[2]) + ${dl(1.0 - beta)} * acc[3])"
    val sNew = s"(${dl(gamma)} * (xw[1] - $lNew) + ${dl(1.0 - gamma)} * $sIdx)"
    val elems = Seq(
      "acc[1] + 1.0e0",
      s"CASE WHEN acc[1] = 0.0e0 THEN xw[1] ELSE $lNew END",
      s"CASE WHEN acc[1] = 0.0e0 THEN 0.0e0 ELSE $bNew END") ++
      (4 to m + 3).map(k =>
        s"CASE WHEN acc[1] = 0.0e0 THEN 0.0e0 WHEN $idxPos = $k " +
          s"THEN $sNew ELSE acc[$k] END")
    val zeros = Seq.fill(m + 2)("0.0e0").mkString(", ")
    val sSum = (4 to m + 3).map(k => s"rs[$k]").mkString(" + ")
    val hSum = (1 to m).sum.toDouble
    s"""WITH $dailyCte,
       |ag AS (SELECT user_id, COUNT(*) AS n_obs,
       |  list(CAST(CAST(demand AS DECIMAL(18,6)) AS DOUBLE)
       |    ORDER BY day) AS ys
       |  FROM daily WHERE demand IS NOT NULL GROUP BY 1),
       |f AS (SELECT user_id, n_obs,
       |  list_reduce(
       |    list_prepend([0.0e0, $zeros],
       |      [[y, $zeros] for y in ys]),
       |    (acc, xw) -> [
       |      ${elems.mkString(",\n      ")}]) AS rs
       |  FROM ag)
       |SELECT user_id, n_obs,
       |  CAST(ROUND(CAST(rs[2] AS DECIMAL(18,8)), 4) AS DOUBLE) AS level,
       |  CAST(ROUND(CAST(rs[3] AS DECIMAL(18,8)), 4) AS DOUBLE) AS trend,
       |  CAST(ROUND(CAST(rs[2] * $m + rs[3] * ${dl(hSum)}
       |      + ($sSum) AS DECIMAL(18,8)), 4) AS DOUBLE)
       |    AS next_season_total
       |FROM f ORDER BY user_id""".stripMargin
  }

  private def crostonSql: String =
    s"""WITH $dailyCte,
       |rk AS (SELECT user_id, CAST(demand AS DOUBLE) AS z,
       |  row_number() OVER (PARTITION BY user_id ORDER BY day) AS rz,
       |  COUNT(*) OVER (PARTITION BY user_id) AS nz,
       |  CAST(date_diff('day',
       |    lag(day) OVER (PARTITION BY user_id ORDER BY day), day)
       |    AS DOUBLE) AS iv
       |  FROM daily),
       |agg AS (SELECT user_id, COUNT(*) AS n_demands,
       |  SUM((CASE WHEN rz = 1 THEN pow(0.5, nz - 1)
       |            ELSE 0.5 * pow(0.5, nz - rz) END) * z) AS zh,
       |  SUM(CASE WHEN rz > 1 THEN
       |      (CASE WHEN rz - 1 = 1 THEN pow(0.5, nz - 2)
       |            ELSE 0.5 * pow(0.5, nz - rz) END) * iv END) AS ah
       |  FROM rk GROUP BY 1)
       |SELECT user_id, n_demands,
       |  ROUND(zh, 4) AS z_hat, ROUND(ah, 4) AS a_hat,
       |  ROUND(zh / ah, 4) AS croston,
       |  ROUND(0.75 * zh / ah, 4) AS sba
       |FROM agg ORDER BY user_id""".stripMargin

  /** Backtest over the zero-filled dense series (x117's explode
    * construction): three forecasters, eval MAE, argmin on the
    * ROUNDED maes with the fixed naive→snaive7→mean tie order. */
  private def backtestSql: String =
    s"""WITH $dailyCte,
       |b AS (SELECT MAX(day) AS gmax, MAX(day) - 7 AS splitd FROM daily),
       |led AS (SELECT user_id, day AS d0, demand,
       |  lead(day) OVER (PARTITION BY user_id ORDER BY day) AS nxt
       |  FROM daily),
       |dense AS (SELECT user_id, d0, demand,
       |  CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
       |    CAST(COALESCE(nxt - 1, (SELECT gmax FROM b)) AS TIMESTAMP),
       |    INTERVAL 1 DAY)) AS DATE) AS day
       |  FROM led),
       |ser AS (SELECT user_id, day,
       |  CASE WHEN day = d0 THEN CAST(demand AS DOUBLE) ELSE 0.0 END AS y
       |  FROM dense),
       |sc AS (SELECT user_id, day, y,
       |  COALESCE(MAX(CASE WHEN day = (SELECT splitd FROM b) THEN y END)
       |    OVER (PARTITION BY user_id), 0.0) AS fnaive,
       |  COALESCE(lag(y, 7) OVER (PARTITION BY user_id ORDER BY day), 0.0)
       |    AS fsnaive,
       |  COALESCE(AVG(CASE WHEN day <= (SELECT splitd FROM b) THEN y END)
       |    OVER (PARTITION BY user_id), 0.0) AS fmean
       |  FROM ser),
       |ag AS (SELECT user_id,
       |  ROUND(AVG(CASE WHEN day > (SELECT splitd FROM b)
       |    THEN ABS(y - fnaive) END), 4) AS mae_naive,
       |  ROUND(AVG(CASE WHEN day > (SELECT splitd FROM b)
       |    THEN ABS(y - fsnaive) END), 4) AS mae_snaive7,
       |  ROUND(AVG(CASE WHEN day > (SELECT splitd FROM b)
       |    THEN ABS(y - fmean) END), 4) AS mae_mean
       |  FROM sc GROUP BY 1)
       |SELECT user_id, mae_naive, mae_snaive7, mae_mean,
       |  CASE WHEN mae_naive = LEAST(mae_naive, mae_snaive7, mae_mean)
       |         THEN 'naive'
       |       WHEN mae_snaive7 = LEAST(mae_naive, mae_snaive7, mae_mean)
       |         THEN 'snaive7'
       |       ELSE 'mean' END AS best_model
       |FROM ag ORDER BY user_id""".stripMargin

  /** Decimal-exact per-user daily demand — the shared base series of
    * the forecasting tier; mirrors Queries.dailyDemand. */
  private def dailyCte: String =
    """daily AS (
      |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    SUM(CAST(value AS DECIMAL(18,2))) AS demand
      |  FROM events GROUP BY 1, 2)""".stripMargin

  /** The x139 classical-decomposition chain (densify → centered 7-day
    * trend → weekday seasonal), shared by x139 and the x212 strength
    * summary; mirrors Forecast.seasonalDecompose. Exposes CTEs `dw`
    * (user_id, day, y, trend, dow) and `se` (user_id, dow, seasonal). */
  private def decomposeCtes: String =
    s"""$dailyCte,
       |led AS (SELECT user_id, day AS d0, demand,
       |  lead(day) OVER (PARTITION BY user_id ORDER BY day) AS nxt
       |  FROM daily),
       |dense AS (SELECT user_id, d0, demand,
       |  CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
       |    CAST(COALESCE(nxt - 1, d0) AS TIMESTAMP),
       |    INTERVAL 1 DAY)) AS DATE) AS day
       |  FROM led),
       |ser AS (SELECT user_id, day,
       |  CASE WHEN day = d0 THEN CAST(demand AS DOUBLE) ELSE 0.0 END
       |    AS y
       |  FROM dense),
       |tr AS (SELECT user_id, day, y,
       |  CASE WHEN COUNT(*) OVER wt = 7
       |    THEN ROUND(AVG(y) OVER wt, 6) END AS trend
       |  FROM ser WINDOW wt AS (PARTITION BY user_id ORDER BY day
       |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
       |dw AS (SELECT user_id, day, y, trend, isodow(day) - 1 AS dow
       |  FROM tr),
       |se AS (SELECT user_id, dow, ROUND(AVG(y - trend), 6) AS seasonal
       |  FROM dw GROUP BY 1, 2)""".stripMargin

  /** One Lloyd's assignment pass against centroid CTE `cc`: argmin of
    * |v|² − 2·v·c + |c|², ties to the lowest cluster index — the same
    * term order [[graft.operators.Similarity.kmeans]] compiles, so the
    * distance doubles agree bit-for-bit. */
  /** X114 k-core oracle: exactly 8 unrolled peel rounds over the
    * support-≥2 co-purchase graph — matches the engine whether it
    * converges early (extra peels are the identity) or hits the
    * maxRounds cut (both sides then did exactly 8). */
  private def kcoreSql: String = {
    // every CTE is MATERIALIZED: each unrolled round references the
    // previous round's edge set 4 times, so default CTE inlining
    // expands the base parquet scan 4^8 times (file-handle exhaustion
    // before it even gets slow)
    val rounds = (1 to 8).map { i =>
      s"""d$i AS MATERIALIZED (SELECT n, COUNT(*) AS d FROM (
         |    SELECT a AS n FROM e${i - 1} UNION ALL SELECT b FROM e${i - 1})
         |  GROUP BY 1),
         |k$i AS MATERIALIZED (SELECT n FROM d$i WHERE d >= 3),
         |e$i AS MATERIALIZED (SELECT a, b FROM e${i - 1}
         |  WHERE a IN (SELECT n FROM k$i) AND b IN (SELECT n FROM k$i))"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH oi AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o,
       |  l_partkey AS i FROM lineitem),
       |aff AS MATERIALIZED (SELECT l.i AS x, r.i AS y
       |  FROM oi l JOIN oi r ON l.o = r.o AND l.i < r.i
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |e0 AS MATERIALIZED (SELECT DISTINCT
       |    least(CAST(x AS VARCHAR), CAST(y AS VARCHAR)) AS a,
       |    greatest(CAST(x AS VARCHAR), CAST(y AS VARCHAR)) AS b
       |  FROM aff WHERE CAST(x AS VARCHAR) <> CAST(y AS VARCHAR)),
       |$rounds,
       |fin AS (SELECT n, COUNT(*) AS d FROM (
       |    SELECT a AS n FROM e8 UNION ALL SELECT b FROM e8) GROUP BY 1)
       |SELECT n AS node, CAST(d AS BIGINT) AS degree FROM fin
       |ORDER BY node""".stripMargin
  }

  /** X135 info-gain oracle block: x149's MI math with the feature
    * expression injected, as a self-contained subquery (its own WITH)
    * so the three feature blocks can UNION ALL cleanly. */
  private def miBlockSql(fExpr: String, fname: String): String =
    s"""(WITH cells AS (SELECT $fExpr AS a, o_orderstatus AS b,
       |  COUNT(*) AS o FROM orders GROUP BY 1, 2),
       |ra AS (SELECT a, SUM(o) AS ra FROM cells GROUP BY 1),
       |cb AS (SELECT b, SUM(o) AS cb FROM cells GROUP BY 1),
       |nn AS (SELECT CAST(SUM(o) AS DOUBLE) AS n FROM cells),
       |mi AS (SELECT SUM(CAST((o / nn.n)
       |    * ln(nn.n * o / (CAST(ra.ra AS DOUBLE) * cb.cb))
       |    AS DECIMAL(18,10))) AS mi
       |  FROM cells
       |  JOIN ra ON ra.a IS NOT DISTINCT FROM cells.a
       |  JOIN cb ON cb.b IS NOT DISTINCT FROM cells.b
       |  CROSS JOIN nn),
       |ha AS (SELECT SUM(CAST((-(ra / nn.n)) * ln(ra / nn.n)
       |    AS DECIMAL(18,10))) AS ha FROM ra CROSS JOIN nn),
       |hb AS (SELECT SUM(CAST((-(cb / nn.n)) * ln(cb / nn.n)
       |    AS DECIMAL(18,10))) AS hb FROM cb CROSS JOIN nn)
       |SELECT '$fname' AS feature, ROUND(CAST(mi AS DOUBLE), 6) AS mi,
       |  ROUND(CAST(ha AS DOUBLE), 6) AS h_feature,
       |  ROUND(CAST(hb AS DOUBLE), 6) AS h_label,
       |  CAST(ROUND(CAST(CASE WHEN CAST(least(ha, hb) AS DOUBLE) > 0
       |    THEN CAST(mi AS DOUBLE) / CAST(least(ha, hb) AS DOUBLE) END
       |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS nmi
       |FROM mi CROSS JOIN ha CROSS JOIN hb)""".stripMargin

  /** X131 principal-component oracle: two unrolled power-iteration
    * rounds mirroring Similarity.principalComponent step for step —
    * decimal per-dimension sums, list-dot kernels for every dot (the
    * same sequential association the driver folds run), DECIMAL(18,8)
    * stabilize + 6-dp quantize between rounds. */
  private def principalComponentSql(iters: Int): String = {
    val rounds = (1 to iters).map { r =>
      s"""s$r AS MATERIALIZED (SELECT e.vec_id, e.v,
         |  list_dot_product(e.v, (SELECT v FROM v${r - 1}))
         |  - list_dot_product((SELECT mu FROM mul),
         |      (SELECT v FROM v${r - 1})) AS s
         |  FROM e),
         |g$r AS MATERIALIZED (SELECT pos,
         |  CAST(SUM(CAST(s * x AS DECIMAL(28,8))) AS DOUBLE) AS sx,
         |  CAST(SUM(CAST(s AS DECIMAL(28,8))) AS DOUBLE) AS ss
         |  FROM (SELECT s, generate_subscripts(v, 1) AS pos,
         |    unnest(v) AS x FROM s$r) GROUP BY pos),
         |w$r AS MATERIALIZED (SELECT g$r.pos, sx - m * ss AS w
         |  FROM g$r JOIN mu0 ON g$r.pos = mu0.pos),
         |wl$r AS (SELECT list(w ORDER BY pos) AS wl FROM w$r),
         |v$r AS (SELECT list_transform(wl, x -> CAST(ROUND(CAST(
         |    x / sqrt(list_dot_product(wl, wl)) AS DECIMAL(18,8)), 6)
         |    AS DOUBLE)) AS v FROM wl$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH $embCte,
       |mu0 AS MATERIALIZED (SELECT pos, CAST(ROUND(CAST(
       |    CAST(SUM(CAST(x AS DECIMAL(28,8))) AS DOUBLE) / COUNT(*)
       |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS m
       |  FROM (SELECT generate_subscripts(v, 1) AS pos, unnest(v) AS x
       |    FROM e) GROUP BY pos),
       |mul AS MATERIALIZED (SELECT list(m ORDER BY pos) AS mu FROM mu0),
       |v0 AS (SELECT list(CASE WHEN pos = 1 THEN CAST(1.0 AS DOUBLE)
       |    ELSE CAST(0.0 AS DOUBLE) END ORDER BY pos) AS v FROM mu0),
       |$rounds
       |SELECT CAST(pos - 1 AS BIGINT) AS pos, loading FROM (
       |  SELECT generate_subscripts(v, 1) AS pos, unnest(v) AS loading
       |  FROM v$iters)
       |ORDER BY pos""".stripMargin
  }

  /** X130 shortest-hops oracle: exactly `iters` unrolled BFS
    * relaxations (MATERIALIZED per round — same inlining-blowup guard
    * as the k-core oracle); extra relaxations of a converged distance
    * table are the identity, so early engine convergence still
    * matches. */
  private def shortestHopsSql(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""d$i AS MATERIALIZED (SELECT node, MIN(h) AS h FROM (
         |    SELECT node, h FROM d${i - 1}
         |    UNION ALL
         |    SELECT adj.nb AS node, d.h + 1 AS h
         |    FROM d${i - 1} d JOIN adj ON d.node = adj.z)
         |  GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""WITH oi AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o,
       |  l_partkey AS i FROM lineitem),
       |aff AS MATERIALIZED (SELECT l.i AS x, r.i AS y
       |  FROM oi l JOIN oi r ON l.o = r.o AND l.i < r.i
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |e0 AS MATERIALIZED (SELECT DISTINCT
       |    least(CAST(x AS VARCHAR), CAST(y AS VARCHAR)) AS a,
       |    greatest(CAST(x AS VARCHAR), CAST(y AS VARCHAR)) AS b
       |  FROM aff WHERE CAST(x AS VARCHAR) <> CAST(y AS VARCHAR)),
       |adj AS MATERIALIZED (SELECT a AS z, b AS nb FROM e0
       |  UNION ALL SELECT b, a FROM e0),
       |sd AS (SELECT DISTINCT CAST(p_partkey AS VARCHAR) AS node
       |  FROM part WHERE p_size = 1),
       |d0 AS MATERIALIZED (SELECT n.node, CAST(0 AS BIGINT) AS h
       |  FROM (SELECT DISTINCT z AS node FROM adj) n
       |  JOIN sd USING (node)),
       |$rounds
       |SELECT node, CAST(h AS BIGINT) AS hops FROM d$iters
       |ORDER BY node""".stripMargin
  }

  private def kmeansAssign(cc: String): String =
    s"""SELECT vec_id, v, cidx, d FROM (
       |  SELECT e.vec_id, e.v, $cc.cidx,
       |    list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, $cc.c)
       |      + list_dot_product($cc.c, $cc.c) AS d,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
       |      list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, $cc.c)
       |        + list_dot_product($cc.c, $cc.c), $cc.cidx) AS rn
       |  FROM e CROSS JOIN $cc) WHERE rn = 1""".stripMargin

  /** Centroid update: element-wise mean of each cluster's members,
    * ROUNDed to 6 digits (the portability quantize); a cluster with no
    * members keeps its previous centroid via the LEFT JOIN COALESCE. */
  /** One HITS half-round, split into a MATERIALIZED contribution CTE
    * (so the unrolled chain evaluates each level ONCE — without it
    * DuckDB inlines every reference and the plan doubles per
    * half-round) and a normalize step, L1 + 9dp quantize bit-matching
    * Graph.hits' round. */
  private def hitsHalf(contrib: String, prev: String,
      from: String, to: String, out: String): String =
    s"""$contrib AS MATERIALIZED (SELECT e.$to AS node, SUM(p.s) AS c
       |  FROM e JOIN $prev p ON e.$from = p.node GROUP BY 1),
       |$out AS MATERIALIZED (SELECT nd.node, CASE WHEN t.tot > 0 THEN
       |    ROUND(coalesce(s.c, 0.0e0) / t.tot, 9) ELSE 0.0e0 END AS s
       |  FROM nodes nd
       |  LEFT JOIN $contrib s ON s.node = nd.node
       |  CROSS JOIN (SELECT SUM(c) AS tot FROM $contrib) t)""".stripMargin

  /** Unrolled synchronous label propagation (x323): l0 = own id; each
    * round counts neighbor labels PLUS the self-vote and keeps the
    * (max count, min label) winner per node — literally the
    * operator's update, integer counts and string ties only.
    * MATERIALIZED throughout: every count CTE reads its predecessor
    * twice (edge join + self-vote union). */
  /** The shared CTE body (no WITH, no final select): co-purchase
    * graph e0/e, nodes, and the unrolled rounds through l{rounds} —
    * reused by x323's assignment output and x325's modularity grade. */
  private def labelPropCtes(rounds: Int): String = {
    val steps = (1 to rounds).map { k =>
      s"""c$k AS MATERIALIZED (SELECT node, lab, COUNT(*) AS cnt FROM (
         |    SELECT e.src AS node, p.lab FROM e
         |    JOIN l${k - 1} p ON e.dst = p.node
         |    UNION ALL SELECT node, lab FROM l${k - 1})
         |  GROUP BY 1, 2),
         |l$k AS MATERIALIZED (SELECT node, lab FROM (
         |    SELECT node, lab, row_number()
         |      OVER (PARTITION BY node ORDER BY cnt DESC, lab) AS rn
         |    FROM c$k) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""oi AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i
       |  FROM lineitem),
       |e0 AS (SELECT CAST(l.i AS VARCHAR) AS x, CAST(r.i AS VARCHAR) AS y,
       |    COUNT(*) AS n
       |  FROM oi l JOIN oi r ON l.o = r.o AND l.i < r.i
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |e AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
       |    SELECT x AS src, y AS dst FROM e0 WHERE x <> y
       |    UNION ALL SELECT y, x FROM e0 WHERE x <> y)),
       |nodes AS (SELECT DISTINCT src AS node FROM e),
       |l0 AS (SELECT node, node AS lab FROM nodes),
       |$steps""".stripMargin
  }

  private def labelPropSql(rounds: Int): String =
    s"""WITH ${labelPropCtes(rounds)},
       |sz AS (SELECT lab, COUNT(*) AS community_size
       |  FROM l$rounds GROUP BY 1)
       |SELECT l.node, l.lab AS community,
       |  CAST(sz.community_size AS BIGINT) AS community_size
       |FROM l$rounds l JOIN sz ON l.lab = sz.lab
       |ORDER BY l.node""".stripMargin

  /** Newman modularity of the label-propagation assignment (x325):
    * exact integer L_c/D_c/m counting over the VARCHAR-canonicalized
    * undirected edge set, per-community `L/m − (D/2m)²` rounded at
    * 6 dp, q_total = round-then-add of the contributions — mirroring
    * Graph.modularity's float chain paren-for-paren. */
  private def modularitySql(rounds: Int): String =
    s"""WITH ${labelPropCtes(rounds)},
       |canon AS (SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
       |  FROM e0 WHERE x <> y),
       |mm AS (SELECT COUNT(*) AS m FROM canon),
       |dg AS (SELECT n AS node, COUNT(*) AS d FROM (
       |    SELECT a AS n FROM canon UNION ALL SELECT b FROM canon)
       |  GROUP BY 1),
       |intra AS (SELECT la.lab AS c, COUNT(*) AS l
       |  FROM canon cn JOIN l$rounds la ON cn.a = la.node
       |  JOIN l$rounds lb ON cn.b = lb.node
       |  WHERE la.lab = lb.lab GROUP BY 1),
       |degc AS (SELECT l.lab AS c, SUM(COALESCE(dg.d, 0)) AS dc,
       |    COUNT(*) AS n_nodes
       |  FROM l$rounds l LEFT JOIN dg ON l.node = dg.node GROUP BY 1),
       |una AS (SELECT COUNT(*) AS u FROM dg
       |  WHERE node NOT IN (SELECT node FROM l$rounds)),
       |perc AS (SELECT degc.c AS community,
       |    CAST(degc.n_nodes AS BIGINT) AS n_nodes,
       |    CAST(COALESCE(intra.l, 0) AS BIGINT) AS internal_edges,
       |    CAST(degc.dc AS BIGINT) AS degree_sum,
       |    CAST((SELECT m FROM mm) AS BIGINT) AS m_edges,
       |    CAST((SELECT u FROM una) AS BIGINT) AS n_unassigned_nodes,
       |    CAST(ROUND(CAST(CASE WHEN (SELECT m FROM mm) > 0 THEN
       |      CAST(COALESCE(intra.l, 0) AS DOUBLE)
       |        / CAST((SELECT m FROM mm) AS DOUBLE)
       |      - (CAST(degc.dc AS DOUBLE)
       |          / (2.0e0 * CAST((SELECT m FROM mm) AS DOUBLE)))
       |        * (CAST(degc.dc AS DOUBLE)
       |          / (2.0e0 * CAST((SELECT m FROM mm) AS DOUBLE)))
       |      ELSE 0.0e0 END AS DECIMAL(18,8)), 6) AS DOUBLE) AS q_contrib
       |  FROM degc LEFT JOIN intra ON degc.c = intra.c)
       |SELECT community, n_nodes, internal_edges, degree_sum, m_edges,
       |  n_unassigned_nodes, q_contrib,
       |  CAST(ROUND(CAST(SUM(q_contrib) OVER () AS DECIMAL(18,8)), 6)
       |    AS DOUBLE) AS q_total
       |FROM perc ORDER BY community""".stripMargin

  /** Per-assignment modularity-total CTEs (the [[modularitySql]] float
    * chain, factored so [[modularityRefineSql]] can grade TWO
    * assignments in one statement): `${p}q` exposes (q, nc) — the
    * round-then-add Q total (`digits` dp), the community count, and
    * the EXACT integer numerator Σ_c(4m·L_c − D_c²) = Q·4m² — for the
    * assignment table `$asg` (columns node, lab). Assumes `canon`,
    * `dg`, `mm` CTEs are in scope. */
  private def qTotalCtes(p: String, asg: String, digits: Int): String =
    s"""${p}intra AS (SELECT la.lab AS c, COUNT(*) AS l
       |  FROM canon cn JOIN $asg la ON cn.a = la.node
       |  JOIN $asg lb ON cn.b = lb.node
       |  WHERE la.lab = lb.lab GROUP BY 1),
       |${p}degc AS (SELECT l.lab AS c, SUM(COALESCE(dg.d, 0)) AS dc
       |  FROM $asg l LEFT JOIN dg ON l.node = dg.node GROUP BY 1),
       |${p}perc AS (SELECT degc.c,
       |    CAST(ROUND(CAST(CASE WHEN (SELECT m FROM mm) > 0 THEN
       |      CAST(COALESCE(i.l, 0) AS DOUBLE)
       |        / CAST((SELECT m FROM mm) AS DOUBLE)
       |      - (CAST(degc.dc AS DOUBLE)
       |          / (2.0e0 * CAST((SELECT m FROM mm) AS DOUBLE)))
       |        * (CAST(degc.dc AS DOUBLE)
       |          / (2.0e0 * CAST((SELECT m FROM mm) AS DOUBLE)))
       |      ELSE 0.0e0 END AS DECIMAL(18,8)), $digits) AS DOUBLE) AS qc,
       |    4 * (SELECT m FROM mm) * COALESCE(i.l, 0)
       |      - degc.dc * degc.dc AS qnc
       |  FROM ${p}degc degc LEFT JOIN ${p}intra i ON degc.c = i.c),
       |${p}q AS (SELECT CAST(ROUND(CAST(SUM(qc) AS DECIMAL(18,8)),
       |      $digits) AS DOUBLE) AS q, COUNT(*) AS nc,
       |    SUM(qnc) AS qn FROM ${p}perc)""".stripMargin

  /** Louvain-style refinement sweeps over the x323 LPA assignment
    * (x327), graded before/after: per sweep, per node, per assigned
    * neighbor community D, the 2m²-scaled move gain
    * `2m·(k_iD − k_iC′) − k_i·(D_D − D_C + k_i)` — ALL-LONG integer
    * arithmetic mirroring Graph.modularityRefine exactly; per-node
    * best strictly-positive candidate is the node's proposal
    * (ties → smallest target label); LOCALLY-DOMINANT acceptance (a
    * proposal must be the (score desc, node asc)-max incident to BOTH
    * its communities — the Preis matching rule, so accepted moves
    * touch disjoint community pairs and gains add exactly); then two
    * [[qTotalCtes]] grades (before = l$rounds, after = the last
    * sweep's assignment). */
  /** One weighted locally-dominant sweep as CTEs (prefix `$p`,
    * previous assignment `$prev` (node, lab), edge table `$et`
    * (src, dst, w — symmetric), degree table `$degT` (node, k)):
    * mirrors Graph.refineCore paren-for-paren — SUM(w) vote weights,
    * the 2m²-scaled all-long gain, per-node best proposal, Preis
    * acceptance. The unweighted level is the same generator with an
    * all-ones edge table (SUM(1) = COUNT — bit-identical longs). */
  private def wSweepCte(p: String, prev: String, et: String,
      degT: String): String =
    s"""${p}degc AS (SELECT l.lab AS c, SUM(COALESCE(kk.k, 0)) AS tot
       |  FROM $prev l LEFT JOIN $degT kk ON l.node = kk.node GROUP BY 1),
       |${p}nc AS (SELECT $et.src AS node, pp.lab AS cd, SUM($et.w) AS kd
       |  FROM $et JOIN $prev pp ON $et.dst = pp.node GROUP BY 1, 2),
       |${p}own AS (SELECT l.node, l.lab AS c, COALESCE(kk.k, 0) AS ki,
       |    degc.tot AS totc
       |  FROM $prev l LEFT JOIN $degT kk ON l.node = kk.node
       |  JOIN ${p}degc degc ON degc.c = l.lab),
       |${p}kic AS (SELECT nc.node, nc.kd AS kic
       |  FROM ${p}nc nc JOIN $prev la
       |    ON nc.node = la.node AND nc.cd = la.lab),
       |${p}cand AS (SELECT own.node, own.c, nc.cd,
       |    2 * (SELECT m FROM mm) * (nc.kd - COALESCE(kic.kic, 0))
       |      - own.ki * (dd.tot - own.totc + own.ki) AS score
       |  FROM ${p}nc nc JOIN ${p}own own
       |    ON nc.node = own.node AND nc.cd <> own.c
       |  LEFT JOIN ${p}kic kic ON kic.node = own.node
       |  JOIN ${p}degc dd ON dd.c = nc.cd),
       |${p}prop AS MATERIALIZED (SELECT node, c, cd, score FROM (
       |    SELECT node, c, cd, score, row_number()
       |      OVER (PARTITION BY node ORDER BY score DESC, cd) AS rn
       |    FROM ${p}cand WHERE score > 0) WHERE rn = 1),
       |${p}inc AS (SELECT c AS comm, node, score FROM ${p}prop
       |  UNION ALL SELECT cd AS comm, node, score FROM ${p}prop),
       |${p}win AS (SELECT comm, node AS winner FROM (
       |    SELECT comm, node, row_number()
       |      OVER (PARTITION BY comm ORDER BY score DESC, node) AS rn
       |    FROM ${p}inc) WHERE rn = 1),
       |${p}acc AS (SELECT pr.node, pr.cd FROM ${p}prop pr
       |  JOIN ${p}win wc ON wc.comm = pr.c AND wc.winner = pr.node
       |  JOIN ${p}win wd ON wd.comm = pr.cd AND wd.winner = pr.node),
       |${p}asg AS MATERIALIZED (SELECT own.node,
       |    COALESCE(acc.cd, own.c) AS lab
       |  FROM ${p}own own LEFT JOIN ${p}acc acc
       |    ON own.node = acc.node)""".stripMargin

  /** The shared level-0 preamble for x327/x330: all-ones edge view +
    * node-degree table off the canonical graph (SUM(1) ≡ COUNT keeps
    * the longs bit-identical to the r17 unweighted form). */
  private def level0WeightCtes: String =
    s"""we AS (SELECT src, dst, 1 AS w FROM e),
       |wdeg AS (SELECT node, COALESCE(d, 0) AS k FROM dg)""".stripMargin

  private def modularityRefineSql(rounds: Int, sweeps: Int): String = {
    def sweepCtes(i: Int): String = {
      val prev = if (i == 1) s"l$rounds" else s"r${i - 1}asg"
      wSweepCte(s"r$i", prev, "we", "wdeg")
    }
    val fin = s"r${sweeps}asg"
    s"""WITH ${labelPropCtes(rounds)},
       |canon AS (SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
       |  FROM e0 WHERE x <> y),
       |mm AS (SELECT COUNT(*) AS m FROM canon),
       |dg AS (SELECT n AS node, COUNT(*) AS d FROM (
       |    SELECT a AS n FROM canon UNION ALL SELECT b FROM canon)
       |  GROUP BY 1),
       |$level0WeightCtes,
       |${(1 to sweeps).map(sweepCtes).mkString(",\n")},
       |${qTotalCtes("qb", s"l$rounds", digits = 8)},
       |${qTotalCtes("qa", fin, digits = 8)},
       |mv AS (SELECT CAST(SUM(CASE WHEN f.lab <> p.lab THEN 1 ELSE 0
       |    END) AS BIGINT) AS n_moved
       |  FROM l$rounds p JOIN $fin f ON p.node = f.node)
       |SELECT qbq.q AS q_before,
       |  CAST(qbq.nc AS BIGINT) AS n_communities_before,
       |  CAST((SELECT m FROM mm) AS BIGINT) AS m_edges,
       |  qaq.q AS q_after,
       |  CAST(qaq.nc AS BIGINT) AS n_communities_after,
       |  CAST(qaq.qn - qbq.qn AS BIGINT) AS q_gain_4m2,
       |  mv.n_moved
       |FROM qbq CROSS JOIN qaq CROSS JOIN mv""".stripMargin
  }

  /** Community well-connectedness screen over the LPA assignment
    * (x331): per community, intra-community edges, each member's
    * intra-community degree (absent → 0), min over members, and the
    * γ=1 pass/fail — mirroring Graph.communityConnectedness
    * paren-for-paren (n=1 exempt from min-degree, n≤2 exempt from
    * the edge-count floor). */
  /** The screen's CTE tail + final select over assignment table
    * `$asg` (node, lab); assumes `canon` in scope. `gamma` is the
    * density floor (x334 screens the repaired output at 0.5, inside
    * the repair's γ ≤ 2/3 connectedness guarantee). */
  private def connectednessTail(asg: String, gamma: Double = 1.0)
      : String =
    s"""ie AS (SELECT la.lab AS c, cn.a, cn.b
       |  FROM canon cn JOIN $asg la ON cn.a = la.node
       |  JOIN $asg lb ON cn.b = lb.node
       |  WHERE la.lab = lb.lab),
       |idg AS (SELECT n AS node, c, COUNT(*) AS idv FROM (
       |    SELECT a AS n, c FROM ie UNION ALL SELECT b AS n, c FROM ie)
       |  GROUP BY 1, 2),
       |perc AS (SELECT l.lab AS c, COUNT(*) AS n_nodes,
       |    MIN(COALESCE(idg.idv, 0)) AS mind
       |  FROM $asg l LEFT JOIN idg
       |    ON l.node = idg.node AND l.lab = idg.c
       |  GROUP BY 1),
       |iec AS (SELECT c, COUNT(*) AS ie_n FROM ie GROUP BY 1)
       |SELECT perc.c AS community, CAST(perc.n_nodes AS BIGINT) AS n_nodes,
       |  CAST(COALESCE(iec.ie_n, 0) AS BIGINT) AS internal_edges,
       |  CAST(perc.mind AS BIGINT) AS min_internal_degree,
       |  CAST(CASE WHEN (perc.n_nodes = 1 OR perc.mind >= 1)
       |    AND (perc.n_nodes <= 2
       |      OR CAST(COALESCE(iec.ie_n, 0) AS DOUBLE)
       |        >= ${gamma}e0 * CAST(perc.n_nodes AS DOUBLE))
       |    THEN 1 ELSE 0 END AS INT) AS well_connected
       |FROM perc LEFT JOIN iec ON perc.c = iec.c
       |ORDER BY community""".stripMargin

  private def connectednessSql(rounds: Int): String =
    s"""WITH ${labelPropCtes(rounds)},
       |canon AS (SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
       |  FROM e0 WHERE x <> y),
       |${connectednessTail(s"l$rounds")}""".stripMargin

  /** Full two-phase Louvain over the LPA seed (x330): `sweeps`
    * unweighted node-local sweeps (the x327 generator), then the
    * aggregation — super edges = inter-community edge counts, self
    * weights = intra counts, super degrees = COALESCE'd weighted
    * degree + 2·self — then `sweeps` WEIGHTED sweeps over the
    * super-graph (same [[wSweepCte]] generator, SUM(w) votes), then
    * the projection and the x327 summary. Mirrors Graph.louvain
    * paren-for-paren; all-long arithmetic throughout. */
  /** Everything through the projected final assignment `lvfin` —
    * shared by [[louvainSql]] (summary tail) and the x332 screen. */
  private def louvainCtes(rounds: Int, sweeps: Int): String = {
    def l0(i: Int): String = {
      val prev = if (i == 1) s"l$rounds" else s"r${i - 1}asg"
      wSweepCte(s"r$i", prev, "we", "wdeg")
    }
    def l1(i: Int): String = {
      val prev = if (i == 1) "s0" else s"s${i - 1}asg"
      wSweepCte(s"s$i", prev, "sedge", "sdeg")
    }
    val lvl0 = s"r${sweeps}asg"
    val sfin = s"s${sweeps}asg"
    s"""${labelPropCtes(rounds)},
       |canon AS (SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
       |  FROM e0 WHERE x <> y),
       |mm AS (SELECT COUNT(*) AS m FROM canon),
       |dg AS (SELECT n AS node, COUNT(*) AS d FROM (
       |    SELECT a AS n FROM canon UNION ALL SELECT b FROM canon)
       |  GROUP BY 1),
       |$level0WeightCtes,
       |${(1 to sweeps).map(l0).mkString(",\n")},
       |snodes AS (SELECT DISTINCT lab AS node FROM $lvl0),
       |sedge0 AS (SELECT least(la.lab, lb.lab) AS a,
       |    greatest(la.lab, lb.lab) AS b, COUNT(*) AS w
       |  FROM canon cn JOIN $lvl0 la ON cn.a = la.node
       |  JOIN $lvl0 lb ON cn.b = lb.node
       |  WHERE la.lab <> lb.lab GROUP BY 1, 2),
       |sedge AS MATERIALIZED (SELECT a AS src, b AS dst, w FROM sedge0
       |  UNION ALL SELECT b AS src, a AS dst, w FROM sedge0),
       |sself AS (SELECT la.lab AS node, COUNT(*) AS sw
       |  FROM canon cn JOIN $lvl0 la ON cn.a = la.node
       |  JOIN $lvl0 lb ON cn.b = lb.node
       |  WHERE la.lab = lb.lab GROUP BY 1),
       |sdeg AS MATERIALIZED (SELECT n.node,
       |    COALESCE(dd.kw, 0) + 2 * COALESCE(ss.sw, 0) AS k
       |  FROM snodes n
       |  LEFT JOIN (SELECT src AS node, SUM(w) AS kw FROM sedge
       |    GROUP BY 1) dd ON dd.node = n.node
       |  LEFT JOIN sself ss ON ss.node = n.node),
       |s0 AS (SELECT node, node AS lab FROM snodes),
       |${(1 to sweeps).map(l1).mkString(",\n")},
       |lvfin AS MATERIALIZED (SELECT l.node, s.lab
       |  FROM $lvl0 l JOIN $sfin s ON l.lab = s.node)""".stripMargin
  }

  private def louvainSql(rounds: Int, sweeps: Int): String =
    s"""WITH ${louvainCtes(rounds, sweeps)},
       |${qTotalCtes("qb", s"l$rounds", digits = 8)},
       |${qTotalCtes("qa", "lvfin", digits = 8)},
       |mv AS (SELECT CAST(SUM(CASE WHEN f.lab <> p.lab THEN 1 ELSE 0
       |    END) AS BIGINT) AS n_moved
       |  FROM l$rounds p JOIN lvfin f ON p.node = f.node)
       |SELECT qbq.q AS q_before,
       |  CAST(qbq.nc AS BIGINT) AS n_communities_before,
       |  CAST((SELECT m FROM mm) AS BIGINT) AS m_edges,
       |  qaq.q AS q_after,
       |  CAST(qaq.nc AS BIGINT) AS n_communities_after,
       |  CAST(qaq.qn - qbq.qn AS BIGINT) AS q_gain_4m2,
       |  mv.n_moved
       |FROM qbq CROSS JOIN qaq CROSS JOIN mv""".stripMargin

  /** Connectedness screen over the LOUVAIN output (x332): the
    * guard→optimizer→guard loop — same tail as x331, assignment =
    * the two-phase final. */
  private def louvainConnectednessSql(rounds: Int, sweeps: Int): String =
    s"""WITH ${louvainCtes(rounds, sweeps)},
       |${connectednessTail("lvfin")}""".stripMargin

  /** The Leiden REPAIR as CTEs over assignment `$asg` (node, lab) —
    * mirrors Graph.repairCommunities: intra-community edges, a
    * recursive transitive closure (the x60 reach pattern — bounded
    * within communities, so the closure is Σ n_part² rows), each
    * node's component rep = MIN reachable node, and the relabel
    * `lab#rep` ONLY where a community actually split. Assumes
    * `canon` in scope; exposes `repasg` (node, lab). The iterative
    * Spark pointer-jump loop and this closure agree exactly because
    * the component minimum is order-independent. */
  private def repairCtes(asg: String): String =
    s"""ria AS (SELECT cn.a, cn.b
       |  FROM canon cn JOIN $asg la ON cn.a = la.node
       |  JOIN $asg lb ON cn.b = lb.node
       |  WHERE la.lab = lb.lab),
       |risym AS MATERIALIZED (SELECT a AS s, b AS d FROM ria
       |  UNION ALL SELECT b AS s, a AS d FROM ria),
       |rreach(node, r) AS (
       |  SELECT node, node FROM $asg
       |  UNION
       |  SELECT rreach.node, e.d FROM rreach
       |  JOIN risym e ON e.s = rreach.r),
       |rcomp AS MATERIALIZED (SELECT node, MIN(r) AS rep
       |  FROM rreach GROUP BY 1),
       |rparts AS (SELECT la.lab AS c, COUNT(DISTINCT rc.rep) AS np
       |  FROM $asg la JOIN rcomp rc ON la.node = rc.node GROUP BY 1),
       |repasg AS MATERIALIZED (SELECT la.node,
       |    CASE WHEN rp.np = 1 THEN la.lab
       |      ELSE la.lab || '#' || rc.rep END AS lab
       |  FROM $asg la JOIN rcomp rc ON la.node = rc.node
       |  JOIN rparts rp ON rp.c = la.lab)""".stripMargin

  /** Leiden repair over the louvain output (x333), graded
    * before/after with the x327 summary tail: q_gain_4m2 ≥ 0 is a
    * THEOREM for this pass (splitting a disconnected community
    * preserves every internal edge and strictly shrinks ΣD²). */
  private def repairSql(rounds: Int, sweeps: Int): String =
    s"""WITH RECURSIVE ${louvainCtes(rounds, sweeps)},
       |${repairCtes("lvfin")},
       |${qTotalCtes("qb", "lvfin", digits = 8)},
       |${qTotalCtes("qa", "repasg", digits = 8)},
       |mv AS (SELECT CAST(SUM(CASE WHEN f.lab <> p.lab THEN 1 ELSE 0
       |    END) AS BIGINT) AS n_moved
       |  FROM lvfin p JOIN repasg f ON p.node = f.node)
       |SELECT qbq.q AS q_before,
       |  CAST(qbq.nc AS BIGINT) AS n_communities_before,
       |  CAST((SELECT m FROM mm) AS BIGINT) AS m_edges,
       |  qaq.q AS q_after,
       |  CAST(qaq.nc AS BIGINT) AS n_communities_after,
       |  CAST(qaq.qn - qbq.qn AS BIGINT) AS q_gain_4m2,
       |  mv.n_moved
       |FROM qbq CROSS JOIN qaq CROSS JOIN mv""".stripMargin

  /** Connectedness screen at γ=0.5 over the REPAIRED louvain output
    * (x334): every row must read well_connected = 1 — the repair's
    * γ ≤ 2/3 guarantee, exercised at the driver's oracle. */
  private def repairConnectednessSql(rounds: Int, sweeps: Int): String =
    s"""WITH RECURSIVE ${louvainCtes(rounds, sweeps)},
       |${repairCtes("lvfin")},
       |${connectednessTail("repasg", gamma = 0.5)}""".stripMargin

  /** Weighted per-assignment modularity-total CTEs (the
    * [[qTotalCtes]] twin over the weighted graph): assumes
    * `wc` (a, b, w), `wdeg` (node, k) and `mm` (m = ΣW) in scope. */
  private def wqTotalCtes(p: String, asg: String, digits: Int): String =
    s"""${p}intra AS (SELECT la.lab AS c, SUM(cn.w) AS l
       |  FROM wc cn JOIN $asg la ON cn.a = la.node
       |  JOIN $asg lb ON cn.b = lb.node
       |  WHERE la.lab = lb.lab GROUP BY 1),
       |${p}degc AS (SELECT l.lab AS c, SUM(COALESCE(kk.k, 0)) AS dc
       |  FROM $asg l LEFT JOIN wdeg kk ON l.node = kk.node GROUP BY 1),
       |${p}perc AS (SELECT degc.c,
       |    CAST(ROUND(CAST(CASE WHEN (SELECT m FROM mm) > 0 THEN
       |      CAST(COALESCE(i.l, 0) AS DOUBLE)
       |        / CAST((SELECT m FROM mm) AS DOUBLE)
       |      - (CAST(degc.dc AS DOUBLE)
       |          / (2.0e0 * CAST((SELECT m FROM mm) AS DOUBLE)))
       |        * (CAST(degc.dc AS DOUBLE)
       |          / (2.0e0 * CAST((SELECT m FROM mm) AS DOUBLE)))
       |      ELSE 0.0e0 END AS DECIMAL(18,8)), $digits) AS DOUBLE) AS qc,
       |    4 * (SELECT m FROM mm) * COALESCE(i.l, 0)
       |      - degc.dc * degc.dc AS qnc
       |  FROM ${p}degc degc LEFT JOIN ${p}intra i ON degc.c = i.c),
       |${p}q AS (SELECT CAST(ROUND(CAST(SUM(qc) AS DECIMAL(18,8)),
       |      $digits) AS DOUBLE) AS q, COUNT(*) AS nc,
       |    SUM(qnc) AS qn FROM ${p}perc)""".stripMargin

  /** WEIGHTED two-phase Louvain over the LPA seed with the
    * co-purchase pair count as the edge weight (x335): mirrors
    * Graph.weightedLouvain paren-for-paren — SUM(w) votes at level 0
    * (e0 carries the pair count n), weighted aggregation (super-edge
    * weights/self-loops are weight SUMS; ΣW preserved), the same
    * [[wSweepCte]] engine at both levels, and the weighted
    * modularity grade Q = Σ[W_c/W − (S_c/2W)²]. */
  private def weightedLouvainSql(rounds: Int, sweeps: Int): String = {
    def l0(i: Int): String = {
      val prev = if (i == 1) s"l$rounds" else s"r${i - 1}asg"
      wSweepCte(s"r$i", prev, "we", "wdeg")
    }
    def l1(i: Int): String = {
      val prev = if (i == 1) "s0" else s"s${i - 1}asg"
      wSweepCte(s"s$i", prev, "sedge", "sdeg")
    }
    val lvl0 = s"r${sweeps}asg"
    val sfin = s"s${sweeps}asg"
    s"""WITH ${labelPropCtes(rounds)},
       |wc AS (SELECT x AS a, y AS b, n AS w FROM e0 WHERE x <> y),
       |mm AS (SELECT SUM(w) AS m FROM wc),
       |we AS MATERIALIZED (SELECT a AS src, b AS dst, w FROM wc
       |  UNION ALL SELECT b AS src, a AS dst, w FROM wc),
       |wdeg AS (SELECT nd.node, COALESCE(s.k, 0) AS k FROM nodes nd
       |  LEFT JOIN (SELECT src AS node, SUM(w) AS k FROM we
       |    GROUP BY 1) s ON s.node = nd.node),
       |${(1 to sweeps).map(l0).mkString(",\n")},
       |snodes AS (SELECT DISTINCT lab AS node FROM $lvl0),
       |sedge0 AS (SELECT least(la.lab, lb.lab) AS a,
       |    greatest(la.lab, lb.lab) AS b, SUM(cn.w) AS w
       |  FROM wc cn JOIN $lvl0 la ON cn.a = la.node
       |  JOIN $lvl0 lb ON cn.b = lb.node
       |  WHERE la.lab <> lb.lab GROUP BY 1, 2),
       |sedge AS MATERIALIZED (SELECT a AS src, b AS dst, w FROM sedge0
       |  UNION ALL SELECT b AS src, a AS dst, w FROM sedge0),
       |sself AS (SELECT la.lab AS node, SUM(cn.w) AS sw
       |  FROM wc cn JOIN $lvl0 la ON cn.a = la.node
       |  JOIN $lvl0 lb ON cn.b = lb.node
       |  WHERE la.lab = lb.lab GROUP BY 1),
       |sdeg AS MATERIALIZED (SELECT n.node,
       |    COALESCE(dd.kw, 0) + 2 * COALESCE(ss.sw, 0) AS k
       |  FROM snodes n
       |  LEFT JOIN (SELECT src AS node, SUM(w) AS kw FROM sedge
       |    GROUP BY 1) dd ON dd.node = n.node
       |  LEFT JOIN sself ss ON ss.node = n.node),
       |s0 AS (SELECT node, node AS lab FROM snodes),
       |${(1 to sweeps).map(l1).mkString(",\n")},
       |lvfin AS MATERIALIZED (SELECT l.node, s.lab
       |  FROM $lvl0 l JOIN $sfin s ON l.lab = s.node),
       |${wqTotalCtes("qb", s"l$rounds", digits = 8)},
       |${wqTotalCtes("qa", "lvfin", digits = 8)},
       |mv AS (SELECT CAST(SUM(CASE WHEN f.lab <> p.lab THEN 1 ELSE 0
       |    END) AS BIGINT) AS n_moved
       |  FROM l$rounds p JOIN lvfin f ON p.node = f.node)
       |SELECT qbq.q AS q_before,
       |  CAST(qbq.nc AS BIGINT) AS n_communities_before,
       |  CAST((SELECT m FROM mm) AS BIGINT) AS m_weight,
       |  qaq.q AS q_after,
       |  CAST(qaq.nc AS BIGINT) AS n_communities_after,
       |  CAST(qaq.qn - qbq.qn AS BIGINT) AS q_gain_4m2,
       |  mv.n_moved
       |FROM qbq CROSS JOIN qaq CROSS JOIN mv""".stripMargin
  }

  /** BM25 over documents (x326): per-doc HOF token counts, one stats
    * row, idf ln pinned at 8 dp, per-term contributions rounded at
    * 8 dp before the exact decimal row-sum — mirroring
    * TextAnalysis.bm25TopDocs paren-for-paren. Scala-printed float
    * literals for k1+1 / 1−b so both engines multiply identical
    * doubles. */
  private def bm25Sql(terms: Seq[String], k1: Double, b: Double,
      topK: Int): String = {
    val k1p1 = (k1 + 1.0).toString + "e0"
    val oneMb = (1.0 - b).toString + "e0"
    val k1s = k1.toString + "e0"
    val bs = b.toString + "e0"
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(w, x -> x = '$t')) AS tf$i"
    }.mkString(",\n|    ")
    val dfCols = terms.indices.map(i =>
      s"SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i")
      .mkString(",\n|    ")
    val contribs = terms.indices.map { i =>
      s"""(CASE WHEN tf$i > 0 THEN ROUND(CAST(
         |      CAST(ROUND(CAST(LN(1.0e0
         |          + (CAST(n AS DOUBLE) - CAST(df$i AS DOUBLE) + 0.5e0)
         |            / (CAST(df$i AS DOUBLE) + 0.5e0))
         |        AS DECIMAL(18,8)), 8) AS DOUBLE)
         |      * (CAST(tf$i AS DOUBLE) * $k1p1)
         |      / (CAST(tf$i AS DOUBLE) + $k1s * ($oneMb
         |          + $bs * CAST(dl AS DOUBLE)
         |            / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE))))
         |    AS DECIMAL(18,8)), 8)
         |    ELSE CAST(0 AS DECIMAL(18,8)) END)""".stripMargin
    }.mkString("\n|    + ")
    val matched = terms.indices.map(i =>
      s"(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH d AS (SELECT doc_id,
       |    list_filter(string_split(text, ' '), t -> t <> '') AS w
       |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
       |pd AS (SELECT doc_id, len(w) AS dl,
       |    $tfCols
       |  FROM d),
       |st AS (SELECT COUNT(*) AS n, SUM(dl) AS sdl,
       |    $dfCols
       |  FROM pd),
       |sc AS (SELECT doc_id, CAST(dl AS BIGINT) AS doc_len,
       |    CAST($matched AS INT) AS n_matched,
       |    $contribs AS s
       |  FROM pd CROSS JOIN st)
       |SELECT doc_id, doc_len, n_matched,
       |  CAST(ROUND(CAST(s AS DECIMAL(18,8)), 6) AS DOUBLE) AS bm25
       |FROM sc WHERE n_matched > 0
       |ORDER BY bm25 DESC, doc_id LIMIT $topK""".stripMargin
  }

  /** Query-table BM25 (x328): the inverted form — postings built by
    * unnest+count, query terms deduped per query, absent terms
    * dropped, per-(query, doc) 8-dp round-then-add over the matched
    * postings, per-query top-k by (bm25 desc, doc_id) — mirroring
    * TextAnalysis.bm25TopDocsForQueries paren-for-paren (identical
    * float chain to [[bm25Sql]], Scala-printed k1/b literals). */
  /** The corpus side of the query-table BM25 chain (tokenized docs,
    * lengths, postings, 1-row stats) — shared by x328/x329 and the
    * x336 decontamination pipeline. */
  private def bm25CorpusCtes: String =
    """d AS (SELECT doc_id,
      |    list_filter(string_split(text, ' '), t -> t <> '') AS w
      |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
      |pd AS (SELECT doc_id, len(w) AS dl FROM d),
      |post AS (SELECT doc_id, t AS term, COUNT(*) AS tf FROM (
      |    SELECT doc_id, unnest(w) AS t FROM d) GROUP BY 1, 2),
      |st AS (SELECT COUNT(*) AS n, SUM(dl) AS sdl FROM pd)"""
      .stripMargin

  /** The scoring + ranking side: per-query distinct terms, df,
    * matched postings, 8-dp round-then-add BM25, rank. Assumes
    * [[bm25CorpusCtes]] and a CTE `q(qid, qtext)` in scope. */
  private def bm25ScoreCtes(k1: Double, b: Double, topK: Int): String = {
    val k1p1 = (k1 + 1.0).toString + "e0"
    val oneMb = (1.0 - b).toString + "e0"
    val k1s = k1.toString + "e0"
    val bs = b.toString + "e0"
    s"""qt AS (SELECT DISTINCT qid, t AS term FROM (
       |    SELECT qid, unnest(list_filter(string_split(qtext, ' '),
       |      x -> x <> '')) AS t FROM q)),
       |dft AS (SELECT term, COUNT(*) AS df FROM post GROUP BY 1),
       |mt AS (SELECT qt.qid, post.doc_id, post.tf, dft.df, pd.dl
       |  FROM qt JOIN dft USING (term) JOIN post USING (term)
       |  JOIN pd USING (doc_id)),
       |sc AS (SELECT CAST(qid AS BIGINT) AS query_id, doc_id,
       |    CAST(MAX(dl) AS BIGINT) AS doc_len,
       |    CAST(COUNT(*) AS INT) AS n_matched,
       |    CAST(ROUND(CAST(SUM(ROUND(CAST(
       |      CAST(ROUND(CAST(LN(1.0e0
       |          + (CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5e0)
       |            / (CAST(df AS DOUBLE) + 0.5e0))
       |        AS DECIMAL(18,8)), 8) AS DOUBLE)
       |      * (CAST(tf AS DOUBLE) * $k1p1)
       |      / (CAST(tf AS DOUBLE) + $k1s * ($oneMb
       |          + $bs * CAST(dl AS DOUBLE)
       |            / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE))))
       |      AS DECIMAL(18,8)), 8)) AS DECIMAL(18,8)), 6)
       |      AS DOUBLE) AS bm25
       |  FROM mt CROSS JOIN st GROUP BY 1, 2),
       |rk AS (SELECT sc.*, row_number() OVER (PARTITION BY query_id
       |    ORDER BY bm25 DESC, doc_id) AS rn FROM sc),
       |cand AS (SELECT query_id, doc_id, doc_len, n_matched, bm25
       |  FROM rk WHERE rn <= $topK)""".stripMargin
  }

  private def bm25QueryTableSql(queries: Seq[(Long, String)],
      k1: Double, b: Double, topK: Int): String = {
    val vals = queries.map { case (id, t) => s"($id, '$t')" }
      .mkString(", ")
    s"""WITH $bm25CorpusCtes,
       |q(qid, qtext) AS (VALUES $vals),
       |${bm25ScoreCtes(k1, b, topK)}
       |SELECT query_id, doc_id, doc_len, n_matched, bm25
       |FROM cand ORDER BY query_id, bm25 DESC, doc_id""".stripMargin
  }

  /** End-to-end decontamination (x336): derived prompt table →
    * query-table BM25 top-k retrieve → per-pair n-gram containment
    * verify on the candidates → flagged list — mirroring
    * TextAnalysis.decontaminate paren-for-paren (the x328 scoring
    * chain + the x65 shingle twin). */
  private def decontamPipelineSql(promptMod: Int, promptChars: Int,
      n: Int, topK: Int, minFrac: Double): String =
    s"""WITH $bm25CorpusCtes,
       |q AS (SELECT doc_id AS qid, substr(text, 1, $promptChars)
       |    AS qtext
       |  FROM documents
       |  WHERE doc_id % $promptMod = 0 AND text IS NOT NULL),
       |${bm25ScoreCtes(1.2, 0.75, topK)},
       |${shingleCteFor("qsh", "q", "qid", "qtext", n)},
       |${shingleCteFor("dsh", "documents", "doc_id", "text", n)},
       |qsz AS (SELECT doc AS qid, COUNT(*) AS qn FROM qsh GROUP BY 1),
       |ph AS (SELECT c.query_id, c.doc_id, COUNT(*) AS ngram_hits
       |  FROM cand c
       |  JOIN qsh ON qsh.doc = c.query_id
       |  JOIN dsh ON dsh.doc = c.doc_id AND dsh.h = qsh.h
       |  GROUP BY 1, 2)
       |SELECT c.query_id, c.doc_id, c.bm25,
       |  CAST(COALESCE(ph.ngram_hits, 0) AS BIGINT) AS ngram_hits,
       |  ROUND(CAST(COALESCE(ph.ngram_hits, 0) AS DOUBLE)
       |    / CAST(qsz.qn AS DOUBLE), 4) AS ngram_frac
       |FROM cand c
       |LEFT JOIN ph ON ph.query_id = c.query_id
       |  AND ph.doc_id = c.doc_id
       |JOIN qsz ON qsz.qid = c.query_id
       |WHERE ROUND(CAST(COALESCE(ph.ngram_hits, 0) AS DOUBLE)
       |    / CAST(qsz.qn AS DOUBLE), 4) >= $minFrac
       |ORDER BY c.query_id, c.doc_id""".stripMargin

  private def hitsSql(iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      s"""${hitsHalf(s"ca$k", s"h${k - 1}", "src", "dst", s"a$k")},
         |${hitsHalf(s"ch$k", s"a$k", "dst", "src", s"h$k")}""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (SELECT DISTINCT
       |    'p' || CAST(l_partkey AS VARCHAR) AS src,
       |    's' || CAST(l_suppkey AS VARCHAR) AS dst
       |  FROM lineitem
       |  WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL),
       |nodes AS MATERIALIZED (SELECT src AS node FROM e UNION
       |  SELECT dst FROM e),
       |h0 AS MATERIALIZED (SELECT node,
       |  ROUND(1.0e0 / (SELECT COUNT(*) FROM nodes), 9) AS s
       |  FROM nodes),
       |$rounds
       |SELECT nd.node,
       |  CAST(ROUND(CAST(coalesce(h.s, 0.0e0) AS DECIMAL(18,8)), 6)
       |    AS DOUBLE) AS hub,
       |  CAST(ROUND(CAST(coalesce(a.s, 0.0e0) AS DECIMAL(18,8)), 6)
       |    AS DOUBLE) AS authority
       |FROM nodes nd
       |LEFT JOIN h$iters h ON nd.node = h.node
       |LEFT JOIN a$iters a ON nd.node = a.node
       |ORDER BY nd.node""".stripMargin
  }

  /** One rating per (item, rater-slot) from lineitem: item = order,
    * rater = line number, label = return flag (x282/x283/x286). */
  private def annRatingsCte: String =
    """rr AS (SELECT CAST(l_orderkey AS VARCHAR) AS i,
      |  CAST(l_linenumber AS VARCHAR) AS r, MIN(l_returnflag) AS l
      |  FROM lineitem GROUP BY 1, 2)""".stripMargin

  /** Derived pairwise-preference comparisons (x284/x285): within each
    * order, line pairs (ln1 < ln2) between distinct pseudo-entities
    * (supplier mod 25); higher extended price wins, ties to the lower
    * entity id. */
  private def prefCmpCte: String =
    """li AS (SELECT l_orderkey, l_linenumber AS ln,
      |  l_suppkey % 25 AS ent, l_extendedprice AS pr FROM lineitem),
      |cmp AS (SELECT a.ent AS ea, b.ent AS eb,
      |  (a.pr > b.pr OR (a.pr = b.pr AND a.ent < b.ent)) AS awon
      |  FROM li a JOIN li b
      |    ON a.l_orderkey = b.l_orderkey AND a.ln < b.ln
      |  WHERE a.ent <> b.ent)""".stripMargin

  /** One Bradley-Terry MM round: denom_i = sum_j n_ij/(p_i+p_j), raw_i
    * = w_i/denom_i (0 for never-winners), normalized and quantized to
    * 9 decimals — bit-matching Annotation.bradleyTerry's round. */
  private def btStep(prev: String): String =
    s"""SELECT e, ROUND(raw / SUM(raw) OVER (), 9) AS p FROM (
       |  SELECT en.e, CASE WHEN en.w = 0 OR d.den <= 0.0e0 THEN 0.0e0
       |    ELSE CAST(en.w AS DOUBLE) / d.den END AS raw
       |  FROM en JOIN (
       |    SELECT pp.e AS e, SUM(CAST(pp.n AS DOUBLE) / (pi.p + pj.p))
       |      AS den
       |    FROM pp JOIN $prev pi ON pp.e = pi.e
       |    JOIN $prev pj ON pp.o = pj.e
       |    GROUP BY 1) d ON en.e = d.e)""".stripMargin

  private def btSql(iters: Int): String = {
    // MATERIALIZED throughout: every step references its predecessor
    // twice (pi/pj) — inlined, the chain re-evaluates exponentially
    val steps = (1 to iters).map { k =>
      s"p$k AS MATERIALIZED (${btStep(s"p${k - 1}")})"
    }.mkString(",\n")
    s"""WITH $prefCmpCte,
       |dv AS MATERIALIZED (SELECT CAST(ea AS VARCHAR) AS e,
       |    CAST(eb AS VARCHAR)
       |    AS o, CASE WHEN awon THEN 1 ELSE 0 END AS win FROM cmp
       |  UNION ALL
       |  SELECT CAST(eb AS VARCHAR), CAST(ea AS VARCHAR),
       |    CASE WHEN awon THEN 0 ELSE 1 END FROM cmp),
       |en AS MATERIALIZED (SELECT e, SUM(win) AS w, COUNT(*) AS g
       |  FROM dv GROUP BY 1),
       |pp AS MATERIALIZED (SELECT e, o, COUNT(*) AS n FROM dv
       |  GROUP BY 1, 2),
       |p0 AS MATERIALIZED (SELECT e,
       |    ROUND(1.0e0 / (SELECT COUNT(*) FROM en), 9)
       |    AS p FROM en),
       |$steps,
       |f AS (SELECT en.e, en.w, en.g,
       |  CAST(ROUND(CAST(p AS DECIMAL(18,8)), 6) AS DOUBLE) AS st
       |  FROM en JOIN p$iters ON en.e = p$iters.e)
       |SELECT e AS entity, CAST(w AS BIGINT) AS wins,
       |  CAST(g AS BIGINT) AS games, st AS strength,
       |  row_number() OVER (ORDER BY st DESC, e) AS rank
       |FROM f ORDER BY rank""".stripMargin
  }

  private def kmeansUpdate(a: String, prev: String): String =
    s"""SELECT $prev.cidx, COALESCE(u.c, $prev.c) AS c FROM $prev LEFT JOIN (
       |  SELECT cidx, list(m ORDER BY pos) AS c FROM (
       |    SELECT cidx, pos, ROUND(AVG(x), 6) AS m FROM (
       |      SELECT cidx, generate_subscripts(v, 1) AS pos, unnest(v) AS x
       |      FROM $a) GROUP BY cidx, pos) GROUP BY cidx) u USING (cidx)""".stripMargin
}
