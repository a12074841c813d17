package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pandas-parity units for the relational semantic traps: label-encode
  * order (O13), pivot-mean (O25), update-only-non-null (O26), melt
  * chunking (O16), projectExcept (O12). FIXTURES.md §3.
  */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("labelEncode: codes follow lexicographic sorted-distinct order (pandas category order)") {
    val df = Seq("b", "a", "B", "10", "2", "a", null).toDF("v")
    val out = Relational.labelEncode(df, "v")
      .as[(String, Long)].collect().toMap
    // sorted distinct: "10" < "2" < "B" < "a" < "b" (ASCII)
    assert(out == Map("10" -> 0L, "2" -> 1L, "B" -> 2L, "a" -> 3L, "b" -> 4L))
  }

  test("labelEncode scalable path == window form, no vocabulary-wide window, no RDD scan") {
    // a wider-than-toy vocabulary spread over many partitions
    val df = spark.range(0, 5000).selectExpr("concat('id_', pmod(id * 37, 1931)) as v")
      .repartition(16)
    val fast = Relational.labelEncode(df, "v").as[(String, Long)].collect().toMap
    val spec = Relational.labelEncodeWindow(df, "v").as[(String, Long)].collect().toMap
    assert(fast == spec, "chunked-rank codes must equal the window-rank codes")
    assert(fast.size == 1931)
    // r15 (chunkedRank migration): every Window in the plan is the
    // bounded chunk-summary machinery — never the vocabulary itself.
    // (The plan's one RDD scan is Cut's materialization barrier — the
    // sanctioned partition-id freeze, shared with groupedExactQuantiles
    // — not a zipWithIndex row round-trip.)
    val plan = Relational.labelEncode(df, "v").queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.forall(_.contains("__rnk_c")),
      s"only chunk-summary Windows expected in:\n$plan")
  }

  test("chunkedRank: global 0-based ranks across chunk seams, ties stable, plan bounded") {
    // 100 values over 4 shuffle partitions: ranks must be exactly 0..99
    val df = spark.range(0, 100)
      .selectExpr("cast(pmod(id * 13, 100) as double) as v").repartition(7)
    val got = Relational.chunkedRank(df, Seq(col("v")), "rnk")
      .as[(Double, Long)].collect().sortBy(_._1)
    // v takes each of 0..99 exactly once, so rank(v) == v
    assert(got.forall { case (v, r) => v.toLong == r },
      s"ranks must equal sorted positions: ${got.take(10).toSeq}")
    assert(got.map(_._2).toSeq == (0L until 100L), "contiguous 0-based")
  }

  test("chunkedPrefixSum == running window sum across chunk boundaries, null groups, global") {
    import org.apache.spark.sql.expressions.Window
    val w24 = org.apache.spark.sql.types.DecimalType(24, 6)
    // two groups + a NULL group, 10 rows each, chunkRows=3 so every
    // group crosses chunk boundaries (the base+inner seam is exercised)
    val df = (0 until 30).map { i =>
      (if (i % 3 == 2) None else Some(s"g${i % 3}"), i.toLong,
        (i % 7 + 1).toDouble)
    }.toDF("g", "k", "v")
    val got = Relational.chunkedPrefixSum(df, Seq("g"), Seq(col("k")),
        "v", "cum", w24, numChunks = Some(7))
      .select(col("g"), col("k"), col("cum").cast("double"))
      .as[(Option[String], Long, Double)].collect().toSet
    val ref = df.withColumn("cum",
        sum(col("v").cast(w24)).over(Window.partitionBy("g").orderBy("k")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .select(col("g"), col("k"), col("cum"))
      .as[(Option[String], Long, Double)].collect().toSet
    assert(got == ref, s"got ${got.toSeq.sortBy(x => (x._1, x._2))}")
    // groupCols = Nil: one global scan in DESC order with key tiebreak
    val glob = Relational.chunkedPrefixSum(
        Seq(("a", 5.0), ("b", 5.0), ("c", 1.0)).toDF("key", "v"),
        Nil, Seq(col("v").desc, col("key")), "v", "cum", w24,
        numChunks = Some(2))
      .select(col("key"), col("cum").cast("double"))
      .as[(String, Double)].collect().toMap
    assert(glob == Map("a" -> 5.0, "b" -> 10.0, "c" -> 11.0), s"got $glob")
    // plan pin: every window in the scan is the chunk machinery —
    // partitioned or ordered by __pfx_c (bounded by construction),
    // never a bare per-group running sum over the data
    val plan = Relational.chunkedPrefixSum(df, Seq("g"), Seq(col("k")),
      "v", "cum", w24).queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("__pfx_c")),
      s"every Window must ride the chunk column:\n$plan")
  }

  test("pivotWide with mean agg: duplicate (key, col) cells average (pivot_table default)") {
    val df = Seq(
      ("i1", "F1", 2.0), ("i1", "F1", 4.0), // duplicate cell → mean 3.0
      ("i1", "F2", 5.0),
      ("i2", "F2", 7.0)).toDF("id", "day", "v")
    val out = Relational.pivotWide(df, "id", "day", Seq("F1", "F2"), avg(col("v")))
      .orderBy("id").collect()
    assert(out(0).getString(0) == "i1" && out(0).getDouble(1) == 3.0 && out(0).getDouble(2) == 5.0)
    assert(out(1).getString(0) == "i2" && out(1).isNullAt(1) && out(1).getDouble(2) == 7.0)
  }

  test("keyedUpdate: overwrites only matching keys with non-null values (pandas update)") {
    val base = Seq(("a", 1.0, 10.0), ("b", 2.0, 20.0), ("c", 3.0, 30.0)).toDF("id", "x", "y")
    val upd = Seq(("a", Some(9.0), None: Option[Double]), ("b", None, Some(99.0)))
      .toDF("id", "x", "y")
    val out = Relational.keyedUpdate(base, upd, "id").orderBy("id")
      .as[(String, Double, Double)].collect()
    assert(out(0) == ("a", 9.0, 10.0))  // x updated, y stays (null update ignored)
    assert(out(1) == ("b", 2.0, 99.0))  // x stays, y updated
    assert(out(2) == ("c", 3.0, 30.0))  // no update row → untouched
  }

  test("melt: chunked unpivot equals unchunked, preserves all cells") {
    val wide = Seq((1, 10, 20, 30, 40, 50)).toDF("k", "d_1", "d_2", "d_3", "d_4", "d_5")
    val vals = Seq("d_1", "d_2", "d_3", "d_4", "d_5")
    val chunked = Relational.melt(wide, Seq("k"), vals, "d", "v", chunkSize = 2)
      .orderBy("d").as[(Int, String, Int)].collect()
    assert(chunked.toSeq == Seq((1, "d_1", 10), (1, "d_2", 20), (1, "d_3", 30),
      (1, "d_4", 40), (1, "d_5", 50)))
  }

  test("projectExcept: base cols + set difference, in df column order") {
    val df = Seq((1, "x", 2.0, true)).toDF("id", "name", "score", "flag")
    val out = Relational.projectExcept(df, Seq("id"), exclude = Set("name"))
    assert(out.columns.toSeq == Seq("id", "score", "flag"))
  }

  test("topKPerGroup and nthFromLastDistinct") {
    val df = Seq(("g1", 5), ("g1", 3), ("g1", 9), ("g1", 1), ("g2", 4), ("g2", 8))
      .toDF("g", "v")
    val top = Relational.topKPerGroup(df, Seq(col("g")), Seq(col("v").desc), 2)
      .select("g", "v").as[(String, Int)].collect().toSet
    assert(top == Set(("g1", 9), ("g1", 5), ("g2", 8), ("g2", 4)))
    val nth = Relational.nthFromLastDistinct(df.select(col("v")), "v", 2)
      .as[Int].collect().toSeq
    assert(nth == Seq(8)) // distinct desc: 9, 8, 5, 4, 3, 1 → 2nd = 8
    // fewer distinct values than n → empty (row_number-contract parity)
    val short = Relational.nthFromLastDistinct(df.select(col("v")), "v", 99)
      .as[Int].collect().toSeq
    assert(short.isEmpty, "n beyond the distinct count must yield no row")
    // and no partition-less window in the plan
    val plan = Relational.nthFromLastDistinct(df.select(col("v")), "v", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no WindowExec expected in:\n$plan")
  }

  test("iqrOutliers flags only the rows outside their own group's fences") {
    // group a: {10..14} tight cluster + 100 (way out); group b: all tight
    val df = (Seq((1L, "a", 10.0), (2L, "a", 11.0), (3L, "a", 12.0),
        (4L, "a", 13.0), (5L, "a", 14.0), (6L, "a", 100.0)) ++
      (10 to 15).map(i => (i.toLong, "b", 50.0 + (i % 3))))
      .toDF("id", "g", "v")
    val got = Relational.iqrOutliers(df, Seq("g"), "v")
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(6L), s"expected only the group-a extreme, got $got")
  }

  test("iqrOutliers screens the NULL group too (null-safe fence join)") {
    val df = (Seq((1L, Option.empty[String], 10.0), (2L, None, 11.0),
        (3L, None, 12.0), (4L, None, 13.0), (5L, None, 14.0),
        (6L, None, 500.0)) ++
      Seq((10L, Option("b"), 50.0), (11L, Option("b"), 51.0)))
      .toDF("id", "g", "v")
    val got = Relational.iqrOutliers(df, Seq("g"), "v")
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(6L), s"null-group outlier must be flagged, got $got")
  }

  test("histogram: equi-width buckets, max folds into last, degenerate and null inputs") {
    val df = (0 to 10).map(_.toDouble).toDF("v")
    // lo=0, hi=10, 2 buckets of width 5: [0,5) -> 0, [5,10] -> 1
    val got = Relational.histogram(df, col("v"), 2)
      .orderBy("bucket").as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 5L), (1L, 6L)), s"got $got")
    // min = max: everything in bucket 0 (no division by zero)
    val flat = Relational.histogram(Seq(7.0, 7.0, 7.0).toDF("v"), col("v"), 4)
      .as[(Long, Long)].collect().toSeq
    assert(flat == Seq((0L, 3L)), s"got $flat")
    // nulls excluded, not bucketed
    val withNull = Relational.histogram(
        Seq(Some(0.0), None, Some(10.0)).toDF("v"), col("v"), 2)
      .orderBy("bucket").as[(Long, Long)].collect().toSeq
    assert(withNull == Seq((0L, 1L), (1L, 1L)), s"got $withNull")
  }

  test("scd2: change-point collapse, validity chain, null-safe attrs, one exchange") {
    // key k1: a a b b a  -> intervals a[1,3) b[3,5) a[5,null)
    // key k2: null null x -> null[1,3) x[3,null)  (null attr collapses
    // null-safely instead of re-opening an interval per row)
    val df = Seq(
      ("k1", 1, Option("a")), ("k1", 2, Option("a")), ("k1", 3, Option("b")),
      ("k1", 4, Option("b")), ("k1", 5, Option("a")),
      ("k2", 1, None), ("k2", 2, None), ("k2", 3, Option("x")))
      .toDF("k", "seq", "attr")
    val got = Relational.scd2(df, Seq("k"), "seq", "seq", Seq("attr"))
      .orderBy("k", "valid_from")
      .collect().map(r => (r.getString(0), Option(r.get(1)).map(_.toString),
        r.getInt(2), Option(r.get(3)).map(_.toString), r.getBoolean(4)))
      .toSeq
    assert(got == Seq(
      ("k1", Some("a"), 1, Some("3"), false),
      ("k1", Some("b"), 3, Some("5"), false),
      ("k1", Some("a"), 5, None, true),
      ("k2", None, 1, Some("3"), false),
      ("k2", Some("x"), 3, None, true)), s"got $got")
    // both window passes share one (key, order) sort+exchange
    val plan = Relational.scd2(df, Seq("k"), "seq", "seq", Seq("attr"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"scd2 must plan ONE exchange, got $exchanges:\n$plan")
  }

  test("scd2 multi-attribute: a change in ANY tracked column opens an interval") {
    val df = Seq(
      ("k", 1, "a", 10), ("k", 2, "a", 10), // no change
      ("k", 3, "a", 20),                    // second attr changes
      ("k", 4, "b", 20),                    // first attr changes
      ("k", 5, "b", 20))                    // no change
      .toDF("k", "seq", "x", "y")
    val got = Relational.scd2(df, Seq("k"), "seq", "seq", Seq("x", "y"))
      .orderBy("valid_from")
      .collect().map(r => (r.getString(1), r.getInt(2), r.getInt(3),
        Option(r.get(4)).map(_.toString), r.getBoolean(5)))
      .toSeq
    assert(got == Seq(
      ("a", 10, 1, Some("3"), false),
      ("a", 20, 3, Some("4"), false),
      ("b", 20, 4, None, true)), s"got $got")
  }

  test("cdcApply: latest wins, a winning tombstone drops the key, ties break on the tiebreaker") {
    val log = Seq(
      // k1: insert then update — update wins
      ("k1", 1, 10, "U"), ("k1", 2, 20, "U"),
      // k2: update then delete — key disappears
      ("k2", 1, 5, "U"), ("k2", 2, 0, "D"),
      // k3: delete then a LATER re-insert — key lives
      ("k3", 1, 0, "D"), ("k3", 2, 7, "U"),
      // k4: same seq twice — higher tiebreaker (id column) wins
      ("k4", 1, 1, "U"), ("k4", 1, 2, "U"))
      .zipWithIndex.map { case ((k, s, v, op), i) => (k, s, v, op, i.toLong) }
      .toDF("k", "seq", "v", "op", "id")
    val got = Relational.cdcApply(log, Seq("k"), "seq", "id", "op", "D")
      .orderBy("k")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
      .toSeq
    assert(got == Seq(("k1", 2, 20), ("k3", 2, 7), ("k4", 1, 2)), s"got $got")
  }

  test("cdcApply: the rank-1 filter plans a WindowGroupLimit (map-side latest-row pushdown)") {
    // InferWindowGroupLimit deliberately skips LocalRelation inputs, so
    // pin the plan on an RDD-backed frame (what any real source is)
    val local = Seq(("k", 1, 1, "U")).toDF("k", "seq", "v", "op")
      .withColumn("id", lit(0L))
    val log = spark.createDataFrame(local.rdd, local.schema)
    val plan = Relational.cdcApply(log, Seq("k"), "seq", "id", "op", "D")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected the rank<=1 rewrite in:\n$plan")
  }

  test("winsorize: hand fences on 1..20, clip counts, and the clamped mean") {
    // quantile_cont on 1..20: p05 -> 1 + 0.05*19 = 1.95, p95 -> 19.05;
    // one value clips each side; clamped sum = 1.95 + (2..19) + 19.05
    // = 210 -> mean 10.5
    val df = (1 to 20).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val got = Relational.winsorize(df, Seq("grp"), "v")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
      .toSeq
    assert(got == Seq(("g", 20L, 1.95, 19.05, 1L, 1L, 10.5)), s"got $got")
  }

  test("winsorize: groups clamp against their OWN fences") {
    val df = ((1 to 10).map(i => ("a", i.toDouble)) ++
      (101 to 110).map(i => ("b", i.toDouble))).toDF("grp", "v")
    val got = Relational.winsorize(df, Seq("grp"), "v")
      .orderBy("grp")
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getDouble(3)))
      .toSeq
    // p05 of 1..10 = 1.45, p95 = 9.55; group b shifted by 100
    assert(got == Seq(("a", 1.45, 9.55), ("b", 101.45, 109.55)), s"got $got")
  }

  test("reconcile: added/removed/changed statuses with per-column attribution") {
    val before = Seq(
      (1L, 10, "x"), (2L, 20, "y"), (3L, 30, "z"), (5L, 50, "w"))
      .toDF("k", "n", "s")
    val after = Seq(
      (1L, 10, "x"),              // unchanged -> absent from the diff
      (2L, 21, "y"),              // one column changed
      (4L, 40, "new"),            // added
      (5L, 51, "W"))              // both columns changed
      .toDF("k", "n", "s")
    val got = Relational.reconcile(before, after, Seq("k"), Seq("n", "s"))
      .orderBy("k")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
      .toSeq
    assert(got == Seq(
      (2L, "changed", Some("n")),
      (3L, "removed", None),
      (4L, "added", None),
      (5L, "changed", Some("n,s"))), s"got $got")
  }

  test("targetEncode: hand LOO means; a singleton category degrades to the prior") {
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0), ("B", 10.0))
      .toDF("cat", "y")
    val got = Relational.targetEncode(df, "cat", "y", m = 10.0)
      .orderBy("cat", "y")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .toSeq
    // prior = 16/4 = 4; enc(A, y) = (6 - y + 40) / 12
    assert(got == Seq(
      ("A", 1.0, 3.75), ("A", 2.0, 3.666667), ("A", 3.0, 3.583333),
      // (10 - 10 + 40) / (0 + 10) = prior exactly, never NaN
      ("B", 10.0, 4.0)), s"got $got")
  }

  test("reconcile: null-to-value and value-to-null both count as changes") {
    val before = Seq((1L, Option(10)), (2L, Option.empty[Int]))
      .toDF("k", "n")
    val after = Seq((1L, Option.empty[Int]), (2L, Option(20)))
      .toDF("k", "n")
    val got = Relational.reconcile(before, after, Seq("k"), Seq("n"))
      .orderBy("k")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq
    assert(got == Seq((1L, "changed", "n"), (2L, "changed", "n")),
      s"got $got")
  }

  test("modePerGroup: deterministic ties (smallest value), null loses ties but can win outright") {
    import spark.implicits._
    val df = Seq(
      // g1: b×2, a×2 -> tie broken to "a"
      ("g1", Some("b")), ("g1", Some("b")), ("g1", Some("a")), ("g1", Some("a")),
      // g2: null×2, z×2 -> non-null wins the tie
      ("g2", None), ("g2", None), ("g2", Some("z")), ("g2", Some("z")),
      // g3: null×3, z×1 -> strictly-more-frequent null IS the mode
      ("g3", None), ("g3", None), ("g3", None), ("g3", Some("z"))
    ).toDF("g", "v")
    val got = Relational.modePerGroup(df, Seq("g"), "v")
      .orderBy("g")
      .as[(String, Option[String], Long, Double)].collect().toSeq
    assert(got == Seq(
      ("g1", Some("a"), 2L, 0.5),
      ("g2", Some("z"), 2L, 0.5),
      ("g3", None, 3L, 0.75)), s"got $got")
  }
}
