package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests (SURVEY §5.2.5): melt∘pivot round-trip, lag∘lead
  * identity on interior rows, union-all count preservation, rolling
  * mean bounds. Samples are drawn from scalacheck Gens under FIXED
  * seeds (deterministic runs; scalatestplus glue isn't in the offline
  * cache, so sampling is driven directly).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val smallInts = Gen.chooseNum(0, 50)

  test("property: melt then pivot(first) round-trips the wide table") {
    samples(Gen.listOfN(4, Gen.listOfN(3, smallInts)), 5).foreach { rows =>
      val wide = rows.zipWithIndex
        .map { case (vs, i) => (i.toLong, vs(0), vs(1), vs(2)) }
        .toDF("k", "d_1", "d_2", "d_3")
      val long = Relational.melt(wide, Seq("k"), Seq("d_1", "d_2", "d_3"), "d", "v")
      val back = Relational.pivotWide(long, "k", "d", Seq("d_1", "d_2", "d_3"),
        first(col("v")))
      val a = wide.orderBy("k").collect().map(_.toSeq).toSeq
      val b = back.orderBy("k").collect().map(_.toSeq).toSeq
      assert(a == b)
    }
  }

  test("property: lead(k) of lag(k) is identity on interior rows, null on edges") {
    samples(Gen.zip(Gen.chooseNum(1, 4), Gen.chooseNum(6, 15)), 5).foreach { case (k, n) =>
      val df = (1 to n).map(i => ("g", i, i * 10)).toDF("id", "t", "v")
      val out = TimeSeries.groupedLead(
          TimeSeries.groupedLag(df, Seq(col("id")), Seq(col("t")), "v", Seq(k)),
          Seq(col("id")), Seq(col("t")), s"lag_v_$k", Seq(k))
        .select(col("t"), col("v"), col(s"lead_lag_v_${k}_$k").as("rt"))
        .as[(Int, Int, Option[Int])].collect()
      out.foreach { case (t, v, rt) =>
        if (t <= n - k) assert(rt.contains(v), s"t=$t k=$k")
        else assert(rt.isEmpty, s"tail t=$t k=$k")
      }
    }
  }

  test("property: unionByName preserves row counts") {
    samples(Gen.zip(Gen.listOf(smallInts), Gen.listOf(smallInts)), 5).foreach { case (xs, ys) =>
      val a = xs.toDF("v")
      val b = ys.toDF("v")
      assert(a.unionByName(b).count() == xs.size + ys.size)
    }
  }

  test("property: rolling mean is bounded by group min/max and null before w rows") {
    samples(Gen.zip(Gen.chooseNum(2, 5), Gen.listOfN(12, Gen.chooseNum(-100, 100))), 5)
      .foreach { case (w, vs) =>
        val df = vs.zipWithIndex.map { case (v, i) => ("g", i, v.toDouble) }.toDF("id", "t", "v")
        val out = TimeSeries.rollingMeanMinPeriods(df, Seq(col("id")), Seq(col("t")), "v", Seq(w))
          .select(col("t"), col(s"rmean_v_$w")).as[(Int, Option[Double])].collect()
        val (mn, mx) = (vs.min.toDouble, vs.max.toDouble)
        out.foreach { case (t, r) =>
          if (t < w) assert(r.isEmpty, s"t=$t w=$w must be null")
          else r.foreach(m => assert(m >= mn && m <= mx))
        }
      }
  }

  test("property: chunkTokens covers every token in order; stride reconstructs the doc") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta")
    samples(Gen.zip(Gen.chooseNum(1, 150), Gen.chooseNum(2, 10), Gen.chooseNum(0, 1)), 8)
      .foreach { case (n, c, oFlag) =>
        val o = if (oFlag == 1) c / 2 else 0
        val toks = samples(Gen.listOfN(n, word), 1).head
        val df = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
        val chunks = TextAnalysis.chunkTokens(df, "doc_id", "text", c, o)
          .orderBy("chunk_id").select("chunk").as[String].collect()
        // dropping the first `o` tokens of every chunk but the first
        // reconstructs the document exactly
        val rebuilt = (chunks.head +: chunks.tail.map(
          _.split(" ").drop(o).mkString(" "))).filter(_.nonEmpty).mkString(" ")
        assert(rebuilt == toks.mkString(" "), s"n=$n c=$c o=$o")
        // every chunk except possibly the last is exactly c tokens
        chunks.init.foreach(ch => assert(ch.split(" ").length == c, s"n=$n c=$c o=$o"))
      }
  }

  test("property: croston closed form == the literal SES recursion on random sparse series") {
    val gen = Gen.zip(
      Gen.chooseNum(2, 12),                       // demand days
      Gen.listOfN(12, Gen.chooseNum(1, 9)),       // day gaps
      Gen.listOfN(12, Gen.chooseNum(1, 200)))     // demand sizes
    samples(gen, 8).foreach { case (n, gaps, sizes) =>
      val days = gaps.take(n).scanLeft(0)(_ + _).tail // strictly increasing
      val series = days.zip(sizes.take(n))
      val df = series.map { case (d, z) =>
        (1L, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(d)), z.toDouble)
      }.toDF("k", "day", "v")
      val got = Forecast.crostonForecast(df, "k", "day", "v").head()
      // literal recursion: s_1 = y_1; s_t = a*y_t + (1-a)*s_{t-1}
      def ses(ys: Seq[Double]): Double =
        ys.tail.foldLeft(ys.head)((s, y) => 0.5 * y + 0.5 * s)
      val zHat = ses(series.map(_._2.toDouble))
      val intervals = days.sliding(2).map(p => (p(1) - p(0)).toDouble).toSeq
      val aHat = ses(intervals)
      def r4(x: Double) = BigDecimal(x)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got.getDouble(2) == r4(zHat), s"z_hat: $got vs $zHat ($series)")
      assert(got.getDouble(3) == r4(aHat), s"a_hat: $got vs $aHat ($series)")
    }
  }

  test("property: gap-fill keeps observed rows verbatim and fills every calendar day") {
    val gen = Gen.zip(Gen.chooseNum(1, 3), Gen.listOfN(8, Gen.chooseNum(0, 30)))
    samples(gen, 6).foreach { case (nKeys, rawDays) =>
      val rows = for {
        k <- 1 to nKeys
        d <- rawDays.distinct
      } yield (k.toLong,
        java.sql.Date.valueOf(java.time.LocalDate.of(2024, 3, 1).plusDays(d)),
        (k * 100 + d).toDouble)
      val df = rows.toDF("k", "day", "v")
      val out = Forecast.gapFillForwardFill(df, "k", "day", "v")
        .collect().map(r => (r.getLong(0), r.getDate(1).toString,
          r.getDouble(2), r.getInt(3)))
      // observed rows come back verbatim, flagged 0
      val observed = rows.map(r => (r._1, r._2.toString, r._3, 0)).toSet
      assert(observed.subsetOf(out.toSet), "observed rows must pass through")
      // per key: one row per day in [min, max], no extras
      out.groupBy(_._1).foreach { case (_, ks) =>
        val ds = ks.map(_._2).sorted
        val span = java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.parse(ds.head), java.time.LocalDate.parse(ds.last)) + 1
        assert(ks.length == span && ds.distinct.length == ks.length)
      }
      // imputed rows carry the latest observed value before them
      out.filter(_._4 == 1).foreach { case (k, d, v, _) =>
        val prior = rows.filter(r => r._1 == k && r._2.toString <= d)
          .maxBy(_._2.toString)
        assert(v == prior._3, s"fill at ($k, $d) must carry ${prior._3}, got $v")
      }
    }
  }

  test("property: arbitrary rational probabilities agree with percentile (r13 probRational)") {
    // probabilities drawn as random small fractions num/den — including
    // thirds/sevenths the r12 thousandths contract rejected outright —
    // must match the float percentile aggregate to round tolerance
    val gen = Gen.zip(
      Gen.listOfN(25, Gen.chooseNum(-500.0, 500.0)),
      Gen.chooseNum(2, 9), Gen.chooseNum(1, 8))
    samples(gen, 8).foreach { case (vals, den, numRaw) =>
      val num = math.min(numRaw, den - 1)
      val p = num.toDouble / den
      val df = vals.map(v => ("g", v)).toDF("g", "v")
      val exact = Profiling
        .groupedExactQuantiles(df, Seq("g"), col("v"), Seq("q" -> p))
        .select(col("q").cast("double")).as[Double].collect()(0)
      val ref = df.agg(percentile(col("v"), lit(p))).as[Double].collect()(0)
      assert(math.abs(exact - ref) < 1e-4,
        s"p=$num/$den: exact $exact vs percentile $ref")
    }
  }

  test("property: groupedExactQuantiles agrees with Spark percentile on random data") {
    // the exact rank-arithmetic decimal path computes the SAME
    // quantile definition (linear interpolation at p·(n−1)) as the
    // float `percentile` aggregate — on random inputs they must agree
    // to the quantize/round tolerance (1e-6 inputs + 1e-6 output vs
    // float interpolation noise)
    val gen = Gen.listOfN(40, Gen.chooseNum(-1000.0, 1000.0))
    samples(gen, 6).zipWithIndex.foreach { case (vals, i) =>
      val df = vals.zipWithIndex.map { case (v, j) => (j % 2, v) }
        .toDF("g", "v")
      for (p <- Seq(0.25, 0.5, 0.9)) {
        val exact = Profiling
          .groupedExactQuantiles(df, Seq("g"), col("v"), Seq("q" -> p))
          .select(col("g"), col("q").cast("double"))
          .as[(Int, Double)].collect().toMap
        val ref = df.groupBy(col("g"))
          .agg(percentile(col("v"), lit(p)).as("q"))
          .as[(Int, Double)].collect().toMap
        for ((g, q) <- exact)
          assert(math.abs(q - ref(g)) < 1e-4,
            s"sample $i p=$p group $g: exact $q vs percentile ${ref(g)}")
      }
    }
  }
}
