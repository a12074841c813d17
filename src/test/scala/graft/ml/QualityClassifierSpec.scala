package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextAnalysis

/** Train-then-freeze loop for the model-based quality filter: a
  * classifier fit on weakly-labeled prose-vs-junk must produce frozen
  * weights that, compiled into the pure-expression filter, separate a
  * held-out corpus the same way. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def prose(i: Int) =
    (s"article $i reports that the committee discussed several " +
      "proposals and agreed to publish detailed findings next quarter " +
      "alongside supporting evidence ") * 3
  private def junk(i: Int) =
    s"$i ###!!! @@@@ ((%%)) ^^&&** ~~~|||| $i%% ++==[[]] ;;;;:::: !!??"

  test("learned weights separate held-out prose from junk through the frozen filter") {
    val train = ((1 to 60).map(i => (i.toLong, prose(i), 1)) ++
      (61 to 120).map(i => (i.toLong, junk(i), 0))).toDF("doc_id", "text", "label")
    val weights = QualityClassifier.fit(train, "text", "label")

    // the trained direction must value length, cleanliness, and
    // alphabetic density positively (junk is short, punct-heavy,
    // non-alphabetic)
    val (_, wLen, wPunct, wAlpha) = weights
    assert(wLen > 0 && wPunct > 0 && wAlpha > 0,
      s"quality features must carry positive weight: $weights")

    // held-out docs, scored by the frozen-weight codegen filter
    val test = ((201 to 220).map(i => (i.toLong, prose(i))) ++
      (221 to 240).map(i => (i.toLong, junk(i)))).toDF("doc_id", "text")
    val kept = TextAnalysis.classifierQualityFilter(
        test, "doc_id", "text", weights)
      .select("doc_id").as[Long].collect().toSet
    assert((201L to 220L).forall(kept.contains),
      s"every held-out prose doc must survive: $kept")
    assert((221L to 240L).forall(id => !kept.contains(id)),
      s"every held-out junk doc must be dropped: $kept")
  }

  test("featurizer is the filter's own expression triple (no train/serve skew)") {
    val docs = Seq((1L, prose(1)), (2L, junk(2))).toDF("doc_id", "text")
    val feats = QualityClassifier.featurize(docs, "text")
      .select("doc_id", "__f_len", "__f_punct", "__f_alpha")
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

    // score through the filter with weights picking out ONE feature at
    // a time; inverting the sigmoid must return that feature exactly
    for ((pick, idx) <- Seq(
        (1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0)).zipWithIndex) {
      val (wl, wp, wa) = pick
      val scored = TextAnalysis.classifierQualityFilter(
          docs, "doc_id", "text", (0.0, wl, wp, wa),
          threshold = 0.0, roundDigits = 10)
        .select("doc_id", "ql_score").as[(Long, Double)].collect().toMap
      for (id <- Seq(1L, 2L)) {
        val f = feats(id)
        val expected = Seq(f._1, f._2, f._3)(idx)
        val inverted = -math.log(1.0 / scored(id) - 1.0)
        assert(math.abs(inverted - expected) < 1e-6,
          s"doc $id feature $idx: filter used $inverted, featurizer says $expected")
      }
    }
  }
}
