package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Count–min sketch contract: never undercounts, exact when the
  * counter table dwarfs the key domain, sane on unseen keys. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("countMin: estimate >= true always, exact at width >> domain, unseen keys bounded") {
    // 10 keys with known frequencies 1..10
    val rows = (1 to 10).flatMap(k => Seq.fill(k)(s"k$k")).toDF("key")
    val wide = Sketch.countMinFrequencies(rows, col("key"),
        (1 to 10).map(i => s"k$i") :+ "never_seen",
        depth = 4, width = 4096)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    (1 to 10).foreach { k =>
      val (est, tru, over) = wide(s"k$k")
      assert(tru == k.toLong && est >= tru && over == est - tru,
        s"k$k: $est vs $tru")
      // 4096 buckets for 10 keys: collisions vanish, estimate exact
      assert(est == tru, s"wide sketch must be exact: k$k -> $est vs $tru")
    }
    assert(wide("never_seen")._2 == 0L && wide("never_seen")._1 >= 0L)
    // a deliberately TINY sketch still never undercounts
    val tiny = Sketch.countMinFrequencies(rows, col("key"),
        (1 to 10).map(i => s"k$i"), depth = 2, width = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(tiny.forall { case (est, tru) => est >= tru },
      s"CMS must never undercount: ${tiny.toSeq}")
  }

  test("countMin: deterministic across reruns (portable md5 buckets)") {
    val rows = (1 to 50).map(i => s"id_${i % 7}").toDF("key")
    def run() = Sketch.countMinFrequencies(rows, col("key"),
      Seq("id_0", "id_3"), depth = 3, width = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(run() == run())
  }
}
