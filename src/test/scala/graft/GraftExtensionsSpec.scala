package graft

import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("custom expressions callable from SQL after registration") {
    GraftExtensions.register(spark)
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f), "a b c d", Array(1L, 2L, 5L), Array(2L, 5L, 9L)))
      .toDF("va", "vb", "text", "sa", "sb")
      .createOrReplaceTempView("ext_probe")
    val row = spark.sql(
      """SELECT graft_dot(va, vb) AS d,
        |       graft_intersect_count(sa, sb) AS ic,
        |       size(graft_shingle_hashes(split(text, ' '), 3)) AS ns
        |FROM ext_probe""".stripMargin).head()
    assert(row.getDouble(0) == 11.0)
    assert(row.getLong(1) == 2L)
    assert(row.getInt(2) == 2)
  }

  test("SQL form equals the Column-API form") {
    GraftExtensionsSpecHelpers.assertSqlEqualsColumn(spark)
  }

  test("column-composition functions callable from SQL") {
    GraftExtensions.register(spark)
    Seq(("A -  B!", "x@y.io on 1.2.3.4", "a b c d e f"))
      .toDF("raw", "pii", "text")
      .createOrReplaceTempView("ext_probe2")
    val row = spark.sql(
      """SELECT graft_normalize(raw) AS canon,
        |       graft_redact_pii(pii) AS red,
        |       graft_winnow(graft_shingle_hashes(split(text, ' '), 3), 2) AS fps
        |FROM ext_probe2""".stripMargin).head()
    assert(row.getString(0) == "a b")
    assert(row.getString(1) == "<EMAIL> on <IP>")
    // 6 tokens -> 4 grams -> 3 windows of 2 -> <= 3 deduped minima
    val fps = row.getSeq[Long](2)
    assert(fps.nonEmpty && fps.length <= 3)
  }
}

object GraftExtensionsSpecHelpers {
  import graft.functions.Vectors
  def assertSqlEqualsColumn(spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    GraftExtensions.register(spark)
    val df = (0 until 20).map(i =>
        (Array.tabulate(16)(j => (i + j).toFloat), Array.tabulate(16)(j => (i * j).toFloat)))
      .toDF("a", "b")
    df.createOrReplaceTempView("ext_probe2")
    val viaSql = spark.sql("SELECT graft_dot(a, b) AS d FROM ext_probe2")
      .collect().map(_.getDouble(0)).toSeq
    val viaCol = df.select(Vectors.dot(col("a"), col("b")).as("d"))
      .collect().map(_.getDouble(0)).toSeq
    assert(viaSql == viaCol)
  }
}
