package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions.{DotProduct, NgramDistinctCount, SortedIntersectCount, WordShingleHashes}

/** SparkSessionExtensions hook exposing the graft codegen expressions
  * to SQL (SURVEY §4.3: extensions are injected, Spark is never
  * forked). Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or by
  * calling [[GraftExtensions.register]] on an existing session.
  *
  *   SELECT graft_dot(a.embedding, b.embedding)          -- float64 dot
  *   SELECT graft_intersect_count(sa, sb)                -- |A∩B|, sorted arrays
  *   SELECT graft_shingle_hashes(split(text, ' '), 3)    -- word n-gram hashes
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  private[graft] val registrations: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      ("graft_dot",
        info("graft_dot", "graft_dot(a, b) - float64 dot product of two float/double arrays"),
        { args: Seq[Expression] =>
          require(args.length == 2, "graft_dot(a, b) takes 2 arguments")
          DotProduct(args(0), args(1))
        }),
      ("graft_intersect_count",
        info("graft_intersect_count",
          "graft_intersect_count(a, b) - |A∩B| of two sorted duplicate-free bigint arrays"),
        { args: Seq[Expression] =>
          require(args.length == 2, "graft_intersect_count(a, b) takes 2 arguments")
          SortedIntersectCount(args(0), args(1))
        }),
      ("graft_shingle_hashes",
        info("graft_shingle_hashes",
          "graft_shingle_hashes(tokens, n) - polynomial hashes of the word n-grams"),
        { args: Seq[Expression] =>
          require(args.length == 2, "graft_shingle_hashes(tokens, n) takes 2 arguments")
          val n = args(1) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"shingle size must be an integer literal, got $other")
          }
          WordShingleHashes(args(0), n)
        }),
      ("graft_ngram_distinct",
        info("graft_ngram_distinct",
          "graft_ngram_distinct(tokens, n) - exact distinct word-n-gram count"),
        { args: Seq[Expression] =>
          require(args.length == 2, "graft_ngram_distinct(tokens, n) takes 2 arguments")
          val n = args(1) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"n-gram size must be an integer literal, got $other")
          }
          NgramDistinctCount(args(0), n)
        }))

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), inf, builder)
    }
}
