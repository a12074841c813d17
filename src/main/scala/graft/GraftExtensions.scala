package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions.{DotProduct, NfcNormalize, NgramDistinctCount, SortedIntersectCount, WinnowedMins, WordShingleHashes}

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
        }),
      // Scalar string functions rebuilt as direct Catalyst trees (the
      // Column->Expression bridge yields Unevaluable nodes inside the
      // registry, where no analyzer pass resolves them); the regex
      // constants are shared with graft.functions.Text so the SQL and
      // DataFrame forms cannot drift.
      ("graft_normalize",
        info("graft_normalize",
          "graft_normalize(text) - canonical form: lowercase, whitespace→space, strip punctuation"),
        { args: Seq[Expression] =>
          require(args.length == 1, "graft_normalize(text) takes 1 argument")
          import org.apache.spark.sql.catalyst.expressions.{Literal, Lower, RegExpReplace, StringTrim}
          import graft.functions.Text
          StringTrim(RegExpReplace(RegExpReplace(RegExpReplace(Lower(args(0)),
            Literal(Text.WsRunRe), Literal(" ")),
            Literal(Text.NonCanonRe), Literal("")),
            Literal(" +"), Literal(" ")))
        }),
      ("graft_redact_pii",
        info("graft_redact_pii",
          "graft_redact_pii(text) - replace emails/IPv4s with <EMAIL>/<IP> tags"),
        { args: Seq[Expression] =>
          require(args.length == 1, "graft_redact_pii(text) takes 1 argument")
          import org.apache.spark.sql.catalyst.expressions.{Literal, RegExpReplace}
          import graft.functions.Text
          RegExpReplace(RegExpReplace(args(0),
            Literal(Text.EmailRe), Literal("<EMAIL>")),
            Literal(Text.Ipv4Re), Literal("<IP>"))
        }),
      ("graft_nfc",
        info("graft_nfc",
          "graft_nfc(text) - Unicode NFC canonicalization (DuckDB nfc_normalize twin)"),
        { args: Seq[Expression] =>
          require(args.length == 1, "graft_nfc(text) takes 1 argument")
          NfcNormalize(args(0))
        }),
      ("graft_winnow",
        info("graft_winnow",
          "graft_winnow(gram_hashes, w) - deduped sliding-window minima (winnowing fingerprints)"),
        { args: Seq[Expression] =>
          require(args.length == 2, "graft_winnow(gram_hashes, w) takes 2 arguments")
          val w = args(1) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"window size must be an integer literal, got $other")
          }
          WinnowedMins(args(0), w)
        }))

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), inf, builder)
    }
}
