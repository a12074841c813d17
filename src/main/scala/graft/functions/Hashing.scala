package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing built from plain integer
  * arithmetic over code points — every function here has an exact ANSI
  * SQL equivalent, so dedup/fingerprint results can be verified
  * bit-for-bit by an external SQL oracle. (Production alternative:
  * `xxhash64` is faster but engine-specific; these ops take the hash as
  * a strategy, with the portable one as default.)
  *
  * All expressions are Catalyst built-ins (higher-order functions), so
  * they stay inside whole-stage codegen — no UDF serialization.
  */
object Hashing {

  /** Large prime modulus; intermediate products stay well inside Long. */
  val P: Long = 1000000007L

  /** Polynomial rolling hash of a string: fold (acc*31 + codepoint) % P
    * over its characters. Range [0, P) ⊂ 30 bits. */
  def charHash(s: Column): Column =
    aggregate(
      transform(split(s, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31L + x) % P)

  /** The j-th universal hash of an already-hashed value:
    * ((2j+3)·h + 7j+1) mod P. Seeds are a pure function of j so both
    * engines derive them identically. */
  def permHash(h: Column, j: Column): Column =
    ((lit(2L) * j + 3L) * h + lit(7L) * j + 1L) % P

  /** Polynomial fold over a sequence of longs (document fingerprint):
    * fold (acc*B + x) % P. */
  def seqHash(xs: Column, b: Long = 31L): Column =
    aggregate(xs, lit(0L), (acc, x) => (acc * b + x) % P)

  /** charHash of every token in one codegen pass:
    * [[graft.functions.expressions.WordShingleHashes]] with n = 1 is
    * exactly the per-token hash array (a 1-gram shingle IS the token).
    * Use instead of `transform(tokens, charHash)` in hot paths — the
    * HOF form dispatches the interpreted evaluator per character. */
  def tokenHashes(tokens: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.WordShingleHashes(
      ColumnBridge.expression(tokens), 1))
  }
}
