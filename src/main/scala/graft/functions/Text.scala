package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions (tokenize, shingle, quality signals).
  * Pure built-in expressions — codegen-friendly, no UDFs, and each has
  * an exact ANSI-SQL equivalent so the DuckDB oracle can verify them.
  */
object Text {

  /** Whitespace tokenization (single-space convention of the synthetic
    * corpus). `split` keeps empty strings, matching SQL string_split. */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles: ["a","b","c","d"], n=3 →
    * ["a b c", "b c d"]. Empty array when fewer than n tokens (guarded —
    * Spark's `sequence(0, negative)` would count DOWN, not return empty).
    */
  def shingles(text: Column, n: Int): Column = {
    val w = tokens(text)
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(w, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Token count by whitespace. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("bigint")

  /** Winnowed minima over a positional gram-hash array: the minimum of
    * every `w`-long sliding window, deduped — the fingerprint-selection
    * step of SIGMOD'03 winnowing ([[graft.operators.Dedup
    * .winnowedFingerprints]] pairs it with the codegen gram hasher).
    * Fewer than w grams → one whole-array window; empty → empty;
    * null → null (matching the kernel expression's null-in/null-out,
    * so the equality pin covers null rows too). */
  def winnowedMins(grams: Column, w: Int): Column =
    when(grams.isNull, lit(null).cast("array<long>"))
      .when(size(grams) >= w,
        array_distinct(transform(sequence(lit(0), size(grams) - w),
          i => array_min(slice(grams, i + lit(1), lit(w))))))
      .when(size(grams) > 0, array(array_min(grams)))
      .otherwise(array().cast("array<long>"))

  /** Email-address pattern, restricted to syntax Java regex and RE2
    * interpret identically (no \b, no lookaround) so the DuckDB oracle
    * can mirror redaction exactly. */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"

  /** IPv4 pattern (dotted quad, no word boundaries — see [[EmailRe]]). */
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** PII redaction: replace emails then IPv4s with typed placeholder
    * tags. Order matters — the email pattern consumes dotted hosts
    * before the looser IP pattern can see them. Pure per-row codegen
    * regex, no shuffle. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRe, "<EMAIL>"),
      Ipv4Re, "<IP>")

  /** Luhn checksum validity of a digit string (ISO/IEC 7812 — the
    * check digit behind every payment-card number): from the right,
    * double every second digit, fold >9 back by −9, and the total
    * must divide by 10. Pure HOF expression (sequence → transform →
    * aggregate) over dynamic-position substrings, so both engines
    * walk identical integer arithmetic — no regex lookaround, no UDF.
    * The curation upgrade over a bare digit-run regex: a 16-digit
    * order id is NOT card data; a Luhn-valid run almost certainly is. */
  def luhnValid(digits: Column): Column = {
    val rev = reverse(digits)
    val terms = transform(sequence(lit(1), length(rev)), i => {
      val d = substring(rev, i, lit(1)).cast("int")
      val doubled = d * 2
      when(i % 2 === 0,
        when(doubled > 9, doubled - 9).otherwise(doubled)).otherwise(d)
    })
    aggregate(terms, lit(0), (acc, x) => acc + x) % 10 === 0
  }

  /** Explicit whitespace-run class, not \s: Java regex \s includes \x0B
    * (vertical tab) while the oracle's RE2 \s does not — the engines
    * would canonicalize VT-separated words differently. */
  val WsRunRe = "[ \\t\\n\\x0B\\f\\r]+"

  /** Everything the canonical form strips (after casing + ws mapping). */
  val NonCanonRe = "[^a-z0-9 ]+"

  /** Canonical text form for fuzzy-exact dedup: lowercase, map ALL
    * whitespace runs to single spaces FIRST (so "a\tb" stays two words
    * instead of fusing to "ab" when the punctuation strip runs), then
    * strip non-alphanumerics, collapse the space runs that stripping
    * opens up, trim. Catches the case/punctuation/whitespace variants
    * byte dedup misses while staying a pure per-row codegen expression.
    * (ASCII canon — the corpus convention; locale-sensitive casing is
    * out of scope.) */
  def normalized(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(lower(text), WsRunRe, " "),
        NonCanonRe, ""),
      " +", " "))

  /** Unicode NFC canonicalization ([[expressions.NfcNormalize]]):
    * composed vs decomposed accent sequences are byte-different but
    * render identically, so digest/shingle dedup treats them as
    * distinct docs — NFC first gives every downstream layer one
    * canonical byte form. NFC, not NFKC: compatibility folding is a
    * policy choice; NFC matches DuckDB's `nfc_normalize` oracle.
    * Already-normalized strings (all ASCII) pass through without
    * allocation. */
  def nfcNormalized(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.NfcNormalize(
      ColumnBridge.expression(text)))
  }

  /** DEFLATE-compressed UTF-8 byte count at `level`
    * ([[expressions.DeflatedSize]]): the codegen primitive under the
    * compression-ratio redundancy signal — no builtin DEFLATE exists,
    * and the old row-at-a-time UDF paid a serde round-trip per
    * document. */
  def deflatedSize(text: Column, level: Int = 6): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.DeflatedSize(
      ColumnBridge.expression(text), level))
  }

  /** EXACT distinct n-gram count over a token array in one codegen pass
    * ([[graft.functions.expressions.NgramDistinctCount]]); equals
    * `size(array_distinct(<gram transform>))` — tests pin equality —
    * without materializing the gram array twice through interpreted
    * HOF lambdas. */
  def distinctNgramCount(tokens: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.NgramDistinctCount(
      ColumnBridge.expression(tokens), n))
  }

  /** BPE-ish subword-piece count: alphanumeric runs and individual
    * non-space punctuation each count as one piece (a cheap, regex-only
    * proxy for a BPE pre-tokenizer — deterministic and SQL-matchable). */
  def pieceCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
      .cast("bigint")

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[^A-Za-z0-9 ]", ""))

  /** Ratio of tokens found in `stop` (a small in-literal stopword set).
    * Built as array_size(filter(tokens, in-set)) / token_count. */
  def stopwordRatio(text: Column, stop: Seq[String]): Column = {
    val toks = tokens(text)
    size(filter(toks, t => t.isin(stop.map(s => s: Any): _*))).cast("double") /
      size(toks).cast("double")
  }
}
