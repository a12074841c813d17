package graft.functions

/** Byte-level BPE tokenization (Sennrich et al., ACL 2016, "Neural
  * Machine Translation of Rare Words with Subword Units"; byte-level
  * variant and pre-tokenizer per the public GPT-2 encoder, Radford et
  * al. 2019): the token-count unit a real LLM data pipeline budgets
  * in, next to the whitespace proxy `Text.tokenCount` the rest of the
  * engine defaults to.
  *
  * The MERGE TABLE is caller-supplied: any published `merges.txt`
  * (one "left right" pair per line, rank = line order) parses to the
  * `Seq[(String, String)]` these functions take — the algorithm, the
  * byte↔unicode bijection, and the pre-tokenizer are the portable
  * parts; the learned merges are data, shipped like any model
  * artifact (zero-egress environments train or embed their own).
  *
  * Scale shape: everything here is per-row driver-free compute — the
  * Spark operators ([[graft.operators.TextAnalysis.bpeTokenCounts]],
  * [[graft.operators.TextAnalysis.chunkBpeTokens]]) broadcast the
  * rank map once (a 50k-merge GPT-2 table is ~1 MB) and run map-only
  * with a per-partition word cache (BPE is word-local, and natural
  * text repeats words heavily — the cache turns per-token cost into
  * per-distinct-word cost, the same trick the public encoder uses).
  */
object Bpe {

  /** GPT-2's byte → printable-unicode bijection: the 188 visually
    * printable latin-1 bytes map to themselves; the rest map to
    * 256, 257, … in byte order. Tokens stay valid (whitespace-free,
    * printable) dictionary strings while remaining exactly invertible
    * to bytes — so BPE over ANY utf-8 text needs no unknown token. */
  val byteToChar: Array[Char] = {
    val printable =
      ((0x21 to 0x7e) ++ (0xa1 to 0xac) ++ (0xae to 0xff)).toSet
    val arr = new Array[Char](256)
    var n = 0
    for (b <- 0 until 256) {
      if (printable(b)) arr(b) = b.toChar
      else { arr(b) = (256 + n).toChar; n += 1 }
    }
    arr
  }

  private val charToByte: Map[Char, Byte] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b.toByte }.toMap

  /** The GPT-2 pre-tokenizer: contractions split off, letter runs and
    * digit runs (each with one optional leading space) tokenized
    * whole, other-symbol runs likewise, trailing whitespace kept
    * separate from the space that prefixes the next word (the
    * `\s+(?!\S)` arm). */
  private val pretokenPattern = java.util.regex.Pattern.compile(
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")

  def preTokenize(text: String): Vector[String] = {
    val m = pretokenPattern.matcher(text)
    val out = Vector.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** One pre-token's initial symbol sequence: utf-8 bytes through the
    * printable bijection, one single-char symbol each. */
  def toByteSymbols(pretoken: String): Vector[String] =
    pretoken.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .toVector.map(b => String.valueOf(byteToChar(b & 0xff)))

  /** The BPE merge loop (the published algorithm verbatim): find the
    * adjacent pair with the LOWEST rank, merge every occurrence in
    * one left-to-right pass, repeat until no adjacent pair has a
    * rank. Deterministic for any rank map. */
  def applyMerges(symbols: Vector[String],
      ranks: Map[(String, String), Int]): Vector[String] = {
    var word = symbols
    var done = word.size < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i < word.size - 1) {
        val r = ranks.getOrElse((word(i), word(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (word(i), word(i + 1)) }
        i += 1
      }
      if (bestPair == null) done = true
      else {
        val (a, b) = bestPair
        val nw = Vector.newBuilder[String]
        var j = 0
        while (j < word.size) {
          if (j < word.size - 1 && word(j) == a && word(j + 1) == b) {
            nw += (a + b); j += 2
          } else { nw += word(j); j += 1 }
        }
        word = nw.result()
        done = word.size < 2
      }
    }
    word
  }

  /** Full token sequence of `text` (mapped-symbol strings). `cache`
    * memoizes per distinct pre-token — pass one mutable map per
    * partition (word-local BPE makes this safe and is where the
    * per-row cost amortizes). */
  def encode(text: String, ranks: Map[(String, String), Int],
      cache: java.util.HashMap[String, Vector[String]] = new java.util.HashMap())
      : Vector[String] =
    preTokenize(text).flatMap { w =>
      val hit = cache.get(w)
      if (hit != null) hit
      else {
        val toks = applyMerges(toByteSymbols(w), ranks)
        cache.put(w, toks)
        toks
      }
    }

  /** Token count of `text` under the merge ranks (the budgeting unit). */
  def countTokens(text: String, ranks: Map[(String, String), Int],
      cache: java.util.HashMap[String, Vector[String]]): Long =
    preTokenize(text).foldLeft(0L) { (acc, w) =>
      val hit = cache.get(w)
      val toks =
        if (hit != null) hit
        else {
          val t = applyMerges(toByteSymbols(w), ranks)
          cache.put(w, t)
          t
        }
      acc + toks.size
    }

  /** Exact inverse of [[encode]]: tokens → bytes → utf-8 text. Byte-
    * level BPE is lossless by construction (no unknown token). */
  def decode(tokens: Seq[String]): String = {
    val bytes = tokens.iterator.flatMap(_.iterator).map(charToByte).toArray
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** One left-to-right non-overlapping merge pass of `pair` over a
    * symbol sequence — the inner step of [[applyMerges]], factored so
    * the TRAINER ([[trainFromCounts]] and the distributed twin in
    * [[graft.operators.TextAnalysis.bpeTrainMerges]]) applies each
    * learned merge with the exact arithmetic the encoder replays. */
  def mergeOnce(word: Vector[String], pair: (String, String))
      : Vector[String] = {
    val (a, b) = pair
    val nw = Vector.newBuilder[String]
    var j = 0
    while (j < word.size) {
      if (j < word.size - 1 && word(j) == a && word(j + 1) == b) {
        nw += (a + b); j += 2
      } else { nw += word(j); j += 1 }
    }
    nw.result()
  }

  /** BPE merge TRAINING over a word histogram (Sennrich et al., ACL
    * 2016, Algorithm 1, marker-free byte-level variant): each round
    * counts every adjacent symbol pair (overlapping occurrences, one
    * per position, weighted by word count — the reference
    * `get_stats`), takes the most frequent pair with ties to the
    * LEXICOGRAPHICALLY SMALLEST (the published algorithm leaves ties
    * unspecified; pinning them makes training replayable), records it
    * as the next merge, and rewrites the histogram with one
    * [[mergeOnce]] pass. Stops early when no pair remains. The
    * histogram is distinct-word-bounded, so the loop iterates on
    * bounded driver state — the Bradley–Terry doctrine; the
    * distributed fan-in lives in
    * [[graft.operators.TextAnalysis.bpeTrainMerges]]. */
  def trainFromCounts(wordCounts: Seq[(Vector[String], Long)],
      numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1: $numMerges")
    var words = wordCounts.toVector
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var dry = false
    while (round < numMerges && !dry) {
      val counts =
        scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (w, c) =>
        var i = 0
        while (i < w.size - 1) {
          val k = (w(i), w(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) dry = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (w, c) => (mergeOnce(w, best), c) }
        round += 1
      }
    }
    merges.result()
  }

  /** Parse a published merges file body ("left right" per line, rank
    * = order; '#'-prefixed header lines skipped) into the rank map
    * input the operators take. */
  def parseMerges(lines: Iterator[String]): Seq[(String, String)] =
    lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val sp = l.split(" ")
        require(sp.length == 2, s"malformed merge line: '$l'")
        (sp(0), sp(1))
      }.toSeq
}
