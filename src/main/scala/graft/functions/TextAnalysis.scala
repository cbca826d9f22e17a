package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for large-scale corpus pipelines: tokenization,
  * language ID, quality scoring, fingerprinting.
  *
  * Everything is a pure column expression over Spark built-ins (split /
  * regexp / higher-order array functions) — codegen-friendly, no UDFs, and
  * numerically engine-portable: ratios are emitted as floor-scaled integers
  * (permille / centi) so the DuckDB oracle matches bit-for-bit with no
  * float-rounding hazards.
  */
object TextAnalysis {

  /** Whitespace tokenizer. */
  def tokensWs(text: Column): Column =
    split(trim(text), "\\s+")

  /** BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
    * (The regex is RE2-safe — no lookaround — so the oracle runs it too.) */
  val BpePattern = "[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9\\s]"
  def tokensBpe(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  /** Codegen-friendly token stream for [[wordCountFast]]: tokens joined
    * by DOUBLE spaces and padded, so the ` word ` patterns of adjacent
    * identical tokens never overlap and removal-counting is exact. */
  def paddedTokens(text: Column): Column =
    concat(lit(" "), regexp_replace(trim(text), "\\s+", "  "), lit(" "))

  /** Exact token-occurrence count over a [[paddedTokens]] stream via
    * length arithmetic — a pure codegen'd string expression, unlike the
    * higher-order `filter` (CodegenFallback: interpreted per-element
    * lambda dispatch), which matters when a classifier probes dozens of
    * words per document. `word` must be whitespace-free. */
  def wordCountFast(padded: Column, word: String): Column =
    // quote the word: the oracle's replace() is literal, so a regex
    // metachar here would silently diverge cross-engine
    ((length(padded) - length(regexp_replace(padded,
      java.util.regex.Pattern.quote(s" $word "), "")))
      / lit(word.length + 2)).cast("int")

  // ------------------------------------------------------------- language ID

  /** Per-language marker-word profiles with integer lift weights (×100),
    * measured once on the public sf0.01 corpus: weight = relative frequency
    * of the word in-language vs corpus-wide. A classic unigram-profile
    * classifier; the synthetic languages share one vocabulary and differ
    * only in frequency skew, so lifts are small but real.
    */
  val LangProfiles: Seq[(String, Seq[(String, Int)])] = Seq(
    "de" -> Seq("customer" -> 116, "part" -> 109, "row" -> 109, "join" -> 108),
    "en" -> Seq("order" -> 109, "window" -> 108, "table" -> 108, "sort" -> 105),
    "es" -> Seq("dup" -> 132, "agg" -> 113, "slow" -> 112, "merge" -> 108),
    "fr" -> Seq("query" -> 118, "scan" -> 117, "data" -> 114, "batch" -> 110),
    "zh" -> Seq("dup" -> 151, "the" -> 115, "fast" -> 112, "small" -> 109))

  /** Integer score of one language profile over a [[paddedTokens]]
    * stream (all-codegen string counting). */
  def langScore(padded: Column, profile: Seq[(String, Int)]): Column =
    profile.map { case (w, wt) => wordCountFast(padded, w) * lit(wt) }
      .reduce(_ + _)

  /** Predicted language from precomputed per-language score COLUMNS:
    * alphabetical-first argmax — deterministic under ties, same CASE
    * cascade as the oracle SQL. Callers materialize the scores in their
    * own projection first (one [[paddedTokens]] pass shared by all
    * profiles) and pass the attribute references here. */
  def langIdFromScores(scores: Seq[(String, Column)]): Column =
    scores.zipWithIndex.foldRight(lit(null).cast("string")) {
      case (((lang, score), i), rest) =>
        val remaining = scores.drop(i + 1).map(_._2)
        if (remaining.isEmpty) when(lit(true), lit(lang)).otherwise(rest)
        else {
          val best = if (remaining.size == 1) remaining.head else greatest(remaining: _*)
          when(score >= best, lit(lang)).otherwise(rest)
        }
    }

  // --------------------------------------------------------- quality scoring

  val Stopwords = Seq("the", "a", "of", "and", "in")

  /** floor(scale * num / den) as a long — exact cross-engine integerization
    * of a ratio (single IEEE divide + floor, deterministic everywhere). */
  def scaledRatio(num: Column, den: Column, scale: Int): Column =
    floor(lit(scale) * num.cast("double") / den.cast("double")).cast("long")

  def stopwordCount(tokens: Column): Column =
    size(filter(tokens, t => t.isin(Stopwords.map(lit): _*)))

  /** Document quality facets: token count, distinct ratio, stopword ratio,
    * mean token length — the length/punct/stopword heuristics of corpus
    * filtering, as floor-scaled integers. */
  def qualityFacets(text: Column): Seq[(String, Column)] = {
    val toks = tokensWs(text)
    val n = size(toks)
    Seq(
      "n_tokens" -> n.cast("long"),
      "n_chars" -> length(text).cast("long"),
      "distinct_permille" -> scaledRatio(size(array_distinct(toks)), n, 1000),
      "stopword_permille" -> scaledRatio(stopwordCount(toks), n, 1000),
      "mean_tok_len_centi" -> scaledRatio(
        aggregate(toks, lit(0), (acc, t) => acc + length(t)), n, 100))
  }

  /** Boolean keep/drop gate in the shape of corpus quality filters. */
  def qualityKeep(text: Column): Column = {
    val toks = tokensWs(text)
    val n = size(toks)
    (n >= 10) && (n <= 10000) &&
      (scaledRatio(stopwordCount(toks), n, 1000) >= 10) &&
      (scaledRatio(size(array_distinct(toks)), n, 1000) >= 100)
  }

  // --------------------------------------------------------------- PII scrub

  /** RE2-safe patterns (no lookaround/backrefs) so the oracle's regex
    * engine agrees match-for-match with Java's. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b[0-9]{3}-[0-9]{4}\\b"

  /** Mask emails then phone numbers — the standard pre-training scrub
    * pass, as two codegen'd regexp_replace stages. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  /** Occurrences of `pattern` in `text` (cross-engine: both sides count
    * via extract-all). */
  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  // --------------------------------------------------------- script detection

  /** Unicode-block ranges for script detection, in PRIORITY order (the
    * dominant-script tiebreak). BMP-only by design: Spark's Java regex
    * counts UTF-16 units and DuckDB's RE2 counts codepoints, and the
    * two agree exactly on Basic-Multilingual-Plane classes — an astral
    * range would split a surrogate pair on one engine only. */
  val ScriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z\u00C0-\u024F]",
    "cyrillic" -> "[\u0400-\u04FF]",
    "greek" -> "[\u0370-\u03FF]",
    "arabic" -> "[\u0600-\u06FF]",
    "cjk" -> "[\u4E00-\u9FFF]",
    "hangul" -> "[\uAC00-\uD7AF]",
    "kana" -> "[\u3040-\u30FF]")

  /** Per-script letter counts ([[matchCount]] per range). */
  def scriptCounts(text: Column): Seq[(String, Column)] =
    ScriptRanges.map { case (n, p) => n -> matchCount(text, p) }

  /** Per-script permille of the script-letter total — the curation
    * signal behind script filters ("keep Latin-dominant", "route CJK
    * to its own tokenizer"). Zero script letters → every share 0.
    * `floor` over the double quotient, NOT integer `div`: both engines
    * evaluate the identical IEEE sequence (BIGINT/BIGINT is double
    * division in DuckDB too), so the floor agrees bit for bit. */
  def scriptShares(text: Column): Seq[(String, Column)] = {
    val counts = scriptCounts(text)
    val total = counts.map(_._2).reduce(_ + _)
    counts.map { case (n, c) =>
      s"${n}_permille" ->
        when(total > 0, floor(c * lit(1000) / total)).otherwise(lit(0))
          .cast("long")
    }
  }

  /** The script with the highest letter count, ties to [[ScriptRanges]]
    * order; `none` when no script letter occurs. */
  def dominantScript(text: Column): Column = {
    val counts = scriptCounts(text)
    val top = greatest(counts.map(_._2): _*)
    coalesce((counts.map { case (n, c) =>
      when(c === top && c > 0, lit(n))
    } :+ lit("none")): _*)
  }

  // ---------------------------------------------------------- fingerprinting

  /** Character k-grams of a string (empty array when shorter than k). */
  def charKgrams(text: Column, k: Int): Column =
    when(length(text) >= k,
      transform(sequence(lit(1), length(text) - (k - 1)),
        i => text.substr(i, lit(k))))
      .otherwise(array().cast("array<string>"))
}
