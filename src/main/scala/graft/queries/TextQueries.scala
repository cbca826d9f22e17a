package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Hashing, TextAnalysis => TA}
import graft.queries.ParityQueries.Q

/** Text-analysis queries over the `documents` table (training-data
  * pipeline surface: tokenization, language ID, quality gates,
  * fingerprinting). Integer-only outputs — see [[graft.functions.TextAnalysis]].
  */
object TextQueries {

  /** TX1 — token statistics: whitespace + BPE-ish tokenizations. */
  val q21TokenStats: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    t.documents
      .select(
        col("doc_id"),
        size(TA.tokensWs(col("text"))).cast("long").as("n_ws"),
        size(TA.tokensBpe(col("text"))).cast("long").as("n_bpe"),
        size(array_distinct(TA.tokensWs(col("text")))).cast("long").as("n_distinct"))
      .orderBy("doc_id")
  }

  /** TX2 — language ID: unigram-profile classifier vs. the labeled lang,
    * aggregated to a per-language confusion summary. Scores materialize
    * in their own projection (one shared padded-token pass, 20 codegen'd
    * substring counts) before the argmax cascade — mirroring the
    * oracle's scored-CTE shape. */
  val q22LangId: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    val scored = t.documents
      .select(col("lang"), TA.paddedTokens(col("text")).as("__p"))
      .select(col("lang") +:
        TA.LangProfiles.map { case (l, p) => TA.langScore(col("__p"), p).as(s"s_$l") }: _*)
    scored
      .withColumn("predicted",
        TA.langIdFromScores(TA.LangProfiles.map { case (l, _) => l -> col(s"s_$l") }))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted")
  }

  /** TX3 — quality facets + keep/drop gate per document. */
  val q23Quality: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    val facets = TA.qualityFacets(col("text")).map { case (n, c) => c.as(n) }
    t.documents
      .select(col("doc_id") +: facets :+ TA.qualityKeep(col("text")).as("keep"): _*)
      .orderBy("doc_id")
  }

  /** TX4 — document fingerprint: min-hash over char 8-grams + mod-sampled
    * gram count (winnowing-style signature), via the single-pass native
    * [[graft.functions.KgramFingerprint]] expression — value-identical to
    * the declarative transform+h60 array form (proven in its spec) but
    * with zero per-gram string/array materialization. */
  val q24Fingerprint: Q = (spark, dir) => {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val t = Tables(spark, dir)
    t.documents
      .select(col("doc_id"),
        ColumnBridge.column(graft.functions.KgramFingerprint(
          ColumnBridge.expression(col("text")), k = 8, mod = 64)).as("__s"))
      .select(
        col("doc_id"),
        col("__s.fp").as("fp"),
        col("__s.n_sampled").as("n_sampled"))
      .orderBy("doc_id")
  }

  /** TX5 — PII redaction: synthetic contact strings built from customer
    * rows identically on both engines, then email/phone masking with
    * per-row match counts (the pre-training scrub pass). */
  val q41PiiRedact: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    val contact = concat(
      lit("reach "),
      regexp_replace(lower(col("c_name")), "[^a-z0-9]", "."),
      lit("@example.com or call 555-"),
      lpad((col("c_custkey") % 10000).cast("string"), 4, "0"),
      lit(" segment "), col("c_mktsegment"))
    t.customer
      .select(col("c_custkey"), contact.as("contact"))
      .select(
        col("c_custkey"),
        TA.redactPii(col("contact")).as("redacted"),
        TA.matchCount(col("contact"), TA.EmailPattern).as("n_emails"),
        TA.matchCount(col("contact"), TA.PhonePattern).as("n_phones"))
      .orderBy("c_custkey")
  }

  /** TX6 — corpus vocabulary: global token frequencies, top 50 with a
    * total tiebreak (the vocabulary-building scan). */
  val q42VocabTopK: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    t.documents
      .select(explode(TA.tokensWs(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(50)
  }


  /** TX7 — Unicode-script detection ([[TA.scriptShares]] /
    * [[TA.dominantScript]]): per-doc Latin and CJK letter shares and
    * the dominant script — the signal behind "keep Latin-dominant" /
    * "route CJK to its own tokenizer" curation filters. The zh slice
    * makes the CJK branch real; shares are floor(count·1000/total)
    * with both engines running the identical double division. */
  val q129ScriptShares: Q = (spark, dir) => {
    val t = Tables(spark, dir)
    val shares = TA.scriptShares(col("text")).toMap
    t.documents.select(
      col("doc_id"), col("lang"),
      shares("latin_permille").as("latin_permille"),
      shares("cjk_permille").as("cjk_permille"),
      TA.dominantScript(col("text")).as("dominant"))
      .orderBy("doc_id")
  }

  val all: Map[String, Q] = Map(
    "q21_token_stats" -> q21TokenStats,
    "q22_lang_id" -> q22LangId,
    "q23_quality" -> q23Quality,
    "q24_fingerprint" -> q24Fingerprint,
    "q41_pii_redact" -> q41PiiRedact,
    "q42_vocab_topk" -> q42VocabTopK,
    "q129_script_shares" -> q129ScriptShares)

  // ------------------------------------------------------------- oracle SQL

  /** Padded-stream occurrence count — same construction as
    * [[TA.wordCountFast]]: `//` is DuckDB's integer division. */
  private def wcSql(word: String): String =
    s"((length(p) - length(replace(p, ' $word ', ''))) // ${word.length + 2})"

  private val langScoreSql: Seq[(String, String)] =
    TA.LangProfiles.map { case (lang, profile) =>
      lang -> profile.map { case (w, wt) => s"${wcSql(w)} * $wt" }.mkString(" + ")
    }

  /** Alphabetical-first argmax CASE cascade, same shape as [[TA.langId]]. */
  private val predictedSql: String = {
    val scores = langScoreSql.map { case (l, _) => l -> s"s_$l" }
    scores.zipWithIndex.map { case ((lang, s), i) =>
      val rest = scores.drop(i + 1).map(_._2)
      if (rest.isEmpty) s"ELSE '$lang'"
      else s"WHEN $s >= greatest(${rest.mkString(", ")}) THEN '$lang'"
    }.mkString("CASE ", " ", " END")
  }

  private val kgramHashesSql =
    s"""CASE WHEN length(text) >= 8
       |  THEN list_transform(generate_series(1, length(text) - 7),
       |         i -> ${Hashing.h60Sql("substr(text, i, 8)")})
       |  ELSE [] END""".stripMargin

  val oracle: Map[String, String] = Map(
    "q129_script_shares" ->
      """WITH c AS (
        |  SELECT doc_id, lang,
        |    len(regexp_extract_all(text, '[A-Za-z\x{00C0}-\x{024F}]')) AS c_latin,
        |    len(regexp_extract_all(text, '[\x{0400}-\x{04FF}]')) AS c_cyrillic,
        |    len(regexp_extract_all(text, '[\x{0370}-\x{03FF}]')) AS c_greek,
        |    len(regexp_extract_all(text, '[\x{0600}-\x{06FF}]')) AS c_arabic,
        |    len(regexp_extract_all(text, '[\x{4E00}-\x{9FFF}]')) AS c_cjk,
        |    len(regexp_extract_all(text, '[\x{AC00}-\x{D7AF}]')) AS c_hangul,
        |    len(regexp_extract_all(text, '[\x{3040}-\x{30FF}]')) AS c_kana
        |  FROM documents),
        |t AS (SELECT *, c_latin + c_cyrillic + c_greek + c_arabic
        |        + c_cjk + c_hangul + c_kana AS total FROM c)
        |SELECT doc_id, lang,
        |  CAST(CASE WHEN total > 0 THEN floor(c_latin * 1000 / total) ELSE 0 END AS BIGINT) AS latin_permille,
        |  CAST(CASE WHEN total > 0 THEN floor(c_cjk * 1000 / total) ELSE 0 END AS BIGINT) AS cjk_permille,
        |  CASE WHEN c_latin = greatest(c_latin, c_cyrillic, c_greek, c_arabic, c_cjk, c_hangul, c_kana) AND c_latin > 0 THEN 'latin' WHEN c_cyrillic = greatest(c_latin, c_cyrillic, c_greek, c_arabic, c_cjk, c_hangul, c_kana) AND c_cyrillic > 0 THEN 'cyrillic' WHEN c_greek = greatest(c_latin, c_cyrillic, c_greek, c_arabic, c_cjk, c_hangul, c_kana) AND c_greek > 0 THEN 'greek' WHEN c_arabic = greatest(c_latin, c_cyrillic, c_greek, c_arabic, c_cjk, c_hangul, c_kana) AND c_arabic > 0 THEN 'arabic' WHEN c_cjk = greatest(c_latin, c_cyrillic, c_greek, c_arabic, c_cjk, c_hangul, c_kana) AND c_cjk > 0 THEN 'cjk' WHEN c_hangul = greatest(c_latin, c_cyrillic, c_greek, c_arabic, c_cjk, c_hangul, c_kana) AND c_hangul > 0 THEN 'hangul' WHEN c_kana = greatest(c_latin, c_cyrillic, c_greek, c_arabic, c_cjk, c_hangul, c_kana) AND c_kana > 0 THEN 'kana' ELSE 'none' END AS dominant
        |FROM t ORDER BY doc_id""".stripMargin,
    "q21_token_stats" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_ws,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_bpe,
        |  CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_distinct
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q22_lang_id" ->
      s"""WITH scored AS (
         |  SELECT lang, ${langScoreSql.map { case (l, e) => s"$e AS s_$l" }.mkString(", ")}
         |  FROM (SELECT lang,
         |        ' ' || regexp_replace(trim(text), '\\s+', '  ', 'g') || ' ' AS p
         |        FROM documents)),
         |pred AS (SELECT lang, $predictedSql AS predicted FROM scored)
         |SELECT lang, predicted, COUNT(*) AS n FROM pred
         |GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin,
    "q23_quality" ->
      """WITH tok AS (
        |  SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(floor(1000 * CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) AS BIGINT) AS distinct_permille,
        |    CAST(floor(1000 * CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','in'))) AS DOUBLE) / len(toks)) AS BIGINT) AS stopword_permille,
        |    CAST(floor(100 * CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / len(toks)) AS BIGINT) AS mean_tok_len_centi
        |  FROM tok)
        |SELECT *,
        |  (n_tokens >= 10 AND n_tokens <= 10000
        |   AND stopword_permille >= 10 AND distinct_permille >= 100) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,
    "q24_fingerprint" ->
      s"""SELECT doc_id,
         |  list_min(hashes) AS fp,
         |  CAST(len(list_filter(hashes, h -> h % 64 = 0)) AS BIGINT) AS n_sampled
         |FROM (SELECT doc_id, $kgramHashesSql AS hashes FROM documents)
         |ORDER BY doc_id""".stripMargin,
    "q41_pii_redact" -> {
      // runtime pattern strings embed verbatim into the SQL literal
      val email = TA.EmailPattern
      val phone = TA.PhonePattern
      s"""WITH c AS (
         |  SELECT c_custkey,
         |    'reach ' || regexp_replace(lower(c_name), '[^a-z0-9]', '.', 'g')
         |      || '@example.com or call 555-'
         |      || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
         |      || ' segment ' || c_mktsegment AS contact
         |  FROM customer)
         |SELECT c_custkey,
         |  regexp_replace(regexp_replace(contact, '$email', '<EMAIL>', 'g'),
         |    '$phone', '<PHONE>', 'g') AS redacted,
         |  CAST(len(regexp_extract_all(contact, '$email')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(contact, '$phone')) AS BIGINT) AS n_phones
         |FROM c ORDER BY c_custkey""".stripMargin
    },
    "q42_vocab_topk" ->
      """SELECT token, COUNT(*) AS n FROM (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |  FROM documents)
        |WHERE token != ''
        |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin)
}
