package graft.queries

import graft.{GraftQuery, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table: token statistics,
  * heuristic language ID, quality scoring, and rolling-hash document
  * fingerprints (training-data-pipeline extensions from the builder
  * prompt; reference analogs cited in TextFunctions).
  *
  * All expressions are codegen'd builtins — one narrow scan, no shuffles
  * except the final tiny ORDER BY, so each op is embarrassingly parallel
  * at 100 TB.
  */
object TextQueries {

  /** Token counting: whitespace tokens, BPE-ish segments, distinct tokens,
    * average token length.
    */
  val t01TokenStats: GraftQuery = GraftQuery(
    "t01_token_stats",
    s"""SELECT doc_id,
       |  len(${sqlTokens("text")}) AS n_tokens,
       |  ${sqlBpeTokenCount("text")} AS n_bpe,
       |  len(list_distinct(${sqlTokens("text")})) AS n_distinct,
       |  (CAST(len(replace(text, ' ', '')) AS DOUBLE) / len(${sqlTokens("text")})) AS avg_tok_len
       |FROM documents ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val toks = tokens(col("text"))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        bpeTokenCount(col("text")).as("n_bpe"),
        size(array_distinct(toks)).as("n_distinct"),
        (length(regexp_replace(col("text"), " ", "")).cast("double") / size(toks)).as("avg_tok_len"))
      .orderBy("doc_id")
  }

  /** Heuristic language ID: marker-token scores per family, argmax with
    * deterministic tie-break (ref: Translator.py:67-94 detect_language).
    */
  val t02LangId: GraftQuery = GraftQuery(
    "t02_lang_id", {
      val scoreE = langMarkers.map { case (lang, ms) => lang -> sqlLangScore("toks", ms) }
      s"""WITH tok AS (SELECT doc_id, text, ${sqlTokens("text")} AS toks FROM documents)
         |SELECT doc_id,
         |${scoreE.map { case (l, e) => s"  $e AS s_$l" }.mkString(",\n")},
         |  ${sqlLangPick(scoreE, "text")} AS lang_pred
         |FROM tok ORDER BY doc_id""".stripMargin
    }) { (spark, dir) =>
    val toks = tokens(col("text"))
    val scores = langMarkers.map { case (lang, ms) => lang -> langScore(toks, ms) }
    Tables.documents(spark, dir)
      .select(
        Seq(col("doc_id")) ++
          scores.map { case (l, s) => s.as(s"s_$l") } :+
          langPick(scores, col("text")).as("lang_pred"): _*)
      .orderBy("doc_id")
  }

  /** Quality scoring: type-token ratio, stopword ratio, average token
    * length, and a composite quality score in deterministic double math.
    */
  val t03Quality: GraftQuery = GraftQuery(
    "t03_quality", {
      val toksE = sqlTokens("text")
      val stopE = sqlLangScore(toksE, stopwords)
      s"""SELECT doc_id,
         |  (CAST(len(list_distinct($toksE)) AS DOUBLE) / len($toksE)) AS ttr,
         |  (CAST($stopE AS DOUBLE) / len($toksE)) AS stop_ratio,
         |  (CAST(len(replace(text, ' ', '')) AS DOUBLE) / len($toksE)) AS avg_tok_len,
         |  ((CAST(len(list_distinct($toksE)) AS DOUBLE) / len($toksE)) * 0.5
         |   + LEAST((CAST(len(replace(text, ' ', '')) AS DOUBLE) / len($toksE)) / 10.0, 1.0) * 0.3
         |   + (CAST($stopE AS DOUBLE) / len($toksE)) * 0.2) AS quality
         |FROM documents ORDER BY doc_id""".stripMargin
    }) { (spark, dir) =>
    val toks = tokens(col("text"))
    val ttr = size(array_distinct(toks)).cast("double") / size(toks)
    val stopRatio = langScore(toks, stopwords).cast("double") / size(toks)
    val avgLen = length(regexp_replace(col("text"), " ", "")).cast("double") / size(toks)
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        ttr.as("ttr"),
        stopRatio.as("stop_ratio"),
        avgLen.as("avg_tok_len"),
        (ttr * 0.5 + least(avgLen / 10.0, lit(1.0)) * 0.3 + stopRatio * 0.2).as("quality"))
      .orderBy("doc_id")
  }

  /** Document fingerprinting: order-sensitive rolling hash of the full
    * text plus an order-independent fingerprint of the sorted token set
    * (the exact-dedup key at scale).
    */
  val t04Fingerprint: GraftQuery = GraftQuery(
    "t04_fingerprint", {
      val sortedE = s"array_to_string(list_sort(${sqlTokens("text")}), ' ')"
      s"""SELECT doc_id,
         |  ${sqlRollingHash("text")} AS fp,
         |  ${sqlRollingHash(sortedE)} AS fp_sorted
         |FROM documents ORDER BY doc_id""".stripMargin
    }) { (spark, dir) =>
    val sorted = array_join(array_sort(tokens(col("text"))), " ")
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        rollingHash(col("text")).as("fp"),
        rollingHash(sorted).as("fp_sorted"))
      .orderBy("doc_id")
  }

  /** Corpus rollup: predicted-language distribution per source with mean
    * quality inputs — the per-dataset profile a curation pipeline keys
    * filtering decisions on.
    */
  val t05LangDist: GraftQuery = GraftQuery(
    "t05_lang_dist", {
      val scoreE = langMarkers.map { case (lang, ms) => lang -> sqlLangScore(sqlTokens("text"), ms) }
      s"""WITH det AS (
         |  SELECT source, ${sqlLangPick(scoreE, "text")} AS lang_pred,
         |         len(${sqlTokens("text")}) AS n_tokens
         |  FROM documents)
         |SELECT source, lang_pred, COUNT(*) AS n_docs,
         |       CAST(SUM(CAST(n_tokens AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*) AS avg_tokens
         |FROM det GROUP BY source, lang_pred ORDER BY source, lang_pred""".stripMargin
    }) { (spark, dir) =>
    // token array bound to an attribute first (multi-referenced-HOF rule:
    // 4 langScore filters + size all read it)
    val scores = langMarkers.map { case (lang, ms) => lang -> langScore(col("__toks"), ms) }
    Tables.documents(spark, dir)
      .select(col("source"), col("text"), tokens(col("text")).as("__toks"))
      .select(col("source"), langPick(scores, col("text")).as("lang_pred"),
        size(col("__toks")).as("n_tokens"))
      .groupBy("source", "lang_pred")
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("n_tokens").cast("decimal(28,4)")).cast("double") / count(lit(1))).as("avg_tokens"))
      .orderBy("source", "lang_pred")
  }

  val all: Seq[GraftQuery] = Seq(t01TokenStats, t02LangId, t03Quality, t04Fingerprint, t05LangDist)
}
