package graft.queries

import graft.{GraftQuery, Tables}
import graft.functions.TextFunctions
import graft.operators.Enrich
import org.apache.spark.sql.functions._

/** Enrichment operators in the gate: the conditional-translation pipeline
  * (U1 lang-detect + U2 translate, Translator.py:67-145) run with the
  * deterministic dictionary backend. The Spark side goes through the real
  * UDF path; the oracle rebuilds the same decision tree and token-wise
  * dictionary in SQL — a UDF-vs-SQL differential test.
  */
object EnrichQueries {

  /** The demo dictionary: "perfish" vocabulary → "datish" synonyms. */
  private val dict: Seq[(String, String)] = Seq(
    "fast" -> "swift", "slow" -> "sluggish", "big" -> "large", "small" -> "compact")

  val u02Translate: GraftQuery = GraftQuery(
    "u02_translate", {
      val toksE = TextFunctions.sqlTokens("text")
      val scoreE = TextFunctions.langMarkers.map { case (lang, ms) =>
        lang -> TextFunctions.sqlLangScore(toksE, ms)
      }
      val bestE = scoreE.map(_._2).reduce((a, b) => s"GREATEST($a, $b)")
      val langE = s"CASE WHEN text IS NULL OR len(trim(text)) = 0 THEN 'empty' " +
        s"ELSE ${TextFunctions.sqlLangPick(scoreE, "text")} END"
      val scoreFullE = s"CASE WHEN text IS NULL OR len(trim(text)) = 0 THEN 1.0 " +
        s"ELSE CAST($bestE AS DOUBLE) / GREATEST(len($toksE), 1) END"
      val dictE = dict.foldLeft("t") { case (acc, (from, to)) =>
        s"CASE WHEN t = '$from' THEN '$to' ELSE $acc END"
      }
      s"""WITH det AS (
         |  SELECT doc_id, text, $langE AS lang, $scoreFullE AS lang_score FROM documents)
         |SELECT doc_id, lang, lang_score,
         |  CASE WHEN lang = 'empty' THEN ''
         |       WHEN lang = 'datish' AND lang_score > 0.9 THEN COALESCE(text, '')
         |       ELSE array_to_string(list_transform(${TextFunctions.sqlTokens("COALESCE(text, '')")},
         |                            t -> $dictE), ' ')
         |  END AS text_en
         |FROM det ORDER BY doc_id""".stripMargin
    }) { (spark, dir) =>
    Enrich.translateColumn(
        Tables.documents(spark, dir), "text", "text_en", "datish",
        Enrich.DictTranslator(dict.toMap))
      .select("doc_id", "lang", "lang_score", "text_en")
      .orderBy("doc_id")
  }

  val all: Seq[GraftQuery] = Seq(u02Translate)
}
