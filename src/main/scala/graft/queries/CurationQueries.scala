package graft.queries

import graft.{GraftQuery, Tables}
import graft.functions.TextFunctions._
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The composed curation pipeline — the end-to-end shape a training-data
  * run actually executes: score quality → filter → language-gate →
  * near-exact dedup on the order-independent fingerprint → emit the
  * surviving corpus. One oracle-checked query proves the composition
  * (operator interactions included), not just each stage alone.
  *
  * Plan shape at 100 TB: everything up to the dedup is one codegen'd
  * projection over the scan (quality/lang/fingerprint are per-row HOFs on
  * a bound token array); the dedup is the map-side-combinable min-struct
  * aggregate keyed by fingerprint — a single shuffle of one narrow struct
  * per surviving key.
  */
object CurationQueries {

  val c01Curation: GraftQuery = GraftQuery(
    "c01_curation", {
      val toksE = sqlTokens("text")
      val stopE = sqlLangScore(toksE, stopwords)
      val qualityE =
        s"""((CAST(len(list_distinct($toksE)) AS DOUBLE) / len($toksE)) * 0.5
           | + LEAST((CAST(len(replace(text, ' ', '')) AS DOUBLE) / len($toksE)) / 10.0, 1.0) * 0.3
           | + (CAST($stopE AS DOUBLE) / len($toksE)) * 0.2)""".stripMargin
      val scoreE = langMarkers.map { case (lang, ms) => lang -> sqlLangScore(toksE, ms) }
      val fpE = sqlRollingHash(s"array_to_string(list_sort($toksE), ' ')")
      s"""WITH scored AS (
         |  SELECT doc_id, source,
         |         $qualityE AS quality,
         |         ${sqlLangPick(scoreE, "text")} AS lang_pred,
         |         $fpE AS fp
         |  FROM documents),
         |kept AS (
         |  SELECT * FROM scored
         |  WHERE quality >= 0.45 AND lang_pred IN ('datish', 'sqlish')),
         |ranked AS (
         |  SELECT doc_id, source, lang_pred, quality,
         |         row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
         |  FROM kept)
         |SELECT doc_id, source, lang_pred, quality
         |FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin
    }) { (spark, dir) =>
    // one bound token array feeds quality, language and fingerprint
    val toks = col("__toks")
    val ttr = size(array_distinct(toks)).cast("double") / size(toks)
    val stopRatio = langScore(toks, stopwords).cast("double") / size(toks)
    val avgLen = length(regexp_replace(col("text"), " ", "")).cast("double") / size(toks)
    val quality = ttr * 0.5 + least(avgLen / 10.0, lit(1.0)) * 0.3 + stopRatio * 0.2
    val scores = langMarkers.map { case (lang, ms) => lang -> langScore(toks, ms) }
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"), tokens(col("text")).as("__toks"))
      .select(col("doc_id"), col("source"),
        quality.as("quality"),
        langPick(scores, col("text")).as("lang_pred"),
        rollingHash(array_join(array_sort(toks), " ")).as("fp"))
    val kept = scored.filter(col("quality") >= 0.45 &&
      col("lang_pred").isin("datish", "sqlish"))
    Dedup.dedupFirstAgg(kept, Seq("fp"), Seq(col("doc_id")),
        Seq("doc_id", "source", "lang_pred", "quality"))
      .select("doc_id", "source", "lang_pred", "quality")
      .orderBy("doc_id")
  }

  val all: Seq[GraftQuery] = Seq(c01Curation)
}
