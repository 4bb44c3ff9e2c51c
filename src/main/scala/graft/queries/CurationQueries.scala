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
    // The sorted-token string is bound to its own attribute and hashed by
    // the NATIVE kernel: the HOF rollingHash re-reads its child per
    // character, and outside whole-stage codegen (this plan's aggregate is
    // a SortAggregate, and huge projections can fall back) there is no
    // subexpression elimination to hoist an inlined array_sort+array_join
    // — measured 26s vs 0.6s at sf0.1.
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"), tokens(col("text")).as("__toks"))
      .select(col("doc_id"), col("source"), col("text"), col("__toks"),
        array_join(array_sort(toks), " ").as("__sorted"))
      // marker scores bound to attributes too: langPick's argmax chain
      // references each score several times, and each is an array-filter
      // pass when inlined
      .select(Seq(col("doc_id"), col("source"), col("text"),
        quality.as("quality"),
        graft.plans.DedupExprs.rollingHash(col("__sorted")).as("fp")) ++
        scores.map { case (lang, s) => s.as(s"__s_$lang") }: _*)
      .select(col("doc_id"), col("source"), col("quality"),
        langPick(langMarkers.map { case (lang, _) => lang -> col(s"__s_$lang") },
          col("text")).as("lang_pred"),
        col("fp"))
    // The filter is folded INTO the dedup aggregate instead of a Filter
    // node: a `.filter(quality >= …)` above the scored projection gets
    // pushed below it, substituting the full token pipeline into the scan
    // predicate — the plan carried 30 copies of split(text) and ran 4×
    // slower. Masking failing rows to NULL and taking the null-skipping
    // min(struct) per fingerprint is the same semantics (min over kept
    // rows; all-null groups dropped above the agg, where the filter is on
    // an aggregated attribute and cannot sink) and the better plan anyway:
    // one projection, one map-side-combinable shuffle.
    val keep = col("quality") >= 0.45 && col("lang_pred").isin("datish", "sqlish")
    val payload = struct(col("doc_id"), col("source"), col("lang_pred"), col("quality"))
    scored
      .select(col("fp"),
        when(keep, struct(col("doc_id").as("__ord"), payload.as("__row"))).as("__m"))
      .groupBy("fp").agg(min(col("__m")).as("__first"))
      .filter(col("__first").isNotNull)
      .select(col("__first.__row.doc_id").as("doc_id"),
        col("__first.__row.source").as("source"),
        col("__first.__row.lang_pred").as("lang_pred"),
        col("__first.__row.quality").as("quality"))
      .orderBy("doc_id")
  }

  val all: Seq[GraftQuery] = Seq(c01Curation)
}
