package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Enrichment operators: language detection (U1) and conditional
  * translation (U2) with the reference's resume semantics
  * (Translator.py:67-145).
  *
  * The translation service is pluggable; [[DictTranslator]] is the
  * deterministic offline implementation for tests. The real rate-limited
  * HTTP service belongs in `foreachPartition` with bounded concurrency
  * and idempotent upsert — never an inline expression Spark may re-run on
  * task retry (SURVEY §4).
  */
object Enrich {

  /** U1 — language detection as a pure column expression: marker-set
    * scores + argmax (TextFunctions.langPick), with the reference's
    * ("empty", 1.0) sentinel for blank text (Translator.py:78-79).
    * Returns struct(lang, score); score = marker hits / tokens.
    */
  def detectLanguage(text: Column): Column = {
    val toks = TextFunctions.tokens(text)
    val scores = TextFunctions.langMarkers.map { case (lang, ms) =>
      lang -> TextFunctions.langScore(toks, ms)
    }
    val best = scores.map(_._2).reduce((a, b) => when(b > a, b).otherwise(a))
    val blank = text.isNull || length(trim(text)) === 0
    struct(
      when(blank, lit("empty")).otherwise(TextFunctions.langPick(scores, text)).as("lang"),
      when(blank, lit(1.0))
        .otherwise(best.cast("double") / greatest(size(toks), lit(1))).as("score"))
  }

  /** Translation backend. Implementations must be Serializable; the
    * production impl wraps a rate-limited client in mapPartitions.
    */
  trait Translator extends Serializable {
    def translate(text: String, targetLang: String): String
  }

  /** Deterministic offline translator: token-wise dictionary with
    * pass-through for unknown words.
    */
  final case class DictTranslator(dict: Map[String, String]) extends Translator {
    def translate(text: String, targetLang: String): String =
      text.split(" ").map(t => dict.getOrElse(t, t)).mkString(" ")
  }

  /** U2 — conditional translation (Translator.py:96-128): translate only
    * rows not already in the target language with confidence > minScore;
    * skipped rows carry the original text. Null-normalizes first (P18).
    */
  def translateColumn(df: DataFrame, textCol: String, outCol: String,
                      targetLang: String, translator: Translator,
                      minScore: Double = 0.9): DataFrame = {
    val tUdf = udf((s: String) => translator.translate(s, targetLang))
    val det = detectLanguage(col(textCol))
    df.withColumn("__det", det)
      .withColumn(outCol,
        when(col(s"__det.lang") === "empty", lit(""))
          .when(col(s"__det.lang") === targetLang && col(s"__det.score") > minScore,
            coalesce(col(textCol), lit("")))
          .otherwise(tUdf(coalesce(col(textCol), lit("")))))
      .withColumn("lang", col("__det.lang"))
      .withColumn("lang_score", col("__det.score"))
      .drop("__det")
  }

  /** Partial-output resume (Translator.py:52-61,113-125): rows whose key
    * already has a non-null translation in `existing` keep it; only the
    * remainder is (re)translated. Re-running is idempotent — the
    * incremental left-join analog of the reference's checkpoint-every-100
    * rows.
    */
  def resumeTranslation(input: DataFrame, existing: DataFrame, keyCol: String,
                        textCol: String, outCol: String, targetLang: String,
                        translator: Translator, minScore: Double = 0.9): DataFrame = {
    val done = existing
      .filter(col(outCol).isNotNull)
      .select(col(keyCol), col(outCol).as("__done"))
    val joined = input.join(done, Seq(keyCol), "left_outer")
    val todo = joined.filter(col("__done").isNull).drop("__done")
    val kept = joined.filter(col("__done").isNotNull)
      .withColumn(outCol, col("__done")).drop("__done")
      .withColumn("lang", lit(null).cast("string"))
      .withColumn("lang_score", lit(null).cast("double"))
    translateColumn(todo, textCol, outCol, targetLang, translator, minScore)
      .unionByName(kept)
  }
}
