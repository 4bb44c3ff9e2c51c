package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline extensions
  * (builder prompt; reference analogs: Translator.py:67-94 language
  * detection, ExploratoryAnalysis.py:88 token flatten).
  *
  * Every function here is a pure Catalyst Column expression (codegen'd,
  * no UDFs) and has a DuckDB-SQL twin (`sql*`) that computes the exact
  * same integers/doubles, so oracle comparisons are bit-identical.
  * The portable hash is integer-only math (mod 1e9+7 keeps every
  * intermediate < 2^36, safe from 64-bit overflow in both engines).
  */
object TextFunctions {
  val HashP = 1000000007L
  val HashMul = 31L

  /** Whitespace tokenization (ref: caption/hashtag splitting). */
  def tokens(c: Column): Column = split(c, " ")
  def sqlTokens(e: String): String = s"string_split($e, ' ')"

  /** Polynomial rolling hash h = fold(h*31 + ascii(ch)) mod p — the
    * document-fingerprint primitive. Same value in Spark and DuckDB.
    *
    * Computed by the native codegen'd [[graft.plans.RollingHashExpr]]
    * (one pass over the UTF8 bytes inside whole-stage codegen). The
    * portable HOF twin below is what the DuckDB oracle mirrors; values
    * are identical for 7-bit ASCII input (the whole corpus — pinned by
    * ExpressionSpec) and byte-level beyond ASCII. The HOF form
    * allocates a position array and an O(n) substring per character —
    * O(n²) per string, 25× the whole bench cost of t04/x02 once the
    * bench stopped letting count() prune fingerprint columns.
    */
  def rollingHash(c: Column): Column = graft.plans.DedupExprs.rollingHash(c)

  /** The portable higher-order-function formulation of [[rollingHash]]
    * — the integer recurrence the DuckDB oracle runs, kept as the
    * cross-engine semantic definition and pinned ≡ native by spec.
    */
  def rollingHashPortable(c: Column): Column =
    when(length(c) === 0, lit(0L)).otherwise(
      aggregate(
        sequence(lit(1), length(c)),
        lit(0L),
        (acc, i) => (acc * HashMul + ascii(c.substr(i, lit(1)))) % HashP))
  def sqlRollingHash(e: String): String =
    s"CASE WHEN len($e) = 0 THEN 0 ELSE list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"[ascii(substr($e, i, 1)) for i in range(1, len($e) + 1)]), " +
      s"(a, b) -> (a * $HashMul + b) % $HashP) END"

  /** Word k-shingles joined with spaces: the unit set for n-gram Jaccard
    * and MinHash dedup.
    */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) < k, array().cast("array<string>")).otherwise(
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => array_join(slice(toks, i, lit(k)), " ")))
  def sqlShingles(toksE: String, k: Int): String =
    s"CASE WHEN len($toksE) < $k THEN [] ELSE " +
      s"[array_to_string(list_slice($toksE, i, i + ${k - 1}), ' ') " +
      s"for i in range(1, len($toksE) - ${k - 2})] END"

  /** Synthetic "dialect" marker sets for the language-ID heuristic. The
    * driver's documents.text is a closed vocabulary, so language identity
    * is defined by disjoint marker-token families (the real-world analog
    * is character-n-gram frequency profiles, same plan shape).
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "datish" -> Seq("data", "row", "column", "table"),
    "perfish" -> Seq("fast", "slow", "big", "small"),
    "sqlish" -> Seq("join", "filter", "window", "agg"),
    "streamish" -> Seq("stream", "batch", "value", "vector"))

  /** Marker-token count (with multiplicity) for one language family. */
  def langScore(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(m => m: Any): _*)))
  def sqlLangScore(toksE: String, markers: Seq[String]): String =
    s"len(list_filter($toksE, t -> list_contains([${markers.map(m => s"'$m'").mkString(", ")}], t)))"

  /** Argmax language with deterministic alphabetical tie-break; empty
    * text → the reference's "empty" sentinel (Translator.py:79).
    */
  def langPick(scores: Seq[(String, Column)], text: Column): Column = {
    val best = scores.map { case (lang, s) =>
      struct(s.as("score"), lit(lang).as("lang"))
    }.reduceLeft { (a, b) =>
      // keep a on ties: alphabetical order of construction wins
      when(b.getField("score") > a.getField("score"), b).otherwise(a)
    }
    when(length(text) === 0, lit("empty")).otherwise(best.getField("lang"))
  }
  def sqlLangPick(scoreExprs: Seq[(String, String)], textE: String): String = {
    val cases = scoreExprs.map { case (lang, s) =>
      val others = scoreExprs.filterNot(_._1 == lang)
        .map { case (l2, s2) => if (l2 < lang) s"$s > $s2" else s"$s >= $s2" }
      s"WHEN ${others.mkString(" AND ")} THEN '$lang'"
    }
    s"CASE WHEN len($textE) = 0 THEN 'empty' ${cases.mkString(" ")} END"
  }

  /** Stopword set for the quality ratio (ref: quality scoring extension). */
  val stopwords: Seq[String] = Seq("the", "a")

  /** BPE-ish segmentation pattern: runs of letters, runs of digits, or a
    * single other non-space symbol.
    */
  val bpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(bpePattern), lit(0)))
  def sqlBpeTokenCount(e: String): String =
    s"len(regexp_extract_all($e, '$bpePattern'))"

  /** Apply ONE BPE merge to a word: re-segment the character sequence
    * of `w`, greedily merging left-to-right every non-overlapping
    * occurrence of the 2-char pair `p` into a single unit — exactly the
    * tokenizer-training update that follows a t16 pair-count round
    * (merge the winning pair everywhere, recount, repeat). Greedy
    * non-overlap is the real BPE rule: in "aaaa" with pair "aa" the
    * merges are positions 1 and 3, never 2 ("aaa" → ["aa","a"]).
    *
    * Returns the unit array. Implemented as a single left fold
    * ([[org.apache.spark.sql.functions.aggregate]]) over character
    * positions carrying (units-so-far, skip-next) state — a pure
    * per-row Column expression, no explode, no shuffle: at corpus
    * scale the merge application is a map. The sequential-state fold
    * is what plain windows cannot express when p's halves are equal
    * (consecutive overlapping matches); the oracle states the same
    * semantics through the islands/run-parity window formulation and
    * PropertySpec pins fold ≡ islands on real data.
    */
  def bpeApplyMerge(w: Column, p: Column): Column = {
    def st(us: Column, skip: Column) = struct(us.as("us"), skip.as("skip"))
    aggregate(
      sequence(lit(1), length(w)), // callers must drop empty words: sequence(1,0) descends
      st(array().cast("array<string>"), lit(0)),
      (acc, i) => {
        val us = acc.getField("us")
        val skip = acc.getField("skip")
        when(skip === 1, st(us, lit(0)))
          .when(i < length(w) && w.substr(i, lit(2)) === p,
            st(concat(us, array(w.substr(i, lit(2)))), lit(1)))
          .otherwise(st(concat(us, array(w.substr(i, lit(1)))), lit(0)))
      },
      acc => acc.getField("us"))
  }
}
