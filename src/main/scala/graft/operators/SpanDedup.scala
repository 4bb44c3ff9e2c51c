package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-SPAN dedup (Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better" — the ExactSubstr half;
  * the paper's other half, NearDup, is [[Dedup.nearDupPairs]]).
  * Document-grain dedup (x01) and near-dup clustering (g02) leave a
  * corpus where the same boilerplate paragraph — a license header, a
  * navigation footer, a templated disclaimer — recurs verbatim inside
  * otherwise-distinct documents. ExactSubstr removes every SECOND-and-
  * later occurrence of any duplicated k-token span while keeping one
  * canonical copy, at sub-document grain.
  *
  * The reference engine uses a single-node suffix array; the Spark-first
  * re-expression uses the paper's own reduction — every duplicated
  * substring of ≥ k tokens contains a duplicated k-token gram, and
  * masking the duplicated grams' occurrences removes exactly the
  * duplicated spans (adjacent duplicated grams merge into one longer
  * masked span for free, since coverage is positional):
  *
  *  1. per doc, positional k-gram hashes — one narrow codegen'd
  *     projection (`transform` over the token-hash array, no shuffle);
  *  2. explode to (gram_hash, doc, pos) occurrences — |corpus tokens|
  *     rows, the same token-grain cardinality t04/a04 already shuffle;
  *  3. ONE hash-partitioned agg per gram: occurrence count + global
  *     first occurrence (`min(struct(doc, pos))` — map-side
  *     combinable, so the shuffle carries partial aggregates, not raw
  *     occurrences);
  *  4. duplicated grams (count > 1) join back to occurrences on the
  *     gram hash (hash equi-join, AQE-broadcastable when the duplicated
  *     set is small) — every occurrence EXCEPT the global first becomes
  *     a masked span start;
  *  5. per-doc coverage: sorted span starts collapse into kept tokens
  *     with an index-aware `filter` HOF — O(tokens × doc's masked
  *     starts), driver never involved.
  *
  * All hash math is the m01 integer discipline (mod 1e9+7), so the
  * DuckDB oracle reproduces every gram hash and the final cleaned text
  * bit-exactly.
  */
object SpanDedup {
  private val P = Dedup.P

  /** POSITIONAL k-gram hashes: element i (1-based) hashes tokens
    * [i, i+k). [[Dedup.shingleHashes]] minus the distinct — position
    * is the payload here, multiplicity included (an internal repeat is
    * a duplicated span too).
    */
  def positionalGramHashes(tokHashes: Column, k: Int): Column =
    when(size(tokHashes) < k, array().cast("array<long>")).otherwise(
      transform(sequence(lit(1), size(tokHashes) - (k - 1)), i =>
        (0 until k).foldLeft(lit(0L): Column)((acc, j) =>
          (acc * TextFunctions.HashMul + element_at(tokHashes, i + lit(j))) % P)))

  def sqlPositionalGramHashes(hsE: String, k: Int): String = {
    val fold = (0 until k).foldLeft("CAST(0 AS BIGINT)")((acc, j) =>
      s"(($acc) * ${TextFunctions.HashMul} + $hsE[i + $j]) % $P")
    s"CASE WHEN len($hsE) < $k THEN [] ELSE " +
      s"[$fold for i in range(1, len($hsE) - ${k - 2})] END"
  }

  /** (id, toks, grams): tokens plus positional gram hashes, each
    * intermediate bound to its own projection (the
    * [[Dedup.withShingleHashes]] CollapseProject discipline — inlining
    * the token-hash transform re-evaluates it per element_at).
    */
  def withPositionalGrams(docs: DataFrame, idCol: String, textCol: String,
                          k: Int): DataFrame =
    docs
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("id"), col("toks"), transform(col("toks"),
        t => graft.plans.DedupExprs.rollingHash(t)).as("__th"))
      .select(col("id"), col("toks"),
        positionalGramHashes(col("__th"), k).as("grams"))

  /** Masked span starts per doc: every occurrence of a duplicated
    * k-gram except the corpus-global first (min (doc, pos) — the
    * deterministic keep-first rule). Output (id, starts) with starts a
    * sorted array of 1-based token positions, present only for docs
    * that lose at least one span.
    */
  def maskedSpanStarts(grams: DataFrame): DataFrame = {
    val occ = grams.select(col("id"), posexplode(col("grams")).as(Seq("p0", "h")))
      .select(col("id"), (col("p0") + 1).as("pos"), col("h"))
    // one map-side-combinable agg per gram: count + global first
    val firsts = occ.groupBy("h")
      .agg(count(lit(1)).as("n"),
        min(struct(col("id"), col("pos"))).as("first"))
      .filter(col("n") > 1)
      .select(col("h"), col("first.id").as("f_id"), col("first.pos").as("f_pos"))
    occ.join(firsts, Seq("h"))
      .filter(!(col("id") === col("f_id") && col("pos") === col("f_pos")))
      .groupBy("id")
      .agg(sort_array(collect_set(col("pos"))).as("starts"))
  }

  /** The full operator: docs → (id, n_tokens, n_removed, clean_text).
    * A token (0-based j) survives iff no masked start s covers it
    * (s ≤ j+1 < s+k); cleaned text re-joins the survivors. Docs with
    * no duplicated span pass through with n_removed = 0.
    */
  def removeDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                            k: Int): DataFrame = {
    // grams feeds BOTH the mask computation and the reassembly join —
    // persist or the tokenize→token-hash→gram subtree plans twice (the
    // t09/m01 shared-frame discipline)
    val grams = withPositionalGrams(docs, idCol, textCol, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val masked = maskedSpanStarts(grams)
    grams.join(masked, Seq("id"), "left")
      .select(col("id"), col("toks"),
        coalesce(col("starts"), array().cast("array<int>")).as("starts"))
      .select(col("id"), col("toks"),
        filter(col("toks"), (t, j) =>
          !exists(col("starts"), s => s <= j + 1 && j + 1 < s + lit(k)))
          .as("kept"))
      .select(col("id"),
        size(col("toks")).as("n_tokens"),
        (size(col("toks")) - size(col("kept"))).as("n_removed"),
        array_join(col("kept"), " ").as("clean_text"))
  }
}
