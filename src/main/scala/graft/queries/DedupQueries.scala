package graft.queries

import graft.{GraftQuery, Tables}
import graft.functions.TextFunctions
import graft.operators.Dedup
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication query suite over `documents`/`events`: exact dedup,
  * MinHash+LSH near-dup with exact Jaccard verification, SimHash banded
  * Hamming pairs, and n-gram Jaccard similarity. Each oracle rebuilds the
  * identical integer/double pipeline in DuckDB SQL.
  */
object DedupQueries {
  private val P = Dedup.P

  /** Exact dedup with duplicate-cardinality audit (ref:
    * Preprocessor.py:161-167): events deduped by props, keeping the first
    * event_id, with the group size carried.
    */
  val x01ExactDedup: GraftQuery = GraftQuery(
    "x01_exact_dedup",
    """WITH ranked AS (
      |  SELECT props, event_id,
      |         row_number() OVER (PARTITION BY props ORDER BY event_id) AS rn,
      |         COUNT(*) OVER (PARTITION BY props) AS n_dups
      |  FROM events)
      |SELECT props, event_id AS first_event_id, n_dups
      |FROM ranked WHERE rn = 1 ORDER BY props""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy("props")
    Tables.events(spark, dir)
      .select(col("props"), col("event_id"),
        row_number().over(w.orderBy("event_id")).as("rn"),
        count(lit(1)).over(w).as("n_dups"))
      .filter(col("rn") === 1)
      .select(col("props"), col("event_id").as("first_event_id"), col("n_dups"))
      .orderBy("props")
  }

  /** Exact content-dedup summary on the order-independent sorted-token
    * fingerprint — the hash-groupBy dedup primitive at corpus scale.
    */
  val x02DedupSummary: GraftQuery = GraftQuery(
    "x02_dedup_summary", {
      val fpE = TextFunctions.sqlRollingHash(
        s"array_to_string(list_sort(${TextFunctions.sqlTokens("text")}), ' ')")
      s"""WITH fp AS (SELECT $fpE AS fps FROM documents)
         |SELECT COUNT(*) AS n_docs, COUNT(DISTINCT fps) AS n_unique,
         |       COUNT(*) - COUNT(DISTINCT fps) AS n_dups
         |FROM fp""".stripMargin
    }) { (spark, dir) =>
    val fp = TextFunctions.rollingHash(
      array_join(array_sort(TextFunctions.tokens(col("text"))), " "))
    Tables.documents(spark, dir)
      .select(fp.as("fps"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("fps")).as("n_unique"))
      .withColumn("n_dups", col("n_docs") - col("n_unique"))
  }

  private[queries] val ShingleK = 2
  private[queries] val NumPerms = 16
  private[queries] val Bands = 8

  /** M1 — MinHash + LSH near-duplicate detection: shingle → 16 minhash
    * sigs → 8 banded buckets → candidate join → exact-Jaccard verify;
    * top-100 pairs plus the candidate-count audit.
    */
  /** Shared CTE chain producing the LSH candidate pairs — the edge set
    * both m01 (verify + top-k) and g02 (duplicate-group clustering)
    * consume.
    */
  private[queries] def sqlCandCtes: String = {
    val perms = Dedup.permConstants(NumPerms)
    val shsE = Dedup.sqlShingleHashes(Dedup.sqlTokenHashes("text"), ShingleK)
    val sigCols = perms.zipWithIndex.map { case ((a, b), i) =>
      s"${Dedup.sqlMinHashSig("shs", a, b)} AS sig_$i"
    }
    val bandSelects = (0 until Bands).map(b =>
      s"SELECT id, $b AS band_id, sig_${2 * b} * $P + sig_${2 * b + 1} AS band_key FROM sigs")
    s"""docs AS (SELECT doc_id AS id, $shsE AS shs FROM documents),
       |sigs AS (SELECT id, ${sigCols.mkString(", ")} FROM docs),
       |banded AS (${bandSelects.mkString("\nUNION ALL\n")}),
       |cand AS (
       |  SELECT DISTINCT x.id AS id_a, y.id AS id_b
       |  FROM banded x JOIN banded y
       |    ON x.band_id = y.band_id AND x.band_key = y.band_key AND x.id < y.id)""".stripMargin
  }

  val m01MinHashLsh: GraftQuery = GraftQuery(
    "m01_minhash_lsh", {
      s"""WITH $sqlCandCtes,
         |verified AS (
         |  SELECT id_a, id_b, ${Dedup.sqlJaccard("a.shs", "b.shs")} AS jaccard
         |  FROM cand JOIN docs a ON cand.id_a = a.id JOIN docs b ON cand.id_b = b.id),
         |top AS (SELECT * FROM verified ORDER BY jaccard DESC, id_a, id_b LIMIT 100)
         |SELECT id_a, id_b, jaccard, t.n_candidates
         |FROM top CROSS JOIN (SELECT COUNT(*) AS n_candidates FROM verified) t
         |ORDER BY jaccard DESC, id_a, id_b""".stripMargin
    }) { (spark, dir) =>
    // the verified pair list feeds both the audit count and the top-100;
    // persist it or the candidate join + verify subtree plans twice
    val pairs = Dedup.nearDupPairs(
      Tables.documents(spark, dir), "doc_id", "text", ShingleK, NumPerms, Bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = pairs.agg(count(lit(1)).as("n_candidates"))
    pairs.orderBy(desc("jaccard"), asc("id_a"), asc("id_b")).limit(100)
      .crossJoin(broadcast(total))
      .orderBy(desc("jaccard"), asc("id_a"), asc("id_b"))
  }

  private val SimBits = 32
  // 2×16-bit chunks: on this closed-vocabulary corpus simhashes correlate
  // heavily, and 8-bit chunks collide for ~94% of pairs (quadratic
  // candidates). 16-bit chunks guarantee recall for hamming ≤ 1 and find
  // hamming ≤ 6 probabilistically — the standard precision/recall knob.
  private val ChunkBits = 16

  /** S1 — SimHash near-dup: 32-bit fingerprint from token-hash bit votes,
    * 8-bit banded chunk join for candidates, exact Hamming distance;
    * top-100 closest pairs plus candidate-count audit.
    */
  val s01SimHash: GraftQuery = GraftQuery(
    "s01_simhash_pairs", {
      val hsE = Dedup.sqlTokenHashes("text")
      val chunkSelects = (0 until SimBits / ChunkBits).map(c =>
        s"SELECT id, sim, $c AS chunk_id, (sim >> ${c * ChunkBits}) & ${(1L << ChunkBits) - 1} AS chunk_key FROM sims")
      s"""WITH hs AS (SELECT doc_id AS id, $hsE AS hs FROM documents),
         |sims AS (SELECT id, ${Dedup.sqlSimHash("hs", SimBits)} AS sim FROM hs),
         |chunked AS (${chunkSelects.mkString("\nUNION ALL\n")}),
         |cand AS (
         |  SELECT DISTINCT x.id AS id_a, y.id AS id_b,
         |         CAST(bit_count(xor(x.sim, y.sim)) AS BIGINT) AS hamming
         |  FROM chunked x JOIN chunked y
         |    ON x.chunk_id = y.chunk_id AND x.chunk_key = y.chunk_key AND x.id < y.id),
         |top AS (SELECT * FROM cand ORDER BY hamming, id_a, id_b LIMIT 100)
         |SELECT id_a, id_b, hamming, t.n_candidates
         |FROM top CROSS JOIN (SELECT COUNT(*) AS n_candidates FROM cand) t
         |ORDER BY hamming, id_a, id_b""".stripMargin
    }) { (spark, dir) =>
    // same persist-before-fanout rule as m01: count + top-100 both read it
    // simhash fingerprinting is scan-stage per-row work on a single-row-
    // group gate file — parallelize the scan (guide §2.5; measured
    // 1.3 -> 0.7 s, fingerprinting scales with cores again)
    val pairs = Dedup.simHashPairs(
      Tables.parallelizeSmallScan(Tables.documents(spark, dir), dir, "documents"),
      "doc_id", "text", SimBits, ChunkBits)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = pairs.agg(count(lit(1)).as("n_candidates"))
    pairs.orderBy(asc("hamming"), asc("id_a"), asc("id_b")).limit(100)
      .crossJoin(broadcast(total))
      .orderBy(asc("hamming"), asc("id_a"), asc("id_b"))
  }

  /** S1b — the PRODUCTION SimHash config under a full oracle:
    * `withSimHash(bits = 64, mix64 = true)` with 4×16-bit chunks — the
    * scale path (the 32-bit gate form's 16-bit chunk ceiling pockets
    * candidates quadratically at ≥500k docs, measured in BENCH_SCALE).
    * mix64 widens each ~30-bit rolling hash through xxhash64 so all 64
    * fingerprint bits carry signal; the oracle re-derives that exact
    * arithmetic ([[Dedup.sqlXxh64Ctes]]) plus the 64-bit majority vote
    * with a signed bit-63, then the identical chunk join / Hamming /
    * top-100 shape as `s01`.
    */
  val s01bSimHash64: GraftQuery = GraftQuery(
    "s01b_simhash64_pairs", {
      val bits = 64
      val hsE = Dedup.sqlTokenHashes("text")
      val chunkSelects = (0 until bits / ChunkBits).map(c =>
        s"SELECT id, sim, $c AS chunk_id, (sim >> ${c * ChunkBits}) & ${(1L << ChunkBits) - 1} AS chunk_key FROM sims")
      s"""WITH hs AS (SELECT doc_id AS id, $hsE AS hs FROM documents),
         |${Dedup.sqlXxh64Ctes("hs", "hs")},
         |sims AS (SELECT id, ${Dedup.sqlSimHashU("mh", bits)} AS sim FROM mixed),
         |chunked AS (${chunkSelects.mkString("\nUNION ALL\n")}),
         |cand AS (
         |  SELECT DISTINCT x.id AS id_a, y.id AS id_b,
         |         CAST(bit_count(xor(x.sim, y.sim)) AS BIGINT) AS hamming
         |  FROM chunked x JOIN chunked y
         |    ON x.chunk_id = y.chunk_id AND x.chunk_key = y.chunk_key AND x.id < y.id),
         |top AS (SELECT * FROM cand ORDER BY hamming, id_a, id_b LIMIT 100)
         |SELECT id_a, id_b, hamming, t.n_candidates
         |FROM top CROSS JOIN (SELECT COUNT(*) AS n_candidates FROM cand) t
         |ORDER BY hamming, id_a, id_b""".stripMargin
    }) { (spark, dir) =>
    val pairs = Dedup.simHashPairs(
      Tables.parallelizeSmallScan(Tables.documents(spark, dir), dir, "documents"),
      "doc_id", "text", 64, ChunkBits, mix64 = true)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = pairs.agg(count(lit(1)).as("n_candidates"))
    pairs.orderBy(asc("hamming"), asc("id_a"), asc("id_b")).limit(100)
      .crossJoin(broadcast(total))
      .orderBy(asc("hamming"), asc("id_a"), asc("id_b"))
  }

  /** M2 — MinHash ESTIMATOR quality against exact Jaccard, per
    * consecutive-id pair: the estimate (matching signature positions /
    * numPerms) sits next to the exact set Jaccard, so the estimator the
    * LSH pipeline thresholds on is itself gated — including the exact
    * integer signature positions it counts.
    */
  val m02MinHashEstimate: GraftQuery = GraftQuery(
    "m02_minhash_estimate", {
      val perms = Dedup.permConstants(NumPerms)
      val shsE = Dedup.sqlShingleHashes(Dedup.sqlTokenHashes("text"), ShingleK)
      val sigCols = perms.zipWithIndex.map { case ((a, b), i) =>
        s"${Dedup.sqlMinHashSig("shs", a, b)} AS sig_$i"
      }
      val matches = (0 until NumPerms)
        .map(i => s"CASE WHEN a.sig_$i = b.sig_$i THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH docs AS (SELECT doc_id AS id, $shsE AS shs FROM documents),
         |sigs AS (SELECT id, shs, ${sigCols.mkString(", ")} FROM docs)
         |SELECT a.id AS id_a, b.id AS id_b,
         |       (CAST($matches AS DOUBLE) / $NumPerms.0) AS jaccard_est,
         |       ${Dedup.sqlJaccard("a.shs", "b.shs")} AS jaccard_exact
         |FROM sigs a JOIN sigs b ON b.id = a.id + 1
         |ORDER BY a.id""".stripMargin
    }) { (spark, dir) =>
    // the signature frame feeds both self-join sides — persist (m01 rule)
    val f = Dedup.withShingleHashes(
        Tables.documents(spark, dir), "doc_id", "text", ShingleK)
      .select(col("id"), col("shs"),
        graft.plans.DedupExprs.minHashSigs(col("shs"), NumPerms).as("sigs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    f.as("a").join(f.as("b"), col("b.id") === col("a.id") + 1)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (aggregate(zip_with(col("a.sigs"), col("b.sigs"),
            (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), _ + _).cast("double") / NumPerms).as("jaccard_est"),
        Dedup.jaccard(col("a.shs"), col("b.shs")).as("jaccard_exact"))
      .orderBy("id_a")
  }

  /** M3 — estimator-verified near-dup ([[Dedup.nearDupPairsEstimated]]):
    * the 100 TB verification form — candidates verified by matching
    * signature positions (16 longs/side) instead of re-joining full
    * shingle sets (the dominant shuffle of m01 at scale). Threshold
    * ≥ 0.25 (4/16 positions); the estimator's fidelity to exact Jaccard
    * is m02's gate. Top-100 by estimate + the thresholded-candidate
    * audit count.
    */
  val m03NearDupEstimated: GraftQuery = GraftQuery(
    "m03_neardup_estimated", {
      val perms = Dedup.permConstants(NumPerms)
      val sigCols = perms.zipWithIndex.map { case ((a, b), i) =>
        s"${Dedup.sqlMinHashSig("shs", a, b)} AS sig_$i"
      }
      val matches = (0 until NumPerms)
        .map(i => s"CASE WHEN a.sig_$i = b.sig_$i THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH $sqlCandCtes,
         |est AS (
         |  SELECT id_a, id_b, (CAST($matches AS DOUBLE) / $NumPerms.0) AS jaccard_est
         |  FROM cand JOIN sigs a ON cand.id_a = a.id JOIN sigs b ON cand.id_b = b.id
         |  WHERE (CAST($matches AS DOUBLE) / $NumPerms.0) >= 0.25),
         |top AS (SELECT * FROM est ORDER BY jaccard_est DESC, id_a, id_b LIMIT 100)
         |SELECT id_a, id_b, jaccard_est, t.n_candidates
         |FROM top CROSS JOIN (SELECT COUNT(*) AS n_candidates FROM est) t
         |ORDER BY jaccard_est DESC, id_a, id_b""".stripMargin
    }) { (spark, dir) =>
    val pairs = Dedup.nearDupPairsEstimated(
      Tables.documents(spark, dir), "doc_id", "text", ShingleK, NumPerms, Bands,
      minEstimate = 0.25)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = pairs.agg(count(lit(1)).as("n_candidates"))
    pairs.orderBy(desc("jaccard_est"), asc("id_a"), asc("id_b")).limit(100)
      .crossJoin(broadcast(total))
      .orderBy(desc("jaccard_est"), asc("id_a"), asc("id_b"))
  }

  /** M4 — near-dup THRESHOLD TUNING CURVE (e14's job for the MinHash
    * family): for every candidate threshold t/16, how many pairs the
    * 16-position estimator would admit vs how many exact Jaccard
    * admits — the table that justifies m03's ≥ 4/16 production choice
    * instead of guessing it. Measured on the consecutive-id pair set
    * (m02's unbiased O(n) probe of the pair space). The exact side is
    * binned by PURE INTEGER arithmetic — `(16·|∩|) div |∪| ≥ t` ⟺
    * `J ≥ t/16` — so no float division order can move a boundary pair.
    *
    * Scale shape: one signature/shingle scan builds the pair probes;
    * both curves then collapse to a ≤17×17 (est_bin, exact_bin)
    * histogram via a map-side-combinable agg, and the 13-threshold
    * readout is a broadcast cross join over that tiny table — the
    * threshold sweep costs O(1) beyond the scan, never 13 passes.
    */
  val m04ThresholdCurve: GraftQuery = GraftQuery(
    "m04_threshold_curve", {
      val perms = Dedup.permConstants(NumPerms)
      val shsE = Dedup.sqlShingleHashes(Dedup.sqlTokenHashes("text"), ShingleK)
      val sigCols = perms.zipWithIndex.map { case ((a, b), i) =>
        s"${Dedup.sqlMinHashSig("shs", a, b)} AS sig_$i"
      }
      val matches = (0 until NumPerms)
        .map(i => s"CASE WHEN a.sig_$i = b.sig_$i THEN 1 ELSE 0 END")
        .mkString(" + ")
      val interE = "len(list_filter(a.shs, x -> list_contains(b.shs, x)))"
      s"""WITH docs AS (SELECT doc_id AS id, $shsE AS shs FROM documents),
         |sigs AS (SELECT id, shs, ${sigCols.mkString(", ")} FROM docs),
         |pairs AS (
         |  SELECT ($matches) AS m_est, $interE AS inter,
         |         (len(a.shs) + len(b.shs) - $interE) AS uni
         |  FROM sigs a JOIN sigs b ON b.id = a.id + 1),
         |binned AS (
         |  SELECT m_est, ($NumPerms * inter) // uni AS m_ex FROM pairs),
         |thr AS (SELECT unnest(range(4, ${NumPerms + 1})) AS t)
         |SELECT CAST(t.t AS BIGINT) AS t_sixteenths,
         |       (CAST(t.t AS DOUBLE) / $NumPerms.0) AS threshold,
         |       CAST(SUM(CASE WHEN b.m_est >= t.t THEN 1 ELSE 0 END) AS BIGINT) AS n_est,
         |       CAST(SUM(CASE WHEN b.m_ex >= t.t THEN 1 ELSE 0 END) AS BIGINT) AS n_exact
         |FROM binned b CROSS JOIN thr t
         |GROUP BY 1, 2 ORDER BY 1""".stripMargin
    }) { (spark, dir) =>
    val f = Dedup.withShingleHashes(
        Tables.documents(spark, dir), "doc_id", "text", ShingleK)
      .select(col("id"), col("shs"),
        graft.plans.DedupExprs.minHashSigs(col("shs"), NumPerms).as("sigs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val inter = size(array_intersect(col("a.shs"), col("b.shs")))
    val pairs = f.as("a").join(f.as("b"), col("b.id") === col("a.id") + 1)
      .select(
        aggregate(zip_with(col("a.sigs"), col("b.sigs"),
            (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), _ + _).as("m_est"),
        inter.as("inter"),
        (size(col("a.shs")) + size(col("b.shs")) - inter).as("uni"))
    val hist = pairs
      .select(col("m_est"), expr(s"($NumPerms * inter) div uni").as("m_ex"))
      .groupBy("m_est", "m_ex").agg(count(lit(1)).as("n"))
    val thr = spark.range(4, NumPerms + 1).select(col("id").as("t"))
    hist.crossJoin(broadcast(thr))
      .groupBy(col("t").as("t_sixteenths"),
        (col("t").cast("double") / NumPerms).as("threshold"))
      .agg(sum(when(col("m_est") >= col("t"), col("n")).otherwise(0L)).as("n_est"),
        sum(when(col("m_ex") >= col("t"), col("n")).otherwise(0L)).as("n_exact"))
      .orderBy("t_sixteenths")
  }

  /** G1 — n-gram (word-bigram) Jaccard similarity over a deterministic
    * pair set (consecutive doc ids) — the exact-similarity scalar the LSH
    * pipelines approximate.
    */
  val g01NgramJaccard: GraftQuery = GraftQuery(
    "g01_ngram_jaccard", {
      val shsE = Dedup.sqlShingleHashes(Dedup.sqlTokenHashes("text"), ShingleK)
      s"""WITH docs AS (SELECT doc_id AS id, $shsE AS shs FROM documents)
         |SELECT a.id AS id_a, b.id AS id_b,
         |       ${Dedup.sqlJaccard("a.shs", "b.shs")} AS jaccard
         |FROM docs a JOIN docs b ON b.id = a.id + 1
         |ORDER BY a.id""".stripMargin
    }) { (spark, dir) =>
    val docs = Dedup.withShingleHashes(
      Tables.documents(spark, dir), "doc_id", "text", ShingleK)
    docs.as("a").join(docs.as("b"), col("b.id") === col("a.id") + 1)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        Dedup.jaccard(col("a.shs"), col("b.shs")).as("jaccard"))
      .orderBy("id_a")
  }

  /** X3 — salted two-phase aggregation (operators/Skew.saltedAggregate):
    * the hot-key mitigation is salt-invariant, so the oracle is the plain
    * GROUP BY — any divergence means the two-phase merge lost rows or
    * precision. (The salt derives from partition-dependent ids on the
    * Spark side; correctness must not depend on it, and this query is the
    * proof.)
    */
  val x03SaltedAgg: GraftQuery = GraftQuery(
    "x03_salted_agg",
    """SELECT event_type AS key, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    graft.operators.Skew.saltedAggregate(
      Tables.events(spark, dir), col("event_type"), col("value"), saltBuckets = 8)
      .orderBy("key")
  }

  /** Incremental corpus dedup under the gate: the documents table arrives
    * as two batches (even doc_ids, then odd), each deduped within itself
    * and against the persistent key store via
    * [[graft.operators.IncrementalDedup.dedupeBatch]] — O(batch) work per
    * batch, never O(corpus). The union of the two batches' survivors must
    * equal a global first-per-content-key dedup ordered by (batch, then
    * doc_id), which is what the oracle computes in one window — the
    * incremental path and the backfill path agree exactly.
    */
  val x04IncrementalDedup: GraftQuery = GraftQuery(
    "x04_incremental_dedup", {
      // key = hash of the first-2-token prefix, not the full text: the
      // synthetic corpus has no exact-duplicate texts, and a key with real
      // collisions makes the gate exercise both dedup paths (within-batch
      // and cross-batch anti-join) instead of passing rows through
      val keyE = TextFunctions.sqlRollingHash(
        s"array_to_string(list_slice(${TextFunctions.sqlTokens("text")}, 1, 2), ' ')")
      s"""WITH keyed AS (SELECT doc_id, source, $keyE AS k FROM documents),
         |ranked AS (
         |  SELECT doc_id, source,
         |         row_number() OVER (PARTITION BY k ORDER BY doc_id % 2, doc_id) AS rn
         |  FROM keyed)
         |SELECT doc_id, source FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin
    }) { (spark, dir) =>
    val store = Dsl.tempStore("x04_store")
    val docs = Tables.documents(spark, dir).select("doc_id", "source", "text")
    val key = TextFunctions.rollingHash(
      array_join(slice(TextFunctions.tokens(col("text")), 1, 2), " "))
    val batches = Seq(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1))
    batches.map(b =>
        graft.operators.IncrementalDedup.dedupeBatch(b, key, Seq(col("doc_id")), store))
      .reduce(_ unionByName _)
      .select("doc_id", "source")
      .orderBy("doc_id")
  }

  /** Salted skew-resistant join under the gate (the plan-level hot-key
    * tool, [[graft.operators.Skew.saltedBroadcastableJoin]]): events join
    * a per-type dim on `event_type` — a handful of values, i.e. every key
    * is hot — with the small side replicated per salt bucket and the big
    * side salted. The result multiset must equal the plain inner join,
    * which is exactly what the oracle computes; the per-type row count
    * doubling as a dim-column check (n = type_n for every group).
    */
  val x05SaltedJoin: GraftQuery = GraftQuery(
    "x05_salted_join",
    s"""WITH dim AS (SELECT event_type, COUNT(*) AS type_n FROM events GROUP BY event_type)
       |SELECT e.event_type, COUNT(*) AS n, MIN(d.type_n) AS type_n,
       |       ${graft.Det.sqlSum("e.value", 6)} AS sum_value
       |FROM events e JOIN dim d USING (event_type)
       |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin) { (spark, dir) =>
    val events = Tables.events(spark, dir)
    val dim = events.groupBy("event_type").agg(count(lit(1)).as("type_n"))
    graft.operators.Skew.saltedBroadcastableJoin(events, dim, "event_type", 8)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), min(col("type_n")).as("type_n"),
        graft.Det.dsum(col("value"), 6).as("sum_value"))
      .orderBy("event_type")
  }

  /** X6 — changelog upsert ([[graft.operators.Upsert]]): the snapshot of
    * the first half-month of events (compacted to the latest row per
    * (user_id, event_type)) merged with the second half as an update
    * batch must equal the full recompaction over all events — the
    * incremental-merge ≡ backfill property. The merge compacts only the
    * BATCH and full-outer-joins the snapshot once; the snapshot is never
    * re-sorted (O(batch), not O(corpus) — the shape that holds when the
    * snapshot is 100 TB and the batch is a day of arrivals).
    */
  val x06UpsertMerge: GraftQuery = GraftQuery(
    "x06_upsert_merge",
    """WITH ranked AS (
      |  SELECT user_id, event_type, event_id, ts, value,
      |         row_number() OVER (PARTITION BY user_id, event_type
      |                            ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |SELECT user_id, event_type, event_id, ts, value
      |FROM ranked WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin) { (spark, dir) =>
    import graft.operators.Upsert
    val keys = Seq("user_id", "event_type")
    val version = Seq("ts", "event_id")
    val events = Tables.events(spark, dir)
      .select("user_id", "event_type", "event_id", "ts", "value")
    val cut = lit("2024-01-16").cast("timestamp")
    val snapshot = Upsert.compact(events.filter(col("ts") < cut), keys, version)
    val batch = events.filter(col("ts") >= cut)
    Upsert.latestWins(snapshot, batch, keys, version)
      .orderBy("user_id", "event_type")
  }

  /** X15 — full MERGE with tombstones ([[graft.operators.Upsert
    * .applyChangeset]]): the `MERGE INTO` shape x06 (upsert only) and
    * x11 (delete only) each cover half of — one changeset carries both
    * updates AND deletes (op = 'D' for event_id % 10 < 2, else 'U';
    * deterministic and oracle-reproducible), the latest change per key
    * is authoritative, and the result snapshot carries an
    * inserted/updated/kept audit column with deleted keys absent.
    * One keyed full-outer join applies the whole day — not an upsert
    * pass plus a delete pass.
    */
  val x15MergeChangeset: GraftQuery = GraftQuery(
    "x15_merge_changeset",
    """WITH snap AS (
      |  SELECT user_id, event_type, event_id, ts, value FROM (
      |    SELECT user_id, event_type, event_id, ts, value,
      |           row_number() OVER (PARTITION BY user_id, event_type
      |                              ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events WHERE ts < TIMESTAMP '2024-01-16')
      |  WHERE rn = 1),
      |chg AS (
      |  SELECT user_id, event_type, event_id, ts, value,
      |         CASE WHEN event_id % 10 < 2 THEN 'D' ELSE 'U' END AS op FROM (
      |    SELECT *,
      |           row_number() OVER (PARTITION BY user_id, event_type
      |                              ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events WHERE ts >= TIMESTAMP '2024-01-16')
      |  WHERE rn = 1),
      |merged AS (
      |  SELECT COALESCE(c.user_id, s.user_id) AS user_id,
      |         COALESCE(c.event_type, s.event_type) AS event_type,
      |         COALESCE(c.event_id, s.event_id) AS event_id,
      |         COALESCE(c.ts, s.ts) AS ts,
      |         COALESCE(c.value, s.value) AS value,
      |         CASE WHEN c.user_id IS NOT NULL AND s.user_id IS NOT NULL THEN 'updated'
      |              WHEN c.user_id IS NOT NULL THEN 'inserted'
      |              ELSE 'kept' END AS action
      |  FROM snap s FULL OUTER JOIN chg c
      |    ON s.user_id = c.user_id AND s.event_type = c.event_type
      |  WHERE c.op IS NULL OR c.op <> 'D')
      |SELECT user_id, event_type, event_id, ts, value, action
      |FROM merged ORDER BY user_id, event_type""".stripMargin) { (spark, dir) =>
    import graft.operators.Upsert
    val keys = Seq("user_id", "event_type")
    val version = Seq("ts", "event_id")
    val events = Tables.events(spark, dir)
      .select("user_id", "event_type", "event_id", "ts", "value")
    val cut = lit("2024-01-16").cast("timestamp")
    val snapshot = Upsert.compact(events.filter(col("ts") < cut), keys, version)
    val changes = events.filter(col("ts") >= cut)
      .withColumn("op", when(col("event_id") % 10 < 2, "D").otherwise("U"))
    Upsert.applyChangeset(snapshot, changes, keys, version)
      .orderBy("user_id", "event_type")
  }

  /** X16 — versioned-store VACUUM (retention for sm07's snapshot
    * store): three batches apply into the store (three committed
    * versions), a retention pass keeps only the newest, and the
    * read-back must still equal the full-history argmax — proving
    * vacuum deletes exactly the EXPIRED versions and never the one
    * readers resolve. The vacuum itself is pure file-listing work
    * (O(versions), no table scan); idempotence, orphan handling and
    * keep>1 windows are spec'd in UpsertStreamSpec.
    */
  val x16StoreVacuum: GraftQuery = GraftQuery(
    "x16_store_vacuum",
    """SELECT user_id, ts AS last_ts, event_id AS last_event_id, value AS last_value
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
      |                                   ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1 ORDER BY user_id""".stripMargin) { (spark, dir) =>
    import graft.streaming.StreamUpsert
    val store = graft.queries.Dsl.tempStore("x16_store")
    val ev = Tables.events(spark, dir)
      .select("user_id", "ts", "event_id", "value")
    val cut1 = lit("2024-01-11").cast("timestamp")
    val cut2 = lit("2024-01-21").cast("timestamp")
    Seq(ev.filter(col("ts") < cut1),
        ev.filter(col("ts") >= cut1 && col("ts") < cut2),
        ev.filter(col("ts") >= cut2))
      .foreach(b => StreamUpsert.applyBatch(spark, store, b,
        keys = Seq("user_id"), version = Seq("ts", "event_id")))
    val deleted = StreamUpsert.vacuum(store, keepVersions = 1)
    require(deleted.nonEmpty, "vacuum found nothing to expire — gate setup broken")
    StreamUpsert.readSnapshot(spark, store).get
      .select(col("user_id"), col("ts").as("last_ts"),
        col("event_id").as("last_event_id"), col("value").as("last_value"))
      .orderBy("user_id")
  }

  /** X17 — TIME TRAVEL over the versioned store
    * ([[graft.streaming.StreamUpsert.readVersion]]): three batches
    * commit three snapshots; reading AS OF the MIDDLE version must
    * reproduce exactly the argmax state over the first two batches'
    * events — the audit/reproduction primitive every lake format ships
    * (read the store a downstream job actually consumed), here on plain
    * parquet + the `_SUCCESS`-gated version protocol. The oracle
    * recomputes that historical state from the raw events, so both the
    * version arithmetic AND snapshot fidelity are hash-gated. The read
    * itself is a plain pruned parquet scan of ONE version directory —
    * no history replay, O(snapshot) at any scale.
    */
  val x17TimeTravel: GraftQuery = GraftQuery(
    "x17_time_travel",
    """SELECT user_id, ts AS last_ts, event_id AS last_event_id, value AS last_value
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
      |                                   ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events WHERE ts < TIMESTAMP '2024-01-21 00:00:00')
      |WHERE rn = 1 ORDER BY user_id""".stripMargin) { (spark, dir) =>
    import graft.streaming.StreamUpsert
    val store = graft.queries.Dsl.tempStore("x17_store")
    val ev = Tables.events(spark, dir)
      .select("user_id", "ts", "event_id", "value")
    val cut1 = lit("2024-01-11").cast("timestamp")
    val cut2 = lit("2024-01-21").cast("timestamp")
    Seq(ev.filter(col("ts") < cut1),
        ev.filter(col("ts") >= cut1 && col("ts") < cut2),
        ev.filter(col("ts") >= cut2))
      .foreach(b => StreamUpsert.applyBatch(spark, store, b,
        keys = Seq("user_id"), version = Seq("ts", "event_id")))
    StreamUpsert.readVersion(spark, store, 1)
      .select(col("user_id"), col("ts").as("last_ts"),
        col("event_id").as("last_event_id"), col("value").as("last_value"))
      .orderBy("user_id")
  }

  /** X7 — bloom-pruned semi join ([[graft.operators.BloomPrune]]): keep
    * lineitems of urgent orders. The big side is pre-pruned by a
    * codegen'd bloom probe of the small side's keys (the explicit form
    * of runtime row-level filtering — ~80% of rows never reach the join
    * exchange here), then the exact semi join runs over the survivors.
    * The oracle is the plain semi join: equality proves false positives
    * are fully absorbed and nothing is falsely dropped.
    */
  val x07BloomSemiJoin: GraftQuery = GraftQuery(
    "x07_bloom_semi_join",
    """SELECT l_returnflag, COUNT(*) AS n,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
      |                     WHERE o_orderpriority = '1-URGENT')
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
    graft.operators.BloomPrune.bloomSemiJoin(
        Tables.lineitem(spark, dir), "l_orderkey", urgent, "o_orderkey")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), graft.Det.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  /** X8 — INCREMENTAL near-dup admission
    * ([[graft.operators.IncrementalNearDup]]): documents arrive in two
    * batches (even ids, then odd ids); each batch is admitted against
    * the persistent banded-signature index and appended to it. The
    * oracle computes the backfill rule directly — blocked ⇔ shares a
    * band with any document earlier in the (batch, id) processing
    * order — so the gate proves batch-by-batch ingestion ≡ backfill,
    * the property that lets a 100 TB corpus near-dedupe per arriving
    * day at O(batch) cost.
    */
  val x08IncrementalNearDup: GraftQuery = GraftQuery(
    "x08_incremental_neardup",
    s"""WITH $sqlCandCtes,
       |blocked AS (
       |  SELECT DISTINCT y.id FROM banded x JOIN banded y
       |    ON x.band_id = y.band_id AND x.band_key = y.band_key
       |   AND ((x.id % 2) < (y.id % 2)
       |        OR ((x.id % 2) = (y.id % 2) AND x.id < y.id)))
       |SELECT doc_id, source FROM documents
       |WHERE doc_id NOT IN (SELECT id FROM blocked)
       |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val store = Dsl.tempStore("x08_store")
    val docs = Tables.documents(spark, dir).select("doc_id", "source", "text")
    Seq(docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1))
      .map(b => graft.operators.IncrementalNearDup.dedupeBatch(
        b, "doc_id", "text", store, ShingleK, NumPerms, Bands))
      .reduce(_ unionByName _)
      .select("doc_id", "source")
      .orderBy("doc_id")
  }

  /** X18 — incremental near-dup against the BUCKETED index
    * ([[graft.operators.IncrementalNearDup.dedupeBatchBucketed]]): x08's
    * admission semantics on the 100 TB index layout — the persistent
    * band index is a `bucketBy(band_key)` table, so each batch's
    * collision join reads the corpus-sized side pre-partitioned (no
    * exchange on the index, PlanSpec-pinned; only the O(batch) side
    * shuffles). Oracle is x08's backfill rule VERBATIM, so the layout
    * change is proven admission-equivalent.
    */
  val x18IncrementalNearDupBucketed: GraftQuery = GraftQuery(
    "x18_incremental_neardup_bucketed",
    s"""WITH $sqlCandCtes,
       |blocked AS (
       |  SELECT DISTINCT y.id FROM banded x JOIN banded y
       |    ON x.band_id = y.band_id AND x.band_key = y.band_key
       |   AND ((x.id % 2) < (y.id % 2)
       |        OR ((x.id % 2) = (y.id % 2) AND x.id < y.id)))
       |SELECT doc_id, source FROM documents
       |WHERE doc_id NOT IN (SELECT id FROM blocked)
       |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val table = "x18_band_index"
    spark.sql(s"DROP TABLE IF EXISTS $table") // gate reruns start clean
    val docs = Tables.documents(spark, dir).select("doc_id", "source", "text")
    Seq(docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1))
      .map(b => graft.operators.IncrementalNearDup.dedupeBatchBucketed(
        b, "doc_id", "text", table, ShingleK, NumPerms, Bands))
      .reduce(_ unionByName _)
      .select("doc_id", "source")
      .orderBy("doc_id")
  }

  /** SM08 — STREAMING near-dup admission: x08's semantics driven by
    * Structured Streaming — a document stream admitted micro-batch by
    * micro-batch through the bucketed band index via foreachBatch
    * ([[graft.streaming.StreamNearDup.admitBatch]]), admitted rows
    * landing in a batch-partitioned sink with exactly-once overwrite
    * (retry safety spec'd in StreamNearDupSpec through crash-shaped
    * redeliveries). Oracle is x08's backfill rule VERBATIM: the
    * streaming composition is proven admission-equivalent to the batch
    * pipeline on the same batch sequence.
    */
  val sm08StreamNearDup: GraftQuery = GraftQuery(
    "sm08_stream_neardup",
    s"""WITH $sqlCandCtes,
       |blocked AS (
       |  SELECT DISTINCT y.id FROM banded x JOIN banded y
       |    ON x.band_id = y.band_id AND x.band_key = y.band_key
       |   AND ((x.id % 2) < (y.id % 2)
       |        OR ((x.id % 2) = (y.id % 2) AND x.id < y.id)))
       |SELECT doc_id, source FROM documents
       |WHERE doc_id NOT IN (SELECT id FROM blocked)
       |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val table = "sm08_band_index"
    spark.sql(s"DROP TABLE IF EXISTS $table") // gate reruns start clean
    val out = Dsl.tempStore("sm08_admitted")
    val docs = Tables.documents(spark, dir).select("doc_id", "source", "text")
    // two micro-batches, same halves as x08 (even ids arrive first).
    // GATE FIXTURE ONLY: MemoryStream needs the rows driver-side, and is
    // chosen over a file stream for deterministic batch BOUNDARIES (one
    // addData = one batch id, which the oracle's seen-before rule needs).
    // Production ingest is a file/queue readStream — admitBatch itself
    // never collects anything.
    val halves = Seq(docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1))
      .map(_.as[(Long, String, String)].collect().toSeq)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)]
    val q = mem.toDF().toDF("doc_id", "source", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.streaming.StreamNearDup.admitBatch(
          b, id, "doc_id", "text", table, out, ShingleK, NumPerms, Bands)
      }
      .start()
    try halves.foreach { h => mem.addData(h); q.processAllAvailable() }
    finally q.stop()
    spark.read.parquet(out).select("doc_id", "source").orderBy("doc_id")
  }

  /** G2 — duplicate-group clustering: connected components over the LSH
    * candidate pairs ([[Dedup.connectedComponents]] min-label
    * propagation), emitting one row per duplicate group with its
    * representative (= min doc_id, which is what the labels converge to)
    * and member count. The oracle computes the same components via a
    * recursive transitive closure + MIN — completely different algorithm,
    * same fixpoint, so the equality is a strong check of the iteration.
    */
  val g02DedupGroups: GraftQuery = GraftQuery(
    "g02_dedup_groups",
    s"""WITH RECURSIVE $sqlCandCtes,
       |edges AS (SELECT id_a AS a, id_b AS b FROM cand
       |          UNION ALL SELECT id_b, id_a FROM cand),
       |verts AS (SELECT DISTINCT a AS id FROM edges),
       |reach AS (
       |  SELECT id, id AS r FROM verts
       |  UNION
       |  SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a),
       |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
       |SELECT component, COUNT(*) AS n_members
       |FROM comp GROUP BY component ORDER BY component""".stripMargin) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    // the grouping semantics are defined over the CANDIDATE edge set (the
    // oracle's `cand` CTE) — but only its CONNECTIVITY matters here, so
    // generate per-bucket stars, not cliques: identical components,
    // Σ|bucket| edges instead of Σ|bucket|² (see lshComponentEdges).
    val pairs = Dedup.lshComponentEdges(docs, "doc_id", "text", ShingleK, NumPerms, Bands)
    // size the CANDIDATE-GENERATION shuffles (band join, distinct) to
    // the corpus, not the session: at gate scale (≤5k docs) 32
    // partitions make them pure task overhead, while pinning a small
    // constant starves them at 100× (measured ~40% slower end-to-end at
    // the 500k-doc tier). The component loop itself now self-tunes from
    // the edge count inside [[Dedup.connectedComponents]]. docs.count()
    // is a parquet metadata read; ~5k rows per partition, floor 4.
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val ccParts = math.min(prevParts.toLong, math.max(4L, docs.count() / 5000L))
    spark.conf.set("spark.sql.shuffle.partitions", ccParts.toString)
    val comps = try Dedup.connectedComponents(pairs.select("id_a", "id_b"))
      finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    comps
      .groupBy(col("comp").as("component"))
      .agg(count(lit(1)).as("n_members"))
      .orderBy("component")
  }

  /** X20 — CANONICAL SELECTION within near-dup clusters: g02 finds the
    * duplicate groups; this resolves each group to the ONE copy a
    * curation pipeline keeps, by source priority (prefer the most
    * trusted source, tie-break lowest doc_id) — the "prefer wiki over
    * common-crawl" rule every multi-source training corpus applies.
    * Priority here is the source's numeric suffix (standing in for the
    * configured source→priority dim a production run would broadcast).
    *
    * Scale shape: after the CC labels, selection is ONE map-side
    * combinable agg — the (priority, doc_id) order is packed into a
    * single BIGINT key (pri·2³² + id, the a35 pack convention) so
    * MIN(key) is the argmin and no window or join-back ever ranks
    * cluster members; the labels→docs join is broadcast-class (labels
    * exist only for clustered docs).
    */
  val x20CanonicalSelection: GraftQuery = GraftQuery(
    "x20_canonical_selection",
    s"""WITH RECURSIVE $sqlCandCtes,
       |edges AS (SELECT id_a AS a, id_b AS b FROM cand
       |          UNION ALL SELECT id_b, id_a FROM cand),
       |verts AS (SELECT DISTINCT a AS id FROM edges),
       |reach AS (
       |  SELECT id, id AS r FROM verts
       |  UNION
       |  SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a),
       |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
       |members AS (
       |  SELECT c.component, d.doc_id, d.source,
       |         CAST(REPLACE(d.source, 'src', '') AS BIGINT) AS pri
       |  FROM comp c JOIN documents d ON c.id = d.doc_id),
       |sel AS (SELECT component,
       |               MIN(pri * 4294967296 + doc_id) AS k,
       |               COUNT(*) AS n_members,
       |               COUNT(DISTINCT source) AS n_sources
       |        FROM members GROUP BY component)
       |SELECT component, k % 4294967296 AS kept_doc_id,
       |       'src' || CAST(k // 4294967296 AS VARCHAR) AS kept_source,
       |       n_members, n_sources
       |FROM sel ORDER BY component""".stripMargin) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val pairs = Dedup.lshComponentEdges(docs, "doc_id", "text", ShingleK, NumPerms, Bands)
    // same shuffle sizing as g02: candidate generation ∝ corpus
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val ccParts = math.min(prevParts.toLong, math.max(4L, docs.count() / 5000L))
    spark.conf.set("spark.sql.shuffle.partitions", ccParts.toString)
    val comps = try Dedup.connectedComponents(pairs.select("id_a", "id_b"))
      finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    val pri = regexp_replace(col("source"), "^src", "").cast("long")
    comps.join(docs.select(col("doc_id"), col("source")),
        comps("id") === col("doc_id"))
      .select(col("comp").as("component"),
        (pri * lit(4294967296L) + col("doc_id")).as("k"), col("source"))
      .groupBy("component")
      .agg(min("k").as("k"), count(lit(1)).as("n_members"),
        countDistinct("source").as("n_sources"))
      .select(col("component"),
        expr("k % 4294967296").as("kept_doc_id"),
        concat(lit("src"), expr("k div 4294967296").cast("string"))
          .as("kept_source"),
        col("n_members"), col("n_sources"))
      .orderBy("component")
  }

  /** X22 — LEAKAGE-FREE TRAIN/EVAL SPLIT: d15's hash split applied at
    * near-dup CLUSTER grain instead of doc grain — the decontamination
    * rule every eval-set construction needs (Lee et al. 2022 §5: if two
    * near-duplicates land on opposite sides of the split, the eval half
    * is contaminated by construction; t11/e23 DETECT leakage after the
    * fact, x22 makes it impossible). Every document is keyed by its
    * near-dup component (g02's clusters; singletons key by their own
    * id), and the split is a pure function of that CLUSTER key — so a
    * whole cluster moves together, and the straddle audit (number of
    * clusters seen in >1 split) is structurally zero, which the gate
    * ships as a column the oracle recomputes.
    *
    * Scale shape: candidate edges + components are exactly g02's
    * machinery (per-bucket stars, the three-regime CC loop); after the
    * labels everything is one corpus-scan projection (the cluster key
    * is a coalesce over a broadcast-class left join — labels exist only
    * for clustered docs) and two map-side-combinable aggs. The split
    * hash is salted ('#csplit') so it decorrelates from every other
    * hash-keyed decision on the same ids (d15's salt rationale).
    */
  val x22LeakageFreeSplit: GraftQuery = GraftQuery(
    "x22_leakage_free_split", {
      val bucket = graft.operators.Sampling.sqlHashBucket("ckey || '#csplit'")
      s"""WITH RECURSIVE $sqlCandCtes,
         |edges AS (SELECT id_a AS a, id_b AS b FROM cand
         |          UNION ALL SELECT id_b, id_a FROM cand),
         |verts AS (SELECT DISTINCT a AS id FROM edges),
         |reach AS (
         |  SELECT id, id AS r FROM verts
         |  UNION
         |  SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a),
         |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
         |keyed AS (SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS ckey
         |          FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
         |sp AS (SELECT doc_id, ckey,
         |         CASE WHEN $bucket < 800000 THEN 'train' ELSE 'eval' END AS split
         |       FROM keyed),
         |str AS (SELECT COUNT(*) AS n_straddling FROM
         |        (SELECT ckey FROM sp GROUP BY ckey
         |         HAVING COUNT(DISTINCT split) > 1) t)
         |SELECT split, COUNT(*) AS n_docs,
         |       CAST(COUNT(DISTINCT ckey) AS BIGINT) AS n_clusters,
         |       BIT_XOR(doc_id) AS id_fp,
         |       MAX(s.n_straddling) AS n_straddling
         |FROM sp CROSS JOIN str s
         |GROUP BY split ORDER BY split""".stripMargin
    }) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val pairs = Dedup.lshComponentEdges(docs, "doc_id", "text", ShingleK, NumPerms, Bands)
    // same shuffle sizing as g02: candidate generation ∝ corpus
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val ccParts = math.min(prevParts.toLong, math.max(4L, docs.count() / 5000L))
    spark.conf.set("spark.sql.shuffle.partitions", ccParts.toString)
    val comps = try Dedup.connectedComponents(pairs.select("id_a", "id_b"))
      finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    val keyed = docs.select(col("doc_id"))
      .join(comps.select(col("id").as("doc_id"), col("comp")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("ckey"))
    val bucket = graft.operators.Sampling.hashBucket(
      concat(col("ckey").cast("string"), lit("#csplit")))
    // consumed twice (stats + straddle audit) — don't recompute the CC
    val sp = keyed.select(col("doc_id"), col("ckey"),
        when(bucket < 800000L, "train").otherwise("eval").as("split"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val straddle = sp.groupBy("ckey")
      .agg(countDistinct("split").as("ns")).filter(col("ns") > 1)
      .agg(count(lit(1)).as("n_straddling"))
    sp.groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("ckey").cast("long").as("n_clusters"),
        bit_xor(col("doc_id")).as("id_fp"))
      .crossJoin(broadcast(straddle))
      .select(col("split"), col("n_docs"), col("n_clusters"), col("id_fp"),
        col("n_straddling"))
      .orderBy("split")
  }

  private val SpanK = 8

  /** M5 — exact duplicated-SPAN dedup (Lee et al. 2022's ExactSubstr
    * half, sub-document grain; extension beyond the reference's doc-
    * grain dedup, Preprocessor.py:161-167). Unlike t09's C4-style
    * ALIGNED 5-token chunks (which miss any duplicate not starting on
    * a chunk boundary), the sliding positional k-gram catches a
    * duplicated span at ANY offset — the suffix-array semantics,
    * re-expressed as one token-grain shuffle. Every second-and-later
    * occurrence of a duplicated 8-token gram is masked and its span
    * removed, keeping the corpus-global first (min (doc, pos)) copy;
    * adjacent duplicated grams merge into longer removed spans via
    * positional coverage. Output = per-doc removal receipt + the
    * cleaned text itself, so the oracle pins the reconstruction
    * byte-for-byte, not just the counts.
    */
  val m05ExactSubstr: GraftQuery = GraftQuery(
    "m05_exactsubstr_dedup", {
      import graft.operators.SpanDedup
      val grams = SpanDedup.sqlPositionalGramHashes("hs", SpanK)
      s"""WITH t AS (SELECT doc_id, ${TextFunctions.sqlTokens("text")} AS toks
         |           FROM documents),
         | th AS (SELECT doc_id, toks,
         |               [${TextFunctions.sqlRollingHash("tok")} for tok in toks] AS hs
         |        FROM t),
         | g AS (SELECT doc_id, toks, $grams AS grams FROM th),
         | occ AS (SELECT doc_id, i AS pos, grams[i] AS h
         |         FROM g, unnest(range(1, len(grams) + 1)) AS u(i)),
         | ranked AS (SELECT doc_id, pos,
         |                   COUNT(*) OVER (PARTITION BY h) AS n,
         |                   row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
         |            FROM occ),
         | masked AS (SELECT doc_id, list_sort(list(DISTINCT pos)) AS starts
         |            FROM ranked WHERE n > 1 AND rn > 1 GROUP BY doc_id),
         | joined AS (SELECT g.doc_id, g.toks, COALESCE(m.starts, []) AS starts
         |            FROM g LEFT JOIN masked m ON g.doc_id = m.doc_id),
         | cleaned AS (SELECT doc_id, len(toks) AS n_tokens,
         |                    [toks[j] for j in range(1, len(toks) + 1)
         |                     if len(list_filter(starts, s -> s <= j AND j < s + $SpanK)) = 0] AS kept
         |             FROM joined)
         |SELECT doc_id, n_tokens, CAST(n_tokens - len(kept) AS BIGINT) AS n_removed,
         |       COALESCE(array_to_string(kept, ' '), '') AS clean_text
         |FROM cleaned ORDER BY doc_id""".stripMargin
    }) { (spark, dir) =>
    graft.operators.SpanDedup.removeDuplicatedSpans(
        Tables.documents(spark, dir), "doc_id", "text", SpanK)
      .select(col("id").as("doc_id"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("n_removed").cast("long").as("n_removed"),
        col("clean_text"))
      .orderBy("doc_id")
  }

  val all: Seq[GraftQuery] = Seq(
    m05ExactSubstr,
    x01ExactDedup, x02DedupSummary, x03SaltedAgg, x04IncrementalDedup,
    x05SaltedJoin, x06UpsertMerge, x07BloomSemiJoin, x08IncrementalNearDup,
    x15MergeChangeset, x16StoreVacuum, x17TimeTravel,
    x18IncrementalNearDupBucketed, sm08StreamNearDup,
    m01MinHashLsh, m02MinHashEstimate, m03NearDupEstimated, m04ThresholdCurve,
    s01SimHash,
    s01bSimHash64, g01NgramJaccard, g02DedupGroups, x20CanonicalSelection,
    x22LeakageFreeSplit)
}
