package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exactness baseline, plus
  * random-hyperplane LSH bucketing and an IVF (inverted-file) variant as
  * the scale paths.
  *
  * Determinism: floating dot products are order-sensitive, so every sum
  * here is fixed-point — each elementwise product is floored to a 1e-15
  * grid as a BIGINT and summed in integer space (64 dims × 2.5e14 max
  * magnitude ≪ 2^63). Integer addition is associative, so Spark and the
  * DuckDB oracle agree bit-for-bit; the final cosine assembles the same
  * IEEE double expression in both engines.
  *
  * Scale design (100 TB):
  *  - per-vector work (fixed-point conversion, norms, bucket signs) is
  *    one codegen'd projection, no shuffle;
  *  - brute-force KNN broadcasts the (small) query set and scans vectors
  *    once; the per-query top-k window partitions by query id;
  *  - LSH/IVF replace the full scan with an equi-join on bucket/cluster
  *    id — the standard sub-linear probe shape, AQE handles skew.
  */
object Similarity {
  val DotScale = 1e15
  val SignScale = 1e9

  /** Fixed-point dot product of two float-array columns: Σ floor(aᵢ·bᵢ·1e15)
    * as BIGINT (exact, order-independent). Native fused kernel
    * ([[graft.plans.DotFixedExpr]]) — one loop, no zip_with intermediate
    * array per pair; OpsSpec/PropertySpec assert it equals [[dotFixedHof]].
    */
  def dotFixed(a: Column, b: Column): Column =
    graft.plans.SimilarityExprs.dotFixed(a, b)

  /** Portable HOF formulation of [[dotFixed]] (the math the SQL oracle
    * mirrors); kept as the no-custom-Expression fallback and parity check.
    */
  def dotFixedHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => floor(x.cast("double") * y.cast("double") * lit(DotScale))),
      lit(0L), _ + _)

  /** [[dotFixed]] unrolled for a known dimension. Measured SLOWER than
    * the fused zip_with/aggregate loop at dims=64 (the wide expression
    * tree drops out of whole-stage codegen), so the operators default to
    * the generic path (dims = -1); kept for small-dims cases.
    */
  def dotFixedUnrolled(a: Column, b: Column, dims: Int): Column =
    (0 until dims).map { i =>
      floor(a.getItem(i).cast("double") * b.getItem(i).cast("double") * lit(DotScale))
    }.reduce(_ + _)
  def sqlDotFixed(aE: String, bE: String): String =
    s"CAST(list_sum([CAST(floor(CAST($aE[i] AS DOUBLE) * CAST($bE[i] AS DOUBLE) * ${DotScale.toLong}.0) AS BIGINT) " +
      s"for i in range(1, len($aE) + 1)]) AS BIGINT)"

  /** Cosine from fixed-point parts — identical double arithmetic in both
    * engines: (dot/1e15) / (sqrt(na/1e15)·sqrt(nb/1e15)).
    */
  def cosineFromFixed(dotF: Column, naF: Column, nbF: Column): Column =
    (dotF.cast("double") / DotScale) /
      (sqrt(naF.cast("double") / DotScale) * sqrt(nbF.cast("double") / DotScale))
  def sqlCosineFromFixed(dotE: String, naE: String, nbE: String): String =
    s"((CAST($dotE AS DOUBLE) / ${DotScale.toLong}.0) / " +
      s"(sqrt(CAST($naE AS DOUBLE) / ${DotScale.toLong}.0) * sqrt(CAST($nbE AS DOUBLE) / ${DotScale.toLong}.0)))"

  /** Vectors with their fixed-point self-dot (squared norm) precomputed —
    * norms are per-vector, so they're computed once, not per pair.
    */
  def withNormFixed(df: DataFrame, idCol: String, embCol: String,
                    dims: Int = -1): DataFrame =
    df.select(col(idCol).as("id"), col(embCol).as("emb"),
      dotF(col(embCol), col(embCol), dims).as("norm_f"))

  /** All paths use the native fused kernel now — it beats both the
    * generic HOF and the unrolled expression tree at every dims (the
    * unrolled tree additionally bloats plans and falls out of codegen).
    * `dims` is kept in the signature for call-site documentation.
    */
  private def dotF(a: Column, b: Column, dims: Int): Column = dotFixed(a, b)

  /** Brute-force exact cosine top-k: queries × vectors scan, per-query
    * ranked window. `queries` should be small (broadcast side).
    */
  def knnBrute(vectors: DataFrame, idCol: String, embCol: String,
               queryPred: Column, k: Int, dims: Int = -1): DataFrame = {
    val v = withNormFixed(vectors, idCol, embCol, dims)
    val q = v.filter(queryPred)
      .select(col("id").as("q_id"), col("emb").as("q_emb"), col("norm_f").as("q_norm"))
    val scored = v.join(broadcast(q), col("id") =!= col("q_id"))
      .select(col("q_id"), col("id").as("n_id"),
        cosineFromFixed(dotF(col("q_emb"), col("emb"), dims), col("q_norm"), col("norm_f"))
          .as("cosine"))
    val w = Window.partitionBy("q_id").orderBy(desc("cosine"), asc("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "cosine")
  }

  /** Int8 scalar quantization: qᵢ = floor(xᵢ·127) — for unit-scale
    * embeddings every code fits [-128, 127], one byte per dimension
    * against four for the float: the 4× memory/IO compression that turns
    * a 100 TB float corpus into a 25 TB scan. Codes are kept as BIGINT
    * columns here (Spark arrays are not packed anyway); the packed-bytes
    * representation is a storage-format concern, the MATH below is the
    * part that must be exact.
    */
  def quantize(emb: Column, scale: Int = 127): Column =
    transform(emb, x => floor(x.cast("double") * lit(scale)).cast("long"))
  def sqlQuantize(embE: String, scale: Int = 127): String =
    s"[CAST(floor(CAST($embE[i] AS DOUBLE) * $scale.0) AS BIGINT) for i in range(1, len($embE) + 1)]"

  /** Exact integer dot product of two code arrays. */
  def dotCodes(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), _ + _)
  def sqlDotCodes(aE: String, bE: String): String =
    s"CAST(list_sum([$aE[i] * $bE[i] for i in range(1, len($aE) + 1)]) AS BIGINT)"

  /** Brute-force top-k over int8-quantized codes: same shape as
    * [[knnBrute]] but every pair costs an integer multiply-add loop over
    * one-byte codes — the SIMD-friendly inner product every production
    * ANN engine runs — and the scan reads a quarter of the bytes. All
    * ranking math is integer-exact (quantized cosine assembled from
    * integer dot and norms in double, identically in both engines), so
    * the result is deterministic, unlike a float recall approximation.
    */
  def knnQuantized(vectors: DataFrame, idCol: String, embCol: String,
                   queryPred: Column, k: Int, scale: Int = 127): DataFrame = {
    val v = vectors.select(col(idCol).as("id"), quantize(col(embCol), scale).as("qv"))
      .withColumn("qnorm", dotCodes(col("qv"), col("qv")))
    val q = v.filter(queryPred)
      .select(col("id").as("q_id"), col("qv").as("q_qv"), col("qnorm").as("q_qnorm"))
    val scored = v.join(broadcast(q), col("id") =!= col("q_id"))
      .select(col("q_id"), col("id").as("n_id"),
        dotCodes(col("q_qv"), col("qv")).as("dot_q"),
        (col("q_qnorm") * col("qnorm")).as("nn"))
      .select(col("q_id"), col("n_id"), col("dot_q"),
        (col("dot_q").cast("double") /
          (sqrt(col("nn").cast("double")))).as("cosine_q"))
    val w = Window.partitionBy("q_id").orderBy(desc("cosine_q"), asc("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "dot_q", "cosine_q")
  }

  /** Coarse-to-fine (Matryoshka-style) top-k: score every vector on only
    * the first `coarseDims` dimensions (a prefix slice — the cheap pass
    * that reads 1/4 of the vector bytes at coarseDims = dims/4), keep the
    * `coarseK` best per query, then rerank just those with the exact
    * full-dimension cosine. The production pattern for embedding models
    * trained with prefix-truncation losses; recall depends on the
    * embedding's prefix quality, and `coarseK` is the knob.
    * All math is the fixed-point integer pipeline, so both passes are
    * deterministic and the oracle replays them exactly.
    */
  def knnCoarseRerank(vectors: DataFrame, idCol: String, embCol: String,
                      queryPred: Column, k: Int, coarseDims: Int,
                      coarseK: Int): DataFrame = {
    val v = vectors.select(col(idCol).as("id"), col(embCol).as("emb"))
      .withColumn("cemb", slice(col("emb"), 1, coarseDims))
      .withColumn("cnorm", dotFixed(col("cemb"), col("cemb")))
      .withColumn("norm_f", dotFixed(col("emb"), col("emb")))
    val q = v.filter(queryPred)
      .select(col("id").as("q_id"), col("cemb").as("q_cemb"), col("cnorm").as("q_cnorm"),
        col("emb").as("q_emb"), col("norm_f").as("q_norm"))
    val coarse = v.join(broadcast(q), col("id") =!= col("q_id"))
      .select(col("q_id"), col("id").as("n_id"), col("emb"), col("norm_f"),
        col("q_emb"), col("q_norm"),
        cosineFromFixed(dotFixed(col("q_cemb"), col("cemb")),
          col("q_cnorm"), col("cnorm")).as("coarse_cos"))
    val wc = Window.partitionBy("q_id").orderBy(desc("coarse_cos"), asc("n_id"))
    val candidates = coarse.withColumn("crank", row_number().over(wc))
      .filter(col("crank") <= coarseK)
    val wf = Window.partitionBy("q_id").orderBy(desc("cosine"), asc("n_id"))
    candidates
      .select(col("q_id"), col("n_id"),
        cosineFromFixed(dotFixed(col("q_emb"), col("emb")),
          col("q_norm"), col("norm_f")).as("cosine"))
      .withColumn("rank", row_number().over(wf))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "cosine")
  }

  /** Embedding post-processing: mean-center every dimension over the
    * corpus, then L2-normalize each vector — the standard conditioning
    * pass before ANN indexing (centering removes the dominant common
    * direction; unit norm makes cosine = dot). Two passes: a per-dim
    * decimal-exact mean (posexplode + keyed agg — map-side combinable,
    * one narrow shuffle of dims × partials), broadcast back, then a
    * per-row projection.
    *
    * Determinism model: the mean is assembled from an exact decimal sum
    * (order-free) and one IEEE division; the centered coordinate is then
    * QUANTIZED to a 1e-9 grid (`floor(c·1e9)` as BIGINT) so the squared
    * norm is an order-free integer sum, and the normalized output
    * coordinates are each one IEEE division of exact integers — fully
    * reproducible across engines and partitionings.
    */
  def centerNormalize(vectors: DataFrame, idCol: String, embCol: String,
                      dims: Int): DataFrame = {
    val CScale = 1e9
    val means = vectors
      .select(posexplode(col(embCol)).as(Seq("d", "x")))
      .groupBy("d")
      // float → DOUBLE (exact binary widening) BEFORE the decimal cast:
      // engines disagree on float→decimal directly (shortest-repr vs
      // binary-expansion rounding), but agree bit-for-bit via double
      .agg((sum(col("x").cast("double").cast("decimal(28,8)")).cast("double") /
        count(lit(1))).as("mean"))
      .select(col("d"), col("mean"))
    // dims is small: collect the mean vector once, ship as a literal array
    val meanArr = means.orderBy("d").select("mean").collect().map(_.getDouble(0))
    require(meanArr.length == dims, s"expected $dims dims, got ${meanArr.length}")
    val meanLit = array(meanArr.map(lit): _*)
    val q = transform(col(embCol),
      (x, i) => floor((x.cast("double") - element_at(meanLit, i + 1)) * lit(CScale))
        .cast("long"))
    vectors
      .select(col(idCol).as("id"), q.as("qc"))
      .withColumn("qnorm", aggregate(col("qc"), lit(0L), (acc, v) => acc + v * v))
      .withColumn("normalized",
        transform(col("qc"), v => v.cast("double") / sqrt(col("qnorm").cast("double"))))
  }

  /** Deterministic ±1 hyperplane component for (plane r, dim d): bit 15 of
    * an LCG step of n = r·dims + d — pure integer math, portable to SQL.
    */
  def hyperplaneSign(r: Int, d: Int, dims: Int): Int = {
    val n = r.toLong * dims + d
    val g = Math.floorMod(n * 1103515245L + 12345L, 2147483648L)
    if (((g >> 15) & 1L) == 1L) 1 else -1
  }

  /** Random-hyperplane LSH bucket id (one sign bit per plane) over a
    * PRE-BOUND 1e-9-grid fixed-point embedding column — integer dot,
    * exact both engines. `vfix` must be an attribute (see [[withVfix]]):
    * the expression references it once per plane, and an inlined
    * transform would be re-evaluated `planes` times (the HOF-inlining
    * trap).
    */
  def lshBucketFromVfix(vfix: Column, planes: Int, dims: Int): Column =
    graft.plans.SimilarityExprs.lshBucket(vfix, planes, dims)

  /** Portable HOF formulation of [[lshBucketFromVfix]]: one
    * zip_with+aggregate pass per plane (the SQL oracle's shape); kept as
    * fallback and parity check.
    */
  def lshBucketFromVfixHof(vfix: Column, planes: Int, dims: Int): Column =
    (0 until planes).map { r =>
      val signs = array((0 until dims).map(d => lit(hyperplaneSign(r, d, dims).toLong)): _*)
      val dot = aggregate(zip_with(vfix, signs, _ * _), lit(0L), _ + _)
      when(dot > 0, lit(1L << r)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Bind the fixed-point grid to an attribute, then derive the bucket in
    * a separate projection. The grid is cast to BIGINT (floor is integral
    * and |v| < 2^31, so the cast is exact — the oracle's `sqlVfix` already
    * CASTs the same way) for the native bucket kernel.
    */
  def withBucket(df: DataFrame, embCol: String, planes: Int, dims: Int): DataFrame =
    df.withColumn("__vfix",
        transform(col(embCol), x => floor(x.cast("double") * lit(SignScale)).cast("long")))
      .withColumn("bucket", lshBucketFromVfix(col("__vfix"), planes, dims))
      .drop("__vfix")

  /** Single-column form kept for expression-level callers; computes the
    * grid inline, so prefer [[withBucket]] on DataFrames.
    */
  def lshBucket(emb: Column, planes: Int, dims: Int): Column = {
    val vfix = transform(emb, x => floor(x.cast("double") * lit(SignScale)).cast("long"))
    lshBucketFromVfix(vfix, planes, dims)
  }
  /** SQL twin of the per-element fixed-point grid (hoist into a CTE once,
    * then feed the column name to [[sqlLshBucketFromVfix]]).
    */
  def sqlVfix(embE: String): String =
    s"[CAST(floor(CAST(x AS DOUBLE) * ${SignScale.toLong}.0) AS BIGINT) for x in $embE]"
  def sqlLshBucketFromVfix(vfixE: String, planes: Int, dims: Int): String =
    (0 until planes).map { r =>
      val signs = (0 until dims).map(d => hyperplaneSign(r, d, dims)).mkString("[", ", ", "]")
      s"CASE WHEN list_sum([$vfixE[i] * ($signs)[i] for i in range(1, $dims + 1)]) > 0 THEN ${1L << r} ELSE 0 END"
    }.mkString("(", " + ", ")")

  /** LSH-bucketed approximate top-k: candidates share the query's bucket. */
  def knnLsh(vectors: DataFrame, idCol: String, embCol: String,
             queryPred: Column, k: Int, planes: Int, dims: Int): DataFrame = {
    val v = withBucket(withNormFixed(vectors, idCol, embCol, dims), "emb", planes, dims)
    val q = v.filter(queryPred)
      .select(col("id").as("q_id"), col("emb").as("q_emb"),
        col("norm_f").as("q_norm"), col("bucket").as("q_bucket"))
    val scored = v.join(broadcast(q),
        col("bucket") === col("q_bucket") && col("id") =!= col("q_id"))
      .select(col("q_id"), col("id").as("n_id"),
        cosineFromFixed(dotF(col("q_emb"), col("emb"), dims), col("q_norm"), col("norm_f"))
          .as("cosine"))
    val w = Window.partitionBy("q_id").orderBy(desc("cosine"), asc("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "cosine")
  }

  /** Persist the IVF-PQ index [[knnIvfPqAdc]] computes in-query — the
    * production ANN deployment split (t21b's stored-index story for
    * vectors): the index is built ONCE offline (coarse centroids, PQ
    * codebook subvectors, per-vector codes WITH their cluster
    * co-located on the row), and retrieval reads ONLY the store — the
    * raw embedding corpus appears nowhere in the search plan.
    *
    * Store layout: `store/coarse` (g_id, gq), `store/codebook`
    * (c_id, s, cqs), `store/codes` (vec_id, subspace, code, cluster).
    * At cluster scale `codes` is bucketed by cluster so a probe reads
    * O(selected clusters), the io07 partition-pruning story.
    */
  def buildIvfPqStore(vectors: DataFrame, idCol: String, embCol: String,
                      coarsePred: Column, codebookPred: Column, store: String,
                      m: Int = 4, dsub: Int = 16): Unit = {
    val v = vectors.select(col(idCol).as("id"), quantize(col(embCol)).as("q"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val coarse = v.filter(coarsePred).select(col("id").as("g_id"), col("q").as("gq"))
    def subs(qc: Column, out: String) =
      explode(transform(sequence(lit(0), lit(m - 1)),
        s => struct(s.cast("long").as("s"),
          slice(qc, s * dsub + 1, lit(dsub)).as(out)))).as("e")
    // the codebook frame is bound ONCE and serves both the store write
    // and the encode below (two inline copies of the same projection
    // are exactly the drift risk the shared encode path exists to kill)
    val csub = v.filter(codebookPred)
      .select(col("id").as("c_id"), subs(col("q"), "cqs"))
      .select(col("c_id"), col("e.s").as("s"), col("e.cqs").as("cqs"))
    // The three store dirs are independent outputs of the one persisted
    // frame — submit them concurrently (guide §2.6 / the
    // writeAnalyses discipline): on a cluster the two tiny model-param
    // writes back-fill executors the codes job leaves idle, and the
    // build stops paying 3 × serial job latency. coalesce(1) on the
    // param dirs: model params are broadcast-class, so one file each —
    // every retrieval re-reads these dirs, and 32 four-row task files
    // cost footer reads for nothing.
    locally {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      // failure handling (ADVICE r13): Future.sequence fails fast on the
      // first failed write and the finally below always unpersists; the
      // sibling jobs run to completion on their own (they write disjoint
      // dirs, so a partial store is overwritten by the retry)
      val writes = Seq(
        Future(coarse.coalesce(1).write.mode("overwrite").parquet(s"$store/coarse")),
        Future(csub.coalesce(1).write.mode("overwrite").parquet(s"$store/codebook")),
        // codes are CLUSTER-PARTITIONED (`partitionBy`): retrieval
        // probes a handful of clusters per query, and the partitioned
        // layout turns that probe set into static partition pruning on
        // the codes scan — the io07 layout applied to the index's own
        // store; a flat layout would pay O(corpus) codes I/O per query
        // at 100 TB (VERDICT r8 #1b). ONE encode path
        // ([[assignAndEncode]]) serves both this build and
        // admitIvfPqBatch — the e29 rebuild-equality invariant is held
        // by shared code, not by keeping two expression blocks in
        // lockstep. Cluster rows by target directory first (files ∝
        // clusters, not tasks×clusters — see bm25BuildIndex's note).
        Future(assignAndEncode(v, coarse, csub, m, dsub)
          .repartition(col("cluster"))
          .write.mode("overwrite").partitionBy("cluster")
          .parquet(s"$store/codes")))
      try Await.result(Future.sequence(writes), Duration.Inf)
      finally v.unpersist()
    }
  }

  /** Integer squared L2 between two code arrays (exact, engine-stable). */
  private def sqDistL(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), _ + _)

  /** Driver-side twin of [[sqDistL]] for the coordinator-side routing
    * below — same integer arithmetic, element for element.
    */
  private def sqDistLocal(a: Array[Long], b: Array[Long]): Long = {
    var acc = 0L; var i = 0
    while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }
  private def asLong(v: Any): Long = v match {
    case x: Long             => x
    case x: Int              => x.toLong
    case x: java.lang.Number => x.longValue
  }

  /** QUERY-SIDE routing and ADC tables computed on the COORDINATOR
    * (guide §1.2 / §5): the probe list is |q|·k integer squared-L2s
    * against the broadcast-class centroid set, the distance tables
    * |q|·m·k more against the codebook — request-sized × model-sized
    * work, exactly what every production ANN serving system computes on
    * the query coordinator per request. Running each as a Spark
    * broadcast-build job (the former folded-row form) paid a full job
    * launch plus a scan of the query frame PER LEG; both frames are
    * broadcast into the corpus-side plan afterward either way, so the
    * bytes shipped are identical. Ordering is (gdist, g_id) ascending —
    * bit-identical to the former array_sort(struct(gdist, g_id)) prefix.
    * Returns (probeRows, tabRows): (q_id, [p_rank,] cluster) and
    * (q_id, s, c_id, tdist) with values passed through untouched from
    * the collected rows, so downstream join types are unchanged.
    */
  private def localProbesAndTab(
      qRows: Seq[(Any, Array[Long])],
      cents: Seq[(Any, Array[Long])],
      cwords: Seq[(Any, Long, Array[Long])],
      nprobe: Int, dsub: Int, withRank: Boolean)
    : (Seq[org.apache.spark.sql.Row], Seq[org.apache.spark.sql.Row]) = {
    import org.apache.spark.sql.Row
    val centsL = cents.map { case (gid, gq) => (gid, asLong(gid), gq) }
    val cws = cwords
      .sortBy { case (cid, sL, _) => (sL, asLong(cid)) }
    val probes = qRows.flatMap { case (qid, qq) =>
      val ranked = centsL
        .map { case (gid, gidL, gq) => (sqDistLocal(qq, gq), gidL, gid) }
        .sortBy { case (d, gl, _) => (d, gl) }
        .take(nprobe)
      ranked.zipWithIndex.map { case ((_, _, gid), i) =>
        if (withRank) Row(qid, Integer.valueOf(i + 1), gid) else Row(qid, gid)
      }
    }
    val tab = qRows.flatMap { case (qid, qq) =>
      cws.map { case (cid, sL, cqs) =>
        val off = (sL * dsub).toInt
        Row(qid, java.lang.Long.valueOf(sL), cid,
          java.lang.Long.valueOf(sqDistLocal(qq.slice(off, off + dsub), cqs)))
      }
    }
    (probes, tab)
  }

  /** The coarse-centroid table folded to ONE broadcast-able row
    * `cents: array<struct<g_id, gq>>` (sorted by g_id for a
    * deterministic plan). Model params are broadcast-class by the IVF
    * provisioning invariant (k ∝ √n), so folding them to a single array
    * row turns every routing/encoding argmin downstream into a per-row
    * codegen expression — ZERO shuffles on the corpus side (guide §2.4;
    * previously each argmin was a corpus-wide keyed agg + join).
    */
  private def centsRow(coarse: DataFrame): DataFrame =
    // coalesce(1): the fold needs every row in one place anyway —
    // a single narrow task instead of a 2-stage partial/final agg
    // (model params are broadcast-class, so one task holds them)
    coarse.coalesce(1)
      .agg(sort_array(collect_list(struct(col("g_id"), col("gq")))).as("cents"))

  /** The PQ codebook folded to ONE row `cwords: array<struct<s, c_id,
    * cqs>>` — same broadcast-model-row discipline as [[centsRow]].
    */
  private def cwordsRow(csub: DataFrame): DataFrame =
    csub.coalesce(1)
      .agg(sort_array(collect_list(struct(col("s"), col("c_id"), col("cqs")))).as("cwords"))

  /** Per-row PQ codes over the folded `cwords` array: for each subspace
    * s, argmin (dist, c_id) over that subspace's codewords — one
    * array<struct<s, best>> per vector, exploded by callers. Ties to
    * the lower codeword id, exactly as the former min-struct agg.
    */
  private def pqCodes(q: Column, cwords: Column, m: Int, dsub: Int): Column =
    transform(sequence(lit(0L), lit((m - 1).toLong)), s =>
      struct(s.as("s"),
        array_min(transform(filter(cwords, w => w.getField("s") === s),
          w => struct(
            sqDistL(slice(q, s * dsub + lit(1), lit(dsub)), w.getField("cqs")).as("dist"),
            w.getField("c_id").as("c_id")))).as("best")))

  /** THE encode path for the IVF-PQ store: nearest-coarse-centroid
    * assignment (argmin, ties to the lower g_id) plus per-subspace PQ
    * codes (argmin, ties to the lower codeword id) against EXPLICIT
    * model-parameter frames — used by both [[buildIvfPqStore]] (params
    * derived from the corpus) and [[admitIvfPqBatch]] (params read from
    * the store), so routing and encoding can never drift between the
    * from-scratch and the incremental path (the equality the e29 gate
    * pins).
    *
    * r13 shape: the params fold to one broadcast row each ([[centsRow]]/
    * [[cwordsRow]]) and the whole encode is a per-row projection + one
    * explode — the former corpus-wide argmin aggs (2 exchanges) and the
    * codes⋈cluster join (a 3rd) are gone; the arithmetic per candidate
    * pair is unchanged, so output is bit-identical.
    * Input `v` is the quantized frame (id, q); output one row per
    * (vec, subspace): (vec_id, subspace, code, dist_q, cluster).
    */
  private def assignAndEncode(v: DataFrame, coarse: DataFrame,
                              csub: DataFrame, m: Int, dsub: Int): DataFrame = {
    // Coarse assignment stays the broadcast-join + min-struct AGG form:
    // the per-row array_min(transform(cents, ...)) fold was tried and
    // MEASURED 2.8× slower at the 100× tier (e16 10.3 → 28.5 s) — with
    // √n centroids the deeply nested interpreted HOF tree's per-element
    // constant beats the one narrow (id, cluster) agg+join it saves.
    // The per-subspace PQ argmin keeps the folded-codebook per-row form
    // (pqCodes): PQ codebooks are small and FIXED (≤256 codewords per
    // subspace), and the fold measured ~2× FASTER at the 100× tier
    // (e15 6.9 → 3.4 s) by deleting the (id, s)-keyed agg exchange.
    val assigned = v.crossJoin(broadcast(coarse))
      .select(col("id"), col("g_id"),
        aggregate(zip_with(col("q"), col("gq"), (x, y) => (x - y) * (x - y)),
          lit(0L), _ + _).as("gdist"))
      .groupBy("id")
      .agg(min(struct(col("gdist"), col("g_id"))).as("b"))
      .select(col("id").as("a_id"), col("b.g_id").as("cluster"))
    v.crossJoin(broadcast(cwordsRow(csub)))
      .select(col("id"), explode(pqCodes(col("q"), col("cwords"), m, dsub)).as("e"))
      // degenerate (empty) codebook: array_min over no codewords is null
      // — drop such rows rather than write null codes into the store
      // (the former keyed-agg form produced zero rows; ADVICE r13)
      .filter(col("e.best").isNotNull)
      .select(col("id").as("vec_id"), col("e.s").as("subspace"),
        col("e.best.c_id").as("code"), col("e.best.dist").as("dist_q"))
      .join(assigned, col("vec_id") === col("a_id")).drop("a_id")
  }

  /** Retrieval against a [[buildIvfPqStore]] store: queries arrive as a
    * (id, embedding) frame at runtime; everything else — routing
    * centroids, distance-table codebook, corpus codes — comes from the
    * store. Must return exactly [[knnIvfPqAdc]]'s answer (the e19 gate
    * proves store fidelity against e16's oracle).
    */
  def ivfPqStoredTopK(spark: org.apache.spark.sql.SparkSession, store: String,
                      queries: DataFrame, idCol: String, embCol: String,
                      k: Int, nprobe: Int, m: Int = 4, dsub: Int = 16,
                      maxProbeRows: Int = 1000000,
                      allowed: Option[DataFrame] = None,
                      maxAllowedIds: Long = 4000000L): DataFrame = {
    recoverForget(spark, store)    // never serve a half-installed swap
    recoverRebalance(spark, store) // ...of either store mutation
    val coarse = spark.read.parquet(s"$store/coarse").select("g_id", "gq")
    val csub = spark.read.parquet(s"$store/codebook").select("c_id", "s", "cqs")
    val codes = spark.read.parquet(s"$store/codes")
    val q = queries.select(col(idCol).as("q_id"), quantize(col(embCol)).as("qq"))
    // The query frame is request-sized BY CONTRACT (budgeted below, the
    // cosinePairsTopK convention) and the model params are broadcast-
    // class by the IVF provisioning invariant (k ∝ √n) — so collect all
    // three ONCE and compute the probe lists and per-query ADC distance
    // tables on the coordinator ([[localProbesAndTab]]): the former
    // folded-row form ran each leg as its own broadcast-BUILD job (a
    // full job launch + a scan of the query frame per leg — two scans
    // of the query side per retrieval) for request×model-sized integer
    // arithmetic. The distinct probed clusters become a literal IN so
    // the cluster-partitioned codes scan is STATICALLY pruned to the
    // probed partitions (`PartitionFilters`; PlanSpec pins it) — search
    // I/O stays ∝ probed clusters, not corpus size.
    val qCap = math.min(maxProbeRows.toLong / math.max(1, nprobe),
      Int.MaxValue.toLong - 1).toInt
    // the three collects are independent one-file/one-frame jobs —
    // submit them concurrently (§2.6) instead of 3 × serial job latency
    val (qRows, centRows, cwRows) = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val fq = Future(q.limit(qCap + 1).collect())
      val fc = Future(coarse.collect())
      val fw = Future(csub.collect())
      (Await.result(fq, Duration.Inf), Await.result(fc, Duration.Inf),
        Await.result(fw, Duration.Inf))
    }
    require(qRows.length <= qCap,
      s"ivfPqStoredTopK: > $maxProbeRows probe rows (nprobe=$nprobe × " +
        "|queries|) — the query side must be a bounded request frame; " +
        "split the queries into batches or raise maxProbeRows")
    val (probeRows, tabRows) = localProbesAndTab(
      qRows.toSeq.map(r => (r.get(0), r.getSeq[Long](1).toArray)),
      centRows.toSeq.map(r => (r.get(0), r.getSeq[Long](1).toArray)),
      cwRows.toSeq.map(r => (r.get(0), asLong(r.get(1)), r.getSeq[Long](2).toArray)),
      nprobe, dsub, withRank = false)
    val probedClusters = probeRows.map(_.get(1)).distinct
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val probesLocal = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*),
      StructType(Seq(
        StructField("q_id", q.schema("q_id").dataType),
        StructField("cluster", coarse.schema("g_id").dataType))))
    val tab = spark.createDataFrame(
      java.util.Arrays.asList(tabRows: _*),
      StructType(Seq(
        StructField("tq_id", q.schema("q_id").dataType),
        StructField("s", csub.schema("s").dataType),
        StructField("c_id", csub.schema("c_id").dataType),
        StructField("tdist", LongType))))
    // FILTERED search (the FAISS IDSelector / vector-DB metadata-filter
    // shape): the allow-list is applied to the codes scan BEFORE any
    // ADC work — pre-filtering, so top-k is computed among ELIGIBLE
    // candidates only (post-filtering k results and discarding would
    // under-fill). The allow-list here broadcasts (request-sized or
    // dimension-table-sized filters); a corpus-scale predicate belongs
    // in the store itself as a partition/stored column, and a large
    // mid-size set degrades to x07's bloom semi-join.
    val codesEligible = allowed match {
      case Some(a) =>
        // budget the broadcast the maxProbeRows way: the allow-list
        // contract is request/dimension-sized — a corpus-proportional
        // predicate belongs in the store (partition/stored column) or
        // behind x07's bloom semi-join, and silently broadcasting it
        // is a driver OOM at real scale, so fail with the remedy.
        // limit+collect to a LOCAL frame (the probeRows pattern): the
        // bound means the ids fit the driver — they broadcast below
        // anyway — and the previous persist() leaked one cache entry
        // per retrieval call for the session lifetime (ADVICE r12;
        // this is the serving path, so the leak accumulated per query)
        val distinctIds = a.select(col(a.columns.head).as("__allowed_id"))
          .distinct()
        val cap = math.min(maxAllowedIds + 1, Int.MaxValue.toLong).toInt
        val idRows = distinctIds.limit(cap).collect()
        require(idRows.length <= maxAllowedIds,
          s"ivfPqStoredTopK: > $maxAllowedIds allowed ids exceed the " +
            "broadcast budget — store the filter column " +
            "in the index (partition/stored column) or use a bloom " +
            "semi-join (x07) for corpus-proportional predicates")
        val ids = spark.createDataFrame(
          java.util.Arrays.asList(idRows: _*), distinctIds.schema)
        codes.filter(col("cluster").isin(probedClusters: _*))
          .join(broadcast(ids), col("vec_id") === col("__allowed_id"), "left_semi")
      case None => codes.filter(col("cluster").isin(probedClusters: _*))
    }
    val scored = codesEligible
      .join(broadcast(probesLocal), Seq("cluster"))
      .join(broadcast(tab),
        col("tq_id") === col("q_id") && col("subspace") === tab("s") &&
          col("code") === tab("c_id") && col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id").as("n_id"))
      .agg(sum(col("tdist")).as("adc_dist"))
    val wTop = Window.partitionBy("q_id").orderBy(asc("adc_dist"), asc("n_id"))
    scored.withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "adc_dist")
  }

  /** Right-to-be-forgotten applied to a [[buildIvfPqStore]] store —
    * x11's delete propagation reaching the DERIVED vector index (a
    * GDPR erasure that purges the raw corpus but leaves the ANN index
    * serving the deleted vectors' codes has not erased anything).
    * Removes every code row of the given ids, rewriting ONLY the
    * cluster partitions that actually contain a deleted vector, so
    * erase I/O is ∝ affected clusters, not store size. The rewrite is
    * STAGED: survivors are written to `_forget_pending` (reading the
    * live store, writing a disjoint path — no read-under-overwrite
    * lineage hazard), then a marker file records the per-cluster
    * install plan (keep/drop — a cluster emptied ENTIRELY by the
    * delete has no staged dir and must be dropped explicitly), and
    * the install is pure FS renames. Crash-safe at every point
    * ([[recoverForget]], run from all store entry points): before the
    * marker the live store is untouched and the stage is discarded;
    * after it the plan replays idempotently. Re-running a completed
    * forget is a no-op (the ids are gone).
    *
    * The coarse centroids and PQ codebook are NOT touched: they are
    * trained model parameters (aggregates over many vectors), not
    * per-subject rows — the same boundary x14's k-anonymity audit
    * draws. Retrieval code is unchanged by design: the x23 gate runs
    * the unmodified [[ivfPqStoredTopK]] against the purged store.
    *
    * The ADMISSION LEDGER is also untouched (forget cannot know which
    * batch ids carried the deleted rows): re-ingesting a corrected
    * batch after forgetting a bad one needs a FRESH batch id, or
    * [[clearAdmissionLedger]] first — a same-id re-admission would
    * otherwise no-op against the stale marker.
    */
  def forgetFromIvfPqStore(spark: org.apache.spark.sql.SparkSession,
                           store: String, deleteIds: DataFrame): Unit = {
    // finish any half-installed prior forget/rebalance before reading
    recoverForget(spark, store)
    recoverRebalance(spark, store)
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val codes = spark.read.parquet(s"$store/codes")
    val del = deleteIds.select(col(deleteIds.columns.head).as("__del_id")).distinct()
    // affected clusters: bounded by |clusters| (the IVF provisioning
    // invariant k ∝ √n), so the collect is broadcast-class
    val affected = codes.join(broadcast(del),
        col("vec_id") === col("__del_id"), "left_semi")
      .select("cluster").distinct().collect().map(_.get(0))
    if (affected.isEmpty) return
    // STAGE the survivors to a pending dir, then swap behind a marker
    // (the StreamSketch / IncrementalComponents.compact protocol —
    // ADVICE r12): the previous form dynamic-overwrote codes/ from a
    // plan READING codes/, shielded only by persist — which does not
    // cut lineage, so an executor loss mid-write recomputed survivors
    // from partitions being concurrently truncated (silent corruption
    // on a GDPR-erasure path). Writing to pending reads and writes
    // DISJOINT paths; the install below is pure FS renames.
    val pending = new org.apache.hadoop.fs.Path(s"$store/$ForgetPendingDir")
    fs.delete(pending, true)
    codes.filter(col("cluster").isin(affected.toIndexedSeq: _*))
      .join(broadcast(del), col("vec_id") === col("__del_id"), "left_anti")
      .repartition(col("cluster"))
      .write.mode("overwrite").partitionBy("cluster").parquet(pending.toString)
    // the marker records the per-cluster install plan (keep = replace
    // with staged survivors, drop = emptied by the delete — dynamic
    // overwrite semantics would have silently left those dirs in
    // place), so a crash at ANY point replays idempotently: keep dirs
    // whose staged copy is gone were already installed; drops re-run.
    val keptDirs = (if (fs.exists(pending)) fs.listStatus(pending).toSeq else Seq.empty)
      .map(_.getPath.getName).filter(_.startsWith("cluster=")).toSet
    val plan = affected.map { c =>
      val d = s"cluster=$c"
      (if (keptDirs.contains(d)) "keep " else "drop ") + d
    }.sorted.mkString("\n")
    val tmp = new org.apache.hadoop.fs.Path(s"$store/$ForgetMarkerFile.tmp")
    val out = fs.create(tmp, true)
    try out.write(plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val marker = new org.apache.hadoop.fs.Path(s"$store/$ForgetMarkerFile")
    fs.delete(marker, false)
    fs.rename(tmp, marker)
    installForget(fs, store)
  }

  private val ForgetPendingDir = "_forget_pending"
  private val ForgetMarkerFile = "_forget_done"

  /** Complete (or discard) a half-finished [[forgetFromIvfPqStore]] —
    * idempotent; called from every store entry point (forget itself,
    * [[admitIvfPqBatch]], [[ivfPqStoredTopK]]). Before the marker
    * commits, the staged survivors are garbage (the live store is
    * untouched — discard them); after it, the marker's per-cluster
    * plan is replayed to completion.
    */
  def recoverForget(spark: org.apache.spark.sql.SparkSession,
                    store: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val marker = new org.apache.hadoop.fs.Path(s"$store/$ForgetMarkerFile")
    val pending = new org.apache.hadoop.fs.Path(s"$store/$ForgetPendingDir")
    if (fs.exists(marker)) installForget(fs, store)
    else if (fs.exists(pending)) fs.delete(pending, true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$store/$ForgetMarkerFile.tmp"), false)
  }

  private def installForget(fs: org.apache.hadoop.fs.FileSystem,
                            store: String): Unit = {
    val marker = new org.apache.hadoop.fs.Path(s"$store/$ForgetMarkerFile")
    if (!fs.exists(marker)) return
    val in = fs.open(marker)
    val plan = try new String(org.apache.commons.io.IOUtils.toByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
    val pending = new org.apache.hadoop.fs.Path(s"$store/$ForgetPendingDir")
    val codesPath = new org.apache.hadoop.fs.Path(s"$store/codes")
    plan.linesIterator.filter(_.nonEmpty).foreach { line =>
      val (action, dir) = line.splitAt(5)
      val staged = new org.apache.hadoop.fs.Path(pending, dir)
      val live = new org.apache.hadoop.fs.Path(codesPath, dir)
      action.trim match {
        case "keep" =>
          // staged copy still present → replace live; absent → this
          // cluster was already installed by a previous replay
          if (fs.exists(staged)) { fs.delete(live, true); fs.rename(staged, live) }
        case "drop" => fs.delete(live, true) // emptied by the delete
      }
    }
    fs.delete(pending, true)
    fs.delete(marker, false)
  }

  /** Incremental ADMISSION into a [[buildIvfPqStore]] store — the
    * insert half of the vector store's lifecycle (x23's forget is the
    * delete): a new batch of vectors is routed and encoded using the
    * STORED model parameters (coarse centroids for cluster assignment,
    * codebook for PQ codes — nothing is retrained), and its code rows
    * are APPENDED to the cluster partitions they route to. Admission
    * fidelity is the whole contract: the e29 gate builds the store
    * WITHOUT the batch, admits it, and gates retrieval against the
    * from-scratch full-corpus oracle — any drift in routing or encoding
    * through the store round-trip breaks the hash.
    *
    * Idempotence: a per-batch ledger marker (`_admitted/batch=<id>`)
    * is checked before the append and written after it, so re-running
    * a completed admission is a no-op. A crash BETWEEN append and
    * marker can duplicate the batch on redelivery — the streaming
    * admission path (sm08's per-batch dynamic-partition overwrite,
    * StreamNearDup's discipline) is the exactly-once variant; this
    * batch API trades that for plain appends and documents the window.
    *
    * Scale shape: O(batch) work end to end — the batch meets the
    * broadcast centroids/codebook, and the append touches only the
    * partitions the batch routes to; the existing corpus is never
    * read or rewritten (contrast x04's incremental-dedup admission,
    * same O(batch) discipline).
    */
  def admitIvfPqBatch(spark: org.apache.spark.sql.SparkSession, store: String,
                      batch: DataFrame, idCol: String, embCol: String,
                      batchId: Long, m: Int = 4, dsub: Int = 16): Unit = {
    recoverForget(spark, store)    // never append into a half-installed swap
    recoverRebalance(spark, store) // ...of either store mutation
    // Hadoop FS for the ledger (the store may live on HDFS/S3 — a
    // java.io.File check there always reads "absent" and every
    // redelivery would double-admit). Ledger retention is the shared
    // [[AdmissionLedger]]: markers behind the fold watermark answer
    // through `_admitted/_upto` instead of one FS entry per batch ever
    // admitted ([[compactAdmissionLedger]] folds them).
    val fs = AdmissionLedger.fsOf(spark, store)
    if (AdmissionLedger.isAdmitted(fs, store, batchId)) return
    val coarse = spark.read.parquet(s"$store/coarse")
    val csub = spark.read.parquet(s"$store/codebook")
    val v = batch.select(col(idCol).as("id"), quantize(col(embCol)).as("q"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assignAndEncode(v, coarse, csub, m, dsub)
      .repartition(col("cluster"))
      .write.mode("append").partitionBy("cluster")
      .parquet(s"$store/codes")
    v.unpersist()
    AdmissionLedger.record(fs, store, batchId)
  }

  /** Fold the admission ledger's behind-frontier markers into the
    * `_upto` watermark ([[AdmissionLedger.compact]]) — the retention
    * knob for long-lived stores (VERDICT r12 #2): without it the
    * ledger grows one FS entry per batch forever. Safe because batch
    * ids are monotonic and redelivery only ever hits the frontier
    * batch, whose marker survives the fold.
    */
  def compactAdmissionLedger(spark: org.apache.spark.sql.SparkSession,
                             store: String): Unit =
    AdmissionLedger.compact(AdmissionLedger.fsOf(spark, store), store)

  private val RebalancePendingDir = "_rebalance_pending"
  private val RebalanceMarkerFile = "_rebalance_done"

  /** Per-cluster vector counts of a store, restricted to clusters the
    * coarse table references (a mid-crash rebalance can leave staged
    * new-cluster partitions that are INVISIBLE to retrieval — probes
    * only ever match coarse ids — and this read honors the same
    * visibility rule). One row per live cluster: (cluster, n_vecs).
    */
  def ivfPqClusterSizes(spark: org.apache.spark.sql.SparkSession,
                        store: String): DataFrame = {
    recoverRebalance(spark, store)
    val live = spark.read.parquet(s"$store/coarse")
      .select(col("g_id").cast("long").as("cluster"))
    spark.read.parquet(s"$store/codes")
      .filter(col("subspace") === 0)
      .select(col("cluster").cast("long").as("cluster"))
      .join(broadcast(live), Seq("cluster"), "left_semi")
      .groupBy("cluster").agg(count(lit(1)).as("n_vecs"))
  }

  /** REBALANCE — the capacity-maintenance leg of the store lifecycle
    * (build → e29 admit → x23 forget → e19 serve → e31 rebalance).
    * Admissions route against FROZEN centroids, so a store that ingests
    * long enough grows hot clusters: every query probing one pays that
    * partition's full scan, and the p99 search cost is set by the
    * LARGEST cluster, not the mean (the FAISS re-provisioning problem).
    * This splits the hottest cluster in two, store-only:
    *
    *  1. sizes: one partial-agg pass over `subspace = 0` code rows
    *     (|clusters| result rows, driver-collected — provisioning-
    *     bounded, the probe-collect convention);
    *  2. the hot cluster's members are RECONSTRUCTED from their PQ
    *     codes against the broadcast codebook (integer codeword
    *     concatenation — the store never consults the raw corpus:
    *     rebalance must work where the original vectors are gone,
    *     GDPR'd, or cold);
    *  3. a deterministic 2-seed split: seed A = min vec_id, seed B =
    *     the member farthest from A (ties → smaller id), each member
    *     joins its nearer seed (ties → A) — one assignment round, the
    *     e10 one-Lloyd-round convention, all integer distances;
    *  4. new centroids = per-dimension floor-mean of each side's
    *     reconstructions (floor over an exact double ratio — sums are
    *     < 2^40, so the division is exact in IEEE and floors
    *     identically in both engines; integer `div`/`//` is AVOIDED
    *     here because Spark truncates toward zero while DuckDB floors,
    *     and coordinates go negative);
    *  5. install, crash-safe in the forget protocol's ordering: the
    *     two NEW cluster partitions are written first via per-writer
    *     dynamic overwrite (invisible until coarse references them,
    *     idempotent on retry), the new coarse (old minus hot plus the
    *     two new rows, ids max(g_id)+1 / +2) is staged to a pending
    *     dir, a marker commits, and [[recoverRebalance]] — run from
    *     every store entry point — replays the swap + hot-partition
    *     drop idempotently. Before the marker the live store is
    *     untouched (orphan partitions are invisible and get
    *     overwritten by the deterministic retry); after it the install
    *     completes.
    *
    * Retrieval code is unchanged: probes rank whatever centroids the
    * coarse table holds. The split halves the hot partition's scan
    * cost at the price of two centroid rows — provisioning I/O ∝ hot
    * cluster, never store size. Returns the split cluster id, or -1
    * when no cluster reaches `minSplitVectors` (no-op).
    */
  def rebalanceIvfPqStore(spark: org.apache.spark.sql.SparkSession,
                          store: String, m: Int = 4, dsub: Int = 16,
                          minSplitVectors: Long = 4): Long = {
    recoverRebalance(spark, store)
    recoverForget(spark, store)
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // the max live g_id is only needed to NAME the two split clusters —
    // independent of the whole seed chain, so its one-job collect runs
    // concurrently with it (guide §2.6) instead of serializing after
    // the sided persist
    val coarseLive = spark.read.parquet(s"$store/coarse")
    val mxF = {
      import scala.concurrent.Future
      import scala.concurrent.ExecutionContext.Implicits.global
      Future(coarseLive.agg(max(col("g_id"))).collect()(0).getLong(0))
    }
    val sizes = ivfPqClusterSizes(spark, store).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    if (sizes.isEmpty) return -1L
    val (hot, hotN) = sizes.minBy { case (c, n) => (-n, c) }
    if (hotN < minSplitVectors) return -1L
    val csub = spark.read.parquet(s"$store/codebook")
    val hotCodes = spark.read.parquet(s"$store/codes")
      .filter(col("cluster") === hot)
    // reconstruction: codeword subvectors concatenated in subspace
    // order — one broadcast join, grouped back to one row per member
    val recon = hotCodes
      .join(broadcast(csub),
        hotCodes("code") === csub("c_id") && hotCodes("subspace") === csub("s"))
      .groupBy(col("vec_id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("subspace"), col("cqs")))),
        e => e.getField("cqs"))).as("r"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def sq(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), _ + _)
    val seedA = recon.orderBy("vec_id").limit(1)
      .select(col("r").as("ra")).collect()(0).getSeq[Long](0)
    val withDa = recon.select(col("vec_id"), col("r"),
      sq(col("r"), lit(seedA.toArray)).as("d_a"))
    val seedB = withDa.orderBy(desc("d_a"), asc("vec_id")).limit(1)
      .select(col("r").as("rb")).collect()(0).getSeq[Long](0)
    // side 0 = seed A (ties), side 1 = seed B; new ids mx+1 / mx+2
    val sided = withDa.select(col("vec_id"), col("r"),
        when(sq(col("r"), lit(seedB.toArray)) < col("d_a"), 1L)
          .otherwise(0L).as("sd"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mx = {
      import scala.concurrent.{Await, duration}
      Await.result(mxF, duration.Duration.Inf)
    }
    // per-dimension floor-mean per side: dims × sides rows (m·dsub × 2)
    val cent = sided
      .select(col("sd"), posexplode(col("r")).as(Seq("pos", "v")))
      .groupBy("sd", "pos")
      .agg(floor(sum(col("v")).cast("double") / count(lit(1))).cast("long").as("cv"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val newCentroids = cent.groupBy(_._1).toSeq.map { case (sd, rows) =>
      (mx + 1 + sd, rows.sortBy(_._2).map(_._3))
    }
    // 1) new partitions first (invisible until coarse lists them;
    //    per-writer dynamic overwrite keeps the retry idempotent).
    //    localCheckpoint BEFORE the write: the frame reads codes/ and
    //    the writer overwrites under codes/ — an eager checkpoint cuts
    //    the file-source lineage entirely (the forget lesson: persist
    //    alone shields nothing; only a materialized, source-free plan
    //    can never recompute from partitions being rewritten)
    val newParts = sided
      .select(col("vec_id").as("__v"), (lit(mx + 1) + col("sd")).as("__c"))
      .join(hotCodes, col("__v") === hotCodes("vec_id"))
      .select(col("vec_id"), col("subspace"), col("code"), col("dist_q"),
        col("__c").as("cluster"))
      .localCheckpoint(true)
    newParts
      .repartition(col("cluster"))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("cluster").parquet(s"$store/codes")
    recon.unpersist(); sided.unpersist()
    // 2) stage the new coarse (old minus hot, plus the two new rows)
    val pending = new org.apache.hadoop.fs.Path(s"$store/$RebalancePendingDir")
    fs.delete(pending, true)
    import spark.implicits._
    coarseLive.filter(col("g_id") =!= hot)
      .unionByName(newCentroids.toDF("g_id", "gq"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$pending/coarse")
    // 3) marker commits; install = coarse swap + hot-partition drop
    val tmp = new org.apache.hadoop.fs.Path(s"$store/$RebalanceMarkerFile.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"drop cluster=$hot".getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val marker = new org.apache.hadoop.fs.Path(s"$store/$RebalanceMarkerFile")
    fs.delete(marker, false)
    fs.rename(tmp, marker)
    installRebalance(fs, store)
    hot
  }

  /** Complete (or discard) a half-finished [[rebalanceIvfPqStore]] —
    * idempotent; run from every store entry point. Before the marker
    * the live store is untouched (staged coarse and orphan new
    * partitions are discarded/overwritten by the deterministic retry);
    * after it the coarse swap + hot-partition drop replay to
    * completion.
    */
  def recoverRebalance(spark: org.apache.spark.sql.SparkSession,
                       store: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val marker = new org.apache.hadoop.fs.Path(s"$store/$RebalanceMarkerFile")
    val pending = new org.apache.hadoop.fs.Path(s"$store/$RebalancePendingDir")
    if (fs.exists(marker)) installRebalance(fs, store)
    else if (fs.exists(pending)) fs.delete(pending, true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$store/$RebalanceMarkerFile.tmp"), false)
  }

  private def installRebalance(fs: org.apache.hadoop.fs.FileSystem,
                               store: String): Unit = {
    val marker = new org.apache.hadoop.fs.Path(s"$store/$RebalanceMarkerFile")
    if (!fs.exists(marker)) return
    val in = fs.open(marker)
    val plan = try new String(org.apache.commons.io.IOUtils.toByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
    val stagedCoarse = new org.apache.hadoop.fs.Path(
      s"$store/$RebalancePendingDir/coarse")
    val liveCoarse = new org.apache.hadoop.fs.Path(s"$store/coarse")
    // staged copy still present → swap; absent → already installed
    if (fs.exists(stagedCoarse)) {
      fs.delete(liveCoarse, true)
      fs.rename(stagedCoarse, liveCoarse)
    }
    plan.linesIterator.filter(_.startsWith("drop ")).foreach { line =>
      fs.delete(new org.apache.hadoop.fs.Path(
        s"$store/codes/${line.stripPrefix("drop ")}"), true)
    }
    fs.delete(new org.apache.hadoop.fs.Path(s"$store/$RebalancePendingDir"), true)
    fs.delete(marker, false)
  }

  /** Clear one batch's admission-ledger marker — the deliberate
    * re-ingest knob. [[forgetFromIvfPqStore]] removes a vector's code
    * ROWS but cannot know which batch ids carried them, so after
    * forgetting a bad batch its marker still blocks a same-id
    * re-admission (admitIvfPqBatch would no-op and the caller would
    * believe the corrected batch landed). Streams avoid this by
    * construction (batch ids are never reused); a batch-oriented
    * forget-and-reingest must either use a FRESH batch id or clear the
    * old marker with this call first.
    */
  def clearAdmissionLedger(spark: org.apache.spark.sql.SparkSession,
                           store: String, batchId: Long): Unit =
    AdmissionLedger.clear(AdmissionLedger.fsOf(spark, store), store, batchId)

  /** MULTI-PROBE LSH top-k (Lv et al., "Multi-Probe LSH"): [[knnLsh]]
    * probes only the query's own bucket — recall is then hostage to the
    * hash (a true neighbor one sign-bit away is invisible). Multi-probe
    * also visits the `planes` buckets at Hamming distance 1 from the
    * query's signature (each single-bit flip — the buckets a borderline
    * hyperplane side lands in), buying recall WITHOUT more hash tables:
    * 1+planes probes per query instead of an independent-table copy of
    * the corpus per extra probe. e14's recall evaluation is the dial
    * this trades against.
    *
    * Scale shape: identical to e02 — the probe expansion happens on the
    * BROADCAST query side (1+planes rows per query, still tiny); the
    * corpus-side bucket equi-join and the exact-cosine rerank are
    * unchanged. A vector lives in exactly one bucket and the probe set
    * is distinct, so no (q, candidate) pair duplicates — no distinct.
    */
  def knnLshMultiProbe(vectors: DataFrame, idCol: String, embCol: String,
                       queryPred: Column, k: Int, planes: Int,
                       dims: Int): DataFrame = {
    val v = withBucket(withNormFixed(vectors, idCol, embCol, dims), "emb", planes, dims)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = v.filter(queryPred)
      .select(col("id").as("q_id"), col("emb").as("q_emb"),
        col("norm_f").as("q_norm"), col("bucket").as("q_bucket"))
      .withColumn("probe", explode(expr(
        s"concat(array(q_bucket), transform(sequence(0, ${planes - 1}), " +
          "j -> q_bucket ^ shiftleft(CAST(1 AS BIGINT), j)))")))
    val scored = v.join(broadcast(q),
        col("bucket") === col("probe") && col("id") =!= col("q_id"))
      .select(col("q_id"), col("id").as("n_id"),
        cosineFromFixed(dotF(col("q_emb"), col("emb"), dims),
          col("q_norm"), col("norm_f")).as("cosine"))
    val w = Window.partitionBy("q_id").orderBy(desc("cosine"), asc("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "cosine")
  }

  /** Lloyd-trained IVF centroids: k-means over cosine affinity. Seeds are
    * the k lowest-id vectors (deterministic); each round broadcasts the
    * current centroids, assigns every vector to its argmax-cosine centroid
    * (the same affinity shape [[knnIvf]] probes), and recomputes each
    * centroid as the per-dimension mean of its members via exact decimal
    * sums, so the result is independent of partitioning/order. Centroids
    * collect to the driver between rounds — k×dims floats, the model
    * state a real IVF index ships — which also resets lineage per round.
    * Empty clusters keep their previous centroid. Returns (c_id, c_emb)
    * for [[knnIvfTrained]].
    */
  def trainIvfCentroids(vectors: DataFrame, idCol: String, embCol: String,
                        k: Int, iters: Int,
                        maxModelBytes: Long = 128L << 20): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    // the k×dims float model lives on the driver and is broadcast every
    // round — bound it the way cosinePairsTopK bounds its kernel
    // (VERDICT r8 #6): an oversized k would otherwise OOM the driver
    // quietly on round 1's collect
    // probe the FIRST NON-NULL embedding's width as a 1-row narrow scan
    // (IsNotNull pushes to the scan, only `size` leaves it): a null
    // first row must not read as dims=0 and silently bypass the budget
    // guard, and the probe must not run the full upstream plan wide
    val dims = vectors.filter(col(embCol).isNotNull)
      .select(size(col(embCol))).as[Int].head(1)
      .headOption.getOrElse(0) // fully-null/empty input: nothing to train
    require(dims == 0 || k.toLong * dims * 4 <= maxModelBytes,
      s"trainIvfCentroids: k=$k × dims=$dims centroids = " +
        s"${k.toLong * dims * 4} model bytes exceed the $maxModelBytes " +
        "driver budget — lower k (IVF provisioning is k ∝ √n, not n) or " +
        "raise maxModelBytes if the driver heap allows")
    val v = withNormFixed(vectors, idCol, embCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var centLocal: Seq[(Long, Seq[Float])] = v.orderBy("id").limit(k)
      .select(col("emb")).as[Seq[Float]].collect()
      .zipWithIndex.map { case (e, i) => (i.toLong, e.toSeq) }.toSeq
    for (_ <- 0 until iters) {
      val cent = centLocal.toDF("c_id", "c_emb")
        .select(col("c_id"), col("c_emb"),
          dotFixed(col("c_emb"), col("c_emb")).as("c_norm"))
      val wAssign = Window.partitionBy("id").orderBy(desc("c_cos"), asc("c_id"))
      val assigned = v.crossJoin(broadcast(cent))
        .select(col("id"), col("emb"), col("c_id"),
          cosineFromFixed(dotFixed(col("emb"), col("c_emb")),
            col("norm_f"), col("c_norm")).as("c_cos"))
        .withColumn("crn", row_number().over(wAssign))
        .filter(col("crn") === 1)
      val means = assigned
        .select(col("c_id"), posexplode(col("emb")).as(Seq("dim", "x")))
        .groupBy("c_id", "dim")
        .agg((sum(col("x").cast("decimal(28,8)")) / count(lit(1)))
          .cast("float").as("m"))
        .groupBy("c_id")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          s => s.getField("m")).as("c_emb"))
        .as[(Long, Seq[Float])].collect().toMap
      centLocal = centLocal.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
    }
    v.unpersist()
    centLocal.toDF("c_id", "c_emb")
  }

  /** One Lloyd ROUND as a verifiable DataFrame — the oracle-gated body
    * of [[trainIvfCentroids]]: assign every vector to its argmax-cosine
    * seed centroid (ties to the lower c_id, exactly the training loop's
    * window), then recompute each centroid as the per-dimension
    * decimal-exact member mean, quantized to the 1e-6 grid so the means
    * are engine-portable. Returns one row per (c_id, dim) with the
    * cluster size and quantized mean — k×dims rows, the model-state
    * delta a training round ships.
    *
    * Scale shape: centroids broadcast (k×dims floats), assignment is one
    * scan + per-id argmax window, means are one keyed agg over
    * (c_id, dim) — the same per-round cost [[trainIvfCentroids]] pays,
    * now pinned by the e10 oracle instead of spec-only.
    */
  def kmeansRound(vectors: DataFrame, idCol: String, embCol: String,
                  seedPred: Column): DataFrame = {
    val v = withNormFixed(vectors, idCol, embCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cent = v.filter(seedPred)
      .select(col("id").as("c_id"), col("emb").as("c_emb"), col("norm_f").as("c_norm"))
    val wAssign = Window.partitionBy("id").orderBy(desc("c_cos"), asc("c_id"))
    val assigned = v.crossJoin(broadcast(cent))
      .select(col("id"), col("emb"), col("c_id"),
        cosineFromFixed(dotFixed(col("emb"), col("c_emb")),
          col("norm_f"), col("c_norm")).as("c_cos"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
    assigned
      .select(col("c_id"), posexplode(col("emb")).as(Seq("pos", "x")))
      .groupBy(col("c_id"), (col("pos") + 1).cast("long").as("dim"))
      .agg(count(lit(1)).as("n_members"),
        floor((sum(col("x").cast("decimal(28,8)")).cast("double") / count(lit(1)))
          * lit(1000000.0)).cast("long").as("m_q"))
  }

  /** PRODUCT-QUANTIZATION assignment — the encoding pass of PQ/IVF-PQ,
    * the compression behind billion-scale ANN: the vector splits into
    * `m` subvectors of `dsub` dims, each assigned to its nearest
    * codeword in that subspace's codebook (here the subvector slices of
    * the vectors matching `codebookPred`, codeword id = seed id). A
    * 64-dim float vector becomes m=4 byte codes — 64× compression —
    * and distances against it are table lookups. All math runs on the
    * int8 grid ([[quantize]]): integer squared-L2 per subspace, argmin
    * with ties to the lower codeword id, deterministic across engines.
    *
    * Returns one row per (vec, subspace): (vec_id, subspace, code,
    * dist_q) where dist_q is the subspace quantization distortion.
    *
    * Scale shape: the codebook broadcasts (m × k × dsub ints); each
    * vector meets k codewords per subspace through the broadcast join
    * and the argmin is a map-side-combinable min-struct aggregate —
    * one narrow shuffle of (id, s) keys. Codebook TRAINING is k-means
    * per subspace — [[kmeansRound]]/[[trainIvfCentroids]] over the
    * subvector slices, the same driver-looped rounds.
    */
  def pqAssign(vectors: DataFrame, idCol: String, embCol: String,
               codebookPred: Column, m: Int = 4, dsub: Int = 16): DataFrame = {
    val v = vectors
      .select(col(idCol).as("id"), quantize(col(embCol)).as("q"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def subs(qc: Column, out: String) =
      explode(transform(sequence(lit(0), lit(m - 1)),
        s => struct(s.cast("long").as("s"),
          slice(qc, s * dsub + 1, lit(dsub)).as(out)))).as("e")
    val csub = v.filter(codebookPred)
      .select(col("id").as("c_id"), subs(col("q"), "cqs"))
      .select(col("c_id"), col("e.s").as("s"), col("e.cqs").as("cqs"))
    // codebook folded to one broadcast row; the per-(vec, subspace)
    // argmin is a per-row HOF projection — the former corpus explode ⋈
    // codebook + keyed agg (one exchange on (id, s)) is gone, same
    // integer arithmetic per candidate, bit-identical output
    v.crossJoin(broadcast(cwordsRow(csub)))
      .select(col("id"), explode(pqCodes(col("q"), col("cwords"), m, dsub)).as("e"))
      // empty-codebook guard — see assignAndEncode (ADVICE r13)
      .filter(col("e.best").isNotNull)
      .select(col("id").as("vec_id"), col("e.s").as("subspace"),
        col("e.best.c_id").as("code"), col("e.best.dist").as("dist_q"))
  }

  /** PQ ASYMMETRIC-DISTANCE top-k retrieval — the search half of
    * [[pqAssign]]'s encoding: each query precomputes a DISTANCE TABLE
    * (per subspace, its exact squared-L2 to every codeword's
    * subvector), and a database vector's approximate distance is then
    * just the SUM of m table lookups on its codes — the corpus is
    * scanned as m small ints per row, never as floats. All math on the
    * int8-quantized grid (exact integers; no float-order hazard).
    *
    * Scale shape: the distance tables are |queries|·m·|codes| rows —
    * broadcast; the only corpus-sized work is the code scan plus a
    * (q_id, vec_id)-keyed partial-agg sum (map-side combinable, m rows
    * in per key), then a per-query top-k window over candidate rows.
    * This is why PQ wins at 100 TB: 4 bytes/vector scanned instead of
    * 256, and the float corpus appears nowhere in the search plan.
    */
  def pqAdcTopK(vectors: DataFrame, idCol: String, embCol: String,
                codebookPred: Column, queryPred: Column, k: Int,
                m: Int = 4, dsub: Int = 16): DataFrame = {
    val codes = pqAssign(vectors, idCol, embCol, codebookPred, m, dsub)
    val v = vectors.select(col(idCol).as("id"), quantize(col(embCol)).as("q"))
    def subs(qc: Column, out: String) =
      explode(transform(sequence(lit(0), lit(m - 1)),
        s => struct(s.cast("long").as("s"),
          slice(qc, s * dsub + 1, lit(dsub)).as(out)))).as("e")
    val csub = v.filter(codebookPred)
      .select(col("id").as("c_id"), subs(col("q"), "cqs"))
      .select(col("c_id"), col("e.s").as("s"), col("e.cqs").as("cqs"))
    val qsub = v.filter(queryPred)
      .select(col("id").as("q_id"), subs(col("q"), "qs"))
      .select(col("q_id"), col("e.s").as("s"), col("e.qs").as("qs"))
    val tab = qsub.join(csub, "s")
      .select(col("q_id"), col("s"), col("c_id"),
        aggregate(zip_with(col("qs"), col("cqs"), (x, y) => (x - y) * (x - y)),
          lit(0L), _ + _).as("tdist"))
    val scored = codes
      .join(broadcast(tab),
        codes("subspace") === tab("s") && codes("code") === tab("c_id") &&
          codes("vec_id") =!= tab("q_id"))
      .groupBy(col("q_id"), col("vec_id").as("n_id"))
      .agg(sum(col("tdist")).as("adc_dist"))
    val w = Window.partitionBy("q_id").orderBy(asc("adc_dist"), asc("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "adc_dist")
  }

  /** IVF-PQ top-k — the composed billion-scale ANN index (FAISS
    * `IVFx,PQy` with by_residual=false): coarse IVF routing restricts
    * the search to `nprobe` clusters, and within them vectors score by
    * [[pqAdcTopK]]'s asymmetric code-lookup distance instead of exact
    * floats. e03 gates the routing alone, e15 the ADC scoring alone;
    * this gates their interaction — the cluster restriction must apply
    * to the CODES, and a neighbor outside every probed cluster must
    * never score, however close its codes.
    *
    * Routing metric is full-vector integer squared-L2 on the quantized
    * grid (the same metric family PQ scores in — cosine routing with L2
    * scoring would rank differently at cluster borders), assignment and
    * probes from one shared affinity frame.
    *
    * Scale shape: the coarse centroid table broadcasts (both for
    * assignment and probes); codes ⋈ cluster is the index-build
    * co-location join (in a stored index the code row CARRIES its
    * cluster — here it is materialized once); search-time work is
    * |probed clusters| worth of code rows through a broadcast of the
    * per-query distance tables, then a (q, vec)-keyed partial agg —
    * the corpus is scanned as m ints/row and only inside probed
    * clusters, the IVF and PQ savings multiplying.
    */
  def knnIvfPqAdc(vectors: DataFrame, idCol: String, embCol: String,
                  coarsePred: Column, codebookPred: Column, queryPred: Column,
                  k: Int, nprobe: Int, m: Int = 4, dsub: Int = 16): DataFrame =
    knnIvfPqAdcCurve(vectors, idCol, embCol, coarsePred, codebookPred,
      queryPred, k, Seq(nprobe), m, dsub)
      .drop("nprobe")

  /** [[knnIvfPqAdc]] evaluated at SEVERAL probe widths in one pass —
    * the e21 tuning-curve shape. Assignment, encoding, and the ADC
    * join are probe-width-INDEPENDENT (a neighbor's cluster and codes
    * do not change with nprobe; only which clusters score does), so
    * the curve scores candidates ONCE at max(nprobes) keeping each
    * candidate cluster's probe rank, then each sweep point is a rank
    * filter + top-k — the former per-width re-computation (full
    * re-quantize + re-assign + re-encode + re-join per point) is gone.
    * Output: (nprobe, q_id, rank, n_id, adc_dist), identical per width
    * to an independent [[knnIvfPqAdc]] run at that width.
    *
    * Scale shape: model params fold to one broadcast row each
    * ([[centsRow]]/[[cwordsRow]]); routing + encoding are per-row
    * projections (zero corpus shuffles); scoring is the one
    * (q, vec)-keyed partial agg the ADC search fundamentally needs,
    * paid once for the whole curve.
    */
  def knnIvfPqAdcCurve(vectors: DataFrame, idCol: String, embCol: String,
                       coarsePred: Column, codebookPred: Column, queryPred: Column,
                       k: Int, nprobes: Seq[Int], m: Int = 4, dsub: Int = 16,
                       maxQueryRows: Int = 1000000): DataFrame = {
    require(nprobes.nonEmpty, "knnIvfPqAdcCurve: empty nprobes")
    val spark = vectors.sparkSession
    val maxNp = nprobes.max
    val v = vectors.select(col(idCol).as("id"), quantize(col(embCol)).as("q"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Collect the model params and the request-sized query set in ONE
    // predicate-tagged pass over the persisted quantized frame (which
    // the collect also materializes — the former folded-row form ran
    // FOUR broadcast-BUILD jobs, coarse / cents fold / cwords fold ×2
    // legs, each re-scanning it), then compute probes and ADC tables
    // coordinator-side ([[localProbesAndTab]]) and broadcast plain
    // local frames: local relations broadcast without launching a job,
    // so the query plans from here on are the same joins over the same
    // rows with the model-param subplans gone. Budgeted like
    // ivfPqStoredTopK: queries are a bounded sample by contract, model
    // params broadcast-class by the provisioning invariant.
    val tagRows = v.select(col("id"), col("q"), coarsePred.as("__c"),
        codebookPred.as("__cb"), queryPred.as("__q"))
      .filter(col("__c") || col("__cb") || col("__q"))
      .limit(maxQueryRows + 1).collect()
    require(tagRows.length <= maxQueryRows,
      s"knnIvfPqAdcCurve: > $maxQueryRows query+model rows — the query " +
        "side must be a bounded sample/request frame; raise maxQueryRows " +
        "if the driver heap allows")
    def tag(r: org.apache.spark.sql.Row, i: Int): Boolean =
      !r.isNullAt(i) && r.getBoolean(i)
    val centsT = tagRows.toSeq.filter(tag(_, 2))
      .map(r => (r.get(0), r.getSeq[Long](1)))
    val qT = tagRows.toSeq.filter(tag(_, 4))
      .map(r => (r.get(0), r.getSeq[Long](1)))
    // the per-subspace codebook slices, cut driver-side — the same
    // slice(q, s·dsub+1, dsub) the former subs() explode produced
    val cwT = tagRows.toSeq.filter(tag(_, 3)).flatMap { r =>
      val cid = r.get(0); val qq = r.getSeq[Long](1)
      (0 until m).map(s => (cid, s.toLong, qq.slice(s * dsub, (s + 1) * dsub)))
    }
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StructField, StructType}
    val idType = v.schema("id").dataType
    val qType = v.schema("q").dataType
    val coarseLocal = spark.createDataFrame(
      java.util.Arrays.asList(centsT.map { case (g, gq) => Row(g, gq) }: _*),
      StructType(Seq(StructField("g_id", idType), StructField("gq", qType))))
    // the folded single-row codebook ([[cwordsRow]]'s shape), assembled
    // locally: sort_array orders structs by (s, c_id, cqs) and (s, c_id)
    // is unique, so the local sort is the same order
    val cwStruct = StructType(Seq(
      StructField("s", LongType),
      StructField("c_id", idType),
      StructField("cqs", qType)))
    val cwordsLocal = spark.createDataFrame(
      java.util.Arrays.asList(Row(
        cwT.map { case (cid, sL, cqs) => (sL, asLong(cid), cid, cqs) }
          .sortBy { case (sL, cL, _, _) => (sL, cL) }
          .map { case (sL, _, cid, cqs) => Row(java.lang.Long.valueOf(sL), cid, cqs) })),
      StructType(Seq(StructField("cwords", ArrayType(cwStruct)))))
    // corpus-side cluster assignment: broadcast-join + min-struct agg
    // (codegen-friendly; the per-row folded-cents argmin measured 2.8×
    // slower at the 100× tier — see assignAndEncode); PQ codes keep the
    // folded-codebook per-row form (bounded codebook, measured faster)
    val assigned = v.crossJoin(broadcast(coarseLocal))
      .select(col("id"), col("g_id"),
        aggregate(zip_with(col("q"), col("gq"), (x, y) => (x - y) * (x - y)),
          lit(0L), _ + _).as("gdist"))
      .groupBy("id")
      .agg(min(struct(col("gdist"), col("g_id"))).as("b"))
      .select(col("id").as("a_id"), col("b.g_id").as("cluster"))
    val clustered = v.crossJoin(broadcast(cwordsLocal))
      .select(col("id"), explode(pqCodes(col("q"), col("cwords"), m, dsub)).as("e"))
      // degenerate (empty) codebook: pqCodes' array_min over no
      // codewords is null — drop such rows to keep the former keyed-agg
      // "no codebook → no codes" semantics (ADVICE r13)
      .filter(col("e.best").isNotNull)
      .select(col("id").as("vec_id"), col("e.s").as("subspace"),
        col("e.best.c_id").as("code"))
      .join(assigned, col("vec_id") === col("a_id")).drop("a_id")
    // per-query probe list, rank-indexed: sorted (gdist, g_id) prefix —
    // identical ordering to the former per-query rank window
    val (probeRows, tabRows) = localProbesAndTab(
      qT.map { case (i, qq) => (i, qq.toArray) },
      centsT.map { case (g, gq) => (g, gq.toArray) },
      cwT.map { case (cid, sL, cqs) => (cid, sL, cqs.toArray) },
      maxNp, dsub, withRank = true)
    val probes = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*),
      StructType(Seq(
        StructField("q_id", idType),
        StructField("p_rank", IntegerType),
        StructField("cluster", idType))))
    val tab = spark.createDataFrame(
      java.util.Arrays.asList(tabRows: _*),
      StructType(Seq(
        StructField("tq_id", idType),
        StructField("s", LongType),
        StructField("c_id", idType),
        StructField("tdist", LongType))))
    // score once at maxNp; every (q, vec) pair lives in exactly ONE
    // cluster, so its probe rank is constant across its m code rows and
    // `min(p_rank)` is that rank — filtering scored pairs by rank ≤ np
    // is exactly "score only clusters probed at width np"
    val scoredBase = clustered.join(broadcast(probes), Seq("cluster"))
      .join(broadcast(tab),
        col("tq_id") === col("q_id") && col("subspace") === col("s") &&
          col("code") === col("c_id") && col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id").as("n_id"))
      .agg(sum(col("tdist")).as("adc_dist"), min(col("p_rank")).as("p_rank"))
    // persist pays only when several sweep points re-read the scores —
    // a single-width call (the knnIvfPqAdc path) must not buy a cache
    // write it never reads back
    val scored =
      if (nprobes.size > 1)
        scoredBase.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else scoredBase
    val wTop = Window.partitionBy("q_id").orderBy(asc("adc_dist"), asc("n_id"))
    nprobes.map { np =>
      (if (np >= maxNp) scored else scored.filter(col("p_rank") <= np))
        .withColumn("rank", row_number().over(wTop))
        .filter(col("rank") <= k)
        .select(lit(np.toLong).as("nprobe"),
          col("q_id"), col("rank"), col("n_id"), col("adc_dist"))
    }.reduce(_ unionByName _)
  }

  /** [[knnIvf]] against an externally-trained centroid table (c_id, c_emb)
    * — e.g. [[trainIvfCentroids]] output.
    */
  def knnIvfTrained(vectors: DataFrame, idCol: String, embCol: String,
                    centroids: DataFrame, queryPred: Column, k: Int,
                    nprobe: Int, dims: Int = -1): DataFrame = {
    val v = withNormFixed(vectors, idCol, embCol, dims)
    val cent = centroids.select(col("c_id"), col("c_emb"),
      dotF(col("c_emb"), col("c_emb"), dims).as("c_norm"))
    ivfSearch(v, cent, queryPred, k, nprobe, dims)
  }

  /** IVF top-k: assign every vector to its nearest centroid (given
    * centroid set), probe the `nprobe` nearest centroids per query, and
    * search only vectors in those clusters.
    */
  def knnIvf(vectors: DataFrame, idCol: String, embCol: String,
             centroidPred: Column, queryPred: Column, k: Int, nprobe: Int,
             dims: Int = -1): DataFrame = {
    val v = withNormFixed(vectors, idCol, embCol, dims)
    val cent = v.filter(centroidPred)
      .select(col("id").as("c_id"), col("emb").as("c_emb"), col("norm_f").as("c_norm"))
    ivfSearch(v, cent, queryPred, k, nprobe, dims)
  }

  private def ivfSearch(v: DataFrame, cent: DataFrame, queryPred: Column,
                        k: Int, nprobe: Int, dims: Int): DataFrame = {
    val affinity = v.crossJoin(broadcast(cent))
      .select(col("id"), col("emb"), col("norm_f"), col("c_id"),
        cosineFromFixed(dotF(col("emb"), col("c_emb"), dims), col("norm_f"), col("c_norm"))
          .as("c_cos"))
    val wAssign = Window.partitionBy("id").orderBy(desc("c_cos"), asc("c_id"))
    val assigned = affinity.withColumn("crn", row_number().over(wAssign))
      .filter(col("crn") === 1)
      .select(col("id"), col("emb"), col("norm_f"), col("c_id").as("cluster"))
    val probes = affinity.filter(queryPred)
      .withColumn("crn", row_number().over(wAssign))
      .filter(col("crn") <= nprobe)
      .select(col("id").as("q_id"), col("emb").as("q_emb"),
        col("norm_f").as("q_norm"), col("c_id").as("cluster"))
    val scored = assigned.join(broadcast(probes),
        assigned("cluster") === probes("cluster") && col("id") =!= col("q_id"))
      .select(col("q_id"), col("id").as("n_id"),
        cosineFromFixed(dotF(col("q_emb"), col("emb"), dims), col("q_norm"), col("norm_f"))
          .as("cosine"))
      .distinct() // a neighbor can sit in two probed clusters
    val w = Window.partitionBy("q_id").orderBy(desc("cosine"), asc("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "cosine")
  }

  /** Sub-quadratic near-dup pairs: candidates share an LSH bucket, exact
    * cosine on candidates only — the scale path [[cosinePairs]] baselines.
    * The bucket equi-join is the single shuffle; candidate volume is
    * tuned by `planes`.
    */
  def lshPairs(vectors: DataFrame, idCol: String, embCol: String,
               planes: Int, dims: Int): DataFrame = {
    // norm + bucket signatures feed both self-join sides; a broadcast
    // self-join cannot reuse exchanges, so materialize them once
    val v = withBucket(withNormFixed(vectors, idCol, embCol), "emb", planes, dims)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    v.as("a").join(v.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosineFromFixed(dotFixed(col("a.emb"), col("b.emb")),
          col("a.norm_f"), col("b.norm_f")).as("cosine"))
  }

  /** SemDeDup — cluster-then-prune semantic dedup (the published
    * embedding-dedup recipe: k-means the corpus, then prune high-cosine
    * pairs WITHIN clusters only, never all-pairs): vectors are assigned
    * to their nearest centroid, within-cluster pairs with cosine ≥
    * `threshold` form duplicate groups (connected components), and every
    * non-representative member (id ≠ group min) is emitted as a removal
    * with its kept representative.
    *
    * Scale shape: centroid assignment is a broadcast affinity join
    * (centroid count ≪ corpus); the pair search is an equi-join on the
    * cluster id — candidate volume is Σ|cluster|², tuned by the centroid
    * count exactly as SemDeDup tunes k — and grouping reuses
    * [[Dedup.connectedComponents]] (bounded union-find / O(log d)
    * propagation). No stage touches the O(n²) global pair space.
    *
    * CHOOSE THE VARIANT BY HOW k SCALES: this brute assignment is n·k
    * dot products — the right tool at k ∝ √n (both stages balance at
    * n^1.5). If you grow k ∝ n to hold cluster size constant (the
    * published SemDeDup deployment at corpus scale), n·k is QUADRATIC —
    * measured 17.3× per 10× data at the 100× tier — and you want
    * [[semDedupRemovalsTwoLevel]], whose coarse-quantized assignment
    * keeps k ∝ n linear (measured 1.2×/7.6× per 10×).
    */
  def semDedupRemovals(vectors: DataFrame, idCol: String, embCol: String,
                       centroidPred: Column, threshold: Double,
                       dims: Int = -1): DataFrame = {
    val v = withNormFixed(vectors, idCol, embCol, dims)
    val cent = v.filter(centroidPred)
      .select(col("id").as("c_id"), col("emb").as("c_emb"), col("norm_f").as("c_norm"))
    val wAssign = Window.partitionBy("id").orderBy(desc("c_cos"), asc("c_id"))
    // assignment feeds both self-join sides — materialize it once
    val assigned = v.crossJoin(broadcast(cent))
      .select(col("id"), col("emb"), col("norm_f"), col("c_id"),
        cosineFromFixed(dotF(col("emb"), col("c_emb"), dims), col("norm_f"), col("c_norm"))
          .as("c_cos"))
      .withColumn("crn", row_number().over(wAssign))
      .filter(col("crn") === 1)
      .select(col("id"), col("emb"), col("norm_f"), col("c_id").as("cluster"))
    pruneWithinClusters(assigned, threshold, dims)
  }

  /** Shared SemDeDup tail: within-cluster threshold pairs → duplicate
    * groups (connected components) → (removed_id, keep_id) with the min
    * id kept per group. `assigned` must carry (id, emb, norm_f, cluster)
    * and is persisted here because both self-join sides consume it.
    */
  private def pruneWithinClusters(assigned0: DataFrame, threshold: Double,
                                  dims: Int): DataFrame = {
    val assigned = assigned0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = assigned.as("a")
      .join(assigned.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosineFromFixed(dotF(col("a.emb"), col("b.emb"), dims),
          col("a.norm_f"), col("b.norm_f")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b")
    Dedup.connectedComponents(pairs)
      .filter(col("id") =!= col("comp"))
      .select(col("id").as("removed_id"), col("comp").as("keep_id"))
  }

  /** SemDeDup with a TWO-LEVEL (coarse-quantized) assignment — the FAISS
    * IVF recipe that makes `k ∝ n` centroids affordable: a brute
    * assignment is n·k dot products (quadratic when k grows with the
    * corpus — measured 61× per 10× data at the 100× tier), while routing
    * each vector through ~√k coarse centroids first costs
    * n·(√k + k/√k) = n·2√k, with the within-cluster pair stage at
    * n²/k = O(n) when k ∝ n.
    *
    * Structure (every stage a broadcast join or keyed window — no stage
    * touches the O(n²) pair space, no driver collect):
    *  1. coarse set = every ⌈√k⌉-th centroid in id-rank order
    *     (deterministic, no training pass);
    *  2. each fine centroid → its argmax-cosine coarse centroid
    *     (k·√k dots, both sides broadcast-tiny);
    *  3. each vector → argmax coarse (n·√k dots), then → argmax FINE
    *     within that coarse group only (n·k/√k dots via a broadcast
    *     equi-join on the coarse id);
    *  4. within-cluster prune, identical to [[semDedupRemovals]].
    *
    * The assignment is approximate exactly the way IVF search is (a
    * vector whose true nearest fine centroid lives under a different
    * coarse centroid lands in the runner-up cluster — SemDeDup tolerates
    * this: clusters only SCOPE the pair search), but it is fully
    * DETERMINISTIC fixed-point arithmetic, so the e06b gate recomputes
    * it exactly in SQL; on well-separated clusters it equals the brute
    * assignment (spec'd).
    */
  def semDedupRemovalsTwoLevel(vectors: DataFrame, idCol: String, embCol: String,
                               centroidPred: Column, threshold: Double,
                               dims: Int = -1): DataFrame = {
    val v = withNormFixed(vectors, idCol, embCol, dims)
    val cent = v.filter(centroidPred)
      .select(col("id").as("c_id"), col("emb").as("c_emb"),
        col("norm_f").as("c_norm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val k = cent.count()
    val stride = math.max(1L, math.round(math.sqrt(k.toDouble)))
    // single-partition window over k centroid rows — the centroid table
    // is broadcast-class by contract (same size class as IVF models)
    val coarse = cent
      .withColumn("__r", row_number().over(Window.orderBy("c_id")))
      .filter((col("__r") - 1) % stride === 0)
      .select(col("c_id").as("g_id"), col("c_emb").as("g_emb"),
        col("c_norm").as("g_norm"))
    val wCg = Window.partitionBy("c_id").orderBy(desc("cg_cos"), asc("g_id"))
    val centGroup = cent.crossJoin(broadcast(coarse))
      .select(col("c_id"), col("c_emb"), col("c_norm"), col("g_id"),
        cosineFromFixed(dotF(col("c_emb"), col("g_emb"), dims),
          col("c_norm"), col("g_norm")).as("cg_cos"))
      .withColumn("rn", row_number().over(wCg)).filter(col("rn") === 1)
      .select(col("c_id"), col("c_emb"), col("c_norm"), col("g_id"))
    val wVg = Window.partitionBy("id").orderBy(desc("vg_cos"), asc("g_id"))
    val vCoarse = v.crossJoin(broadcast(coarse))
      .select(col("id"), col("emb"), col("norm_f"), col("g_id"),
        cosineFromFixed(dotF(col("emb"), col("g_emb"), dims),
          col("norm_f"), col("g_norm")).as("vg_cos"))
      .withColumn("rn", row_number().over(wVg)).filter(col("rn") === 1)
      .select(col("id"), col("emb"), col("norm_f"), col("g_id"))
    val wVc = Window.partitionBy("id").orderBy(desc("vc_cos"), asc("c_id"))
    val assigned = vCoarse.join(broadcast(centGroup), "g_id")
      .select(col("id"), col("emb"), col("norm_f"), col("c_id"),
        cosineFromFixed(dotF(col("emb"), col("c_emb"), dims),
          col("norm_f"), col("c_norm")).as("vc_cos"))
      .withColumn("rn", row_number().over(wVc)).filter(col("rn") === 1)
      .select(col("id"), col("emb"), col("norm_f"), col("c_id").as("cluster"))
    pruneWithinClusters(assigned, threshold, dims)
  }

  /** Brute-force top-k cosine pairs as a hand-written kernel: vectors
    * broadcast once, each task loops its slice of i against all j>i with
    * primitive arrays, keeping a k-bounded local top plus the pair count
    * — the per-partition-imperative escape hatch (SURVEY §4 ladder tier
    * (d)) justified here because the all-pairs baseline is a dense
    * compute kernel, not a dataflow. 2M pairs drop from ~17s (row-at-a-
    * time join) to ~1s.
    *
    * The arithmetic is bit-identical to [[cosinePairs]]+top-k: each
    * element contributes floor(toDouble(aᵢ)·toDouble(bᵢ)·1e15) summed in
    * order, cosine assembled with the same double expression, ordering
    * (cosine desc, id_a, id_b). Returns (id_a, id_b, cosine, n_pairs).
    *
    * At 100 TB you never brute-force all pairs (that's [[lshPairs]]);
    * when you do want the exact baseline on a sample, the broadcast
    * bound is the sample size (vectors must fit an executor), the
    * compute parallelizes over row-slices. The bound is enforced in
    * BYTES, not rows: one row is probed for dimensionality and the row
    * cap becomes `maxBroadcastBytes / (dims × 4)` (capped at
    * `maxVectors`), so a 2048-d input is rejected long before the ~8 GB
    * collect a row-count-only guard would have admitted. The row probe
    * is a limit(cap+1).count() — it stops scanning after cap+1 rows,
    * never a full count.
    */
  /** E22 — relational MaxSim (ColBERT late interaction, Khattab &
    * Zaharia 2020): multi-vector docs derive by `id mod docMod`, query
    * docs are `d < numQueryDocs`, and score(q, d) = Σ_{qv∈q}
    * max_{dv∈d} dotFixed(qv, dv) — exact fixed-point BIGINT end to end.
    *
    * Scale shape: the bounded query token-vectors BROADCAST into one
    * scan of corpus token rows (never a corpus self-join); the
    * per-(q-token, doc) max and per-(q, doc) sum are both
    * map-side-combinable keyed aggs; the top-k window runs on
    * |queries|×|docs| score rows. `docMod` is the deployment knob: docs
    * per corpus grow with the corpus (constant tokens/doc), so a scale
    * sweep raises docMod ∝ n — running the gate's fixed modulus at
    * 100× would grow VECTORS PER DOC 100×, a mis-shaped corpus, not
    * the operator (the e05/e06 knob rationale).
    */
  def maxSimTopK(vectors: DataFrame, idCol: String, embCol: String,
                 docMod: Long, numQueryDocs: Long, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = vectors.select(col(idCol).as("vid"),
      pmod(col(idCol), lit(docMod)).as("d"), col(embCol).as("emb"))
    val q = v.filter(col("d") < numQueryDocs)
      .select(col("vid").as("qv"), col("d").as("qd"), col("emb").as("q_emb"))
    val w = Window.partitionBy("qd").orderBy(desc("score"), asc("cd"))
    v.crossJoin(broadcast(q))
      .filter(col("d") =!= col("qd"))
      .select(col("qd"), col("qv"), col("d").as("cd"),
        dotFixed(col("q_emb"), col("emb")).as("dp"))
      .groupBy("qd", "qv", "cd").agg(max("dp").as("m"))
      .groupBy("qd", "cd").agg(sum("m").as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qd", "rank", "cd", "score")
  }

  /** [[maxSimTopK]] gated by a CANDIDATE SHORTLIST — the production
    * late-interaction split (the ColBERT serving shape): stage 1 (an ANN
    * index, e.g. [[ivfPqStoredTopK]] over the store) proposes (query-doc,
    * candidate-doc) pairs; stage 2 re-ranks ONLY those pairs with the
    * exact MaxSim sum. A document none of whose token vectors fell in a
    * probed cluster NEVER scores — that gating is the point (and what
    * the e24 gate + PropertySpec pin): corpus-wide MaxSim is a full
    * scan per query batch, the composed form touches candidate docs
    * only.
    *
    * Scale shape: `candidates` is |queries|×shortlist-sized — broadcast
    * twice into ONE scan of corpus token rows (semi-join on the doc key,
    * then the query tokens); both aggs stay map-side-combinable;
    * fixed-point BIGINT scores end to end (no float-order leak).
    */
  def maxSimTopKShortlist(vectors: DataFrame, idCol: String, embCol: String,
                          docMod: Long, numQueryDocs: Long,
                          candidates: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = vectors.select(col(idCol).as("vid"),
      pmod(col(idCol), lit(docMod)).as("d"), col(embCol).as("emb"))
    val q = v.filter(col("d") < numQueryDocs)
      .select(col("vid").as("qv"), col("d").as("qd"), col("emb").as("q_emb"))
    val cand = candidates.select(col("qd").as("c_qd"), col("cd"))
    val w = Window.partitionBy("qd").orderBy(desc("score"), asc("cd"))
    v.join(broadcast(cand), col("d") === col("cd"))
      .join(broadcast(q), col("c_qd") === col("qd"))
      .select(col("qd"), col("qv"), col("cd"),
        dotFixed(col("q_emb"), col("emb")).as("dp"))
      .groupBy("qd", "qv", "cd").agg(max("dp").as("m"))
      .groupBy("qd", "cd").agg(sum("m").as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qd", "rank", "cd", "score")
  }

  /** The e26 recall-evaluation shape: corpus-wide MaxSim truth AND the
    * candidate-restricted ranking, derived from ONE shared
    * per-(query-token, doc) max frame — the candidate scores are a
    * strict subset of the truth leg's maxima, so re-scanning the corpus
    * for the shortlist (a second [[maxSimTopKShortlist]] pass) computes
    * nothing the truth pass didn't already hold. Returns
    * (truth, shortlisted), each bit-identical to [[maxSimTopK]] /
    * [[maxSimTopKShortlist]] run independently. Production serving runs
    * [[maxSimTopKShortlist]] alone (e24); this shape exists only where
    * BOTH rankings are wanted (recall evaluation).
    */
  def maxSimTopKWithShortlist(vectors: DataFrame, idCol: String, embCol: String,
                              docMod: Long, numQueryDocs: Long,
                              candidates: DataFrame, k: Int): (DataFrame, DataFrame) = {
    val p = maxSimMaxFrame(vectors, idCol, embCol, docMod, numQueryDocs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (maxSimTopFromMax(p, k),
      maxSimTopFromMax(
        p.join(broadcast(candidates.select(col("qd"), col("cd"))), Seq("qd", "cd")), k))
  }

  /** The per-(query-token, doc) max frame (qd, qv, cd, m) both e26
    * rankings derive from — exposed so the caller can persist and
    * MATERIALIZE it concurrently with independent eager work (the store
    * build of the shortlist leg, guide §2.6): the frame reads only the
    * corpus, never the store.
    */
  def maxSimMaxFrame(vectors: DataFrame, idCol: String, embCol: String,
                     docMod: Long, numQueryDocs: Long): DataFrame = {
    val v = vectors.select(col(idCol).as("vid"),
      pmod(col(idCol), lit(docMod)).as("d"), col(embCol).as("emb"))
    val q = v.filter(col("d") < numQueryDocs)
      .select(col("vid").as("qv"), col("d").as("qd"), col("emb").as("q_emb"))
    v.crossJoin(broadcast(q))
      .filter(col("d") =!= col("qd"))
      .select(col("qd"), col("qv"), col("d").as("cd"),
        dotFixed(col("q_emb"), col("emb")).as("dp"))
      .groupBy("qd", "qv", "cd").agg(max("dp").as("m"))
  }

  /** Per-query top-k ranking over a [[maxSimMaxFrame]] (or a
    * candidate-restricted subset of one) — [[maxSimTopK]]'s scoring and
    * tie-break, bit for bit.
    */
  def maxSimTopFromMax(frame: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("qd").orderBy(desc("score"), asc("cd"))
    frame
      .groupBy("qd", "cd").agg(sum("m").as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qd", "rank", "cd", "score")
  }

  def cosinePairsTopK(vectors: DataFrame, idCol: String, embCol: String, k: Int,
                      maxVectors: Int = 1000000,
                      maxBroadcastBytes: Long = 128L << 20): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val dims = vectors.select(col(embCol)).as[Array[Float]].head(1) match {
      case Array(v) if v != null => v.length
      case _                     => 0 // empty input: nothing to bound
    }
    val byteCap =
      if (dims == 0) maxVectors.toLong
      else maxBroadcastBytes / (dims.toLong * 4)
    val rowCap = math.min(maxVectors.toLong, math.max(byteCap, 1L))
    val probe = vectors.select(col(idCol)).limit((rowCap + 1).toInt).count()
    require(probe <= rowCap,
      s"cosinePairsTopK is a driver-side all-pairs kernel bounded to " +
        s"$maxBroadcastBytes broadcast bytes = $rowCap vectors at $dims dims " +
        s"(row cap $maxVectors); input exceeds it — sample the input or use " +
        s"Similarity.lshPairs (bucketed, distributed) for near-dup pairs at scale")
    val vecs = vectors.select(col(idCol).cast("long"), col(embCol))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(vecs)
    val n = vecs.length
    implicit val ord: Ordering[(Double, Long, Long)] =
      new Ordering[(Double, Long, Long)] {
        def compare(x: (Double, Long, Long), y: (Double, Long, Long)): Int = {
          val c = java.lang.Double.compare(y._1, x._1) // cosine desc
          if (c != 0) c
          else {
            val a = java.lang.Long.compare(x._2, y._2)
            if (a != 0) a else java.lang.Long.compare(x._3, y._3)
          }
        }
      }
    val slices = spark.sparkContext.parallelize(0 until n, math.max(1, math.min(256, n / 4)))
    val (tops, totalPairs) = slices.mapPartitions { it =>
      val vs = bc.value
      def dotF(a: Array[Float], b: Array[Float]): Long = {
        var acc = 0L; var i = 0
        while (i < a.length) {
          acc += math.floor(a(i).toDouble * b(i).toDouble * DotScale).toLong
          i += 1
        }
        acc
      }
      val norms = vs.map(v => dotF(v._2, v._2))
      var buf = Vector.empty[(Double, Long, Long)]
      var cnt = 0L
      it.foreach { i =>
        val (ida, ea) = vs(i)
        var j = i + 1
        while (j < vs.length) {
          val (idb, eb) = vs(j)
          val cos = (dotF(ea, eb).toDouble / DotScale) /
            (math.sqrt(norms(i).toDouble / DotScale) * math.sqrt(norms(j).toDouble / DotScale))
          buf = buf :+ ((cos, ida, idb))
          cnt += 1
          if (buf.length > 4 * k) buf = buf.sorted.take(k)
          j += 1
        }
      }
      Iterator((buf.sorted.take(k), cnt))
    }.collect().foldLeft((Vector.empty[(Double, Long, Long)], 0L)) {
      case ((accTop, accCnt), (top, cnt)) => (accTop ++ top, accCnt + cnt)
    }
    tops.sorted.take(k)
      .map { case (cos, a, b) => (a, b, cos, totalPairs) }
      .toDF("id_a", "id_b", "cosine", "n_pairs")
  }

  /** Brute-force near-dup pairs: all i<j cosines (the LSH/IVF paths above
    * are the sub-quadratic alternative at scale).
    */
  def cosinePairs(vectors: DataFrame, idCol: String, embCol: String,
                  dims: Int = -1): DataFrame = {
    val v = withNormFixed(vectors, idCol, embCol, dims)
    v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosineFromFixed(dotF(col("a.emb"), col("b.emb"), dims),
          col("a.norm_f"), col("b.norm_f")).as("cosine"))
  }
}
