package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTAL CONNECTED COMPONENTS — the dup-GROUP store maintained
  * across edge batches, completing the incremental dedup lifecycle:
  * x04 admits exact keys, x08/x18/sm08 admit near-dup pairs, and this
  * keeps the resulting CLUSTER LABELS current as candidate edges keep
  * arriving — without ever re-running g02's full component computation
  * over the corpus (at 100 TB the edge history is unbounded; only the
  * batch and the components it actually touches may cost anything).
  *
  * Semantics: labels are the MIN NODE ID of the component (g02's
  * canonical label), and admission preserves that invariant: merging
  * components relabels every loser to the minimum label among the
  * merged set, so after ANY batch order the store equals the batch
  * computation over the union of all admitted edges (the x08
  * "incremental ≡ rebuilt" invariant, gated by g15 and spec-pinned on
  * random batch splits).
  *
  * Store layout (the x04/x17 layered-version pattern):
  * `store/labels/bucket=<pmod(node,16)>/` holds APPEND-ONLY rows
  * (node, label, ver) — a batch appends one row per NEW node and per
  * RELABELED node, never rewrites; readers resolve max-version per
  * node (one map-side-combinable max(struct(ver, label)) agg). The
  * bucket layout is the x18 zero-exchange discipline for the lookup
  * join; at cluster scale the store is additionally bucketBy(node) so
  * batch lookups shuffle only the batch side.
  *
  * Per-batch work: ONE resolved-store scan (columnar, 3 narrow
  * columns) joined against the broadcast batch node set, a driver-side
  * union-find over the batch's LABEL-GRAPH (≤ 2|batch| labels — never
  * corpus nodes), and appends ∝ |batch ∪ relabeled members|. Batches
  * are idempotent under redelivery via the `_admitted/batch=<id>`
  * ledger ([[Similarity.admitIvfPqBatch]]'s discipline).
  *
  * Retention: appends grow one row per label change forever;
  * [[compact]] folds everything into a `ver=-1` base (resolution is
  * unchanged — max-version is a fold the base participates in) behind
  * the StreamSketch pending-dir + marker protocol, so every crash
  * state either leaves the live store intact or completes the install
  * idempotently ([[recoverCompaction]] runs from both entry points).
  */
object IncrementalComponents {

  private val PendingDir = "_compact_pending"
  private val MarkerFile = "_compact_done"

  private def fsOf(spark: SparkSession, store: String) = {
    val p = new org.apache.hadoop.fs.Path(store)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Current (node, label) view: max-version resolution over the
    * layered appends. Repairs any half-finished compaction first.
    */
  def resolved(spark: SparkSession, store: String): DataFrame = {
    recoverCompaction(spark, store)
    val labels = s"$store/labels"
    val (fs, _) = fsOf(spark, store)
    if (!fs.exists(new org.apache.hadoop.fs.Path(labels)))
      return spark.range(0).select(col("id").as("node"), col("id").as("label"))
    spark.read.parquet(labels)
      .groupBy("node")
      .agg(max(struct(col("ver"), col("label"))).as("b"))
      .select(col("node"), col("b.label").as("label"))
  }

  /** Admit one batch of undirected edges (columns (a, b), any names —
    * positional). Appends (node, label, ver=batchId) rows for new and
    * relabeled nodes; exactly-once per batchId via the ledger marker.
    * Batch ids must be MONOTONICALLY INCREASING (the streaming
    * contract — foreachBatch ids are): version resolution picks the
    * max ver per node, so an out-of-order smaller id could not win
    * over the rows it is meant to supersede.
    */
  def admitEdges(spark: SparkSession, store: String, edges: DataFrame,
                 batchId: Long, maxBatchEdges: Int = 2000000): Unit = {
    val marker = new org.apache.hadoop.fs.Path(s"$store/_admitted/batch=$batchId")
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(marker)) return
    val Seq(ca, cb) = edges.columns.toSeq.take(2).map(col)
    // the batch is driver-bounded BY CONTRACT (micro-batches) — the
    // union-find below holds its labels; fail loudly past the budget
    val e = edges.select(ca.cast("long").as("a"), cb.cast("long").as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .limit(maxBatchEdges + 1).collect()
    require(e.length <= maxBatchEdges,
      s"admitEdges: batch exceeds $maxBatchEdges edges — split the batch " +
        "(micro-batch contract) or raise maxBatchEdges")
    val nodesB = e.flatMap(r => Seq(r.getLong(0), r.getLong(1))).distinct
    val nodesDf = spark.createDataFrame(
      java.util.Arrays.asList(nodesB.map(org.apache.spark.sql.Row(_)): _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node",
          org.apache.spark.sql.types.LongType))))
    // ONE resolved view per admission, shared by the label lookup and
    // the relabel scan (resolution is an O(store) aggregate — running
    // it twice per batch would double the dominant cost)
    val res = resolved(spark, store)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // current labels of the batch's nodes: the broadcast batch side
    // left-joins the resolved store; a null label marks a NEW node
    // (label defaults to the node id) — tracked so only genuinely new
    // or relabeled nodes append rows
    val cur = nodesDf.join(res, Seq("node"), "left")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) (r.getLong(0), false) else (r.getLong(1), true)))
      .toMap
    // union-find over the LABEL graph (min-label union keeps g02's
    // canonical-label invariant). ITERATIVE find — a recursive walk
    // stack-overflows on chain-shaped batches (a path graph unioned in
    // descending order builds an O(chain) parent chain, and near-dup
    // edge streams are naturally chain-heavy) — with two-pass path
    // compression so later finds are O(α).
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    def union(x: Long, y: Long): Unit = {
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) { val lo = math.min(rx, ry); val hi = math.max(rx, ry)
        parent(hi) = lo }
    }
    e.foreach(r => union(cur(r.getLong(0))._1, cur(r.getLong(1))._1))
    val changedLabels = parent.keys.filter(l => find(l) != l).toSeq
    // rows to append: batch nodes that are NEW or whose label moved...
    val batchRows = nodesB.toSeq.flatMap { n =>
      val (label, known) = cur(n)
      val newLabel = find(label)
      if (!known || newLabel != label) Some((n, newLabel)) else None
    }
    import spark.implicits._
    // ...plus every MEMBER of a losing label. This stays DISTRIBUTED
    // end to end: the (old → new) label map is batch-bounded and
    // broadcasts into the resolved scan (never an isin literal list of
    // up to 2|batch| expressions, never a driver collect of the
    // affected members — merging two large clusters relabels
    // O(smaller cluster) rows, which only the executors should hold)
    val members =
      if (changedLabels.isEmpty)
        spark.range(0).select(col("id").as("node"), col("id").as("label"))
      else {
        val changedDf = changedLabels.map(l => (l, find(l)))
          .toDF("old_label", "new_label")
        res.join(broadcast(changedDf), col("label") === col("old_label"))
          .select(col("node"), col("new_label").as("label"))
      }
    val out = batchRows.toDF("node", "label").unionByName(members).distinct()
    // an all-empty batch must not create a part-file-less labels dir
    // (parquet schema inference cannot read one back)
    if (!out.isEmpty)
      out.withColumn("ver", lit(batchId))
        .withColumn("bucket", pmod(col("node"), lit(16)))
        .repartition(col("bucket"))
        .write.mode("append").partitionBy("bucket")
        .parquet(s"$store/labels")
    res.unpersist()
    fs.mkdirs(marker.getParent)
    fs.create(marker, true).close()
  }

  /** Fold the layered appends into a single `ver=-1` base — resolution
    * is invariant (max-version includes the base) and the file count
    * drops to the base slice. StreamSketch's crash discipline: pending
    * is fully written BEFORE the marker commits the swap; every crash
    * state either discards garbage or completes idempotently.
    */
  def compact(spark: SparkSession, store: String): Unit = {
    recoverCompaction(spark, store)
    val (fs, storePath) = fsOf(spark, store)
    val labels = new org.apache.hadoop.fs.Path(storePath, "labels")
    if (!fs.exists(labels)) return
    val pending = new org.apache.hadoop.fs.Path(storePath, PendingDir)
    fs.delete(pending, true)
    resolved(spark, store)
      .withColumn("ver", lit(-1L))
      .withColumn("bucket", pmod(col("node"), lit(16)))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(pending.toString)
    val tmp = new org.apache.hadoop.fs.Path(storePath, MarkerFile + ".tmp")
    val out = fs.create(tmp, true)
    try out.writeBytes("1") finally out.close()
    fs.delete(new org.apache.hadoop.fs.Path(storePath, MarkerFile), false)
    fs.rename(tmp, new org.apache.hadoop.fs.Path(storePath, MarkerFile))
    install(fs, storePath)
  }

  /** Complete (or discard) a half-done compaction — idempotent. */
  def recoverCompaction(spark: SparkSession, store: String): Unit = {
    val (fs, storePath) = fsOf(spark, store)
    val marker = new org.apache.hadoop.fs.Path(storePath, MarkerFile)
    val pending = new org.apache.hadoop.fs.Path(storePath, PendingDir)
    if (fs.exists(marker)) install(fs, storePath)
    else if (fs.exists(pending)) fs.delete(pending, true)
    fs.delete(new org.apache.hadoop.fs.Path(storePath, MarkerFile + ".tmp"), false)
  }

  private def install(fs: org.apache.hadoop.fs.FileSystem,
                      storePath: org.apache.hadoop.fs.Path): Unit = {
    val pending = new org.apache.hadoop.fs.Path(storePath, PendingDir)
    val labels = new org.apache.hadoop.fs.Path(storePath, "labels")
    if (fs.exists(pending)) {
      fs.delete(labels, true)
      fs.rename(pending, labels)
    }
    fs.delete(new org.apache.hadoop.fs.Path(storePath, MarkerFile), false)
  }
}
