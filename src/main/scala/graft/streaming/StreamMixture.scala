package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** STREAMING MIXTURE MONITOR — the t15/t33 mixture discipline under
  * streaming: every micro-batch lands its per-key counts as its own
  * `batch=<id>` slice, and the drift report (per-batch total-variation
  * distance against the pooled mixture, in exact integer ppm) runs on
  * the store at any time WITHOUT re-scanning history — counts are
  * additive partials (the a19/sm09 mergeable-partials story). This is
  * how a production ingest watches for a source going rogue (a crawler
  * stuck on one domain, a feed flipping language) while the data is
  * still arriving: TV distance is the metric the sampling-theory
  * guarantees are stated in, so "batch TV > budget" is an actionable
  * page, and the integer-ppm form makes the alarm bit deterministic.
  *
  * Retry safety: identical to [[StreamSketch.mergeBatch]] — a batch's
  * counts land as a dynamic-partition overwrite of exactly `batch=<id>`
  * (per-writer option, race-free), so a foreachBatch redelivery
  * replaces its own slice instead of double-counting. Retention here is
  * simply dropping batch slices older than the monitoring window
  * ([[dropBefore]]) — per-batch rows ARE the report grain, so nothing
  * needs folding (contrast the sketch store, whose history is only ever
  * read merged).
  */
object StreamMixture {

  /** The foreachBatch body: this batch's per-key counts overwrite their
    * own `batch=<id>` partition of the count store.
    */
  def mergeBatch(batch: DataFrame, batchId: Long, keyCol: String,
                 store: String): Unit =
    batch.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("c"))
      .withColumn("batch", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch").parquet(store)

  /** Retention (VERDICT r12 #4): drop every batch slice with
    * `batch < minKeepBatchId` — the monitoring window's trailing edge.
    * Partition-dir deletes through the Hadoop FS API (HDFS/S3-safe),
    * idempotent, and [[tvReport]] over the survivors is exactly the
    * report a store that only ever held them would produce (the pooled
    * mixture is a function of live slices). The frontier must be ≤ the
    * stream's redelivery frontier: a redelivered batch BEHIND it would
    * innocently recreate its dropped slice (foreachBatch only ever
    * redelivers the frontier batch, so any minKeepBatchId ≤ frontier
    * is safe). Without this the count store grows one directory per
    * micro-batch forever — the unbounded-partition growth sm09's
    * compaction just closed, one store over.
    */
  def dropBefore(spark: org.apache.spark.sql.SparkSession, store: String,
                 minKeepBatchId: Long): Unit = {
    val root = new org.apache.hadoop.fs.Path(store)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return
    fs.listStatus(root).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("batch="))
      .filter(_.getName.stripPrefix("batch=").toLong < minKeepBatchId)
      .foreach(p => fs.delete(p, true))
  }

  /** Per-batch mixture drift vs the pooled mixture over the whole
    * store: tv_ppm = Σ_k |share_batch(k) − share_pool(k)| / 2 with
    * every share an exact integer ppm (floor division — the m02/t37
    * convention, no float anywhere). A key absent from a batch
    * contributes its full pooled share, which is why the report runs
    * on the (batches × pooled keys) grid, not a naive join.
    */
  def tvReport(spark: org.apache.spark.sql.SparkSession, store: String): DataFrame = {
    val bc = spark.read.parquet(store).groupBy("batch", "k")
      .agg(sum("c").as("c"))
    val bt = bc.groupBy("batch").agg(sum("c").as("bt"))
    val pc = bc.groupBy("k").agg(sum("c").as("pc"))
    val pt = pc.agg(sum("pc").as("pt"))
    bt.crossJoin(broadcast(pc)).crossJoin(broadcast(pt))
      .join(bc, Seq("batch", "k"), "left")
      .select(col("batch"), col("bt"),
        expr("coalesce(c, 0) * 1000000 div bt").as("sb"),
        expr("pc * 1000000 div pt").as("sp"))
      .groupBy("batch")
      .agg(max(col("bt")).as("n_events"),
        expr("sum(abs(sb - sp)) div 2").as("tv_ppm"))
      .orderBy("batch")
  }
}
