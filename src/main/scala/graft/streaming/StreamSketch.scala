package graft.streaming

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** STREAMING SKETCH MAINTENANCE — the `foreachBatch` composition of the
  * count-min sketch (t23's additive 4×64 integer sketch): a continuous
  * event stream folds into ONE persistent frequency sketch, micro-batch
  * by micro-batch. This is how a 100 TB pipeline actually tracks hot
  * tokens/items — no batch ever re-scans history, because CMS cells are
  * ADDITIVE: merge(sketch(A), sketch(B)) = sketch(A ∪ B) cell-by-cell
  * (the a19/a20/a36 mergeable-partials story, under streaming). The sm09
  * gate proves exactly that equality: the stream-merged store must match
  * the sketch a single batch pass builds, bit-for-bit.
  *
  * Retry safety (foreachBatch redelivers a batch after a mid-body
  * crash): a batch's cells land as a dynamic-partition overwrite of
  * exactly `batch=<id>` (io10's machinery, the StreamNearDup sink
  * discipline) — a redelivery replaces its own partition instead of
  * double-counting, so the merged sketch is exactly-once under
  * crash-shaped retries. The store stays tiny (≤ rows×buckets cells per
  * batch); readers merge with one map-side-combinable SUM.
  */
object StreamSketch {
  val Rows = 4
  val Buckets = 64

  /** The foreachBatch body: build this batch's CMS partial from
    * `batch(itemCol)` and overwrite its own `batch=<id>` partition of
    * the cell store.
    */
  def mergeBatch(batch: DataFrame, batchId: Long, itemCol: String,
                 store: String): Unit = {
    val spark = batch.sparkSession
    val cells = batch
      .groupBy(col(itemCol).as("item")).agg(count(lit(1)).as("cnt"))
      .select(col("item"), col("cnt"),
        explode(sequence(lit(0), lit(Rows - 1))).as("r"))
      .withColumn("bucket",
        pmod(TextFunctions.rollingHash(
          concat(col("item"), lit("#"), col("r").cast("string"))), lit(Buckets)))
      .groupBy("r", "bucket").agg(sum("cnt").as("bsum"))
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try cells.withColumn("batch", lit(batchId))
      .write.mode("overwrite").partitionBy("batch").parquet(store)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** The merged sketch: one SUM over the (tiny) cell store. */
  def readMerged(spark: org.apache.spark.sql.SparkSession, store: String): DataFrame =
    spark.read.parquet(store)
      .groupBy("r", "bucket").agg(sum("bsum").as("bsum"))
}
