package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S4 — time-chunked ingestion planning (ref: CTConfig.py:5-32,
  * CTScraper.py:98-164): a [start, end] scrape range split into
  * `chunkDays` tumbling windows, each window one resumable unit (the
  * CrowdTangle ≤10k-results-per-query cap made this mandatory).
  *
  * As a Spark source plan: one partition per chunk — the driver-side
  * fetcher iterates chunks into a landing dir, or a DataSource V2
  * MicroBatchStream treats chunk_id as its offset. Resume-at-chunk-N
  * (the reference's `current_chunk` checkpoint) is a filter on chunk_id.
  */
object ScrapeChunks {

  def dateChunks(spark: SparkSession, start: String, end: String,
                 chunkDays: Int): DataFrame =
    spark.range(1)
      .select(explode(sequence(
        to_date(lit(start)), to_date(lit(end)),
        expr(s"INTERVAL $chunkDays DAY"))).as("chunk_start"))
      .withColumn("chunk_end",
        least(date_add(col("chunk_start"), chunkDays), to_date(lit(end))))
      .filter(col("chunk_start") < col("chunk_end"))
      .withColumn("chunk_id",
        (datediff(col("chunk_start"), to_date(lit(start))) / chunkDays).cast("int"))
      .select("chunk_id", "chunk_start", "chunk_end")

  /** Chunks still to scrape, resuming after `currentChunk` (ref:
    * CTScraper.py:156-159 persisted chunk cursor).
    */
  def remaining(chunks: DataFrame, currentChunk: Int): DataFrame =
    chunks.filter(col("chunk_id") >= currentChunk)
}
