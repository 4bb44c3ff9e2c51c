package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins (builder-prompt scale lever: "bucketing for
  * co-located joins"). Writing both sides bucketed+sorted by the join key
  * lets Spark plan a sort-merge join with NO exchange — at 100 TB the
  * difference between re-shuffling a fact table per join and reading it
  * pre-partitioned.
  *
  * Use for the stable fact tables of this engine (posts by id/shortcode,
  * lineitem/orders by orderkey, documents by doc_id): pay the bucketed
  * write once at ingestion, every subsequent keyed join/aggregate reuses
  * the layout.
  */
object Bucketing {

  /** Persist `df` as a bucketed, per-bucket-sorted table. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, key: String): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Join two tables bucketed on `key`: with matching bucket counts the
    * plan contains no shuffle exchange on either side.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
