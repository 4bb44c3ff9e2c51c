package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** File-level ZONE MAPS: the data-skipping layer between directory
  * partitioning (io07 — coarse, low-cardinality keys) and parquet
  * row-group stats (implicit, opaque to the planner's file listing).
  * A clustered write gives every file a tight key range; a sidecar
  * manifest records (file, min, max, rows); a range read consults the
  * manifest and OPENS only intersecting files — O(selected bytes) I/O
  * for range predicates on a high-cardinality key (timestamps,
  * numeric ids) that directory partitioning cannot practically hold.
  * This is the file-stats pruning every lake table format ships
  * (min/max columns in the Delta/Iceberg manifests), built here on
  * plain parquet + the io08 manifest convention; [[ZOrder.clusterByZ]]
  * is the 2-D layout producer for the same consumer.
  *
  * Scale shape: the manifest is |files| rows — KB-scale per million
  * files — and the pruning decision is a driver-side filter on it (the
  * same broadcast-class resolution t21b/e19 use for their stores); the
  * data read never lists, let alone opens, non-intersecting files.
  */
object ZoneMap {

  def zonesPath(lake: String): String = lake.stripSuffix("/") + "_zones"

  /** Write `df` range-clustered on `key` into ~`numFiles` files (each
    * covering a disjoint key band, rows sorted within) plus the zone
    * manifest. The stats pass reads back only (key, file_path) — column
    * pruning keeps it a narrow scan.
    */
  def writeClustered(df: DataFrame, lake: String, key: String,
                     numFiles: Int): Unit = {
    df.repartitionByRange(numFiles, col(key))
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(lake)
    df.sparkSession.read.parquet(lake)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(min(col(key)).as("min_k"), max(col(key)).as("max_k"),
        count(lit(1)).as("n_rows"))
      .coalesce(1)
      .write.mode("overwrite").parquet(zonesPath(lake))
  }

  /** The files whose zone intersects [lo, hi) — the half-open range
    * convention of the suite's date predicates (Dsl.yearRange). Sorted
    * for determinism.
    */
  def filesForRange(spark: SparkSession, lake: String,
                    lo: Column, hi: Column): Seq[String] =
    spark.read.parquet(zonesPath(lake))
      .filter(col("max_k") >= lo && col("min_k") < hi)
      .select("file").collect().map(_.getString(0)).sorted.toSeq

  /** Range read through the zone manifest: open ONLY intersecting
    * files, then the exact residual filter (zones admit whole files;
    * row-level truth needs the predicate re-applied — same containment
    * contract as bloom pruning, x07). An empty intersection returns an
    * empty frame of the lake's schema without touching any data file.
    *
    * Driver-state bound (the cosinePairsTopK discipline): the collected
    * file list is O(selected files); when a wide predicate selects more
    * than `maxListedFiles`, enumerating paths buys nothing over the
    * ordinary directory scan — the read falls back to the ROOT path
    * with the same residual filter (identical rows, zero driver list),
    * so a near-full-range query on a million-file lake never
    * materializes a million path strings on the driver.
    */
  def readRange(spark: SparkSession, lake: String, key: String,
                lo: Column, hi: Column,
                maxListedFiles: Int = 100000): DataFrame = {
    val selected = spark.read.parquet(zonesPath(lake))
      .filter(col("max_k") >= lo && col("min_k") < hi)
    val n = selected.limit(maxListedFiles + 1).count()
    val base =
      if (n == 0)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
          spark.read.parquet(lake).schema)
      else if (n > maxListedFiles) spark.read.parquet(lake)
      else {
        val files = selected.select("file").collect()
          .map(_.getString(0)).sorted.toSeq
        spark.read.parquet(files: _*)
      }
    base.filter(col(key) >= lo && col(key) < hi)
  }
}
