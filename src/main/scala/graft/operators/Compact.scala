package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file COMPACTION (lake maintenance): rewrite a parquet directory
  * of many small files into size-targeted files — the nightly OPTIMIZE
  * every streaming/incremental sink needs, because a thousand 100 KB
  * files cost a thousand footer reads and task launches per query
  * (the reference's per-chunk CSV landing, `DataStorage.py` chunked
  * writes, has exactly this shape at scale).
  *
  * The file count is derived from the MEASURED byte size of the input
  * (directory listing, no data read), not a guessed row count — the
  * parquet-encoded size already reflects compression and encoding.
  * Output file sizes track the target only approximately (row-group
  * granularity, per-partition skew); the contract is "≈ ⌈bytes/target⌉
  * files, all rows preserved bit-for-bit", which CompactionSpec pins.
  *
  * At 100 TB this runs per-partition of a date-partitioned lake (each
  * partition compacts independently — embarrassingly parallel across
  * partitions) and uses `repartition` (round-robin) so output files are
  * even-sized regardless of input file skew; `coalesce` would glue
  * adjacent small files into uneven outputs and, worse, cap upstream
  * read parallelism.
  */
object Compact {

  /** Parquet-file bytes under `dir` (recursive, footer-free listing). */
  def parquetBytes(spark: SparkSession, dir: String): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) total += f.getLen
    }
    total
  }

  /** Rewrite `inDir` (parquet) into `outDir` with ≈targetBytes files.
    * Returns the planned file count.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 128L * 1024 * 1024): Int = {
    val bytes = parquetBytes(spark, inDir)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outDir)
    nFiles
  }

  /** Count of data files the directory holds (what compaction reduces). */
  def parquetFileCount(spark: SparkSession, dir: String): Int = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    var n = 0
    while (it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    }
    n
  }
}
