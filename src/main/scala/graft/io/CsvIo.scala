package graft.io

import graft.schema.Schemas
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

/** CSV edge IO matching the reference's file contract (S1/S7): headered
  * CSV between declared stage boundaries, list columns as serialized
  * strings (read: python-repr or JSON; write: JSON arrays — the
  * documented upgrade over reprs, SURVEY §7). Intermediates should stay
  * Parquet; these readers/writers exist only at the edges.
  */
object CsvIo {

  /** Read a `posts` CSV (feed-scrape output shape, Preprocessor.py:107):
    * declared schema — no inference job — then decode list columns.
    *
    * The real feed output has multi-line quoted captions and RFC-4180
    * doubled quotes (pandas' to_csv defaults), so multiLine + quote-escape
    * are required for parity. multiLine makes a CSV file non-splittable;
    * acceptable because CSV exists only at declared edges — intermediates
    * are Parquet.
    */
  def readPosts(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .schema(Schemas.postsCsv)
      .csv(path)
      .withColumn("hashtags", Schemas.ReprList.decode(col("hashtags")))
      .withColumn("mentions", Schemas.ReprList.decode(col("mentions")))

  /** Read a `posts_preprocessed` CSV (Preprocessor stage output shape). */
  def readPreprocessed(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .schema(Schemas.postsPreprocessedCsv)
      .csv(path)
      .withColumn("hashtags", Schemas.ReprList.decode(col("hashtags")))
      .withColumn("mentions", Schemas.ReprList.decode(col("mentions")))

  /** Write a headered CSV, JSON-encoding any array columns. `singleFile`
    * mirrors the reference's one-file-per-stage contract (driver-side
    * coalesce — fine for edge outputs, never for intermediates).
    */
  def writeCsv(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val encoded = df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case _: ArrayType => acc.withColumn(f.name, Schemas.ReprList.encode(col(f.name)))
        case _ => acc
      }
    }
    val out = if (singleFile) encoded.coalesce(1) else encoded
    out.write.mode("overwrite")
      .option("header", "true")
      // RFC-4180 quote doubling (pandas to_csv convention) — must mirror
      // the readers' escape setting or embedded quotes break the round-trip
      .option("escape", "\"")
      // the SINK owns its timestamp formats, for BOTH flavors: an NTZ
      // column otherwise falls back to the default timestampNTZFormat and
      // silently truncates to millis (the io01/io02 lesson). Space-
      // separated 6-digit form is pandas' to_csv shape and parses back
      // exactly through the readers' lenient default parser.
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(path)
  }
}
