package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's Preprocessor stage (its "one real query",
  * Preprocessor.py:94-132 / SURVEY.md §3 entry-point 2) as a single lazy
  * Spark plan: derive → dedup → filters → per-year sample flag.
  *
  * Differences from the reference, by design (SURVEY §7 hard parts):
  *  - dedup keeps the first row by an explicit stable order instead of
  *    pandas file order (deterministic under parallelism);
  *  - the per-year sample uses a portable md5 pseudo-random ranking
  *    instead of unseeded NumPy choice (reproducible; statistically
  *    equivalent);
  *  - the whole stage is one Catalyst plan — filters fuse into one
  *    codegen stage and push into the scan, nothing materializes between
  *    steps (the reference writes CSV after each stage).
  */
object Preprocess {

  final case class Config(
      datasetName: String = "",
      removeDuplicates: Boolean = true,
      imagesOnly: Boolean = true,
      yearFilter: Option[(Int, Int)] = None,
      lowercaseHashtags: Boolean = true,
      hashtagInclude: Seq[String] = Nil,
      hashtagExclude: Seq[String] = Nil,
      maxImagesPerYear: Int = -1)

  /** P1/P2/P3/P4/P5/P6 — derived columns + canonical 21-col projection
    * (ref: Preprocessor.py:110,134-159).
    */
  def columnStuff(df: DataFrame, datasetName: String): DataFrame = {
    val parts = datasetName.split("_", 2)
    val (city, building) =
      if (parts.length == 2) (lit(parts(0)), lit(parts(1)))
      else (lit(null).cast("string"), lit(null).cast("string"))
    df
      .withColumn("scrape_image", lit(true))
      .withColumn("image", concat(col("id").cast("string"), lit("_"), col("shortcode"), lit(".jpg")))
      .withColumn("city", city)
      .withColumn("building", building)
      .withColumn("year", year(col("timestamp")))
      .withColumn("month", month(col("timestamp")))
      .withColumn("day", dayofmonth(col("timestamp")))
      .withColumn("interactions", col("likes") + col("comment_count"))
      .select(graft.schema.Schemas.postsPreprocessedColumns.map(col): _*)
  }

  /** D1 — dedup by shortcode keeping first by stable order
    * (ref: Preprocessor.py:161-167).
    */
  def removeDuplicates(df: DataFrame): DataFrame =
    Dedup.dedupFirst(df, Seq("shortcode"), Seq(col("timestamp"), col("id")))

  /** P9 — images only: is_video == false (ref: Preprocessor.py:169-170). */
  def imagesOnly(df: DataFrame): DataFrame =
    df.filter(col("is_video") === false)

  /** P10 — half-open year range [min, max) (ref: Preprocessor.py:172-180).
    * Expressed as range comparisons on the timestamp itself (not
    * `year(timestamp)`) so the predicate pushes into the file scan.
    */
  def filterByYear(df: DataFrame, minYear: Int, maxYear: Int): DataFrame =
    df.filter(graft.queries.Dsl.yearRange(col("timestamp"), minYear, maxYear))

  /** P19 — lowercase hashtags (ref: Preprocessor.py:219-221). */
  def lowercaseHashtags(df: DataFrame): DataFrame =
    df.withColumn("hashtags", transform(col("hashtags"), h => lower(h)))

  /** P11 — keep rows sharing ≥1 hashtag with the include set
    * (ref: Preprocessor.py:182-188).
    */
  def filterByHashtagIncludes(df: DataFrame, tags: Seq[String]): DataFrame =
    df.filter(arrays_overlap(col("hashtags"), array(tags.map(lit): _*)))

  /** P12 — drop rows sharing any hashtag with the exclude set
    * (ref: Preprocessor.py:190-196).
    */
  def filterByHashtagExcludes(df: DataFrame, tags: Seq[String]): DataFrame =
    df.filter(!arrays_overlap(col("hashtags"), array(tags.map(lit): _*)))

  /** D3 — per-year capped sample: flags (never drops) up to n rows per
    * year, chosen by a deterministic md5 pseudo-random rank
    * (ref: Preprocessor.py:198-217 select_n_images_per_year).
    */
  def selectNImagesPerYear(df: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy(year(col("timestamp")))
      .orderBy(md5(col("id").cast("string")), col("id"))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("scrape_image", col("scrape_image") && col("__rn") <= n)
      .drop("__rn")
  }

  /** The full stage (ref: Preprocessor.py:94-132): every step conditional
    * on config, matching the reference's apply_filter chain. Audit counts
    * (Preprocessor.py:13-21) are cheapest via `df.observe` at the caller.
    */
  def run(input: DataFrame, cfg: Config): DataFrame = {
    var df = columnStuff(input, cfg.datasetName)
    if (cfg.removeDuplicates) df = removeDuplicates(df)
    if (cfg.imagesOnly) df = imagesOnly(df)
    cfg.yearFilter.foreach { case (lo, hi) => df = filterByYear(df, lo, hi) }
    if (cfg.lowercaseHashtags) df = lowercaseHashtags(df)
    if (cfg.hashtagInclude.nonEmpty) df = filterByHashtagIncludes(df, cfg.hashtagInclude)
    if (cfg.hashtagExclude.nonEmpty) df = filterByHashtagExcludes(df, cfg.hashtagExclude)
    if (cfg.maxImagesPerYear != -1) df = selectNImagesPerYear(df, cfg.maxImagesPerYear)
    df
  }
}
