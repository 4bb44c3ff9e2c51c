package graft

import graft.operators.Preprocess
import graft.schema.Schemas
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Preprocessor-stage semantics vs the reference
  * (Preprocessor.py:94-132; config keys from config/test.json:24-36).
  */
class PreprocessSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // (id, shortcode, is_video, timestamp, likes, comment_count, hashtags)
  private def fixture: DataFrame = Seq(
    (1L, "aaa", false, ts("2015-03-01 10:00:00"), 10L, 2L, Seq("#Golf", "#Sun")),
    (2L, "aaa", false, ts("2016-03-01 10:00:00"), 20L, 3L, Seq("#golf")),      // dup shortcode, later ts
    (3L, "bbb", true, ts("2016-05-01 10:00:00"), 30L, 4L, Seq("#rain")),       // video
    (4L, "ccc", false, ts("2009-01-01 10:00:00"), 40L, 5L, Seq("#golf")),      // before range
    (5L, "ddd", false, ts("2017-07-01 10:00:00"), 50L, 6L, Seq("#excluded")),
    (6L, "eee", false, ts("2017-08-01 10:00:00"), 60L, 7L, Seq[String]()))
    .toDF("id", "shortcode", "is_video", "timestamp", "likes", "comment_count", "hashtags")
    .withColumn("post_url", concat(lit("u/"), col("shortcode")))
    .withColumn("type", lit("GraphImage"))
    .withColumn("comments_disabled", lit(false))
    .withColumn("search_mode", lit("hashtag"))
    .withColumn("search_term", lit("golf"))
    .withColumn("caption", lit("c"))
    .withColumn("display_url", lit("d"))
    .withColumn("owner_id", lit(9L))
    .withColumn("mentions", array().cast("array<string>"))
    .withColumn("thumbnail_src", lit("t"))

  test("columnStuff derives image/city/building/date-parts/interactions in canonical order") {
    val out = Preprocess.columnStuff(fixture, "Lens_Louvre")
    assert(out.columns.toSeq == Schemas.postsPreprocessedColumns)
    val r = out.filter($"id" === 1L).head()
    assert(r.getAs[String]("image") == "1_aaa.jpg")
    assert(r.getAs[String]("city") == "Lens")
    assert(r.getAs[String]("building") == "Louvre")
    assert(r.getAs[Int]("year") == 2015 && r.getAs[Int]("month") == 3 && r.getAs[Int]("day") == 1)
    assert(r.getAs[Long]("interactions") == 12L)
    assert(r.getAs[Boolean]("scrape_image"))
  }

  test("columnStuff without underscore dataset yields null city/building") {
    val r = Preprocess.columnStuff(fixture, "test").head()
    assert(r.getAs[String]("city") == null && r.getAs[String]("building") == null)
  }

  test("removeDuplicates keeps first occurrence by stable (timestamp, id) order") {
    val out = Preprocess.removeDuplicates(Preprocess.columnStuff(fixture, "t"))
    val kept = out.filter($"shortcode" === "aaa").select("id").as[Long].collect()
    assert(kept.toSeq == Seq(1L)) // earlier timestamp wins
    assert(out.count() == 5)
  }

  test("full run applies video/year/hashtag filters with half-open year range") {
    val cfg = Preprocess.Config(
      datasetName = "Glasgow_Kelvingrove",
      yearFilter = Some((2015, 2017)), // 2017 excluded (half-open)
      hashtagExclude = Seq("#excluded"))
    val out = Preprocess.run(fixture, cfg)
    // id2 deduped (later dup), id3 video, id4 before range, id5 excluded-tag —
    // id5 is also outside the year range; id6 (2017) excluded by half-open bound
    assert(out.select("id").as[Long].collect().toSeq == Seq(1L))
    // hashtags lowercased by default config
    val hr = out.head()
    assert(hr.getSeq[String](hr.fieldIndex("hashtags")) == Seq("#golf", "#sun"))
  }

  test("selectNImagesPerYear flags at most n rows per year and drops none") {
    val cfg = Preprocess.Config(yearFilter = None, maxImagesPerYear = 1,
      removeDuplicates = false, imagesOnly = false)
    val out = Preprocess.run(fixture, cfg).cache()
    assert(out.count() == 6) // flags, never drops
    val perYear = out.filter($"scrape_image")
      .groupBy($"year").count().as[(Int, Long)].collect().toMap
    assert(perYear.values.forall(_ <= 1))
    // years with any row still have exactly one selected
    assert(perYear.keySet == Set(2015, 2016, 2009, 2017))
  }
}
