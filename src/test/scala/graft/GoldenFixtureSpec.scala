package graft

import graft.io.CsvIo
import graft.operators.Preprocess
import graft.schema.Schemas
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.zip.ZipInputStream

/** Golden end-to-end test against the reference's OWN shipped fixture:
  * `data.zip` → `Test_test/posts.csv` (172 KB of real Instagram feed
  * output, readme.md:18-21). Every repo spec elsewhere uses synthetic
  * reference-shaped fixtures; this one proves the edge contract on the
  * real artifact — multi-line quoted captions, RFC-4180 doubled quotes,
  * python-repr list cells (Preprocessor.py:107 literal_eval round-trip)
  * — and the full Preprocessor stage with `config/test.json`'s params
  * (remove_duplicates, images_only, year_filter=[2010,2020),
  * lowercase_hashtags).
  *
  * Golden constants were computed with a pandas replica of
  * Preprocessor.py:94-132 run over the unzipped fixture.
  */
class GoldenFixtureSpec extends SparkSpec {
  import spark.implicits._

  /** Extract posts.csv from the reference's data.zip (read-only source). */
  private lazy val postsCsvPath: String = {
    val outDir = Files.createTempDirectory("graft-golden")
    val zis = new ZipInputStream(
      Files.newInputStream(Paths.get("/root/reference/data.zip")))
    try {
      var entry = zis.getNextEntry
      var found: Option[Path] = None
      while (entry != null && found.isEmpty) {
        if (entry.getName.endsWith("Test_test/posts.csv")) {
          val dst = outDir.resolve("posts.csv")
          Files.copy(zis, dst, StandardCopyOption.REPLACE_EXISTING)
          found = Some(dst)
        }
        entry = zis.getNextEntry
      }
      found.get.toString
    } finally zis.close()
  }

  private val cfg = Preprocess.Config(
    datasetName = "Test_test",
    removeDuplicates = true,
    imagesOnly = true,
    yearFilter = Some((2010, 2020)),
    lowercaseHashtags = true)

  test("golden: real feed CSV parses to 148 records with repr-lists decoded") {
    val posts = CsvIo.readPosts(spark, postsCsvPath)
    // 431 physical lines fold into 148 records — multi-line captions
    assert(posts.count() == 148)
    // repr-list round-trip on real data (single-quoted python reprs)
    val r = posts.filter($"id" === 2117660727242468851L).head()
    val tags = r.getSeq[String](r.fieldIndex("hashtags"))
    assert(tags.length == 21)
    assert(tags.head == "#rowallan")
    assert(r.getAs[String]("shortcode") == "B1jcTYqFS3z")
    // multi-line caption survived quoting
    assert(r.getAs[String]("caption").contains("\n"))
  }

  test("golden: preprocessor stage matches the pandas replica's counts and order") {
    val posts = CsvIo.readPosts(spark, postsCsvPath)
    val out = Preprocess.run(posts, cfg)

    // exact reference column order (Preprocessor.py:156-158 + leading id)
    assert(out.columns.toSeq == Schemas.postsPreprocessedColumns)

    // filter chain counts from the reference semantics:
    // 148 → dedup(shortcode) 148 → images_only 118 → year[2010,2020) 118
    val base = Preprocess.columnStuff(posts, cfg.datasetName)
    assert(Preprocess.removeDuplicates(base).count() == 148)
    assert(out.count() == 118)

    val agg = out.agg(
      sum("likes"), sum("comment_count"), sum("interactions"),
      countDistinct("owner_id"), sum(size($"hashtags")))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(agg == ((16292L, 188L, 16480L, 45L, 602L)))

    // derived columns on a real row
    val r = out.filter($"id" === 2117660727242468851L).head()
    assert(r.getAs[String]("city") == "Test" && r.getAs[String]("building") == "test")
    assert(r.getAs[String]("image") == "2117660727242468851_B1jcTYqFS3z.jpg")
    assert(r.getAs[Int]("year") == 2019 && r.getAs[Int]("month") == 8)
    assert(r.getAs[Boolean]("scrape_image"))
    // lowercased hashtags
    val tags = r.getSeq[String](r.fieldIndex("hashtags"))
    assert(tags.forall(t => t == t.toLowerCase))
  }

  test("golden: preprocessed output round-trips through the CSV edge sink") {
    val posts = CsvIo.readPosts(spark, postsCsvPath)
    val out = Preprocess.run(posts, cfg)
    val dir = Files.createTempDirectory("graft-golden-out").resolve("pp.csv").toString
    CsvIo.writeCsv(out, dir, singleFile = true)
    val back = CsvIo.readPreprocessed(spark, dir)
    assert(back.count() == 118)
    assert(back.columns.toSeq == Schemas.postsPreprocessedColumns)
    // list cells and aggregates survive the round-trip bit-for-bit
    val agg = back.agg(sum("interactions"), sum(size($"hashtags")))
      .as[(Long, Long)].head()
    assert(agg == ((16480L, 602L)))
    val r = back.filter($"id" === 2117660727242468851L).head()
    assert(r.getSeq[String](r.fieldIndex("hashtags")).length == 21)
  }

  test("CSV sink is microsecond-lossless for BOTH timestamp flavors") {
    // the sink pins timestampFormat AND timestampNTZFormat: a µs-precision
    // value of either flavor must survive write → declared-schema read
    // exactly (the default NTZ format silently truncates to millis)
    import org.apache.spark.sql.types._
    val us = 1618000000123456L // ...123456 µs — truncation-sensitive
    val df = Seq(1L).toDF("id")
      .withColumn("ts_ltz", timestamp_micros(lit(us)))
      .withColumn("ts_ntz", timestamp_micros(lit(us)).cast(TimestampNTZType))
    val dir = Files.createTempDirectory("graft-csv-us").resolve("t.csv").toString
    CsvIo.writeCsv(df, dir)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("ts_ltz", TimestampType),
      StructField("ts_ntz", TimestampNTZType)))
    val back = spark.read.option("header", "true").schema(schema).csv(dir)
      .select(unix_micros($"ts_ltz"),
        unix_micros($"ts_ntz".cast(TimestampType)))
      .as[(Long, Long)].head()
    assert(back == ((us, us)))
  }
}
