package graft

import graft.io.CsvIo
import graft.pipeline.Pipeline
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import java.sql.Timestamp

/** End-to-end config-driven pipeline over a reference-shaped posts CSV
  * (the test.json dummy-pipeline analog, readme.md:13-30).
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def writeFixture(root: String): Unit = {
    val posts = Seq(
      (1L, "aaa", false, Timestamp.valueOf("2015-03-01 10:00:00"), 10L, 2L, "['#Golf']"),
      (2L, "bbb", true, Timestamp.valueOf("2016-05-01 10:00:00"), 30L, 4L, "['#rain']"),
      (3L, "ccc", false, Timestamp.valueOf("2016-06-01 10:00:00"), 40L, 5L, "[]"))
      .toDF("id", "shortcode", "is_video", "timestamp", "likes", "comment_count", "hashtags")
      .withColumn("post_url", concat(lit("u/"), col("shortcode")))
      .withColumn("type", lit("GraphImage"))
      .withColumn("comments_disabled", lit(false))
      .withColumn("search_mode", lit("hashtag"))
      .withColumn("search_term", lit("golf"))
      .withColumn("caption", lit("c"))
      .withColumn("display_url", lit("d"))
      .withColumn("owner_id", lit(9L))
      .withColumn("mentions", lit("[]"))
      .withColumn("thumbnail_src", lit("t"))
      // the file contract is positional: canonical column order
      .select(graft.schema.Schemas.postsCsv.fieldNames.map(col).toSeq: _*)
    posts.coalesce(1).write.option("header", "true").csv(s"$root/posts.csv")
  }

  private val configJson =
    """{
      |  "dataset_name": "Lens_Louvre",
      |  "stages": [
      |    {"name": "Preprocessing", "implementation": "PreprocessorStage",
      |     "input": "posts.csv", "output": "posts_preprocessed.csv", "enabled": true,
      |     "params": {"remove_duplicates": true, "images_only": true,
      |                "year_filter": [2010, 2020], "hashtag_filter_include": [],
      |                "hashtag_filter_exclude": [], "max_images_per_year": -1,
      |                "lowercase_hashtags": true}},
      |    {"name": "Disabled stage", "implementation": "PreprocessorStage",
      |     "input": "posts.csv", "output": "never.csv", "enabled": false, "params": {}},
      |    {"name": "Exploratory Analysis", "implementation": "ExploratoryanalysisStage",
      |     "input": "posts_preprocessed.csv", "output": "analysis", "enabled": true,
      |     "params": {}},
      |    {"name": "Translation", "implementation": "TranslatorStage",
      |     "input": "posts_preprocessed.csv", "output": "posts_translated.csv", "enabled": true,
      |     "params": {"target_column": "caption", "target_language": "en",
      |                "dictionary": {"c": "see"}}}
      |  ]
      |}""".stripMargin

  test("pipeline runs stages in order, skips disabled, memoizes outputs") {
    val root = Files.createTempDirectory("graft-pipe").toString
    writeFixture(root)
    Files.writeString(Paths.get(s"$root/config.json"), configJson)
    val cfg = Pipeline.loadConfig(s"$root/config.json")

    val summary = Pipeline.run(spark, root, cfg)
      .select("stage", "status").as[(String, String)].collect().toMap
    assert(summary("Preprocessing") == "ok")
    assert(summary("Disabled stage") == "disabled")
    assert(summary("Exploratory Analysis") == "ok")

    // preprocessed output: video dropped, 21+id columns, lowercased tags
    val raw = spark.read.option("header", "true")
      .option("multiLine", "true").option("escape", "\"")
      .csv(s"$root/posts_preprocessed.csv")
    assert(raw.count() == 2) // id2 is a video
    assert(raw.columns.toSeq == graft.schema.Schemas.postsPreprocessedColumns)
    assert(raw.filter(col("id") === "1").head().getAs[String]("hashtags") == """["#golf"]""")

    // analysis fan-out wrote aggregate CSVs
    assert(Files.exists(Paths.get(s"$root/analysis/posts_per_month")))
    assert(Files.exists(Paths.get(s"$root/analysis/hashtag_freqs")))

    // translation stage wrote the <column>_<language> column through the
    // checkpointed executor ("c" is no detected family → dict applies)
    assert(summary("Translation") == "ok")
    val trans = spark.read.option("header", "true")
      .option("multiLine", "true").option("escape", "\"")
      .csv(s"$root/posts_translated.csv")
    assert(trans.columns.contains("caption_en"))
    assert(trans.select("caption_en").as[String].collect().forall(_ == "see"))

    // re-run: everything memoized
    val again = Pipeline.run(spark, root, cfg)
      .select("stage", "status").as[(String, String)].collect().toMap
    assert(again("Preprocessing") == "skipped")
    assert(again("Exploratory Analysis") == "skipped")
    assert(again("Translation") == "skipped")
  }

  test("training-data stages run over a documents parquet") {
    val root = Files.createTempDirectory("graft-pipe3").toString
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1
      (3L, "one two three four five six seven"))
      .toDF("doc_id", "text").write.parquet(s"$root/documents")
    val cfgJson =
      """{"dataset_name": "t", "stages": [
        |  {"name": "Text", "implementation": "TextAnalysisStage",
        |   "input": "documents", "output": "text_stats", "enabled": true, "params": {}},
        |  {"name": "Dedup", "implementation": "DedupStage",
        |   "input": "documents", "output": "dup_pairs", "enabled": true,
        |   "params": {"threshold": 0.9}}
        |]}""".stripMargin
    Files.writeString(Paths.get(s"$root/config.json"), cfgJson)
    val summary = Pipeline.run(spark, root, Pipeline.loadConfig(s"$root/config.json"))
      .select("stage", "status").as[(String, String)].collect().toMap
    assert(summary("Text") == "ok" && summary("Dedup") == "ok")
    val stats = spark.read.parquet(s"$root/text_stats")
    assert(stats.columns.contains("fingerprint") && stats.count() == 3)
    // identical texts share a fingerprint
    assert(stats.select("fingerprint").distinct().count() == 2)
    val pairs = spark.read.parquet(s"$root/dup_pairs")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L))) // the exact dup, jaccard 1.0
  }

  test("CurationStage removes near-dup group members and contaminated docs") {
    val root = Files.createTempDirectory("graft-pipe4").toString
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // near-dup group with 1 → removed
      (3L, "one two three four five six seven"),   // clean survivor
      (5L, "bench mark hold out set words here"),  // benchmark slice (5 % 5 = 0) → removed
      (7L, "bench mark hold out other tail words")) // shares 4-gram with 5 → contaminated
      .toDF("doc_id", "text").write.parquet(s"$root/documents")
    val cfgJson =
      """{"dataset_name": "t", "stages": [
        |  {"name": "Curate", "implementation": "CurationStage",
        |   "input": "documents", "output": "curated", "enabled": true,
        |   "params": {"benchmark_mod": 5, "decontam_k": 4}}
        |]}""".stripMargin
    Files.writeString(Paths.get(s"$root/config.json"), cfgJson)
    val summary = Pipeline.run(spark, root, Pipeline.loadConfig(s"$root/config.json"))
      .select("stage", "status").as[(String, String)].collect().toMap
    assert(summary("Curate") == "ok")
    val kept = spark.read.parquet(s"$root/curated")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("missing input is reported, not fatal") {
    val root = Files.createTempDirectory("graft-pipe2").toString
    Files.writeString(Paths.get(s"$root/config.json"), configJson)
    val cfg = Pipeline.loadConfig(s"$root/config.json")
    val summary = Pipeline.run(spark, root, cfg)
      .select("stage", "status").as[(String, String)].collect().toMap
    assert(summary("Preprocessing") == "missing_input")
  }
}
