package graft

import graft.operators.{Enrich, Multimodal}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Multimodal plumbing (binary ingest → label/embed/anonymize) and
  * enrichment (lang-detect / conditional-translate / resume) semantics.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val imageDir: String = {
    val dir = Files.createTempDirectory("graft-img")
    // fake "images": deterministic byte blobs keyed by filename
    (1 to 6).foreach { i =>
      val bytes = Array.tabulate[Byte](64 + i)(j => ((i * 37 + j * 11) % 251).toByte)
      Files.write(dir.resolve(s"img_$i.jpg"), bytes)
    }
    dir.toString
  }

  private val model = Multimodal.StubVisionModel()

  test("binaryFile ingest exposes (image, length, content)") {
    val df = Multimodal.readImages(spark, imageDir)
    assert(df.columns.toSeq == Seq("image", "length", "content"))
    assert(df.count() == 6)
    val r = df.filter($"image" === "img_3.jpg").head()
    assert(r.getAs[Long]("length") == 67L)
    assert(r.getAs[Array[Byte]]("content").length == 67)
  }

  test("labelImages is deterministic, batched, with top-5 + argmax and scene join") {
    val imgs = Multimodal.readImages(spark, imageDir)
    val labels = Multimodal.labelImages(imgs, model, batchSize = 2)
    val out = Multimodal.joinSceneDim(labels, Multimodal.sceneDim(spark))
    val rows = out.collect()
    assert(rows.nonEmpty)
    val r = out.filter($"image" === "img_1.jpg").head()
    val preds = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("predictions"))
    assert(preds.length == 5)
    // predictions sorted by prob desc; argmax category equals head label
    val probs = preds.map(_.getAs[Double]("prob"))
    assert(probs == probs.sortBy(-1 * _))
    assert(r.getAs[String]("category") == preds.head.getAs[String]("label"))
    assert(Set("indoor", "outdoor")(r.getAs[String]("environment")))
    // determinism across runs and partitionings
    val again = Multimodal.labelImages(imgs.repartition(3), model, batchSize = 1)
      .select("image", "category").as[(String, String)].collect().toMap
    val first = labels.select("image", "category").as[(String, String)].collect().toMap
    assert(again == first)
  }

  test("embedImages yields fixed-dim float vectors; failures are skipped not fatal") {
    val imgs = Multimodal.readImages(spark, imageDir)
    val emb = Multimodal.embedImages(imgs, model)
    val dims = emb.select(size($"embedding")).as[Int].collect()
    assert(dims.forall(_ == model.dim))
    assert(emb.count() <= 6) // hash%17==0 rows (if any) silently skipped
  }

  test("anonymizeImages rewrites bytes deterministically and preserves length") {
    val imgs = Multimodal.readImages(spark, imageDir)
    val anon = Multimodal.anonymizeImages(imgs, model)
    val r = anon.filter($"image" === "img_2.jpg").head().getAs[Array[Byte]]("content")
    val orig = imgs.filter($"image" === "img_2.jpg").head().getAs[Array[Byte]]("content")
    assert(r.length == orig.length)
    assert(r(8) == 0 && r(12) == 0)      // pixelation marker applied
    assert(!(r sameElements orig))
  }

  test("writeImages round-trips anonymized binaries through the sink") {
    val imgs = Multimodal.readImages(spark, imageDir)
    val anon = Multimodal.anonymizeImages(imgs, model)
    val outDir = Files.createTempDirectory("graft-img-out").toString
    Multimodal.writeImages(anon, outDir)
    val back = Multimodal.readImages(spark, outDir)
    assert(back.count() == imgs.count())
    val a = anon.filter($"image" === "img_4.jpg").head().getAs[Array[Byte]]("content")
    val b = back.filter($"image" === "img_4.jpg").head().getAs[Array[Byte]]("content")
    assert(a sameElements b)
  }

  test("detectLanguage scores marker families with empty sentinel") {
    val df = Seq(
      (1L, "data row column table join"), // datish 4/5
      (2L, ""),
      (3L, "stream batch value")).toDF("id", "text")
    val asMap = df.select($"id", Enrich.detectLanguage($"text").as("d"))
      .select($"id", $"d.lang", $"d.score").as[(Long, String, Double)].collect()
      .map { case (k, l, s) => k -> (l, s) }.toMap
    assert(asMap(1L)._1 == "datish" && asMap(1L)._2 == 0.8)
    assert(asMap(2L) == ("empty", 1.0))
    assert(asMap(3L)._1 == "streamish" && asMap(3L)._2 == 1.0)
  }

  test("translateColumn translates only low-confidence / foreign rows") {
    val dict = Enrich.DictTranslator(Map("strom" -> "stream", "tabelle" -> "table"))
    val df = Seq(
      (1L, "data row column table join"), // datish, score 0.8 < 0.9 → translated (identity)
      (2L, "stream batch value vector"),  // streamish 1.0 — but target is datish → translated
      (3L, "strom tabelle")).toDF("id", "text")
    val out = Enrich.translateColumn(df, "text", "text_en", "datish", dict)
    val m = out.select($"id", $"text_en").as[(Long, String)].collect().toMap
    assert(m(3L) == "stream table") // dictionary applied
    assert(m(1L) == "data row column table join")
    assert(m(2L) == "stream batch value vector") // pass-through tokens
  }

  test("resumeTranslation keeps existing rows and fills only the gap") {
    val dict = Enrich.DictTranslator(Map("strom" -> "stream"))
    val input = Seq((1L, "strom a"), (2L, "strom b")).toDF("id", "text")
    val existing = Seq((1L, "ALREADY DONE")).toDF("id", "text_en")
    val out = Enrich.resumeTranslation(input, existing, "id", "text", "text_en", "datish", dict)
    val m = out.select($"id", $"text_en").as[(Long, String)].collect().toMap
    assert(m(1L) == "ALREADY DONE") // untouched — no re-translation
    assert(m(2L) == "stream b")
  }
}
