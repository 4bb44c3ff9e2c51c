package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: images (audio/video identically) as opaque
  * `binary` columns with typed metadata, flowing through
  * label / embed / anonymize stages (ref: ImageLabeler.py:60-173,
  * DIRAdapter.py:20-76, ImageAnonymizer.py:28-51).
  *
  * Spark-side design (the part that must be right at 100 TB):
  *  - ingest via the `binaryFile` source → (path, modificationTime,
  *    length, content);
  *  - inference runs in `mapPartitions`: ONE model handle per partition
  *    (not per row), rows processed in fixed-size batches — the exact
  *    shape a GPU backend needs; partition count controls model-memory ×
  *    parallelism;
  *  - failures (the reference's B/W-image skip, ImageLabeler.py:142-146)
  *    surface as null outputs filterable downstream, never task failures.
  *
  * The actual decode/inference backend is pluggable ([[VisionModel]]).
  * No image library ships in this environment, so [[StubVisionModel]] is
  * a clearly-marked deterministic fake computing every output from a
  * rolling hash of the bytes — the Spark plumbing (schema, partitioning,
  * batching, failure semantics) is real and tested; swapping in an
  * ONNX/DJL backend changes only the trait implementation.
  */
object Multimodal {

  /** Read an image directory through the binaryFile source. */
  def readImages(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)
      .withColumn("image", regexp_extract(col("path"), "([^/]+)$", 1))
      .select("image", "length", "content")

  /** Pluggable per-partition inference backend. Implementations must be
    * Serializable and cheap to construct per partition (or hold the model
    * in a JVM-static lazily-initialized cache).
    */
  trait VisionModel extends Serializable {
    /** Top-k (label, prob), or None for undecodable input (skip row). */
    def label(content: Array[Byte]): Option[Seq[(String, Double)]]
    /** Fixed-dim descriptor, or None on failure. */
    def embed(content: Array[Byte]): Option[Array[Float]]
    /** Redacted bytes (face pixelation analog); identity on no detection. */
    def anonymize(content: Array[Byte]): Array[Byte]
    def dim: Int
  }

  /** Deterministic fake backend — STUB standing in for a real decode +
    * DNN (resnet50-places365 / Resnet101-AP-GeM in the reference). Every
    * output derives from a byte-level rolling hash, so results are
    * reproducible across runs/partitionings. Inputs whose hash ≡ 0
    * (mod 17) simulate the reference's undecodable-image skip.
    */
  final case class StubVisionModel(numLabels: Int = 8, dim0: Int = 16) extends VisionModel {
    private def byteHash(bs: Array[Byte]): Long = {
      var h = 0L
      var i = 0
      while (i < bs.length) {
        h = (h * TextFunctions.HashMul + (bs(i) & 0xff)) % TextFunctions.HashP
        i += 1
      }
      h
    }
    def dim: Int = dim0
    def label(content: Array[Byte]): Option[Seq[(String, Double)]] = {
      val h = byteHash(content)
      if (h % 17 == 0) None // simulated decode failure
      else Some((0 until 5).map { k =>
        val hk = (h * 31 + k) % 1000
        (s"scene_${(h + k) % numLabels}", (1000 - hk).toDouble / 5000.0)
      }.sortBy(-_._2))
    }
    def embed(content: Array[Byte]): Option[Array[Float]] = {
      val h = byteHash(content)
      if (h % 17 == 0) None
      else Some(Array.tabulate(dim0)(d => (((h * 31 + d) % 1997).toFloat / 1997.0f) - 0.5f))
    }
    def anonymize(content: Array[Byte]): Array[Byte] = {
      val out = content.clone()
      // "pixelate": zero every 4th byte past a header — deterministic marker
      var i = 8
      while (i < out.length) { out(i) = 0; i += 4 }
      out
    }
  }

  val predictionsType: DataType =
    ArrayType(StructType(Seq(
      StructField("label", StringType), StructField("prob", DoubleType))))

  /** U3 — scene labeling: per-partition model, batched rows, top-5
    * predictions + argmax category; undecodable rows dropped with the
    * reference's skip semantics (ref: ImageLabeler.py:129-173).
    */
  def labelImages(images: DataFrame, model: VisionModel, batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("image", StringType),
      StructField("category", StringType),
      StructField("predictions", predictionsType)))
    val enc = RowEncoder.encoderFor(outSchema)
    images.select("image", "content").mapPartitions { rows =>
      // one model handle per partition; rows flow through in batches
      val m = model
      rows.grouped(batchSize).flatMap { batch =>
        batch.flatMap { r =>
          m.label(r.getAs[Array[Byte]]("content")).map { preds =>
            Row(r.getAs[String]("image"), preds.head._1,
              preds.map(p => Row(p._1, p._2)))
          }
        }
      }
    }(enc)
  }

  /** J1 — broadcast join of labels to a small scene-hierarchy dim
    * (inner: unmatched labels drop, ref: ImageLabeler.py:169).
    */
  def joinSceneDim(labels: DataFrame, sceneDim: DataFrame): DataFrame =
    labels.join(broadcast(sceneDim), Seq("category"), "inner")

  /** U4 — image embeddings: same mapPartitions shape → `array<float>`
    * column (ref: DIRAdapter.py:20-76; embedding column instead of the
    * side-car .npy matrix).
    */
  def embedImages(images: DataFrame, model: VisionModel, batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("image", StringType),
      StructField("embedding", ArrayType(FloatType))))
    val enc = RowEncoder.encoderFor(outSchema)
    images.select("image", "content").mapPartitions { rows =>
      val m = model
      rows.grouped(batchSize).flatMap { batch =>
        batch.flatMap { r =>
          m.embed(r.getAs[Array[Byte]]("content"))
            .map(e => Row(r.getAs[String]("image"), e.toSeq))
        }
      }
    }(enc)
  }

  /** U5 — binary→binary anonymization (ref: anonymize_face.py:18-69);
    * write the result column back out with a binary sink.
    */
  def anonymizeImages(images: DataFrame, model: VisionModel): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("image", StringType),
      StructField("content", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    images.select("image", "content").mapPartitions { rows =>
      val m = model
      rows.map(r => Row(r.getAs[String]("image"),
        m.anonymize(r.getAs[Array[Byte]]("content"))))
    }(enc)
  }

  /** S10 — binary sink: write a (image, content) frame as one file per
    * row under `dir` (ref: ImageAnonymizer.py:44-51 in-place jpeg
    * writes). Executor-side `foreachPartition`, no driver collect; on a
    * cluster `dir` is the mounted object store.
    */
  def writeImages(df: DataFrame, dir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    df.select("image", "content").foreachPartition {
      (rows: Iterator[Row]) =>
        rows.foreach { r => // positional: foreachPartition rows carry no schema
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, r.getString(0)),
            r.getAs[Array[Byte]](1))
        }
    }
  }

  /** Tiny scene-hierarchy dimension (the Places365 indoor/outdoor sheet
    * analog, ImageLabeler.py:121-124) for [[joinSceneDim]].
    */
  def sceneDim(spark: SparkSession, numLabels: Int = 8): DataFrame = {
    import spark.implicits._
    (0 until numLabels)
      .map(i => (s"scene_$i", if (i % 2 == 0) "indoor" else "outdoor", i / 4))
      .toDF("category", "environment", "hierarchy_level")
  }
}
