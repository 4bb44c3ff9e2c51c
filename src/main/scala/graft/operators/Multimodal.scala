package graft.operators

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
  * The decode/inference backend is pluggable ([[VisionModel]]).
  * [[ImageIoVisionModel]] is the default: it REALLY decodes images with
  * JVM-native `javax.imageio` (no native deps) and computes every output
  * from actual pixels — a deterministic linear scene model over pooled
  * gray statistics (standing in for resnet50-places365), grid-pooled
  * descriptors (standing in for the 2048-d DIR vectors), and the
  * reference's exact block-mean face-pixelation arithmetic. Only the
  * DNN weights are synthetic; swapping in an ONNX/DJL backend changes
  * nothing but the trait implementation.
  */
object Multimodal {

  // ImageIO's stream wrappers default to DISK-backed caches — every
  // in-memory encode/decode otherwise creates and deletes a temp FILE,
  // so per-row codec cost rides the state of the scratch filesystem
  // (the unexplained i02 round-over-round movement: unchanged code,
  // tmpfs-state-dependent constant). All our codec work is byte-array
  // in/out; keep it in memory. Runs once per executor JVM at class load.
  javax.imageio.ImageIO.setUseCache(false)

  // ---- PNG chunk surgery: the metadata-privacy primitive ------------
  //
  // Training-data image pipelines strip embedded metadata (EXIF GPS,
  // camera serials, XMP author tags) before anything else touches the
  // bytes — the i02 face-pixelation step's sibling on the CONTAINER
  // rather than the pixels. PNG metadata lives in ancillary chunks
  // (tEXt/zTXt/iTXt/tIME/...); the critical chunks (IHDR/PLTE/IDAT/
  // IEND) carry the image itself, so the strip is a pure byte-level
  // chunk walk: no decode, no re-encode, pixels bit-identical — which
  // is what lets the i10 gate pin "pixels survive the scrub" against
  // the pixel-formula oracle while a spec pins the chunk-level removal.

  private val PngSig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
  private val CriticalChunks = Set("IHDR", "PLTE", "IDAT", "IEND")

  private def isPng(bytes: Array[Byte]): Boolean =
    bytes.length > PngSig.length &&
      PngSig.indices.forall(i => bytes(i) == PngSig(i))

  /** (offset, whole-chunk length, type) for each well-formed chunk;
    * stops at the first truncated chunk.
    */
  private def pngChunks(bytes: Array[Byte]): Seq[(Int, Int, String)] = {
    val out = scala.collection.mutable.ArrayBuffer[(Int, Int, String)]()
    var o = PngSig.length
    var ok = true
    while (ok && o + 8 <= bytes.length) {
      val len = ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
        ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
      val total = 12 + len
      if (len < 0 || o + total > bytes.length) ok = false
      else {
        out += ((o, total, new String(bytes, o + 4, 4, "ISO-8859-1")))
        o += total
      }
    }
    out.toSeq
  }

  /** Chunk-type walk (empty for non-PNG bytes) — the audit view. */
  def pngChunkTypes(bytes: Array[Byte]): Seq[String] =
    if (!isPng(bytes)) Seq.empty else pngChunks(bytes).map(_._3)

  /** Drop every ancillary chunk; critical chunks pass through
    * byte-identical (pixels untouched — no decode happens). Non-PNG
    * input passes through unchanged (the strip composes with mixed
    * binary columns without a decode gate in front).
    */
  def stripPngMetadata(bytes: Array[Byte]): Array[Byte] =
    if (!isPng(bytes)) bytes
    else {
      val keep = pngChunks(bytes).filter(c => CriticalChunks(c._3))
      val bos = new java.io.ByteArrayOutputStream(bytes.length)
      bos.write(PngSig, 0, PngSig.length)
      keep.foreach { case (o, n, _) => bos.write(bytes, o, n) }
      bos.toByteArray
    }

  /** Insert a `tEXt` keyword/value chunk right after IHDR — the fixture
    * injector that stands in for camera-written EXIF/XMP (javax's PNG
    * encoder writes none, so the strip needs something real to remove).
    */
  def pngWithText(bytes: Array[Byte], keyword: String, value: String): Array[Byte] =
    if (!isPng(bytes)) bytes
    else {
      val data = keyword.getBytes("ISO-8859-1") ++ Array(0.toByte) ++
        value.getBytes("ISO-8859-1")
      val typ = "tEXt".getBytes("ISO-8859-1")
      val crc = new java.util.zip.CRC32
      crc.update(typ)
      crc.update(data)
      val c = crc.getValue
      val ihdrEnd = pngChunks(bytes).find(_._3 == "IHDR")
        .map(ch => ch._1 + ch._2).getOrElse(PngSig.length)
      val bos = new java.io.ByteArrayOutputStream(bytes.length + data.length + 12)
      bos.write(bytes, 0, ihdrEnd)
      val len = data.length
      bos.write((len >>> 24) & 0xff); bos.write((len >>> 16) & 0xff)
      bos.write((len >>> 8) & 0xff); bos.write(len & 0xff)
      bos.write(typ, 0, typ.length)
      bos.write(data, 0, data.length)
      bos.write(((c >>> 24) & 0xff).toInt); bos.write(((c >>> 16) & 0xff).toInt)
      bos.write(((c >>> 8) & 0xff).toInt); bos.write((c & 0xff).toInt)
      bos.write(bytes, ihdrEnd, bytes.length - ihdrEnd)
      bos.toByteArray
    }

  /** Read an image directory through the binaryFile source. */
  def readImages(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)
      .withColumn("image", regexp_extract(col("path"), "([^/]+)$", 1))
      .select("image", "length", "content")

  /** Pluggable per-partition inference backend. Implementations must be
    * Serializable and cheap to construct per partition (or hold the model
    * in a JVM-static lazily-initialized cache — the standard pattern for
    * an ONNX Runtime / DJL `Predictor`, which must not be serialized from
    * the driver).
    *
    * The ONNX/DJL plug point: override the `*Batch` methods — the
    * pipeline operators ([[labelImages]], [[embedImages]]) call ONLY
    * those, passing `batchSize`-bounded groups from one partition, which
    * is exactly the tensor-batch shape a GPU session wants
    * (ImageLabeler.py:129-140's DataLoader batching). The per-item
    * defaults make a CPU-scalar backend a 3-method implementation.
    *
    * Failure contract (both grains): undecodable/rejected input returns
    * None for THAT item — never a thrown exception, which would fail the
    * task and with it the whole partition (the reference's B/W-image
    * skip, ImageLabeler.py:142-146).
    */
  trait VisionModel extends Serializable {
    /** Top-k (label, prob), or None for undecodable input (skip row). */
    def label(content: Array[Byte]): Option[Seq[(String, Double)]]
    /** Fixed-dim descriptor, or None on failure. */
    def embed(content: Array[Byte]): Option[Array[Float]]
    /** Redacted bytes (face pixelation analog); identity on no detection. */
    def anonymize(content: Array[Byte]): Array[Byte]
    def dim: Int
    /** Batched inference entry points — MUST be position-stable (result i
      * corresponds to input i) and total (None for failed items). A GPU
      * backend overrides these with one tensor-batch forward pass.
      */
    def labelBatch(contents: Seq[Array[Byte]]): Seq[Option[Seq[(String, Double)]]] =
      contents.map(label)
    def embedBatch(contents: Seq[Array[Byte]]): Seq[Option[Array[Float]]] =
      contents.map(embed)
  }

  /** Real JVM-native vision backend over `javax.imageio`:
    *
    *  - `label` — decode, reject single-band (B/W) images exactly like the
    *    reference's 3-channel transform RuntimeError skip
    *    (ImageLabeler.py:141-146), pool gray means over a `grid`×`grid`
    *    spatial grid, and run a deterministic linear classifier + softmax
    *    over them → top-5 (label, prob) sorted desc + argmax category
    *    (ImageLabeler.py:149-160). The weights are a fixed LCG (no DNN
    *    ships here) but the features are REAL pixels.
    *  - `embed` — grid-pooled mean-gray descriptor scaled to [0,1)
    *    (DIRAdapter.py:20-47's fixed-dim vector, dim = grid²).
    *  - `anonymize` — decode, take the detected face box (the SSD detector
    *    does not ship, so detection is a deterministic centered box at
    *    half the frame), and apply the reference's exact pixelation
    *    arithmetic (anonymize_face.py:44-70): `blocks`×`blocks` linspace
    *    boundaries, each block filled with its truncated per-channel mean;
    *    re-encoded as lossless PNG. Undecodable input passes through.
    *
    * All outputs derive from decoded pixels only — deterministic across
    * runs, partitionings, and (for PNG/BMP inputs) platforms.
    */
  final case class ImageIoVisionModel(numLabels: Int = 8, grid: Int = 4,
                                      blocks: Int = 3) extends VisionModel {
    import java.awt.image.BufferedImage

    def dim: Int = grid * grid

    private def decode(content: Array[Byte]): Option[BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content)))
      catch { case _: Exception => None }

    /** Mirror of the reference's B/W skip: its 3-channel normalize throws
      * on single-band images and the row is dropped (ImageLabeler.py:141-146).
      */
    private def decodeColor(content: Array[Byte]): Option[BufferedImage] =
      decode(content).filter(_.getColorModel.getNumComponents >= 3)

    /** Integer gray sums (r+g+b per pixel) per g×g grid cell, row-major,
      * with numpy-linspace-style truncated boundaries: cell (bx,by) spans
      * x ∈ [bx·w/g, (bx+1)·w/g). Also returns per-cell pixel counts.
      * Integer-exact, so an SQL oracle can reproduce it bit-for-bit.
      */
    def grayBlockSums(img: BufferedImage, g: Int): (Array[Long], Array[Long]) = {
      val (w, h) = (img.getWidth, img.getHeight)
      val xs = Array.tabulate(g + 1)(i => i * w / g)
      val ys = Array.tabulate(g + 1)(i => i * h / g)
      val sums = new Array[Long](g * g)
      val counts = new Array[Long](g * g)
      for (by <- 0 until g; bx <- 0 until g) {
        val c = by * g + bx
        var y = ys(by)
        while (y < ys(by + 1)) {
          var x = xs(bx)
          while (x < xs(bx + 1)) {
            val rgb = img.getRGB(x, y)
            sums(c) += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            counts(c) += 1
            x += 1
          }
          y += 1
        }
      }
      (sums, counts)
    }

    /** Decoded block sums for external (oracle-checked) consumers; None on
      * undecodable or single-band input.
      */
    def grayBlockSums(content: Array[Byte], g: Int): Option[Array[Long]] =
      decodeColor(content).map(img => grayBlockSums(img, g)._1)

    /** Decoded (width, height, row-major g×g block gray sums) — the
      * integer statistics the oracle-checked image gate query compares.
      */
    def decodeStats(content: Array[Byte], g: Int): Option[(Int, Int, Array[Long])] =
      decodeColor(content).map(img => (img.getWidth, img.getHeight, grayBlockSums(img, g)._1))

    /** Whole-image per-channel integer sums of a decoded image —
      * (width, height, Σr, Σg, Σb); None on undecodable input. The
      * integer statistic the pixelation gate query (i02) compares.
      */
    def channelSums(content: Array[Byte]): Option[(Int, Int, Long, Long, Long)] =
      decode(content).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        var (rs, gs, bs) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            rs += (rgb >> 16) & 0xff; gs += (rgb >> 8) & 0xff; bs += rgb & 0xff
            x += 1
          }
          y += 1
        }
        (w, h, rs, gs, bs)
      }

    /** Nearest-neighbor RESIZE through the real codec path (the mandate's
      * explicit resize op; ref analog: the torchvision
      * `Resize((256,256))`/`CenterCrop(224)` preprocessing at
      * ImageLabeler.py:104-105): decode, sample output pixel (x, y) of
      * the ow×oh result from source (⌊x·w/ow⌋, ⌊y·h/oh⌋), re-encode
      * through a REAL `javax.imageio` BMP writer. Integer-exact, so an
      * SQL oracle replays per-channel sums of the RESIZED image straight
      * from the source pixel formula (the i08 gate). None on
      * undecodable input — corrupt bytes skip, never task-fail.
      */
    def resizeNN(content: Array[Byte], ow: Int, oh: Int): Option[Array[Byte]] =
      decode(content).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        val out = new BufferedImage(ow, oh, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < oh) {
          var x = 0
          while (x < ow) {
            out.setRGB(x, y, img.getRGB(x * w / ow, y * h / oh))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "bmp", bos)
        bos.toByteArray
      }

    /** Difference-hash (dHash) of the decoded image as two 32-bit halves:
      * gray (r+g+b) is sampled at a nearest-neighbor 9×8 grid
      * (x_i = ⌊i·(w−1)/8⌋, y_j = ⌊j·(h−1)/7⌋ — the cheap NN "resize"),
      * and bit (j,i) is set iff gray(x_{i+1}, y_j) > gray(x_i, y_j).
      * Rows 0-3 pack into `lo`, rows 4-7 into `hi` (two non-negative
      * longs — a single 64-bit value would set the sign bit, which SQL
      * BIGINT oracles cannot reproduce portably). Integer-exact, so the
      * oracle replays it from the pixel formula; robustness to
      * RE-ENCODING (not re-sampling) is what the i07 gate exercises —
      * the same pixels through different codecs hash identically.
      * None on undecodable or single-band input.
      */
    def dhashHalves(content: Array[Byte]): Option[(Long, Long)] =
      decodeColor(content).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        val xs = Array.tabulate(9)(i => (i * (w - 1)) / 8)
        val ys = Array.tabulate(8)(j => (j * (h - 1)) / 7)
        def gray(x: Int, y: Int): Int = {
          val rgb = img.getRGB(x, y)
          ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        }
        var lo = 0L
        var hi = 0L
        var j = 0
        while (j < 8) {
          var i = 0
          while (i < 8) {
            if (gray(xs(i + 1), ys(j)) > gray(xs(i), ys(j))) {
              if (j < 4) lo |= 1L << (j * 8 + i)
              else hi |= 1L << ((j - 4) * 8 + i)
            }
            i += 1
          }
          j += 1
        }
        (hi, lo)
      }

    /** Fixed LCG weight for (class k, cell c) in [-0.5, 0.5). */
    private def weight(k: Int, c: Int): Double = {
      val n = k.toLong * 7919L + c.toLong * 104729L
      val g = Math.floorMod(n * 1103515245L + 12345L, 1024L)
      (g - 512L).toDouble / 1024.0
    }

    /** (width, height, per-class logits) — the deterministic pre-softmax
      * head: every term is a fixed-order sum of exact-integer-derived
      * doubles, so an SQL oracle replays the logits bit-for-bit (the
      * softmax in [[label]] uses `exp`, which is NOT cross-engine
      * reproducible — gates compare logits, the API returns probs).
      */
    def sceneLogits(content: Array[Byte]): Option[(Int, Int, Seq[Double])] =
      decodeColor(content).map { img =>
        val (sums, counts) = grayBlockSums(img, grid)
        val feats = sums.indices.map(c =>
          if (counts(c) == 0) 0.0 else sums(c).toDouble / (counts(c) * 768.0))
        val logits = (0 until numLabels).map { k =>
          feats.indices.map(c => weight(k, c) * feats(c)).sum * 8.0
        }
        (img.getWidth, img.getHeight, logits)
      }

    def label(content: Array[Byte]): Option[Seq[(String, Double)]] =
      sceneLogits(content).map { case (_, _, logits) =>
        val mx = logits.max
        val exps = logits.map(l => math.exp(l - mx))
        val z = exps.sum
        (0 until numLabels).map(k => (s"scene_$k", exps(k) / z))
          .sortBy { case (l, p) => (-p, l) }
          .take(5)
      }

    def embed(content: Array[Byte]): Option[Array[Float]] =
      decodeColor(content).map { img =>
        val (sums, counts) = grayBlockSums(img, grid)
        Array.tabulate(dim)(c =>
          if (counts(c) == 0) 0.0f else (sums(c).toDouble / (counts(c) * 768.0)).toFloat)
      }

    def anonymize(content: Array[Byte]): Array[Byte] =
      // "detected" face ROI: centered box at half the frame (the
      // stand-in detection; [[graft.operators.CvFaceVisionModel]] is the
      // real-detector backend over the SAME fill arithmetic)
      Multimodal.pixelateBoxes(content,
        (w, h) => Seq((w / 4, h / 4, w / 4 + w / 2, h / 4 + h / 2)), blocks)
  }

  /** The reference's exact face-pixelation arithmetic
    * (anonymize_face.py:46-70) applied to caller-supplied ROIs: decode,
    * for each (clamped) box lay `blocks`×`blocks` truncated-linspace
    * boundaries and fill each block with its truncated per-channel mean
    * (the cv2.mean + int() semantics), re-encode as lossless PNG.
    * `boxesFor(w, h)` supplies the detections — a real SSD
    * ([[CvFaceVisionModel]]) or the deterministic centered-box stand-in
    * ([[ImageIoVisionModel.anonymize]]) — so every backend shares one
    * bit-exact redaction path (the i02 gate's arithmetic). Undecodable
    * input passes through unchanged.
    */
  def pixelateBoxes(content: Array[Byte],
                    boxesFor: (Int, Int) => Seq[(Int, Int, Int, Int)],
                    blocks: Int): Array[Byte] =
    pixelateBoxesDecoded(content,
      img => boxesFor(img.getWidth, img.getHeight), blocks)

  /** [[pixelateBoxes]] whose detector receives the ALREADY-decoded,
    * INT_RGB-normalized image — a pixel-consuming detector
    * ([[CvFaceVisionModel]]) then shares the single decode instead of
    * paying a second ImageIO pass per image (decode dominates the
    * anonymization stage's CPU at corpus scale).
    */
  def pixelateBoxesDecoded(content: Array[Byte],
                           boxesFor: java.awt.image.BufferedImage => Seq[(Int, Int, Int, Int)],
                           blocks: Int): Array[Byte] = {
    val img0 =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case _: Exception => null }
    if (img0 == null) return content // undecodable input passes through
    // normalize to INT_RGB so setRGB/getRGB round-trip exactly
    val img = new java.awt.image.BufferedImage(img0.getWidth, img0.getHeight,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.getGraphics.drawImage(img0, 0, 0, null)
    val (w, h) = (img.getWidth, img.getHeight)
    for ((bx0, by0, bx1, by1) <- boxesFor(img)) {
      // SSD boxes can poke out of frame — clamp like the numpy slicing does
      val (sx, sy) = (math.max(0, bx0), math.max(0, by0))
      val (ex, ey) = (math.min(w, bx1), math.min(h, by1))
      val (fw, fh) = (ex - sx, ey - sy)
      if (fw > 0 && fh > 0) {
        // anonymize_face.py:47-49 linspace block boundaries (truncated)
        val xs = (0 to blocks).map(i => i * fw / blocks)
        val ys = (0 to blocks).map(i => i * fh / blocks)
        for (bi <- 1 to blocks; bj <- 1 to blocks) {
          val (x0, x1, y0, y1) = (xs(bj - 1), xs(bj), ys(bi - 1), ys(bi))
          var (rs, gs, bs, n) = (0L, 0L, 0L, 0L)
          for (y <- y0 until y1; x <- x0 until x1) {
            val rgb = img.getRGB(sx + x, sy + y)
            rs += (rgb >> 16) & 0xff; gs += (rgb >> 8) & 0xff; bs += rgb & 0xff
            n += 1
          }
          if (n > 0) {
            // cv2.mean + int(): truncated per-channel means fill the block
            val fill = (((rs / n).toInt & 0xff) << 16) |
              (((gs / n).toInt & 0xff) << 8) | ((bs / n).toInt & 0xff)
            for (y <- y0 until y1; x <- x0 until x1)
              img.setRGB(sx + x, sy + y, fill)
          }
        }
      }
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos) // lossless, deterministic
    bos.toByteArray
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
      // one model handle per partition; batches reach the BACKEND (a GPU
      // impl runs each group as one forward pass)
      val m = model
      rows.grouped(batchSize).flatMap { batch =>
        val preds = m.labelBatch(batch.map(_.getAs[Array[Byte]]("content")))
        batch.lazyZip(preds).flatMap {
          case (r, Some(ps)) =>
            Some(Row(r.getAs[String]("image"), ps.head._1,
              ps.map(p => Row(p._1, p._2))))
          case _ => None
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
        val embs = m.embedBatch(batch.map(_.getAs[Array[Byte]]("content")))
        batch.lazyZip(embs).flatMap {
          case (r, Some(e)) => Some(Row(r.getAs[String]("image"), e.toSeq))
          case _ => None
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

  /** Deterministic synthetic test image for an id: dimensions and every
    * channel are integer-closed functions of (id, x, y), so an SQL oracle
    * can recompute any pooled pixel statistic exactly — while the Spark
    * side goes through a REAL PNG encode + [[ImageIoVisionModel]] decode,
    * proving the decode path end-to-end.
    *   w = 16 + id%13, h = 12 + id%11
    *   r = (7x+11y+13·id)%256, g = (3x+5y+17·id)%256, b = (13x+7y+19·id)%256
    */
  def syntheticImage(id: Long): Array[Byte] = syntheticImageAs(id, "png")

  /** [[syntheticImage]] through a caller-chosen REAL codec ("png",
    * "bmp"): identical pixels, different bytes — the re-encoded
    * duplicate every scraped-image corpus contains, which byte-level
    * dedup cannot see and decoded-content hashing (i07) can.
    */
  def syntheticImageAs(id: Long, format: String): Array[Byte] = {
    val w = (16 + id % 13).toInt
    val h = (12 + id % 11).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = Math.floorMod(7L * x + 11L * y + 13L * id, 256L).toInt
      val g = Math.floorMod(3L * x + 5L * y + 17L * id, 256L).toInt
      val b = Math.floorMod(13L * x + 7L * y + 19L * id, 256L).toInt
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  /** Deterministic synthetic PCM WAV for an id — the audio twin of
    * [[syntheticImage]]: sample count and every 16-bit sample are
    * integer-closed functions of (id, t), so an SQL oracle recomputes any
    * framed statistic exactly, while the Spark side goes through a REAL
    * `javax.sound.sampled` WAV encode.
    *   n = 1000 + id%500 samples, mono 16-bit signed little-endian
    *   s(t) = ((37·t + 11·id) mod 65536) − 32768
    */
  def syntheticWav(id: Long): Array[Byte] = syntheticWavAs(id, aiff = false)

  /** [[syntheticWav]] in a chosen REAL container: WAVE (little-endian
    * PCM) or AIFF (big-endian PCM) through the genuine `javax.sound`
    * writers — the same decoded samples in entirely different bytes,
    * the audio twin of `syntheticImageAs`'s PNG/BMP pair (i07).
    */
  def syntheticWavAs(id: Long, aiff: Boolean): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val n = (1000 + id % 500).toInt
    val data = new Array[Byte](2 * n)
    var t = 0
    while (t < n) {
      val s = (Math.floorMod(37L * t + 11L * id, 65536L) - 32768L).toInt
      if (aiff) { // AIFF carries big-endian PCM
        data(2 * t) = ((s >> 8) & 0xff).toByte
        data(2 * t + 1) = (s & 0xff).toByte
      } else {
        data(2 * t) = (s & 0xff).toByte
        data(2 * t + 1) = ((s >> 8) & 0xff).toByte
      }
      t += 1
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, aiff)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais,
      if (aiff) AudioFileFormat.Type.AIFF else AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Real WAV decode + framed feature extraction — the audio modality's
    * decode/feature-extract operator (same tier as [[ImageIoVisionModel]]
    * for images): a genuine `javax.sound.sampled` codec round-trip, not a
    * byte hash. Corrupt input → None (skip, never task-fail), matching
    * the pipeline's failure policy for opaque binary columns.
    */
  final case class WavAudioModel() extends Serializable {
    /** Decoded 16-bit samples, or None if the container is unreadable.
      * Container-agnostic for mono 16-bit PCM: WAVE (little-endian) and
      * AIFF (big-endian) both land on the same sample array — byte-level
      * dedup cannot see a WAVE/AIFF content pair, this can (i09).
      */
    def decodeSamples(content: Array[Byte]): Option[Array[Int]] =
      try {
        import javax.sound.sampled.AudioSystem
        val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(content))
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
        else {
          val big = fmt.isBigEndian
          val bytes = ais.readAllBytes()
          val out = new Array[Int](bytes.length / 2)
          var i = 0
          while (i < out.length) {
            out(i) =
              if (big) ((bytes(2 * i).toInt << 8) | (bytes(2 * i + 1).toInt & 0xff))
              else ((bytes(2 * i + 1).toInt << 8) | (bytes(2 * i).toInt & 0xff))
            i += 1
          }
          Some(out)
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Energy-threshold voice-activity segmentation (the classic VAD
      * front-end every speech-data pipeline runs before a learned
      * model): 160-sample frames (20 ms @ 8 kHz), a frame is ACTIVE iff
      * its Σ|s| exceeds `threshold`, and activity segments are maximal
      * runs of active frames. Returns (n_frames, n_active, n_segments,
      * longest_run) — all exact integers (the trailing partial frame is
      * dropped, i03's framing convention). Exercises the REAL decode;
      * the i11 oracle recomputes the identical integers from the sample
      * formula through SQL run-length windows.
      */
    def vadStats(content: Array[Byte], frame: Int = 160,
                 threshold: Long = 160L * 16384L): Option[(Long, Long, Long, Long)] =
      decodeSamples(content).map { s =>
        val nf = s.length / frame
        var active = 0L; var segs = 0L; var longest = 0L
        var run = 0L
        var f = 0
        while (f < nf) {
          var sum = 0L
          var i = f * frame
          val end = i + frame
          while (i < end) { sum += math.abs(s(i)); i += 1 }
          if (sum > threshold) {
            active += 1; run += 1
            if (run == 1) segs += 1
            if (run > longest) longest = run
          } else run = 0
          f += 1
        }
        (nf.toLong, active, segs, longest)
      }

    /** (n, Σ|s|, zero crossings, quarter-frame Σ|s| ×4) — all exact
      * integers: the framed energy/sign statistics a quality filter runs
      * before any learned audio model.
      */
    def frameStats(content: Array[Byte]): Option[(Int, Long, Long, Array[Long])] =
      decodeSamples(content).map { s =>
        val n = s.length
        var absSum = 0L
        var zc = 0L
        var i = 0
        while (i < n) {
          absSum += math.abs(s(i))
          if (i > 0 && (s(i) >= 0) != (s(i - 1) >= 0)) zc += 1
          i += 1
        }
        val q = n / 4
        val cells = new Array[Long](4)
        i = 0
        while (i < n) {
          val c = math.min(if (q == 0) 3 else i / q, 3)
          cells(c) += math.abs(s(i))
          i += 1
        }
        (n, absSum, zc, cells)
      }
  }

  /** Deterministic synthetic video for an id — the motion twin of
    * [[syntheticImage]]: a minimal MJPEG-style container ("GVID" magic,
    * frame count, then length-prefixed REAL PNG frames) whose every frame
    * pixel is an integer-closed function of (id, frame, x, y), so an SQL
    * oracle recomputes any sampled-frame statistic exactly while the
    * Spark side exercises genuine container parsing + per-frame
    * `javax.imageio` decodes.
    *   nFrames = 3 + id%4, w = 8 + id%5, h = 6 + id%4
    *   r = (7x+11y+13·id+23·f)%256, g = (3x+5y+17·id+29·f)%256,
    *   b = (13x+7y+19·id+31·f)%256
    */
  def syntheticVideo(id: Long): Array[Byte] = {
    val nFrames = (3 + id % 4).toInt
    val w = (8 + id % 5).toInt
    val h = (6 + id % 4).toInt
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBytes("GVID")
    out.writeInt(nFrames)
    for (f <- 0 until nFrames) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val r = Math.floorMod(7L * x + 11L * y + 13L * id + 23L * f, 256L).toInt
        val g = Math.floorMod(3L * x + 5L * y + 17L * id + 29L * f, 256L).toInt
        val b = Math.floorMod(13L * x + 7L * y + 19L * id + 31L * f, 256L).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val fb = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", fb)
      val bytes = fb.toByteArray
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  /** Video container parse + frame sampling + per-frame decode — the
    * video modality operator (frame-sample / feature-extract from the
    * builder mandate). Every `stride`-th frame is PNG-decoded (real
    * codec) and reduced to integer statistics; corrupt containers or
    * frames → None (skip, never task-fail). At 100 TB the container
    * bytes come from `binaryFile`/object-store columns; sampling before
    * decode is the point — a 30 fps corpus decoded at stride 30 costs
    * 1/30th of the decode budget, and the downstream schema
    * (doc, frame_idx, features) is unchanged.
    */
  final case class VideoModel() extends Serializable {
    /** (frameIdx, width, height, Σ(r+g+b)) per sampled frame. */
    def sampleFrames(content: Array[Byte], stride: Int): Option[Seq[(Int, Int, Int, Long)]] =
      try {
        val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(content))
        val magic = new Array[Byte](4)
        in.readFully(magic)
        if (!java.util.Arrays.equals(magic, "GVID".getBytes)) return None
        val nFrames = in.readInt()
        if (nFrames < 0 || nFrames > 1000000) return None
        val out = Seq.newBuilder[(Int, Int, Int, Long)]
        for (f <- 0 until nFrames) {
          val len = in.readInt()
          val bytes = new Array[Byte](len)
          in.readFully(bytes)
          if (f % stride == 0) {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            if (img == null) return None
            var sum = 0L
            for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
              val rgb = img.getRGB(x, y)
              sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            }
            out += ((f, img.getWidth, img.getHeight, sum))
          }
        }
        Some(out.result())
      } catch { case scala.util.control.NonFatal(_) => None }
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
