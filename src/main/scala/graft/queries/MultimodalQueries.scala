package graft.queries

import graft.{GraftQuery, Tables}
import graft.operators.Multimodal
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Oracle-checked multimodal gate: proves the REAL image encode→decode
  * path end-to-end. The Spark side renders a deterministic PNG per doc_id
  * ([[Multimodal.syntheticImage]]: every channel an integer-closed
  * function of (id, x, y)), pushes it through a genuine
  * `javax.imageio` decode ([[Multimodal.ImageIoVisionModel]]), and emits
  * decoded dimensions plus 2×2 pooled gray sums. The DuckDB oracle
  * recomputes the identical integer statistics straight from the pixel
  * formula — any decode/encode infidelity breaks the hash match.
  *
  * Scale shape: one narrow mapPartitions projection, no shuffle until the
  * final bounded sort; at 100 TB the same pipeline reads `binaryFile`
  * parquet/object-store bytes instead of rendering them.
  */
object MultimodalQueries {

  private def sqlGray(didE: String): String =
    s"(7*x + 11*y + 13*$didE) % 256 + (3*x + 5*y + 17*$didE) % 256 + (13*x + 7*y + 19*$didE) % 256"

  /** Σ gray over cell x∈[x0,x1), y∈[y0,y1) as a nested comprehension. */
  private def sqlCell(didE: String, x0: String, x1: String, y0: String, y1: String): String =
    s"CAST(list_sum(flatten([[${sqlGray(didE)} for x in range($x0, $x1)] for y in range($y0, $y1)])) AS BIGINT)"

  /** I1 — image decode round-trip statistics (ref: ImageLabeler.py:129-160
    * decode + pooled features; DIRAdapter.py:20-47 descriptor shape).
    */
  val i01ImageStats: GraftQuery = GraftQuery(
    "i01_image_stats",
    s"""WITH d AS (
       |  SELECT doc_id, 16 + doc_id % 13 AS w, 12 + doc_id % 11 AS h
       |  FROM documents WHERE doc_id % 10 = 0)
       |SELECT doc_id, w, h,
       |  ${sqlCell("doc_id", "0", "w // 2", "0", "h // 2")} AS c0,
       |  ${sqlCell("doc_id", "w // 2", "w", "0", "h // 2")} AS c1,
       |  ${sqlCell("doc_id", "0", "w // 2", "h // 2", "h")} AS c2,
       |  ${sqlCell("doc_id", "w // 2", "w", "h // 2", "h")} AS c3
       |FROM d ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val model = Multimodal.ImageIoVisionModel()
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("w", LongType), StructField("h", LongType),
      StructField("c0", LongType), StructField("c1", LongType),
      StructField("c2", LongType), StructField("c3", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 === 0)
      .select("doc_id")
      .mapPartitions { rows =>
        val m = model
        rows.map { r =>
          val id = r.getLong(0)
          val png = Multimodal.syntheticImage(id) // real PNG encode
          val (w, h, sums) = m.decodeStats(png, 2).get // real imageio decode
          Row(id, w.toLong, h.toLong, sums(0), sums(1), sums(2), sums(3))
        }
      }(enc)
      .orderBy("doc_id")
  }

  /** Per-channel pixel formulas of the synthetic image (Multimodal.syntheticImage). */
  private val chFormula = Map(
    "r" -> "(7*x + 11*y + 13*doc_id) % 256",
    "g" -> "(3*x + 5*y + 17*doc_id) % 256",
    "b" -> "(13*x + 7*y + 19*doc_id) % 256")

  /** Σ formula over x∈[x0,x1), y∈[y0,y1). */
  private def sqlChCell(ch: String, x0: String, x1: String, y0: String, y1: String): String =
    s"CAST(list_sum(flatten([[${chFormula(ch)} for x in range($x0, $x1)] for y in range($y0, $y1)])) AS BIGINT)"

  /** Post-pixelation whole-image channel sum: full − face box + Σ over the
    * 3×3 blocks of (truncated block mean) × block pixel count — the exact
    * arithmetic of `ImageIoVisionModel.anonymize` (anonymize_face.py:44-70).
    */
  private def sqlAnonSum(ch: String): String = {
    val full = sqlChCell(ch, "0", "w", "0", "h")
    val box = sqlChCell(ch, "sx", "sx + fw", "sy", "sy + fh")
    val blocks = for (bi <- 1 to 3; bj <- 1 to 3) yield {
      val (x0, x1) = (s"sx + xs${bj - 1}", s"sx + xs$bj")
      val (y0, y1) = (s"sy + ys${bi - 1}", s"sy + ys$bi")
      val n = s"((xs$bj - xs${bj - 1}) * (ys$bi - ys${bi - 1}))"
      s"((${sqlChCell(ch, x0, x1, y0, y1)} // $n) * $n)"
    }
    s"($full - $box + ${blocks.mkString(" + ")})"
  }

  /** I2 — face pixelation verified END-TO-END through the real codec
    * (ref: anonymize_face.py:18-69): the Spark side renders the PNG, runs
    * the full anonymize path (imageio decode → 3×3 truncated-block-mean
    * pixelation of the detected box → lossless PNG re-encode), decodes
    * the RESULT again and emits whole-image per-channel sums. The oracle
    * recomputes the same integers from the pixel formula + the pixelation
    * arithmetic alone — any deviation in decode, block boundaries,
    * truncation, or re-encode breaks the hash.
    */
  val i02Pixelation: GraftQuery = GraftQuery(
    "i02_pixelation",
    s"""WITH dims AS (
       |  SELECT doc_id, 16 + doc_id % 13 AS w, 12 + doc_id % 11 AS h
       |  FROM documents WHERE doc_id % 10 = 5),
       |d AS (
       |  SELECT doc_id, w, h, w // 4 AS sx, h // 4 AS sy,
       |         w // 2 AS fw, h // 2 AS fh
       |  FROM dims),
       |b AS (
       |  SELECT *, 0 AS xs0, fw // 3 AS xs1, (2 * fw) // 3 AS xs2, fw AS xs3,
       |            0 AS ys0, fh // 3 AS ys1, (2 * fh) // 3 AS ys2, fh AS ys3
       |  FROM d)
       |SELECT doc_id, w, h,
       |  ${sqlAnonSum("r")} AS r_sum,
       |  ${sqlAnonSum("g")} AS g_sum,
       |  ${sqlAnonSum("b")} AS b_sum
       |FROM b ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val model = Multimodal.ImageIoVisionModel()
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("w", LongType), StructField("h", LongType),
      StructField("r_sum", LongType), StructField("g_sum", LongType),
      StructField("b_sum", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 === 5)
      .select("doc_id")
      .mapPartitions { rows =>
        val m = model
        rows.map { r =>
          val id = r.getLong(0)
          val anon = m.anonymize(Multimodal.syntheticImage(id))
          val (w, h, rs, gs, bs) = m.channelSums(anon).get
          Row(id, w.toLong, h.toLong, rs, gs, bs)
        }
      }(enc)
      .orderBy("doc_id")
  }

  /** s(t) for the synthetic PCM signal (Multimodal.syntheticWav). */
  private def sqlSample(tE: String): String =
    s"((37*$tE + 11*doc_id) % 65536 - 32768)"

  private def sqlAbsCell(x0: String, x1: String): String =
    s"CAST(list_sum([abs(${sqlSample("t")}) for t in range($x0, $x1)]) AS BIGINT)"

  /** I3 — AUDIO decode round-trip statistics: the Spark side synthesizes
    * a deterministic 16-bit PCM WAV per doc ([[Multimodal.syntheticWav]]),
    * pushes it through a genuine `javax.sound.sampled` decode
    * ([[Multimodal.WavAudioModel]]), and emits framed energy / sign
    * statistics. The oracle recomputes the identical integers straight
    * from the sample formula — any encode/decode infidelity (endianness,
    * header, sample width) breaks the hash. Same scale shape as i01: one
    * narrow mapPartitions projection; at 100 TB the bytes come from
    * `binaryFile`/object-store columns instead of being synthesized.
    */
  val i03AudioStats: GraftQuery = GraftQuery(
    "i03_audio_stats",
    s"""WITH d AS (
       |  SELECT doc_id, 1000 + doc_id % 500 AS n, (1000 + doc_id % 500) // 4 AS q
       |  FROM documents WHERE doc_id % 10 = 3)
       |SELECT doc_id, n,
       |  ${sqlAbsCell("0", "n")} AS abs_sum,
       |  CAST(list_sum([CASE WHEN (${sqlSample("t")} >= 0) != (${sqlSample("(t-1)")} >= 0)
       |                      THEN 1 ELSE 0 END for t in range(1, n)]) AS BIGINT) AS zero_cross,
       |  ${sqlAbsCell("0", "q")} AS f0,
       |  ${sqlAbsCell("q", "2*q")} AS f1,
       |  ${sqlAbsCell("2*q", "3*q")} AS f2,
       |  ${sqlAbsCell("3*q", "n")} AS f3
       |FROM d ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val model = Multimodal.WavAudioModel()
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n", LongType),
      StructField("abs_sum", LongType), StructField("zero_cross", LongType),
      StructField("f0", LongType), StructField("f1", LongType),
      StructField("f2", LongType), StructField("f3", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 === 3)
      .select("doc_id")
      .mapPartitions { rows =>
        val m = model
        rows.map { r =>
          val id = r.getLong(0)
          val wav = Multimodal.syntheticWav(id) // real WAV encode
          val (n, absSum, zc, cells) = m.frameStats(wav).get // real javax.sound decode
          Row(id, n.toLong, absSum, zc, cells(0), cells(1), cells(2), cells(3))
        }
      }(enc)
      .orderBy("doc_id")
  }

  /** Gray sum of frame f of the synthetic video (Multimodal.syntheticVideo). */
  private def sqlFrameGray: String =
    "(7*x + 11*y + 13*doc_id + 23*frame_idx) % 256 + " +
      "(3*x + 5*y + 17*doc_id + 29*frame_idx) % 256 + " +
      "(13*x + 7*y + 19*doc_id + 31*frame_idx) % 256"

  /** I4 — VIDEO frame sampling + per-frame decode: the Spark side builds
    * a deterministic MJPEG-style container of real PNG frames per doc
    * ([[Multimodal.syntheticVideo]]), parses it back, decodes every 2nd
    * frame through the genuine `javax.imageio` codec
    * ([[Multimodal.VideoModel]]), and emits per-sampled-frame gray sums.
    * The oracle recomputes the identical integers from the frame pixel
    * formula — container framing, stride arithmetic, or codec
    * infidelity all break the hash. Scale shape: one narrow
    * mapPartitions flatMap (sample-then-decode, so stride divides the
    * decode budget); at 100 TB the container bytes come from
    * `binaryFile` columns.
    */
  val i04VideoFrames: GraftQuery = GraftQuery(
    "i04_video_frames",
    s"""WITH d AS (
       |  SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 4 AS h,
       |         3 + doc_id % 4 AS nf
       |  FROM documents WHERE doc_id % 10 = 7),
       |f AS (SELECT doc_id, w, h, unnest(range(0, nf, 2)) AS frame_idx FROM d)
       |SELECT doc_id, frame_idx, w, h,
       |  CAST(list_sum(flatten([[${sqlFrameGray}
       |    for x in range(w)] for y in range(h)])) AS BIGINT) AS gray_sum
       |FROM f ORDER BY doc_id, frame_idx""".stripMargin) { (spark, dir) =>
    val model = Multimodal.VideoModel()
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("frame_idx", LongType),
      StructField("w", LongType), StructField("h", LongType),
      StructField("gray_sum", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 === 7)
      .select("doc_id")
      .mapPartitions { rows =>
        val m = model
        rows.flatMap { r =>
          val id = r.getLong(0)
          val video = Multimodal.syntheticVideo(id) // real container + PNG encodes
          m.sampleFrames(video, stride = 2).get.map { case (f, w, h, sum) =>
            Row(id, f.toLong, w.toLong, h.toLong, sum)
          }
        }
      }(enc)
      .orderBy("doc_id", "frame_idx")
  }

  /** I5 — the scene-classifier HEAD under the oracle (U3's model math,
    * not just its decode): the Spark side renders the synthetic PNG, the
    * REAL codec decodes it, the model pools 4×4 grid features and
    * computes the 8 class logits; the gate emits every logit plus the
    * argmax category. The oracle recomputes the identical doubles from
    * the pixel formula — grid boundaries, pooled sums, the LCG weights,
    * and the fixed-order Σ w·f are all replayed in SQL. (Softmax
    * probabilities stay API-only: `exp` is not cross-engine
    * reproducible; the logits and argmax are.)
    */
  // --- shared 4×4-grid scene-logit replay fragments (the i05 oracle
  // math; the pl02 orchestrator gate replays the SAME head over its own
  // doc slice). `d` must provide (doc_id, w, h); cell c: bx = c%4,
  // by = c//4, linspace-truncated bounds; gray = r+g+b from the
  // synthetic pixel formula.
  private[queries] val sqlCellSum16: String =
    s"CAST(list_sum(flatten([[${sqlGray("doc_id")} " +
      "for x in range((c%4)*w//4, ((c%4)+1)*w//4)] " +
      "for y in range((c//4)*h//4, ((c//4)+1)*h//4)])) AS BIGINT)"
  private[queries] val sqlCellCnt16: String =
    "CAST(((((c%4)+1)*w//4) - ((c%4)*w//4)) * ((((c//4)+1)*h//4) - ((c//4)*h//4)) AS BIGINT)"
  private[queries] val sqlWkc: String =
    "(CAST((((k*7919 + c*104729) * 1103515245 + 12345) % 1024) - 512 AS DOUBLE) / 1024.0)"
  /** The cells→logits CTE chain over an upstream `d(doc_id, w, h, …)`,
    * carrying `extraCols` through to the `lg` relation. */
  private[queries] def sqlLogitsCtes(extraCols: String): String =
    s"""cells AS (
       |  SELECT doc_id, w, h$extraCols,
       |         [$sqlCellSum16 for c in range(16)] AS cs,
       |         [$sqlCellCnt16 for c in range(16)] AS cn
       |  FROM d),
       |lg AS (
       |  SELECT doc_id, w, h$extraCols,
       |         [list_sum([$sqlWkc * (CAST(cs[c+1] AS DOUBLE) / (CAST(cn[c+1] AS DOUBLE) * 768.0))
       |                    for c in range(16)]) * 8.0
       |          for k in range(8)] AS logits
       |  FROM cells)""".stripMargin

  val i05SceneLogits: GraftQuery = GraftQuery(
    "i05_scene_logits", {
      // cell c of the 4×4 grid: bx = c%4, by = c//4, linspace-truncated
      // bounds; gray = r+g+b from the synthetic pixel formula
      val cellSum = sqlCellSum16
      val cellCnt = sqlCellCnt16
      val wkc = sqlWkc
      s"""WITH d AS (
         |  SELECT doc_id, 16 + doc_id % 13 AS w, 12 + doc_id % 11 AS h
         |  FROM documents WHERE doc_id % 10 = 1),
         |cells AS (
         |  SELECT doc_id, w, h,
         |         [$cellSum for c in range(16)] AS cs,
         |         [$cellCnt for c in range(16)] AS cn
         |  FROM d),
         |lg AS (
         |  SELECT doc_id, w, h,
         |         [list_sum([$wkc * (CAST(cs[c+1] AS DOUBLE) / (CAST(cn[c+1] AS DOUBLE) * 768.0))
         |                    for c in range(16)]) * 8.0
         |          for k in range(8)] AS logits
         |  FROM cells)
         |SELECT doc_id, w, h,
         |       'scene_' || CAST(list_position(logits, list_max(logits)) - 1 AS VARCHAR)
         |         AS category,
         |       logits[1] AS l0, logits[2] AS l1, logits[3] AS l2, logits[4] AS l3,
         |       logits[5] AS l4, logits[6] AS l5, logits[7] AS l6, logits[8] AS l7
         |FROM lg ORDER BY doc_id""".stripMargin
    }) { (spark, dir) =>
    val model = Multimodal.ImageIoVisionModel()
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("w", LongType), StructField("h", LongType),
      StructField("category", StringType)) ++
      (0 until 8).map(k => StructField(s"l$k", DoubleType)))
    val enc = RowEncoder.encoderFor(outSchema)
    Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 === 1)
      .select("doc_id")
      .mapPartitions { rows =>
        val m = model
        rows.map { r =>
          val id = r.getLong(0)
          val png = Multimodal.syntheticImage(id) // real PNG encode
          val (w, h, logits) = m.sceneLogits(png).get // real decode + head
          val cat = s"scene_${logits.indexOf(logits.max)}"
          Row(Seq(id, w.toLong, h.toLong, cat) ++ logits: _*)
        }
      }(enc)
      .orderBy("doc_id")
  }

  /** I6 — the image-EMBEDDING operator under the oracle (U4's model
    * math; ref: DIRAdapter.py:20-47's fixed-dim descriptor): real
    * encode→decode, 4×4 grid-pooled mean-gray features, emitted as the
    * 16-dim descriptor. Each coordinate is integer-sum / integer-count
    * arithmetic rounded once to FLOAT (the descriptor's storage type)
    * and widened back — both engines reproduce the rounding exactly, so
    * the hash gates the whole feature pipeline.
    */
  val i06EmbedVector: GraftQuery = GraftQuery(
    "i06_embed_vector", {
      val cellSum =
        s"CAST(list_sum(flatten([[${sqlGray("doc_id")} " +
          "for x in range((c%4)*w//4, ((c%4)+1)*w//4)] " +
          "for y in range((c//4)*h//4, ((c//4)+1)*h//4)])) AS BIGINT)"
      val cellCnt =
        "CAST(((((c%4)+1)*w//4) - ((c%4)*w//4)) * ((((c//4)+1)*h//4) - ((c//4)*h//4)) AS BIGINT)"
      val dims = (0 until 16).map(c =>
        s"CAST(CAST(cs[${c + 1}] AS DOUBLE) / (CAST(cn[${c + 1}] AS DOUBLE) * 768.0) AS REAL)")
      s"""WITH d AS (
         |  SELECT doc_id, 16 + doc_id % 13 AS w, 12 + doc_id % 11 AS h
         |  FROM documents WHERE doc_id % 10 = 9),
         |cells AS (
         |  SELECT doc_id, w, h,
         |         [$cellSum for c in range(16)] AS cs,
         |         [$cellCnt for c in range(16)] AS cn
         |  FROM d)
         |SELECT doc_id, w, h,
         |${dims.zipWithIndex.map { case (e, c) => s"  CAST($e AS DOUBLE) AS e$c" }.mkString(",\n")}
         |FROM cells ORDER BY doc_id""".stripMargin
    }) { (spark, dir) =>
    val model = Multimodal.ImageIoVisionModel()
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("w", LongType), StructField("h", LongType)) ++
      (0 until 16).map(c => StructField(s"e$c", DoubleType)))
    val enc = RowEncoder.encoderFor(outSchema)
    Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 === 9)
      .select("doc_id")
      .mapPartitions { rows =>
        val m = model
        rows.map { r =>
          val id = r.getLong(0)
          val png = Multimodal.syntheticImage(id)
          val (w, h, _) = m.sceneLogits(png).get // reuse decode for dims
          val emb = m.embed(png).get // real decode + pooled descriptor
          Row(Seq(id, w.toLong, h.toLong) ++ emb.map(_.toDouble): _*)
        }
      }(enc)
      .orderBy("doc_id")
  }

  /** I07 — PERCEPTUAL-HASH dedup of RE-ENCODED images: every other image
    * in the slice is its predecessor's CONTENT re-encoded through a
    * different real codec (PNG vs BMP — `syntheticImageAs`), so the
    * bytes differ completely while the pixels match; byte-level dedup
    * (d01/x01 on a content hash of the file) cannot see these pairs.
    * Each image decodes through the REAL `javax.imageio` path and hashes
    * with dHash ([[Multimodal.ImageIoVisionModel.dhashHalves]]: 9×8
    * nearest-neighbor gray grid, horizontal-gradient bits, two 32-bit
    * halves); groups of ≥ 2 equal hashes are the duplicate sets. The
    * oracle replays the grid arithmetic from the pixel formula —
    * decode + NN-sample + bit-pack gated bit-for-bit.
    *
    * Scale shape: hash computation is a per-row map over binary content
    * (mapPartitions, model hoisted); grouping is one shuffle on the
    * 64-bit hash — exactly x01's exact-dedup shape with a decoded-
    * content key. Near-dup (Hamming ≤ t) extends via s01's banded
    * chunk join over the same halves.
    */
  val i07PhashDedup: GraftQuery = GraftQuery(
    "i07_phash_dedup", {
      // gray at (x, y) for content id `cid` — Σ of the three channel
      // formulas (each already in [0, 256))
      def g(xE: String, yE: String): String =
        s"(((7*($xE) + 11*($yE) + 13*cid) % 256) + ((3*($xE) + 5*($yE) + 17*cid) % 256)" +
          s" + ((13*($xE) + 7*($yE) + 19*cid) % 256))"
      def bit(iE: String, jE: String): String =
        s"CASE WHEN ${g(s"(($iE+1)*(w-1))//8", s"(($jE)*(h-1))//7")} > " +
          s"${g(s"(($iE)*(w-1))//8", s"(($jE)*(h-1))//7")} THEN 1 ELSE 0 END"
      s"""WITH d AS (
         |  SELECT doc_id,
         |         doc_id - CASE WHEN doc_id % 20 = 10 THEN 10 ELSE 0 END AS cid
         |  FROM documents WHERE doc_id % 10 = 0),
         |dd AS (SELECT doc_id, cid, 16 + cid % 13 AS w, 12 + cid % 11 AS h FROM d),
         |hx AS (
         |  SELECT doc_id,
         |    CAST(list_sum(flatten([[
         |      ${bit("i", "j + 4")} * (CAST(1 AS BIGINT) << (j*8 + i))
         |      for i in range(0, 8)] for j in range(0, 4)])) AS BIGINT) AS phash_hi,
         |    CAST(list_sum(flatten([[
         |      ${bit("i", "j")} * (CAST(1 AS BIGINT) << (j*8 + i))
         |      for i in range(0, 8)] for j in range(0, 4)])) AS BIGINT) AS phash_lo
         |  FROM dd)
         |SELECT phash_hi, phash_lo, COUNT(*) AS n,
         |       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
         |FROM hx GROUP BY phash_hi, phash_lo HAVING COUNT(*) >= 2
         |ORDER BY phash_hi, phash_lo""".stripMargin
    }) { (spark, dir) =>
    val model = Multimodal.ImageIoVisionModel()
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("phash_hi", LongType), StructField("phash_lo", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 === 0)
      .select("doc_id")
      .mapPartitions { rows =>
        val m = model
        rows.map { r =>
          val id = r.getLong(0)
          val cid = if (id % 20 == 10) id - 10 else id
          val fmt = if (id % 20 == 0) "png" else "bmp"
          val bytes = Multimodal.syntheticImageAs(cid, fmt) // real encode
          val (hi, lo) = m.dhashHalves(bytes).get // real two-codec decode
          Row(id, hi, lo)
        }
      }(enc)
      .groupBy("phash_hi", "phash_lo")
      .agg(count(lit(1)).as("n"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .filter(col("n") >= 2)
      .orderBy("phash_hi", "phash_lo")
  }

  /** I09 — AUDIO content-fingerprint dedup across REAL containers: every
    * other clip in the slice is its predecessor's PCM CONTENT re-encoded
    * through a different genuine `javax.sound` container (WAVE
    * little-endian vs AIFF big-endian — `syntheticWavAs`), so the bytes
    * differ completely while the decoded samples match; byte-level dedup
    * (x01 on a content hash of the file) cannot see these pairs. Each
    * clip decodes through the container-agnostic PCM path
    * ([[Multimodal.WavAudioModel.decodeSamples]]) and fingerprints as
    * its exact quarter-frame band energies; groups of ≥ 2 equal
    * fingerprints are the duplicate sets — i07's story for audio. The
    * oracle replays the band energies from the sample formula, so both
    * codec paths (WAV write/read AND AIFF write/read) are hash-gated.
    *
    * Scale shape: fingerprinting is a per-row map over binary content
    * (mapPartitions, model hoisted); grouping is one shuffle on the
    * fingerprint — x01's exact-dedup shape with a decoded-content key.
    * Near-dup (close energies) extends via banding like s01.
    */
  val i09AudioFpDedup: GraftQuery = GraftQuery(
    "i09_audio_fp_dedup", {
      def s(tE: String): String = s"((37*$tE + 11*cid) % 65536 - 32768)"
      def cell(x0: String, x1: String): String =
        s"CAST(list_sum([abs(${s("t")}) for t in range($x0, $x1)]) AS BIGINT)"
      s"""WITH d AS (
         |  SELECT doc_id,
         |         doc_id - CASE WHEN doc_id % 20 = 17 THEN 10 ELSE 0 END AS cid
         |  FROM documents WHERE doc_id % 10 = 7),
         |dd AS (SELECT doc_id, cid, 1000 + cid % 500 AS n,
         |              (1000 + cid % 500) // 4 AS q FROM d),
         |fp AS (
         |  SELECT doc_id,
         |         ${cell("0", "q")} AS f0, ${cell("q", "2*q")} AS f1,
         |         ${cell("2*q", "3*q")} AS f2, ${cell("3*q", "n")} AS f3
         |  FROM dd)
         |SELECT f0, f1, f2, f3, COUNT(*) AS n_dups,
         |       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
         |FROM fp GROUP BY f0, f1, f2, f3 HAVING COUNT(*) >= 2
         |ORDER BY f0, f1, f2, f3""".stripMargin
    }) { (spark, dir) =>
    val model = Multimodal.WavAudioModel()
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("f0", LongType), StructField("f1", LongType),
      StructField("f2", LongType), StructField("f3", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 === 7)
      .select("doc_id")
      .mapPartitions { rows =>
        val m = model
        rows.map { r =>
          val id = r.getLong(0)
          val cid = if (id % 20 == 17) id - 10 else id
          val aiff = id % 20 == 17
          val bytes = Multimodal.syntheticWavAs(cid, aiff) // real encode
          val (_, _, _, cells) = m.frameStats(bytes).get // real decode
          Row(id, cells(0), cells(1), cells(2), cells(3))
        }
      }(enc)
      .groupBy("f0", "f1", "f2", "f3")
      .agg(count(lit(1)).as("n_dups"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .filter(col("n_dups") >= 2)
      .orderBy("f0", "f1", "f2", "f3")
  }

  /** Σ over the RESIZED image of a channel formula evaluated at the NN
    * source coordinates (⌊x·w/ow⌋, ⌊y·h/oh⌋).
    */
  private def sqlResizedSum(a: Int, b: Int, c: Int): String =
    s"CAST(list_sum(flatten([[($a*((x*w)//ow) + $b*((y*h)//oh) + $c*doc_id) % 256 " +
      "for x in range(ow)] for y in range(oh)])) AS BIGINT)"

  /** I8 — nearest-neighbor RESIZE verified END-TO-END through real
    * codecs (the mandate's explicit resize op; ref analog: the
    * torchvision Resize/CenterCrop preprocessing, ImageLabeler.py:
    * 104-105): the Spark side renders the PNG, decodes it, NN-resizes
    * to a per-doc (ow, oh), re-encodes through the REAL BMP writer,
    * decodes the RESULT again and emits its per-channel sums plus both
    * geometries. The oracle recomputes the identical integers from the
    * source pixel formula sampled at the NN coordinates — any deviation
    * in the sampling arithmetic, either codec pass, or the output
    * geometry breaks the hash. Same scale shape as i01: one narrow
    * mapPartitions projection, embarrassingly parallel.
    */
  val i08ResizeNN: GraftQuery = GraftQuery(
    "i08_resize_nn",
    s"""WITH d AS (
       |  SELECT doc_id, 16 + doc_id % 13 AS w, 12 + doc_id % 11 AS h,
       |         8 + doc_id % 7 AS ow, 6 + doc_id % 5 AS oh
       |  FROM documents WHERE doc_id % 10 = 3)
       |SELECT doc_id, w, h, ow, oh,
       |  ${sqlResizedSum(7, 11, 13)} AS r_sum,
       |  ${sqlResizedSum(3, 5, 17)} AS g_sum,
       |  ${sqlResizedSum(13, 7, 19)} AS b_sum
       |FROM d ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val model = Multimodal.ImageIoVisionModel()
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("w", LongType), StructField("h", LongType),
      StructField("ow", LongType), StructField("oh", LongType),
      StructField("r_sum", LongType), StructField("g_sum", LongType),
      StructField("b_sum", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 === 3)
      .select("doc_id")
      .mapPartitions { rows =>
        val m = model
        rows.map { r =>
          val id = r.getLong(0)
          val resized = m.resizeNN(Multimodal.syntheticImage(id),
            (8 + id % 7).toInt, (6 + id % 5).toInt).get
          val (ow, oh, rs, gs, bs) = m.channelSums(resized).get
          Row(id, 16 + id % 13, 12 + id % 11, ow.toLong, oh.toLong, rs, gs, bs)
        }
      }(enc)
      .orderBy("doc_id")
  }

  /** I10 — IMAGE METADATA STRIP (the EXIF/XMP scrub, privacy's
    * container-level half — i02/U5 scrubs PIXELS, i10 scrubs what the
    * camera wrote AROUND them: GPS, serials, author tags; every
    * training-data image pipeline runs this before anything else
    * touches the bytes). The Spark side renders the PNG, INJECTS a
    * real `tEXt` chunk (standing in for camera metadata — javax's
    * encoder writes none), strips every ancillary chunk with the pure
    * byte-level walk ([[Multimodal.stripPngMetadata]] — no decode, no
    * re-encode), then decodes the RESULT and emits whole-image channel
    * sums. The oracle recomputes the sums from the pixel formula, so
    * the gate pins "pixels survive the scrub" — and the strip itself
    * is asserted in-flight (the injected chunk must be gone) plus
    * chunk-level in MultimodalSpec.
    *
    * Scale shape: i01's profile — one narrow mapPartitions projection,
    * no shuffle before the tiny ordered output; the strip is O(bytes)
    * with zero codec work, so at 100 TB it runs at I/O speed on the
    * binary column (decode here exists only to PROVE pixel survival).
    */
  val i10MetadataStrip: GraftQuery = GraftQuery(
    "i10_metadata_strip",
    s"""WITH d AS (
       |  SELECT doc_id, 16 + doc_id % 13 AS w, 12 + doc_id % 11 AS h
       |  FROM documents WHERE doc_id % 10 = 7)
       |SELECT doc_id, w, h,
       |  ${sqlChCell("r", "0", "w", "0", "h")} AS r_sum,
       |  ${sqlChCell("g", "0", "w", "0", "h")} AS g_sum,
       |  ${sqlChCell("b", "0", "w", "0", "h")} AS b_sum
       |FROM d ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val model = Multimodal.ImageIoVisionModel()
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("w", LongType), StructField("h", LongType),
      StructField("r_sum", LongType), StructField("g_sum", LongType),
      StructField("b_sum", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 === 7)
      .select("doc_id")
      .mapPartitions { rows =>
        val m = model
        rows.map { r =>
          val id = r.getLong(0)
          val tagged = Multimodal.pngWithText(
            Multimodal.syntheticImage(id), "Comment", s"secret-$id")
          val stripped = Multimodal.stripPngMetadata(tagged)
          // the oracle sees pixels only; fail loudly here if the scrub
          // didn't actually remove the injected metadata
          require(!Multimodal.pngChunkTypes(stripped).contains("tEXt"),
            s"metadata survived the strip for doc $id")
          val (w, h, rs, gs, bs) = m.channelSums(stripped).get
          Row(id, w.toLong, h.toLong, rs, gs, bs)
        }
      }(enc)
      .orderBy("doc_id")
  }

  /** I11 — AUDIO VAD SEGMENTATION ([[Multimodal.WavAudioModel.vadStats]]):
    * energy-threshold voice-activity detection over 20 ms frames — the
    * front-end cut every speech-corpus pipeline runs before a learned
    * model (keep voiced spans, drop silence/noise). Per file: frame
    * count, active frames, SEGMENT count (maximal active runs — the
    * run-length structure, not just the active total) and the longest
    * run. Spark decodes a REAL `javax.sound` WAV; the oracle recomputes
    * the identical integers from the sample formula through SQL
    * run-length windows (islands by `fi − row_number`), so framing,
    * threshold placement, and the run-length fold are all hash-pinned.
    *
    * Scale shape: one narrow mapPartitions projection (i03's profile —
    * the run-length fold is per-row sequential over that file's frames,
    * never a cross-row window); at 100 TB the bytes come from
    * `binaryFile` columns.
    */
  val i11AudioVad: GraftQuery = GraftQuery(
    "i11_audio_vad",
    s"""WITH d AS (
       |  SELECT doc_id, 1000 + doc_id % 500 AS n FROM documents WHERE doc_id % 10 = 4),
       |f AS (SELECT doc_id, n, unnest(range(0, n // 160)) AS fi FROM d),
       |act AS (
       |  SELECT doc_id, n, fi,
       |         CASE WHEN CAST(list_sum([abs((37*(fi*160+j) + 11*doc_id) % 65536 - 32768)
       |                                  for j in range(0, 160)]) AS BIGINT)
       |                   > ${160L * 16384L} THEN 1 ELSE 0 END AS a
       |  FROM f),
       |isl AS (
       |  SELECT doc_id, fi, a,
       |         fi - row_number() OVER (PARTITION BY doc_id, a ORDER BY fi) AS island
       |  FROM act),
       |runs AS (SELECT doc_id, island, COUNT(*) AS len
       |         FROM isl WHERE a = 1 GROUP BY doc_id, island),
       |per_doc AS (
       |  SELECT doc_id, CAST(MAX(n) // 160 AS BIGINT) AS n_frames,
       |         CAST(SUM(a) AS BIGINT) AS n_active
       |  FROM act GROUP BY doc_id)
       |SELECT p.doc_id, n_frames, n_active,
       |       CAST(COALESCE(r.n_segs, 0) AS BIGINT) AS n_segments,
       |       CAST(COALESCE(r.longest, 0) AS BIGINT) AS longest_run
       |FROM per_doc p LEFT JOIN
       |  (SELECT doc_id, COUNT(*) AS n_segs, MAX(len) AS longest
       |   FROM runs GROUP BY doc_id) r ON p.doc_id = r.doc_id
       |ORDER BY p.doc_id""".stripMargin) { (spark, dir) =>
    val model = Multimodal.WavAudioModel()
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_frames", LongType),
      StructField("n_active", LongType), StructField("n_segments", LongType),
      StructField("longest_run", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 === 4)
      .select("doc_id")
      .mapPartitions { rows =>
        val m = model
        rows.map { r =>
          val id = r.getLong(0)
          val (nf, act, segs, longest) =
            m.vadStats(Multimodal.syntheticWav(id)).get
          Row(id, nf, act, segs, longest)
        }
      }(enc)
      .orderBy("doc_id")
  }

  val all: Seq[GraftQuery] = Seq(i01ImageStats, i02Pixelation, i03AudioStats,
    i04VideoFrames, i05SceneLogits, i06EmbedVector, i07PhashDedup,
    i08ResizeNN, i09AudioFpDedup, i10MetadataStrip, i11AudioVad)
}
