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

  val all: Seq[GraftQuery] = Seq(i01ImageStats)
}
