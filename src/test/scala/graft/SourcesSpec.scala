package graft

import graft.sources.ScrapeChunks
import java.sql.Date

/** Time-chunked ingestion planning semantics (CTConfig.py:5-32). */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("dateChunks tiles [start, end] with a short final chunk") {
    val chunks = ScrapeChunks.dateChunks(spark, "2021-01-01", "2021-01-25", 10)
      .as[(Int, Date, Date)].collect().toSeq
    assert(chunks.map(_._1) == Seq(0, 1, 2))
    assert(chunks.head._2.toString == "2021-01-01" && chunks.head._3.toString == "2021-01-11")
    assert(chunks.last._2.toString == "2021-01-21" && chunks.last._3.toString == "2021-01-25")
    // tiling: each chunk starts where the previous ended
    chunks.sliding(2).foreach { case Seq(a, b) => assert(a._3 == b._2); case _ => }
  }

  test("remaining resumes at the persisted chunk cursor") {
    val chunks = ScrapeChunks.dateChunks(spark, "2021-01-01", "2021-03-01", 7)
    val rem = ScrapeChunks.remaining(chunks, currentChunk = 3)
    assert(rem.count() == chunks.count() - 3)
    assert(rem.select("chunk_id").as[Int].collect().min == 3)
  }
}
