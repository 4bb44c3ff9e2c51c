package graft

import graft.operators.ScrapeState
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retry-loop semantics vs the reference (InstagramImageScraper.py):
  * round-robin until done, attempt caps, idempotent updates.
  */
class ScrapeStateSpec extends SparkSpec {
  import spark.implicits._

  private def initial: DataFrame =
    (1L to 10L).map(i => (s"item_$i", s"url_$i", 0, 0))
      .toDF("item_id", "url", "scraped", "attempts")

  // deterministic flaky fetcher: item_k succeeds on attempt ((k-1) % 4)+1
  // (so item_4/8 need 4 attempts; with maxAttempts=3 they fail forever)
  private def flakyFetch(undone: DataFrame): DataFrame =
    undone.select(col("item_id"),
      (col("attempts") + 1 >=
        pmod(substring(col("item_id"), 6, 3).cast("int") - 1, lit(4)) + 1).as("success"))

  test("runLoop drives every item to done; attempt caps mark failures") {
    val maxAttempts = 3
    val fin = ScrapeState.runLoop(initial, flakyFetch, maxAttempts).cache()
    assert(ScrapeState.undone(fin, maxAttempts).isEmpty)
    val summary = ScrapeState.statusSummary(fin, maxAttempts)
      .as[(Long, Long, Long, Long)].head()
    // items ≡ 0 mod 4 (item_4, item_8) need a 4th attempt that never comes
    assert(summary == ((10L, 10L, 8L, 2L)))
    val failed = fin.filter($"scraped" =!= 1).select("item_id").as[String].collect().toSet
    assert(failed == Set("item_4", "item_8"))
    // attempts never exceed the cap
    assert(fin.filter($"attempts" > maxAttempts).isEmpty)
  }

  test("update is idempotent for items absent from a round's results") {
    val round = ScrapeState.update(initial, Seq(("item_1", true)).toDF("item_id", "success"))
    val untouched = round.filter($"item_id" =!= "item_1")
    assert(untouched.filter($"attempts" =!= 0 || $"scraped" =!= 0).isEmpty)
    assert(round.filter($"item_id" === "item_1").head().getAs[Int]("scraped") == 1)
  }
}
