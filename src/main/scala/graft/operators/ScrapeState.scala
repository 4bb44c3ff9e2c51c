package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-item scrape/retry state (ref: InstagramImageScraper.py:62-191,
  * InstagramPostScraper.py:183-239): a state table
  * `(item_id, url, scraped, attempts)` driven to completion by a
  * round-robin retry loop.
  *
  * The reference loops row-by-row in Python; here each round is one
  * distributed job over the undone set (anti-join semantics, P14/P15)
  * and the state update is a pure, idempotent frame transform — re-
  * running a round after a crash converges to the same state, the batch
  * analog of a streaming checkpoint.
  */
object ScrapeState {

  /** P15 — done predicate: succeeded or out of attempts. */
  def done(maxAttempts: Int) =
    col("scraped") === 1 || col("attempts") >= maxAttempts

  /** P14 — items still to try this round. */
  def undone(state: DataFrame, maxAttempts: Int): DataFrame =
    state.filter(!done(maxAttempts))

  /** Merge one round's outcomes `(item_id, success)` into the state:
    * attempted items bump `attempts` and set `scraped`; others pass
    * through unchanged. Left join ⇒ idempotent for items absent from
    * `results`.
    */
  def update(state: DataFrame, results: DataFrame): DataFrame =
    state.join(results.select(col("item_id"), col("success")), Seq("item_id"), "left_outer")
      .select(
        col("item_id"), col("url"),
        when(col("success").isNotNull && col("success"), 1)
          .otherwise(col("scraped")).as("scraped"),
        when(col("success").isNotNull, col("attempts") + 1)
          .otherwise(col("attempts")).as("attempts"))

  /** A10 — the scrape-status table (ref: InstagramImageScraper.py:162-191). */
  def statusSummary(state: DataFrame, maxAttempts: Int): DataFrame =
    state.agg(
      count(lit(1)).as("n_total"),
      sum(when(done(maxAttempts), 1L).otherwise(0L)).as("n_done"),
      sum(when(col("scraped") === 1, 1L).otherwise(0L)).as("n_scraped"),
      sum(when(col("scraped") =!= 1 && col("attempts") >= maxAttempts, 1L).otherwise(0L))
        .as("n_failed"))

  /** The retry loop (ref: InstagramImageScraper.py:97-139): attempt every
    * undone item per round via `fetch` (a distributed job producing
    * `(item_id, success)`), update state, repeat until all done or
    * `maxRounds`. Returns the final state.
    */
  def runLoop(state0: DataFrame, fetch: DataFrame => DataFrame,
              maxAttempts: Int, maxRounds: Int = 100): DataFrame = {
    var state = state0
    var round = 0
    while (round < maxRounds && !undone(state, maxAttempts).isEmpty) {
      val results = fetch(undone(state, maxAttempts))
      // localCheckpoint truncates the growing lineage across rounds —
      // without it each round's plan re-executes every prior round
      state = update(state, results).localCheckpoint()
      round += 1
    }
    state
  }
}
