package graft.operators

import graft.plans.BloomExprs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-pruned semi join — the explicit form of runtime row-level
  * filtering for selective joins: build a bloom filter over the SMALL
  * side's join keys on the driver, probe it on the big side as a
  * codegen'd scan-adjacent filter ([[graft.plans.BloomMightContainExpr]]),
  * and run the exact semi join over the survivors.
  *
  * Why this matters at 100 TB: a plain semi join shuffles (or at best
  * hashes against a broadcast) EVERY big-side row; when the small side
  * matches 1% of keys, the bloom drops ~99% of rows right after the
  * scan, before any exchange — the join then moves 1% of the data. The
  * filter's false positives (fpp, default 1%) only make the pre-prune
  * slightly less effective; the exact join downstream guarantees the
  * result is identical to the un-pruned join, which is exactly what the
  * oracle gate checks.
  */
object BloomPrune {

  /** Exact left-semi join of `big` to `small`, bloom-pre-pruned on the
    * big side. Key columns must be integral (LongType/IntegerType).
    */
  def bloomSemiJoin(big: DataFrame, bigKey: String,
                    small: DataFrame, smallKey: String,
                    fpp: Double = 0.01, expectedItems: Long = -1L): DataFrame = {
    val pruned = bloomPrune(big, bigKey, small, smallKey, fpp, expectedItems)
    pruned.join(small.select(col(smallKey).as(bigKey)).distinct(),
      Seq(bigKey), "left_semi")
  }

  /** Just the pre-prune: `big` rows whose key might be in `small`'s key
    * set (no false negatives; ~fpp false positives stay for the exact
    * join to drop).
    *
    * Sizing: pass `expectedItems` (distinct-key estimate) when known —
    * then the small side is scanned exactly once (the bloom aggregation).
    * Otherwise a plain `count()` upper-bounds the distinct count with a
    * map-side-only job — an exact `distinct().count()` would cost a
    * shuffle per call for at best a marginally smaller filter, and
    * oversizing a bloom only LOWERS its false-positive rate.
    */
  def bloomPrune(big: DataFrame, bigKey: String,
                 small: DataFrame, smallKey: String,
                 fpp: Double = 0.01, expectedItems: Long = -1L): DataFrame = {
    val n = if (expectedItems > 0L) expectedItems
            else math.max(1L, small.count())
    val bf = small.stat.bloomFilter(smallKey, n, fpp)
    big.filter(BloomExprs.mightContain(col(bigKey), bf))
  }
}
