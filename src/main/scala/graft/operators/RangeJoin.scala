package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join. Spark has no native interval join — a
  * naive `ts >= start AND ts < end` predicate plans as
  * BroadcastNestedLoopJoin (or a cartesian product when neither side is
  * broadcastable): O(|points|·|intervals|) comparisons, the classic range
  * join scale killer.
  *
  * The bucketed formulation turns it into an equi-join: pick a bucket
  * granularity g, map every point to the single bucket floor(t/g), expand
  * every interval to the buckets it covers (⌈len/g⌉ rows — only the SMALL
  * interval side is replicated, never the fact side), equi-join on the
  * bucket id, and apply the exact containment predicate as a post-join
  * filter. Each qualifying (point, interval) pair surfaces exactly once
  * because the point owns exactly one bucket — no distinct needed.
  *
  * At 100 TB: the fact side shuffles once on the bucket key (or not at
  * all when the expanded interval side fits a broadcast, the common case
  * — campaign/maintenance/session windows number thousands, not
  * billions); AQE handles bucket skew. Pick g close to the typical
  * interval length: replication factor is len/g while bucket selectivity
  * (rows sharing a bucket that fail the exact filter) grows with g.
  */
object RangeJoin {

  /** Inner-join `points` (timestamp column `pointCol`) to `intervals`
    * (timestamp columns `startCol`, `endCol`, half-open [start, end)) on
    * containment, via a `bucketUs`-grained equi-join. Column name clashes
    * between the two frames (other than the role columns) must be
    * resolved by the caller.
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    val p = points.withColumn("__bucket",
      floor(unix_micros(col(pointCol)) / bucketUs))
    val iv = intervals
      .filter(col(endCol) > col(startCol)) // empty intervals match nothing
      .withColumn("__bucket", explode(sequence(
        floor(unix_micros(col(startCol)) / bucketUs),
        floor((unix_micros(col(endCol)) - 1) / bucketUs))))
    p.join(iv, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }

  /** Interval-OVERLAP join: both sides are half-open intervals, a pair
    * qualifies iff `aStart < bEnd && bStart < aEnd`. Both sides explode
    * into their covered buckets and equi-join on the bucket id; a
    * qualifying pair shares every bucket of its overlap span, so the
    * duplicate hits are removed WITHOUT a distinct() by keeping only the
    * FIRST overlapping bucket — `max(floor(aStart/g), floor(bStart/g))`,
    * computable from the pair itself (the simHashPairs first-matching-
    * chunk trick). One equi-join shuffle, no distinct shuffle, never a
    * nested loop.
    */
  def intervalOverlapJoin(a: DataFrame, aStart: String, aEnd: String,
                          b: DataFrame, bStart: String, bEnd: String,
                          bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    def buckets(df: DataFrame, s: String, e: String) = df
      .filter(col(e) > col(s))
      .withColumn("__bucket", explode(sequence(
        floor(unix_micros(col(s)) / bucketUs),
        floor((unix_micros(col(e)) - 1) / bucketUs))))
    val firstShared = greatest(
      floor(unix_micros(col(aStart)) / bucketUs),
      floor(unix_micros(col(bStart)) / bucketUs))
    buckets(a, aStart, aEnd).join(buckets(b, bStart, bEnd), Seq("__bucket"))
      .filter(col(aStart) < col(bEnd) && col(bStart) < col(aEnd) &&
        col("__bucket") === firstShared)
      .drop("__bucket")
  }
}
