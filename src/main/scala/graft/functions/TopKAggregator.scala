package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Exact per-group top-k as a typed `Aggregator` (the SURVEY §4
  * "TypedImperativeAggregate/Aggregator" extension tier): a bounded
  * buffer per group instead of the window-function alternative's full
  * per-group sort.
  *
  * Scale property: the buffer is ≤ k entries at all times, merges are
  * k-bounded, and the aggregation is map-side combinable — on a 1000-
  * executor cluster each partition reduces to k rows before the shuffle,
  * where `row_number().over(partitionBy(...))` must shuffle every row.
  *
  * Ordering is total — (score desc, id asc) — so results are
  * deterministic and oracle-checkable.
  */
final case class ScoredId(score: Double, id: Long)

class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, mutable.ArrayBuffer[ScoredId], Seq[ScoredId]] {

  private def lt(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def trim(buf: mutable.ArrayBuffer[ScoredId]): mutable.ArrayBuffer[ScoredId] = {
    val sorted = buf.sortWith(lt)
    if (sorted.length > k) sorted.take(k) else sorted
  }

  override def zero: mutable.ArrayBuffer[ScoredId] = mutable.ArrayBuffer.empty

  override def reduce(buf: mutable.ArrayBuffer[ScoredId], in: ScoredId): mutable.ArrayBuffer[ScoredId] = {
    buf += in
    if (buf.length > 2 * k) trim(buf) else buf // amortize the sort
  }

  override def merge(a: mutable.ArrayBuffer[ScoredId], b: mutable.ArrayBuffer[ScoredId]): mutable.ArrayBuffer[ScoredId] =
    trim(a ++= b)

  override def finish(buf: mutable.ArrayBuffer[ScoredId]): Seq[ScoredId] =
    trim(buf).toSeq

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[ScoredId]] =
    Encoders.kryo[mutable.ArrayBuffer[ScoredId]]
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}
