package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate: cosine + neighbor id. */
final case class ScoredNeighbor(cos: Double, vec_id: Long)

/** Bounded top-k aggregate (cos desc, vec_id asc) as a typed Aggregator —
  * the scale shape for brute-force ANN: each partition keeps a k-element
  * buffer (map-side partial aggregation), the shuffle carries k rows per
  * (group, partition) instead of every candidate, and the merge is
  * order-independent because the trim comparator is a total order. This
  * replaces the row_number window in v1, whose shuffle carried ALL
  * candidates per query.
  */
final class TopKByCos(k: Int)
    extends Aggregator[ScoredNeighbor, Seq[ScoredNeighbor], Seq[ScoredNeighbor]] {

  private def trim(xs: Seq[ScoredNeighbor]): Seq[ScoredNeighbor] =
    xs.sortBy(x => (-x.cos, x.vec_id)).take(k)

  override def zero: Seq[ScoredNeighbor] = Nil
  /** Amortized O(1) per row: append until the buffer reaches 2k, then
    * compact to k — each compaction pays for the k appends before it.
    * Intermediate buffers are supersets of the final top-k, so the result
    * is independent of arrival order. */
  override def reduce(b: Seq[ScoredNeighbor], a: ScoredNeighbor): Seq[ScoredNeighbor] = {
    val appended = b :+ a
    if (appended.sizeIs > 2 * k) trim(appended) else appended
  }
  override def merge(b1: Seq[ScoredNeighbor], b2: Seq[ScoredNeighbor]): Seq[ScoredNeighbor] =
    trim(b1 ++ b2)
  override def finish(b: Seq[ScoredNeighbor]): Seq[ScoredNeighbor] = trim(b)

  override def bufferEncoder: Encoder[Seq[ScoredNeighbor]] =
    ExpressionEncoder[Seq[ScoredNeighbor]]()
  override def outputEncoder: Encoder[Seq[ScoredNeighbor]] =
    ExpressionEncoder[Seq[ScoredNeighbor]]()
}

object TopK {
  /** udaf column function: call as `topK10($"cos", $"vec_id")`. */
  lazy val topK10 = org.apache.spark.sql.functions.udaf(new TopKByCos(10))
  /** v5's kNN-graph fan-in: top-3 neighbors per source vector. */
  lazy val topK3 = org.apache.spark.sql.functions.udaf(new TopKByCos(3))
}
