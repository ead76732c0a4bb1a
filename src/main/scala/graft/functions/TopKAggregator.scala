package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator (SURVEY.md §2.8 UDAF surface / §7.2
  * escalation path): keeps the k largest (score, id) pairs per group
  * with a bounded buffer — the partial-aggregate shape that matters at
  * scale: each map-side partial carries AT MOST k rows per group into
  * the shuffle, versus a window function's full sort of every row in
  * the partition.
  *
  * Ordering is total and deterministic: score descending, id ascending
  * as the tiebreaker (same contract as the window `row_number`
  * formulation the oracle uses).
  */
class TopKAggregator[IN](k: Int, extract: IN => (Long, Double))
    extends Aggregator[IN, Seq[(Long, Double)], Seq[(Long, Double)]] {

  private def ord: Ordering[(Long, Double)] =
    Ordering.by[(Long, Double), (Double, Long)] { case (id, score) => (-score, id) }

  private def trim(buf: Seq[(Long, Double)]): Seq[(Long, Double)] =
    buf.sorted(ord).take(k)

  override def zero: Seq[(Long, Double)] = Seq.empty

  override def reduce(buf: Seq[(Long, Double)], in: IN): Seq[(Long, Double)] =
    trim(buf :+ extract(in))

  override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Long, Double)]): Seq[(Long, Double)] = trim(buf)

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
}
