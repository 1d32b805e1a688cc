package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-state exact top-k aggregator — the custom-aggregate extension
  * surface (SURVEY.md §2.12: `Aggregator[IN, BUF, OUT]`).
  *
  * Why not `slice(sort_array(collect_list(struct(...))))`: collect_list
  * materializes EVERY group element in the aggregation buffer — O(group
  * size) state that spills or OOMs on hot groups at scale. This buffer
  * never holds more than k elements on either the partial (map) or merge
  * (reduce) side, so a billion-row group costs the same state as a
  * hundred-row group.
  *
  * Determinism: ordering is (value DESC, key ASC) with a unique key, so
  * the result is a unique list — oracle-able (DuckDB
  * `(array_agg(key ORDER BY value DESC, key))[1:k]`).
  */
class TopKKeys(k: Int) extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[Long]] {

  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (v, key) => (-v, key) }

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    (buf :+ in).sorted(ord).take(k)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[(Double, Long)]): Seq[Long] =
    buf.map(_._2)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
