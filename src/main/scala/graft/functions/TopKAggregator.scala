package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (value, id) candidate entering the top-k fold. */
case class TopKItem(value: Double, id: Long)

/** Aggregation buffer/result: at most k items, sorted (value desc, id asc). */
case class TopKBuf(items: Seq[TopKItem])

/** Typed `Aggregator` UDAF keeping the top-k (value, id) pairs per group —
  * the partial-aggregation alternative to a `row_number()` window for
  * top-n-per-key: each partition folds its rows into an O(k) buffer
  * (map-side combine), partials merge associatively, and only k-row
  * buffers ever cross the shuffle. At 100 TB that is the difference
  * between exchanging every event and exchanging |groups|·k rows — the
  * window formulation (window_topn) must at minimum shuffle every
  * surviving row to its group's sort.
  *
  * Determinism: total order is (value desc, id asc) — the unique id
  * breaks value ties, so the kept set and its order are unique. Exposed
  * through `functions.udaf` (Column API) and `spark.udf.register` (SQL)
  * — the UDAF leg of the reference's "register your own function"
  * contract (/root/reference/src/mr/function.rs:1), beside the codegen
  * scalar expressions in GraftFunctions.
  */
class TopKAggregator(k: Int) extends Aggregator[TopKItem, TopKBuf, TopKBuf] {
  require(k > 0, s"k must be positive, got $k")

  private def trim(items: Seq[TopKItem]): Seq[TopKItem] =
    items.sortBy(x => (-x.value, x.id)).take(k)

  override def zero: TopKBuf = TopKBuf(Nil)

  override def reduce(b: TopKBuf, a: TopKItem): TopKBuf =
    // avoid re-sorting when the candidate can't displace a full buffer
    if (b.items.size >= k && {
      val last = b.items.last
      a.value < last.value || (a.value == last.value && a.id > last.id)
    }) b
    else TopKBuf(trim(b.items :+ a))

  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf =
    TopKBuf(trim(b1.items ++ b2.items))

  override def finish(r: TopKBuf): TopKBuf = r

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}
