package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed per-group exact top-k aggregator (SURVEY.md §7.4's candidate):
  * keeps a bounded k-element buffer per group, so a group's top-k costs
  * O(n·log k) memory-bounded work with full map-side partial aggregation —
  * no per-group sort, no window shuffle amplification. Ties break on the
  * smaller id (deterministic).
  *
  * Use via `ds.groupByKey(...).agg(new TopKByValue(k).toColumn)`.
  */
class TopKByValue(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0)

  private def order(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Vector.empty

  // The buffer is always sorted (reduce inserts in place, merge re-sorts),
  // so an accepted row costs one O(log k) binary search plus the O(k)
  // Vector splice — not the O(k log k) full re-sort per row.
  // NaN scores are dropped: NaN compares false both ways, so `order` is not
  // a strict total order over it — one NaN row would wedge into index 0 and
  // break the sorted-buffer invariant for every later insert/merge.
  override def reduce(buf: Seq[(Double, Long)], row: (Double, Long)): Seq[(Double, Long)] =
    if (row._1.isNaN) buf
    else if (buf.size < k || order(row, buf.last)) {
      val v = buf.toVector
      var lo = 0
      var hi = v.size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (order(v(mid), row)) lo = mid + 1 else hi = mid
      }
      val inserted = (v.take(lo) :+ row) ++ v.drop(lo)
      if (inserted.size > k) inserted.take(k) else inserted
    } else buf

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sortWith(order).take(k)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
