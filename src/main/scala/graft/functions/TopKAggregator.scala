package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed exact top-k aggregator: keeps the k largest (score, id) pairs
  * per group. The buffer is bounded at k entries, so partial (map-side)
  * aggregation ships at most k pairs per group per partition — the
  * property that makes per-group top-k viable at 100 TB where
  * sort-within-group (`row_number` windows) must shuffle every row.
  *
  * Buffer layout: two parallel PRIMITIVE arrays kept sorted by the
  * total order (score desc, id asc on ties). That buys two things the
  * earlier `Seq[(Double, Long)]`-with-full-resort buffer did not have:
  *
  *  - `reduce` is one comparison against the current k-th element in
  *    the steady state (full buffer, incoming element can't place) and
  *    an O(k) arraycopy insert only when the element actually enters.
  *    Under a random input order the expected number of inserts is
  *    O(k · ln n) (the top-k record-value argument), so a degenerate
  *    group with millions of rows — the bot user the g35b cap exists
  *    for — costs ~n comparisons, not n · k log k.
  *  - primitive arrays serialize as Spark unsafe arrays, so a
  *    partial-aggregate spill/shuffle writes two flat arrays per
  *    group instead of row-encoding k tuples.
  *
  * Deterministic total order: score desc, then id asc on ties.
  * Usable typed (`.toColumn`) or untyped via `functions.udaf(...)`.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), (Array[Double], Array[Long]), Seq[Long]] {
  require(k >= 1, s"top-k needs k >= 1, got $k")

  /** (s1, id1) ranks strictly before (s2, id2) in the kept order.
    * NaN-explicit total order: a NaN score ranks strictly LAST (as if
    * -inf, with the id tie-break among NaNs) — `>` alone is not a
    * total order for NaN (it never beats and is never beaten), and a
    * NaN that reached the k-th slot would make the steady-state early
    * exit in [[reduce]] reject every later row regardless of score. */
  @inline private def beats(s1: Double, id1: Long, s2: Double, id2: Long): Boolean = {
    val n1 = s1 != s1; val n2 = s2 != s2
    if (n1 != n2) n2                            // the non-NaN side wins
    else if (n1) id1 < id2                      // both NaN: id asc
    else s1 > s2 || (s1 == s2 && id1 < id2)
  }

  override def zero: (Array[Double], Array[Long]) =
    (Array.emptyDoubleArray, Array.emptyLongArray)

  override def reduce(
      buf: (Array[Double], Array[Long]),
      in: (Double, Long)): (Array[Double], Array[Long]) = {
    val (ss, ids) = buf
    val n = ss.length
    // steady-state early exit: full buffer and the element can't beat
    // the current k-th — no allocation, no sort, one comparison
    if (n >= k && !beats(in._1, in._2, ss(n - 1), ids(n - 1))) buf
    else {
      var lo = 0; var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (beats(in._1, in._2, ss(mid), ids(mid))) hi = mid else lo = mid + 1
      }
      val m = math.min(n + 1, k)
      val ns = new Array[Double](m); val nids = new Array[Long](m)
      System.arraycopy(ss, 0, ns, 0, lo)
      System.arraycopy(ids, 0, nids, 0, lo)
      ns(lo) = in._1; nids(lo) = in._2
      val tail = m - lo - 1 // dropped element (if any) falls off the end
      if (tail > 0) {
        System.arraycopy(ss, lo, ns, lo + 1, tail)
        System.arraycopy(ids, lo, nids, lo + 1, tail)
      }
      (ns, nids)
    }
  }

  override def merge(
      a: (Array[Double], Array[Long]),
      b: (Array[Double], Array[Long])): (Array[Double], Array[Long]) = {
    val (as, aids) = a; val (bs, bids) = b
    if (bs.isEmpty) a
    else if (as.isEmpty) b
    else { // linear merge of two sorted runs, capped at k
      val m = math.min(as.length + bs.length, k)
      val ns = new Array[Double](m); val nids = new Array[Long](m)
      var i = 0; var j = 0; var o = 0
      while (o < m) {
        val takeA = j >= bs.length ||
          (i < as.length && !beats(bs(j), bids(j), as(i), aids(i)))
        if (takeA) { ns(o) = as(i); nids(o) = aids(i); i += 1 }
        else { ns(o) = bs(j); nids(o) = bids(j); j += 1 }
        o += 1
      }
      (ns, nids)
    }
  }

  override def finish(buf: (Array[Double], Array[Long])): Seq[Long] =
    buf._2.toSeq

  override def bufferEncoder: Encoder[(Array[Double], Array[Long])] =
    ExpressionEncoder[(Array[Double], Array[Long])]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
