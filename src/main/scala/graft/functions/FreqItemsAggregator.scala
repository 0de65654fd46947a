package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra-Gries frequent-items summary: at most `k` counters,
  * est(token) UNDERCOUNTS its true frequency by at most N/(k+1) total
  * stream mass, under ANY partitioning/merge tree — the mergeability
  * result of Agarwal et al. (Mergeable Summaries, PODS'12): both
  * inserting an element and merging two summaries compact by
  * subtracting the (k+1)-th largest counter value and dropping the
  * non-positive ones, and the subtracted mass per compaction is charged
  * against k+1 distinct stream elements at once.
  *
  * Guarantees (the driver-checkable t33 contract):
  *  - est(t) ≤ true(t)  (pure undercount — no inflation ever)
  *  - true(t) − est(t) ≤ N/(k+1)  (so any token with
  *    true(t) > N/(k+1) is GUARANTEED present in the summary)
  *
  * The buffer is k-bounded, so map-side partials ship ≤ k entries per
  * partition regardless of vocabulary size — the same property that
  * makes [[TopKAggregator]]/[[BloomAggregator]] viable at 100 TB,
  * here for the "what are the hot tokens" question whose exact answer
  * needs a full vocabulary shuffle. */
object FreqItems {
  /** The library's standing counter budget for token heavy-hitter
    * summaries — ONE definition site (the [[QDigest.DefaultK]]
    * discipline): the batch query, the streaming monitor, and the
    * oracle's (k+1)-bound all read this value, so they cannot drift
    * apart silently. N/(k+1) ≈ 0.2% of stream mass at 512 — a 5×
    * margin under the 1% heavy threshold the t33/s21 contract uses. */
  val DefaultK = 512
}

class FreqItemsAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  /** Subtract the (k+1)-th largest value and drop non-positives —
    * a no-op when ≤ k entries survive as-is. */
  private def compact(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= k) m
    else {
      val kth = m.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
      m.flatMap { case (t, c) => if (c > kth) Some(t -> (c - kth)) else None }
    }

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], tok: String): Map[String, Long] =
    compact(buf.updated(tok, buf.getOrElse(tok, 0L) + 1L))

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    compact(b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    })

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
