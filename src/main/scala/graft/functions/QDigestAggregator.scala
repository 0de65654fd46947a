package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable q-digest quantile summary (Shrivastava et al., "Medians
  * and Beyond", SenSys'04; mergeability per Agarwal et al., "Mergeable
  * Summaries", PODS'12 — the same result [[FreqItemsAggregator]] leans
  * on): values live in the fixed integer universe [0, 2^m); the digest
  * is a set of counted nodes of the complete binary tree over that
  * universe (heap numbering — root 1, leaves 2^m .. 2^{m+1}−1), kept
  * compressed so any quantile query answers with rank error at most
  * ε·N for ε = m/k, from a summary of O(k) entries.
  *
  * This is the third classic mergeable sketch in the library, and the
  * last leg of the distribution-monitoring tripod: HLL answers "how
  * many distinct" (s12/g32), Misra-Gries answers "which items are hot"
  * (t33), and the q-digest answers "how are values distributed" — the
  * per-source length/score quantiles a 100 TB curation pipeline tracks
  * per shard and per day WITHOUT re-sorting the corpus. Like the other
  * two, the buffer is size-bounded, so map-side partials ship O(k)
  * entries per partition regardless of row count, and partials merge
  * in any tree with the bound intact — compaction charges each
  * deleted-node mass against a parent whose subtree holds ≥ k
  * distinct compressions, exactly the MG accounting, applied
  * hierarchically.
  *
  * Determinism discipline: q-digest is deterministic BY CONSTRUCTION
  * (no random coin anywhere — unlike KLL, whose guarantee needs
  * random compaction), but the digest CONTENTS still depend on the
  * partitioning/merge tree (compression thresholds see partial
  * masses). So — the t33 contract — queries built on it emit
  * engine-exact values plus BOOLEANS asserting the order-independent
  * guarantee, never the estimates themselves:
  *
  *  - est(φ) answers with k·rank_incl(est) ≥ k·target − m·N and
  *    k·rank_excl(est) ≤ k·target + m·N (the ε·N two-sided rank
  *    bound, spelled in exact integers — no division, no doubles),
  *    where target = ⌈φ·N⌉, rank_incl(v) = #{x ≤ v},
  *    rank_excl(v) = #{x < v}.
  *  - the digest holds ≤ 6k entries after [[finish]] (3k is the
  *    textbook bound for a fully-compressed digest; the factor-2
  *    headroom covers the lazy in-partition compression trigger,
  *    which only ever makes the digest LARGER and MORE accurate,
  *    never less).
  *
  * Values outside [0, 2^m) must be clamped by the caller (the query
  * documents the top-leaf collapse this implies for over-range
  * values — pick m for the value domain). */
class QDigestAggregator(k: Int, m: Int)
    extends Aggregator[Long, Map[Long, Long], Map[Long, Long]] {
  require(k >= 1 && m >= 1 && m <= 40, s"QDigest(k=$k, m=$m)")

  private val universe: Long = 1L << m

  private def compress(in: Map[Long, Long]): Map[Long, Long] =
    QDigest.compress(in, k, m)

  override def zero: Map[Long, Long] = Map.empty

  /** Insert at the value's leaf; compress lazily (size-triggered) so
    * per-row cost stays O(1) amortized — late compression only delays
    * folding, which the 6k size headroom and the merge-time compress
    * absorb. */
  override def reduce(buf: Map[Long, Long], x: Long): Map[Long, Long] = {
    require(x >= 0 && x < universe,
      s"q-digest value $x outside [0, $universe) — clamp at the query")
    val leaf = universe + x
    val up = buf.updated(leaf, buf.getOrElse(leaf, 0L) + 1L)
    if (up.size > 4 * k) compress(up) else up
  }

  override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] =
    QDigest.mergeCounts(a, b, k, m)

  override def finish(buf: Map[Long, Long]): Map[Long, Long] = compress(buf)

  override def bufferEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
  override def outputEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
}

/** Merge ALREADY-BUILT q-digests (map rows produced by
  * [[QDigestAggregator]]) — the SERVING half of the persisted-rollup
  * pattern (g32's shape for quantiles): a production pipeline persists
  * one ≤3k-entry digest row per shard/day and answers weekly/monthly
  * quantiles by merging the stored rows, never rescanning the corpus.
  * Same mergeability contract as the builder: summing counted nodes
  * and recompressing at the merged mass preserves the ε·N rank bound
  * under any merge tree. */
class QDigestMergeAggregator(k: Int, m: Int)
    extends Aggregator[Map[Long, Long], Map[Long, Long], Map[Long, Long]] {
  require(k >= 1 && m >= 1 && m <= 40, s"QDigestMerge(k=$k, m=$m)")

  override def zero: Map[Long, Long] = Map.empty

  /** Fold an arriving stored digest in; compress lazily (the builder's
    * size-trigger pattern — a full m-level sweep per daily row would
    * cost O(size·m) × days for nothing, the 6k headroom absorbs late
    * folding and [[merge]]/[[finish]] compress at the boundaries). */
  override def reduce(buf: Map[Long, Long], dg: Map[Long, Long]): Map[Long, Long] = {
    val up = dg.foldLeft(buf) { case (acc, (v, c)) =>
      acc.updated(v, acc.getOrElse(v, 0L) + c)
    }
    if (up.size > 4 * k) QDigest.compress(up, k, m) else up
  }

  override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] =
    QDigest.mergeCounts(a, b, k, m)

  override def finish(buf: Map[Long, Long]): Map[Long, Long] =
    QDigest.compress(buf, k, m)

  override def bufferEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
  override def outputEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
}

object QDigest {
  /** Canonical bottom-up compression at threshold τ = ⌈N/k⌉: level by
    * level from the leaves, children fold into their parent whenever
    * cnt(v) + cnt(sibling) + cnt(parent) < τ — STRICTLY less, the
    * textbook condition. Strictness is load-bearing: at small/sparse
    * N (τ = 1) a ≤ would fold every singleton leaf and cascade the
    * whole digest into the root (rank error N, not ε·N); with < the
    * sparse regime folds nothing and stays exact. A parent grown by a
    * fold at depth d is itself a candidate at depth d−1 — the next
    * level the sweep visits — so one sweep reaches the fully
    * compressed fixed point. */
  def compress(in: Map[Long, Long], k: Int, m: Int): Map[Long, Long] = {
    val n = in.valuesIterator.sum
    val tau = (n + k - 1) / k
    val buf = scala.collection.mutable.HashMap.empty[Long, Long]
    buf ++= in
    var depth = m
    while (depth >= 1) {
      val lvlLo = 1L << depth
      val lvlHi = lvlLo << 1
      val lvl = buf.keysIterator.filter(v => v >= lvlLo && v < lvlHi).toArray
      java.util.Arrays.sort(lvl)
      for (v <- lvl) buf.get(v).foreach { c =>
        val sib = v ^ 1L
        val sc = buf.getOrElse(sib, 0L)
        val par = v >> 1
        val pc = buf.getOrElse(par, 0L)
        if (c + sc + pc < tau) {
          buf.remove(v); buf.remove(sib)
          buf.update(par, pc + c + sc)
        }
      }
      depth -= 1
    }
    buf.toMap
  }

  /** The ONE merge of two count maps both aggregator classes share
    * (sum per node, recompress at the merged mass): a fix to the
    * builder's merge semantics reaches the serving-path merger by
    * construction, keeping the "same mergeability contract" claim
    * structural rather than copy-discipline. */
  def mergeCounts(a: Map[Long, Long], b: Map[Long, Long],
      k: Int, m: Int): Map[Long, Long] =
    compress(b.foldLeft(a) { case (acc, (v, c)) =>
      acc.updated(v, acc.getOrElse(v, 0L) + c)
    }, k, m)

  /** The library's standing parameters for document-length digests:
    * m = 10 covers this corpus's n_chars domain (pick m for yours),
    * k = 128 gives ε = m/k ≈ 7.8% rank error from ≤ 3k-entry
    * summaries. ONE definition site — the batch query, the streaming
    * monitor, and the oracle contract all read the same values, so the
    * "s20 oracle = t35 SQL verbatim" claim cannot drift apart
    * silently. */
  val DefaultM = 10
  val DefaultK = 128

  /** The t36 rollup's parameters: m = 16 covers exact integer event
    * CENTS (a 2^16 universe), k = 256 gives ε = 16/256 = 6.25% weekly
    * rank error. ONE definition site like [[DefaultM]]/[[DefaultK]] —
    * the rollup pipeline and its DuckDB oracle string both interpolate
    * these, so a parameter change cannot silently desynchronize the
    * oracle's clamp literal from the engine's universe. */
  val RollupM = 16
  val RollupK = 256

  /** Clamp a value column into the digest's [0, 2^m) universe — the
    * shared spelling every digest producer must use (a site-local copy
    * that drifted would clamp the stream into a different universe
    * than the batch audit and the SQL oracle). */
  def clampToUniverse(c: org.apache.spark.sql.Column, m: Int)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{greatest, least, lit}
    least(greatest(c, lit(0L)), lit((1L << m) - 1))
  }

  /** Node → covered leaf-value range [lo, hi] in the m-bit universe. */
  def range(v: Long, m: Int): (Long, Long) = {
    val depth = 63 - java.lang.Long.numberOfLeadingZeros(v)
    val s = m - depth
    require(s >= 0, s"node $v below the leaves of a 2^$m universe")
    val lo = (v << s) - (1L << m)
    (lo, lo + (1L << s) - 1)
  }

  /** The φ-quantile estimate (φ = num/den): walk the digest's nodes in
    * postorder — (hi asc, lo desc), children before parents — summing
    * counts; the first node carrying the cumulative past
    * target = ⌈φ·N⌉ answers with its hi endpoint. Deterministic given
    * the digest; O(size·log size) driver/executor-local arithmetic on
    * a ≤ 6k-entry map. */
  def quantile(digest: Map[Long, Long], m: Int, num: Long, den: Long): Long = {
    require(digest.nonEmpty, "quantile of an empty q-digest")
    val n = digest.valuesIterator.sum
    val target = math.max(1L, (n * num + den - 1) / den)
    val nodes = digest.toArray.map { case (v, c) =>
      val (lo, hi) = range(v, m); (hi, lo, c)
    }.sortBy { case (hi, lo, _) => (hi, -lo) }
    var cum = 0L
    var i = 0
    while (i < nodes.length) {
      cum += nodes(i)._3
      if (cum >= target) return nodes(i)._1
      i += 1
    }
    nodes.last._1
  }
}
