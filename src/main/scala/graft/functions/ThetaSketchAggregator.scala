package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable BOTTOM-K (KMV / theta) distinct-set sketch: keep the k
  * smallest DISTINCT 64-bit hash values of the set, compared unsigned
  * (Bar-Yossef et al., "Counting distinct elements in a data stream",
  * RANDOM'02; Beyer et al., "On synopses for distinct-value estimation
  * under multiset operations", SIGMOD'07; the theta-sketch set-algebra
  * framing of Dasgupta et al., "Theta-sketch framework", 2016 — all
  * public literature).
  *
  * This is the FOURTH mergeable summary in the library, and it answers
  * the question the other three cannot: SET EXPRESSIONS over distinct
  * sets. HLL (s12/g32) answers "how many distinct" and unions
  * losslessly, but famously cannot intersect or difference; the
  * bottom-k sketch supports |A ∪ B|, |A ∩ B| and |A ∖ B| estimates
  * from the stored sketches alone — the "users who did X AND Y",
  * "active both weeks" (retention), "in segment A but not B" class a
  * 100 TB analytics store answers from per-day/per-segment sketch rows
  * without ever rescanning events (g36/g37/s22).
  *
  * Properties the queries lean on:
  *  - EXACTLY merge-order independent: bottom-k of a set is a pure
  *    function of the set (bottomK(S) = bottomK(bottomK(S₁) ∪
  *    bottomK(S₂)) for any split, since trimming never discards a
  *    candidate for the global bottom k) — so unlike the q-digest,
  *    whose CONTENTS are merge-tree state, two runs over the same data
  *    produce BIT-IDENTICAL sketches under any partitioning, batch or
  *    micro-batch (pinned by a ScalaCheck property; it is why s22
  *    shares g36's oracle verbatim).
  *  - EXACT below k: a sketch holding fewer than k hashes IS the
  *    (hashed) set — every estimate is exact until the segment
  *    outgrows k, and only then degrades to the ~1/√k relative-error
  *    sampling regime (the q-digest τ=1 exactness story, for sets).
  *  - k-bounded buffers: map-side partials ship ≤ 4k longs per
  *    partition regardless of row count (lazy trim, the
  *    [[QDigestAggregator]] size-trigger discipline).
  *
  * Input is the 64-bit hash of the element (xxhash64 at the query —
  * codegen'd, deterministic), not the element itself: the sketch
  * never stores user ids, and hashing is the query's one scan-side
  * expression. */
object Theta {

  /** The library's standing sketch size for distinct-set sketches —
    * ONE definition site (the [[QDigest.DefaultK]] discipline): the
    * batch query, the streaming twin, the rollup and every bound all
    * read this value. 1/√k ≈ 4.4% relative standard error once
    * estimating; exact below 512 distinct values. */
  val DefaultK = 512

  private val unsignedOrd: Ordering[Long] =
    (a: Long, b: Long) => java.lang.Long.compareUnsigned(a, b)

  /** The k smallest distinct unsigned hashes of `s` — the sketch's
    * canonical content. Safe to apply lazily/partially: trimming to
    * any size ≥ k never discards a candidate for the global bottom
    * k. */
  def bottomK(s: Set[Long], k: Int): Set[Long] =
    if (s.size <= k) s
    else s.toArray.sorted(unsignedOrd).take(k).toSet

  /** Canonical serialized form: ascending unsigned. */
  def toSketch(s: Set[Long], k: Int): Seq[Long] =
    bottomK(s, k).toArray.sorted(unsignedOrd).toSeq

  /** Unsigned hash mapped to (0, 1]: the fraction of the hash space at
    * or below it — the θ coordinate of the KMV estimator. Double's 53
    * bits lose the low bits of the hash, which is noise at 2⁻⁵³
    * against the 1/√k sampling error. */
  private[graft] def u(h: Long): Double =
    ((h ^ Long.MinValue).toDouble + 9.223372036854776e18 + 1.0) /
      1.8446744073709552e19

  /** Distinct-count estimate of one sketch: exact (= size) below k,
    * else the KMV estimator (k−1)/u(kth smallest). */
  def estimate(sk: Seq[Long], k: Int): Double =
    if (sk.size < k) sk.size.toDouble
    else (k - 1).toDouble / u(sk.last)

  /** Set-operation estimates over two sketches of the SAME hash
    * function: (|A ∪ B|, |A ∩ B|, |A ∖ B|). θ = min of the two
    * sketches' thresholds; both samples are cut to u < θ and the
    * op is computed on the cut samples, scaled by 1/θ (the standard
    * theta-sketch combination). When both sketches are exact
    * (below k), θ = 1 and all three results are EXACT. */
  def setOps(a: Seq[Long], b: Seq[Long], k: Int): (Double, Double, Double) = {
    val thetaA = if (a.size < k) 1.0 else u(a.last)
    val thetaB = if (b.size < k) 1.0 else u(b.last)
    val theta = math.min(thetaA, thetaB)
    def cut(s: Seq[Long]): Set[Long] =
      if (theta >= 1.0) s.toSet else s.filter(h => u(h) < theta).toSet
    val sa = cut(a)
    val sb = cut(b)
    val union = sa.union(sb).size / theta
    val inter = sa.intersect(sb).size / theta
    val diff = sa.diff(sb).size / theta
    (union, inter, diff)
  }
}

/** Build a bottom-k sketch from hashed elements (one Long per row). */
class ThetaSketchAggregator(k: Int)
    extends Aggregator[Long, Set[Long], Seq[Long]] {
  require(k >= 2, s"Theta(k=$k)")

  override def zero: Set[Long] = Set.empty

  /** Insert; trim lazily (size-triggered) so per-row cost stays O(1)
    * amortized — late trimming only delays shrinking and can never
    * lose a global bottom-k candidate. */
  override def reduce(buf: Set[Long], h: Long): Set[Long] = {
    val up = buf + h
    if (up.size > 4 * k) Theta.bottomK(up, k) else up
  }

  override def merge(a: Set[Long], b: Set[Long]): Set[Long] =
    Theta.bottomK(a.union(b), k)

  override def finish(buf: Set[Long]): Seq[Long] = Theta.toSketch(buf, k)

  override def bufferEncoder: Encoder[Set[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Set[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** Merge ALREADY-BUILT bottom-k sketches (rows produced by
  * [[ThetaSketchAggregator]]) — the SERVING half of the
  * persisted-rollup pattern (g32/t36's shape for sets): persist one
  * ≤ k-long sketch row per day/segment, answer week-over-week
  * retention or cross-segment overlap by merging stored rows and
  * combining with [[Theta.setOps]] — the corpus rescanned never. */
class ThetaMergeAggregator(k: Int)
    extends Aggregator[Seq[Long], Set[Long], Seq[Long]] {
  require(k >= 2, s"ThetaMerge(k=$k)")

  override def zero: Set[Long] = Set.empty

  override def reduce(buf: Set[Long], sk: Seq[Long]): Set[Long] = {
    val up = buf ++ sk
    if (up.size > 4 * k) Theta.bottomK(up, k) else up
  }

  override def merge(a: Set[Long], b: Set[Long]): Set[Long] =
    Theta.bottomK(a.union(b), k)

  override def finish(buf: Set[Long]): Seq[Long] = Theta.toSketch(buf, k)

  override def bufferEncoder: Encoder[Set[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Set[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
