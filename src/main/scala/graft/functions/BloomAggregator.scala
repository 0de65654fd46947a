package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed Bloom-filter aggregator: folds `(h1, h2)` hash pairs into a
  * fixed-size bitset (`array<bigint>`, `numBits/64` words) using
  * Kirsch–Mitzenmacher double hashing — bit positions
  * `floorMod(h1 + i·h2, numBits)` for `i = 0 until numHashes`.
  *
  * The point at scale: the sketch is a MERGEABLE partial (merge = OR),
  * so building it over a 100 TB corpus is one map-side pass whose
  * exchange carries `numBits/8` bytes per task instead of a shuffle of
  * the corpus keys — and the finished sketch is a value a daily-ingest
  * job can broadcast, persist, or OR with yesterday's. Probing is pure
  * per-row arithmetic ([[graft.ext.Dedup.bloomIngest]] spells it with
  * codegen'd built-ins mirroring `floorMod` exactly), so membership
  * tests against a billion-key corpus cost zero joins. Sizing:
  * 16 bits/key at 5 hashes ≈ 0.13 % false-positive rate; 1 B keys ≈
  * 2 GB — still broadcastable; beyond that, partition the key space
  * into independent slices each with its own sketch.
  *
  * One-sided error, which is the direction ingest dedup needs: a
  * present key is ALWAYS flagged (no false negatives ⇒ no duplicate is
  * ever admitted); a false positive only rejects a clean document, at
  * the configured rate.
  */
class BloomAggregator(numBits: Int, numHashes: Int)
    extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
  require(numBits > 0 && numBits % 64 == 0,
    s"numBits must be a positive multiple of 64, got $numBits")
  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  override def zero: Array[Long] = new Array[Long](numBits / 64)

  override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
    // reduce both hashes mod numBits FIRST: (h1 + i·h2) mod m ==
    // ((h1 mod m) + i·(h2 mod m)) mod m, and the reduced sum stays
    // ≤ numHashes·numBits ≪ Long.Max — the probe side must mirror this
    // exactly because ANSI mode forbids the wrap-around formulation
    val h1m = java.lang.Math.floorMod(in._1, numBits.toLong)
    val h2m = java.lang.Math.floorMod(in._2, numBits.toLong)
    var i = 0
    while (i < numHashes) {
      val pos = ((h1m + i * h2m) % numBits).toInt
      buf(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
