package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key + interval-containment join via range binning.
  *
  * Spark plans a raw `p.key = r.key AND p.t >= r.start AND p.t < r.end`
  * join as SortMergeJoin on the key alone (all of a key's points ×
  * all of its ranges buffered per key, quadratic in the hot key) — or,
  * with no equi-key at all, as BroadcastNestedLoopJoin. Binning fixes
  * the shape: each range explodes into the fixed-width bins it covers
  * (≤ len/binWidth + 1 rows), each point lands in exactly ONE bin, and
  * the join becomes a plain shuffled equi-join on (key, bin) followed
  * by the exact containment filter. No post-join dedup is needed —
  * a (point, range) pair can only meet in the point's single bin.
  * Linear shuffle, no per-key quadratic buffering, scales to 100 TB.
  */
object RangeJoin {

  /** Join `points` (one long instant column `ptCol`) to `ranges`
    * (half-open [`startCol`, `endCol`) long columns) sharing `key`.
    * `binWidth` should be on the order of the typical range length:
    * wider bins = fewer replicated range rows, narrower = fewer false
    * candidates for the final filter. */
  def pointInRange(points: DataFrame, ranges: DataFrame, key: String,
      ptCol: String, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // integral DIV, not floor(x / w): double division loses exactness
    // past 2^53 (nanosecond-scale epochs), silently mis-binning points.
    // Instants here are non-negative, where DIV == floor-div.
    val binned = ranges.withColumn("_bin",
      explode(sequence(
        expr(s"`$startCol` DIV $binWidth"),
        expr(s"(`$endCol` - 1) DIV $binWidth"))))
    points.withColumn("_bin", expr(s"`$ptCol` DIV $binWidth"))
      .join(binned, Seq(key, "_bin"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("_bin")
  }
}
