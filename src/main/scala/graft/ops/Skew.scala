package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot-key aggregations and joins.
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; these
  * helpers cover the cases AQE doesn't: a groupBy where one key holds a
  * large share of all rows (the classic "null key" / "power user" /
  * "common shingle" shape in 100 TB pipelines).
  */
object Skew {

  /** Two-stage salted aggregation for algebraic aggregates:
    * stage 1 groups by (key, salt) spreading each hot key over
    * `saltBuckets` reducers; stage 2 re-aggregates by key. Correct for
    * any aggregate that composes associatively from partials — here
    * sum/count, the ones the engine's pipelines use.
    *
    * At 100 TB: partial aggregation already absorbs most skew when key
    * cardinality is low; salting matters when cardinality is high AND
    * hot keys exist, where map-side combine stops helping. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      saltBuckets: Int = 32): DataFrame = {
    // salt from row CONTENT (not monotonically_increasing_id), so the
    // plan is deterministic under task retry / partition re-split
    val salted = df.withColumn("_salt",
      pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(saltBuckets.toLong)))
    salted
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(key))
      .agg(sum("_psum").as(s"sum_$valueCol"), sum("_pcnt").as("cnt"))
  }

  /** Broadcast-salted join for a skewed LEFT side against a small-ish
    * right side: replicate each right row `saltBuckets` times, salt the
    * left side randomly-but-deterministically, join on (key, salt).
    * Spreads a hot left key over `saltBuckets` tasks. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltBuckets: Int = 8): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(saltBuckets.toLong)))
    val explodedRight = right.withColumn("_salt",
      explode(array((0 until saltBuckets).map(i => lit(i.toLong)): _*)))
    saltedLeft.join(explodedRight, Seq(key, "_salt")).drop("_salt")
  }
}
