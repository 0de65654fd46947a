package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the nearest right row at-or-before
  * (backward) or at-or-after (forward) its timestamp, per key,
  * optionally within a tolerance. Spark has no native as-of join; the
  * naive theta-join (`l.key = r.key AND r.ts <= l.ts` + argmax) explodes
  * quadratically per key.
  *
  * This is the scalable native formulation (per SURVEY.md §7.5
  * preference order, composition beats a custom planner node here):
  * tag both sides, union them, and carry the right payload across with
  * a running `last(..., ignoreNulls)` window (backward) or its mirror
  * `first(...)` over the following frame (forward). One shuffle on the
  * key, linear in rows, no explosion — the plan an AsOfJoinExec would
  * build by hand. The tolerance is a pure post-window row-local filter
  * (exact integer microsecond arithmetic), so it adds zero plan cost.
  *
  * Tie semantics: at equal timestamps the match is INCLUSIVE in both
  * directions — backward sorts right rows (side 0) before left (side 1)
  * so the running `last` sees them; forward sorts left (side 0) before
  * right (side 1) so the following-frame `first` does. Both match
  * DuckDB's `ASOF JOIN ... ON l.ts >= r.ts` / `l.ts <= r.ts` oracles.
  * Payload values may be null: the whole payload rides in ONE struct
  * that is non-null exactly for right rows, so ignoreNulls skips left
  * rows but still carries a right row whose payload fields are null —
  * and the window runs once regardless of payload width. A left row
  * with no matching right row (none in direction, or outside the
  * tolerance) gets null in every payload column (left-join semantics).
  */
object AsOfJoin {

  /** @param left         rows to enrich (kept 1:1)
    * @param right        lookup rows (key, ts, payload)
    * @param key          equi-join key column name
    * @param tsCol        event-time column name (present in both sides)
    * @param payload      right-side value columns to carry onto left rows
    * @param direction    "backward" (nearest r.ts <= l.ts, default) or
    *                     "forward" (nearest r.ts >= l.ts)
    * @param toleranceSec match only if |r.ts - l.ts| <= this many
    *                     seconds; None = unbounded */
  def asOf(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      payload: Seq[String], direction: String = "backward",
      toleranceSec: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val backward = direction == "backward"
    val leftCols = left.columns.toSeq
    // the right ts rides inside the payload struct so the tolerance
    // check is row-local after the window — no second join or window
    val l = left.withColumn("_side", lit(if (backward) 1 else 0))
    val r = right.select(Seq(key, tsCol).map(col) :+
        struct((payload.map(col) :+ col(tsCol).as("_rts")): _*).as("_payload"): _*)
      .withColumn("_side", lit(if (backward) 0 else 1))
    val u = l.unionByName(r, allowMissingColumns = true)
    val base = Window.partitionBy(key).orderBy(col(tsCol).asc, col("_side").asc)
    val carried =
      if (backward)
        last(col("_payload"), ignoreNulls = true)
          .over(base.rowsBetween(Window.unboundedPreceding, 0))
      else
        first(col("_payload"), ignoreNulls = true)
          .over(base.rowsBetween(0, Window.unboundedFollowing))
    val inTol: Column = toleranceSec match {
      case None => col("_payload").isNotNull
      case Some(tol) =>
        val diff =
          if (backward) unix_micros(col(tsCol)) - unix_micros(col("_payload._rts"))
          else unix_micros(col("_payload._rts")) - unix_micros(col(tsCol))
        col("_payload").isNotNull && diff <= tol * 1000000L
    }
    u.withColumn("_payload", carried)
      .filter(col("_side") === lit(if (backward) 1 else 0))
      .select(leftCols.map(col) ++
        payload.map(c => when(inTol, col(s"_payload.`$c`")).as(c)): _*)
  }
}
