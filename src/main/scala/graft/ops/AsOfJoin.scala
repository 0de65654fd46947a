package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row with
  * `right.ts <= left.ts`, per key. Spark has no native as-of join; the
  * naive theta-join (`l.key = r.key AND r.ts <= l.ts` + argmax) explodes
  * quadratically per key.
  *
  * This is the scalable native formulation (per SURVEY.md §7.5
  * preference order, composition beats a custom planner node here):
  * tag both sides, union them, and carry the right payload forward with
  * a `last(..., ignoreNulls)` running window. One shuffle on the key,
  * linear in rows, no explosion — the plan an AsOfJoinExec would build
  * by hand.
  *
  * Tie semantics: at equal timestamps the right row sorts first
  * (side 0 < side 1), so `<=` is inclusive, matching DuckDB's
  * `ASOF JOIN ... ON l.ts >= r.ts` oracle. Payload values may be null:
  * the whole payload rides in ONE struct that is non-null exactly for
  * right rows, so `last(ignoreNulls)` skips left rows but still carries
  * a right row whose payload fields are null — and the window runs once
  * regardless of payload width. A left row with no prior right row gets
  * null in every payload column (left-join semantics).
  */
object AsOfJoin {

  /** @param left      rows to enrich (kept 1:1)
    * @param right     lookup rows (key, ts, payload)
    * @param key       equi-join key column name
    * @param tsCol     event-time column name (present in both sides)
    * @param payload   right-side value columns to carry onto left rows */
  def asOf(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.withColumn("_side", lit(1))
    val r = right.select(Seq(key, tsCol).map(col) :+
        struct(payload.map(col): _*).as("_payload"): _*)
      .withColumn("_side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    u.withColumn("_payload", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col(s"_payload.`$c`").as(c)): _*)
  }
}
