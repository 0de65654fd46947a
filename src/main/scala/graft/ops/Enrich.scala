package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OLAP enrichment operators E4–E7 (SURVEY.md §2.3), generic over the
  * (categoryColumn → label) list so both the faithful reference pipeline
  * and the testdata analog share one implementation.
  *
  * All three are pure per-row expression trees — no shuffle, fully
  * whole-stage-codegen'd, scale-free.
  */
object Enrich {

  /** E4+E5 — argmax label over the category columns
    * (`ETL_full_output/ETL_full.py:93-108`): row-wise `greatest` of the
    * duration columns, then a first-match-wins when-chain mapping the
    * winning column to its label. Faithful quirks preserved: NO
    * `otherwise` (NULL if any input is NULL), ties break in list order. */
  def mostWatch(catLabels: Seq[(String, String)], out: String = "most_watch")(
      df: DataFrame): DataFrame = {
    val maxCol = greatest(catLabels.map { case (c, _) => col(c) }: _*)
    val first +: rest = catLabels
    val expr = rest.foldLeft(when(col(first._1) === maxCol, first._2)) {
      case (acc, (c, label)) => acc.when(col(c) === maxCol, label)
    }
    df.withColumn(out, expr)
  }

  /** E6 — taste profile (`ETL_full_output/ETL_full.py:110-120`):
    * `concat_ws('-', ...)` over per-category labels that are NULL when the
    * category duration is 0; concat_ws silently drops NULLs, so an
    * all-zero row yields the empty string — faithful to the reference. */
  def taste(catLabels: Seq[(String, String)], out: String = "Taste")(
      df: DataFrame): DataFrame =
    df.withColumn(out, concat_ws("-", catLabels.map {
      case (c, label) => when(col(c) =!= 0, label)
    }: _*))

  /** E7 — activity bucketing (`ETL_full_output/ETL_full.py:122-138`):
    * total across categories, divided by `divisor` (reference: 86400
    * seconds/day), bucketed Low/<lo> / Medium/[lo,hi) / High/>=hi with the
    * reference's exact cut-points 10/20 as defaults and, faithfully, no
    * `otherwise`. */
  def activityLevel(
      cats: Seq[String],
      out: String = "Active_day",
      divisor: Double = 86400d,
      lo: Double = 10d,
      hi: Double = 20d)(df: DataFrame): DataFrame = {
    val days = cats.map(col).reduce(_ + _) / lit(divisor)
    df.withColumn(out,
      when(days < lo, "Low")
        .when(days >= lo && days < hi, "Medium")
        .when(days >= hi, "High"))
  }
}
