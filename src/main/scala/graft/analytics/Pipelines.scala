package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.Viewing
import graft.sources.Tables

/** Composed, oracle-checkable pipelines over the testdata tables.
  * Each method matches a `SparkEntry.queries` entry; oracle SQL lives in
  * `SparkEntry.oracleSql`. Column names/aliases MUST match the oracle.
  */
object Pipelines {

  private def cents(c: Column): Column = round(c * 100).cast("long")

  // ---- reference-parity surface on `events` (SURVEY.md §2) ----

  /** E1 categorize — when-chain + isin (E1/E2). */
  def categorize(spark: SparkSession, dir: String): DataFrame =
    Viewing.categorize(Tables.events(spark, dir)).select("event_id", "Type")

  /** P2/P3/P4 — projection + both sentinel filters. */
  def validRows(spark: SparkSession, dir: String): DataFrame =
    Viewing.validRows(Viewing.categorize(Tables.events(spark, dir)))
      .select("event_id", "user_id", "Type")

  /** A1 group-by sum. */
  def durationByCategory(spark: SparkSession, dir: String): DataFrame =
    Viewing.durationByCategory(
      Viewing.validRows(Viewing.categorize(Tables.events(spark, dir))))

  /** A2 faithful row-count "devices". */
  def devicesFaithful(spark: SparkSession, dir: String): DataFrame =
    Viewing.deviceCounts(Tables.events(spark, dir))

  /** A2 fixed countDistinct devices. */
  def devicesDistinct(spark: SparkSession, dir: String): DataFrame =
    Viewing.deviceCountsDistinct(Tables.events(spark, dir))

  /** A3 explicit-values pivot + E9 zero-fill. */
  def pivotDurations(spark: SparkSession, dir: String): DataFrame =
    Viewing.pivotDurations(durationByCategory(spark, dir))

  /** Flagship §3.2 pipeline (also `SparkEntry.entry`), faithful
    * branch+join shape. */
  def flagshipProfile(spark: SparkSession, dir: String): DataFrame =
    Viewing.fullPipeline(Tables.events(spark, dir))

  /** Single-pass flagship (same result + oracle, one shuffle, no join). */
  def flagshipProfileFast(spark: SparkSession, dir: String): DataFrame =
    Viewing.fullPipelineFast(Tables.events(spark, dir))

  /** §3.1 one-day variant (E8 literal date, faithful null cells). */
  def oneDay(spark: SparkSession, dir: String): DataFrame =
    Viewing.oneDayPipeline(Tables.events(spark, dir), "2024-01-10")

  val unionDates: Seq[String] = Seq("2024-01-03", "2024-01-04", "2024-01-05")

  /** U1 per-day union (method-2 shape). */
  def unionDays(spark: SparkSession, dir: String): DataFrame =
    Viewing.unionDays(Tables.events(spark, dir), unionDates)

  // ---- generic relational coverage on the TPC-H-ish tables ----

  /** TPC-H Q1-shaped pricing summary. Exact-cents aggregates; l_quantity
    * is integral-valued so its double sum is order-independent too. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val priceCents = cents(col("l_extendedprice"))
    val discPct = cents(col("l_discount"))                  // 0..100 (2-dec discount)
    li.filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        sum(priceCents).as("sum_base_cents"),
        sum(priceCents * (lit(100L) - discPct)).as("sum_disc_c4"),
        count(lit(1)).as("count_order"))
  }

  /** TPC-H Q5-shaped star join: revenue per nation for one region.
    * All dimension sides are explicitly broadcast — no shuffle of the
    * fact table for dimension joins, the core 100 TB join strategy. */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val nat = Tables.nation(spark, dir)
    val reg = Tables.region(spark, dir)
    val revCents = cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy("n_name")
      .agg(sum(revCents).as("revenue_c4"))
  }

  /** Window-function coverage: top-3 orders per customer, deterministic
    * tie-break on o_orderkey. */
  def topOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
  }

  /** Global top-k (sort + limit), deterministic tie-break. */
  def topOrdersGlobal(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  /** DISTINCT coverage. */
  def distinctSegments(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select("c_mktsegment").distinct()

  /** Anti-join coverage: customers with no high-value order (threshold
    * chosen so the result is non-empty at every SF). */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 400000d)
      .select("o_custkey")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
  }

  /** Left-outer join + aggregate coverage: per-customer order stats,
    * zero-filled for order-less customers. */
  def customerOrderStats(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), cents(col("o_totalprice")).as("oc"))
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(col("oc")), lit(0L)).as("total_cents"))
  }
}
