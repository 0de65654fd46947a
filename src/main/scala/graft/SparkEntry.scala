package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.analytics.Pipelines

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry has a matching `oracleSql` ANSI-SQL statement
  * (DuckDB dialect-compatible) over the same parquet tables, with
  * IDENTICAL output column names; aggregates run on exact integer cents
  * so hashes are bit-stable (SURVEY.md §7.6). Queries with no SQL
  * equivalent (LSH, streaming, …) intentionally omit the oracle entry.
  */
object SparkEntry {

  /** Flagship query (§3.2 full profile) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Pipelines.flagshipProfile(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // reference-parity surface (SURVEY.md §2) on `events`
    "e1_categorize" -> (Pipelines.categorize _),
    "p3p4_valid_rows" -> (Pipelines.validRows _),
    "a1_duration_by_category" -> (Pipelines.durationByCategory _),
    "a2_devices_faithful" -> (Pipelines.devicesFaithful _),
    "a2_devices_distinct" -> (Pipelines.devicesDistinct _),
    "a3_pivot_durations" -> (Pipelines.pivotDurations _),
    "flagship_profile" -> (Pipelines.flagshipProfile _),
    "e8_one_day" -> (Pipelines.oneDay _),
    "u1_union_days" -> (Pipelines.unionDays _),
    // generic relational coverage on the TPC-H-ish tables
    "g1_pricing_summary" -> (Pipelines.pricingSummary _),
    "g2_revenue_by_nation" -> (Pipelines.revenueByNation _),
    "g3_top_orders_per_customer" -> (Pipelines.topOrdersPerCustomer _),
    "g4_top_orders_global" -> (Pipelines.topOrdersGlobal _),
    "g5_distinct_segments" -> (Pipelines.distinctSegments _),
    "g6_customers_without_orders" -> (Pipelines.customersWithoutOrders _),
    "g7_customer_order_stats" -> (Pipelines.customerOrderStats _)
  )

  /** Shared SQL prelude mirroring `graft.ops.Viewing`: integer-cents value
    * + the E1 category when-chain. */
  private val baseCte: String =
    """WITH base AS (
      |  SELECT user_id, event_type, props, ts,
      |         CAST(round(value * 100) AS BIGINT) AS value_cents,
      |         CASE WHEN event_type IN ('view','impression') THEN 'ViewDuration'
      |              WHEN event_type IN ('click','tap') THEN 'ClickDuration'
      |              WHEN event_type = 'purchase' THEN 'PurchaseDuration'
      |              WHEN event_type = 'signup' THEN 'SignupDuration'
      |              ELSE 'Error' END AS Type
      |  FROM events)""".stripMargin

  private val pivotCols: String =
    """    CAST(COALESCE(SUM(CASE WHEN Type = 'ClickDuration' THEN value_cents END), 0) AS BIGINT) AS ClickDuration,
      |    CAST(COALESCE(SUM(CASE WHEN Type = 'PurchaseDuration' THEN value_cents END), 0) AS BIGINT) AS PurchaseDuration,
      |    CAST(COALESCE(SUM(CASE WHEN Type = 'SignupDuration' THEN value_cents END), 0) AS BIGINT) AS SignupDuration,
      |    CAST(COALESCE(SUM(CASE WHEN Type = 'ViewDuration' THEN value_cents END), 0) AS BIGINT) AS ViewDuration""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "e1_categorize" ->
      """SELECT event_id,
        |  CASE WHEN event_type IN ('view','impression') THEN 'ViewDuration'
        |       WHEN event_type IN ('click','tap') THEN 'ClickDuration'
        |       WHEN event_type = 'purchase' THEN 'PurchaseDuration'
        |       WHEN event_type = 'signup' THEN 'SignupDuration'
        |       ELSE 'Error' END AS Type
        |FROM events""".stripMargin,

    "p3p4_valid_rows" ->
      """SELECT event_id, user_id,
        |  CASE WHEN event_type IN ('view','impression') THEN 'ViewDuration'
        |       WHEN event_type IN ('click','tap') THEN 'ClickDuration'
        |       WHEN event_type = 'purchase' THEN 'PurchaseDuration'
        |       WHEN event_type = 'signup' THEN 'SignupDuration'
        |       ELSE 'Error' END AS Type
        |FROM events
        |WHERE user_id <> 0
        |  AND (CASE WHEN event_type IN ('view','impression') THEN 'ViewDuration'
        |            WHEN event_type IN ('click','tap') THEN 'ClickDuration'
        |            WHEN event_type = 'purchase' THEN 'PurchaseDuration'
        |            WHEN event_type = 'signup' THEN 'SignupDuration'
        |            ELSE 'Error' END) <> 'Error'""".stripMargin,

    "a1_duration_by_category" ->
      s"""$baseCte
         |SELECT user_id, Type, CAST(SUM(value_cents) AS BIGINT) AS value_cents
         |FROM base
         |WHERE user_id <> 0 AND Type <> 'Error'
         |GROUP BY user_id, Type""".stripMargin,

    "a2_devices_faithful" ->
      """SELECT user_id, count(*) AS TotalDevices FROM events GROUP BY user_id""",

    "a2_devices_distinct" ->
      """SELECT user_id, count(DISTINCT props) AS TotalDevices FROM events GROUP BY user_id""",

    "a3_pivot_durations" ->
      s"""$baseCte
         |SELECT user_id,
         |$pivotCols
         |FROM base
         |WHERE user_id <> 0 AND Type <> 'Error'
         |GROUP BY user_id""".stripMargin,

    "flagship_profile" ->
      s"""$baseCte,
         |devices AS (SELECT user_id, count(*) AS TotalDevices FROM base GROUP BY user_id),
         |stats AS (
         |  SELECT user_id,
         |$pivotCols
         |  FROM base
         |  WHERE user_id <> 0 AND Type <> 'Error'
         |  GROUP BY user_id),
         |prof AS (
         |  SELECT s.*, d.TotalDevices,
         |    greatest(ClickDuration, PurchaseDuration, SignupDuration, ViewDuration) AS mx,
         |    (ClickDuration + PurchaseDuration + SignupDuration + ViewDuration) / 86400.0 AS days
         |  FROM stats s JOIN devices d USING (user_id))
         |SELECT user_id, ClickDuration, PurchaseDuration, SignupDuration, ViewDuration, TotalDevices,
         |  CASE WHEN ClickDuration = mx THEN 'Giải trí'
         |       WHEN PurchaseDuration = mx THEN 'Phim truyện'
         |       WHEN SignupDuration = mx THEN 'Thể thao'
         |       WHEN ViewDuration = mx THEN 'Truyền hình' END AS most_watch,
         |  concat_ws('-',
         |    CASE WHEN ClickDuration <> 0 THEN 'Giải trí' END,
         |    CASE WHEN PurchaseDuration <> 0 THEN 'Phim truyện' END,
         |    CASE WHEN SignupDuration <> 0 THEN 'Thể thao' END,
         |    CASE WHEN ViewDuration <> 0 THEN 'Truyền hình' END) AS Taste,
         |  CASE WHEN days < 10 THEN 'Low'
         |       WHEN days >= 10 AND days < 20 THEN 'Medium'
         |       WHEN days >= 20 THEN 'High' END AS Active_day
         |FROM prof""".stripMargin,

    "e8_one_day" ->
      s"""$baseCte
         |SELECT user_id,
         |  CAST(SUM(CASE WHEN Type = 'ClickDuration' THEN value_cents END) AS BIGINT) AS ClickDuration,
         |  CAST(SUM(CASE WHEN Type = 'PurchaseDuration' THEN value_cents END) AS BIGINT) AS PurchaseDuration,
         |  CAST(SUM(CASE WHEN Type = 'SignupDuration' THEN value_cents END) AS BIGINT) AS SignupDuration,
         |  CAST(SUM(CASE WHEN Type = 'ViewDuration' THEN value_cents END) AS BIGINT) AS ViewDuration,
         |  '2024-01-10' AS Date
         |FROM base
         |WHERE user_id <> 0 AND Type <> 'Error' AND CAST(ts AS DATE) = DATE '2024-01-10'
         |GROUP BY user_id""".stripMargin,

    "u1_union_days" ->
      s"""$baseCte
         |SELECT user_id, Type, CAST(SUM(value_cents) AS BIGINT) AS value_cents,
         |       strftime(ts, '%Y-%m-%d') AS Date
         |FROM base
         |WHERE user_id <> 0 AND Type <> 'Error'
         |  AND strftime(ts, '%Y-%m-%d') IN ('2024-01-03', '2024-01-04', '2024-01-05')
         |GROUP BY user_id, Type, strftime(ts, '%Y-%m-%d')""".stripMargin,

    "g1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  SUM(l_quantity) AS sum_qty,
        |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
        |           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_c4,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "g2_revenue_by_nation" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
        |           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_c4
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,

    "g3_top_orders_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders) t
        |WHERE rk <= 3""".stripMargin,

    "g4_top_orders_global" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 100""".stripMargin,

    "g5_distinct_segments" ->
      "SELECT DISTINCT c_mktsegment FROM customer",

    "g6_customers_without_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin,

    "g7_customer_order_stats" ->
      """SELECT c_custkey,
        |  count(o_orderkey) AS n_orders,
        |  CAST(COALESCE(SUM(CAST(round(o_totalprice * 100) AS BIGINT)), 0) AS BIGINT) AS total_cents
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey""".stripMargin
  )
}
