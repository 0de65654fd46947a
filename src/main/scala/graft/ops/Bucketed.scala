package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Bucketed (pre-shuffled) storage for co-located joins.
  *
  * Bucketing pays the shuffle ONCE at write time: both tables are hash-
  * partitioned into the same number of buckets on the join key and each
  * bucket is sorted, so every later join or aggregation on that key
  * reads co-partitioned, pre-sorted buckets and runs with ZERO shuffle
  * exchanges (`BucketingSpec`/`PlanSpec` pin this). This is the 100 TB
  * pattern for a fact table that every daily pipeline joins on the same
  * key: at 1000 executors the alternative is re-shuffling the full fact
  * table per query.
  */
object Bucketed {

  val NumBuckets = 8

  /** Register bucketed copies of `orders` and `lineitem` for `dir`
    * (idempotent per session; table names are dir-scoped so different
    * scale factors never collide). Returns (ordersTable, lineitemTable). */
  def ensureBucketed(spark: SparkSession, dir: String): (String, String) = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val ob = s"orders_bkt$tag"
    val lb = s"lineitem_bkt$tag"
    if (!spark.catalog.tableExists(ob)) {
      clearStaleLocation(spark, ob)
      Tables.orders(spark, dir).write.mode("overwrite")
        .bucketBy(NumBuckets, "o_orderkey").sortBy("o_orderkey").saveAsTable(ob)
    }
    if (!spark.catalog.tableExists(lb)) {
      clearStaleLocation(spark, lb)
      Tables.lineitem(spark, dir).write.mode("overwrite")
        .bucketBy(NumBuckets, "l_orderkey").sortBy("l_orderkey").saveAsTable(lb)
    }
    (ob, lb)
  }

  /** A managed table's location can outlive the (in-memory) catalog
    * entry across JVMs; CREATE then fails with LOCATION_ALREADY_EXISTS.
    * If the catalog has no such table, the files are stale — remove them. */
  private def clearStaleLocation(spark: SparkSession, table: String): Unit = {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val base = if (wh.startsWith("file:")) java.nio.file.Paths.get(new java.net.URI(wh))
               else java.nio.file.Paths.get(wh)
    val loc = base.resolve(table).toFile
    if (loc.exists) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(loc)
    }
  }

  /** Per-order line stats joined back to the order row. Both the
    * aggregation key and the join key are the bucket key, so the whole
    * plan — scan, partial-free agg, join — needs no exchange at all
    * (with broadcast disabled; at tiny SF Spark may still choose a
    * broadcast join, which is equally shuffle-free on the fact side). */
  def orderLineStats(spark: SparkSession, dir: String): DataFrame = {
    val (ob, lb) = ensureBucketed(spark, dir)
    val lstats = spark.table(lb)
      .groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("l_quantity")).as("sum_qty"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("line_cents"))
    spark.table(ob)
      .join(lstats, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("n_lines"), col("sum_qty"), col("line_cents"))
  }
}
