package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Bucketing: pre-shuffle the storage so repeated joins on the bucket
  * key run with NO exchange — the co-located-join technique for fact
  * tables that join on the same key every day at 100 TB.
  */
class BucketingSpec extends SparkSpec {

  test("join on bucketed tables runs without a shuffle exchange") {
    // warehouse.dir is static; tables land in ./spark-warehouse — dropped below
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast

    Tables.orders(spark, sf()).write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    Tables.lineitem(spark, sf()).write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
    val plan = joined.queryExecution.executedPlan.toString

    // both sides read pre-bucketed: the join itself needs no exchange
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    val exchangesBeforeJoin = "Exchange hashpartitioning".r
      .findAllIn(plan.substring(plan.indexOf("Join"))).length
    assert(exchangesBeforeJoin == 0,
      s"expected no exchange feeding the bucketed join:\n$plan")

    // and the result matches the unbucketed join
    val expected = Tables.lineitem(spark, sf())
      .join(Tables.orders(spark, sf()), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
    assert(joined.exceptAll(expected).isEmpty && expected.exceptAll(joined).isEmpty)

    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("spark-warehouse"))
  }
}
