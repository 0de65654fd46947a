package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{ParquetSink, Tables}

class SinkSpec extends SparkSpec {

  test("day-partitioned parquet sink round-trips and prunes partitions") {
    val out = Files.createTempDirectory("graft-part").resolve("events").toString
    val events = Tables.events(spark, sf())
    ParquetSink.writePartitionedByDay(events, "ts", out)

    val back = spark.read.parquet(out)
    assert(back.count() == events.count())

    // partition pruning: a day filter must hit only that day's directory
    val oneDay = back.filter(col("day") === "2024-01-05")
    val expected = events.filter(to_date(col("ts")) === "2024-01-05").count()
    assert(oneDay.count() == expected)
    val scanned = oneDay.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(scanned.nonEmpty && scanned.forall(_.contains("day=2024-01-05")))
  }

  test("Catalog views enable the spark.sql surface over all tables") {
    graft.sources.Catalog.registerViews(spark, sf())
    val got = spark.sql(
      """SELECT l_returnflag, count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_returnflag""".stripMargin)
    assert(got.count() == 3)
    assert(spark.sql("SELECT count(*) FROM documents").collect()(0).getLong(0) == 500)
  }

  test("approx_count_distinct is within 5% of exact") {
    val li = Tables.lineitem(spark, sf())
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("e")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = graft.analytics.Pipelines.approxDistinctParts(spark, sf())
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    approx.foreach { case (k, a) =>
      assert(math.abs(a - exact(k)).toDouble / exact(k) < 0.05,
        s"$k: approx $a vs exact ${exact(k)}")
    }
  }
}
