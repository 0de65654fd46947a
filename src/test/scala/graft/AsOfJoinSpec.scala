package graft

import java.sql.Timestamp
import graft.ops.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf picks the latest right row at-or-before each left row, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),  // before any purchase → null
      (2L, 10L, ts("2024-01-01 12:00:00")),  // exactly at purchase A → A (inclusive)
      (3L, 10L, ts("2024-01-01 15:00:00")),  // between A and B → A
      (4L, 10L, ts("2024-01-01 23:00:00")),  // after B → B
      (5L, 20L, ts("2024-01-01 15:00:00")))  // other key, no purchases → null
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 12:00:00"), 100L), // A
      (10L, ts("2024-01-01 20:00:00"), 200L)) // B
      .toDF("user_id", "ts", "amount")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts", Seq("amount"))
      .select("event_id", "amount")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out == Map(1L -> None, 2L -> Some(100L), 3L -> Some(100L),
      4L -> Some(200L), 5L -> None))
  }

  test("asOf keeps left row count (1:1, no explosion)") {
    val out = graft.analytics.Pipelines.asofLastPurchase(spark, sf())
    val nLeft = graft.sources.Tables.events(spark, sf())
      .filter(org.apache.spark.sql.functions.col("event_type") =!= "purchase").count()
    assert(out.count() == nLeft)
  }
}
