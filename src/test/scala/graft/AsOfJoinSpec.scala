package graft

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInRange: half-open bounds, multi-bin ranges, bin-edge points") {
    val points = Seq(
      (1L, 100L, 0L),    // == start → included
      (1L, 101L, 999L),  // just inside
      (1L, 102L, 1000L), // == end → excluded
      (1L, 103L, 2500L), // inside the long range only
      (2L, 200L, 500L),  // right key, other user's range → excluded
      (1L, 104L, 64L)    // exactly on a bin edge (binWidth 64)
    ).toDF("user_id", "event_id", "ts_us")
    val ranges = Seq(
      (1L, 900L, 0L, 1000L),   // [0, 1000): spans bins 0..15 at width 64
      (1L, 901L, 2000L, 3000L)
    ).toDF("user_id", "range_id", "start_us", "end_us")
    val out = graft.ops.RangeJoin.pointInRange(points, ranges,
      "user_id", "ts_us", "start_us", "end_us", binWidth = 64L)
      .select("event_id", "range_id").as[(Long, Long)].collect().toSet
    assert(out == Set((100L, 900L), (101L, 900L), (104L, 900L), (103L, 901L)))
    // no dup pairs even though ranges span many bins
    val n = graft.ops.RangeJoin.pointInRange(points, ranges,
      "user_id", "ts_us", "start_us", "end_us", binWidth = 64L).count()
    assert(n == 4)
  }

  test("pointInRange matches the naive theta join on real events") {
    val ev = graft.sources.Tables.events(spark, sf())
    val binned = graft.analytics.Pipelines.attributionRangeJoin(spark, sf())
    val evUs = ev.selectExpr("user_id", "event_id", "unix_micros(ts) AS ts_us", "event_type")
    val p = evUs.filter($"event_type" =!= "purchase")
      .select($"user_id", $"event_id", $"ts_us")
    val r = evUs.filter($"event_type" === "purchase")
      .select($"user_id".as("ru"), $"event_id".as("purchase_id"), $"ts_us".as("rts"))
    val naive = p.join(r, $"user_id" === $"ru" &&
        $"ts_us" >= $"rts" && $"ts_us" < $"rts" + 86400000000L)
      .select("event_id", "purchase_id")
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
  }
}

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

  test("asOf carries NULL payload values (matched-null ≠ no-match)") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),  // before any right row → no match
      (2L, 10L, ts("2024-01-01 13:00:00")),  // after A (null amount) → matched null
      (3L, 10L, ts("2024-01-01 21:00:00")))  // after B → 200
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 12:00:00"), Option.empty[Long], "A"),
      (10L, ts("2024-01-01 20:00:00"), Some(200L), "B"))
      .toDF("user_id", "ts", "amount", "tag")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts", Seq("amount", "tag"))
      .select("event_id", "amount", "tag")
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))),
          Option(r.getString(2)))).toMap
    // event 2 matched row A: tag carried, amount genuinely null —
    // distinguishable from event 1's no-match (both columns null)
    assert(out == Map(
      1L -> (None, None),
      2L -> (None, Some("A")),
      3L -> (Some(200L), Some("B"))))
  }

  test("asOf forward + tolerance: nearest following row, window-bounded") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),  // next is A at 12:00 (2h) → in tol
      (2L, 10L, ts("2024-01-01 12:00:00")),  // exactly at A → inclusive match
      (3L, 10L, ts("2024-01-01 13:00:00")),  // next is B at 20:00 (7h) → OUTSIDE 3h tol
      (4L, 10L, ts("2024-01-01 21:00:00")),  // nothing after → null
      (5L, 20L, ts("2024-01-01 10:00:00")))  // other key → null
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 12:00:00"), 100L), // A
      (10L, ts("2024-01-01 20:00:00"), 200L)) // B
      .toDF("user_id", "ts", "amount")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts", Seq("amount"),
        direction = "forward", toleranceSec = Some(3L * 3600L))
      .select("event_id", "amount")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out == Map(1L -> Some(100L), 2L -> Some(100L), 3L -> None,
      4L -> None, 5L -> None))
  }

  test("asOf backward tolerance: a stale match nulls out") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 13:00:00")),  // A 1h ago → in tol
      (2L, 10L, ts("2024-01-01 18:00:00")))  // A 6h ago → stale
      .toDF("event_id", "user_id", "ts")
    val right = Seq((10L, ts("2024-01-01 12:00:00"), 100L))
      .toDF("user_id", "ts", "amount")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts", Seq("amount"),
        toleranceSec = Some(2L * 3600L))
      .select("event_id", "amount")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out == Map(1L -> Some(100L), 2L -> None))
  }

  test("asOf keeps left row count (1:1, no explosion)") {
    val out = graft.analytics.Pipelines.asofLastPurchase(spark, sf())
    val nLeft = graft.sources.Tables.events(spark, sf())
      .filter(org.apache.spark.sql.functions.col("event_type") =!= "purchase").count()
    assert(out.count() == nLeft)
  }
}
