package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.OutputMode
import graft.sources.Tables
import graft.streaming.Streaming

/** Ingestion robustness across physical timestamp layouts.
  *
  * The driver regenerates the testdata between rounds and has already
  * shipped `ts` in two different parquet encodings — TIMESTAMP(NANOS)
  * (rounds ≤8; readable only as a raw nanos long) and TIMESTAMP(MICROS,
  * isAdjustedToUTC=false) = TIMESTAMP_NTZ (round 9+). Round 9's loaders
  * were hard-wired to the nanos layout and the whole streaming family
  * silently collapsed to 1970 timestamps. This suite is the regression
  * test that would have caught it before the driver did: the same
  * events, written in every layout, must load identically through BOTH
  * the batch loader and the streaming source.
  */
class IngestionSpec extends SparkSpec {

  /** The canonical events (already normalized to UTC TimestampType). */
  private lazy val canonical = Tables.events(spark, sf())

  /** Write the canonical events under `<tmp>/events.parquet` in the
    * given physical ts layout; returns the table dir for Tables/
    * eventsStream. `long_nanos` models what the legacy nanosAsLong conf
    * surfaces for a TIMESTAMP(NANOS) file (Spark cannot write NANOS
    * itself); the other two are written natively. */
  private def writeLayout(kind: String): String = {
    val dir = Files.createTempDirectory(s"graft-ts-$kind").toString
    val df = kind match {
      case "long_nanos" => canonical.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      case "ntz_micros" => canonical.withColumn("ts", col("ts").cast(TimestampNTZType))
      case "ltz_micros" => canonical
    }
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def key(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("event_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private val layouts = Seq("long_nanos", "ntz_micros", "ltz_micros")

  test("batch loader normalizes every ts layout to identical UTC rows") {
    val expected = key(canonical)
    assert(expected.nonEmpty)
    for (kind <- layouts) {
      val loaded = Tables.events(spark, writeLayout(kind))
      assert(loaded.schema("ts").dataType == TimestampType, s"$kind: wrong type")
      assert(key(loaded) == expected, s"$kind: rows diverge from canonical")
    }
  }

  test("streaming source normalizes every ts layout to identical UTC rows") {
    val expected = key(canonical)
    for (kind <- layouts) {
      val streamed = Streaming.runToBatch(spark,
        Streaming.eventsStream(spark, writeLayout(kind)), OutputMode.Append())
      assert(streamed.schema("ts").dataType == TimestampType, s"$kind: wrong type")
      assert(key(streamed) == expected, s"$kind: stream rows diverge from canonical")
    }
  }

  test("normalizeTs handles a TIMESTAMP_NTZ column read without the loader confs") {
    // A caller that bypasses Tables' read confs sees TIMESTAMP_NTZ; the
    // normalizer's cast branch must still produce the same UTC rows
    // (session timezone is pinned UTC in every entry point).
    val dir = writeLayout("ntz_micros")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try {
      val raw = spark.read.parquet(s"$dir/events.parquet")
      assert(raw.schema("ts").dataType == TimestampNTZType)
      val fixed = Tables.normalizeTs(raw, Seq("ts"))
      assert(fixed.schema("ts").dataType == TimestampType)
      assert(key(fixed) == key(canonical))
    } finally spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
  }

  test("normalizeTs widens a date32 column to the same midnight timestamps") {
    // insurance for a future regeneration that stores order/ship dates
    // as parquet date32: every current date value is a midnight
    // timestamp, so the widened column must be value-identical
    val dir = Files.createTempDirectory("graft-date32").toString
    Tables.orders(spark, sf())
      .withColumn("o_orderdate", col("o_orderdate").cast(DateType))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val loaded = Tables.orders(spark, dir)
    assert(loaded.schema("o_orderdate").dataType == TimestampType)
    val expected = Tables.orders(spark, sf())
      .select(col("o_orderkey"), unix_micros(col("o_orderdate")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = loaded.select(col("o_orderkey"), unix_micros(col("o_orderdate")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("a throwing query leaves a driver-visible error marker") {
    val out = Files.createTempDirectory("graft-verify-err").toString
    Verify.dumpQuery(spark, sf(), out, "boom",
      (_, _) => throw new RuntimeException("deliberate failure"))
    val marker = spark.read.parquet(s"$out/boom")
    assert(marker.columns.toSeq == Seq("_graft_error"))
    val msg = marker.collect().map(_.getString(0)).mkString
    assert(marker.count() == 1 && msg.contains("deliberate failure"))
  }
}
