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

  test("sorted range-partitioned layout confines a key range to few files") {
    val out = Files.createTempDirectory("graft-sorted").resolve("events").toString
    val events = Tables.events(spark, sf())
    ParquetSink.writeSorted(events, "ts", out, numFiles = 8)

    val back = spark.read.parquet(out)
    assert(back.count() == events.count())

    // one day of a 30-day range must be correct AND live in at most 2 of
    // the 8 range files (a boundary can straddle one file edge) — the
    // disjoint-range property that lets parquet min/max stats skip
    // everything else on a selective scan
    val oneDay = back.filter(to_date(col("ts")) === "2024-01-05")
    val expected = events.filter(to_date(col("ts")) === "2024-01-05").count()
    assert(oneDay.count() == expected && expected > 0)
    val nFiles = oneDay.select(input_file_name()).distinct().count()
    assert(nFiles <= 2, s"day spread over $nFiles files; range layout broken")
  }

  test("dynamic partition overwrite replaces only the written days") {
    val out = Files.createTempDirectory("graft-dyn").resolve("events").toString
    val events = Tables.events(spark, sf())
    ParquetSink.writePartitionedByDay(events, "ts", out)
    val before = spark.read.parquet(out)
    val otherDaysBefore = before.filter(col("day") =!= "2024-01-05").count()

    // reprocess one day with a marker value
    val oneDay = events.filter(to_date(col("ts")) === "2024-01-05")
      .withColumn("value", lit(0.0))
    ParquetSink.overwriteDays(oneDay, "ts", out)

    val after = spark.read.parquet(out)
    // untouched days intact, target day fully replaced with marker rows
    assert(after.filter(col("day") =!= "2024-01-05").count() == otherDaysBefore)
    val replaced = after.filter(col("day") === "2024-01-05")
    assert(replaced.count() == oneDay.count())
    assert(replaced.filter(col("value") =!= 0.0).count() == 0)
  }

  test("compaction merges small files without changing the data") {
    val base = Files.createTempDirectory("graft-compact")
    val frag = base.resolve("frag").toString
    val tidy = base.resolve("tidy").toString
    val events = Tables.events(spark, sf())
    events.repartition(37).write.parquet(frag) // deliberately fragmented
    assert(spark.read.parquet(frag).select(input_file_name())
      .distinct().count() == 37)

    ParquetSink.compact(spark, frag, tidy, targetMB = 128)
    val back = spark.read.parquet(tidy)
    assert(back.select(input_file_name()).distinct().count() == 1) // tiny data → 1 file
    assert(back.count() == events.count())
    assert(back.exceptAll(spark.read.parquet(frag)).isEmpty)
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

  test("JSONL shard sink: one ordered file per shard, lossless, deterministic") {
    val docs = Tables.documents(spark, sf())
    val out = Files.createTempDirectory("graft-shards").resolve("corpus").toString
    graft.sources.JsonlShardSink.writeShards(docs, "doc_id", nShards = 8, out)

    // exactly one data file per shard directory, all 8 shards present
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(dirs.map(_.getName).toSet ==
      (0 until 8).map(s => s"shard=$s").toSet)
    dirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".json"))
      assert(files.length == 1, s"${d.getName}: ${files.length} files")
    }

    // lossless round-trip: same doc_id multiset, text survives JSON
    val back = spark.read.json(out)
    assert(back.count() == docs.count())
    assert(back.select("doc_id").exceptAll(docs.select("doc_id")).isEmpty)

    // file line order IS pos order (the property a streaming loader
    // relies on): read one shard file raw and compare to the query form
    val expected = graft.ext.DataSplit
      .shuffledShards(docs, "doc_id", nShards = 8)
      .filter(col("shard") === 3).orderBy("pos")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val raw = spark.read.json(s"$out/shard=3")
      .select("doc_id", "pos").collect()
      .sortBy(_.getLong(1)).map(_.getLong(0)).toSeq
    val rawLineOrder = scala.io.Source.fromFile(
        dirs.find(_.getName == "shard=3").get.listFiles()
          .filter(_.getName.endsWith(".json")).head)
      .getLines().map(l => """"doc_id":(\d+)""".r
        .findFirstMatchIn(l).get.group(1).toLong).toSeq
    assert(expected == raw)
    assert(expected == rawLineOrder)
  }

  test("g32: weekly sketch rollup honors both contracts at sparse AND dense tiers") {
    // sf0.001 → ~15 distinct/week (sparse coupon mode, estimates exact);
    // sf0.1 → ~1500 distinct/week (dense HLL registers, real estimation)
    for (tier <- Seq("sf0.001", "sf0.1")) {
      val rows = graft.analytics.Pipelines.sketchRollup(spark, sf(tier)).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getBoolean(2), s"$tier hll_ok: $r")
        assert(r.getBoolean(3), s"$tier merge_ok: $r")
      }
    }
  }

  test("g32: sketch union is merge-shape invariant (flat ≡ hierarchical)") {
    // the property that makes per-day sketches safe to roll up in ANY
    // tree shape (per-executor partials, multi-level reduce): unioning
    // the 7 dailies flat vs odd/even-day partials first must agree on
    // identical register state — estimates equal exactly, dense tier
    val ev = Tables.events(spark, sf("sf0.1")).select(
      date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week"),
      date_trunc("day", col("ts")).as("day"), col("user_id"))
    val daily = ev.groupBy("week", "day")
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      .withColumn("g", dayofmonth(col("day")) % 2)
    val flat = daily.groupBy("week")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val hier = daily.groupBy("week", "g")
      .agg(expr("hll_union_agg(sk, false)").as("p"))
      .groupBy("week")
      .agg(expr("hll_sketch_estimate(hll_union_agg(p, false))").as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(flat == hier)
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
