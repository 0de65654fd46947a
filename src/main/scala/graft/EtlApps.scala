package graft

import org.apache.spark.sql.SparkSession
import graft.ops.ReferenceEtl
import graft.sources.{CsvSink, LogSource}

/** Drop-in replacements for the reference's entry-point scripts, same
  * inputs (daily ES-export JSONL) and outputs (single-file CSV with
  * header), dates as CLI args instead of stdin prompts.
  */

/** Replaces `ETL_one_day/ETL_one_day.py`:
  * usage: EtlOneDay <dailyJsonPath> <outCsvDir> <dateLabel>
  * (pivot keeps faithful null cells; Date literal column appended). */
object EtlOneDay {
  def main(args: Array[String]): Unit = {
    if (args.length != 3) {
      System.err.println("usage: EtlOneDay <dailyJsonPath> <outCsvDir> <dateLabel>")
      sys.exit(2)
    }
    val Array(inPath, outDir, dateLabel) = args
    val spark = GraftSession.local(appName = "graft-etl-one-day")
    val flat = LogSource.flattenSource(LogSource.readDay(spark, inPath))
    val result = ReferenceEtl.oneDayPipeline(flat, dateLabel)
    result.show(5)
    CsvSink.writeSingle(result, outDir)
    spark.stop()
  }
}

/** End-to-end training-corpus build over a `documents.parquet` dir —
  * the library's one-command corpus deliverable:
  *   1. exact dedup (keep first), then span-removal substring dedup
  *   2. repetition gate (x14's integer thresholds)
  *   3. leakage-safe cluster split on the ORIGINAL near-dup clusters
  *   4. weighted source mixing on the train side
  * Writes `clean/`, `split/`, `mixed/` parquet under <outDir>.
  * usage: CorpusBuild <documentsDir> <outDir>
  */
object CorpusBuild {
  def main(args: Array[String]): Unit = {
    if (args.length != 2) {
      System.err.println("usage: CorpusBuild <documentsDir> <outDir>")
      sys.exit(2)
    }
    val Array(dataDir, outDir) = args
    val spark = GraftSession.local(appName = "graft-corpus-build")
    val clean = graft.analytics.ExtPipelines.cleanCorpusV2(spark, dataDir)
    clean.write.mode("overwrite").parquet(s"$outDir/clean")
    val split = graft.analytics.ExtPipelines.clusterSplit(spark, dataDir)
      .join(clean.select("doc_id", "source"), "doc_id")
    split.write.mode("overwrite").parquet(s"$outDir/split")
    val mixed = graft.ext.DataSplit.mix(
      split.filter(org.apache.spark.sql.functions.col("split") === "train")
        .select("doc_id", "source"),
      "doc_id", Map("src0" -> 2.0, "src1" -> 1.5, "src2" -> 0.25),
      defaultWeight = 0.75)
    mixed.write.mode("overwrite").parquet(s"$outDir/mixed")
    // final stage: the loader-ready artifact — mixed examples joined
    // back to their text and exported as pre-shuffled JSONL shards
    // (deterministic salted-md5 shard + order; one file per shard).
    // example_id spreads a doc's mix copies across shards.
    locally {
      import org.apache.spark.sql.functions._
      val examples = spark.read.parquet(s"$outDir/mixed")
        .withColumn("example_id",
          concat_ws("#", col("doc_id"), col("copy_idx")))
        .join(graft.sources.Tables.documents(spark, dataDir)
          .select("doc_id", "text"), "doc_id")
        .select("example_id", "doc_id", "copy_idx", "source", "text")
      graft.sources.JsonlShardSink.writeShards(
        examples, "example_id", nShards = 8, s"$outDir/shards")
    }
    // count the WRITTEN output, not the source frames: re-counting the
    // frames would re-execute all the pipelines (including the
    // iterative connected-components job) just for this log line,
    // whereas counting the output is a footer/file read
    def written(sub: String): Long = spark.read.parquet(s"$outDir/$sub").count()
    val nShardRows = spark.read.json(s"$outDir/shards").count()
    println(s"[graft] corpus build: clean=${written("clean")} " +
      s"split=${written("split")} mixed=${written("mixed")} " +
      s"shard_examples=$nShardRows → $outDir")
    spark.stop()
  }
}

/** One-command living-corpus refresh: the x19→x21→x20→x22 chain as an
  * app. Computes the snapshot delta, per-change magnitudes, the
  * admit/reject decisions, and the materialized next snapshot, each
  * written as parquet under `outDir`. Usage:
  * CorpusRefresh <documentsDir> <outDir> */
object CorpusRefresh {
  def main(args: Array[String]): Unit = {
    if (args.length != 2) {
      System.err.println("usage: CorpusRefresh <documentsDir> <outDir>")
      sys.exit(2)
    }
    val Array(dataDir, outDir) = args
    val spark = GraftSession.local(appName = "graft-corpus-refresh")
    val ext = graft.analytics.ExtPipelines
    ext.snapshotDiff(spark, dataDir)
      .write.mode("overwrite").parquet(s"$outDir/delta")
    ext.changeMagnitude(spark, dataDir)
      .write.mode("overwrite").parquet(s"$outDir/magnitude")
    ext.corpusRefresh(spark, dataDir)
      .write.mode("overwrite").parquet(s"$outDir/decisions")
    ext.nextSnapshot(spark, dataDir)
      .write.mode("overwrite").parquet(s"$outDir/next")
    // count the WRITTEN artifacts (footer reads), not the frames
    def written(sub: String): Long = spark.read.parquet(s"$outDir/$sub").count()
    println(s"[graft] corpus refresh: delta=${written("delta")} " +
      s"magnitude=${written("magnitude")} decisions=${written("decisions")} " +
      s"next=${written("next")} → $outDir")
    spark.stop()
  }
}

/** Replaces `ETL_full_output/ETL_full.py` (and the faster of the two
  * benchmark variants — one multi-file scan, `test_method1_readALL.py`):
  * usage: EtlFull <logDir> <outCsvDir> <fromDate yyyyMMdd> <toDate yyyyMMdd> */
object EtlFull {
  def main(args: Array[String]): Unit = {
    if (args.length != 4) {
      System.err.println("usage: EtlFull <logDir> <outCsvDir> <fromDate yyyyMMdd> <toDate yyyyMMdd>")
      sys.exit(2)
    }
    val Array(logDir, outDir, fromDate, toDate) = args
    val spark = GraftSession.local(appName = "graft-etl-full")
    val t0 = System.nanoTime()
    val result = ReferenceEtl.runFull(spark, logDir, fromDate, toDate)
    result.show(5)
    CsvSink.writeSingle(result, outDir)
    println(f"[graft] ETL full ${(System.nanoTime() - t0) / 1e9}%.2f s " +
      s"($fromDate..$toDate)")
    spark.stop()
  }
}
