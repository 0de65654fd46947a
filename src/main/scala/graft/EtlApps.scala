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
