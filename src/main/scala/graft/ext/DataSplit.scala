package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * `sample()`/`randomSplit()` are seed- and partitioning-dependent —
  * rerun the job with different parallelism and rows change sides.
  * Hash-bucket assignment is a pure function of the row id: stable
  * across runs, engines, and cluster sizes, and new rows never move
  * existing rows between splits. This is the only split discipline that
  * survives a 100 TB pipeline that is re-run incrementally.
  */
object DataSplit {

  /** Stable bucket in [0, 65536) from the md5 of the id's string form
    * (md5-hex is engine-portable — the DuckDB oracle reproduces it). */
  def bucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("int")

  /** 'train' / 'test' assignment at `trainPct` (default 80%). */
  def split(id: Column, trainPct: Double = 0.8): Column =
    when(bucket(id) < (trainPct * 65536).toInt, "train").otherwise("test")

  def withSplit(df: DataFrame, idCol: String, trainPct: Double = 0.8): DataFrame =
    df.withColumn("split", split(col(idCol), trainPct))
}
