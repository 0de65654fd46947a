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

  /** [[bucket]] with a salt appended to the id before hashing, so
    * independent sampling decisions (mixing vs train/test split) are
    * decorrelated — without the salt, "keep 50% of src1" would keep
    * exactly the first half of the train split's hash range. */
  def bucketSalted(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 4), 16, 10)
      .cast("int")

  /** Deterministic weighted corpus mixing: each source's rows are
    * repeated `weight` times in expectation — floor(weight) full copies
    * for every row, plus one more when the row's salted bucket falls
    * under the fractional part. Weights >1 model epoch up-sampling of
    * high-quality sources; weights <1 down-sample. A pure per-row
    * decision (codegen'd CASE + explode, ZERO shuffle), stable across
    * runs and cluster sizes — `df.sample()` is neither. Emits one row
    * per copy with `copy_idx` (0-based) so downstream shuffles spread
    * the copies. Weights should be expressible in 1/65536ths (the
    * bucket granularity) to stay engine-portable. */
  def mix(df: DataFrame, idCol: String, weights: Map[String, Double],
      defaultWeight: Double, sourceCol: String = "source",
      salt: String = "#mix"): DataFrame = {
    val bkt = bucketSalted(col(idCol), salt)
    def copiesFor(w: Double): Column = {
      require(w >= 0, s"negative mix weight $w")
      val nFull = math.floor(w).toLong
      val thresh = math.round((w - nFull) * 65536).toInt
      lit(nFull) + when(bkt < thresh, 1L).otherwise(0L)
    }
    val copies = weights.toSeq.sortBy(_._1).foldRight(copiesFor(defaultWeight)) {
      case ((s, w), acc) => when(col(sourceCol) === s, copiesFor(w)).otherwise(acc)
    }
    df.withColumn("copy_idx",
      explode(when(copies > 0, sequence(lit(0L), copies - 1))
        .otherwise(array().cast("array<long>"))))
  }

  /** Deterministic global shuffle + shard assignment — the step between
    * a cleaned corpus and its training-export files. Training loaders
    * stream shards sequentially, so inter-example randomness must be
    * baked in at export time; `orderBy(rand())` is seed-, plan- and
    * partitioning-dependent, while this is a pure function of
    * (id, salt): `shard` = salted md5 bucket mod `nShards`, `pos` =
    * rank of the full md5 hex within the shard. Stable across runs,
    * engines, and cluster sizes — re-exporting an unchanged corpus
    * yields byte-identical shards (appending docs keeps every existing
    * row's SHARD but can shift later `pos` ranks within it).
    *
    * Scale shape: one hash-partition exchange on `shard` and a
    * per-shard sort — no global sort, no single-task funnel. The
    * per-shard `row_number` window means parallelism = `nShards`;
    * at 100 TB pick `nShards` >= cluster cores (training exports want
    * thousands of shards anyway, so this is the natural regime). */
  def shuffledShards(df: DataFrame, idCol: String, nShards: Int,
      salt: String = "#shard"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    import org.apache.spark.sql.expressions.Window
    val key = md5(concat(col(idCol).cast("string"), lit(salt)))
    val w = Window.partitionBy(col("shard")).orderBy(col("_k"), col(idCol))
    df.withColumn("_k", key)
      .withColumn("shard",
        pmod(conv(substring(col("_k"), 1, 4), 16, 10).cast("int"), lit(nShards)))
      .withColumn("pos", row_number().over(w))
      .drop("_k")
  }
}
