package graft.ext

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Hadoop-FileSystem helpers for the persisted-index MAINTENANCE layer
  * (MinHash / IVF tombstones, compactions, streaming-delta folds).
  *
  * The index layouts are written and read by Spark's parquet
  * writers/readers, which speak to whatever FileSystem the path names
  * (`file:/`, `hdfs:/`, `s3a:/`). The maintenance side must resolve
  * paths the SAME way: a `java.io.File` existence check against an
  * `hdfs://` index is simply false on the driver's local disk — which
  * would turn takedown deletes into silent no-ops (tombstones written
  * but never loaded) and compactions into no-ops on exactly the
  * cluster deployments the 100 TB design targets. Every helper here
  * resolves the FileSystem FROM the path against the session's Hadoop
  * configuration, so local tests exercise the identical code path
  * (LocalFileSystem) that HDFS/S3 deployments run.
  *
  * Rename caveat: [[move]] is a same-FileSystem rename — atomic-ish on
  * HDFS, a copy on S3A — which is why the compaction staging dirs live
  * UNDER the index path (hidden `.`-prefixed, so Spark's reader and
  * [[hasParquetData]] both skip them), never on the driver's /tmp. */
private[graft] object IndexFs {
  def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new Path(path))

  /** Recursive delete; quiet on absence. */
  def delete(spark: SparkSession, path: String): Unit = {
    val f = fs(spark, path)
    val p = new Path(path)
    if (f.exists(p)) f.delete(p, true)
    ()
  }

  /** Move `src` onto `dst`, REPLACING dst: dst is removed first, then
    * src renamed in — so an absent src leaves dst GONE, which is the
    * swap semantics the compactions need for fully-emptied partitions.
    * Throws if the rename is refused (RawLocalFileSystem reports
    * failure by returning false, not by throwing). */
  def move(spark: SparkSession, src: String, dst: String): Unit = {
    val f = fs(spark, src)
    val (s, d) = (new Path(src), new Path(dst))
    if (f.exists(d)) f.delete(d, true)
    if (f.exists(s) && !f.rename(s, d))
      throw new java.io.IOException(s"rename refused: $src -> $dst")
  }

  /** Swap the AFFECTED `partCol=v` partition dirs of `dst` with the
    * rewritten ones under `src` — a partition absent from `src` (every
    * row deleted) ends with its dir GONE. The shared swap step of both
    * tombstone compactions.
    *
    * The REPLACE leg moves staged partitions by their ON-DISK names
    * (listed from `src`), never by re-formatting `affected` values —
    * a toString/dir-encoding mismatch therefore cannot point a rename
    * at the wrong directory. Only the REMOVE leg (affected partitions
    * Spark staged nothing for) formats values into names, where a
    * mismatch deletes a nonexistent name — a no-op that defers the
    * removal, never a deletion of live data. */
  def swapPartitions(spark: SparkSession, src: String, dst: String,
      partCol: String, affected: Seq[Any]): Unit = {
    val f = fs(spark, src)
    val srcPath = new Path(src)
    val staged: Set[String] =
      if (f.exists(srcPath))
        f.listStatus(srcPath).filter(_.isDirectory)
          .map(_.getPath.getName).filter(_.startsWith(s"$partCol=")).toSet
      else Set.empty
    staged.foreach(name => move(spark, s"$src/$name", s"$dst/$name"))
    affected.map(v => s"$partCol=$v").filterNot(staged)
      .foreach(name => delete(spark, s"$dst/$name"))
  }

  /** The shared REWRITE step of both tombstone compactions: read the
    * partitioned frame at `dir`, prune to the AFFECTED partitions (a
    * literal partition filter — spared partitions are never read),
    * anti-join the tombstone ids out, stage the survivors under `tmp`,
    * [[swapPartitions]] them in, and [[anchorIfEmpty]] the layout. */
  def compactPartitions(spark: SparkSession, dir: String, tmp: String,
      partCol: String, affected: Seq[Any],
      tomb: org.apache.spark.sql.DataFrame, idCol: String): Unit = {
    import org.apache.spark.sql.functions.col
    val shape = spark.read.parquet(dir)
    shape.filter(col(partCol).isin(affected: _*))
      .join(tomb, Seq(idCol), "left_anti")
      .repartition(col(partCol))
      .write.partitionBy(partCol).parquet(tmp)
    swapPartitions(spark, tmp, dir, partCol, affected)
    anchorIfEmpty(spark, dir, partCol, shape)
  }

  /** If `dir` holds no committed footers (a compaction deleted EVERY
    * row), write one empty SCHEMA-ANCHOR file inside a `partCol=0` dir
    * so the layout stays readable (a bare read over a footer-less tree
    * throws at schema inference) and stays consistent with later
    * partitioned appends. `shape.limit(0)` folds to an empty local
    * relation carrying the frame's resolved schema, so no stale file
    * listing is ever read. Shared by both tombstone compactions. */
  def anchorIfEmpty(spark: SparkSession, dir: String, partCol: String,
      shape: org.apache.spark.sql.DataFrame): Unit =
    if (!hasParquetData(spark, dir))
      shape.limit(0).drop(partCol).coalesce(1)
        .write.mode("append").parquet(s"$dir/$partCol=0")

  /** The standing tombstone ids of a persisted index, if any — None
    * when the dir is absent or holds no committed footers. The shared
    * loader behind `Dedup.loadMinhashTombstones` and
    * `Similarity.loadIvfTombstones`. */
  def loadTombstones(spark: SparkSession, path: String,
      idCol: String): Option[org.apache.spark.sql.DataFrame] = {
    val d = s"$path/tombstones"
    if (hasParquetData(spark, d))
      Some(spark.read.parquet(d)
        .select(org.apache.spark.sql.functions.col(idCol)))
    else None
  }

  /** True iff the tree under `path` holds at least one COMMITTED
    * parquet DATA file. A partitioned write of an empty frame leaves
    * only `_SUCCESS` (no footers), and a bare `spark.read.parquet`
    * over a footer-less tree throws at schema inference — so presence
    * checks must look for FILES, not directory names. HIDDEN entries
    * (`_`/`.`-prefixed: `_temporary`, `_SUCCESS`, `.crc`, the
    * compaction staging dirs) are skipped, matching Spark's own path
    * filter — a write hard-killed mid-job leaves task files under
    * `_temporary` that Spark's reader will NOT surface; counting them
    * would wedge every replay on a dir Spark reads as empty. */
  def hasParquetData(spark: SparkSession, path: String): Boolean = {
    val f = fs(spark, path)
    def walk(p: Path): Boolean = {
      val entries = f.listStatus(p).filterNot { st =>
        val n = st.getPath.getName
        n.startsWith("_") || n.startsWith(".")
      }
      entries.exists(st => st.isFile && st.getPath.getName.endsWith(".parquet")) ||
        entries.exists(st => st.isDirectory && walk(st.getPath))
    }
    val p = new Path(path)
    f.exists(p) && walk(p)
  }
}
