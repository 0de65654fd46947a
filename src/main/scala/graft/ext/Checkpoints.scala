package graft.ext

import org.apache.spark.sql.DataFrame

/** The iterative-algorithm checkpoint discipline shared by
  * [[Dedup.connectedComponents]] (x9) and
  * [[graft.analytics.Pipelines.pageRank]] (g33): every round's result
  * is lineage-truncated (otherwise iteration k's plan contains
  * iterations 1..k-1 and optimizer time grows with `iters`), and a
  * SUPERSEDED round is freed eagerly instead of waiting for LRU
  * eviction or app exit — localCheckpoint blocks pile up in executor
  * memory/disk, and reliable checkpoint files are NOT auto-removed
  * (`spark.cleaner.referenceTracking.cleanCheckpoints` defaults to
  * false and non-final files survive app exit). */
private[graft] object Checkpoints {

  /** Lineage-truncate `df`: reliable `checkpoint()` when the session
    * has a checkpoint dir (the production setting), `localCheckpoint()`
    * otherwise. Both are EAGER — the returned frame is materialized,
    * so freeing its inputs afterwards is safe. */
  def ckpt(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else df.localCheckpoint()

  /** Lineage-truncate a DELTA-SIZED frame with `localCheckpoint()`
    * REGARDLESS of the session's checkpoint-dir setting. For small
    * per-call results inside a long-running service (x26's rejected-id
    * set), a reliable checkpoint is the wrong tool even in production:
    * its files are never auto-removed, so every ingest call would leak
    * one directory. localCheckpoint blocks, by contrast, ARE reclaimed
    * by the ContextCleaner once the RDD is garbage-collected — the
    * frame cleans itself up when the caller drops it.
    *
    * Local checkpoint blocks are NOT recomputable (the lineage is
    * truncated by design), so a lost executor between materialization
    * and consumption would fail the job — exactly the hazard of the
    * long-running-service deployment this path serves. The blocks are
    * therefore written at `MEMORY_AND_DISK_2` (2 replicas): a single
    * executor loss — crash or dynamic-allocation decommission — leaves
    * the surviving replica readable and the batch completes. A
    * SIMULTANEOUS loss of both replica holders still fails the batch;
    * the service's contract is retry-the-batch on that (rare) double
    * fault, which is safe because ingest admission is deterministic. */
  def ckptLocal(df: DataFrame): DataFrame =
    df.localCheckpoint(eager = true,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_2)

  /** Free a [[ckpt]] result that has been SUPERSEDED (its successor is
    * fully materialized and no returned plan reads it): deletes the
    * reliable checkpoint files or unpersists the localCheckpoint
    * blocks. A no-op on frames that are not checkpoint roots.
    *
    * The reliable-vs-local decision reads the RDD ITSELF (a reliable
    * checkpoint carries its file path; a local one has none), NOT the
    * session's checkpoint-dir setting at free time — the setting can
    * change between ckpt and free, and deciding from it would either
    * silently leak localCheckpoint blocks (dir set after a local ckpt:
    * getCheckpointFile is None, nothing freed) or unpersist a reliable
    * frame while its files stay on disk (dir cleared after a reliable
    * ckpt). */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        val sc = df.sparkSession.sparkContext
        lr.rdd.getCheckpointFile match {
          case Some(f) =>
            val p = new org.apache.hadoop.fs.Path(f)
            p.getFileSystem(sc.hadoopConfiguration).delete(p, true)
          case None => lr.rdd.unpersist(blocking = false)
        }
      case _ => ()
    }
}
