package graft.ext

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pretraining sequence construction: place every document at its token
  * offset in the doc_id-ordered concatenated token stream, then cut the
  * stream into fixed-length training sequences — the GPT-style packing
  * step that turns a cleaned corpus into model batches.
  */
object Packing {

  /** Token offset + sequence assignment for each doc.
    *
    * The naive formulation is one global window
    * (`sum over (order by doc_id)`), which Spark executes in a SINGLE
    * partition — a non-starter at 100 TB. This is a TWO-LEVEL
    * distributed prefix sum instead: (1) per-bucket token subtotals
    * (buckets are fixed doc_id ranges, so the layout is deterministic
    * and partition-independent), (2) per-SUPERBUCKET subtotals over
    * those, and only the superbucket totals — nDocs/bucketSize² entries,
    * ~6K tuples even at 10¹¹ docs — reach the driver for the running
    * sum, (3) a bounded window (≤ bucketSize rows per partition) turns
    * superbucket bases into bucket bases, (4) a window WITHIN each
    * bucket places the docs. Output is bit-identical to the global
    * window. Null ids or token counts fail LOUDLY at execution (they
    * would silently poison every downstream offset).
    *
    * Returns (idCol, nTokCol, tok_offset, seq_id, n_seqs): the doc's
    * first token lands in `seq_id` = tok_offset DIV seqLen and the doc
    * spans `n_seqs` consecutive sequences (docs cross cut points —
    * that's the point of packing; no padding waste).
    */
  def tokenOffsets(df: DataFrame, seqLen: Int = 2048, bucketSize: Long = 4096,
      idCol: String = "doc_id", nTokCol: String = "n_tokens"): DataFrame = {
    require(seqLen > 0 && bucketSize > 0)
    val spark = df.sparkSession
    import spark.implicits._
    // coalesce(when-guard, raise_error) — free when the schema already
    // proves non-null (Catalyst folds it away), a per-row guard
    // otherwise. Negative counts are poison too (they'd silently shift
    // every later offset down and break the manifest tiling), so the
    // when() nulls them into the same raise_error arm.
    val bucketed = df.select(
        coalesce(col(idCol), raise_error(
          lit(s"Packing.tokenOffsets: null `$idCol`"))).as(idCol),
        coalesce(when(col(nTokCol) >= 0, col(nTokCol).cast("long")),
          raise_error(lit(
            s"Packing.tokenOffsets: null or negative `$nTokCol`")))
          .as(nTokCol))
      .withColumn("_bkt", expr(s"`$idCol` DIV $bucketSize"))
    // eager ckptLocal: the bucket-totals aggregation runs ONCE — the
    // superbucket collect below and the bktBases branch of the final
    // plan both read the materialized 2-replica blocks instead of
    // re-scanning the source, and the blocks are ContextCleaner-freed
    // when the returned frame is GC'd. A RELIABLE checkpoint is the
    // wrong tool for this per-call shape even in production
    // (Checkpoints.ckptLocal's rule): its files are never auto-removed
    // and the returned plan reads them, so every call would leak one
    // checkpoint dir. nDocs/bucketSize rows (~24M at 10^11 docs) sit
    // comfortably in executor storage; a double executor-loss between
    // here and consumption fails the job and the caller retries —
    // packing is deterministic.
    val bktTotals = Checkpoints.ckptLocal(
      bucketed.groupBy("_bkt").agg(sum(nTokCol).as("_tot"))
        .withColumn("_sbkt", expr(s"_bkt DIV $bucketSize")))
    val superTotals = bktTotals.groupBy("_sbkt").agg(sum("_tot").as("_stot"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val superBases = superTotals.map { case (b, t) =>
      val base = (b, acc); acc += t; base }
    val superBaseDf = superBases.toSeq.toDF("_sbkt", "_sbase")
    val wb = Window.partitionBy("_sbkt").orderBy("_bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bktBases = bktTotals.join(F.broadcast(superBaseDf), "_sbkt")
      .withColumn("_base",
        col("_sbase") + coalesce(sum(col("_tot")).over(wb), lit(0L)))
      .select("_bkt", "_base")
    val w = Window.partitionBy("_bkt").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    // bucket-bases side is nDocs/bucketSize rows — AQE broadcasts it at
    // test scale and shuffles both sides on _bkt beyond broadcast size
    bucketed.join(bktBases, "_bkt")
      .withColumn("tok_offset",
        col("_base") + coalesce(sum(col(nTokCol)).over(w), lit(0L)))
      .select(col(idCol), col(nTokCol), col("tok_offset"),
        expr(s"tok_offset DIV $seqLen").as("seq_id"),
        // a ZERO-token doc spans zero sequences by definition; without
        // the case, the `-1` trick makes its n_seqs position-dependent
        // (0 exactly on a cut boundary, 1 otherwise) — inconsistent
        // metadata any docs-per-sequence consumer would double-count.
        // Mirrored in the t13 oracle SQL.
        when(col(nTokCol) === 0, lit(0L))
          .otherwise(expr(s"(tok_offset + `$nTokCol` - 1) DIV $seqLen")
            - expr(s"tok_offset DIV $seqLen") + 1).as("n_seqs"))
  }

  /** Explode a [[tokenOffsets]] result into the per-(sequence, doc)
    * manifest a training data loader consumes: for every sequence a doc
    * touches, where inside the sequence the doc's tokens start
    * (`seq_start`) and how many land there (`n_tok`). Every sequence's
    * rows tile [0, seqLen) exactly (spec-pinned), so a loader can
    * materialize sequence `s` by concatenating its rows ordered by
    * `seq_start` — a pure per-row explode over the offsets, no extra
    * shuffle beyond [[tokenOffsets]]'s own. */
  def sequenceManifest(offsets: DataFrame, seqLen: Int = 2048,
      idCol: String = "doc_id", nTokCol: String = "n_tokens"): DataFrame = {
    val s = col("seq")
    val start = greatest(col("tok_offset"), s * seqLen)
    // seqLen is an INVISIBLE contract with the tokenOffsets call that
    // produced `offsets` — a mismatch would emit mis-tiled rows with
    // no error. Both ends of the doc's span are recomputable per row,
    // so the guard rides the id column and checks BOTH tiles: the
    // first-tile check (seq_id = tok_offset DIV seqLen) alone is
    // necessary but not sufficient — offsets built with seqLen=1024
    // and served with seqLen=2048 pass it on every row whose offset
    // sits below the first cut, yet a doc that crossed the original
    // 1024 boundary (stored n_seqs=2) would emit a phantom second tile
    // with negative n_tok. The last-tile check (the doc's final token
    // must land in seq_id + n_seqs - 1 under THIS seqLen) catches
    // exactly that shape; rows here all have n_tokens > 0, so the
    // last-token arithmetic is total.
    val idChecked = coalesce(
      when(col("seq_id") === expr(s"tok_offset DIV $seqLen") &&
          expr(s"(tok_offset + `$nTokCol` - 1) DIV $seqLen") ===
            col("seq_id") + col("n_seqs") - 1, col(idCol)),
      raise_error(lit(s"Packing.sequenceManifest: seqLen=$seqLen does not " +
        "match the seqLen the offsets were built with")))
    offsets.filter(col(nTokCol) > 0)
      .withColumn("seq",
        explode(sequence(col("seq_id"), col("seq_id") + col("n_seqs") - 1)))
      .select(
        s.as("seq_id"), idChecked.as(idCol),
        (start - s * seqLen).as("seq_start"),
        (least(col("tok_offset") + col(nTokCol), (s + 1) * seqLen) - start)
          .as("n_tok"))
  }
}
