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
    * partition — a non-starter at 100 TB. This is the scalable two-pass
    * prefix sum instead: (1) per-bucket token subtotals (buckets are
    * fixed doc_id ranges, so the layout is deterministic and partition-
    * independent), (2) a driver-side running sum over the subtotals —
    * metadata scale, nDocs/bucketSize entries, same justification as the
    * IVF centroid collect — broadcast back, (3) a window WITHIN each
    * bucket. Output is bit-identical to the global window.
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
    val bucketed = df.select(col(idCol), col(nTokCol).cast("long").as(nTokCol))
      .withColumn("_bkt", expr(s"`$idCol` DIV $bucketSize"))
    val totals = bucketed.groupBy("_bkt")
      .agg(sum(nTokCol).as("_tot"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val bases = totals.map { case (b, t) => val base = (b, acc); acc += t; base }
    import spark.implicits._
    val baseDf = bases.toSeq.toDF("_bkt", "_base")
    val w = Window.partitionBy("_bkt").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(F.broadcast(baseDf), "_bkt")
      .withColumn("tok_offset",
        col("_base") + coalesce(sum(col(nTokCol)).over(w), lit(0L)))
      .select(col(idCol), col(nTokCol), col("tok_offset"),
        expr(s"tok_offset DIV $seqLen").as("seq_id"),
        (expr(s"(tok_offset + `$nTokCol` - 1) DIV $seqLen")
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
    offsets.filter(col(nTokCol) > 0)
      .withColumn("seq",
        explode(sequence(col("seq_id"), col("seq_id") + col("n_seqs") - 1)))
      .select(
        s.as("seq_id"), col(idCol),
        (start - s * seqLen).as("seq_start"),
        (least(col("tok_offset") + col(nTokCol), (s + 1) * seqLen) - start)
          .as("n_tok"))
  }
}
