package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-side corpus preparation — the stages between a cleaned
  * corpus and a RAG / search serving layer: fixed-size overlapping
  * chunking for embedding + retrieval, and a positional inverted index
  * over the mid-frequency vocabulary.
  *
  * (The reference engine has no retrieval surface; these extend the
  * LLM-data-pipeline family the same way `LmQuality` / `Similarity`
  * do. Scoring lives in `TextAnalysis.bm25` (t19); ANN over chunk
  * embeddings is the existing v-family.)
  *
  * Both operators follow the repo's oracle discipline (see `Viewing`):
  * every cross-row aggregate is an exact integer, orderings inside
  * concatenated posting strings are total (position, then doc id), and
  * the only doubles are per-row finishing expressions the DuckDB oracle
  * spells in the same IEEE order.
  */
object Retrieval {

  /** t22 — fixed-size overlapping token chunking (RAG units).
    *
    * Every document is tiled with windows of `window` tokens advancing
    * by `stride` (< window ⇒ overlap of window−stride tokens, the
    * standard trick so no answer span straddles a chunk boundary
    * unseen). Chunk count is the exact integer
    * `1 + ceil(max(n−window, 0) / stride)`: the final window is the
    * only short one, and a document shorter than one window yields
    * exactly one chunk. Emitted columns: (doc_id, chunk_id, start_tok,
    * n_tok, chunk_text).
    *
    * Plan shape: split → sequence → explode — pure per-row codegen,
    * ZERO shuffle, no state; at 100 TB this pipelines inside the scan
    * stage and the output partitioning inherits the input's (chunks of
    * a document stay in its partition, which is what the downstream
    * embedding batch step wants). All arithmetic is integer; the chunk
    * grid is a pure function of n_tokens, so re-running on a grown
    * corpus never re-chunks old documents differently (stable chunk
    * ids for incremental embedding). */
  def chunks(docs: DataFrame, window: Int = 64, stride: Int = 48,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val toks = split(col(textCol), " ")
    val n = size(toks).cast("long")
    // integer ceil-div (Column./ is true division — it would make the
    // chunk count a double); the oracle spells the identical `//` form
    val nChunks = when(col("_n") <= window, lit(1L))
      .otherwise(expr(s"(_n - $window + ${stride - 1}) DIV $stride") + 1L)
    docs
      .select(col(idCol), toks.as("_w"), n.as("_n"))
      .select(col(idCol), col("_w"), col("_n"), nChunks.as("_nc"))
      .select(col(idCol), col("_w"), col("_n"),
        explode(sequence(lit(0L), col("_nc") - 1L)).as("chunk_id"))
      .select(
        col(idCol),
        col("chunk_id"),
        (col("chunk_id") * stride).as("start_tok"),
        least(lit(window.toLong), col("_n") - col("chunk_id") * stride)
          .as("n_tok"),
        concat_ws(" ", slice(col("_w"),
          (col("chunk_id") * stride + 1L).cast("int"),
          least(lit(window.toLong), col("_n") - col("chunk_id") * stride)
            .cast("int"))).as("chunk_text"))
  }

  /** t23 — positional inverted index over the mid-frequency band.
    *
    * For every token with document frequency in [minDf, maxDf]: df
    * (distinct documents), tf (total occurrences), and the full
    * positional postings rendered as a canonical string
    * `"doc:p1|p2;doc:p1"` — entries ordered by doc id, positions
    * ascending — so the result is flat, hash-comparable, and directly
    * writable as an index shard. The df band is the practical retrieval
    * vocabulary: below minDf is noise, above maxDf is stopwords whose
    * posting lists are both useless and the only unbounded-size rows.
    *
    * Plan shape (two-phase, skew-proof by construction):
    *  1. df per token over map-side-combined DISTINCT (token, doc)
    *     pairs — the only corpus-wide token-string shuffle, and each
    *     mapper emits each (token, doc) once;
    *  2. the banded vocabulary (small by definition — df ≤ maxDf bounds
    *     every group) broadcast-joins back onto the position stream, so
    *     postings are built ONLY for banded tokens: the stopword mass —
    *     the skewed groups that would dominate a naive
    *     groupBy(token).collect_list — is dropped before the exchange.
    *     Per-group state is bounded by maxDf · doc length, never by
    *     corpus size. */
  def invertedIndex(docs: DataFrame, minDf: Long = 5, maxDf: Long = 100,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(0 < minDf && minDf <= maxDf, s"bad df band [$minDf, $maxDf]")
    val tokPos = docs.select(col(idCol),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
    val vocab = tokPos.select(col("tok"), col(idCol)).distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .filter(col("df").between(minDf, maxDf))
    val perDoc = tokPos.join(broadcast(vocab), Seq("tok"))
      .groupBy(col("tok"), col("df"), col(idCol))
      .agg(count(lit(1)).as("cnt"),
        concat_ws("|", array_sort(collect_list(col("pos")))).as("pl"))
    perDoc.groupBy("tok", "df")
      .agg(sum("cnt").as("tf"),
        array_join(transform(
          array_sort(collect_list(struct(col(idCol), col("pl")))),
          e => concat(e.getField(idCol).cast("string"), lit(":"),
            e.getField("pl"))), ";").as("postings"))
      .select(col("tok"), col("df"), col("tf"), col("postings"))
  }

  /** The corpus's most frequent bigram, with a total tie order —
    * count desc, then the space-joined bigram string ascending (space
    * sorts below every token character in both engines, so this equals
    * the (w1, w2) tuple order and DuckDB can spell it on one column).
    * A metadata-scale driver collect — one row — the same rule that
    * lets IVF hold its centroids driver-side. */
  def topBigram(docs: DataFrame, textCol: String = "text"): (String, String) = {
    val w = split(col(textCol), " ")
    val row = docs
      .select(posexplode(
        zip_with(slice(w, lit(1), greatest(size(w) - 1, lit(0))),
          slice(w, lit(2), greatest(size(w) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b))).as(Seq("_p", "bg")))
      .groupBy("bg").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bg"))
      .limit(1).collect().head
    val parts = row.getString(0).split(" ", 2)
    (parts(0), parts(1))
  }

  /** t25 — positional phrase search: every (doc, start) where the
    * phrase's tokens occur consecutively. The query-side consumer of
    * the t23 positional index, expressed as the textbook posting-list
    * intersection: one positions stream per phrase term, each shifted
    * to its would-be phrase START (`pos − i`), then intersected on
    * (doc, start) — a token chain matches iff every shifted stream
    * contains the same start.
    *
    * Plan shape at 100 TB: the scan is filtered to the phrase's terms
    * BEFORE any exchange (an `isin` over typically 2-5 strings —
    * selectivity of a posting-list read, pushable into an index-shard
    * scan), so the join keys are the phrase terms' postings only, never
    * the corpus; the per-term streams then co-partition on (doc, start)
    * and every join after the first reuses that exchange. Each stream
    * has unique (doc, start) rows by construction (one token occupies
    * one position), so the intersection needs no distinct. */
  def phraseSearch(docs: DataFrame, phrase: Seq[String],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val tokPos = docs.select(col(idCol),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
      .filter(col("tok").isin(phrase.distinct: _*))
    val streams = phrase.zipWithIndex.map { case (w, i) =>
      tokPos.filter(col("tok") === w)
        .select(col(idCol), (col("pos").cast("long") - i).as("start"))
    }
    streams.reduce((a, b) => a.join(b, Seq(idCol, "start")))
      .withColumn("phrase", lit(phrase.mkString(" ")))
  }
}
