package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Language-model-based corpus selection — the CCNet / DSIR stage of an
  * LLM data pipeline: score every document against a reference ("target")
  * corpus distribution and keep what looks like the target.
  *
  * Two operators, two LM representations, one scale discipline each:
  *
  *  - [[lmCoverage]] (t20) keys the LM on explicit bigram STRINGS with a
  *    min-count floor — the vocabulary-pruned LM that a CCNet-style
  *    quality filter broadcasts (min-count bounds the table regardless
  *    of corpus size; raise it as the corpus grows).
  *  - [[importanceRatio]] (t21) hashes bigrams into a FIXED 65536-bucket
  *    feature space (DSIR's hashed n-gram features) — the LM is
  *    fixed-size by construction, so it broadcasts at ANY corpus scale
  *    with zero tuning.
  *
  * Both follow the repo's determinism discipline (see `Viewing`): every
  * cross-row aggregate is an exact integer; doubles appear only in
  * per-row finishing expressions whose IEEE operation sequence the
  * DuckDB oracle spells identically.
  */
object LmQuality {

  /** Per-doc exploded bigrams with the doc's language tag. Uses the
    * native codegen'd n-gram expression (no HOF allocation per row);
    * docs with fewer than two words carry no bigrams and drop out —
    * mirrored by the oracle's `len(w) >= 2` guard. */
  private def bigrams(docs: DataFrame, textCol: String): DataFrame = {
    graft.functions.TextExpressions.registerNgrams(docs.sparkSession)
    val toks = split(col(textCol), " ")
    docs.filter(size(toks) >= 2)
      .select(col("doc_id"), col("lang"),
        explode(graft.functions.TextExpressions.ngrams(toks, 2)).as("b"))
  }

  /** t20 — CCNet-style LM quality filter, coverage form.
    *
    * Train a bigram "LM" on the target subset (`lang = 'en'`, min-count
    * `minCount`), then score every document by how much of it the LM has
    * seen: `coverage` = fraction of the doc's bigram tokens known to the
    * LM, `familiarity` = ln(1 + mean LM count over the doc's bigrams),
    * `keep` = coverage ≥ 60% (integer cross-multiplication, exact).
    * CCNet ranks by LM perplexity; coverage/familiarity is the same
    * signal computed from integer masses, which keeps the hash-compare
    * oracle exact (a per-doc float log-prob SUM would be
    * summation-order-dependent — banned here, see `Viewing`).
    *
    * Plan shape (PlanSpec-pinned): the LM aggregation is the only
    * corpus-wide shuffle of strings, and it runs over the TARGET subset
    * only; doc scoring is explode → broadcast hash join → partial-
    * combined integer aggregation, shuffling (doc_id, 3 longs) — never
    * text. At 100 TB: min-count (and a top-V cap if needed) bounds the
    * broadcast; the target subset is curated and small by definition. */
  def lmCoverage(docs: DataFrame, targetLang: String = "en",
      minCount: Int = 2, textCol: String = "text"): DataFrame = {
    val bg = bigrams(docs, textCol)
    val lm = bg.filter(col("lang") === targetLang)
      .groupBy("b").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
    val agg = bg.join(broadcast(lm), Seq("b"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c").isNotNull, 1L).otherwise(0L)).as("n_known"),
        coalesce(sum(col("c")), lit(0L)).as("known_mass"))
    agg.select(col("doc_id"), col("n_bigrams"), col("n_known"),
      col("known_mass"),
      (col("n_known").cast("double") / col("n_bigrams").cast("double"))
        .as("coverage"),
      log(lit(1.0) + col("known_mass").cast("double") /
        col("n_bigrams").cast("double")).as("familiarity"),
      (col("n_known") * 5 >= col("n_bigrams") * 3).as("keep"))
  }

  /** t31 — true LM negative-log-likelihood scoring (CCNet's actual
    * ranking signal), made hash-exact by µnat quantization.
    *
    * t20's scaladoc bans the per-doc float log-prob sum as
    * summation-order-dependent; this operator LIFTS that ban by
    * quantizing first: each bigram TYPE's −ln p is a per-row finishing
    * expression over exact integers (cbg, cpre, V) rounded once to
    * integer MICRO-NATS, and the per-doc score is then a sum of
    * integers — exact under any aggregation order, any partitioning,
    * both engines. The only float ops are one ln and one final
    * division, both spelled in the oracle's IEEE order; a round()
    * boundary flip would need the two engines' ln to differ by ~5e-7
    * (they agree to ~1e-15 — t19/t20 hash-compare raw ln outputs).
    *
    * Model: add-one-smoothed char-bigram conditional,
    * p(c₂|c₁) = (count(c₁c₂) + 1) / (count(c₁·) + V), V = charset
    * size. Char bigrams (vs t20/t21's word bigrams) make the LM
    * intrinsically bounded: |charset|² types regardless of corpus
    * size, so the broadcast needs no min-count pruning at ANY scale.
    *
    * Plan shape: the model build map-side-combines the exploded
    * bigrams to ≤|charset|² rows per partition before its only
    * shuffle; scoring is explode → broadcast hash join → one shuffle
    * of (doc_id, two longs). Document text never shuffles. Score =
    * mean −ln p per bigram in nats (lower = more typical of the
    * corpus; the quality gate drops the high tail). */
  def bigramNll(docs: DataFrame, textCol: String = "text"): DataFrame = {
    graft.functions.TextExpressions.registerCharBigrams(docs.sparkSession)
    val d = docs.filter(length(col(textCol)) >= 2)
      .select(col("doc_id"), col(textCol))
    // native one-pass bigram walk — the declarative
    // transform(sequence)/substring form is O(len²) per doc (substring
    // re-walks the UTF-8 bytes per position) and measured super-linear
    // at the 10× tier; see [[graft.functions.CharBigrams]]
    def positions(df: DataFrame): DataFrame = df.select(col("doc_id"),
      explode(graft.functions.TextExpressions.charBigrams(col(textCol))).as("b"))
    val pos = positions(d)
    val model = pos.groupBy("b").agg(count(lit(1)).as("cbg"))
    val pre = model.groupBy(substring(col("b"), 1, 1).as("p"))
      .agg(sum("cbg").as("cpre"))
    val v = model.select(substring(col("b"), 1, 1).as("ch"))
      .union(model.select(substring(col("b"), 2, 1).as("ch")))
      .distinct().agg(count(lit(1)).as("v"))
    val u = model
      .join(broadcast(pre), substring(col("b"), 1, 1) === col("p"))
      .crossJoin(broadcast(v))
      .select(col("b"),
        round(log((col("cbg").cast("double") + lit(1.0)) /
          (col("cpre").cast("double") + col("v").cast("double"))) *
          lit(-1000000.0)).cast("long").as("unat"))
    positions(d).join(broadcast(u), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("unat")).as("nll_unats"))
      .select(col("doc_id"), col("n_bigrams"), col("nll_unats"),
        (col("nll_unats").cast("double") /
          (col("n_bigrams").cast("double") * lit(1000000.0))).as("nll"))
  }

  /** t32 — classifier-based quality filter: multinomial Naive Bayes
    * log-odds over word unigrams, the closed form of the fastText
    * supervised filter that modern pretrain pipelines (CCNet, DCLM,
    * FineWeb-Edu) train on "target vs other" labels. Logistic
    * regression / fastText need iterative float training — banned by
    * the hash-compare discipline — but NB's weights are a per-TYPE
    * finishing expression over exact integer counts, so the whole
    * model quantizes to µnats exactly like [[bigramNll]]:
    *
    *   w(t) = ln( ((c_t+1)·(N_o+V)) / ((c_o+1)·(N_t+V)) )   [µnat-rounded]
    *   prior = ln( (D_t+1) / (D_o+1) )                      [µnat-rounded]
    *   logodds(doc) = prior + Σ_token w(token)              [exact int sum]
    *   keep ⟺ logodds > 0  (P(target) > ½)
    *
    * where c_t/c_o are the type's token counts in target (`lang =
    * targetLang`) / other docs, N_t/N_o the total token masses, V the
    * corpus vocabulary size, D_t/D_o the doc counts. Types with total
    * count < `minCount` are PRUNED from the broadcast model and score
    * the smoothed unknown weight w_unk = ln((N_o+V)/(N_t+V)) — the
    * c_t = c_o = 0 limit of w, so pruning only coarsens, never
    * invents, evidence. The registered query uses minCount = 2 so the
    * oracle exercises the pruned path.
    *
    * Plan shape: ONE token shuffle builds the model (map-side-combined
    * conditional sums, vocab-sized result); totals/prior/w_unk ride a
    * 1-row broadcast; scoring is explode → broadcast-hash left join →
    * integer per-doc aggregation shuffling (doc_id, two longs) — text
    * never shuffles. At 100 TB, `minCount` bounds the broadcast model
    * the same way t20's LM floor does (raise it as the corpus grows;
    * every pruned type degrades to w_unk, it never disappears). */
  def nbQualityScore(docs: DataFrame, targetLang: String = "en",
      minCount: Int = 2, textCol: String = "text"): DataFrame = {
    val tok = docs.select(col("doc_id"), col("lang"),
      explode(split(col(textCol), " ")).as("t"))
    val m = tok.groupBy("t").agg(
      count(lit(1)).as("c_all"),
      sum(when(col("lang") === targetLang, 1L).otherwise(0L)).as("c_t"))
    val tot = m.agg(
      sum(col("c_t")).as("n_t"),
      sum(col("c_all") - col("c_t")).as("n_o"),
      count(lit(1)).as("v"))
    val d = docs.agg(
      sum(when(col("lang") === targetLang, 1L).otherwise(0L)).as("d_t"),
      sum(when(col("lang") === targetLang, 0L).otherwise(1L)).as("d_o"))
    // per-type µnat weight: one ln over exactly-rounded double products,
    // IEEE order (c_t+1)·(n_o+v) / ((c_o+1)·(n_t+v)) spelled identically
    // in the DuckDB oracle
    val w = m.filter(col("c_all") >= minCount).crossJoin(broadcast(tot))
      .select(col("t"),
        round(log(((col("c_t").cast("double") + lit(1.0)) *
            (col("n_o").cast("double") + col("v").cast("double"))) /
          (((col("c_all") - col("c_t")).cast("double") + lit(1.0)) *
            (col("n_t").cast("double") + col("v").cast("double")))) *
          lit(1000000.0)).cast("long").as("w_unat"))
    val consts = tot.crossJoin(d).select(
      round(log((col("n_o").cast("double") + col("v").cast("double")) /
          (col("n_t").cast("double") + col("v").cast("double"))) *
        lit(1000000.0)).cast("long").as("w_unk"),
      round(log((col("d_t").cast("double") + lit(1.0)) /
          (col("d_o").cast("double") + lit(1.0))) *
        lit(1000000.0)).cast("long").as("prior_unat"))
    tok.join(broadcast(w), Seq("t"), "left")
      .crossJoin(broadcast(consts))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        (first(col("prior_unat")) +
          sum(coalesce(col("w_unat"), col("w_unk")))).as("logodds_unats"))
      .select(col("doc_id"), col("n_tokens"), col("logodds_unats"),
        (col("logodds_unats").cast("double") /
          (col("n_tokens").cast("double") * lit(1000000.0))).as("mean_logodds"),
        (col("logodds_unats") > 0L).as("keep"))
  }

  /** Stable feature id in [0, 65536) from the md5 of the bigram — the
    * same engine-portable hex→int rule as `DataSplit.bucket`, so the
    * DuckDB oracle reproduces it digit by digit. */
  private def feature(b: org.apache.spark.sql.Column) =
    conv(substring(md5(b), 1, 4), 16, 10).cast("int")

  /** t21 — DSIR-style importance weighting over hashed n-gram features.
    *
    * Features are bigrams hashed into 65536 buckets; one pass builds
    * both LMs (source = whole corpus via `count(*)`, target = the
    * `lang = 'en'` subset via a conditional sum — same rows, one
    * shuffle). Each doc's importance is the ratio of its summed target
    * mass to its summed source mass (add-one smoothed):
    * `ratio = (target_mass + 1) / (source_mass + 1)` — the
    * monotone-equivalent of DSIR's log-likelihood ratio, computed as ONE
    * exactly-rounded IEEE division of two exact integers, so ordering by
    * it is engine-portable. The top `topN` docs are the selected subset.
    *
    * Plan shape (PlanSpec-pinned): LM build shuffles ≤65536 (int, long,
    * long) rows AFTER map-side combine; scoring is a broadcast join of
    * that fixed-size table; selection is orderBy+limit — Spark plans
    * TakeOrderedAndProject, each partition ships only its top `topN`,
    * no global sort ever materializes. Nothing in the plan grows with
    * corpus size except the two scans. */
  def importanceRatio(docs: DataFrame, targetLang: String = "en",
      topN: Int = 100, textCol: String = "text"): DataFrame = {
    val feats = bigrams(docs, textCol)
      .select(col("doc_id"), col("lang"), feature(col("b")).as("feat"))
    val lm = feats.groupBy("feat").agg(
      count(lit(1)).as("c_s"),
      sum(when(col("lang") === targetLang, 1L).otherwise(0L)).as("c_t"))
    val agg = feats.join(broadcast(lm), Seq("feat"))
      .groupBy("doc_id")
      .agg(sum(col("c_t")).as("target_mass"), sum(col("c_s")).as("source_mass"))
    agg.select(col("doc_id"), col("target_mass"), col("source_mass"),
      ((col("target_mass").cast("double") + lit(1.0)) /
        (col("source_mass").cast("double") + lit(1.0))).as("ratio"))
      .orderBy(col("ratio").desc, col("doc_id").asc)
      .limit(topN)
  }
}
