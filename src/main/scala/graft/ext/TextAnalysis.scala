package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization + counts, quality scoring, language ID, fingerprinting.
  *
  * Everything here is built from codegen'd built-in functions (no UDFs):
  * per-row expression trees with no shuffle, so they scale linearly with
  * input and stay inside whole-stage codegen.
  */
object TextAnalysis {

  /** Whitespace tokens (the corpus is single-space separated). The
    * empty string tokenizes to ONE empty token — `split('', ' ')` is
    * `['']` in Spark AND DuckDB's `string_split`, so every ratio and
    * count built on this agrees across engines; treat it as the
    * shared convention, not a bug to fix on one side. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish word/number/symbol tokens via regex — the pattern class
    * split a byte-pair-encoder front-end would apply. */
  val bpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokens(text: Column): Column = regexp_extract_all(text, lit(bpePattern), lit(0))

  /** Function-word markers per language for the voting language ID.
    * Real function words — effective on natural text; deterministic
    * first-match argmax on ties (order en→es→de→fr). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
    "es" -> Seq("el", "la", "de", "que", "los", "las", "una", "por", "con", "para"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "sich", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "des", "est", "une", "dans", "pour", "que"))

  private def markerHits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(lit): _*)))

  /** Language ID: CJK charset short-circuit, then function-word voting
    * with deterministic tie-break (highest count, first language wins).
    * Domain stated honestly: the voting covers the four marker
    * languages plus Han; a text hitting ZERO markers (Korean, Cyrillic,
    * Arabic, kana-heavy Japanese, empty strings) ties at best = 0 and
    * takes the first-language fallback "en" — there is deliberately no
    * "unknown" class because the t3-family oracles and the t20/t31
    * target-language subsets mirror this exact rule in SQL; widening
    * the label set is a both-engines change, not a Spark-side patch. */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scores = langMarkers.map { case (lang, ms) => lang -> markerHits(toks, ms) }
    val best = greatest(scores.map(_._2): _*)
    val vote = scores.tail.foldLeft(when(scores.head._2 === best, scores.head._1)) {
      case (acc, (lang, s)) => acc.when(s === best, lang)
    }
    when(cjkRatio(text) > 0.3, "zh").otherwise(vote)
  }

  /** [[langId]] as a FRAME transform with the shared subexpressions —
    * the token array and the four marker scores — STAGED as their own
    * projection. The single-Column form above inlines
    * `split(lower(text))` once per reference (~8×: each score feeds
    * both `greatest` and its vote branch), and the array `filter`
    * higher-order functions are codegen-fallback expressions, outside
    * whole-stage subexpression elimination — so every row paid the
    * tokenize several times over. Staged columns are computed ONCE per
    * row: CollapseProject keeps the projections apart because inlining
    * would duplicate non-cheap expressions (guide §1.2 step 2 —
    * per-task work; values bit-identical, same expressions evaluated,
    * same deterministic tie-break). */
  def langIdFrame(df: DataFrame, textCol: String = "text",
      outCol: String = "lang_pred"): DataFrame = {
    val staged = langMarkers.foldLeft(
      df.withColumn("__toks", tokens(lower(col(textCol))))) {
      case (d, (lang, ms)) =>
        d.withColumn(s"__s_$lang", markerHits(col("__toks"), ms))
    }
    val scores = langMarkers.map { case (lang, _) => lang -> col(s"__s_$lang") }
    val best = greatest(scores.map(_._2): _*)
    val vote = scores.tail.foldLeft(when(scores.head._2 === best, scores.head._1)) {
      case (acc, (lang, s)) => acc.when(s === best, lang)
    }
    staged
      .withColumn(outCol, when(cjkRatio(col(textCol)) > 0.3, "zh")
        .otherwise(vote))
      .drop("__toks" +: langMarkers.map(m => s"__s_${m._1}"): _*)
  }

  /** Fraction of CJK codepoints. */
  def cjkRatio(text: Column): Column = {
    val cjk = length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", ""))
    when(length(text) === 0, 0.0).otherwise(cjk.cast("double") / length(text))
  }

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "in", "to", "is", "it", "for", "on")

  /** Quality signals (all exact-integer-derived ratios → bit-stable):
    * token count, stopword ratio, punctuation ratio, mean token length,
    * and a composite score in [0,1]. */
  def qualitySignals(df: DataFrame, textCol: String = "text"): DataFrame = {
    // the token array is STAGED and every later signal references the
    // STAGED n_tokens column instead of re-inlining size(split(text)):
    // the previous form evaluated the tokenize once per reference (5×
    // across the ratio/when branches), and the stopword filter is a
    // codegen-fallback higher-order function outside whole-stage
    // subexpression elimination (guide §1.2 step 2; values
    // bit-identical — same expressions, staged once per row)
    val len = length(col(textCol))
    val nTok = col("n_tokens")
    df.withColumn("__toks", tokens(col(textCol)))
      .withColumn("n_tokens", size(col("__toks")))
      .withColumn("__n_stop",
        size(filter(col("__toks"), t => t.isin(stopwords.map(lit): _*))))
      .withColumn("stopword_ratio",
        when(nTok === 0, 0.0).otherwise(col("__n_stop").cast("double") / nTok))
      .withColumn("punct_ratio",
        when(len === 0, 0.0).otherwise(
          length(regexp_replace(col(textCol), "[A-Za-z0-9\\s]", ""))
            .cast("double") / len))
      .withColumn("mean_token_len",
        when(nTok === 0, 0.0).otherwise((len - nTok + 1).cast("double") / nTok))
      .drop("__toks", "__n_stop")
  }

  /** Composite quality score in [0,1]: rewards mid-length docs with some
    * (but not all) stopwords and little punctuation. Pure arithmetic on
    * the signals — deterministic. */
  def qualityScore(df: DataFrame): DataFrame =
    df.withColumn("quality",
      (least(col("n_tokens").cast("double") / 100.0, lit(1.0)) * 0.4
        + least(col("stopword_ratio") * 5.0, lit(1.0)) * 0.3
        + (lit(1.0) - least(col("punct_ratio") * 10.0, lit(1.0))) * 0.3))

  /** t29 — quality-greedy selection under a TOKEN BUDGET: rank the
    * corpus by (quality desc, doc_id) and keep documents while the
    * running token total stays within `budgetTokens` — the
    * data-selection primitive that turns "score everything" (t2/t18/
    * t21) into an actual training set of the size the compute plan
    * allows. Deterministic total order; a doc is kept iff the
    * cumulative tokens INCLUDING it fit the budget.
    *
    * Scale shape — the global running sum WITHOUT a global window
    * (a one-partition sort dies at corpus scale): Packing's two-level
    * prefix sum, keyed by quality band instead of id bucket. (1) each
    * doc gets an integer band = floor((1−quality)·nBands) — band order
    * IS quality-descending order up to in-band ties; (2) per-band token
    * totals (≤ nBands+1 rows) come to the driver for an exact prefix
    * sum — metadata-scale, same rule as Packing/IVF; (3) a window
    * WITHIN each band (ordered quality desc, id) adds the in-band
    * prefix to the band base. Identical to the global window's output;
    * per-partition state is one band, not the corpus.
    *
    * Two edges stated honestly: (a) NULL-text rows score quality 0.7
    * (both engines' `least` skips NULLs) with no tokens — their token
    * count is coalesced to 0 here so they ride along budget-free
    * instead of NULLing a band total (which would NPE the driver-side
    * prefix sum); filter them upstream if they shouldn't be selected
    * at all. (b) The banding is exact for ANY key monotone in the
    * selection order, but its SKEW bound assumes quality spreads
    * across bands: a corpus whose mass saturates at exactly
    * quality = 1.0 (every clamp at its ceiling) collapses into one
    * band and re-creates the single-partition window this scheme
    * exists to avoid — at that point select on a finer score (the t18
    * adaptive gate, t31's NLL) whose ties don't concentrate. */
  def tokenBudgetSelect(docs: DataFrame, budgetTokens: Long = 10000L,
      nBands: Int = 1000, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val scored = qualityScore(qualitySignals(docs, textCol))
      .select(col(idCol), col("quality"),
        coalesce(col("n_tokens").cast("long"), lit(0L)).as("n_tokens"))
      .withColumn("_band",
        floor((lit(1.0) - col("quality")) * nBands).cast("long"))
    val bandTotals = scored.groupBy("_band")
      .agg(sum("n_tokens").as("_tot"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val bases = bandTotals.map { case (b, t) => val r = (b, acc); acc += t; r }
    val baseDf = bases.toSeq.toDF("_band", "_base")
    val w = Window.partitionBy("_band")
      .orderBy(col("quality").desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    scored.join(broadcast(baseDf), "_band")
      .withColumn("cum_tokens", col("_base") + sum("n_tokens").over(w))
      .filter(col("cum_tokens") <= budgetTokens)
      .select(col(idCol), col("quality"), col("n_tokens"), col("cum_tokens"))
  }

  /** Canonical text normalization for dedup/training pipelines:
    * lowercase, strip non-alphanumerics to spaces, collapse runs of
    * whitespace, trim. Pure codegen'd expressions. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** PII redaction: replace emails, long digit runs (phone/account
    * numbers), and URLs with typed placeholder tokens — the scrub every
    * training corpus needs before anything else sees the text. Pure
    * per-row regexp_replace chain (codegen'd, no shuffle); the patterns
    * stay in the regex subset Java and RE2 interpret identically, so
    * the DuckDB oracle recomputes the exact same output. Order matters:
    * emails first (their local part would otherwise be eaten by the
    * digit rule), then URLs, then digit runs. The digit rule fires at
    * ≥8 total characters — the false-positive/recall dial set where
    * years, zip codes and 7-digit quantities survive while full phone
    * and account numbers redact; a stricter corpus lowers the interior
    * quantifier, accepting more numeric-literal loss (mirror any change
    * in the t-oracle SQL — the rule is cross-engine by construction). */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+", "<EMAIL>")
    val url = regexp_replace(email, "https?://[^\\s]+", "<URL>")
    regexp_replace(url, "[0-9][0-9 ()+.-]{6,}[0-9]", "<NUMBER>")
  }

  /** HOF formulation of [[graft.functions.RepeatStats]] — scan a SORTED
    * array once for struct(top, dup): the highest multiplicity of any
    * element and the total occurrences of elements appearing ≥2 times.
    * Runs of equal values are contiguous after the sort, so one pass
    * with (prev, run) state suffices; `dup` adds 2 when a run reaches
    * length 2 (both occurrences become duplicates) and 1 per further
    * repeat. The init prev=""/run=0 is safe even if the first element
    * IS "" — the run still starts at 0+1=1. Kept as the independent
    * cross-check for the native expression (ExtSpec); ~10× slower
    * (interpreted per-element tree), so the pipeline uses the native. */
  private[graft] def repeatStatsHof(arr: Column): Column =
    aggregate(
      array_sort(arr),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("top"), lit(0L).as("dup")),
      (st, x) => {
        val run = when(x === st.getField("prev"), st.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(
          x.as("prev"),
          run.as("run"),
          greatest(st.getField("top"), run).as("top"),
          (st.getField("dup") + when(run === 2L, 2L).when(run > 2L, 1L)
            .otherwise(0L)).as("dup"))
      },
      st => struct(st.getField("top").as("top"), st.getField("dup").as("dup")))

  /** Gopher-style repetition signals: per doc, the multiplicity of the
    * most frequent word and bigram and the fraction-of-occurrences
    * covered by repeated bigrams — the filters that catch boilerplate
    * and degenerate (looping) text. Computed per row with a single
    * sort+scan per signal (native [[graft.functions.RepeatStats]]
    * expression — one tight JVM loop, measured ~10× the interpreted HOF
    * chain) — ZERO shuffle, unlike the explode+groupBy formulation, so
    * at 100 TB it rides the scan like the other quality signals.
    * Integer outputs (exact, hash-stable); callers derive ratios. */
  def repetitionSignals(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    graft.functions.TextExpressions.register(df.sparkSession)
    import graft.functions.TextExpressions.repeatStats
    val toks = tokens(col(textCol))
    val nTok = size(toks)
    df.select(col(idCol),
        nTok.cast("long").as("n_words"),
        repeatStats(toks, 1).as("_w"),
        greatest(nTok - 1, lit(0)).cast("long").as("n_bigrams"),
        repeatStats(toks, 2).as("_b"))
      .select(col(idCol), col("n_words"),
        col("_w.top").as("top_word_n"),
        col("n_bigrams"),
        col("_b.top").as("top_bigram_n"),
        col("_b.dup").as("dup_bigram_n"))
  }

  /** Rolling-hash document fingerprint (winnowing-style): hash every
    * k-token window (polynomial, kept in [0, 2^31) to stay ANSI-overflow
    * safe), then keep the minimum — robust to small edits at the ends.
    * Not oracle-expressible (xxhash64 is Spark-specific); golden-tested. */
  def fingerprint(text: Column, k: Int = 5): Column = {
    val toks = tokens(text)
    val windows = transform(
      sequence(lit(0), greatest(size(toks) - k, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(k))))
    array_min(transform(windows, w => pmod(xxhash64(w), lit(2147483647L))))
  }

  /** t28 — per-document keyword extraction: the top-k tokens of each
    * document by TF-IDF, the classic summarize-what-this-doc-is-about
    * signal a corpus pipeline attaches before topic bucketing or
    * retrieval indexing (and the per-doc counterpart of t8's corpus-wide
    * n-grams and t19's query-side BM25).
    *
    * Exactness discipline: tf, df and n_docs are exact integers; the
    * only double is the per-row finishing score `tf · ln(n_docs/df)`,
    * one fixed expression tree both engines spell identically. The
    * top-k order is total — score desc, then token asc — and ties in
    * score across DIFFERENT (tf, df) pairs resolve identically in both
    * engines because the doubles are bit-equal, while equal (tf, df)
    * pairs are exactly equal and fall to the token tie-break.
    *
    * Plan shape at 100 TB: explode → map-side-combined (doc, tok)
    * counts (the one token-string shuffle, same as t23's phase 1); df
    * derives from THAT aggregate (no second scan); n_docs is a 1-row
    * broadcast; the final top-k is a window partitioned by doc —
    * re-shuffling on doc id, per-group state bounded by the doc's
    * vocabulary, no corpus-wide sort. */
  def tfidfKeywords(docs: DataFrame, k: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(idCol, "tok").agg(count(lit(1)).as("tf"))
    // df = docs-containing-token: tf rows are unique (doc, tok) pairs,
    // so a count over them IS the document frequency — no distinct pass
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n_docs"))
    val score = col("tf").cast("double") *
      log(col("n_docs").cast("double") / col("df").cast("double"))
    val w = Window.partitionBy(idCol).orderBy(col("tfidf").desc, col("tok"))
    tf.join(dfreq, Seq("tok"))
      .crossJoin(broadcast(stats))
      .withColumn("tfidf", score)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("rnk"), col("tok"), col("tf"), col("df"),
        col("tfidf"))
  }

  /** BM25 relevance scores for a fixed query-term set — the ranking
    * function behind corpus search / retrieval-quality filtering.
    * Returns `(idCol, dl, tf0..tfi, bm25)` for every document matching
    * at least one term.
    *
    * Two corpus scans, zero corpus shuffle — the shape that holds at
    * 100 TB:
    *  1. per-row [[graft.functions.TextExpressions.termFreqs]] (one
    *     native pass: token count `dl` + exact per-term counts), then
    *     ONE single-row all-integer aggregate (N, Σdl, per-term doc
    *     frequencies) — partials combine map-side, the exchange carries
    *     one tiny row per task;
    *  2. that row rides a broadcast back over the corpus and the BM25
    *     doubles are a fixed-order per-row expression.
    * Keeping every AGGREGATE integer is what makes the result
    * hash-reproducible: float math happens only per-row, in one
    * deterministic association order, mirrored token-for-token by the
    * DuckDB oracle (same ln / same literal arithmetic → identical
    * doubles, compared at 1e-9).
    *
    * Formula (BM25+-style non-negative idf):
    * `Σ_i ln(1 + (N - df_i + 0.5)/(df_i + 0.5)) · tf_i(k1+1) /
    *  (tf_i + k1(1 - b + b·dl·N/Σdl))`. */
  def bm25(df: DataFrame, terms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    graft.functions.TextExpressions.registerTermFreqs(df.sparkSession)
    val tfNames = terms.indices.map(i => s"tf$i")
    val perDoc = df
      .select(col(idCol),
        graft.functions.TextExpressions.termFreqs(col(textCol), terms).as("_s"))
      .select(col(idCol) +: col("_s.dl").as("dl") +:
        terms.indices.map(i => col("_s.tf").getItem(i).as(s"tf$i")): _*)
    val statAggs = sum(col("dl")).as("sum_dl") +:
      terms.indices.map(i =>
        sum((col(s"tf$i") > 0).cast("long")).as(s"df$i"))
    val stats = perDoc.agg(count(lit(1)).as("n_docs"), statAggs: _*)
    // score expression: one fixed left-to-right sum over the terms; the
    // oracle SQL spells the identical tree, so the doubles match bitwise
    val nD = col("n_docs").cast("double")
    val score = terms.indices.map { i =>
      val tf = col(s"tf$i").cast("double")
      val dfc = col(s"df$i").cast("double")
      val idf = log(lit(1.0) + (nD - dfc + lit(0.5)) / (dfc + lit(0.5)))
      idf * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0) - lit(b) +
          lit(b) * col("dl").cast("double") * nD / col("sum_dl").cast("double")))
    }.reduce(_ + _)
    perDoc.crossJoin(broadcast(stats))
      .select(col(idCol) +: col("dl") +: tfNames.map(col) :+ score.as("bm25"): _*)
      .filter(col("bm25") > 0)
  }

  /** t27 — per-source drift: KL divergence of each source's stopword
    * profile against the whole corpus's — the cheap linguistic-drift
    * monitor a corpus pipeline runs per ingest batch (a source whose
    * function-word distribution walks away from the corpus has changed
    * register, language mix, or scraper behavior).
    *
    * Exactness discipline: the profile is INTEGER counts of the fixed
    * 10-stopword set (the t2/t3 list), aggregated map-side; the KL is
    * one per-source finishing expression — a fixed-order sum over the
    * stopword list of `p·ln(p/q)` with `p = c_w/m`, `q = t_w/M` — so
    * the oracle spells the identical IEEE tree. Zero-count terms
    * contribute exactly 0 (the p→0 limit); a source with no stopword
    * mass at all scores 0 by the same rule.
    *
    * Scale shape: one scan with per-row counting (codegen'd
    * size/filter), one |sources|-row aggregate, corpus totals computed
    * FROM that tiny table (no second scan) and broadcast back. */
  def sourceDrift(docs: DataFrame, sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val perSource = docs.groupBy(sourceCol)
      .agg(sum(size(filter(toks, t => t === stopwords.head)))
          .as(s"c_${stopwords.head}"),
        stopwords.tail.map(w =>
          sum(size(filter(toks, t => t === w))).as(s"c_$w")): _*)
    // masses computed BEFORE the join: totals derives from perSource,
    // and post-join name resolution on such a self-derived cross join
    // silently binds c_* to the wrong lineage (observed: per-source
    // mass resolving to the corpus total)
    val withM = perSource.withColumn("_ms",
      stopwords.map(w => col(s"c_$w")).reduce(_ + _))
    val totals = perSource
      .agg(sum(col(s"c_${stopwords.head}")).as(s"t_${stopwords.head}"),
        stopwords.tail.map(w => sum(col(s"c_$w")).as(s"t_$w")): _*)
      .withColumn("_mc", stopwords.map(w => col(s"t_$w")).reduce(_ + _))
    val withMass = withM.crossJoin(broadcast(totals))
    val kl = stopwords.map { w =>
      val p = col(s"c_$w").cast("double") / col("_ms").cast("double")
      val q = col(s"t_$w").cast("double") / col("_mc").cast("double")
      when(col(s"c_$w") > 0, p * log(p / q)).otherwise(0.0)
    }.reduce(_ + _)
    withMass.select(col(sourceCol), col("_ms").cast("long").as("n_stop"),
      kl.as("kl"))
  }

  /** t30 — tokenizer ENCODE: apply the merge table t26 trains to the
    * corpus text, producing per-document token-id sequences — the step
    * between corpus curation and the t13/t14 token shards that every
    * training pipeline runs. The merge table is the top-`nMerges`
    * character pairs by (count desc, pair asc) — t26's exact output
    * order, so rank is a total order both engines reproduce; ids are
    * `codepoint` for base-alphabet tokens and `0x110000 + rank` for
    * merges (base alphabet + appended merges, collision-free). Encode
    * itself is [[graft.functions.BpeEncodeExpr]]: one greedy
    * left-to-right scan per row against the broadcast merge table.
    *
    * Output `(doc_id, n_tokens, ids_str)` with the id sequence
    * comma-joined (the g19 sortable-scalar trick) — and the ORACLE IS
    * THE FULL TOKENIZER: DuckDB re-trains the merge table with t26's
    * SQL and re-runs the greedy scan as a recursive CTE, so every id
    * of every document is cross-engine-checked (not just conserved
    * counts). ExtSpec separately pins round-trip decode equality and
    * codepoint conservation.
    *
    * Scale shape: merge training is t26 (corpus scan → vocabulary-sized
    * everything after); the top-`nMerges` pair list is a driver
    * `collect` of `nMerges` rows (metadata-scale, same rule as
    * Packing/IVF) that rides the task closure; encode is then a pure
    * per-row scan — zero shuffle, linear in corpus bytes. */
  def tokenizerEncode(docs: DataFrame, nMerges: Int = 20,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val merges = bpePairStats(docs, k = nMerges, textCol)
      .collect().map(_.getString(0)).toSeq
    graft.functions.TextExpressions.registerBpeEncode(docs.sparkSession)
    val ids = graft.functions.TextExpressions.bpeEncode(col(textCol), merges)
    docs.select(col(idCol), ids.as("_ids"))
      .select(col(idCol),
        size(col("_ids")).cast("long").as("n_tokens"),
        concat_ws(",", transform(col("_ids"), i => i.cast("string"))).as("ids_str"))
  }

  /** Driver-side decode for [[tokenizerEncode]]'s id scheme — the
    * round-trip check's other half (ExtSpec): ids < 0x110000 are
    * codepoints, else 1-based merge ranks into the same rank-ordered
    * pair list. Correctness scaffolding, not a distributed op. */
  def tokenizerDecode(ids: Seq[Int], merges: IndexedSeq[String]): String = {
    val sb = new java.lang.StringBuilder
    ids.foreach { id =>
      if (id < graft.functions.BpeEncode.Base) sb.appendCodePoint(id)
      else sb.append(merges(id - graft.functions.BpeEncode.Base - 1))
    }
    sb.toString
  }

  /** t26 — BPE pair statistics: corpus-weighted adjacent character-pair
    * counts, the argmax table the first merge of byte-pair-encoding
    * tokenizer training reads. For each distinct word (weighted by its
    * corpus frequency), every adjacent character pair contributes
    * `word_freq` to its count; output is the top `k` pairs by
    * (count desc, pair asc) — a total order, so the cut at k is
    * deterministic in every engine.
    *
    * Plan shape: ONE corpus-wide shuffle (word counts, map-side
    * combined); pair generation then runs over the DISTINCT-WORD table
    * — vocabulary-sized, not corpus-sized, the classic BPE-training
    * trick (Sennrich et al. count pairs over the word-frequency dict,
    * not the raw text) — followed by a vocabulary-sized pair shuffle
    * and a TakeOrdered top-k (no global sort). At 100 TB the only
    * corpus-proportional work is the word-count scan; everything after
    * is bounded by vocabulary size. */
  def bpePairStats(docs: DataFrame, k: Int = 50,
      textCol: String = "text"): DataFrame = {
    val words = docs
      .select(explode(tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wn"))
    words
      .select(col("wn"), explode(expr(
        """CASE WHEN length(word) >= 2
          |  THEN transform(sequence(1, length(word) - 1),
          |                 i -> substring(word, i, 2))
          |  ELSE array() END""".stripMargin)).as("pair"))
      .groupBy("pair").agg(sum("wn").as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(k)
  }
}
