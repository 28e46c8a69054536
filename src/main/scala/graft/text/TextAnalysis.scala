package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines: language ID, quality
  * scoring, token counting, and rolling-hash fingerprinting. All pure
  * column expressions — codegen'd, distribute trivially, and every
  * float-derived output is quantized to fixed-point bigints so results
  * are engine-exact (see fp()).
  */
object TextAnalysis {

  /** Fixed-point quantization: floor(x * 10^scale + 0.5) as long.
    * Deterministic across engines given identical doubles (IEEE mul/add
    * and floor are exact), unlike decimal rounding whose implementation
    * varies.
    */
  def fp(x: Column, scale: Int): Column = {
    val m = math.pow(10, scale)
    floor(x * m + lit(0.5)).cast("long")
  }

  /** Whitespace tokens, lowercased. */
  def tokens(text: Column): Column =
    call_function("graft_tokens", text)

  /** HOF spec twin of [[tokens]] (interpreted filter — CodegenFallback
    * excludes it from WSCG subexpression elimination, so multi-statistic
    * projections re-tokenized per reference; bit-equality tested). */
  def tokensHof(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Word-regex token count (the "token counting" baseline: words,
    * digits, and punctuation runs — a BPE-ish pre-tokenizer split).
    */
  val WordPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def tokenCount(text: Column): Column = size(regexp_extract_all(text, lit(WordPattern), lit(0)))

  /** The default BPE merges table: entry i = `"left right"`, rank =
    * i (lower merges first). A vocab you'd actually train lands in
    * the same shape — these ranks cover the highest-frequency English
    * pairs plus their continuations (`th`→`the`, `in`→`ing`), enough
    * to exercise multi-level merges (rank-2 `th e` only fires after
    * rank-0 `t h` creates the `th` token). The table is a query-side
    * LITERAL so the DuckDB oracle replicates the identical walk; a
    * production 32k vocab swaps in transparently —
    * [[graft.functions.BpeEncodeExpr]] builds its pair→rank hash map
    * once from the literal, so vocab size scales the map, not the
    * plan.
    */
  val BpeMerges: Seq[String] = Seq(
    "t h", "th e", "i n", "a n", "e r", "o n", "r e", "in g",
    "e n", "a t", "o r", "e s", "s t", "a r", "o u", "l e",
    "an d", "t o", "i s", "i t", "a l", "en t", "o f", "c h")

  /** Word pre-tokenize + vocab-driven BPE encode: the real
    * tokenizer's token sequence (see [[graft.functions.BpeEncodeExpr]]
    * for the walk). `size(bpeTokens(text))` is the drop-in real-token
    * counter for the pack/budget/mix selectors. */
  def bpeTokens(text: Column, merges: Seq[String] = BpeMerges): Column =
    call_function("graft_bpe_encode",
      regexp_extract_all(text, lit(WordPattern), lit(0)),
      typedLit(merges))

  /** n-gram heuristic language ID: count stopword hits per language,
    * argmax with a fixed priority order on ties. Stopword lists are a
    * parameter; `Default` covers the synthetic corpus languages.
    */
  val DefaultStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "fast", "slow"),
    "es" -> Seq("el", "la", "de", "y", "que", "orden"),
    "de" -> Seq("der", "die", "das", "und", "ist", "schnell"),
    "fr" -> Seq("le", "la", "de", "et", "est", "vite"),
    "zh" -> Seq("de5", "shi4", "he2", "zai4", "you3", "hen3")
  )

  def langScore(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(stopwords: _*)))

  /** Argmax over labeled score columns; ties resolve to the earlier
    * label (foldRight so earlier entries take precedence). The score
    * columns should be BOUND ATTRIBUTES (staged projection) — each is
    * referenced twice here (in `best` and in the when-chain), and
    * Catalyst re-evaluates non-attribute expressions at every
    * reference. */
  def argmaxLabel(scores: Seq[(String, Column)]): Column = {
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit(scores.head._1)) { case ((lang, s), acc) => when(s === best, lit(lang)).otherwise(acc) }
  }

  /** Predicted language: highest stopword-hit count, ties resolved by
    * list order (first wins). Single-Column convenience form — it
    * re-tokenizes 2×|lists| per row (no CSE across score references);
    * use [[langIdDf]] in anything measured.
    */
  def langId(text: Column, lists: Seq[(String, Seq[String])] = DefaultStopwords): Column =
    argmaxLabel(lists.map { case (lang, words) => lang -> langScore(text, words) })

  /** Staged stopword language ID over a whole frame: tokens project
    * once per row, per-language scores once each, and the argmax reads
    * bound attributes. This is the scale path — the inline form costs
    * 2×|lists| tokenizations per row. Output: (idCol, out). */
  def langIdDf(df: DataFrame, idCol: String, textCol: String,
               lists: Seq[(String, Seq[String])] = DefaultStopwords,
               out: String = "lang_pred"): DataFrame = {
    val scored = df
      .select(col(idCol), tokens(col(textCol)).as("_toks"))
      .select(col(idCol) +: lists.map { case (lang, words) =>
        size(filter(col("_toks"), t => t.isin(words: _*))).as(s"_s_$lang")
      }: _*)
    scored.select(col(idCol),
      argmaxLabel(lists.map { case (lang, _) => lang -> col(s"_s_$lang") }).as(out))
  }

  /** Quality metrics: chars, words, mean word length (fp2), punctuation
    * ratio (fp4), stopword ratio (fp4), uppercase-start ratio — the
    * length/punct/stopword heuristics of C4-style quality filters.
    * Returns a struct; callers select fields.
    */
  def quality(text: Column, stopwords: Seq[String] = DefaultStopwords.head._2): Column = {
    val nChars = length(text)
    val toks = tokens(text)
    val nWords = size(toks)
    val nPunct = size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0)))
    val nStop = size(filter(toks, t => t.isin(stopwords: _*)))
    val safeWords = when(nWords === 0, 1).otherwise(nWords)
    val safeChars = when(nChars === 0, 1).otherwise(nChars)
    struct(
      nChars.as("n_chars"),
      nWords.cast("long").as("n_words"),
      fp(nChars.cast("double") / safeWords.cast("double"), 2).as("mean_word_len_fp2"),
      fp(nPunct.cast("double") / safeChars.cast("double"), 4).as("punct_ratio_fp4"),
      fp(nStop.cast("double") / safeWords.cast("double"), 4).as("stopword_ratio_fp4")
    )
  }

  /** Staged quality metrics: tokenizes once per row (the struct form
    * references the token array ~4×). Output columns match the struct
    * fields of [[quality]]. */
  def qualityDf(df: DataFrame, idCol: String, textCol: String,
                stopwords: Seq[String] = DefaultStopwords.head._2): DataFrame = {
    val counted = df
      .select(col(idCol), col(textCol).as("_t"), tokens(col(textCol)).as("_toks"))
      .select(col(idCol),
        length(col("_t")).as("n_chars"),
        size(col("_toks")).as("_nw"),
        size(regexp_extract_all(col("_t"), lit("[^A-Za-z0-9\\s]"), lit(0))).as("_np"),
        size(filter(col("_toks"), t => t.isin(stopwords: _*))).as("_ns"))
    val safeWords = when(col("_nw") === 0, 1).otherwise(col("_nw"))
    val safeChars = when(col("n_chars") === 0, 1).otherwise(col("n_chars"))
    counted.select(col(idCol),
      col("n_chars"),
      col("_nw").cast("long").as("n_words"),
      fp(col("n_chars").cast("double") / safeWords.cast("double"), 2).as("mean_word_len_fp2"),
      fp(col("_np").cast("double") / safeChars.cast("double"), 4).as("punct_ratio_fp4"),
      fp(col("_ns").cast("double") / safeWords.cast("double"), 4).as("stopword_ratio_fp4"))
  }

  /** Character-trigram language profiles — the classic n-gram
    * language-ID heuristic (Cavnar–Trenkle style, tiny profiles).
    */
  val DefaultTrigramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "he ", " th", "ing", "and", "ed ", " a "),
    "es" -> Seq(" de", "de ", "la ", "os ", "que", " la", "ón "),
    "de" -> Seq("er ", "en ", "der", "ie ", "ch ", "sch", "ein"),
    "fr" -> Seq(" le", "es ", "le ", " de", "ent", "ais", "que")
  )

  /** All char trigrams of lower(text), in order — native one-pass
    * builder ([[graft.functions.CharNgramsExpr]]); short texts →
    * empty array. */
  def charTrigrams(text: Column): Column =
    call_function("graft_char_ngrams", lower(text), lit(3))

  /** HOF spec twin of [[charTrigrams]] (interpreted per-gram substr —
    * bit-equality tested; don't use it in anything measured).
    * (sequence(1, n) is DESCENDING for n < 1, so short texts take the
    * explicit empty branch.) */
  def charTrigramsHof(text: Column): Column =
    graft.ColumnOps.let(lower(text)) { lo =>
      when(length(lo) < 3, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), length(lo) - 2), i => lo.substr(i, lit(3))))
    }

  /** Count of the text's char trigrams that occur in `profile`. */
  def trigramScore(text: Column, profile: Seq[String]): Column =
    size(filter(charTrigrams(text), g => g.isin(profile: _*)))

  /** Predicted language from char-trigram profile hits; ties resolve
    * to the earlier profile (same argmax rule as langId).
    * Single-Column convenience form — it rebuilds the trigram array
    * 2×|profiles| per row; use [[langIdNgramDf]] in anything measured. */
  def langIdNgram(text: Column, profiles: Seq[(String, Seq[String])] = DefaultTrigramProfiles): Column =
    argmaxLabel(profiles.map { case (lang, grams) => lang -> trigramScore(text, grams) })

  /** Staged trigram language ID: lower(text) projects ONCE per row,
    * each profile scores it with the native one-pass
    * `graft_trigram_score` (bit-equality spec-tested against the HOF
    * [[trigramScore]]), argmax reads bound attributes. The inline HOF
    * form costs 2×|profiles| O(n²) gram builds per row. */
  def langIdNgramDf(df: DataFrame, idCol: String, textCol: String,
                    profiles: Seq[(String, Seq[String])] = DefaultTrigramProfiles,
                    out: String = "lang_pred"): DataFrame = {
    val scored = df
      .select(col(idCol), lower(col(textCol)).as("_lo"))
      .select(col(idCol) +: profiles.map { case (lang, grams) =>
        call_function("graft_trigram_score", col("_lo"), array(grams.map(g => lit(g)): _*))
          .as(s"_s_$lang")
      }: _*)
    scored.select(col(idCol),
      argmaxLabel(profiles.map { case (lang, _) => lang -> col(s"_s_$lang") }).as(out))
  }

  /** Winnowing fingerprints (Schleimer et al. 2003 / MOSS) over the
    * token array: word-n-gram 60-bit hashes, sliding w-window minimum
    * with rightmost tie-break, distinct selections — see
    * [[graft.functions.WinnowExpr]] (native one-pass monotonic
    * deque). Returns array<struct<pos int, fp bigint>> ordered by
    * 1-based gram position; docs shorter than n tokens → empty. */
  def winnow(toks: Column, n: Int, w: Int): Column =
    call_function("graft_winnow", toks, lit(n), lit(w))

  /** HOF spec twin of [[winnow]] (interpreted per-window slices,
    * O(#grams·w) — bit-equality tested; don't use it in anything
    * measured). Selection mirrors the DuckDB oracle: window min via
    * array_min over the hash slice, position = MAX index holding that
    * min (rightmost), then array_distinct over the in-order picks.
    * Null input is guarded EXPLICITLY: the let-binding evaluates its
    * body on a null-bound lambda var (the minhash edge), which here
    * would surface as one garbage [null, null] struct instead of
    * null. */
  def winnowHof(toks: Column, n: Int, w: Int): Column =
    when(toks.isNull, lit(null).cast("array<struct<pos:int,fp:bigint>>")).otherwise(winnowHofBody(toks, n, w))

  private def winnowHofBody(toks: Column, n: Int, w: Int): Column =
    graft.ColumnOps.let(
      transform(call_function("graft_word_ngrams", toks, lit(n), lit(1), lit(0)),
        g => call_function("graft_md5_long60", g))
    ) { hs =>
      graft.ColumnOps.let(size(hs)) { ng =>
        when(ng < 1, array().cast("array<struct<pos:int,fp:bigint>>"))
          .otherwise(array_distinct(transform(
            sequence(lit(1), greatest(ng - (w - 1), lit(1))),
            i => graft.ColumnOps.let(array_min(slice(hs, i, lit(w)))) { mn =>
              struct(
                array_max(transform(sequence(i, least(i + (w - 1), ng)),
                  j => when(element_at(hs, j) === mn, j))).as("pos"),
                mn.as("fp"))
            })))
      }
    }

  /** C4-style text normalization: lowercase, strip punctuation runs,
    * collapse whitespace, trim — the canonical form fed to dedup.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]+", " "), "\\s+", " "))

  /** Gopher-style quality rules (Rae et al. 2021, §A1.1): the
    * document-level heuristic filter ensemble a pretraining corpus
    * runs before model-based scoring — word-count bounds, mean word
    * length bounds, symbol-to-word ratio, alphabetic-word fraction,
    * stopword presence. All signals are columnar (no UDF) and
    * quantized BEFORE thresholding, so the keep flag is a pure
    * function of engine-exact integers — the flag itself replicates
    * cross-engine, not just the signals. Narrow, zero shuffle.
    *
    * Output: (doc_id, n_words, mean_wlen_fp2, alpha_frac_fp4,
    * sym_ratio_fp4, stop_hits, keep_flag). Thresholds are the Gopher
    * shape scaled to this corpus's scale (≥ `minWords` words, mean
    * word length 3-10, symbol ratio ≤ 0.1, alpha fraction ≥ 0.8,
    * ≥ 2 stopword hits).
    */
  def gopherRulesDf(df: DataFrame, idCol: String, textCol: String,
                    minWords: Int = 50,
                    stopwords: Seq[String] = Seq("the", "a", "of", "and", "fast", "slow")): DataFrame = {
    val staged = df.select(col(idCol).as("doc_id"), col(textCol).as("_x"),
      tokens(col(textCol)).as("_t"))
    val n = size(col("_t"))
    val nw = when(n === 0, 1).otherwise(n) // divide-by-zero guard
    val sumLen = aggregate(transform(col("_t"), t => length(t)), lit(0), (a, b) => a + b)
    val alphaCnt = size(filter(col("_t"), t => t.rlike("[a-z]")))
    val symCnt = size(regexp_extract_all(col("_x"), lit("#|\\.\\.\\."), lit(0)))
    val stopCnt = size(filter(col("_t"), t => t.isin(stopwords: _*)))
    staged.select(col("doc_id"),
        n.cast("long").as("n_words"),
        fp(sumLen.cast("double") / nw.cast("double"), 2).as("mean_wlen_fp2"),
        fp(alphaCnt.cast("double") / nw.cast("double"), 4).as("alpha_frac_fp4"),
        fp(symCnt.cast("double") / nw.cast("double"), 4).as("sym_ratio_fp4"),
        stopCnt.cast("long").as("stop_hits"))
      .withColumn("keep_flag",
        (col("n_words") >= minWords && col("n_words") <= 100000 &&
          col("mean_wlen_fp2") >= 300 && col("mean_wlen_fp2") <= 1000 &&
          col("alpha_frac_fp4") >= 8000 && col("sym_ratio_fp4") <= 1000 &&
          col("stop_hits") >= 2).cast("long"))
  }

  /** Corpus-trained character-trigram LM quality score — the
    * CCNet-style "perplexity filter" re-expressed engine-portably:
    * the model is the corpus's OWN trigram statistics over
    * [[normalize]]d text (count(ctx, c), count(ctx), |alphabet|,
    * Laplace-smoothed), and each doc scores the per-position
    * probability of its characters under that model. Probabilities —
    * not log-probs — are fp6-quantized per position and
    * integer-summed: exact integer ratios and correctly-rounded IEEE
    * division replicate bit-for-bit across engines, while log()
    * differs in the last ulp between libm implementations.
    *
    * Scale shape: the model tables are bounded by |charset|² rows
    * AFTER map-side partial aggregation (broadcast-sized for any sane
    * alphabet — normalize() already restricts to [a-z0-9 ]; restrict
    * further before scoring CJK-heavy corpora), so scoring is a
    * broadcast join: the corpus side never shuffles by gram, and the
    * only corpus-sized exchange is the final per-doc aggregation.
    * Docs shorter than 3 normalized chars have no trigram and drop
    * out (they carry no signal for this filter).
    *
    * Output: (doc_id, n_tri, sum_p_fp6) — exact integers; mean
    * per-position probability = sum_p_fp6 / (n_tri · 10⁶), and a
    * LOWER mean marks the out-of-distribution docs a perplexity
    * filter would cut.
    */
  def charLmScoreDf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = df.select(col(idCol).as("doc_id"), normalize(col(textCol)).as("t"))
    // build the 3-char grams per row BEFORE exploding: the exploded
    // rows then carry 3 characters, not the whole document — an
    // explode keyed on a long payload column duplicates that payload
    // once per position (~doc_len× write amplification, measured 6×
    // slower on this corpus)
    val tri = norm
      .select(col("doc_id"),
        explode(call_function("graft_char_ngrams", col("t"), lit(3))).as("g"))
      .select(col("doc_id"),
        substring(col("g"), 1, 2).as("ctx"),
        substring(col("g"), 3, 1).as("c"))
    // ONE distributed pass trains the model (map-side partial agg →
    // charset²-bounded table), which is COLLECTED (driver-sized, like
    // the IVF centroid / PQ codebook tables) and folded into per-gram
    // fp6 probabilities: p6(ctx·c) = ⌊(cnt+1)/(tot_ctx+v)·10⁶+0.5⌋ —
    // the same IEEE double divide + fp quantization the former
    // broadcast-join scoring computed per exploded row. Scoring is
    // then a MAP-ONLY native fold per doc (graft_gram_wsum over the
    // same graft_char_ngrams stream against the literal table):
    // identical integers — each matched occurrence contributes the
    // same p6, integer addition is exact — with no second explode, no
    // joins, and no corpus-sized per-doc aggregation exchange
    // (optimization round 18; previously 2 corpus passes + 3
    // broadcast joins + a per-doc shuffle). Docs with zero matched
    // grams (shorter than 3 normalized chars) drop exactly as the
    // inner join dropped them.
    val model = tri.groupBy("ctx", "c").agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val ctxTot = model.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val v = model.iterator.map(_._2).toSet.size
    val entries: Seq[(String, Long)] = model.iterator.map { case (ctx, c, cnt) =>
      (ctx + c,
        math.floor((cnt + 1).toDouble / (ctxTot(ctx) + v).toDouble * 1e6 + 0.5).toLong)
    }.toSeq
    norm
      .select(col("doc_id"),
        call_function("graft_gram_wsum",
          call_function("graft_char_ngrams", col("t"), lit(3)),
          typedLit(entries)).as("_r"))
      .filter(col("_r.n") > 0)
      .select(col("doc_id"), col("_r.n").as("n_tri"), col("_r.s").as("sum_p_fp6"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling") re-expressed in
    * the engine-portable [[charLmScoreDf]] idiom: train the SAME
    * Laplace-smoothed char-trigram model twice — once on the TARGET
    * slice (`isTarget`), once on the full corpus — and weight each
    * doc by how much more target-like than corpus-like its characters
    * are. DSIR uses log-ratio Σ log(p_T/p_C); log()'s last ulp
    * differs across libm implementations (the charLmScoreDf lesson),
    * so the score here is the probability-space difference
    * Σ (fp6(p_T) − fp6(p_C)) — exact integers, same ordering signal
    * (positive ⇔ target-shifted) — and `keep_flag` marks the docs an
    * importance resample would up-weight.
    *
    * Scale shape: the corpus is scanned twice (both model builds fold
    * into ONE pass each over the shared tri projection, charset²-
    * bounded after map-side partial agg; the target model is a
    * filtered twin). Scoring is broadcast joins against four
    * charset²/charset-bounded tables + a 1-row vocab frame — the
    * corpus side never shuffles by gram; the only corpus-sized
    * exchange is the final per-doc aggregation. Grams absent from the
    * target model smooth to (0+1)/(0+v) via the left joins — the
    * exact Laplace count-zero case, not a special path.
    */
  def dsirWeightsDf(df: DataFrame, idCol: String, textCol: String,
                    isTarget: Column): DataFrame = {
    val norm = df.select(col(idCol).as("doc_id"),
      normalize(col(textCol)).as("t"), isTarget.as("_is_t"))
    val tri = norm
      .select(col("doc_id"), col("_is_t"),
        explode(call_function("graft_char_ngrams", col("t"), lit(3))).as("g"))
      .select(col("doc_id"), col("_is_t"),
        substring(col("g"), 1, 2).as("ctx"),
        substring(col("g"), 3, 1).as("c"))
    // BOTH models in ONE distributed pass (the target model is a
    // conditional count on the same (ctx, c) rollup — previously a
    // second filtered aggregation pass), collected driver-side
    // (charset²-bounded) and folded into per-gram fp6 DELTAS
    // pt6 − pc6, with the Laplace count-zero case (a gram the target
    // slice never saw: (0+1)/(tot_t+v)) computed exactly where the
    // left-join + coalesce used to. Scoring is the same map-only
    // native fold as charLmScoreDf — one corpus pass total instead of
    // three, no joins, no per-doc shuffle (optimization round 18).
    val model = tri.groupBy("ctx", "c")
      .agg(count(lit(1)).as("cnt_c"),
        sum(when(col("_is_t"), 1L).otherwise(0L)).as("cnt_t"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val ctxC = model.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val ctxT = model.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val v = model.iterator.map(_._2).toSet.size
    def fp6(num: Long, den: Long): Long =
      math.floor(num.toDouble / den.toDouble * 1e6 + 0.5).toLong
    val entries: Seq[(String, Long)] = model.iterator.map { case (ctx, c, cntC, cntT) =>
      (ctx + c, fp6(cntT + 1, ctxT(ctx) + v) - fp6(cntC + 1, ctxC(ctx) + v))
    }.toSeq
    norm
      .select(col("doc_id"),
        call_function("graft_gram_wsum",
          call_function("graft_char_ngrams", col("t"), lit(3)),
          typedLit(entries)).as("_r"))
      .filter(col("_r.n") > 0)
      .select(col("doc_id"), col("_r.n").as("n_tri"), col("_r.s").as("dsir_fp6"))
      .withColumn("keep_flag", (col("dsir_fp6") > 0).cast("long"))
  }

  /** PII masking: replace email addresses and NNN-NNN-NNNN phone
    * numbers with placeholder tokens. Patterns are RE2-safe (no
    * backrefs/lookarounds) so Java regex and DuckDB RE2 agree. */
  val EmailRx = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRx = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  def maskPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRx, "<EMAIL>"), PhoneRx, "<PHONE>")

  /** Remove consecutive duplicate tokens ("the the" stutter cleanup),
    * rejoin with single spaces. Tokens are let-bound: referenced twice
    * in the filter lambda (no CSE inside HOFs). */
  def dedupConsecutiveTokens(text: Column): Column =
    graft.ColumnOps.let(tokens(text)) { toks =>
      concat_ws(" ", filter(toks, (t, i) => i === 0 || t =!= element_at(toks, i)))
    }

  /** GREEDY left-to-right BPE merge application over a space-joined
    * symbol string: every occurrence of adjacent symbols (a, b) —
    * scanning left to right, never re-consuming a just-merged token —
    * becomes the merged symbol `m`. Implemented as a string fold
    * whose tail-token check is boundary-exact (full-token compare at
    * a space boundary), so "a b a b" merges twice and "aa" never
    * tail-matches "a" — a naive global replace gets both wrong.
    * `a`/`b`/`m` are Columns so a learned (per-row or broadcast)
    * merge table drives it. Engine-portable: the same fold written
    * with list_reduce in SQL lands identical strings.
    */
  def bpeMergeFold(sym: Column, a: Column, b: Column, m: Column): Column = {
    val la = length(a)
    aggregate(split(sym, " "), lit(""),
      (acc, cur) =>
        when(cur === b && acc === a, m)
          .when(cur === b && length(acc) > la &&
            acc.substr(length(acc) - la, la + lit(1)) === concat(lit(" "), a),
            concat(acc.substr(lit(1), length(acc) - la - lit(1)), lit(" "), m))
          .when(acc === "", cur)
          .otherwise(concat(acc, lit(" "), cur)))
  }

  /** Remove stopwords (whitespace tokens), rejoin with single spaces. */
  def removeStopwords(text: Column, stopwords: Seq[String] = DefaultStopwords.head._2): Column =
    concat_ws(" ", filter(tokens(text), t => !t.isin(stopwords: _*)))

  /** Polynomial rolling-hash fingerprint over the first `maxLen` chars:
    * h = (h*31 + ascii(c)) mod (2^31-1). Stays within long range;
    * identical in any engine with 64-bit integer arithmetic.
    */
  def fingerprint(text: Column, maxLen: Int = 64): Column =
    aggregate(
      sequence(lit(1), least(length(text), lit(maxLen))),
      lit(0L),
      (acc, i) => (acc * 31 + ascii(text.substr(i, lit(1)))) % 2147483647L
    )

  /** Per-source χ² divergence from the corpus unigram distribution —
    * the domain-shift / source-drift profiling signal. χ² instead of
    * KL deliberately: KL needs log(), whose last ulp differs across
    * libm implementations (the [[charLmScoreDf]] lesson); χ² is pure
    * rational arithmetic. Each present-term contribution
    * (p_t − q_t)²/q_t stages as: diff = c_st·n − c_t·n_s computed
    * EXACTLY in DECIMAL(38,0) (each factor cast BEFORE the multiply —
    * a long multiply overflows past n ≈ 3e9 corpus tokens), then a
    * fixed double shape (diff/n_s)²/(c_t·n) — n_s² folded into the
    * divide so no decimal intermediate exceeds 38 digits (diff² or
    * n_s²·c_t·n would at n ≥ 1e10) — fp9-quantized and integer-summed;
    * no float accumulation order anywhere. The absent-token mass
    * Σ_{t∉s} q_t = 1 − (Σ_{t∈s} c_t)/n folds in from one exact
    * integer sum, so the statistic is the FULL χ², not a truncation.
    *
    * Scale: one (source, token) partial-agg shuffle; the global term
    * table derives from it (same key prefix); per-source totals and
    * the 1-row corpus count are driver-sized broadcasts. Vocabulary
    * bounds every post-explode table — the token stream itself is
    * touched once.
    *
    * Output: source, n_terms, chi2_fp9.
    */
  def domainDivergenceDf(df: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val toks = df.select(col(sourceCol).as("source"), explode(tokens(col(textCol))).as("tok"))
    // pin the (source, token) counts (charlm idiom): tt/ns/n1 and the
    // term join all derive from st — without the pin each branch
    // re-scans the token stream (4 corpus scans instead of 1); the
    // pinned table is sources × vocabulary, corpus-size-independent
    val st = toks.groupBy("source", "tok").agg(count(lit(1)).as("c_st")).localCheckpoint()
    val tt = st.groupBy("tok").agg(sum(col("c_st")).as("c_t"))
    val ns = st.groupBy("source").agg(sum(col("c_st")).as("n_s"))
    val n1 = tt.agg(sum(col("c_t")).as("n"))
    st.join(tt, "tok")
      .join(broadcast(ns), "source")
      .crossJoin(broadcast(n1))
      .withColumn("_diff",
        col("c_st").cast(d38) * col("n").cast(d38) - col("c_t").cast(d38) * col("n_s").cast(d38))
      .withColumn("_r", col("_diff").cast("double") / col("n_s").cast("double"))
      .withColumn("_term",
        fp(col("_r") * col("_r")
          / (col("c_t").cast(d38) * col("n").cast(d38)).cast("double"), 9))
      .groupBy("source")
      .agg(count(lit(1)).as("n_terms"),
        sum(col("_term")).as("_present"),
        // Σ_{t∈s} c_t and n are exact longs; ONE double op for the
        // absent-token mass, then the same fp9 quantization
        fp(lit(1.0) - sum(col("c_t")).cast("double") / max(col("n")).cast("double"), 9).as("_absent"))
      .select(col("source"), col("n_terms"),
        (col("_present") + col("_absent")).as("chi2_fp9"))
  }
}
