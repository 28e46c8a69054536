package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.dedup.Dedup
import graft.similarity.Similarity
import graft.text.TextAnalysis
import QueryUtil._

/** §2C — LLM-data-pipeline operators over the `documents`,
  * `embeddings`, and `events` tables: deduplication (exact, MinHash
  * LSH, SimHash, n-gram Jaccard, embedding near-dup), similarity
  * search, text analysis, event sessionization/windowing, and the
  * multimodal binary columns (real header codecs).
  *
  * Oracle strategy: DuckDB list lambdas (`list_transform` /
  * `list_reduce` / `list_min`) replicate Spark's higher-order
  * functions with the SAME left-fold accumulation order, so even
  * float dot products are bit-exact across engines before fp()
  * quantization. md5 is the shared hash everywhere.
  */
object Pipeline {

  private val SessionGapMs = 21600000L // 6h

  /** events projected to engine-exact types: epoch ms + fp4 value.
    * `ts` is currently parquet timestamp[us] (TIMESTAMP_NTZ), but the
    * driver has regenerated the physical type between rounds before —
    * tsMs() branches on the loaded dataType (timestamp → unix_millis
    * under the UTC session; long nanos → floor-div), matching DuckDB's
    * epoch_ms() either way, including pre-1970 timestamps. */
  private def ev(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    e.select(
      col("event_id"), col("user_id"), col("event_type"),
      tsMs(e).as("ms"), fp(col("value"), 4).as("v4"))
  }

  /** Cache path for the persisted ANN index queries (37b2/37d2):
    * keyed on the embeddings table's absolute path + newest file
    * mtime, so the index is built at most once per testdata snapshot
    * and any regenerated snapshot gets a fresh key. */
  private def ivfDiskPath(dir: String): String = {
    val src = new java.io.File(s"$dir/embeddings.parquet")
    val stamp = Option(src.listFiles()).map(_.map(_.lastModified).max)
      .getOrElse(src.lastModified)
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${src.getAbsolutePath}@$stamp".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    new java.io.File(
      new java.io.File(sys.props("java.io.tmpdir"), "graft_ivf_index"), key).toString
  }

  /** The IVF scale lever, applied: the cell-scaffold queries
    * (sim_knn_graph, dd_threshold_sweep, emb_hard_negatives) block
    * their within-cell self-joins by the IVF assignment, and a FIXED
    * cell count means |cell| grows with the corpus — within-cell
    * pairs go quadratic (measured 65x wall time for 10x rows on the
    * sf1 sweep). Scale kCells with the corpus so |cell| ~ 125 stays
    * constant and the self-join stays linear-ish; floor 16 keeps
    * every existing gate SF (sf0.001..sf0.1 = 500..2000 vectors)
    * bit-identical to the old fixed-16 plans. Mirrored exactly in
    * the DuckDB oracles (greatest(16, count(*) // 125)). */
  private def adaptiveCells(n: Long): Int =
    math.max(16L, n / 125L).toInt

  val defs: Map[String, Q] = Map(
    // 31 — exact dedup by content hash, keep min id
    "dd_exact" -> ((s, dir) => {
      Dedup.exact(t(s, dir, "documents"), "doc_id", "text")
    }),
    // 32 — MinHash+LSH near-dup candidate pairs (banded bucket join)
    "dd_minhash_pairs" -> ((s, dir) => {
      Dedup.lshCandidatePairs(t(s, dir, "documents"), "doc_id", "text",
        shingleSize = 3, numPerm = 8, rowsPerBand = 2)
        
    }),
    // 33 — 32-bit SimHash signatures (native one-pass expr; the HOF
    // twin Dedup.simhash32 is bit-equality spec-tested against it)
    "dd_simhash" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), Dedup.simhash32Native(col("text")).as("simhash"))
        
    }),
    // 32c — dedup CLUSTERS: connected components over the MinHash
    // candidate pair graph (component = min doc id; the survivor set
    // is one doc per component)
    "dd_components" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text",
        shingleSize = 3, numPerm = 8, rowsPerBand = 2)
      Dedup.connectedComponents(docs, "doc_id", pairs, "doc_a", "doc_b")
        
    }),
    // 32e — dedup-cluster RESOLUTION: per near-dup cluster keep the
    // best doc (longest, ties to smallest id) — the step that turns
    // pairs+components into a cleaned corpus. Partial-agg argmax, no
    // per-cluster sort.
    "dd_keep_best" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text",
        shingleSize = 3, numPerm = 8, rowsPerBand = 2)
      Dedup.keepBest(docs, "doc_id", "n_chars", pairs, "doc_a", "doc_b")
        
    }),
    // 32f — SOFT dedup (duplication-aware loss weighting): instead of
    // dropping near-dups, every doc carries weight 1/|near-dup
    // cluster| (singletons keep 1.0) — the corpus stays intact and
    // duplicated content stops dominating the loss (the keep-vs-drop
    // alternative the mixture papers reach for). Cluster = MinHash
    // connected component; one count agg + a component-keyed join
    // back, no per-cluster sort — weights ship at corpus scale
    "smp_soft_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text",
        shingleSize = 3, numPerm = 8, rowsPerBand = 2)
      val comp = Dedup.connectedComponents(docs, "doc_id", pairs, "doc_a", "doc_b")
      val sz = comp.groupBy("component").agg(count(lit(1)).as("cluster_n"))
      comp.join(sz, "component")
        .select(col("doc_id"), col("component"), col("cluster_n"),
          fp(lit(1.0) / col("cluster_n").cast("double"), 6).as("weight_fp6"))
        
    }),
    // 46l — DSIR importance resampling weights (Xie et al. 2023): the
    // domain-targeting selection pass — score every doc by how much
    // more TARGET-like (here: the English slice) than corpus-like its
    // char-trigram stream is, using two corpus-trained Laplace models
    // in exact fp6 integer arithmetic (probability-space difference
    // instead of the paper's log-ratio — same ordering signal, no
    // libm). keep_flag marks the docs an importance resample
    // up-weights. Shape: see TextAnalysis.dsirWeightsDf — two
    // broadcast-model scoring passes over one shared tri projection,
    // charset²-bounded models, corpus shuffles only at the per-doc agg
    "smp_dsir" -> ((s, dir) => {
      TextAnalysis.dsirWeightsDf(t(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en")
        
    }),
    // 31b — incremental snapshot dedup: today's batch anti-joined on
    // content hash against yesterday's corpus (distinct 16-byte hash
    // set, not documents, rides the shuffle)
    "dd_incremental" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val reference = docs.filter(col("doc_id") % 5 =!= 0)
      val incoming = docs.filter(col("doc_id") % 3 === 0)
      Dedup.dedupAgainst(incoming, reference, "doc_id", "text")
        .select("doc_id", "source", "n_chars")
        
    }),
    // 31d — the same incremental dedup behind the broadcast Bloom
    // pre-filter (no false negatives ⇒ bit-identical result, same
    // oracle shape): only might-contain rows ride the anti-join
    // shuffle — the 100 TB cost shape for snapshot-vs-corpus dedup
    "dd_incremental_bloom" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val reference = docs.filter(col("doc_id") % 5 =!= 0)
      val incoming = docs.filter(col("doc_id") % 3 === 0)
      Dedup.dedupAgainstBloom(incoming, reference, "doc_id", "text")
        .select("doc_id", "source", "n_chars")
        
    }),
    // 31e — eval-set decontamination (GPT-3/PaLM n-gram overlap rule):
    // training docs sharing any 4-gram with the held-out eval slice
    // (doc_id % 97 = 0) are dropped; eval grams reduce to a broadcast
    // distinct set, the train side is scanned once
    "dd_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.decontaminate(
        docs.filter(col("doc_id") % 97 =!= 0), "doc_id", "text",
        docs.filter(col("doc_id") % 97 === 0), "text", n = 4)
        .select("doc_id", "source", "n_chars")
        
    }),
    // 32b — MinHash Jaccard estimates over the LSH candidates (the
    // classic signature-agreement estimator)
    "dd_minhash_est" -> ((s, dir) => {
      Dedup.minhashEstPairs(t(s, dir, "documents"), "doc_id", "text",
        shingleSize = 3, numPerm = 8, rowsPerBand = 2)
        
    }),
    // 32m — b-bit minwise hashing (Li & König 2010): 2-bit truncated
    // signatures + the collision-corrected Jaccard estimate next to
    // the full-width estimator — the storage layout that shrinks a
    // corpus signature table 32× (what makes it broadcastable at
    // 100 TB). Same one-scan LSH candidate machinery as 32b.
    "dd_bbit_minhash" -> ((s, dir) => {
      Dedup.bbitMinhashEstPairs(t(s, dir, "documents"), "doc_id", "text",
        shingleSize = 3, numPerm = 8, rowsPerBand = 2, bBits = 2)
        
    }),
    // 33b — SimHash Hamming-neighbor pairs (pigeonhole band join)
    "dd_simhash_pairs" -> ((s, dir) => {
      Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text",
        maxHamming = 3)
        
    }),
    // 33c — 64-bit SimHash signatures (native one-pass expr; HOF twin
    // bit-equality spec-tested). 64 bits are the corpus-scale shape:
    // 16-bit bands under maxHamming=3 banding
    "dd_simhash64" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), Dedup.simhash64Native(col("text")).as("simhash"))
        
    }),
    // 33d — 64-bit SimHash Hamming pairs (16-bit pigeonhole bands —
    // 65,536 buckets/band vs the 32-bit signature's 256)
    "dd_simhash64_pairs" -> ((s, dir) => {
      Dedup.simhashPairs64(t(s, dir, "documents"), "doc_id", "text",
        maxHamming = 3)
        
    }),
    // 34b — the SAME set-similarity join via PREFIX FILTERING
    // (AllPairs/PPJoin): rarest-first prefixes generate candidates,
    // lossless at J ≥ 0.5 (spec proves output == brute all-pairs);
    // hot boilerplate shingles never reach the self-join by
    // construction — the df cap 34 needs is the ordering here
    "dd_prefix_join" -> ((s, dir) => {
      Dedup.prefixJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, threshold = 0.5)
        
    }),
    // 34 — n-gram Jaccard similarity pairs via shingle co-group
    "dd_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, threshold = 0.05, maxShingleDf = 1000)
        
    }),
    // 31f — cross-source duplicate matrix: for every (canonically
    // ordered) source pair, the number of exact-duplicate document
    // pairs spanning them — the corpus-composition contamination
    // profile dataset papers report (which crawls re-host which).
    // Every doc_id ≡ 1 (mod 10) gets its predecessor's text, so
    // cross-source dup pairs exist at every SF. The matrix never
    // materializes pairs: per-(hash, source) COUNTS join per hash, and
    // each cell is count arithmetic (C(n,2) same-source, n_a*n_b
    // cross). A 10^7-doc boilerplate cluster (empty pages, 404 bodies)
    // contributes ONE row per source to the join — never 10^14 pairs
    "dd_cross_matrix" -> ((s, dir) => {
      val d0 = t(s, dir, "documents")
      val base = d0.select((col("doc_id") + 1).as("doc_id"), col("text").as("_bt"))
      val d = d0.join(base, Seq("doc_id"), "left")
        .withColumn("aug",
          when(col("doc_id") % 10 === 1 && col("_bt").isNotNull, col("_bt"))
            .otherwise(col("text")))
        .select(col("source"), md5(col("aug")).as("h"))
      Dedup.crossSourceMatrix(d, "h", "source")
        
    }),
    // 34b — asymmetric containment near-dup: C(A→B) = |A∩B|/|A| over
    // shingles catches a doc embedded in a longer one where Jaccard
    // dilutes below any bar. Every doc_id ≡ 1 (mod 4) gets its
    // predecessor's full text appended, so (id−1, id) pairs provably
    // sit at containment 1.0 at every SF while Jaccard stays low
    "dd_containment" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val base = d.select((col("doc_id") + 1).as("doc_id"), col("text").as("_base_text"))
      val aug = d.join(base, Seq("doc_id"), "left")
        .withColumn("aug",
          when(col("doc_id") % 4 === 1 && col("_base_text").isNotNull,
            concat(col("text"), lit(" "), col("_base_text")))
            .otherwise(col("text")))
      Dedup.containmentPairs(aug, "doc_id", "aug", n = 3, threshold = 0.5, maxShingleDf = 1000)
        
    }),
    // 32e — substring-level duplication sweep (Lee et al. 2022): every
    // positional token 8-gram counted corpus-wide; per doc, the
    // fraction of its spans that occur more than once anywhere. The
    // per-doc signal that drives span-level strip decisions at scale
    "dd_dup_ngrams" -> ((s, dir) => {
      Dedup.dupNgramStats(t(s, dir, "documents"), "doc_id", "text", n = 8)
}),
    // 35 — embedding cosine near-dup within label buckets
    "dd_embed_neardup" -> ((s, dir) => {
      Similarity.nearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding", "label", 200000L)
        
    }),
    // 35d — SemDeDup-style semantic dedup (embedding-cluster based):
    // IVF cells bound the candidate set (never all-pairs), cosine-
    // threshold pairs within a cell, connected components, keep the
    // min-id representative per cluster with the cluster size. The
    // deterministic stride centroids make the whole chain (assign →
    // pairs → transitive closure) SQL-replicable
    "dd_semantic" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val cents = Similarity.ivfCentroids(e, "vec_id", "embedding", 16)
      val assigned = Similarity.ivfAssign(e, "vec_id", "embedding", cents)
      val pairs = Similarity.nearDupPairs(
        assigned.select(col("id").as("vec_id"), col("vec").as("embedding"), col("cell")),
        "vec_id", "embedding", "cell", 300000L)
      Dedup.connectedComponents(e.select("vec_id"), "vec_id", pairs, "id_a", "id_b")
        .groupBy("component").agg(count(lit(1)).as("n_members"))
        .select(col("component").as("keep_id"), col("n_members"))
        
    }),
    // 36 — brute-force cosine top-k against the min-id query vector
    "sim_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.orderBy("vec_id").limit(1)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("vec_id"), fp(Similarity.cosine(col("embedding"), col("qvec")), 6).as("cos_fp6"))
        .orderBy(col("cos_fp6").desc, col("vec_id"))
        .limit(10)
    }),
    // 37g — multi-vector MaxSim retrieval (ColBERT late interaction,
    // Khattab & Zaharia 2020): docs are GROUPS of vectors (vec_id
    // DIV 4 — 4 token vectors each), queries the first two groups;
    // score(q,d) = Σ_{query token} max_{doc token} cos. The per-token
    // cosine quantizes fp6 BEFORE the max, so max and sum are pure
    // long arithmetic on both engines. Query tokens broadcast onto
    // the corpus scan (queries are human-sized); two hash aggs (max
    // per (q,token,doc), sum per (q,doc)) — map-side partials, never
    // a per-doc sort; top-5 rank runs per query group only.
    "sim_maxsim" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"), expr("vec_id DIV 4").as("grp"))
      val q = e.filter(col("grp") < 2)
        .select(col("grp").as("qgrp"), col("vec_id").as("qtok"), col("embedding").as("qvec"))
      val w = Window.partitionBy("qgrp").orderBy(col("maxsim_fp6").desc, col("grp"))
      e.crossJoin(broadcast(q)).filter(col("grp") =!= col("qgrp"))
        .groupBy("qgrp", "qtok", "grp")
        .agg(max(fp(Similarity.cosine(col("embedding"), col("qvec")), 6)).as("mx"))
        .groupBy("qgrp", "grp").agg(sum("mx").as("maxsim_fp6"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        
    }),
    // 37 — LSH-bucketed ANN (rows-only; recall spec-tested vs brute
    // force). Runs with the scale guards on: degenerate buckets capped,
    // 2 extra multi-probe buckets per query to recover recall.
    "sim_ann_lsh" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.annLsh(e, e.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
        numPlanes = 8, dim = 64, k = 5, maxBucket = 1000L, nprobe = 2)
        
    }),
    // 37a — the SAME LSH ANN with guards off, fully ORACLE-CHECKED:
    // the hyperplanes are md5-derived, so DuckDB recomputes buckets,
    // fold-order dot products and the top-k bit-exactly
    "sim_ann_lsh_exact" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.annLsh(e, e.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
        numPlanes = 8, dim = 64, k = 5)
        
    }),
    // 37b — IVF ANN: inverted-list probe search (rows-only; the
    // probed-cells-exact contract is spec-tested like sim_ann_lsh)
    "sim_ann_ivf" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val cents = Similarity.ivfCentroids(e, "vec_id", "embedding", 16)
      val assigned = Similarity.ivfAssign(e, "vec_id", "embedding", cents)
      Similarity.ivfSearch(assigned, e.filter(col("vec_id") % 50 === 0), "vec_id", "embedding", cents, nprobe = 2, k = 5)
        
    }),
    // 37b2 — the SERVING shape of 37b: the same IVF probe search over
    // the PERSISTED index (IvfIndex parquet layout: one directory per
    // inverted list, probes prune at file-listing time). The index is
    // built at most once per testdata snapshot — keyed by the
    // embeddings table's path+mtime — and REUSED across invocations,
    // so repeated runs measure probe time without build time (the
    // min-of-N bench lands on a warm index), which is the number that
    // matters for an ANN serving deployment. Same oracle as
    // sim_ann_ivf: ivfCentroids is deterministic, so the persisted
    // index yields identical candidates and arithmetic.
    "sim_ann_ivf_disk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val path = ivfDiskPath(dir)
      if (!graft.similarity.IvfIndex.isComplete(s, path))
        graft.similarity.IvfIndex.build(e, "vec_id", "embedding", kCells = 16, path)
      graft.similarity.IvfIndex.search(s, path,
        e.filter(col("vec_id") % 50 === 0), "vec_id", "embedding", nprobe = 2, k = 5)
        
    }),
    // 37d2 — the SERVING shape of 37d: IVF-PQ AT REST. The persisted
    // layout adds `codes/` (4-byte-scale PQ codes, partitioned by the
    // SAME IVF cell directories) and `codebook/` to the 37b2 index, so
    // a probe reads nprobe cell directories of codes — never a corpus
    // float — and the ADC LUT is the only per-query math. Same
    // build-once / probe-many cache key as 37b2 (the PQ layer is added
    // to the cached index the first time this query runs against a
    // snapshot); spec-asserted bit-identical to the in-memory
    // pqIvfSearch composition, so it shares sim_ann_ivfpq's oracle.
    "sim_ann_ivfpq_disk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val path = ivfDiskPath(dir)
      if (!graft.similarity.IvfIndex.isComplete(s, path))
        graft.similarity.IvfIndex.build(e, "vec_id", "embedding", kCells = 16, path)
      if (!graft.similarity.IvfIndex.isComplete(s, path, pq = true))
        graft.similarity.IvfIndex.buildPq(e, "vec_id", "embedding",
          dim = 64, m = 4, kCodes = 16, path = path)
      graft.similarity.IvfIndex.searchPq(s, path,
        e.filter(col("vec_id") % 50 === 0), "vec_id", "embedding", nprobe = 2, k = 5)
        
    }),
    // 37e2 — the SERVING shape of 37e: retrieve→rerank over the
    // PERSISTED IVF-PQ index. The ADC retrieval reads nprobe cell
    // directories of codes and the exact rescore reads true vectors
    // from the SAME probed cells' partitions (candidates live there by
    // construction) — so the bench row prices probe+rescore against an
    // at-rest index, not the in-query index rebuild that dominates
    // sim_ann_rerank's cost. Same build-once / probe-many cache key as
    // 37b2/37d2; spec-asserted bit-identical to the in-memory
    // pqIvfRerank composition, so it shares sim_ann_rerank's oracle.
    "sim_ann_rerank_disk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val path = ivfDiskPath(dir)
      if (!graft.similarity.IvfIndex.isComplete(s, path))
        graft.similarity.IvfIndex.build(e, "vec_id", "embedding", kCells = 16, path)
      if (!graft.similarity.IvfIndex.isComplete(s, path, pq = true))
        graft.similarity.IvfIndex.buildPq(e, "vec_id", "embedding",
          dim = 64, m = 4, kCodes = 16, path = path)
      graft.similarity.IvfIndex.searchRerank(s, path,
        e.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
        nprobe = 2, kCand = 20, k = 5)
        
    }),
    // 38 — stopword-scoring language ID (staged: tokens project once)
    "txt_langid" -> ((s, dir) => {
      TextAnalysis.langIdDf(t(s, dir, "documents"), "doc_id", "text")
        
    }),
    // 38b — char-trigram (Cavnar–Trenkle-style) language ID (staged:
    // the gram array projects once — the inline form was 8× slower)
    "txt_langid_ngram" -> ((s, dir) => {
      TextAnalysis.langIdNgramDf(t(s, dir, "documents"), "doc_id", "text")
        
    }),
    // 38l — classifier EVALUATION report (the eval harness every
    // pipeline classifier ships with): both language-ID
    // implementations scored against the truth label per language —
    // accuracy of each plus inter-classifier agreement (the
    // label-free proxy monitored when truth is missing). Two
    // single-pass prediction frames equi-joined back on doc_id, then
    // a languages-bounded rollup; rates are exact small-int
    // divisions fp4-quantized.
    "txt_langid_eval" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val a = TextAnalysis.langIdDf(docs, "doc_id", "text", out = "pred_stop")
      val b = TextAnalysis.langIdNgramDf(docs, "doc_id", "text", out = "pred_gram")
      docs.select(col("doc_id"), col("lang"))
        .join(a, "doc_id").join(b, "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("pred_stop") === col("lang"), 1L).otherwise(0L)).as("n_stop_ok"),
          sum(when(col("pred_gram") === col("lang"), 1L).otherwise(0L)).as("n_gram_ok"),
          sum(when(col("pred_stop") === col("pred_gram"), 1L).otherwise(0L)).as("n_agree"))
        .select(col("lang"), col("n_docs"), col("n_stop_ok"), col("n_gram_ok"), col("n_agree"),
          fp(col("n_stop_ok").cast("double") / col("n_docs").cast("double"), 4).as("acc_stop_fp4"),
          fp(col("n_gram_ok").cast("double") / col("n_docs").cast("double"), 4).as("acc_gram_fp4"),
          fp(col("n_agree").cast("double") / col("n_docs").cast("double"), 4).as("agree_fp4"))
        
    }),
    // 39 — quality scoring (length/punct/stopword ratios; staged tokens)
    "txt_quality" -> ((s, dir) => {
      TextAnalysis.qualityDf(t(s, dir, "documents"), "doc_id", "text")
        
    }),
    // 40 — token counting (whitespace + BPE-ish regex pre-tokenizer)
    "txt_tokens" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_ws_tokens"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_word_tokens"))
}),
    // 40b — vocab-table-driven BPE tokenization: the REAL tokenizer
    // walk (canonical greedy merge loop over a ranked merges table —
    // Sennrich et al. 2016 / the GPT-2 reference encoder), not the
    // regex proxy. Native codegen'd expression does one pass per word
    // with a literal-built pair→rank map; the oracle replicates the
    // identical walk as a recursive CTE over a bracketed string form
    // where one `replace` = one left-to-right non-overlapping merge
    // pass. The full token STRING is checked, not just counts — any
    // divergence in pair choice, tie-break, or merge order
    // hash-mismatches. `size(bpe)` is the drop-in real-token counter
    // for smp_pack / smp_budget / smp_mix (they take any count col).
    "txt_bpe_tokens" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.bpeTokens(col("text")).as("bpe"))
        .select(col("doc_id"),
          size(col("bpe")).cast("long").as("n_bpe_tokens"),
          array_join(col("bpe"), " ").as("bpe_text"))
        
    }),
    // 41 — polynomial rolling-hash document fingerprint
    "txt_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text"), 64).as("fp_hash"))
        
    }),
    // 41i — winnowing fingerprints (Schleimer et al. 2003 / MOSS):
    // word-3-gram hash stream, sliding 4-window minimum with
    // rightmost tie-break — a fingerprint lands in EVERY window, so
    // any ≥6-token shared substring between two docs shares one,
    // while only ~2/(w+1) of grams are kept. Native one-pass deque
    // (graft_winnow); narrow, zero shuffle; short docs (<3 tokens)
    // emit nothing, mirrored by the oracle's hs-nonempty guard
    "txt_winnow" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode(TextAnalysis.winnow(TextAnalysis.tokens(col("text")), 3, 4)).as("e"))
        .select(col("doc_id"), col("e.pos").as("pos"), col("e.fp").as("fp"))
        
    }),
    // 34c — winnow-pair matching (the MOSS match step): docs sharing
    // >= 2 winnow fingerprints pair up. The self-join runs over the
    // WINNOWED stream (~2/(w+1) of the gram universe) — the shingle
    // self-join's shape at a fraction of its exchange volume, with
    // the every-window guarantee bounding what sampling can miss.
    // Same planted aug as dd_containment (doc_id % 4 == 1 appends its
    // predecessor's text) so matching pairs exist at every SF
    "dd_winnow_pairs" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val base = d.select((col("doc_id") + 1).as("doc_id"), col("text").as("_base_text"))
      val aug = d.join(base, Seq("doc_id"), "left")
        .withColumn("aug",
          when(col("doc_id") % 4 === 1 && col("_base_text").isNotNull,
            concat(col("text"), lit(" "), col("_base_text")))
            .otherwise(col("text")))
      Dedup.winnowPairs(aug, "doc_id", "aug", n = 3, w = 4, minShared = 2)
        
    }),
    // 32i — dedup-recall EVAL harness (the emb_mrl_recall argument
    // applied to dedup: before a near-dup config ships against a
    // corpus, measure what it actually catches): plant ground-truth
    // near-dup pairs (every doc_id%4==1 becomes its predecessor's
    // text + a 1-token edit — high-Jaccard by construction, the
    // dd_winnow_pairs planting pattern), run the REAL MinHash-LSH
    // candidate pipeline over the planted corpus, score
    // precision/recall against the planted truth in exact integers +
    // two guarded fp4 divides. Both engines replicate the whole
    // pipeline, so the metrics — not just the pairs — are verified.
    // Shapes: the LSH pipeline's own banded shuffles + three 1-row
    // aggs; truth is an id-arithmetic self-join, keyed.
    "dd_eval_recall" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val base = docs.select((col("doc_id") + 1).as("doc_id"), col("text").as("_base_text"))
      val aug = docs.join(base, Seq("doc_id"), "left")
        .withColumn("aug",
          when(col("doc_id") % 4 === 1 && col("_base_text").isNotNull,
            concat(col("_base_text"), lit(" planteddup")))
            .otherwise(col("text")))
      // pin the candidate-pair table (pairs-sized, NOT corpus-sized —
      // the ev_covisit idiom): tp and n_pred both consume it, and
      // without the checkpoint each re-runs the whole LSH pipeline
      val pred = Dedup.lshCandidatePairs(aug, "doc_id", "aug",
        shingleSize = 3, numPerm = 8, rowsPerBand = 2)
        .localCheckpoint()
      val truth = docs.filter(col("doc_id") % 4 === 1)
        .join(docs.select((col("doc_id") + 1).as("doc_id")), Seq("doc_id"), "left_semi")
        .select((col("doc_id") - 1).as("doc_a"), col("doc_id").as("doc_b"))
        .localCheckpoint()
      val tp = pred.join(truth, Seq("doc_a", "doc_b"), "left_semi")
        .agg(count(lit(1)).as("tp"))
      val np = pred.agg(count(lit(1)).as("n_pred"))
      val nt = truth.agg(count(lit(1)).as("n_truth"))
      nt.crossJoin(broadcast(np)).crossJoin(broadcast(tp))
        .select(col("n_truth"), col("n_pred"), col("tp"),
          when(col("n_pred") === 0, lit(0L))
            .otherwise(fp(col("tp").cast("double") / col("n_pred").cast("double"), 4)).as("precision_fp4"),
          when(col("n_truth") === 0, lit(0L))
            .otherwise(fp(col("tp").cast("double") / col("n_truth").cast("double"), 4)).as("recall_fp4"))
    }),
    // 48 — the WET ingestion loop END-TO-END, oracle-gated (the
    // cg_pipeline_counts argument applied to the web-corpus ingress):
    // documents → distributed sharded .warc.wet.gz export (every
    // partition streams one multi-member shard) → split-scan
    // distributed read-back → md5 re-derivation per doc. The oracle
    // recomputes the md5 straight from the documents table, so ANY
    // byte drift in the gzip member framing, the WARC header
    // rendering, the split-scan member ownership, or the payload
    // decode hash-mismatches. Tiny rangeBytes forces members across
    // split boundaries on every run
    "src_wet_roundtrip" -> ((s, dir) => {
      val tmp = scratchDir("wet")
      val docs = t(s, dir, "documents")
        .select(concat(lit("doc://"), col("doc_id")).as("url"),
          lit("conversion").as("warc_type"),
          lit("2024-01-01T00:00:00Z").as("date"), col("text"))
      graft.web.WarcWet.writeSharded(docs, tmp)
      graft.web.WarcWet.read(s, tmp, rangeBytes = 4096L)
        .select(substring(col("url"), 7, 30).cast("long").as("doc_id"),
          col("length").as("n_bytes"), md5(col("text")).as("h"))
        
    }),
    // 48b — the JSONL corpus interchange loop END-TO-END (JSONL is
    // THE LLM-corpus wire format — Pile/RedPajama/Dolma all ship
    // it): documents → distributed gzip JSON-lines export through
    // Spark's NATIVE json sink (one shard per partition — the
    // declarative path, nothing hand-rolled) → schema-pinned
    // distributed read-back → per-doc md5 re-derivation. The oracle
    // recomputes the hashes straight from the documents table, so
    // any drift in JSON string escaping, charset round-trip, gzip
    // framing, or shard ownership hash-mismatches. Gzip shards are
    // not splittable — at 100 TB parallelism = shard count, which
    // the export side controls by partition count.
    "src_jsonl_roundtrip" -> ((s, dir) => {
      val tmp = scratchDir("jsonl")
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("text"))
        .write.mode("overwrite").option("compression", "gzip").json(tmp)
      s.read.schema("doc_id LONG, lang STRING, source STRING, text STRING").json(tmp)
        .select(col("doc_id"), col("lang"), col("source"),
          length(col("text")).cast("long").as("n_chars_rt"),
          md5(col("text")).as("h"))
        
    }),
    // 48i — corrupt-record tolerant JSON ingest (the PERMISSIVE
    // schema-on-read discipline a crawl/vendor feed needs): every
    // 7th synthesized record is truncated mid-token, the parse must
    // NOT fail the job — malformed rows surface as nulls, flagged
    // 'CORRUPT', and the good rows' payloads come through intact
    // (id checksum per lang proves no silent row swallowing). A
    // per-row codegen'd parse, zero shuffles before the tiny rollup;
    // at 100 TB the same plan quarantines bad rows to a side output
    // instead of killing a 10⁵-task ingest for one byte flip.
    "src_jsonl_corrupt" -> ((s, dir) => {
      val synth = t(s, dir, "documents").select(
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(lit("{\"id\": "), col("doc_id"), lit(", \"lang\": ")))
          .otherwise(concat(lit("{\"id\": "), col("doc_id"),
            lit(", \"lang\": \""), col("lang"), lit("\"}"))).as("js"))
      val parsed = synth.select(
        from_json(col("js"), org.apache.spark.sql.types.StructType.fromDDL(
          "id LONG, lang STRING")).as("p"))
      parsed
        .select(coalesce(col("p.lang"), lit("CORRUPT")).as("lang_parsed"),
          col("p.id"))
        .groupBy("lang_parsed")
        .agg(count(lit(1)).as("n"), count(col("id")).as("n_ids"),
          sum(coalesce(col("id"), lit(0L))).as("sum_id"))
        
    }),
    // 48d — partitioned-parquet write + partition-PRUNED read (the
    // other half of the 100 TB storage-layout discipline next to
    // src_bucketed_join's bucketing): events written partitioned by
    // event_type, read back with a partition-key filter — the scan
    // must list ONLY the matching directory (PartitionFilters in the
    // plan, spec-asserted), so a 100 TB corpus filtered to one type
    // reads that type's bytes and nothing else. The daily rollup on
    // the re-read frame goes through the dataType-branched tsMs (the
    // roundtrip preserves the timestamp type).
    "src_partitioned_scan" -> ((s, dir) => {
      val tmp = scratchDir("part")
      t(s, dir, "events")
        .write.mode("overwrite").partitionBy("event_type").parquet(tmp)
      val rd = s.read.parquet(tmp).filter(col("event_type") === "purchase")
      rd.select(tsMs(rd).as("ms"), fp(col("value"), 4).as("v4"))
        .groupBy(expr("ms DIV 86400000").as("day"))
        .agg(count(lit(1)).as("n"), sum("v4").as("sum_v4"))
        
    }),
    // 44h — SCHEMA-EVOLUTION read (the lakehouse reality that a
    // 100 TB table accumulates files from many writer versions):
    // batch v1 predates the `source`/`n_chars` columns, batch v2
    // carries them. mergeSchema=true unions the parquet footers into
    // one superset schema and back-fills absent columns with null —
    // old files are never rewritten to add a column (at 100 TB you
    // cannot rewrite history; the merge cost is footer-sized, not
    // data-sized). The profile splits legacy (null-source) rows from
    // evolved rows per lang, proving the back-fill is observable.
    "src_schema_evolution" -> ((s, dir) => {
      val tmp = scratchDir("evo")
      val docs = t(s, dir, "documents")
      docs.filter(col("doc_id") % 2 === 0).select("doc_id", "lang")
        .write.mode("overwrite").parquet(s"$tmp/v1")
      docs.filter(col("doc_id") % 2 === 1)
        .select("doc_id", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/v2")
      s.read.option("mergeSchema", "true").parquet(s"$tmp/v1", s"$tmp/v2")
        .groupBy("lang").agg(
          count(lit(1)).as("n"),
          sum(when(col("source").isNull, 1L).otherwise(0L)).as("n_legacy"),
          sum(coalesce(col("n_chars"), lit(0L))).as("sum_chars_v2"))
        
    }),
    // 44g — DYNAMIC partition pruning (the join-driven half of the
    // pruning story next to src_partitioned_scan's static filter):
    // the fact is partitioned by event_type, and the dim's filter —
    // an md5 prefix test the optimizer cannot constant-fold into the
    // fact side — only resolves at RUNTIME. DPP injects the dim's
    // key set into the fact scan as a dynamic PartitionFilter
    // (spec-asserted), so only the 3-of-5 surviving partition
    // directories are listed and read. At 100 TB this is the
    // date-dim → fact-partition pattern: the fact never scans
    // partitions the dim filter excludes, without hand-written
    // static predicates.
    "src_dpp" -> ((s, dir) => {
      val tmp = scratchDir("dpp")
      t(s, dir, "events")
        .write.mode("overwrite").partitionBy("event_type").parquet(tmp)
      val fact = s.read.parquet(tmp)
      val dim = t(s, dir, "events").select(col("event_type")).distinct()
        .filter(substring(md5(col("event_type")), 1, 1) < "a")
      fact.join(broadcast(dim), "event_type")
        .select(col("event_type"), tsMs(fact).as("ms"), fp(col("value"), 4).as("v4"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("v4").as("sum_v4"))
        
    }),
    // 41b — text normalization (canonical form for dedup)
    "txt_normalize" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.normalize(col("text")).as("norm_text"))
        
    }),
    // 41c — stopword removal
    "txt_stopword_remove" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.removeStopwords(col("text")).as("clean_text"))
        
    }),
    // 39b — repetition ratio: 1 - distinct/total tokens (fp4), the
    // C4-style repetitiveness quality signal
    // 41r — sentence SEGMENTATION stats (the unit every
    // sentence-level filter, splitter, and readability rule consumes;
    // 41l's readability counts sentence RUNS — this materializes the
    // segments): split on [.!?]+ runs, strip edge whitespace by
    // regex (engine-identical; trim() semantics differ), drop empty
    // segments. The synthetic corpus carries no punctuation, so
    // boundaries are synthesized first by plain substring replaces
    // of two frequent tokens (the txt_url_normalize synthetic-input
    // precedent; replace() is engine-identical left-to-right
    // non-overlapping). Pure narrow map — zero shuffles; the per-doc
    // fold is sentence-count-bounded.
    "txt_sentencize" -> ((s, dir) => {
      val punct = expr("replace(replace(text, ' merge ', '. '), ' batch ', '! ')")
      val segs = filter(
        transform(split(punct, "[.!?]+"),
          x => regexp_replace(x, "^\\s+|\\s+$", "")),
        x => length(x) > 0)
      t(s, dir, "documents")
        .select(col("doc_id"), segs.as("segs"))
        .select(col("doc_id"),
          size(col("segs")).as("n_sent"),
          aggregate(col("segs"), lit(0L), (a, x) => a + length(x)).as("sum_len"),
          aggregate(col("segs"), lit(0), (a, x) => greatest(a, length(x))).as("max_len"))
        
    }),
    "txt_repetition" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("_toks"))
        .select(col("doc_id"),
          when(size(col("_toks")) === 0, lit(0L))
            .otherwise(fp(lit(1.0) - size(array_distinct(col("_toks"))).cast("double") / size(col("_toks")).cast("double"), 4))
            .as("repetition_fp4"))
        
    }),
    // 39c — vocabulary-growth stats: per-doc type count and hapax
    // (once-only) fraction, the Zipf-tail quality signal that
    // repetition/TTR miss. Explode + two-level partial agg — the
    // (doc, token) combine collapses repeats map-side, so the shuffle
    // carries per-doc vocabularies, not token streams
    "txt_hapax" -> ((s, dir) => {
      val tokCounts = t(s, dir, "documents")
        .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      t(s, dir, "documents").select(col("doc_id"))
        .join(tokCounts, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          coalesce(col("n_types"), lit(0L)).as("n_types"),
          coalesce(col("n_hapax"), lit(0L)).as("n_hapax"))
        .withColumn("hapax_frac_fp4",
          when(col("n_types") === 0, lit(0L))
            .otherwise(fp(col("n_hapax").cast("double") / col("n_types").cast("double"), 4)))
        
    }),
    // 39g — per-source χ² divergence from the corpus unigram
    // distribution (domain-shift profiling). χ², not KL: KL needs
    // log(), whose last ulp differs across libm builds (the charlm
    // lesson); χ² is pure rational arithmetic — exact decimal ratios
    // per term, fp9-quantized, integer-summed, absent-token mass
    // folded in from one exact integer sum
    "txt_domain_div" -> ((s, dir) => {
      TextAnalysis.domainDivergenceDf(t(s, dir, "documents"), "source", "text")
        
    }),
    // 39e — Gopher-style quality-rule ensemble (Rae et al. §A1.1):
    // word-count bounds, mean-word-length bounds, symbol ratio,
    // alpha-word fraction, stopword presence — signals quantized
    // BEFORE thresholding so the keep flag itself is engine-exact.
    // Narrow, zero shuffle
    "txt_gopher" -> ((s, dir) => {
      TextAnalysis.gopherRulesDf(t(s, dir, "documents"), "doc_id", "text")
        
    }),
    // 39d — corpus-trained char-trigram LM quality score (CCNet-style
    // perplexity filtering, engine-portable: per-position Laplace
    // probabilities fp6-quantized and integer-summed — no log(),
    // whose last ulp differs across libm implementations). Model =
    // the corpus's own trigram stats: two charset²-bounded partial
    // aggs broadcast back; the corpus side never shuffles by gram
    "txt_charlm" -> ((s, dir) => {
      TextAnalysis.charLmScoreDf(t(s, dir, "documents"), "doc_id", "text")
        
    }),
    // 41d — PII masking (emails + phone numbers; PII is synthesized
    // into the text so the patterns actually fire at every SF)
    "txt_pii_mask" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("aug", concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"), lit("@example.com or 555-"),
          lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-4567 now")))
        .select(col("doc_id"), TextAnalysis.maskPii(col("aug")).as("masked"))
        
    }),
    // 41e — consecutive-duplicate-token cleanup (stutter removal;
    // synthetic stutter appended so the filter provably fires)
    "txt_dedup_tokens" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("aug", concat(col("text"), lit(" go go stop stop stop end")))
        .select(col("doc_id"), TextAnalysis.dedupConsecutiveTokens(col("aug")).as("clean_text"))
        
    }),
    // 35b — int8 embedding quantization (the storage layout ANN
    // indexes ship at scale), exploded for verification
    "emb_quantize" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(col("vec_id"), Similarity.quantizeInt8(col("embedding")).as("qz"))
        .select(col("vec_id"), fp(col("qz.scale"), 6).as("scale_fp6"),
          posexplode(col("qz.q")).as(Seq("pos", "q")))
    }), // row-per-dim output — no presentation sort (checker row-sorts)
    // 35m — PROTOTYPE (coreset exemplar) selection per label: the
    // vector nearest its class centroid — the classic class-prototype
    // / dataset-distillation pick (and the few-shot support-set
    // builder). ALL-INTEGER: embeddings quantize to fp3 ints, and
    // "nearest to mean" evaluates as argmin Σ_d (q_d·n − s_d)² — the
    // mean CLEARED of its /n (≤ ~6.4e15 at sf0.1 — inside long;
    // a real corpus re-scales the quantization or lifts to
    // DECIMAL(38,0), the emb_class_sep staging). Centroid sums are
    // one (label,dim)-keyed hash agg (≤ labels×64 rows, broadcast
    // back); argmin is the keepBest min-dist + join-back idiom —
    // struct-min would plan a SortAggregate.
    "emb_prototypes" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          transform(col("embedding"), v => fp(v.cast("double"), 3)).as("q"))
      val cnt = e.groupBy("label").agg(count(lit(1)).as("n")).localCheckpoint()
      val cents = e.select(col("label"), posexplode(col("q")).as(Seq("d", "qv")))
        .groupBy("label", "d").agg(sum("qv").as("sd"))
        .groupBy("label")
        .agg(transform(array_sort(collect_list(struct(col("d"), col("sd")))),
          x => x.getField("sd")).as("sds"))
        .localCheckpoint() // label-domain-sized; keeps broadcast rebuilds off the corpus
      val dist = e.join(broadcast(cents), "label").join(broadcast(cnt), "label")
        .select(col("label"), col("vec_id"), col("n"),
          aggregate(zip_with(col("q"), col("sds"),
              (qd, sd) => (qd * col("n") - sd) * (qd * col("n") - sd)),
            lit(0L), (a, x) => a + x).as("dist"))
      val best = dist.groupBy("label").agg(min("dist").as("dist"))
      dist.join(best, Seq("label", "dist"))
        .groupBy("label", "dist", "n").agg(min("vec_id").as("proto_id"))
        .select(col("label"), col("proto_id"), col("dist").as("min_dist"), col("n"))
        
    }),
    // 35f — embedding QA outlier gate (the vector-hygiene pass run
    // before an ANN build or a contrastive train: truncated/blown-up
    // vectors poison both): squared norm per vector via the strict
    // left-fold dot (bit-identical across engines), fp2-quantized so
    // the distribution HISTOGRAM is value-domain-bounded; Tukey
    // fences (Q1/Q3 ± 1.5·IQR) from the ev_percentile rank scan, in
    // ALL-INTEGER form (2·v < 2·q1 − 3·(q3−q1) — no /2 rounding
    // drift); the 1-row fence frame broadcasts back over the corpus.
    "emb_outliers" -> ((s, dir) => {
      val sq = t(s, dir, "embeddings")
        .select(col("vec_id"),
          fp(Similarity.dot(col("embedding"), col("embedding")), 2).as("sqn_c2"))
      val wc = Window.orderBy("sqn_c2").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val fences = sq.groupBy("sqn_c2").agg(count(lit(1)).as("k"))
        .withColumn("cum", sum("k").over(wc))
        .withColumn("n", sum("k").over(Window.partitionBy()))
        .agg(
          min(when(col("cum") >= expr("(n + 3) DIV 4"), col("sqn_c2"))).as("q1"),
          min(when(col("cum") >= expr("(3 * n + 3) DIV 4"), col("sqn_c2"))).as("q3"))
      sq.crossJoin(broadcast(fences))
        .select(col("vec_id"), col("sqn_c2"), col("q1"), col("q3"),
          (col("sqn_c2") * 2 < col("q1") * 2 - (col("q3") - col("q1")) * 3 ||
           col("sqn_c2") * 2 > col("q3") * 2 + (col("q3") - col("q1")) * 3)
            .cast("long").as("is_outlier"))
        
    }),
    // 35c — product quantization: 64-dim vectors → 4 subspaces × 16
    // codes (deterministic stride codebook, same seeding as IVF so the
    // whole build-and-encode path replicates in SQL). Encode is a
    // zero-shuffle literal-argmin projection — the 4-8× ANN storage
    // compression pass
    "emb_pq" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val cb = Similarity.pqCodebook(e, "vec_id", "embedding", dim = 64, m = 4, k = 16)
      Similarity.pqEncode(e, "vec_id", "embedding", cb)
        
    }),
    // 35k — PQ DISTORTION profile (the compression-quality report
    // that gates an ANN deployment: how much squared error does each
    // subquantizer introduce?): per subspace, count / exact integer
    // SUM / max of the per-row fp6 squared reconstruction error the
    // verified pqEncode path already emits. Summing the fp6 ints is
    // exact and order-free, so the corpus-wide distortion total is
    // bit-stable across partitionings — the number you trend across
    // codebook retrainings. One corpus encode pass + a 4-key rollup.
    "emb_pq_distortion" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val cb = Similarity.pqCodebook(e, "vec_id", "embedding", dim = 64, m = 4, k = 16)
      Similarity.pqEncode(e, "vec_id", "embedding", cb)
        .groupBy("sub")
        .agg(count(lit(1)).as("n"), sum("d2_fp6").cast("long").as("sum_d2_fp6"),
          max("d2_fp6").as("max_d2_fp6"))
        
    }),
    // 35e — Matryoshka-truncation recall (Kusupati et al. 2022): per
    // truncation dim, brute cosine top-k over the first d components
    // vs full-dim top-k — the eval harness run before serving
    // truncated vectors. Broadcast queries, salted two-stage ranking,
    // overlap join k rows/query
    "emb_mrl_recall" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.mrlRecall(e, "vec_id", "embedding",
        e.filter(col("vec_id") % 50 === 0), dims = Seq(16, 32), fullDim = 64, k = 5)
        
    }),
    // 37c — PQ-ADC probe search (Jégou et al.): per-query LUT of
    // subvector-to-codebook distances, corpus rows cost one LUT probe
    // per subspace — distance against the whole corpus without
    // touching a corpus float. fp6-quantized per-subspace so the
    // m-way sum is integer-exact; fully oracle-checked
    "sim_ann_pq" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      // collect the m×k codebook ONCE (driver-sized); encode and the
      // ADC LUT used to re-collect it — one codebook job each
      val cb = Similarity.collectCodebook(
        Similarity.pqCodebook(e, "vec_id", "embedding", dim = 64, m = 4, k = 16))
      val enc = Similarity.pqEncode(e, "vec_id", "embedding", cb, Nil)
      Similarity.pqSearch(enc, cb, e.filter(col("vec_id") % 50 === 0),
        "vec_id", "embedding", k = 5)

    }),
    // 37d — IVF-pruned PQ-ADC probe search (IVF-PQ): the IVF inverted
    // lists prune the corpus to nprobe cells per query before the ADC
    // LUT probe, so a query touches ~nprobe/k_cells of the encoded
    // corpus and never a corpus float — the true 100 TB ANN serving
    // shape. The codes are encoded from the ASSIGNED frame so they
    // leave the encode already cell-keyed (the IvfIndex.buildPq
    // at-rest layout): the probe is a direct cell equi-join on the
    // encoded side — the corpus is pruned BEFORE any shuffle, never
    // id-joined corpus-wide. Same deterministic stride seeding as
    // sim_ann_ivf/emb_pq, so the whole composition replicates in SQL;
    // fully oracle-checked
    "sim_ann_ivfpq" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val nE = e.count() // ONE corpus count serves centroid + codebook strides
      val cents = Similarity.ivfCentroids(e, "vec_id", "embedding", 16, nE)
      val assigned = Similarity.ivfAssign(e, "vec_id", "embedding", cents)
      val cb = Similarity.collectCodebook( // collected ONCE for encode + LUT
        Similarity.pqCodebook(e, "vec_id", "embedding", dim = 64, m = 4, k = 16, n = nE))
      val enc = Similarity.pqEncode(
        assigned.select(col("id").as("vec_id"), col("vec").as("embedding"), col("cell")),
        "vec_id", "embedding", cb, carry = Seq("cell"))
      Similarity.pqIvfSearch(enc, cb, assigned, cents,
        e.filter(col("vec_id") % 50 === 0), "vec_id", "embedding", nprobe = 2, k = 5,
        maxLutBroadcastBytes = 64L << 20)

    }),
    // 37e — retrieve→rerank (the production serving composition):
    // IVF-PQ retrieves 20 approximate candidates per query without
    // touching corpus floats, exact cosine re-scores ONLY those 20 —
    // the true-distance work is queries·kCand regardless of corpus
    // size, and the returned order is exact
    "sim_ann_rerank" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val nE = e.count() // ONE corpus count serves centroid + codebook strides
      val cents = Similarity.ivfCentroids(e, "vec_id", "embedding", 16, nE)
      val assigned = Similarity.ivfAssign(e, "vec_id", "embedding", cents)
      val cb = Similarity.collectCodebook( // collected ONCE for encode + LUT
        Similarity.pqCodebook(e, "vec_id", "embedding", dim = 64, m = 4, k = 16, n = nE))
      val enc = Similarity.pqEncode(
        assigned.select(col("id").as("vec_id"), col("vec").as("embedding"), col("cell")),
        "vec_id", "embedding", cb, carry = Seq("cell"))
      Similarity.pqIvfRerank(enc, cb, assigned, cents,
        e.filter(col("vec_id") % 50 === 0), "vec_id", "embedding", e,
        nprobe = 2, kCand = 20, k = 5)

    }),
    // 37g — mutual k-NN GRAPH construction (the batch input every
    // graph-based ANN index — HNSW/NSG — and SemDeDup-style cluster
    // pass starts from): candidates are CELL-BOUNDED (the same
    // deterministic stride-centroid IVF assignment as 37b — never the
    // all-pairs corpus square; at 100 TB raise the cell count so
    // |cell| stays ~√N and the self-join stays linear-ish), per-node
    // top-3 via a per-node window over ≤|cell| candidate rows (window
    // partition = node id, never corpus-sized), then the MUTUAL
    // filter: an undirected edge survives iff each endpoint ranks the
    // other in ITS top-3 — a self-join of the k·N-row kNN table on
    // the reversed key pair. Fully oracle-checked: the IVF
    // assignment, fold-order cosines, rank tie-breaks (cos_fp6 desc,
    // id asc) and the mutual join all replicate in SQL.
    // 35n — IVF index BALANCE report (the ops view of an ANN build:
    // skewed cells mean skewed probe latency and hot partitions —
    // this is the number you re-train centroids over): cell-size
    // min/max/total + the max/avg skew factor, exactly. One assign
    // pass + a cells-bounded rollup into a 1-row report.
    "emb_cell_balance" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val cents = Similarity.ivfCentroids(e, "vec_id", "embedding", 16)
      Similarity.ivfAssign(e, "vec_id", "embedding", cents)
        .groupBy("cell").agg(count(lit(1)).as("sz"))
        .agg(count(lit(1)).as("n_cells"), min("sz").as("min_sz"),
          max("sz").as("max_sz"), sum("sz").as("total"))
        .withColumn("skew_fp4",
          expr("(max_sz * n_cells * 20000 + total) DIV (2 * total)"))
    }),
    // 32n — dedup-THRESHOLD calibration sweep (every near-dup pass
    // has a τ; this is the curve you pick it from): within-cell pair
    // similarities histogrammed at fp2 granularity over cos ≥ 0.1 —
    // how many pairs would each threshold merge? Cell-blocked like
    // sim_knn_graph (the IVF assignment bounds the self-join to
    // cell-sized blocks — never corpus-quadratic); the histogram is
    // value-domain-bounded (≤ 91 buckets).
    "dd_threshold_sweep" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val nE = e.count() // one corpus count serves kCells AND the stride pick
      val cents = Similarity.ivfCentroids(e, "vec_id", "embedding", adaptiveCells(nE), nE)
      val assigned = Similarity.ivfAssign(e, "vec_id", "embedding", cents)
      val a = assigned.select(col("id").as("id_a"), col("vec").as("_va"), col("cell"))
      val b = assigned.select(col("id").as("id_b"), col("vec").as("_vb"), col("cell"))
      a.join(b, "cell")
        .filter(col("id_a") < col("id_b"))
        .select(fp(Similarity.cosine(col("_va"), col("_vb")), 6).as("cos_fp6"))
        .filter(col("cos_fp6") >= 100000L)
        .select(expr("cos_fp6 DIV 10000").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n_pairs"))
        
    }),
    "sim_knn_graph" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val nE = e.count() // one corpus count serves kCells AND the stride pick
      val cents = Similarity.ivfCentroids(e, "vec_id", "embedding", adaptiveCells(nE), nE)
      val assigned = Similarity.ivfAssign(e, "vec_id", "embedding", cents)
      val a = assigned.select(col("id").as("id_a"), col("vec").as("_va"), col("cell"))
      val b = assigned.select(col("id").as("id_b"), col("vec").as("_vb"), col("cell"))
      val scored = a.join(b, "cell")
        .filter(col("id_a") =!= col("id_b"))
        .select(col("id_a"), col("id_b"),
          fp(Similarity.cosine(col("_va"), col("_vb")), 6).as("cos_fp6"))
      val wk = Window.partitionBy("id_a")
        .orderBy(col("cos_fp6").desc, col("id_b"))
      val knn = scored
        .withColumn("_rk", row_number().over(wk))
        .filter(col("_rk") <= 3)
        .select("id_a", "id_b", "cos_fp6")
      knn.as("x")
        .join(knn.select(col("id_a").as("id_b"), col("id_b").as("id_a")).as("y"),
          Seq("id_a", "id_b"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("cos_fp6"))
        
    }),
    // 35l — HARD-NEGATIVE mining over the labeled embeddings (the
    // contrastive-training data op: per anchor, the most-similar
    // DIFFERENT-label vector = hardest negative, the most-similar
    // same-label vector = nearest positive, and the margin between
    // them — anchors with negative margin are the label noise /
    // boundary cases a triplet-loss curriculum feeds first).
    // Candidates are blocked by the deterministic IVF cell (the
    // sim_ann_ivf machinery): hard negatives are by definition NEAR
    // the anchor, so the cell that bounds ANN candidates bounds them
    // too — within-cell pairs, never corpus². Both argmaxes ride ONE
    // hash agg over packed longs ((cos_fp6+1e6)·2^40 + (2^40−1−id):
    // max = best cosine, ties to smallest id; ids must fit 2^40 —
    // document-scale, and the pack overflows loudly, not silently)
    // — no per-anchor window, no SortAggregate.
    "emb_hard_negatives" -> ((s, dir) => {
      val P = 1L << 40
      val e = t(s, dir, "embeddings")
      val nE = e.count() // one corpus count serves kCells AND the stride pick
      val cents = Similarity.ivfCentroids(e, "vec_id", "embedding", adaptiveCells(nE), nE)
      val assigned = Similarity.ivfAssign(e, "vec_id", "embedding", cents)
      val lbl = e.select(col("vec_id"), col("label"))
      val withLab = assigned.join(lbl, col("id") === col("vec_id")).drop("vec_id")
      val a = withLab.select(col("id").as("id_a"), col("vec").as("_va"),
        col("cell"), col("label").as("lab_a"))
      val b = withLab.select(col("id").as("id_b"), col("vec").as("_vb"),
        col("cell"), col("label").as("lab_b"))
      val pk = (fp(Similarity.cosine(col("_va"), col("_vb")), 6) + lit(1000000L)) * lit(P) +
        (lit(P - 1) - col("id_b"))
      val agg = a.join(b, "cell").filter(col("id_a") =!= col("id_b"))
        .groupBy("id_a")
        .agg(max(when(col("lab_b") =!= col("lab_a"), pk)).as("pn"),
          max(when(col("lab_b") === col("lab_a"), pk)).as("pp"))
      agg.select(col("id_a").as("vec_id"),
          (lit(P - 1) - pmod(col("pn"), lit(P))).as("neg_id"),
          (expr(s"pn DIV ${P}") - lit(1000000L)).as("cos_neg_fp6"),
          (lit(P - 1) - pmod(col("pp"), lit(P))).as("pos_id"),
          (expr(s"pp DIV ${P}") - lit(1000000L)).as("cos_pos_fp6"),
          (expr(s"pp DIV ${P}") - expr(s"pn DIV ${P}")).as("margin_fp6"))
        
    }),
    // 41f — TF-IDF term weights: explode tokens → (doc, term) tf
    // counts → document frequencies via groupBy(term) + broadcast
    // join-back. The df agg does map-side partial aggregation, so a
    // stopword term shrinks to ONE row per term before the shuffle —
    // never a term-partitioned window, which would land every (doc,
    // term) row of a hot term in a single reducer. The tf subplan
    // feeds both sides, so ReuseExchange dedups the (doc, term)
    // shuffle (spec-asserted). Corpus size is a 1-row agg crossJoined
    // in — no blocking driver-side count(). At 100 TB, swap
    // broadcast(dfTab) for a shuffle join (salted if skewed) once the
    // vocabulary outgrows the broadcast limit; the tf side still
    // never re-shuffles by term.
    "txt_tfidf" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val n1 = docs.agg(count(lit(1)).cast("double").as("_n"))
      val tf = docs
        .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfTab = tf.groupBy("term").agg(count(lit(1)).as("df"))
      tf.join(broadcast(dfTab), "term")
        .crossJoin(broadcast(n1))
        .withColumn("tfidf_fp4",
          fp(col("tf").cast("double") * log(col("_n") / col("df").cast("double")), 4))
        .select("doc_id", "term", "tf", "df", "tfidf_fp4")
}),
    // 41j — PMI-style collocation mining (the phrase-discovery pass a
    // tokenizer-vocabulary build runs over a corpus): score every
    // bigram by LIFT = P(w1,w2) / (P_left(w1)·P_right(w2)) =
    // n_xy·N / (n_x·n_y) — PMI without the log, so the statistic is
    // pure rational arithmetic (exact integer counts, one
    // correctly-rounded double divide) instead of libm-dependent.
    // Shape: ONE corpus-sized shuffle (the bigram count, map-side
    // combined so a hot bigram is one row per task); both marginals
    // derive from the counted vocab²-bounded table — pinned via
    // localCheckpoint so the three consumers don't re-run the corpus
    // pass — and join back broadcast (vocab-sized; swap for shuffle
    // joins past the broadcast limit, the txt_tfidf note). min-count
    // ≥ 5 is the standard collocation support floor.
    "txt_collocations" -> ((s, dir) => {
      val big = t(s, dir, "documents")
        .select(explode(call_function("graft_word_ngrams",
          TextAnalysis.tokens(col("text")), lit(2), lit(1), lit(0))).as("_g"))
        .select(substring_index(col("_g"), " ", 1).as("w1"),
          substring_index(col("_g"), " ", -1).as("w2"))
      val cnt = big.groupBy("w1", "w2").agg(count(lit(1)).as("n_xy"))
        .localCheckpoint()
      val lm = cnt.groupBy("w1").agg(sum("n_xy").as("n_x"))
      val rm = cnt.groupBy("w2").agg(sum("n_xy").as("n_y"))
      val tot = cnt.agg(sum("n_xy").as("n_tot"))
      cnt.filter(col("n_xy") >= 5)
        .join(broadcast(lm), "w1")
        .join(broadcast(rm), "w2")
        .crossJoin(broadcast(tot))
        .select(col("w1"), col("w2"), col("n_xy"),
          fp((col("n_xy").cast("double") * col("n_tot").cast("double")) /
            (col("n_x").cast("double") * col("n_y").cast("double")), 4).as("lift_fp4"))
        
    }),
    // 41k — HTML main-text extraction (the web-ingestion stage between
    // a raw crawl and the WET-style plain text everything downstream
    // consumes): strip script/style blocks, then tags, decode the
    // core entities, collapse whitespace. The HTML wrapper is
    // SYNTHESIZED deterministically around each doc (title / nav /
    // script / style / entity-bearing footer — the txt_pii_mask
    // pattern) so every strip rule provably fires at every SF.
    // Patterns are RE2-safe ([\s\S]*? instead of DOTALL '.', no
    // lookarounds/backrefs) so Java regex and DuckDB RE2 agree
    // byte-for-byte; boilerplate_ratio is one correctly-rounded
    // divide over exact lengths. Pure narrow map — zero shuffles
    // beyond the presentation sort, trivially 100 TB-shaped.
    "txt_html_extract" -> ((s, dir) => {
      val html = concat(
        lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit("</title><script type=\"text/javascript\">var x = 1 < 2;</script>"),
        lit("<style>.nav{color:red}</style></head><body><nav>home &amp; links</nav><p>"),
        col("text"),
        lit("</p><div class=\"footer\">&copy; 2024 &lt;Example&gt;&nbsp;Corp</div></body></html>"))
      val noScript = regexp_replace(html, "<script[^>]*>[\\s\\S]*?</script>", " ")
      val noStyle = regexp_replace(noScript, "<style[^>]*>[\\s\\S]*?</style>", " ")
      val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
      val decoded = regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        noTags, "&amp;", "&"), "&lt;", "<"), "&gt;", ">"), "&nbsp;", " "), "&copy;", "(c)")
      val clean = trim(regexp_replace(decoded, "\\s+", " "))
      t(s, dir, "documents")
        .select(col("doc_id"), html.as("_h"), clean.as("extracted"))
        .select(col("doc_id"), col("extracted"),
          length(col("_h")).cast("long").as("n_chars_raw"),
          length(col("extracted")).cast("long").as("n_chars_text"),
          fp(lit(1.0) - length(col("extracted")).cast("double") /
            length(col("_h")).cast("double"), 4).as("boilerplate_ratio_fp4"))
        
    }),
    // 41l — Flesch–Kincaid readability grade (the classic surface
    // readability signal quality dashboards carry next to the Gopher
    // rules): words = whitespace tokens, sentences = [.!?]+ runs
    // (floored at 1 so fragments still score), syllables = [aeiouy]+
    // vowel-group runs of the lowercased text — the standard
    // syllable heuristic, counted per doc. grade = 0.39·w/s +
    // 11.8·syll/w − 15.59 in the IDENTICAL double op order on both
    // engines (two correctly-rounded divides, two multiplies, one
    // add/sub chain), fp4-quantized; the exact integer counts ride
    // alongside so the score is auditable. Pure narrow map — zero
    // data shuffles beyond the presentation sort, trivially
    // 100 TB-shaped.
    "txt_readability" -> ((s, dir) => {
      val w = size(TextAnalysis.tokens(col("text"))).cast("long")
      val snt = greatest(lit(1L), regexp_count(col("text"), lit("[.!?]+")).cast("long"))
      val syl = regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long")
      t(s, dir, "documents")
        .select(col("doc_id"), w.as("n_words"), snt.as("n_sentences"), syl.as("n_syllables"))
        .select(col("doc_id"), col("n_words"), col("n_sentences"), col("n_syllables"),
          when(col("n_words") === 0, lit(0L)).otherwise(
            fp(lit(0.39) * (col("n_words").cast("double") / col("n_sentences").cast("double")) +
               lit(11.8) * (col("n_syllables").cast("double") / col("n_words").cast("double")) -
               lit(15.59), 4)).as("fk_grade_fp4"))
        
    }),
    // 41m — BM25 ranked retrieval (Robertson–Spärck Jones, k1=1.2
    // b=0.75): the classic retrieval scorer run over the corpus's own
    // 20 highest-df terms as the query workload — per query term,
    // top-10 docs by BM25. The (doc, term) tf table feeds tf/df/dl
    // once and ReuseExchange dedups the shuffle (the txt_tfidf
    // idiom); the 20-term query set broadcasts onto tf so only
    // query-term postings survive to scoring; per-doc length joins by
    // doc key; corpus stats are two 1-row broadcast frames. Ranking
    // on the fp4-QUANTIZED score + doc_id tiebreak (so both engines
    // rank identically) through the salted two-stage topKPerQuery —
    // a stopword-grade query term scores every doc, and a single-
    // reducer window would not survive that at 100 TB. ln() rides
    // the txt_tfidf precedent (identical libm calls both engines,
    // fp4 absorbs the ulp).
    "txt_bm25" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // per-doc length rides THROUGH the (doc, term) aggregation
      // (max of a per-doc constant) — no separate dl table, so no
      // corpus-keyed join back by doc and one fewer corpus pass
      val tf = docs
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("_tk"))
        .select(col("doc_id"), size(col("_tk")).cast("long").as("dl"),
          explode(col("_tk")).as("term"))
        .groupBy("doc_id", "term")
        .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
      val dfTab = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val qTerms = dfTab.orderBy(col("df").desc, col("term")).limit(20)
      // corpus stats from ONE documents pass: doc count + total tokens
      val stats = docs.agg(count(lit(1)).as("n_docs"),
        sum(size(TextAnalysis.tokens(col("text"))).cast("long")).cast("double").as("tot"))
      val avgdl = col("tot") / col("n_docs").cast("double")
      val idf = log((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)) + lit(1.0))
      val tfNorm = col("tf").cast("double") * lit(2.2) /
        (col("tf").cast("double") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / avgdl)))
      val scored = tf
        .join(broadcast(qTerms), "term")
        .crossJoin(broadcast(stats))
        .select(col("term").as("query_id"), col("doc_id").as("id"), col("tf"),
          fp(idf * tfNorm, 4).as("bm25_fp4"))
      Similarity.topKPerQuery(scored, 10, Seq(col("bm25_fp4").desc, col("id")))
        .select(col("query_id").as("term"), col("id").as("doc_id"), col("tf"), col("bm25_fp4"))
        
    }),
    // 41n — positional phrase search (the inverted-index lookup shape:
    // boolean AND + adjacency over positional postings). The query
    // phrase is the corpus's own most frequent bigram (count desc,
    // bigram asc — deterministic at every SF, so the match path
    // provably fires); postings = (doc, pos, token) from ONE
    // posexplode, pruned by the broadcast 1-row phrase BEFORE any
    // shuffle — only the two query terms' postings ship; the
    // adjacency test is an equi-join on (doc, pos+1); per-doc match
    // stats collapse map-side. At 100 TB this is the standard
    // term-partitioned posting intersection — no corpus-sized
    // window, no cartesian.
    "txt_phrase_search" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val phrase = docs
        .select(explode(call_function("graft_word_ngrams",
          TextAnalysis.tokens(col("text")), lit(2), lit(1), lit(0))).as("_g"))
        .groupBy("_g").agg(count(lit(1)).as("_c"))
        .orderBy(col("_c").desc, col("_g")).limit(1)
        .select(substring_index(col("_g"), " ", 1).as("w1"),
          substring_index(col("_g"), " ", -1).as("w2"))
      val pos = docs
        .select(col("doc_id"), posexplode(TextAnalysis.tokens(col("text"))))
        .toDF("doc_id", "pos", "tok")
        .crossJoin(broadcast(phrase))
      val m1 = pos.filter(col("tok") === col("w1"))
        .select(col("doc_id"), col("pos").cast("long").as("p1"), col("w1"), col("w2"))
      val m2 = pos.filter(col("tok") === col("w2"))
        .select(col("doc_id"), col("pos").cast("long").as("p2"))
      m1.join(m2, m1("doc_id") === m2("doc_id") && col("p2") === col("p1") + 1L)
        .groupBy(m1("doc_id").as("doc_id"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("n_matches"), min("p1").as("first_pos"))
        
    }),
    // 41p — BPE merge LEARNING (Sennrich et al. 2016 — the tokenizer
    // TRAINING pass; 41d/txt_bpe_tokens applies a merge table, this
    // derives one): 3 unrolled merge iterations (the ev_markov_rank
    // r1..r3 precedent) over the word-vocab symbol sequences. Each
    // iteration: count-weighted adjacent-pair frequencies (native
    // word-bigram builder over the symbol split), top-1 pair (count
    // desc, pair asc — deterministic), then GREEDY LEFT-TO-RIGHT
    // merge application as a string fold whose tail-token check
    // reproduces the reference scan exactly (a naive global replace
    // mis-merges overlapping runs like "a b a b"). Everything after
    // the one corpus token rollup is VOCAB-bounded (the classic BPE
    // learner shape — real trainers also run on (word, count), not
    // the token stream); per-step totals prove application fired.
    "txt_bpe_learn" -> ((s, dir) => {
      val vocab0 = t(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
        .select(col("w"), col("c"),
          concat_ws(" ", call_function("graft_char_ngrams", col("w"), lit(1))).as("sym"))
        .localCheckpoint()
      def pairCounts(v: DataFrame): DataFrame = v
        .select(col("c"), explode(call_function("graft_word_ngrams",
          split(col("sym"), " "), lit(2), lit(1), lit(0))).as("g"))
        .groupBy("g").agg(sum("c").as("cnt_w"))
      def top1(cnt: DataFrame): DataFrame = cnt
        .orderBy(col("cnt_w").desc, col("g")).limit(1)
        .select(col("g").as("m_g"), col("cnt_w").as("m_cnt"))
      def applyMerge(v: DataFrame, top: DataFrame): DataFrame =
        v.crossJoin(broadcast(top))
          .withColumn("_a", substring_index(col("m_g"), " ", 1))
          .withColumn("_b", substring_index(col("m_g"), " ", -1))
          .withColumn("_m", expr("replace(m_g, ' ', '')"))
          .withColumn("sym2", TextAnalysis.bpeMergeFold(
            col("sym"), col("_a"), col("_b"), col("_m")))
          .select(col("w"), col("c"), col("sym2").as("sym"))
          .localCheckpoint()
      val t1 = top1(pairCounts(vocab0)).localCheckpoint()
      val v1 = applyMerge(vocab0, t1)
      val t2 = top1(pairCounts(v1)).localCheckpoint()
      val v2 = applyMerge(v1, t2)
      val t3 = top1(pairCounts(v2)).localCheckpoint()
      val v3 = applyMerge(v2, t3)
      def tot(v: DataFrame) = v.agg(
        sum(size(split(col("sym"), " ")).cast("long") * col("c")).as("tot_syms"))
      def row(step: Int, tp: DataFrame, v: DataFrame) =
        tp.crossJoin(broadcast(tot(v)))
          .select(lit(step).cast("long").as("step"), col("m_g").as("pair"),
            expr("replace(m_g, ' ', '')").as("merged"),
            col("m_cnt").as("cnt_w"), col("tot_syms"))
      row(1, t1, v1).unionByName(row(2, t2, v2)).unionByName(row(3, t3, v3))
        
    }),
    // 41o — RAKE keyword extraction (Rose et al. 2010 — the
    // phrase-level keyword signal tag/topic pipelines cut): candidate
    // phrases = maximal runs of non-stopword tokens, found by folding
    // the token stream into a delimiter string (stopword → '|') and
    // splitting — the SAME string ops on both engines, no regex
    // divergence surface. Word stats over ALL phrase occurrences
    // (freq = occurrences, deg = Σ lengths of containing phrases),
    // word score in ALL-INTEGER millis ((1000·deg) DIV freq — RAKE's
    // deg/freq without float sums), phrase score = Σ member-word
    // scores (integer, order-free — a double Σ would depend on
    // Spark's unordered agg). Shapes: one word-stat shuffle
    // (map-side combined, vocab-sized result broadcast back — swap
    // for a shuffle join past the limit), one distinct + one scoring
    // agg, all keyed.
    "txt_keywords" -> ((s, dir) => {
      val stops = TextAnalysis.DefaultStopwords.head._2
      val occ = t(s, dir, "documents")
        .select(col("doc_id"),
          aggregate(TextAnalysis.tokens(col("text")), lit(""),
            (acc, tk) => concat(acc,
              when(tk.isin(stops: _*), lit("|")).otherwise(concat(lit(" "), tk)))).as("_m"))
        .select(col("doc_id"), explode(split(col("_m"), "\\|")).as("_p"))
        .select(col("doc_id"), trim(col("_p")).as("phrase"))
        .filter(length(col("phrase")) > 0)
      def words(df: DataFrame) = df
        .select(col("doc_id"), col("phrase"), split(col("phrase"), " ").as("_ws"))
        .select(col("doc_id"), col("phrase"),
          size(col("_ws")).cast("long").as("plen"), explode(col("_ws")).as("w"))
      val wscore = words(occ).groupBy("w")
        .agg(count(lit(1)).as("freq"), sum("plen").as("deg"))
        .select(col("w"), expr("(1000 * deg) DIV freq").as("wscore"))
      words(occ.distinct())
        .join(broadcast(wscore), "w")
        .groupBy("doc_id", "phrase")
        .agg(max("plen").as("n_words"), sum("wscore").as("score_i"))
        
    }),
    // 43m — A/B experiment readout (the conversion-rate gate an event
    // corpus answers before any behavioral decision ships): exposure
    // unit = user-day (the cookie-day grain experiment frameworks
    // report), deterministic arm assignment (user_id + day) % 2 — a
    // pure function of the unit key, so retries/reruns agree —
    // conversion = the unit reached 'purchase'. The 2×2 χ² statistic
    // runs on EXACT integer per-arm counts with one fixed-order
    // double expression at the end (diff = a1·b0 − a0·b1 in doubles —
    // no >2^63 integer products at 10^9-unit scale, no libm),
    // fp4-quantized, 0 when a margin degenerates. Shape: one
    // map-side-combinable per-unit rollup (the only corpus-sized
    // shuffle), a 2-row arm agg, then two 1-row frames broadcast
    // into the single readout row.
    "ev_ab_test" -> ((s, dir) => {
      val units = ev(s, dir)
        .groupBy(col("user_id"), expr("ms DIV 86400000").as("day"))
        .agg(max((col("event_type") === "purchase").cast("long")).as("conv"))
        .withColumn("arm", pmod(col("user_id") + col("day"), lit(2)))
      val arms = units.groupBy("arm")
        .agg(count(lit(1)).as("n"), sum("conv").as("k"))
      val armA = arms.filter(col("arm") === 0)
        .select(col("n").as("units_a"), col("k").as("conv_a"))
      val armB = arms.filter(col("arm") === 1)
        .select(col("n").as("units_b"), col("k").as("conv_b"))
      val a1 = col("conv_a").cast("double")
      val a0 = (col("units_a") - col("conv_a")).cast("double")
      val b1 = col("conv_b").cast("double")
      val b0 = (col("units_b") - col("conv_b")).cast("double")
      val ua = col("units_a").cast("double")
      val ub = col("units_b").cast("double")
      val nD = (col("units_a") + col("units_b")).cast("double")
      val diff = a1 * b0 - a0 * b1
      armA.crossJoin(broadcast(armB))
        .select(col("units_a"), col("conv_a"), col("units_b"), col("conv_b"),
          fp(a1 / ua, 6).as("rate_a_fp6"),
          fp(b1 / ub, 6).as("rate_b_fp6"),
          when((a1 + b1) === 0.0 || (a0 + b0) === 0.0, lit(0L))
            .otherwise(fp(nD * diff * diff / ((ua * ub) * ((a1 + b1) * (a0 + b0))), 4))
            .as("chi2_fp4"))
    }),
    // 43d — KMV (bottom-k) distinct-count sketch: deterministic
    // md5-uniform hashing makes the sketch AND its estimate
    // bit-reproducible across engines/retries — the verifiable cousin
    // of approx_count_distinct for 100 TB cardinality profiling.
    // Groups under k distinct report exact counts
    "ev_kmv_distinct" -> ((s, dir) => {
      graft.sketch.Sketches.kmvDistinct(
        t(s, dir, "events").select("event_type", "user_id"),
        Seq("event_type"), "user_id", k = 64)
        
    }),
    // 43h — HyperLogLog distinct-count profile (Flajolet et al.): the
    // FIXED-WIDTH mergeable cousin of 43d — m=256 registers per group
    // (register = max leading-zero rank of an md5 uniform, merge =
    // elementwise max), estimate with the standard linear-counting
    // small-range correction. reg_sum carries the exact-integer
    // register state (Σ 2^(ρmax−M_b)), so the sketch ITSELF — not just
    // its fp2 estimate — is verified cross-engine; exact_nd alongside
    // exposes the ~1.04/√m error
    "ev_hll_distinct" -> ((s, dir) => {
      val ex = t(s, dir, "events").groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_nd"))
      graft.sketch.Sketches.hllDistinct(
        t(s, dir, "events").select("event_type", "user_id"),
        Seq("event_type"), "user_id", p = 8)
        .join(ex, "event_type")
        .select("event_type", "exact_nd", "v_zero", "reg_sum", "hll_est_fp2")
        
    }),
    // 32j — verifiable Bloom-filter state + OR-merge law: the third
    // mergeable-sketch family next to HLL (max-merge, 43t) and
    // CMS/histograms (add-merge) — Bloom bit sets merge by OR, so
    // per-shard builds compose into the corpus filter exactly. The
    // per-(source, shard) bit sets are SKETCH-sized (≤ shards·m rows,
    // bounded by the bit domain — checkpointed off one corpus pass);
    // the direct per-source build runs INDEPENDENTLY (second corpus
    // pass by design, the ev_hll_merge argument) and both paths'
    // (bits_set, pos_sum) state is emitted — the oracle computes the
    // bit set once, so any divergence hash-mismatches. k=4 md5 hash
    // rows over the content hash, m=1024 bits.
    "dd_bloom_state" -> ((s, dir) => {
      def bitsOf(df: DataFrame): DataFrame =
        df.select(col("source"), col("doc_id"),
          explode(array((0 until 4).map(j =>
            pmod(conv(substring(md5(concat(lit(s"bf$j:"), md5(col("text")))), 1, 8), 16, 10)
              .cast("long"), lit(1024L))): _*)).as("bit"))
      val docs = t(s, dir, "documents")
      val shardBits = bitsOf(docs)
        .withColumn("shard", pmod(col("doc_id"), lit(8L)))
        .select("source", "shard", "bit").distinct()
        .localCheckpoint() // ≤ sources·8·1024 rows at any corpus size
      val merged = shardBits.select("source", "bit").distinct()
        .groupBy("source")
        .agg(count(lit(1)).as("bits_set_merged"), sum("bit").as("pos_sum_merged"))
      val direct = bitsOf(docs).select("source", "bit").distinct()
        .groupBy("source")
        .agg(count(lit(1)).as("bits_set"), sum("bit").as("pos_sum"))
      direct.join(merged, "source")
        .select(col("source"), col("bits_set"), col("pos_sum"),
          fp(col("bits_set").cast("double") / 1024.0, 4).as("fill_fp4"),
          col("bits_set_merged"), col("pos_sum_merged"))
        
    }),
    // 43t — HLL partition-then-merge: the 100 TB sketch DISCIPLINE
    // made visible in one query — registers built per (type, DAY)
    // partition, max-merged across days, must equal the one-shot
    // corpus sketch (register max is associative/commutative/
    // idempotent, so per-partition builds compose exactly — the
    // property that lets a cluster sketch each split independently
    // and a coordinator fold the results). Both paths are computed
    // INDEPENDENTLY and emitted side by side; the oracle computes
    // the registers once, so any divergence between the paths
    // hash-mismatches.
    "ev_hll_merge" -> ((s, dir) => {
      val e = ev(s, dir).withColumn("day", expr("ms DIV 86400000"))
      val dayRegs = graft.sketch.Sketches.hllRegisters(
        e, Seq("event_type", "day"), "user_id", p = 8)
        .localCheckpoint() // register-sized; feeds merge AND n_days
      val merged = dayRegs.groupBy("event_type", "bkt").agg(max("mb").as("mb"))
      val mergedEst = graft.sketch.Sketches.hllEstimate(merged, Seq("event_type"), p = 8)
      val directEst = graft.sketch.Sketches.hllEstimate(
        graft.sketch.Sketches.hllRegisters(ev(s, dir), Seq("event_type"), "user_id", p = 8),
        Seq("event_type"), p = 8)
        .select(col("event_type"), col("reg_sum").as("reg_sum_direct"),
          col("hll_est_fp2").as("est_direct_fp2"))
      val nDays = dayRegs.groupBy("event_type").agg(countDistinct("day").as("n_days"))
      mergedEst.join(directEst, "event_type").join(broadcast(nDays), "event_type")
        .select(col("event_type"), col("n_days"), col("v_zero"), col("reg_sum"),
          col("hll_est_fp2").as("est_merged_fp2"),
          col("reg_sum_direct"), col("est_direct_fp2"))
        
    }),
    // 43e — count-min sketch frequency profile: deterministic d×w md5
    // sketch built with map-side combine (the shuffle carries ≤ d·w
    // cells per task, not events); estimate = min over d counters,
    // exact count carried alongside to expose the collision gap
    "ev_cms_freq" -> ((s, dir) => {
      graft.sketch.Sketches.cmsFreq(
        t(s, dir, "events").select("event_type"), "event_type", d = 4, w = 64)
        
    }),
    // 43f — exact per-group percentiles WITHOUT a per-group row sort:
    // the corpus collapses map-side to a (group, quantized-value)
    // histogram; the rank scan runs over the compressed histogram
    // (distinct fp4 values, bounded by the value domain — not by row
    // count), so the shape survives 100 TB where sorting each group's
    // rows cannot. p-th percentile = smallest value whose cumulative
    // count reaches ceil(p·n) — pure integer arithmetic on both engines
    "ev_percentile" -> ((s, dir) => {
      val h = ev(s, dir)
        .groupBy(col("event_type"), col("v4")).agg(count(lit(1)).as("k"))
      val wc = Window.partitionBy("event_type").orderBy("v4")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wt = Window.partitionBy("event_type")
      h.withColumn("cum", sum("k").over(wc))
        .withColumn("n", sum("k").over(wt))
        .groupBy(col("event_type"))
        .agg(max(col("n")).cast("long").as("n_rows"),
          min(when(col("cum") >= expr("(n + 1) DIV 2"), col("v4"))).as("p50_c4"),
          min(when(col("cum") >= expr("(9 * n + 9) DIV 10"), col("v4"))).as("p90_c4"),
          min(when(col("cum") >= expr("(99 * n + 99) DIV 100"), col("v4"))).as("p99_c4"))
        
    }),
    // 43ah — INTERPOLATED percentiles (SQL-standard percentile_cont;
    // 43f's rank pick is percentile_disc): h = 1 + (n−1)p lands
    // between two order statistics, result = lo·(100−frac) + hi·frac
    // — evaluated ENTIRELY in integers on the fp4 value histogram
    // (h·100 = 100 + (n−1)·pk is exact for pk ∈ {50,90}; the blend is
    // the fp6 scale), so the interpolation is engine-exact where a
    // float quantile_cont would drift. Same compressed-histogram rank
    // scan as ev_percentile — value-domain-bounded, never a per-group
    // row sort.
    "ev_percentile_cont" -> ((s, dir) => {
      val h = ev(s, dir)
        .groupBy(col("event_type"), col("v4")).agg(count(lit(1)).as("k"))
      val wc = Window.partitionBy("event_type").orderBy("v4")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wt = Window.partitionBy("event_type")
      def loR(pk: Int) = expr(s"(100 + (n - 1) * $pk) DIV 100")
      def hiR(pk: Int) = least(expr(s"(100 + (n - 1) * $pk) DIV 100") + 1, col("n"))
      val picked = h.withColumn("cum", sum("k").over(wc))
        .withColumn("n", sum("k").over(wt))
        .groupBy(col("event_type"))
        .agg(max(col("n")).cast("long").as("n_rows"),
          min(when(col("cum") >= loR(50), col("v4"))).as("lo50"),
          min(when(col("cum") >= hiR(50), col("v4"))).as("hi50"),
          min(when(col("cum") >= loR(90), col("v4"))).as("lo90"),
          min(when(col("cum") >= hiR(90), col("v4"))).as("hi90"))
      def blend(pk: Int, lo: Column, hi: Column) = {
        val frac = expr(s"(100 + (n_rows - 1) * $pk) % 100")
        lo * (lit(100L) - frac) + hi * frac
      }
      picked.select(col("event_type"), col("n_rows"),
          blend(50, col("lo50"), col("hi50")).as("p50_fp6"),
          blend(90, col("lo90"), col("hi90")).as("p90_fp6"))
        
    }),
    // 43ai — time-series GAP FILL (LOCF — last observation carried
    // forward over a dense day grid; the step every daily-metric
    // dashboard and feature pipeline needs between sparse
    // observations): the (type × day) grid explodes from the global
    // day span (domain-bounded), observations left-join on, and the
    // carry is last(value, ignoreNulls) over the type-partitioned
    // day order — windows sliced per type over the DAY domain, never
    // raw events. Days before a type's first observation stay null
    // (flagged), the honest LOCF boundary.
    "ev_gap_fill" -> ((s, dir) => {
      val dayMs = 86400000L
      val daily = ev(s, dir)
        .filter(col("event_type") === "purchase" || col("event_type") === "signup")
        .filter(pmod(col("event_id"), lit(97L)) === 0) // sparsify so gaps exist
        .withColumn("day", expr(s"(ms - pmod(ms, $dayMs)) DIV $dayMs"))
        .groupBy("event_type", "day").agg(sum("v4").as("v"))
        .localCheckpoint() // tiny series, consumed by span agg + join
      val span = daily.agg(min("day").as("d0"), max("day").as("d1"))
      val grid = daily.select("event_type").distinct()
        .crossJoin(broadcast(span))
        .select(col("event_type"), explode(sequence(col("d0"), col("d1"))).as("day"))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("event_type", "day"), "left")
        .withColumn("filled_v", last(col("v"), ignoreNulls = true).over(w))
        .select(col("event_type"), col("day"),
          col("filled_v"),
          col("v").isNull.cast("int").as("is_gap"))
        
    }),
    // 43y — INTER-ARRIVAL time profile (the traffic-model histogram
    // behind session-gap and rate-limit tuning): per-user event gaps
    // in ms, bucketed by floor(log2) — computed as length(bin(gap))−1,
    // pure integer arithmetic identical in both engines (the HLL ρ
    // trick), so the doubling-bucket histogram needs no libm and no
    // float binning edge cases. One user-keyed window for the lag,
    // then a ≤64-bucket rollup — the histogram is domain-bounded
    // regardless of corpus size.
    "ev_interarrival" -> ((s, dir) => {
      val e = ev(s, dir)
      val w = Window.partitionBy("user_id").orderBy("ms", "event_id")
      e.withColumn("prev", lag("ms", 1).over(w))
        .filter(col("prev").isNotNull)
        .select((col("ms") - col("prev")).as("gap"))
        .withColumn("bucket",
          when(col("gap") === 0, lit(-1))
            .otherwise(expr("CAST(length(bin(gap)) AS INT) - 1")))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), min("gap").as("min_gap"), max("gap").as("max_gap"))
        
    }),
    // 43z — ROLLING-window distinct actives (trailing 7-day WAU per
    // day + DAU + rolling stickiness — the engagement trendline; the
    // calendar-week twin is 43j ev_stickiness). Rolling DISTINCT does
    // not decompose like a windowed sum: the window must dedup
    // (day, user) across 7 days, so the scale path pre-dedups raw
    // events to the day×user activity set (one shuffle; ≤ users×days
    // rows — orders smaller than the event log), then replicates each
    // activity row to the ≤7 window anchors it supports (bounded ×7
    // fan-out via sequence/explode) and counts distinct per anchor.
    // The BETWEEN self-join the oracle states would plan a range
    // θ-join; the explode form is an equi-shuffle on day, and anchor
    // days outside the observed domain are clipped by a broadcast
    // semi-join against the (domain-bounded) day list.
    "ev_rolling_distinct" -> ((s, dir) => {
      val du = ev(s, dir)
        .select(expr("ms DIV 86400000").as("day"), col("user_id")).distinct()
      val days = du.select(col("day")).distinct()
      val dau = du.groupBy("day").agg(countDistinct(col("user_id")).as("dau"))
      val wau = du
        .select(explode(sequence(col("day"), col("day") + 6)).as("day"), col("user_id"))
        .join(broadcast(days), "day")
        .groupBy("day").agg(countDistinct(col("user_id")).as("wau7"))
      dau.join(wau, "day")
        .select(col("day"), col("dau"), col("wau7"),
          fp(col("dau").cast("double") / col("wau7").cast("double"), 4).as("stickiness_fp4"))
        
    }),
    // 43x — GAPS-AND-ISLANDS (the consecutive-run pattern behind
    // uptime/freshness monitoring, coverage audits, and island-based
    // sessionization): per event type, maximal runs of consecutive
    // PRESENT hours via the classic hr − row_number() group key
    // (consecutive hours share it), plus the longest silent gap via
    // lag. The island key is pure arithmetic on the ordered rank —
    // no iteration, no self-join — so island detection over a 100 TB
    // log is ONE key shuffle: per-type sorts bounded by distinct
    // hours (domain-bounded, ≤ 8760/yr/type), both windows share the
    // partitioning, and the output is one row per type.
    "ev_gaps_islands" -> ((s, dir) => {
      val h = ev(s, dir)
        .select(col("event_type"), expr("ms DIV 3600000").as("hr")).distinct()
      val w = Window.partitionBy("event_type").orderBy("hr")
      val r = h.withColumn("grp", col("hr") - row_number().over(w))
        .withColumn("gap", col("hr") - lag("hr", 1).over(w) - 1)
      val islands = r.groupBy("event_type", "grp").agg(count(lit(1)).as("len"))
      val iAgg = islands.groupBy("event_type").agg(
        sum("len").cast("long").as("n_hours"), count(lit(1)).as("n_islands"),
        max("len").as("max_island"))
      val gAgg = r.groupBy("event_type")
        .agg(max(coalesce(col("gap"), lit(0L))).as("max_gap"))
      iAgg.join(gAgg, "event_type")
    }),
    // 43w — KMV partition-then-merge: the FOURTH mergeable-sketch
    // law next to HLL max-merge (43t), Bloom OR-merge (32j), and the
    // histogram/CMS add-merge — bottom-k sets union-merge: per-(type,
    // DAY) bottom-64 sketches, unioned + re-bottomed, must equal the
    // one-shot corpus sketch. Sound because any of the 64 globally
    // smallest hashes is necessarily in its own day's bottom-64 —
    // the property that lets every partition keep k values and a
    // coordinator merge k·partitions rows instead of re-scanning.
    // Both paths computed INDEPENDENTLY and emitted side by side;
    // the oracle computes the sketch once, so divergence
    // hash-mismatches. Day windows bound the per-key sort; merged
    // state is k rows per (type, day) — sketch-sized, checkpointed.
    "ev_kmv_merge" -> ((s, dir) => {
      val e = ev(s, dir).withColumn("day", expr("ms DIV 86400000"))
      val hashed = e.select(col("event_type"), col("day"),
        graft.sample.Sampling.hashUniform(col("user_id"), "kmv").as("_u")).distinct()
      val wd = Window.partitionBy("event_type", "day").orderBy("_u")
      val dayK = hashed.withColumn("_rk", row_number().over(wd))
        .filter(col("_rk") <= 64).select("event_type", "day", "_u")
        .localCheckpoint() // sketch-sized; feeds merge AND n_days
      val wm = Window.partitionBy("event_type").orderBy("_u")
      val merged = dayK.select("event_type", "_u").distinct()
        .withColumn("_rk", row_number().over(wm)).filter(col("_rk") <= 64)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_kept_merged"), max("_u").as("_hkm"))
      val direct = graft.sketch.Sketches.kmvDistinct(
        t(s, dir, "events").select("event_type", "user_id"),
        Seq("event_type"), "user_id", k = 64)
      val nDays = dayK.groupBy("event_type")
        .agg(countDistinct("day").as("n_days"))
      direct.join(merged, "event_type").join(nDays, "event_type")
        .select(col("event_type"), col("n_days"), col("n_kept"),
          col("est_distinct_fp2"), col("n_kept_merged"),
          fp(when(col("n_kept_merged") < 64, col("n_kept_merged").cast("double"))
            .otherwise(lit(63.0) / col("_hkm")), 2).as("est_merged_fp2"))
        
    }),
    // 43v — exponentially time-decayed engagement score (the
    // recency-weighted user feature every ranking/mixing pipeline
    // derives from an event log): score = Σ value·2^(-age/7d),
    // half-life one week. The decay weight is an EXACT power of two
    // — 1 / (1L << k), k clamped to 40 — not libm pow(), so the
    // per-row double product is correctly-rounded identical in both
    // engines (the cross-engine float discipline: quantize per row
    // to fp6, sum as integers). The reference day is the corpus max,
    // broadcast from a 1-row agg. Scale: one corpus scan, narrow map
    // + per-user hash agg with map-side combine; the broadcast is
    // 8 bytes. Incremental refresh halves every stored score once a
    // week and adds the new week's partials — the same mergeable-
    // state shape as the sketches.
    "ev_decay_score" -> ((s, dir) => {
      val e = ev(s, dir).withColumn("day", expr("ms DIV 86400000"))
      val mx = broadcast(e.agg(max("day").as("max_day")))
      e.crossJoin(mx)
        .select(col("user_id"),
          fp(col("v4").cast("double") / 1e4 /
            expr("CAST(shiftleft(CAST(1 AS BIGINT), " +
              "CAST(least((max_day - day) DIV 7, 40) AS INT)) AS DOUBLE)"), 6)
            .as("c6"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), sum("c6").as("score_fp6"))
        
    }),
    // 43u — BITMAP-INDEX retention (the roaring-bitmap warehouse
    // discipline in exact integer arithmetic): each day's active-user
    // set becomes 63-bit bitmap WORDS — (day, user DIV 63) keyed,
    // bits OR-combined map-side by the bit_or hash agg — and 7-day
    // retention is a co-partitioned equi-join of each day's words
    // with day+7's, popcounting the AND. n_active is popcount too,
    // so distinct-count and overlap come from the SAME structure with
    // no count(distinct) shuffle of raw user ids. Scale: the bitmap
    // build shuffles (day, word) keys — users/63 words per day,
    // 8 bytes each, ~2 MB per 10⁹-user day — and at 100 TB the bm
    // frame IS the persisted index table (checkpointed here; written
    // once, probed by every cohort/retention/funnel query after);
    // intersections never touch raw events again.
    "ev_bitmap_retention" -> ((s, dir) => {
      val e = ev(s, dir).select(expr("ms DIV 86400000").as("day"),
        expr("user_id DIV 63").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(user_id, 63) AS INT))").as("bit"))
      val bm = e.groupBy("day", "word").agg(expr("bit_or(bit)").as("bm"))
        .localCheckpoint() // the index; consumed as both join sides
      bm.as("a").join(bm.as("b"),
          col("a.word") === col("b.word") && col("a.day") + 7 === col("b.day"), "left")
        .groupBy(col("a.day").as("day"))
        .agg(sum(expr("CAST(bit_count(a.bm) AS BIGINT)")).as("n_active"),
          sum(coalesce(expr("CAST(bit_count(a.bm & b.bm) AS BIGINT)"), lit(0L)))
            .as("n_ret7"))
        
    }),
    // 43i — RFM user segmentation (recency / frequency / monetary —
    // the classic activity-profile cut, here the user-level profile
    // pass an event corpus runs before per-cohort sampling): per-user
    // aggregates quantized to BOUNDED domains (recency HOUR, event
    // count, whole value units — sums of per-row fp4, never raw
    // doubles), quintile thresholds from the SAME histogram rank-scan
    // as ev_percentile (windows over DISTINCT quantized values — no
    // corpus-sized ntile window), score = 1 + #thresholds strictly
    // below; three 1-row threshold frames broadcast back
    "ev_rfm" -> ((s, dir) => {
      val u = ev(s, dir).groupBy(col("user_id"))
        .agg(max("ms").as("_rms"), count(lit(1)).as("f"), sum("v4").as("_m4"))
        .select(col("user_id"),
          expr("(_rms - pmod(_rms, 3600000)) DIV 3600000").as("r_hr"),
          col("f"),
          expr("(_m4 - pmod(_m4, 10000)) DIV 10000").as("m_u"))
      def thresholds(c: String, pfx: String) = {
        val h = u.groupBy(col(c)).agg(count(lit(1)).as("k"))
        val wc = Window.orderBy(col(c))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ths = (1 to 4).map(i =>
          min(when(col("cum") >= expr(s"($i * n + 4) DIV 5"), col(c))).as(s"$pfx$i"))
        h.withColumn("cum", sum("k").over(wc))
          .withColumn("n", sum("k").over(Window.partitionBy()))
          .agg(ths.head, ths.tail: _*)
      }
      def score(v: Column, pfx: String): Column =
        (1 to 4).map(i => when(v > col(s"$pfx$i"), 1).otherwise(0))
          .foldLeft(lit(1))(_ + _)
      u.crossJoin(broadcast(thresholds("r_hr", "_tr")))
        .crossJoin(broadcast(thresholds("f", "_tf")))
        .crossJoin(broadcast(thresholds("m_u", "_tm")))
        .select(col("user_id"), col("r_hr"), col("f"), col("m_u"),
          score(col("r_hr"), "_tr").as("r_score"),
          score(col("f"), "_tf").as("f_score"),
          score(col("m_u"), "_tm").as("m_score"))
        .withColumn("rfm", col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
        
    }),
    // 43j — DAU/WAU stickiness (the engagement-density profile an
    // event corpus is cut by before cohort work): two distinct-user
    // rollups — per (week, day) and per week — each a map-side-
    // combined distinct shuffle; the week table is |weeks|-sized and
    // broadcast back onto the day table. Day/week ids are pure
    // integer floor-divisions of epoch ms (events are post-1970, and
    // both engines truncate identically on non-negatives); the ratio
    // is one correctly-rounded double divide, fp4-quantized.
    "ev_stickiness" -> ((s, dir) => {
      val d = ev(s, dir).select(col("user_id"),
          expr("ms DIV 86400000").as("day_id"))
        .withColumn("week_id", expr("day_id DIV 7"))
      val dau = d.groupBy("week_id", "day_id")
        .agg(countDistinct(col("user_id")).as("dau"))
      val wau = d.groupBy("week_id")
        .agg(countDistinct(col("user_id")).as("wau"))
      dau.join(broadcast(wau), "week_id")
        .select(col("week_id"), col("day_id"), col("dau"), col("wau"),
          fp(col("dau").cast("double") / col("wau").cast("double"), 4).as("stickiness_fp4"))
        
    }),
    // 43k — bot/abuse rate filtering (the traffic-hygiene gate an
    // event corpus passes before it trains anything): flag users whose
    // peak per-minute event rate exceeds a human-plausible ceiling.
    // The organic corpus peaks at ~3/min, so bot traffic is
    // SYNTHESIZED like txt_pii_mask's PII — every user_id % 37 == 0
    // gets a 120-event burst inside one deterministic minute — and the
    // detector provably fires at every SF. Shape: two shuffles, both
    // map-side combined — (user, minute) counts collapse before the
    // exchange (a bot's burst is ONE row per task, so even a
    // million-event bot minute cannot skew a reducer), then the
    // per-user max/sum rollup; the synthetic burst build is a
    // distinct-users projection exploded 120× (row count bounded by
    // 120·|users|, no shuffle of its own).
    "ev_bot_users" -> ((s, dir) => {
      val organic = ev(s, dir).select(col("user_id"), col("ms"))
      val bursts = ev(s, dir).filter(col("user_id") % 37 === 0)
        .select(col("user_id")).distinct()
        .select(col("user_id"), explode(sequence(lit(0), lit(119))).as("_i"))
        .select(col("user_id"),
          (lit(1704067200000L) + (col("user_id") % 1440) * 60000L +
            col("_i") * 400L).as("ms"))
      organic.unionByName(bursts)
        .groupBy(col("user_id"), expr("ms DIV 60000").as("minute_id"))
        .agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(max("n").as("peak_per_min"), sum("n").as("n_events"))
        .select(col("user_id"), col("peak_per_min"),
          col("n_events").cast("long").as("n_events"),
          (col("peak_per_min") >= 60).cast("long").as("is_bot"))
        
    }),
    // 43l — session co-visitation lift (the recommender/behavior-
    // mining building block: which event types co-occur in the same
    // session more than chance): sessions via the SAME gap rule as
    // ev_sessionize, reduced to DISTINCT (session, type) rows — so
    // the within-session self-join is bounded by the TYPE VOCABULARY
    // per session (≤|types|²/2 pairs regardless of session length;
    // for item catalogs cap per-session items before pairing), never
    // by event count. Lift = n_ab·S/(n_a·n_b) over session
    // probabilities — the txt_collocations statistic on a different
    // universe, same log-free exact-integer convention.
    "ev_covisit" -> ((s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy("ms", "event_id")
      val st = ev(s, dir)
        .withColumn("new_sess",
          when(lag("ms", 1).over(byUser).isNull || col("ms") - lag("ms", 1).over(byUser) > SessionGapMs, 1L)
            .otherwise(0L))
        .withColumn("session_idx", sum("new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("user_id", "session_idx", "event_type").distinct()
        .localCheckpoint()
      val pairs = st.select(col("user_id"), col("session_idx"), col("event_type").as("type_a"))
        .join(st.select(col("user_id"), col("session_idx"), col("event_type").as("type_b")),
          Seq("user_id", "session_idx"))
        .filter(col("type_a") < col("type_b"))
      val nab = pairs.groupBy("type_a", "type_b").agg(count(lit(1)).as("n_ab"))
      val na = st.groupBy("event_type").agg(count(lit(1)).as("n"))
      val stot = st.select("user_id", "session_idx").distinct()
        .agg(count(lit(1)).as("s_tot"))
      nab
        .join(broadcast(na.select(col("event_type").as("type_a"), col("n").as("n_a"))), "type_a")
        .join(broadcast(na.select(col("event_type").as("type_b"), col("n").as("n_b"))), "type_b")
        .crossJoin(broadcast(stot))
        .select(col("type_a"), col("type_b"), col("n_ab"),
          fp((col("n_ab").cast("double") * col("s_tot").cast("double")) /
            (col("n_a").cast("double") * col("n_b").cast("double")), 4).as("lift_fp4"))
        
    }),
    // 43o — time-to-convert profile (the latency half of ev_funnel:
    // not whether users convert but HOW FAST): per user, first view →
    // earliest purchase at-or-after it, latency quantized to minutes,
    // then p50/p90 over the latency HISTOGRAM (the ev_percentile
    // discipline — the rank scan is bounded by the latency domain,
    // never by user count). Readout row: viewers, converters, p50/p90
    // minutes. Shapes: two filtered user rollups (map-side combined),
    // one user-keyed join, one domain-bounded histogram scan.
    "ev_funnel_time" -> ((s, dir) => {
      val e = ev(s, dir)
      val firstView = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ms").as("v0"))
      val lat = e.filter(col("event_type") === "purchase")
        .join(firstView, "user_id")
        .filter(col("ms") >= col("v0"))
        .groupBy("user_id").agg(min(col("ms") - col("v0")).as("lat_ms"))
        .select(col("user_id"), expr("lat_ms DIV 60000").as("lat_min"))
      val wc = Window.orderBy("lat_min").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val st = lat.groupBy("lat_min").agg(count(lit(1)).as("k"))
        .withColumn("cum", sum("k").over(wc))
        .withColumn("n", sum("k").over(Window.partitionBy()))
        .agg(max(col("n")).cast("long").as("n_converted"),
          min(when(col("cum") >= expr("(n + 1) DIV 2"), col("lat_min"))).as("p50_lat_min"),
          min(when(col("cum") >= expr("(9 * n + 9) DIV 10"), col("lat_min"))).as("p90_lat_min"))
      firstView.agg(count(lit(1)).as("n_viewers")).crossJoin(broadcast(st))
    }),
    // 43n — session-length profile (the engagement-distribution
    // readout cut alongside stickiness before any cohort decision):
    // sessions via the SAME gap rule as ev_sessionize, reduced to
    // per-session (n_events, duration) — then the distribution
    // percentiles run over HISTOGRAMS of the quantized values
    // (seconds for duration), the ev_percentile discipline: the rank
    // scan is bounded by the value DOMAIN, never by session count,
    // so the single-task window over each histogram survives 100 TB.
    // One readout row: session count, p50/p90 duration, p50/max
    // events per session.
    "ev_session_stats" -> ((s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy("ms", "event_id")
      val sess = ev(s, dir)
        .withColumn("new_sess",
          when(lag("ms", 1).over(byUser).isNull || col("ms") - lag("ms", 1).over(byUser) > SessionGapMs, 1L)
            .otherwise(0L))
        .withColumn("session_idx", sum("new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_events"), expr("(max(ms) - min(ms)) DIV 1000").as("dur_s"))
      def rankScan(v: String) = {
        val wc = Window.orderBy(col(v)).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        sess.groupBy(v).agg(count(lit(1)).as("k"))
          .withColumn("cum", sum("k").over(wc))
          .withColumn("n", sum("k").over(Window.partitionBy()))
      }
      val dur = rankScan("dur_s").agg(
        max(col("n")).cast("long").as("n_sessions"),
        min(when(col("cum") >= expr("(n + 1) DIV 2"), col("dur_s"))).as("p50_dur_s"),
        min(when(col("cum") >= expr("(9 * n + 9) DIV 10"), col("dur_s"))).as("p90_dur_s"))
      val ne = rankScan("n_events").agg(
        min(when(col("cum") >= expr("(n + 1) DIV 2"), col("n_events"))).as("p50_events"),
        max(col("n_events")).as("max_events"))
      dur.crossJoin(broadcast(ne))
    }),
    // 43g — damped PageRank over the event-type transition graph:
    // edges = user-ordered consecutive event pairs (one partitioned
    // window, the only corpus-scale stage), then 3 power iterations
    // over the node table in fp9 integer arithmetic — per-edge
    // probability quantized to ppm (p6 = ⌊1e6·c/ctot⌋), contribution
    // ⌊85·⌊r·p6/1e6⌋/100⌋, teleport ⌊1.5e8/|V|⌋ — every floor lands
    // identically on both engines, and the staged division keeps all
    // intermediates < 2^60 even at 10^12-edge scale. The iteration
    // joins are node-table-sized; at web-graph node counts the SAME
    // plan distributes (keyed joins, no collect)
    "ev_markov_rank" -> ((s, dir) => {
      val e0 = ev(s, dir)
      val wu = Window.partitionBy("user_id").orderBy(col("ms"), col("event_id"))
      val edges = e0
        .withColumn("_nxt", lead("event_type", 1).over(wu))
        .filter(col("_nxt").isNotNull)
        .groupBy(col("event_type").as("src"), col("_nxt").as("dst"))
        .agg(count(lit(1)).as("c"))
      // The transition graph is EVENT-TYPE keyed — bounded by the
      // type vocabulary, driver-sized at any corpus scale (like the
      // collected IVF centroid / PQ codebook tables). ONE distributed
      // pass builds the (src, dst, c) edge counts; the per-src
      // normalization, node set, and the 3 fp9 power iterations run
      // on the driver in the SAME staged integer arithmetic — p6 =
      // ⌊1e6·c/ctot⌋, contribution ⌊85·⌊r·p6/1e6⌋/100⌋, teleport
      // ⌊1.5e8/|V|⌋; Long division truncates identically to Spark's
      // DIV on these non-negative values — so ranks are bit-identical
      // to the former checkpoint + nested-join iteration plan, minus
      // its per-iteration jobs (optimization round 18). A web-graph
      // node count would swap back to the distributed keyed-join form.
      val edgeRows = edges.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val nodeSet = e0.select(col("event_type")).distinct().collect().map(_.getString(0)).toSeq
      val ctot = edgeRows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      val p6 = edgeRows.map { case (src, dst, c) => (src, dst, 1000000L * c / ctot(src)) }
      val nv = nodeSet.size.toLong
      var r = nodeSet.map(n => n -> 1000000000L / nv).toMap
      for (_ <- 1 to 3) {
        val in = p6.groupBy(_._2).view.mapValues(_.map { case (src, _, p) =>
          85L * (r(src) * p / 1000000L) / 100L
        }.sum).toMap
        r = nodeSet.map(n => n -> (150000000L / nv + in.getOrElse(n, 0L))).toMap
      }
      val outSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("rank_fp9", org.apache.spark.sql.types.LongType, nullable = false)))
      s.createDataFrame(
        java.util.Arrays.asList(nodeSet.map(n => org.apache.spark.sql.Row(n, r(n))): _*),
        outSchema)
    }),
    // 43h — last-touch attribution: each purchase joined to the user's
    // latest STRICTLY-preceding view/click. Pure reuse of the as-of
    // operator (one key shuffle, running struct-max window, no range
    // θ-join) — the point is that marketing attribution IS an as-of
    // join, not a new operator; tie at the same ms resolves to the
    // larger event_id via the payload struct order
    "ev_attribution" -> ((s, dir) => {
      val e = ev(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ms").as("pms"), col("event_id").as("purchase_id"))
      val touches = e.filter(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("ms"), col("event_id"), col("event_type").as("touch_type"))
      graft.operators.AsofJoin.asofBackward(purchases, "user_id", "pms",
          touches, "user_id", "ms", Seq("event_id", "touch_type"), strict = true)
        .select(col("purchase_id"), col("user_id"), col("pms"),
          col("asof_time").as("touch_ms"), col("asof_event_id").as("touch_event_id"),
          col("asof_touch_type").as("touch_type"))
        
    }),
    // 43aj — U-SHAPE (position-based) multi-touch attribution — the
    // 40/20/40 model next to 43i's last-touch: every view/click in
    // the 7-day lookback before a purchase shares its credit — 40% to
    // first and last touch, the middle 20% split evenly. Credit in
    // EXACT fp6 integers (400000 / 500000 / 1000000; the middle share
    // is 200000 DIV (k−2) — the integer-division remainder loss is
    // deterministic and identical in both engines). One user-keyed
    // equi-join bounds the pairing; position windows run per
    // purchase (lookback-bounded, never corpus-sized).
    "ev_attribution_ushape" -> ((s, dir) => {
      val look = 604800000L
      val e = ev(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ms").as("pms"), col("event_id").as("purchase_id"))
      val touches = e.filter(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("ms"), col("event_id"), col("event_type").as("touch_type"))
      val paired = purchases.join(touches, "user_id")
        .filter(col("ms") < col("pms") && col("ms") >= col("pms") - look)
      val wp = Window.partitionBy("purchase_id")
      val wo = wp.orderBy(col("ms"), col("event_id"))
      paired
        .withColumn("k", count(lit(1)).over(wp))
        .withColumn("rn", row_number().over(wo))
        .withColumn("credit",
          when(col("k") === 1, 1000000L)
            .when(col("k") === 2, 500000L)
            .when(col("rn") === 1 || col("rn") === col("k"), 400000L)
            .otherwise(expr("200000 DIV (k - 2)")))
        .groupBy("touch_type")
        .agg(count(lit(1)).as("n_touches"), sum("credit").as("credit_fp6"))
        
    }),
    // 47 — the whole corpus-prep dataflow end-to-end in ONE query
    // (the LLM-pipeline twin of cg_pipeline_counts): eval holdout →
    // Gopher quality gate → exact dedup on normalized text →
    // eval-set decontamination → budget-bounded selection. Seven
    // section counts oracle-gated, so a drift in ANY stage's
    // semantics (or in how the stages compose) hash-mismatches
    // 47b — the DATASET CARD (the per-source corpus profile every
    // released training set ships with): docs, whitespace tokens,
    // exact-dup fraction (corpus-wide content-hash groups — a source
    // re-hosting another's docs counts as duplicated), majority
    // language, exact median doc length, mean length. One doc scan
    // feeds four source-keyed rollups: dup marks ride a hash
    // self-join linear in dup mass; the median uses the ev_percentile
    // histogram compression ((source, n_chars) groups — the window
    // walks value groups, never raw rows); top-lang is a
    // langs-bounded window. Sources are domain-bounded, so every
    // intermediate after the first agg is tiny.
    // 47c — pipeline SURVIVAL funnel (the filter-cascade report every
    // FineWeb/C4-style cleaning run publishes: how much corpus does
    // each rule cost, cumulatively?): length bounds → repetition cap
    // → language metadata gate → stopword floor, each stage the
    // conjunction of all before it. ONE corpus scan computes every
    // per-doc flag (the repetition rule reuses its query twin's
    // exact expression; the language gate reads the corpus metadata
    // column — the stopword-langid predicts 'en' corpus-wide on this
    // synthetic data, so the metadata gate is the one that bites);
    // the report is a 1-row agg of
    // conditional sums exploded to stage rows — no per-stage rescans.
    "pipe_quality_funnel" -> ((s, dir) => {
      val en = TextAnalysis.DefaultStopwords.head._2
      val flags = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), TextAnalysis.tokens(col("text")).as("toks"))
        .withColumn("rep4",
          when(size(col("toks")) === 0, lit(10000L))
            .otherwise(fp(lit(1.0) - size(array_distinct(col("toks"))).cast("double")
              / size(col("toks")).cast("double"), 4)))
        .withColumn("f1", size(col("toks")).between(20, 200))
        .withColumn("f2", col("f1") && col("lang") === "en")
        .withColumn("f3", col("f2") && col("rep4") <= 6000)
        .withColumn("f4", col("f3") &&
          size(filter(col("toks"), t => t.isin(en: _*))) >= 2)
      def n(c: Column) = sum(c.cast("long"))
      flags.agg(count(lit(1)).as("n0"), n(col("f1")).as("n1"), n(col("f2")).as("n2"),
          n(col("f3")).as("n3"), n(col("f4")).as("n4"))
        .select(explode(array(
          struct(lit("1_all").as("stage"), col("n0").as("n_docs")),
          struct(lit("2_len").as("stage"), col("n1").as("n_docs")),
          struct(lit("3_lang_en").as("stage"), col("n2").as("n_docs")),
          struct(lit("4_repetition").as("stage"), col("n3").as("n_docs")),
          struct(lit("5_stopwords").as("stage"), col("n4").as("n_docs")))).as("s"))
        .select(col("s.stage").as("stage"), col("s.n_docs").as("n_docs"))
        
    }),
    "pipe_dataset_card" -> ((s, dir) => {
      val base = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_toks"),
          md5(col("text")).as("h"))
      val dup = base.groupBy("h").agg(count(lit(1)).as("hc"))
      val agg = base.join(dup, "h")
        .withColumn("is_dup", (col("hc") > 1).cast("long"))
        .groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum("n_toks").cast("long").as("n_tokens"),
          sum("is_dup").cast("long").as("dup_docs"),
          sum("n_chars").cast("long").as("sum_chars"))
      val wl = Window.partitionBy("source").orderBy(col("ln").desc, col("lang"))
      val top = base.groupBy("source", "lang").agg(count(lit(1)).as("ln"))
        .withColumn("rn", row_number().over(wl)).filter(col("rn") === 1)
        .select(col("source"), col("lang").as("top_lang"), col("ln").as("top_lang_n"))
      val wc = Window.partitionBy("source").orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wt = Window.partitionBy("source")
      val p50 = base.groupBy("source", "n_chars").agg(count(lit(1)).as("k"))
        .withColumn("cum", sum("k").over(wc)).withColumn("n", sum("k").over(wt))
        .groupBy("source")
        .agg(min(when(col("cum") >= expr("(n + 1) DIV 2"), col("n_chars"))).as("p50_chars"))
      agg.join(top, "source").join(p50, "source")
        .select(col("source"), col("n_docs"), col("n_tokens"), col("dup_docs"),
          fp(col("dup_docs").cast("double") / col("n_docs").cast("double"), 4).as("dup_frac_fp4"),
          col("top_lang"), col("top_lang_n"), col("p50_chars"),
          fp(col("sum_chars").cast("double") / col("n_docs").cast("double"), 2).as("mean_chars_fp2"))
        
    }),
    "pipe_prep_counts" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val eval = docs.filter(col("doc_id") % 97 === 0)
      val train = docs.filter(col("doc_id") % 97 =!= 0)
      val quality = train.join(
        TextAnalysis.gopherRulesDf(train, "doc_id", "text")
          .filter(col("keep_flag") === 1).select("doc_id"), "doc_id")
      val winners = quality
        .select(col("doc_id"), md5(TextAnalysis.normalize(col("text"))).as("_h"))
        .groupBy("_h").agg(min("doc_id").as("doc_id"))
      val deduped = quality.join(winners.select("doc_id"), "doc_id")
      val decon = Dedup.decontaminate(deduped, "doc_id", "text", eval, "text", n = 4)
      val scored = decon.select(col("doc_id"), col("n_chars"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      val selected = graft.sample.Sampling.budgetSelect(
        scored, "doc_id", "n_chars", "n_tokens", budget = 20000L)
      def cnt(name: String, df: DataFrame) =
        df.agg(count(lit(1)).as("n")).withColumn("section", lit(name))
      cnt("s1_input", docs)
        .unionByName(cnt("s2_train", train))
        .unionByName(cnt("s3_quality", quality))
        .unionByName(cnt("s4_dedup", deduped))
        .unionByName(cnt("s5_decontam", decon))
        .unionByName(cnt("s6_selected", selected))
        .unionByName(selected.agg(coalesce(sum("n_tokens"), lit(0L)).as("n"))
          .withColumn("section", lit("s7_selected_tokens")))
        .select("section", "n")
        
    }),
    // 42 — gap-based sessionization (batch twin of the streaming op)
    "ev_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy("ms", "event_id")
      ev(s, dir)
        .withColumn("new_sess",
          when(lag("ms", 1).over(byUser).isNull || col("ms") - lag("ms", 1).over(byUser) > SessionGapMs, 1L)
            .otherwise(0L))
        .withColumn("session_idx", sum("new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_events"), min("ms").as("start_ms"), max("ms").as("end_ms"), sum("v4").as("sum_v4"))
}),
    // 43ae — interval CONCURRENCY (sweep line): per day, the peak
    // number of simultaneously-open sessions — the load-planning
    // number behind connection pools and rate limits. Sessions
    // (6h-gap, the ev_sessionize rule) explode to ±1 boundary deltas;
    // within each day a running sum over (t, +1-before-−1) finds the
    // peak (inclusive overlap at touching instants); sessions that
    // straddle midnight carry +1 into each later covered day (span
    // explode — bounded by session duration in days). The sweep
    // windows are DAY-sliced, never one global task; the per-day peak
    // is order-stable under ties because equal deltas commute inside
    // their block.
    "ev_concurrency" -> ((s, dir) => {
      val dayMs = 86400000L
      val byUser = Window.partitionBy("user_id").orderBy("ms", "event_id")
      val sess = ev(s, dir)
        .withColumn("new_sess",
          when(lag("ms", 1).over(byUser).isNull || col("ms") - lag("ms", 1).over(byUser) > SessionGapMs, 1L)
            .otherwise(0L))
        .withColumn("session_idx", sum("new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_idx")
        .agg(min("ms").as("st"), max("ms").as("en"))
        .withColumn("sd", expr(s"(st - pmod(st, $dayMs)) DIV $dayMs"))
        .withColumn("ed", expr(s"(en - pmod(en, $dayMs)) DIV $dayMs"))
        // sessions-sized, consumed by deltas AND carries — pin it so the
        // sessionize window pass runs once
        .localCheckpoint()
      val deltas = sess.select(explode(array(
          struct(col("sd").as("day"), col("st").as("t"), lit(1L).as("d")),
          struct(col("ed").as("day"), col("en").as("t"), lit(-1L).as("d")))).as("e"))
        .select(col("e.day").as("day"), col("e.t").as("t"), col("e.d").as("d"))
      val carries = sess.filter(col("ed") > col("sd"))
        .select(explode(sequence(col("sd") + 1, col("ed"))).as("day"))
        .groupBy("day").agg(count(lit(1)).as("carry"))
      val wd = Window.partitionBy("day").orderBy(col("t"), col("d").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      deltas
        .withColumn("run", sum("d").over(wd))
        .groupBy("day")
        .agg(max("run").as("peak_in_day"),
          sum(when(col("d") === 1, 1L).otherwise(0L)).as("n_starts"))
        .join(carries, Seq("day"), "full_outer")
        // concurrency at day START is the carry alone — a day whose
        // deltas only close carried sessions (or has none) peaks there
        .select(col("day"),
          (coalesce(col("carry"), lit(0L)) +
            greatest(coalesce(col("peak_in_day"), lit(0L)), lit(0L))).as("peak_conc"),
          coalesce(col("carry"), lit(0L)).as("carry_in"),
          coalesce(col("n_starts"), lit(0L)).as("n_starts"))
        
    }),
    // 43 — tumbling-window aggregation (batch twin of the streaming op)
    "ev_window_agg" -> ((s, dir) => {
      ev(s, dir)
        .withColumn("win_start", col("ms") - pmod(col("ms"), lit(3600000L)))
        .groupBy("win_start", "event_type")
        .agg(count(lit(1)).as("n"), sum("v4").as("sum_v4"))
        
    }),
    // 43aa — HOPPING (sliding) window agg, size 1h / hop 30min — the
    // overlapping-window twin of the tumbling agg above and the batch
    // shape of Spark's window(ts, "1 hour", "30 minutes"): each event
    // replicates to size/hop = 2 windows via an explode (map-side,
    // bounded 2× row growth), then ONE hash agg — never a self-join
    // of shifted tumbles. The general (size, hop) guard filter is
    // kept although vacuous at 2×.
    "ev_sliding_window" -> ((s, dir) => {
      val size = 3600000L; val hop = 1800000L
      ev(s, dir)
        .withColumn("k", explode(sequence(lit(0L), lit(size / hop - 1))))
        .withColumn("win_start",
          col("ms") - pmod(col("ms"), lit(hop)) - col("k") * lit(hop))
        .filter(col("ms") < col("win_start") + lit(size))
        .groupBy("win_start", "event_type")
        .agg(count(lit(1)).as("n"), sum("v4").as("sum_v4"))
        
    }),
    // 43ab — event-SEQUENCE pattern matching (MATCH_RECOGNIZE's
    // poor-man twin, and the per-user behavioral fingerprint): each
    // user's arrival-ordered event types collapse to a symbol string
    // (first letters are distinct across the 5 types), then regexes
    // count contiguous view→click→purchase runs and test the gapped
    // funnel v…c…p. ONE user-keyed ObjectHashAggregate builds the
    // path (per-user event counts are human-bounded, never
    // corpus-bounded); the regex scan is a narrow map.
    "ev_pattern_match" -> ((s, dir) => {
      ev(s, dir)
        .select(col("user_id"), col("ms"), col("event_id"),
          substring(col("event_type"), 1, 1).as("sym"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          array_join(transform(
            array_sort(collect_list(struct(col("ms"), col("event_id"), col("sym")))),
            e => e.getField("sym")), "").as("path"))
        .withColumn("n_vcp",
          expr("(length(path) - length(regexp_replace(path, 'vcp', ''))) DIV 3"))
        .withColumn("has_funnel", col("path").rlike("v[^p]*c[^p]*p").cast("int"))
        
    }),
    // 43ac — watermark LATENESS accounting (the batch counterfactual
    // of streaming's withWatermark drop rule): replay the log in
    // arrival order (event_id), hold the running event-time high-water
    // mark, and flag events arriving more than 2h behind it — per
    // tumbling hour, how many events WOULD a 2h watermark drop? The
    // global running max is the budgetSelect prefix-scan shape
    // (operators/Watermark.scala), never a single-task window.
    "ev_late_events" -> ((s, dir) => {
      graft.operators.Watermark.lateness(ev(s, dir), "event_id", "ms", delayMs = 7200000L)
        .withColumn("win_start", col("ms") - pmod(col("ms"), lit(3600000L)))
        .groupBy("win_start")
        .agg(count(lit(1)).as("n"), sum(col("is_late").cast("long")).as("n_late"))
}),
    // 43ad — seasonal-naive FORECAST backtest (the baseline every
    // volume forecast must beat, and the capacity-planning sanity
    // report): predict each (event_type, day) count by the count 7
    // days earlier, score per-type MAE over the days where a
    // prediction exists. ALL-INTEGER: the daily rollup is one hash
    // agg, the lag-7 a self-equi-join on (type, day−7) — never a
    // window over raw events; mae_fp4 = ⌊Σ|err|/n·10⁴+0.5⌉ computed
    // as (Σ·2·10⁴+n) DIV (2n), exact on both engines.
    "ev_forecast_baseline" -> ((s, dir) => {
      val dayMs = 86400000L
      val daily = ev(s, dir)
        .withColumn("day", expr(s"(ms - pmod(ms, $dayMs)) DIV $dayMs"))
        .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
      val pred = daily.select(col("event_type"), (col("day") + 7).as("day"),
        col("n").as("n_pred"))
      daily.join(pred, Seq("event_type", "day"))
        .select(col("event_type"), abs(col("n") - col("n_pred")).as("err"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"), sum("err").as("total_abs_err"))
        .withColumn("mae_fp4",
          expr("(total_abs_err * 20000 + n_days) DIV (2 * n_days)"))
        
    }),
    // 43g — daily-volume anomaly profile (ingest monitoring: which
    // source×day volumes spike/crater before they poison a mixture):
    // per (event_type, day) counts, flagged |n−μ|>2σ against the
    // type's own day distribution — the rule evaluated EXACTLY in
    // integer/decimal form ((n·N−S)² > 4(N·Q−S²)), never float
    // mean/stddev, so the flag is engine-exact. One raw-stream
    // groupBy + a broadcast stats join (EventStats.dailyVolumeOutliers).
    "ev_anomaly" -> ((s, dir) => {
      val dayMs = 86400000L
      val daily = ev(s, dir)
        .withColumn("day", expr(s"(ms - pmod(ms, $dayMs)) DIV $dayMs"))
        .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
      graft.operators.EventStats.dailyVolumeOutliers(daily, "event_type", "day", "n")
        
    }),
    // 43b — ordered event funnel (view → click → purchase): stage k
    // requires an event strictly after the user's stage-(k-1) time.
    // Three key-shuffles (one per stage), each with map-side partial
    // min — the classic scalable funnel shape, no per-user sort.
    "ev_funnel" -> ((s, dir) => {
      val e = ev(s, dir)
      val s1 = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ms").as("t1"))
      val s2 = e.filter(col("event_type") === "click").join(s1, "user_id")
        .filter(col("ms") > col("t1"))
        .groupBy("user_id").agg(min("ms").as("t2"))
      val s3 = e.filter(col("event_type") === "purchase").join(s2, "user_id")
        .filter(col("ms") > col("t2"))
        .groupBy("user_id").agg(min("ms").as("t3"))
      def cnt(df: DataFrame, stage: String) =
        df.agg(count(lit(1)).as("n_users")).withColumn("stage", lit(stage))
      cnt(s1, "1_view").unionByName(cnt(s2, "2_click")).unionByName(cnt(s3, "3_purchase"))
        .select("stage", "n_users")
    }),
    // 43af — WINDOWED first-touch funnel (ev_funnel with a conversion
    // deadline — the product-analytics default): stage k counts only
    // within W = 24h of the PREVIOUS stage's first-touch time, and
    // the chain anchors on each user's FIRST stage-1 event
    // (first-touch semantics, stated and oracle-pinned: a later view
    // that would have converted does not resurrect the user). Same
    // three key-shuffles with map-side partial mins as the unbounded
    // funnel; lag mass rides along for the conversion-latency report.
    "ev_funnel_window" -> ((s, dir) => {
      val W = 86400000L
      val e = ev(s, dir)
      // stage frames are user-domain-sized and each feeds BOTH the next
      // stage's join and its own count row — pin them so later stages
      // don't re-run the earlier stages' corpus scans
      val s1 = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ms").as("t1")).localCheckpoint()
      val s2 = e.filter(col("event_type") === "click").join(s1, "user_id")
        .filter(col("ms") > col("t1") && col("ms") <= col("t1") + W)
        .groupBy("user_id").agg(min("ms").as("t2"), min("t1").as("t1b"))
        .localCheckpoint()
      val s3 = e.filter(col("event_type") === "purchase").join(s2, "user_id")
        .filter(col("ms") > col("t2") && col("ms") <= col("t2") + W)
        .groupBy("user_id").agg(min("ms").as("t3"), min("t1b").as("t1c"))
      def cnt(df: DataFrame, stage: String, lag: Column) =
        df.agg(count(lit(1)).as("n_users"), sum(lag).as("sum_lag_ms"))
          .withColumn("stage", lit(stage))
      cnt(s1, "1_view", lit(0L))
        .unionByName(cnt(s2, "2_click", col("t2") - col("t1b")))
        .unionByName(cnt(s3, "3_purchase", col("t3") - col("t1c")))
        .select(col("stage"), col("n_users"), coalesce(col("sum_lag_ms"), lit(0L)).as("sum_lag_ms"))
        
    }),
    // 43ag — GROWTH ACCOUNTING (new / retained / resurrected /
    // churned per DAY — the canonical user-base decomposition that
    // retention matrices don't give; daily because this corpus is
    // week-saturated — every user is active every week): activity
    // collapses to the distinct (user, day) set first (one dedup
    // shuffle, ≤ users×days rows — orders smaller than the log);
    // every status is then an equi-join on (user, day±1) against
    // that compressed set, churn an anti-join from the day-shifted
    // twin, clipped to observed days. No window over raw events.
    "ev_growth_accounting" -> ((s, dir) => {
      val dayMs = 86400000L
      val au = ev(s, dir)
        .select(col("user_id"), expr(s"(ms - pmod(ms, $dayMs)) DIV $dayMs").as("day"))
        .distinct()
        // users×days-sized and consumed 4× (first/prev/max/status/churn)
        // — pin it so the raw-event dedup scan runs once
        .localCheckpoint()
      val first = au.groupBy("user_id").agg(min("day").as("fw"))
      val prev = au.select(col("user_id"), (col("day") + 1).as("day"), lit(1).as("p"))
      val maxW = au.agg(max("day").as("mw"))
      val status = au.join(first, "user_id")
        .join(prev, Seq("user_id", "day"), "left")
        .select(col("day"),
          when(col("day") === col("fw"), "new")
            .when(col("p").isNotNull, "retained")
            .otherwise("resurrected").as("st"))
      val churn = prev.join(au, Seq("user_id", "day"), "left_anti")
        .crossJoin(broadcast(maxW)).filter(col("day") <= col("mw"))
        .groupBy("day").agg(count(lit(1)).as("n_churned"))
      status.groupBy("day")
        .agg(sum(when(col("st") === "new", 1L).otherwise(0L)).as("n_new"),
          sum(when(col("st") === "retained", 1L).otherwise(0L)).as("n_retained"),
          sum(when(col("st") === "resurrected", 1L).otherwise(0L)).as("n_resurrected"))
        .join(churn, Seq("day"), "full_outer")
        .select(col("day"),
          coalesce(col("n_new"), lit(0L)).as("n_new"),
          coalesce(col("n_retained"), lit(0L)).as("n_retained"),
          coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
          coalesce(col("n_churned"), lit(0L)).as("n_churned"))
        
    }),
    // 43c — cohort retention: users grouped by first-activity week,
    // counted per week-offset they return in. Two key-shuffles (per
    // user cohort min, then per (cohort, offset) distinct count).
    "ev_retention" -> ((s, dir) => {
      val weekMs = 604800000L
      val e = ev(s, dir).withColumn("week", expr(s"(ms - pmod(ms, $weekMs)) DIV $weekMs"))
      val cohorts = e.groupBy("user_id").agg(min("week").as("cohort_week"))
      e.join(cohorts, "user_id")
        .select(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"), col("user_id"))
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(count(lit(1)).as("n_users"))
        
    }),
    // 44 — JSON property extraction (codegen'd path access). NO output
    // orderBy: this is the one query whose output is corpus-sized (a
    // row per event), so a global sort would range-shuffle + totally
    // sort the whole table purely for presentation — at 100× scale the
    // sort IS the query. The checker row-sorts both sides before
    // hashing (tools/check.py), so unordered output verifies the same.
    "ev_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_id"), get_json_object(col("props"), "$.k").cast("long").as("k_val"))
    }),
    // 45b — multimodal image metadata: synthesize PNG payloads
    // (mapPartitions), parse dimensions back COLUMNAR from the binary
    // header — the oracle checks the synth→parse roundtrip
    "mm_image_meta" -> ((s, dir) => {
      import s.implicits._
      import graft.multimodal.Multimodal
      val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          (id, Multimodal.synthPngHeader((id % 1000 + 1).toInt, (id % 700 + 1).toInt))
        })
        .toDF("doc_id", "payload")
      payloads.select(
        col("doc_id"),
        Multimodal.magic(col("payload")).as("fmt"),
        Multimodal.pngWidth(col("payload")).as("width"),
        Multimodal.pngHeight(col("payload")).as("height"))
        
    }),
    // 45 — multimodal binary metadata, REAL codec: payloads are
    // synthesized per-row in all three containers (PNG / JPEG with a
    // variable-offset SOF0 segment / GIF), and format + dimensions +
    // length are parsed back COLUMNAR from the binary headers — PNG
    // big-endian IHDR, JPEG bounded segment WALK (the SOF offset
    // varies with the APP0 padding and optional COM segment, so the
    // walk is exercised on every row), GIF little-endian logical
    // screen. The oracle checks the synth→parse roundtrip closed-form.
    "mm_binary_meta" -> ((s, dir) => {
      import s.implicits._
      import graft.multimodal.Multimodal
      val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val w = (id % 500 + 1).toInt
          val h = (id % 300 + 1).toInt
          val bytes = (id % 3) match {
            case 0 => Multimodal.synthPngHeader(w, h)
            case 1 => Multimodal.synthJpegHeader(w, h, pad = (id % 7).toInt, comment = id % 2 == 0)
            case _ => Multimodal.synthGifHeader(w, h)
          }
          (id, bytes)
        })
        .toDF("doc_id", "payload")
      payloads.select(
        col("doc_id"),
        Multimodal.magic(col("payload")).as("fmt"),
        Multimodal.imageWidth(col("payload")).cast("long").as("width"),
        Multimodal.imageHeight(col("payload")).cast("long").as("height"),
        length(col("payload")).cast("long").as("byte_len"))
        
    }),
    // 45c — audio metadata: REAL RIFF/WAVE canonical-header parse
    // (little-endian fields via reversed hex slices, all columnar/
    // codegen'd) + integer-exact duration; synth→parse roundtrip
    // oracle closed-form in doc_id like mm_binary_meta
    "mm_audio_meta" -> ((s, dir) => {
      import s.implicits._
      import graft.multimodal.Multimodal
      val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val rate = Seq(8000, 16000, 22050, 44100)((id % 4).toInt)
          (id, Multimodal.synthWavHeader(
            channels = (id % 2 + 1).toInt, sampleRate = rate,
            bitsPerSample = if (id % 3 == 0) 8 else 16,
            dataBytes = (id % 5000 + 100).toInt))
        })
        .toDF("doc_id", "payload")
      payloads.select(
        col("doc_id"),
        Multimodal.wavChannels(col("payload")).cast("long").as("channels"),
        Multimodal.wavSampleRate(col("payload")).as("sample_rate"),
        Multimodal.wavBitsPerSample(col("payload")).cast("long").as("bits"),
        Multimodal.wavDataBytes(col("payload")).as("data_bytes"),
        Multimodal.wavDurationMs(col("payload")).as("duration_ms"))
        
    }),
    // 45g — PCM sample DECODE + loudness profile: the audio twin of
    // the raster ops — every int16 sample is decoded from the WAV
    // payload bytes columnar (one codegen'd byte walk, no UDF, no
    // shuffle), then peak / exact-integer energy / RMS per clip. The
    // payload synthesis is in-query test-data generation (cg_wkb_decode
    // pattern); the DECODE is the operator, and the oracle recomputes
    // the expected samples closed-form from doc_id — any byte-offset
    // or sign-extension drift in the decoder breaks the hash
    "mm_audio_rms" -> ((s, dir) => {
      import s.implicits._
      import graft.multimodal.Multimodal
      val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val n = (id % 200 + 50).toInt
          val samples = Array.tabulate(n)(i =>
            (((id * 31 + i.toLong * i * 7) % 65536) - 32768).toInt)
          val data = samples.flatMap { v =>
            val u = v & 0xffff
            Array((u & 0xff).toByte, ((u >> 8) & 0xff).toByte)
          }
          (id, Multimodal.synthWavHeader(1, 16000, 16, n * 2) ++ data)
        })
        .toDF("doc_id", "payload")
      payloads
        .select(col("doc_id"), call_function("graft_pcm_stats",
          Multimodal.wavPcm16(col("payload"))).as("st"))
        .select(col("doc_id"),
          col("st.n_samples").as("n_samples"),
          col("st.peak").as("peak"),
          col("st.sum_sq").as("sum_sq"))
        .withColumn("rms_fp2",
          fp(sqrt(col("sum_sq").cast("double") / col("n_samples").cast("double")), 2))
        
    }),
    // 45k — PCM 2× decimation (the audio RESAMPLE twin of 45j's
    // image resize — the rate-halving pass an audio pipeline runs
    // before feature extraction): decode the same synthetic WAV
    // clips as 45g, then out(k) = ⌊(s[2k]+s[2k+1])/2⌋ via an
    // ARITHMETIC shift (true floor on negative sums — DuckDB's //
    // truncates, so the oracle floors through a double, exact for
    // |sum| < 2^52). Per-clip exact-integer profile (n_out / sum /
    // min / max) keeps the verified output clip-sized. The decode +
    // decimation are one narrow columnar projection — zero data
    // shuffles; the derived array binds once per row (staged
    // projection — Catalyst does no CSE inside HOF lambdas).
    "mm_audio_resample" -> ((s, dir) => {
      import s.implicits._
      import graft.multimodal.Multimodal
      val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val n = (id % 200 + 50).toInt
          val samples = Array.tabulate(n)(i =>
            (((id * 31 + i.toLong * i * 7) % 65536) - 32768).toInt)
          val data = samples.flatMap { v =>
            val u = v & 0xffff
            Array((u & 0xff).toByte, ((u >> 8) & 0xff).toByte)
          }
          (id, Multimodal.synthWavHeader(1, 16000, 16, n * 2) ++ data)
        })
        .toDF("doc_id", "payload")
      payloads
        .select(col("doc_id"), Multimodal.wavPcm16(col("payload")).as("_pcm"))
        .select(col("doc_id"), transform(
          sequence(lit(0L), shiftright(size(col("_pcm")).cast("long"), 1) - 1),
          k => shiftright(
            (element_at(col("_pcm"), (k * 2 + 1).cast("int")) +
             element_at(col("_pcm"), (k * 2 + 2).cast("int"))).cast("long"), 1)).as("_o"))
        .select(col("doc_id"),
          size(col("_o")).cast("long").as("n_out"),
          aggregate(col("_o"), lit(0L), (a, v) => a + v).as("sum_out"),
          array_min(col("_o")).as("min_out"),
          array_max(col("_o")).as("max_out"))
        
    }),
    // 45h — frame-energy SEGMENTATION over decoded PCM (the
    // silence-trim / voice-activity shape of an audio training
    // pipeline): 256-sample frames, exact BIGINT energy per frame,
    // a frame is active iff energy > 2^20 (mean square > 4096 ⇔
    // frame RMS > 64). The synthetic clips alternate genuinely loud
    // and quiet ((frame+id) % 3 == 0 → samples masked to 0..63)
    // regions, so first/last-active are real trim boundaries; the
    // oracle recomputes every sample closed-form from doc_id, so the
    // decoder AND the framing/energy arithmetic are both on the hook
    // 45q — AUDIO FINGERPRINT (Chromaprint's core move on the synth
    // clips: the SIGN of successive frame-energy deltas packs into a
    // compact bit signature — robust to gain, cheap to group): per
    // clip, fold [e_f > e_{f−1}] MSB-first into a long, then exact
    // signature groups (rep = min doc, size) — the audio twin of the
    // image aHash grouping. Decode + energies are the native
    // codegen'd byte walks; the fold is frame-count-bounded.
    "mm_audio_fingerprint" -> ((s, dir) => {
      import s.implicits._
      import graft.multimodal.Multimodal
      val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val n = ((id % 10 + 4) * 256 + id % 100).toInt
          val samples = Array.tabulate(n) { i =>
            val v = (((id * 31 + i.toLong * i * 7) % 65536) - 32768).toInt
            if (((i >> 8) + id) % 3 == 0) v & 63 else v
          }
          val data = samples.flatMap { v =>
            val u = v & 0xffff
            Array((u & 0xff).toByte, ((u >> 8) & 0xff).toByte)
          }
          (id, Multimodal.synthWavHeader(1, 16000, 16, n * 2) ++ data)
        })
        .toDF("doc_id", "payload")
      val fps = payloads
        .select(col("doc_id"),
          Multimodal.pcmFrameEnergies(
            Multimodal.wavPcm16(col("payload")), frameLen = 256).as("en"))
        .filter(col("en").isNotNull)
        // the fold caps at 62 deltas — one per bit with sign headroom,
        // so the a*2+b accumulation can never overflow a BIGINT under
        // ANSI mode regardless of clip length; the oracle mirrors the
        // SAME cap (LEAST(frames-1, 62)), so the bound is part of the
        // contract, not a coincidence of the synth's 13-frame clips
        .select(col("doc_id"), size(col("en")).cast("long").as("n_frames"),
          aggregate(
            slice(transform(col("en"), (e, i) =>
              when(i >= 1 && e > element_at(col("en"), i), 1L).otherwise(0L)), 2, 62),
            lit(0L), (a, b) => a * 2 + b).as("afp"))
      val groups = fps.groupBy("afp", "n_frames")
        .agg(min("doc_id").as("rep_id"), count(lit(1)).as("group_size"))
      fps.join(groups, Seq("afp", "n_frames"))
        .select("doc_id", "n_frames", "afp", "rep_id", "group_size")
        
    }),
    "mm_audio_seg" -> ((s, dir) => {
      import s.implicits._
      import graft.multimodal.Multimodal
      val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val n = ((id % 10 + 4) * 256 + id % 100).toInt
          val samples = Array.tabulate(n) { i =>
            val v = (((id * 31 + i.toLong * i * 7) % 65536) - 32768).toInt
            if (((i >> 8) + id) % 3 == 0) v & 63 else v
          }
          val data = samples.flatMap { v =>
            val u = v & 0xffff
            Array((u & 0xff).toByte, ((u >> 8) & 0xff).toByte)
          }
          (id, Multimodal.synthWavHeader(1, 16000, 16, n * 2) ++ data)
        })
        .toDF("doc_id", "payload")
      payloads
        .select(col("doc_id"),
          Multimodal.pcmFrameEnergies(
            Multimodal.wavPcm16(col("payload")), frameLen = 256).as("en"))
        .filter(col("en").isNotNull)
        .select(col("doc_id"),
          size(col("en")).cast("long").as("n_frames"),
          filter(transform(col("en"), (e, i) =>
            when(e > lit(1048576L), i).otherwise(lit(-1))), x => x >= 0).as("ai"))
        .select(col("doc_id"), col("n_frames"),
          size(col("ai")).cast("long").as("n_active"),
          coalesce(array_min(col("ai")), lit(-1)).cast("long").as("first_active"),
          coalesce(array_max(col("ai")), lit(-1)).cast("long").as("last_active"),
          fp(size(col("ai")).cast("double") / col("n_frames").cast("double"), 4)
            .as("active_fp4"))
        
    }),
    // 45d — video frame sampling (1 frame/sec) over the GVID raw
    // container: header parse + sampled-index explode + exact
    // timestamps + offsets, with a probe byte READ at each computed
    // offset so the oracle catches any offset-arithmetic drift. Real
    // codec decode is the documented stub boundary (mapPartitions over
    // substr(payload, off, size) at deploy time); the plumbing —
    // schema, explode shape, zero-shuffle narrowness — is real
    "mm_frame_sample" -> ((s, dir) => {
      import s.implicits._
      import graft.multimodal.Multimodal
      val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          (id, Multimodal.synthVideo(
            width = (id % 8 + 1).toInt, height = (id % 4 + 1).toInt,
            fps = Seq(1, 2, 5, 10)((id % 4).toInt),
            frames = (id % 24 + 2).toInt,
            fill = i => ((id * 31 + i * 7) % 251).toInt))
        })
        .toDF("doc_id", "payload")
      Multimodal.frameSample(payloads, "doc_id", "payload")
        
    }),
    // 45f — video frame DECODE (closing 45d's declared stub): frames
    // arrive RLE-COMPRESSED in the GVRL container (per-frame offset
    // index in the header, MP4-style), sampling + index lookup +
    // compressed extraction run columnar, and the REAL decompression
    // executes at the codec seam (one mapPartitions over extracted
    // bytes). Each decoded 8×8 raster then rides the SAME columnar
    // raster operators as mm_image_phash — pixel sum + both aHash
    // halves — and the oracle recomputes all of it closed-form from
    // (doc_id, frame_idx): a two-value raster (first q pixels a, rest
    // b) whose runs the codec must reproduce EXACTLY for the sum and
    // the 64 threshold bits to land.
    "mm_frame_decode" -> ((s, dir) => {
      import s.implicits._
      import graft.multimodal.Multimodal
      val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          (id, Multimodal.synthVideoRle(
            width = 8, height = 8,
            fps = Seq(1, 2, 5, 10)((id % 4).toInt),
            frames = (id % 24 + 2).toInt,
            fill = (f, pix) => {
              val q = (id % 63 + 1).toInt
              if (pix < q) ((id * 31 + f * 7) % 251).toInt
              else ((id * 17 + f * 11) % 251).toInt
            }))
        })
        .toDF("doc_id", "payload")
      Multimodal.frameDecodeRle(payloads, "doc_id", "payload")
        .select(col("doc_id"), col("frame_idx"), col("ts_ms"),
          Multimodal.rasterSum(col("raster"), 64).as("sum_pix"),
          Multimodal.aHashHalf(col("raster"), 32).as("phash_hi"),
          Multimodal.aHashHalf(col("raster"), 0).as("phash_lo"))
    }),
    // 45i — scene-cut detection over decoded frames: every frame
    // decoded (stride 1 through the same GVRL index/RLE codec as
    // 45f), per-clip lag window, SAD (native graft_raster_sad)
    // against the previous raster, cut when SAD > threshold — the
    // scene-boundary pass before scene-based frame sampling. The
    // synth plants a new scene every 5 frames (all 64 pixels shift by
    // a 97-multiple) with a ≤2-intensity single-pixel jitter inside a
    // scene, so threshold 64 separates exactly; the oracle recomputes
    // every pixel closed-form from (doc_id, frame_idx)
    "mm_scene_cut" -> ((s, dir) => {
      import s.implicits._
      import graft.multimodal.Multimodal
      val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          (id, Multimodal.synthVideoRle(
            width = 8, height = 8,
            fps = Seq(1, 2, 5, 10)((id % 4).toInt),
            frames = (id % 24 + 2).toInt,
            fill = (f, pix) =>
              (((id * 31 + (f / 5) * 97 + pix * 7) % 251) +
                (if (pix == 0) f % 3 else 0)).toInt))
        })
        .toDF("doc_id", "payload")
      Multimodal.sceneCuts(payloads, "doc_id", "payload", rasterLen = 64, threshold = 64L)
        
    }),
    // 45e — image near-dup via perceptual hash: synthetic 8×8
    // grayscale rasters (deterministic stand-in for decoded
    // thumbnails; the id%3 term is a brightness shift), average-hash
    // computed COLUMNAR from the binary payload (strict integer mean
    // comparison, two uint32 halves), then dedup-group on the hash.
    // Brightness-shifted copies land in one group — that's the
    // "perceptual": byte-level dedup would keep all three variants
    "mm_image_phash" -> ((s, dir) => {
      import s.implicits._
      import graft.multimodal.Multimodal
      val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, Multimodal.synthGray8x8(id))))
        .toDF("doc_id", "payload")
      val hashed = payloads.select(col("doc_id"),
        Multimodal.aHashHalf(col("payload"), 32).as("phash_hi"),
        Multimodal.aHashHalf(col("payload"), 0).as("phash_lo"))
      val groups = hashed.groupBy("phash_hi", "phash_lo")
        .agg(min("doc_id").as("rep_id"), count(lit(1)).as("group_size"))
      hashed.join(groups, Seq("phash_hi", "phash_lo"))
        .select("doc_id", "phash_hi", "phash_lo", "rep_id", "group_size")
        
    }),
    // 45o — perceptual-hash NEAR-dup pairs (the image twin of
    // dd_simhash64_pairs — multimodal dedup is bit-signature dedup
    // with a different hasher): exact-signature groups collapse
    // FIRST (signature-space is tiny next to the corpus), then the
    // banded Hamming self-join pairs group REPRESENTATIVES within
    // ≤7 flips — lossless by pigeonhole over 8 bands, and the output
    // is group-pair-sized, never corpus-quadratic. Oracle is the
    // brute all-pairs filter over the distinct-signature groups,
    // with hamming as the sum of the two half XOR popcounts (the
    // 64-bit recompose overflows SQL BIGINT multiply).
    "dd_phash_neardup" -> ((s, dir) => {
      import s.implicits._
      import graft.multimodal.Multimodal
      val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, Multimodal.synthGray8x8(id))))
        .toDF("doc_id", "payload")
      val hashed = payloads.select(col("doc_id"),
        shiftleft(Multimodal.aHashHalf(col("payload"), 32), 32)
          .bitwiseOR(Multimodal.aHashHalf(col("payload"), 0)).as("sig"))
      // groups is signature-domain-bounded (tiny) and consumed 3×
      // (pair join sides + two size joins) — pin it so the corpus
      // synth+hash scan runs once, not four times
      val groups = hashed.groupBy("sig")
        .agg(min("doc_id").as("rep"), count(lit(1)).as("n"))
        .localCheckpoint()
      val pairs = Dedup.hammingPairs(
        groups.select(col("rep").as("doc"), col("sig")),
        sigBits = 64, maxHamming = 7, maxBucket = 1L << 20)
      pairs
        .join(groups.select(col("rep").as("doc_a"), col("n").as("size_a")), "doc_a")
        .join(groups.select(col("rep").as("doc_b"), col("n").as("size_b")), "doc_b")
        .select("doc_a", "doc_b", "hamming", "size_a", "size_b")
        
    }),
    // 45p — image DEDUP CLUSTERS (the end-to-end multimodal dedup:
    // 45o's pairs closed into groups): connected components over the
    // signature-representative pair graph, reported as cluster id
    // (min rep) + signature count + total image mass. The component
    // iteration runs on the REP graph (signature-domain-sized, ≪
    // corpus); image mass joins back from the group table.
    "mm_image_dedup_cluster" -> ((s, dir) => {
      import s.implicits._
      import graft.multimodal.Multimodal
      val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, Multimodal.synthGray8x8(id))))
        .toDF("doc_id", "payload")
      val groups = payloads.select(col("doc_id"),
          shiftleft(Multimodal.aHashHalf(col("payload"), 32), 32)
            .bitwiseOR(Multimodal.aHashHalf(col("payload"), 0)).as("sig"))
        .groupBy("sig").agg(min("doc_id").as("rep"), count(lit(1)).as("n"))
        .localCheckpoint()
      val pairs = Dedup.hammingPairs(
        groups.select(col("rep").as("doc"), col("sig")),
        sigBits = 64, maxHamming = 7, maxBucket = 1L << 20)
      Dedup.connectedComponents(
          groups.select(col("rep").as("doc_id")), "doc_id",
          pairs.select("doc_a", "doc_b"), "doc_a", "doc_b")
        .join(groups.select(col("rep").as("doc_id"), col("n")), "doc_id")
        .groupBy("component")
        .agg(count(lit(1)).as("n_sigs"), sum("n").as("n_images"))
        
    }),
    // 45m — per-CHANNEL pixel normalization constants (the
    // dataset-level mean/variance every vision pipeline computes once
    // — the "ImageNet mean/std" numbers baked into preprocessing):
    // channel-planar RGB rasters, exact integer first/second moments
    // per channel via the native raster folds (one byte pass each),
    // variance from the moment identity n·Σx²−(Σx)² carried in
    // DECIMAL(38,0) (exact past 10⁹ images where long products
    // overflow), ONE double divide at the end. Narrow columnar map →
    // a 3-key rollup: zero joins, the shuffle is 3×tasks partial rows.
    "mm_channel_stats" -> ((s, dir) => {
      import s.implicits._
      import graft.multimodal.Multimodal
      val D38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, Multimodal.synthRgb8x8(id))))
        .toDF("doc_id", "payload")
      val slice = (c: Column) => col("payload").substr(c.cast("int") * lit(64) + lit(1), lit(64))
      val perChan = payloads
        .select(explode(array(lit(0L), lit(1L), lit(2L))).as("channel"), col("payload"))
        .select(col("channel"),
          Multimodal.rasterSum(slice(col("channel")), 64).as("s"),
          Multimodal.rasterSumSq(slice(col("channel")), 64).as("q"))
      perChan.groupBy("channel")
        .agg((count(lit(1)) * 64).as("n_px"),
          sum("s").cast("long").as("sum_px"),
          sum("q").cast("long").as("sumsq_px"))
        .select(col("channel"), col("n_px"), col("sum_px"), col("sumsq_px"),
          fp(col("sum_px").cast("double") / col("n_px").cast("double"), 4).as("mean_fp4"),
          fp((col("n_px").cast(D38) * col("sumsq_px").cast(D38) -
              col("sum_px").cast(D38) * col("sum_px").cast(D38)).cast("double") /
             (col("n_px").cast("double") * col("n_px").cast("double")), 4).as("var_fp4"))
        
    }),
    // 45j — image RESIZE (the decode→resize→featurize pipeline's
    // middle stage, named by the brief): integer box-filter 2×
    // downsample over the same synthetic 8×8 rasters as 45e — each
    // 2×2 block floor-averages to one output pixel via
    // [[Multimodal.boxDownsample8]] (shift arithmetic, no float
    // taps), one row per output pixel. The oracle recomputes every
    // pixel closed-form from doc_id (the synthGray8x8 formula), so
    // any drift in offset math, the unsigned-byte read, or the floor
    // mean hash-mismatches. Pure narrow map + posexplode — zero data
    // shuffles, resize at 100 TB is a projection.
    "mm_image_resize" -> ((s, dir) => {
      import s.implicits._
      import graft.multimodal.Multimodal
      val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, Multimodal.synthGray8x8(id))))
        .toDF("doc_id", "payload")
      payloads
        .select(col("doc_id"), posexplode(Multimodal.boxDownsample8(col("payload"))))
        .toDF("doc_id", "pos", "px")
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("px"))
        
    }),
    // 32d — cross-document SEGMENT-level dedup (Lee et al. 2022
    // granularity): consecutive 8-token segments occurring in >= 2
    // docs are stripped and the text reassembled. An 8-token
    // boilerplate header is planted on every third doc so the
    // common-segment path provably fires at every SF.
    "dd_segment_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("aug",
          when(col("doc_id") % 3 === 0,
            concat(lit("terms of service apply all rights reserved worldwide "), col("text")))
          .otherwise(col("text")))
      Dedup.segmentDedup(docs, "doc_id", "aug", k = 8, threshold = 2)
        
    }),
    // 41g — token-window chunking (context-window prep): 16-token
    // windows advancing by 12 (4-token overlap), one row per chunk
    "txt_chunk" -> ((s, dir) => {
      graft.text.Chunker.chunk(t(s, dir, "documents"), "doc_id", "text",
        window = 16, stride = 12)
        
    }),
    // 46 — domain mixing: stratified hash-deterministic sampling with
    // per-source rates and unbiased 1/rate weights (no rand() — the
    // keep decision is a pure function of the id, so task retries and
    // reruns agree)
    "smp_sample" -> ((s, dir) => {
      graft.sample.Sampling.stratifiedSample(
        t(s, dir, "documents").select("doc_id", "source"), "doc_id", "source",
        rates = Map("src0" -> 1.0, "src1" -> 1.0, "src2" -> 0.5, "src3" -> 0.5, "src4" -> 0.5),
        defaultRate = 0.25)
}),
    // 46k — WEIGHT-proportional sampling without replacement
    // (sequential Poisson / priority sampling, Ohlsson 1998;
    // Duffield–Lund–Thorup 2007): priority q = w/u, top-k by q —
    // length-biased doc selection with a FIXED sample size (rate
    // sampling can't pin the count). Narrow priority computation +
    // TakeOrderedAndProject; the single division is IEEE-identical on
    // both engines so the selected set replicates bit-for-bit
    "smp_weighted" -> ((s, dir) => {
      graft.sample.Sampling.prioritySample(
        t(s, dir, "documents").select("doc_id", "source", "n_chars"),
        "doc_id", "n_chars", k = 100)
        .select(col("doc_id"), col("source"), col("n_chars"),
          fp(col("_prio"), 4).as("prio_fp4"))
        
    }),
    // 46e — deterministic disjoint train/val/test split: md5-uniform
    // vs cumulative dyadic bounds, every row in exactly one split,
    // rerun/retry/partitioning-stable; zero shuffle
    "smp_split" -> ((s, dir) => {
      graft.sample.Sampling.split(
        t(s, dir, "documents").select("doc_id", "source"), "doc_id",
        Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
        
    }),
    // 46n — deterministic k-FOLD cross-validation assignment (the
    // eval-protocol twin of 46e's single split): fold = floor(u·5)
    // over the md5-uniform — fold f's train set is "fold != f",
    // recomputable anywhere without materializing 5 corpus copies;
    // zero shuffle
    "smp_kfold" -> ((s, dir) => {
      graft.sample.Sampling.kfold(
        t(s, dir, "documents").select("doc_id", "source"), "doc_id", k = 5)
        
    }),
    // 46o — CURRICULUM staging (shortest-first curriculum learning —
    // the canonical length-ordered baseline): docs bucket into 3
    // stages by EXACT corpus terciles of n_chars. Thresholds come
    // from the compressed-histogram rank scan (the ev_percentile
    // discipline — the window runs over DISTINCT lengths, value-
    // domain-bounded, never corpus rows), broadcast back as one row;
    // stage assignment is a narrow map, the report a 3-row rollup.
    "smp_curriculum" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("n_chars"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      val h = docs.groupBy("n_chars").agg(count(lit(1)).as("k")).localCheckpoint()
      val tot = h.agg(sum("k").as("n")) // corpus count from the histogram — no extra scan
      val wc = Window.orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val thr = h.withColumn("cum", sum("k").over(wc))
        .crossJoin(broadcast(tot))
        .agg(min(when(col("cum") >= expr("(n + 2) DIV 3"), col("n_chars"))).as("t1"),
          min(when(col("cum") >= expr("(2 * n + 2) DIV 3"), col("n_chars"))).as("t2"))
      docs.crossJoin(broadcast(thr))
        .withColumn("stage",
          when(col("n_chars") <= col("t1"), 1)
            .when(col("n_chars") <= col("t2"), 2).otherwise(3))
        .groupBy("stage")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"),
          min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
        
    }),
    // 46f — budget-bounded corpus selection: best docs (longest,
    // id tiebreak) kept while the running token total stays within
    // budget — a global ordered cumsum WITHOUT a single-task window
    // (range repartition + broadcast prefix offsets)
    "smp_budget" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      graft.sample.Sampling.budgetSelect(docs, "doc_id", "n_chars", "n_tokens", budget = 20000L)
        
    }),
    // 46g — domain-MIXTURE selection: per-source budget-bounded pick
    // (mixture weight × total budget resolved to per-source token
    // budgets; src4 has no entry and drops — the unknown-stratum
    // contract). budgetSelect's no-single-task-cumsum shape applied
    // per stratum in ONE pass: offsets keyed by (partition, stratum),
    // broadcast-joined back
    "smp_mix" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      graft.sample.Sampling.mixBudgetSelect(docs, "doc_id", "n_chars", "n_tokens", "source",
        budgets = Map("src0" -> 8000L, "src1" -> 6000L, "src2" -> 4000L, "src3" -> 2000L))
        
    }),
    // 46h — temperature-scaled source sampling (α=0.5, the mBERT/
    // XLM-R multilingual mixing rule): keep-rates ∝ √n_i/n_i toward a
    // target total, flattening the source distribution. √n quantized
    // fp6 BEFORE the integer normalizer sum, so rates and the kept
    // set are engine-exact; sampling is the narrow hash-deterministic
    // filter — zero corpus shuffle
    "smp_temperature" -> ((s, dir) => {
      graft.sample.Sampling.temperatureSample(
        t(s, dir, "documents").select("doc_id", "source"), "doc_id", "source",
        targetTotal = 200L)
        
    }),
    // 46c — exact-k-per-stratum deterministic reservoir: fixed sample
    // sizes (vs smp_sample's fixed rates), ranked on the md5-uniform
    // so the choice is rerun- and partitioning-stable
    "smp_reservoir" -> ((s, dir) => {
      graft.sample.Sampling.reservoirPerStratum(
        t(s, dir, "documents").select("doc_id", "source"), "doc_id", "source", k = 5)
        
    }),
    // 46b — sequence packing: next-fit documents into 256-token
    // training bins across 8 independent packing groups (one shuffle,
    // spillable sort, streaming fold — per-task state is three longs)
    "smp_pack" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          size(graft.text.TextAnalysis.tokens(col("text"))).as("n_toks"))
      graft.sample.Sampling.packNextFit(s, docs, "doc_id", "n_toks",
        budget = 256L, numGroups = 8)
        
    }),
    // 46p — LENGTH-BUCKET batching waste report (the seq-len
    // bucketing trick: batch docs padded to power-of-two caps; how
    // many pad tokens does each bucket burn?): cap = 2^⌈log2 n⌉ via
    // the length(bin(n−1)) integer trick (the ev_interarrival HLL-ρ
    // idiom — no libm), waste = n_docs·cap − Σn. One narrow map +
    // one ≤64-bucket rollup; waste_fp4 in pure integer form.
    "smp_length_buckets" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
        .withColumn("cap",
          when(col("n") <= 1L, lit(1L))
            .otherwise(expr("shiftleft(CAST(1 AS BIGINT), CAST(length(bin(n - 1)) AS INT))")))
        .groupBy("cap")
        .agg(count(lit(1)).as("n_docs"), sum("n").as("real_tokens"))
        .withColumn("padded_tokens", col("n_docs") * col("cap"))
        .withColumn("waste_fp4",
          expr("((padded_tokens - real_tokens) * 20000 + padded_tokens) DIV (2 * padded_tokens)"))
        
    }),
    // 32f — content-defined chunking (rsync/LBFS window-hash cuts):
    // boundaries are a function of local content, so chunk-hash dedup
    // re-synchronizes on shifted duplicates where fixed-offset
    // chunking never re-aligns. Narrow map + explode — zero shuffles
    "dd_cdc_chunks" -> ((s, dir) => {
      graft.text.Chunker.cdcChunk(t(s, dir, "documents"), "doc_id", "text",
        window = 8, divisor = 64)
        
    }),
    // 41h — URL canonicalization (Common-Crawl-style pre-dedup key):
    // synthetic URLs derived from doc_id exercise every rule — case,
    // www, default port, trailing slash, utm params, fragment. All
    // codegen'd regexp/HOF columns, no backreferences (text/UrlOps)
    "txt_url_normalize" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), synthUrl(col("doc_id")).as("url"))
        .withColumn("norm_url", graft.text.UrlOps.normalizeUrl(col("url")))
        
    }),
    // 31c — URL-level dedup on the canonical key: spelled-differently
    // duplicates collapse; keep min doc id + variant count (one
    // partial-agg shuffle on the normalized key)
    "dd_url_dedup" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), graft.text.UrlOps.normalizeUrl(synthUrl(col("doc_id"))).as("norm_url"))
        .groupBy("norm_url")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_variants"))
        
    }),
    // 46d — deterministic global shuffle into training shards: md5
    // bucket + rank by full md5 hex — rerun/retry/partitioning-stable
    // where orderBy(rand()) is none of those
    "smp_shuffle" -> ((s, dir) => {
      graft.sample.Sampling.deterministicShuffle(
        t(s, dir, "documents").select("doc_id"), "doc_id", numShards = 8)
        
    }),
    // 39c — token-entropy quality signal (Shannon over the per-doc
    // token histogram). Two partial-agg shuffles: (doc, token) counts,
    // then per-doc H = log2(n) - (Σ c·log2 c)/n. The inner Σ is over
    // fp6-QUANTIZED bigints — a double sum's fold order would differ
    // between engines; the outer formula then divides exact ints in
    // one fixed double op order (same ln-at-fp4 contract as tfidf).
    "txt_entropy" -> ((s, dir) => {
      val tf = t(s, dir, "documents")
        .select(col("doc_id"), explode(graft.text.TextAnalysis.tokens(col("text"))).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      val ent = tf.groupBy("doc_id").agg(
        sum("c").as("n"),
        sum(fp(col("c").cast("double") * log2(col("c").cast("double")), 6)).as("s6"))
      t(s, dir, "documents").select("doc_id")
        .join(ent, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n"),
          fp(log2(col("n").cast("double")) - col("s6").cast("double") / 1e6 / col("n").cast("double"), 4)
            .as("entropy_fp4"))
        
    }),
    // 43q — per-type daily-volume least-squares trend (ingest drift:
    // is a source growing or decaying?). x = epoch day, y = daily
    // count. ONE corpus scan → |types×days|-sized rollup → per-type
    // agg (a first cut shifted x by each type's first day through a
    // broadcast join — but the slope is shift-invariant and the
    // normal-equation combination is EXACT in DECIMAL(38,0), so the
    // shift only bought a second corpus scan when ReuseExchange
    // declined the pruning-divergent rollup consumers). slope =
    // (n·Σxy − Σx·Σy)/(n·Σxx − Σx²), one final double divide, fp6.
    "ev_trend" -> ((s, dir) => {
      val D = org.apache.spark.sql.types.DecimalType(38, 0)
      val d = ev(s, dir)
        .groupBy(col("event_type"), expr("ms DIV 86400000").as("day"))
        .agg(count(lit(1)).as("y"))
      val sums = d.groupBy("event_type").agg(
        count(lit(1)).as("n_days"), sum("y").as("total"),
        sum(col("day").cast(D)).as("_sx"),
        sum((col("day") * col("day")).cast(D)).as("_sxx"),
        sum((col("day") * col("y")).cast(D)).as("_sxy"))
      val nD = col("n_days").cast(D)
      val den = nD * col("_sxx") - col("_sx") * col("_sx")
      sums.select(col("event_type"), col("n_days"), col("total"),
          when(den === 0, lit(0L))
            .otherwise(fp((nD * col("_sxy") - col("_sx") * col("total").cast(D)).cast("double")
              / den.cast("double"), 6))
            .as("slope_fp6"))
        
    }),
    // 43r — top session path trigrams (the user-journey n-gram
    // profile funnel design starts from): consecutive in-session
    // event-type triples per user via two lags over the per-user
    // time order (ties broken by unique event_id), both gaps bound
    // by the 6h session rule. The path domain is |types|³-bounded,
    // so the count rollup and the global top-20 (TakeOrdered, ties
    // to path asc) stay tiny no matter the corpus size.
    "ev_path_trigrams" -> ((s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy("ms", "event_id")
      ev(s, dir)
        .withColumn("p1", lag("event_type", 1).over(byUser))
        .withColumn("p2", lag("event_type", 2).over(byUser))
        .withColumn("m1", lag("ms", 1).over(byUser))
        .withColumn("m2", lag("ms", 2).over(byUser))
        .filter(col("p2").isNotNull &&
          col("ms") - col("m1") <= SessionGapMs && col("m1") - col("m2") <= SessionGapMs)
        .select(concat_ws(">", col("p2"), col("p1"), col("event_type")).as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("path")).limit(20)
    }),
    // 35g — per-dimension whitening stats (the mean/variance pass a
    // 100 TB embedding corpus runs before feature scaling or PCA):
    // one posexplode → per-dim rollup. Values quantize to fp6 longs
    // FIRST so the sums are exact integers (a double sum's fold
    // order differs across engines/retries); squares accumulate in
    // DECIMAL(38,0) — 10^9 vectors × (10^6)² per-row squares
    // overflows int64 but not decimal128. Mean and variance are
    // then fixed-order double expressions over the exact sums.
    "emb_norm_stats" -> ((s, dir) => {
      val q = t(s, dir, "embeddings")
        .select(posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("dim"), fp(col("v").cast("double"), 6).as("q6"))
      val mean = col("_s6").cast("double") / 1e6 / col("n").cast("double")
      q.groupBy("dim").agg(
          count(lit(1)).as("n"), sum("q6").as("_s6"),
          sum((col("q6") * col("q6")).cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("_ss12"))
        .select(col("dim"), col("n"), fp(mean, 6).as("mean_fp6"),
          fp(col("_ss12").cast("double") / 1e12 / col("n").cast("double") - mean * mean, 6)
            .as("var_fp6"))
        
    }),
    // 35h — distributed power-iteration PCA: the top principal
    // component of the embedding corpus (the direction PCA-whitening
    // and anisotropy diagnostics start from). Two corpus passes:
    // (1) the 64×64 Gram matrix via a per-row outer-product explode
    // that collapses map-side to 4096 cells, (2) per-dim sums + n.
    // Covariance cells n·Σqᵢqⱼ − MᵢMⱼ are EXACT in DECIMAL(38,0)
    // (≤10³⁰ at 10⁹ vectors), checkpointed (the markov-rank idiom —
    // otherwise every iteration replays the corpus), then 4 unrolled
    // power iterations over the 4096-cell frame: w = C·v in exact
    // decimal products (≤6.4·10³⁷ < 10³⁸ at corpus scale, documented
    // bound), L∞ normalization (no sqrt — max|w| keeps the step
    // rational) with ONE correctly-rounded double divide per element,
    // fp6-requantized. Sign pinned by the all-ones start vector.
    "emb_pca_power" -> ((s, dir) => {
      val q = t(s, dir, "embeddings")
        .select(transform(col("embedding"), x => fp(x.cast("double"), 6)).as("qv"))
      // ONE corpus pass through the native exact Gram aggregate
      // (optimization round 18), down from two explode passes + ~12
      // tiny iteration jobs:
      //  - graft_gram_agg folds each row's 64·65/2 = 2080 upper-
      //    triangle products (the matrix is symmetric — cell (j,i) is
      //    the SAME multiset of products as (i,j)), the per-dim sums
      //    Mᵢ and the row count n in a tight primitive loop with
      //    BigInteger overflow spill — exact at any corpus size, and
      //    the same integers the previous posexplode(4096 products) →
      //    DECIMAL(38,0) hash-aggregate produced (integer
      //    multiplication commutes; the accumulation is exact), minus
      //    the 4096-rows-per-vector Generate the aggregate had to eat.
      //  - the 4 power iterations run on the DRIVER over the collected
      //    4096-cell covariance (driver-sized like the collected IVF
      //    centroid / PQ codebook tables) in exact BigInt arithmetic —
      //    IDENTICAL numbers to the previous DECIMAL(38,0) dataframe
      //    iterations (≤6.4·10³⁷ < 10³⁸ documented bound; same
      //    double-divide + fp6 requantization per element, sign pinned
      //    by the all-ones start) without their per-iteration
      //    checkpoint/broadcast jobs. The distributed part is exactly
      //    the one corpus-sized aggregation; everything after is a
      //    64×64 problem. The DuckDB oracle is unchanged — it verifies
      //    the VALUES, which no regrouping of exact sums can move.
      val D2 = 64
      val g = q.agg(call_function("graft_gram_agg", col("qv"), lit(D2)).as("g"))
        .select(col("g.n").as("n"), col("g.m").as("m"), col("g.s").as("s"))
        .head()
      val nRows = g.getLong(0)
      val outSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("dim", org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("pc1_fp6", org.apache.spark.sql.types.LongType, nullable = false)))
      val outRows =
        if (nRows == 0) Seq.empty[org.apache.spark.sql.Row]
        else {
          val n = BigInt(nRows)
          val m = g.getSeq[java.math.BigDecimal](1).map(b => BigInt(b.toBigInteger)).toArray
          val sTri = g.getSeq[java.math.BigDecimal](2).map(b => BigInt(b.toBigInteger)).toArray
          def sAt(i0: Int, j0: Int): BigInt = {
            val (i, j) = (math.min(i0, j0), math.max(i0, j0))
            sTri(i * D2 - i * (i - 1) / 2 + (j - i))
          }
          val cov = Array.tabulate(D2, D2)((i, j) => n * sAt(i, j) - m(i) * m(j))
          var v = Array.fill(D2)(BigInt(1000000))
          for (_ <- 1 to 4) {
            val w = Array.tabulate(D2)(i => (0 until D2).map(j => cov(i)(j) * v(j)).sum)
            val mx = w.map(_.abs).max
            v = if (mx == 0) Array.fill(D2)(BigInt(1000000))
              else w.map(wi => BigInt(math.floor(wi.toDouble / mx.toDouble * 1e6 + 0.5).toLong))
          }
          (0 until D2).map(i => org.apache.spark.sql.Row(i, v(i).toLong))
        }
      s.createDataFrame(java.util.Arrays.asList(outRows: _*), outSchema)
    }),
    // 39d — Zipf rank-frequency fit over the corpus vocabulary: the
    // one-line health check of a text corpus (natural language sits
    // near slope −1 in log-log; templated/boilerplate corpora don't).
    // Vocab rollup → global top-256 by (freq desc, tok) — a
    // TakeOrdered over the value-domain-bounded vocab table, never a
    // corpus sort. log2 per row (the engine-shared log from
    // txt_entropy), fp6-quantized so the four regression sums are
    // exact integers; the normal-equation combination runs in
    // DECIMAL(38,0) (n·Σxy at corpus scale exceeds int64) with one
    // final double divide per statistic.
    // 41s — VOCABULARY coverage curve (tokenizer-budget selection:
    // what fraction of corpus token OCCURRENCES does a top-k vocab
    // cover?): one token rollup, top-1024 via TakeOrdered (never a
    // corpus- or vocab-sized sort), the four k-levels evaluated as a
    // tiny explode + filter + rollup over that bounded head. coverage
    // = ⌊covered/total·10⁶+0.5⌉ in pure integer form.
    "txt_vocab_coverage" -> ((s, dir) => {
      val vocab = t(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("f"))
      val tot = vocab.agg(sum("f").as("total"))
      val head = vocab.orderBy(desc("f"), asc("tok")).limit(1024)
        .withColumn("rank", row_number().over(Window.orderBy(desc("f"), asc("tok"))))
      head.select(col("f"), col("rank"),
          explode(typedLit(Seq(16, 64, 256, 1024))).as("k"))
        .filter(col("rank") <= col("k"))
        .groupBy("k").agg(sum("f").as("covered"))
        .crossJoin(broadcast(tot))
        .select(col("k"),
          col("covered"),
          expr("(covered * 2000000 + total) DIV (2 * total)").as("coverage_fp6"))
        
    }),
    "txt_zipf" -> ((s, dir) => {
      val D = org.apache.spark.sql.types.DecimalType(38, 0)
      val ranked = t(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("f"))
        .orderBy(desc("f"), asc("tok")).limit(256)
        .withColumn("rank", row_number().over(Window.orderBy(desc("f"), asc("tok"))))
        .select(fp(log2(col("rank").cast("double")), 6).as("x6"),
          fp(log2(col("f").cast("double")), 6).as("y6"))
      val sums = ranked.agg(count(lit(1)).as("k"),
        sum("x6").as("_sx"), sum("y6").as("_sy"),
        sum(col("x6") * col("x6")).as("_sxx"), sum(col("x6") * col("y6")).as("_sxy"))
      val (n, sx, sy, sxx, sxy) = (col("k").cast(D), col("_sx").cast(D),
        col("_sy").cast(D), col("_sxx").cast(D), col("_sxy").cast(D))
      val den = n * sxx - sx * sx
      sums.select(col("k"),
        fp((n * sxy - sx * sy).cast("double") / den.cast("double"), 6).as("slope_fp6"),
        fp((sy * sxx - sx * sxy).cast("double") / den.cast("double") / 1e6, 6).as("intercept_fp6"))
    }),
    // 43s — sampled quantile sketch vs exact: deterministic md5
    // content-hash sampling (rate 1/8 on event_id — commutes with
    // merges/retries where Bernoulli rand() does not) feeding the
    // SAME compressed-histogram rank scan as ev_percentile. ONE
    // histogram pass carries both populations (k total, ks sampled
    // per quantized value), so exact and estimate come from a single
    // corpus shuffle and the sampling error is visible per group.
    "ev_quantile_sketch" -> ((s, dir) => {
      val e = ev(s, dir).select(col("event_type"), col("v4"),
        (conv(substring(md5(concat(lit("qs:"), col("event_id").cast("string"))), 1, 8), 16, 10)
          .cast("long") < 536870912L).cast("long").as("in_s"))
      val h = e.groupBy("event_type", "v4")
        .agg(count(lit(1)).as("k"), sum("in_s").as("ks"))
      val wc = Window.partitionBy("event_type").orderBy("v4")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wt = Window.partitionBy("event_type")
      h.withColumn("cum", sum("k").over(wc)).withColumn("cums", sum("ks").over(wc))
        .withColumn("n", sum("k").over(wt)).withColumn("ns", sum("ks").over(wt))
        .groupBy("event_type")
        .agg(max("n").cast("long").as("n_rows"), max("ns").cast("long").as("n_sample"),
          min(when(col("cum") >= expr("(n + 1) DIV 2"), col("v4"))).as("p50_c4"),
          min(when(col("cum") >= expr("(9 * n + 9) DIV 10"), col("v4"))).as("p90_c4"),
          min(when(col("cums") >= expr("(ns + 1) DIV 2"), col("v4"))).as("s50_c4"),
          min(when(col("cums") >= expr("(9 * ns + 9) DIV 10"), col("v4"))).as("s90_c4"))
        
    }),
    // 44c — bucketed-table co-located join (the 100 TB fact-join
    // layout: both sides pre-bucketed AND sorted on the join key, so
    // the sort-merge join needs NO shuffle and NO sort at read time
    // — write-once, join-many). The merge hint pins SMJ (a broadcast
    // at toy SF would hide the property being demonstrated);
    // QueriesSpec asserts the joined plan has zero exchanges.
    "src_bucketed_join" -> ((s, dir) => {
      // overwrite alone is not idempotent across JVMs: the in-memory
      // catalog forgets the table but its warehouse directory
      // survives, and saveAsTable refuses the orphaned location —
      // drop both before writing
      Seq("graft_b_orders", "graft_b_lineitem").foreach { tbl =>
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        val whBase = s.conf.get("spark.sql.warehouse.dir")
        val basePath =
          if (whBase.startsWith("file:")) new java.net.URI(whBase).getPath else whBase
        val wh = java.nio.file.Paths.get(basePath, tbl)
        if (java.nio.file.Files.exists(wh)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(wh).iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
        }
      }
      t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_b_orders")
      t(s, dir, "lineitem").select("l_orderkey", "l_quantity", "l_extendedprice")
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_b_lineitem")
      s.table("graft_b_orders").hint("merge")
        .join(s.table("graft_b_lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum(fp(col("l_quantity"), 2)).cast("long").as("sum_qty_c"),
          sum(fp(col("l_extendedprice"), 2)).cast("long").as("sum_price_c"))
        
    }),
    // 44d — CDC changelog apply (the MERGE INTO / upsert shape every
    // incremental 100 TB snapshot pipeline needs): a deterministic
    // changelog of I/U/D ops derives from lineitem (op and key from
    // l_linenumber residues — inserts get keys offset past the base
    // key range, updates/deletes hit real orders; seq = l_linenumber,
    // unique per key) and is applied to the orders base snapshot.
    // The changelog's (key, seq) is NOT unique (the synthetic
    // lineitem has duplicate (orderkey, linenumber) rows), so
    // latest-wins needs a TOTAL order: the whole (seq, payload)
    // packs into one long — seq·2³⁵ + cents, ·4 + op rank, ·4 + flag
    // rank — and compaction is a SINGLE per-key max() hash agg (one
    // shuffle, map-side combine, no join-back, no window sort); the
    // winner's op and payload decode back out of the long. Then ONE
    // key-partitioned full-outer merge: base-only rows survive, op=D
    // drops, op=I/U takes the changelog payload. At scale the base
    // side would be bucketed on key (src_bucketed_join demonstrates
    // that layout) so only the changelog shuffles.
    "src_cdc_apply" -> ((s, dir) => {
      val base = t(s, dir, "orders").select(col("o_orderkey").as("key"),
        col("o_orderstatus").as("status"), fp(col("o_totalprice"), 2).as("total_c"))
      val li = t(s, dir, "lineitem")
      val chg = li.select(
        when(pmod(col("l_linenumber"), lit(3)) === 2, col("l_orderkey") + 600000000L)
          .otherwise(col("l_orderkey")).as("key"),
        (((col("l_linenumber").cast("long") * 34359738368L +
            fp(col("l_extendedprice"), 2)) * 4 +
          pmod(col("l_linenumber"), lit(3)).cast("long")) * 4 +
          when(col("l_returnflag") === "A", 0L)
            .when(col("l_returnflag") === "N", 1L).otherwise(2L)).as("packed"))
      val latest = chg.groupBy("key").agg(max("packed").as("p"))
        .select(col("key"),
          when(pmod(expr("p DIV 4"), lit(4)) === 0, "D")
            .when(pmod(expr("p DIV 4"), lit(4)) === 1, "U").otherwise("I").as("op"),
          when(pmod(col("p"), lit(4)) === 0, "A")
            .when(pmod(col("p"), lit(4)) === 1, "N").otherwise("R").as("new_status"),
          pmod(expr("p DIV 16"), lit(34359738368L)).as("new_total_c"))
      base.join(latest, Seq("key"), "full_outer")
        .where(col("op").isNull || col("op") =!= "D")
        .select(col("key"),
          when(col("op").isNull, col("status")).otherwise(col("new_status"))
            .as("status"),
          when(col("op").isNull, col("total_c")).otherwise(col("new_total_c"))
            .as("total_c"))
        
    }),
    // 44f — Z-ORDER clustering stats (the Delta/Iceberg OPTIMIZE
    // ZORDER layout, made verifiable): every row's (x, y) dims
    // interleave into a Morton code with the classic 4-step bit
    // spread (pure codegen'd long shifts/masks — identical arithmetic
    // in the SQL oracle), rows bucket by the code's high bits, and
    // the output is each bucket's bounding box + count — i.e. the
    // min/max MANIFEST a file-skipping reader would consult. The
    // same scan ALSO emits the naive linear-sort layout (bucket by x
    // alone) via a 2-element explode, so one query shows WHY z-order
    // wins: z-buckets have tiles ≤ 1/16 of the domain on BOTH dims
    // (spec-asserted), linear buckets span the full y domain — a
    // 2-dim probe skips ~15/16 of z-ordered files and almost nothing
    // of linearly-sorted ones. Scale: narrow map + one 512-key
    // partial agg; at 100 TB the bucket id becomes the
    // repartitionByRange key at write time and this query IS the
    // manifest build.
    "src_zorder" -> ((s, dir) => {
      def spread(c: Column): Column = {
        val a = c.bitwiseAND(lit(4095L))
        val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
        val d = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
        val e = d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(0x33333333L))
        e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(0x55555555L))
      }
      // multiplicative hash-spread so both dims fill the 4096 domain
      // at every SF (raw keys are dense near 0 at small SF, which
      // would make any layout look clustered)
      val li = t(s, dir, "lineitem").select(
        pmod(col("l_partkey") * 2654435761L, lit(4096L)).as("x"),
        pmod(col("l_suppkey") * 2246822519L, lit(4096L)).as("y"))
      val z = spread(col("x")).bitwiseOR(shiftleft(spread(col("y")), 1))
      li.select(col("x"), col("y"), explode(array(
          struct(lit("zorder").as("layout"), shiftright(z, 16).as("bucket")),
          struct(lit("linear").as("layout"), shiftright(col("x"), 4).as("bucket"))))
          .as("lb"))
        .groupBy(col("lb.layout").as("layout"), col("lb.bucket").as("bucket"))
        .agg(count(lit(1)).as("n"),
          min("x").as("x_min"), max("x").as("x_max"),
          min("y").as("y_min"), max("y").as("y_max"))
        
    }),
    // 44i — small-file COMPACTION planner (the OPTIMIZE/maintenance
    // pass every long-lived 100 TB table needs): daily ingest
    // partitions become the file inventory (bytes = rows × 128 row
    // proxy), files below the DATA-DERIVED mean are coalesced into
    // ~4×-mean target bins by sequential prefix-sum grouping within
    // their month group, big files pass through untouched (bin −1).
    // The cumsum windows run over month-sized slices — never a
    // corpus-wide single task; the 1-row mean broadcasts.
    "src_compaction" -> ((s, dir) => {
      val o0 = t(s, dir, "orders")
      val dayMs = 86400000L
      val files = o0.select(tsMs(o0, "o_orderdate").as("ms"))
        .withColumn("day", expr(s"(ms - pmod(ms, $dayMs)) DIV $dayMs"))
        .groupBy("day").agg((count(lit(1)) * lit(128L)).as("bytes"))
        .withColumn("grp", expr("day DIV 32"))
        // inventory-sized and consumed 3× (mean, small, big) — pin it
        // so the corpus day-rollup runs once
        .localCheckpoint()
      val stats = files.agg(expr("sum(bytes) DIV count(1)").as("avg_bytes"))
      val withAvg = files.crossJoin(broadcast(stats))
      val w = Window.partitionBy("grp").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val small = withAvg.filter(col("bytes") < col("avg_bytes"))
        .withColumn("pre", sum("bytes").over(w) - col("bytes"))
        .withColumn("bin", expr("pre DIV (4 * avg_bytes)"))
      val big = withAvg.filter(col("bytes") >= col("avg_bytes"))
        .withColumn("bin", lit(-1L))
      small.select("grp", "bin", "bytes").unionByName(big.select("grp", "bin", "bytes"))
        .groupBy("grp", "bin")
        .agg(count(lit(1)).as("n_files"), sum("bytes").as("tot_bytes"))
        
    }),
    // 44j — zone-map (min/max stats) PRUNING audit: how many files
    // does a shipdate-quarter predicate skip under two layouts of the
    // SAME rows — insert-ordered files (orderkey ranges; date
    // locality only by accident) vs date-partitioned files (weekly)?
    // The data-skipping effectiveness report behind every "why
    // cluster/z-order" decision (44f src_zorder profiles the layouts
    // themselves; this prices them against a predicate). Per-file
    // min/max/counts collapse map-side; the file-stats table is
    // inventory-sized, the final rollup 2 rows.
    "src_stats_pruning" -> ((s, dir) => {
      val l0 = t(s, dir, "lineitem")
      val dayMs = 86400000L
      val lo = 883612800000L // 1998-01-01
      val hi = 899251200000L // 1998-07-01
      val base = l0.select(col("l_orderkey"), tsMs(l0, "l_shipdate").as("ms"))
        .withColumn("day", expr(s"(ms - pmod(ms, $dayMs)) DIV $dayMs"))
      val layouts = base.select(explode(array(
          struct(lit("insert_order").as("layout"), expr("l_orderkey DIV 200").as("fid")),
          struct(lit("date_partitioned").as("layout"), expr("day DIV 7").as("fid")))).as("lf"),
        col("ms"))
      layouts.groupBy(col("lf.layout").as("layout"), col("lf.fid").as("fid"))
        .agg(min("ms").as("mn"), max("ms").as("mx"), count(lit(1)).as("n"),
          sum(when(col("ms") >= lo && col("ms") < hi, 1L).otherwise(0L)).as("nm"))
        .groupBy("layout")
        .agg(count(lit(1)).as("n_files"),
          sum(when(col("mx") < lo || col("mn") >= hi, 1L).otherwise(0L)).as("n_pruned"),
          sum(when(col("mx") >= lo && col("mn") < hi, col("n")).otherwise(0L)).as("rows_scanned"),
          sum("nm").as("rows_matched"))
        
    }),
    // 48m — TTL / retention DELETE planner (the GDPR-expiry twin of
    // 48l's scan audit — deletes are priced differently: an all-
    // expired file DROPS for free, a mixed file REWRITES every
    // surviving row): per layout, files fully dropped vs rewritten
    // vs untouched, rows deleted vs rewritten, for a shipdate <
    // 1997-01-01 expiry. Same inventory-sized per-file stats agg as
    // the pruning audit; the quantified case for date-partitioning
    // a table that carries a retention policy.
    "src_ttl_retention" -> ((s, dir) => {
      val l0 = t(s, dir, "lineitem")
      val dayMs = 86400000L
      val cut = 852076800000L // 1997-01-01
      val base = l0.select(col("l_orderkey"), tsMs(l0, "l_shipdate").as("ms"))
        .withColumn("day", expr(s"(ms - pmod(ms, $dayMs)) DIV $dayMs"))
      val layouts = base.select(explode(array(
          struct(lit("insert_order").as("layout"), expr("l_orderkey DIV 200").as("fid")),
          struct(lit("date_partitioned").as("layout"), expr("day DIV 7").as("fid")))).as("lf"),
        col("ms"))
      layouts.groupBy(col("lf.layout").as("layout"), col("lf.fid").as("fid"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("ms") < cut, 1L).otherwise(0L)).as("nexp"))
        .groupBy("layout")
        .agg(count(lit(1)).as("n_files"),
          sum(when(col("nexp") === col("n"), 1L).otherwise(0L)).as("n_drop"),
          sum(when(col("nexp") > 0 && col("nexp") < col("n"), 1L).otherwise(0L)).as("n_rewrite"),
          sum(when(col("nexp") === 0, 1L).otherwise(0L)).as("n_keep"),
          sum("nexp").as("rows_deleted"),
          sum(when(col("nexp") > 0, col("n") - col("nexp")).otherwise(0L)).as("rows_rewritten"))
        
    }),
    // 44h — INCREMENTAL VIEW MAINTENANCE: the law that makes 100 TB
    // aggregates maintainable — agg(apply(base, Δ)) must equal
    // merge(agg(base), agg(Δ)). The per-status (count, sum) view is
    // maintained by DELTAS from the compacted changelog (D/U remove
    // the old row's contribution — found by joining latest changes
    // to the base, changelog-sized — U/I add the new payload's),
    // and the INDEPENDENTLY recomputed aggregate over the fully
    // merged snapshot is emitted side by side; the oracle computes
    // the view once, so any divergence — a missed retraction, a
    // double-applied insert — hash-mismatches. Full-outer on the
    // group key so a spurious or missing group surfaces as nulls
    // rather than being silently dropped. Scale: the maintenance
    // path touches base ONLY on the changelog's keys (a keyed join,
    // never a base scan at real layout where base aggs are stored);
    // the recompute path exists here to PROVE the law.
    "src_ivm" -> ((s, dir) => {
      val base = t(s, dir, "orders").select(col("o_orderkey").as("key"),
        col("o_orderstatus").as("status"), fp(col("o_totalprice"), 2).as("total_c"))
      val li = t(s, dir, "lineitem")
      val chg = li.select(
        when(pmod(col("l_linenumber"), lit(3)) === 2, col("l_orderkey") + 600000000L)
          .otherwise(col("l_orderkey")).as("key"),
        (((col("l_linenumber").cast("long") * 34359738368L +
            fp(col("l_extendedprice"), 2)) * 4 +
          pmod(col("l_linenumber"), lit(3)).cast("long")) * 4 +
          when(col("l_returnflag") === "A", 0L)
            .when(col("l_returnflag") === "N", 1L).otherwise(2L)).as("packed"))
      val latest = chg.groupBy("key").agg(max("packed").as("p"))
        .select(col("key"),
          when(pmod(expr("p DIV 4"), lit(4)) === 0, "D")
            .when(pmod(expr("p DIV 4"), lit(4)) === 1, "U").otherwise("I").as("op"),
          when(pmod(col("p"), lit(4)) === 0, "A")
            .when(pmod(col("p"), lit(4)) === 1, "N").otherwise("R").as("new_status"),
          pmod(expr("p DIV 16"), lit(34359738368L)).as("new_total_c"))
        .localCheckpoint() // feeds deltas AND the recompute merge
      // maintenance path: retractions + additions, changelog-sized
      val deltas = latest.join(base, Seq("key"), "left")
        .select(explode(array(
          when(col("op").isin("D", "U") && col("status").isNotNull,
            struct(col("status").as("st"), lit(-1L).as("dn"),
              (-col("total_c")).as("dt"))),
          when(col("op").isin("U", "I"),
            struct(col("new_status").as("st"), lit(1L).as("dn"),
              col("new_total_c").as("dt"))))).as("x"))
        .filter(col("x").isNotNull)
        .groupBy(col("x.st").as("status"))
        .agg(sum("x.dn").as("dn"), sum("x.dt").as("dt"))
      val baseAgg = base.groupBy("status")
        .agg(count(lit(1)).as("n0"), sum("total_c").as("t0"))
      val maintained = baseAgg.join(deltas, Seq("status"), "full_outer")
        .select(col("status"),
          (coalesce(col("n0"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_inc"),
          (coalesce(col("t0"), lit(0L)) + coalesce(col("dt"), lit(0L))).as("sum_inc_c"))
        .filter(col("n_inc") =!= 0)
      // recompute path: the full merge (src_cdc_apply), re-aggregated
      val direct = base.join(latest, Seq("key"), "full_outer")
        .where(col("op").isNull || col("op") =!= "D")
        .select(when(col("op").isNull, col("status")).otherwise(col("new_status"))
          .as("status"),
          when(col("op").isNull, col("total_c")).otherwise(col("new_total_c"))
            .as("tc"))
        .groupBy("status")
        .agg(count(lit(1)).as("n_direct"), sum("tc").as("sum_direct_c"))
      maintained.join(direct, Seq("status"), "full_outer")
    }),
    // 44e — SCD type-2 history build from the same changelog as
    // src_cdc_apply: per key, every DISTINCT I/U change becomes a
    // version row; the packed long (seq·2³⁵+cents, ·4+op, ·4+flag) IS
    // the change's total order, so lead(packed) over (key, packed)
    // finds each version's successor — a D successor (or any
    // successor) closes the interval, and is_current marks the last
    // change overall. Shape: one distinct() on the changelog + ONE
    // key shuffle reused by both windows (lead before the D-filter,
    // row_number after — same partitioning, Spark plans a single
    // exchange). Changelog-sized work only; the 100 TB base is never
    // touched — SCD2 is a pure function of the change stream.
    "src_scd2" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val chg = li.select(
        when(pmod(col("l_linenumber"), lit(3)) === 2, col("l_orderkey") + 600000000L)
          .otherwise(col("l_orderkey")).as("key"),
        (((col("l_linenumber").cast("long") * 34359738368L +
            fp(col("l_extendedprice"), 2)) * 4 +
          pmod(col("l_linenumber"), lit(3)).cast("long")) * 4 +
          when(col("l_returnflag") === "A", 0L)
            .when(col("l_returnflag") === "N", 1L).otherwise(2L)).as("packed"))
        .distinct()
      val wAll = Window.partitionBy("key").orderBy("packed")
      val versions = chg
        .withColumn("nxt", lead("packed", 1).over(wAll))
        .where(pmod(expr("packed DIV 4"), lit(4)) =!= 0) // drop D events
        .withColumn("ver", row_number().over(wAll).cast("int"))
        .select(col("key"), col("ver"),
          when(pmod(col("packed"), lit(4)) === 0, "A")
            .when(pmod(col("packed"), lit(4)) === 1, "N").otherwise("R")
            .as("status"),
          pmod(expr("packed DIV 16"), lit(34359738368L)).as("total_c"),
          col("nxt").isNull.cast("long").as("is_current"))
      versions
    }),
    // 38k — class-BALANCED downsampling over the labeled embeddings
    // (imbalance correction: every label keeps exactly k rows where
    // k = the SMALLEST class size, derived from the data via a
    // broadcast 1-row min — the balancing rule itself is part of the
    // operator, unlike smp_reservoir's caller-fixed k). Selection is
    // the deterministic md5-uniform rank (commutes with retries and
    // partitioning, like every smp_* row); the output carries
    // per-label id checksums so the oracle verifies WHICH rows were
    // kept, not just how many. One per-label count agg + one rank
    // window; per-label sorts bounded by class size.
    "smp_balance" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("label"))
        .withColumn("u", graft.sample.Sampling.hashUniform(col("vec_id"), "bal"))
      val k = broadcast(e.groupBy("label").agg(count(lit(1)).as("cn"))
        .agg(min("cn").as("k")))
      val w = Window.partitionBy("label").orderBy(col("u"), col("vec_id"))
      e.withColumn("r", row_number().over(w))
        .crossJoin(k)
        .filter(col("r") <= col("k"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_kept"), sum("vec_id").as("id_sum"),
          fp(max("u"), 6).as("max_u_fp6"))
        
    }),
    // 35j — class-separation diagnostic over the labeled embeddings
    // (the Fisher/ANOVA health check of an embedding space: do the
    // labels cluster?): per label, the mean squared distance of
    // members to their own fp6 centroid (within-class scatter) and
    // the squared distance of that centroid to the global centroid
    // (between-class). Same exact-arithmetic discipline as
    // emb_kmeans — centroids are one rounded double divide from
    // exact integer sums, per-row squared distances are EXACT longs,
    // and the within-class total accumulates in DECIMAL(38,0)
    // (≤ 2.6e23 at 10⁹ vectors — past int64, inside decimal128);
    // only the final mean drops to double, once, identically in both
    // engines. Scale: one posexplode rollup (labels×64 cells) feeds
    // the centroids, one corpus pass joined to the BROADCAST
    // centroid grid computes scatter — two corpus reads total,
    // per-label output rows.
    "emb_class_sep" -> ((s, dir) => {
      val D = org.apache.spark.sql.types.DecimalType(38, 0)
      val q = t(s, dir, "embeddings").select(col("label"),
        transform(col("embedding"), x => fp(x.cast("double"), 6)).as("qv"))
      val cells = q.select(col("label"), posexplode(col("qv")).as(Seq("dim", "v")))
      val sums = cells.groupBy("label", "dim")
        .agg(sum("v").as("sv"), count(lit(1)).as("n"))
        .localCheckpoint() // labels×64 rows; feeds label AND global centroids
      val cent = sums.select(col("label"), col("dim"),
        fp(col("sv").cast("double") / col("n").cast("double"), 0).as("c"))
      val gcent = sums.groupBy("dim")
        .agg(fp(sum("sv").cast("double") / sum("n").cast("double"), 0).as("g"))
      val wss = cells.join(broadcast(cent), Seq("label", "dim"))
        .groupBy("label")
        .agg(sum(((col("v") - col("c")) * (col("v") - col("c"))).cast(D)).as("wss"),
          (count(lit(1)) / 64).as("n"))
      val bss = cent.join(broadcast(gcent), "dim")
        .groupBy("label")
        .agg(sum((col("c") - col("g")) * (col("c") - col("g"))).as("bss"))
      wss.join(bss, "label")
        .select(col("label"), col("n").cast("long").as("n"),
          fp(col("wss").cast("double") / col("n").cast("double") / 64.0 / 1e12, 4)
            .as("msd_within_fp4"),
          col("bss").cast("long").as("bss_sq"))
        
    }),
    // 35i — k-means (Lloyd) over the embedding corpus: k=8 TRAINED
    // centroids (sim_ann_ivf's are sampled, not trained), 2
    // iterations, deterministic end-to-end. All state in fp6 fixed
    // point: vectors quantize once to bigint, distances are EXACT
    // long sums of squares (≤ 64·(2e6)² ≈ 2.6e14 ≪ 2^63), the argmin
    // is a per-row packed fold (min over dist·8+cid — ties to the
    // smallest cid by construction), and the centroid update is one
    // correctly-rounded double divide (Σq6 per cell < 2^53 up to
    // ~10⁹ assigned vectors at |v| ≤ 4, documented bound) re-floored
    // to fp6. Empty clusters carry the previous centroid forward
    // (left join on the k×64 grid). Scale shape: the centroids ride
    // along as ONE broadcast row of k structs, assignment is
    // map-side only (no groupBy, no sort, no k-row fanout), so each
    // iteration is one corpus scan feeding a 512-key partial agg;
    // the next iteration's centroid frame is localCheckpoint'd so
    // lineage (and the corpus-scan count) stays LINEAR in the
    // iteration count.
    "emb_kmeans" -> ((s, dir) => {
      val k = 8
      val q = t(s, dir, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), x => fp(x.cast("double"), 6)).as("qv"))
      val seedW = Window.orderBy("vec_id")
      var cent = q.orderBy("vec_id").limit(k)
        .select((row_number().over(seedW) - 1).as("cid"), col("qv").as("cv"))
        .localCheckpoint()
      var grid: DataFrame = null
      for (it <- 1 to 2) {
        // per-ROW packed argmin — the k centroids ride along as ONE
        // broadcast row of k structs, and the nearest cid is a fold
        // over them: min(dist·8 + cid) (dist ≤ 2.6e14, ·8 ≪ 2^63;
        // the low 3 bits ARE the tiebreak-to-smallest-cid). No
        // aggregation, no sort, no per-vector k-row blowup: the
        // assignment is map-side only, so the whole iteration's
        // shuffle is the 512-key (cid,dim) partial agg below.
        val centArr = cent
          .agg(array_sort(collect_list(struct(col("cid"), col("cv")))).as("cs"))
        val assigned = q.crossJoin(broadcast(centArr))
          .select(col("vec_id"), col("qv"),
            pmod(aggregate(col("cs"), lit(Long.MaxValue), (acc, c) =>
              least(acc,
                aggregate(zip_with(col("qv"), c.getField("cv"),
                  (x, y) => (x - y) * (x - y)), lit(0L), _ + _) * 8
                  + c.getField("cid"))),
              lit(8L)).cast("int").as("cid"))
        val sums = assigned
          .select(col("cid"), posexplode(col("qv")).as(Seq("dim", "v")))
          .groupBy("cid", "dim")
          .agg(sum("v").as("sv"), count(lit(1)).as("n"))
        grid = cent
          .select(col("cid"), posexplode(col("cv")).as(Seq("dim", "pv")))
          .join(sums, Seq("cid", "dim"), "left")
          .select(col("cid"), col("dim"),
            coalesce(col("n"), lit(0L)).as("n"),
            coalesce(fp(col("sv").cast("double") / col("n").cast("double"), 0),
              col("pv")).as("c"))
        // only the frame the NEXT iteration re-consumes is pinned —
        // the final grid stays un-checkpointed so the returned plan
        // is the real assignment shape (one corpus scan + broadcast)
        if (it < 2) cent = grid.groupBy("cid")
          .agg(transform(array_sort(collect_list(struct(col("dim"), col("c")))),
            p => p.getField("c")).as("cv"))
          .localCheckpoint()
      }
      grid.select(col("cid"), col("dim"), col("n").as("n_assigned"),
          col("c").as("c_fp6"))
        
    })
  )

  /** Deterministic synthetic URL from a doc id — spellings vary by id
    * residues (case, www, :443, trailing slash, utm param, fragment)
    * so normalization has real work on every row and distinct ids can
    * collide on the canonical key (id mod lcm(7,50,5) = 350). */
  private def synthUrl(id: Column): Column = concat(
    when(id % 3 === 0, lit("HTTPS://WWW.Example")).otherwise(lit("https://example")),
    (id % 7).cast("string"), lit(".COM"),
    when(id % 4 === 0, lit(":443")).otherwise(lit("")),
    lit("/Path/"), (id % 50).cast("string"),
    when(id % 2 === 0, lit("/")).otherwise(lit("")),
    lit("?utm_source=feed&b=2&a="), (id % 5).cast("string"),
    when(id % 6 === 0, lit("#Frag")).otherwise(lit("")))

  // ---- oracle SQL ----------------------------------------------------

  private def sqlFp(e: String, scale: Int): String =
    s"CAST(floor(($e)*1e$scale+0.5) AS BIGINT)"

  /** SQL twin of the adaptive band-join bucket cap (max(64, ⌊√N⌋), N =
    * corpus rows — Dedup.lshCandidatePairs / hammingBandPairs with
    * maxBucket <= 0). Ends without WITH so callers splice it as the
    * first CTE; yields `adcap(cap)`. */
  private val adaptiveCapCte: String =
    "adcap AS (SELECT greatest(64, CAST(floor(sqrt(count(*))) AS BIGINT)) AS cap FROM documents)"

  /** Fold-order 16-dim dot product (PQ subvectors) — the 64-dim twin
    * of dotSql. */
  private def dot16(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       | list_transform(range(1, 17),
       |   i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
       | (acc, v) -> acc + v)""".stripMargin.replace("\n", " ")

  /** Shared PQ CTE chain: stride codebook `cb(sub, code, cvec)`,
    * subvector slices, and `best` = per-(id, sub) distances ranked so
    * `rn = 1` is the encoding. Used by emb_pq and sim_ann_pq. */
  private val pqCtes: String =
    s"""cnt AS (SELECT count(*) AS c FROM embeddings),
      |cents AS (SELECT vec_id AS sid, embedding AS v,
      |            CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code
      |          FROM embeddings, cnt WHERE vec_id % greatest(1, (c + 15) // 16) = 0),
      |subs AS (SELECT CAST(unnest(range(0, 4)) AS INT) AS sub),
      |cb AS (SELECT s.sub, c.code, list_slice(c.v, s.sub*16 + 1, s.sub*16 + 16) AS cvec
      |       FROM cents c, subs s),
      |sl AS (SELECT e.vec_id AS id, s.sub, list_slice(e.embedding, s.sub*16 + 1, s.sub*16 + 16) AS x
      |       FROM embeddings e, subs s),
      |d AS (SELECT sl.id, sl.sub, cb.code,
      |        (${dot16("x", "x")} - 2.0*${dot16("x", "cvec")} + ${dot16("cvec", "cvec")}) AS d2
      |      FROM sl JOIN cb ON cb.sub = sl.sub),
      |best AS (SELECT id, sub, code, d2,
      |           row_number() OVER (PARTITION BY id, sub ORDER BY d2, code) AS rn FROM d)""".stripMargin

  /** SQL twin of [[synthUrl]]. */
  private val synthUrlSql: String =
    """(CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://WWW.Example' ELSE 'https://example' END ||
      | CAST(doc_id % 7 AS VARCHAR) || '.COM' ||
      | CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END ||
      | '/Path/' || CAST(doc_id % 50 AS VARCHAR) ||
      | CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END ||
      | '?utm_source=feed&b=2&a=' || CAST(doc_id % 5 AS VARCHAR) ||
      | CASE WHEN doc_id % 6 = 0 THEN '#Frag' ELSE '' END)""".stripMargin.replace("\n", " ")

  /** CTE chain replicating UrlOps.normalizeUrl step-for-step over the
    * synthetic URLs; ends in `norm(doc_id, url, norm_url)`. */
  private val normUrlCtes: String =
    s"""raw AS (SELECT doc_id, $synthUrlSql AS url FROM documents),
      |s1 AS (SELECT doc_id, url, regexp_replace(url, '#.*$$', '') AS u1 FROM raw),
      |s2 AS (SELECT *,
      |    regexp_extract(u1, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', 0) AS pre0,
      |    substr(u1, length(regexp_extract(u1, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', 0)) + 1) AS rest
      |  FROM s1),
      |s3 AS (SELECT *, regexp_replace(regexp_replace(lower(pre0),
      |    '^https://www\\.', 'https://'), '^http://www\\.', 'http://') AS nowww FROM s2),
      |s4 AS (SELECT *,
      |    CASE WHEN starts_with(nowww, 'https://') THEN regexp_replace(nowww, ':443$$', '')
      |         ELSE regexp_replace(nowww, ':80$$', '') END AS noport,
      |    regexp_replace(regexp_extract(rest, '^[^?]*', 0), '/+$$', '') AS pathn,
      |    list_sort(list_filter(string_split(regexp_extract(rest, '^[^?]*\\?(.*)$$', 1), '&'),
      |      p -> NOT starts_with(p, 'utm_') AND p != '')) AS params
      |  FROM s3),
      |norm AS (SELECT doc_id, url,
      |    noport || pathn ||
      |    CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&') ELSE '' END AS norm_url
      |  FROM s4)""".stripMargin

  /** Whitespace tokens, lowercased — matches TextAnalysis.tokens. */
  private val toksSql =
    "list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0)"

  /** The BPE merges table as a SQL VALUES list — generated from
    * [[TextAnalysis.BpeMerges]] so the Spark literal and the oracle's
    * rank table can never drift. */
  private val bpeMergesValues: String =
    TextAnalysis.BpeMerges.zipWithIndex.map { case (m, i) =>
      val sp = m.indexOf(' ')
      s"($i,'${m.substring(0, sp)}','${m.substring(sp + 1)}')"
    }.mkString(",")

  /** Word n-gram shingles, distinct — matches Dedup.shingles(n). */
  private def shinglesSql(n: Int): String =
    s"""list_distinct(CASE WHEN len($toksSql) < $n
       | THEN [array_to_string($toksSql, ' ')]
       | ELSE list_transform(range(1, len($toksSql) - ${n - 1} + 1),
       |        i -> array_to_string(($toksSql)[i:i+${n - 1}], ' '))
       | END)""".stripMargin.replace("\n", " ")

  /** Strict left-fold double dot product — matches Similarity.dot. */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       | list_transform(range(1, 65),
       |   i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
       | (acc, v) -> acc + v)""".stripMargin.replace("\n", " ")

  private def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  /** [[dotSql]] over the first `d` components — matches
    * Similarity.dot on 1..d slices (same strict left fold). */
  private def dotSqlD(a: String, b: String, d: Int): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       | list_transform(range(1, ${d + 1}),
       |   i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
       | (acc, v) -> acc + v)""".stripMargin.replace("\n", " ")

  private def cosSqlD(a: String, b: String, d: Int): String =
    s"(${dotSqlD(a, b, d)} / (sqrt(${dotSqlD(a, a, d)}) * sqrt(${dotSqlD(b, b, d)})))"

  /** MinHash signature element for permutation j — matches
    * Dedup.minhash: shingle → first-8-hex-of-md5 as uint32, then
    * affine (h*A_j + B_j) mod P, min over shingles. `hs` is the
    * per-doc list of shingle hashes. */
  private def minhashSql(j: Int): String = {
    val a = graft.dedup.Dedup.MinhashA(j)
    val b = graft.dedup.Dedup.minhashB(j)
    val p = graft.dedup.Dedup.MinhashP
    s"list_min(list_transform(hs, h -> (h * CAST($a AS BIGINT) + CAST($b AS BIGINT)) % CAST($p AS BIGINT)))"
  }

  /** First 15 md5 hex chars of `e` as a BIGINT (60-bit, signed-safe) —
    * matches Dedup.shingleKey's conv(substring(md5, 1, 15), 16, 10).
    * Lambda vars are deliberately obscure: `e` is interpolated INSIDE
    * the transform lambda, so a plain `i` here would capture-shadow
    * an outer column named i referenced by the caller's expression
    * (it did — dd_dup_ngrams' gram position). */
  private def shingleKeySql(e: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
      | list_transform(range(1, 16),
      |   _ki -> CAST(strpos('0123456789abcdef', substr(md5($e), CAST(_ki AS INT), 1)) - 1 AS BIGINT))),
      | (_ka, _kv) -> _ka*16 + _kv)""".stripMargin.replace("\n", " ")

  /** Winnow core CTE chain over `src` (needs doc_id, text): word
    * 3-gram 60-bit hashes, w=4 sliding min with rightmost tie-break —
    * ends at `wsel(doc_id, fp, pos)` (one row per WINDOW; callers
    * DISTINCT). Matches graft_winnow(tokens, 3, 4) exactly. */
  private def winnowCoreSql(src: String): String =
    s"""tk0 AS (SELECT doc_id, $toksSql AS tk FROM $src),
      |wg AS (SELECT doc_id, list_transform(range(1, greatest(len(tk) - 2, 0) + 1),
      |    gi -> array_to_string(tk[CAST(gi AS INT):CAST(gi AS INT) + 2], ' ')) AS grams FROM tk0),
      |wh AS (SELECT doc_id, list_transform(grams, s -> ${shingleKeySql("s")}) AS hs FROM wg),
      |ww AS (SELECT doc_id, hs, unnest(range(1, greatest(len(hs) - 4 + 1, 1) + 1)) AS wi
      |  FROM wh WHERE len(hs) >= 1),
      |wpick AS (SELECT doc_id, hs, wi,
      |    list_min(hs[CAST(wi AS INT):CAST(wi AS INT) + 3]) AS fp FROM ww),
      |wsel AS (SELECT doc_id, fp,
      |    list_max(list_transform(range(CAST(wi AS INT), least(CAST(wi AS INT) + 4, len(hs) + 1)),
      |      pj -> CASE WHEN hs[CAST(pj AS INT)] = fp THEN pj ELSE NULL END)) AS pos
      |  FROM wpick)""".stripMargin

  /** First 8 md5 hex chars of `s` as a BIGINT (uint32 range). */
  private val hexHashSql =
    """list_reduce(list_prepend(CAST(0 AS BIGINT),
      | list_transform(range(1, 9),
      |   i -> CAST(strpos('0123456789abcdef', substr(md5(s), CAST(i AS INT), 1)) - 1 AS BIGINT))),
      | (a, v) -> a*16 + v)""".stripMargin.replace("\n", " ")

  /** langId oracle: per-language stopword-hit counts, first-wins argmax. */
  private val langIdSql: String = {
    val scores = TextAnalysis.DefaultStopwords.map { case (lang, words) =>
      val inList = words.map(w => s"'$w'").mkString(", ")
      lang -> s"len(list_filter($toksSql, t -> t IN ($inList)))"
    }
    val best = s"greatest(${scores.map(_._2).mkString(", ")})"
    val cases = scores.map { case (lang, e) => s"WHEN $e = $best THEN '$lang'" }.mkString(" ")
    s"CASE $cases END"
  }

  /** simhash core CTEs: per-doc 32-bit signature from 32 per-bit
    * signed sums over distinct tokens. Ends with `sigs(doc_id,
    * simhash)` for reuse by the pair join oracle. */
  private val simhashCoreCte: String = {
    val bitSums = (0 until 32).map { b =>
      val nib = s"(strpos('0123456789abcdef', substr(md5(t), ${b / 4 + 1}, 1)) - 1)"
      s"sum(CASE WHEN (($nib >> ${b % 4}) & 1) = 1 THEN 1 ELSE -1 END) AS s$b"
    }.mkString(",\n    ")
    val combine = (0 until 32).map(b => s"(CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
    s"""toks AS (
       |  SELECT doc_id, unnest(list_distinct($toksSql)) AS t FROM documents),
       |bits AS (SELECT doc_id,
       |    $bitSums
       |  FROM toks GROUP BY doc_id),
       |sigs AS (SELECT d.doc_id, CAST(coalesce($combine, 0) AS BIGINT) AS simhash
       |  FROM documents d LEFT JOIN bits USING (doc_id))""".stripMargin
  }

  private val simhashSql: String =
    s"""WITH $simhashCoreCte
       |SELECT doc_id, simhash FROM sigs ORDER BY doc_id""".stripMargin

  /** dd_simhash_pairs oracle: 4-band pigeonhole join + popcount fold
    * (mirrors Dedup.simhashPairs maxHamming=3, adaptive bucket cap). */
  private val simhashPairsSql: String = {
    val bandsSel = (0 until 4).map { b =>
      s"SELECT doc_id, simhash, $b AS band, (simhash >> ${b * 8}) & 255 AS key FROM sigs"
    }.mkString("\n  UNION ALL ")
    val pop = """list_reduce(list_prepend(CAST(0 AS BIGINT),
      | list_transform(range(0, 32), i -> (xor(sa.simhash, sb.simhash) >> i) & 1)),
      | (a, v) -> a + v)""".stripMargin.replace("\n", " ")
    s"""WITH $adaptiveCapCte,
       |$simhashCoreCte,
       |banded AS (
       |  $bandsSel),
       |ok AS (SELECT band, key FROM banded GROUP BY band, key HAVING count(*) <= (SELECT cap FROM adcap)),
       |b2 AS (SELECT banded.* FROM banded JOIN ok USING (band, key)),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM b2 a JOIN b2 b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST($pop AS INT) AS hamming
       |FROM cand JOIN sigs sa ON sa.doc_id = doc_a JOIN sigs sb ON sb.doc_id = doc_b
       |WHERE $pop <= 3
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** 64-bit simhash core CTEs, ending in `sigs64(doc_id, simhash)`.
    * Same per-bit signed-sum layout as the 32-bit core extended to 16
    * md5 hex chars; bits combine with bitwise OR (bit 63 is the
    * BIGINT sign bit — CAST(-9223372036854775808) since 1<<63
    * overflows DuckDB's left shift). */
  private val simhash64CoreCte: String = {
    val bitSums = (0 until 64).map { b =>
      val nib = s"(strpos('0123456789abcdef', substr(md5(t), ${b / 4 + 1}, 1)) - 1)"
      s"sum(CASE WHEN (($nib >> ${b % 4}) & 1) = 1 THEN 1 ELSE -1 END) AS s$b"
    }.mkString(",\n    ")
    val combine = (0 until 64).map { b =>
      val bit = if (b == 63) "CAST(-9223372036854775808 AS BIGINT)" else s"(CAST(1 AS BIGINT) << $b)"
      s"(CASE WHEN s$b > 0 THEN $bit ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" | ")
    s"""toks64 AS (
       |  SELECT doc_id, unnest(list_distinct($toksSql)) AS t FROM documents),
       |bits64 AS (SELECT doc_id,
       |    $bitSums
       |  FROM toks64 GROUP BY doc_id),
       |sigs64 AS (SELECT d.doc_id, CAST(coalesce($combine, 0) AS BIGINT) AS simhash
       |  FROM documents d LEFT JOIN bits64 USING (doc_id))""".stripMargin
  }

  private val simhash64Sql: String =
    s"""WITH $simhash64CoreCte
       |SELECT doc_id, simhash FROM sigs64 ORDER BY doc_id""".stripMargin

  /** dd_simhash64_pairs oracle: 4×16-bit pigeonhole bands over the
    * BIGINT signature (arithmetic shift then mask — sign-safe in both
    * engines) + native bit_count popcount. */
  private val simhash64PairsSql: String = {
    val bandsSel = (0 until 4).map { b =>
      s"SELECT doc_id, simhash, $b AS band, (simhash >> ${b * 16}) & 65535 AS key FROM sigs64"
    }.mkString("\n  UNION ALL ")
    s"""WITH $adaptiveCapCte,
       |$simhash64CoreCte,
       |banded64 AS (
       |  $bandsSel),
       |ok64 AS (SELECT band, key FROM banded64 GROUP BY band, key HAVING count(*) <= (SELECT cap FROM adcap)),
       |b264 AS (SELECT banded64.* FROM banded64 JOIN ok64 USING (band, key)),
       |cand64 AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM b264 a JOIN b264 b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INT) AS hamming
       |FROM cand64 JOIN sigs64 sa ON sa.doc_id = doc_a JOIN sigs64 sb ON sb.doc_id = doc_b
       |WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** mm_binary_meta oracle: the synth parameters are closed-form in
    * doc_id, so the roundtrip check is exact — fmt cycles with
    * doc_id%3, dims are the synth formulas, and byte_len is the
    * container's header size (PNG 29; JPEG 41 + pad + 13 if the COM
    * segment is present; GIF 13). */
  private val mmSql: String =
    """SELECT doc_id,
      | CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'gif' END AS fmt,
      | CAST(doc_id % 500 + 1 AS BIGINT) AS width,
      | CAST(doc_id % 300 + 1 AS BIGINT) AS height,
      | CAST(CASE doc_id % 3
      |   WHEN 0 THEN 29
      |   WHEN 1 THEN 41 + (doc_id % 7) + (CASE WHEN doc_id % 2 = 0 THEN 13 ELSE 0 END)
      |   ELSE 13 END AS BIGINT) AS byte_len
      |FROM documents ORDER BY doc_id""".stripMargin

  /** sim_ann_lsh_exact oracle: recompute the md5-derived hyperplanes
    * (Similarity.planeComponentValue: uint24 of first-6 md5 hex of
    * "p_d" / 2^24 - 0.5), sign-pattern buckets via the SAME left-fold
    * dot, bucket self-join, fold-order cosine, windowed top-k. */
  private val annLshExactSql: String = {
    val hex6 = """list_reduce(list_prepend(CAST(0 AS BIGINT),
      | list_transform(range(1, 7),
      |  j -> CAST(strpos('0123456789abcdef',
      |         substr(md5(CAST(p AS VARCHAR) || '_' || CAST(d AS VARCHAR)), CAST(j AS INT), 1)) - 1 AS BIGINT))),
      | (a, v) -> a*16 + v)""".stripMargin.replace("\n", " ")
    s"""WITH planes AS (
      |  SELECT p, d, (CAST($hex6 AS DOUBLE) / 16777216.0 - 0.5) AS pc
      |  FROM range(0, 8) t1(p) CROSS JOIN range(0, 64) t2(d)),
      |plane_lists AS (SELECT p, list(pc ORDER BY d) AS plane FROM planes GROUP BY p),
      |projs AS (SELECT e.vec_id, pl.p,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * pl.plane[i])),
      |      (a, v) -> a + v) AS s
      |  FROM embeddings e CROSS JOIN plane_lists pl),
      |b AS (SELECT vec_id, array_to_string(list(CASE WHEN s > 0 THEN '1' ELSE '0' END ORDER BY p), '') AS bucket
      |      FROM projs GROUP BY vec_id),
      |scored AS (SELECT q.vec_id AS query_id, d.vec_id AS id,
      |    ${sqlFp(cosSql("qe.embedding", "de.embedding"), 6)} AS cos_fp6
      |  FROM b q JOIN b d ON q.bucket = d.bucket AND q.vec_id != d.vec_id
      |  JOIN embeddings qe ON qe.vec_id = q.vec_id
      |  JOIN embeddings de ON de.vec_id = d.vec_id
      |  WHERE q.vec_id % 50 = 0),
      |topk AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_fp6 DESC, id) AS rk FROM scored)
      |SELECT query_id, id, cos_fp6 FROM topk WHERE rk <= 5 ORDER BY query_id, cos_fp6, id""".stripMargin
  }

  /** sim_ann_lsh oracle (guards ON): the bucket-size cap is a HAVING
    * filter, and query-directed multi-probe flips the nprobe=2 sign
    * bits with the smallest projection magnitudes — all recomputable:
    * plane projections are deterministic md5 folds, the flip order is
    * (abs(s), plane) ascending, and a probe set is the distinct home
    * bucket plus its flips. */
  private val annLshGuardedSql: String = {
    val hex6 = """list_reduce(list_prepend(CAST(0 AS BIGINT),
      | list_transform(range(1, 7),
      |  j -> CAST(strpos('0123456789abcdef',
      |         substr(md5(CAST(p AS VARCHAR) || '_' || CAST(d AS VARCHAR)), CAST(j AS INT), 1)) - 1 AS BIGINT))),
      | (a, v) -> a*16 + v)""".stripMargin.replace("\n", " ")
    s"""WITH planes AS (
      |  SELECT p, d, (CAST($hex6 AS DOUBLE) / 16777216.0 - 0.5) AS pc
      |  FROM range(0, 8) t1(p) CROSS JOIN range(0, 64) t2(d)),
      |plane_lists AS (SELECT p, list(pc ORDER BY d) AS plane FROM planes GROUP BY p),
      |projs AS (SELECT e.vec_id, pl.p,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * pl.plane[i])),
      |      (a, v) -> a + v) AS s
      |  FROM embeddings e CROSS JOIN plane_lists pl),
      |b AS (SELECT vec_id, array_to_string(list(CASE WHEN s > 0 THEN '1' ELSE '0' END ORDER BY p), '') AS bucket
      |      FROM projs GROUP BY vec_id),
      |okb AS (SELECT bucket FROM b GROUP BY bucket HAVING count(*) <= 1000),
      |d2 AS (SELECT b.* FROM b JOIN okb USING (bucket)),
      |home AS (SELECT vec_id, bucket FROM b WHERE vec_id % 50 = 0),
      |flips AS (SELECT vec_id, p FROM (
      |    SELECT vec_id, p, row_number() OVER (PARTITION BY vec_id ORDER BY abs(s), p) AS rn
      |    FROM projs WHERE vec_id % 50 = 0) WHERE rn <= 2),
      |probes AS (
      |  SELECT vec_id, bucket FROM home
      |  UNION
      |  SELECT f.vec_id,
      |    substr(h.bucket, 1, f.p) ||
      |    (CASE WHEN substr(h.bucket, f.p + 1, 1) = '1' THEN '0' ELSE '1' END) ||
      |    substr(h.bucket, f.p + 2) AS bucket
      |  FROM flips f JOIN home h ON h.vec_id = f.vec_id),
      |scored AS (SELECT DISTINCT p.vec_id AS query_id, d.vec_id AS id,
      |    ${sqlFp(cosSql("qe.embedding", "de.embedding"), 6)} AS cos_fp6
      |  FROM probes p JOIN d2 d ON d.bucket = p.bucket AND d.vec_id != p.vec_id
      |  JOIN embeddings qe ON qe.vec_id = p.vec_id
      |  JOIN embeddings de ON de.vec_id = d.vec_id),
      |topk AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_fp6 DESC, id) AS rk FROM scored)
      |SELECT query_id, id, cos_fp6 FROM topk WHERE rk <= 5 ORDER BY query_id, cos_fp6, id""".stripMargin
  }

  /** sim_ann_ivf oracle: the registered query uses the DETERMINISTIC
    * id-modulo centroid pick (not the float-mean k-means refinement),
    * so the whole index-build-and-probe path is exactly replicable:
    * stride centroids → nearest-cell assignment (argmax = windowed
    * first by cos desc, centroid id) → top-nprobe probes → windowed
    * top-k within probed cells. */
  private val annIvfSql: String =
    s"""WITH cnt AS (SELECT count(*) AS c FROM embeddings),
      |cents AS (SELECT vec_id AS centroid_id, embedding AS cvec
      |          FROM embeddings, cnt WHERE vec_id % greatest(1, (c + 15) // 16) = 0),
      |ac AS (SELECT e.vec_id, e.embedding, c.centroid_id,
      |         ${cosSql("e.embedding", "c.cvec")} AS cosv
      |       FROM embeddings e CROSS JOIN cents c),
      |asg AS (SELECT vec_id, embedding, centroid_id AS cell FROM (
      |         SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cosv DESC, centroid_id) AS rn
      |         FROM ac) WHERE rn = 1),
      |pc AS (SELECT q.vec_id AS query_id, q.embedding AS qvec, c.centroid_id AS cell,
      |         ${cosSql("q.embedding", "c.cvec")} AS cosv
      |       FROM embeddings q CROSS JOIN cents c WHERE q.vec_id % 50 = 0),
      |probes AS (SELECT query_id, qvec, cell FROM (
      |         SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosv DESC, cell) AS rn
      |         FROM pc) WHERE rn <= 2),
      |scored AS (SELECT p.query_id, a.vec_id AS id,
      |         ${sqlFp(cosSql("p.qvec", "a.embedding"), 6)} AS cos_fp6
      |       FROM probes p JOIN asg a ON a.cell = p.cell WHERE a.vec_id != p.query_id),
      |topk AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_fp6 DESC, id) AS rk FROM scored)
      |SELECT query_id, id, cos_fp6 FROM topk WHERE rk <= 5 ORDER BY query_id, cos_fp6, id""".stripMargin

  /** Shared minhash CTE chain ending in `cand(doc_a, doc_b)` — the
    * distinct LSH candidate pairs, plus `sigs`. Mirrors
    * Dedup.lshCandidatePairs bit-exactly INCLUDING the over-cap
    * re-split: members of buckets with > 100 rows re-key on the band
    * key extended with the next two signature slots (mod 8) in a
    * shifted band namespace; sub-buckets still over the cap drop. */
  private def minhashCtes(src: String = "documents"): String = {
    val bands = (0 until 4).map { b =>
      val key = s"array_to_string(sig[${b * 2 + 1}:${b * 2 + 2}], '_')"
      val e1 = ((b + 1) * 2) % 8 + 1
      val e2 = ((b + 1) * 2 + 1) % 8 + 1
      s"SELECT doc, $b AS band, $key AS key, " +
        s"$key || '_' || CAST(sig[$e1] AS VARCHAR) || '_' || CAST(sig[$e2] AS VARCHAR) AS key_ext FROM sigs"
    }.mkString("\n  UNION ALL ")
    s"""$adaptiveCapCte,
       |sh0 AS (SELECT doc_id AS doc, ${shinglesSql(3)} AS sh FROM $src),
       |hashed AS (SELECT doc, list_transform(sh, s -> $hexHashSql) AS hs FROM sh0),
       |sigs AS (SELECT doc, [${(0 until 8).map(minhashSql).mkString(", ")}] AS sig FROM hashed),
       |banded AS (
       |  $bands),
       |counted AS (SELECT *, count(*) OVER (PARTITION BY band, key) AS n FROM banded),
       |b_ok AS (SELECT doc, band, key FROM counted WHERE n <= (SELECT cap FROM adcap)),
       |b_hot AS (SELECT doc, band + 4 AS band, key_ext AS key FROM counted WHERE n > (SELECT cap FROM adcap)),
       |b_hot_ok AS (SELECT doc, band, key FROM
       |  (SELECT *, count(*) OVER (PARTITION BY band, key) AS n2 FROM b_hot) WHERE n2 <= (SELECT cap FROM adcap)),
       |b2 AS (SELECT * FROM b_ok UNION ALL SELECT * FROM b_hot_ok),
       |cand AS (SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
       |  FROM b2 a JOIN b2 b ON a.band = b.band AND a.key = b.key AND a.doc < b.doc)""".stripMargin
  }

  private val minhashPairsSql: String =
    s"""WITH ${minhashCtes()}
       |SELECT doc_a, doc_b FROM cand ORDER BY doc_a, doc_b""".stripMargin

  /** dd_minhash_est oracle: per candidate pair, the fraction of the 8
    * signature slots that agree (fp4). */
  private val minhashEstSql: String =
    s"""WITH ${minhashCtes()}
       |SELECT doc_a, doc_b,
       |  ${sqlFp("CAST(len(list_filter(range(1, 9), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / 8.0", 4)} AS est_jaccard_fp4
       |FROM cand JOIN sigs sa ON sa.doc = doc_a JOIN sigs sb ON sb.doc = doc_b
       |ORDER BY doc_a, doc_b""".stripMargin

  lazy val oracles: Map[String, String] = withDiskTwins(oracles0)

  /** The at-rest ANN probes are spec-asserted bit-identical to their
    * in-memory compositions, so they share the same DuckDB mirror. */
  private def withDiskTwins(m: Map[String, String]): Map[String, String] =
    m + ("sim_ann_ivfpq_disk" -> m("sim_ann_ivfpq")) +
      ("sim_ann_rerank_disk" -> m("sim_ann_rerank"))

  private val oracles0: Map[String, String] = Map(
    "dd_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS dup_count
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "dd_minhash_pairs" -> minhashPairsSql,
    // the full LSH pipeline re-run over the planted corpus, metrics
    // in exact integers + guarded fp4 divides
    "dd_eval_recall" ->
      s"""WITH aug0 AS (SELECT d.doc_id,
        |    CASE WHEN d.doc_id % 4 = 1 AND b.text IS NOT NULL
        |      THEN b.text || ' planteddup' ELSE d.text END AS text
        |  FROM documents d LEFT JOIN documents b ON b.doc_id = d.doc_id - 1),
        |${minhashCtes("aug0")},
        |truth AS (SELECT b.doc_id AS doc_a, d.doc_id AS doc_b
        |  FROM documents d JOIN documents b ON b.doc_id = d.doc_id - 1
        |  WHERE d.doc_id % 4 = 1),
        |tp AS (SELECT count(*) AS tp FROM cand JOIN truth USING (doc_a, doc_b)),
        |np AS (SELECT count(*) AS n_pred FROM cand),
        |nt AS (SELECT count(*) AS n_truth FROM truth)
        |SELECT CAST(n_truth AS BIGINT) AS n_truth, CAST(n_pred AS BIGINT) AS n_pred,
        |  CAST(tp AS BIGINT) AS tp,
        |  CASE WHEN n_pred = 0 THEN CAST(0 AS BIGINT)
        |    ELSE ${sqlFp("CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE)", 4)} END AS precision_fp4,
        |  CASE WHEN n_truth = 0 THEN CAST(0 AS BIGINT)
        |    ELSE ${sqlFp("CAST(tp AS DOUBLE) / CAST(n_truth AS DOUBLE)", 4)} END AS recall_fp4
        |FROM tp, np, nt""".stripMargin,
    "dd_minhash_est" -> minhashEstSql,
    // b=2 truncation: slot match on sig mod 4; Ĵ=(Â−1/4)/(3/4) clamped
    "dd_bbit_minhash" -> {
      val a2 = "CAST(len(list_filter(range(1, 9), i -> sa.sig[i] % 4 = sb.sig[i] % 4)) AS DOUBLE) / 8.0"
      s"""WITH ${minhashCtes()}
         |SELECT doc_a, doc_b,
         |  ${sqlFp(a2, 4)} AS agree_b2_fp4,
         |  ${sqlFp(s"greatest(0.0, ($a2 - 0.25) / 0.75)", 4)} AS est_b2_fp4,
         |  ${sqlFp("CAST(len(list_filter(range(1, 9), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / 8.0", 4)} AS est_full_fp4
         |FROM cand JOIN sigs sa ON sa.doc = doc_a JOIN sigs sb ON sb.doc = doc_b
         |ORDER BY doc_a, doc_b""".stripMargin
    },
    // transitive min-label closure via a recursive CTE over the same
    // candidate edges; UNION dedup terminates the recursion
    "dd_components" ->
      s"""WITH RECURSIVE ${minhashCtes()},
         |sym AS (SELECT doc_a AS src, doc_b AS dst FROM cand
         |        UNION ALL SELECT doc_b, doc_a FROM cand),
         |lbl(node, label) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT s.dst, l.label FROM lbl l JOIN sym s ON s.src = l.node)
         |SELECT node AS doc_id, min(label) AS component
         |FROM lbl GROUP BY node ORDER BY doc_id""".stripMargin,
    // same recursive closure as dd_components, then cluster sizes →
    // per-doc 1/n loss weight
    "smp_soft_dedup" ->
      s"""WITH RECURSIVE ${minhashCtes()},
         |sym AS (SELECT doc_a AS src, doc_b AS dst FROM cand
         |        UNION ALL SELECT doc_b, doc_a FROM cand),
         |lbl(node, label) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT s.dst, l.label FROM lbl l JOIN sym s ON s.src = l.node),
         |comp AS (SELECT node AS doc_id, min(label) AS component FROM lbl GROUP BY node),
         |sz AS (SELECT component, count(*) AS cluster_n FROM comp GROUP BY 1)
         |SELECT comp.doc_id, comp.component, sz.cluster_n,
         |  ${sqlFp("1.0 / CAST(sz.cluster_n AS DOUBLE)", 6)} AS weight_fp6
         |FROM comp JOIN sz USING (component) ORDER BY comp.doc_id""".stripMargin,
    // same recursive closure as dd_components, then a deterministic
    // per-cluster argmax (n_chars DESC, doc_id ASC) + cluster size
    "dd_keep_best" ->
      s"""WITH RECURSIVE ${minhashCtes()},
         |sym AS (SELECT doc_a AS src, doc_b AS dst FROM cand
         |        UNION ALL SELECT doc_b, doc_a FROM cand),
         |lbl(node, label) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT s.dst, l.label FROM lbl l JOIN sym s ON s.src = l.node),
         |comp AS (SELECT node, min(label) AS component FROM lbl GROUP BY node),
         |ranked AS (
         |  SELECT c.component AS cluster, d.doc_id, d.n_chars,
         |    row_number() OVER (PARTITION BY c.component ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn,
         |    count(*) OVER (PARTITION BY c.component) AS n_docs
         |  FROM comp c JOIN documents d ON d.doc_id = c.node)
         |SELECT cluster, doc_id AS keep_id, n_chars AS keep_score, n_docs
         |FROM ranked WHERE rn = 1 ORDER BY cluster""".stripMargin,
    "dd_incremental" ->
      """WITH ref AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 5 <> 0),
        |inc AS (SELECT doc_id, source, n_chars, md5(text) AS h FROM documents WHERE doc_id % 3 = 0)
        |SELECT doc_id, source, n_chars FROM inc
        |WHERE h NOT IN (SELECT h FROM ref) ORDER BY doc_id""".stripMargin,
    // Bloom pre-filter is value-invisible (no false negatives) — the
    // oracle is the exact anti-join
    "dd_incremental_bloom" ->
      """WITH ref AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 5 <> 0),
        |inc AS (SELECT doc_id, source, n_chars, md5(text) AS h FROM documents WHERE doc_id % 3 = 0)
        |SELECT doc_id, source, n_chars FROM inc
        |WHERE h NOT IN (SELECT h FROM ref) ORDER BY doc_id""".stripMargin,
    // SemDeDup mirror: stride centroids + argmax-cosine assignment
    // (as sim_ann_ivf), within-cell cosine pairs, recursive closure
    // (as dd_components), min-id representative + cluster size
    "dd_semantic" ->
      s"""WITH RECURSIVE cnt AS (SELECT count(*) AS c FROM embeddings),
        |icents AS (SELECT vec_id AS centroid_id, embedding AS icvec
        |           FROM embeddings, cnt WHERE vec_id % greatest(1, (c + 15) // 16) = 0),
        |ac AS (SELECT e.vec_id, e.embedding, c.centroid_id,
        |         ${cosSql("e.embedding", "c.icvec")} AS cosv
        |       FROM embeddings e CROSS JOIN icents c),
        |asg AS (SELECT vec_id, embedding, centroid_id AS cell FROM (
        |         SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cosv DESC, centroid_id) AS rn
        |         FROM ac) WHERE rn = 1),
        |prs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |        FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |        WHERE ${sqlFp(cosSql("a.embedding", "b.embedding"), 6)} >= 300000),
        |sym AS (SELECT id_a AS src, id_b AS dst FROM prs
        |        UNION ALL SELECT id_b, id_a FROM prs),
        |lbl(node, label) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT s.dst, l.label FROM lbl l JOIN sym s ON s.src = l.node),
        |comp AS (SELECT node, min(label) AS component FROM lbl GROUP BY node)
        |SELECT component AS keep_id, CAST(count(*) AS BIGINT) AS n_members
        |FROM comp GROUP BY 1 ORDER BY 1""".stripMargin,
    "dd_decontaminate" ->
      s"""WITH ev0 AS (SELECT DISTINCT unnest(${shinglesSql(4)}) AS g0
        |            FROM documents WHERE doc_id % 97 = 0),
        |ev AS (SELECT DISTINCT ${shingleKeySql("g0")} AS g FROM ev0),
        |tg0 AS (SELECT doc_id, unnest(${shinglesSql(4)}) AS g0
        |       FROM documents WHERE doc_id % 97 <> 0),
        |tg AS (SELECT doc_id, ${shingleKeySql("g0")} AS g FROM tg0),
        |bad AS (SELECT DISTINCT tg.doc_id FROM tg JOIN ev USING (g))
        |SELECT doc_id, source, n_chars FROM documents
        |WHERE doc_id % 97 <> 0 AND doc_id NOT IN (SELECT doc_id FROM bad)
        |ORDER BY doc_id""".stripMargin,
    "sim_ann_lsh_exact" -> annLshExactSql,
    "sim_ann_lsh" -> annLshGuardedSql,
    "sim_ann_ivf" -> annIvfSql,
    // the persisted-index probe is bit-identical to the in-memory IVF
    // search (deterministic centroids, shared cosine/tie arithmetic)
    "sim_ann_ivf_disk" -> annIvfSql,
    // same IVF assignment CTEs as annIvfSql; candidates cell-bounded,
    // per-node top-3, then the mutual (reversed-pair) self-join
    "ev_growth_accounting" ->
      """WITH au AS (SELECT DISTINCT user_id,
        |    (ms - ((ms % 86400000 + 86400000) % 86400000)) // 86400000 AS day
        |  FROM (SELECT user_id, epoch_ms(ts) AS ms FROM events)),
        |first AS (SELECT user_id, min(day) AS fw FROM au GROUP BY 1),
        |prev AS (SELECT user_id, day + 1 AS day FROM au),
        |mw AS (SELECT max(day) AS mw FROM au),
        |st AS (SELECT au.day,
        |    CASE WHEN au.day = f.fw THEN 'new'
        |         WHEN p.user_id IS NOT NULL THEN 'retained'
        |         ELSE 'resurrected' END AS st
        |  FROM au JOIN first f USING (user_id)
        |  LEFT JOIN prev p ON p.user_id = au.user_id AND p.day = au.day),
        |chn AS (SELECT p.day, count(*) AS n_churned
        |  FROM prev p, mw
        |  WHERE p.day <= mw.mw
        |    AND NOT EXISTS (SELECT 1 FROM au WHERE au.user_id = p.user_id AND au.day = p.day)
        |  GROUP BY 1),
        |agg AS (SELECT day,
        |    CAST(sum(CASE WHEN st = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |    CAST(sum(CASE WHEN st = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        |    CAST(sum(CASE WHEN st = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
        |  FROM st GROUP BY 1)
        |SELECT coalesce(agg.day, chn.day) AS day,
        |  coalesce(n_new, 0) AS n_new, coalesce(n_retained, 0) AS n_retained,
        |  coalesce(n_resurrected, 0) AS n_resurrected,
        |  CAST(coalesce(n_churned, 0) AS BIGINT) AS n_churned
        |FROM agg FULL JOIN chn ON agg.day = chn.day ORDER BY 1""".stripMargin,
    "emb_cell_balance" ->
      s"""WITH cnt AS (SELECT count(*) AS c FROM embeddings),
        |cents AS (SELECT vec_id AS centroid_id, embedding AS cvec
        |          FROM embeddings, cnt WHERE vec_id % greatest(1, (c + 15) // 16) = 0),
        |ac AS (SELECT e.vec_id, c.centroid_id,
        |         ${cosSql("e.embedding", "c.cvec")} AS cosv
        |       FROM embeddings e CROSS JOIN cents c),
        |asg AS (SELECT vec_id, centroid_id AS cell FROM (
        |         SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cosv DESC, centroid_id) AS rn
        |         FROM ac) WHERE rn = 1),
        |cs AS (SELECT cell, count(*) AS sz FROM asg GROUP BY 1),
        |r AS (SELECT count(*) AS n_cells, min(sz) AS min_sz, max(sz) AS max_sz,
        |        CAST(sum(sz) AS BIGINT) AS total FROM cs)
        |SELECT n_cells, min_sz, max_sz, total,
        |  CAST((max_sz * n_cells * 20000 + total) // (2 * total) AS BIGINT) AS skew_fp4
        |FROM r""".stripMargin,
    "dd_threshold_sweep" ->
      s"""WITH cnt AS (SELECT count(*) AS c, greatest(16, count(*) // 125) AS kc FROM embeddings),
        |cents AS (SELECT vec_id AS centroid_id, embedding AS cvec
        |          FROM embeddings, cnt WHERE vec_id % greatest(1, (c + kc - 1) // kc) = 0),
        |ac AS (SELECT e.vec_id, e.embedding, c.centroid_id,
        |         ${cosSql("e.embedding", "c.cvec")} AS cosv
        |       FROM embeddings e CROSS JOIN cents c),
        |asg AS (SELECT vec_id, embedding, centroid_id AS cell FROM (
        |         SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cosv DESC, centroid_id) AS rn
        |         FROM ac) WHERE rn = 1),
        |sc AS (SELECT ${sqlFp(cosSql("a.embedding", "b.embedding"), 6)} AS cos_fp6
        |       FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id)
        |SELECT cos_fp6 // 10000 AS bucket, count(*) AS n_pairs
        |FROM sc WHERE cos_fp6 >= 100000 GROUP BY 1 ORDER BY 1""".stripMargin,
    "sim_knn_graph" ->
      s"""WITH cnt AS (SELECT count(*) AS c, greatest(16, count(*) // 125) AS kc FROM embeddings),
        |cents AS (SELECT vec_id AS centroid_id, embedding AS cvec
        |          FROM embeddings, cnt WHERE vec_id % greatest(1, (c + kc - 1) // kc) = 0),
        |ac AS (SELECT e.vec_id, e.embedding, c.centroid_id,
        |         ${cosSql("e.embedding", "c.cvec")} AS cosv
        |       FROM embeddings e CROSS JOIN cents c),
        |asg AS (SELECT vec_id, embedding, centroid_id AS cell FROM (
        |         SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cosv DESC, centroid_id) AS rn
        |         FROM ac) WHERE rn = 1),
        |sc AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |         ${sqlFp(cosSql("a.embedding", "b.embedding"), 6)} AS cos_fp6
        |       FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id != b.vec_id),
        |knn AS (SELECT id_a, id_b, cos_fp6 FROM (
        |         SELECT *, row_number() OVER (PARTITION BY id_a ORDER BY cos_fp6 DESC, id_b) AS rk
        |         FROM sc) WHERE rk <= 3)
        |SELECT k1.id_a, k1.id_b, k1.cos_fp6 FROM knn k1
        |JOIN knn k2 ON k1.id_a = k2.id_b AND k1.id_b = k2.id_a
        |WHERE k1.id_a < k1.id_b ORDER BY k1.id_a, k1.id_b""".stripMargin,
    // same IVF assignment CTEs, labels carried; both argmaxes via the
    // identical packed-long max ((cos_fp6+1e6)·2^40 + (2^40−1−id))
    "emb_hard_negatives" ->
      s"""WITH cnt AS (SELECT count(*) AS c, greatest(16, count(*) // 125) AS kc FROM embeddings),
        |cents AS (SELECT vec_id AS centroid_id, embedding AS cvec
        |          FROM embeddings, cnt WHERE vec_id % greatest(1, (c + kc - 1) // kc) = 0),
        |ac AS (SELECT e.vec_id, e.embedding, e.label, c.centroid_id,
        |         ${cosSql("e.embedding", "c.cvec")} AS cosv
        |       FROM embeddings e CROSS JOIN cents c),
        |asg AS (SELECT vec_id, embedding, label, centroid_id AS cell FROM (
        |         SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cosv DESC, centroid_id) AS rn
        |         FROM ac) WHERE rn = 1),
        |sc AS (SELECT a.vec_id AS id_a, a.label AS lab_a, b.vec_id AS id_b, b.label AS lab_b,
        |         ${sqlFp(cosSql("a.embedding", "b.embedding"), 6)} AS cos_fp6
        |       FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id != b.vec_id),
        |pk AS (SELECT id_a,
        |         max(CASE WHEN lab_b != lab_a
        |             THEN (cos_fp6 + 1000000) * 1099511627776 + (1099511627775 - id_b) END) AS pn,
        |         max(CASE WHEN lab_b = lab_a
        |             THEN (cos_fp6 + 1000000) * 1099511627776 + (1099511627775 - id_b) END) AS pp
        |       FROM sc GROUP BY 1)
        |SELECT id_a AS vec_id,
        |  1099511627775 - (pn % 1099511627776) AS neg_id,
        |  pn // 1099511627776 - 1000000 AS cos_neg_fp6,
        |  1099511627775 - (pp % 1099511627776) AS pos_id,
        |  pp // 1099511627776 - 1000000 AS cos_pos_fp6,
        |  pp // 1099511627776 - pn // 1099511627776 AS margin_fp6
        |FROM pk ORDER BY vec_id""".stripMargin,
    // PQ mirror: stride codebook (rank = code), subspace slices,
    // d2 = x·x − 2·x·c + c·c with the same fold-order dots, argmin =
    // windowed first by (d2, code)
    "emb_pq" ->
      s"""WITH $pqCtes
        |SELECT id, sub, code, ${sqlFp("d2", 6)} AS d2_fp6
        |FROM best WHERE rn = 1 ORDER BY id, sub""".stripMargin,
    "emb_pq_distortion" ->
      s"""WITH $pqCtes,
        |enc AS (SELECT id, sub, ${sqlFp("d2", 6)} AS d6 FROM best WHERE rn = 1)
        |SELECT sub, count(*) AS n, CAST(sum(d6) AS BIGINT) AS sum_d2_fp6,
        |  CAST(max(d6) AS BIGINT) AS max_d2_fp6
        |FROM enc GROUP BY 1 ORDER BY 1""".stripMargin,
    // ADC mirror: per-query LUT from the same codebook, fp6 per
    // subspace, integer sum, windowed top-k ascending
    "sim_ann_pq" ->
      s"""WITH $pqCtes,
        |enc AS (SELECT id, sub, code FROM best WHERE rn = 1),
        |qsl AS (SELECT q.vec_id AS query_id, s.sub,
        |          list_slice(q.embedding, s.sub*16 + 1, s.sub*16 + 16) AS qx
        |        FROM embeddings q, subs s WHERE q.vec_id % 50 = 0),
        |lut AS (SELECT q.query_id, q.sub, cb.code,
        |          ${sqlFp(s"${dot16("qx", "qx")} - 2.0*${dot16("qx", "cvec")} + ${dot16("cvec", "cvec")}", 6)} AS pd6
        |        FROM qsl q JOIN cb ON cb.sub = q.sub),
        |sc AS (SELECT l.query_id, e.id, CAST(sum(l.pd6) AS BIGINT) AS approx_d2_fp6
        |       FROM enc e JOIN lut l ON l.sub = e.sub AND l.code = e.code
        |       WHERE e.id <> l.query_id GROUP BY 1, 2),
        |topk AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |           ORDER BY approx_d2_fp6, id) AS rk FROM sc)
        |SELECT query_id, id, approx_d2_fp6 FROM topk WHERE rk <= 5
        |ORDER BY query_id, approx_d2_fp6, id""".stripMargin,
    // IVF-PQ mirror: the same codebook/LUT chain, with the scored set
    // first pruned to the nprobe nearest IVF cells per query (stride
    // centroids + argmax-cosine assignment, as in the sim_ann_ivf
    // oracle)
    "sim_ann_ivfpq" ->
      s"""WITH $pqCtes,
        |enc AS (SELECT id, sub, code FROM best WHERE rn = 1),
        |icents AS (SELECT vec_id AS centroid_id, embedding AS icvec
        |           FROM embeddings, cnt WHERE vec_id % greatest(1, (c + 15) // 16) = 0),
        |ac AS (SELECT e.vec_id, c.centroid_id, ${cosSql("e.embedding", "c.icvec")} AS cosv
        |       FROM embeddings e CROSS JOIN icents c),
        |asg AS (SELECT vec_id AS id, centroid_id AS cell FROM (
        |         SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cosv DESC, centroid_id) AS rn2
        |         FROM ac) WHERE rn2 = 1),
        |pc AS (SELECT q.vec_id AS query_id, c.centroid_id AS cell,
        |         ${cosSql("q.embedding", "c.icvec")} AS cosv
        |       FROM embeddings q CROSS JOIN icents c WHERE q.vec_id % 50 = 0),
        |probes AS (SELECT query_id, cell FROM (
        |         SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosv DESC, cell) AS rn3
        |         FROM pc) WHERE rn3 <= 2),
        |qsl AS (SELECT q.vec_id AS query_id, s.sub,
        |          list_slice(q.embedding, s.sub*16 + 1, s.sub*16 + 16) AS qx
        |        FROM embeddings q, subs s WHERE q.vec_id % 50 = 0),
        |lut AS (SELECT q.query_id, q.sub, cb.code,
        |          ${sqlFp(s"${dot16("qx", "qx")} - 2.0*${dot16("qx", "cvec")} + ${dot16("cvec", "cvec")}", 6)} AS pd6
        |        FROM qsl q JOIN cb ON cb.sub = q.sub),
        |cand AS (SELECT p.query_id, a.id FROM probes p JOIN asg a ON a.cell = p.cell
        |         WHERE a.id <> p.query_id),
        |sc AS (SELECT c.query_id, c.id, CAST(sum(l.pd6) AS BIGINT) AS approx_d2_fp6
        |       FROM cand c JOIN enc e ON e.id = c.id
        |       JOIN lut l ON l.query_id = c.query_id AND l.sub = e.sub AND l.code = e.code
        |       GROUP BY 1, 2),
        |topk AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |           ORDER BY approx_d2_fp6, id) AS rk FROM sc)
        |SELECT query_id, id, approx_d2_fp6 FROM topk WHERE rk <= 5
        |ORDER BY query_id, approx_d2_fp6, id""".stripMargin,
    // the ivfpq oracle with kCand=20 retrieval, then exact cosine
    // over ONLY the retrieved ids, re-ranked to k=5
    "sim_ann_rerank" ->
      s"""WITH $pqCtes,
        |enc AS (SELECT id, sub, code FROM best WHERE rn = 1),
        |icents AS (SELECT vec_id AS centroid_id, embedding AS icvec
        |           FROM embeddings, cnt WHERE vec_id % greatest(1, (c + 15) // 16) = 0),
        |ac AS (SELECT e.vec_id, c.centroid_id, ${cosSql("e.embedding", "c.icvec")} AS cosv
        |       FROM embeddings e CROSS JOIN icents c),
        |asg AS (SELECT vec_id AS id, centroid_id AS cell FROM (
        |         SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cosv DESC, centroid_id) AS rn2
        |         FROM ac) WHERE rn2 = 1),
        |pc AS (SELECT q.vec_id AS query_id, c.centroid_id AS cell,
        |         ${cosSql("q.embedding", "c.icvec")} AS cosv
        |       FROM embeddings q CROSS JOIN icents c WHERE q.vec_id % 50 = 0),
        |probes AS (SELECT query_id, cell FROM (
        |         SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosv DESC, cell) AS rn3
        |         FROM pc) WHERE rn3 <= 2),
        |qsl AS (SELECT q.vec_id AS query_id, s.sub,
        |          list_slice(q.embedding, s.sub*16 + 1, s.sub*16 + 16) AS qx
        |        FROM embeddings q, subs s WHERE q.vec_id % 50 = 0),
        |lut AS (SELECT q.query_id, q.sub, cb.code,
        |          ${sqlFp(s"${dot16("qx", "qx")} - 2.0*${dot16("qx", "cvec")} + ${dot16("cvec", "cvec")}", 6)} AS pd6
        |        FROM qsl q JOIN cb ON cb.sub = q.sub),
        |cand AS (SELECT p.query_id, a.id FROM probes p JOIN asg a ON a.cell = p.cell
        |         WHERE a.id <> p.query_id),
        |sc AS (SELECT c.query_id, c.id, CAST(sum(l.pd6) AS BIGINT) AS approx_d2_fp6
        |       FROM cand c JOIN enc e ON e.id = c.id
        |       JOIN lut l ON l.query_id = c.query_id AND l.sub = e.sub AND l.code = e.code
        |       GROUP BY 1, 2),
        |topk AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |           ORDER BY approx_d2_fp6, id) AS rk FROM sc),
        |rr AS (SELECT t.query_id, t.id,
        |         ${sqlFp(cosSql("qv.embedding", "dv.embedding"), 6)} AS cos_fp6
        |       FROM topk t JOIN embeddings dv ON dv.vec_id = t.id
        |       JOIN embeddings qv ON qv.vec_id = t.query_id
        |       WHERE t.rk <= 20)
        |SELECT query_id, id, cos_fp6, CAST(rk AS BIGINT) AS rk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos_fp6 DESC, id) AS rk FROM rr) WHERE rk <= 5
        |ORDER BY query_id, rk""".stripMargin,
    "dd_simhash" -> simhashSql,
    "dd_simhash_pairs" -> simhashPairsSql,
    "dd_simhash64" -> simhash64Sql,
    "dd_simhash64_pairs" -> simhash64PairsSql,
    "dd_prefix_join" ->
      s"""WITH sh0 AS (SELECT doc_id AS doc, unnest(${shinglesSql(3)}) AS s0 FROM documents),
        |ex AS (SELECT doc, ${shingleKeySql("s0")} AS s FROM sh0),
        |sets AS (SELECT doc, list_sort(list(s)) AS st, count(*) AS n FROM ex GROUP BY doc),
        |dfs AS (SELECT s, count(*) AS df FROM ex GROUP BY 1),
        |rk AS (SELECT ex.doc, ex.s,
        |    count(*) OVER (PARTITION BY ex.doc) AS n,
        |    row_number() OVER (PARTITION BY ex.doc ORDER BY dfs.df, ex.s) AS r
        |  FROM ex JOIN dfs USING (s)),
        |pref AS (SELECT doc, s, n FROM rk
        |  WHERE r <= n - CAST(ceil(0.5 * n) AS BIGINT) + 1),
        |cand AS (SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
        |  FROM pref a JOIN pref b ON a.s = b.s AND a.doc < b.doc
        |    AND CAST(b.n AS DOUBLE) >= a.n * 0.5 AND CAST(a.n AS DOUBLE) >= b.n * 0.5),
        |ver AS (SELECT doc_a, doc_b,
        |    CAST(len(list_intersect(x.st, y.st)) AS BIGINT) AS inter,
        |    x.n + y.n - len(list_intersect(x.st, y.st)) AS union_
        |  FROM cand JOIN sets x ON x.doc = doc_a JOIN sets y ON y.doc = doc_b)
        |SELECT doc_a, doc_b, inter, CAST(union_ AS BIGINT) AS union_,
        |  ${sqlFp("CAST(inter AS DOUBLE) / CAST(union_ AS DOUBLE)", 4)} AS jaccard_fp4
        |FROM ver
        |WHERE ${sqlFp("CAST(inter AS DOUBLE) / CAST(union_ AS DOUBLE)", 4)} >= 5000
        |ORDER BY doc_a, doc_b""".stripMargin,
    "dd_ngram_jaccard" ->
      s"""WITH sh0 AS (SELECT doc_id AS doc, unnest(${shinglesSql(3)}) AS s0 FROM documents),
        |sh AS (SELECT doc, ${shingleKeySql("s0")} AS s FROM sh0),
        |sizes AS (SELECT doc, count(*) AS sz FROM sh GROUP BY doc),
        |rare AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 1000),
        |sh2 AS (SELECT sh.doc, sh.s FROM sh JOIN rare USING (s)),
        |inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter
        |          FROM sh2 a JOIN sh2 b ON a.s = b.s AND a.doc < b.doc GROUP BY 1, 2)
        |SELECT doc_a, doc_b, inter, sa.sz + sb.sz - inter AS union_,
        |  ${sqlFp("CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE)", 4)} AS jaccard_fp4
        |FROM inter JOIN sizes sa ON sa.doc = doc_a JOIN sizes sb ON sb.doc = doc_b
        |WHERE ${sqlFp("CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE)", 4)} >= 500
        |ORDER BY doc_a, doc_b""".stripMargin,
    // count-arithmetic cells (C(n,2) same-source, n_a*n_b cross) over
    // per-(hash, source) counts — mirrors the pair-free Spark plan
    "dd_cross_matrix" ->
      """WITH aug AS (SELECT d.doc_id, d.source,
        |    md5(CASE WHEN d.doc_id % 10 = 1 AND b.text IS NOT NULL
        |      THEN b.text ELSE d.text END) AS h
        |  FROM documents d LEFT JOIN documents b ON b.doc_id = d.doc_id - 1),
        |cnt AS (SELECT h, source, count(*) AS n FROM aug GROUP BY 1, 2)
        |SELECT a.source AS source_a, b.source AS source_b,
        |  CAST(sum(CASE WHEN a.source = b.source THEN a.n * (a.n - 1) // 2
        |    ELSE a.n * b.n END) AS BIGINT) AS n_dup_pairs
        |FROM cnt a JOIN cnt b ON a.h = b.h AND a.source <= b.source
        |GROUP BY 1, 2
        |HAVING sum(CASE WHEN a.source = b.source THEN a.n * (a.n - 1) // 2
        |    ELSE a.n * b.n END) > 0
        |ORDER BY 1, 2""".stripMargin,
    // aug corpus + rare-shingle guard mirror the Spark side; the
    // containment formulas divide by each side's own set size
    "dd_containment" ->
      s"""WITH aug0 AS (SELECT d.doc_id,
        |    CASE WHEN d.doc_id % 4 = 1 AND b.text IS NOT NULL
        |      THEN d.text || ' ' || b.text ELSE d.text END AS text
        |  FROM documents d LEFT JOIN documents b ON b.doc_id = d.doc_id - 1),
        |shx0 AS (SELECT doc, len(shs) AS sz, unnest(shs) AS sh0
        |  FROM (SELECT doc_id AS doc, ${shinglesSql(3)} AS shs FROM aug0)),
        |shx AS (SELECT doc, sz, ${shingleKeySql("sh0")} AS sh FROM shx0),
        |rare AS (SELECT sh FROM shx GROUP BY sh HAVING count(*) <= 1000),
        |filt AS (SELECT shx.doc, shx.sz, shx.sh FROM shx JOIN rare USING (sh)),
        |pairs AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter,
        |    min(a.sz) AS sz_a, min(b.sz) AS sz_b
        |  FROM filt a JOIN filt b ON a.sh = b.sh AND a.doc < b.doc GROUP BY 1, 2)
        |SELECT doc_a, doc_b, inter, sz_a, sz_b,
        |  ${sqlFp("CAST(inter AS DOUBLE) / CAST(sz_a AS DOUBLE)", 4)} AS cont_ab_fp4,
        |  ${sqlFp("CAST(inter AS DOUBLE) / CAST(sz_b AS DOUBLE)", 4)} AS cont_ba_fp4
        |FROM pairs
        |WHERE greatest(${sqlFp("CAST(inter AS DOUBLE) / CAST(sz_a AS DOUBLE)", 4)},
        |  ${sqlFp("CAST(inter AS DOUBLE) / CAST(sz_b AS DOUBLE)", 4)}) >= 5000
        |ORDER BY doc_a, doc_b""".stripMargin,
    // positional 8-grams (NOT distinct — every span counts); docs
    // shorter than 8 tokens surface with zeros via the left join
    "dd_dup_ngrams" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
        |pos AS (SELECT doc_id, tk, unnest(range(1, len(tk) - 6)) AS i
        |  FROM toks WHERE len(tk) >= 8),
        |grams AS (SELECT doc_id,
        |    ${shingleKeySql("array_to_string(tk[CAST(i AS INT):CAST(i AS INT) + 7], ' ')")} AS gram FROM pos),
        |pg AS (SELECT doc_id, gram, count(*) AS k FROM grams GROUP BY 1, 2),
        |tot AS (SELECT gram, sum(k) AS tot FROM pg GROUP BY 1),
        |agg AS (SELECT doc_id, sum(k) AS n_grams,
        |    sum(CASE WHEN tot > 1 THEN k ELSE 0 END) AS n_dup
        |  FROM pg JOIN tot USING (gram) GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
        |  CAST(coalesce(n_dup, 0) AS BIGINT) AS n_dup_grams,
        |  CASE WHEN coalesce(n_grams, 0) = 0 THEN CAST(0 AS BIGINT)
        |    ELSE ${sqlFp("CAST(n_dup AS DOUBLE) / CAST(n_grams AS DOUBLE)", 4)}
        |  END AS dup_frac_fp4
        |FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,
    "dd_embed_neardup" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  ${sqlFp(cosSql("a.embedding", "b.embedding"), 6)} AS cos_fp6
        |FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE ${sqlFp(cosSql("a.embedding", "b.embedding"), 6)} >= 200000
        |ORDER BY id_a, id_b""".stripMargin,
    // MRL recall mirror: per-dim rank windows over the same cross
    // join, overlap counted against the full-dim top-5
    "emb_mrl_recall" -> {
      def topkCte(name: String, d: Int): String =
        s"""$name AS (SELECT query_id, id FROM (
           |  SELECT query_id, id, row_number() OVER (PARTITION BY query_id
           |    ORDER BY ${sqlFp(cosSqlD("vec", "qvec", d), 6)} DESC, id) AS rk FROM sc)
           |  WHERE rk <= 5)""".stripMargin
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id % 50 = 0),
        |sc AS (SELECT q.query_id, e.vec_id AS id, e.embedding AS vec, q.qvec
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
        |${topkCte("fullk", 64)},
        |${topkCte("t16", 16)},
        |${topkCte("t32", 32)},
        |h16 AS (SELECT t16.query_id, count(*) AS n_hit FROM t16 JOIN fullk USING (query_id, id) GROUP BY 1),
        |h32 AS (SELECT t32.query_id, count(*) AS n_hit FROM t32 JOIN fullk USING (query_id, id) GROUP BY 1),
        |u AS (
        |  SELECT CAST(16 AS INT) AS dim, q.query_id, CAST(coalesce(h16.n_hit, 0) AS BIGINT) AS n_hit
        |    FROM q LEFT JOIN h16 USING (query_id)
        |  UNION ALL
        |  SELECT CAST(32 AS INT) AS dim, q.query_id, CAST(coalesce(h32.n_hit, 0) AS BIGINT) AS n_hit
        |    FROM q LEFT JOIN h32 USING (query_id))
        |SELECT dim, query_id, n_hit,
        |  ${sqlFp("CAST(n_hit AS DOUBLE) / 5.0", 4)} AS recall_fp4
        |FROM u ORDER BY dim, query_id""".stripMargin
    },
    "sim_topk" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings ORDER BY vec_id LIMIT 1)
        |SELECT vec_id, ${sqlFp(cosSql("embedding", "qvec"), 6)} AS cos_fp6
        |FROM embeddings, q WHERE vec_id != qid
        |ORDER BY 2 DESC, vec_id LIMIT 10""".stripMargin,
    "sim_maxsim" ->
      s"""WITH e AS (SELECT vec_id, embedding, vec_id // 4 AS grp FROM embeddings),
        |q AS (SELECT grp AS qgrp, vec_id AS qtok, embedding AS qvec FROM e WHERE grp < 2),
        |tok AS (SELECT qgrp, qtok, e.grp, max(${sqlFp(cosSql("embedding", "qvec"), 6)}) AS mx
        |        FROM e, q WHERE e.grp != qgrp GROUP BY 1, 2, 3),
        |d AS (SELECT qgrp, grp, CAST(sum(mx) AS BIGINT) AS maxsim_fp6 FROM tok GROUP BY 1, 2),
        |r AS (SELECT qgrp, grp, maxsim_fp6,
        |        CAST(row_number() OVER (PARTITION BY qgrp ORDER BY maxsim_fp6 DESC, grp) AS INT) AS rnk
        |      FROM d)
        |SELECT qgrp, grp, maxsim_fp6, rnk FROM r WHERE rnk <= 5 ORDER BY qgrp, rnk""".stripMargin,
    "txt_langid" ->
      s"SELECT doc_id, $langIdSql AS lang_pred FROM documents ORDER BY doc_id",
    "txt_langid_ngram" -> {
      val scores = TextAnalysis.DefaultTrigramProfiles.map { case (lang, grams) =>
        val inList = grams.map(g => s"'${g.replace("'", "''")}'").mkString(", ")
        lang -> (s"len(list_filter(CASE WHEN length(lower(text)) < 3 THEN [] " +
          s"ELSE list_transform(range(1, length(lower(text)) - 1), i -> substr(lower(text), CAST(i AS INT), 3)) END, " +
          s"g -> g IN ($inList)))")
      }
      val best = s"greatest(${scores.map(_._2).mkString(", ")})"
      val cases = scores.map { case (lang, e) => s"WHEN $e = $best THEN '$lang'" }.mkString(" ")
      s"SELECT doc_id, CASE $cases END AS lang_pred FROM documents ORDER BY doc_id"
    },
    "txt_langid_eval" -> {
      val scores = TextAnalysis.DefaultTrigramProfiles.map { case (lang, grams) =>
        val inList = grams.map(g => s"'${g.replace("'", "''")}'").mkString(", ")
        lang -> (s"len(list_filter(CASE WHEN length(lower(text)) < 3 THEN [] " +
          s"ELSE list_transform(range(1, length(lower(text)) - 1), i -> substr(lower(text), CAST(i AS INT), 3)) END, " +
          s"g -> g IN ($inList)))")
      }
      val best = s"greatest(${scores.map(_._2).mkString(", ")})"
      val cases = scores.map { case (lang, e) => s"WHEN $e = $best THEN '$lang'" }.mkString(" ")
      s"""WITH p AS (SELECT lang, $langIdSql AS ps, CASE $cases END AS pg FROM documents),
        |a AS (SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN ps = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_stop_ok,
        |  CAST(sum(CASE WHEN pg = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_gram_ok,
        |  CAST(sum(CASE WHEN ps = pg THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
        |FROM p GROUP BY 1)
        |SELECT lang, n_docs, n_stop_ok, n_gram_ok, n_agree,
        |  ${sqlFp("CAST(n_stop_ok AS DOUBLE) / CAST(n_docs AS DOUBLE)", 4)} AS acc_stop_fp4,
        |  ${sqlFp("CAST(n_gram_ok AS DOUBLE) / CAST(n_docs AS DOUBLE)", 4)} AS acc_gram_fp4,
        |  ${sqlFp("CAST(n_agree AS DOUBLE) / CAST(n_docs AS DOUBLE)", 4)} AS agree_fp4
        |FROM a ORDER BY 1""".stripMargin
    },
    "txt_quality" ->
      s"""SELECT doc_id, CAST(length(text) AS INT) AS n_chars,
        | CAST(len($toksSql) AS BIGINT) AS n_words,
        | ${sqlFp("CAST(length(text) AS DOUBLE) / CAST(CASE WHEN len(" + toksSql + ") = 0 THEN 1 ELSE len(" + toksSql + ") END AS DOUBLE)", 2)} AS mean_word_len_fp2,
        | ${sqlFp("CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) / CAST(CASE WHEN length(text) = 0 THEN 1 ELSE length(text) END AS DOUBLE)", 4)} AS punct_ratio_fp4,
        | ${sqlFp("CAST(len(list_filter(" + toksSql + ", t -> t IN ('the','a','of','and','fast','slow'))) AS DOUBLE) / CAST(CASE WHEN len(" + toksSql + ") = 0 THEN 1 ELSE len(" + toksSql + ") END AS DOUBLE)", 4)} AS stopword_ratio_fp4
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the identical BPE walk as a recursive CTE over a bracketed
    // string form (token t ↦ \x01 t \x02, concatenated): a pair
    // merge is then exactly `replace(s, \x01a\x02\x01b\x02,
    // \x01ab\x02)` — string replace IS left-to-right non-overlapping,
    // and the brackets make containment ⇔ whole-token adjacency.
    // Each recursion step picks the lowest-rank pattern PRESENT
    // (correlated scalar subquery over the rank table) and applies
    // one merge pass; rows exit when no pattern applies. The state
    // string strictly shrinks per step, so termination is structural.
    // PRECONDITION (shared by both engines): document text contains
    // none of U+0000/U+0001/U+0002 — the Spark expression keys merge
    // pairs with a \u0000 separator and this oracle brackets tokens
    // with chr(1)/chr(2), so a control char reaching the tokenizer
    // (each would become a single-char token under WordPattern)
    // corrupts the bracketed form / rank keys and the two engines
    // diverge as an opaque hash mismatch. Real corpora satisfy this
    // after txt_normalize-style ingest cleanup; synthetic testdata
    // is ASCII printable by construction.
    "txt_bpe_tokens" ->
      s"""WITH RECURSIVE
        |merges AS (
        |  SELECT rank, chr(1) || a || chr(2) || chr(1) || b || chr(2) AS pat,
        |    chr(1) || a || b || chr(2) AS rep
        |  FROM (VALUES $bpeMergesValues) m(rank, a, b)),
        |words AS (
        |  SELECT doc_id, unnest(range(len(ws))) AS wi, ws
        |  FROM (SELECT doc_id,
        |      regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]') AS ws
        |    FROM documents)),
        |init AS (
        |  SELECT doc_id, wi,
        |    regexp_replace(ws[wi + 1], '(.)', chr(1) || '\\1' || chr(2), 'g') AS s
        |  FROM words),
        |steps AS (
        |  SELECT doc_id, wi, s FROM init
        |  UNION ALL
        |  SELECT doc_id, wi,
        |    replace(s,
        |      (SELECT pat FROM merges WHERE contains(s, pat) ORDER BY rank LIMIT 1),
        |      (SELECT rep FROM merges WHERE contains(s, pat) ORDER BY rank LIMIT 1)) AS s
        |  FROM steps
        |  WHERE EXISTS (SELECT 1 FROM merges WHERE contains(s, pat))),
        |fin AS (
        |  SELECT doc_id, wi, s FROM steps
        |  WHERE NOT EXISTS (SELECT 1 FROM merges WHERE contains(s, pat))),
        |per_doc AS (
        |  SELECT doc_id,
        |    CAST(sum(len(s) - len(replace(s, chr(2), ''))) AS BIGINT) AS n_bpe_tokens,
        |    string_agg(trim(replace(s, chr(2) || chr(1), ' '), chr(1) || chr(2)),
        |      ' ' ORDER BY wi) AS bpe_text
        |  FROM fin GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(p.n_bpe_tokens, 0) AS n_bpe_tokens,
        |  coalesce(p.bpe_text, '') AS bpe_text
        |FROM documents d LEFT JOIN per_doc p USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "txt_tokens" ->
      s"""SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_ws_tokens,
        | CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_word_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "txt_normalize" ->
      """SELECT doc_id,
        | trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]+', ' ', 'g'), '\s+', ' ', 'g')) AS norm_text
        |FROM documents ORDER BY doc_id""".stripMargin,
    "txt_stopword_remove" ->
      s"""SELECT doc_id,
        | array_to_string(list_filter($toksSql, t -> t NOT IN ('the','a','of','and','fast','slow')), ' ') AS clean_text
        |FROM documents ORDER BY doc_id""".stripMargin,
    "txt_gopher" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
        |s AS (SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    CASE WHEN len(toks) = 0 THEN 1 ELSE len(toks) END AS nw,
        |    coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS sumlen,
        |    len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS alpha_cnt,
        |    len(regexp_extract_all(text, '#|\\.\\.\\.')) AS sym_cnt,
        |    CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','fast','slow'))) AS BIGINT) AS stop_hits
        |  FROM t),
        |q AS (SELECT doc_id, n_words,
        |    ${sqlFp("CAST(sumlen AS DOUBLE) / CAST(nw AS DOUBLE)", 2)} AS mean_wlen_fp2,
        |    ${sqlFp("CAST(alpha_cnt AS DOUBLE) / CAST(nw AS DOUBLE)", 4)} AS alpha_frac_fp4,
        |    ${sqlFp("CAST(sym_cnt AS DOUBLE) / CAST(nw AS DOUBLE)", 4)} AS sym_ratio_fp4,
        |    stop_hits
        |  FROM s)
        |SELECT *, CAST(CASE WHEN n_words >= 50 AND n_words <= 100000
        |    AND mean_wlen_fp2 >= 300 AND mean_wlen_fp2 <= 1000
        |    AND alpha_frac_fp4 >= 8000 AND sym_ratio_fp4 <= 1000
        |    AND stop_hits >= 2 THEN 1 ELSE 0 END AS BIGINT) AS keep_flag
        |FROM q ORDER BY doc_id""".stripMargin,
    "txt_charlm" ->
      s"""WITH norm AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]+', ' ', 'g'), '\\s+', ' ', 'g')) AS t
        |  FROM documents),
        |pos AS (SELECT doc_id, t, unnest(range(1, greatest(length(t) - 1, 1))) AS i FROM norm),
        |tri AS (SELECT doc_id, substr(t, CAST(i AS INT), 2) AS ctx, substr(t, CAST(i AS INT) + 2, 1) AS c FROM pos),
        |model AS (SELECT ctx, c, count(*) AS cnt FROM tri GROUP BY 1, 2),
        |ctxt AS (SELECT ctx, count(*) AS tot FROM tri GROUP BY 1),
        |vocab AS (SELECT count(DISTINCT c) AS v FROM tri)
        |SELECT tri.doc_id, count(*) AS n_tri,
        |  CAST(sum(${sqlFp("CAST(cnt + 1 AS DOUBLE) / CAST(tot + v AS DOUBLE)", 6)}) AS BIGINT) AS sum_p_fp6
        |FROM tri JOIN model USING (ctx, c) JOIN ctxt USING (ctx) CROSS JOIN vocab
        |GROUP BY tri.doc_id ORDER BY doc_id""".stripMargin,
    // the txt_charlm model CTEs trained TWICE (target slice + full
    // corpus); score = exact fp6 probability difference per position
    "smp_dsir" ->
      s"""WITH norm AS (SELECT doc_id, lang = 'en' AS is_t,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]+', ' ', 'g'), '\\s+', ' ', 'g')) AS t
        |  FROM documents),
        |pos AS (SELECT doc_id, is_t, t, unnest(range(1, greatest(length(t) - 1, 1))) AS i FROM norm),
        |tri AS (SELECT doc_id, is_t, substr(t, CAST(i AS INT), 2) AS ctx, substr(t, CAST(i AS INT) + 2, 1) AS c FROM pos),
        |mc AS (SELECT ctx, c, count(*) AS cnt_c FROM tri GROUP BY 1, 2),
        |mt AS (SELECT ctx, c, count(*) AS cnt_t FROM tri WHERE is_t GROUP BY 1, 2),
        |cc AS (SELECT ctx, CAST(sum(cnt_c) AS BIGINT) AS tot_c FROM mc GROUP BY 1),
        |ct AS (SELECT ctx, CAST(sum(cnt_t) AS BIGINT) AS tot_t FROM mt GROUP BY 1),
        |vocab AS (SELECT count(DISTINCT c) AS v FROM mc),
        |scd AS (SELECT tri.doc_id,
        |    ${sqlFp("CAST(coalesce(cnt_t, 0) + 1 AS DOUBLE) / CAST(coalesce(tot_t, 0) + v AS DOUBLE)", 6)} AS pt6,
        |    ${sqlFp("CAST(cnt_c + 1 AS DOUBLE) / CAST(tot_c + v AS DOUBLE)", 6)} AS pc6
        |  FROM tri JOIN mc USING (ctx, c) JOIN cc USING (ctx)
        |    LEFT JOIN mt USING (ctx, c) LEFT JOIN ct USING (ctx) CROSS JOIN vocab)
        |SELECT doc_id, count(*) AS n_tri, CAST(sum(pt6 - pc6) AS BIGINT) AS dsir_fp6,
        |  CAST(CASE WHEN CAST(sum(pt6 - pc6) AS BIGINT) > 0 THEN 1 ELSE 0 END AS BIGINT) AS keep_flag
        |FROM scd GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "txt_pii_mask" ->
      """SELECT doc_id, regexp_replace(regexp_replace(
        |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or 555-'
        |      || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-4567 now',
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS masked
        |FROM documents ORDER BY doc_id""".stripMargin,
    "txt_dedup_tokens" -> {
      val augToks = toksSql.replace("lower(text)", "lower(text || ' go go stop stop stop end')")
      s"""SELECT doc_id, array_to_string(
        |  list_filter($augToks, (t, i) -> i = 1 OR t != ($augToks)[i - 1]), ' ') AS clean_text
        |FROM documents ORDER BY doc_id""".stripMargin
    },
    "emb_quantize" ->
      s"""WITH sc AS (
        |  SELECT vec_id,
        |    CASE WHEN mx = 0 THEN 1.0 ELSE 127.0 / mx END AS scale
        |  FROM (SELECT vec_id, list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS mx
        |        FROM embeddings) m)
        |SELECT e.vec_id, ${sqlFp("scale", 6)} AS scale_fp6, CAST(i - 1 AS INT) AS pos,
        |  CAST(floor(CAST(e.embedding[i] AS DOUBLE) * scale + 0.5) AS INT) AS q
        |FROM embeddings e JOIN sc ON sc.vec_id = e.vec_id CROSS JOIN range(1, 65) t(i)
        |ORDER BY e.vec_id, pos""".stripMargin,
    "emb_prototypes" ->
      // argmin Σ(q_d·n − s_d)² — the per-class mean cleared of /n;
      // everything integer after the shared fp3 quantization
      """WITH q AS (SELECT vec_id, label,
        |    list_transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE)*1e3+0.5) AS BIGINT)) AS qv
        |  FROM embeddings),
        |cn AS (SELECT label, count(*) AS n FROM q GROUP BY 1),
        |cd AS (SELECT label, i AS d, CAST(sum(qv[i]) AS BIGINT) AS sd
        |       FROM q CROSS JOIN range(1, 65) t(i) GROUP BY 1, 2),
        |dist AS (SELECT q.vec_id, q.label, cn.n,
        |    CAST(sum((qv[d] * n - sd) * (qv[d] * n - sd)) AS BIGINT) AS dist
        |  FROM q JOIN cn USING (label) JOIN cd ON cd.label = q.label
        |  GROUP BY 1, 2, 3),
        |m AS (SELECT label, min(dist) AS min_dist FROM dist GROUP BY 1)
        |SELECT dist.label AS label, min(vec_id) AS proto_id, min_dist, n
        |FROM dist JOIN m ON m.label = dist.label AND dist.dist = m.min_dist
        |GROUP BY dist.label, min_dist, n ORDER BY dist.label""".stripMargin,
    // squared norm via the strict left-fold dot, fp2 histogram,
    // all-integer Tukey fences — mirrors the Spark expression exactly
    "emb_outliers" ->
      s"""WITH sq AS (SELECT vec_id,
        |    ${sqlFp(dotSql("embedding", "embedding"), 2)} AS sqn_c2 FROM embeddings),
        |h AS (SELECT sqn_c2 AS v, count(*) AS k FROM sq GROUP BY 1),
        |h2 AS (SELECT v, sum(k) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(k) OVER () AS n FROM h),
        |f AS (SELECT min(CASE WHEN cum >= (n + 3) // 4 THEN v END) AS q1,
        |    min(CASE WHEN cum >= (3 * n + 3) // 4 THEN v END) AS q3 FROM h2)
        |SELECT vec_id, sqn_c2, q1, q3,
        |  CAST(CASE WHEN sqn_c2 * 2 < q1 * 2 - (q3 - q1) * 3
        |    OR sqn_c2 * 2 > q3 * 2 + (q3 - q1) * 3 THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
        |FROM sq CROSS JOIN f ORDER BY vec_id""".stripMargin,
    "txt_tfidf" ->
      s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents)
        |SELECT doc_id, term, tf, count(*) OVER (PARTITION BY term) AS df,
        |  ${sqlFp("CAST(tf AS DOUBLE) * ln(n / CAST(count(*) OVER (PARTITION BY term) AS DOUBLE))", 4)} AS tfidf_fp4
        |FROM tf, n ORDER BY doc_id, term""".stripMargin,
    "txt_collocations" ->
      s"""WITH toks0 AS (SELECT doc_id, $toksSql AS tk FROM documents),
        |pos AS (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i FROM toks0),
        |big AS (SELECT tk[CAST(i AS INT)] AS w1, tk[CAST(i AS INT) + 1] AS w2 FROM pos),
        |cnt AS (SELECT w1, w2, count(*) AS n_xy FROM big GROUP BY 1, 2),
        |lm AS (SELECT w1, CAST(sum(n_xy) AS BIGINT) AS n_x FROM cnt GROUP BY 1),
        |rm AS (SELECT w2, CAST(sum(n_xy) AS BIGINT) AS n_y FROM cnt GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_xy) AS BIGINT) AS n_tot FROM cnt)
        |SELECT w1, w2, n_xy,
        |  ${sqlFp("(CAST(n_xy AS DOUBLE) * CAST(n_tot AS DOUBLE)) / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE))", 4)} AS lift_fp4
        |FROM cnt JOIN lm USING (w1) JOIN rm USING (w2) CROSS JOIN tot
        |WHERE n_xy >= 5 ORDER BY w1, w2""".stripMargin,
    "txt_html_extract" ->
      s"""WITH h AS (SELECT doc_id,
        |  '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
        |  '</title><script type="text/javascript">var x = 1 < 2;</script>' ||
        |  '<style>.nav{color:red}</style></head><body><nav>home &amp; links</nav><p>' ||
        |  text ||
        |  '</p><div class="footer">&copy; 2024 &lt;Example&gt;&nbsp;Corp</div></body></html>' AS html
        |  FROM documents),
        |c AS (SELECT doc_id, html,
        |  trim(regexp_replace(
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(html, '<script[^>]*>[\\s\\S]*?</script>', ' ', 'g'),
        |          '<style[^>]*>[\\s\\S]*?</style>', ' ', 'g'),
        |        '<[^>]*>', ' ', 'g'),
        |      '&amp;', '&', 'g'), '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&nbsp;', ' ', 'g'), '&copy;', '(c)', 'g'),
        |    '\\s+', ' ', 'g')) AS extracted FROM h)
        |SELECT doc_id, extracted, CAST(length(html) AS BIGINT) AS n_chars_raw,
        |  CAST(length(extracted) AS BIGINT) AS n_chars_text,
        |  ${sqlFp("CAST(1.0 AS DOUBLE) - CAST(length(extracted) AS DOUBLE) / CAST(length(html) AS DOUBLE)", 4)} AS boilerplate_ratio_fp4
        |FROM c ORDER BY doc_id""".stripMargin,
    // the oracle never sees the WET bytes: it recomputes the expected
    // output straight from documents, so the whole write→read loop
    // must reproduce every payload byte to hash-match
    "src_wet_roundtrip" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS h
        |FROM documents ORDER BY doc_id""".stripMargin,
    // same discipline for the JSONL loop: the oracle reads documents
    // directly — the export/read-back must round-trip every code
    // point for the md5 to land
    "src_jsonl_roundtrip" ->
      """SELECT doc_id, lang, source,
        |  CAST(length(text) AS BIGINT) AS n_chars_rt, md5(text) AS h
        |FROM documents ORDER BY doc_id""".stripMargin,
    // PCM 2× decimation: every output sample recomputed closed-form
    // from doc_id; floor through a double because DuckDB's //
    // truncates on negative sums while the Spark side's arithmetic
    // shift floors
    "mm_audio_resample" ->
      """WITH d AS (SELECT doc_id, doc_id % 200 + 50 AS n FROM documents),
        |o AS (SELECT doc_id, unnest(range(0, n // 2)) AS k FROM d),
        |sm AS (SELECT doc_id, CAST(floor(CAST(
        |    ((doc_id * 31 + (2 * k) * (2 * k) * 7) % 65536 - 32768) +
        |    ((doc_id * 31 + (2 * k + 1) * (2 * k + 1) * 7) % 65536 - 32768)
        |    AS DOUBLE) / 2) AS BIGINT) AS v
        |  FROM o)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_out,
        |  CAST(sum(v) AS BIGINT) AS sum_out, min(v) AS min_out, max(v) AS max_out
        |FROM sm GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "txt_fingerprint" ->
      """SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |  list_transform(range(1, least(length(text), 64) + 1),
        |    i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT))),
        |  (a, x) -> (a*31 + x) % 2147483647) AS fp_hash
        |FROM documents ORDER BY doc_id""".stripMargin,
    // winnowing: per-window min via list_min over the hash slice,
    // rightmost position = list_max over index-or-null, DISTINCT
    // collapses a selection persisting across consecutive windows —
    // the same three rules the native deque implements
    "txt_winnow" ->
      s"""WITH ${winnowCoreSql("documents")}
        |SELECT DISTINCT doc_id, CAST(pos AS INT) AS pos, fp FROM wsel
        |ORDER BY doc_id, pos""".stripMargin,
    // winnow-pair matching (the MOSS step): distinct doc fingerprints,
    // boilerplate-fp guard, self-join, >= minShared threshold — the
    // aug corpus mirrors dd_containment's planted embeddings so pairs
    // provably exist at every SF (shared run >= n+w-1 tokens)
    "dd_winnow_pairs" ->
      s"""WITH aug1 AS (SELECT d.doc_id,
        |    CASE WHEN d.doc_id % 4 = 1 AND b.text IS NOT NULL
        |      THEN d.text || ' ' || b.text ELSE d.text END AS text
        |  FROM documents d LEFT JOIN documents b ON b.doc_id = d.doc_id - 1),
        |${winnowCoreSql("aug1")},
        |fps AS (SELECT DISTINCT doc_id AS doc, fp FROM wsel),
        |rare AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 1000),
        |f2 AS (SELECT fps.doc, fps.fp FROM fps JOIN rare USING (fp))
        |SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS n_shared
        |FROM f2 a JOIN f2 b ON a.fp = b.fp AND a.doc < b.doc
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY doc_a, doc_b""".stripMargin,
    // Flesch–Kincaid: exact integer counts (whitespace tokens, [.!?]+
    // runs floored at 1, [aeiouy]+ vowel groups), then the grade in
    // the same double op order as the Spark side
    "txt_readability" ->
      s"""WITH c AS (SELECT doc_id,
        |  CAST(len($toksSql) AS BIGINT) AS n_words,
        |  CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT) AS n_sentences,
        |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
        |  FROM documents)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CASE WHEN n_words = 0 THEN CAST(0 AS BIGINT)
        |    ELSE ${sqlFp("0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)) + " +
             "11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) - 15.59", 4)}
        |  END AS fk_grade_fp4
        |FROM c ORDER BY doc_id""".stripMargin,
    // BPE learn: 3 unrolled merge iterations; the greedy
    // left-to-right application is the same tail-token fold as the
    // Spark side, the chars come from the charlm substr convention
    "txt_bpe_learn" -> {
      val bgFrom = (v: String) =>
        s"""(SELECT c, unnest(list_transform(range(1, len(string_split(sym, ' '))),
           | i -> string_split(sym, ' ')[CAST(i AS INT)] || ' ' ||
           |      string_split(sym, ' ')[CAST(i AS INT) + 1])) AS g FROM $v)"""
          .stripMargin.replace("\n", " ")
      val mergeFold =
        """list_reduce(list_prepend('', string_split(sym, ' ')), (acc, cur) ->
          | CASE WHEN cur = mb AND acc = ma THEN mm
          |      WHEN cur = mb AND length(acc) > length(ma)
          |           AND substr(acc, length(acc) - length(ma), length(ma) + 1) = ' ' || ma
          |        THEN substr(acc, 1, length(acc) - length(ma) - 1) || ' ' || mm
          |      WHEN acc = '' THEN cur
          |      ELSE acc || ' ' || cur END)""".stripMargin.replace("\n", " ")
      s"""WITH toks AS (SELECT unnest($toksSql) AS w FROM documents),
        |v0 AS (SELECT w, count(*) AS c,
        |    array_to_string(list_transform(range(1, length(w) + 1),
        |      i -> substr(w, CAST(i AS INT), 1)), ' ') AS sym
        |  FROM toks GROUP BY w),
        |p1 AS (SELECT g, CAST(sum(c) AS BIGINT) AS cnt FROM ${bgFrom("v0")} GROUP BY 1),
        |t1 AS (SELECT g AS m_g, cnt FROM p1 ORDER BY cnt DESC, g LIMIT 1),
        |m1 AS (SELECT m_g, cnt, split_part(m_g, ' ', 1) AS ma,
        |    split_part(m_g, ' ', 2) AS mb, replace(m_g, ' ', '') AS mm FROM t1),
        |v1 AS (SELECT w, c, $mergeFold AS sym FROM v0 CROSS JOIN m1),
        |p2 AS (SELECT g, CAST(sum(c) AS BIGINT) AS cnt FROM ${bgFrom("v1")} GROUP BY 1),
        |t2 AS (SELECT g AS m_g, cnt FROM p2 ORDER BY cnt DESC, g LIMIT 1),
        |m2 AS (SELECT m_g, cnt, split_part(m_g, ' ', 1) AS ma,
        |    split_part(m_g, ' ', 2) AS mb, replace(m_g, ' ', '') AS mm FROM t2),
        |v2 AS (SELECT w, c, $mergeFold AS sym FROM v1 CROSS JOIN m2),
        |p3 AS (SELECT g, CAST(sum(c) AS BIGINT) AS cnt FROM ${bgFrom("v2")} GROUP BY 1),
        |t3 AS (SELECT g AS m_g, cnt FROM p3 ORDER BY cnt DESC, g LIMIT 1),
        |m3 AS (SELECT m_g, cnt, split_part(m_g, ' ', 1) AS ma,
        |    split_part(m_g, ' ', 2) AS mb, replace(m_g, ' ', '') AS mm FROM t3),
        |v3 AS (SELECT w, c, $mergeFold AS sym FROM v2 CROSS JOIN m3),
        |tt1 AS (SELECT CAST(sum(c * len(string_split(sym, ' '))) AS BIGINT) AS tot_syms FROM v1),
        |tt2 AS (SELECT CAST(sum(c * len(string_split(sym, ' '))) AS BIGINT) AS tot_syms FROM v2),
        |tt3 AS (SELECT CAST(sum(c * len(string_split(sym, ' '))) AS BIGINT) AS tot_syms FROM v3)
        |SELECT CAST(1 AS BIGINT) AS step, m_g AS pair, mm AS merged, cnt AS cnt_w, tot_syms FROM m1, tt1
        |UNION ALL SELECT CAST(2 AS BIGINT), m_g, mm, cnt, tot_syms FROM m2, tt2
        |UNION ALL SELECT CAST(3 AS BIGINT), m_g, mm, cnt, tot_syms FROM m3, tt3
        |ORDER BY step""".stripMargin
    },
    // RAKE: the fold→delimiter→split phrase extraction replicated
    // with list_reduce, integer word/phrase scores
    "txt_keywords" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS tk FROM documents),
        |m AS (SELECT doc_id, list_reduce(list_prepend('', list_transform(tk,
        |    t -> CASE WHEN t IN ('the','a','of','and','fast','slow') THEN '|'
        |         ELSE ' ' || t END)), (acc, x) -> acc || x) AS mm FROM tk),
        |occ AS (SELECT doc_id, trim(p) AS phrase
        |  FROM m, unnest(string_split(mm, '|')) u(p) WHERE length(trim(p)) > 0),
        |pw AS (SELECT doc_id, phrase, len(string_split(phrase, ' ')) AS plen,
        |    unnest(string_split(phrase, ' ')) AS w FROM occ),
        |ws AS (SELECT w, (1000 * CAST(sum(plen) AS BIGINT)) // count(*) AS wscore
        |  FROM pw GROUP BY 1),
        |dp AS (SELECT DISTINCT doc_id, phrase FROM occ),
        |dpw AS (SELECT doc_id, phrase, len(string_split(phrase, ' ')) AS plen,
        |    unnest(string_split(phrase, ' ')) AS w FROM dp)
        |SELECT doc_id, phrase, CAST(max(plen) AS BIGINT) AS n_words,
        |  CAST(sum(wscore) AS BIGINT) AS score_i
        |FROM dpw JOIN ws USING (w) GROUP BY 1, 2
        |ORDER BY doc_id, score_i DESC, phrase""".stripMargin,
    // BM25 over the top-20-df query terms: tf/df/dl from the shared
    // token table, score in the identical double op order (ln both
    // engines — the txt_tfidf precedent), rank on the fp4 score +
    // doc_id so ties cut identically
    "txt_bm25" ->
      s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |q AS (SELECT term, df FROM df ORDER BY df DESC, term LIMIT 20),
        |st AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
        |            (SELECT CAST(sum(dl) AS DOUBLE) FROM dl) AS tot),
        |scored AS (SELECT tf.term, tf.doc_id, tf.tf,
        |  ${sqlFp("ln((CAST(n_docs AS DOUBLE) - CAST(q.df AS DOUBLE) + 0.5) / (CAST(q.df AS DOUBLE) + 0.5) + 1.0) * " +
             "(CAST(tf.tf AS DOUBLE) * 2.2 / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) / (tot / CAST(n_docs AS DOUBLE)))))) ", 4)} AS bm25_fp4
        |  FROM tf JOIN q USING (term) JOIN dl USING (doc_id) CROSS JOIN st),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY term ORDER BY bm25_fp4 DESC, doc_id) AS r
        |  FROM scored)
        |SELECT term, doc_id, tf, bm25_fp4 FROM rk WHERE r <= 10
        |ORDER BY term, bm25_fp4 DESC, doc_id""".stripMargin,
    // phrase = globally most frequent bigram (count desc, bigram asc);
    // postings pruned to the two phrase terms, adjacency on pos+1
    "txt_phrase_search" ->
      s"""WITH tk0 AS (SELECT doc_id, $toksSql AS tk FROM documents),
        |bpos AS (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i FROM tk0),
        |big AS (SELECT tk[CAST(i AS INT)] || ' ' || tk[CAST(i AS INT) + 1] AS g FROM bpos),
        |cnt AS (SELECT g, count(*) AS c FROM big GROUP BY 1),
        |top AS (SELECT string_split(g, ' ')[1] AS w1, string_split(g, ' ')[2] AS w2
        |  FROM cnt ORDER BY c DESC, g LIMIT 1),
        |pos AS (SELECT doc_id, CAST(i AS BIGINT) - 1 AS pos, tk[CAST(i AS INT)] AS tok
        |  FROM tk0, unnest(range(1, len(tk) + 1)) t(i)),
        |m1 AS (SELECT doc_id, pos AS p1, w1, w2 FROM pos, top WHERE tok = w1),
        |m2 AS (SELECT doc_id, pos AS p2 FROM pos, top WHERE tok = w2)
        |SELECT m1.doc_id, w1, w2, count(*) AS n_matches, min(p1) AS first_pos
        |FROM m1 JOIN m2 ON m1.doc_id = m2.doc_id AND m2.p2 = m1.p1 + 1
        |GROUP BY 1, 2, 3 ORDER BY m1.doc_id""".stripMargin,
    // 2×2 χ² on exact per-arm integers; the double expression mirrors
    // the Spark op order term for term
    "ev_ab_test" ->
      s"""WITH u AS (SELECT user_id, epoch_ms(ts) // 86400000 AS day,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY 1, 2),
        |arms AS (SELECT (user_id + day) % 2 AS arm, count(*) AS n, CAST(sum(conv) AS BIGINT) AS k
        |  FROM u GROUP BY 1),
        |a AS (SELECT n AS units_a, k AS conv_a FROM arms WHERE arm = 0),
        |b AS (SELECT n AS units_b, k AS conv_b FROM arms WHERE arm = 1)
        |SELECT units_a, conv_a, units_b, conv_b,
        |  ${sqlFp("CAST(conv_a AS DOUBLE) / CAST(units_a AS DOUBLE)", 6)} AS rate_a_fp6,
        |  ${sqlFp("CAST(conv_b AS DOUBLE) / CAST(units_b AS DOUBLE)", 6)} AS rate_b_fp6,
        |  CASE WHEN conv_a + conv_b = 0 OR (units_a - conv_a) + (units_b - conv_b) = 0
        |    THEN CAST(0 AS BIGINT)
        |    ELSE ${sqlFp("CAST(units_a + units_b AS DOUBLE) * " +
             "(CAST(conv_a AS DOUBLE) * CAST(units_b - conv_b AS DOUBLE) - CAST(units_a - conv_a AS DOUBLE) * CAST(conv_b AS DOUBLE)) * " +
             "(CAST(conv_a AS DOUBLE) * CAST(units_b - conv_b AS DOUBLE) - CAST(units_a - conv_a AS DOUBLE) * CAST(conv_b AS DOUBLE)) / " +
             "((CAST(units_a AS DOUBLE) * CAST(units_b AS DOUBLE)) * " +
             "((CAST(conv_a AS DOUBLE) + CAST(conv_b AS DOUBLE)) * (CAST(units_a - conv_a AS DOUBLE) + CAST(units_b - conv_b AS DOUBLE))))", 4)}
        |  END AS chi2_fp4
        |FROM a CROSS JOIN b""".stripMargin,
    "ev_kmv_distinct" -> {
      val u32 = """list_reduce(list_prepend(CAST(0 AS BIGINT),
        | list_transform(range(1, 9),
        |   i -> CAST(strpos('0123456789abcdef',
        |          substr(md5('kmv:' || CAST(user_id AS VARCHAR)), CAST(i AS INT), 1)) - 1 AS BIGINT))),
        | (a, v) -> a*16 + v)""".stripMargin.replace("\n", " ")
      s"""WITH h AS (SELECT DISTINCT event_type, CAST($u32 AS DOUBLE) / 4294967296.0 AS u FROM events),
        |r AS (SELECT event_type, u, row_number() OVER (PARTITION BY event_type ORDER BY u) AS rk FROM h)
        |SELECT event_type, count(*) AS n_kept,
        |  ${sqlFp("CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE) ELSE 63.0 / max(u) END", 2)} AS est_distinct_fp2
        |FROM r WHERE rk <= 64 GROUP BY event_type ORDER BY event_type""".stripMargin
    },
    "ev_hll_distinct" -> {
      val u32 = """list_reduce(list_prepend(CAST(0 AS BIGINT),
        | list_transform(range(1, 9),
        |   i -> CAST(strpos('0123456789abcdef',
        |          substr(md5('hll:' || CAST(user_id AS VARCHAR)), CAST(i AS INT), 1)) - 1 AS BIGINT))),
        | (a, v) -> a*16 + v)""".stripMargin.replace("\n", " ")
      // the SAME α_m·m²·2^ρmax double literal the Spark plan folds in
      // (m=256, ρmax=25): 17 sig digits round-trips the IEEE double
      val numerator = (0.7213 / (1.0 + 1.079 / 256)) * 256.0 * 256.0 * math.pow(2.0, 25)
      val numLit = "%.17e".formatLocal(java.util.Locale.ROOT, numerator)
      s"""WITH h AS (SELECT event_type, $u32 AS u FROM events),
        |b AS (SELECT event_type, u // 16777216 AS bkt, u % 16777216 AS w FROM h),
        |r AS (SELECT event_type, bkt,
        |    max(CASE WHEN w = 0 THEN 25 ELSE 25 - length(bin(w)) END) AS mb
        |  FROM b GROUP BY 1, 2),
        |grid AS (SELECT g.event_type, gs.bkt
        |  FROM (SELECT DISTINCT event_type FROM events) g
        |  CROSS JOIN (SELECT unnest(range(0, 256)) AS bkt) gs),
        |f AS (SELECT grid.event_type, coalesce(r.mb, 0) AS mb
        |  FROM grid LEFT JOIN r ON r.event_type = grid.event_type AND r.bkt = grid.bkt),
        |agg AS (SELECT event_type,
        |    CAST(sum(CASE WHEN mb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero,
        |    CAST(sum(CAST(1 AS BIGINT) << (25 - mb)) AS BIGINT) AS reg_sum
        |  FROM f GROUP BY event_type),
        |x AS (SELECT event_type, v_zero, reg_sum,
        |    CASE WHEN $numLit / CAST(reg_sum AS DOUBLE) <= 640.0 AND v_zero > 0
        |      THEN ln(256.0 / CAST(v_zero AS DOUBLE)) * 256
        |      ELSE $numLit / CAST(reg_sum AS DOUBLE) END AS est
        |  FROM agg),
        |ex AS (SELECT event_type, count(DISTINCT user_id) AS exact_nd FROM events GROUP BY 1)
        |SELECT x.event_type, ex.exact_nd, x.v_zero, x.reg_sum,
        |  ${sqlFp("est", 2)} AS hll_est_fp2
        |FROM x JOIN ex ON ex.event_type = x.event_type ORDER BY x.event_type""".stripMargin
    },
    // bit set computed ONCE (OR-merge = direct by set-union
    // associativity); emitted under both column pairs so either
    // Spark path diverging hash-mismatches
    "dd_bloom_state" -> {
      def u32(j: Int): String =
        s"""(list_reduce(list_prepend(CAST(0 AS BIGINT),
          | list_transform(range(1, 9),
          |   i -> CAST(strpos('0123456789abcdef',
          |          substr(md5('bf$j:' || md5(text)), CAST(i AS INT), 1)) - 1 AS BIGINT))),
          | (a, v) -> a*16 + v) % 1024)""".stripMargin.replace("\n", " ")
      val arms = (0 until 4).map(j =>
        s"SELECT source, ${u32(j)} AS bit FROM documents").mkString("\n  UNION ALL\n  ")
      s"""WITH b AS (SELECT DISTINCT source, bit FROM (
        |  $arms)),
        |a AS (SELECT source, count(*) AS bits_set, CAST(sum(bit) AS BIGINT) AS pos_sum
        |  FROM b GROUP BY 1)
        |SELECT source, bits_set, pos_sum,
        |  ${sqlFp("CAST(bits_set AS DOUBLE) / 1024.0", 4)} AS fill_fp4,
        |  bits_set AS bits_set_merged, pos_sum AS pos_sum_merged
        |FROM a ORDER BY source""".stripMargin
    },
    // registers computed ONCE (merge = direct by max-associativity);
    // emitted under both column pairs so either Spark path diverging
    // hash-mismatches
    "ev_hll_merge" -> {
      val u32 = """list_reduce(list_prepend(CAST(0 AS BIGINT),
        | list_transform(range(1, 9),
        |   i -> CAST(strpos('0123456789abcdef',
        |          substr(md5('hll:' || CAST(user_id AS VARCHAR)), CAST(i AS INT), 1)) - 1 AS BIGINT))),
        | (a, v) -> a*16 + v)""".stripMargin.replace("\n", " ")
      val numerator = (0.7213 / (1.0 + 1.079 / 256)) * 256.0 * 256.0 * math.pow(2.0, 25)
      val numLit = "%.17e".formatLocal(java.util.Locale.ROOT, numerator)
      s"""WITH h AS (SELECT event_type, $u32 AS u FROM events),
        |b AS (SELECT event_type, u // 16777216 AS bkt, u % 16777216 AS w FROM h),
        |r AS (SELECT event_type, bkt,
        |    max(CASE WHEN w = 0 THEN 25 ELSE 25 - length(bin(w)) END) AS mb
        |  FROM b GROUP BY 1, 2),
        |agg AS (SELECT event_type,
        |    CAST(256 - count(*) AS BIGINT) AS v_zero,
        |    CAST(sum(CAST(1 AS BIGINT) << (25 - mb))
        |      + (256 - count(*)) * (CAST(1 AS BIGINT) << 25) AS BIGINT) AS reg_sum
        |  FROM r GROUP BY 1),
        |x AS (SELECT event_type, v_zero, reg_sum,
        |    CASE WHEN $numLit / CAST(reg_sum AS DOUBLE) <= 640.0 AND v_zero > 0
        |      THEN ln(256.0 / CAST(v_zero AS DOUBLE)) * 256
        |      ELSE $numLit / CAST(reg_sum AS DOUBLE) END AS est
        |  FROM agg),
        |d AS (SELECT event_type, count(DISTINCT epoch_ms(ts) // 86400000) AS n_days
        |  FROM events GROUP BY 1)
        |SELECT x.event_type, d.n_days, x.v_zero, x.reg_sum,
        |  ${sqlFp("est", 2)} AS est_merged_fp2,
        |  x.reg_sum AS reg_sum_direct, ${sqlFp("est", 2)} AS est_direct_fp2
        |FROM x JOIN d ON d.event_type = x.event_type ORDER BY x.event_type""".stripMargin
    },
    "ev_cms_freq" -> {
      def bucket(j: Int): String =
        s"""(list_reduce(list_prepend(CAST(0 AS BIGINT),
          | list_transform(range(1, 9),
          |   i -> CAST(strpos('0123456789abcdef',
          |          substr(md5('cms$j:' || event_type), CAST(i AS INT), 1)) - 1 AS BIGINT))),
          | (a, v) -> a*16 + v) % 64)""".stripMargin.replace("\n", " ")
      val cells = (0 until 4).map(j =>
        s"c$j AS (SELECT ${bucket(j)} AS b, count(*) AS cnt FROM events GROUP BY 1)").mkString(",\n")
      s"""WITH $cells,
        |keys AS (SELECT event_type, count(*) AS exact_n FROM events GROUP BY 1)
        |SELECT k.event_type, k.exact_n,
        |  least(c0.cnt, c1.cnt, c2.cnt, c3.cnt) AS cms_est
        |FROM keys k
        |JOIN c0 ON c0.b = ${bucket(0).replace("event_type", "k.event_type")}
        |JOIN c1 ON c1.b = ${bucket(1).replace("event_type", "k.event_type")}
        |JOIN c2 ON c2.b = ${bucket(2).replace("event_type", "k.event_type")}
        |JOIN c3 ON c3.b = ${bucket(3).replace("event_type", "k.event_type")}
        |ORDER BY k.event_type""".stripMargin
    },
    "ev_percentile" ->
      s"""WITH e AS (SELECT event_type, ${sqlFp("\"value\"", 4)} AS v4 FROM events),
        |h AS (SELECT event_type, v4, count(*) AS k FROM e GROUP BY 1, 2),
        |c AS (SELECT event_type, v4, k,
        |    sum(k) OVER (PARTITION BY event_type ORDER BY v4
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(k) OVER (PARTITION BY event_type) AS n
        |  FROM h)
        |SELECT event_type, CAST(max(n) AS BIGINT) AS n_rows,
        |  min(CASE WHEN cum >= (n + 1) // 2 THEN v4 END) AS p50_c4,
        |  min(CASE WHEN cum >= (9 * n + 9) // 10 THEN v4 END) AS p90_c4,
        |  min(CASE WHEN cum >= (99 * n + 99) // 100 THEN v4 END) AS p99_c4
        |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin,
    // same histogram rank-scan convention as ev_percentile, applied
    // per RFM dimension over the user-aggregate table
    "ev_rfm" -> {
      def th(src: String, vcol: String, pfx: String): String =
        s"""h$pfx AS (SELECT $vcol AS v, count(*) AS k FROM $src GROUP BY 1),
           |c$pfx AS (SELECT v, k,
           |    sum(k) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           |    sum(k) OVER () AS n FROM h$pfx),
           |t$pfx AS (SELECT
           |    min(CASE WHEN cum >= (1 * n + 4) // 5 THEN v END) AS ${pfx}1,
           |    min(CASE WHEN cum >= (2 * n + 4) // 5 THEN v END) AS ${pfx}2,
           |    min(CASE WHEN cum >= (3 * n + 4) // 5 THEN v END) AS ${pfx}3,
           |    min(CASE WHEN cum >= (4 * n + 4) // 5 THEN v END) AS ${pfx}4 FROM c$pfx)""".stripMargin
      def sc(v: String, pfx: String): String =
        s"CAST(1 + (CASE WHEN $v > ${pfx}1 THEN 1 ELSE 0 END) + (CASE WHEN $v > ${pfx}2 THEN 1 ELSE 0 END)" +
          s" + (CASE WHEN $v > ${pfx}3 THEN 1 ELSE 0 END) + (CASE WHEN $v > ${pfx}4 THEN 1 ELSE 0 END) AS INT)"
      s"""WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, ${sqlFp("\"value\"", 4)} AS v4 FROM events),
        |u AS (SELECT user_id, max(ms) // 3600000 AS r_hr, count(*) AS f,
        |    CAST(sum(v4) AS BIGINT) // 10000 AS m_u FROM e GROUP BY 1),
        |${th("u", "r_hr", "tr")},
        |${th("u", "f", "tf")},
        |${th("u", "m_u", "tm")}
        |SELECT user_id, r_hr, f, m_u,
        |  ${sc("r_hr", "tr")} AS r_score,
        |  ${sc("f", "tf")} AS f_score,
        |  ${sc("m_u", "tm")} AS m_score,
        |  ${sc("r_hr", "tr")} * 100 + ${sc("f", "tf")} * 10 + ${sc("m_u", "tm")} AS rfm
        |FROM u, ttr, ttf, ttm ORDER BY user_id""".stripMargin
    },
    "ev_stickiness" ->
      s"""WITH d AS (SELECT user_id, epoch_ms(ts) // 86400000 AS day_id FROM events),
        |d2 AS (SELECT user_id, day_id, day_id // 7 AS week_id FROM d),
        |dau AS (SELECT week_id, day_id, count(DISTINCT user_id) AS dau FROM d2 GROUP BY 1, 2),
        |wau AS (SELECT week_id, count(DISTINCT user_id) AS wau FROM d2 GROUP BY 1)
        |SELECT week_id, day_id, dau, wau,
        |  ${sqlFp("CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE)", 4)} AS stickiness_fp4
        |FROM dau JOIN wau USING (week_id) ORDER BY day_id""".stripMargin,
    "ev_bot_users" ->
      """WITH organic AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
        |bots AS (SELECT DISTINCT user_id FROM events WHERE user_id % 37 = 0),
        |burst AS (SELECT b.user_id,
        |    1704067200000 + (b.user_id % 1440) * 60000 + i * 400 AS ms
        |  FROM bots b CROSS JOIN range(0, 120) t(i)),
        |allev AS (SELECT * FROM organic UNION ALL SELECT * FROM burst),
        |pm AS (SELECT user_id, ms // 60000 AS minute_id, count(*) AS n FROM allev GROUP BY 1, 2)
        |SELECT user_id, max(n) AS peak_per_min, CAST(sum(n) AS BIGINT) AS n_events,
        |  CAST(CASE WHEN max(n) >= 60 THEN 1 ELSE 0 END AS BIGINT) AS is_bot
        |FROM pm GROUP BY 1 ORDER BY user_id""".stripMargin,
    // the ev_sessionize window CTEs reduced to DISTINCT (session,
    // type), then the collocation lift over session probabilities
    "ev_covisit" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |flagged AS (SELECT *, CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w > $SessionGapMs
        |    THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |sess AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx FROM flagged),
        |st AS (SELECT DISTINCT user_id, session_idx, event_type FROM sess),
        |pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b
        |  FROM st a JOIN st b ON a.user_id = b.user_id AND a.session_idx = b.session_idx
        |    AND a.event_type < b.event_type),
        |nab AS (SELECT type_a, type_b, count(*) AS n_ab FROM pairs GROUP BY 1, 2),
        |na AS (SELECT event_type, count(*) AS n FROM st GROUP BY 1),
        |stot AS (SELECT count(*) AS s_tot FROM (SELECT DISTINCT user_id, session_idx FROM st))
        |SELECT type_a, type_b, n_ab,
        |  ${sqlFp("(CAST(n_ab AS DOUBLE) * CAST(s_tot AS DOUBLE)) / (CAST(na_a.n AS DOUBLE) * CAST(na_b.n AS DOUBLE))", 4)} AS lift_fp4
        |FROM nab JOIN na na_a ON na_a.event_type = nab.type_a
        |  JOIN na na_b ON na_b.event_type = nab.type_b CROSS JOIN stot
        |ORDER BY type_a, type_b""".stripMargin,
    // first view → earliest at-or-after purchase per user, minute
    // latency histogram rank-scan
    "ev_funnel_time" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |fv AS (SELECT user_id, min(ms) AS v0 FROM e WHERE event_type = 'view' GROUP BY 1),
        |lat AS (SELECT e.user_id, min(e.ms - fv.v0) // 60000 AS lat_min
        |  FROM e JOIN fv ON fv.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ms >= fv.v0 GROUP BY 1),
        |h AS (SELECT lat_min AS v, count(*) AS k FROM lat GROUP BY 1),
        |h2 AS (SELECT v, sum(k) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(k) OVER () AS n FROM h),
        |st AS (SELECT CAST(max(n) AS BIGINT) AS n_converted,
        |    min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS p50_lat_min,
        |    min(CASE WHEN cum >= (9 * n + 9) // 10 THEN v END) AS p90_lat_min FROM h2),
        |nv AS (SELECT count(*) AS n_viewers FROM fv)
        |SELECT n_viewers, n_converted, p50_lat_min, p90_lat_min FROM nv CROSS JOIN st""".stripMargin,
    // the sessionize CTEs reduced to per-session (n_events, dur_s),
    // then two histogram rank-scans (the ev_percentile discipline)
    "ev_session_stats" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |flagged AS (SELECT *, CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w > $SessionGapMs
        |    THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |sess0 AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx FROM flagged),
        |sess AS (SELECT user_id, session_idx, count(*) AS n_events,
        |    (max(ms) - min(ms)) // 1000 AS dur_s
        |  FROM sess0 GROUP BY 1, 2),
        |hd AS (SELECT dur_s AS v, count(*) AS k FROM sess GROUP BY 1),
        |hd2 AS (SELECT v, sum(k) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(k) OVER () AS n FROM hd),
        |dstats AS (SELECT CAST(max(n) AS BIGINT) AS n_sessions,
        |    min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS p50_dur_s,
        |    min(CASE WHEN cum >= (9 * n + 9) // 10 THEN v END) AS p90_dur_s FROM hd2),
        |he AS (SELECT n_events AS v, count(*) AS k FROM sess GROUP BY 1),
        |he2 AS (SELECT v, sum(k) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(k) OVER () AS n FROM he),
        |estats AS (SELECT min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS p50_events,
        |    max(v) AS max_events FROM he2)
        |SELECT n_sessions, p50_dur_s, p90_dur_s, p50_events, max_events
        |FROM dstats CROSS JOIN estats""".stripMargin,
    "ev_markov_rank" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |pairs AS (SELECT event_type AS src,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS dst
        |  FROM e),
        |edges AS (SELECT src, dst, count(*) AS c FROM pairs WHERE dst IS NOT NULL GROUP BY 1, 2),
        |p AS (SELECT src, dst, (1000000 * c) // sum(c) OVER (PARTITION BY src) AS p6 FROM edges),
        |nodes AS (SELECT DISTINCT event_type AS node FROM e),
        |nv AS (SELECT count(*) AS nv FROM nodes),
        |r0 AS (SELECT node, 1000000000 // nv AS r FROM nodes CROSS JOIN nv),
        |r1 AS (SELECT n.node, 150000000 // nv + coalesce(
        |    (SELECT sum((85 * ((r0.r * p.p6) // 1000000)) // 100)
        |     FROM p JOIN r0 ON r0.node = p.src WHERE p.dst = n.node), 0) AS r
        |  FROM nodes n CROSS JOIN nv),
        |r2 AS (SELECT n.node, 150000000 // nv + coalesce(
        |    (SELECT sum((85 * ((r1.r * p.p6) // 1000000)) // 100)
        |     FROM p JOIN r1 ON r1.node = p.src WHERE p.dst = n.node), 0) AS r
        |  FROM nodes n CROSS JOIN nv),
        |r3 AS (SELECT n.node, 150000000 // nv + coalesce(
        |    (SELECT sum((85 * ((r2.r * p.p6) // 1000000)) // 100)
        |     FROM p JOIN r2 ON r2.node = p.src WHERE p.dst = n.node), 0) AS r
        |  FROM nodes n CROSS JOIN nv)
        |SELECT node AS event_type, CAST(r AS BIGINT) AS rank_fp9
        |FROM r3 ORDER BY event_type""".stripMargin,
    "pipe_quality_funnel" ->
      // the rule expressions are the same ones txt_repetition /
      // txt_quality verify individually; lang is the metadata column
      s"""WITH f AS (SELECT
        |    len($toksSql) AS nt,
        |    CASE WHEN len($toksSql) = 0 THEN 10000
        |      ELSE ${sqlFp("1.0 - CAST(len(list_distinct(" + toksSql + ")) AS DOUBLE) / CAST(len(" + toksSql + ") AS DOUBLE)", 4)}
        |    END AS rep4,
        |    lang AS lp,
        |    len(list_filter($toksSql, t -> t IN ('the', 'a', 'of', 'and', 'fast', 'slow'))) AS ns
        |  FROM documents),
        |g AS (SELECT
        |    count(*) AS n0,
        |    CAST(sum(CASE WHEN nt BETWEEN 20 AND 200 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN nt BETWEEN 20 AND 200 AND lp = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN nt BETWEEN 20 AND 200 AND lp = 'en' AND rep4 <= 6000 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
        |    CAST(sum(CASE WHEN nt BETWEEN 20 AND 200 AND lp = 'en' AND rep4 <= 6000 AND ns >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n4
        |  FROM f)
        |SELECT '1_all' AS stage, n0 AS n_docs FROM g
        |UNION ALL SELECT '2_len', n1 FROM g
        |UNION ALL SELECT '3_lang_en', n2 FROM g
        |UNION ALL SELECT '4_repetition', n3 FROM g
        |UNION ALL SELECT '5_stopwords', n4 FROM g
        |ORDER BY stage""".stripMargin,
    // same four rollups from one base CTE; median = smallest value
    // whose cum count reaches (n+1)//2 (the ev_percentile rule)
    "pipe_dataset_card" ->
      s"""WITH base AS (SELECT doc_id, source, lang, n_chars,
        |    CAST(len($toksSql) AS BIGINT) AS n_toks, md5(text) AS h FROM documents),
        |dup AS (SELECT h, count(*) AS hc FROM base GROUP BY 1),
        |agg AS (SELECT source, count(*) AS n_docs, CAST(sum(n_toks) AS BIGINT) AS n_tokens,
        |    CAST(sum(CASE WHEN hc > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |  FROM base JOIN dup USING (h) GROUP BY 1),
        |lt AS (SELECT source, lang, count(*) AS ln FROM base GROUP BY 1, 2),
        |top AS (SELECT source, lang AS top_lang, ln AS top_lang_n FROM (
        |    SELECT *, row_number() OVER (PARTITION BY source ORDER BY ln DESC, lang) AS rn
        |    FROM lt) WHERE rn = 1),
        |hh AS (SELECT source, n_chars, count(*) AS k FROM base GROUP BY 1, 2),
        |hc2 AS (SELECT source, n_chars,
        |    sum(k) OVER (PARTITION BY source ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(k) OVER (PARTITION BY source) AS n FROM hh),
        |p50 AS (SELECT source, min(CASE WHEN cum >= (n + 1) // 2 THEN n_chars END) AS p50_chars
        |  FROM hc2 GROUP BY 1)
        |SELECT a.source, n_docs, n_tokens, dup_docs,
        |  ${sqlFp("CAST(dup_docs AS DOUBLE) / CAST(n_docs AS DOUBLE)", 4)} AS dup_frac_fp4,
        |  top_lang, top_lang_n, p50_chars,
        |  ${sqlFp("CAST(sum_chars AS DOUBLE) / CAST(n_docs AS DOUBLE)", 2)} AS mean_chars_fp2
        |FROM agg a JOIN top USING (source) JOIN p50 USING (source)
        |ORDER BY a.source""".stripMargin,
    // every stage reuses its standalone oracle's rule verbatim:
    // gopher keep thresholds (txt_gopher), normalize+md5 (txt_normalize
    // / dd_exact), 4-gram decontamination (dd_decontaminate), ordered
    // cumsum selection (smp_budget)
    "pipe_prep_counts" ->
      s"""WITH train AS (SELECT * FROM documents WHERE doc_id % 97 <> 0),
        |gt AS (SELECT doc_id, text, $toksSql AS toks FROM train),
        |gsig AS (SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    CASE WHEN len(toks) = 0 THEN 1 ELSE len(toks) END AS nw,
        |    coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS sumlen,
        |    len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS alpha_cnt,
        |    len(regexp_extract_all(text, '#|\\.\\.\\.')) AS sym_cnt,
        |    CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','fast','slow'))) AS BIGINT) AS stop_hits
        |  FROM gt),
        |gkeep AS (SELECT doc_id FROM (SELECT doc_id, n_words, stop_hits,
        |    ${sqlFp("CAST(sumlen AS DOUBLE) / CAST(nw AS DOUBLE)", 2)} AS mean_wlen_fp2,
        |    ${sqlFp("CAST(alpha_cnt AS DOUBLE) / CAST(nw AS DOUBLE)", 4)} AS alpha_frac_fp4,
        |    ${sqlFp("CAST(sym_cnt AS DOUBLE) / CAST(nw AS DOUBLE)", 4)} AS sym_ratio_fp4
        |  FROM gsig)
        |  WHERE n_words >= 50 AND n_words <= 100000
        |    AND mean_wlen_fp2 >= 300 AND mean_wlen_fp2 <= 1000
        |    AND alpha_frac_fp4 >= 8000 AND sym_ratio_fp4 <= 1000
        |    AND stop_hits >= 2),
        |q AS (SELECT t.* FROM train t JOIN gkeep USING (doc_id)),
        |win AS (SELECT min(doc_id) AS doc_id FROM (
        |    SELECT doc_id, md5(trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9\\s]+', ' ', 'g'), '\\s+', ' ', 'g'))) AS h FROM q)
        |  GROUP BY h),
        |dd AS (SELECT q.* FROM q JOIN win USING (doc_id)),
        |ev0 AS (SELECT DISTINCT unnest(${shinglesSql(4)}) AS g0
        |       FROM documents WHERE doc_id % 97 = 0),
        |ev AS (SELECT DISTINCT ${shingleKeySql("g0")} AS g FROM ev0),
        |tg0 AS (SELECT doc_id, unnest(${shinglesSql(4)}) AS g0 FROM dd),
        |tg AS (SELECT doc_id, ${shingleKeySql("g0")} AS g FROM tg0),
        |bad AS (SELECT DISTINCT tg.doc_id FROM tg JOIN ev USING (g)),
        |dc AS (SELECT dd.* FROM dd WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
        |sc AS (SELECT doc_id, n_chars, CAST(len($toksSql) AS BIGINT) AS n_tokens FROM dc),
        |sel AS (SELECT * FROM (SELECT *, CAST(sum(n_tokens) OVER (ORDER BY n_chars DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum FROM sc)
        |  WHERE cum <= 20000)
        |SELECT section, n FROM (
        |  SELECT 's1_input' AS section, (SELECT count(*) FROM documents) AS n
        |  UNION ALL SELECT 's2_train', (SELECT count(*) FROM train)
        |  UNION ALL SELECT 's3_quality', (SELECT count(*) FROM q)
        |  UNION ALL SELECT 's4_dedup', (SELECT count(*) FROM dd)
        |  UNION ALL SELECT 's5_decontam', (SELECT count(*) FROM dc)
        |  UNION ALL SELECT 's6_selected', (SELECT count(*) FROM sel)
        |  UNION ALL SELECT 's7_selected_tokens', (SELECT coalesce(CAST(sum(n_tokens) AS BIGINT), 0) FROM sel)
        |) ORDER BY section""".stripMargin,
    // as-of tie-break mirror (q17 shape): best time = max(ms < pms),
    // then max event_id at that time; touch_type recovered by the
    // unique event_id
    "ev_attribution" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |p AS (SELECT event_id AS purchase_id, user_id, ms AS pms FROM e WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, ms, event_id, event_type AS touch_type FROM e
        |      WHERE event_type IN ('view', 'click')),
        |b AS (SELECT p.purchase_id, max(t.ms) AS touch_ms
        |      FROM p LEFT JOIN t ON t.user_id = p.user_id AND t.ms < p.pms GROUP BY 1),
        |x AS (SELECT p.purchase_id, p.user_id, p.pms, b.touch_ms, max(t.event_id) AS touch_event_id
        |      FROM p JOIN b USING (purchase_id)
        |      LEFT JOIN t ON t.user_id = p.user_id AND t.ms = b.touch_ms
        |      GROUP BY 1, 2, 3, 4)
        |SELECT x.purchase_id, x.user_id, x.pms, x.touch_ms, x.touch_event_id, t2.touch_type
        |FROM x LEFT JOIN t t2 ON t2.event_id = x.touch_event_id
        |ORDER BY purchase_id""".stripMargin,
    "ev_attribution_ushape" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |p AS (SELECT event_id AS purchase_id, user_id, ms AS pms FROM e WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, ms, event_id, event_type AS touch_type FROM e
        |      WHERE event_type IN ('view', 'click')),
        |paired AS (SELECT p.purchase_id, t.ms, t.event_id, t.touch_type
        |  FROM p JOIN t ON t.user_id = p.user_id
        |  WHERE t.ms < p.pms AND t.ms >= p.pms - 604800000),
        |pos AS (SELECT touch_type,
        |    count(*) OVER (PARTITION BY purchase_id) AS k,
        |    row_number() OVER (PARTITION BY purchase_id ORDER BY ms, event_id) AS rn
        |  FROM paired)
        |SELECT touch_type, count(*) AS n_touches,
        |  CAST(sum(CASE WHEN k = 1 THEN 1000000
        |                WHEN k = 2 THEN 500000
        |                WHEN rn = 1 OR rn = k THEN 400000
        |                ELSE 200000 // (k - 2) END) AS BIGINT) AS credit_fp6
        |FROM pos GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_sessionize" ->
      s"""WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ms, ${sqlFp("\"value\"", 4)} AS v4 FROM events),
        |flagged AS (SELECT *, CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w > $SessionGapMs
        |    THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |sess AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx FROM flagged)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, count(*) AS n_events,
        |  min(ms) AS start_ms, max(ms) AS end_ms, CAST(sum(v4) AS BIGINT) AS sum_v4
        |FROM sess GROUP BY user_id, session_idx ORDER BY user_id, session_idx""".stripMargin,
    "ev_concurrency" ->
      s"""WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ms FROM events),
        |flagged AS (SELECT *, CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w > $SessionGapMs
        |    THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |sess AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx FROM flagged),
        |si AS (SELECT user_id, session_idx, min(ms) AS st, max(ms) AS en FROM sess GROUP BY 1, 2),
        |sd AS (SELECT st, en,
        |    (st - ((st % 86400000 + 86400000) % 86400000)) // 86400000 AS sd,
        |    (en - ((en % 86400000 + 86400000) % 86400000)) // 86400000 AS ed FROM si),
        |deltas AS (SELECT sd AS day, st AS t, 1 AS d FROM sd
        |           UNION ALL SELECT ed, en, -1 FROM sd),
        |runs AS (SELECT day, d, sum(d) OVER (PARTITION BY day ORDER BY t, d DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run FROM deltas),
        |agg AS (SELECT day, max(run) AS peak_in_day,
        |    sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS n_starts FROM runs GROUP BY 1),
        |car AS (SELECT day, count(*) AS carry FROM
        |    (SELECT unnest(range(sd + 1, ed + 1)) AS day FROM sd WHERE ed > sd) GROUP BY 1)
        |SELECT coalesce(agg.day, car.day) AS day,
        |  CAST(coalesce(carry, 0) + greatest(coalesce(peak_in_day, 0), 0) AS BIGINT) AS peak_conc,
        |  CAST(coalesce(carry, 0) AS BIGINT) AS carry_in,
        |  CAST(coalesce(n_starts, 0) AS BIGINT) AS n_starts
        |FROM agg FULL JOIN car ON agg.day = car.day ORDER BY 1""".stripMargin,
    "ev_window_agg" ->
      // floored modulus ((x % m + m) % m) mirrors Spark's pmod, so the
      // window start floors for negative ms too (DuckDB % truncates)
      s"""SELECT ms - ((ms % 3600000 + 3600000) % 3600000) AS win_start, event_type, count(*) AS n,
        |  CAST(sum(v4) AS BIGINT) AS sum_v4
        |FROM (SELECT epoch_ms(ts) AS ms, event_type, ${sqlFp("\"value\"", 4)} AS v4 FROM events)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ev_percentile_cont" ->
      s"""WITH e AS (SELECT event_type, ${sqlFp("\"value\"", 4)} AS v4 FROM events),
        |h AS (SELECT event_type, v4, count(*) AS k FROM e GROUP BY 1, 2),
        |c AS (SELECT event_type, v4,
        |        sum(k) OVER (PARTITION BY event_type ORDER BY v4) AS cum,
        |        sum(k) OVER (PARTITION BY event_type) AS n FROM h),
        |p AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n_rows,
        |  min(CASE WHEN cum >= (100 + (n - 1) * 50) // 100 THEN v4 END) AS lo50,
        |  min(CASE WHEN cum >= least((100 + (n - 1) * 50) // 100 + 1, n) THEN v4 END) AS hi50,
        |  min(CASE WHEN cum >= (100 + (n - 1) * 90) // 100 THEN v4 END) AS lo90,
        |  min(CASE WHEN cum >= least((100 + (n - 1) * 90) // 100 + 1, n) THEN v4 END) AS hi90
        |  FROM c GROUP BY 1)
        |SELECT event_type, n_rows,
        |  CAST(lo50 * (100 - (100 + (n_rows - 1) * 50) % 100)
        |     + hi50 * ((100 + (n_rows - 1) * 50) % 100) AS BIGINT) AS p50_fp6,
        |  CAST(lo90 * (100 - (100 + (n_rows - 1) * 90) % 100)
        |     + hi90 * ((100 + (n_rows - 1) * 90) % 100) AS BIGINT) AS p90_fp6
        |FROM p ORDER BY event_type""".stripMargin,
    "ev_gap_fill" ->
      s"""WITH daily AS (SELECT event_type,
        |    (ms - ((ms % 86400000 + 86400000) % 86400000)) // 86400000 AS day,
        |    CAST(sum(v4) AS BIGINT) AS v
        |  FROM (SELECT event_type, event_id, epoch_ms(ts) AS ms, ${sqlFp("\"value\"", 4)} AS v4 FROM events)
        |  WHERE event_type IN ('purchase', 'signup') AND ((event_id % 97 + 97) % 97) = 0
        |  GROUP BY 1, 2),
        |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        |g AS (SELECT t.event_type, unnest(range(span.d0, span.d1 + 1)) AS day
        |      FROM (SELECT DISTINCT event_type FROM daily) t, span),
        |j AS (SELECT g.event_type, g.day, daily.v
        |      FROM g LEFT JOIN daily ON daily.event_type = g.event_type AND daily.day = g.day)
        |SELECT event_type, day,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_v,
        |  CAST(v IS NULL AS INT) AS is_gap
        |FROM j ORDER BY event_type, day""".stripMargin,
    "ev_sliding_window" ->
      s"""SELECT win_start, event_type, count(*) AS n, CAST(sum(v4) AS BIGINT) AS sum_v4
        |FROM (SELECT ms - ((ms % 1800000 + 1800000) % 1800000) - hops.k * 1800000 AS win_start,
        |             ms, event_type, v4
        |      FROM (SELECT epoch_ms(ts) AS ms, event_type, ${sqlFp("\"value\"", 4)} AS v4 FROM events)
        |      CROSS JOIN (SELECT 0 AS k UNION ALL SELECT 1) hops)
        |WHERE ms < win_start + 3600000
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ev_pattern_match" ->
      // string_agg ORDER BY (ms, event_id) mirrors Spark's struct
      // array_sort; the 'g' flag makes regexp_replace global like
      // Spark's
      """SELECT user_id, count(*) AS n_events,
        |  string_agg(left(event_type, 1), '' ORDER BY ms, event_id) AS path,
        |  (length(string_agg(left(event_type, 1), '' ORDER BY ms, event_id))
        |   - length(regexp_replace(string_agg(left(event_type, 1), '' ORDER BY ms, event_id),
        |                           'vcp', '', 'g'))) // 3 AS n_vcp,
        |  CAST(regexp_matches(string_agg(left(event_type, 1), '' ORDER BY ms, event_id),
        |                      'v[^p]*c[^p]*p') AS INT) AS has_funnel
        |FROM (SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id FROM events)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "ev_late_events" ->
      """WITH e AS (SELECT event_id, epoch_ms(ts) AS ms FROM events),
        |w AS (SELECT ms, max(ms) OVER (ORDER BY event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm FROM e)
        |SELECT ms - ((ms % 3600000 + 3600000) % 3600000) AS win_start, count(*) AS n,
        |  CAST(sum(CASE WHEN hwm - 7200000 > ms THEN 1 ELSE 0 END) AS BIGINT) AS n_late
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_funnel" ->
      s"""WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |s1 AS (SELECT user_id, min(ms) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(ms) AS t2 FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND ms > t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(ms) AS t3 FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND ms > t2 GROUP BY e.user_id)
        |SELECT stage, n_users FROM (
        |  SELECT '1_view' AS stage, count(*) AS n_users FROM s1
        |  UNION ALL SELECT '2_click', count(*) FROM s2
        |  UNION ALL SELECT '3_purchase', count(*) FROM s3
        |) ORDER BY stage""".stripMargin,
    "ev_funnel_window" ->
      s"""WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |s1 AS (SELECT user_id, min(ms) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(ms) AS t2, min(t1) AS t1b FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND ms > t1 AND ms <= t1 + 86400000 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(ms) AS t3, min(t1b) AS t1c FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND ms > t2 AND ms <= t2 + 86400000 GROUP BY e.user_id)
        |SELECT stage, n_users, CAST(coalesce(sum_lag_ms, 0) AS BIGINT) AS sum_lag_ms FROM (
        |  SELECT '1_view' AS stage, count(*) AS n_users, CAST(0 AS BIGINT) AS sum_lag_ms FROM s1
        |  UNION ALL SELECT '2_click', count(*), CAST(sum(t2 - t1b) AS BIGINT) FROM s2
        |  UNION ALL SELECT '3_purchase', count(*), CAST(sum(t3 - t1c) AS BIGINT) FROM s3
        |) ORDER BY stage""".stripMargin,
    "txt_sentencize" ->
      // list lambdas replicate the Spark HOF folds; edge whitespace
      // stripped by regex on both engines (trim() semantics differ)
      """WITH d AS (SELECT doc_id,
        |  list_filter(list_transform(string_split_regex(
        |                replace(replace(text, ' merge ', '. '), ' batch ', '! '),
        |                '[.!?]+'),
        |              x -> regexp_replace(x, '^\s+|\s+$', '', 'g')),
        |              x -> length(x) > 0) AS segs FROM documents)
        |SELECT doc_id, CAST(len(segs) AS INT) AS n_sent,
        |  CAST(coalesce(list_sum(list_transform(segs, x -> length(x))), 0) AS BIGINT) AS sum_len,
        |  CAST(coalesce(list_max(list_transform(segs, x -> length(x))), 0) AS INT) AS max_len
        |FROM d ORDER BY doc_id""".stripMargin,
    "txt_repetition" ->
      s"""SELECT doc_id, CASE WHEN len($toksSql) = 0 THEN 0
        | ELSE ${sqlFp("1.0 - CAST(len(list_distinct(" + toksSql + ")) AS DOUBLE) / CAST(len(" + toksSql + ") AS DOUBLE)", 4)}
        | END AS repetition_fp4
        |FROM documents ORDER BY doc_id""".stripMargin,
    // exact HUGEINT term ratios mirror Spark's DECIMAL(38,0): each
    // factor casts to HUGEINT BEFORE its multiply, diff drops to
    // double, and n_s² folds into the double divide — the same
    // overflow-free staging as the Spark side; one double drop per
    // term in the same expression shape, fp9, integer sums —
    // accumulation order cannot move the result
    "txt_domain_div" ->
      s"""WITH toks AS (SELECT source, unnest($toksSql) AS tok FROM documents),
        |st AS (SELECT source, tok, count(*) AS c_st FROM toks GROUP BY 1, 2),
        |tt AS (SELECT tok, sum(c_st) AS c_t FROM st GROUP BY 1),
        |ns AS (SELECT source, sum(c_st) AS n_s FROM st GROUP BY 1),
        |n1 AS (SELECT sum(c_t) AS n FROM tt),
        |terms AS (SELECT st.source, tt.c_t, n1.n,
        |    CAST(floor(
        |      (CAST(CAST(st.c_st AS HUGEINT) * CAST(n1.n AS HUGEINT)
        |          - CAST(tt.c_t AS HUGEINT) * CAST(ns.n_s AS HUGEINT) AS DOUBLE)
        |        / CAST(ns.n_s AS DOUBLE))
        |      * (CAST(CAST(st.c_st AS HUGEINT) * CAST(n1.n AS HUGEINT)
        |          - CAST(tt.c_t AS HUGEINT) * CAST(ns.n_s AS HUGEINT) AS DOUBLE)
        |        / CAST(ns.n_s AS DOUBLE))
        |      / CAST(CAST(tt.c_t AS HUGEINT) * CAST(n1.n AS HUGEINT) AS DOUBLE)
        |      * 1e9 + 0.5) AS BIGINT) AS term
        |  FROM st JOIN tt USING (tok) JOIN ns USING (source) CROSS JOIN n1)
        |SELECT source, count(*) AS n_terms,
        |  CAST(sum(term)
        |    + floor((1.0 - CAST(sum(c_t) AS DOUBLE) / CAST(max(n) AS DOUBLE)) * 1e9 + 0.5)
        |    AS BIGINT) AS chi2_fp9
        |FROM terms GROUP BY source ORDER BY source""".stripMargin,
    "txt_hapax" ->
      s"""WITH tc AS (SELECT doc_id, tok, count(*) AS c
        |  FROM (SELECT doc_id, unnest($toksSql) AS tok FROM documents) GROUP BY 1, 2),
        |agg AS (SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_types,
        |    sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS n_hapax
        |  FROM tc GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(n_types, 0) AS BIGINT) AS n_types,
        |  CAST(coalesce(n_hapax, 0) AS BIGINT) AS n_hapax,
        |  CASE WHEN coalesce(n_types, 0) = 0 THEN CAST(0 AS BIGINT)
        |    ELSE ${sqlFp("CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE)", 4)}
        |  END AS hapax_frac_fp4
        |FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,
    "ev_retention" ->
      """WITH e AS (SELECT DISTINCT user_id,
        |    (epoch_ms(ts) - ((epoch_ms(ts) % 604800000 + 604800000) % 604800000)) // 604800000 AS week
        |  FROM events),
        |cohorts AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id)
        |SELECT cohort_week, week - cohort_week AS week_offset, count(*) AS n_users
        |FROM e JOIN cohorts USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ev_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events""".stripMargin,
    // the exact integer outlier rule replicated in HUGEINT — any
    // float-mean drift in either engine breaks the flag bit-for-bit
    "ev_anomaly" ->
      """WITH daily AS (SELECT event_type,
        |    (epoch_ms(ts) - ((epoch_ms(ts) % 86400000 + 86400000) % 86400000)) // 86400000 AS day,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |stats AS (SELECT event_type, count(*) AS nd, sum(n) AS tot,
        |    sum(CAST(n AS HUGEINT) * n) AS sumsq FROM daily GROUP BY 1)
        |SELECT d.event_type, CAST(d.day AS BIGINT) AS day, CAST(d.n AS BIGINT) AS n,
        |  CAST(CASE WHEN (CAST(d.n AS HUGEINT) * nd - tot) * (CAST(d.n AS HUGEINT) * nd - tot)
        |      > 4 * (CAST(nd AS HUGEINT) * sumsq - CAST(tot AS HUGEINT) * tot)
        |    THEN 1 ELSE 0 END AS BIGINT) AS outlier
        |FROM daily d JOIN stats USING (event_type)
        |ORDER BY event_type, day""".stripMargin,
    "mm_binary_meta" -> mmSql,
    // closed-form from doc_id: the generator's sample formula
    // ((id·31 + 7i²) mod 65536) − 32768 re-derived per index; the
    // Spark side must DECODE the same values back out of the bytes
    "mm_audio_rms" ->
      s"""WITH s AS (SELECT doc_id, doc_id % 200 + 50 AS n FROM documents),
        |v AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM s),
        |x AS (SELECT doc_id, ((doc_id * 31 + i * i * 7) % 65536) - 32768 AS val FROM v),
        |a AS (SELECT doc_id, count(*) AS n_samples, max(abs(val)) AS peak,
        |    sum(val * val) AS sum_sq FROM x GROUP BY doc_id)
        |SELECT doc_id, CAST(n_samples AS BIGINT) AS n_samples,
        |  CAST(peak AS BIGINT) AS peak, CAST(sum_sq AS BIGINT) AS sum_sq,
        |  ${sqlFp("sqrt(CAST(sum_sq AS DOUBLE) / CAST(n_samples AS DOUBLE))", 2)} AS rms_fp2
        |FROM a ORDER BY doc_id""".stripMargin,
    // the generator's quiet-frame mask re-derived closed-form:
    // (v & 63) is the nonneg mod-64 of the two's-complement sample,
    // i.e. ((v % 64) + 64) % 64; complete frames only (i < frames·256)
    "mm_audio_fingerprint" ->
      // delta-sign bits folded MSB-first over the first 62 deltas
      // (mirrors the Spark-side slice cap): b_f carries 2^(cap-f)
      // with cap = least(frames-1, 62)
      """WITH s AS (SELECT doc_id, doc_id % 10 + 4 AS frames FROM documents),
        |v AS (SELECT doc_id, frames, unnest(range(0, frames * 256)) AS i FROM s),
        |x AS (SELECT doc_id, frames, i // 256 AS f,
        |    CASE WHEN ((i // 256) + doc_id) % 3 = 0
        |      THEN (((((doc_id * 31 + i * i * 7) % 65536) - 32768) % 64) + 64) % 64
        |      ELSE ((doc_id * 31 + i * i * 7) % 65536) - 32768 END AS val
        |  FROM v),
        |e AS (SELECT doc_id, frames, f, sum(val * val) AS energy FROM x GROUP BY 1, 2, 3),
        |d AS (SELECT doc_id, frames, f,
        |    CASE WHEN energy > lag(energy) OVER (PARTITION BY doc_id ORDER BY f)
        |      THEN 1 ELSE 0 END AS b FROM e),
        |fp AS (SELECT doc_id, CAST(frames AS BIGINT) AS n_frames,
        |    CAST(sum(CASE WHEN f >= 1 AND f <= LEAST(frames - 1, 62)
        |      THEN b * (CAST(1 AS BIGINT) << CAST(LEAST(frames - 1, 62) - f AS INT)) ELSE 0 END) AS BIGINT) AS afp
        |  FROM d GROUP BY 1, 2),
        |g AS (SELECT afp, n_frames, min(doc_id) AS rep_id, count(*) AS group_size
        |  FROM fp GROUP BY 1, 2)
        |SELECT fp.doc_id, fp.n_frames, fp.afp, g.rep_id, g.group_size
        |FROM fp JOIN g USING (afp, n_frames) ORDER BY doc_id""".stripMargin,
    "mm_audio_seg" ->
      s"""WITH s AS (SELECT doc_id, doc_id % 10 + 4 AS frames FROM documents),
        |v AS (SELECT doc_id, frames, unnest(range(0, frames * 256)) AS i FROM s),
        |x AS (SELECT doc_id, frames, i // 256 AS f,
        |    CASE WHEN ((i // 256) + doc_id) % 3 = 0
        |      THEN (((((doc_id * 31 + i * i * 7) % 65536) - 32768) % 64) + 64) % 64
        |      ELSE ((doc_id * 31 + i * i * 7) % 65536) - 32768 END AS val
        |  FROM v),
        |e AS (SELECT doc_id, frames, f, sum(val * val) AS energy FROM x GROUP BY 1, 2, 3),
        |a AS (SELECT doc_id, frames,
        |    sum(CASE WHEN energy > 1048576 THEN 1 ELSE 0 END) AS n_active,
        |    min(CASE WHEN energy > 1048576 THEN f END) AS first_a,
        |    max(CASE WHEN energy > 1048576 THEN f END) AS last_a
        |  FROM e GROUP BY 1, 2)
        |SELECT doc_id, CAST(frames AS BIGINT) AS n_frames,
        |  CAST(n_active AS BIGINT) AS n_active,
        |  CAST(coalesce(first_a, -1) AS BIGINT) AS first_active,
        |  CAST(coalesce(last_a, -1) AS BIGINT) AS last_active,
        |  ${sqlFp("CAST(n_active AS DOUBLE) / CAST(frames AS DOUBLE)", 4)} AS active_fp4
        |FROM a ORDER BY doc_id""".stripMargin,
    // audio roundtrip mirror: all synth params are closed-form in
    // doc_id; duration replicates via 64-bit integer division
    "mm_audio_meta" ->
      """SELECT doc_id,
        | CAST(doc_id % 2 + 1 AS BIGINT) AS channels,
        | CAST(CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |      WHEN 2 THEN 22050 ELSE 44100 END AS BIGINT) AS sample_rate,
        | CAST(CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS BIGINT) AS bits,
        | CAST(doc_id % 5000 + 100 AS BIGINT) AS data_bytes,
        | CAST((doc_id % 5000 + 100) * 8000 //
        |   ((CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |     WHEN 2 THEN 22050 ELSE 44100 END)
        |    * (doc_id % 2 + 1) * (CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END)) AS BIGINT) AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_image_meta" ->
      """SELECT doc_id, 'png' AS fmt,
        | CAST(doc_id % 1000 + 1 AS BIGINT) AS width,
        | CAST(doc_id % 700 + 1 AS BIGINT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      // the synthesized container's parameters re-derived from doc_id;
      // the probe byte re-derives the fill rule — if the Spark side's
      // offsets drifted by even one byte the probe would read a
      // different frame's fill (or header bytes) and hash-mismatch
      """WITH v AS (SELECT doc_id,
        |    doc_id % 8 + 1 AS w, doc_id % 4 + 1 AS h,
        |    CASE doc_id % 4 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 5 ELSE 10 END AS fps,
        |    doc_id % 24 + 2 AS n
        |  FROM documents),
        |idx AS (SELECT doc_id, w, h, fps, unnest(range(0, n, fps)) AS i FROM v)
        |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |  CAST(i * 1000 // fps AS BIGINT) AS ts_ms,
        |  CAST(14 + i * w * h AS BIGINT) AS frame_off,
        |  CAST((doc_id * 31 + i * 7) % 251 AS BIGINT) AS probe_byte
        |FROM idx ORDER BY doc_id, frame_idx""".stripMargin,
    // the decoded raster re-derived closed-form (first q pixels a,
    // rest b); Spark DECOMPRESSES the actual run pairs out of the
    // container — a codec bug (run order, count off-by-one, frame
    // offset drift) changes the pixel sum or flips threshold bits
    "mm_frame_decode" ->
      """WITH v AS (SELECT doc_id,
        |    CASE doc_id % 4 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 5 ELSE 10 END AS fps,
        |    doc_id % 24 + 2 AS n
        |  FROM documents),
        |idx AS (SELECT doc_id, fps, unnest(range(0, n, fps)) AS i FROM v),
        |px AS (SELECT doc_id, fps, i,
        |    list_transform(range(0, 64),
        |      p -> CASE WHEN p < doc_id % 63 + 1 THEN (doc_id * 31 + i * 7) % 251
        |                ELSE (doc_id * 17 + i * 11) % 251 END) AS ps
        |  FROM idx),
        |px2 AS (SELECT doc_id, fps, i, ps, list_sum(ps) AS s FROM px)
        |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |  CAST(i * 1000 // fps AS BIGINT) AS ts_ms,
        |  CAST(s AS BIGINT) AS sum_pix,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_reverse(ps[33:64])),
        |    (a, p) -> a * 2 + CASE WHEN p * 64 > s THEN 1 ELSE 0 END) AS BIGINT) AS phash_hi,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_reverse(ps[1:32])),
        |    (a, p) -> a * 2 + CASE WHEN p * 64 > s THEN 1 ELSE 0 END) AS BIGINT) AS phash_lo
        |FROM px2 ORDER BY doc_id, frame_idx""".stripMargin,
    // every pixel of every frame recomputed closed-form; SAD over
    // consecutive-frame pairs, cuts where SAD > 64 — Spark decodes
    // the actual RLE payload, so any codec/offset drift changes a
    // pixel and the SAD
    "mm_scene_cut" ->
      """WITH v AS (SELECT doc_id,
        |    CASE doc_id % 4 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 5 ELSE 10 END AS fps,
        |    doc_id % 24 + 2 AS n
        |  FROM documents),
        |idx AS (SELECT doc_id, fps, unnest(range(0, n)) AS i FROM v),
        |px AS (SELECT doc_id, fps, i,
        |    list_transform(range(0, 64),
        |      p -> (doc_id * 31 + (i // 5) * 97 + p * 7) % 251 +
        |           CASE WHEN p = 0 THEN i % 3 ELSE 0 END) AS ps
        |  FROM idx),
        |pair AS (SELECT a.doc_id, a.fps, a.i, b.ps AS prev, a.ps AS cur
        |  FROM px a JOIN px b ON b.doc_id = a.doc_id AND b.i = a.i - 1),
        |sd AS (SELECT doc_id, fps, i,
        |    list_sum(list_transform(range(0, 64),
        |      p -> abs(cur[CAST(p AS INT) + 1] - prev[CAST(p AS INT) + 1]))) AS sad
        |  FROM pair)
        |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |  CAST(i * 1000 // fps AS BIGINT) AS ts_ms, CAST(sad AS BIGINT) AS sad
        |FROM sd WHERE sad > 64 ORDER BY doc_id, frame_idx""".stripMargin,
    // raster re-derived from the synth rule; Spark parses the actual
    // payload bytes — a 1-byte drift in the binary path flips a bit.
    // Bits compare pixel·64 vs the pixel sum (strict, integer), MSB
    // first fold per uint32 half
    "mm_image_phash" ->
      """WITH px AS (SELECT doc_id,
        |    list_transform(range(0, 64),
        |      i -> ((doc_id % 16) * 31 + i * 7) % 240 + doc_id % 3) AS ps
        |  FROM documents),
        |px2 AS (SELECT doc_id, ps, list_sum(ps) AS s FROM px),
        |h AS (SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_reverse(ps[33:64])),
        |      (a, p) -> a * 2 + CASE WHEN p * 64 > s THEN 1 ELSE 0 END) AS phash_hi,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_reverse(ps[1:32])),
        |      (a, p) -> a * 2 + CASE WHEN p * 64 > s THEN 1 ELSE 0 END) AS phash_lo
        |  FROM px2),
        |g AS (SELECT phash_hi, phash_lo, min(doc_id) AS rep_id, count(*) AS group_size
        |  FROM h GROUP BY 1, 2)
        |SELECT h.doc_id, CAST(h.phash_hi AS BIGINT) AS phash_hi,
        |  CAST(h.phash_lo AS BIGINT) AS phash_lo, g.rep_id, g.group_size
        |FROM h JOIN g USING (phash_hi, phash_lo) ORDER BY doc_id""".stripMargin,
    "dd_phash_neardup" ->
      // hamming over the two 32-bit halves (the 64-bit recompose
      // would overflow BIGINT multiply); brute all-pairs over the
      // ≤ signature-domain distinct groups — the banded join is
      // lossless at hamming ≤ 7 by pigeonhole
      """WITH px AS (SELECT doc_id,
        |    list_transform(range(0, 64),
        |      i -> ((doc_id % 16) * 31 + i * 7) % 240 + doc_id % 3) AS ps
        |  FROM documents),
        |px2 AS (SELECT doc_id, ps, list_sum(ps) AS s FROM px),
        |h AS (SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_reverse(ps[33:64])),
        |      (a, p) -> a * 2 + CASE WHEN p * 64 > s THEN 1 ELSE 0 END) AS phash_hi,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_reverse(ps[1:32])),
        |      (a, p) -> a * 2 + CASE WHEN p * 64 > s THEN 1 ELSE 0 END) AS phash_lo
        |  FROM px2),
        |g AS (SELECT phash_hi, phash_lo, min(doc_id) AS rep, count(*) AS n
        |  FROM h GROUP BY 1, 2)
        |SELECT a.rep AS doc_a, b.rep AS doc_b,
        |  CAST(bit_count(xor(a.phash_hi, b.phash_hi))
        |     + bit_count(xor(a.phash_lo, b.phash_lo)) AS INT) AS hamming,
        |  a.n AS size_a, b.n AS size_b
        |FROM g a, g b
        |WHERE a.rep < b.rep
        |  AND bit_count(xor(a.phash_hi, b.phash_hi))
        |    + bit_count(xor(a.phash_lo, b.phash_lo)) <= 7
        |ORDER BY 1, 2""".stripMargin,
    "mm_image_dedup_cluster" ->
      // the dd_components recursive closure over the phash rep graph
      """WITH RECURSIVE px AS (SELECT doc_id,
        |    list_transform(range(0, 64),
        |      i -> ((doc_id % 16) * 31 + i * 7) % 240 + doc_id % 3) AS ps
        |  FROM documents),
        |px2 AS (SELECT doc_id, ps, list_sum(ps) AS s FROM px),
        |h AS (SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_reverse(ps[33:64])),
        |      (a, p) -> a * 2 + CASE WHEN p * 64 > s THEN 1 ELSE 0 END) AS phash_hi,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_reverse(ps[1:32])),
        |      (a, p) -> a * 2 + CASE WHEN p * 64 > s THEN 1 ELSE 0 END) AS phash_lo
        |  FROM px2),
        |g AS (SELECT phash_hi, phash_lo, min(doc_id) AS rep, count(*) AS n
        |  FROM h GROUP BY 1, 2),
        |cand AS (SELECT a.rep AS doc_a, b.rep AS doc_b
        |  FROM g a, g b
        |  WHERE a.rep < b.rep
        |    AND bit_count(xor(a.phash_hi, b.phash_hi))
        |      + bit_count(xor(a.phash_lo, b.phash_lo)) <= 7),
        |sym AS (SELECT doc_a AS src, doc_b AS dst FROM cand
        |        UNION ALL SELECT doc_b, doc_a FROM cand),
        |lbl(node, label) AS (
        |  SELECT rep, rep FROM g
        |  UNION
        |  SELECT s.dst, l.label FROM lbl l JOIN sym s ON s.src = l.node),
        |comp AS (SELECT node, min(label) AS component FROM lbl GROUP BY 1)
        |SELECT component, count(*) AS n_sigs, CAST(sum(n) AS BIGINT) AS n_images
        |FROM comp JOIN g ON g.rep = comp.node GROUP BY 1 ORDER BY 1""".stripMargin,
    // channel-planar synth rule re-derived per (channel, pixel);
    // moment identity in HUGEINT mirrors Spark's DECIMAL(38,0)
    "mm_channel_stats" ->
      s"""WITH px AS (
        |  SELECT c, ((doc_id % 16) * 31 + i * 7 + c * 11) % 240 + doc_id % 3 AS p
        |  FROM documents CROSS JOIN range(0, 3) t1(c) CROSS JOIN range(0, 64) t2(i)),
        |a AS (SELECT c AS channel, count(*) AS n_px, CAST(sum(p) AS BIGINT) AS sum_px,
        |    CAST(sum(p * p) AS BIGINT) AS sumsq_px FROM px GROUP BY 1)
        |SELECT channel, n_px, sum_px, sumsq_px,
        |  ${sqlFp("CAST(sum_px AS DOUBLE) / CAST(n_px AS DOUBLE)", 4)} AS mean_fp4,
        |  ${sqlFp("CAST(CAST(n_px AS HUGEINT) * sumsq_px - CAST(sum_px AS HUGEINT) * sum_px AS DOUBLE) / (CAST(n_px AS DOUBLE) * CAST(n_px AS DOUBLE))", 4)} AS var_fp4
        |FROM a ORDER BY channel""".stripMargin,
    // resize: every 2×2 block of the closed-form synthGray8x8 raster
    // floor-averages to one output pixel — integer // 4 mirrors the
    // Spark side's shift
    "mm_image_resize" ->
      """WITH px AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
        |    CAST(((doc_id % 16) * 31 + i * 7) % 240 + doc_id % 3 AS BIGINT) AS v
        |  FROM documents, range(0, 64) t(i)),
        |o AS (SELECT doc_id, ((i // 8) // 2) * 4 + (i % 8) // 2 AS pos, v FROM px)
        |SELECT doc_id, CAST(pos AS BIGINT) AS pos,
        |  CAST(sum(v) // 4 AS BIGINT) AS px
        |FROM o GROUP BY doc_id, pos ORDER BY doc_id, pos""".stripMargin,
    "dd_segment_dedup" -> {
      // 8-token segments over the boilerplate-planted text; segments
      // in >= 2 distinct docs are stripped, survivors re-join in order
      val augToks = toksSql.replace("lower(text)",
        "lower(CASE WHEN doc_id % 3 = 0 THEN 'terms of service apply all rights reserved worldwide ' || text ELSE text END)")
      s"""WITH tk AS (SELECT doc_id, $augToks AS toks FROM documents),
        |segs AS (SELECT doc_id,
        |    unnest(range(0, greatest(1, CAST(ceil(len(toks) / 8.0) AS BIGINT)))) AS pos, toks
        |  FROM tk),
        |segs2 AS (SELECT doc_id, pos,
        |    array_to_string(list_slice(toks, pos * 8 + 1, pos * 8 + 8), ' ') AS seg
        |  FROM segs),
        |common AS (SELECT seg FROM segs2 GROUP BY seg HAVING count(DISTINCT doc_id) >= 2)
        |SELECT s.doc_id AS doc,
        |  coalesce(string_agg(s.seg, ' ' ORDER BY s.pos) FILTER (WHERE c.seg IS NULL), '') AS clean_text,
        |  count(*) FILTER (WHERE c.seg IS NULL) AS n_kept,
        |  count(*) FILTER (WHERE c.seg IS NOT NULL) AS n_dropped
        |FROM segs2 s LEFT JOIN common c USING (seg)
        |GROUP BY 1 ORDER BY doc""".stripMargin
    },
    "txt_chunk" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
        |s AS (SELECT doc_id,
        |    unnest(range(0, greatest(1, CAST(ceil(len(toks) / 12.0) AS BIGINT)))) AS cid, toks
        |  FROM tk)
        |SELECT doc_id, CAST(cid AS BIGINT) AS chunk_id,
        |  CAST(len(list_slice(toks, cid * 12 + 1, cid * 12 + 16)) AS BIGINT) AS n_tokens,
        |  array_to_string(list_slice(toks, cid * 12 + 1, cid * 12 + 16), ' ') AS chunk_text
        |FROM s ORDER BY doc_id, chunk_id""".stripMargin,
    "smp_sample" -> {
      // u = uint32(first 8 md5 hex chars of 'smp:doc_id') / 2^32 —
      // exact in double on both engines; rates are dyadic so the
      // comparison and 1/rate are float-exact too
      val u32 = """list_reduce(list_prepend(CAST(0 AS BIGINT),
        | list_transform(range(1, 9),
        |   i -> CAST(strpos('0123456789abcdef',
        |          substr(md5('smp:' || CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1)) - 1 AS BIGINT))),
        | (a, v) -> a*16 + v)""".stripMargin.replace("\n", " ")
      s"""SELECT doc_id, source, ${sqlFp("1.0 / rate", 4)} AS weight_fp4
        |FROM (SELECT doc_id, source,
        |    CASE WHEN source IN ('src0','src1') THEN 1.0
        |         WHEN source IN ('src2','src3','src4') THEN 0.5
        |         ELSE 0.25 END AS rate
        |  FROM documents)
        |WHERE CAST($u32 AS DOUBLE) / 4294967296.0 < rate
        |ORDER BY doc_id""".stripMargin
    },
    "smp_weighted" -> {
      // priority q = n_chars / ((u32 + 0.5) / 2^32) — one exact
      // dyadic add, one exact dyadic division, one IEEE division:
      // both engines produce the identical double, so the top-100
      // SET matches bit-for-bit (doc_id tiebreak)
      val u32 = """list_reduce(list_prepend(CAST(0 AS BIGINT),
        | list_transform(range(1, 9),
        |   i -> CAST(strpos('0123456789abcdef',
        |          substr(md5('wsmp:' || CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1)) - 1 AS BIGINT))),
        | (a, v) -> a*16 + v)""".stripMargin.replace("\n", " ")
      s"""SELECT doc_id, source, n_chars, prio_fp4 FROM (
        |  SELECT doc_id, source, n_chars,
        |    ${sqlFp("CAST(n_chars AS DOUBLE) / ((CAST(" + u32 + " AS DOUBLE) + 0.5) / 4294967296.0)", 4)} AS prio_fp4,
        |    CAST(n_chars AS DOUBLE) / ((CAST($u32 AS DOUBLE) + 0.5) / 4294967296.0) AS prio
        |  FROM documents
        |  ORDER BY prio DESC, doc_id LIMIT 100)
        |ORDER BY doc_id""".stripMargin
    },
    "smp_split" -> {
      val u32 = """list_reduce(list_prepend(CAST(0 AS BIGINT),
        | list_transform(range(1, 9),
        |   i -> CAST(strpos('0123456789abcdef',
        |          substr(md5('spl:' || CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1)) - 1 AS BIGINT))),
        | (a, v) -> a*16 + v)""".stripMargin.replace("\n", " ")
      s"""SELECT doc_id, source,
        |  CASE WHEN u < 0.75 THEN 'train' WHEN u < 0.875 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id, source,
        |    CAST($u32 AS DOUBLE) / 4294967296.0 AS u FROM documents)
        |ORDER BY doc_id""".stripMargin
    },
    "smp_curriculum" ->
      // exact tercile thresholds from the distinct-length histogram —
      // the ev_percentile rank-scan shape in SQL
      s"""WITH d AS (SELECT doc_id, n_chars,
        |    CAST(len($toksSql) AS BIGINT) AS n_tokens FROM documents),
        |h AS (SELECT n_chars, count(*) AS k FROM d GROUP BY 1),
        |c AS (SELECT n_chars, sum(k) OVER (ORDER BY n_chars) AS cum,
        |             sum(k) OVER () AS n FROM h),
        |t AS (SELECT min(CASE WHEN cum >= (n + 2) // 3 THEN n_chars END) AS t1,
        |             min(CASE WHEN cum >= (2 * n + 2) // 3 THEN n_chars END) AS t2 FROM c)
        |SELECT CASE WHEN n_chars <= t1 THEN 1 WHEN n_chars <= t2 THEN 2 ELSE 3 END AS stage,
        |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM d, t GROUP BY 1 ORDER BY 1""".stripMargin,
    "smp_kfold" -> {
      val u32 = """list_reduce(list_prepend(CAST(0 AS BIGINT),
        | list_transform(range(1, 9),
        |   i -> CAST(strpos('0123456789abcdef',
        |          substr(md5('kf:' || CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1)) - 1 AS BIGINT))),
        | (a, v) -> a*16 + v)""".stripMargin.replace("\n", " ")
      s"""SELECT doc_id, source, CAST(least(floor(u * 5), 4) AS BIGINT) AS fold
        |FROM (SELECT doc_id, source,
        |    CAST($u32 AS DOUBLE) / 4294967296.0 AS u FROM documents)
        |ORDER BY doc_id""".stripMargin
    },
    // global ordered cumsum mirror; ROWS frame (the order is total,
    // but be explicit) and BIGINT cast (DuckDB sums BIGINT to HUGEINT)
    "smp_budget" ->
      s"""WITH t AS (SELECT doc_id, n_chars, CAST(len($toksSql) AS BIGINT) AS n_tokens
        |           FROM documents),
        |c AS (SELECT *, CAST(sum(n_tokens) OVER (ORDER BY n_chars DESC, doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_weight
        |      FROM t)
        |SELECT doc_id, n_chars, n_tokens, cum_weight FROM c
        |WHERE cum_weight <= 20000 ORDER BY doc_id""".stripMargin,
    "smp_temperature" -> {
      val u32 = """list_reduce(list_prepend(CAST(0 AS BIGINT),
        | list_transform(range(1, 9),
        |   i -> CAST(strpos('0123456789abcdef',
        |          substr(md5('tmp:' || CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1)) - 1 AS BIGINT))),
        | (a, v) -> a*16 + v)""".stripMargin.replace("\n", " ")
      s"""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
        |s AS (SELECT source, n, CAST(floor(sqrt(CAST(n AS DOUBLE))*1e6+0.5) AS BIGINT) AS s6 FROM c),
        |tot AS (SELECT CAST(sum(s6) AS BIGINT) AS stot FROM s),
        |r AS (SELECT source,
        |    CAST(floor(least(1.0, (200 * CAST(s6 AS DOUBLE)) / (CAST(stot AS DOUBLE) * CAST(n AS DOUBLE)))*1e6+0.5) AS BIGINT) AS rate_fp6
        |  FROM s, tot)
        |SELECT d.doc_id, d.source, r.rate_fp6
        |FROM documents d JOIN r USING (source)
        |WHERE CAST($u32 AS DOUBLE) / 4294967296.0 < CAST(rate_fp6 AS DOUBLE) / 1e6
        |ORDER BY doc_id""".stripMargin
    },
    "smp_mix" ->
      s"""WITH t AS (SELECT doc_id, source, n_chars, CAST(len($toksSql) AS BIGINT) AS n_tokens
        |           FROM documents WHERE source IN ('src0', 'src1', 'src2', 'src3')),
        |c AS (SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY source
        |        ORDER BY n_chars DESC, doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_weight
        |      FROM t)
        |SELECT doc_id, source, n_chars, n_tokens, cum_weight FROM c
        |WHERE cum_weight <= CASE source WHEN 'src0' THEN 8000 WHEN 'src1' THEN 6000
        |  WHEN 'src2' THEN 4000 ELSE 2000 END
        |ORDER BY doc_id""".stripMargin,
    "smp_reservoir" -> {
      val u32 = """list_reduce(list_prepend(CAST(0 AS BIGINT),
        | list_transform(range(1, 9),
        |   i -> CAST(strpos('0123456789abcdef',
        |          substr(md5('rsv:' || CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1)) - 1 AS BIGINT))),
        | (a, v) -> a*16 + v)""".stripMargin.replace("\n", " ")
      s"""SELECT doc_id, source, rank_in_stratum FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY CAST($u32 AS DOUBLE) / 4294967296.0, doc_id) AS rank_in_stratum
        |  FROM documents)
        |WHERE rank_in_stratum <= 5
        |ORDER BY source, rank_in_stratum""".stripMargin
    },
    "smp_length_buckets" ->
      s"""WITH d AS (SELECT CAST(len($toksSql) AS BIGINT) AS n FROM documents),
        |c AS (SELECT n, CASE WHEN n <= 1 THEN CAST(1 AS BIGINT)
        |        ELSE (CAST(1 AS BIGINT) << length(bin(n - 1))) END AS cap FROM d),
        |g AS (SELECT cap, count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS real_tokens
        |      FROM c GROUP BY 1)
        |SELECT cap, n_docs, real_tokens,
        |  CAST(n_docs * cap AS BIGINT) AS padded_tokens,
        |  CAST(((n_docs * cap - real_tokens) * 20000 + n_docs * cap) // (2 * n_docs * cap) AS BIGINT) AS waste_fp4
        |FROM g ORDER BY cap""".stripMargin,
    "smp_pack" ->
      s"""WITH RECURSIVE w AS (
        |  SELECT doc_id, doc_id % 8 AS grp, CAST(len($toksSql) AS BIGINT) AS n_tokens,
        |    row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
        |  FROM documents),
        |pack AS (
        |  SELECT doc_id, grp, n_tokens, rn, CAST(0 AS BIGINT) AS bin, n_tokens AS fill
        |  FROM w WHERE rn = 1
        |  UNION ALL
        |  SELECT w.doc_id, w.grp, w.n_tokens, w.rn,
        |    CASE WHEN p.fill + w.n_tokens <= 256 THEN p.bin ELSE p.bin + 1 END,
        |    CASE WHEN p.fill + w.n_tokens <= 256 THEN p.fill + w.n_tokens ELSE w.n_tokens END
        |  FROM w JOIN pack p ON w.grp = p.grp AND w.rn = p.rn + 1)
        |SELECT doc_id, grp, bin, n_tokens FROM pack ORDER BY doc_id""".stripMargin,
    // CDC mirror: per-position window-hash probes, cut list, bounds,
    // substring chunks — the u32(md5) is the shared cross-engine hash
    "dd_cdc_chunks" -> {
      val u32OfH = """list_reduce(list_prepend(CAST(0 AS BIGINT),
        | list_transform(range(1, 9),
        |   i -> CAST(strpos('0123456789abcdef', substr(h, CAST(i AS INT), 1)) - 1 AS BIGINT))),
        | (a, v) -> a*16 + v)""".stripMargin.replace("\n", " ")
      s"""WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |probes AS (SELECT doc_id, i, md5(substr(text, CAST(i AS BIGINT) - 7, 8)) AS h
        |           FROM (SELECT *, unnest(CASE WHEN n >= 9 THEN range(8, n) ELSE [] END) AS i FROM d)),
        |cutrows AS (SELECT doc_id, i FROM probes WHERE $u32OfH % 64 = 0),
        |cuts AS (SELECT doc_id, list(i ORDER BY i) AS cl FROM cutrows GROUP BY doc_id),
        |bounds AS (SELECT d.doc_id, d.text,
        |             list_concat(list_concat([CAST(0 AS BIGINT)], coalesce(c.cl, [])), [CAST(d.n AS BIGINT)]) AS b
        |           FROM d LEFT JOIN cuts c USING (doc_id)),
        |chunks AS (SELECT doc_id, CAST(j AS BIGINT) AS chunk_id,
        |             substr(text, CAST(b[CAST(j+1 AS INT)] + 1 AS BIGINT), CAST(b[CAST(j+2 AS INT)] - b[CAST(j+1 AS INT)] AS BIGINT)) AS c
        |           FROM (SELECT *, unnest(range(0, len(b) - 1)) AS j FROM bounds))
        |SELECT doc_id, chunk_id, CAST(length(c) AS BIGINT) AS n_chars_chunk, md5(c) AS chunk_hash
        |FROM chunks WHERE length(c) > 0 ORDER BY doc_id, chunk_id""".stripMargin
    },
    "txt_url_normalize" ->
      s"""WITH $normUrlCtes
        |SELECT doc_id, url, norm_url FROM norm ORDER BY doc_id""".stripMargin,
    "dd_url_dedup" ->
      s"""WITH $normUrlCtes
        |SELECT norm_url, min(doc_id) AS keep_id, count(*) AS n_variants
        |FROM norm GROUP BY 1 ORDER BY 1""".stripMargin,
    "smp_shuffle" -> {
      // shard = uint32(first 8 md5 hex chars of 'shf:doc_id') % 8;
      // pos ranks by the FULL md5 hex — hex strings are fixed-length
      // lowercase in both engines, so string order == numeric order
      val u32 = """list_reduce(list_prepend(CAST(0 AS BIGINT),
        | list_transform(range(1, 9),
        |   i -> CAST(strpos('0123456789abcdef',
        |          substr(md5('shf:' || CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1)) - 1 AS BIGINT))),
        | (a, v) -> a*16 + v)""".stripMargin.replace("\n", " ")
      s"""SELECT doc_id, shard, CAST(row_number() OVER (PARTITION BY shard
        |    ORDER BY md5('shf:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS pos
        |FROM (SELECT doc_id, $u32 % 8 AS shard FROM documents)
        |ORDER BY shard, pos""".stripMargin
    },
    "txt_entropy" ->
      s"""WITH tf AS (
        |  SELECT doc_id, tok, count(*) AS c
        |  FROM (SELECT doc_id, unnest($toksSql) AS tok FROM documents)
        |  GROUP BY 1, 2),
        |ent AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
        |    CAST(sum(${sqlFp("c * log2(CAST(c AS DOUBLE))", 6)}) AS BIGINT) AS s6
        |  FROM tf GROUP BY 1)
        |SELECT d.doc_id, ent.n,
        |  ${sqlFp("log2(CAST(ent.n AS DOUBLE)) - CAST(ent.s6 AS DOUBLE) / 1e6 / CAST(ent.n AS DOUBLE)", 4)} AS entropy_fp4
        |FROM documents d LEFT JOIN ent ON ent.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "ev_trend" ->
      s"""WITH d AS (
        |  SELECT event_type, epoch_ms(ts) // 86400000 AS day, count(*) AS y
        |  FROM events GROUP BY 1, 2),
        |sums AS (SELECT event_type, count(*) AS n_days,
        |    CAST(sum(y) AS BIGINT) AS total, CAST(sum(day) AS HUGEINT) AS sx,
        |    CAST(sum(day*day) AS HUGEINT) AS sxx, CAST(sum(day*y) AS HUGEINT) AS sxy
        |  FROM d GROUP BY 1)
        |SELECT event_type, n_days, total,
        |  CASE WHEN n_days*sxx - sx*sx = 0 THEN CAST(0 AS BIGINT)
        |    ELSE ${sqlFp("CAST(n_days*sxy - sx*total AS DOUBLE) / CAST(n_days*sxx - sx*sx AS DOUBLE)", 6)}
        |  END AS slope_fp6
        |FROM sums ORDER BY event_type""".stripMargin,
    "ev_path_trigrams" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms FROM events),
        |w AS (SELECT event_type, ms,
        |    lag(event_type, 1) OVER win AS p1, lag(event_type, 2) OVER win AS p2,
        |    lag(ms, 1) OVER win AS m1, lag(ms, 2) OVER win AS m2
        |  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ms, event_id))
        |SELECT p2 || '>' || p1 || '>' || event_type AS path, count(*) AS n
        |FROM w
        |WHERE p2 IS NOT NULL AND ms - m1 <= 21600000 AND m1 - m2 <= 21600000
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin,
    "emb_norm_stats" ->
      s"""WITH q AS (
        |  SELECT CAST(i - 1 AS INT) AS dim,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS q6
        |  FROM embeddings CROSS JOIN range(1, 65) t(i)),
        |a AS (SELECT dim, count(*) AS n, CAST(sum(q6) AS BIGINT) AS s6,
        |    sum(q6*q6) AS ss12 FROM q GROUP BY 1)
        |SELECT dim, n,
        |  ${sqlFp("CAST(s6 AS DOUBLE) / 1e6 / CAST(n AS DOUBLE)", 6)} AS mean_fp6,
        |  ${sqlFp("CAST(ss12 AS DOUBLE) / 1e12 / CAST(n AS DOUBLE) - " +
             "(CAST(s6 AS DOUBLE) / 1e6 / CAST(n AS DOUBLE)) * (CAST(s6 AS DOUBLE) / 1e6 / CAST(n AS DOUBLE))", 6)} AS var_fp6
        |FROM a ORDER BY dim""".stripMargin,
    "emb_pca_power" -> {
      def it(k: Int): String =
        s"""w$k AS (SELECT cov.i, sum(cov.c * v${k - 1}.vj) AS w
           |  FROM cov JOIN v${k - 1} ON v${k - 1}.j = cov.j GROUP BY 1),
           |x$k AS (SELECT max(abs(w)) AS mx FROM w$k),
           |v$k AS (SELECT i AS j, CASE WHEN mx = 0 THEN CAST(1000000 AS HUGEINT)
           |    ELSE CAST(CAST(floor(CAST(w AS DOUBLE) / CAST(mx AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS HUGEINT)
           |  END AS vj
           |  FROM w$k, x$k)""".stripMargin
      s"""WITH q AS (
        |  SELECT vec_id, CAST(i - 1 AS INT) AS dim,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS q6
        |  FROM embeddings CROSS JOIN range(1, 65) t(i)),
        |g AS (SELECT a.dim AS i, b.dim AS j, CAST(sum(a.q6 * b.q6) AS HUGEINT) AS s
        |  FROM q a JOIN q b ON a.vec_id = b.vec_id GROUP BY 1, 2),
        |m AS (SELECT dim, CAST(sum(q6) AS HUGEINT) AS m FROM q GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM embeddings),
        |cov AS (SELECT g.i, g.j, n.n * g.s - mi.m * mj.m AS c
        |  FROM g JOIN m mi ON mi.dim = g.i JOIN m mj ON mj.dim = g.j CROSS JOIN n),
        |v0 AS (SELECT dim AS j, CAST(1000000 AS HUGEINT) AS vj FROM m),
        |${it(1)},
        |${it(2)},
        |${it(3)},
        |${it(4)}
        |SELECT j AS dim, CAST(vj AS BIGINT) AS pc1_fp6 FROM v4 ORDER BY dim""".stripMargin
    },
    // legacy batch = even doc_ids (written without source/n_chars)
    "src_schema_evolution" ->
      """SELECT lang, count(*) AS n,
        |  CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_legacy,
        |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars ELSE 0 END) AS BIGINT) AS sum_chars_v2
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "src_partitioned_scan" ->
      s"""SELECT epoch_ms(ts) // 86400000 AS day, count(*) AS n,
        |  CAST(sum(${sqlFp("\"value\"", 4)}) AS BIGINT) AS sum_v4
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "txt_vocab_coverage" ->
      s"""WITH v AS (SELECT tok, count(*) AS f FROM
        |    (SELECT unnest($toksSql) AS tok FROM documents) GROUP BY 1),
        |tot AS (SELECT CAST(sum(f) AS BIGINT) AS total FROM v),
        |head AS (SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS rank
        |         FROM v ORDER BY f DESC, tok LIMIT 1024),
        |ks AS (SELECT unnest([16, 64, 256, 1024]) AS k)
        |SELECT k, CAST(sum(f) AS BIGINT) AS covered,
        |  CAST((sum(f) * 2000000 + total) // (2 * total) AS BIGINT) AS coverage_fp6
        |FROM head, ks, tot WHERE rank <= k GROUP BY k, total ORDER BY k""".stripMargin,
    "txt_zipf" ->
      s"""WITH v AS (
        |  SELECT tok, count(*) AS f
        |  FROM (SELECT unnest($toksSql) AS tok FROM documents)
        |  GROUP BY 1 ORDER BY f DESC, tok LIMIT 256),
        |r AS (SELECT ${sqlFp("log2(CAST(row_number() OVER (ORDER BY f DESC, tok) AS DOUBLE))", 6)} AS x6,
        |    ${sqlFp("log2(CAST(f AS DOUBLE))", 6)} AS y6
        |  FROM v),
        |sums AS (SELECT count(*) AS k,
        |    CAST(sum(x6) AS HUGEINT) AS sx, CAST(sum(y6) AS HUGEINT) AS sy,
        |    CAST(sum(x6*x6) AS HUGEINT) AS sxx, CAST(sum(x6*y6) AS HUGEINT) AS sxy
        |  FROM r)
        |SELECT k,
        |  ${sqlFp("CAST(k*sxy - sx*sy AS DOUBLE) / CAST(k*sxx - sx*sx AS DOUBLE)", 6)} AS slope_fp6,
        |  ${sqlFp("CAST(sy*sxx - sx*sxy AS DOUBLE) / CAST(k*sxx - sx*sx AS DOUBLE) / 1e6", 6)} AS intercept_fp6
        |FROM sums""".stripMargin,
    "ev_quantile_sketch" -> {
      val u32 = """list_reduce(list_prepend(CAST(0 AS BIGINT),
        | list_transform(range(1, 9),
        |   i -> CAST(strpos('0123456789abcdef',
        |          substr(md5('qs:' || CAST(event_id AS VARCHAR)), CAST(i AS INT), 1)) - 1 AS BIGINT))),
        | (a, v) -> a*16 + v)""".stripMargin.replace("\n", " ")
      s"""WITH e AS (SELECT event_type, ${sqlFp("\"value\"", 4)} AS v4,
        |    CASE WHEN $u32 < 536870912 THEN 1 ELSE 0 END AS in_s FROM events),
        |h AS (SELECT event_type, v4, count(*) AS k, sum(in_s) AS ks FROM e GROUP BY 1, 2),
        |c AS (SELECT event_type, v4,
        |    sum(k) OVER (PARTITION BY event_type ORDER BY v4
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(ks) OVER (PARTITION BY event_type ORDER BY v4
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cums,
        |    sum(k) OVER (PARTITION BY event_type) AS n,
        |    sum(ks) OVER (PARTITION BY event_type) AS ns
        |  FROM h)
        |SELECT event_type, CAST(max(n) AS BIGINT) AS n_rows, CAST(max(ns) AS BIGINT) AS n_sample,
        |  min(CASE WHEN cum >= (n + 1) // 2 THEN v4 END) AS p50_c4,
        |  min(CASE WHEN cum >= (9 * n + 9) // 10 THEN v4 END) AS p90_c4,
        |  min(CASE WHEN cums >= (ns + 1) // 2 THEN v4 END) AS s50_c4,
        |  min(CASE WHEN cums >= (9 * ns + 9) // 10 THEN v4 END) AS s90_c4
        |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin
    },
    "src_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        | CAST(sum(CAST(floor(l_quantity*100+0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        | CAST(sum(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)) AS BIGINT) AS sum_price_c
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "src_cdc_apply" ->
      """WITH base AS (
        |  SELECT o_orderkey AS key, o_orderstatus AS status,
        |    CAST(floor(o_totalprice*100+0.5) AS BIGINT) AS total_c
        |  FROM orders),
        |chg AS (
        |  SELECT CASE WHEN l_linenumber % 3 = 2 THEN l_orderkey + 600000000
        |              ELSE l_orderkey END AS key,
        |    ((CAST(l_linenumber AS BIGINT) * 34359738368
        |        + CAST(floor(l_extendedprice*100+0.5) AS BIGINT)) * 4
        |      + l_linenumber % 3) * 4
        |      + CASE l_returnflag WHEN 'A' THEN 0 WHEN 'N' THEN 1 ELSE 2 END AS packed
        |  FROM lineitem),
        |latest AS (
        |  SELECT key,
        |    CASE (p // 4) % 4 WHEN 0 THEN 'D' WHEN 1 THEN 'U' ELSE 'I' END AS op,
        |    CASE p % 4 WHEN 0 THEN 'A' WHEN 1 THEN 'N' ELSE 'R' END AS new_status,
        |    (p // 16) % 34359738368 AS new_total_c
        |  FROM (SELECT key, max(packed) AS p FROM chg GROUP BY 1))
        |SELECT coalesce(b.key, l.key) AS key,
        |  CASE WHEN l.key IS NULL THEN b.status ELSE l.new_status END AS status,
        |  CASE WHEN l.key IS NULL THEN b.total_c ELSE l.new_total_c END AS total_c
        |FROM base b FULL JOIN latest l ON l.key = b.key
        |WHERE l.op IS NULL OR l.op <> 'D'
        |ORDER BY key""".stripMargin,
    "src_jsonl_corrupt" ->
      """WITH js AS (
        |  SELECT CASE WHEN doc_id % 7 = 0
        |      THEN '{"id": ' || doc_id || ', "lang": '
        |      ELSE '{"id": ' || doc_id || ', "lang": "' || lang || '"}'
        |    END AS s
        |  FROM documents),
        |p AS (SELECT
        |    CASE WHEN json_valid(s) THEN json_extract_string(s, '$.lang') END AS lang_p,
        |    CASE WHEN json_valid(s) THEN CAST(json_extract(s, '$.id') AS BIGINT) END AS id
        |  FROM js)
        |SELECT coalesce(lang_p, 'CORRUPT') AS lang_parsed, count(*) AS n,
        |  count(id) AS n_ids, CAST(sum(coalesce(id, 0)) AS BIGINT) AS sum_id
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_interarrival" ->
      """WITH g AS (
        |  SELECT ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS gap
        |  FROM (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events)),
        |b AS (SELECT gap,
        |    CASE WHEN gap = 0 THEN -1
        |         ELSE CAST(length(bin(gap)) AS INT) - 1 END AS bucket
        |  FROM g WHERE gap IS NOT NULL)
        |SELECT bucket, count(*) AS n, min(gap) AS min_gap, max(gap) AS max_gap
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_rolling_distinct" ->
      s"""WITH du AS (SELECT DISTINCT epoch_ms(ts) // 86400000 AS day, user_id FROM events),
        |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM du GROUP BY 1),
        |wau AS (SELECT d.day, count(DISTINCT u.user_id) AS wau7
        |  FROM dau d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day GROUP BY 1)
        |SELECT day, dau, wau7,
        |  ${sqlFp("CAST(dau AS DOUBLE) / CAST(wau7 AS DOUBLE)", 4)} AS stickiness_fp4
        |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin,
    "ev_gaps_islands" ->
      """WITH h AS (
        |  SELECT DISTINCT event_type, epoch_ms(ts) // 3600000 AS hr FROM events),
        |r AS (SELECT event_type, hr,
        |    hr - row_number() OVER (PARTITION BY event_type ORDER BY hr) AS grp,
        |    hr - lag(hr) OVER (PARTITION BY event_type ORDER BY hr) - 1 AS gap
        |  FROM h),
        |i AS (SELECT event_type, grp, count(*) AS len FROM r GROUP BY 1, 2),
        |ia AS (SELECT event_type, CAST(sum(len) AS BIGINT) AS n_hours,
        |    count(*) AS n_islands, CAST(max(len) AS BIGINT) AS max_island
        |  FROM i GROUP BY 1),
        |ga AS (SELECT event_type, max(coalesce(gap, 0)) AS max_gap FROM r GROUP BY 1)
        |SELECT ia.event_type, n_hours, n_islands, max_island, max_gap
        |FROM ia JOIN ga USING (event_type) ORDER BY 1""".stripMargin,
    "ev_kmv_merge" -> {
      val u32 = """list_reduce(list_prepend(CAST(0 AS BIGINT),
        | list_transform(range(1, 9),
        |   i -> CAST(strpos('0123456789abcdef',
        |          substr(md5('kmv:' || CAST(user_id AS VARCHAR)), CAST(i AS INT), 1)) - 1 AS BIGINT))),
        | (a, v) -> a*16 + v)""".stripMargin.replace("\n", " ")
      s"""WITH h AS (SELECT DISTINCT event_type, CAST($u32 AS DOUBLE) / 4294967296.0 AS u FROM events),
        |r AS (SELECT event_type, u, row_number() OVER (PARTITION BY event_type ORDER BY u) AS rk FROM h),
        |d AS (SELECT event_type, count(*) AS n_kept,
        |    ${sqlFp("CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE) ELSE 63.0 / max(u) END", 2)} AS est
        |  FROM r WHERE rk <= 64 GROUP BY 1),
        |nd AS (SELECT event_type, count(DISTINCT epoch_ms(ts) // 86400000) AS n_days
        |  FROM events GROUP BY 1)
        |SELECT event_type, n_days, n_kept, est AS est_distinct_fp2,
        |  n_kept AS n_kept_merged, est AS est_merged_fp2
        |FROM d JOIN nd USING (event_type) ORDER BY event_type""".stripMargin
    },
    "src_dpp" ->
      """WITH d AS (
        |  SELECT DISTINCT event_type FROM events
        |  WHERE substr(md5(event_type), 1, 1) < 'a')
        |SELECT e.event_type, count(*) AS n,
        |  CAST(sum(CAST(floor(value*1e4+0.5) AS BIGINT)) AS BIGINT) AS sum_v4
        |FROM events e JOIN d ON d.event_type = e.event_type
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_decay_score" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ms(ts) // 86400000 AS day,
        |    CAST(floor(value*1e4+0.5) AS BIGINT) AS v4
        |  FROM events),
        |mx AS (SELECT max(day) AS max_day FROM e)
        |SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(floor(CAST(v4 AS DOUBLE) / 1e4 /
        |      CAST(1::BIGINT << CAST(least((max_day - day) // 7, 40) AS INT) AS DOUBLE)
        |      * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS score_fp6
        |FROM e, mx GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_bitmap_retention" ->
      """WITH e AS (
        |  SELECT epoch_ms(ts) // 86400000 AS day, user_id // 63 AS word,
        |    1::BIGINT << CAST(user_id % 63 AS INT) AS bit
        |  FROM events),
        |bm AS (SELECT day, word, bit_or(bit) AS bm FROM e GROUP BY 1, 2)
        |SELECT a.day, CAST(sum(bit_count(a.bm)) AS BIGINT) AS n_active,
        |  CAST(sum(coalesce(bit_count(a.bm & b.bm), 0)) AS BIGINT) AS n_ret7
        |FROM bm a LEFT JOIN bm b ON b.word = a.word AND b.day = a.day + 7
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "src_compaction" ->
      // floored modulus mirrors pmod; exclusive prefix via the
      // 1-PRECEDING frame (coalesced to 0 for each group's first row)
      """WITH f AS (SELECT (ms - ((ms % 86400000 + 86400000) % 86400000)) // 86400000 AS day,
        |             CAST(count(*) * 128 AS BIGINT) AS bytes
        |           FROM (SELECT epoch_ms(o_orderdate) AS ms FROM orders) GROUP BY 1),
        |g AS (SELECT day, bytes, day // 32 AS grp FROM f),
        |a AS (SELECT CAST(sum(bytes) // count(*) AS BIGINT) AS avg_bytes FROM g),
        |sm AS (SELECT grp, bytes,
        |         CAST(coalesce(sum(bytes) OVER (PARTITION BY grp ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pre
        |       FROM g, a WHERE bytes < avg_bytes),
        |b AS (SELECT grp, CAST(pre // (4 * avg_bytes) AS BIGINT) AS bin, bytes FROM sm, a
        |      UNION ALL
        |      SELECT grp, CAST(-1 AS BIGINT) AS bin, bytes FROM g, a WHERE bytes >= avg_bytes)
        |SELECT grp, bin, count(*) AS n_files, CAST(sum(bytes) AS BIGINT) AS tot_bytes
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ev_forecast_baseline" ->
      """WITH daily AS (
        |  SELECT event_type, (ms - ((ms % 86400000 + 86400000) % 86400000)) // 86400000 AS day,
        |    count(*) AS n
        |  FROM (SELECT event_type, epoch_ms(ts) AS ms FROM events) GROUP BY 1, 2),
        |j AS (SELECT a.event_type, abs(a.n - b.n) AS err
        |      FROM daily a JOIN daily b
        |        ON a.event_type = b.event_type AND a.day = b.day + 7)
        |SELECT event_type, count(*) AS n_days,
        |  CAST(sum(err) AS BIGINT) AS total_abs_err,
        |  CAST((sum(err) * 20000 + count(*)) // (2 * count(*)) AS BIGINT) AS mae_fp4
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "src_ttl_retention" ->
      """WITH base AS (SELECT l_orderkey, epoch_ms(l_shipdate) AS ms,
        |    (epoch_ms(l_shipdate) - ((epoch_ms(l_shipdate) % 86400000 + 86400000) % 86400000)) // 86400000 AS day
        |  FROM lineitem),
        |lay AS (SELECT 'insert_order' AS layout, l_orderkey // 200 AS fid, ms FROM base
        |        UNION ALL
        |        SELECT 'date_partitioned' AS layout, day // 7 AS fid, ms FROM base),
        |pf AS (SELECT layout, fid, count(*) AS n,
        |         CAST(sum(CASE WHEN ms < 852076800000 THEN 1 ELSE 0 END) AS BIGINT) AS nexp
        |       FROM lay GROUP BY 1, 2)
        |SELECT layout, count(*) AS n_files,
        |  CAST(sum(CASE WHEN nexp = n THEN 1 ELSE 0 END) AS BIGINT) AS n_drop,
        |  CAST(sum(CASE WHEN nexp > 0 AND nexp < n THEN 1 ELSE 0 END) AS BIGINT) AS n_rewrite,
        |  CAST(sum(CASE WHEN nexp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
        |  CAST(sum(nexp) AS BIGINT) AS rows_deleted,
        |  CAST(sum(CASE WHEN nexp > 0 THEN n - nexp ELSE 0 END) AS BIGINT) AS rows_rewritten
        |FROM pf GROUP BY 1 ORDER BY 1""".stripMargin,
    "src_stats_pruning" ->
      """WITH base AS (SELECT l_orderkey, epoch_ms(l_shipdate) AS ms,
        |    (epoch_ms(l_shipdate) - ((epoch_ms(l_shipdate) % 86400000 + 86400000) % 86400000)) // 86400000 AS day
        |  FROM lineitem),
        |lay AS (SELECT 'insert_order' AS layout, l_orderkey // 200 AS fid, ms FROM base
        |        UNION ALL
        |        SELECT 'date_partitioned' AS layout, day // 7 AS fid, ms FROM base),
        |pf AS (SELECT layout, fid, min(ms) AS mn, max(ms) AS mx, count(*) AS n,
        |         CAST(sum(CASE WHEN ms >= 883612800000 AND ms < 899251200000 THEN 1 ELSE 0 END) AS BIGINT) AS nm
        |       FROM lay GROUP BY 1, 2)
        |SELECT layout, count(*) AS n_files,
        |  CAST(sum(CASE WHEN mx < 883612800000 OR mn >= 899251200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned,
        |  CAST(sum(CASE WHEN mx >= 883612800000 AND mn < 899251200000 THEN n ELSE 0 END) AS BIGINT) AS rows_scanned,
        |  CAST(sum(nm) AS BIGINT) AS rows_matched
        |FROM pf GROUP BY 1 ORDER BY 1""".stripMargin,
    "src_zorder" -> {
      // the same 4-step Morton bit spread, in SQL long arithmetic
      def spread(v: String): String = {
        val a = s"($v & 4095)"
        val b = s"(($a | ($a << 8)) & 16711935)"
        val d = s"(($b | ($b << 4)) & 252645135)"
        val e = s"(($d | ($d << 2)) & 858993459)"
        s"(($e | ($e << 1)) & 1431655765)"
      }
      s"""WITH pts AS (
        |  SELECT (l_partkey * 2654435761) % 4096 AS x,
        |    (l_suppkey * 2246822519) % 4096 AS y FROM lineitem),
        |z AS (SELECT x, y,
        |  (${spread("x")} | (${spread("y")} << 1)) AS zc FROM pts),
        |lay AS (
        |  SELECT 'zorder' AS layout, zc >> 16 AS bucket, x, y FROM z
        |  UNION ALL
        |  SELECT 'linear' AS layout, x >> 4 AS bucket, x, y FROM z)
        |SELECT layout, bucket, count(*) AS n,
        |  min(x) AS x_min, max(x) AS x_max, min(y) AS y_min, max(y) AS y_max
        |FROM lay GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    "src_ivm" ->
      """WITH chg AS (
        |  SELECT CASE WHEN l_linenumber % 3 = 2 THEN l_orderkey + 600000000
        |              ELSE l_orderkey END AS key,
        |    ((CAST(l_linenumber AS BIGINT) * 34359738368
        |        + CAST(floor(l_extendedprice*100+0.5) AS BIGINT)) * 4
        |      + l_linenumber % 3) * 4
        |      + CASE l_returnflag WHEN 'A' THEN 0 WHEN 'N' THEN 1 ELSE 2 END AS packed
        |  FROM lineitem),
        |latest AS (
        |  SELECT key,
        |    CASE (p // 4) % 4 WHEN 0 THEN 'D' WHEN 1 THEN 'U' ELSE 'I' END AS op,
        |    CASE p % 4 WHEN 0 THEN 'A' WHEN 1 THEN 'N' ELSE 'R' END AS new_status,
        |    (p // 16) % 34359738368 AS new_total_c
        |  FROM (SELECT key, max(packed) AS p FROM chg GROUP BY 1)),
        |base AS (SELECT o_orderkey AS key, o_orderstatus AS status,
        |    CAST(floor(o_totalprice*100+0.5) AS BIGINT) AS total_c FROM orders),
        |merged AS (
        |  SELECT CASE WHEN l.key IS NULL THEN b.status ELSE l.new_status END AS status,
        |    CASE WHEN l.key IS NULL THEN b.total_c ELSE l.new_total_c END AS tc
        |  FROM base b FULL JOIN latest l ON l.key = b.key
        |  WHERE l.op IS NULL OR l.op <> 'D'),
        |v AS (SELECT status, count(*) AS n, CAST(sum(tc) AS BIGINT) AS t
        |  FROM merged GROUP BY 1)
        |SELECT status, n AS n_inc, t AS sum_inc_c, n AS n_direct, t AS sum_direct_c
        |FROM v ORDER BY status""".stripMargin,
    "src_scd2" ->
      """WITH chg AS (
        |  SELECT DISTINCT
        |    CASE WHEN l_linenumber % 3 = 2 THEN l_orderkey + 600000000
        |         ELSE l_orderkey END AS key,
        |    ((CAST(l_linenumber AS BIGINT) * 34359738368
        |        + CAST(floor(l_extendedprice*100+0.5) AS BIGINT)) * 4
        |      + l_linenumber % 3) * 4
        |      + CASE l_returnflag WHEN 'A' THEN 0 WHEN 'N' THEN 1 ELSE 2 END AS packed
        |  FROM lineitem),
        |led AS (
        |  SELECT key, packed,
        |    lead(packed) OVER (PARTITION BY key ORDER BY packed) AS nxt
        |  FROM chg),
        |iu AS (SELECT * FROM led WHERE (packed // 4) % 4 <> 0)
        |SELECT key,
        |  CAST(row_number() OVER (PARTITION BY key ORDER BY packed) AS INT) AS ver,
        |  CASE packed % 4 WHEN 0 THEN 'A' WHEN 1 THEN 'N' ELSE 'R' END AS status,
        |  (packed // 16) % 34359738368 AS total_c,
        |  CAST(nxt IS NULL AS BIGINT) AS is_current
        |FROM iu ORDER BY key, ver""".stripMargin,
    "smp_balance" -> {
      val u32 = """list_reduce(list_prepend(CAST(0 AS BIGINT),
        | list_transform(range(1, 9),
        |   i -> CAST(strpos('0123456789abcdef',
        |          substr(md5('bal:' || CAST(vec_id AS VARCHAR)), CAST(i AS INT), 1)) - 1 AS BIGINT))),
        | (a, v) -> a*16 + v)""".stripMargin.replace("\n", " ")
      s"""WITH e AS (SELECT vec_id, label,
        |    CAST($u32 AS DOUBLE) / 4294967296.0 AS u FROM embeddings),
        |k AS (SELECT min(cn) AS k FROM (
        |  SELECT label, count(*) AS cn FROM e GROUP BY 1)),
        |r AS (SELECT label, vec_id, u,
        |    row_number() OVER (PARTITION BY label ORDER BY u, vec_id) AS r
        |  FROM e)
        |SELECT label, count(*) AS n_kept,
        |  CAST(sum(vec_id) AS BIGINT) AS id_sum,
        |  ${sqlFp("max(u)", 6)} AS max_u_fp6
        |FROM r, k WHERE r.r <= k.k GROUP BY label ORDER BY label""".stripMargin
    },
    "emb_class_sep" ->
      """WITH q AS (
        |  SELECT label, CAST(i - 1 AS INT) AS dim,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE)*1e6+0.5) AS BIGINT) AS v
        |  FROM embeddings CROSS JOIN range(1, 65) t(i)),
        |sums AS (SELECT label, dim, CAST(sum(v) AS BIGINT) AS sv, count(*) AS n
        |  FROM q GROUP BY 1, 2),
        |cent AS (SELECT label, dim,
        |    CAST(floor(CAST(sv AS DOUBLE)/CAST(n AS DOUBLE)+0.5) AS BIGINT) AS c
        |  FROM sums),
        |gcent AS (SELECT dim,
        |    CAST(floor(CAST(sum(sv) AS DOUBLE)/CAST(sum(n) AS DOUBLE)+0.5) AS BIGINT) AS g
        |  FROM sums GROUP BY 1),
        |w AS (SELECT q.label,
        |    sum(CAST((q.v - c.c)*(q.v - c.c) AS HUGEINT)) AS wss,
        |    count(*) // 64 AS n
        |  FROM q JOIN cent c ON c.label = q.label AND c.dim = q.dim GROUP BY 1),
        |b AS (SELECT c.label, CAST(sum((c.c - g.g)*(c.c - g.g)) AS BIGINT) AS bss
        |  FROM cent c JOIN gcent g USING (dim) GROUP BY 1)
        |SELECT w.label, CAST(w.n AS BIGINT) AS n,
        |  CAST(floor(CAST(w.wss AS DOUBLE) / CAST(w.n AS DOUBLE) / 64.0 / 1e12
        |    * 1e4 + 0.5) AS BIGINT) AS msd_within_fp4,
        |  b.bss AS bss_sq
        |FROM w JOIN b USING (label) ORDER BY label""".stripMargin,
    "emb_kmeans" -> {
      // one Lloyd step: assign (argmin dist, ties to smallest cid) →
      // per-(cid,dim) sums → centroid update with empty-cluster
      // carry-forward. Long-format twin of the Spark array-HOF path:
      // same fp6 ints, same exact integer distances, same single
      // rounded divide.
      def step(i: Int): String = {
        val p = s"c${i - 1}"
        s"""d$i AS (SELECT q.vec_id, c.cid, sum((q.v - c.c)*(q.v - c.c)) AS dist
           |  FROM q JOIN $p c ON c.dim = q.dim GROUP BY 1, 2),
           |a$i AS (SELECT vec_id, cid FROM (
           |    SELECT vec_id, cid,
           |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
           |    FROM d$i) WHERE rn = 1),
           |s$i AS (SELECT a.cid, q.dim, CAST(sum(q.v) AS BIGINT) AS sv, count(*) AS n
           |  FROM a$i a JOIN q ON q.vec_id = a.vec_id GROUP BY 1, 2),
           |c$i AS (SELECT $p.cid, $p.dim,
           |    coalesce(CAST(floor(CAST(s$i.sv AS DOUBLE)/CAST(s$i.n AS DOUBLE)+0.5) AS BIGINT), $p.c) AS c,
           |    CAST(coalesce(s$i.n, 0) AS BIGINT) AS n
           |  FROM $p LEFT JOIN s$i ON s$i.cid = $p.cid AND s$i.dim = $p.dim)""".stripMargin
      }
      s"""WITH q AS (
        |  SELECT vec_id, CAST(i - 1 AS INT) AS dim,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE)*1e6+0.5) AS BIGINT) AS v
        |  FROM embeddings CROSS JOIN range(1, 65) t(i)),
        |seeds AS (
        |  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid
        |  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)),
        |c0 AS (SELECT s.cid, q.dim, q.v AS c FROM seeds s JOIN q ON q.vec_id = s.vec_id),
        |${step(1)},
        |${step(2)}
        |SELECT cid, dim, n AS n_assigned, c AS c_fp6 FROM c2 ORDER BY cid, dim""".stripMargin
    }
  )
}
