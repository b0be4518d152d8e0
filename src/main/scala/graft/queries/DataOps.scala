package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Ann, Dedup, Sampling, TextAnalysis}
import Tables._

/** Oracle-gated LLM-data-pipeline queries: dedup (exact, n-gram Jaccard,
  * MinHash+LSH, SimHash), embedding-space closest pairs, token stats,
  * quality scoring, language ID. These are the north-star corpus-curation
  * operators (repo:BASELINE.json) exercised over the `documents` /
  * `embeddings` testdata tables.
  */
object DataOps {

  /** Run a BOUNDED (limit/groupBy-summarized) result on the cluster and
    * hand back a lineage-free copy. Gate queries return lazy frames, so
    * a persist scoped inside the query body must either leak past the
    * return (storage-memory churn for every query that follows the
    * bench suite — the round-10 p07-p09 phantom-regression mechanism)
    * or be released before the caller's action, which forfeits the
    * shared-prefix reuse the persist exists for. Materializing the
    * final few rows here pays for the work exactly once while the
    * cache is live, then the `finally` at the call site releases it. */
  private def materializedCopy(s: SparkSession, df: DataFrame): DataFrame = {
    val rows = df.collect().toIndexedSeq // bounded by the query's limit/groupBy
    s.createDataFrame(s.sparkContext.parallelize(rows, numSlices = 1), df.schema)
  }

  def dedupExactStats(s: SparkSession, d: String): DataFrame =
    Dedup.exactDedupStats(documents(s, d), "doc_id", "text")

  def jaccardPairs(s: SparkSession, d: String): DataFrame =
    Dedup.jaccardPairs(documents(s, d), "doc_id", "text",
      n = 3, threshold = 0.5)

  /** MinHash+LSH candidates, exact-verified at the same threshold as
    * [[jaccardPairs]] — on this corpus the banded LSH (32 hashes × 16
    * bands) has verified-complete recall at j >= 0.5, so it shares the
    * exact-Jaccard oracle. */
  def minhashPairs(s: SparkSession, d: String): DataFrame =
    Dedup.minHashDedupPairs(documents(s, d), "doc_id", "text",
      n = 3, numHashes = 32, bands = 16, threshold = 0.5)

  /** SimHash near-dup pairs under the md5-prefix-60 term hash
    * ([[Dedup.Md5Prefix60TermHash]]) — bit-reproducible in DuckDB via
    * `('0x' || substring(md5(t), 1, 15))::BIGINT`, so the FULL pipeline
    * (tokenize → tf → per-bit majority signature → banded Hamming
    * pairs) is oracle-gated. Banding is lossless here (bands=4 >
    * maxDist=3, pigeonhole; no over-cap buckets at test scale), so the
    * oracle can compute pairs by exact all-pairs Hamming. */
  /** SimHash PAIRS memoized per (session, corpus version) — the
    * [[bpeMemo]] discipline with the unpersist hook: [[Dedup.simHash]]
    * builds a fresh typed-stage plan per call (new closure instance),
    * so Dedup's own semantic-hash gate cache cannot recognize p04's
    * and p39's channels as the same computation; this site-level memo
    * makes the consensus gate a cache HIT on the p04 table instead of
    * a second corpus pass. */
  private val simhashPairsMemo = new graft.core
    .LruCache[(String, String, String), DataFrame](4,
      (_, f) => try f.unpersist(false) catch { case _: Throwable => () })

  def simhashPairs(s: SparkSession, d: String): DataFrame =
    simhashPairsMemo.getOrElseUpdate(
      (graft.core.SessionId.of(s), d, bpeVersion(s, d))) {
      val p = Dedup.simHashPairs(
        Dedup.simHash(documents(s, d), "doc_id", "text",
          Dedup.Md5Prefix60TermHash), maxDist = 3, bands = 4)
        .persist()
      p.count()
      p
    }

  /** p39: CONSENSUS near-dup pairs — the multi-signal precision
    * pattern a curation pipeline runs before destructive dedup at
    * corpus scale: a pair survives only when flagged by BOTH lexical
    * channels — shingle-Jaccard (content overlap >= 0.5, the p02/p03
    * operator) AND SimHash (token-distribution agreement, hamming
    * <= 3, the p04 operator) — so single-channel artifacts
    * (boilerplate-skewed bit agreement; short-text shingle flukes)
    * drop. Both channels read their MEMOIZED tables (the shared
    * shingle/pair frames), and the consensus itself is one pair-keyed
    * join of two already-thinned pair sets — never a third corpus
    * pass. The oracle composes the two factored CTE recipes
    * ([[jaccardCtes]] ⋈ [[simhashCtes]]) so neither channel can
    * de-sync from its own gate. */
  def consensusPairs(s: SparkSession, d: String): DataFrame = {
    // the CHANNELS themselves, not re-spelled copies of their bodies:
    // a retuned threshold/band count in p02/p04 flows into the
    // consensus automatically (the Spark-side twin of the
    // jaccardCtes/simhashCtes oracle factoring)
    val jac = jaccardPairs(s, d)
    val sim = simhashPairs(s, d)
    val out = jac
      .join(sim.select(col("a"), col("b"), col("hamming")),
        Seq("a", "b"))
      .localCheckpoint(true) // the vacuity probe is an extra action
    require(out.limit(1).count() > 0,
      "p39 is vacuous: the two channels agree on no pair at all")
    out.orderBy("a", "b")
  }

  def closestPairsCos(s: SparkSession, d: String): DataFrame =
    Dedup.closestPairs(embeddings(s, d), "vec_id", "embedding",
      Ann.Cosine, 10)

  /** SemDeDup semantic dedup over the embeddings corpus with a planted
    * exact duplicate of every row (vec_id + 100000, the p09 pattern):
    * 8 deterministic seed centroids (the embeddings of vec_id 0..7, so
    * the DuckDB oracle can replay the whole chain — cosine argmin
    * assignment, farthest-from-centroid keeper ranking, greedy
    * within-cell dominance at tau=0.95 — from first principles), then
    * [[Dedup.semDedup]]. Every planted twin must be pruned by its
    * original, and the survivors' (cell, cent_cos) hash-pin the
    * assignment + ranking math. */
  def semDedup(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
    val planted = e.select((col("vec_id") + 100000).as("vec_id"),
      col("embedding"))
    val model = Ann.IvfModel(
      e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("long").as("centroid_id"),
          col("embedding").cast("array<double>").as("centroid")),
      "centroid_id", "centroid")
    Dedup.semDedup(e.unionByName(planted), "vec_id", "embedding",
        model, tau = 0.95)
      .orderBy("vec_id")
  }

  /** Cosine-LSH near-dup scan over a corpus with PLANTED duplicates
    * (the table unioned with an id-shifted copy of itself): every
    * duplicate pair must be found — identical vectors get identical
    * signatures, so LSH recall is deterministic here — and the corpus
    * itself contains no pair above the threshold (max cos ≈ 0.51), so
    * the oracle is the exact all-pairs scan. */
  def cosineLshDedup(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
    val planted = e.select((col("vec_id") + 100000).as("vec_id"),
      col("embedding"))
    Dedup.cosinePairsLsh(e.unionByName(planted), "vec_id", "embedding",
        threshold = 0.95)
      .orderBy("a", "b")
  }

  /** Documents repartitioned for compute-bound text stages (the parquet
    * is a single small file; regex-heavy maps need all cores). The rows
    * pass through a typed identity mapPartitions stage: the object-mode
    * boundary (Deserialize/Serialize) is a projection barrier Catalyst
    * cannot push the regex-heavy downstream expressions through, so the
    * heavy maps run at full post-repartition parallelism. Self-
    * documenting (no nondeterminism lie) and codegen resumes above the
    * serialize. At real corpus scale the scan has many splits and this
    * helper is unnecessary — it exists for the small-file test corpus. */
  private def docsPar(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select(col("doc_id").cast("long"), col("lang"), col("text"))
      .repartition(s.sparkContext.defaultParallelism)
      .as[(Long, String, String)]
      .mapPartitions(identity)
      .toDF("doc_id", "lang", "text")
  }

  def tokenStats(s: SparkSession, d: String): DataFrame =
    TextAnalysis.stats(docsPar(s, d), "text")
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("sum_chars"),
        round(sum(col("n_tokens_ws")).cast("double") / count(lit(1)), 6)
          .as("avg_ws_tokens"),
        round(sum(col("n_tokens_bpe")).cast("double") / count(lit(1)), 6)
          .as("avg_bpe_tokens"))
      .orderBy("lang")

  /** p27: the distributed BPE trainer
    * ([[graft.functions.Tokenizers.trainBpe]]) — [[BpeMerges]] learned
    * merge rules over the corpus, every round's pair count, argmax and
    * string-replace fusion replayed by the unrolled oracle. The
    * trainer-faces-the-oracle rule (round-10's KMeans seed collapse,
    * round-12's r42): tokenizer training is a training-data pipeline op
    * and its output is a deterministic TABLE, so it gates like one. */
  val BpeMerges = 8

  /** Trained merge rows memoized per (session, corpus, CONTENT
    * version): p27 gates the trainer, p28-p30 consume the SAME rules —
    * repeated bench passes must not re-train, but an in-place corpus
    * rewrite MUST (the index caches already key on dirVersion; rules
    * trained on a corpus that no longer exists would silently pair
    * with a fresh index). Collected rows only: nothing to unpersist —
    * but bounded + access-ordered ([[graft.core.LruCache]]) all the
    * same: the shared memo discipline. */
  private val bpeMemo = new graft.core
    .LruCache[(String, String, String), Seq[(Int, String, String, Long)]](8)

  private def bpeVersion(s: SparkSession, d: String): String =
    graft.ops.Bm25.dirVersion(s, s"$d/documents.parquet")

  private def trainedMerges(s: SparkSession,
                            d: String): Seq[(Int, String, String, Long)] =
    bpeMemo.getOrElseUpdate(
      (graft.core.SessionId.of(s), d, bpeVersion(s, d))) {
      graft.functions.Tokenizers.trainBpe(documents(s, d), "text",
          merges = BpeMerges)
        .orderBy("rank").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSeq
    }

  def bpeTrain(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    trainedMerges(s, d).toDF("rank", "lhs", "rhs", "cnt")
  }

  /** p28: ENCODE with the learned rules — the trainer's output applied
    * back to the corpus ([[graft.functions.Tokenizers.applyBpe]] in
    * rank order over the word-frequency table, so encoding is
    * vocabulary-linear like training), reported as the top-20 subword
    * tokens by corpus frequency. The oracle replays encoding off its
    * own final merge-round word table — train and apply must agree
    * end-to-end across engines. */
  def bpeEncode(s: SparkSession, d: String): DataFrame = {
    val words = documents(s, d)
      .select(explode(graft.ops.Bm25.tokenize(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
    val enc = graft.functions.Tokenizers.applyBpe(words, "w",
      trainedMerges(s, d).map(m => (m._2, m._3)))
    enc.select(explode(split(trim(col("s")), " ")).as("token"), col("f"))
      .groupBy("token").agg(sum(col("f")).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(20)
  }

  /** p29: BM25 keyword search OVER THE TRAINED TOKENIZER — the learned
    * merges register as a per-column tokenizer model
    * ([[graft.functions.Tokenizers.bpeTokenizer]], the
    * `create_tokenizer` surface) and the whole index+search chain runs
    * on trained subwords, query segmentation included. The oracle
    * replays tokenization as a word→subword JOIN against its own final
    * merge-round table — the r24 WordPiece pattern with a LEARNED
    * segmentation instead of a derived one. */
  def bm25BpeTopk(s: SparkSession, d: String): DataFrame = {
    val merges = trainedMerges(s, d).map(m => (m._2, m._3))
    val tok = graft.functions.Tokenizers.bpeTokenizer(merges,
      name = s"bpe|$d")
    val idx = graft.ops.Bm25.buildCached(documents(s, d), "doc_id",
      "text",
      s"p29|$d|${graft.ops.Bm25.dirVersion(s, s"$d/documents.parquet")}",
      tok)
    graft.ops.Bm25.search(idx, "spark filter join", 10)
  }

  /** p30: the tokenizer ARTIFACT lifecycle — train → persist
    * ([[graft.functions.Tokenizers.writeBpeModel]]: merges parquet +
    * content-fingerprint marker) → load (fingerprint-verified,
    * registered under the content-derived name) → rebuild the BM25
    * index UNDER THE LOADED MODEL → search. Shares p29's oracle: a
    * persisted-and-reloaded tokenizer must retrieve bit-identically to
    * the in-memory one, which is exactly the contract that lets a
    * 100 TB index ship with its tokenizer. */
  /** Model roots memoized like [[bpeMemo]]: repeated bench passes
    * reuse one written artifact instead of littering temp dirs and
    * paying per-call write I/O. */
  private val bpeModelDirs =
    new graft.core.LruCache[(String, String, String), String](8)

  def bpeModelRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = bpeModelDirs.getOrElseUpdate(
      (graft.core.SessionId.of(s), d, bpeVersion(s, d))) {
      val t = java.nio.file.Files
        .createTempDirectory("graft_bpe_model").toString
      graft.functions.Tokenizers.writeBpeModel(s,
        trainedMerges(s, d).toDF("rank", "lhs", "rhs", "cnt"), t)
      t
    }
    val tok = graft.functions.Tokenizers.loadBpeModel(s, dir)
    val idx = graft.ops.Bm25.buildCached(documents(s, d), "doc_id",
      "text", s"p30|$d|${bpeVersion(s, d)}", tok)
    graft.ops.Bm25.search(idx, "spark filter join", 10)
  }

  /** p31: the corpus-health REPORT — the one-row summary a curation
    * run prints before anyone ships data: corpus size, exact-dup
    * involvement, mean Gopher quality, language-distribution entropy,
    * total whitespace tokens. Pure composition of already-gated
    * fragments (p01 dup groups, p07 quality, p08 langid, p06 token
    * stats), gated as a UNIT so the composition itself can't drift. */
  def corpusReport(s: SparkSession, d: String): DataFrame = {
    val docs = docsPar(s, d)
    val nDocs = documents(s, d).agg(count(lit(1)).as("n_docs"))
    val dup = docs.groupBy("text").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .agg(coalesce(sum(col("c")), lit(0L)).as("dup_docs"))
    val meanQ = TextAnalysis.qualityScore(docs, "text")
      .agg(round(avg(col("quality")), 6).as("mean_quality"))
    val langN = docs
      .withColumn("l", TextAnalysis.langId(col("text")))
      .groupBy("l").agg(count(lit(1)).as("n"))
    val total = documents(s, d).count().toDouble
    val entropy = langN
      .withColumn("p", col("n").cast("double") / total)
      .agg(round(-sum(col("p") * log(2.0, col("p"))), 6)
        .as("lang_entropy"))
    val toks = TextAnalysis.stats(docs, "text")
      .agg(sum(col("n_tokens_ws")).as("total_ws_tokens"))
    nDocs.crossJoin(dup).crossJoin(meanQ).crossJoin(entropy)
      .crossJoin(toks)
  }

  def qualityTopk(s: SparkSession, d: String): DataFrame =
    TextAnalysis.qualityScore(docsPar(s, d), "text")
      .select(col("doc_id"), col("quality"))
      .orderBy(col("quality").desc, col("doc_id").asc)
      .limit(10)

  def langidCounts(s: SparkSession, d: String): DataFrame =
    docsPar(s, d)
      .withColumn("pred_lang", TextAnalysis.langId(col("text")))
      .groupBy("pred_lang").agg(count(lit(1)).as("n"))
      .orderBy("pred_lang")

  /** p38: the langid chain JUDGED against the corpus's own `lang`
    * labels — the confusion matrix a curation pipeline reads before
    * trusting a language filter (p08 counts predictions; this says
    * which true languages they came from): one row per (lang,
    * pred_lang) with the count and the per-true-language recall
    * fraction. Map-only prediction + two combinable aggregates — no
    * shape change at 100 TB. Vacuity pinned: at least one diagonal
    * cell must exist (a dead predictor would emit only 'und'). */
  def langidConfusion(s: SparkSession, d: String): DataFrame = {
    val pred = docsPar(s, d)
      .withColumn("pred_lang", TextAnalysis.langId(col("text")))
    val conf = pred.groupBy("lang", "pred_lang")
      .agg(count(lit(1)).as("n"))
    val tot = pred.groupBy("lang").agg(count(lit(1)).as("tt"))
    // localCheckpoint: the vacuity require below is an extra action —
    // without the pin it re-executes the full langid UDF chain once
    // for the probe and again when the gate output materializes (the
    // g07 lesson in confusion-matrix form). The matrix is ≤|langs|²
    // rows, so the checkpoint is tiny.
    val cells = conf.join(tot, "lang")
      .select(col("lang"), col("pred_lang"), col("n"),
        round(col("n").cast("double") / col("tt"), 6).as("frac"))
      .localCheckpoint(true)
    require(cells.filter(col("lang") === col("pred_lang"))
        .limit(1).count() > 0,
      "p38 is vacuous: the predictor agrees with no label at all")
    cells.orderBy("lang", "pred_lang")
  }

  /** Document fingerprint overlap: min-k shingle-hash sketches per doc,
    * top-10 doc pairs by sketch intersection (the bottom-k containment
    * estimate). Runs the md5-prefix-60 hash family
    * ([[TextAnalysis.fingerprintMd5]]) so the full sketch pipeline is
    * reproducible in — and gated by — the DuckDB oracle. */
  def fingerprintOverlap(s: SparkSession, d: String): DataFrame = {
    // persisted: consumed twice (stop-hash counting AND the pair join) —
    // without it the shingle+sort fingerprint computation runs twice
    val fpAll = docsPar(s, d)
      .select(col("doc_id"),
        explode(TextAnalysis.fingerprintMd5(col("text"), n = 4, k = 16))
          .as("h"))
      .persist()
    try {
      // stop-hash cap (standard sketch-join skew defense): a hash shared
      // by very many docs carries no near-dup signal but quadratically
      // dominates the self-join at corpus scale
      val hot = fpAll.groupBy("h").agg(count(lit(1)).as("df"))
        .filter(col("df") > 64).select("h")
      val fp = fpAll.join(broadcast(hot), Seq("h"), "left_anti")
      materializedCopy(s,
        fp.as("x").join(fp.as("y"),
            col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
          .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
          .agg(count(lit(1)).as("n_shared"))
          .orderBy(col("n_shared").desc, col("a").asc, col("b").asc)
          .limit(10))
    } finally fpAll.unpersist(false)
  }

  /** Duplicate clusters: connected components over the exact-Jaccard
    * pair graph (alternating large-star/small-star), each doc labeled
    * with the minimum id reachable through any chain of near-dup pairs.
    * The oracle recomputes the same components with a recursive
    * reachability CTE over the identical pair set. */
  def dupClusters(s: SparkSession, d: String): DataFrame =
    Dedup.components(
        Dedup.jaccardPairs(documents(s, d), "doc_id", "text",
          n = 3, threshold = 0.5))
      .orderBy("id")

  /** p26: quality-aware canonical dedup ([[Dedup.canonicalPerCluster]])
    * — p11's near-dup clusters crossed with p07's Gopher-style quality
    * score: per cluster keep the HIGHEST-quality member (ties doc_id
    * asc), singletons keep themselves. The curation-pipeline form of
    * dedup: the kept set preserves corpus coverage while upgrading
    * which copy survives. */
  def canonicalDedup(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val scored = TextAnalysis.qualityScore(docsPar(s, d), "text")
      .select(col("doc_id"), col("quality"))
    Dedup.canonicalPerCluster(scored, "doc_id", "quality",
        Dedup.components(Dedup.jaccardPairs(docs, "doc_id", "text",
          n = 3, threshold = 0.5)))
      .select(col("doc_id"), col("component"), col("quality"), col("keep"))
      .orderBy("doc_id")
  }

  /** Benchmark decontamination: every 10th document plays the held-out
    * benchmark set, the rest the training corpus; report training docs
    * containing >= 30% of a benchmark doc's distinct 3-gram shingles
    * ([[Dedup.containmentPairs]] — the asymmetric-overlap scan test-set
    * leakage checks use). */
  def decontaminate(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    Dedup.containmentPairs(
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text",
        docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
        n = 3, threshold = 0.3)
      .orderBy(col("containment").desc, col("b_id").asc, col("t_id").asc)
  }

  /** Deterministic 80/10/10 hash split ([[Sampling.withSplit]]):
    * per-split document counts + char mass. The assignment depends only
    * on doc_id (md5-derived bucket), so the oracle reproduces it
    * bit-for-bit and re-runs never move a document between splits. */
  def hashSplits(s: SparkSession, d: String): DataFrame =
    Sampling.withSplit(documents(s, d), "doc_id",
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy("split")

  /** Corpus-level duplicated-n-gram strip ([[Dedup.dupNgramStrip]],
    * the Lee-et-al exact-substring dedup): repeated word 3-grams keep
    * only their first (doc, pos) occurrence; the full cleaned text per
    * doc is the gate (any wrong span boundary changes the hash). */
  def dupNgrams(s: SparkSession, d: String): DataFrame =
    Dedup.dupNgramStrip(documents(s, d), "doc_id", "text",
        n = 3, minOcc = 2)
      .orderBy("doc_id")

  /** Deterministic source rebalancing ([[Sampling.stratifiedSample]]):
    * downsample dominant language strata to target fractions (the
    * corpus-mixing step of a pretraining pipeline — e.g. cap English
    * at 50%, keep low-resource languages whole). Map-only, no RNG:
    * the oracle reproduces every kept row from doc_id alone. */
  def stratifiedMix(s: SparkSession, d: String): DataFrame =
    Sampling.stratifiedSample(documents(s, d), "doc_id", "lang",
        Map("en" -> 0.5, "de" -> 0.75, "fr" -> 0.75))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy("lang")

  /** Sequence packing ([[Sampling.packSequences]]): 8 hash shards,
    * 512-token packs over whitespace token counts; per-pack doc count
    * + token mass is the gate (any off-by-one in the running cut moves
    * a doc across packs and changes the hash). */
  def packSeqs(s: SparkSession, d: String): DataFrame =
    Sampling.packSequences(documents(s, d), "doc_id",
        size(filter(split(col("text"), " "), t => t =!= "")),
        budget = 512, shards = 8)
      .groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(filter(split(col("text"), " "), t => t =!= "")).cast("long"))
          .as("sum_tokens"))
      .orderBy("shard", "pack_id")

  /** PII scrub ([[TextAnalysis.scrubPii]]): deterministic synthetic
    * PII (email/IP/phone derived from doc_id) is planted into each doc,
    * then redacted; the full scrubbed text is the gate. Map-only —
    * fuses into the scan at any scale. */
  def piiScrub(s: SparkSession, d: String): DataFrame = {
    val aug = documents(s, d).select(col("doc_id"),
      concat(col("text"), lit(" contact user"), col("doc_id"),
        lit("@example.com from 10.0."), col("doc_id") % 256,
        lit(".7 call 555-0199")).as("aug"))
    TextAnalysis.scrubPii(aug, "aug")
      .select("doc_id", "n_emails", "n_ips", "n_phones", "clean")
      .orderBy("doc_id")
  }

  /** End-to-end corpus curation — the LLM-pipeline operators COMPOSED
    * the way a real pretraining data pipeline chains them (each stage
    * is individually gated by p01-p17; this gates the composition):
    * quality filter (score >= 0.6) → exact dedup (keep lowest doc_id
    * per text) → benchmark decontamination (drop the bench split
    * itself and any surviving train doc with >= 30% 3-gram containment
    * of a bench doc) → deterministic source mixing (cap en 0.5,
    * de/fr 0.75) → 80/10/10 hash split → 512-token packing in 4 hash
    * shards per split. One row per split: (n_docs, sum_chars,
    * n_packs). Every stage is map-only or one combinable shuffle —
    * the whole chain survives 100 TB because each link does. */
  def curationE2e(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .select("doc_id", "lang", "text", "n_chars")
    val scored = TextAnalysis.qualityScore(
        docs.repartition(s.sparkContext.defaultParallelism), "text")
      .filter(col("quality") >= 0.6)
      .select("doc_id", "lang", "text", "n_chars")
    val deduped = Dedup.exactDedup(scored, "doc_id", "text")
    val bench = documents(s, d).filter(col("doc_id") % 10 === 0)
    val train = deduped.filter(col("doc_id") % 10 =!= 0)
    val contaminated = Dedup.containmentPairs(
        bench, "doc_id", "text", train, "doc_id", "text",
        n = 3, threshold = 0.3)
      .select(col("t_id").as("doc_id")).distinct()
    val clean = train.join(contaminated, Seq("doc_id"), "left_anti")
    val mixed = Sampling.stratifiedSample(clean, "doc_id", "lang",
      Map("en" -> 0.5, "de" -> 0.75, "fr" -> 0.75))
    // persisted: the per-split packing fans out into three branches
    // below, and without the cache each would re-run the whole
    // quality→dedup→decontaminate chain (3× the containment join)
    val bySplit = Sampling.withSplit(mixed, "doc_id",
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .persist()
    try {
      val nTok = size(filter(split(col("text"), " "), t => t =!= ""))
      val packed = Seq("train", "val", "test").map { sp =>
        Sampling.packSequences(bySplit.filter(col("split") === sp),
          "doc_id", nTok, budget = 512, shards = 4)
      }.reduce(_ unionByName _)
      materializedCopy(s,
        packed.groupBy("split")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            countDistinct(concat_ws("-", col("shard"), col("pack_id")))
              .as("n_packs"))
          .orderBy("split"))
    } finally bySplit.unpersist(false)
  }

  /** Gopher-style repetition signals per doc ([[TextAnalysis
    * .repetitionStats]]): fraction of repeated word-trigram
    * occurrences + share of the single most frequent bigram —
    * full-table gate (every doc row hash-compared). */
  def repetition(s: SparkSession, d: String): DataFrame =
    TextAnalysis.repetitionStats(docsPar(s, d), "doc_id", "text")
      .orderBy("doc_id")

  /** p22: embedding-space domain discovery ([[graft.ops.Domains
    * .domainMixTable]]) — documents clustered into 4 domains by the
    * PRODUCTION KMeans trainer (portable-md5 seed draw + 2 Lloyd
    * iterations, the r42-oracled machinery on FULL vectors), then
    * tabulated against the declared `lang` stratum with doc counts
    * and mean length: the mixing table a DoReMi-style sampler feeds
    * on. The oracle replays the whole trainer first-principles in
    * SQL — seeds, both iterations, final assignment — then the join
    * and aggregation. */
  def domainClusters(s: SparkSession, d: String): DataFrame =
    graft.ops.Domains.domainMixTable(
      documents(s, d), "doc_id",
      embeddings(s, d), "vec_id", "embedding",
      "lang", col("n_chars"), k = 4, iters = 2)

  /** p23: LM-perplexity quality filter ([[TextAnalysis.lmLogLoss]]) —
    * the 20 documents whose word transitions the corpus-trained bigram
    * model finds most surprising (the tail a CCNet-style split drops),
    * ties by doc_id. Full model faces the oracle: corpus bigram
    * counts, conditional MLE, per-doc mean NLL. */
  def lmQualityTail(s: SparkSession, d: String): DataFrame =
    TextAnalysis.lmLogLoss(documents(s, d), "doc_id", "text")
      .orderBy(col("lm_loss").desc, col("doc_id").asc)
      .limit(20)

  /** p24: deterministic epoch shuffle ([[graft.ops.Sampling
    * .epochShuffle]]) — the reproducible "shuffle the corpus each
    * epoch" pass: md5(seed:id) order keys, global 0-based positions
    * assigned via range shards + shard-offset windows (never a
    * single-partition sort). The oracle replays the portable hash and
    * a global row_number — if the distributed shard/offset plumbing
    * mis-stitched anywhere, positions diverge. Output ordered by pos;
    * the first 40 rows keep the gate row-bounded while still crossing
    * many shard boundaries. */
  def epochShuffleHead(s: SparkSession, d: String): DataFrame =
    graft.ops.Sampling.epochShuffle(documents(s, d), "doc_id",
        seed = "epoch7", shards = 16)
      .select(col("doc_id"), col("okey"), col("pos"))
      .orderBy(col("pos").asc)
      .limit(40)

  /** p25: score-proportional deterministic sampling
    * ([[graft.ops.Sampling.sampleByProb]]) — quality-weighted
    * downsampling with no RNG: keep iff the 32-bit md5 unit value
    * falls under a per-row probability (here a length-derived quality
    * proxy, n_chars/2000 clamped to 1). Full kept-set gate: the oracle
    * replays the exact unit hash (power-of-two division — the double
    * is exact, the boundary can't disagree) and the same probability
    * column. */
  def qualitySample(s: SparkSession, d: String): DataFrame =
    graft.ops.Sampling.sampleByProb(documents(s, d), "doc_id",
        least(lit(1.0), col("n_chars").cast("double") / 2000.0))
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id").asc)

  /** p32: DSIR importance resampling ([[TextAnalysis.dsirWeights]] +
    * [[graft.ops.Sampling.gumbelTopK]]) — the published
    * select-data-like-your-target recipe end-to-end: hashed
    * unigram+bigram bags (256 md5 buckets), add-one-smoothed target
    * (lang='en') vs raw (whole corpus) distributions, per-doc
    * log-likelihood-ratio weights, then a Gumbel-top-30 draw ∝
    * softmax(logw) on the md5 noise grid. The oracle replays the
    * whole chain first-principles — features, buckets, both count
    * vectors, smoothing, the rounded per-bucket ratios, the noise —
    * so a drift anywhere (tokenizer, hash, smoothing, rounding, the
    * trick itself) lands on different rows. */
  def dsirSample(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val w = TextAnalysis.dsirWeights(
      docs, docs.filter(col("lang") === "en"), "doc_id", "text",
      buckets = 256)
    graft.ops.Sampling.gumbelTopK(w, "doc_id", "logw", 30, "dsir7")
      .select(col("doc_id"), col("logw"), col("gkey"))
  }

  /** p33: leakage-safe splits ([[graft.ops.Sampling.leakageSafeSplit]])
    * — p11's near-dup components drive the split so a test document can
    * never be a paraphrase of a training document: every non-
    * representative member (component ≠ own id — the docs whose split
    * the mechanism may have MOVED) is emitted with its naive per-id
    * split next to the cluster-aware one. Non-degeneracy pinned
    * in-query: the gate refuses if no doc was subject to rehoming
    * (then it would be testing nothing — the g04 lesson). */
  def leakageSplits(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val comps = Dedup.components(
      Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5))
    val w = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val safe = graft.ops.Sampling.leakageSafeSplit(docs, "doc_id", comps, w)
      .select(col("doc_id"), col("component"),
        col("split").as("split_safe"))
    val naive = graft.ops.Sampling.withSplit(docs, "doc_id", w)
      .select(col("doc_id"), col("split").as("split_naive"))
    val moved = safe.filter(col("component") =!= col("doc_id"))
      .join(naive, Seq("doc_id"))
      .select(col("doc_id"), col("component"),
        col("split_naive"), col("split_safe"))
      .orderBy("doc_id")
    require(moved.limit(1).count() > 0,
      "leakage-split gate is vacuous: no doc is a non-representative " +
        "component member, the rehoming path was never exercised")
    moved
  }

  /** g08: synchronous k-core peel ([[graft.graph.Graph.kCorePeel]],
    * k=2, 3 rounds) over the NEAR-DUP document graph (p02's exact-
    * Jaccard pairs at 0.5) — the cohesion lens of the graph-analytics
    * family (g04 importance, g05 membership, g07 clique-ness), run
    * where peeling is non-trivial: the entity co-mention graph is too
    * dense to peel, while the dup graph separates tight duplicate
    * cores (every member keeps ≥2 near-dup neighbors) from pair/chain
    * stragglers. Lives in this file to share the `jaccardCtes` oracle
    * prefix. Output pins the whole trajectory: (doc_id, peel_round
    * 1-based or 0 = survivor, last_deg at the node's final check).
    * Vacuity pinned both ways in-query — some node must peel AND some
    * node must survive, else the gate tests a constant. */
  def kcorePeel(s: SparkSession, d: String): DataFrame = {
    val pairs = Dedup.jaccardPairs(documents(s, d), "doc_id", "text",
      n = 3, threshold = 0.5)
    val out = graft.graph.Graph.kCorePeel(pairs, k = 2, iters = 3)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id").asc)
    require(out.filter(col("peel_round") >= 1).limit(1).count() > 0,
      "g08 is vacuous: no node peeled — every dup-graph node keeps " +
        ">=2 neighbors, the peel path was never exercised")
    require(out.filter(col("peel_round") === 0).limit(1).count() > 0,
      "g08 is vacuous: every node peeled — no 2-core survived, the " +
        "survivor path was never exercised")
    out
  }

  /** p34: PMI bigram collocations ([[TextAnalysis.pmiCollocations]],
    * minCount 5, top 50) — the phrase-mining signal: adjacent pairs
    * co-occurring far above chance under the margins of the bigram
    * table itself. One float op (ln of a count ratio), rounded before
    * the ordering; ties (w1, w2) asc. */
  def pmiCollocs(s: SparkSession, d: String): DataFrame =
    TextAnalysis.pmiCollocations(documents(s, d), "text")

  /** p35: per-document TF-IDF keywords ([[TextAnalysis
    * .tfIdfKeywords]], top 3 per doc) — the what-is-this-doc-about
    * column a curation pipeline stores next to quality and language.
    * Smoothed idf rounded to 9 before the multiply (the dsir rule),
    * score rounded before the per-doc rank, ties term asc. */
  def tfidfKeywords(s: SparkSession, d: String): DataFrame =
    TextAnalysis.tfIdfKeywords(documents(s, d), "doc_id", "text")
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id").asc, col("rk").asc)

  /** p36: greedy k-center coreset selection
    * ([[graft.ops.Sampling.kCenterAssign]], k=5) — the DIVERSITY
    * sampler: five centers spread across the embedding space (seed =
    * min id, then four farthest-point rounds, every distance rounded
    * before every argmax), gated through the full coverage map so the
    * oracle re-derives the entire selection trajectory: a drift in ANY
    * round's argmax re-homes some assignment. Non-degeneracy pinned
    * in-query: k distinct centers must emerge. */
  def kcenterCoreset(s: SparkSession, d: String): DataFrame = {
    val out = graft.ops.Sampling.kCenterAssign(
        embeddings(s, d), "vec_id", "embedding", k = 5)
      .withColumnRenamed("id", "vec_id")
      .orderBy(col("vec_id").asc)
    require(out.select(col("center_id")).distinct().count() == 5,
      "p36 is degenerate: fewer than k distinct centers were selected")
    out
  }

  /** p37: temperature-scaled domain mixing
    * ([[graft.ops.Domains.temperatureMix]] +
    * [[graft.ops.Domains.temperatureSample]], α=0.5, budget 200 over
    * the declared `lang` domains) — the multilingual upsampling
    * recipe: rare languages keep (nearly) everything, dominant ones
    * thin toward the α-tempered share, realized by the deterministic
    * unit hash so the kept set replays anywhere. The gate emits the
    * kept rows WITH their domain's rate — a drift in counts, the
    * tempered weights, the normalization, the cap, or the hash all
    * re-home rows. Vacuity pinned: some domain must actually thin
    * (rate < 1), else the gate is p-all-pass. */
  def temperatureSample(s: SparkSession, d: String): DataFrame = {
    val out = graft.ops.Domains.temperatureSample(
        documents(s, d), "doc_id", "lang", alpha = 0.5, budget = 200)
      .select(col("doc_id"), col("lang"), col("rate"))
      .orderBy(col("doc_id").asc)
    require(out.filter(col("rate") < 1.0).limit(1).count() > 0,
      "p37 is vacuous: every domain kept everything — the thinning " +
        "path was never exercised")
    out
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p37_temperature_mix" -> temperatureSample,
    "p36_kcenter_coreset" -> kcenterCoreset,
    "p35_tfidf_keywords" -> tfidfKeywords,
    "p34_pmi_collocations" -> pmiCollocs,
    "g08_kcore" -> kcorePeel,
    "p33_leakage_splits" -> leakageSplits,
    "p32_dsir_sample" -> dsirSample,
    "p25_quality_sample" -> qualitySample,
    "p24_epoch_shuffle" -> epochShuffleHead,
    "p23_lm_quality" -> lmQualityTail,
    "p22_domain_clusters" -> domainClusters,
    "p21_length_outliers" -> ((s, d) =>
      TextAnalysis.lengthQuantiles(documents(s, d), "lang", "n_chars")),
    "p19_repetition" -> repetition,
    "p18_curation_e2e" -> curationE2e,
    "p17_pii_scrub" -> piiScrub,
    "p16_pack_sequences" -> packSeqs,
    "p15_stratified_mix" -> stratifiedMix,
    "p14_dup_ngram_strip" -> dupNgrams,
    "p12_decontaminate" -> decontaminate,
    "p13_hash_splits" -> hashSplits,
    "p10_fingerprint_overlap" -> fingerprintOverlap,
    "p11_dup_clusters" -> dupClusters,
    "p26_canonical_dedup" -> canonicalDedup,
    "p27_bpe_train" -> bpeTrain,
    "p28_bpe_encode" -> bpeEncode,
    "p29_bm25_bpe" -> bm25BpeTopk,
    "p30_bpe_model_roundtrip" -> bpeModelRoundtrip,
    "p31_corpus_report" -> corpusReport,
    "p01_dedup_exact" -> dedupExactStats,
    "p02_jaccard_pairs" -> jaccardPairs,
    "p03_minhash_pairs" -> minhashPairs,
    "p04_simhash_pairs" -> simhashPairs,
    "p39_consensus_pairs" -> consensusPairs,
    "p05_closest_pairs_cos" -> closestPairsCos,
    "p09_cosine_lsh_dedup" -> cosineLshDedup,
    "p20_semdedup" -> semDedup,
    "p06_token_stats" -> tokenStats,
    "p07_quality_topk" -> qualityTopk,
    "p08_langid_counts" -> langidCounts,
    "p38_langid_confusion" -> langidConfusion)

  /** DuckDB tokenizer mirroring Bm25.tokenize. */
  private val toksSql =
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x != '')"

  /** DuckDB word-3-gram shingle CTE chain mirroring Dedup.shingles /
    * jaccardPairs, ending in `jp` = the (a, b, jaccard) pairs at
    * threshold 0.5 (shared by the exact-Jaccard, MinHash, and
    * dup-cluster oracles). */
  private val jaccardCtes: String =
    s"""t AS (SELECT doc_id, $toksSql AS toks FROM documents),
        s AS (SELECT doc_id,
                unnest(list_distinct(list_transform(range(len(toks) - 2),
                  i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])))
                AS sh
              FROM t),
        sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY 1),
        inter AS (SELECT a.doc_id AS ai, b.doc_id AS bi, count(*) AS c
                  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
        j AS (SELECT ai AS a, bi AS b,
                round(CAST(c AS DOUBLE) / (x.n + y.n - c), 6) AS jaccard
              FROM inter JOIN sz x ON ai = x.doc_id JOIN sz y ON bi = y.doc_id),
        jp AS (SELECT a, b, jaccard FROM j WHERE jaccard >= 0.5)"""

  private val jaccardSql: String =
    s"WITH $jaccardCtes SELECT a, b, jaccard FROM jp"

  /** The SimHash pair recipe as a FACTORED fragment (CTE names
    * prefixed `s*` so it composes with [[jaccardCtes]] in one WITH —
    * the langPredCtes rule: p04 and the p39 consensus join must not
    * be able to de-sync). `sp` = pairs at hamming <= 3. */
  private val simhashCtes: String =
    s"""st AS (SELECT doc_id, $toksSql AS toks FROM documents),
        stf AS (SELECT doc_id, tok, count(*) AS tf
                FROM (SELECT doc_id, unnest(toks) AS tok FROM st)
                GROUP BY 1, 2),
        shh AS (SELECT doc_id, tf,
                  ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h
                FROM stf),
        sbits AS (SELECT doc_id, b,
                    sum(tf * (CASE WHEN (h >> b) & 1 = 1
                              THEN 1 ELSE -1 END)) AS acc
                  FROM shh CROSS JOIN (SELECT unnest(range(60)) AS b)
                  GROUP BY 1, 2),
        ssig0 AS (SELECT doc_id,
                    sum(CASE WHEN acc > 0 THEN (1::BIGINT << b)
                        ELSE 0 END) AS sig
                  FROM sbits GROUP BY 1),
        ssig AS (SELECT st.doc_id, coalesce(ssig0.sig, 0) AS sig
                 FROM st LEFT JOIN ssig0 USING (doc_id)),
        sp0 AS (SELECT x.doc_id AS a, y.doc_id AS b,
                  CAST(bit_count(xor(x.sig, y.sig)) AS INT) AS hamming
                FROM ssig x JOIN ssig y ON x.doc_id < y.doc_id),
        sp AS (SELECT a, b, hamming FROM sp0 WHERE hamming <= 3)"""

  /** The full langid prediction chain (tokens → per-language stopword
    * scores → argmax with ties lang asc → 'und' on zero hits), ending
    * in pred(doc_id, pred_lang) — ONE fragment for every gate that
    * needs predictions (p08 counts, p31 entropy, p38 confusion); a
    * one-sided edit cannot de-sync them. */
  private lazy val langPredCtes: String =
    s"""t AS (SELECT doc_id, $toksSql AS toks FROM documents),
        scores AS ($langScoresSql),
        best AS (SELECT doc_id, lang, hits,
                   row_number() OVER (PARTITION BY doc_id
                     ORDER BY hits DESC, lang ASC) AS rn
                 FROM scores),
        pred AS (SELECT doc_id,
                   CASE WHEN hits = 0 THEN 'und' ELSE lang END
                     AS pred_lang
                 FROM best WHERE rn = 1)"""

  /** Per-language stopword-hit scoring branches for the langid oracle. */
  private val langScoresSql: String =
    TextAnalysis.LangProfiles.map { case (lang, words) =>
      val lst = words.map(w => s"'$w'").mkString(", ")
      s"""SELECT doc_id,
          '$lang' AS lang,
          len(list_filter(toks, x -> list_contains([$lst], x))) AS hits
          FROM t"""
    }.mkString(" UNION ALL ")

  /** p07/p26 shared oracle fragment: the Gopher-style quality score
    * (stats + stopword ratio + 4-term mix, round 6) ending in
    * q(doc_id, quality) — single point of truth for every gate that
    * scores documents. */
  private def qualityCtes: String =
    s"""qst AS (SELECT doc_id,
            length(text) AS nc,
            length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
              AS alnum,
            length(regexp_replace(text, '[^ \\t\\n\\r]', '', 'g')) AS spaces,
            len(list_filter(regexp_split_to_array(text, '\\s+'),
              x -> x != '')) AS nws,
            $toksSql AS toks
          FROM documents),
          qr AS (SELECT doc_id,
            CASE WHEN len(toks) > 0
              THEN CAST(len(list_filter(toks, x -> list_contains(
                [${TextAnalysis.EnStopwords.map(w => s"'$w'").mkString(", ")}],
                x))) AS DOUBLE) / len(toks)
              ELSE 0.0 END AS sr,
            CAST(alnum AS DOUBLE) / nc AS ar,
            CAST(nc - alnum - spaces AS DOUBLE) / nc AS pr,
            nws
          FROM qst),
          q AS (SELECT doc_id,
            round((least(CAST(nws AS DOUBLE) / 50.0, 1.0) +
                   least(sr * 5.0, 1.0) + ar +
                   (1.0 - least(pr * 5.0, 1.0))) / 4.0, 6) AS quality
          FROM qr)"""

  /** The shared BPE base: word-frequency table with the sentinel-space
    * symbol string, CARRYING the raw word so downstream consumers
    * (p29's word→subword map) can join back. */
  private def bpeW0Sql: String =
    s"""w0 AS MATERIALIZED (
          SELECT w, ' ' || array_to_string(string_split(w, ''), ' ')
                   || ' ' AS s, f
          FROM (SELECT w, count(*) AS f
                FROM (SELECT unnest($toksSql) AS w FROM documents)
                GROUP BY 1))"""

  /** One unrolled BPE round for the p27 oracle: pair counts over the
    * previous word table, deterministic argmax, sentinel-space fusion
    * — the same single-pass `replace` semantics the trainer uses. */
  private def bpeRoundSql(i: Int): String =
    // MATERIALIZED is load-bearing: w$i/b$i are each referenced
    // several times by round i+1, so inlined CTEs would expand the
    // 8-round chain exponentially (≈4^8 scans of the base table)
    s"""p$i AS MATERIALIZED (
          SELECT sym[j + 1] AS lhs, sym[j + 2] AS rhs,
                 CAST(sum(f) AS BIGINT) AS cnt
          FROM (SELECT f, sym, unnest(range(len(sym) - 1)) AS j
                FROM (SELECT f, string_split(trim(s), ' ') AS sym
                      FROM w${i - 1}))
          GROUP BY 1, 2),
        b$i AS MATERIALIZED (SELECT lhs, rhs, cnt FROM p$i
                ORDER BY cnt DESC, lhs ASC, rhs ASC LIMIT 1),
        m$i AS (SELECT $i AS rank, lhs, rhs, cnt FROM b$i),
        w$i AS MATERIALIZED (SELECT w, replace(s,
                  ' ' || (SELECT lhs FROM b$i) || ' ' ||
                    (SELECT rhs FROM b$i) || ' ',
                  ' ' || (SELECT lhs FROM b$i) ||
                    (SELECT rhs FROM b$i) || ' ') AS s, f
                FROM w${i - 1})"""

  /** One merge round applied to the QUERY words — the learned pair
    * from b$i fused with the same sentinel-space replace; query
    * segmentation must not route through the corpus word map (the
    * tokenizer segments OOV query words too, so the oracle must). */
  private def bpeQueryRoundSql(i: Int): String =
    s"""qw$i AS (SELECT replace(s,
          ' ' || (SELECT lhs FROM b$i) || ' ' ||
            (SELECT rhs FROM b$i) || ' ',
          ' ' || (SELECT lhs FROM b$i) ||
            (SELECT rhs FROM b$i) || ' ') AS s
        FROM qw${i - 1})"""

  /** p29's BM25-over-trained-subwords replay — shared verbatim by p30
    * (the persisted-model roundtrip). */
  private def P29OracleSql: String =
    {
      s"""WITH $bpeW0Sql,
          ${(1 to BpeMerges).map(bpeRoundSql).mkString(",\n          ")},
          map AS (SELECT w, string_split(trim(s), ' ') AS pieces
                  FROM w$BpeMerges),
          qw0 AS (SELECT ' ' || array_to_string(string_split(qw, ''), ' ')
                    || ' ' AS s
                  FROM (SELECT unnest(['spark', 'filter', 'join'])
                          AS qw)),
          ${(1 to BpeMerges).map(bpeQueryRoundSql)
            .mkString(",\n          ")},
          toks AS (SELECT dw.id, unnest(map.pieces) AS term
                   FROM (SELECT doc_id AS id, unnest($toksSql) AS w
                         FROM documents) dw
                   JOIN map USING (w)),
          tf AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
          dl AS (SELECT id, count(*) AS dl FROM toks GROUP BY 1),
          stats AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
          g AS (SELECT count(*) AS n,
                       CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
                FROM dl),
          qterms AS (SELECT DISTINCT term FROM
                       (SELECT unnest(string_split(trim(s), ' '))
                          AS term
                        FROM qw$BpeMerges)),
          scored AS (
            SELECT tf.id,
                   ln((g.n - s.df + 0.5) / (s.df + 0.5) + 1.0) *
                     (tf.tf * (1.2 + 1)) /
                     (tf.tf + 1.2 * ((1 - 0.75) + 0.75 * dl.dl / g.avgdl))
                     AS wt
            FROM tf
            JOIN qterms USING (term)
            JOIN stats s USING (term)
            JOIN dl USING (id)
            CROSS JOIN g)
          SELECT id, round(sum(wt), 6) AS score FROM scored GROUP BY id
          ORDER BY score DESC, id ASC LIMIT 10"""
    }

  val oracles: Map[String, String] = Map(
    // p27: base word-frequency table, then BpeMerges unrolled rounds;
    // the merge list is the whole training trajectory.
    "p27_bpe_train" -> {
      s"""WITH $bpeW0Sql,
          ${(1 to BpeMerges).map(bpeRoundSql).mkString(",\n          ")}
          ${(1 to BpeMerges).map(i => s"SELECT * FROM m$i")
            .mkString("\n          UNION ALL\n          ")}
          ORDER BY rank"""
    },
    // p28: encode = the final merge-round word table exploded back to
    // subword tokens, frequency-weighted — train and apply share one
    // replay.
    "p28_bpe_encode" -> {
      s"""WITH $bpeW0Sql,
          ${(1 to BpeMerges).map(bpeRoundSql).mkString(",\n          ")},
          tok AS (SELECT unnest(string_split(trim(s), ' ')) AS token, f
                  FROM w$BpeMerges)
          SELECT token, CAST(sum(f) AS BIGINT) AS cnt
          FROM tok GROUP BY 1
          ORDER BY cnt DESC, token ASC LIMIT 20"""
    },
    // p29: the r24 WordPiece-BM25 pattern with the LEARNED
    // segmentation — tokenization replays as a word→subword join
    // against the final merge-round table; same Okapi constants as
    // every BM25 oracle; query pieces deduped like Bm25.search.
    "p29_bm25_bpe" -> P29OracleSql,
    // p30: persisted-and-reloaded model must retrieve identically —
    // p29's oracle verbatim (lossless-artifact pattern: the r23/r30
    // stored-layout rule applied to the tokenizer).
    "p30_bpe_model_roundtrip" -> P29OracleSql,
    // p37: counts per lang, sqrt tempered (round 9 before the sum —
    // the dsir addend rule), normalized round 9, capped rate round 6,
    // then the exact unit-hash acceptance per row.
    "p37_temperature_mix" ->
      """WITH cnt AS (SELECT lang AS domain, count(*) AS n
                      FROM documents GROUP BY 1),
          w AS (SELECT domain, n, round(pow(n, 0.5), 9) AS w_raw
                FROM cnt),
          t AS (SELECT round(sum(w_raw), 9) AS t FROM w),
          r AS (SELECT domain, n,
                  round(least(1.0,
                    200 * round(w_raw / t.t, 9) / n), 6) AS rate
                FROM w CROSS JOIN t)
          SELECT d.doc_id, d.lang, r.rate
          FROM documents d JOIN r ON r.domain = d.lang
          WHERE (CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)),
                   1, 8) AS BIGINT)::DOUBLE / 4294967296.0) < r.rate
          ORDER BY d.doc_id ASC""",
    // p36: the five selection rounds unrolled — seed = min vec_id,
    // then four (max of running min-distance, ties id asc) argmaxes,
    // every pairwise L2 rounded to 6 BEFORE min/argmax; assignment =
    // per-point nearest of the five (ties by selection round asc).
    // MATERIALIZED: each d-frame is referenced twice (next c and next
    // d) — inlined the chain expands 2^k scans (the p27 lesson).
    "p36_kcenter_coreset" -> {
      def selRound(i: Int) =
        s"""c$i AS MATERIALIZED (
              SELECT vec_id, v FROM d${i - 1}
              ORDER BY m DESC, vec_id ASC LIMIT 1),
            d$i AS MATERIALIZED (
              SELECT d.vec_id, d.v,
                     least(d.m, round(list_distance(d.v, c.v), 6)) AS m
              FROM d${i - 1} d CROSS JOIN c$i c)"""
      s"""WITH c1 AS MATERIALIZED (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            ORDER BY vec_id ASC LIMIT 1),
          d1 AS MATERIALIZED (
            SELECT e.vec_id, e.embedding::DOUBLE[] AS v,
                   round(list_distance(e.embedding::DOUBLE[], c.v), 6)
                     AS m
            FROM embeddings e CROSS JOIN c1 c),
          ${selRound(2)},
          ${selRound(3)},
          ${selRound(4)},
          c5 AS MATERIALIZED (
            SELECT vec_id, v FROM d4
            ORDER BY m DESC, vec_id ASC LIMIT 1),
          cent AS (
            SELECT 1 AS r, vec_id, v FROM c1
            UNION ALL SELECT 2, vec_id, v FROM c2
            UNION ALL SELECT 3, vec_id, v FROM c3
            UNION ALL SELECT 4, vec_id, v FROM c4
            UNION ALL SELECT 5, vec_id, v FROM c5),
          ad AS (
            SELECT e.vec_id, c.r, c.vec_id AS cid,
                   round(list_distance(e.embedding::DOUBLE[], c.v), 6)
                     AS dist
            FROM embeddings e CROSS JOIN cent c)
          SELECT vec_id, cid AS center_id,
                 CAST(r AS INTEGER) AS center_round, dist
          FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                  ORDER BY dist ASC, r ASC) AS rk FROM ad)
          WHERE rk = 1 ORDER BY vec_id ASC"""
    },
    // p34: bigrams as the token list zipped with its own tail, PMI
    // over the bigram table's margins, ln rounded to 6 BEFORE the
    // top-50 selection, ties (w1, w2) asc.
    "p34_pmi_collocations" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
          bg AS (SELECT unnest(list_transform(range(len(toks) - 1),
                   i -> [toks[i+1], toks[i+2]])) AS p
                 FROM tk),
          pc AS (SELECT p[1] AS w1, p[2] AS w2, count(*) AS n_pair
                 FROM bg GROUP BY 1, 2),
          nn AS (SELECT sum(n_pair) AS n FROM pc),
          lm AS (SELECT w1, sum(n_pair) AS cl FROM pc GROUP BY 1),
          rm AS (SELECT w2, sum(n_pair) AS cr FROM pc GROUP BY 1)
          SELECT c.w1, c.w2, c.n_pair,
                 round(ln(CAST(c.n_pair AS DOUBLE) * nn.n
                   / (CAST(l.cl AS DOUBLE) * r.cr)), 6) AS pmi
          FROM pc c JOIN lm l USING (w1) JOIN rm r USING (w2)
          CROSS JOIN nn
          WHERE c.n_pair >= 5
          ORDER BY pmi DESC, w1 ASC, w2 ASC LIMIT 50""",
    // p35: tf over exploded tokens, df reusing the (doc, term) frame,
    // smoothed idf rounded to 9 before the multiply, score rounded to
    // 6 before the per-doc rank, top 3 per doc with ties term asc.
    "p35_tfidf_keywords" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
          tok AS (SELECT doc_id, unnest(toks) AS term FROM tk),
          tf AS (SELECT doc_id, term, count(*) AS tf
                 FROM tok GROUP BY 1, 2),
          df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
          nn AS (SELECT count(*) AS n FROM documents),
          sc AS (SELECT t.doc_id, t.term, t.tf,
                   round(t.tf * round(ln((nn.n + 1.0) / (d.df + 1.0)),
                     9), 6) AS score
                 FROM tf t JOIN df d USING (term) CROSS JOIN nn),
          rk AS (SELECT doc_id, term, tf, score,
                   row_number() OVER (PARTITION BY doc_id
                     ORDER BY score DESC, term ASC) AS rk
                 FROM sc)
          SELECT doc_id, term, tf, score, CAST(rk AS INTEGER) AS rk
          FROM rk WHERE rk <= 3 ORDER BY doc_id ASC, rk ASC""",
    // g08: the 3 synchronous peel rounds unrolled over the same jp
    // pair set — per round, degree over surviving edges (nodes already
    // stripped of every edge face the check as degree 0: the cascade),
    // peel < 2, keep >= 2, edges restricted to survivors; survivors of
    // round 3 report peel_round 0 with their round-3 degree.
    "g08_kcore" -> {
      def peelRound(i: Int) =
        s"""d$i AS (SELECT n.id,
                coalesce(dd.c, CAST(0 AS BIGINT)) AS deg
              FROM n${i - 1} n LEFT JOIN (
                SELECT id, count(*) AS c FROM (
                  SELECT a AS id FROM e${i - 1}
                  UNION ALL SELECT b FROM e${i - 1}) GROUP BY 1) dd
                USING (id)),
            p$i AS (SELECT id, $i AS peel_round, deg AS last_deg
                    FROM d$i WHERE deg < 2),
            n$i AS (SELECT id FROM d$i WHERE deg >= 2),
            e$i AS (SELECT e.a, e.b FROM e${i - 1} e
                    JOIN n$i x ON x.id = e.a
                    JOIN n$i y ON y.id = e.b)"""
      s"""WITH $jaccardCtes,
          e0 AS (SELECT a, b FROM jp),
          n0 AS (SELECT DISTINCT id FROM (
            SELECT a AS id FROM e0 UNION ALL SELECT b FROM e0)),
          ${peelRound(1)},
          ${peelRound(2)},
          ${peelRound(3)}
          SELECT id AS doc_id, CAST(peel_round AS INTEGER) AS peel_round,
                 last_deg
          FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2
                UNION ALL SELECT * FROM p3
                UNION ALL SELECT id, 0, deg FROM d3 WHERE deg >= 2)
          ORDER BY doc_id"""
    },
    // p33: p11's recursive components, then BOTH splits from first
    // principles — the naive per-id 16-bit-md5 bucket and the
    // cluster-aware one hashing the component representative — for
    // every non-representative member.
    "p33_leakage_splits" ->
      s"""WITH RECURSIVE $jaccardCtes,
          edges AS (SELECT CAST(a AS BIGINT) AS u, CAST(b AS BIGINT) AS v
                    FROM jp
                    UNION
                    SELECT CAST(b AS BIGINT), CAST(a AS BIGINT) FROM jp),
          nodes AS (SELECT DISTINCT u AS id FROM edges),
          reach AS (SELECT id, id AS x FROM nodes
                    UNION
                    SELECT r.id, e.v FROM reach r JOIN edges e ON e.u = r.x),
          comp AS (SELECT id, min(x) AS component FROM reach GROUP BY 1),
          sp AS (
            SELECT d.doc_id, c.component,
                   ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)),
                      1, 4))::INTEGER % 100 AS nb,
                   ('0x' || substring(md5(CAST(c.component AS VARCHAR)),
                      1, 4))::INTEGER % 100 AS sb
            FROM documents d JOIN comp c ON c.id = d.doc_id
            WHERE c.component != d.doc_id)
          SELECT doc_id, component,
                 CASE WHEN nb < 80 THEN 'train'
                      WHEN nb < 90 THEN 'val' ELSE 'test' END
                   AS split_naive,
                 CASE WHEN sb < 80 THEN 'train'
                      WHEN sb < 90 THEN 'val' ELSE 'test' END
                   AS split_safe
          FROM sp ORDER BY doc_id""",
    // p32: the whole DSIR chain from first principles — unigram+bigram
    // features, 60-bit-md5 buckets mod 256, add-one-smoothed target/raw
    // bucket distributions, per-bucket log-ratio rounded to 9 (so both
    // engines sum identical addends), per-doc weight rounded to 6, and
    // the Gumbel key on the exact md5 noise grid.
    "p32_dsir_sample" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
          feats AS (
            SELECT doc_id, unnest(toks) AS feat FROM t
            UNION ALL
            SELECT doc_id, toks[i + 1] || ' ' || toks[i + 2] AS feat
            FROM (SELECT doc_id, toks,
                         unnest(range(len(toks) - 1)) AS i
                  FROM t WHERE len(toks) >= 2)),
          fb AS (
            SELECT doc_id,
                   ('0x' || substring(md5(feat), 1, 15))::BIGINT % 256
                     AS bucket
            FROM feats),
          tgt AS (
            SELECT bucket, count(*) AS tn
            FROM fb JOIN documents USING (doc_id)
            WHERE lang = 'en' GROUP BY 1),
          rawc AS (SELECT bucket, count(*) AS rn FROM fb GROUP BY 1),
          tt AS (SELECT sum(tn) AS ttot FROM tgt),
          rt AS (SELECT sum(rn) AS rtot FROM rawc),
          ratio AS (
            SELECT bucket,
                   round((ln(coalesce(tn, 0) + 1.0) - ln(ttot + 256.0))
                       - (ln(rn + 1.0) - ln(rtot + 256.0)), 9) AS lr
            FROM rawc LEFT JOIN tgt USING (bucket), tt, rt),
          dn AS (SELECT doc_id, bucket, count(*) AS n
                 FROM fb GROUP BY 1, 2),
          w AS (
            SELECT doc_id, round(sum(n * lr), 6) AS logw
            FROM dn JOIN ratio USING (bucket) GROUP BY 1)
          SELECT doc_id, logw,
                 round(logw - ln(-ln(
                   (('0x' || substring(md5('dsir7:' ||
                       CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 0.5)
                     / 4294967296.0)), 6) AS gkey
          FROM w
          ORDER BY gkey DESC, doc_id ASC LIMIT 30""",
    // p25: the kept set from first principles — 32-bit md5 unit value
    // vs the length-derived probability, both exact doubles.
    "p25_quality_sample" ->
      """SELECT doc_id, n_chars FROM documents
         WHERE (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                  AS BIGINT)::DOUBLE / 4294967296.0)
               < least(1.0, n_chars / 2000.0)
         ORDER BY doc_id ASC""",
    // p24: the epoch permutation from first principles — the portable
    // 60-bit md5 order key and ONE global row_number; the operator's
    // distributed shard/offset assembly must reproduce it exactly.
    "p24_epoch_shuffle" ->
      """WITH k AS (
            SELECT doc_id,
                   CAST('0x' || substring(
                     md5('epoch7:' || CAST(doc_id AS VARCHAR)), 1, 15)
                     AS BIGINT) AS okey
            FROM documents)
          SELECT doc_id, okey,
                 CAST(row_number() OVER (ORDER BY okey ASC, doc_id ASC)
                   - 1 AS BIGINT) AS pos
          FROM k
          ORDER BY pos ASC LIMIT 40""",
    // p23: the bigram LM from first principles — corpus bigram counts
    // (1-based list indexing over 0-based range), conditional MLE
    // -ln(c2/c1) per doc bigram, per-doc mean rounded to 6, worst 20.
    "p23_lm_quality" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
          bg AS (
            SELECT doc_id, toks[i + 1] AS w1, toks[i + 2] AS w2
            FROM (SELECT doc_id, toks,
                         unnest(range(len(toks) - 1)) AS i
                  FROM t WHERE len(toks) >= 2)),
          c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
          c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
          ds AS (
            SELECT b.doc_id,
                   round(avg(ln(c1.c1) - ln(c2.c2)), 6) AS lm_loss
            FROM bg b
            JOIN c2 USING (w1, w2)
            JOIN c1 USING (w1)
            GROUP BY 1)
          SELECT doc_id, lm_loss FROM ds
          ORDER BY lm_loss DESC, doc_id ASC LIMIT 20""",
    // p22: the full KMeans trainer replayed first-principles (the r42
    // recipe on FULL vectors): portable-md5 hash per canonical vector
    // (×1e6, HALF_UP BIGINT, comma-joined, first 15 hex chars), one
    // deterministic min-by-list representative per hash, seeds = the 4
    // smallest hashes in rank order (cid 0..3), two Lloyd iterations
    // (argmin with (dist, cid) ties; per-pos mean rounded to 5), final
    // assignment under the trained centroids, then the mixing table:
    // doc counts + round(avg(n_chars), 4) per (domain, lang).
    "p22_domain_clusters" ->
      """WITH ev AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          epos AS (
            SELECT vec_id, unnest(v) AS x,
                   unnest(range(len(v))) AS pos
            FROM ev),
          hashed AS (
            SELECT h, min(v) AS v FROM (
              SELECT v,
                     ('0x' || substring(md5(array_to_string(
                        list_transform(v,
                          x -> CAST(round(x * 1000000) AS BIGINT)),
                        ',')), 1, 15))::BIGINT AS h
              FROM ev)
            GROUP BY 1),
          cent0 AS (
            SELECT cid, list_transform(v, x -> round(x, 5)) AS cent
            FROM (SELECT v, row_number() OVER (ORDER BY h ASC) - 1 AS cid
                  FROM hashed) WHERE cid < 4),
          asg1 AS (
            SELECT vec_id, cid FROM (
              SELECT e.vec_id, c.cid,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY list_distance(e.v, c.cent) ASC,
                                c.cid ASC) AS rn
              FROM ev e CROSS JOIN cent0 c) WHERE rn = 1),
          cent1 AS (
            SELECT cid, list(c ORDER BY pos) AS cent FROM (
              SELECT a.cid, e.pos, round(avg(e.x), 5) AS c
              FROM epos e JOIN asg1 a USING (vec_id)
              GROUP BY 1, 2)
            GROUP BY 1),
          asg2 AS (
            SELECT vec_id, cid FROM (
              SELECT e.vec_id, c.cid,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY list_distance(e.v, c.cent) ASC,
                                c.cid ASC) AS rn
              FROM ev e CROSS JOIN cent1 c) WHERE rn = 1),
          cent2 AS (
            SELECT cid, list(c ORDER BY pos) AS cent FROM (
              SELECT a.cid, e.pos, round(avg(e.x), 5) AS c
              FROM epos e JOIN asg2 a USING (vec_id)
              GROUP BY 1, 2)
            GROUP BY 1),
          asg3 AS (
            SELECT vec_id, cid FROM (
              SELECT e.vec_id, c.cid,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY list_distance(e.v, c.cent) ASC,
                                c.cid ASC) AS rn
              FROM ev e CROSS JOIN cent2 c) WHERE rn = 1)
          SELECT a.cid AS domain, d.lang, count(*) AS n,
                 round(avg(d.n_chars), 4) AS avg_weight
          FROM asg3 a JOIN documents d ON d.doc_id = a.vec_id
          GROUP BY 1, 2""",
    "p21_length_outliers" ->
      // quantile_cont == Spark's exact interpolated percentile; kept =
      // rows at or under the rounded p99 bound, per stratum. Joins are
      // null-safe (IS NOT DISTINCT FROM) to mirror lengthQuantiles'
      // <=> joins — a null-lang stratum is a real group, not a drop
      """WITH q AS (
            SELECT lang,
                   round(quantile_cont(n_chars, 0.5), 6) AS p50,
                   round(quantile_cont(n_chars, 0.9), 6) AS p90,
                   round(quantile_cont(n_chars, 0.99), 6) AS p99,
                   count(*) AS n_total
            FROM documents GROUP BY 1),
          k AS (
            SELECT q.lang AS lang, count(*) AS n_kept
            FROM documents d
            JOIN q ON d.lang IS NOT DISTINCT FROM q.lang
            WHERE d.n_chars <= q.p99 GROUP BY 1)
          SELECT q.lang, p50, p90, p99, n_total, n_kept
          FROM q JOIN k ON q.lang IS NOT DISTINCT FROM k.lang""",
    "p19_repetition" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
          tg AS (SELECT doc_id,
                   CASE WHEN len(toks) >= 3
                     THEN list_transform(range(len(toks) - 2),
                       i -> toks[i+1] || ' ' || toks[i+2] || ' ' ||
                            toks[i+3])
                     ELSE []::VARCHAR[] END AS g
                 FROM t),
          dup AS (SELECT doc_id,
                    CASE WHEN len(g) > 0
                      THEN round(CAST(len(g) - len(list_distinct(g))
                        AS DOUBLE) / len(g), 6)
                      ELSE 0.0 END AS dup_trigram_frac
                  FROM tg),
          bg0 AS (SELECT doc_id,
                    unnest(CASE WHEN len(toks) >= 2
                      THEN list_transform(range(len(toks) - 1),
                        i -> toks[i+1] || ' ' || toks[i+2])
                      ELSE []::VARCHAR[] END) AS bg
                  FROM t),
          bgc AS (SELECT doc_id, bg, count(*) AS n FROM bg0
                  GROUP BY 1, 2),
          top AS (SELECT doc_id,
                    round(CAST(max(n) AS DOUBLE) / sum(n), 6)
                      AS top_bigram_frac
                  FROM bgc GROUP BY 1)
          SELECT t.doc_id, dup.dup_trigram_frac,
            coalesce(top.top_bigram_frac, 0.0) AS top_bigram_frac
          FROM t JOIN dup USING (doc_id)
          LEFT JOIN top USING (doc_id)
          ORDER BY t.doc_id""",
    "p18_curation_e2e" ->
      s"""WITH st AS (SELECT doc_id,
            length(text) AS nc,
            length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
              AS alnum,
            length(regexp_replace(text, '[^ \\t\\n\\r]', '', 'g')) AS spaces,
            len(list_filter(regexp_split_to_array(text, '\\s+'),
              x -> x != '')) AS nws,
            $toksSql AS toks
          FROM documents),
          qr AS (SELECT doc_id,
            CASE WHEN len(toks) > 0
              THEN CAST(len(list_filter(toks, x -> list_contains(
                [${TextAnalysis.EnStopwords.map(w => s"'$w'").mkString(", ")}],
                x))) AS DOUBLE) / len(toks)
              ELSE 0.0 END AS sr,
            CAST(alnum AS DOUBLE) / nc AS ar,
            CAST(nc - alnum - spaces AS DOUBLE) / nc AS pr,
            nws
          FROM st),
          qual AS (SELECT doc_id,
            round((least(CAST(nws AS DOUBLE) / 50.0, 1.0) +
                   least(sr * 5.0, 1.0) + ar +
                   (1.0 - least(pr * 5.0, 1.0))) / 4.0, 6) AS quality
          FROM qr),
          base AS (SELECT d.doc_id, d.lang, d.text, d.n_chars
                   FROM documents d JOIN qual q USING (doc_id)
                   WHERE q.quality >= 0.6),
          dd AS (SELECT * FROM base
                 QUALIFY row_number() OVER (PARTITION BY text
                   ORDER BY doc_id) = 1),
          tb AS (SELECT doc_id, $toksSql AS toks FROM documents
                 WHERE doc_id % 10 = 0),
          bs AS (SELECT doc_id AS b_id,
                   unnest(list_distinct(list_transform(
                     range(len(toks) - 2),
                     i -> toks[i+1] || ' ' || toks[i+2] || ' ' ||
                          toks[i+3]))) AS sh
                 FROM tb),
          bsz AS (SELECT b_id, count(*) AS b_sz FROM bs GROUP BY 1),
          tt AS (SELECT doc_id, $toksSql AS toks FROM dd
                 WHERE doc_id % 10 <> 0),
          ts AS (SELECT doc_id AS t_id,
                   unnest(list_distinct(list_transform(
                     range(len(toks) - 2),
                     i -> toks[i+1] || ' ' || toks[i+2] || ' ' ||
                          toks[i+3]))) AS sh
                 FROM tt),
          inter AS (SELECT b_id, t_id, count(*) AS c
                    FROM bs JOIN ts USING (sh) GROUP BY 1, 2),
          cont AS (SELECT DISTINCT t_id
                   FROM inter JOIN bsz USING (b_id)
                   WHERE round(CAST(c AS DOUBLE) / b_sz, 6) >= 0.3),
          clean AS (SELECT * FROM dd
                    WHERE doc_id % 10 <> 0
                      AND doc_id NOT IN (SELECT t_id FROM cont)),
          mixed AS (SELECT * FROM clean
                    WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                        1, 4))::INTEGER % 100 <
                      CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 75
                                WHEN 'fr' THEN 75 ELSE 100 END),
          sp AS (SELECT *,
                   CASE WHEN bucket < 80 THEN 'train'
                        WHEN bucket < 90 THEN 'val'
                        ELSE 'test' END AS split
                 FROM (SELECT *,
                         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                           1, 4))::INTEGER % 100 AS bucket
                       FROM mixed)),
          tok AS (SELECT split, doc_id, n_chars,
                    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                      1, 4))::INTEGER % 4 AS shard,
                    len(list_filter(regexp_split_to_array(text, ' '),
                      x -> x != '')) AS n_tok
                  FROM sp),
          c AS (SELECT split, shard, doc_id, n_chars, n_tok,
                  coalesce(sum(n_tok) OVER (PARTITION BY split, shard
                    ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS cum_before
                FROM tok)
          SELECT split, count(*) AS n_docs,
            CAST(sum(n_chars) AS BIGINT) AS sum_chars,
            CAST(count(DISTINCT shard || '-' ||
              CAST(cum_before // 512 AS BIGINT)) AS BIGINT) AS n_packs
          FROM c GROUP BY 1 ORDER BY 1""",
    "p04_simhash_pairs" ->
      s"WITH $simhashCtes SELECT a, b, hamming FROM sp",
    // p39: the two channels' factored recipes joined pair-keyed —
    // consensus = both channels agree
    "p39_consensus_pairs" ->
      s"""WITH $jaccardCtes,
          $simhashCtes
          SELECT jp.a, jp.b, jp.jaccard, sp.hamming
          FROM jp JOIN sp ON jp.a = sp.a AND jp.b = sp.b""",
    "p10_fingerprint_overlap" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
          s AS (SELECT doc_id,
                  unnest(list_distinct(list_transform(range(len(toks) - 3),
                    i -> toks[i+1] || ' ' || toks[i+2] || ' ' ||
                         toks[i+3] || ' ' || toks[i+4]))) AS sh
                FROM t),
          h0 AS (SELECT doc_id,
                   ('0x' || substring(md5(sh), 1, 15))::BIGINT AS h
                 FROM s),
          fp AS (SELECT doc_id, h FROM (
                   SELECT doc_id, h,
                     row_number() OVER (PARTITION BY doc_id ORDER BY h)
                       AS rn
                   FROM h0) WHERE rn <= 16),
          hot AS (SELECT h FROM fp GROUP BY 1 HAVING count(*) > 64),
          f AS (SELECT fp.doc_id, fp.h
                FROM fp LEFT JOIN hot ON fp.h = hot.h
                WHERE hot.h IS NULL),
          p AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n_shared
                FROM f x JOIN f y ON x.h = y.h AND x.doc_id < y.doc_id
                GROUP BY 1, 2)
          SELECT a, b, n_shared FROM p
          ORDER BY n_shared DESC, a ASC, b ASC LIMIT 10""",
    "p17_pii_scrub" ->
      s"""WITH t AS (SELECT doc_id,
            text || ' contact user' || doc_id || '@example.com from 10.0.'
              || (doc_id % 256) || '.7 call 555-0199' AS aug
          FROM documents)
          SELECT doc_id,
            CAST(len(regexp_extract_all(aug,
              '${TextAnalysis.EmailRe}')) AS INT) AS n_emails,
            CAST(len(regexp_extract_all(aug,
              '${TextAnalysis.Ipv4Re}')) AS INT) AS n_ips,
            CAST(len(regexp_extract_all(aug,
              '${TextAnalysis.PhoneRe}')) AS INT) AS n_phones,
            regexp_replace(regexp_replace(regexp_replace(aug,
              '${TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
              '${TextAnalysis.Ipv4Re}', '<IP>', 'g'),
              '${TextAnalysis.PhoneRe}', '<PHONE>', 'g') AS clean
          FROM t ORDER BY doc_id""",
    "p16_pack_sequences" ->
      """WITH t AS (SELECT doc_id,
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER
               % 8 AS shard,
             len(list_filter(regexp_split_to_array(text, ' '),
               x -> x != '')) AS n_tok
           FROM documents),
          c AS (SELECT shard, doc_id, n_tok,
             coalesce(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
           FROM t)
          SELECT shard, CAST(cum_before // 512 AS BIGINT) AS pack_id,
            count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS sum_tokens
          FROM c GROUP BY 1, 2 ORDER BY 1, 2""",
    "p15_stratified_mix" ->
      """WITH b AS (SELECT lang, n_chars,
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER
               % 100 AS bucket
           FROM documents),
          kept AS (SELECT lang, n_chars FROM b
            WHERE bucket < CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 75
                                     WHEN 'fr' THEN 75 ELSE 100 END)
          SELECT lang, count(*) AS n_docs,
            CAST(sum(n_chars) AS BIGINT) AS sum_chars
          FROM kept GROUP BY 1 ORDER BY 1""",
    "p14_dup_ngram_strip" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
          g0 AS (SELECT doc_id, toks, unnest(range(len(toks) - 2)) AS pos
                 FROM t WHERE len(toks) >= 3),
          g AS (SELECT doc_id, pos,
                  toks[pos+1] || ' ' || toks[pos+2] || ' ' || toks[pos+3]
                    AS gram
                FROM g0),
          r AS (SELECT doc_id, pos FROM (
                  SELECT doc_id, pos,
                    row_number() OVER (PARTITION BY gram
                      ORDER BY doc_id, pos) AS rn,
                    count(*) OVER (PARTITION BY gram) AS occ
                  FROM g) WHERE occ >= 2 AND rn > 1),
          rp0 AS (SELECT doc_id, pos, unnest(range(3)) AS d FROM r),
          rp AS (SELECT DISTINCT doc_id, pos + d AS p FROM rp0),
          tok AS (SELECT doc_id, unnest(range(len(toks))) AS p,
                    unnest(toks) AS tok FROM t),
          kept AS (SELECT tok.doc_id, tok.p, tok.tok
                   FROM tok LEFT JOIN rp
                   ON tok.doc_id = rp.doc_id AND tok.p = rp.p
                   WHERE rp.p IS NULL),
          k AS (SELECT doc_id, count(*) AS n_kept,
                  string_agg(tok, ' ' ORDER BY p) AS clean_text
                FROM kept GROUP BY 1)
          SELECT t.doc_id, len(t.toks) AS n_tokens,
            len(t.toks) - coalesce(k.n_kept, 0) AS n_removed,
            coalesce(k.clean_text, '') AS clean_text
          FROM t LEFT JOIN k USING (doc_id)
          ORDER BY t.doc_id""",
    "p12_decontaminate" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
          s AS (SELECT doc_id,
                  unnest(list_distinct(list_transform(range(len(toks) - 2),
                    i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])))
                  AS sh
                FROM t),
          bs AS (SELECT doc_id AS b_id, sh FROM s WHERE doc_id % 10 = 0),
          bsz AS (SELECT b_id, count(*) AS b_sz FROM bs GROUP BY 1),
          ts AS (SELECT doc_id AS t_id, sh FROM s WHERE doc_id % 10 <> 0),
          inter AS (SELECT b_id, t_id, count(*) AS c
                    FROM bs JOIN ts USING (sh) GROUP BY 1, 2),
          cont AS (SELECT b_id, t_id,
                     round(CAST(c AS DOUBLE) / b_sz, 6) AS containment
                   FROM inter JOIN bsz USING (b_id))
          SELECT b_id, t_id, containment FROM cont
          WHERE containment >= 0.3
          ORDER BY containment DESC, b_id ASC, t_id ASC""",
    "p13_hash_splits" ->
      """WITH b AS (SELECT doc_id, n_chars,
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER
               % 100 AS bucket
           FROM documents),
          sp AS (SELECT n_chars,
                   CASE WHEN bucket < 80 THEN 'train'
                        WHEN bucket < 90 THEN 'val'
                        ELSE 'test' END AS split
                 FROM b)
          SELECT split, count(*) AS n_docs,
                 CAST(sum(n_chars) AS BIGINT) AS sum_chars
          FROM sp GROUP BY 1 ORDER BY 1""",
    "p01_dedup_exact" ->
      """WITH g AS (SELECT text, count(*) AS n FROM documents GROUP BY 1)
         SELECT CAST(sum(n) AS BIGINT) AS total_docs,
           count(*) AS distinct_texts,
           CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS dup_groups,
           CAST(sum(n - 1) AS BIGINT) AS dup_rows_removed
         FROM g""",
    "p02_jaccard_pairs" -> jaccardSql,
    "p03_minhash_pairs" -> jaccardSql,
    "p11_dup_clusters" ->
      s"""WITH RECURSIVE $jaccardCtes,
          edges AS (SELECT CAST(a AS BIGINT) AS u, CAST(b AS BIGINT) AS v
                    FROM jp
                    UNION
                    SELECT CAST(b AS BIGINT), CAST(a AS BIGINT) FROM jp),
          nodes AS (SELECT DISTINCT u AS id FROM edges),
          reach AS (SELECT id, id AS x FROM nodes
                    UNION
                    SELECT r.id, e.v FROM reach r JOIN edges e ON e.u = r.x)
          SELECT id, min(x) AS component FROM reach GROUP BY 1 ORDER BY 1""",
    // p26: p11's recursive components + p07's quality formula, then
    // the per-cluster argmax (quality desc, doc_id asc); singletons
    // are their own component and kept.
    "p26_canonical_dedup" ->
      s"""WITH RECURSIVE $jaccardCtes,
          edges AS (SELECT CAST(a AS BIGINT) AS u, CAST(b AS BIGINT) AS v
                    FROM jp
                    UNION
                    SELECT CAST(b AS BIGINT), CAST(a AS BIGINT) FROM jp),
          nodes AS (SELECT DISTINCT u AS id FROM edges),
          reach AS (SELECT id, id AS x FROM nodes
                    UNION
                    SELECT r.id, e.v FROM reach r JOIN edges e ON e.u = r.x),
          comp AS (SELECT id, min(x) AS component FROM reach GROUP BY 1),
          ${qualityCtes},
          dc AS (SELECT q.doc_id,
                   coalesce(c.component, q.doc_id) AS component, q.quality
                 FROM q LEFT JOIN comp c ON c.id = q.doc_id),
          k AS (SELECT doc_id, component, quality,
                  row_number() OVER (PARTITION BY component
                    ORDER BY quality DESC, doc_id ASC) AS rk
                FROM dc)
          SELECT doc_id, component, quality, CAST(rk = 1 AS INT) AS keep
          FROM k ORDER BY doc_id""",
    "p05_closest_pairs_cos" ->
      """WITH p AS (
           SELECT x.vec_id AS a, y.vec_id AS b,
             round(1 - list_inner_product(x.embedding::DOUBLE[], y.embedding::DOUBLE[]) /
               (sqrt(list_inner_product(x.embedding::DOUBLE[], x.embedding::DOUBLE[])) *
                sqrt(list_inner_product(y.embedding::DOUBLE[], y.embedding::DOUBLE[]))), 6)
             AS dist
           FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id)
         SELECT a, b, dist FROM p ORDER BY dist ASC, a ASC, b ASC LIMIT 10""",
    "p09_cosine_lsh_dedup" ->
      """WITH c AS (
           SELECT vec_id, embedding FROM embeddings
           UNION ALL
           SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings),
         p AS (
           SELECT x.vec_id AS a, y.vec_id AS b,
             list_inner_product(x.embedding::DOUBLE[], y.embedding::DOUBLE[]) /
               (sqrt(list_inner_product(x.embedding::DOUBLE[], x.embedding::DOUBLE[])) *
                sqrt(list_inner_product(y.embedding::DOUBLE[], y.embedding::DOUBLE[])))
               AS cos
           FROM c x JOIN c y ON x.vec_id < y.vec_id)
         SELECT a, b, round(cos, 6) AS cos FROM p
         WHERE cos >= 0.95 ORDER BY a, b""",
    "p20_semdedup" ->
      """WITH c AS (
           SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           UNION ALL
           SELECT vec_id + 100000, embedding::DOUBLE[] FROM embeddings),
         cent AS (SELECT CAST(vec_id AS BIGINT) AS cid,
                    embedding::DOUBLE[] AS cv
                  FROM embeddings WHERE vec_id < 8),
         ad AS (SELECT c.vec_id, c.v, cent.cid, cent.cv,
                  row_number() OVER (PARTITION BY c.vec_id
                    ORDER BY (1 - list_inner_product(c.v, cent.cv) /
                      (sqrt(list_inner_product(c.v, c.v)) *
                       sqrt(list_inner_product(cent.cv, cent.cv)))) ASC,
                      cent.cid ASC) AS rn
                FROM c CROSS JOIN cent),
         a AS (SELECT vec_id, v, cid AS cell,
                 round(list_inner_product(v, cv) /
                   (sqrt(list_inner_product(v, v)) *
                    sqrt(list_inner_product(cv, cv))), 6) AS cent_cos
               FROM ad WHERE rn = 1),
         r AS (SELECT vec_id, v, cell, cent_cos,
                 row_number() OVER (PARTITION BY cell
                   ORDER BY cent_cos ASC, vec_id ASC) AS rk
               FROM a),
         dom AS (SELECT DISTINCT x.vec_id
                 FROM r x JOIN r y ON x.cell = y.cell AND y.rk < x.rk
                   AND round(list_inner_product(x.v, y.v) /
                     (sqrt(list_inner_product(x.v, x.v)) *
                      sqrt(list_inner_product(y.v, y.v))), 6) >= 0.95)
         SELECT CAST(r.vec_id AS BIGINT) AS vec_id,
                r.cell AS centroid_id, r.cent_cos
         FROM r LEFT JOIN dom ON r.vec_id = dom.vec_id
         WHERE dom.vec_id IS NULL
         ORDER BY vec_id""",
    "p06_token_stats" ->
      s"""WITH t AS (SELECT lang, text,
            len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != ''))
              AS nws,
            len(regexp_extract_all(lower(text), '[a-z]{1,4}|[0-9]|[^a-z0-9\\s]'))
              AS nbpe
          FROM documents)
          SELECT lang, count(*) AS n_docs,
            CAST(sum(length(text)) AS BIGINT) AS sum_chars,
            round(CAST(sum(nws) AS DOUBLE) / count(*), 6) AS avg_ws_tokens,
            round(CAST(sum(nbpe) AS DOUBLE) / count(*), 6) AS avg_bpe_tokens
          FROM t GROUP BY 1 ORDER BY 1""",
    "p07_quality_topk" ->
      s"""WITH $qualityCtes
          SELECT doc_id, quality FROM q
          ORDER BY quality DESC, doc_id ASC LIMIT 10""",
    "p08_langid_counts" ->
      s"""WITH $langPredCtes
          SELECT pred_lang, count(*) AS n FROM pred GROUP BY 1 ORDER BY 1""",
    // p38: the langid chain judged against the corpus's own labels —
    // the confusion matrix with per-true-language recall fractions.
    "p38_langid_confusion" ->
      s"""WITH $langPredCtes,
          conf AS (SELECT d.lang, p.pred_lang, count(*) AS n
                   FROM documents d JOIN pred p USING (doc_id)
                   GROUP BY 1, 2),
          tot AS (SELECT lang, count(*) AS tt
                  FROM documents GROUP BY 1)
          SELECT c.lang, c.pred_lang, c.n,
                 round(CAST(c.n AS DOUBLE) / t.tt, 6) AS frac
          FROM conf c JOIN tot t USING (lang)
          ORDER BY lang, pred_lang""",
    // p31: the composed report — every term is an already-proven
    // fragment (dup groups, qualityCtes, the p08 langid chain, the
    // p06/p07 whitespace token count).
    "p31_corpus_report" ->
      s"""WITH $langPredCtes,
          $qualityCtes
          SELECT
            (SELECT count(*) FROM documents) AS n_docs,
            (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) FROM (
               SELECT count(*) AS c FROM documents GROUP BY text
               HAVING count(*) > 1)) AS dup_docs,
            (SELECT round(avg(quality), 6) FROM q) AS mean_quality,
            (SELECT round(-sum(p * log2(p)), 6) FROM (
               SELECT CAST(count(*) AS DOUBLE) /
                 (SELECT count(*) FROM documents) AS p
               FROM pred GROUP BY pred_lang)) AS lang_entropy,
            (SELECT CAST(sum(len(list_filter(
               regexp_split_to_array(text, '\\s+'), x -> x != '')))
               AS BIGINT)
             FROM documents) AS total_ws_tokens""")
}
