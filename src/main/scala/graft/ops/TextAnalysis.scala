package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation: token counting
  * (whitespace + BPE-ish regex), quality scoring (length / punctuation /
  * stopword ratios), language identification (stopword-profile n-gram
  * heuristic), and document fingerprinting (min-k rolling shingle
  * hashes).
  *
  * All are pure column expressions (whole-stage-codegen friendly, no
  * UDFs) — a map-only stage over the corpus at any scale.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def wsTokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** BPE-ish subword tokens: alnum runs are cut into pieces of <= 4
    * chars, digits stand alone, punctuation is one token per char. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]{1,4}|[0-9]|[^a-z0-9\\s]"), lit(0))

  /** Per-doc descriptive stats used by the quality score. Empty text
    * (and token-free text for avg_token_len) yields 0.0 ratios rather
    * than a DIVIDE_BY_ZERO job failure — any real corpus slice contains
    * empty documents. */
  def stats(docs: DataFrame, textCol: String): DataFrame = {
    // null text behaves as empty (0 counts / 0.0 ratios) — without the
    // coalesce, size(null-array) = -1 leaks negative token counts into
    // quality terms and length filters
    val t = coalesce(col(textCol), lit(""))
    val nChars = length(t)
    val alnum = length(regexp_replace(lower(t), "[^a-z0-9]", ""))
    val digits = length(regexp_replace(t, "[^0-9]", ""))
    val spaces = length(regexp_replace(t, "[^ \\t\\n\\r]", ""))
    def ratio(num: Column): Column =
      when(nChars > 0, num.cast("double") / nChars).otherwise(0.0)
    docs
      .withColumn("n_chars", nChars.cast("long"))
      .withColumn("n_tokens_ws", size(wsTokens(t)).cast("long"))
      .withColumn("n_tokens_bpe", size(bpeTokens(t)).cast("long"))
      .withColumn("alnum_ratio", ratio(alnum))
      .withColumn("digit_ratio", ratio(digits))
      .withColumn("punct_ratio", ratio(nChars - alnum - spaces))
      .withColumn("avg_token_len",
        when(size(wsTokens(t)) > 0,
          (nChars - spaces).cast("double") / size(wsTokens(t)))
          .otherwise(0.0))
      .withColumn("stopword_ratio", stopwordRatio(t, EnStopwords))
  }

  /** English stopword profile (a small fixed set — deterministic). */
  val EnStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "on",
    "for", "with", "as", "at", "by", "be", "this", "that", "from")

  /** Fraction of lowercase alnum tokens found in `stopwords`. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = Bm25.tokenize(text)
    when(size(toks) > 0,
      size(filter(toks, t => t.isin(stopwords: _*))).cast("double") /
        size(toks))
      .otherwise(0.0)
  }

  /** Heuristic document quality in [0,1]: rewards a reasonable length,
    * natural-language stopword density, alphabetic content, and low
    * punctuation noise (Gopher-style rule-of-thumb mix, equal weights).
    * Deterministic column math — the oracle reimplements it verbatim. */
  def qualityScore(docs: DataFrame, textCol: String,
                   roundTo: Int = 6): DataFrame =
    stats(docs, textCol).withColumn("quality",
      round(
        (least(col("n_tokens_ws").cast("double") / 50.0, lit(1.0)) +
          least(col("stopword_ratio") * 5.0, lit(1.0)) +
          col("alnum_ratio") +
          (lit(1.0) - least(col("punct_ratio") * 5.0, lit(1.0)))) / 4.0,
        roundTo))

  /** Stopword profiles for language ID. Profiles are disjoint-ish,
    * hand-picked high-frequency function words. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein",
      "eine", "zu", "den", "von", "sich", "auf", "auch"),
    "en" -> Seq("the", "and", "is", "of", "to", "in", "that", "it", "with",
      "for", "was", "are", "this", "not", "have"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "de", "que", "en",
      "un", "una", "por", "con", "para", "no"),
    "fr" -> Seq("le", "la", "les", "et", "est", "de", "que", "en", "un",
      "une", "du", "des", "pas", "pour", "dans"),
    "it" -> Seq("il", "la", "che", "di", "e", "un", "una", "per", "non",
      "sono", "con", "del", "si", "ma", "come"))

  /** Language-ID: argmax over per-language stopword hit counts
    * (no hits → "und"; equal nonzero scores tie-break alphabetically by
    * language code — deterministic, and what the p08 oracle replays). */
  def langId(text: Column): Column = {
    // null text = empty text = "und": size(null toks) is -1, which
    // dodges the === 0 empty guard and falls through to an arbitrary
    // alphabetically-first language
    val toks = Bm25.tokenize(coalesce(text, lit("")))
    val scored = LangProfiles.map { case (lang, words) =>
      struct(
        (-size(filter(toks, t => t.isin(words: _*)))).cast("long").as("neg"),
        lit(lang).as("lang"))
    }
    val best = array_sort(array(scored: _*)).getItem(0)
    when(size(toks) === 0 || best.getField("neg") === 0, lit("und"))
      .otherwise(best.getField("lang"))
  }

  /** Min-k document fingerprint: the k smallest distinct xxhash64 values
    * of word `n`-gram shingles, sorted ascending. Two docs' fingerprint
    * overlap estimates containment (the MinHash bottom-k sketch). */
  def fingerprint(text: Column, n: Int = 4, k: Int = 8): Column =
    slice(array_sort(transform(Dedup.shingles(text, n),
      s => xxhash64(s))), 1, k)

  /** [[fingerprint]] with the md5-prefix-60 shingle hash
    * ([[Dedup.Md5Prefix60TermHash]]'s column twin): slower than xxhash64
    * (md5 + hex parse per shingle) but bit-reproducible in any SQL
    * engine, so an external oracle can verify the full sketch-overlap
    * pipeline. Still a pure column expression — codegen'd, map-only. */
  def fingerprintMd5(text: Column, n: Int = 4, k: Int = 8): Column =
    slice(array_sort(transform(Dedup.shingles(text, n),
      s => conv(substring(md5(s), 1, 15), 16, 10).cast("long"))), 1, k)

  /** Gopher-style repetition signals per document (Rae et al. 2021,
    * "Scaling Language Models", repetition filters — re-expressed as
    * Spark aggregations):
    *
    *  - `dup_trigram_frac`: fraction of word-trigram OCCURRENCES that
    *    are repeats of an earlier occurrence — pure column math
    *    (map-only, no shuffle).
    *  - `top_bigram_frac`: share of all word-bigram occurrences taken
    *    by the single most frequent bigram — one explode + two
    *    map-side-combinable aggregations keyed by (doc, bigram) then
    *    doc, so the heavy reduce is distributed at any corpus size
    *    (never a per-doc in-memory histogram of unbounded width).
    *
    * High values mark boilerplate / template spam for corpus filtering.
    * Returns (doc_id, dup_trigram_frac, top_bigram_frac). */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
                      roundTo: Int = 6): DataFrame = {
    val t = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val toks = Bm25.tokenize(col("text"))
    def grams(n: Int): Column =
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + 1, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
    val dup = t.select(col("doc_id"), grams(3).as("tg"))
      .select(col("doc_id"),
        when(size(col("tg")) > 0,
          round((size(col("tg")) - size(array_distinct(col("tg"))))
            .cast("double") / size(col("tg")), roundTo))
          .otherwise(0.0).as("dup_trigram_frac"))
    val top = t.select(col("doc_id"), explode(grams(2)).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(round(max(col("n")).cast("double") / sum(col("n")), roundTo)
        .as("top_bigram_frac"))
    // left join + fill: docs with < 2 tokens have no bigrams at all
    dup.join(top, Seq("doc_id"), "left")
      .na.fill(0.0, Seq("top_bigram_frac"))
  }

  /** CCNet-style language-model quality score: per-document mean
    * negative log-likelihood under a bigram MLE model TRAINED ON THE
    * CORPUS ITSELF — loss(doc) = mean over its bigrams (w1,w2) of
    * −ln( c(w1,w2) / c(w1·) ), counts over all corpus bigram
    * positions. High loss = text whose word transitions the corpus
    * finds surprising (boilerplate, garbled extraction, wrong-language
    * fragments) — the ranking CCNet's KenLM perplexity head/middle/
    * tail split is built on, with the model portable enough that any
    * engine replays scores bit-for-bit (no smoothing needed: every
    * doc bigram occurs in its own training counts, so c2 ≥ 1).
    * Documents with < 2 tokens have no bigrams and are excluded.
    *
    * Scale shape: the bigram relation is ~token-count rows, map-only
    * from the scan; both count tables are map-side-combinable
    * groupBys; the score joins are keyed by term — Zipf-hot w1 keys
    * ("the") fan out but arrive pre-combined (one row per distinct
    * bigram), so the join input is vocabulary-sized, not corpus-
    * sized. One final per-doc mean. Returns (doc_id, lm_loss). */
  def lmLogLoss(docs: DataFrame, idCol: String, textCol: String,
                roundTo: Int = 6): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"), Bm25.tokenize(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= 2)
    val pairs = toks
      .withColumn("__w1s", slice(col("__t"), lit(1), size(col("__t")) - 1))
      .withColumn("__w2s", expr("slice(__t, 2, size(__t) - 1)"))
      .select(col("doc_id"),
        explode(arrays_zip(col("__w1s"), col("__w2s"))).as("bg"))
      .select(col("doc_id"), col("bg.__w1s").as("w1"),
        col("bg.__w2s").as("w2"))
    val c2 = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = pairs.groupBy("w1").agg(count(lit(1)).as("c1"))
    pairs.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .groupBy("doc_id")
      .agg(round(avg(log(col("c1")) - log(col("c2"))), roundTo)
        .as("lm_loss"))
  }

  /** DSIR importance weights (Data Selection via Importance
    * Resampling, Xie et al. 2023): score every raw document by how
    * much more likely its hashed-n-gram bag is under the TARGET
    * corpus' feature distribution than under the raw corpus' own —
    * logw(doc) = Σ_features n_f(doc)·(ln p_target(b_f) − ln
    * p_raw(b_f)), features = unigrams + word bigrams hashed into
    * `buckets` buckets, both distributions add-one smoothed over the
    * bucket space. The standard recipe for "select pretraining data
    * that looks like the domain you care about" with nothing learned
    * but two count vectors. (The reference has no data-selection
    * surface; north-star extension like [[lmLogLoss]].)
    *
    * Engine-portable: the bucket of a feature is the 60-bit md5 prefix
    * mod `buckets` (same recipe as every portable hash here), and the
    * per-bucket log-ratio is rounded to 9 before the per-doc sum so
    * both engines add identical addends. Documents with zero tokens
    * have no features and drop out (deterministic exclusion).
    *
    * Scale shape: feature extraction is map-only from the scan; both
    * distribution tables collapse to ≤ `buckets` rows via map-side-
    * combinable counts; totals are one-row aggregates cross-joined
    * back (broadcast by size); the ratio table joins the per-doc
    * bucket counts bucket-keyed — the join's build side is
    * bucket-sized, never corpus-sized. One final per-doc sum. */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
                  textCol: String, buckets: Int = 256,
                  roundTo: Int = 6): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // (doc_id, bucket) — one row per feature OCCURRENCE (unigrams +
    // bigrams), bucket = portable 60-bit md5 prefix mod buckets
    def featBuckets(df: DataFrame): DataFrame = {
      val t = df.select(col(idCol).as("doc_id"),
        Bm25.tokenize(col(textCol)).as("__t"))
      val uni = t.select(col("doc_id"), explode(col("__t")).as("feat"))
      val big = t.filter(size(col("__t")) >= 2)
        .select(col("doc_id"), explode(zip_with(
          slice(col("__t"), lit(1), size(col("__t")) - 1),
          slice(col("__t"), lit(2), size(col("__t")) - 1),
          (a, b) => concat(a, lit(" "), b))).as("feat"))
      uni.unionByName(big).select(col("doc_id"),
        (conv(substring(md5(col("feat")), 1, 15), 16, 10)
          .cast("long") % buckets).as("bucket"))
    }
    val rawB = featBuckets(raw)
    val tgtCnt = featBuckets(target).groupBy("bucket")
      .agg(count(lit(1)).as("tn"))
    val rawCnt = rawB.groupBy("bucket").agg(count(lit(1)).as("rn"))
    val tTot = tgtCnt.agg(sum(col("tn")).as("ttot"))
    val rTot = rawCnt.agg(sum(col("rn")).as("rtot"))
    // per-bucket smoothed log-ratio, rounded so the doc sum is a sum
    // of identical doubles in any engine; buckets the target never
    // saw keep the add-one floor via the left join's coalesce
    val ratio = rawCnt.join(tgtCnt, Seq("bucket"), "left")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("bucket"), round(
        (log(coalesce(col("tn"), lit(0L)) + lit(1.0)) -
          log(col("ttot") + lit(buckets.toDouble))) -
        (log(col("rn") + lit(1.0)) -
          log(col("rtot") + lit(buckets.toDouble))), 9).as("lr"))
    rawB.groupBy("doc_id", "bucket").agg(count(lit(1)).as("n"))
      .join(ratio, Seq("bucket"))
      .groupBy("doc_id")
      .agg(round(sum(col("n") * col("lr")), roundTo).as("logw"))
  }

  /** Per-stratum length quantiles + outlier strip — the curation step
    * that drops pathological-length documents per stratum (language,
    * source): fixed global bounds (C4/Gopher style) misfit strata whose
    * length distributions differ, quantile bounds adapt. Returns one
    * row per stratum: the interpolated p50/p90/p99 of `lenCol`
    * (`quantile_cont` semantics — any engine replays them exactly on
    * integer lengths), the stratum's row count, and `n_kept` = rows at
    * or under the p99 bound.
    *
    * Scale shape: one map-side-combinable aggregation over the corpus +
    * one broadcast join of the (tiny, one-row-per-stratum) bounds frame
    * back for the kept-count — no corpus-sized shuffle. EXACT
    * percentiles by default (sort-based within the agg) keep the
    * external oracle byte-exact; `approx = true` is the 100 TB path —
    * `percentile_approx` (Greenwald-Khanna, `accuracy` inverse-epsilon)
    * holds BOUNDED per-group state where the exact form buffers every
    * value of a stratum in one aggregation buffer. Same plan shape
    * either way (asserted at 16x by ScaleSmoke), so the flag trades
    * only precision, never the shuffle geometry. */
  /** PMI bigram collocations over the corpus — the phrase-mining lens
    * of the text-analysis family: which adjacent word pairs co-occur
    * far above chance ("machine learning", not "of the"). Tokens are
    * [[graft.ops.Bm25.tokenize]]'s (lowercased alnum runs — the same
    * tokenizer every keyword oracle replays); bigrams are ADJACENT
    * pairs only. PMI is computed over the bigram table's own margins
    * (first-position / second-position counts), in nats, with the one
    * float op rounded to `roundTo` BEFORE the top-k ordering so any
    * engine replays the selection; `minCount` suppresses the
    * low-count noise PMI is notorious for. Returns the top-`topK`
    * pairs by (pmi desc, w1 asc, w2 asc): (w1, w2, n_pair, pmi).
    *
    * Scale shape: bigram extraction is a map-only column expression
    * (zip of the token array with its own tail — no self-join); then
    * three combinable counts; the margins are vocabulary-sized, so
    * their joins broadcast at any corpus scale; the final top-k is a
    * TakeOrdered. No UDFs anywhere. */
  def pmiCollocations(docs: DataFrame, textCol: String,
                      minCount: Long = 5, topK: Int = 50,
                      roundTo: Int = 6): DataFrame = {
    val toks = graft.ops.Bm25.tokenize(col(textCol))
    val pairs = docs
      .select(explode(arrays_zip(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))))).as("p"))
      .select(col("p").getField("0").as("w1"),
        col("p").getField("1").as("w2"))
    val pc = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
    val n = pc.agg(sum(col("n_pair")).as("__n"))
    val lm = pc.groupBy("w1").agg(sum(col("n_pair")).as("__cl"))
    val rm = pc.groupBy("w2").agg(sum(col("n_pair")).as("__cr"))
    pc.filter(col("n_pair") >= minCount)
      .join(broadcast(lm), "w1").join(broadcast(rm), "w2")
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("n_pair"),
        // margins cast to double BEFORE their product: stopword
        // margins at corpus scale overflow a long*long (silent wrap
        // with ANSI off → log(negative) → null PMI), double*long
        // cannot; the oracle casts identically
        round(log(col("n_pair").cast("double") * col("__n") /
          (col("__cl").cast("double") * col("__cr"))), roundTo)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(topK)
  }

  /** Per-document TF-IDF keyword extraction — the top-`topK` most
    * characteristic terms of each document, the classic summarize-
    * what-this-doc-is-about signal a curation pipeline stores next to
    * quality and language. Tokens are [[graft.ops.Bm25.tokenize]]'s;
    * idf = ln((N+1)/(df+1)) (add-one smoothed, rounded to 9 so both
    * engines multiply identical factors — the dsir rule), score =
    * tf·idf rounded to `roundTo` BEFORE the per-doc rank so the
    * selection replays; ties by term asc. Returns
    * (id, term, tf, score, rk) for rk <= topK.
    *
    * Scale shape: one (id, term) count shuffle; df REUSES that
    * frame's output (one row per (doc, term) — a combinable count by
    * term); the df join is vocabulary-sized (broadcast); the corpus
    * size joins as a broadcast one-row frame, never a driver
    * collect; the per-doc rank is a window bounded by the doc's own
    * distinct-term count. */
  def tfIdfKeywords(docs: DataFrame, idCol: String, textCol: String,
                    topK: Int = 3, roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col(idCol).as("id"),
        explode(graft.ops.Bm25.tokenize(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("__df"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy("id")
      .orderBy(col("score").desc, col("term").asc)
    tf.join(broadcast(df), "term").crossJoin(broadcast(n))
      .select(col("id"), col("term"), col("tf"),
        round(col("tf") * round(log((col("__n") + 1.0) /
          (col("__df") + 1.0)), 9), roundTo).as("score"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
  }

  def lengthQuantiles(docs: DataFrame, strataCol: String, lenCol: String,
                      roundTo: Int = 6, approx: Boolean = false,
                      accuracy: Int = 10000): DataFrame = {
    // percentile_approx returns the INPUT type (it picks a real value,
    // never interpolates) while percentile returns double — cast so the
    // flag never changes the output schema
    def pct(q: Double): Column = round(
      (if (approx) expr(s"percentile_approx($lenCol, $q, $accuracy)")
       else expr(s"percentile($lenCol, $q)")).cast("double"), roundTo)
    val qs = docs.groupBy(strataCol).agg(
      pct(0.5).as("p50"),
      pct(0.9).as("p90"),
      pct(0.99).as("p99"),
      count(lit(1)).as("n_total"))
    // null-SAFE joins: groupBy emits a NULL-stratum row (uncategorized
    // docs are a real stratum in raw corpora), which a plain equi-join
    // key would silently drop from the report
    val bounds = qs.select(col(strataCol).as("__s"), col("p99").as("__p99"))
    val kept = docs
      .join(broadcast(bounds), docs(strataCol) <=> col("__s"))
      .filter(col(lenCol) <= col("__p99"))
      .groupBy(strataCol).agg(count(lit(1)).as("n_kept"))
      .select(col(strataCol).as("__k"), col("n_kept"))
    qs.join(kept, qs(strataCol) <=> col("__k"), "left")
      .na.fill(0L, Seq("n_kept"))
      .drop("__k")
  }

  /** PII patterns shared by [[scrubPii]] and its oracle: RE2-safe (no
    * lookarounds), identical semantics under Java regex and DuckDB so
    * the scrub is engine-portable. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}[-.]\\d{4}\\b"

  /** PII scrubbing — the redaction pass every released training corpus
    * runs (emails / IPv4 / phone-shaped numbers → typed placeholders).
    * Map-only column math: at 100 TB it fuses into the scan with zero
    * shuffle. Order matters and is fixed (email → ip → phone) so
    * every engine produces byte-identical output; counts are taken on
    * the ORIGINAL text before any replacement. Returns the input plus
    * n_emails / n_ips / n_phones / `clean` (scrubbed `textCol`). */
  def scrubPii(docs: DataFrame, textCol: String): DataFrame = {
    // null docs behave like empty docs (counts 0, clean "") — without
    // the coalesce, regexp_extract_all(null) makes size() return -1
    // and `clean` comes back null
    val t = coalesce(col(textCol), lit(""))
    docs
      .withColumn("n_emails", size(regexp_extract_all(t, lit(EmailRe), lit(0))))
      .withColumn("n_ips", size(regexp_extract_all(t, lit(Ipv4Re), lit(0))))
      .withColumn("n_phones", size(regexp_extract_all(t, lit(PhoneRe), lit(0))))
      .withColumn("clean",
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailRe, "<EMAIL>"),
            Ipv4Re, "<IP>"),
          PhoneRe, "<PHONE>"))
  }
}
