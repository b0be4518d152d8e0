package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Registry
import graft.eval.{GroundTruth, Metrics, OverlapJudge, Retrieved}
import graft.ops.Ann
import Tables._

/** Oracle-gated evaluation-suite queries: the reference's pytrec_eval
  * measure bundle (NDCG / MAP / recall@k / precision@k / MRR,
  * /root/reference/vechord/evaluate.py:22-86,210-231) computed
  * distributed by [[Metrics.evaluate]], and recomputed independently by
  * the DuckDB oracle with window functions from first principles.
  *
  * Setup: queries = embeddings 0..9, ranked lists = L2 top-10 via the
  * bounded-heap kNN join, truth(q) = all other vectors sharing q's
  * label — a deterministic, engine-free ground-truth definition.
  */
object Eval {

  val K = 10
  val NQ = 10

  private def rankedBy(s: SparkSession, d: String,
                       metric: Ann.Metric): DataFrame = {
    val e = embeddings(s, d)
    val qs = e.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val docs = e.select(col("vec_id").as("d_id"), col("embedding").as("dv"))
    Ann.knnJoin(qs, "q_id", "qv", docs, "d_id", "dv", metric, K)
      .select(col("q_id").as("qid"), col("d_id").cast("string").as("id"),
        col("rank"))
  }

  private def ranked(s: SparkSession, d: String): DataFrame =
    rankedBy(s, d, Ann.L2)

  private def truth(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val a = e.select(col("vec_id").as("qid"), col("label").as("qlab"))
      .filter(col("qid") < NQ)
    val b = e.select(col("vec_id").as("id"), col("label").as("dlab"))
    a.join(b, col("qlab") === col("dlab") && col("qid") =!= col("id"))
      .select(col("qid"), col("id").cast("string").as("id"))
  }

  /** Per-query measure rows. */
  def metricsKnn(s: SparkSession, d: String): DataFrame =
    Metrics.evaluate(ranked(s, d), truth(s, d), K)
      .select(col("qid"),
        round(col("ndcg"), 6).as("ndcg"),
        round(col("map"), 6).as("map"),
        round(col(s"recall_$K"), 6).as(s"recall_$K"),
        round(col(s"precision_$K"), 6).as(s"precision_$K"),
        round(col("mrr"), 6).as("mrr"))
      .orderBy("qid")

  /** e13: deterministic bootstrap CI over the e02 per-query NDCG
    * ([[Metrics.bootstrapCi]]) — 200 md5-seeded resamples of the 10
    * queries, replicate means, explicit rank-6/rank-195 percentile
    * selection: the error bar e03's macro average should carry, RNG-
    * free so DuckDB replays every draw. */
  def bootstrapCi(s: SparkSession, d: String): DataFrame =
    Metrics.bootstrapCi(
      Metrics.evaluate(ranked(s, d), truth(s, d), K)
        .select(col("qid"), round(col("ndcg"), 6).as("ndcg")),
      "qid", "ndcg", n = NQ, b = 200)

  val HalfDim = 32

  /** e14: deterministic paired permutation test
    * ([[Metrics.pairedPermutation]]) — the dimensionality ablation:
    * does full-width L2 retrieval beat L2 over the first
    * [[HalfDim]] dimensions beyond chance on these 10 queries? 200
    * md5-parity sign-flip replicates of the per-query NDCG diffs,
    * two-sided add-one p-value; the significance call an eval report
    * needs next to e13's error bar. RNG-free, so DuckDB replays
    * every flip. (L2-vs-cosine was the natural pairing but ranks
    * identically on this corpus — a vacuous diff grid; truncation
    * guarantees a live one.) */
  def permutationTest(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    def perq(ranked: DataFrame) =
      Metrics.evaluate(ranked, truth(s, d), K)
        .select(col("qid"), round(col("ndcg"), 6).as("ndcg"))
    val qsHalf = e.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("q_id"),
        slice(col("embedding"), 1, HalfDim).as("qv"))
    val docsHalf = e.select(col("vec_id").as("d_id"),
      slice(col("embedding"), 1, HalfDim).as("dv"))
    val rankedHalf = Ann.knnJoin(qsHalf, "q_id", "qv",
        docsHalf, "d_id", "dv", Ann.L2, K)
      .select(col("q_id").as("qid"), col("d_id").cast("string").as("id"),
        col("rank"))
    Metrics.pairedPermutation(perq(ranked(s, d)), perq(rankedHalf),
      "qid", "ndcg", n = NQ, b = 200)
  }

  /** e16: the recall-vs-probes CURVE as oracle-gated data — recall@10
    * of the IVF batch join against the exact top-10 at probes ∈
    * {1, 2, 3}, averaged over the 10 bench queries. RecallSmoke
    * measures this shape informally; here every number faces DuckDB
    * (assignment, probe ranking, both top-10s, the intersection) — the
    * quality/latency trade a 100 TB operator actually tunes, as a
    * hash-checked table instead of prose. Exact by construction at
    * probes = #cells; monotone non-decreasing in probes (both engines
    * would catch a violation since each row replays independently). */
  def recallCurve(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = embeddings(s, d)
    val model = Ann.buildIvf(e, "label", "embedding")
    val qs = e.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val docs = e.select(col("vec_id").as("d_id"), col("embedding").as("dv"))
    val assigned = Ann.assign(docs, "dv", model, Ann.L2)
    val exact = Ann.knnJoin(qs, "q_id", "qv", docs, "d_id", "dv",
        Ann.L2, K)
      .select(col("q_id"), col("d_id")).localCheckpoint(true)
    val rows = Seq(1, 2, 3).map { p =>
      val approx = Ann.knnJoinIvf(qs, "q_id", "qv", assigned,
        "d_id", "dv", model, Ann.L2, probes = p, k = K)
      val hits = exact.join(approx.select(col("q_id"), col("d_id")),
        Seq("q_id", "d_id"), "left_semi").count()
      (p, BigDecimal(hits.toDouble / (NQ * K))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    rows.toDF("probes", "recall")
  }

  /** e17: is the probes quality gap SIGNIFICANT — the companion call
    * to e16's curve: per-query recall@10 of the IVF batch join at
    * probes=3 vs probes=1 (the curve's 0.53-vs-0.27 endpoints at
    * sf0.01), through [[Metrics.pairedPermutation]]'s md5-parity
    * sign-flip grid. Queries with zero approximate hits keep their
    * 0.0 rows (left join from the query set — dropping them would
    * bias the diff grid toward agreement); recall rounded BEFORE the
    * diffs like every rank-facing float here. */
  def probesSignificance(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val model = Ann.buildIvf(e, "label", "embedding")
    val qs = e.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val docs = e.select(col("vec_id").as("d_id"),
      col("embedding").as("dv"))
    val assigned = Ann.assign(docs, "dv", model, Ann.L2)
    val exact = Ann.knnJoin(qs, "q_id", "qv", docs, "d_id", "dv",
        Ann.L2, K)
      .select(col("q_id"), col("d_id")).localCheckpoint(true)
    def perq(p: Int): DataFrame = {
      val approx = Ann.knnJoinIvf(qs, "q_id", "qv", assigned,
        "d_id", "dv", model, Ann.L2, probes = p, k = K)
      val hits = exact.join(approx.select(col("q_id"), col("d_id")),
          Seq("q_id", "d_id"), "left_semi")
        .groupBy("q_id").agg(count(lit(1)).as("__h"))
      qs.select(col("q_id").as("qid"))
        .join(hits.withColumnRenamed("q_id", "qid"), Seq("qid"), "left")
        .select(col("qid"),
          round(coalesce(col("__h"), lit(0L)).cast("double") / K, 6)
            .as("recall"))
    }
    Metrics.pairedPermutation(perq(3), perq(1), "qid", "recall",
      n = NQ, b = 200)
  }

  /** e18: inter-judge agreement ([[Metrics.cohenKappa]]) over the
    * FULL (query × document) judging sweep of the e04 setup — before
    * an eval pipeline trusts relevance labels it reports how much two
    * judges AGREE beyond chance: judge A is [[OverlapJudge]]'s
    * threshold (2·|q∩p| ≥ |q|), judge B the strict three-quarters
    * form (4·|q∩p| ≥ 3·|q|). The pool is every pair (a ranked prefix
    * degenerates here: every top doc satisfies BOTH judges — the
    * first shipped form of this gate proved it with an all-n11
    * table). B is NESTED in A by construction, so n01 = 0 is a
    * STRUCTURAL invariant the gate pins exactly (a nonzero n01 means
    * a judge changed); the other three cells must be live or the κ
    * arithmetic is untested. At sf0.01: (2573, 1016, 0, 411) of
    * 4000, κ ≈ 0.34 — moderate agreement, the honest reading of a
    * lenient-vs-strict pair. */
  def judgeAgreement(s: SparkSession, d: String): DataFrame = {
    val raw = documents(s, d)
      .select(col("doc_id").cast("long").as("id"), col("text"))
      .withColumn("rt",
        filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= lit("")))
    val docs = raw.select(col("id"), array_distinct(col("rt")).as("dt"))
    val qs = raw.filter(col("id") < NGtQ)
      .select(col("id").as("qid"),
        array_distinct(slice(col("rt"), 1, 8)).as("qt"))
    val pool = docs.crossJoin(broadcast(qs))
      .select(size(array_intersect(col("dt"), col("qt"))).as("ov"),
        size(col("qt")).as("nq"))
    val judged = pool
      .withColumn("rel_a", (col("ov") * 2 >= col("nq")).cast("int"))
      .withColumn("rel_b", (col("ov") * 4 >= col("nq") * 3).cast("int"))
    val out = Metrics.cohenKappa(judged, "rel_a", "rel_b")
    val row = out.head()
    require(row.getLong(1) > 0 && row.getLong(2) > 0 &&
        row.getLong(4) > 0,
      s"e18 is degenerate: an empty live cell " +
        s"(${row.mkString(",")}) — the kappa arithmetic is untested")
    require(row.getLong(3) == 0,
      s"e18: n01 = ${row.getLong(3)} — the strict judge accepted a " +
        "pair the lenient one rejected; the nested-threshold " +
        "contract broke")
    out
  }

  /** Macro-average over the query set (evaluate.py:44-48). */
  def metricsMacro(s: SparkSession, d: String): DataFrame =
    Metrics.macroAvg(Metrics.evaluate(ranked(s, d), truth(s, d), K))
      .select(
        round(col("ndcg"), 6).as("ndcg"),
        round(col("map"), 6).as("map"),
        round(col(s"recall_$K"), 6).as(s"recall_$K"),
        round(col(s"precision_$K"), 6).as(s"precision_$K"),
        round(col("mrr"), 6).as("mrr"))

  /** e04: the full GroundTruth loop (groundtruth.py:36-127) under the
    * oracle gate. Queries = the first 8 tokens of documents 0..7;
    * retrieval = docs ranked by distinct-token overlap with the query
    * (desc, doc_id asc) — computed ONCE distributed (queries broadcast,
    * Q≪N like the kNN join; the per-query top-k window partitions on
    * the 8 qids, fine for bounded Q). generate() judges the top-20
    * with [[OverlapJudge]] (score ≥ 2 ⟺ 2·|q∩p| ≥ |q|, exact integer
    * form) and persists the truth lists; evaluate() re-retrieves at
    * top-10 and macro-averages ndcg / map / recall@10 — the depth gap
    * makes recall non-trivial, like the reference's generate-at-100 /
    * evaluate-at-10 example (groundtruth.py:58-66, 104). */
  val NGtQ = 8
  val KGen = 20

  def groundtruthLoop(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val raw = documents(s, d)
      .select(col("doc_id").cast("long").as("id"), col("text"))
      .withColumn("rt",
        filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= lit("")))
    val docs = raw.select(col("id"), col("text"),
      array_distinct(col("rt")).as("dt"))
    val qs = raw.filter(col("id") < NGtQ)
      .select(col("id").as("qid"),
        concat_ws(" ", slice(col("rt"), 1, 8)).as("qtext"),
        array_distinct(slice(col("rt"), 1, 8)).as("qt"))
    val wq = Window.partitionBy("qid")
      .orderBy(col("ov").desc, col("id").asc)
    val ranked = docs.crossJoin(broadcast(qs))
      .withColumn("ov", size(array_intersect(col("dt"), col("qt"))))
      .withColumn("rank", row_number().over(wq))
      .filter(col("rank") <= KGen)
      .select("qid", "rank", "id", "text", "qtext")
      .orderBy("qid", "rank")
      .collect()
    val byText: Map[String, Seq[Retrieved]] = ranked
      .groupBy(_.getAs[String]("qtext"))
      .map { case (qt, rows) =>
        qt -> rows.sortBy(_.getAs[Int]("rank"))
          .map(r => Retrieved(r.getAs[Long]("id").toString,
            r.getAs[String]("text"))).toSeq
      }
    val qtexts = ranked.map(_.getAs[String]("qtext")).distinct.sorted.toSeq
    val retrieveGen: String => Seq[Retrieved] = q => byText.getOrElse(q, Nil)
    val retrieveEval: String => Seq[Retrieved] =
      q => byText.getOrElse(q, Nil).take(K)
    val reg = new Registry(s,
      java.nio.file.Files.createTempDirectory("graft_e04").toString)
    val gt = new GroundTruth("e04", reg)
    gt.generate(qtexts, retrieveGen, OverlapJudge())
    val m = gt.evaluate(retrieveEval, topk = K)
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    Seq((r6(m("ndcg")), r6(m("map")), r6(m(s"recall_$K"))))
      .toDF("ndcg", "map", s"recall_$K")
  }

  /** Query synthesis under the oracle (E4: the evaluator's query
    * producer seat, evaluate.py:93-119, via its deterministic stand-in
    * [[graft.eval.Harness.syntheticQuery]]): per document, its 5 rarest
    * DISTINCT tokens by corpus document frequency (ties by token asc),
    * space-joined. The corpus df map is collected once (bounded
    * vocabulary — the harness contract) and the REAL scalar function
    * runs per document; DuckDB replays tokenization, document
    * frequency and the (df, token) ranking from first principles.
    * Token-free documents synthesize nothing and are dropped on both
    * sides. */
  def querySynthesis(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = documents(s, d)
    val dfMap: Map[String, Long] = docs
      .select(explode(array_distinct(
        graft.ops.Bm25.tokenize(col("text")))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .as[(String, Long)].collect().toMap
    val b = s.sparkContext.broadcast(dfMap)
    val synth = udf((t: String) =>
      graft.eval.Harness.syntheticQuery(if (t == null) "" else t, b.value))
    docs.select(col("doc_id"), synth(col("text")).as("query"))
      .filter(length(col("query")) > 0)
  }

  /** e08: judged-relevance metrics WITHOUT stored truth (E6: the
    * UMBRELA `evaluate_with_estimation` port, evaluate.py:210-231)
    * under the oracle. Per query (first 8 tokens of docs 0..7, e04's
    * retrieval shape), the overlap-ranked top-10 passages are judged
    * by the deterministic [[OverlapJudge]] (rel ⟺ 2·|q∩p| ≥ |q|, the
    * exact integer form of round(3·frac) ≥ 2) and the REAL scalar
    * [[graft.eval.Judged.evaluateWithEstimation]] computes
    * Precision@k / AP@k (k ∈ 3,5,10) + MRR — run DISTRIBUTED inside a
    * typed mapGroups (one bounded group per query, never a driver
    * loop); DuckDB replays ranking, judgment and every measure from
    * first principles. */
  def judgedMetrics(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val raw = documents(s, d)
      .select(col("doc_id").cast("long").as("id"), col("text"))
      .withColumn("rt",
        filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= lit("")))
    val docs = raw.select(col("id"), col("text"),
      array_distinct(col("rt")).as("dt"))
    val qs = raw.filter(col("id") < NGtQ)
      .select(col("id").as("qid"),
        concat_ws(" ", slice(col("rt"), 1, 8)).as("qtext"),
        array_distinct(slice(col("rt"), 1, 8)).as("qt"))
    val wq = Window.partitionBy("qid")
      .orderBy(col("ov").desc, col("id").asc)
    val ranked = docs.crossJoin(broadcast(qs))
      .withColumn("ov", size(array_intersect(col("dt"), col("qt"))))
      .withColumn("rank", row_number().over(wq))
      .filter(col("rank") <= K)
      .select(col("qid"), col("rank"), col("text"), col("qtext"))
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    ranked.as[(Long, Int, String, String)]
      .groupByKey(_._1)
      .mapGroups { (qid, it) =>
        val rows = it.toSeq.sortBy(_._2)
        val m = graft.eval.Judged.evaluateWithEstimation(
          rows.head._4,
          rows.map(t => Option(t._3).getOrElse("")), OverlapJudge())
        (qid, r6(m("precision@3")), r6(m("AP@3")),
          r6(m("precision@5")), r6(m("AP@5")),
          r6(m("precision@10")), r6(m("AP@10")), r6(m("MRR")))
      }
      .toDF("qid", "precision_3", "ap_3", "precision_5", "ap_5",
        "precision_10", "ap_10", "mrr")
      .orderBy("qid")
  }

  /** The augmenter seat under the oracle (T12–T13: the reference's
    * contextual-retrieval stages, augment.py:68-93, via the
    * deterministic [[graft.text.LocalAugmenter]]): per document,
    * `augmentQuery` (the 5 longest distinct >3-char tokens, ties by
    * token asc, space-joined) and `summarizeDoc` (the lead sentence
    * truncated to 160 chars). Both replay as pure column math in
    * DuckDB — the length-sort rides a lpad(1000−len) sort key. */
  def augment(s: SparkSession, d: String): DataFrame = {
    val aug = graft.text.LocalAugmenter()
    val q = udf((t: String) => aug.augmentQuery(if (t == null) "" else t))
    val sm = udf((t: String) => aug.summarizeDoc(if (t == null) "" else t))
    documents(s, d).select(col("doc_id"), q(col("text")).as("query"),
      sm(col("text")).as("summary"))
  }

  /** e12: the Pass@K harness (E9, anthropic.py:205-225) under the
    * oracle — [[graft.eval.Harness.passAtKeywordBatch]]: synthetic
    * rarest-term queries (e05's synthesis) for the first 50 docs replay
    * through the batch BM25 retriever in one job, each query's golden
    * doc being its own source; the gate hash-compares every per-query
    * (hit5, hit10) indicator, from which Pass@5/Pass@10 are the means.
    * QPS stays Harness.main's printed measurement — wall time is not
    * oracle-able. */
  def passkKeyword(s: SparkSession, d: String): DataFrame =
    // content-versioned memo key (the e12 tag scopes it apart from the
    // doc_id-keyed r22 index over the same corpus): repeated bench
    // passes reuse one persisted postings table instead of leaking one
    // per run
    graft.eval.Harness.passAtKeywordBatch(s, documents(s, d),
      "doc_id", "text", nQueries = 50,
      cacheKey = Some(
        s"e12|$d|${graft.ops.Bm25.dirVersion(s, s"$d/documents.parquet")}"))

  /** e15: the error bar on Pass@10 — [[Metrics.bootstrapCi]] over
    * e12's per-query hit indicators (binary metric: replicate means
    * are resampled pass rates). Queries re-rank onto the dense 0..n−1
    * grid the resampler draws from (a token-free doc synthesizes no
    * query, so qids may have holes); both engines re-rank the same
    * way, so every draw lands on the same query. */
  def passkCi(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the retrieval chain is consumed three times (count + the two
    // bootstrap branches) — pin the 50-row frame once instead of
    // re-running the batch BM25 search per consumer
    val per = passkKeyword(s, d)
      .withColumn("rid",
        row_number().over(Window.orderBy(col("qid").asc)) - 1)
      .select(col("rid"), col("hit10").cast("double").as("hit10"))
      .localCheckpoint(true)
    val n = per.count().toInt
    Metrics.bootstrapCi(per, "rid", "hit10", n = n, b = 200)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e18_judge_agreement" -> judgeAgreement,
    "e17_probes_signif" -> probesSignificance,
    "e16_recall_curve" -> recallCurve,
    "e15_passk_ci" -> passkCi,
    "e14_perm_test" -> permutationTest,
    "e13_bootstrap_ci" -> bootstrapCi,
    "e12_passk_keyword" -> passkKeyword,
    "e02_metrics_knn" -> metricsKnn,
    "e03_metrics_macro" -> metricsMacro,
    "e04_groundtruth_loop" -> groundtruthLoop,
    "e05_query_synthesis" -> querySynthesis,
    "e06_augment" -> augment,
    "e08_judged_metrics" -> judgedMetrics)

  /** Shared oracle CTE chain: ranked top-10 per query with binary
    * relevance, cumulative precision, per-query measures. */
  /** The e04/e08/e18 shared ground-truth prefix: tokenized docs,
    * distinct-token doc sets, and the first-8-token query set. */
  private val GtPrefixSql =
    s"""rt AS (SELECT doc_id AS id,
              list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                x -> x != '') AS toks
            FROM documents),
        d AS (SELECT id, list_distinct(toks) AS dt FROM rt),
        q AS (SELECT id AS qid, list_distinct(toks[1:8]) AS qt
              FROM rt WHERE id < $NGtQ)"""

  private val perQuerySql =
    s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv,
                          label AS qlab
                   FROM embeddings WHERE vec_id < $NQ),
      d AS (SELECT vec_id AS id, embedding::DOUBLE[] AS dv, label AS dlab
            FROM embeddings),
      ranked AS (
        SELECT qid, id, rel, rank FROM (
          SELECT q.qid, d.id,
                 CAST(d.dlab = q.qlab AND d.id <> q.qid AS INT) AS rel,
                 row_number() OVER (PARTITION BY q.qid
                   ORDER BY round(list_distance(d.dv, q.qv), 6) ASC,
                            d.id ASC) AS rank
          FROM q CROSS JOIN d) WHERE rank <= $K),
      tsz AS (SELECT q.qid, count(*) AS n_truth
              FROM q JOIN d ON d.dlab = q.qlab AND d.id <> q.qid
              GROUP BY 1),
      cum AS (SELECT qid, rel, rank,
                     sum(rel) OVER (PARTITION BY qid ORDER BY rank)
                       AS cum_rel
              FROM ranked),
      perq AS (
        SELECT qid,
          sum(CASE WHEN rel = 1 THEN 1.0 / log2(rank + 1.0) ELSE 0 END)
            AS dcg,
          sum(CASE WHEN rel = 1 THEN CAST(cum_rel AS DOUBLE) / rank
              ELSE 0 END) AS ap_num,
          sum(CASE WHEN rel = 1 AND rank <= $K THEN 1 ELSE 0 END)
            AS rel_at_k,
          max(CASE WHEN rel = 1 THEN 1.0 / rank ELSE 0 END) AS mrr
        FROM cum GROUP BY 1),
      idcg AS (SELECT qid, sum(1.0 / log2(i + 1.0)) AS idcg
               FROM (SELECT qid, unnest(generate_series(1, n_truth)) AS i
                     FROM tsz)
               GROUP BY 1),
      meas AS (
        SELECT p.qid,
          round(CASE WHEN t.n_truth > 0 THEN p.dcg / i.idcg ELSE 0 END, 6)
            AS ndcg,
          round(CASE WHEN t.n_truth > 0 THEN p.ap_num / t.n_truth
                ELSE 0 END, 6) AS map,
          round(CASE WHEN t.n_truth > 0
                THEN CAST(p.rel_at_k AS DOUBLE) / t.n_truth ELSE 0 END, 6)
            AS recall_$K,
          round(CAST(p.rel_at_k AS DOUBLE) / $K, 6) AS precision_$K,
          round(p.mrr, 6) AS mrr
        FROM perq p JOIN tsz t USING (qid) JOIN idcg i USING (qid))"""

  /** Per-retriever NDCG chain (CTE fragment): ranked top-K by
    * `distExpr`, DCG, 6-rounded NDCG against the shared tsz/idcg. */
  private def ndcgChainSql(tag: String, distExpr: String): String =
    s"""ranked$tag AS (
          SELECT qid, id, rel, rank FROM (
            SELECT q.qid, d.id,
                   CAST(d.dlab = q.qlab AND d.id <> q.qid AS INT) AS rel,
                   row_number() OVER (PARTITION BY q.qid
                     ORDER BY round($distExpr, 6) ASC, d.id ASC) AS rank
            FROM q CROSS JOIN d) WHERE rank <= $K),
        perq$tag AS (
          SELECT qid,
            sum(CASE WHEN rel = 1 THEN 1.0 / log2(rank + 1.0) ELSE 0 END)
              AS dcg
          FROM ranked$tag GROUP BY 1),
        meas$tag AS (
          SELECT p.qid,
            round(CASE WHEN t.n_truth > 0 THEN p.dcg / i.idcg ELSE 0 END, 6)
              AS ndcg
          FROM perq$tag p JOIN tsz t USING (qid) JOIN idcg i USING (qid))"""

  /** e12/e15 shared oracle chain: synthesis (rarest-5 distinct
    * tokens), Okapi BM25 (k1=1.2, b=0.75, +1 idf), per-query rank
    * window — the single point of truth BOTH hit-based gates rank
    * against. */
  private val bm25HitChainSql =
    """toks AS (
            SELECT doc_id AS id,
                   unnest(list_filter(
                     regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x != '')) AS term
            FROM documents),
          tf AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
          dl AS (SELECT id, count(*) AS dl FROM toks GROUP BY 1),
          stats AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
          g AS (SELECT count(*) AS n,
                       CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
          qsrc AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 50),
          qt AS (SELECT qid, term FROM (
              SELECT t.id AS qid, t.term,
                     row_number() OVER (PARTITION BY t.id
                       ORDER BY s.df ASC, t.term ASC) AS rk
              FROM tf t
              JOIN stats s USING (term)
              WHERE t.id IN (SELECT doc_id FROM qsrc)) WHERE rk <= 5),
          scored AS (
            SELECT qt.qid, tf.id,
                   ln((g.n - s.df + 0.5) / (s.df + 0.5) + 1.0) *
                     (tf.tf * (1.2 + 1)) /
                     (tf.tf + 1.2 * ((1 - 0.75) + 0.75 * dl.dl / g.avgdl))
                     AS w
            FROM tf
            JOIN qt USING (term)
            JOIN stats s USING (term)
            JOIN dl USING (id)
            CROSS JOIN g),
          agg AS (SELECT qid, id, round(sum(w), 6) AS score
                  FROM scored GROUP BY 1, 2),
          r AS (SELECT qid, id,
                  row_number() OVER (PARTITION BY qid
                    ORDER BY score DESC, id ASC) AS rank
                FROM agg)"""

  /** The IVF-recall replay CTE chain shared by e16 and e17: label-mean
    * cells (round 5), unrounded probe ranking with centroid-id ties,
    * exact top-K beside the per-probe-count candidates (round-6
    * ranking, id ties). `probesList` parameterizes the probe counts
    * (e16 gates the curve at 1,2,3; e17 tests 3-vs-1 significance). */
  private def ivfRecallCtes(probesList: String): String =
    s"""q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id < $NQ),
        dims AS (
          SELECT CAST(label AS BIGINT) AS centroid_id, pos,
                 round(avg(CAST(x AS DOUBLE)), 5) AS c
          FROM (SELECT label, unnest(embedding) AS x,
                       unnest(range(len(embedding))) AS pos
                FROM embeddings)
          GROUP BY 1, 2),
        cents AS (
          SELECT centroid_id, list(c ORDER BY pos) AS centroid
          FROM dims GROUP BY 1),
        assigned AS (
          SELECT vec_id, embedding, centroid_id FROM (
            SELECT e.vec_id, e.embedding, c.centroid_id,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY list_distance(e.embedding::DOUBLE[],
                                            c.centroid) ASC,
                              c.centroid_id ASC) AS rn
            FROM embeddings e CROSS JOIN cents c) WHERE rn = 1),
        exact AS (SELECT qid, id FROM (
            SELECT q.qid, d.vec_id AS id,
                   row_number() OVER (PARTITION BY q.qid
                     ORDER BY round(list_distance(d.embedding::DOUBLE[],
                                                  q.qv), 6) ASC,
                              d.vec_id ASC) AS rk
            FROM q CROSS JOIN embeddings d) WHERE rk <= $K),
        pb AS (
          SELECT q.qid, c.centroid_id,
                 row_number() OVER (PARTITION BY q.qid
                   ORDER BY list_distance(c.centroid, q.qv) ASC,
                            c.centroid_id ASC) AS prk
          FROM q CROSS JOIN cents c),
        pr AS (SELECT unnest([$probesList]) AS p),
        appx AS (SELECT p, qid, id FROM (
            SELECT t.p, t.qid, t.id,
                   row_number() OVER (PARTITION BY t.p, t.qid
                     ORDER BY round(list_distance(t.dv, q2.qv), 6) ASC,
                              t.id ASC) AS rk
            FROM (SELECT pr.p, pb.qid, a.vec_id AS id,
                         a.embedding::DOUBLE[] AS dv
                  FROM pr JOIN pb ON pb.prk <= pr.p
                  JOIN assigned a ON a.centroid_id = pb.centroid_id) t
            JOIN q q2 ON q2.qid = t.qid) WHERE rk <= $K)"""

  /** The paired-permutation tail shared by e14 and e17: md5-parity
    * sign flips over a `diffs(qid, av, bv, diff)` frame, 200
    * replicates, two-sided add-one p; `+ 0` normalizes a possible
    * -0.0 diff (DuckDB round emits it, Spark's BigDecimal never). */
  private val permTailSql: String =
    s"""obs AS (SELECT round(avg(av), 6) AS mean_a,
                       round(avg(bv), 6) AS mean_b,
                       round(avg(diff), 9) AS dbar FROM diffs),
        flips AS (SELECT i // $NQ AS rs, i % $NQ AS qid,
                    1 - 2 * ((CAST('0x' || substring(md5(
                      CAST(i // $NQ AS VARCHAR) || ':' ||
                      CAST(i % $NQ AS VARCHAR)), 1, 8) AS BIGINT)) % 2)
                      AS sgn
                  FROM (SELECT unnest(range(${200 * NQ})) AS i)),
        means AS (SELECT rs, round(avg(sgn * diff), 9) AS m
                  FROM flips JOIN diffs USING (qid) GROUP BY rs),
        cnt AS (SELECT count(*) AS ge FROM means, obs
                WHERE abs(m) >= abs(dbar))
        SELECT mean_a, mean_b, round(dbar, 6) + 0 AS diff,
               round(CAST(ge + 1 AS DOUBLE) / 201, 6) AS p_value
        FROM obs, cnt"""

  val oracles: Map[String, String] = Map(
    // e18: the FULL query-doc sweep, both judge thresholds as integer
    // comparisons, the contingency cells as BIGINT counts, and the
    // kappa arithmetic in the same fixed marginal order as the
    // engine; a constant judge pair yields NULL, never 1.0.
    "e18_judge_agreement" ->
      s"""WITH $GtPrefixSql,
          pool AS (SELECT len(list_intersect(d.dt, q.qt)) AS ov,
                          len(q.qt) AS nq
                   FROM q CROSS JOIN d),
          j AS (SELECT CAST(2 * ov >= nq AS INT) AS a,
                       CAST(4 * ov >= 3 * nq AS INT) AS b
                FROM pool),
          c AS (SELECT count(*) AS n,
                  CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n11,
                  CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n10,
                  CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n01,
                  CAST(sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n00
                FROM j),
          k AS (SELECT n, n11, n10, n01, n00,
                  (n11 + n00) / CAST(n AS DOUBLE) AS po,
                  (n11 + n10) / CAST(n AS DOUBLE) AS pa,
                  (n11 + n01) / CAST(n AS DOUBLE) AS pb
                FROM c)
          SELECT n, n11, n10, n01, n00,
            CASE WHEN 1 - (pa * pb + (1 - pa) * (1 - pb)) != 0
              THEN round((po - (pa * pb + (1 - pa) * (1 - pb)))
                / (1 - (pa * pb + (1 - pa) * (1 - pb))), 6)
              ELSE NULL END AS kappa
          FROM k""",
    // e17: the IVF replay at probes {1, 3} to per-query recall@10
    // (zero-hit queries kept via the query grid), rounded BEFORE the
    // diffs, then the shared permutation tail — is the probes quality
    // gap significant, the companion call to e16's curve.
    "e17_probes_signif" ->
      s"""WITH ${ivfRecallCtes("1, 3")},
          hits AS (SELECT a.p, a.qid, count(*) AS h
                   FROM appx a JOIN exact e USING (qid, id)
                   GROUP BY 1, 2),
          perq AS (
            SELECT pr.p, q.qid,
                   round(CAST(coalesce(h.h, 0) AS DOUBLE) / $K, 6)
                     AS recall
            FROM q CROSS JOIN pr
            LEFT JOIN hits h ON h.p = pr.p AND h.qid = q.qid),
          diffs AS (
            SELECT a.qid, a.recall AS av, b.recall AS bv,
                   a.recall - b.recall AS diff
            FROM (SELECT qid, recall FROM perq WHERE p = 3) a
            JOIN (SELECT qid, recall FROM perq WHERE p = 1) b
              USING (qid)),
          $permTailSql""",
    // e14: both retriever chains share truth (tsz/idcg); system B is
    // L2 over the 32-dim prefix (list slicing); every sign flip
    // replayed on the md5 parity grid; `+ 0` normalizes a possible
    // -0.0 diff (DuckDB round emits it, Spark's BigDecimal round
    // never does).
    "e14_perm_test" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv,
                            label AS qlab
                     FROM embeddings WHERE vec_id < $NQ),
        d AS (SELECT vec_id AS id, embedding::DOUBLE[] AS dv, label AS dlab
              FROM embeddings),
        tsz AS (SELECT q.qid, count(*) AS n_truth
                FROM q JOIN d ON d.dlab = q.qlab AND d.id <> q.qid
                GROUP BY 1),
        idcg AS (SELECT qid, sum(1.0 / log2(i + 1.0)) AS idcg
                 FROM (SELECT qid, unnest(generate_series(1, n_truth)) AS i
                       FROM tsz)
                 GROUP BY 1),
        ${ndcgChainSql("A", "list_distance(d.dv, q.qv)")},
        ${ndcgChainSql("B", s"list_distance(d.dv[1:$HalfDim], q.qv[1:$HalfDim])")},
        diffs AS (SELECT qid, a.ndcg AS av, b.ndcg AS bv,
                         a.ndcg - b.ndcg AS diff
                  FROM measA a JOIN measB b USING (qid)),
        $permTailSql""",
    // e12: e05's query synthesis composed with r13's batch BM25 replay
    // — rarest-5 distinct tokens per source doc (ties token asc) as the
    // query, Okapi BM25 (k1=1.2, b=0.75, +1 idf) per (query, doc),
    // rank window per query, hit indicators at 5 and 10 against the
    // golden source doc. A token-free doc synthesizes no query and
    // yields no row (both engines).
    "e12_passk_keyword" ->
      s"""WITH $bm25HitChainSql
          SELECT qid,
                 max(CASE WHEN id = qid AND rank <= 5 THEN 1 ELSE 0 END)
                   AS hit5,
                 max(CASE WHEN id = qid AND rank <= 10 THEN 1 ELSE 0 END)
                   AS hit10
          FROM r WHERE rank <= 10 GROUP BY qid ORDER BY qid""",
    "e02_metrics_knn" ->
      s"$perQuerySql SELECT * FROM meas ORDER BY qid",
    // e16: full IVF replay (label-mean cells round 5, UNROUNDED probe
    // ranking with centroid-id ties — knnJoinIvf's probeUdf order —
    // round-6 candidate ranking with id ties), exact top-10 beside it,
    // intersection per probe count.
    "e16_recall_curve" ->
      s"""WITH ${ivfRecallCtes("1, 2, 3")},
        hits AS (SELECT p, count(*) AS h
                 FROM appx JOIN exact USING (qid, id) GROUP BY p)
        SELECT p AS probes,
               round(CAST(h AS DOUBLE) / ${NQ * K}, 6) AS recall
        FROM hits ORDER BY probes""",
    // e15: e12's whole hit chain as the base, re-ranked dense, then
    // the e13 resample grid with n a scalar subquery (the query count
    // is data-dependent: token-free docs synthesize nothing).
    "e15_passk_ci" ->
      s"""WITH $bm25HitChainSql,
          hits AS (SELECT qid,
                 CAST(max(CASE WHEN id = qid AND rank <= 10
                   THEN 1 ELSE 0 END) AS DOUBLE) AS h
               FROM r WHERE rank <= 10 GROUP BY qid),
          dense AS (SELECT row_number() OVER (ORDER BY qid ASC) - 1
                      AS rid, h
                    FROM hits),
          nn AS (SELECT count(*) AS n FROM dense),
          draws AS (
            SELECT i // (SELECT n FROM nn) AS rs,
              (CAST('0x' || substring(md5(
                 CAST(i // (SELECT n FROM nn) AS VARCHAR) || ':' ||
                 CAST(i % (SELECT n FROM nn) AS VARCHAR)), 1, 8)
                 AS BIGINT)) % (SELECT n FROM nn) AS rid
            FROM (SELECT unnest(range(200 * (SELECT n FROM nn))) AS i)),
          means AS (
            SELECT rs, round(avg(d.h), 9) AS m
            FROM draws JOIN dense d USING (rid) GROUP BY rs),
          rk AS (SELECT m, row_number() OVER (ORDER BY m ASC, rs ASC)
                   AS rk
                 FROM means)
          SELECT (SELECT round(avg(h), 6) FROM dense) AS mean,
                 (SELECT round(m, 6) FROM rk WHERE rk = 6) AS ci_lo,
                 (SELECT round(m, 6) FROM rk WHERE rk = 195) AS ci_hi""",
    // e13: every resample draw replayed (md5 32-bit grid mod NQ),
    // replicate means rounded 9, explicit rank selection 6 / 195.
    "e13_bootstrap_ci" ->
      s"""$perQuerySql,
        draws AS (
          SELECT i // $NQ AS rs,
            (CAST('0x' || substring(md5(
               CAST(i // $NQ AS VARCHAR) || ':' ||
               CAST(i % $NQ AS VARCHAR)), 1, 8) AS BIGINT)) % $NQ AS qid
          FROM (SELECT unnest(range(${200 * NQ})) AS i)),
        means AS (
          SELECT rs, round(avg(m.ndcg), 9) AS m
          FROM draws JOIN meas m USING (qid) GROUP BY rs),
        rk AS (SELECT m, row_number() OVER (ORDER BY m ASC, rs ASC)
                 AS rk
               FROM means)
        SELECT (SELECT round(avg(ndcg), 6) FROM meas) AS mean,
               (SELECT round(m, 6) FROM rk WHERE rk = 6) AS ci_lo,
               (SELECT round(m, 6) FROM rk WHERE rk = 195) AS ci_hi""",
    // e04: recompute the whole loop from first principles — tokenize,
    // rank by distinct-token overlap, judge top-KGen (relevance ⟺
    // 2·|q∩p| ≥ |q|, the integer form of OverlapJudge's round(frac·3) ≥ 2
    // threshold), then evaluateOne over the top-K prefix.
    "e04_groundtruth_loop" ->
      s"""WITH $GtPrefixSql,
        ranked AS (SELECT qid, id, rel, rank FROM (
            SELECT q.qid, d.id,
                   CAST(2 * len(list_intersect(d.dt, q.qt)) >= len(q.qt)
                     AS INT) AS rel,
                   row_number() OVER (PARTITION BY q.qid
                     ORDER BY len(list_intersect(d.dt, q.qt)) DESC,
                              d.id ASC) AS rank
            FROM q CROSS JOIN d) WHERE rank <= $KGen),
        tsz AS (SELECT qid, CAST(sum(rel) AS BIGINT) AS n_truth
                FROM ranked GROUP BY 1),
        cum AS (SELECT qid, rel, rank,
                       sum(rel) OVER (PARTITION BY qid ORDER BY rank)
                         AS cum_rel
                FROM ranked WHERE rank <= $K),
        perq AS (SELECT qid,
            sum(CASE WHEN rel = 1 THEN 1.0 / log2(rank + 1.0) ELSE 0 END)
              AS dcg,
            sum(CASE WHEN rel = 1 THEN CAST(cum_rel AS DOUBLE) / rank
                ELSE 0 END) AS ap_num,
            sum(rel) AS rel_at_k
          FROM cum GROUP BY 1),
        idcg AS (SELECT qid, sum(1.0 / log2(i + 1.0)) AS idcg
                 FROM (SELECT qid, unnest(generate_series(1, n_truth)) AS i
                       FROM tsz)
                 GROUP BY 1),
        meas AS (SELECT p.qid,
            CASE WHEN t.n_truth > 0 THEN p.dcg / i.idcg ELSE 0 END AS ndcg,
            CASE WHEN t.n_truth > 0 THEN p.ap_num / t.n_truth ELSE 0 END
              AS map,
            CASE WHEN t.n_truth > 0
              THEN CAST(p.rel_at_k AS DOUBLE) / t.n_truth ELSE 0 END
              AS recall_$K
          FROM perq p JOIN tsz t USING (qid) LEFT JOIN idcg i USING (qid))
        SELECT round(avg(ndcg), 6) AS ndcg, round(avg(map), 6) AS map,
               round(avg(recall_$K), 6) AS recall_$K
        FROM meas""",
    "e03_metrics_macro" ->
      s"""$perQuerySql,
        raw AS (
          SELECT p.qid,
            CASE WHEN t.n_truth > 0 THEN p.dcg / i.idcg ELSE 0 END AS ndcg,
            CASE WHEN t.n_truth > 0 THEN p.ap_num / t.n_truth ELSE 0 END
              AS map,
            CASE WHEN t.n_truth > 0
              THEN CAST(p.rel_at_k AS DOUBLE) / t.n_truth ELSE 0 END
              AS recall_$K,
            CAST(p.rel_at_k AS DOUBLE) / $K AS precision_$K,
            p.mrr AS mrr
          FROM perq p JOIN tsz t USING (qid) JOIN idcg i USING (qid))
        SELECT round(avg(ndcg), 6) AS ndcg, round(avg(map), 6) AS map,
               round(avg(recall_$K), 6) AS recall_$K,
               round(avg(precision_$K), 6) AS precision_$K,
               round(avg(mrr), 6) AS mrr
        FROM raw""",
    "e05_query_synthesis" ->
      // Harness.syntheticQuery from first principles: distinct tokens
      // per doc, corpus document frequency, 5 rarest by (df, token),
      // space-joined in rank order; token-free docs yield no row
      """WITH toks AS (
            SELECT doc_id,
                   unnest(list_distinct(list_filter(
                     regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x != ''))) AS term
            FROM documents),
          dfreq AS (SELECT term, count(*) AS df FROM toks GROUP BY 1),
          ranked AS (
            SELECT t.doc_id, t.term,
                   row_number() OVER (PARTITION BY t.doc_id
                     ORDER BY f.df ASC, t.term ASC) AS rk
            FROM toks t JOIN dfreq f USING (term))
          SELECT doc_id, string_agg(term, ' ' ORDER BY rk) AS query
          FROM ranked WHERE rk <= 5 GROUP BY doc_id""",
    "e06_augment" ->
      // LocalAugmenter from first principles, as pure column math:
      // query = 5 longest distinct >3-char tokens by (-len, token) —
      // the sort rides a lpad(1000-len)||token key so a plain
      // list_sort produces the order; summary = the first non-empty
      // trimmed sentence piece, truncated to 160 chars
      """SELECT doc_id,
           array_to_string(list_transform(
             list_slice(list_sort(list_transform(
               list_distinct(list_filter(
                 regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                 x -> length(x) > 3)),
               x -> lpad(CAST(1000 - length(x) AS VARCHAR), 4, '0') || x)),
               1, 5),
             k -> substring(k, 5)), ' ') AS query,
           substring(coalesce(
             list_filter(list_transform(
               regexp_split_to_array(text, '[.!?\n]+'), y -> trim(y)),
               y -> y != '')[1], ''), 1, 160) AS summary
         FROM documents""",
    // e08: the judged-metric replay — e04's ranking + judgment CTEs at
    // depth 10, then Precision@k = rel-in-top-k / k, AP@k = mean of
    // cum_rel/rank AT the relevant positions within top k (0 if none),
    // MRR = 1/first-relevant-rank (0 if none)
    "e08_judged_metrics" ->
      s"""WITH $GtPrefixSql,
        ranked AS (SELECT qid, id, rel, rank FROM (
            SELECT q.qid, d.id,
                   CAST(2 * len(list_intersect(d.dt, q.qt)) >= len(q.qt)
                     AS INT) AS rel,
                   row_number() OVER (PARTITION BY q.qid
                     ORDER BY len(list_intersect(d.dt, q.qt)) DESC,
                              d.id ASC) AS rank
            FROM q CROSS JOIN d) WHERE rank <= $K),
        cum AS (SELECT qid, rel, rank,
                       sum(rel) OVER (PARTITION BY qid ORDER BY rank)
                         AS cum_rel
                FROM ranked),
        meas AS (SELECT qid,
            CAST(sum(CASE WHEN rank <= 3 THEN rel END) AS DOUBLE) / 3
              AS precision_3,
            coalesce(sum(CASE WHEN rel = 1 AND rank <= 3
                          THEN CAST(cum_rel AS DOUBLE) / rank END)
              / nullif(sum(CASE WHEN rank <= 3 THEN rel END), 0), 0)
              AS ap_3,
            CAST(sum(CASE WHEN rank <= 5 THEN rel END) AS DOUBLE) / 5
              AS precision_5,
            coalesce(sum(CASE WHEN rel = 1 AND rank <= 5
                          THEN CAST(cum_rel AS DOUBLE) / rank END)
              / nullif(sum(CASE WHEN rank <= 5 THEN rel END), 0), 0)
              AS ap_5,
            CAST(sum(CASE WHEN rank <= $K THEN rel END) AS DOUBLE) / $K
              AS precision_10,
            coalesce(sum(CASE WHEN rel = 1 AND rank <= $K
                          THEN CAST(cum_rel AS DOUBLE) / rank END)
              / nullif(sum(CASE WHEN rank <= $K THEN rel END), 0), 0)
              AS ap_10,
            coalesce(1.0 / min(CASE WHEN rel = 1 THEN rank END), 0) AS mrr
          FROM cum GROUP BY 1)
        SELECT qid, round(precision_3, 6) AS precision_3,
               round(ap_3, 6) AS ap_3,
               round(precision_5, 6) AS precision_5,
               round(ap_5, 6) AS ap_5,
               round(precision_10, 6) AS precision_10,
               round(ap_10, 6) AS ap_10,
               round(mrr, 6) AS mrr
        FROM meas ORDER BY qid""")
}
