package graft.eval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-quality metrics — native ports of the reference's
  * pytrec_eval usage and hand-rolled formulas
  * (/root/reference/vechord/evaluate.py:22-86 `evaluate`/`evaluate_one`/
  * `calculate_avg_precision`/`calculate_mrr`, :210-231
  * `evaluate_with_estimation`, examples/anthropic.py:205-225 Pass@K).
  *
  * Binary relevance throughout (the reference assigns gain 1 to every
  * truth id). Two AP variants exist in the reference and both are here:
  * trec MAP (divide by |truth|) and the `calculate_avg_precision` form
  * (divide by #relevant-retrieved).
  */
object Metrics {

  private def log2(x: Double): Double = math.log(x) / math.log(2.0)

  /** NDCG over the full ranking: DCG = Σ_rel 1/log2(rank+1); IDCG over
    * the ideal ranking of ALL |truth| relevant docs (pytrec_eval ndcg). */
  def ndcg(truth: Set[String], ranked: Seq[String]): Double =
    if (truth.isEmpty) 0.0
    else {
      val dcg = ranked.iterator.zipWithIndex
        .collect { case (id, i) if truth(id) => 1.0 / log2(i + 2.0) }.sum
      val idcg = (1 to truth.size).map(i => 1.0 / log2(i + 1.0)).sum
      dcg / idcg
    }

  /** trec MAP: Σ_{relevant at rank r} precision(r) / |truth|. */
  def averagePrecision(truth: Set[String], ranked: Seq[String]): Double =
    if (truth.isEmpty) 0.0
    else {
      var rel = 0
      var s = 0.0
      ranked.iterator.zipWithIndex.foreach { case (id, i) =>
        if (truth(id)) { rel += 1; s += rel.toDouble / (i + 1) }
      }
      s / truth.size
    }

  /** `calculate_avg_precision` (evaluate.py:68-78): mean of precision at
    * the relevant positions; 0 when nothing relevant. */
  def avgPrecisionAtRelevant(isRelevant: Seq[Boolean]): Double = {
    var rel = 0
    val precs = isRelevant.zipWithIndex.collect {
      case (true, i) => rel += 1; rel.toDouble / (i + 1)
    }
    if (precs.isEmpty) 0.0 else precs.sum / precs.length
  }

  /** Recall@k = |truth ∩ top-k| / |truth|. */
  def recallAt(truth: Set[String], ranked: Seq[String], k: Int): Double =
    if (truth.isEmpty) 0.0
    else ranked.take(k).count(truth).toDouble / truth.size

  /** Precision@k = relevant-in-top-k / k. */
  def precisionAt(truth: Set[String], ranked: Seq[String], k: Int): Double =
    if (k <= 0) 0.0 else ranked.take(k).count(truth).toDouble / k

  /** MRR = 1 / rank of first relevant, 0 if none (evaluate.py:80-86). */
  def mrr(truth: Set[String], ranked: Seq[String]): Double =
    ranked.iterator.zipWithIndex.collectFirst {
      case (id, i) if truth(id) => 1.0 / (i + 1)
    }.getOrElse(0.0)

  /** Pass@K (anthropic.py:211-221): share of golden ids found in the
    * top-k — identical to recall@k under binary truth. */
  def passAt(truth: Set[String], ranked: Seq[String], k: Int): Double =
    recallAt(truth, ranked, k)

  /** `evaluate_one` twin: the standard measure bundle for one query. */
  def evaluateOne(truth: Set[String], ranked: Seq[String],
                  k: Int = 10): Map[String, Double] = Map(
    "ndcg" -> ndcg(truth, ranked),
    "map" -> averagePrecision(truth, ranked),
    s"recall_$k" -> recallAt(truth, ranked, k),
    "mrr" -> mrr(truth, ranked))

  /** Distributed per-query evaluation. `results` = (qid, id, rank 1-based),
    * `truth` = (qid, id); returns one row per qid with ndcg / map /
    * recall_k / precision_k / mrr. One shuffle per input (the join and the
    * qid aggregation), map-side combinable. */
  def evaluate(results: DataFrame, truth: DataFrame, k: Int = 10): DataFrame = {
    val truthSz = truth.groupBy("qid").agg(count(lit(1)).as("n_truth"))
    val marked = results
      .join(truth.withColumn("rel", lit(1)), Seq("qid", "id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0)))
    val w = Window.partitionBy("qid").orderBy(col("rank").asc)
    val cum = marked.withColumn("cum_rel", sum(col("rel")).over(w))
      .withColumn("prec", col("cum_rel").cast("double") / col("rank"))
    val perQ = cum.groupBy("qid").agg(
      sum(when(col("rel") === 1, lit(1.0) / log2(col("rank") + 1.0))
        .otherwise(0.0)).as("dcg"),
      sum(when(col("rel") === 1, col("prec")).otherwise(0.0)).as("ap_num"),
      sum(when(col("rel") === 1 && col("rank") <= k, 1).otherwise(0))
        .as(s"rel_at_k"),
      max(when(col("rel") === 1, lit(1.0) / col("rank")).otherwise(0.0))
        .as("mrr"))
    perQ.join(truthSz, Seq("qid"), "left")
      .withColumn("n_truth", coalesce(col("n_truth"), lit(0L)))
      .withColumn("idcg",
        aggregate(sequence(lit(1), col("n_truth").cast("int")), lit(0.0),
          (acc, i) => acc + lit(1.0) / log2(i.cast("double") + 1.0)))
      .select(
        col("qid"),
        when(col("n_truth") > 0, col("dcg") / col("idcg")).otherwise(0.0)
          .as("ndcg"),
        when(col("n_truth") > 0, col("ap_num") / col("n_truth"))
          .otherwise(0.0).as("map"),
        when(col("n_truth") > 0,
          col("rel_at_k").cast("double") / col("n_truth")).otherwise(0.0)
          .as(s"recall_$k"),
        (col("rel_at_k").cast("double") / k).as(s"precision_$k"),
        col("mrr"))
  }

  /** Macro-average of [[evaluate]]'s per-query rows (evaluate.py:44-48). */
  def macroAvg(perQuery: DataFrame): DataFrame = {
    val cols = perQuery.columns.filterNot(_ == "qid")
    perQuery.agg(
      avg(col(cols.head)).as(cols.head),
      cols.tail.map(c => avg(col(c)).as(c)): _*)
  }

  private def log2(c: Column): Column = log(c) / math.log(2.0)

  /** Deterministic paired permutation (sign-flip) test: is system A's
    * per-query metric different from system B's beyond chance? The
    * statistic is the mean per-query difference d̄; each of the `b`
    * replicates flips every query's diff sign by the md5 parity bit
    * md5(r:qid)₃₂ mod 2 (RNG-free, engine-replayable), and the
    * two-sided add-one p-value is (1 + #{r : |mean_r| ≥ |d̄|})/(b+1).
    * Replicate means and d̄ round to 9 before the comparison so engine
    * float drift re-synchronizes. Both inputs must carry the dense
    * qid grid 0..n−1 (the evaluate() shape).
    *
    * Scale shape: the flip grid is b·n generated rows joined once
    * against the n-row diff frame; everything downstream is bounded
    * by `b`, never by data. */
  /** Cohen's kappa between two binary judgments over the same items —
    * the inter-judge agreement statistic an eval pipeline reports
    * before trusting relevance labels: chance-corrected agreement
    * κ = (p_o − p_e)/(1 − p_e) with p_e the marginal-product chance
    * rate. Emits the full contingency table next to κ — (n, n11,
    * n10, n01, n00, kappa) — so the four integer cells pin the whole
    * computation and the one float is auditable. κ is NULL when
    * p_e = 1 (a constant judge pair — agreement is undefined, not
    * 1.0). All-integer until the single final expression; the
    * marginals divide by n as doubles in a fixed order so any engine
    * replays the value.
    *
    * Scale shape: ONE combinable aggregation over the items frame —
    * four conditional counts and a count; everything after is one
    * row. */
  def cohenKappa(items: DataFrame, aCol: String, bCol: String,
                 roundTo: Int = 6): DataFrame = {
    def cell(a: Int, b: Int) =
      sum(when(col(aCol) === a && col(bCol) === b, 1L).otherwise(0L))
    val n = col("n").cast("double")
    val po = (col("n11") + col("n00")) / n
    val pa = (col("n11") + col("n10")) / n
    val pb = (col("n11") + col("n01")) / n
    items.agg(count(lit(1)).as("n"), cell(1, 1).as("n11"),
        cell(1, 0).as("n10"), cell(0, 1).as("n01"), cell(0, 0).as("n00"))
      .withColumn("__pe",
        pa * pb + (lit(1.0) - pa) * (lit(1.0) - pb))
      .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        when(lit(1.0) - col("__pe") =!= 0.0,
          round((po - col("__pe")) / (lit(1.0) - col("__pe")), roundTo))
          .otherwise(lit(null).cast("double")).as("kappa"))
  }

  def pairedPermutation(perA: DataFrame, perB: DataFrame, idCol: String,
                        metricCol: String, n: Int, b: Int = 200,
                        roundTo: Int = 6): DataFrame = {
    require(n > 0 && b > 1,
      s"pairedPermutation needs n>0, b>1 (got n=$n b=$b)")
    val spark = perA.sparkSession
    val diffs = perA.select(col(idCol).cast("long").as(idCol),
        col(metricCol).as("__a"))
      .join(perB.select(col(idCol).cast("long").as(idCol),
        col(metricCol).as("__b")), idCol)
      .select(col(idCol), col("__a"), col("__b"),
        (col("__a") - col("__b")).as("diff"))
    val obs = diffs.agg(
      round(avg(col("__a")), roundTo).as("mean_a"),
      round(avg(col("__b")), roundTo).as("mean_b"),
      round(avg(col("diff")), 9).as("dbar"))
    val flips = spark.range(b.toLong * n)
      .withColumn("rs", expr(s"id div $n"))
      .withColumn(idCol, expr(s"id % $n"))
      .withColumn("sgn", lit(1) - lit(2) *
        (conv(substring(md5(concat_ws(":", col("rs"), col(idCol))), 1, 8),
          16, 10).cast("long") % 2))
    val means = flips.join(diffs.select(col(idCol), col("diff")), idCol)
      .groupBy("rs").agg(round(avg(col("sgn") * col("diff")), 9).as("m"))
    val cnt = means.crossJoin(obs.select(col("dbar").as("__d")))
      .filter(abs(col("m")) >= abs(col("__d")))
      .agg(count(lit(1)).as("ge"))
    obs.crossJoin(cnt).select(col("mean_a"), col("mean_b"),
      round(col("dbar"), roundTo).as("diff"),
      round((col("ge") + 1).cast("double") / (b + 1), roundTo)
        .as("p_value"))
  }

  /** Deterministic bootstrap confidence interval for a per-query
    * metric — the error bar an eval report should carry, with NO RNG:
    * resample `b` replicates of the `n` queries with replacement,
    * draw j of replicate r picking the query ranked
    * md5(r:j)₃₂ mod n (the engine-portable 32-bit grid
    * [[graft.ops.Sampling.hashUnit]] uses), mean each replicate, and
    * take the empirical percentile CI by EXPLICIT rank selection
    * (rank floor(α/2·b)+1 and b−floor(α/2·b) of the (mean, replicate)
    * ordering) — no interpolating-percentile ambiguity across
    * engines. `perQuery`'s ids must be the dense ranks 0..n−1 (the
    * evaluate() qid shape). Replicate means round to 9 so engine
    * float drift re-synchronizes before the rank selection.
    *
    * Scale shape: draws are b·n generated rows joined once against
    * the per-query frame; the only window runs over the b replicate
    * means — bounded by `b`, never by data. */
  def bootstrapCi(perQuery: DataFrame, idCol: String, metricCol: String,
                  n: Int, b: Int = 200, alpha: Double = 0.05,
                  roundTo: Int = 6): DataFrame = {
    require(n > 0 && b > 1 && alpha > 0 && alpha < 1,
      s"bootstrapCi needs n>0, b>1, 0<alpha<1 (got n=$n b=$b a=$alpha)")
    val spark = perQuery.sparkSession
    val draws = spark.range(b.toLong * n)
      .withColumn("rs", expr(s"id div $n"))
      .withColumn("j", expr(s"id % $n"))
      .withColumn(idCol,
        conv(substring(md5(concat_ws(":", col("rs"), col("j"))), 1, 8),
          16, 10).cast("long") % n)
    val means = draws
      .join(perQuery.select(col(idCol).cast("long").as(idCol),
        col(metricCol)), idCol)
      .groupBy("rs").agg(round(avg(col(metricCol)), 9).as("m"))
    val w = Window.orderBy(col("m").asc, col("rs").asc)
    val rk = means.withColumn("rk", row_number().over(w))
    val loRk = math.floor(alpha / 2 * b).toInt + 1
    val hiRk = b - math.floor(alpha / 2 * b).toInt
    perQuery.agg(round(avg(col(metricCol)), roundTo).as("mean"))
      .crossJoin(rk.filter(col("rk") === loRk)
        .select(round(col("m"), roundTo).as("ci_lo")))
      .crossJoin(rk.filter(col("rk") === hiRk)
        .select(round(col("m"), roundTo).as("ci_hi")))
  }
}
