package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.eval.Metrics
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

  private def ranked(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val qs = e.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val docs = e.select(col("vec_id").as("d_id"), col("embedding").as("dv"))
    Ann.knnJoin(qs, "q_id", "qv", docs, "d_id", "dv", Ann.L2, K)
      .select(col("q_id").as("qid"), col("d_id").cast("string").as("id"),
        col("rank"))
  }

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

  /** Macro-average over the query set (evaluate.py:44-48). */
  def metricsMacro(s: SparkSession, d: String): DataFrame =
    Metrics.macroAvg(Metrics.evaluate(ranked(s, d), truth(s, d), K))
      .select(
        round(col("ndcg"), 6).as("ndcg"),
        round(col("map"), 6).as("map"),
        round(col(s"recall_$K"), 6).as(s"recall_$K"),
        round(col(s"precision_$K"), 6).as(s"precision_$K"),
        round(col("mrr"), 6).as("mrr"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e02_metrics_knn" -> metricsKnn,
    "e03_metrics_macro" -> metricsMacro)

  /** Shared oracle CTE chain: ranked top-10 per query with binary
    * relevance, cumulative precision, per-query measures. */
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

  val oracles: Map[String, String] = Map(
    "e02_metrics_knn" ->
      s"$perQuerySql SELECT * FROM meas ORDER BY qid",
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
        FROM raw""")
}
