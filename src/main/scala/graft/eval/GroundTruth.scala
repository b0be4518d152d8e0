package graft.eval

import graft.core.Registry
import graft.core.Spec.{IdGen, TableDef}

/** A retrieved chunk handed to judges / metrics: (uid, text). */
final case class Retrieved(uid: String, text: String)

/** Persisted ground-truth query row (groundtruth.py:13-16). */
final case class GtQuery(uid: String, text: String, truth: Seq[String])

/** Relevance judge — the UMBRELA estimator's seat
  * (/root/reference/vechord/evaluate.py:159-208): scores (query, passage)
  * on 0–3; >= threshold counts as relevant (threshold default 2,
  * evaluate.py:169-173). [[OverlapJudge]] is the deterministic local
  * implementation so ground-truth tests never need a network. */
trait RelevanceJudge extends Serializable {
  def estimate(query: String, passage: String): Int
  def threshold: Int = 2
}

/** Token-overlap judge: 3 if the passage contains every query token,
  * else scaled by the matched fraction. */
final case class OverlapJudge() extends RelevanceJudge {
  def estimate(query: String, passage: String): Int = {
    val q = query.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSet
    if (q.isEmpty) 0
    else {
      val p = passage.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSet
      val frac = q.count(p).toDouble / q.size
      math.round(frac * 3).toInt
    }
  }
}

/** Judged-relevance metrics without stored truth — the UMBRELA
  * `evaluate_with_estimation` port (evaluate.py:210-231): judge each
  * passage, then Precision@K / AP@K (k ∈ kValues) and MRR over the
  * judged relevance list. */
object Judged {
  def evaluateWithEstimation(query: String, passages: Seq[String],
                             judge: RelevanceJudge,
                             kValues: Seq[Int] = Seq(3, 5, 10)):
      Map[String, Double] = {
    require(query.nonEmpty && passages.exists(_.strip.nonEmpty),
      "Query must be non-empty and passages must contain at least one " +
        "non-empty string.")
    val isRel = passages.map(p => judge.estimate(query, p) >= judge.threshold)
    val base = kValues.filter(k => k > 0 && k <= isRel.length).flatMap { k =>
      val topK = isRel.take(k)
      Seq(
        s"precision@$k" -> topK.count(identity).toDouble / k,
        s"AP@$k" -> Metrics.avgPrecisionAtRelevant(topK))
    }
    (base :+ ("MRR" -> isRel.zipWithIndex.collectFirst {
      case (true, i) => 1.0 / (i + 1)
    }.getOrElse(0.0))).toMap
  }
}

/** Ground-truth generation + evaluation
  * (/root/reference/vechord/groundtruth.py:28-127): run queries through a
  * retrieve function, judge the returned chunks, persist per-query truth
  * id lists; later re-run retrieval and macro-average ndcg / map /
  * recall@k against the stored truth.
  */
final class GroundTruth(name: String, reg: Registry) {

  val queryDef: TableDef[GtQuery] = {
    implicit val enc: org.apache.spark.sql.Encoder[GtQuery] =
      org.apache.spark.sql.Encoders.product[GtQuery]
    TableDef[GtQuery](s"${name}_query", primaryKey = Some("uid"),
      idGen = IdGen.UuidV7)
  }
  reg.register(queryDef)

  /** Judge each retrieved chunk; keep uids with score >= threshold,
    * ordered exactly like the reference (sorted by (score, position)
    * ascending — groundtruth.py:90-96); persist one row per query. */
  def generate(queries: Seq[String], retrieve: String => Seq[Retrieved],
               judge: RelevanceJudge): Unit = {
    val rows = queries.map { q =>
      val chunks = retrieve(q).toIndexedSeq
      val scored = chunks.zipWithIndex.map { case (c, i) =>
        (judge.estimate(q, c.text), i)
      }
      val indices = scored.filter(_._1 >= judge.threshold).sorted.map(_._2)
      GtQuery("", q, indices.map(i => chunks(i).uid))
    }
    reg.insert(queryDef, rows)
  }

  /** Macro-averaged (ndcg, map, recall@topk) over the stored queries
    * (groundtruth.py:104-127). */
  def evaluate(retrieve: String => Seq[Retrieved],
               topk: Int = 10): Map[String, Double] = {
    val queries = reg.table(queryDef).as[GtQuery](queryDef.enc).collect()
    require(queries.nonEmpty, "no ground-truth queries stored")
    val per = queries.map { q =>
      val ranked = retrieve(q.text).map(_.uid)
      Metrics.evaluateOne(q.truth.toSet, ranked, topk)
    }
    Seq("ndcg", "map", s"recall_$topk").map { m =>
      m -> per.map(_(m)).sum / per.length
    }.toMap
  }
}
