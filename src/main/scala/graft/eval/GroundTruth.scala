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
    val q = query.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").filter(_.nonEmpty).toSet
    if (q.isEmpty) 0
    else {
      val p = passage.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").filter(_.nonEmpty).toSet
      val frac = q.count(p).toDouble / q.size
      math.round(frac * 3).toInt
    }
  }
}

/** UMBRELA judge over the Gemini generateContent completer — the wire
  * form of the seat (evaluate.py:159-208 `GeminiUMBRELAEvaluator`):
  * the reference's 0–3 Bing RELevance Assessor prompt
  * (evaluate.py:122-151, arXiv:2406.06519) plus its Query/Passage
  * field block, a structured `{"score": int}` response requested via
  * `response_json_schema` (evaluate.py:186-189
  * `from_prompt_structure_response`), empty passage short-circuits to
  * 0 (evaluate.py:184-185) and an unparseable response fails loudly
  * (evaluate.py:203-208) rather than silently scoring 0. */
final case class UmbrelaJudge(completer: graft.providers.GeminiCompleter,
                              override val threshold: Int = 2)
  extends RelevanceJudge {

  def estimate(query: String, passage: String): Int = {
    if (passage == null || passage.isEmpty) return 0
    val resp = completer.complete(
      UmbrelaJudge.Prompt + s"\nQuery: $query\nPassage: $passage\n",
      responseJsonSchema = Some(UmbrelaJudge.ScoreSchema))
    org.json4s.jackson.JsonMethods.parse(resp) \ "score" match {
      case org.json4s.JInt(i) => i.toInt
      case other => throw new IllegalStateException(
        s"failed to decode UMBRELA score from response: $resp ($other)")
    }
  }
}

object UmbrelaJudge {
  /** The reference's UMBRELA prompt, verbatim (evaluate.py:122-147 —
    * itself from the UMBRELA paper's appendix, arXiv:2406.06519). */
  val Prompt: String = """Given a query and a passage, you must provide a score on an
integer scale of 0 to 3 with the following meanings:
0 = represent that the passage has nothing to do with the query,
1 = represents that the passage seems related to the query but
does not answer it,
2 = represents that the passage has some answer for the query,
but the answer may be a bit unclear, or hidden amongst extraneous
information and
3 = represents that the passage is dedicated to the query and
contains the exact answer.
Important Instruction: Assign category 1 if the passage is
somewhat related to the topic but not completely, category 2 if
passage presents something very important related to the entire
topic but also has some extra information and category 3 if the
passage only and entirely refers to the topic. If none of the
above satisfies give it category 0.
Split this problem into steps:
Consider the underlying intent of the search.
Measure how well the content matches a likely intent of the query (M).
Measure how trustworthy the passage is (T).
Consider the aspects above and the relative importance of each,
and decide on a final score (O). Final score must be an integer.
Do not provide any code in result. Provide each score in the
format of: a single integer without any reasoning.
"""

  /** msgspec.json.schema(UMBRELAScore) twin: one required int field. */
  val ScoreSchema: String =
    """{"type":"object","properties":{"score":{"type":"integer"}},""" +
      """"required":["score"]}"""
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
