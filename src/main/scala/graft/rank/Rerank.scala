package graft.rank

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rerankers — the reference's cross-encoder seat
  * (/root/reference/vechord/rerank.py:28-92: Cohere/Jina HTTP rerankers
  * returning permutation indices) + the `reorder` application
  * (model/web.py:95-96).
  *
  * HTTP providers are interface parity only (zero-egress);
  * [[OverlapReranker]] is the deterministic local implementation used by
  * tests and the dynamic pipeline.
  */
trait Reranker extends Serializable {
  def name: String
  /** Returns the permutation: positions into `docs`, best first
    * (rerank.py:28-63 contract). */
  def rerank(query: String, docs: Seq[String]): Seq[Int]
}

/** Multimodal reranker seat (rerank.py:66-92's `rerank_multimodal`:
  * Jina scores text queries against image documents). */
trait MultimodalReranker extends Reranker {
  /** Permutation over binary (image/media) docs, best first. */
  def rerankMultimodal(query: String, docs: Seq[Array[Byte]]): Seq[Int]
}

/** Token-overlap cross-scorer: rank docs by |query ∩ doc| tokens desc,
  * ties by original position (stable). The multimodal side scores media
  * payloads by cosine between byte-histogram features and the query
  * text's own byte histogram — deterministic, codec-backed
  * ([[graft.multimodal.FakeCodec]] per the stub contract). */
final case class OverlapReranker() extends MultimodalReranker {
  def name: String = "overlap_rerank"
  def rerank(query: String, docs: Seq[String]): Seq[Int] = {
    val q = query.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").filter(_.nonEmpty).toSet
    docs.zipWithIndex
      .map { case (d, i) =>
        val toks = d.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").filter(_.nonEmpty).toSet
        (-toks.count(q), i)
      }
      .sorted.map(_._2)
  }
  def rerankMultimodal(query: String, docs: Seq[Array[Byte]]): Seq[Int] = {
    val codec = graft.multimodal.FakeCodec()
    def norm(v: Array[Float]): Double = math.sqrt(v.map(x => x * x.toDouble).sum)
    val qf = codec.features(query.getBytes("UTF-8"))
    val qn = norm(qf)
    docs.zipWithIndex.map { case (d, i) =>
      val f = codec.features(d)
      val dn = norm(f)
      val cos =
        if (qn == 0 || dn == 0) 0.0
        else qf.zip(f).map { case (a, b) => a * b.toDouble }.sum / (qn * dn)
      (-cos, i)
    }.sorted.map(_._2)
  }
}

object Rerank {

  /** Greedy Maximal Marginal Relevance (Carbonell & Goldstein 1998)
    * over one candidate list: picks argmax of
    * λ·rel(d) − (1−λ)·max_{s∈picked} cos(d, s), ties by id asc; the
    * first pick is pure relevance. Returns (id, mmrScore) in pick
    * order, scores rounded for cross-engine determinism. */
  def mmrSelect(cands: Seq[(Long, Array[Double], Double)], k: Int,
                lambda: Double): Seq[(Long, Double)] = {
    def norm(v: Array[Double]): Double = math.sqrt(v.map(x => x * x).sum)
    val withNorm = cands.map { case (id, v, rel) => (id, v, rel, norm(v)) }
    def cos(a: (Long, Array[Double], Double, Double),
            b: (Long, Array[Double], Double, Double)): Double =
      if (a._4 == 0 || b._4 == 0) 0.0
      else {
        var s = 0.0; var i = 0
        while (i < a._2.length && i < b._2.length) {
          s += a._2(i) * b._2(i); i += 1
        }
        s / (a._4 * b._4)
      }
    val picked = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Array[Double], Double, Double)]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val rest = scala.collection.mutable.ArrayBuffer(withNorm: _*)
    while (out.length < k && rest.nonEmpty) {
      var bestIdx = 0
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < rest.length) {
        val d = rest(i)
        val maxSim =
          if (picked.isEmpty) 0.0 else picked.map(cos(d, _)).max
        val s = lambda * d._3 - (1 - lambda) * maxSim
        // strictly-greater + id-asc tiebreak = deterministic pick order
        if (s > bestScore ||
            (s == bestScore && d._1 < rest(bestIdx)._1)) {
          bestScore = s; bestIdx = i
        }
        i += 1
      }
      val d = rest.remove(bestIdx)
      picked += d
      out += ((d._1, math.rint(bestScore * 1e6) / 1e6))
    }
    out.toSeq
  }

  /** MMR over per-query candidate groups — the DISTRIBUTED diversify
    * step: candidates (already top-N per query from an ANN/BM25 stage)
    * group by query id, each group runs the greedy selection inside its
    * executor via flatMapGroups (no driver collect, one shuffle on the
    * query id — at 100 TB the group is top-N-bounded, so state per key
    * is O(N·dim), never corpus-sized). Returns (qid, id, mmr_rank,
    * mmr_score). */
  def mmrBatch(candidates: DataFrame, qidCol: String, idCol: String,
               vecCol: String, scoreCol: String, k: Int,
               lambda: Double = 0.7): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    candidates
      .select(col(qidCol).cast("long"), col(idCol).cast("long"),
        col(vecCol).cast("array<double>"), col(scoreCol).cast("double"))
      .as[(Long, Long, Seq[Double], Double)]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        // relevance-desc, id-asc presort: greedy input order is stable
        val cands = it.map(t => (t._2, t._3.toArray, t._4)).toSeq
          .sortBy(t => (-t._3, t._1))
        mmrSelect(cands, k, lambda).zipWithIndex.map {
          case ((id, s), r) => (qid, id, r + 1, s)
        }
      }
      .toDF(qidCol, idCol, "mmr_rank", "mmr_score")
  }

  /** Single-list MMR: [[mmrBatch]] degenerated to one group. */
  def mmr(candidates: DataFrame, idCol: String, vecCol: String,
          scoreCol: String, k: Int, lambda: Double = 0.7): DataFrame =
    mmrBatch(candidates.withColumn("__q", lit(0L)), "__q", idCol,
      vecCol, scoreCol, k, lambda).drop("__q")

  /** Apply a reranker to a ranked list frame (id, text, rank): collects
    * the (small, already top-k) list, queries the reranker once, joins
    * the permutation back — the distributed form of `reorder`
    * (web.py:95-96). Returns (id, text, rank) re-ranked. */
  def apply(ranked: DataFrame, idCol: String, textCol: String,
            query: String, reranker: Reranker): DataFrame = {
    val spark = ranked.sparkSession
    import spark.implicits._
    // re-assert the incoming order before collecting: rerankers break
    // ties by INPUT position, and a caller's join upstream (e.g. the
    // dynamic search flow's text join) does not preserve row order.
    // `rank` alone is NOT a total key after a fused union — dedupUnion
    // output carries per-source ranks (vec src=0 and bm25 src=1 both
    // hold ranks 1..k), so equal-rank rows across src would still land
    // in partition-dependent relative order. Sort by the caller's full
    // canonical key: (src, rank) when a src column is present — the
    // same order dedupUnion itself emits — else rank with an id-asc
    // tiebreak for callers whose rank is already unique.
    val orderKey =
      if (ranked.columns.contains("src"))
        Seq(col("src").asc, col("rank").asc)
      else Seq(col("rank").asc, col(idCol).cast("string").asc)
    val rows = ranked.orderBy(orderKey: _*)
      .select(col(idCol).cast("string"), col(textCol))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val perm = reranker.rerank(query, rows.map(_._2).toSeq)
    val order = perm.zipWithIndex.map { case (pos, newRank) =>
      (rows(pos)._1, newRank + 1)
    }.toDF("__id", "rank")
    ranked.drop("rank")
      .join(order, col(idCol).cast("string") === col("__id"))
      .drop("__id")
      .orderBy(col("rank").asc)
  }
}
