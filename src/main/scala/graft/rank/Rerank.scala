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
    val q = query.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSet
    docs.zipWithIndex
      .map { case (d, i) =>
        val toks = d.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSet
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

  /** Apply a reranker to a ranked list frame (id, text, rank): collects
    * the (small, already top-k) list, queries the reranker once, joins
    * the permutation back — the distributed form of `reorder`
    * (web.py:95-96). Returns (id, text, rank) re-ranked. */
  def apply(ranked: DataFrame, idCol: String, textCol: String,
            query: String, reranker: Reranker): DataFrame = {
    val spark = ranked.sparkSession
    import spark.implicits._
    val rows = ranked.select(col(idCol).cast("string"), col(textCol))
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
