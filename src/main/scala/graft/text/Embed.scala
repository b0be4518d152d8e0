package graft.text

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, udf}

/** Embedding providers — the reference's `BaseEmbedding` family
  * (/root/reference/vechord/embedding.py:31-76: `name`, `get_dim`,
  * `vectorize_chunk` vs `vectorize_query`) behind one trait.
  *
  * [[HashEmbedder]] is the deterministic LOCAL implementation (the role
  * spaCy's small model plays in the reference's tests,
  * embedding.py:79-111): feature-hashed uni+bigrams with signed weights,
  * L2-normalized. No network, bit-stable across runs/JVMs — every
  * ingest→search correctness test runs on it. HTTP providers (Gemini /
  * Jina / OpenAI / Voyage, embedding.py:114-441) would implement the same
  * trait behind a rate-limited mapPartitions stage; they are interface
  * parity only (zero-egress environment).
  */
trait Embedder extends Serializable {
  def name: String
  def dim: Int
  /** Document-side embedding (`vectorize_chunk`). */
  def embedChunk(text: String): Array[Float]
  /** Query-side embedding (`vectorize_query`); defaults to the chunk
    * embedding like the reference (embedding.py:70-76). */
  def embedQuery(text: String): Array[Float] = embedChunk(text)
}

/** Deterministic feature-hashing embedder: murmur3-bucketed unigrams and
  * bigrams with hash-signed weights, L2-normalized to the unit sphere. */
final case class HashEmbedder(dim: Int = 64, seed: Int = 42)
  extends Embedder {

  def name: String = s"hash_emb_${dim}_$seed"

  private def tokens(text: String): Array[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  def embedChunk(text: String): Array[Float] = {
    val v = new Array[Double](dim)
    val ts = tokens(text)
    val feats = ts.iterator ++
      ts.iterator.sliding(2).withPartial(false).map(_.mkString(" "))
    feats.foreach { f =>
      val h = MurmurHash3.stringHash(f, seed)
      val bucket = math.floorMod(h, dim)
      val sign = if (((h >>> 16) & 1) == 0) 1.0 else -1.0
      v(bucket) += sign
    }
    val norm = math.sqrt(v.map(x => x * x).sum)
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      out(i) = if (norm > 0) (v(i) / norm).toFloat else 0f
      i += 1
    }
    out
  }
}

object Embed {
  /** Frame-level embedding stage: adds `outCol` = embedder(textCol).
    * (A UDF by necessity — the hash math has no builtin form; it is a
    * map-only stage, so no shuffle is introduced.) */
  def withEmbedding(df: DataFrame, textCol: String, outCol: String,
                    e: Embedder): DataFrame = {
    val f = udf((s: String) => if (s == null) null else e.embedChunk(s))
    df.withColumn(outCol, f(col(textCol)))
  }

  /** Query vector as a column literal. */
  def queryVec(e: Embedder, text: String): Column =
    org.apache.spark.sql.functions.typedlit(e.embedQuery(text).toSeq)
}
