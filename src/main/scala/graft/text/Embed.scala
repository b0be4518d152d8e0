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
    text.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").filter(_.nonEmpty)

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

/** Engine-portable deterministic embedder: md5-derived feature hashing
  * over uni+bigrams, accumulating UNNORMALIZED ±1 integer counts. Every
  * component is a small integer — exactly representable in float — so
  * dot products and squared norms are EXACT in double arithmetic and
  * any SQL engine reproduces cosine distances bit-for-bit. Recipe per
  * feature f: h = first 8 hex chars of md5(f) as a 32-bit value
  * (`('0x' || substring(md5(f), 1, 8))::BIGINT` in DuckDB), bucket =
  * (h/2) mod dim, sign = +1 if h even else -1. Cosine-equivalent to an
  * L2-normalized variant (normalization cancels in cosine); slower
  * than [[HashEmbedder]] (one md5 per feature) — its purpose is
  * letting an external oracle gate a full chunk→embed→search loop. */
final case class Md5Embedder(dim: Int = 64) extends Embedder {

  def name: String = s"md5_emb_$dim"

  // MessageDigest is stateful and not thread-safe; one per task thread
  @transient private lazy val md =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private def tokens(text: String): Array[String] =
    text.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").filter(_.nonEmpty)

  def embedChunk(text: String): Array[Float] = {
    val v = new Array[Int](dim)
    val ts = tokens(text)
    val feats = ts.iterator ++
      ts.iterator.sliding(2).withPartial(false).map(_.mkString(" "))
    val d = md.get()
    feats.foreach { f =>
      d.reset()
      val b = d.digest(f.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var i = 0
      while (i < 4) { h = (h << 8) | (b(i) & 0xffL); i += 1 }
      val bucket = ((h >>> 1) % dim).toInt
      v(bucket) += (if ((h & 1L) == 0L) 1 else -1)
    }
    v.map(_.toFloat)
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
