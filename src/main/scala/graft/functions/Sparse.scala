package graft.functions

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sparse embeddings — the reference's SpladePP client surface
  * (/root/reference/vechord/embedding.py:413-441, model struct
  * `SparseEmbedding{dim,indices,values}` at model/internal.py:43-46) with
  * a deterministic local producer and a column-level dot-product scorer.
  */
final case class SparseVec(indices: Seq[Int], values: Seq[Float])

trait SparseEmbedder extends Serializable {
  def name: String
  def dim: Int
  def embed(text: String): SparseVec
}

/** Deterministic sparse embedder: token → murmur3 bucket, value = tf,
  * indices sorted ascending. */
final case class HashSparseEmbedder(dim: Int = 1 << 16, seed: Int = 7)
  extends SparseEmbedder {
  def name: String = s"hash_sparse_${dim}_$seed"
  def embed(text: String): SparseVec = {
    val counts = scala.collection.mutable.TreeMap[Int, Float]()
    text.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").filter(_.nonEmpty).foreach { t =>
      val b = math.floorMod(MurmurHash3.stringHash(t, seed), dim)
      counts(b) = counts.getOrElse(b, 0f) + 1f
    }
    SparseVec(counts.keys.toSeq, counts.values.toSeq)
  }
}

object Sparse {

  /** Dot product of two sparse (indices, values) column pairs: for each
    * position of `ai`, look up its index in `bi` (arrays are small —
    * tens of non-zeros — so the per-row scan beats building maps).
    * Pure column math, codegen-friendly. */
  def sparseDot(ai: Column, av: Column, bi: Column, bv: Column): Column =
    aggregate(
      zip_with(ai, av, (i, v) => struct(i.as("i"), v.as("v"))),
      lit(0.0),
      (acc, s) => {
        val pos = array_position(bi, s.getField("i"))
        acc + when(pos > 0,
          s.getField("v").cast("double") *
            element_at(bv, pos.cast("int")).cast("double"))
          .otherwise(0.0)
      })
}
