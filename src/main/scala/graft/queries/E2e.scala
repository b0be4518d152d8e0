package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Ann
import graft.text.{Embed, HashEmbedder, RegexChunker}
import Tables._

/** End-to-end ingest→search flow — the reference's `examples/simple.py`
  * shape: load documents, chunk (RegexChunker), embed (deterministic
  * local embedder), then answer a dense top-k query over the chunks.
  * Not SQL-expressible (feature-hash embedding) → rows-only entry.
  */
object E2e {

  val ChunkSize = 200
  val ChunkOverlap = 40
  val Dim = 64
  val Query = "spark filter join"

  def ingestSearch(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val chunker = RegexChunker(size = ChunkSize, overlap = ChunkOverlap)
    val emb = HashEmbedder(dim = Dim)
    val chunks = documents(s, d).select("doc_id", "text")
      .repartition(s.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        chunker.segment(t).zipWithIndex.map { case (c, i) =>
          (id * 1000 + i, id, c)
        }
      }
      .toDF("chunk_id", "doc_id", "body")
    val embedded = Embed.withEmbedding(chunks, "body", "vec", emb)
    Ann.topK(embedded, "chunk_id", "vec",
        Embed.queryVec(emb, Query), Ann.Cosine, 10)
      .select("chunk_id", "doc_id", "dist")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e01_ingest_search" -> ingestSearch)

  val oracles: Map[String, String] = Map.empty
}
