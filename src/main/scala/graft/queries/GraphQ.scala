package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Registry
import graft.graph.{Graph, VocabRecognizer}
import graft.text.HashEmbedder
import Tables._

/** Graph-retrieval queries over entities/relations extracted from the
  * `documents` table — the reference's `graph_insert` merge-upsert
  * (/root/reference/vechord/pipeline.py:345-392) and 2-hop
  * `graph_search` (pipeline.py:444-487).
  *
  * g01 is oracle-gated: the [[VocabRecognizer]] entity rule (gazetteer
  * terms, deduped per chunk) is SQL-expressible, so DuckDB recomputes
  * the post-merge entity table's (text, n_chunks) directly from the raw
  * text. g02 (the full 2-hop search over hash embeddings) is not
  * SQL-expressible → rows-only.
  */
object GraphQ {

  /** Gazetteer for the synthetic corpus (all-lowercase word salad). */
  val Vocab = Seq("spark", "table", "join", "filter", "window", "vector",
    "stream", "shuffle", "partition", "query")

  private def recognizer = VocabRecognizer(Vocab)

  /** Graph build memoized per corpus dir: the reference builds the graph
    * once at ingest (pipeline.py:332-342) and serves many searches from
    * it — rebuilding per query would misrepresent the read path. */
  private val built =
    scala.collection.concurrent.TrieMap[String, (Registry, DataFrame)]()

  private def buildGraph(s: SparkSession, d: String):
      (Registry, DataFrame) = built.getOrElseUpdate(d, buildGraphUncached(s, d))

  private def buildGraphUncached(s: SparkSession, d: String):
      (Registry, DataFrame) = {
    val reg = new Registry(s,
      Files.createTempDirectory("graft_graph").toString)
    val (entDef, relDef) = (Graph.entityDef(), Graph.relationDef())
    reg.register(entDef, relDef)
    val chunks = documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("text"))
    val emb = HashEmbedder(dim = 32)
    val (ents, rels) = Graph.extractFromChunks(s, chunks, "doc_id", "text",
      recognizer)
    reg.runTxn { txn =>
      Graph.mergeInsertEntities(reg, entDef, ents, emb, txn)
      Graph.mergeInsertRelations(reg, relDef, rels, emb, txn)
    }
    (reg, chunks)
  }

  /** Post-merge entity table: top-20 entities by chunk coverage.
    * n_chunks counts one chunk_uuid entry per (chunk, entity) pair —
    * the recognizer dedups entities within a chunk, so this equals the
    * count of distinct documents mentioning the entity. */
  def entityMerge(s: SparkSession, d: String): DataFrame = {
    val (reg, _) = buildGraph(s, d)
    reg.table(Graph.entityDef())
      .select(col("text"), size(col("chunk_uuids")).as("n_chunks"))
      .orderBy(col("n_chunks").desc, col("text").asc)
      .limit(20)
  }

  /** 2-hop graph search: query → similar relations → endpoint entities →
    * their chunks (rows-only; scores come from the hash embedder). */
  def graphSearch(s: SparkSession, d: String): DataFrame = {
    val (reg, chunks) = buildGraph(s, d)
    Graph.graphSearch(reg, "spark filter join", chunks, "doc_id",
      Graph.entityDef(), Graph.relationDef(), HashEmbedder(dim = 32),
      recognizer, similarK = 10, topk = 10)
      .select("doc_id", "g_rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g01_entity_merge" -> entityMerge,
    "g02_graph_search" -> graphSearch)

  val oracles: Map[String, String] = Map(
    "g01_entity_merge" ->
      s"""SELECT token AS text, CAST(COUNT(DISTINCT doc_id) AS INTEGER) AS n_chunks
         FROM (
           SELECT doc_id,
                  unnest(list_filter(
                    regexp_split_to_array(text, '[^A-Za-z0-9]+'),
                    t -> list_contains(
                      [${Vocab.map(v => s"'$v'").mkString(", ")}], t)))
                    AS token
           FROM documents)
         GROUP BY 1
         ORDER BY n_chunks DESC, text ASC
         LIMIT 20""")
}
