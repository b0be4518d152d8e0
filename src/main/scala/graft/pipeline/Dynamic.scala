package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.core.Registry
import graft.core.Spec.TableDef
import graft.graph.{EntityRecognizer, Graph, SimpleRecognizer}
import graft.ops.{Ann, Bm25, Fusion}
import graft.rank.{OverlapReranker, Reranker}
import graft.text.{Chunker, Embed, Embedder, HashEmbedder, RegexChunker}

/** Config-driven pipeline factory — the reference's `DynamicPipeline`
  * (/root/reference/vechord/pipeline.py:112-218): a declarative
  * `ResourceRequest{kind, provider, args}` list resolved through a
  * provider map, validated (pipeline.py:174-184 rules), then run as
  * either the INDEX flow (ingest: chunk → embed [→ graph extract] →
  * single-txn insert, pipeline.py:249-343) or the SEARCH flow
  * (vector/keyword/graph fan-out → ordered dedup → rerank,
  * pipeline.py:394-442).
  *
  * Local deterministic providers stand in for the reference's HTTP ones
  * (regex chunker ↔ regex, hash embedder ↔ spacy, overlap reranker ↔
  * cohere, simple recognizer ↔ gemini NER); unknown kinds/providers fail
  * exactly like the reference's RequestError paths.
  */
object Dynamic {

  final case class ResourceRequest(kind: String, provider: String,
                                   args: Map[String, String] = Map.empty)

  final case class RequestError(msg: String) extends Exception(msg)

  /** Resolved pipeline config. */
  final case class Config(
      chunk: Option[Chunker] = None,
      textEmb: Option[Embedder] = None,
      rerank: Option[Reranker] = None,
      graph: Option[EntityRecognizer] = None,
      index: Boolean = false,
      indexGraph: Boolean = false,
      search: Boolean = false,
      topk: Int = 10) {
    /** pipeline.py:174-184 validation, ported rule for rule. */
    def validate(): Config = {
      if (textEmb.isEmpty)
        throw RequestError("No embedding provider specified in the request")
      if (!index && !search)
        throw RequestError(
          "No `index` or `search` option specified in the request")
      if (index && indexGraph && graph.isEmpty)
        throw RequestError("Graph index requires a graph provider")
      this
    }
  }

  /** Rate-limited transport for a named wire provider: `endpoint` is
    * required (the tests point it at an in-process stub; production
    * points it at the provider's real URL), `key` optional → the
    * provider's auth header, `rps`/`burst` size the per-executor token
    * bucket. */
  private def wireHttp(s: ResourceRequest,
                       gemini: Boolean): graft.providers.HttpJson = {
    val endpoint = s.args.getOrElse("endpoint",
      throw RequestError(s"${s.provider} ${s.kind} requires an endpoint arg"))
    val auth = s.args.get("key").map { k =>
      if (gemini) "x-goog-api-key" -> k
      else "Authorization" -> s"Bearer $k"
    }.toMap
    graft.providers.HttpJson(endpoint,
      rps = s.args.getOrElse("rps", "8").toDouble,
      burst = s.args.getOrElse("burst", "1").toInt,
      headers = auth)
  }

  /** Provider map twin (pipeline.py:112-134). */
  def fromSteps(steps: Seq[ResourceRequest]): Config = {
    var c = Config()
    steps.foreach { s =>
      (s.kind, s.provider) match {
        case ("chunk", "regex") =>
          val base = RegexChunker(
            size = s.args.getOrElse("size", "1536").toInt,
            overlap = s.args.getOrElse("overlap", "200").toInt)
          c = c.copy(chunk = Some(base.copy(
            separator = s.args.getOrElse("separator", base.separator),
            concat = s.args.getOrElse("concat", base.concat))))
        case ("text-emb", "hash") =>
          c = c.copy(textEmb = Some(HashEmbedder(
            dim = s.args.getOrElse("dim", "64").toInt)))
        // the second deterministic local provider: md5 feature hashing
        // (graft.text.Md5Embedder) — integer-exact math any SQL engine
        // replays, which is what puts the WHOLE dynamic pipeline under
        // the external oracle (gate d01)
        case ("text-emb", "md5") =>
          c = c.copy(textEmb = Some(graft.text.Md5Embedder(
            dim = s.args.getOrElse("dim", "64").toInt)))
        // a REAL provider endpoint through the rate-limited transport
        // (providers/Transport.scala) — the drop-in the reference's
        // PROVIDER_MAP offers for its HTTP embedders
        // (pipeline.py:112-134); ingest batches via mapPartitions
        case ("text-emb", "http") =>
          val endpoint = s.args.getOrElse("endpoint",
            throw RequestError("http embedder requires an endpoint arg"))
          c = c.copy(textEmb = Some(graft.providers.HttpEmbedder(
            name = s.args.getOrElse("model", "default"),
            dim = s.args.getOrElse("dim", "64").toInt,
            graft.providers.HttpJson(endpoint,
              rps = s.args.getOrElse("rps", "8").toDouble,
              burst = s.args.getOrElse("burst", "1").toInt))))
        // NAMED wire providers (providers/Providers.scala) — the
        // reference's PROVIDER_MAP entries (pipeline.py:117-129:
        // text-emb gemini/jina/openai/voyage, rerank cohere/jina) with
        // each provider's real request/response schema. Endpoint and
        // key arrive as ARGS (provider.py reads ambient env on the
        // client; here config is explicit — no env reads in operator
        // code) and auth rides the transport headers the same way
        // provider.py attaches it: x-goog-api-key for Gemini, Bearer
        // for the rest. Defaults mirror the reference's class defaults.
        case ("text-emb", p @ ("gemini" | "jina" | "voyage" | "openai")) =>
          val (defModel, defDim) = p match {
            case "gemini" => ("gemini-embedding-exp-03-07", 3072)
            case "jina"   => ("jina-embeddings-v4", 2048)
            case "voyage" => ("voyage-3.5", 1024)
            case _        => ("text-embedding-3-large", 3072)
          }
          val model = s.args.getOrElse("model", defModel)
          val dim = s.args.getOrElse("dim", defDim.toString).toInt
          val http = wireHttp(s, gemini = p == "gemini")
          val emb: graft.text.Embedder = p match {
            case "gemini" => graft.providers.GeminiEmbedder(model, dim, http)
            case "jina"   => graft.providers.JinaEmbedder(model, dim, http)
            case "voyage" => graft.providers.VoyageEmbedder(model, dim, http)
            case _        => graft.providers.OpenAiEmbedder(model, dim, http)
          }
          c = c.copy(textEmb = Some(emb))
        case ("rerank", p @ ("cohere" | "jina")) =>
          val rr: graft.rank.Reranker =
            if (p == "cohere")
              graft.providers.CohereReranker(
                s.args.getOrElse("model", "rerank-v3.5"),
                wireHttp(s, gemini = false))
            else
              graft.providers.JinaWireReranker(
                s.args.getOrElse("model", "jina-reranker-m0"),
                wireHttp(s, gemini = false))
          c = c.copy(rerank = Some(rr))
        case ("rerank", "overlap") => c = c.copy(rerank = Some(OverlapReranker()))
        case ("graph", "simple") => c = c.copy(graph = Some(SimpleRecognizer()))
        case ("index", "graft") =>
          c = c.copy(index = true,
            indexGraph = s.args.get("graph").exists(_.toBoolean))
        case ("search", "graft") =>
          c = c.copy(search = true,
            topk = s.args.getOrElse("topk", "10").toInt)
        case (k, p) if !Kinds.contains(k) =>
          throw RequestError(s"Unsupported provider kind: $k")
        case (k, p) =>
          throw RequestError(s"Unsupported provider: $p for kind: $k")
      }
    }
    c.validate()
  }

  private val Kinds =
    Set("chunk", "text-emb", "rerank", "graph", "index", "search")

  /** Chunk rows persisted by the index flow. */
  final case class DynChunk(uid: String, doc_id: Long, seq: Int,
                            text: String, vec: Seq[Float])

  def chunkDef(name: String = "dynchunk"): TableDef[DynChunk] = {
    implicit val enc = Encoders.product[DynChunk]
    TableDef[DynChunk](name, primaryKey = Some("uid"))
  }

  /** INDEX flow (pipeline.py:249-343): docs (id, text) → chunk → embed
    * [→ graph extract + merge] → one-transaction insert. */
  def runIndex(reg: Registry, c: Config, docs: DataFrame,
               chunks: TableDef[DynChunk]): Unit = {
    require(c.index, "config is not an index pipeline")
    val spark = reg.spark
    import spark.implicits._
    val chunker = c.chunk.getOrElse(RegexChunker())
    val emb = c.textEmb.get
    val chunked = docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        chunker.segment(t).zipWithIndex.map { case (body, i) =>
          (s"$id-$i", id, i, body)
        }
      }
      .toDF("uid", "doc_id", "seq", "text")
    // remote batch-capable providers ingest BATCHED (one rate-limited
    // request per batchSize chunks — the generic HttpEmbedder and the
    // Jina/Voyage/OpenAI wire adapters); per-text providers (Gemini's
    // embedContent API, local embedders) stay the per-row map stage
    val embedded = (emb match {
      case b: graft.providers.BatchEmbedder =>
        graft.providers.RemoteEmbed.withEmbeddingBatched(
          chunked, "text", "vec", b)
      case _ => Embed.withEmbedding(chunked, "text", "vec", emb)
    }).select(chunks.columns.map(col): _*)
    reg.runTxn { txn =>
      reg.copyBulk(chunks, embedded, txn)
      if (c.indexGraph) {
        val (entsDf, relsDf) = Graph.extractFromChunks(spark,
          reg.tableBuffer(chunks, txn), "uid", "text", c.graph.get)
        Graph.mergeInsertEntities(reg, Graph.entityDef(), entsDf, emb, txn)
        Graph.mergeInsertRelations(reg, Graph.relationDef(), relsDf, emb, txn)
      }
    }
  }

  /** SEARCH flow (pipeline.py:394-442): vector + keyword [+ graph]
    * fan-out → ordered first-occurrence dedup → optional rerank →
    * top-k (uid, doc_id, text, rank). */
  def runSearch(reg: Registry, c: Config, query: String,
                chunks: TableDef[DynChunk]): DataFrame = {
    require(c.search, "config is not a search pipeline")
    val emb = c.textEmb.get
    val table = reg.table(chunks)
    val vecList = Ann.topK(table, "uid", "vec",
        Embed.queryVec(emb, query), Ann.Cosine, c.topk)
      .select("uid", "dist")
    // memoized per table VERSION like Engine.keywordIndex — the search
    // flow runs per query, and rebuilding the postings/corpus-stats
    // side tables per call is an O(corpus) scan the reference's
    // persistent PG bm25 index never pays (client.py:146-174)
    val version = reg.catalog.current
      .getOrElse(s"${reg.namespace}_${chunks.name}", Vector.empty).hashCode
    val idx = Bm25.buildCached(table, "uid", "text",
      s"dyn|${System.identityHashCode(reg)}|${chunks.name}|$version")
    val kwList = Bm25.search(idx, query, c.topk)
    var lists = Seq(
      Fusion.ranked(vecList, "uid", "dist", asc = true),
      Fusion.ranked(kwList, "id", "score", asc = false))
    c.graph.foreach { recognizer =>
      val g = Graph.graphSearch(reg, query, table, "uid",
        Graph.entityDef(), Graph.relationDef(), emb, recognizer,
        similarK = c.topk, topk = c.topk)
      if (!g.isEmpty)
        lists = lists :+ Fusion.ranked(g, "uid", "g_rank", asc = true)
    }
    val fused = Fusion.dedupUnion(lists, c.topk)
    val joined = table.select(col("uid").as("id"), col("doc_id"), col("text"))
      .join(fused, "id")
    c.rerank match {
      case Some(r) => graft.rank.Rerank.apply(joined, "id", "text", query, r)
      case None => joined.orderBy(col("src").asc, col("rank").asc)
    }
  }
}
