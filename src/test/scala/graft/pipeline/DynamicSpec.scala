package graft.pipeline

import java.nio.file.Files

import graft.SparkSpecBase
import graft.core.Registry
import Dynamic._

/** Dynamic pipeline factory validation rules (pipeline.py:174-206) and
  * both flows end-to-end. */
class DynamicSpec extends SparkSpecBase {

  test("validation: embedding required") {
    val e = intercept[RequestError] {
      fromSteps(Seq(ResourceRequest("index", "graft")))
    }
    assert(e.getMessage.contains("No embedding provider"))
  }

  test("validation: index or search required") {
    val e = intercept[RequestError] {
      fromSteps(Seq(ResourceRequest("text-emb", "hash")))
    }
    assert(e.getMessage.contains("No `index` or `search`"))
  }

  test("validation: graph index requires a graph provider") {
    val e = intercept[RequestError] {
      fromSteps(Seq(
        ResourceRequest("text-emb", "hash"),
        ResourceRequest("index", "graft", Map("graph" -> "true"))))
    }
    assert(e.getMessage.contains("requires a graph provider"))
  }

  test("validation: unknown kind / provider") {
    assert(intercept[RequestError] {
      fromSteps(Seq(ResourceRequest("teleport", "x")))
    }.getMessage.contains("Unsupported provider kind"))
    assert(intercept[RequestError] {
      fromSteps(Seq(ResourceRequest("chunk", "quantum")))
    }.getMessage.contains("Unsupported provider: quantum"))
  }

  test("validation: a multimodal embedder alone satisfies the " +
      "embedding rule") {
    val c = fromSteps(Seq(
      ResourceRequest("multimodal-emb", "local", Map("dim" -> "32")),
      ResourceRequest("index", "graft")))
    assert(c.multimodalEmb.isDefined && c.textEmb.isEmpty)
    assert(intercept[RequestError] {
      fromSteps(Seq(ResourceRequest("ocr", "tesseract")))
    }.getMessage.contains("Unsupported provider: tesseract"))
    assert(intercept[RequestError] {
      fromSteps(Seq(ResourceRequest("evaluate", "llm")))
    }.getMessage.contains("Unsupported provider: llm"))
  }

  test("binary index flow: ocr stub + local multimodal emb, then " +
      "search with judged metrics") {
    val sp = spark
    import sp.implicits._
    val reg = new Registry(spark,
      Files.createTempDirectory("graft-dyn-bin").toString)
    val chunks = chunkDef("binchunk")
    reg.register(chunks)
    val cfg = fromSteps(Seq(
      ResourceRequest("chunk", "regex",
        Map("size" -> "60", "overlap" -> "0", "separator" -> "\\s+",
          "concat" -> " ")),
      ResourceRequest("text-emb", "hash", Map("dim" -> "32")),
      ResourceRequest("multimodal-emb", "local", Map("dim" -> "32")),
      ResourceRequest("ocr", "stub"),
      ResourceRequest("evaluate", "overlap"),
      ResourceRequest("index", "graft"),
      ResourceRequest("search", "graft", Map("topk" -> "4"))))
    // one txt doc, one "image" (a real 1x1 PNG so the local codec
    // decodes it), one pdf-tagged doc (the stub extractor tags bytes)
    val img = {
      val b = new java.awt.image.BufferedImage(1, 1,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(b, "png", bos)
      bos.toByteArray
    }
    val docs = Seq(
      (1L, "txt", "spark joins shuffle data across executors"
        .getBytes("UTF-8")),
      (2L, "png", img),
      // the reference's multimodal seat embeds EVERY non-text input
      // (pipeline.py:286); the local stand-in embeds undecodable
      // payloads through its digest fallback instead of aborting
      (3L, "pdf", Array[Byte](1, 2, 3)))
      .toDF("doc_id", "ext", "data")
    runIndexBinary(reg, cfg, docs, chunks)
    val stored = reg.table(chunks).collect()
    // txt doc: text chunks, no mm chunk for txt
    assert(stored.exists(r => r.getAs[String]("uid") == "1-0"))
    assert(!stored.exists(r => r.getAs[String]("uid") == "1-mm"))
    // image doc: ONE multimodal fake chunk (base64 text, seq -1) plus
    // the stub-ocr text chunk
    assert(stored.exists(r => r.getAs[String]("uid") == "2-mm" &&
      r.getAs[Int]("seq") == -1))
    assert(stored.exists(r => r.getAs[String]("uid") == "2-0" &&
      r.getAs[String]("text").startsWith("image ")))
    // pdf doc: stub extractor's pdf tag became the text chunk
    assert(stored.exists(r => r.getAs[String]("uid") == "3-0" &&
      r.getAs[String]("text").startsWith("pdf ")))
    val res = runSearch(reg, cfg, "spark joins shuffle", chunks)
    val m = searchMetrics(cfg, "spark joins shuffle", res)
    assert(m.contains("MRR") && m("MRR") > 0.0)
    assert(m.keys.exists(_.startsWith("precision@")))
  }

  test("index flow then search flow, with graph and rerank") {
    val sp = spark
    import sp.implicits._
    val reg = new Registry(spark,
      Files.createTempDirectory("graft-dyn").toString)
    val chunks = chunkDef()
    reg.register(chunks, graft.graph.Graph.entityDef(),
      graft.graph.Graph.relationDef())
    val indexCfg = fromSteps(Seq(
      ResourceRequest("chunk", "regex",
        Map("size" -> "60", "overlap" -> "10")),
      ResourceRequest("text-emb", "hash", Map("dim" -> "32")),
      ResourceRequest("graph", "simple"),
      ResourceRequest("index", "graft", Map("graph" -> "true"))))
    val docs = Seq(
      (1L, "Spark runs distributed SQL. Spark joins are shuffle heavy."),
      (2L, "Postgres stores rows. Postgres uses indexes for lookups."))
      .toDF("doc_id", "text")
    runIndex(reg, indexCfg, docs, chunks)
    assert(reg.table(chunks).count() >= 2)
    assert(reg.table(graft.graph.Graph.entityDef()).count() >= 2)

    val searchCfg = fromSteps(Seq(
      ResourceRequest("text-emb", "hash", Map("dim" -> "32")),
      ResourceRequest("graph", "simple"),
      ResourceRequest("rerank", "overlap"),
      ResourceRequest("search", "graft", Map("topk" -> "4"))))
    val res = runSearch(reg, searchCfg, "Spark joins", chunks).collect()
    assert(res.nonEmpty)
    // top hit after overlap-rerank must be a Spark chunk
    assert(res.head.getAs[String]("text").toLowerCase.contains("spark"))
  }

  test("http embedding provider: index + search through the rate-limited " +
      "transport (batched ingest), endpoint required") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    // stub provider: vec = [len, #tokens, 1, 1] per text — enough
    // structure for a cosine search to prefer like-length chunks
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/embed",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        nBatches.incrementAndGet()
        val req = JsonMethods.parse(
          new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
        val texts = (req \ "input") match {
          case JArray(xs) => xs.map { case JString(s) => s; case _ => "" }
          case _ => Nil
        }
        val data = JArray(texts.map(t => JArray(List(
          JDouble(t.length), JDouble(t.split("\\s+").length),
          JDouble(1), JDouble(1)))))
        val out = JsonMethods.compact(JsonMethods.render(
          JObject("data" -> data))).getBytes("UTF-8")
        ex.sendResponseHeaders(200, out.length)
        ex.getResponseBody.write(out)
        ex.close()
      })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/v1/embed"
      val sp = spark
      import sp.implicits._
      val reg = new Registry(spark,
        Files.createTempDirectory("graft-dyn-http").toString)
      val chunks = chunkDef("dynchunk_http")
      reg.register(chunks)
      val cfg = fromSteps(Seq(
        ResourceRequest("chunk", "regex",
          Map("size" -> "60", "overlap" -> "10")),
        ResourceRequest("text-emb", "http", Map("endpoint" -> url,
          "dim" -> "4", "rps" -> "1000", "burst" -> "64")),
        ResourceRequest("index", "graft")))
      val docs = Seq(
        (1L, "Spark runs distributed SQL. Spark joins are shuffle heavy."),
        (2L, "Postgres stores rows. Postgres uses indexes for lookups."))
        .toDF("doc_id", "text")
      runIndex(reg, cfg, docs, chunks)
      val stored = reg.table(chunks).collect()
      assert(stored.length >= 2)
      // every chunk got its provider vector: [len, ...] matches text
      stored.foreach { r =>
        assert(r.getAs[Seq[Float]]("vec").head ===
          r.getAs[String]("text").length.toFloat)
      }
      // batched ingest: far fewer requests than chunks (+1 per partial
      // partition batch is fine, but never one per row at batch 32)
      assert(nBatches.get() <= stored.length)
      val searchCfg = fromSteps(Seq(
        ResourceRequest("text-emb", "http", Map("endpoint" -> url,
          "dim" -> "4", "rps" -> "1000", "burst" -> "64")),
        ResourceRequest("search", "graft", Map("topk" -> "3"))))
      assert(runSearch(reg, searchCfg, "Spark joins", chunks)
        .collect().nonEmpty)
      // endpoint is mandatory for the http provider
      assert(intercept[RequestError] {
        fromSteps(Seq(ResourceRequest("text-emb", "http")))
      }.getMessage.contains("endpoint"))
    } finally server.stop(0)
  }

  test("named wire providers: jina index+search e2e through the real " +
      "schema (batched, auth header), cohere rerank, endpoint required") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val lastAuth = new java.util.concurrent.atomic.AtomicReference("")
    val lastTask = new java.util.concurrent.atomic.AtomicReference("")
    val nReqs = new java.util.concurrent.atomic.AtomicInteger(0)
    val rerankBody = new java.util.concurrent.atomic.AtomicReference("")
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    // Jina /v1/embeddings shape: {"text":…} inputs, {"data":[{index,
    // embedding}]} out (INDEX-keyed; vec = [len, #tokens, 1, 1])
    server.createContext("/v1/embeddings",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        nReqs.incrementAndGet()
        lastAuth.set(ex.getRequestHeaders.getFirst("Authorization"))
        val req = JsonMethods.parse(
          new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
        req \ "task" match { case JString(t) => lastTask.set(t); case _ => () }
        val texts = req \ "input" match {
          case JArray(xs) => xs.map(x => x \ "text" match {
            case JString(s) => s; case _ => "" })
          case _ => Nil
        }
        val data = JArray(texts.zipWithIndex.map { case (t, i) =>
          JObject("index" -> JInt(i), "embedding" -> JArray(List(
            JDouble(t.length), JDouble(t.split("\\s+").length),
            JDouble(1), JDouble(1)))): JValue })
        val out = JsonMethods.compact(JsonMethods.render(
          JObject("data" -> data))).getBytes("UTF-8")
        ex.sendResponseHeaders(200, out.length)
        ex.getResponseBody.write(out)
        ex.close()
      })
    // Cohere /v2/rerank shape: results in REVERSED candidate order so
    // the rerank visibly reorders
    server.createContext("/v2/rerank",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        rerankBody.set(
          new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
        val n = JsonMethods.parse(rerankBody.get()) \ "documents" match {
          case JArray(xs) => xs.length
          case _ => 0
        }
        val results = JArray((0 until n).reverse.zipWithIndex.map {
          case (idx, rank) => JObject("index" -> JInt(idx),
            "relevance_score" -> JDouble(1.0 - rank * 0.1)): JValue
        }.toList)
        val out = JsonMethods.compact(JsonMethods.render(
          JObject("results" -> results))).getBytes("UTF-8")
        ex.sendResponseHeaders(200, out.length)
        ex.getResponseBody.write(out)
        ex.close()
      })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val sp = spark
      import sp.implicits._
      val reg = new Registry(spark,
        Files.createTempDirectory("graft-dyn-wire").toString)
      val chunks = chunkDef("dynchunk_wire")
      reg.register(chunks)
      def jinaStep = ResourceRequest("text-emb", "jina", Map(
        "endpoint" -> s"$base/v1/embeddings", "model" -> "jina-embeddings-v4",
        "dim" -> "4", "rps" -> "1000", "burst" -> "64", "key" -> "sekrit"))
      val cfg = fromSteps(Seq(
        ResourceRequest("chunk", "regex",
          Map("size" -> "60", "overlap" -> "10")),
        jinaStep,
        ResourceRequest("index", "graft")))
      assert(cfg.textEmb.get.name.startsWith("jina_emb_"))
      val docs = Seq(
        (1L, "Spark runs distributed SQL. Spark joins are shuffle heavy."),
        (2L, "Postgres stores rows. Postgres uses indexes for lookups."))
        .toDF("doc_id", "text")
      runIndex(reg, cfg, docs, chunks)
      val stored = reg.table(chunks).collect()
      assert(stored.length >= 2)
      stored.foreach { r =>
        assert(r.getAs[Seq[Float]]("vec").head ===
          r.getAs[String]("text").length.toFloat)
      }
      // the wire adapter ingests through the BATCHED path
      assert(nReqs.get() <= stored.length)
      // auth header and document-side task vocabulary on the wire
      assert(lastAuth.get() === "Bearer sekrit")
      assert(lastTask.get() === "retrieval.passage")
      // search with cohere rerank: reversed stub order must surface
      val searchCfg = fromSteps(Seq(
        jinaStep,
        ResourceRequest("rerank", "cohere", Map(
          "endpoint" -> s"$base/v2/rerank", "key" -> "sekrit",
          "rps" -> "1000", "burst" -> "8")),
        ResourceRequest("search", "graft", Map("topk" -> "3"))))
      val hits = runSearch(reg, searchCfg, "Spark joins", chunks).collect()
      assert(hits.nonEmpty)
      assert(lastTask.get() === "retrieval.query") // query-side vocab
      assert(rerankBody.get().contains(""""model":"rerank-v3.5""""))
      // endpoint is mandatory for named wire providers too
      assert(intercept[RequestError] {
        fromSteps(Seq(ResourceRequest("text-emb", "voyage")))
      }.getMessage.contains("endpoint"))
      assert(intercept[RequestError] {
        fromSteps(Seq(
          ResourceRequest("text-emb", "hash"),
          ResourceRequest("rerank", "jina"),
          ResourceRequest("search", "graft")))
      }.getMessage.contains("endpoint"))
    } finally server.stop(0)
  }
}
