package graft.providers

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.mutable

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.SparkSpecBase

/** The provider transport shell against an in-process JDK HttpServer
  * stub (the ServiceSpec pattern): rate limiting is observable from
  * request timestamps, batch shape from request bodies, and the
  * retry/deadline ladder from scripted status sequences — network-free
  * e2e for the one layer the deterministic local providers don't cover
  * (/root/reference/vechord/utils.py:38-68, provider.py:240-254). */
class TransportSpec extends SparkSpecBase {

  /** Stub server: /embed answers vec[j] = len(text) + j (dim 4), and
    * records (arrival nanos, batch size) per request. A scripted status
    * queue can force 429/500 prefixes. */
  private final class Stub {
    val arrivals = mutable.ArrayBuffer[Long]()
    val batchSizes = mutable.ArrayBuffer[Int]()
    val attempts = new AtomicInteger(0)
    var statusScript: List[Int] = Nil // statuses to serve BEFORE 200s
    val server: HttpServer =
      HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

    private def body(ex: HttpExchange): String =
      new String(ex.getRequestBody.readAllBytes(), "UTF-8")

    private def reply(ex: HttpExchange, status: Int, s: String): Unit = {
      val b = s.getBytes("UTF-8")
      ex.sendResponseHeaders(status, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    }

    server.createContext("/embed", (ex: HttpExchange) => {
      attempts.incrementAndGet()
      val scripted = this.synchronized {
        statusScript match {
          case h :: t => statusScript = t; Some(h)
          case Nil => None
        }
      }
      scripted match {
        case Some(code) => reply(ex, code, """{"error":"scripted"}""")
        case None =>
          val req = JsonMethods.parse(body(ex))
          val texts = (req \ "input") match {
            case JArray(xs) => xs.map { case JString(s) => s; case _ => "" }
            case _ => Nil
          }
          this.synchronized {
            arrivals += System.nanoTime()
            batchSizes += texts.length
          }
          val data = JArray(texts.map(t => JArray(
            (0 until 4).map(j => JDouble(t.length + j)).toList)))
          reply(ex, 200,
            JsonMethods.compact(JsonMethods.render(JObject("data" -> data))))
      }
    })
    server.createContext("/rerank", (ex: HttpExchange) => {
      val req = JsonMethods.parse(body(ex))
      val n = (req \ "documents") match {
        case JArray(xs) => xs.length
        case _ => 0
      }
      // reverse order: obviously not the identity permutation
      reply(ex, 200, JsonMethods.compact(JsonMethods.render(JObject(
        "order" -> JArray((n - 1 to 0 by -1).map(JInt(_)).toList)))))
    })
    server.createContext("/complete", (ex: HttpExchange) => {
      val req = JsonMethods.parse(body(ex))
      val p = (req \ "prompt") match { case JString(s) => s; case _ => "" }
      reply(ex, 200, JsonMethods.compact(JsonMethods.render(JObject(
        "text" -> JString(s"echo: $p")))))
    })
    server.start()
    def url(path: String): String =
      s"http://127.0.0.1:${server.getAddress.getPort}$path"
    def stop(): Unit = server.stop(0)
  }

  test("batched ingest: N rows cost ceil(N/batchSize) requests, every " +
      "batch bounded, vectors land in row order") {
    val stub = new Stub
    try {
      val sp = spark
      import sp.implicits._
      val docs = (0 until 40).map(i => (i.toLong, "x" * (i + 1)))
        .toDF("id", "text").repartition(2)
      val emb = HttpEmbedder("stub-model", dim = 4,
        HttpJson(stub.url("/embed"), rps = 1000.0, burst = 8))
      val out = RemoteEmbed.withEmbeddingBatched(docs, "text", "vec",
        emb, batchSize = 8).collect()
      assert(out.length === 40)
      // vec[0] == text length for every row: order preserved per batch
      out.foreach { r =>
        assert(r.getAs[Seq[Float]]("vec").head ===
          r.getAs[String]("text").length.toFloat)
      }
      // batch shape: ≤ 8 per request, and with 2 partitions of 20 rows
      // that is 3 requests each (8+8+4) = 6 total
      assert(stub.batchSizes.forall(_ <= 8))
      assert(stub.batchSizes.length === 6)
      assert(stub.batchSizes.sum === 40)
    } finally stub.stop()
  }

  test("token bucket: observed request rate is capped at rps") {
    val stub = new Stub
    try {
      val emb = HttpEmbedder("stub-model", dim = 4,
        HttpJson(stub.url("/embed"), rps = 20.0, burst = 1))
      (0 until 6).foreach(i => emb.embedChunk(s"t$i"))
      val arr = stub.arrivals.toSeq.sorted
      assert(arr.length === 6)
      // 6 requests, burst 1, 20 rps -> at least 5/20 = 250 ms of
      // enforced spacing (50 ms slack for scheduler jitter)
      val elapsedMs = (arr.last - arr.head) / 1e6
      assert(elapsedMs >= 200.0,
        s"6 calls at rps=20 took only $elapsedMs ms — limiter not applied")
    } finally stub.stop()
  }

  test("retry ladder: 429/5xx retry with backoff then succeed; 4xx " +
      "fails fast; exhausted retries throw") {
    val stub = new Stub
    try {
      // two 429s then success -> 3 attempts total
      stub.statusScript = List(429, 503)
      val http = HttpJson(stub.url("/embed"), rps = 1000.0, burst = 4,
        maxRetries = 4, backoffMs = 10)
      val emb = HttpEmbedder("stub-model", dim = 4, http)
      assert(emb.embedChunk("abc").head === 3.0f)
      assert(stub.attempts.get() === 3)
      // a 400 is NOT retried
      stub.attempts.set(0)
      stub.statusScript = List(400)
      val e1 = intercept[IllegalStateException] { emb.embedChunk("x") }
      assert(e1.getMessage.contains("400") && stub.attempts.get() === 1)
      // permanent 500s exhaust maxRetries (1 + maxRetries attempts)
      stub.attempts.set(0)
      stub.statusScript = List.fill(10)(500)
      val e2 = intercept[IllegalStateException] { emb.embedChunk("x") }
      assert(e2.getMessage.contains("failed after"))
      assert(stub.attempts.get() === 5)
    } finally stub.stop()
  }

  test("reranker and completer seats round-trip the stub protocol") {
    val stub = new Stub
    try {
      val http = HttpJson(stub.url("/rerank"), rps = 1000.0, burst = 4)
      val rr = HttpReranker("stub-rerank", http)
      assert(rr.rerank("q", Seq("a", "b", "c")) === Seq(2, 1, 0))
      val cc = HttpCompleter("stub-llm",
        HttpJson(stub.url("/complete"), rps = 1000.0, burst = 4))
      assert(cc.complete("hello") === "echo: hello")
    } finally stub.stop()
  }

  /** Capture stub: records the raw request body per path and replies
    * with a canned JSON — the wire adapters' request SHAPES are then
    * byte-for-byte assertable. */
  private final class CaptureStub(cans: Map[String, String]) {
    val bodies = mutable.Map[String, mutable.ArrayBuffer[String]]()
    val server: HttpServer =
      HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    cans.foreach { case (path, canned) =>
      server.createContext(path, (ex: HttpExchange) => {
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        this.synchronized {
          bodies.getOrElseUpdate(path, mutable.ArrayBuffer()) += body
        }
        val b = canned.getBytes("UTF-8")
        ex.sendResponseHeaders(200, b.length)
        ex.getResponseBody.write(b)
        ex.close()
      })
    }
    server.start()
    def url(path: String): String =
      s"http://127.0.0.1:${server.getAddress.getPort}$path"
    def last(path: String): String = this.synchronized { bodies(path).last }
    def stop(): Unit = server.stop(0)
  }

  test("provider wire adapters: exact request JSON per provider, " +
      "index-ordered response parsing") {
    val dataEnvelope = // indices deliberately OUT of order
      """{"data":[{"index":1,"embedding":[5.0,6.0,7.0,8.0]},""" +
        """{"index":0,"embedding":[1.0,2.0,3.0,4.0]}]}"""
    val stub = new CaptureStub(Map(
      "/gemini" -> """{"embedding":{"values":[1.0,2.0,3.0,4.0]}}""",
      "/jina" -> dataEnvelope,
      "/voyage" -> dataEnvelope,
      "/openai" -> """{"data":[{"index":0,"embedding":[1.0,2.0,3.0,4.0]}]}""",
      "/splade" -> ("""[{"dim":8,"indices":[1,5],"values":[0.5,1.5]},""" +
        """{"dim":8,"indices":[2],"values":[2.0]}]"""),
      "/jrr" -> ("""{"results":[{"index":2,"relevance_score":0.9},""" +
        """{"index":0,"relevance_score":0.5},""" +
        """{"index":1,"relevance_score":0.1}]}"""),
      "/crr" -> ("""{"results":[{"index":1,"relevance_score":0.8},""" +
        """{"index":0,"relevance_score":0.2}]}""")))
    def http(path: String) =
      HttpJson(stub.url(path), rps = 1000.0, burst = 8)
    try {
      // Gemini: one text per call, task type switches doc/query
      val g = GeminiEmbedder("gemini-embedding-exp-03-07", 4,
        http("/gemini"))
      assert(g.embedChunk("hello").toSeq === Seq(1f, 2f, 3f, 4f))
      assert(stub.last("/gemini") === """{"taskType":"RETRIEVAL_DOCUMENT",""" +
        """"content":{"parts":[{"text":"hello"}]}}""")
      g.embedQuery("hi")
      assert(stub.last("/gemini") === """{"taskType":"RETRIEVAL_QUERY",""" +
        """"content":{"parts":[{"text":"hi"}]}}""")
      // Jina: batched {"text": …} inputs; out-of-order data re-sorted
      val j = JinaEmbedder("jina-embeddings-v4", 4, http("/jina"))
      val jv = j.embedBatch(Seq("a", "b"), "chunk") // -> retrieval.passage
      assert(jv.map(_.head.toInt) === Seq(1, 5)) // index order, not wire
      assert(stub.last("/jina") === """{"model":"jina-embeddings-v4",""" +
        """"dimensions":4,"truncate":true,"task":"retrieval.passage",""" +
        """"embedding_type":"float","input":[{"text":"a"},{"text":"b"}]}""")
      j.embedBatch(Seq("q", "r"), "query") // -> retrieval.query
      assert(stub.last("/jina").contains(""""task":"retrieval.query""""))
      // Voyage: bare-string inputs + output_dimension/dtype
      val v = VoyageEmbedder("voyage-3-large", 4, http("/voyage"))
      v.embedBatch(Seq("a", "b"), "chunk") // -> input_type document
      assert(stub.last("/voyage") === """{"model":"voyage-3-large",""" +
        """"input":["a","b"],"input_type":"document","truncation":true,""" +
        """"output_dimension":4,"output_dtype":"float"}""")
      v.embedBatch(Seq("q", "r"), "query")
      assert(stub.last("/voyage").contains(""""input_type":"query""""))
      // OpenAI: model/input/dimensions triplet
      val o = OpenAiEmbedder("text-embedding-3-large", 4, http("/openai"))
      assert(o.embedChunk("x").toSeq === Seq(1f, 2f, 3f, 4f))
      assert(stub.last("/openai") ===
        """{"model":"text-embedding-3-large","input":["x"],"dimensions":4}""")
      // SPLADE: BARE array body, sparse (indices, values) parsing
      val s = SpladeEmbedder(8, http("/splade"))
      val sv = s.embedBatch(Seq("a", "b"))
      assert(stub.last("/splade") === """["a","b"]""")
      assert(sv.head.indices === Seq(1, 5) &&
        sv.head.values === Seq(0.5f, 1.5f))
      assert(sv(1).indices === Seq(2))
      // Jina rerank: v2 takes plain strings, m0 takes {"text": …}
      val r2 = JinaWireReranker("jina-reranker-v2-base-multilingual",
        http("/jrr"))
      assert(r2.rerank("q", Seq("a", "b", "c")) === Seq(2, 0, 1))
      assert(stub.last("/jrr") ===
        """{"model":"jina-reranker-v2-base-multilingual","query":"q",""" +
          """"top_n":3,"documents":["a","b","c"],"return_documents":false}""")
      val rm0 = JinaWireReranker("jina-reranker-m0", http("/jrr"))
      rm0.rerank("q", Seq("a", "b", "c"))
      assert(stub.last("/jrr").contains(
        """"documents":[{"text":"a"},{"text":"b"},{"text":"c"}]"""))
      // Cohere rerank: minimal model/query/documents
      val cr = CohereReranker("rerank-v3.5", http("/crr"))
      assert(cr.rerank("q", Seq("a", "b")) === Seq(1, 0))
      assert(stub.last("/crr") ===
        """{"model":"rerank-v3.5","query":"q","documents":["a","b"]}""")
    } finally stub.stop()
  }

  test("multimodal wire adapters and the gemini completer: exact " +
      "request JSON, first-embedding semantics, inline data + schema") {
    val outOfOrder = // first-by-INDEX is [1,2,3,4], not wire order
      """{"data":[{"index":1,"embedding":[9.0,9.0,9.0,9.0]},""" +
        """{"index":0,"embedding":[1.0,2.0,3.0,4.0]}]}"""
    val stub = new CaptureStub(Map(
      "/jmm" -> outOfOrder,
      "/vmm" -> outOfOrder,
      "/gen" -> ("""{"candidates":[{"content":{"parts":""" +
        """[{"text":"the answer"}]}}]}""")))
    def http(path: String) =
      HttpJson(stub.url(path), rps = 1000.0, burst = 8)
    val png = Array[Byte](1, 2, 3) // content is opaque to the adapter
    val b64 = java.util.Base64.getEncoder.encodeToString(png)
    try {
      // Jina multimodal: each part its OWN input item (text, image,
      // image_url order), bare-base64 image, FIRST embedding returned
      val jm = JinaMultimodalEmbedder("jina-embeddings-v4", 4,
        http("/jmm"))
      val jv = jm.embed(text = Some("hello"), image = Some(png))
      assert(jv.toSeq === Seq(1f, 2f, 3f, 4f)) // index 0, not wire head
      assert(stub.last("/jmm") === """{"model":"jina-embeddings-v4",""" +
        """"dimensions":4,"truncate":true,"task":"retrieval.passage",""" +
        s""""embedding_type":"float","input":[{"text":"hello"},""" +
        s"""{"image":"$b64"}]}""")
      jm.embedQuery(imageUrl = Some("http://x/y.png"))
      assert(stub.last("/jmm").contains(""""task":"retrieval.query""""))
      assert(stub.last("/jmm").contains(
        """"input":[{"image":"http://x/y.png"}]"""))
      intercept[IllegalArgumentException](jm.embed())
      // Voyage multimodal: ONE input, typed content parts, data: URI
      val vm = VoyageMultimodalEmbedder("voyage-multimodal-3", 4,
        http("/vmm"))
      val vv = vm.embed(text = Some("hello"), image = Some(png))
      assert(vv.toSeq === Seq(1f, 2f, 3f, 4f))
      assert(stub.last("/vmm") === """{"model":"voyage-multimodal-3",""" +
        """"inputs":[{"content":[{"type":"text","text":"hello"},""" +
        s"""{"type":"image_base64","image_base64":""" +
        s""""data:image/jpeg;base64,$b64"}]}],""" +
        """"input_type":"document","truncation":true}""")
      vm.embedQuery(text = Some("q"))
      assert(stub.last("/vmm").contains(""""input_type":"query""""))
      // Gemini completer: prompt-only, then inline data + json schema
      val g = GeminiCompleter("gemini-2.5-flash", http("/gen"))
      assert(g.complete("why?") === "the answer")
      assert(stub.last("/gen") ===
        """{"contents":{"parts":[{"text":"why?"}]}}""")
      g.complete("read this", inlineData = Some(("application/pdf", png)),
        responseJsonSchema = Some("""{"type":"object"}"""))
      assert(stub.last("/gen") === """{"contents":{"parts":""" +
        s"""[{"text":"read this"},{"inline_data":""" +
        s"""{"mime_type":"application/pdf","data":"$b64"}}]},""" +
        """"generationConfig":{"response_mime_type":"application/json",""" +
        """"response_json_schema":{"type":"object"}}}""")
    } finally stub.stop()
  }

  test("UmbrelaJudge: reference prompt + score schema on the wire, " +
      "structured score parsed, empty passage short-circuits") {
    val stub = new CaptureStub(Map(
      "/gen" -> ("""{"candidates":[{"content":{"parts":""" +
        """[{"text":"{\"score\":3}"}]}}]}"""),
      "/bad" -> ("""{"candidates":[{"content":{"parts":""" +
        """[{"text":"not json"}]}}]}""")))
    try {
      val judge = graft.eval.UmbrelaJudge(GeminiCompleter(
        "gemini-2.5-flash", HttpJson(stub.url("/gen"), rps = 1000.0)))
      assert(judge.estimate("why is the sky blue", "rayleigh scattering")
        === 3)
      val sent = stub.last("/gen")
      assert(sent.contains("integer scale of 0 to 3")) // the prompt
      assert(sent.contains("Query: why is the sky blue"))
      assert(sent.contains("Passage: rayleigh scattering"))
      assert(sent.contains(""""response_json_schema":{"type":"object",""" +
        """"properties":{"score":{"type":"integer"}},"required":["score"]}"""))
      assert(judge.threshold === 2) // evaluate.py:169-173 default
      // empty passage: 0 WITHOUT a provider call (evaluate.py:184-185)
      val before = this.synchronized(stub.bodies("/gen").length)
      assert(judge.estimate("q", "") === 0)
      assert(this.synchronized(stub.bodies("/gen").length) === before)
      // unparseable structured output fails loudly (evaluate.py:203-208)
      val bad = graft.eval.UmbrelaJudge(GeminiCompleter(
        "gemini-2.5-flash", HttpJson(stub.url("/bad"), rps = 1000.0)))
      intercept[Exception](bad.estimate("q", "p"))
    } finally stub.stop()
  }

  test("GeminiOcrExtractor: per-kind mime + reference prompt beside " +
      "inline data, caller prompt overrides, trimmed candidate text") {
    val stub = new CaptureStub(Map(
      "/gen" -> ("""{"candidates":[{"content":{"parts":""" +
        """[{"text":"  the extracted text\n"}]}}]}""")))
    try {
      val ocr = graft.text.GeminiOcrExtractor(GeminiCompleter(
        "gemini-2.5-flash", HttpJson(stub.url("/gen"), rps = 1000.0)))
      assert(ocr.name === "gemini_extractor_gemini-2.5-flash")
      val pdf = Array[Byte](0x25, 0x50, 0x44, 0x46)
      val b64 = java.util.Base64.getEncoder.encodeToString(pdf)
      assert(ocr.extractPdf(pdf) === "the extracted text")
      val sentPdf = stub.last("/gen")
      assert(sentPdf.contains("Extract the main content from the PDF"))
      assert(sentPdf.contains(
        s""""inline_data":{"mime_type":"application/pdf","data":"$b64""""))
      ocr.extractImage(pdf)
      val sentImg = stub.last("/gen")
      assert(sentImg.contains("Extract the visible text from the image"))
      assert(sentImg.contains(""""mime_type":"image/jpeg""""))
      // caller-supplied prompt wins (extract.py:121-122)
      graft.text.GeminiOcrExtractor(GeminiCompleter("gemini-2.5-flash",
        HttpJson(stub.url("/gen"), rps = 1000.0)), prompt = "just ocr")
        .extractPdf(pdf)
      assert(stub.last("/gen").contains(""""text":"just ocr""""))
    } finally stub.stop()
  }

  test("LlamaParseExtractor: multipart upload, 404-then-success poll, " +
      "text result; poll deadline surfaces as timeout") {
    val uploadBody =
      new java.util.concurrent.atomic.AtomicReference[Array[Byte]]()
    val uploadCt = new java.util.concurrent.atomic.AtomicReference("")
    val polls = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = HttpServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/parsing/upload", (ex: HttpExchange) => {
      uploadBody.set(ex.getRequestBody.readAllBytes())
      uploadCt.set(ex.getRequestHeaders.getFirst("Content-Type"))
      val out = """{"id":"job-42"}""".getBytes("UTF-8")
      ex.sendResponseHeaders(200, out.length)
      ex.getResponseBody.write(out)
      ex.close()
    })
    server.createContext("/api/parsing/job/job-42/result/text",
      (ex: HttpExchange) => {
        val n = polls.incrementAndGet()
        val (code, out) =
          if (n < 3) (404, """{"detail":"pending"}""".getBytes("UTF-8"))
          else (200, """{"text":"parsed markdown"}""".getBytes("UTF-8"))
        ex.sendResponseHeaders(code, out.length)
        ex.getResponseBody.write(out)
        ex.close()
      })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val http = HttpJson(base, rps = 1000.0, burst = 8,
        headers = Map("Authorization" -> "Bearer sekrit"))
      val fast = new graft.text.Poller(deadlineMs = 10000, intervalMs = 1)
      val ex = graft.text.LlamaParseExtractor(http, fast)
      assert(ex.extractPdf("%PDF".getBytes("UTF-8")) === "parsed markdown")
      assert(polls.get() === 3) // 2 pending rounds + the success
      // multipart shape: boundary header, file part with mime, payload
      assert(uploadCt.get().startsWith("multipart/form-data; boundary="))
      val sent = new String(uploadBody.get(), "UTF-8")
      assert(sent.contains(
        """Content-Disposition: form-data; name="file"; """ +
          """filename="document.pdf""""))
      assert(sent.contains("Content-Type: application/pdf"))
      assert(sent.contains("%PDF"))
      // a job that never completes times out at the poller deadline
      val never = new graft.text.Poller(deadlineMs = 5, intervalMs = 1)
      polls.set(-1000000)
      intercept[java.util.concurrent.TimeoutException] {
        graft.text.LlamaParseExtractor(http, never)
          .extractImage(Array[Byte](1))
      }
    } finally server.stop(0)
  }

  test("embedder validates vector count and dimension from the provider") {
    val stub = new Stub
    try {
      // dim mismatch: provider returns dim 4, embedder declares 8
      val emb = HttpEmbedder("stub-model", dim = 8,
        HttpJson(stub.url("/embed"), rps = 1000.0, burst = 4))
      intercept[IllegalArgumentException] { emb.embedChunk("abc") }
    } finally stub.stop()
  }
}
