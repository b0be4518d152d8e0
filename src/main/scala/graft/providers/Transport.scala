package graft.providers

import java.nio.charset.StandardCharsets

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.text.Embedder
import graft.rank.Reranker

/** Rate-limited provider transport — the network SHELL of the
  * reference's embedding/rerank/LLM clients rebuilt for batch Spark:
  * token-bucket rate limiting (/root/reference/vechord/utils.py:9-16
  * RPS constants, :38-68 limited async transports), bounded retry with
  * backoff + deadline (provider.py:240-254's polling discipline), and
  * a BATCHED `mapPartitions` embedding stage so executor-side ingest
  * hits a provider at a bounded rate with bounded request sizes.
  *
  * Scale contract: one [[TokenBucket]] per (endpoint key) per JVM —
  * i.e. per EXECUTOR. On a cluster, size `rps` as provider_cap /
  * executor_count; tasks sharing an executor share its bucket (the
  * same way the reference's 16-connection pool bounds one process).
  * All transports are deterministic-free network code: correctness
  * tests drive them against an in-process JDK HttpServer stub
  * (TransportSpec), real keys are a config swap.
  */
object RateLimiters {
  private val buckets = TrieMap.empty[String, TokenBucket]
  /** The JVM-wide bucket for `key` (first caller's rps/burst win). */
  def get(key: String, rps: Double, burst: Int): TokenBucket =
    buckets.getOrElseUpdate(key, new TokenBucket(rps, burst))
  /** Test hook: drop a bucket so a fresh rate takes effect. */
  def reset(key: String): Unit = buckets.remove(key)
}

/** Thread-safe token bucket: capacity `burst`, continuous refill at
  * `rps` tokens/second; [[acquire]] blocks until a token is available.
  * The utils.py:38-68 `RateLimitedTransport` twin. */
final class TokenBucket(rps: Double, burst: Int) extends Serializable {
  require(rps > 0 && burst >= 1, "rps must be > 0, burst >= 1")
  private var tokens: Double = burst.toDouble
  private var last: Long = System.nanoTime()
  def acquire(): Unit = synchronized {
    while (true) {
      val now = System.nanoTime()
      tokens = math.min(burst.toDouble, tokens + (now - last) * 1e-9 * rps)
      last = now
      if (tokens >= 1.0) { tokens -= 1.0; return }
      wait(math.max(1L, ((1.0 - tokens) / rps * 1000).toLong))
    }
  }
}

/** One provider endpoint: rate-limited JSON-over-HTTP POST with retry.
  * Retries 429 and 5xx (and connection failures) up to `maxRetries`
  * times with exponential backoff, each attempt re-acquiring the rate
  * limiter; other statuses fail immediately. `deadlineMs` bounds the
  * WHOLE call including backoff — the provider.py:240-254 deadline
  * discipline. Serializable: ships into mapPartitions closures; the
  * HttpClient is rebuilt lazily per JVM. */
final case class HttpJson(endpoint: String, rps: Double = 8.0,
                          burst: Int = 1, maxRetries: Int = 4,
                          deadlineMs: Long = 60000,
                          backoffMs: Long = 100,
                          headers: Map[String, String] = Map.empty)
  extends Serializable {

  @transient private lazy val client = java.net.http.HttpClient
    .newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(deadlineMs))
    .build()

  /** Shared rate-limited retry ladder: `mk` builds the request from the
    * remaining per-call deadline. 200 returns the body; 429/5xx/IO
    * retry with exponential backoff; other statuses fail fast. */
  private def retryLoop(mk: Long => java.net.http.HttpRequest): String = {
    val deadline = System.nanoTime() + deadlineMs * 1000000L
    var attempt = 0
    var backoff = backoffMs
    while (true) {
      RateLimiters.get(endpoint, rps, burst).acquire()
      val req = mk(math.max(1L, (deadline - System.nanoTime()) / 1000000L))
      val status =
        try {
          val resp = client.send(req,
            java.net.http.HttpResponse.BodyHandlers.ofString())
          if (resp.statusCode() == 200) return resp.body()
          resp.statusCode()
        } catch { case _: java.io.IOException => -1 } // retryable
      val retryable = status == -1 || status == 429 || status >= 500
      if (!retryable)
        throw new IllegalStateException(s"$endpoint returned $status")
      attempt += 1
      if (attempt > maxRetries || System.nanoTime() +
          backoff * 1000000L > deadline)
        throw new IllegalStateException(
          s"$endpoint failed after $attempt attempts (last status $status)")
      Thread.sleep(backoff)
      backoff *= 2
    }
    throw new IllegalStateException("unreachable")
  }

  private def builder(url: String,
                      timeoutMs: Long): java.net.http.HttpRequest.Builder = {
    val b = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(url))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
    headers.foreach { case (k, v) => b.header(k, v) }
    b
  }

  def post(body: String): String =
    retryLoop(t => builder(endpoint, t)
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers
        .ofString(body, StandardCharsets.UTF_8)).build())

  /** `multipart/form-data` POST of one file part (the LlamaParse upload
    * shape, provider.py:227-231), same bucket + retry ladder as
    * [[post]]; `url` defaults to the configured endpoint so one
    * HttpJson (= one rate bucket) can serve a provider's whole API. */
  def postMultipart(url: String, field: String, filename: String,
                    mime: String, content: Array[Byte]): String = {
    val boundary = "----graft" + java.util.UUID.randomUUID().toString
    val head = (s"--$boundary\r\n" +
      s"""Content-Disposition: form-data; name="$field"; """ +
      s"""filename="$filename"\r\n""" +
      s"Content-Type: $mime\r\n\r\n").getBytes(StandardCharsets.UTF_8)
    val tail = s"\r\n--$boundary--\r\n".getBytes(StandardCharsets.UTF_8)
    val body = head ++ content ++ tail
    retryLoop(t => builder(url, t)
      .header("Content-Type", s"multipart/form-data; boundary=$boundary")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofByteArray(body))
      .build())
  }

  /** ONE rate-limited GET attempt, no retry ladder — poll loops (the
    * LlamaParse job-result wait, provider.py:240-254) own their
    * repetition and deadline; returns (status, body), -1 on IO error. */
  def getOnce(url: String): (Int, String) = {
    RateLimiters.get(endpoint, rps, burst).acquire()
    val req = builder(url, deadlineMs).GET().build()
    try {
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    } catch { case _: java.io.IOException => (-1, "") }
  }
}

/** JSON helpers shared by the provider clients (json4s ships on the
  * Spark classpath — the same dependency-free choice as the service). */
private object Js {
  def str(s: String): String = JsonMethods.compact(JsonMethods.render(
    JString(s)))
  def floats(v: JValue): Array[Float] = v match {
    case JArray(xs) => xs.map {
      case JDouble(d) => d.toFloat
      case JInt(i) => i.toFloat
      case JLong(l) => l.toFloat
      case JDecimal(d) => d.toFloat
      case other => throw new IllegalStateException(s"non-number: $other")
    }.toArray
    case other => throw new IllegalStateException(s"non-array: $other")
  }
}

/** HTTP embedding provider behind the existing [[Embedder]] seat — the
  * embedding.py:114-441 client family's transport, minus the network
  * assumptions. Protocol (the common denominator of those providers):
  * POST {"model": name, "task": "chunk"|"query", "input": [texts]} →
  * {"data": [[floats], ...]} in input order. Single-row calls go
  * through [[embedChunk]]/[[embedQuery]]; bulk ingest should use
  * [[RemoteEmbed.withEmbeddingBatched]] (one request per `batchSize`
  * rows instead of per row). */
/** Batch-capable remote embedder: one request per ingest batch instead
  * of one per row ([[RemoteEmbed.withEmbeddingBatched]]). `task` is the
  * engine's generic intent — `"chunk"` (document side) or `"query"` —
  * which each adapter maps to its provider's own vocabulary (Jina
  * `retrieval.passage`/`retrieval.query`, Voyage `document`/`query`,
  * OpenAI ignores it). */
trait BatchEmbedder extends Embedder {
  def embedBatch(texts: Seq[String], task: String): Seq[Array[Float]]
}

final case class HttpEmbedder(name: String, dim: Int, http: HttpJson)
  extends BatchEmbedder {

  def embedBatch(texts: Seq[String],
                 task: String): Seq[Array[Float]] = {
    val body = JsonMethods.compact(JsonMethods.render(JObject(
      "model" -> JString(name), "task" -> JString(task),
      "input" -> JArray(texts.map(JString(_)).toList))))
    val data = JsonMethods.parse(http.post(body)) \ "data"
    val vecs = data match {
      case JArray(items) => items.map(Js.floats)
      case other => throw new IllegalStateException(s"bad response: $other")
    }
    require(vecs.length == texts.length && vecs.forall(_.length == dim),
      s"provider returned ${vecs.length} vectors (dims ${vecs.map(_.length)
        .distinct.mkString(",")}) for ${texts.length} texts of dim $dim")
    vecs
  }

  def embedChunk(text: String): Array[Float] =
    embedBatch(Seq(text), "chunk").head
  override def embedQuery(text: String): Array[Float] =
    embedBatch(Seq(text), "query").head
}

/** HTTP cross-encoder behind the [[Reranker]] seat (rerank.py:28-92):
  * POST {"model", "query", "documents"} → {"order": [indices]}. */
final case class HttpReranker(name: String, http: HttpJson)
  extends Reranker {
  def rerank(query: String, docs: Seq[String]): Seq[Int] = {
    val body = JsonMethods.compact(JsonMethods.render(JObject(
      "model" -> JString(name), "query" -> JString(query),
      "documents" -> JArray(docs.map(JString(_)).toList))))
    JsonMethods.parse(http.post(body)) \ "order" match {
      case JArray(xs) => xs.map {
        case JInt(i) => i.toInt
        case JLong(l) => l.toInt
        case JDouble(d) => d.toInt
        case other => throw new IllegalStateException(s"non-int: $other")
      }
      case other => throw new IllegalStateException(s"bad response: $other")
    }
  }
}

/** HTTP LLM completion behind a minimal prompt→text seat (the
  * augmenter/judge/LLM-chunker providers all reduce to this shape):
  * POST {"model", "prompt"} → {"text": "..."}. */
final case class HttpCompleter(name: String, http: HttpJson)
  extends Serializable {
  def complete(prompt: String): String = {
    val body = JsonMethods.compact(JsonMethods.render(JObject(
      "model" -> JString(name), "prompt" -> JString(prompt))))
    JsonMethods.parse(http.post(body)) \ "text" match {
      case JString(s) => s
      case other => throw new IllegalStateException(s"bad response: $other")
    }
  }
}

object RemoteEmbed {
  /** Batched executor-side embedding stage: each partition's rows are
    * grouped into ≤`batchSize` requests, each request passing through
    * the per-executor token bucket — N rows cost ceil(N/batchSize)
    * provider calls, never N. Map-only (no shuffle), preserves all
    * input columns and appends `outCol` as array<float>. This is the
    * shape the reference's per-row async client amortizes with its
    * connection pool; batch-first Spark amortizes it with batching. */
  def withEmbeddingBatched(df: DataFrame, textCol: String, outCol: String,
                           embedder: BatchEmbedder, batchSize: Int = 32,
                           task: String = "chunk"): DataFrame = {
    require(batchSize >= 1, "batchSize must be >= 1")
    val schema = df.schema.add(outCol,
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType))
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        val vecs = embedder.embedBatch(
          rows.map(_.getAs[String](textCol)), task)
        rows.iterator.zip(vecs.iterator).map { case (r, v) =>
          Row.fromSeq(r.toSeq :+ v.toSeq)
        }
      }
    }(Encoders.row(schema))
  }
}
