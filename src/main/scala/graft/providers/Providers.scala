package graft.providers

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.functions.{SparseEmbedder, SparseVec}
import graft.rank.Reranker
import graft.text.Embedder

/** Per-provider WIRE adapters — the exact request/response schemas of
  * the reference's embedding and rerank clients, shaped on top of the
  * rate-limited [[HttpJson]] transport, behind the same [[Embedder]] /
  * [[Reranker]] / [[SparseEmbedder]] seats the rest of the engine
  * consumes. Transport mechanics (token bucket, retry ladder, deadline)
  * live in [[HttpJson]]; these classes are pure request shaping:
  *
  *  - Gemini   `models/{m}:embedContent` — /root/reference/vechord/
  *    embedding.py:114-160, model/gemini.py:124-150, provider.py:85-118
  *  - Jina     `/v1/embeddings` — embedding.py:163-264, model/jina.py:25-86
  *  - Voyage   `/v1/embeddings` — embedding.py:267-369, model/voyage.py:39-58
  *  - OpenAI   `/v1/embeddings` — embedding.py:372-410
  *  - SPLADE   `/inference` sparse — embedding.py:413-441
  *  - Jina/Cohere rerank — rerank.py:28-92, model/jina.py:89-146
  *
  * Auth rides in the [[HttpJson]] headers (provider.py puts it on the
  * client the same way): Gemini `x-goog-api-key: KEY`, everything else
  * `Authorization: Bearer KEY`. Each adapter documents its endpoint; the
  * tests drive the full shape against an in-process HTTP stub, so a
  * real key + real endpoint is a config swap.
  */
object Wire {
  private[providers] def compact(v: JValue): String =
    JsonMethods.compact(JsonMethods.render(v))

  private[providers] def num(v: JValue): Double = v match {
    case JDouble(d) => d
    case JInt(i) => i.toDouble
    case JLong(l) => l.toDouble
    case JDecimal(d) => d.toDouble
    case other => throw new IllegalStateException(s"non-number: $other")
  }

  private[providers] def ints(v: JValue): Seq[Int] = v match {
    case JArray(xs) => xs.map(x => num(x).toInt)
    case other => throw new IllegalStateException(s"non-array: $other")
  }

  /** `data: [{index, embedding}]` → vectors in INDEX order (Jina,
    * Voyage, and OpenAI all share this envelope). */
  private[providers] def dataEmbeddings(resp: JValue, n: Int,
                                        dim: Int): Seq[Array[Float]] = {
    val items = resp \ "data" match {
      case JArray(xs) => xs
      case other => throw new IllegalStateException(s"bad response: $other")
    }
    require(items.length == n,
      s"provider returned ${items.length} embeddings for $n inputs")
    val byIdx = items.map { it =>
      (num(it \ "index").toInt, Js.floats(it \ "embedding"))
    }.sortBy(_._1).map(_._2)
    require(byIdx.forall(_.length == dim),
      s"provider returned dims ${byIdx.map(_.length).distinct
        .mkString(",")}, expected $dim")
    byIdx
  }
}

/** Gemini dense embedding (embedding.py:114-160): one text per call —
  * `POST {base}/v1beta/models/{model}:embedContent` with
  * `{"taskType": …, "content": {"parts": [{"text": …}]}}` →
  * `{"embedding": {"values": [floats]}}`. `http.endpoint` must already
  * point at the model's `:embedContent` URL (provider.py:105-108
  * builds it the same way); header `x-goog-api-key`. */
final case class GeminiEmbedder(model: String, dim: Int, http: HttpJson)
  extends Embedder {
  def name: String = s"gemini_emb_${model}_$dim"

  private def embed(text: String, taskType: String): Array[Float] = {
    val body = Wire.compact(JObject(
      "taskType" -> JString(taskType),
      "content" -> JObject("parts" -> JArray(List(
        JObject("text" -> JString(text)))))))
    val vec = Js.floats(JsonMethods.parse(http.post(body)) \
      "embedding" \ "values")
    require(vec.length == dim,
      s"gemini returned dim ${vec.length}, expected $dim")
    vec
  }

  def embedChunk(text: String): Array[Float] =
    embed(text, "RETRIEVAL_DOCUMENT")
  override def embedQuery(text: String): Array[Float] =
    embed(text, "RETRIEVAL_QUERY")
}

/** Jina dense embedding (embedding.py:163-264): batch-capable —
  * `POST https://api.jina.ai/v1/embeddings` with `{"model",
  * "dimensions", "truncate": true, "task", "embedding_type": "float",
  * "input": [{"text": …}, …]}` → `{"data": [{"index", "embedding"}]}`.
  * The reference requests base64-packed floats (model/jina.py:40);
  * this adapter requests the schema's plain-float variant — same
  * endpoint, same fields, JSON-native payload. */
final case class JinaEmbedder(model: String, dim: Int, http: HttpJson)
  extends BatchEmbedder {
  def name: String = s"jina_emb_${model}_$dim"

  private[providers] def embedTask(texts: Seq[String],
                                   jinaTask: String): Seq[Array[Float]] = {
    val body = Wire.compact(JObject(
      "model" -> JString(model),
      "dimensions" -> JInt(dim),
      "truncate" -> JBool(true),
      "task" -> JString(jinaTask),
      "embedding_type" -> JString("float"),
      "input" -> JArray(texts.map(t =>
        JObject("text" -> JString(t)): JValue).toList)))
    Wire.dataEmbeddings(JsonMethods.parse(http.post(body)),
      texts.length, dim)
  }

  def embedBatch(texts: Seq[String], task: String): Seq[Array[Float]] =
    embedTask(texts,
      if (task == "query") "retrieval.query" else "retrieval.passage")

  def embedChunk(text: String): Array[Float] =
    embedBatch(Seq(text), "chunk").head
  override def embedQuery(text: String): Array[Float] =
    embedBatch(Seq(text), "query").head
}

/** Voyage dense embedding (embedding.py:267-369): batch-capable —
  * `POST https://api.voyageai.com/v1/embeddings` with `{"model",
  * "input": [texts], "input_type": "document"|"query", "truncation":
  * true, "output_dimension", "output_dtype": "float"}` → `{"data":
  * [{"embedding", "index"}]}`. (The reference adds `encoding_format:
  * base64`; omitted here = the API's plain-float JSON.) */
final case class VoyageEmbedder(model: String, dim: Int, http: HttpJson)
  extends BatchEmbedder {
  def name: String = s"voyage_emb_${model}_$dim"

  private[providers] def embedInputType(texts: Seq[String],
                                        inputType: String): Seq[Array[Float]] = {
    val body = Wire.compact(JObject(
      "model" -> JString(model),
      "input" -> JArray(texts.map(JString(_): JValue).toList),
      "input_type" -> JString(inputType),
      "truncation" -> JBool(true),
      "output_dimension" -> JInt(dim),
      "output_dtype" -> JString("float")))
    Wire.dataEmbeddings(JsonMethods.parse(http.post(body)),
      texts.length, dim)
  }

  def embedBatch(texts: Seq[String], task: String): Seq[Array[Float]] =
    embedInputType(texts, if (task == "query") "query" else "document")

  def embedChunk(text: String): Array[Float] =
    embedBatch(Seq(text), "chunk").head
  override def embedQuery(text: String): Array[Float] =
    embedBatch(Seq(text), "query").head
}

/** OpenAI dense embedding (embedding.py:372-410, via the openai SDK —
  * the wire shape is the public `/v1/embeddings` API): `{"model",
  * "input": [texts], "dimensions"}` → `{"data": [{"index",
  * "embedding"}]}`; `Authorization: Bearer KEY`. */
final case class OpenAiEmbedder(model: String, dim: Int, http: HttpJson)
  extends BatchEmbedder {
  def name: String = s"openai_emb_${model}_$dim"

  /** OpenAI's API has no document/query distinction — `task` ignored. */
  def embedBatch(texts: Seq[String], task: String): Seq[Array[Float]] = {
    val body = Wire.compact(JObject(
      "model" -> JString(model),
      "input" -> JArray(texts.map(JString(_): JValue).toList),
      "dimensions" -> JInt(dim)))
    Wire.dataEmbeddings(JsonMethods.parse(http.post(body)),
      texts.length, dim)
  }

  def embedChunk(text: String): Array[Float] =
    embedBatch(Seq(text), "chunk").head
}

/** Jina MULTIMODAL embedding (embedding.py:208-264, model/jina.py:
  * 19-67): same `/v1/embeddings` endpoint as the text adapter; each
  * provided part — text, image bytes (bare base64), image URL — is its
  * OWN input item in reference order (text, image, image_url;
  * jina.py:61-66), and like the reference's `get_emb` the FIRST
  * returned embedding is the result (jina.py:79-86 takes `data[0]`
  * even when several inputs were sent). */
final case class JinaMultimodalEmbedder(
    model: String = "jina-embeddings-v4",
    dim: Int, http: HttpJson) extends Serializable {
  val supportsMultiModal = true
  def name: String = s"jina_mm_emb_${model}_$dim"

  def embed(text: Option[String] = None,
            image: Option[Array[Byte]] = None,
            imageUrl: Option[String] = None,
            task: String = "retrieval.passage"): Array[Float] = {
    require(text.nonEmpty || image.nonEmpty || imageUrl.nonEmpty,
      "at least one of text, image must be provided")
    val inputs: List[JValue] =
      text.map(t => JObject("text" -> JString(t)): JValue).toList ++
        image.map(b => JObject("image" -> JString(java.util.Base64
          .getEncoder.encodeToString(b))): JValue).toList ++
        imageUrl.map(u => JObject("image" -> JString(u)): JValue).toList
    val body = Wire.compact(JObject(
      "model" -> JString(model),
      "dimensions" -> JInt(dim),
      "truncate" -> JBool(true),
      "task" -> JString(task),
      "embedding_type" -> JString("float"),
      "input" -> JArray(inputs)))
    val first = JsonMethods.parse(http.post(body)) \ "data" match {
      case JArray(xs) if xs.nonEmpty =>
        xs.minBy(it => Wire.num(it \ "index").toInt)
      case other => throw new IllegalStateException(s"bad response: $other")
    }
    val vec = Js.floats(first \ "embedding")
    require(vec.length == dim,
      s"jina returned dim ${vec.length}, expected $dim")
    vec
  }

  def embedQuery(text: Option[String] = None,
                 image: Option[Array[Byte]] = None,
                 imageUrl: Option[String] = None): Array[Float] =
    embed(text, image, imageUrl, task = "retrieval.query")
}

/** Voyage MULTIMODAL embedding (embedding.py:311-369, model/voyage.py:
  * 60-111): `POST {base}/v1/multimodalembeddings` with ONE input whose
  * `content` list carries the typed parts in reference order — text,
  * image_url, then image bytes as a `data:image/jpeg;base64,…` URI
  * (voyage.py:96-106) — plus `input_type`/`truncation`; first returned
  * embedding is the result. (The reference adds `encoding_format:
  * base64`; omitted here = the API's plain-float JSON, same as the
  * dense adapter.) */
final case class VoyageMultimodalEmbedder(
    model: String = "voyage-multimodal-3",
    dim: Int, http: HttpJson) extends Serializable {
  val supportsMultiModal = true
  def name: String = s"voyage_multimodal_emb_${model}_$dim"

  def embed(text: Option[String] = None,
            image: Option[Array[Byte]] = None,
            imageUrl: Option[String] = None,
            inputType: String = "document"): Array[Float] = {
    require(text.nonEmpty || image.nonEmpty || imageUrl.nonEmpty,
      "at least one of text, image_url, or image must be provided")
    val content: List[JValue] =
      text.map(t => JObject("type" -> JString("text"),
        "text" -> JString(t)): JValue).toList ++
        imageUrl.map(u => JObject("type" -> JString("image_url"),
          "image_url" -> JString(u)): JValue).toList ++
        image.map(b => JObject("type" -> JString("image_base64"),
          "image_base64" -> JString("data:image/jpeg;base64," +
            java.util.Base64.getEncoder.encodeToString(b))): JValue).toList
    val body = Wire.compact(JObject(
      "model" -> JString(model),
      "inputs" -> JArray(List(JObject("content" -> JArray(content)))),
      "input_type" -> JString(inputType),
      "truncation" -> JBool(true)))
    val first = JsonMethods.parse(http.post(body)) \ "data" match {
      case JArray(xs) if xs.nonEmpty =>
        xs.minBy(it => Wire.num(it \ "index").toInt)
      case other => throw new IllegalStateException(s"bad response: $other")
    }
    val vec = Js.floats(first \ "embedding")
    require(vec.length == dim,
      s"voyage returned dim ${vec.length}, expected $dim")
    vec
  }

  def embedQuery(text: Option[String] = None,
                 image: Option[Array[Byte]] = None,
                 imageUrl: Option[String] = None): Array[Float] =
    embed(text, image, imageUrl, inputType = "query")
}

/** Gemini generateContent completer (provider.py:54-82, model/gemini.py:
  * 30-98): `{"contents": {"parts": [{"text": prompt}[, {"inline_data":
  * {"mime_type", "data": base64}}]]}[, "generationConfig":
  * {"response_mime_type": "application/json", "response_json_schema":
  * …}]}` → first candidate's first part text (gemini.py:101-108). This
  * is the provider behind the reference's gemini OCR extractor, entity
  * recognizer and UMBRELA evaluator seats; `http.endpoint` must point
  * at the model's `:generateContent` URL, header `x-goog-api-key`. */
final case class GeminiCompleter(model: String = "gemini-2.5-flash",
                                 http: HttpJson) extends Serializable {
  def name: String = s"gemini_gen_$model"

  def complete(prompt: String,
               inlineData: Option[(String, Array[Byte])] = None,
               responseJsonSchema: Option[String] = None): String = {
    val parts: List[JValue] =
      (JObject("text" -> JString(prompt)): JValue) ::
        inlineData.map { case (mime, bytes) =>
          JObject("inline_data" -> JObject(
            "mime_type" -> JString(mime),
            "data" -> JString(java.util.Base64.getEncoder
              .encodeToString(bytes)))): JValue
        }.toList
    val fields =
      List("contents" -> (JObject("parts" -> JArray(parts)): JValue)) ++
        responseJsonSchema.map(s => "generationConfig" -> (JObject(
          "response_mime_type" -> JString("application/json"),
          "response_json_schema" -> JsonMethods.parse(s)): JValue))
    val resp = JsonMethods.parse(http.post(Wire.compact(JObject(
      fields: _*))))
    resp \ "candidates" match {
      case JArray(c :: _) => c \ "content" \ "parts" match {
        case JArray(p :: _) => p \ "text" match {
          case JString(s) => s
          case _ => "" // gemini.py:106-108: missing text -> empty
        }
        case other =>
          throw new IllegalStateException(s"bad response: $other")
      }
      case other => throw new IllegalStateException(s"bad response: $other")
    }
  }
}

/** SPLADE++ sparse embedding (embedding.py:413-441): the body is a BARE
  * JSON array of texts to `{base}/inference`, the response a list of
  * `{"dim", "indices", "values"}` objects (model/internal.py:43-46) in
  * input order. */
final case class SpladeEmbedder(dim: Int, http: HttpJson)
  extends SparseEmbedder {
  def name: String = s"spladepp_emb_$dim"

  private[providers] def embedBatch(texts: Seq[String]): Seq[SparseVec] = {
    val body = Wire.compact(JArray(texts.map(JString(_): JValue).toList))
    JsonMethods.parse(http.post(body)) match {
      case JArray(items) =>
        require(items.length == texts.length,
          s"splade returned ${items.length} vectors for ${texts.length}")
        items.map { it =>
          SparseVec(Wire.ints(it \ "indices"),
            Js.floats(it \ "values").toSeq)
        }
      case other => throw new IllegalStateException(s"bad response: $other")
    }
  }

  def embed(text: String): SparseVec = embedBatch(Seq(text)).head
}

/** Jina rerank (rerank.py:66-92, model/jina.py:89-146):
  * `POST https://api.jina.ai/v1/rerank` with `{"model", "query",
  * "top_n": |docs|, "documents": …, "return_documents": false}` —
  * documents are plain strings for `jina-reranker-v2-base-multilingual`
  * and `{"text": …}` objects for the multimodal `jina-reranker-m0`
  * (from_query_docs branches exactly so) → `{"results": [{"index",
  * "relevance_score"}]}`, best first. */
final case class JinaWireReranker(
    model: String = "jina-reranker-v2-base-multilingual",
    http: HttpJson) extends Reranker {
  def name: String = s"jina_rerank_$model"

  def rerank(query: String, docs: Seq[String]): Seq[Int] = {
    val documents: JValue =
      if (model == "jina-reranker-m0")
        JArray(docs.map(d => JObject("text" -> JString(d)): JValue).toList)
      else JArray(docs.map(JString(_): JValue).toList)
    val body = Wire.compact(JObject(
      "model" -> JString(model),
      "query" -> JString(query),
      "top_n" -> JInt(docs.length),
      "documents" -> documents,
      "return_documents" -> JBool(false)))
    resultsIndices(http.post(body))
  }

  /** `{"results": [{"index": i, …}]}` in ranked order — shared with the
    * Cohere twin (both APIs use this envelope). */
  private[providers] def resultsIndices(resp: String): Seq[Int] =
    JsonMethods.parse(resp) \ "results" match {
      case JArray(xs) => xs.map(x => Wire.num(x \ "index").toInt)
      case other => throw new IllegalStateException(s"bad response: $other")
    }
}

/** Cohere rerank (rerank.py:28-63, via the cohere SDK — the wire shape
  * is the public `/v2/rerank` API): `{"model", "query", "documents":
  * [texts]}` → `{"results": [{"index", "relevance_score"}]}`, best
  * first; `Authorization: Bearer KEY`. */
final case class CohereReranker(model: String = "rerank-v3.5",
                                http: HttpJson) extends Reranker {
  def name: String = s"cohere_rerank_$model"

  def rerank(query: String, docs: Seq[String]): Seq[Int] = {
    val body = Wire.compact(JObject(
      "model" -> JString(model),
      "query" -> JString(query),
      "documents" -> JArray(docs.map(JString(_): JValue).toList)))
    JsonMethods.parse(http.post(body)) \ "results" match {
      case JArray(xs) => xs.map(x => Wire.num(x \ "index").toInt)
      case other => throw new IllegalStateException(s"bad response: $other")
    }
  }
}
