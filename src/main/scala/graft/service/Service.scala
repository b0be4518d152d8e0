package graft.service

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.json4s._
import org.json4s.jackson.JsonMethods

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import org.apache.spark.sql.{functions => F}

import graft.core.Registry
import graft.core.Spec.TableDef
import graft.pipeline.Dynamic

/** HTTP service layer — the S10 twin of the reference's Falcon app
  * (/root/reference/vechord/service.py:199-229): health check
  * `GET /`, per-registered-table `GET/POST/DELETE /api/table/{name}`
  * (select_by with query-param equality filters / JSON insert /
  * remove_by), the dynamic pipeline `POST /api/run`
  * (model/web.py:29-38 RunRequest: name + base64 data + steps →
  * ingest ack or search response), and `GET /openapi/spec.json`.
  *
  * Built on the JDK's HttpServer + the json4s already on Spark's
  * classpath — zero new dependencies. The service is a DRIVER-side
  * facade: every request plans a Spark job through the same Registry /
  * Dynamic operators the batch API uses, so cluster-side semantics
  * (transactions, segment versioning, index usage) are identical to
  * the programmatic path. Serving here is control-plane (ingest jobs,
  * occasional queries); a high-QPS ANN serving tier is explicitly out
  * of scope, matching SURVEY §2.1's scoping of the reference service.
  */
final class GraftService(reg: Registry, tables: Seq[TableDef[_]],
                         chunks: TableDef[Dynamic.DynChunk] =
                           Dynamic.chunkDef(),
                         port: Int = 0) {

  /** Reserved GET query params (not column filters). */
  private val ReservedParams = Set("_limit", "_cols")
  /** Default GET row cap — overridable per-request via `_limit`. */
  private val DefaultGetLimit = 10000

  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
  server.setExecutor(pool)

  /** The bound port (useful with port = 0 → ephemeral). */
  def boundPort: Int = server.getAddress.getPort

  def start(): GraftService = {
    reg.register(chunks)
    server.createContext("/", exchange(health))
    tables.foreach { td =>
      reg.register(td)
      server.createContext(s"/api/table/${td.name}", exchange(tableRoute(td)))
    }
    server.createContext("/api/run", exchange(run))
    server.createContext("/openapi/spec.json", exchange(openapi))
    server.start()
    this
  }

  def stop(): Unit = { server.stop(0); pool.shutdown() }

  // ---- routing plumbing -------------------------------------------------

  private type Reply = (Int, String, String) // status, contentType, body

  /** service.py:65-74 uncaught_exception_handler: RequestError → 400,
    * anything else → 500 with the path as title. */
  private def exchange(f: HttpExchange => Reply)
      : com.sun.net.httpserver.HttpHandler = { ex =>
    val (status, ctype, body) =
      try f(ex)
      catch {
        case e: Dynamic.RequestError => (400, "application/json",
          err(ex.getRequestURI.getPath, e.getMessage))
        case e: IllegalArgumentException => (400, "application/json",
          err(ex.getRequestURI.getPath, e.getMessage))
        case e: Exception => (500, "application/json",
          err(ex.getRequestURI.getPath, String.valueOf(e.getMessage)))
      }
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", ctype)
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def err(title: String, msg: String): String =
    JsonMethods.compact(JsonMethods.render(
      JObject("title" -> JString(title), "description" -> JString(msg))))

  private def health(ex: HttpExchange): Reply =
    if (ex.getRequestURI.getPath == "/" && ex.getRequestMethod == "GET")
      (200, "text/plain", "Ok")
    else (404, "text/plain", "Not Found")

  private def body(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  private def rawParams(ex: HttpExchange): Map[String, String] = {
    val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    q.split("&").filter(_.contains("=")).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      java.net.URLDecoder.decode(k, "UTF-8") ->
        java.net.URLDecoder.decode(v, "UTF-8")
    }.toMap
  }

  /** `?col=v&col2=v2` → typed equality filters per the table schema.
    * Unknown columns are a 400 (IllegalArgumentException), not a
    * planning-time 500. */
  private def params(ex: HttpExchange, td: TableDef[_]): Map[String, Any] =
    (rawParams(ex) -- ReservedParams).map { case (key, value) =>
      require(td.columns.contains(key),
        s"unknown column for table ${td.name}: $key")
      key -> cast(td, key, value)
    }

  private def cast(td: TableDef[_], field: String, v: String): Any =
    td.schema.fields.find(_.name == field).map(_.dataType) match {
      case Some(LongType) => v.toLong
      case Some(IntegerType) => v.toInt
      case Some(DoubleType) => v.toDouble
      case Some(FloatType) => v.toFloat
      case Some(BooleanType) => v.toBoolean
      case _ => v
    }

  // ---- /api/table/{name} ------------------------------------------------

  private def tableRoute(td: TableDef[_])(ex: HttpExchange): Reply =
    ex.getRequestMethod match {
      case "GET" =>
        // reserved params expose selectBy's existing projection/limit
        // surface (Registry.selectBy, the reference's LIMIT at
        // client.py:223-224): `_cols` = comma-separated projection,
        // `_limit` = row cap. The cap defaults to DefaultGetLimit so
        // the route never materializes an unbounded table on the
        // driver.
        val raw = rawParams(ex)
        // non-negative only: selectBy treats limit < 0 as "no limit",
        // so a signed value here would let a client disable the
        // unbounded-collect guard per-request (advisor r6)
        val limit = raw.get("_limit").map { v =>
          require(v.matches("\\d+"),
            s"_limit must be a non-negative integer: $v")
          v.toInt
        }.getOrElse(DefaultGetLimit)
        val cols = raw.get("_cols")
          .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
          .getOrElse(Nil)
        cols.foreach(c => require(td.columns.contains(c),
          s"unknown column for table ${td.name}: $c"))
        val rows = reg.selectBy(td, params(ex, td), cols, limit)
          .toJSON.collect()
        (200, "application/json", rows.mkString("[", ",", "]"))
      case "POST" =>
        val spark = reg.spark
        import spark.implicits._
        val raw = body(ex).trim
        require(raw.nonEmpty, "empty request body for table " + td.name)
        val df = spark.read.schema(td.schema)
          .json(spark.createDataset(Seq(raw)))
          .select(td.columns.map(F.col): _*)
        // validate EVERY record, not just the first: a malformed record
        // parses to an all-null row, and a client-keyed table (manual
        // IdGen) must carry its primary key on each record. Optional
        // nullable fields are fine — only these two conditions reject.
        val allNull = td.columns.map(F.col(_).isNull)
          .reduceOption(_ && _).getOrElse(F.lit(false))
        val pkNull =
          if (td.primaryKey.isDefined && td.idGen == graft.core.Spec.IdGen.Manual)
            F.col(td.pk).isNull
          else F.lit(false)
        val counts = df.agg(F.count(F.lit(1)),
          F.sum(F.when(allNull || pkNull, 1).otherwise(0))).head()
        require(counts.getLong(0) > 0,
          "empty request body for table " + td.name)
        require(counts.getLong(1) == 0,
          "invalid record(s) in request body for table " + td.name)
        reg.copyBulk(td, df)
        (201, "application/json", "{}")
      case "DELETE" =>
        reg.removeBy(td, params(ex, td))
        (200, "application/json", "{}")
      case m => (405, "text/plain", s"method $m not allowed")
    }

  // ---- /api/run ---------------------------------------------------------

  /** RunRequest twin (model/web.py:29-38): `data` is base64 (the JSON
    * encoding of msgspec `bytes`); steps resolve through
    * [[Dynamic.fromSteps]] with the reference's validation errors. */
  private def run(ex: HttpExchange): Reply = {
    if (ex.getRequestMethod != "POST")
      return (405, "text/plain", "method not allowed")
    val json = JsonMethods.parse(body(ex))
    val name = str(json \ "name").getOrElse(
      throw Dynamic.RequestError("missing field: name"))
    val rawData: Array[Byte] = str(json \ "data")
      .map(java.util.Base64.getDecoder.decode)
      .getOrElse(Array.emptyByteArray)
    val data = new String(rawData, StandardCharsets.UTF_8)
    // RunRequest.input_type (model/web.py:23-37): exactly "text"
    // (default), "pdf", or "image/jpeg" — anything else is a 400 like
    // the reference's msgspec enum validation, never a silent
    // image-branch fallback
    val inputType = str(json \ "input_type").getOrElse("text")
    if (!Set("text", "pdf", "image/jpeg").contains(inputType))
      throw Dynamic.RequestError(s"invalid input_type: $inputType " +
        "(expected text, pdf, or image/jpeg)")
    val steps = (json \ "steps") match {
      case JArray(arr) => arr.map { s =>
        Dynamic.ResourceRequest(
          str(s \ "kind").getOrElse(
            throw Dynamic.RequestError("step missing kind")),
          str(s \ "provider").getOrElse(
            throw Dynamic.RequestError("step missing provider")),
          (s \ "args") match {
            case JObject(fields) => fields.collect {
              case (k, JString(v)) => k -> v
              case (k, JInt(v)) => k -> v.toString
            }.toMap
            case _ => Map.empty[String, String]
          })
      }
      case _ => Nil
    }
    val cfg = Dynamic.fromSteps(steps).validate()
    if (cfg.index) {
      val spark = reg.spark
      import spark.implicits._
      // stable per-request doc id from the request name (the reference
      // keys ingests by name too, model/web.py:35)
      val docId = math.abs(
        java.util.UUID.nameUUIDFromBytes(
          name.getBytes(StandardCharsets.UTF_8))
          .getMostSignificantBits)
      if (inputType == "text")
        Dynamic.runIndex(reg, cfg,
          Seq((docId, data)).toDF("doc_id", "text"), chunks)
      else {
        val ext = if (inputType == "pdf") "pdf" else "img"
        Dynamic.runIndexBinary(reg, cfg,
          Seq((docId, ext, rawData)).toDF("doc_id", "ext", "data"),
          chunks)
      }
      val ack = JObject("name" -> JString(name),
        "msg" -> JString("ingested"),
        "uid" -> JString(java.util.UUID.randomUUID().toString))
      (200, "application/json", JsonMethods.compact(JsonMethods.render(ack)))
    } else {
      val hits = Dynamic.runSearch(reg, cfg, data, chunks)
        .select("id", "doc_id", "text").collect()
      // resp.metrics (pipeline.py:437-440): judged metrics over the
      // result texts when an `evaluate` provider is configured — the
      // ONE implementation in Dynamic.searchMetricsTexts (empty when
      // there is nothing to judge)
      val metrics: List[(String, JValue)] =
        if (cfg.evaluate.isEmpty) Nil
        else Dynamic.searchMetricsTexts(cfg, data,
            hits.toSeq.map(r => Option(r.getString(2)).getOrElse("")))
          .toList.sortBy(_._1)
          .map { case (k, v) => k -> (JDouble(v): JValue) }
      val out = JObject(
        "chunks" -> JArray(hits.toList.map(r => JObject(
          "uid" -> JString(r.getString(0)),
          "doc_id" -> JString(r.getLong(1).toString),
          "text" -> JString(r.getString(2))))),
        "metrics" -> JObject(metrics: _*))
      (200, "application/json", JsonMethods.compact(JsonMethods.render(out)))
    }
  }

  private def str(v: JValue): Option[String] = v match {
    case JString(s) => Some(s)
    case _ => None
  }

  // ---- /openapi/spec.json ----------------------------------------------

  /** Minimal OpenAPI doc (service.py:141-186 register_route set). */
  private def openapi(ex: HttpExchange): Reply = {
    val tablePaths = tables.map { td =>
      s"/api/table/${td.name}" -> JObject(
        "get" -> JObject("summary" ->
          JString("get the table with partial attributes")),
        "post" -> JObject("summary" ->
          JString("insert a new record to the table")),
        "delete" -> JObject("summary" ->
          JString("delete table records according to partial attributes")))
    }
    val spec = JObject(
      "openapi" -> JString("3.0.0"),
      "info" -> JObject("title" -> JString("graft"),
        "version" -> JString("1.0")),
      "paths" -> JObject(List(
        "/" -> JObject("get" -> JObject(
          "summary" -> JString("health check"))),
        "/api/run" -> JObject("post" -> JObject(
          "summary" -> JString("run the pipeline")))) ++ tablePaths: _*))
    (200, "application/json", JsonMethods.compact(JsonMethods.render(spec)))
  }
}
