package graft.service

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import graft.SparkSpecBase
import graft.core.Registry
import graft.core.Spec.TableDef
import org.apache.spark.sql.Encoders

final case class SDoc(doc_id: Long, text: String)

class ServiceSpec extends SparkSpecBase {

  private def sdocDef: TableDef[SDoc] = {
    implicit val enc = Encoders.product[SDoc]
    TableDef[SDoc]("sdoc", primaryKey = Some("doc_id"))
  }

  private lazy val service: GraftService = {
    val reg = new Registry(spark,
      Files.createTempDirectory("graft-svc").toString)
    new GraftService(reg, Seq(sdocDef), port = 0).start()
  }
  private lazy val base = s"http://127.0.0.1:${service.boundPort}"
  private val client = HttpClient.newHttpClient()

  private def get(path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def post(path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(base + path))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def delete(path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(base + path))
      .DELETE().build(), HttpResponse.BodyHandlers.ofString())

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  test("GET / answers the health check") {
    val r = get("/")
    assert(r.statusCode() === 200 && r.body() === "Ok")
  }

  test("table route: insert via POST, filter via GET params, DELETE") {
    val ins = post("/api/table/sdoc", """{"doc_id": 7, "text": "hello"}""")
    assert(ins.statusCode() === 201)
    post("/api/table/sdoc", """{"doc_id": 8, "text": "other"}""")
    val got = get("/api/table/sdoc?doc_id=7")
    assert(got.statusCode() === 200)
    assert(got.body().contains("\"text\":\"hello\""))
    assert(!got.body().contains("other")) // typed equality filter applied
    val del = delete("/api/table/sdoc?doc_id=7")
    assert(del.statusCode() === 200)
    assert(!get("/api/table/sdoc?doc_id=7").body().contains("hello"))
    assert(get("/api/table/sdoc?doc_id=8").body().contains("other"))
  }

  test("table route: malformed insert body is a 400, not a crash") {
    val r = post("/api/table/sdoc", """not json at all""")
    assert(r.statusCode() === 400)
  }

  test("table route: empty body and empty array are 400s; a malformed " +
      "record ANYWHERE in a batch rejects the whole batch") {
    assert(post("/api/table/sdoc", "").statusCode() === 400)
    assert(post("/api/table/sdoc", "[]").statusCode() === 400)
    // second record is garbage → all-null row → whole batch rejected,
    // nothing inserted
    val r = post("/api/table/sdoc",
      """[{"doc_id": 41, "text": "ok"}, {"doc_id": "not-a-long-at-all!"}]""")
    assert(r.statusCode() === 400)
    assert(!get("/api/table/sdoc?doc_id=41").body().contains("ok"))
  }

  test("table route: a null OPTIONAL field is accepted; a null primary " +
      "key is not") {
    val r = post("/api/table/sdoc", """{"doc_id": 42}""")
    assert(r.statusCode() === 201)
    assert(get("/api/table/sdoc?doc_id=42").body().contains("42"))
    assert(post("/api/table/sdoc", """{"text": "no key"}""")
      .statusCode() === 400)
  }

  test("table route: GET honors _limit and _cols; unknown columns are " +
      "400s") {
    (1 to 5).foreach(i =>
      post("/api/table/sdoc", s"""{"doc_id": ${100 + i}, "text": "bulk"}"""))
    val lim = get("/api/table/sdoc?text=bulk&_limit=2")
    assert(lim.statusCode() === 200)
    assert(lim.body().split("\\{").length - 1 === 2) // 2 JSON rows
    val proj = get("/api/table/sdoc?doc_id=101&_cols=doc_id")
    assert(proj.statusCode() === 200)
    assert(proj.body().contains("101") && !proj.body().contains("text"))
    assert(get("/api/table/sdoc?_cols=nope").statusCode() === 400)
    assert(get("/api/table/sdoc?nope=1").statusCode() === 400)
    assert(get("/api/table/sdoc?_limit=abc").statusCode() === 400)
    // negative would flow into selectBy's "no limit" branch and disable
    // the unbounded-collect guard per-request (advisor r6) — reject
    assert(get("/api/table/sdoc?_limit=-1").statusCode() === 400)
  }

  test("CLI main: serve boots a working service from option strings") {
    val svc = graft.Main.serve(Map("port" -> "0",
      "root" -> Files.createTempDirectory("graft-cli").toString))
    try {
      val health = client.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${svc.boundPort}/")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(health.statusCode() === 200)
      assert(health.body().toLowerCase.contains("ok"))
    } finally svc.stop()
    // option parsing: unknown/odd options are rejected
    intercept[IllegalArgumentException] {
      graft.Main.parseOpts(List("--nope", "1"))
    }
    intercept[IllegalArgumentException] {
      graft.Main.parseOpts(List("--port"))
    }
  }

  test("POST /api/run: index then search round-trips through the " +
      "dynamic pipeline") {
    val steps =
      """[{"kind":"chunk","provider":"regex","args":{"size":"64","overlap":"8"}},
         {"kind":"text-emb","provider":"hash","args":{"dim":"32"}},
         {"kind":"index","provider":"graft"}]"""
    val ing = post("/api/run",
      s"""{"name":"doc-1","data":"${b64("spark joins are fast. " +
        "windows partition data. shuffles move rows.")}",
          "steps":$steps}""")
    assert(ing.statusCode() === 200)
    assert(ing.body().contains("\"msg\":\"ingested\""))
    val searchSteps =
      """[{"kind":"text-emb","provider":"hash","args":{"dim":"32"}},
         {"kind":"search","provider":"graft","args":{"topk":"3"}}]"""
    val res = post("/api/run",
      s"""{"name":"q","data":"${b64("spark joins")}","steps":$searchSteps}""")
    assert(res.statusCode() === 200)
    assert(res.body().contains("\"chunks\":["))
    assert(res.body().contains("spark"))
  }

  test("POST /api/run: pdf input_type routes through the binary " +
      "branch, and an evaluate provider fills metrics") {
    val steps =
      """[{"kind":"chunk","provider":"regex","args":{"size":"64","overlap":"0"}},
         {"kind":"text-emb","provider":"hash","args":{"dim":"32"}},
         {"kind":"ocr","provider":"stub"},
         {"kind":"index","provider":"graft"}]"""
    val ing = post("/api/run",
      s"""{"name":"bin-1","data":"${b64("raw pdf payload bytes")}",
          "input_type":"pdf","steps":$steps}""")
    assert(ing.statusCode() === 200)
    assert(ing.body().contains("\"msg\":\"ingested\""))
    val searchSteps =
      """[{"kind":"text-emb","provider":"hash","args":{"dim":"32"}},
         {"kind":"evaluate","provider":"overlap"},
         {"kind":"search","provider":"graft","args":{"topk":"3"}}]"""
    // the stub extractor's tag starts with "pdf " — query for it
    val res = post("/api/run",
      s"""{"name":"q","data":"${b64("pdf bytes")}",
          "steps":$searchSteps}""")
    assert(res.statusCode() === 200)
    assert(res.body().contains("\"chunks\":["))
    // one result chunk → only MRR survives the k ≤ n filter of
    // evaluate_with_estimation; it must be 1.0 (the stub tag matches)
    assert(res.body().contains("\"MRR\":1.0"))
  }

  test("POST /api/run: the reference's validation errors map to 400") {
    // no embedding provider → pipeline.py:174-184 RequestError
    val r = post("/api/run",
      s"""{"name":"x","data":"${b64("q")}",
          "steps":[{"kind":"search","provider":"graft"}]}""")
    assert(r.statusCode() === 400)
    assert(r.body().contains("No embedding provider"))
    // unknown provider kind
    val r2 = post("/api/run",
      s"""{"name":"x","data":"${b64("q")}",
          "steps":[{"kind":"nope","provider":"zzz"}]}""")
    assert(r2.statusCode() === 400)
    assert(r2.body().contains("Unsupported provider kind"))
  }

  test("GET /openapi/spec.json lists the route set") {
    val r = get("/openapi/spec.json")
    assert(r.statusCode() === 200)
    val b = r.body()
    assert(b.contains("\"/api/run\"") && b.contains("\"/api/table/sdoc\"")
      && b.contains("health check"))
  }
}
