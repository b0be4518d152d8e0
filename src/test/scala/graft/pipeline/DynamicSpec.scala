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
}
