package graft.eval

import graft.SparkSpecBase

/** Pass@K + QPS strategy matrix (E9): on a corpus where every doc
  * carries a unique rare token, query synthesis picks that token and
  * keyword/hybrid retrieval must put the golden chunk at the top. */
class HarnessSpec extends SparkSpecBase {

  test("strategy matrix: planted unique tokens give near-perfect Pass@K") {
    val sp = spark
    import sp.implicits._
    val filler = "the quick brown fox jumps over a lazy dog near the river"
    val docs = (0 until 30).map { i =>
      (i.toLong, s"$filler uniqtoken$i marker$i $filler")
    }.toDF("doc_id", "text")
    val res = Harness.run(sp, docs, "doc_id", "text",
      nQueries = 10, dim = 64, topk = 10)
    assert(res.length === 8) // 4 strategies x {plain, contextual}
    res.foreach { r =>
      assert(r.passAt5 >= 0.0 && r.passAt5 <= 1.0)
      assert(r.passAt10 >= r.passAt5)
      assert(r.qps > 0.0)
    }
    val kw = res.filter(r => r.strategy == "keyword" && !r.contextual).head
    assert(kw.passAt5 >= 0.9, s"keyword pass@5 = ${kw.passAt5}")
    val rrf = res.filter(r => r.strategy == "hybrid_rrf" && !r.contextual)
      .head
    assert(rrf.passAt10 >= 0.9, s"rrf pass@10 = ${rrf.passAt10}")
  }
}
