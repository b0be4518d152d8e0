package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Filtered keyword/sparse search semantics: the predicate thins which
  * docs can be RETURNED, never how anything is WEIGHTED — a surviving
  * doc's score must be byte-identical to its unfiltered score (BM25
  * df/N/avgdl stay whole-corpus), and the filtered top-k must equal
  * the brute-force ranking over allowed docs (excluded docs must not
  * consume result slots). */
class FilteredSearchSpec extends SparkSpecBase {

  private def corpus(sp: org.apache.spark.sql.SparkSession) = {
    import sp.implicits._
    Seq(
      (1L, "spark shuffle join spark", "en"),
      (2L, "spark window", "en"),
      (3L, "spark spark spark shuffle", "de"),
      (4L, "join window order", "de"),
      (5L, "cats and dogs", "en"),
      (6L, "spark join", "fr")).toDF("doc_id", "text", "lang")
  }

  test("bm25 searchFiltered keeps whole-corpus statistics: surviving " +
      "scores equal the unfiltered run's; excluded docs free no weight") {
    val sp = spark
    import sp.implicits._
    val docs = corpus(sp)
    val idx = Bm25.build(docs, "doc_id", "text")
    val full = Bm25.search(idx, "spark join", 10)
      .as[(Long, Double)].collect().toMap
    val allowed = docs.filter(col("lang") === "en")
    val got = Bm25.searchFiltered(idx, "spark join", 10, allowed,
      "doc_id").as[(Long, Double)].collect()
    // only en docs appear
    assert(got.map(_._1).toSet === Set(1L, 2L))
    // each surviving score is EXACTLY the unfiltered score (stats did
    // not shrink to the filtered sub-corpus)
    got.foreach { case (id, s) => assert(s === full(id),
      s"doc $id rescored under the filter: $s vs ${full(id)}") }
    // ordering is (score desc, id asc) over the allowed set
    assert(got.sortBy { case (id, s) => (-s, id) }.toSeq === got.toSeq)
  }

  test("bm25 searchFiltered top-k slots go to allowed docs (excluded " +
      "docs do not crowd out lower-scored allowed ones)") {
    val sp = spark
    import sp.implicits._
    val docs = corpus(sp)
    val idx = Bm25.build(docs, "doc_id", "text")
    // k=1 unfiltered winner for "spark shuffle" is doc 3 (de); under
    // lang='en' the slot must go to the best en doc, not be empty
    val got = Bm25.searchFiltered(idx, "spark shuffle", 1,
      docs.filter(col("lang") === "en"), "doc_id")
      .as[(Long, Double)].collect()
    assert(got.length === 1 && got.head._1 === 1L)
    val full = Bm25.search(idx, "spark shuffle", 1)
      .as[(Long, Double)].collect()
    assert(full.head._1 === 3L)
  }

  test("sparse filtered top-k equals brute-force over allowed docs, " +
      "scores unchanged") {
    val sp = spark
    import sp.implicits._
    val emb = graft.functions.Md5SparseEmbedder(64)
    val sv = udf((t: String) => emb.embed(t))
    val docs = corpus(sp).withColumn("__sv", sv(col("text")))
      .select(col("doc_id"), col("lang"),
        col("__sv.indices").as("__i"), col("__sv.values").as("__v"))
    val postings = graft.functions.Sparse.invertedPostings(
      docs, "doc_id", "__i", "__v")
    val q = emb.embed("spark join")
    val full = graft.functions.Sparse.invertedTopK(postings, q, 10)
      .as[(Long, Double)].collect().toMap
    val got = graft.functions.Sparse.invertedTopKWFiltered(postings,
      q.indices, q.values.map(_.toDouble), 10,
      docs.filter(col("lang") === "en"), "doc_id")
      .as[(Long, Double)].collect()
    assert(got.map(_._1).forall(Set(1L, 2L, 5L)))
    got.foreach { case (id, s) => assert(s === full(id)) }
    assert(got.map(_._1).toSet === full.keySet.intersect(Set(1L, 2L, 5L)))
  }

  test("stored sparse filtered search prunes buckets AND filters ids " +
      "on the same scan") {
    val sp = spark
    import sp.implicits._
    val emb = graft.functions.Md5SparseEmbedder(64)
    val sv = udf((t: String) => emb.embed(t))
    val docs = corpus(sp).withColumn("__sv", sv(col("text")))
      .select(col("doc_id"), col("lang"),
        col("__sv.indices").as("__i"), col("__sv.values").as("__v"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sparse-filt-spec").toString
    graft.functions.Sparse.writePostings(
      graft.functions.Sparse.invertedPostings(docs, "doc_id", "__i",
        "__v"), dir, buckets = 4)
    val q = emb.embed("spark join")
    val stored = graft.functions.Sparse.searchStoredFiltered(sp, dir,
      q, 10, docs.filter(col("lang") === "en"), "doc_id")
      .as[(Long, Double)].collect()
    val inMem = graft.functions.Sparse.invertedTopKWFiltered(
      graft.functions.Sparse.invertedPostings(docs, "doc_id", "__i",
        "__v"), q.indices, q.values.map(_.toDouble), 10,
      docs.filter(col("lang") === "en"), "doc_id")
      .as[(Long, Double)].collect()
    assert(stored.toSeq === inMem.toSeq)
  }
}
