package graft.core

import java.nio.file.Files

import graft.SparkSpecBase
import graft.core.Spec._
import graft.ops.Ann
import org.apache.spark.sql.functions._

/** The metadata filter on the four BATCH search surfaces (the c08/c12
  * contract extended to batch): for every modality, the filtered batch
  * must return, per query, exactly the filtered SINGLE-QUERY search's
  * rows — the single-query filtered forms carry the oracled contract
  * (whole-corpus stats, thin-before-cut, no starvation), so per-query
  * parity pins the batch surface to it transitively. Plus the two
  * direct properties: no disallowed id is ever returned, and allowed
  * docs fill all k slots when enough exist. */
case class FChunk(cid: Long, text: String, vec: Seq[Float],
                  mv: Seq[Seq[Float]], si: Seq[Int], sv: Seq[Float],
                  tag: String)

class BatchFilterSpec extends SparkSpecBase {

  private def fixture(lists: Int) = {
    val sp = spark
    import sp.implicits._
    val td = TableDef[FChunk]("fchunk" + lists, primaryKey = Some("cid"),
      indexes = Seq(
        VectorIndex("vec", Ann.L2, lists = lists),
        MultiVectorIndex("mv", lists = 2),
        KeywordIndex("text", model = "simple"),
        SparseIndex("si", "sv")),
      vectorDims = Map("vec" -> 2, "mv" -> 2))
    val reg = new Registry(spark,
      Files.createTempDirectory("graft-bfilter").toString).register(td)
    val rows = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 0f else 10f
      FChunk(i.toLong,
        if (i % 2 == 0) s"spark joins row r$i" else s"cats meow row r$i",
        Seq(base + i * 0.01f, base + 0.2f),
        Seq(Seq(base + 0.1f, base), Seq(base + 1, base)),
        Seq(i % 5, 5 + i % 3), Seq(1f + i % 4, 2f),
        if (i % 3 == 0) "a" else "b")
    }
    reg.insert(td, rows)
    val eng = new Engine(reg)
    eng.buildIndex(td)
    (reg, td, eng)
  }

  private val pred = col("tag") === "a"

  /** A vector-only table of the given index KIND — the filter
    * plumbing differs per family (codes/encoded/assignment/base), so
    * the parity test must run every one of them. */
  private def vecFixture(name: String, ix: VectorIndex) = {
    val sp = spark
    import sp.implicits._
    val td = TableDef[FChunk]("fvec_" + name, primaryKey = Some("cid"),
      indexes = Seq(ix), vectorDims = Map("vec" -> 2))
    val reg = new Registry(spark,
      Files.createTempDirectory("graft-bvfilter").toString).register(td)
    val rows = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 0f else 10f
      FChunk(i.toLong, s"row r$i",
        Seq(base + i * 0.01f, base + 0.2f + (i % 5) * 0.05f),
        Seq(Seq(base, base)), Seq(i % 5), Seq(1f),
        if (i % 3 == 0) "a" else "b")
    }
    reg.insert(td, rows)
    val eng = new Engine(reg)
    if (ix.lists > 0) eng.buildIndex(td)
    (reg, td, eng)
  }

  test("searchByVectorBatch filter: per-query rows equal the filtered " +
      "searchByVector on EVERY index family (exact, IVF, SQ, 1-bit, " +
      "PQ, matryoshka, composed); no disallowed id; allowed docs " +
      "fill all k slots") {
    val sp = spark
    import sp.implicits._
    val kinds: Seq[(String, VectorIndex)] = Seq(
      "exact" -> VectorIndex("vec", Ann.L2),
      "ivf" -> VectorIndex("vec", Ann.L2, lists = 2),
      "sq" -> VectorIndex("vec", Ann.L2, lists = 2, quantized = true),
      "bitq" -> VectorIndex("vec", Ann.L2, lists = 2, oneBit = true),
      "pq" -> VectorIndex("vec", Ann.L2, lists = 2, pq = 2),
      "mrl" -> VectorIndex("vec", Ann.L2, mrlDims = 1),
      "mrlivf" -> VectorIndex("vec", Ann.L2, lists = 2, mrlDims = 1))
    for ((name, ix) <- kinds) {
      val (reg, td, eng) = vecFixture(name, ix)
      val qs = Seq((100L, Seq(0.0, 0.0)), (101L, Seq(10.0, 10.0)))
      // both cells probed → the approximate families are
      // recall-complete over the allowed set, so parity is exact
      val p = if (ix.lists > 0) 2 else 0
      val got = eng.searchByVectorBatch(td, qs.toDF("q_id", "qv"),
          "q_id", "qv", topk = 5, probes = p, filter = Some(pred))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).view.mapValues(_.sortBy(x => (x._3, x._2))
          .map(x => (x._2, x._3)).toSeq).toMap
      val allowedIds = reg.table(td).filter(pred)
        .select("cid").collect().map(_.getLong(0)).toSet
      qs.foreach { case (qid, qv) =>
        val want = eng.searchByVector(td, qv, topk = 5, probes = p,
            returnFields = Seq("cid"), filter = Some(pred))
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
          .sortBy(x => (x._2, x._1))
        assert(got(qid) == want,
          s"$name qid=$qid: batch ${got(qid)} != single $want")
        assert(got(qid).map(_._1).forall(allowedIds),
          s"$name qid=$qid leaked a disallowed id: ${got(qid)}")
        assert(got(qid).size == 5,
          s"$name qid=$qid starved: ${got(qid).size} rows")
      }
    }
  }

  test("searchByKeywordBatch filter: per-query rows equal the " +
      "filtered searchByKeyword; surviving scores equal the " +
      "unfiltered batch's (whole-corpus stats)") {
    val sp = spark
    import sp.implicits._
    val (_, td, eng) = fixture(0)
    val kq = Seq((1L, "spark joins"), (2L, "cats meow"))
    val unf = eng.searchByKeywordBatch(td, kq.toDF("qid", "qtext"),
        "qid", "qtext", topk = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    val got = eng.searchByKeywordBatch(td, kq.toDF("qid", "qtext"),
        "qid", "qtext", topk = 10, filter = Some(pred))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // surviving (qid, id) pairs ALSO in the unfiltered top-k keep
    // bit-identical scores — the predicate thinned returns, never
    // weights (pairs promoted from below the unfiltered cut are the
    // no-starvation contract working, not a rescore)
    var overlap = 0
    got.foreach { case (qid, id, s) =>
      unf.get((qid, id)).foreach { u =>
        overlap += 1
        assert(u == s,
          s"($qid, $id) rescored under the filter: $s vs $u")
      }
    }
    assert(overlap > 0, "no (qid, id) overlap — the pin is vacuous")
    val byQ = got.groupBy(_._1).view
      .mapValues(_.sortBy(x => (-x._3, x._2)).map(x => (x._2, x._3))
        .toSeq).toMap
    kq.foreach { case (qid, text) =>
      val want = eng.searchByKeyword(td, text, topk = 10,
          returnFields = Seq("cid"), filter = Some(pred))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(byQ(qid) == want,
        s"qid=$qid: keyword batch ${byQ(qid)} != single $want")
    }
  }

  test("searchBySparseBatch filter: per-query rows equal the filtered " +
      "searchBySparse; surviving scores equal the unfiltered batch's") {
    val sp = spark
    import sp.implicits._
    val (reg, td, eng) = fixture(0)
    val queries = reg.table(td).filter(col("cid") < 2)
      .select(col("cid").as("qid"), col("si"), col("sv"))
    val unf = eng.searchBySparseBatch(td, queries, "qid", "si", "sv",
        topk = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    val got = eng.searchBySparseBatch(td, queries, "qid", "si", "sv",
        topk = 8, filter = Some(pred))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    var overlap = 0
    got.foreach { case (qid, id, s) =>
      unf.get((qid, id)).foreach { u =>
        overlap += 1
        assert(u == s,
          s"($qid, $id) rescored under the filter: $s vs $u")
      }
    }
    assert(overlap > 0, "no (qid, id) overlap — the pin is vacuous")
    val byQ = got.groupBy(_._1).view
      .mapValues(_.sortBy(x => (-x._3, x._2)).map(x => (x._2, x._3))
        .toSeq).toMap
    val qVecs = queries.collect().map(r => (r.getLong(0),
      graft.functions.SparseVec(r.getSeq[Int](1), r.getSeq[Float](2))))
    qVecs.foreach { case (qid, qv) =>
      val want = eng.searchBySparse(td, qv, topk = 8,
          returnFields = Seq("cid"), filter = Some(pred))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        .sortBy(x => (-x._2, x._1))
      assert(byQ(qid) == want,
        s"qid=$qid: sparse batch ${byQ(qid)} != single $want")
    }
  }

  test("searchByMultivecBatch filter: per-query rows equal the " +
      "filtered searchByMultivec at the same probes/refine") {
    val sp = spark
    import sp.implicits._
    val (_, td, eng) = fixture(0)
    val qBags: Seq[(Long, Seq[Seq[Double]])] = Seq(
      (0L, Seq(Seq(0.1, 0.0), Seq(1.0, 0.0))),
      (1L, Seq(Seq(10.1, 10.0), Seq(11.0, 10.0))))
    val got = eng.searchByMultivecBatch(td, qBags.toDF("qid", "qvecs"),
        "qid", "qvecs", topk = 5, refine = 12, probes = 2,
        filter = Some(pred))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(x => (-x._3, x._2))
        .map(x => (x._2, x._3)).toSeq).toMap
    qBags.foreach { case (qid, bag) =>
      val want = eng.searchByMultivec(td, bag, topk = 5, refine = 12,
          probes = 2, returnFields = Seq("cid"), filter = Some(pred))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        .sortBy(x => (-x._2, x._1))
      assert(got(qid) == want,
        s"qid=$qid: multivec batch ${got(qid)} != single $want")
    }
  }
}
