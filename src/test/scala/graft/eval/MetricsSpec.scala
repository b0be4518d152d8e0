package graft.eval

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpecBase
import graft.core.Registry

/** Metric formula parity (evaluate.py:22-86,210-231) with hand-computed
  * expectations, the reference's perfect-ranking NDCG==1.0 sanity
  * (tests/test_groundtruth.py:57), and the GroundTruth harness. */
class MetricsSpec extends SparkSpecBase {

  private val truth = Set("a", "b", "c")
  private val ranked = Seq("a", "x", "b", "y", "c")

  test("ndcg / map / recall / mrr on a hand-computed case") {
    assert(math.abs(Metrics.ndcg(truth, ranked) - 0.8854598815714875) < 1e-12)
    assert(math.abs(Metrics.averagePrecision(truth, ranked) -
      0.7555555555555555) < 1e-12)
    assert(Metrics.recallAt(truth, ranked, 10) === 1.0)
    assert(math.abs(Metrics.recallAt(truth, ranked, 2) - 1.0 / 3) < 1e-12)
    assert(Metrics.mrr(truth, ranked) === 1.0)
    assert(Metrics.precisionAt(truth, ranked, 5) === 0.6)
    assert(math.abs(Metrics.avgPrecisionAtRelevant(
      Seq(true, false, true, false, true)) - 0.7555555555555555) < 1e-12)
  }

  test("perfect ranking gives ndcg/map/recall = 1.0") {
    val t = Set("a", "b")
    val r = Seq("a", "b")
    assert(Metrics.ndcg(t, r) === 1.0)
    assert(Metrics.averagePrecision(t, r) === 1.0)
    assert(Metrics.recallAt(t, r, 10) === 1.0)
  }

  test("miss cases give 0; mrr finds first relevant") {
    assert(Metrics.ndcg(Set("z"), Seq("a", "b")) === 0.0)
    assert(Metrics.averagePrecision(Set("z"), Seq("a")) === 0.0)
    assert(Metrics.mrr(Set("z"), Seq("a", "z")) === 0.5)
    assert(Metrics.avgPrecisionAtRelevant(Seq(false, false)) === 0.0)
    assert(Metrics.passAt(Set("g1", "g2"), Seq("g2", "x"), 2) === 0.5)
  }

  test("distributed evaluate matches the scalar formulas per query") {
    val sp = spark
    import sp.implicits._
    val results = Seq(
      ("q1", "a", 1), ("q1", "x", 2), ("q1", "b", 3), ("q1", "y", 4),
      ("q1", "c", 5),
      ("q2", "u", 1), ("q2", "t", 2)).toDF("qid", "id", "rank")
    val truthDf = Seq(("q1", "a"), ("q1", "b"), ("q1", "c"), ("q2", "t"))
      .toDF("qid", "id")
    val per = Metrics.evaluate(results, truthDf, k = 10).collect()
      .map(r => r.getString(0) -> r).toMap
    val q1 = per("q1")
    assert(math.abs(q1.getDouble(1) - 0.8854598815714875) < 1e-12) // ndcg
    assert(math.abs(q1.getDouble(2) - 0.7555555555555555) < 1e-12) // map
    assert(q1.getDouble(3) === 1.0) // recall_10
    assert(q1.getDouble(5) === 1.0) // mrr
    val q2 = per("q2")
    // truth {t} found at rank 2 -> dcg = 1/log2(3), idcg = 1 -> ndcg ~0.63
    assert(math.abs(q2.getDouble(1) - 1.0 / (math.log(3) / math.log(2))) < 1e-12)
    assert(q2.getDouble(5) === 0.5) // mrr
    val avg = Metrics.macroAvg(Metrics.evaluate(results, truthDf, 10))
      .collect()(0)
    assert(math.abs(avg.getAs[Double]("mrr") - 0.75) < 1e-12)
  }

  test("bootstrapCi: brackets the mean, deterministic, degenerate-exact") {
    val sp = spark
    import sp.implicits._
    // 10 queries with spread-out metric values: CI must bracket the mean
    val per = (0 until 10).map(i => (i.toLong, i / 10.0)).toDF("qid", "m")
    val ci = Metrics.bootstrapCi(per, "qid", "m", n = 10, b = 200).collect()(0)
    val (mean, lo, hi) =
      (ci.getAs[Double]("mean"), ci.getAs[Double]("ci_lo"),
        ci.getAs[Double]("ci_hi"))
    assert(mean === 0.45)
    assert(lo <= mean && mean <= hi, s"CI [$lo,$hi] must bracket $mean")
    assert(hi - lo > 0, "spread data must give a non-degenerate interval")
    // the md5 grid is RNG-free: a second run is bit-identical
    val again = Metrics.bootstrapCi(per, "qid", "m", 10, 200).collect()(0)
    assert(again.getAs[Double]("ci_lo") === lo)
    assert(again.getAs[Double]("ci_hi") === hi)
    // constant metric: every replicate mean equals it -> zero-width CI
    val const = (0 until 10).map(i => (i.toLong, 0.7)).toDF("qid", "m")
    val c = Metrics.bootstrapCi(const, "qid", "m", 10, 200).collect()(0)
    assert(c.getAs[Double]("ci_lo") === 0.7)
    assert(c.getAs[Double]("ci_hi") === 0.7)
    intercept[IllegalArgumentException] {
      Metrics.bootstrapCi(per, "qid", "m", n = 0)
    }
  }

  test("pairedPermutation: identical systems p=1, one-sided shift small p") {
    val sp = spark
    import sp.implicits._
    val a = (0 until 10).map(i => (i.toLong, 0.3 + i / 20.0)).toDF("qid", "m")
    // A == B: every diff 0, every flip mean 0 >= 0 -> p = (1+200)/201 = 1
    val same = Metrics.pairedPermutation(a, a, "qid", "m", n = 10).collect()(0)
    assert(same.getAs[Double]("diff") === 0.0)
    assert(same.getAs[Double]("p_value") === 1.0)
    // B = A - 0.1 on every query: |mean_r| = 0.1 only when all ten md5
    // parity bits agree (~2 in 1024 replicates) -> p far below 0.1
    val b = a.select(col("qid"), (col("m") - 0.1).as("m"))
    val shift = Metrics.pairedPermutation(a, b, "qid", "m", 10).collect()(0)
    assert(shift.getAs[Double]("diff") === 0.1)
    assert(math.abs(shift.getAs[Double]("mean_a") -
      shift.getAs[Double]("mean_b") - 0.1) < 1e-12)
    val p = shift.getAs[Double]("p_value")
    assert(p > 0 && p < 0.1, s"uniform shift must be significant, got $p")
    // RNG-free: bit-identical on a second run
    val again = Metrics.pairedPermutation(a, b, "qid", "m", 10).collect()(0)
    assert(again.getAs[Double]("p_value") === p)
    intercept[IllegalArgumentException] {
      Metrics.pairedPermutation(a, b, "qid", "m", n = 10, b = 1)
    }
  }

  test("ground-truth generate + evaluate round trip (mocked retriever)") {
    val reg = new Registry(spark,
      Files.createTempDirectory("graft-gt").toString)
    val gt = new GroundTruth("t", reg)
    val corpus = Seq(
      Retrieved("c1", "spark joins are fast"),
      Retrieved("c2", "cats sleep all day"),
      Retrieved("c3", "spark joins shuffle data"))
    // retrieve = corpus ranked by naive overlap with the query
    def retrieve(q: String): Seq[Retrieved] = {
      val qs = q.toLowerCase.split(" ").toSet
      corpus.sortBy(c => -c.text.split(" ").count(qs)).toSeq
    }
    gt.generate(Seq("spark joins"), retrieve, OverlapJudge())
    val stored = reg.table(gt.queryDef).collect()
    assert(stored.length === 1)
    assert(stored(0).getAs[Seq[String]]("truth").toSet === Set("c1", "c3"))
    val m = gt.evaluate(retrieve, topk = 10)
    assert(m("ndcg") === 1.0) // both relevant docs ranked first
    assert(m("map") === 1.0)
    assert(m("recall_10") === 1.0)
  }

  test("cohenKappa: hand-computed table and kappa, constant judges " +
      "yield NULL, perfect agreement yields 1") {
    val sp = spark
    import sp.implicits._
    // classic worked example: n=100, n11=20, n10=10, n01=5, n00=65
    val items = (Seq.fill(20)((1, 1)) ++ Seq.fill(10)((1, 0)) ++
        Seq.fill(5)((0, 1)) ++ Seq.fill(65)((0, 0)))
      .toDF("a", "b")
    val r = graft.eval.Metrics.cohenKappa(items, "a", "b").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((100L, 20L, 10L, 5L, 65L)))
    // po=0.85, pa=0.3, pb=0.25, pe=0.3*0.25+0.7*0.75=0.6,
    // kappa=(0.85-0.6)/0.4=0.625
    assert(r.getDouble(5) === 0.625)
    // both judges constant: pe=1, kappa undefined -> NULL (not 1.0)
    val const = Seq.fill(10)((1, 1)).toDF("a", "b")
    assert(graft.eval.Metrics.cohenKappa(const, "a", "b")
      .head().isNullAt(5))
    // perfect non-constant agreement: kappa = 1
    val perfect = (Seq.fill(6)((1, 1)) ++ Seq.fill(4)((0, 0)))
      .toDF("a", "b")
    assert(graft.eval.Metrics.cohenKappa(perfect, "a", "b")
      .head().getDouble(5) === 1.0)
  }
}
