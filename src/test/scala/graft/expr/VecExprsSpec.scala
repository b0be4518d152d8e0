package graft.expr

import graft.SparkSpecBase
import graft.functions.Vec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VecExprs

/** Codegen expressions must be BIT-identical to the composed-builtin
  * forms (same double fold order) — that contract is what lets the hot
  * path swap in without touching any oracle. */
class VecExprsSpec extends SparkSpecBase {

  private def vecs(n: Int, dim: Int, seed: Int) = {
    val rng = new scala.util.Random(seed)
    Seq.fill(n)(Seq.fill(dim)(rng.nextFloat()))
  }

  test("l2 / cos / dot match the Vec HOF forms bit-for-bit") {
    val sp = spark
    import sp.implicits._
    val q = vecs(1, 64, 1).head.map(_.toDouble)
    val df = vecs(50, 64, 2).zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "vec")
    val rows = df.select(
      Vec.l2Dist(col("vec"), typedlit(q)).as("l2a"),
      VecExprs.l2Dist(col("vec"), typedlit(q)).as("l2b"),
      Vec.cosDist(col("vec"), typedlit(q)).as("cosa"),
      VecExprs.cosDist(col("vec"), typedlit(q)).as("cosb"),
      Vec.dot(col("vec"), typedlit(q)).as("dota"),
      VecExprs.dot(col("vec"), typedlit(q)).as("dotb")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1)) // exact, not approx
      assert(r.getDouble(2) === r.getDouble(3))
      assert(r.getDouble(4) === r.getDouble(5))
    }
  }

  test("maxsim matches the Vec HOF form bit-for-bit") {
    val sp = spark
    import sp.implicits._
    val qts = vecs(3, 16, 3).map(_.map(_.toDouble))
    val df = Seq.tabulate(10)(i => (i.toLong, vecs(4, 16, 10 + i)))
      .toDF("id", "mv")
    val rows = df.select(
      Vec.maxSimDot(typedlit(qts), col("mv")).as("a"),
      VecExprs.maxSimDot(typedlit(qts), col("mv")).as("b")).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("expressions participate in whole-stage codegen") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = vecs(1, 64, 5).head.map(_.toDouble)
    val plan = e.select(VecExprs.l2Dist(col("embedding"), typedlit(q)))
      .queryExecution.executedPlan
    val codegenStages = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenStages.nonEmpty,
      s"expected a WholeStageCodegen stage:\n$plan")
  }

  test("SQL registration exposes the functions to spark.sql") {
    VecExprs.register(spark)
    val sp = spark
    import sp.implicits._
    Seq((Seq(3.0, 4.0), Seq(0.0, 0.0))).toDF("a", "b")
      .createOrReplaceTempView("vtest")
    assert(spark.sql("SELECT l2_dist(a, b) FROM vtest").head().getDouble(0)
      === 5.0)
    assert(spark.sql("SELECT dot_product(a, a) FROM vtest").head()
      .getDouble(0) === 25.0)
  }

  test("Bm25Score captures its tokenizer AT BIND TIME: a serialized " +
      "round-trip scores with the bound vocab even after the registry " +
      "entry is replaced (executor-side contract)") {
    import graft.functions.Tokenizers
    import org.apache.spark.unsafe.types.UTF8String
    // runtime-registered vocab, like a trained BERT vocab.txt load
    val bound = Tokenizers.wordpiece(Seq("spar", "##k", "join"),
      name = "exec_vocab_test")
    // "spark join" -> spar ##k join (greedy longest-match)
    val expr = org.apache.spark.sql.graft.Bm25Score(
      org.apache.spark.sql.catalyst.expressions.Literal("x"),
      terms = Seq("spar", "join"), dfs = Seq(2L, 1L), n = 10L,
      avgdl = 4.0, tok = bound, roundTo = 6)
    val direct = expr.score(UTF8String.fromString("spark join"))
    assert(direct > 0.0)
    // the serialized-task path: Java round-trip (what Spark does to
    // ship the expression tree to executors)
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(expr)
    // hostile registry state: the name now resolves to a DIFFERENT
    // tokenizer (an executor JVM would have NO entry at all)
    Tokenizers.register(Tokenizers.Tokenizer("exec_vocab_test",
      Tokenizers.Simple.column, _ => Seq("bogus")))
    val back = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[org.apache.spark.sql.graft.Bm25Score]
    // identical score: the vocab rode along; no name lookup happened
    assert(back.score(UTF8String.fromString("spark join")) === direct)
    // sanity: a name lookup NOW would tokenize to "bogus" => score 0
    assert(Tokenizers.byName("exec_vocab_test").scala("spark join")
      === Seq("bogus"))
  }

  test("vecMean UDAF equals the naive per-dimension mean") {
    val sp = spark
    import sp.implicits._
    val data = vecs(40, 8, 7).zipWithIndex
      .map { case (v, i) => (i.toLong % 3, v.map(_.toDouble)) }
    val got = data.toDF("g", "v")
      .repartition(8) // exercise partial/merge across partitions
      .groupBy("g")
      .agg(graft.functions.VecAgg.vecMean(col("v")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val want = data.groupBy(_._1).map { case (g, rows) =>
      val n = rows.length
      g -> (0 until 8).map(i => rows.map(_._2(i)).sum / n)
    }
    want.foreach { case (g, m) =>
      got(g).zip(m).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
    }
  }
}
