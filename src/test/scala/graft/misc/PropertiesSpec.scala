package graft.misc

import org.scalacheck.{Gen, rng}

import graft.SparkSpecBase
import graft.eval.Metrics
import graft.ops.{Ann, Dedup, Fusion}
import graft.text.RegexChunker
import org.apache.spark.sql.functions._

/** Property-based invariants (SURVEY §5 port strategy): chunker bounds,
  * metric identities, RRF permutation invariance, dedup idempotence,
  * column-vs-scala distance equivalence. Deterministic: samples are
  * drawn from seeded ScalaCheck generators. */
class PropertiesSpec extends SparkSpecBase {

  private def samples[T](g: Gen[T], n: Int, seed: Long): Seq[T] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default,
      rng.Seed(seed + i)))

  private val word = Gen.choose(1, 8)
    .flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))
  private val sentenceText = Gen.choose(1, 60)
    .flatMap(n => Gen.listOfN(n, word).map(_.mkString(". ")))

  test("chunker: pieces preserved, bounded when overlap = 0") {
    val c = RegexChunker(size = 40, overlap = 0)
    samples(sentenceText, 60, 1L).foreach { text =>
      val chunks = c.segment(text)
      val pieces = text.split(c.separator, -1).map(_.strip).filter(_.nonEmpty)
      if (pieces.nonEmpty) {
        assert(chunks.nonEmpty)
        // every input piece survives somewhere
        pieces.foreach(p => assert(chunks.exists(_.contains(p)), p))
        // with overlap 0, per-chunk piece mass <= size unless a single
        // piece alone exceeds it (reference keeps long pieces whole)
        chunks.foreach { ch =>
          val parts = ch.split(java.util.regex.Pattern.quote(c.concat))
          val mass = parts.map(_.length).sum
          assert(mass <= 40 || parts.length == 1, s"mass $mass in '$ch'")
        }
      }
    }
  }

  test("sparse dot equals the dense dot of the reconstructed vectors") {
    val sp = spark
    import sp.implicits._
    val emb = graft.functions.Md5SparseEmbedder(dim = 512)
    val texts = samples(sentenceText, 20, 31L)
    def dense(v: graft.functions.SparseVec): Array[Double] = {
      val out = new Array[Double](512)
      v.indices.zip(v.values).foreach { case (i, x) => out(i) = x }
      out
    }
    texts.sliding(2).foreach {
      case Seq(ta, tb) =>
        val (a, b) = (emb.embed(ta), emb.embed(tb))
        val expect = dense(a).zip(dense(b)).map { case (x, y) => x * y }.sum
        val got = Seq((a.indices, a.values, b.indices, b.values))
          .toDF("ai", "av", "bi", "bv")
          .select(graft.functions.Sparse.sparseDot(col("ai"), col("av"),
            col("bi"), col("bv"))).head().getDouble(0)
        assert(got === expect)
      case _ =>
    }
    // empty text: empty sparse vector, dot 0 against anything
    val e = emb.embed("")
    assert(e.indices.isEmpty && e.values.isEmpty)
    val z = Seq((e.indices, e.values, emb.embed("alpha beta").indices,
        emb.embed("alpha beta").values))
      .toDF("ai", "av", "bi", "bv")
      .select(graft.functions.Sparse.sparseDot(col("ai"), col("av"),
        col("bi"), col("bv"))).head().getDouble(0)
    assert(z === 0.0)
  }

  test("lengthQuantiles equals an independent quantile_cont replay") {
    val sp = spark
    import sp.implicits._
    val lens = samples(Gen.choose(1L, 500L), 40, 77L)
    val docs = lens.map(("en", _)).toDF("lang", "n_chars")
    def qc(sorted: Seq[Long], p: Double): Double = {
      val idx = p * (sorted.length - 1)
      val lo = math.floor(idx).toInt
      val hi = math.ceil(idx).toInt
      sorted(lo) + (idx - lo) * (sorted(hi) - sorted(lo))
    }
    val srt = lens.sorted
    val row = graft.ops.TextAnalysis
      .lengthQuantiles(docs, "lang", "n_chars").collect()(0)
    def r6(v: Double) = graft.ops.Ann.roundScala(v, 6)
    assert(row.getAs[Double]("p50") === r6(qc(srt, 0.5)))
    assert(row.getAs[Double]("p90") === r6(qc(srt, 0.9)))
    assert(row.getAs[Double]("p99") === r6(qc(srt, 0.99)))
    assert(row.getAs[Long]("n_kept") ===
      lens.count(_ <= r6(qc(srt, 0.99))).toLong)
  }

  test("metric identities on random truth/ranking pairs") {
    val ids = Gen.choose(0, 30).map(_.toString)
    val cases = for {
      truth <- Gen.listOf(ids).map(_.toSet)
      ranked <- Gen.listOf(ids).map(_.distinct)
    } yield (truth, ranked)
    samples(cases, 200, 2L).foreach { case (truth, ranked) =>
      val m = Metrics.evaluateOne(truth, ranked)
      m.foreach { case (name, v) =>
        assert(v >= 0.0 && v <= 1.0 + 1e-12, s"$name=$v out of range")
      }
      if (truth.nonEmpty) {
        // perfect ranking: list exactly the truth set
        val perfect = Metrics.evaluateOne(truth,
          truth.toSeq.sorted, k = truth.size)
        assert(math.abs(perfect("ndcg") - 1.0) < 1e-12)
        assert(math.abs(perfect("map") - 1.0) < 1e-12)
        assert(perfect("mrr") === 1.0)
      }
    }
  }

  test("rrf is invariant under list permutation") {
    val sp = spark
    import sp.implicits._
    val listGen = Gen.choose(1, 8).flatMap(n =>
      Gen.pick(n, 0L to 20L).map(_.toSeq.zipWithIndex
        .map { case (id, r) => (id, r + 1) }))
    samples(Gen.listOfN(3, listGen), 5, 3L).foreach { lists =>
      val dfs = lists.map(_.toDF("id", "rank"))
      val a = Fusion.rrf(dfs, topK = 50).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      val b = Fusion.rrf(dfs.reverse, topK = 50).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(a === b)
    }
  }

  test("exact dedup is idempotent") {
    val sp = spark
    import sp.implicits._
    val rows = Gen.listOf(for {
      id <- Gen.choose(0L, 50L)
      t <- Gen.oneOf("aa", "bb", "cc", "dd")
    } yield (id, t))
    samples(rows, 5, 4L).filter(_.nonEmpty).foreach { data =>
      val df = data.toDF("doc_id", "text")
      val once = Dedup.exactDedup(df, "doc_id", "text")
      val twice = Dedup.exactDedup(once, "doc_id", "text")
      assert(once.collect().map(_.toSeq).toSet ===
        twice.collect().map(_.toSeq).toSet)
    }
  }

  test("distance expressions equal the scala fold bit-for-bit") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 24
    val pairs = Seq.fill(200)((
      Seq.fill(dim)(rnd.nextDouble() * 2 - 1),
      Seq.fill(dim)(rnd.nextDouble() * 2 - 1)))
    val df = pairs.toDF("a", "b")
    val got = df.select(
      Ann.L2.dist(col("a"), col("b")).as("l2"),
      Ann.Cosine.dist(col("a"), col("b")).as("cos"),
      Ann.InnerProduct.dist(col("a"), col("b")).as("neg")).collect()
    pairs.zip(got).foreach { case ((a, b), row) =>
      val (aa, bb) = (a.toArray, b.toArray)
      assert(row.getDouble(0) === Ann.L2.distScala(aa, bb))
      assert(row.getDouble(1) === Ann.Cosine.distScala(aa, bb))
      assert(row.getDouble(2) === Ann.InnerProduct.distScala(aa, bb))
    }
  }

  test("roundFast equals BigDecimal rounding bit-for-bit") {
    val rnd = new scala.util.Random(17)
    for (scale <- 0 to 8) {
      val pow = math.pow(10.0, scale)
      // broad magnitudes
      (0 until 20000).foreach { _ =>
        val v = (rnd.nextDouble() * 2 - 1) *
          math.pow(10.0, rnd.nextInt(9) - 4)
        assert(Ann.roundFast(v, scale, pow) === Ann.roundScala(v, scale),
          s"v=$v scale=$scale")
      }
      // adversarial: values landing exactly on / near the .5 boundary
      (0 until 5000).foreach { _ =>
        val base = (rnd.nextInt(2000001) - 1000000).toDouble
        val v = (base + 0.5) / pow
        Seq(v, math.nextUp(v), math.nextDown(v), -v).foreach { x =>
          assert(Ann.roundFast(x, scale, pow) === Ann.roundScala(x, scale),
            s"x=$x scale=$scale")
        }
      }
    }
    // huge magnitudes overflow the fast path's integer range → fallback
    Seq(1e18, -3.7e20, 9.99e15).foreach { v =>
      assert(Ann.roundFast(v, 6, 1e6) === Ann.roundScala(v, 6))
    }
  }

  test("closestPairs triangle join equals brute force on random vectors") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(23)
    val n = 60
    val dim = 8
    val vecs = (0L until n).map(i =>
      (i, Seq.fill(dim)(rnd.nextDouble() * 2 - 1)))
    val df = vecs.toDF("id", "vec")
    for (metric <- Seq[Ann.Metric](Ann.L2, Ann.Cosine)) {
      val got = Dedup.closestPairs(df, "id", "vec", metric, k = 15)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2)))
      // brute force over all unordered pairs with identical rounding
      val brute = (for {
        i <- 0 until n; j <- i + 1 until n
      } yield {
        val d = Ann.roundScala(metric.distScala(
          vecs(i)._2.toArray, vecs(j)._2.toArray), 6)
        (vecs(i)._1, vecs(j)._1, d)
      }).sortBy(t => (t._3, t._1, t._2)).take(15)
      assert(got.toSeq === brute.toSeq, metric.toString)
    }
  }

  test("shingles column matches shinglesScala on random texts") {
    val sp = spark
    import sp.implicits._
    val texts = samples(sentenceText, 30, 5L)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val fromCol = df.select(col("id"),
        Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(fromCol(i.toLong) === Dedup.shinglesScala(t, 3), s"text $i")
    }
  }

  test("minhash-LSH recall meets the analytic banded-collision bound") {
    // seeded corpus: 120 base docs of 30 unique tokens, each with a
    // near-dup whose tail m tokens are replaced (m cycles 3/8/14 →
    // three true-Jaccard levels). Exact pairs + their true j come from
    // the exact AllPairs scan; minHashDedupPairs verifies candidates
    // exactly, so found/exact measures CANDIDATE recall.
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(7L)
    var next = 0
    def tok(): String = { next += 1; s"w$next-${rnd.nextInt(1000)}" }
    val docs = (0 until 120).flatMap { i =>
      val base = Seq.fill(30)(tok())
      val m = Seq(3, 8, 14)(i % 3)
      val dup = base.dropRight(m) ++ Seq.fill(m)(tok())
      Seq((i.toLong * 2, base.mkString(" ")),
        (i.toLong * 2 + 1, dup.mkString(" ")))
    }.toDF("id", "text")
    val threshold = 0.3
    val numHashes = 32
    val bands = 16
    val exact = Dedup.jaccardPairs(docs, "id", "text", n = 3,
        threshold = threshold)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(exact.length >= 80, s"seed corpus too sparse: ${exact.length}")
    val found = Dedup.minHashDedupPairs(docs, "id", "text", n = 3,
        numHashes = numHashes, bands = bands, threshold = threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // analytic collision prob for a pair at Jaccard j with b bands of
    // r rows: p = 1 − (1 − j^r)^b (Dedup scaladoc formula). The found
    // count is a sum of independent-ish Bernoullis → require
    // observed ≥ Σp − 3·σ (σ² = Σ p(1−p)).
    val r = numHashes / bands
    val ps = exact.map { case (_, j) =>
      1.0 - math.pow(1.0 - math.pow(j, r.toDouble), bands.toDouble) }
    val mu = ps.sum
    val sigma = math.sqrt(ps.map(p => p * (1.0 - p)).sum)
    val obs = exact.count { case (pair, _) => found(pair) }
    assert(obs >= mu - 3.0 * sigma - 1e-9,
      s"recall $obs/${exact.length} below analytic bound $mu ± $sigma")
    assert(found.subsetOf(exact.map(_._1).toSet),
      "verify must never pass a below-threshold pair")
  }

  test("cosine-LSH recall meets the analytic hyperplane bound") {
    // 100 base vectors (dim 16) + 2 noisy copies each; exact pairs at
    // cos ≥ 0.9 computed driver-side; cosinePairsLsh verifies its
    // candidates exactly, so found/exact measures candidate recall.
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(11L)
    def gauss(d: Int): Array[Double] = Array.fill(d)(rnd.nextGaussian())
    val vecs: Seq[(Long, Array[Double])] = (0 until 100).flatMap { i =>
      val base = gauss(16)
      def noisy(eps: Double): Array[Double] =
        base.zip(gauss(16)).map { case (x, n) => x + eps * n }
      Seq((i.toLong * 3, base), (i.toLong * 3 + 1, noisy(0.05)),
        (i.toLong * 3 + 2, noisy(0.25)))
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    val threshold = 0.9
    val exact = (for {
      i <- vecs.indices; j <- (i + 1) until vecs.length
      c = cos(vecs(i)._2, vecs(j)._2) if c >= threshold
    } yield ((math.min(vecs(i)._1, vecs(j)._1),
        math.max(vecs(i)._1, vecs(j)._1)), c))
    assert(exact.length >= 80, s"seed corpus too sparse: ${exact.length}")
    val planes = 32
    val bands = 4
    val df = vecs.map { case (id, v) => (id, v.toSeq) }
      .toDF("id", "embedding")
    val found = Dedup.cosinePairsLsh(df, "id", "embedding",
        threshold = threshold, planes = planes, bands = bands)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // p(θ) = 1 − (1 − (1 − θ/π)^w)^b, w = planes/bands (Dedup scaladoc)
    val w = planes / bands
    val ps = exact.map { case (_, c) =>
      val pBit = 1.0 - math.acos(math.min(1.0, c)) / math.Pi
      1.0 - math.pow(1.0 - math.pow(pBit, w.toDouble), bands.toDouble)
    }
    val mu = ps.sum
    val sigma = math.sqrt(ps.map(p => p * (1.0 - p)).sum)
    val obs = exact.count { case (pair, _) => found(pair) }
    assert(obs >= mu - 3.0 * sigma - 1e-9,
      s"recall $obs/${exact.length} below analytic bound $mu ± $sigma")
  }

  test("asofJoin equals the naive per-row argmax on random event sets") {
    val sp = spark
    import sp.implicits._
    val eventGen = for {
      key <- Gen.choose(1L, 4L)
      t <- Gen.choose(0L, 1000L)
      v <- Gen.choose(0, 100)
    } yield (key, t, v.toDouble)
    samples(Gen.listOfN(80, eventGen), 4, 91L).foreach { evs =>
      // dedupe right side per (key, ts) — the operator's contract
      val right = evs.groupBy(e => (e._1, e._2)).map { case ((k, t), g) =>
        (k, t, g.map(_._3).max) }.toSeq
      val left = evs.take(40).map(e => (e._1, e._2 + 1))
      val lDf = left.toDF("k", "ts").withColumn("ts",
        timestamp_seconds(col("ts")).cast("timestamp"))
      val rDf = right.toDF("k", "ts", "v").withColumn("ts",
        timestamp_seconds(col("ts")).cast("timestamp"))
      val got = graft.ops.Temporal
        .asofJoin(lDf, rDf, Seq("k"), "ts", Seq("v"))
        .select(col("k"), unix_timestamp(col("ts")),
          col("asof_v")).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Double])))
        .sortBy(t => (t._1, t._2))
      val want = left.map { case (k, t) =>
        val prior = right.filter(r => r._1 == k && r._2 <= t)
        (k, t, if (prior.isEmpty) None
               else Some(prior.maxBy(_._2)._3))
      }.sortBy(t => (t._1, t._2))
      assert(got.toSeq === want)
    }
  }

  test("semDedup equals an independent in-memory replay and is " +
      "input-order invariant") {
    val sp = spark
    import sp.implicits._
    val dim = 4
    // small discrete component set → frequent exact/near duplicates
    val vecGen = Gen.listOfN(dim, Gen.oneOf(-1.0, -0.5, 0.2, 0.5, 1.0))
    val rowsGen = Gen.choose(6, 24).flatMap(n => Gen.listOfN(n, vecGen))
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var acc = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        acc += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      acc / (math.sqrt(na) * math.sqrt(nb))
    }
    samples(rowsGen, 4, 21L).foreach { vs =>
      val docs = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val cents = Seq((0L, docs.head._2), (1L, docs.last._2))
      val tau = 0.9
      // independent replay of the documented semantics: argmin
      // assignment (ties to lower cell id), rank by (rounded cent-cos,
      // id), greedy dominance by any earlier-ranked same-cell row
      val expected = docs
        .map { case (id, v) =>
          val cell = cents.minBy(c =>
            (Ann.Cosine.distScala(v.toArray, c._2.toArray), c._1))._1
          val cc = BigDecimal(cos(v, cents.find(_._1 == cell).get._2))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          (id, cell, cc, v)
        }
        .groupBy(_._2).toSeq.flatMap { case (_, rows) =>
          val ordered = rows.sortBy(r => (r._3, r._1))
          ordered.zipWithIndex.collect { case ((id, cell, cc, v), i)
              if !ordered.take(i).exists { case (_, _, _, w) =>
                BigDecimal(cos(v, w)).setScale(6,
                  BigDecimal.RoundingMode.HALF_UP).toDouble >= tau } =>
            (id, cell, cc)
          }
        }.toSet
      val model = Ann.IvfModel(cents.toDF("centroid_id", "centroid"),
        "centroid_id", "centroid")
      def run(input: Seq[(Long, Seq[Double])]): Set[(Long, Long, Double)] =
        Dedup.semDedup(input.toDF("id", "vec"), "id", "vec", model,
            tau = tau).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(run(docs) === expected)
      assert(run(new scala.util.Random(5).shuffle(docs)) === expected)
    }
  }

  test("packBits/unpackBits roundtrip on random widths and patterns") {
    val sp = spark
    import sp.implicits._
    val rowGen = for {
      dims <- Gen.choose(1, 40)
      bits <- Gen.listOfN(dims, Gen.oneOf(0, 1))
    } yield bits
    samples(Gen.listOfN(12, rowGen), 3, 17L).foreach { rows =>
      rows.groupBy(_.length).foreach { case (dims, group) =>
        val df = group.zipWithIndex.map { case (b, i) => (i.toLong, b) }
          .toDF("id", "bits")
        val bad = df
          .withColumn("back",
            Ann.unpackBits(Ann.packBits(col("bits")), dims))
          .filter(col("back") =!= col("bits")).count()
        assert(bad === 0L)
      }
    }
  }
}
