package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Focused pins for round-19 operator-internal optimizations: each
  * fast path must be observationally identical to the path it
  * replaced (the oracle gates pin end-to-end results; these pin the
  * internals' equivalence directly, so a drift is caught at the
  * operator, not three layers up). */
class OptimizedPathsSpec extends SparkSpecBase {
  import spark.implicits._

  private def vecs(n: Int, dim: Int, seed: Int): Seq[(Long, Seq[Double])] =
    (0 until n).map { i =>
      val r = new scala.util.Random(seed + i)
      (i.toLong, Seq.fill(dim)(math.rint(r.nextDouble() * 100) / 100))
    }

  test("probeCellIds literal fast path selects exactly the probeCells " +
      "job form's cells, every metric") {
    val docs = vecs(200, 8, 7).toDF("id", "v")
    val model = Ann.buildIvfKMeans(docs, "v", k = 9, Ann.L2, iters = 2)
    val q = vecs(1, 8, 99).head._2
    for (metric <- Seq[Ann.Metric](Ann.L2, Ann.Cosine, Ann.InnerProduct);
         probes <- Seq(1, 3, 9)) {
      val viaJob = Ann.probeCells(model, typedlit(q), metric, probes)
        .collect().map(_.getLong(0)).toSeq
      val viaDriver =
        Ann.probeCellIds(model, typedlit(q), metric, probes).toSeq
      assert(viaDriver == viaJob,
        s"metric=$metric probes=$probes: driver $viaDriver != job $viaJob")
    }
  }

  test("probeCellIds falls back to the job form for non-literal query " +
      "columns and still agrees") {
    val docs = vecs(100, 6, 3).toDF("id", "v")
    val model = Ann.buildIvfKMeans(docs, "v", k = 5, Ann.L2, iters = 2)
    val q = vecs(1, 6, 42).head._2
    // a computed column (literal wrapped in arithmetic) is NOT a plain
    // literal — the extractor must decline and the fallback must run
    val computed = transform(typedlit(q), x => x + lit(0.0))
    assert(Ann.literalVec(computed).isEmpty)
    val viaFallback = Ann.probeCellIds(model, computed, Ann.L2, 3).toSeq
    val viaJob = Ann.probeCells(model, computed, Ann.L2, 3)
      .collect().map(_.getLong(0)).toSeq
    assert(viaFallback == viaJob)
  }

  test("buildIvfKMeansIfSplittable: None exactly on an identical-at-" +
      "hash-precision corpus; bit-identical model otherwise") {
    val dup = (0 until 50).map(i => (i.toLong, Seq(1.0, 2.0, 3.0)))
      .toDF("id", "v")
    assert(Ann.buildIvfKMeansIfSplittable(dup, "v", k = 2).isEmpty)
    // >= 16 copies of the min-hash vector must not fool the oversample
    // window: two distinct vectors stay splittable
    val skew = ((0 until 40).map(i => (i.toLong, Seq(1.0, 2.0, 3.0))) :+
      (99L, Seq(9.0, 9.0, 9.0))).toDF("id", "v")
    assert(Ann.buildIvfKMeansIfSplittable(skew, "v", k = 2).nonEmpty)
    val mixed = vecs(120, 5, 11).toDF("id", "v")
    val viaOpt = Ann.buildIvfKMeansIfSplittable(mixed, "v", k = 2,
      Ann.L2, iters = 2).get
    val viaPlain = Ann.buildIvfKMeans(mixed, "v", k = 2, Ann.L2,
      iters = 2)
    assert(Ann.modelFingerprint(viaOpt) == Ann.modelFingerprint(viaPlain))
  }

  test("ivfModelAt re-loads when the centroids dir changes (listing-" +
      "signature staleness) and caches when it does not") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_modelcache").toString
    val m1 = Ann.buildIvfKMeans(vecs(60, 4, 5).toDF("id", "v"), "v",
      k = 3, Ann.L2, iters = 1)
    m1.centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    val a = Ann.ivfModelAt(spark, dir)
    val b = Ann.ivfModelAt(spark, dir)
    assert(a eq b, "unchanged listing must return the cached instance")
    // mutate the side table the way maintenance does (full overwrite:
    // fresh part-UUID files) — the next load must see the new set
    val m2 = Ann.buildIvfKMeans(vecs(60, 4, 77).toDF("id", "v"), "v",
      k = 4, Ann.L2, iters = 1)
    m2.centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    val c = Ann.ivfModelAt(spark, dir)
    assert(!(c eq a), "a changed listing must re-load")
    assert(c.collectedCentroids.length ==
      m2.collectedCentroids.length)
  }

  test("parallelismFloor raises sub-core scans to defaultParallelism, " +
      "passes wider frames through, and never changes rows") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_floor").toString
    vecs(50, 3, 1).toDF("id", "v").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val one = spark.read.parquet(dir)
    val floored = Ann.parallelismFloor(one)
    val target = spark.sparkContext.defaultParallelism
    assert(floored.rdd.getNumPartitions >= math.min(target, 2))
    assert(floored.select("id").as[Long].collect().sorted.toSeq ==
      one.select("id").as[Long].collect().sorted.toSeq)
    val wide = one.repartition(target + 3)
    assert(Ann.parallelismFloor(wide) eq wide,
      "a frame already at/above the floor must pass through untouched")
  }
}
