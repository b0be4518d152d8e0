package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Ann

/** ANN recall-curve smoke: recall@10 vs probe budget for the three
  * index types (plain IVF, IVF+SQ, IVF+1-bit) against the exact
  * brute-force top-10 — the measured form of the engine's
  * approximate-search contract (speed is benched by graft.Bench;
  * recall was previously only unit-asserted). Run:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.RecallSmoke"
  *
  * Prints one JSON line per (index, probes) cell plus a summary table;
  * results are recorded in SURVEY.md §8. The probe ladder ends at
  * lists (all cells probed), where plain IVF recall MUST be 1.0 and
  * the quantized types approach it bounded by their refine budget —
  * a built-in sanity row. */
object RecallSmoke {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val lists = sys.env.getOrElse("SPARK_GRAFT_LISTS", "32").toInt
    val nQueries = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "20").toInt
    val k = 10
    val refine = 5
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet").persist()
    val n = e.count()
    val model = Ann.buildIvfKMeans(e, "embedding", lists, Ann.L2)
    val assigned = Ann.assign(e, "embedding", model, Ann.L2).persist()
    assigned.count()
    val sqBuilt = Ann.buildIvfSq(e, "embedding", model, Ann.L2)
    val sq = Ann.IvfSqIndex(sqBuilt.quantized.persist(),
      sqBuilt.bounds.persist(), model)
    val bitBuilt = Ann.buildIvfBitq(e, "embedding", model, Ann.L2)
    val bitq = Ann.IvfBitIndex(bitBuilt.quantized.persist(), model)

    val queries = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      .persist()
    val qVecs: Seq[(Long, Seq[Double])] = queries
      .select(col("q_id"), col("qv").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
      .sortBy(_._1)

    // exact truth: one batch kNN join
    val truth: Map[Long, Set[Long]] = Ann.knnJoin(queries, "q_id", "qv",
        e.select(col("vec_id").as("d_id"), col("embedding").as("dv")),
        "d_id", "dv", Ann.L2, k)
      .select("q_id", "d_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(1)).toSet }

    def recallOf(got: Map[Long, Set[Long]]): Double = {
      val per = truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).count(t) / k.toDouble }
      per.sum / per.size
    }

    val probeLadder = Seq(2, 8, lists)
    val rows = scala.collection.mutable.ArrayBuffer[(String, Int, Double)]()
    for (probes <- probeLadder) {
      // plain IVF: the batch join covers all queries in one job
      val ivfGot = Ann.knnJoinIvf(queries, "q_id", "qv",
          assigned.select(col("vec_id").as("d_id"),
            col("embedding").as("dv"), col("centroid_id")),
          "d_id", "dv", model, Ann.L2, probes, k)
        .select("q_id", "d_id").collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      rows += (("ivf", probes, recallOf(ivfGot)))
      // quantized types: per-query two-phase searches
      def perQuery(search: Seq[Double] => Array[Long]):
          Map[Long, Set[Long]] =
        qVecs.map { case (q, v) => q -> search(v).toSet }.toMap
      rows += (("ivf_sq", probes, recallOf(perQuery(v =>
        Ann.searchIvfSq(sq, "vec_id", "embedding", typedlit(v), Ann.L2,
            probes, k, refine)
          .select("vec_id").collect().map(_.getLong(0))))))
      rows += (("ivf_bitq", probes, recallOf(perQuery(v =>
        Ann.searchIvfBitq(bitq, "vec_id", "embedding", typedlit(v), Ann.L2,
            probes, k, refine)
          .select("vec_id").collect().map(_.getLong(0))))))
    }

    def fmt(v: Double): String =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    rows.foreach { case (ix, p, r) =>
      println(s"""{"smoke":"recall","index":"$ix","probes":$p,""" +
        s""""recall_at_10":${fmt(r)},"lists":$lists,"n":$n,""" +
        s""""queries":${qVecs.length},"refine":$refine}""")
    }
    // all-probe sanity: plain IVF must be exact
    val allProbe = rows.find(r => r._1 == "ivf" && r._2 == lists).get._3
    require(allProbe == 1.0,
      s"IVF with probes=lists must be exact, got $allProbe")
    spark.stop()
  }
}
