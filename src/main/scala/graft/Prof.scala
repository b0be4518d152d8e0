package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling / plan-audit main (dev-only). */
object Prof {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROF $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = queries.Tables.documents(spark, d)
    time("warmup")(docs.select(count(lit(1))).head())

    time("p02_full")(
      ops.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5).count())
    time("p03_full")(
      ops.Dedup.minHashDedupPairs(docs, "doc_id", "text", 3, 32, 16, 0.5)
        .count())
    time("p02_again")(
      ops.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5).count())
    time("p10_full")(
      queries.DataOps.fingerprintOverlap(spark, d).count())
    time("g01_full")(
      queries.GraphQ.queries("g01_entity_merge")(spark, d).count())
    time("p05_full")(
      queries.DataOps.closestPairsCos(spark, d).count())
    time("r05_full")(
      queries.Retrieval.queries("r05_bm25_topk")(spark, d).count())
    spark.stop()
  }
}
