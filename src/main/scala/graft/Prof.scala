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

    def audit(label: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n===== PLAN $label =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }

    val docs = queries.Tables.documents(spark, d)
    val idx = ops.Bm25.buildCached(docs, "doc_id", "text", d)
    audit("bm25.search", ops.Bm25.search(idx, "spark filter join", 10))
    audit("jaccard", ops.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5))
    audit("c01_cascade", queries.Crud.crudCascade(spark, d))
    audit("s02_sessions", queries.Events.queries("s02_user_sessions")(spark, d))
    spark.stop()
  }
}
