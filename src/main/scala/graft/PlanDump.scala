package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: write `.explain("formatted")` output for selected declared
  * queries to files — the optimization rounds' plan evidence
  * (plans/rNN/<query>_{before,after}.txt). Usage:
  *   SPARK_GRAFT_ONLY=r57,r63 SPARK_GRAFT_PLAN_DIR=plans/r19 \
  *   SPARK_GRAFT_PLAN_SUFFIX=after sbt "runMain graft.PlanDump"
  * Note: this EXECUTES each query once first (many declared queries
  * build their index/layout as part of the function — the final frame's
  * plan only exists after those side effects), then explains the frame.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r19")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "after")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
      .getOrElse(Seq.empty)
    val selected = SparkEntry.queries
      .filter { case (n, _) => only.exists(n.startsWith) }
      .toSeq.sortBy(_._1)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    selected.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      df.count() // run once: side-effecting builds + AQE final plan
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
