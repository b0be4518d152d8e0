package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Ann

/** Dev-only: decompose r57_range_join phase by phase. */
object ProfR57 {
  def t[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROF $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
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
    val s = spark
    import queries.Tables
    // warm-up
    Tables.embeddings(s, d).count()

    for (pass <- 1 to 2) {
      println(s"--- pass $pass ---")
      val e = Tables.embeddings(s, d)
      println("embeddings rows=" + e.count() + " dim=" +
        e.select(size(col("embedding"))).head().getInt(0))
      val model = t("buildIvf")(Ann.buildIvf(e, "label", "embedding"))
      t("centroids count")(model.centroids.count())
      val assigned = Ann.assign(e, "embedding", model, Ann.L2)
        .select(col("vec_id").as("d_id"), col("embedding").as("dv"),
          col("centroid_id"))
      t("assigned count")(assigned.count())
      val radii = Ann.cellRadii(
        assigned.withColumnRenamed("dv", "embedding"), "embedding",
        model, Ann.L2)
      t("radii collect")(radii.collect())
      val queries2 = e.select(col("vec_id").as("q_id"),
        col("embedding").as("qv"))
      val joined = Ann.rangeJoinIvf(queries2, "q_id", "qv", assigned,
          "d_id", "dv", model, radii, Ann.L2, eps = 1.2)
        .filter(col("q_id") < col("d_id"))
        .select(col("q_id").as("qid"), col("d_id").as("did"), col("dist"))
      if (pass == 2) joined.explain("formatted")
      t("join count")(println("pairs=" + joined.count()))
    }
    spark.stop()
  }
}
