package graft

import org.apache.spark.sql.SparkSession

/** Dev-only A/B harness for compression codecs (optimization guide
  * §2.3 shuffle codec / §6 parquet codec): builds a session with the
  * codecs named in SPARK_GRAFT_SHUFFLE_CODEC / SPARK_GRAFT_PARQUET_CODEC
  * (defaults: Spark's lz4 / snappy) and times a query slice with the
  * bench's exact methodology (same warm-up, fn().count(), min over
  * SPARK_GRAFT_PASSES time-separated passes). One codec combination
  * per JVM — run it once per arm:
  *   SPARK_GRAFT_ONLY=r103,s26 SPARK_GRAFT_SHUFFLE_CODEC=zstd \
  *   sbt "runMain graft.CodecAB"
  * Deliberately separate from graft.Bench: the driver contract's
  * harness stays byte-identical. */
object CodecAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffleCodec = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_CODEC", "lz4")
    val parquetCodec = sys.env.getOrElse("SPARK_GRAFT_PARQUET_CODEC", "snappy")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.io.compression.codec", shuffleCodec)
      .config("spark.sql.parquet.compression.codec", parquetCodec)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    locally {
      import org.apache.spark.sql.functions._
      val warm = udf((s: String) => s.length)
      spark.read.parquet(s"$sfDir/region.parquet")
        .repartition(4).withColumn("w", warm(col("r_name")))
        .groupBy("w").count().count()
    }
    val only = sys.env.getOrElse("SPARK_GRAFT_ONLY",
      "q17,q18,p18,m06,r42,r96,r103,r105,s22,s26,s32").split(",").toSeq
    val selected = SparkEntry.queries
      .filter { case (n, _) => only.exists(n.startsWith) }
      .toSeq.sortBy(_._1)
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    val passTimes = (1 to passes).map { _ =>
      selected.map { case (name, fn) =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    val mins = selected.map { case (name, _) =>
      name -> passTimes.map(_.find(_._1 == name).get._2).min
    }
    def fmt(v: Double) =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    mins.foreach { case (n, v) => println(s"CODECAB $n ${fmt(v)}") }
    println(s"CODECAB_TOTAL shuffle=$shuffleCodec parquet=$parquetCodec " +
      s"warm_min_total=${fmt(mins.map(_._2).sum)} n=${mins.size}")
    spark.stop()
  }
}
