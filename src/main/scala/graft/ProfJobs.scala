package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd, SparkListenerStageCompleted}
import scala.collection.mutable

/** Dev-only profiling main: runs selected declared queries with a
  * SparkListener that attributes wall-clock per Spark job to its call
  * site, then prints a per-site summary. Usage:
  *   SPARK_GRAFT_ONLY=s32 sbt "runMain graft.ProfJobs"  */
object ProfJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // job id -> (callsite, start ns)
    val starts = mutable.Map.empty[Int, (String, Long)]
    val bySite = mutable.LinkedHashMap.empty[String, (Int, Double)]
    val byFrame = mutable.LinkedHashMap.empty[String, (Int, Double)]
    val execDesc = mutable.Map.empty[Long, String]
    var nStages = 0
    var nTasks = 0L
    val listener = new SparkListener {
      override def onOtherEvent(
          e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui
              .SparkListenerSQLExecutionStart =>
            starts.synchronized { execDesc(s.executionId) = s.description }
          case _ => ()
        }
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val props = Option(js.properties)
        // AQE sub-jobs carry no call site, but every job carries its
        // SQL execution id — the execution START event's description
        // is the owning action's call site
        val site = props
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
          .flatMap(id => starts.synchronized {
            execDesc.get(id.toLong) })
          .orElse(props.flatMap(p =>
            Option(p.getProperty("callSite.short"))))
          .getOrElse("unknown")
        starts.synchronized { starts(js.jobId) = (site, System.nanoTime()) }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        starts.synchronized {
          starts.remove(je.jobId).foreach { case (site, t0) =>
            val dt = (System.nanoTime() - t0) / 1e9
            val (n, s) = bySite.getOrElse(site, (0, 0.0))
            bySite(site) = (n + 1, s + dt)
          }
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        nStages += 1
        nTasks += sc.stageInfo.numTasks
        val si = sc.stageInfo
        val dur = (for (a <- si.completionTime; b <- si.submissionTime)
          yield (a - b) / 1e3).getOrElse(-1.0)
        // attribute to the deepest graft frame in the stage's call
        // stack (survives AQE, which re-labels the short call site)
        val frame = si.details.linesIterator
          .find(l => l.contains("graft.") && !l.contains("graft.Prof"))
          .map(_.trim.stripPrefix("at ").takeWhile(_ != ')') + ")")
          .getOrElse(si.name.takeWhile(_ != '$'))
        starts.synchronized {
          val (n, s) = byFrame.getOrElse(frame, (0, 0.0))
          byFrame(frame) = (n + 1, s + math.max(dur, 0.0))
        }
        if (dur > 0.15)
          println(f"    STAGE ${dur}%7.3f s tasks=${si.numTasks}%-3d $frame")
      }
    }

    // warm-up identical to Bench
    locally {
      import org.apache.spark.sql.functions._
      val warm = udf((s: String) => s.length)
      spark.read.parquet(s"$sfDir/region.parquet")
        .repartition(4).withColumn("w", warm(col("r_name")))
        .groupBy("w").count().count()
    }

    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
      .getOrElse(Seq("s32"))
    val selected = SparkEntry.queries.filter { case (n, _) =>
      only.exists(n.startsWith) }.toSeq.sortBy(_._1)
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    selected.foreach { case (name, fn) =>
      // warm pass(es) first so the measured pass matches bench "warm"
      (1 until passes).foreach { _ => fn(spark, sfDir).count() }
      starts.clear(); bySite.clear(); byFrame.clear()
      nStages = 0; nTasks = 0L
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      println(f"\n=== $name: total ${total}%.3f s, jobs=${bySite.values.map(_._1).sum}, stages=$nStages, tasks=$nTasks ===")
      val jobSum = bySite.values.map(_._2).sum
      println("  -- by job site (wall sum) --")
      bySite.toSeq.sortBy(-_._2._2).foreach { case (site, (n, s)) =>
        println(f"  ${s}%8.3f s  jobs=$n%-4d $site")
      }
      println("  -- by stage frame (stage-duration sum) --")
      byFrame.toSeq.sortBy(-_._2._2).foreach { case (f, (n, s)) =>
        println(f"  ${s}%8.3f s  stages=$n%-4d $f")
      }
      println(f"  job time total ${jobSum}%.3f s (driver/planning gap ${total - jobSum}%.3f s)")
    }
    spark.stop()
  }
}
