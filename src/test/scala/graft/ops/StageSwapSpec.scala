package graft.ops

import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Hadoop FS that refuses exactly the stage-and-swap's cell renames
  * (any rename whose SOURCE sits directly under a `_graft_stage` dir)
  * while letting every output-committer rename through — the
  * failure-injection shim for the loud-rename contract of
  * [[Ann.deleteStored]] / [[graft.streaming.Stream.compactStored]].
  * HDFS-on-error and object-store FS adapters report rename failure by
  * RETURNING FALSE, not throwing — an unchecked call would fall through
  * to staging cleanup and destroy the staged survivors. */
class RenameRefusingFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("graftfail:///")
  override def rename(src: Path, dst: Path): Boolean = {
    if (src.getParent != null && src.getParent.getName == "_graft_stage")
      false
    else super.rename(src, dst)
  }
}

class StageSwapSpec extends SparkSpecBase {

  private def withFailFs[T](body: => T): T = {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.graftfail.impl", classOf[RenameRefusingFs].getName)
    conf.setBoolean("fs.graftfail.impl.disable.cache", true)
    body
  }

  private def assignedDf = {
    val sp = spark
    import sp.implicits._
    (0 until 20).map(i => (i.toLong, Seq(i * 1.0, 0.0), (i % 2).toLong))
      .toDF("vec_id", "embedding", "centroid_id")
  }

  test("deleteStored fails LOUD on a refused cell-swap rename and " +
      "leaves both the layout and the staged survivors intact") {
    withFailFs {
      val local = java.nio.file.Files
        .createTempDirectory("graft-swapfail").toString
      val dir = s"graftfail:$local"
      Ann.writePartitioned(assignedDf, dir)
      val ex = intercept[java.io.IOException] {
        Ann.deleteStored(spark, dir, col("vec_id") === 4L)
      }
      assert(ex.getMessage.contains("rename failed"))
      // the staged survivors were NOT cleaned up (re-runnable evidence,
      // nothing destroyed) ...
      assert(new java.io.File(local, "_graft_stage").exists())
      // ... and the layout still reads complete: 19 of the 20 rows is
      // the one unacceptable outcome (dest deleted, stage stranded)
      val n = spark.read.parquet(dir).count()
      assert(n === 20L)
    }
  }

  test("compactStored fails LOUD on a refused cell-swap rename with " +
      "the layout intact") {
    withFailFs {
      val local = java.nio.file.Files
        .createTempDirectory("graft-compfail").toString
      val dir = s"graftfail:$local"
      // two appends => 2 files per cell, above the compaction threshold
      assignedDf.write.mode("append").partitionBy("centroid_id")
        .parquet(dir)
      assignedDf.withColumn("vec_id", col("vec_id") + 100)
        .write.mode("append").partitionBy("centroid_id").parquet(dir)
      val ex = intercept[java.io.IOException] {
        graft.streaming.Stream.compactStored(spark, dir, "centroid_id",
          maxFilesPerCell = 1)
      }
      assert(ex.getMessage.contains("rename failed"))
      assert(spark.read.parquet(dir).count() === 40L)
    }
  }

  test("compactStored preserves NULL-cell rows (the Hive default " +
      "partition dir), which no isin() can match") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-nullcell").toString
    val rows = (0 until 12).map(i =>
      (i.toLong, if (i % 2 == 0) null else "plain"))
    (0 until 3).foreach { _ =>
      rows.toDF("id", "cell").write.mode("append")
        .partitionBy("cell").parquet(dir)
    }
    assert(new java.io.File(dir).listFiles().map(_.getName)
      .contains("cell=__HIVE_DEFAULT_PARTITION__"))
    val rewritten = graft.streaming.Stream.compactStored(spark, dir,
      "cell", maxFilesPerCell = 1)
    assert(rewritten === 2L)
    val back = spark.read.parquet(dir)
    // the null-cell rows survived compaction (pre-fix: the targeted
    // dir staged nothing and the cleanup deleted the only copy)
    assert(back.count() === 36L)
    assert(back.filter(col("cell").isNull).count() === 18L)
  }

  test("a swap that crashed between its two renames is recovered " +
      "before the next stored delete reads the layout") {
    val local = java.nio.file.Files
      .createTempDirectory("graft-crashrec").toString
    Ann.writePartitioned(assignedDf, local)
    val fs = new org.apache.hadoop.fs.Path(local).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // simulate the crash window: cell 1 was moved aside but the staged
    // dir never made it in — the live dir is gone, `__old` holds the
    // only copy (invisible to Spark reads)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(local, "centroid_id=1"),
      new org.apache.hadoop.fs.Path(local, ".centroid_id=1__old")))
    assert(spark.read.parquet(local).count() === 10L) // half missing
    // the next delete recovers the stranded cell BEFORE staging, so
    // its surviving rows are not lost
    val removed = Ann.deleteStored(spark, local, col("vec_id") === 4L)
    assert(removed === 1L)
    val back = spark.read.parquet(local)
    assert(back.count() === 19L)
    assert(back.filter(col("centroid_id") === 1L).count() === 10L)
  }

  test("healSideTableSwap promotes a complete orphaned _next WITHOUT " +
      "a _SUCCESS marker (marksuccessfuljobs=false clusters) — the " +
      "committed part file IS the completeness evidence") {
    val sp = spark
    import sp.implicits._
    val docs = (0L until 30L)
      .map(i => (i, Seq((i % 3).toDouble * 10.0, 0.0), (i % 3).toInt))
      .toDF("vec_id", "embedding", "cluster")
    val model = Ann.buildIvf(docs, "cluster", "embedding")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-heal-nosuccess").toString
    Ann.writeRangeIndex(Ann.assign(docs, "embedding", model, Ann.L2),
      "embedding", model, dir)
    val q = typedlit(Seq(0.0, 0.0))
    val before = Ann.rangeSearchStoredSelf(sp, dir, "vec_id",
        "embedding", q, eps = 1.0)
      .select("vec_id", "dist").as[(Long, Double)].collect().toSeq
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      sp.sparkContext.hadoopConfiguration)
    // the legacy window on a no-marker cluster: live radii deleted,
    // the staged copy is complete but carries no _SUCCESS
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/radii"),
      new org.apache.hadoop.fs.Path(s"$dir/radii_next")))
    fs.delete(
      new org.apache.hadoop.fs.Path(s"$dir/radii_next/_SUCCESS"), false)
    Ann.healRoot(sp, dir) // pre-fix: DELETED the only copy
    val after = Ann.rangeSearchStoredSelf(sp, dir, "vec_id",
        "embedding", q, eps = 1.0)
      .select("vec_id", "dist").as[(Long, Double)].collect().toSeq
    assert(after === before)
  }

  test("healSideTableSwap refuses LOUDLY when the only staged copy " +
      "holds no committed data — never deletes the last evidence") {
    val sp = spark
    import sp.implicits._
    val docs = (0L until 30L)
      .map(i => (i, Seq((i % 3).toDouble * 10.0, 0.0), (i % 3).toInt))
      .toDF("vec_id", "embedding", "cluster")
    val model = Ann.buildIvf(docs, "cluster", "embedding")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-heal-lost").toString
    Ann.writeRangeIndex(Ann.assign(docs, "embedding", model, Ann.L2),
      "embedding", model, dir)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      sp.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/radii"), true)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/radii_next"))
    val e = intercept[IllegalStateException] {
      Ann.healRoot(sp, dir)
    }
    assert(e.getMessage.contains("no committed data"))
    // the evidence survived the refusal
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/radii_next")))
  }

  test("compactStored targets STRING cells through Spark's partition-" +
      "path escaping (a `cell=a%3Ab` dir compacts, no rows lost)") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-escape").toString
    val rows = (0 until 12).map(i =>
      (i.toLong, if (i % 2 == 0) "a:b" else "plain"))
    // three appends => 3 files per cell, above the threshold
    (0 until 3).foreach { _ =>
      rows.toDF("id", "cell").write.mode("append")
        .partitionBy("cell").parquet(dir)
    }
    val escaped = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("cell="))
    assert(escaped.contains("cell=a%3Ab"), escaped.mkString(","))
    val rewritten = graft.streaming.Stream.compactStored(spark, dir,
      "cell", maxFilesPerCell = 1)
    // BOTH cells rewritten — the escaped one included (an unescaped
    // comparison would miss its own rows and delete the cell dir)
    assert(rewritten === 2L)
    val back = spark.read.parquet(dir)
    assert(back.count() === 36L)
    assert(back.filter(col("cell") === "a:b").count() === 18L)
    new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("cell=")).foreach { d =>
        val n = d.listFiles().count(f => f.isFile &&
          !f.getName.startsWith("_") && !f.getName.startsWith("."))
        assert(n === 1, s"${d.getName} has $n data files")
      }
  }
}
