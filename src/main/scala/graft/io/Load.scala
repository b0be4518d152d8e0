package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document loaders — the reference's `LocalLoader`/`S3Loader`
  * (/root/reference/vechord/load.py:21-65) as `binaryFile` scans.
  *
  * Output schema mirrors the reference's `Document` struct
  * (model/internal.py:34-40): ext, data, path, digest (sha256 of
  * content, load.py:46), source, updated_at. The scan is a native Spark
  * source: predicate/column pruning apply, and the same code reads
  * `s3a://` buckets on a real cluster (the reference's S3Loader is
  * `NotImplementedError`; here it is the same one-liner).
  */
object Load {

  /** Read every file under `dir` matching `glob` (e.g. "*.txt"). */
  def localDir(spark: SparkSession, dir: String,
               glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(
        regexp_extract(col("path"), "(\\.[^./\\\\]+)$", 1).as("ext"),
        col("content").as("data"),
        col("path"),
        sha2(col("content"), 256).as("digest"),
        lit("local").as("source"),
        col("modificationTime").as("updated_at"))

  /** Same scan over an object store (s3a://bucket/prefix). */
  def s3(spark: SparkSession, uri: String, glob: String = "*"): DataFrame =
    localDir(spark, uri, glob).withColumn("source", lit("s3"))
}
