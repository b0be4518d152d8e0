package graft.io

import org.apache.spark.sql.SparkSession

/** Tiny self-description marker files for at-rest index layouts — the
  * ONE implementation of write / read-to-EOF that the dense
  * (`_graft_ivf_model`), keyword (`_graft_buckets`) and sparse
  * (`_graft_sparse_buckets`) layouts all share. Reading loops to EOF
  * rather than trusting one `read()` call: a stream may legally return
  * a short first read (object-store adapters), and a truncated marker
  * silently corrupts whatever contract it pins (bucket modulus, model
  * fingerprint). */
object Markers {

  def write(spark: SparkSession, dir: String, name: String,
            content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  def read(spark: SparkSession, dir: String,
           name: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      // Hadoop's own copy loop handles every stream contract corner
      // (short reads, zero-length reads) — hand-rolled while(read)
      // loops got this wrong twice already
      try {
        val bos = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 4096, false)
        Some(new String(bos.toByteArray, "UTF-8").trim)
      } finally in.close()
    }
  }

  def exists(spark: SparkSession, dir: String, name: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Remove a marker (no-op when absent) — the closing half of a
    * pending-operation protocol: written before a multi-step commit,
    * removed after its last step, so a crash leaves the marker and
    * readers refuse until the operation re-runs to completion. */
  def remove(spark: SparkSession, dir: String, name: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, false)
    ()
  }
}
