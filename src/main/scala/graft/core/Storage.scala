package graft.core

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Versioned-segment table storage with an atomic multi-table manifest.
  *
  * Layout under `root/`:
  * {{{
  *   _manifest.tsv          table \t seg \t seg ...   (one line per table)
  *   <table>/seg-<n>-<id>/  immutable parquet segment directories
  * }}}
  *
  * Segments are append-only and immutable; the manifest names the live
  * segments of every table. ALL mutations (insert = add segment,
  * delete/overwrite = replace segment list, drop = remove line) become
  * visible through ONE atomic manifest rename — which is exactly the
  * all-or-nothing multi-table commit the reference gets from a PostgreSQL
  * transaction (/root/reference/vechord/registry.py:28-62): stage any
  * number of segment writes, swap the manifest once, or never (rollback =
  * discarding the staged manifest; orphan segment dirs are garbage, not
  * state). The same mechanism gives the "rows inserted in this txn"
  * buffer (client.py:25-37): a transaction's buffer is just the segments
  * it has staged per table.
  *
  * At scale this is the (simplified) Delta/Iceberg transaction-log
  * pattern; local filesystem rename stands in for the log store.
  */
final class Catalog(val spark: SparkSession, val root: String) {

  private val rootPath: Path = Paths.get(root)
  Files.createDirectories(rootPath)
  private val manifestPath: Path = rootPath.resolve("_manifest.tsv")

  /** table -> live segment dir names (relative to root/<table>/). */
  @volatile private var manifest: Map[String, Vector[String]] = load()

  private val segCounter = new AtomicLong(0L)

  private def load(): Map[String, Vector[String]] =
    if (!Files.exists(manifestPath)) Map.empty
    else Files.readAllLines(manifestPath).asScala.filter(_.nonEmpty).map {
      line =>
        val parts = line.split("\t", -1)
        parts.head -> parts.tail.filter(_.nonEmpty).toVector
    }.toMap

  def current: Map[String, Vector[String]] = manifest

  def tableExists(table: String): Boolean = manifest.contains(table)

  /** Read a table at an explicit manifest state (a txn's staged view or
    * [[current]]); empty-but-registered tables yield an empty frame with
    * the supplied schema. */
  def read(table: String, schema: StructType,
           state: Map[String, Vector[String]]): DataFrame = {
    val segs = state.getOrElse(table, Vector.empty)
    if (segs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schema)
    else
      spark.read.schema(schema)
        .parquet(segs.map(s => segPath(table, s).toString): _*)
  }

  def segPath(table: String, seg: String): Path =
    rootPath.resolve(table).resolve(seg)

  /** Reserve a fresh immutable segment directory name. */
  def newSegment(table: String): String =
    s"seg-${segCounter.incrementAndGet()}-${java.util.UUID.randomUUID().toString.take(8)}"

  /** Write a DataFrame as one new segment; returns the segment name.
    * The write is invisible until a manifest commit names the segment. */
  def writeSegment(table: String, df: DataFrame): String = {
    val seg = newSegment(table)
    df.write.mode("overwrite").parquet(segPath(table, seg).toString)
    seg
  }

  /** Atomically publish a new manifest state. */
  def commit(state: Map[String, Vector[String]]): Unit =
    commitMerge(_ => state)

  /** Atomically transform-and-publish: `f` runs under the commit lock on
    * the LATEST manifest, so concurrent committers serialize and none
    * overwrites another's published segments (the rebase hook for
    * optimistic transactions). */
  def commitMerge(f: Map[String, Vector[String]] => Map[String, Vector[String]])
      : Unit = synchronized {
    val state = f(manifest)
    val tmp = rootPath.resolve(s"_manifest.tmp-${java.util.UUID.randomUUID()}")
    val lines = state.toSeq.sortBy(_._1).map { case (t, segs) =>
      (t +: segs).mkString("\t")
    }
    Files.write(tmp, lines.asJava)
    Files.move(tmp, manifestPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    manifest = state
  }
}
