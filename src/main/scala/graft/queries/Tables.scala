package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared table access + determinism helpers for the declared query set. */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  /** events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; read the raw int64 nanos and convert to
    * microsecond-precision timestamp_ntz (identical to DuckDB's
    * nanos→µs truncation, so oracle comparisons line up). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the ltz->ntz cast below is session-timezone dependent: pin UTC so
    // every entry point (Bench/ScaleSmoke included, which set no TZ)
    // reads the same event times the DuckDB oracle sees
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val df = t(s, d, "events")
    // the generated table has shipped ts as BOTH parquet nanos (read as
    // long under the legacy flag) and a plain timestamp — normalize
    // either to timestamp_ntz so the event-time queries see one type
    val converted = df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")
      case _ => col("ts").cast("timestamp_ntz")
    }
    df.withColumn("ts", converted)
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Deterministic double sum: per-row cast to exact decimal (order-
    * independent exact addition, unlike double sums whose partial-merge
    * order varies across runs/engines), final cast back to double.
    * The SQL oracle uses the same CAST(SUM(CAST(x AS DECIMAL(38,6))) AS
    * DOUBLE) shape so values are bit-identical. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(38, 6))).cast("double")

  /** timestamp_ntz literal matching DuckDB's naive TIMESTAMP 'lit'. */
  def ts(litStr: String): Column = lit(litStr).cast("timestamp_ntz")
}
