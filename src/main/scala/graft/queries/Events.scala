package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Event-stream queries over the `events` table: event-time windows
  * (the SAME operator code as the streaming path — Stream.windowedCounts
  * run in batch mode), gaps-and-islands sessionization, and JSON props
  * extraction (the Jsonb column type, SURVEY §1.2, as
  * `get_json_object` over a string column).
  */
object Events {

  /** Daily tumbling-window counts per event type (streaming operator,
    * batch execution). */
  def windowAgg(s: SparkSession, d: String): DataFrame =
    graft.streaming.Stream.windowedCounts(events(s, d), "1 day", "2 days")
      .select(col("window_start"), col("event_type"), col("n"),
        round(col("total"), 6).as("total"))
      .orderBy("window_start", "event_type")

  val SessionGapMinutes = 30

  /** Per-user session stats: a session breaks after a 30-minute gap.
    * One shuffle (partitionBy user) + windowed lag — the distributed
    * form of per-user ordered iteration. */
  def userSessions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts")
    val prev = lag(col("ts"), 1).over(w)
    events(s, d)
      .withColumn("new_session",
        when(prev.isNull ||
          col("ts") > prev + expr(s"INTERVAL $SessionGapMinutes MINUTES"), 1L)
          .otherwise(0L))
      .groupBy("user_id")
      .agg(sum(col("new_session")).as("n_sessions"),
        count(lit(1)).as("n_events"),
        round(dsum(col("value")).cast("double"), 6).as("total_value"))
      .orderBy("user_id")
  }

  /** JSON props extraction + bucketing: get_json_object over the string
    * column (the JSONB passthrough pattern). */
  def propsJson(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .withColumn("k_bucket", col("k") % 10)
      .groupBy("k_bucket")
      .agg(count(lit(1)).as("n"), round(avg(col("k")), 6).as("avg_k"))
      .orderBy("k_bucket")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_event_window_agg" -> windowAgg,
    "s02_user_sessions" -> userSessions,
    "s03_props_json" -> propsJson)

  val oracles: Map[String, String] = Map(
    "s01_event_window_agg" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
           event_type,
           count(*) AS n, round(sum(value), 6) AS total
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "s02_user_sessions" ->
      """WITH x AS (
           SELECT user_id, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                    IS NULL
                  OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                    > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS ns
           FROM events)
         SELECT user_id, CAST(sum(ns) AS BIGINT) AS n_sessions,
           count(*) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6)
             AS total_value
         FROM x GROUP BY 1 ORDER BY 1""",
    "s03_props_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10
             AS k_bucket,
           count(*) AS n,
           round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 6)
             AS avg_k
         FROM events GROUP BY 1 ORDER BY 1""")
}
