package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins — the two time-series joins a training-data /
  * event-analytics pipeline needs that Spark SQL lacks as built-ins:
  *
  *  - [[asofJoin]]: for every left row, the single most recent right row
  *    at-or-before it per key (pandas `merge_asof`, DuckDB `ASOF JOIN`,
  *    kdb `aj`). Implemented as union + per-key ordered window
  *    `last(ignoreNulls)` — ONE shuffle on the key, no range cross
  *    product, no per-key collect. At 100 TB both sides shuffle once on
  *    the join key and the window is a linear scan per key partition;
  *    skewed keys degrade no worse than any windowed op (state is one
  *    row of carried values, not a buffer).
  *
  *  - [[rangeJoin]]: all (left, right) pairs with equal keys and
  *    `right.ts` in `[left.ts - window, left.ts)` (Flink interval join).
  *    Implemented by bucketing time into `window`-sized buckets and
  *    replicating the RIGHT side to the 2 buckets it can influence —
  *    an equi-join on (key, bucket) + an exact range filter. The plan
  *    is a plain shuffle join: no inequality-only join (which Spark
  *    executes as a broadcast-nested-loop / cartesian), and each pair
  *    is produced exactly once (a right row lands in buckets {b, b+1},
  *    a left row probes only its own bucket).
  *
  * Neither exists in the reference (a vector/keyword engine); they are
  * north-star extensions like [[Sampling]] — but both are *exactly*
  * SQL-expressible, so they carry full DuckDB oracles (ASOF JOIN /
  * inequality join) rather than rows-only checks.
  */
object Temporal {

  /** As-of join: left enriched with the latest right row per `keys`
    * whose `tsCol` is <= the left row's. Right columns in `rightVals`
    * come back as `asof_<name>` (null when no prior right row exists —
    * LEFT OUTER as-of semantics); `asof_ts` carries the matched right
    * timestamp. Ties at identical (key, ts) on the right must be
    * pre-aggregated by the caller (one right row per (key, ts)) for a
    * deterministic result — same contract as DuckDB's ASOF JOIN.
    *
    * Shape: union(left tagged 1, right tagged 0) → window partitioned
    * by key, ordered by (ts, tag) — right sorts before left at equal
    * ts, so an exactly-simultaneous right row IS matched (the >=
    * convention) — carrying `last(value, ignoreNulls=true)` over
    * unbounded-preceding..current. One shuffle total; contrast with
    * the naive `l JOIN r ON key AND r.ts <= l.ts` + argmax, whose
    * range join is quadratic per key.
    */
  /** Optional `tolerance` (e.g. "15 minutes") nulls out matches older
    * than `left.ts − tolerance` — pandas `merge_asof(tolerance=...)`
    * semantics; applied AFTER the window carry, so it is a row-local
    * filter with no extra shuffle. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, rightVals: Seq[String],
               tolerance: Option[String] = None): DataFrame = {
    val leftOnly = left.columns.filterNot(c =>
      keys.contains(c) || c == tsCol).toSeq
    require(rightVals.intersect(leftOnly).isEmpty,
      s"right value columns ${rightVals.intersect(leftOnly).mkString(",")} " +
        "collide with left columns — alias one side first")
    // the GENERATED output names collide too (e.g. chaining two asofJoin
    // calls with the same rightVals): a left column named asof_ts /
    // asof_<v> would duplicate an output column and break the tolerance
    // branch's column rewrite
    val generated = "asof_ts" +: rightVals.map("asof_" + _)
    require(left.columns.intersect(generated).isEmpty,
      s"left columns ${left.columns.intersect(generated).mkString(",")} " +
        "collide with generated asof_* output columns — alias them first")
    require(!rightVals.contains("__asof_ts"),
      "right value column __asof_ts collides with the carry struct's " +
        "timestamp field — alias it first")
    val lTagged = left
      .select((keys.map(col) :+ col(tsCol) :+ lit(1).as("__tag")) ++
        leftOnly.map(col) ++
        rightVals.map(v => lit(null).cast(right.schema(v).dataType).as(v)): _*)
    val rTagged = right
      .select((keys.map(col) :+ col(tsCol) :+ lit(0).as("__tag")) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightVals.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry the latest right ROW as one struct, not per-column
    // ignoreNulls carries: a right row whose value column is null must
    // still win (pandas merge_asof / DuckDB ASOF semantics) — per-column
    // last(ignoreNulls) would pair an older value with a newer asof_ts
    val rowStruct = when(col("__tag") === 0,
      struct(col(tsCol).as("__asof_ts") +: rightVals.map(col): _*))
    val carriedAll = rightVals.zipWithIndex
      .foldLeft(
        lTagged.unionByName(rTagged)
          .select(col("*"),
            last(rowStruct, ignoreNulls = true).over(w).as("__asof"))
          .where(col("__tag") === 1)
          .withColumn("asof_ts", col("__asof").getField("__asof_ts"))) {
        case (df, (v, _)) =>
          df.withColumn(s"asof_$v", col("__asof").getField(v))
      }
      .drop("__tag" +: "__asof" +: rightVals: _*)
    tolerance match {
      case None => carriedAll
      case Some(tol) =>
        val inTol = col("asof_ts") >= col(tsCol) - expr(s"INTERVAL $tol")
        carriedAll.select(
          carriedAll.columns.map {
            // null exactly the GENERATED columns — a pre-existing left
            // column that happens to start with asof_ (e.g. from an
            // earlier asofJoin) must survive untouched
            case c if generated.contains(c) =>
              when(inTol, col(c)).otherwise(lit(null)).as(c)
            case c => col(c)
          }: _*)
    }
  }

  /** Interval (range) join: pairs with equal `keys` and `right.tsCol`
    * in `[left.tsCol - window, left.tsCol)` — strictly before the left
    * event, at most `window` old (the "what led up to this event"
    * join). Returns left columns + `rightVals` (prefixed `r_`) +
    * `r_ts`; inner-join semantics (unmatched left rows drop out —
    * wrap with a left join on keys downstream if needed).
    *
    * `window` is both the semantic lookback and the physical bucket
    * width: right rows replicate 2× onto time buckets, the join is a
    * pure equi-join on (keys, bucket), and the exact range predicate
    * filters after the match. No BroadcastNestedLoopJoin at any scale.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                tsCol: String, window: String,
                rightVals: Seq[String]): DataFrame = {
    val winSec = {
      val parts = window.split(" ")
      require(parts.length == 2, s"window must be '<n> <unit>': $window")
      val n = parts(0).toLong
      parts(1).toLowerCase match {
        case u if u.startsWith("second") => n
        case u if u.startsWith("minute") => n * 60
        case u if u.startsWith("hour")   => n * 3600
        case u if u.startsWith("day")    => n * 86400
        case u => throw new IllegalArgumentException(s"unit: $u")
      }
    }
    // ntz-safe epoch seconds (session TZ is UTC app-wide, so the
    // ntz→timestamp cast is monotonic and bucket edges line up)
    val bucket = (c: org.apache.spark.sql.Column) =>
      floor(unix_timestamp(c.cast("timestamp")) / winSec)
    val l = left.withColumn("__b", bucket(col(tsCol)))
    val r = right
      .select((keys.map(col) :+ col(tsCol).as("r_ts")) ++
        rightVals.map(c => col(c).as(s"r_$c")): _*)
      .withColumn("__b",
        explode(array(bucket(col("r_ts")), bucket(col("r_ts")) + 1)))
    l.join(r, keys :+ "__b")
      .where(col("r_ts") >= col(tsCol) - expr(s"INTERVAL $winSec SECONDS") &&
        col("r_ts") < col(tsCol))
      .drop("__b")
  }
}
