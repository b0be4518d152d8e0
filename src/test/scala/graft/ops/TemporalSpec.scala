package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class TemporalSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin matches latest at-or-before right row per key") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 12:00:00"), "b"),
      (2L, ts("2024-01-01 11:00:00"), "c"))
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 10.0),
      (1L, ts("2024-01-01 11:00:00"), 20.0),
      (2L, ts("2024-01-01 11:00:00"), 30.0), // equal ts: must match (>=)
      (2L, ts("2024-01-01 12:00:00"), 40.0)) // after left: must not
      .toDF("k", "ts", "v")
    val out = Temporal.asofJoin(left, right, Seq("k"), "ts", Seq("v"))
      .select("k", "tag", "asof_v").collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    assert(out === Set(
      (1L, "a", Some(10.0)), (1L, "b", Some(20.0)), (2L, "c", Some(30.0))))
  }

  test("asofJoin is LEFT OUTER: no prior right row gives null") {
    val left = Seq((1L, ts("2024-01-01 08:00:00"), "early")).toDF("k", "ts", "tag")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 1.0)).toDF("k", "ts", "v")
    val out = Temporal.asofJoin(left, right, Seq("k"), "ts", Seq("v")).collect()
    assert(out.length === 1 && out(0).isNullAt(out(0).fieldIndex("asof_v")))
  }

  test("asofJoin carries the matched right timestamp") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "x")).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1.0),
      (1L, ts("2024-01-01 09:45:00"), 2.0)).toDF("k", "ts", "v")
    val out = Temporal.asofJoin(left, right, Seq("k"), "ts", Seq("v")).collect()
    assert(out(0).getAs[Timestamp]("asof_ts") === ts("2024-01-01 09:45:00"))
  }

  test("asofJoin tolerance nulls matches older than the bound") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "x"),
      (2L, ts("2024-01-01 10:00:00"), "y")).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:58:00"), 1.0),  // in tolerance
      (2L, ts("2024-01-01 09:00:00"), 2.0))  // too old
      .toDF("k", "ts", "v")
    val out = Temporal.asofJoin(left, right, Seq("k"), "ts", Seq("v"),
        tolerance = Some("5 minutes"))
      .collect().map(r => r.getLong(0) ->
        Option(r.get(r.fieldIndex("asof_v")))).toMap
    assert(out(1L) === Some(1.0))
    assert(out(2L) === None)
  }

  test("asofJoin: a newer right row with a NULL value WINS (row carry, " +
      "not per-column ignoreNulls)") {
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "x")).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(5.0)),
      (1L, ts("2024-01-01 11:00:00"), None: Option[Double]))
      .toDF("k", "ts", "v")
    val out = Temporal.asofJoin(left, right, Seq("k"), "ts", Seq("v"))
      .collect()(0)
    // the 11:00 row is the as-of match: its null value must be carried
    // WITH its timestamp — not the 10:00 value under the 11:00 ts
    assert(out.isNullAt(out.fieldIndex("asof_v")),
      "stale older value carried past a newer null-valued right row")
    assert(out.getTimestamp(out.fieldIndex("asof_ts"))
      === ts("2024-01-01 11:00:00"))
  }

  test("asofJoin tolerance nulls only ITS OWN generated columns: a " +
      "chained asof_ column from an earlier join survives") {
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "x")).toDF("k", "ts", "tag")
    val r1 = Seq((1L, ts("2024-01-01 11:55:00"), 7.0)).toDF("k", "ts", "price")
    val r2 = Seq((1L, ts("2024-01-01 06:00:00"), 3.0)).toDF("k", "ts", "qty")
    val once = Temporal.asofJoin(left, r1, Seq("k"), "ts", Seq("price"))
      .withColumnRenamed("asof_ts", "price_ts") // chained-call rename
    // second join with a tolerance the 06:00 row fails: its OWN asof_qty
    // columns null out, the first join's asof_price must survive
    val twice = Temporal.asofJoin(once, r2, Seq("k"), "ts", Seq("qty"),
      tolerance = Some("1 HOUR")).collect()(0)
    assert(twice.isNullAt(twice.fieldIndex("asof_qty")))
    assert(twice.getDouble(twice.fieldIndex("asof_price")) === 7.0,
      "tolerance nulling destroyed an earlier join's asof_ column")
  }

  test("asofJoin rejects left columns that collide with generated " +
      "asof_* outputs (e.g. chained calls)") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "x")).toDF("k", "ts", "tag")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 1.0)).toDF("k", "ts", "v")
    val once = Temporal.asofJoin(left, right, Seq("k"), "ts", Seq("v"))
    // chaining with the same rightVals would duplicate asof_ts / asof_v
    val e = intercept[IllegalArgumentException] {
      Temporal.asofJoin(once, right, Seq("k"), "ts", Seq("v"))
    }
    assert(e.getMessage.contains("asof_"))
  }

  test("temporal joins handle empty and single-sided inputs") {
    val sp = spark
    import sp.implicits._
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "x")).toDF("k", "ts", "tag")
    val emptyRight = sp.emptyDataset[(Long, Timestamp, Double)]
      .toDF("k", "ts", "v")
    // as-of against an empty right: all left rows survive, null match
    val asof = Temporal.asofJoin(left, emptyRight, Seq("k"), "ts", Seq("v"))
      .collect()
    assert(asof.length === 1 &&
      asof(0).isNullAt(asof(0).fieldIndex("asof_v")))
    // range join against an empty right: inner semantics, empty out
    assert(Temporal.rangeJoin(left, emptyRight, Seq("k"), "ts",
      "1 hour", Seq("v")).count() === 0L)
    // empty left passes through both
    val emptyLeft = sp.emptyDataset[(Long, Timestamp, String)]
      .toDF("k", "ts", "tag")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 1.0)).toDF("k", "ts", "v")
    assert(Temporal.asofJoin(emptyLeft, right, Seq("k"), "ts",
      Seq("v")).count() === 0L)
    assert(Temporal.rangeJoin(emptyLeft, right, Seq("k"), "ts",
      "1 hour", Seq("v")).count() === 0L)
  }

  test("rangeJoin emits [ts-window, ts) pairs exactly once across buckets") {
    // left at 10:00; window 1 hour → right must be in [09:00, 10:00)
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 100L))
      .toDF("k", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-01-01 08:59:59"), 1.0), // too old
      (1L, ts("2024-01-01 09:00:00"), 2.0), // boundary: included
      (1L, ts("2024-01-01 09:30:00"), 3.0), // same bucket as left
      (1L, ts("2024-01-01 09:59:59"), 4.0), // prior bucket edge
      (1L, ts("2024-01-01 10:00:00"), 5.0), // simultaneous: excluded
      (2L, ts("2024-01-01 09:30:00"), 6.0)) // other key
      .toDF("k", "ts", "v")
    val out = Temporal.rangeJoin(
      left, right, Seq("k"), "ts", "1 hour", Seq("v"))
    val vs = out.select("r_v").as[Double].collect().sorted
    assert(vs === Array(2.0, 3.0, 4.0)) // each exactly once — no bucket dup
  }

  test("rangeJoin plan is an equi-join, not a nested-loop join") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 1L)).toDF("k", "ts", "id")
    val right = Seq((1L, ts("2024-01-01 09:30:00"), 1.0)).toDF("k", "ts", "v")
    val plan = Temporal.rangeJoin(
        left, right, Seq("k"), "ts", "1 hour", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"))
  }

  test("asofJoin plan has a single shuffle (window over union)") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "x")).toDF("k", "ts", "tag")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 1.0)).toDF("k", "ts", "v")
    val plan = Temporal.asofJoin(left, right, Seq("k"), "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    // one windowed pass over the union — no join operator at all, and
    // at most the window's own hash exchange
    assert(!plan.contains("Join"))
    assert(plan.split("Exchange hashpartitioning").length - 1 <= 1)
    assert(plan.split("\\bWindow\\b").length - 1 >= 1)
  }
}
