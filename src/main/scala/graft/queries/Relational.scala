package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Relational core of the engine: scan/filter/project, aggregation,
  * joins (shuffle/broadcast/semi/anti), window, top-k, set ops, rollup.
  *
  * The reference delegates all of these to PostgreSQL inside its fixed
  * SQL templates (SURVEY.md §2.7); here they are first-class DataFrame
  * plans that Catalyst optimizes (predicate pushdown to parquet,
  * TakeOrderedAndProject for top-k, broadcast joins for dims).
  *
  * Scale notes (100 TB): every aggregate uses map-side partial
  * aggregation; small dims (region/nation/supplier at any SF, customer
  * at small SF) are broadcast explicitly; top-k never full-sorts
  * (TakeOrderedAndProject).
  */
object Relational {

  /** TPC-H Q1-style pricing summary: wide partial-agg groupBy. */
  def q01LineitemAgg(s: SparkSession, d: String): DataFrame = {
    lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Top-k without full sort: TakeOrderedAndProject. */
  def q02TopkOrders(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10)

  /** TPC-H Q3-style: filtered fact-dim join, per-order revenue, top 10.
    * Only the dimension (customer, post-filter) is broadcast; the two
    * fact tables shuffle-join on l_orderkey — at 100 TB broadcasting the
    * orders side would ship a multi-GB table to every executor. */
  def q03JoinTopkRevenue(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = orders(s, d).filter(col("o_orderdate") < ts("1998-01-01"))
      .join(broadcast(c), col("o_custkey") === c("c_custkey"))
      .select("o_orderkey")
    val l = lineitem(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy("l_orderkey")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
  }

  /** EXISTS via left-semi join: orders with any heavy lineitem. */
  def q04SemiJoin(s: SparkSession, d: String): DataFrame = {
    val heavy = lineitem(s, d).filter(col("l_quantity") > 45)
      .select(col("l_orderkey"))
    val o = orders(s, d)
    o.join(heavy, o("o_orderkey") === heavy("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** Dim-chain broadcast join: suppliers per ASIA nation. */
  def q05RegionSupplierAgg(s: SparkSession, d: String): DataFrame = {
    val r = region(s, d).filter(col("r_name") === "ASIA")
    val n = nation(s, d)
    val sup = supplier(s, d)
    sup.join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_suppliers"),
        dsum(col("s_acctbal")).as("sum_acctbal"))
      .orderBy("n_name")
  }

  /** TPC-H Q6-style: tight filter fully pushed to the parquet scan. */
  def q06FilterSum(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1997-01-01") &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 25)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_rows"))

  /** Window top-N per group (replaces the reference's Python
    * enumerate-rank loops, SURVEY.md §2.7 "Window functions"). */
  def q07WindowTopn(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy(desc("l_extendedprice"), asc("l_orderkey"),
        asc("l_linenumber"))
    lineitem(s, d)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy("l_suppkey", "rn")
  }

  /** NOT EXISTS via left-anti join: customers with no orders. */
  def q08AntiJoin(s: SparkSession, d: String): DataFrame = {
    // restrict to recent orders so the anti side is non-empty in testdata
    val o = orders(s, d)
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
      .select("o_custkey")
    val c = customer(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  /** Set op: nations that have both customers and suppliers. */
  def q09Intersect(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(col("c_nationkey").as("nationkey")).distinct()
      .intersect(
        supplier(s, d).select(col("s_nationkey").as("nationkey")).distinct())
      .orderBy("nationkey")

  /** Rollup (grouping sets family). */
  def q10Rollup(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"),
        asc_nulls_first("l_linestatus"))

  /** Cube (full grouping-sets lattice). */
  def q11Cube(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(asc_nulls_first("o_orderstatus"),
        asc_nulls_first("o_orderpriority"))

  /** Date + string scalar functions: month bucketing, casing, substring,
    * concat — the built-in scalar layer under the oracle gate. */
  def q12DateScalar(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      // Pushable twin of the month predicate on the BASE column: it
      // reaches the parquet scan (PushedFilters) and prunes ~70% of the
      // rows before the hash aggregate; the post-agg filter on the
      // derived month stays as the demonstration but is now residual.
      .filter(col("o_orderdate") >= "1997-01-01")
      .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
      .withColumn("pri", concat(substring(col("o_orderpriority"), 1, 1),
        lit(":"), lower(col("o_orderstatus"))))
      .groupBy("month", "pri")
      .agg(count(lit(1)).as("n"))
      .filter(col("month") >= "1997-01")
      .orderBy("month", "pri")

  /** Left outer join with null-aware aggregation: every nation, its
    * customer count and total account balance — including nations with
    * no customers (null-extension rows feed the aggregates). */
  def q13OuterJoin(s: SparkSession, d: String): DataFrame = {
    val n = nation(s, d)
    val c = customer(s, d)
      .filter(col("c_mktsegment") === "AUTOMOBILE")
    n.join(c, n("n_nationkey") === c("c_nationkey"), "left_outer")
      .groupBy("n_name")
      .agg(count(col("c_custkey")).as("n_customers"),
        coalesce(dsum(col("c_acctbal")), lit(0.0)).as("sum_bal"))
      .orderBy("n_name")
  }

  /** Explicit GROUPING SETS (distinct from rollup/cube): per-status and
    * per-priority totals in one pass, tagged by grouping id. */
  def q14GroupingSets(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("orders_gs")
    s.sql("""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
               AS sum_price
      FROM orders_gs
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")
  }

  /** Correlated scalar subquery: customers above their nation's average
    * balance (decorrelated by Catalyst into an aggregate + join). */
  def q15CorrelatedSub(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("customer_q15")
    s.sql("""
      SELECT c_nationkey, COUNT(*) AS n_above
      FROM customer_q15 c
      WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer_q15 c2
                         WHERE c2.c_nationkey = c.c_nationkey)
      GROUP BY c_nationkey ORDER BY c_nationkey""")
  }

  /** Running window aggregate (frame, not ranking): cumulative order
    * value per priority over months. */
  def q16RunningSum(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val monthly = orders(s, d)
      .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
      .groupBy("o_orderpriority", "month")
      .agg(dsum(col("o_totalprice")).as("m_total"))
    val w = Window.partitionBy("o_orderpriority").orderBy("month")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    monthly
      .withColumn("running_total",
        round(sum(col("m_total")).over(w), 4))
      .select(col("o_orderpriority"), col("month"),
        round(col("m_total"), 4).as("m_total"), col("running_total"))
      .orderBy("o_orderpriority", "month")
  }

  /** q17: the hot-key skew defense ([[graft.ops.Skew.saltedJoin]])
    * under the oracle — the salted fact⋈dim join must be
    * RESULT-IDENTICAL to the plain join it replaces (the oracle IS the
    * plain join); per-brand revenue over lineitem⋈part with the fact
    * side spread over 8 deterministic row-hash salts and the dim side
    * replicated 8×. SkewSpec covers the semantics the oracle can't see
    * (left-join unmatched rows, broadcast disabled, salt determinism). */
  def q17SaltedJoin(s: SparkSession, d: String): DataFrame = {
    val l = lineitem(s, d)
      .select(col("l_partkey").as("p_partkey"),
        col("l_extendedprice"), col("l_discount"))
    val p = part(s, d).select(col("p_partkey"), col("p_brand"))
    graft.ops.Skew.saltedJoin(l, p, Seq("p_partkey"), salts = 8)
      .groupBy("p_brand")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("p_brand")
  }

  /** q18: BUCKETED co-located join — the shuffle-elimination
    * technique the 100 TB plan leans on for repeated fact⋈fact joins
    * (pre-partition both sides once at write time, then every join on
    * the bucket key reads co-located buckets with NO exchange on
    * either input): orders and lineitem are written `bucketBy(8,
    * orderkey).sortBy` as external tables (data under /tmp, metadata
    * in the session catalog), broadcast is disabled for the gate so
    * the planner cannot cheat, and the physical plan is pinned —
    * a SortMergeJoin whose ONLY Exchange is the final aggregate's
    * (an unbucketed plan carries three). Values are the plain
    * join+aggregate, so the oracle needs no bucket knowledge: the
    * layout changes the plan, never the answer. */
  def q18BucketedJoin(s: SparkSession, d: String): DataFrame = {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_q18_bkt").toString
    orders(s, d).write.mode("overwrite")
      .option("path", s"$tmp/orders_bkt")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("q18_orders_bkt")
    lineitem(s, d).select("l_orderkey", "l_extendedprice", "l_discount")
      .write.mode("overwrite")
      .option("path", s"$tmp/lineitem_bkt")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("q18_lineitem_bkt")
    val prevBroadcast = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = s.table("q18_orders_bkt")
        .join(s.table("q18_lineitem_bkt"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
      val phys = df.queryExecution.executedPlan.toString
      require(phys.contains("SortMergeJoin"),
        s"q18 did not plan a sort-merge join:\n$phys")
      require("Bucketed: true".r.findAllIn(phys).size >= 2,
        s"q18 scans are not bucketed:\n$phys")
      // the precise pin: NO exchange partitions by a join key — the
      // aggregate's hashpartitioning(o_orderpriority) and the final
      // sort's rangepartitioning remain, the join inputs do not
      // shuffle (an unbucketed plan hashpartitions both keys)
      require("""Exchange hashpartitioning\((o_orderkey|l_orderkey)""".r
          .findFirstIn(phys).isEmpty,
        s"q18 join inputs shuffled — bucketing did not co-locate:\n$phys")
      df.localCheckpoint(true)
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold",
      prevBroadcast)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q18_bucketed_join" -> q18BucketedJoin,
    "q17_salted_join" -> q17SaltedJoin,
    "q15_correlated_sub" -> q15CorrelatedSub,
    "q16_running_sum" -> q16RunningSum,
    "q11_cube" -> q11Cube,
    "q12_date_scalar" -> q12DateScalar,
    "q13_outer_join" -> q13OuterJoin,
    "q14_grouping_sets" -> q14GroupingSets,
    "q01_lineitem_agg" -> q01LineitemAgg,
    "q02_topk_orders" -> q02TopkOrders,
    "q03_join_topk_revenue" -> q03JoinTopkRevenue,
    "q04_semi_join" -> q04SemiJoin,
    "q05_region_supplier_agg" -> q05RegionSupplierAgg,
    "q06_filter_sum" -> q06FilterSum,
    "q07_window_topn" -> q07WindowTopn,
    "q08_anti_join" -> q08AntiJoin,
    "q09_intersect" -> q09Intersect,
    "q10_rollup" -> q10Rollup)

  val oracles: Map[String, String] = Map(
    // q18: the bucketed layout changes the PLAN, never the answer —
    // the oracle is the plain join+aggregate.
    "q18_bucketed_join" ->
      """SELECT o_orderpriority,
         CAST(SUM(CAST(l_extendedprice*(1.0-l_discount)
           AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
         COUNT(*) AS n
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY 1 ORDER BY 1""",
    "q01_lineitem_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
         COUNT(*) AS count_order,
         CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)/COUNT(*) AS avg_qty
         FROM lineitem GROUP BY 1,2 ORDER BY 1,2""",
    "q02_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q03_join_topk_revenue" ->
      """SELECT l_orderkey,
         CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY 1 ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q04_semi_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
           WHERE l_orderkey = o_orderkey AND l_quantity > 45)
         GROUP BY 1 ORDER BY 1""",
    "q05_region_supplier_agg" ->
      """SELECT n_name, COUNT(*) AS n_suppliers,
         CAST(SUM(CAST(s_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS sum_acctbal
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA' GROUP BY 1 ORDER BY 1""",
    "q06_filter_sum" ->
      """SELECT
         CAST(SUM(CAST(l_extendedprice*l_discount AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_rows FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 25""",
    "q07_window_topn" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
                CAST(rn AS INTEGER) AS rn
         FROM (
           SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_suppkey
               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
           FROM lineitem) WHERE rn <= 3 ORDER BY l_suppkey, rn""",
    "q08_anti_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
           AND o_orderdate >= TIMESTAMP '1998-01-01')
         GROUP BY 1 ORDER BY 1""",
    "q09_intersect" ->
      """SELECT DISTINCT c_nationkey AS nationkey FROM customer
         INTERSECT SELECT DISTINCT s_nationkey AS nationkey FROM supplier
         ORDER BY nationkey""",
    "q10_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q11_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
           AS sum_price
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q15_correlated_sub" ->
      """SELECT c_nationkey, COUNT(*) AS n_above
         FROM customer c
         WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                            WHERE c2.c_nationkey = c.c_nationkey)
         GROUP BY c_nationkey ORDER BY c_nationkey""",
    "q17_salted_join" ->
      // the oracle IS the plain (unsalted) join — salting must be
      // invisible in the result
      """SELECT p_brand,
           CAST(SUM(CAST(l_extendedprice*(1.0-l_discount)
             AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY 1 ORDER BY 1""",
    "q16_running_sum" ->
      """WITH m AS (
           SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m') AS month,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                    AS m_total
           FROM orders GROUP BY 1, 2)
         SELECT o_orderpriority, month, round(m_total, 4) AS m_total,
                round(SUM(m_total) OVER (
                  PARTITION BY o_orderpriority ORDER BY month
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                  AS running_total
         FROM m ORDER BY 1, 2""",
    "q14_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
             AS sum_price
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q13_outer_join" ->
      """SELECT n_name, COUNT(c_custkey) AS n_customers,
           COALESCE(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE),
             0.0) AS sum_bal
         FROM nation LEFT OUTER JOIN customer
           ON n_nationkey = c_nationkey AND c_mktsegment = 'AUTOMOBILE'
         GROUP BY 1 ORDER BY 1""",
    "q12_date_scalar" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
           substr(o_orderpriority, 1, 1) || ':' || lower(o_orderstatus)
             AS pri,
           COUNT(*) AS n
         FROM orders
         GROUP BY 1, 2 HAVING month >= '1997-01'
         ORDER BY month, pri""")
}
