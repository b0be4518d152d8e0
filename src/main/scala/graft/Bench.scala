package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up: first-job costs (codegen, parquet/shuffle/broadcast
    // machinery, JIT) are session setup, not query cost.
    locally {
      import org.apache.spark.sql.functions._
      val warm = udf((s: String) => s.length)
      spark.read.parquet(s"$sfDir/region.parquet")
        .repartition(4).withColumn("w", warm(col("r_name")))
        .groupBy("w").count().count()
    }
    // SPARK_GRAFT_ONLY=q01,q02 filters by name prefix (local profiling)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val selected = only match {
      case Some(ps) => SparkEntry.queries.filter { case (n, _) =>
        ps.exists(n.startsWith) }
      case None => SparkEntry.queries
    }
    // Per-query min over SPARK_GRAFT_PASSES runs (default 2): the host
    // has external load spikes, and the min is the standard noise
    // filter. A pass that throws reports -1 regardless of other passes.
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    // A failed pass records -1 AND the first error per query name is
    // kept for the record: the round-12 interrupted run reported 59
    // straight -1s (everything after one query in pass 2) with zero
    // diagnostics — a silently-swallowed Throwable chain is
    // indistinguishable from a dead SparkContext without this.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql
        .DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case t: Throwable =>
          if (!errors.contains(name))
            errors(name) = (t.getClass.getName + ": " +
              String.valueOf(t.getMessage)).replaceAll("[\"\\n\\r\\\\]", " ")
              .take(200)
          false
        }
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }
    // Passes are TIME-SEPARATED: pass 1 runs every query (sorted name
    // order), then pass 2 runs every query again. Back-to-back passes
    // of one query share any host-load spike, so `min` cannot filter
    // it (round-6 record showed phantom 7x regressions from exactly
    // that); with full-pass separation the two samples of a query are
    // minutes apart and a spike poisons at most one. Sorted order also
    // makes the record comparable round-over-round (hash-map order
    // moved with every added query).
    val ordered = selected.toSeq.sortBy(_._1)
    val passTimes: Seq[Seq[(String, Double)]] = (1 to passes).map { _ =>
      ordered.map { case (name, fn) => name -> once(name, fn) }
    }
    val byQ: Seq[(String, Seq[Double])] = ordered.map { case (name, _) =>
      name -> passTimes.map(_.find(_._1 == name).get._2)
    }
    val results = byQ.map { case (name, times) =>
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }.toMap
    val cold = byQ.map { case (name, times) => name -> times.head }.toMap
    // Per-pass totals on their own line: a noisy pass is diagnosable
    // from the record itself instead of needing a rerun.
    val passTotals = passTimes.map(p => p.map(_._2).filter(_ >= 0).sum)
    // 3-decimal cap keeps both lines short: the driver captures only a
    // bounded stdout tail, and round 5's full-precision doubles pushed
    // the headline line past it (BENCH_r05.json came back unparseable).
    def fmt(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val totalCold = if (cold.nonEmpty) cold.values.sum else 0.0
    // Per-query detail lines come FIRST; the final stdout line is a
    // compact totals-only JSON. The driver keeps only a bounded stdout
    // tail, and at 80 queries a final line carrying the full per-query
    // map outgrew it (BENCH_r07.json parsed=null, tail began mid-map);
    // at 107 even its OWN line lost 38 warm entries and the whole cold
    // map (round-10 record). So each map is CHUNKED ~20 queries per
    // line, every line independently-parseable JSON with part/of
    // markers: a byte-bounded tail now cuts at a line boundary and
    // every surviving chunk still parses. Cold chunks print before
    // warm so a short tail keeps the (headline) warm map.
    def printChunked(metric: String, field: String,
        entries: Seq[(String, Double)]): Unit = {
      // an empty selection still emits one empty-map line: record
      // parsers key on the metric's presence, not just its contents
      val groups =
        if (entries.isEmpty) Seq(Seq.empty[(String, Double)])
        else entries.grouped(20).toSeq
      groups.zipWithIndex.foreach { case (g, i) =>
        val body = g.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
          .mkString("{", ",", "}")
        println(s"""{"metric":"$metric","part":${i + 1},"of":${groups.size},"$field":$body}""")
      }
    }
    val orderedNames = byQ.map(_._1)
    // The QPS half of E9, made a DIFFABLE record instead of a printed
    // measurement (the reference's instrument prints queries/sec after
    // a run — examples/anthropic.py:223-225): warm throughput per query
    // FAMILY (the gate-name prefix letter: c=engine CRUD, d=dynamic,
    // e=eval, g=graph, m=multimodal, p=pipeline, q=relational,
    // r=retrieval, s=streaming), qps = n / Σ warm with failed queries
    // excluded from both terms. Rides stdout AND BENCH_LOCAL.json so
    // each round's rates diff cleanly against the last.
    val qpsByFamily: Seq[(String, (Int, Double, Double))] =
      orderedNames.groupBy(_.take(1)).toSeq.sortBy(_._1)
        .map { case (f, names) =>
          val ok = names.map(results).filter(_ >= 0)
          val s = ok.sum
          (f, (ok.size, s, if (s > 0) ok.size / s else 0.0))
        }
    printChunked("queries_cold", "queries_cold",
      orderedNames.map(n => n -> cold(n)))
    printChunked("queries_warm", "queries",
      orderedNames.map(n => n -> results(n)))
    errors.foreach { case (n, e) =>
      println(s"""{"metric":"bench_error","query":"$n","err":"$e"}""")
    }
    locally {
      val body = qpsByFamily.map { case (f, (n, s, q)) =>
        s""""$f":{"n":$n,"warm_sec":${fmt(s)},"qps":${fmt(q)}}"""
      }.mkString("{", ",", "}")
      println(s"""{"metric":"qps_by_family","families":$body}""")
    }
    println(s"""{"metric":"pass_totals","value":[${passTotals.map(fmt).mkString(",")}],"unit":"sec"}""")
    // The DURABLE per-query record: stdout is tail-bounded on the
    // driver side (2 KB keeps ~3 of 12 chunks at 118 queries), so the
    // full cold+warm maps also go to a FILE committed at round close —
    // two committed files diff cleanly and settle any phantom-
    // regression debate without a rerun. Only full (unfiltered) runs
    // overwrite it: a SPARK_GRAFT_ONLY profiling slice must never
    // clobber the round record.
    if (only.isEmpty) {
      val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        "BENCH_LOCAL.json")
      def jmap(entries: Seq[(String, Double)]): String =
        entries.map { case (k, v) => s"""    "$k": ${fmt(v)}""" }
          .mkString("{\n", ",\n", "\n  }")
      val json =
        s"""{
           |  "sf": "$sfDir",
           |  "passes": $passes,
           |  "n": ${results.size},
           |  "total_warm": ${fmt(total)},
           |  "total_cold": ${fmt(totalCold)},
           |  "pass_totals": [${passTotals.map(fmt).mkString(", ")}],
           |  "qps_by_family": ${
             qpsByFamily.map { case (f, (n, s, q)) =>
               s"""    "$f": {"n": $n, "warm_sec": ${fmt(s)}, "qps": ${fmt(q)}}"""
             }.mkString("{\n", ",\n", "\n  }")},
           |  "queries_warm": ${jmap(orderedNames.map(n => n -> results(n)))},
           |  "queries_cold": ${jmap(orderedNames.map(n => n -> cold(n)))},
           |  "errors": ${
             if (errors.isEmpty) "{}"
             else errors.map { case (k, v) => s"""    "$k": "$v"""" }
               .mkString("{\n", ",\n", "\n  }")}
           |}
           |""".stripMargin
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"""{"metric":"bench_local","path":"$out"}""")
    }
    // The totals line must be the LAST stdout line: the driver's PERF
    // comparator parses the final JSON line, and round 18's trailing
    // bench_local pointer made it capture the pointer instead of the
    // totals (PERF_r19.json came back with an empty per_query map).
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","total_cold":${fmt(totalCold)},"n":${results.size},"sf":"$sfDir","passes":$passes}""")
    spark.stop()
  }
}
