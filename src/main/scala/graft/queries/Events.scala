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

  /** As-of join gate: every `view` event enriched with the latest
    * at-or-before `purchase` of the same user ([[graft.ops.Temporal
    * .asofJoin]] — union + ordered window, ONE shuffle), rolled up per
    * user. Right side is pre-aggregated per (user, ts) — the
    * determinism contract the operator documents. */
  def asofPurchase(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val views = ev.filter(col("event_type") === "view")
      .select("user_id", "ts", "event_id")
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(sum("value").as("val"))
    graft.ops.Temporal.asofJoin(
        views, purchases, Seq("user_id"), "ts", Seq("val"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_views"),
        count(col("asof_val")).as("n_matched"),
        round(dsum(col("asof_val")), 6).as("matched_total"))
      .orderBy("user_id")
  }

  /** Interval-join gate: clicks in the 6 hours before each error of
    * the same user ([[graft.ops.Temporal.rangeJoin]] — bucketed
    * equi-join, never a broadcast-nested-loop), rolled up per user. */
  def rangeClicks(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val errors = ev.filter(col("event_type") === "error")
      .select("user_id", "ts", "event_id")
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts", "value")
    graft.ops.Temporal.rangeJoin(
        errors, clicks, Seq("user_id"), "ts", "6 hours", Seq("value"))
      .groupBy("user_id")
      .agg(countDistinct(col("event_id")).as("n_errors_with_click"),
        count(lit(1)).as("n_pairs"),
        round(dsum(col("r_value")), 6).as("click_total"))
      .orderBy("user_id")
  }

  /** The STREAMING interval join ([[graft.streaming.Stream
    * .intervalJoin]] — watermark-bounded stream-stream join) executed
    * in batch mode: same pairs contract as [[rangeClicks]], same
    * oracle shape, different operator — the batch-twin gate the other
    * streaming ops (s01) already have. */
  def streamIntervalTwin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val errors = ev.filter(col("event_type") === "error")
      .select("user_id", "ts", "event_id")
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts", "value")
    graft.streaming.Stream.intervalJoin(errors, clicks, "user_id", "ts",
        "6 hours", Seq("value"))
      .groupBy("user_id")
      .agg(countDistinct(col("event_id")).as("n_errors_with_click"),
        count(lit(1)).as("n_pairs"),
        round(dsum(col("r_value")), 6).as("click_total"))
      .orderBy("user_id")
  }

  /** Streamed-ingest → compaction → search lifecycle under the oracle:
    * the documents table arrives as 3 MemoryStream micro-batches into a
    * term-bucketed postings layout ([[graft.streaming.Stream.ingestBm25]]
    * — continuous appends, commit-log-governed), is GRADUATED to a
    * batch layout by [[graft.streaming.Stream.compactStored]] (one file
    * per bucket, log removed — asserted in-query), and the stored
    * search over the compacted layout must score identically to a
    * batch build from the same text (oracle = the r05 BM25 replay with
    * this query's terms). Content is layout-invariant, so streamed
    * arrival order cannot perturb the hash gate. */
  def streamCompactTwin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sc = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = documents(s, d).select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_s07_dir").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_s07_ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.Stream.ingestBm25(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      dir, ckpt, buckets = 16)
    try {
      val batches = 3
      (0 until batches).foreach { b =>
        input.addData(rows.slice(b * rows.length / batches,
          (b + 1) * rows.length / batches): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val rewritten = graft.streaming.Stream.compactStored(s, dir, "bucket",
      maxFilesPerCell = 1)
    require(rewritten > 0, "compaction rewrote no bucket dirs")
    require(!new java.io.File(dir, "_spark_metadata").exists(),
      "commit log must be gone after graduation")
    graft.ops.Bm25.search(graft.ops.Bm25.loadStoredPostings(s, dir),
      "scan stream vector", 10)
  }

  /** s08: the DENSE-index streaming lifecycle under the oracle — the
    * IVF twin of s07's BM25 gate. Embeddings stream through
    * [[graft.streaming.Stream.ingestIvf]] (argmin-assigned against a
    * label-mean IVF model, appended exactly-once into a
    * `partitionBy(centroid_id)` at-rest layout with the model
    * fingerprint pinned by marker), the grown layout GRADUATES to
    * batch via [[graft.streaming.Stream.compactStored]] (commit log
    * removed, one file per cell), and
    * [[graft.ops.Ann.searchIvfStored]] answers a probes=3 L2 top-10
    * over the compacted dirs — results indistinguishable from a batch
    * `writePartitioned` build, which is exactly what the DuckDB replay
    * (centroids → assignment → probe selection → exact in-cell top-k,
    * the r25 shape) asserts. */
  def streamIvfTwin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sc = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val e = embeddings(s, d)
    val model = graft.ops.Ann.buildIvf(e, "label", "embedding")
    val rows = e.select(col("vec_id"),
        col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_s08_dir").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_s08_ckpt").toString
    val input = MemoryStream[(Long, Seq[Double])]
    val q = graft.streaming.Stream.ingestIvf(
      input.toDF().toDF("vec_id", "embedding"), "embedding", model,
      graft.ops.Ann.L2, dir, ckpt)
    try {
      val batches = 3
      (0 until batches).foreach { b =>
        input.addData(rows.slice(b * rows.length / batches,
          (b + 1) * rows.length / batches): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val rewritten = graft.streaming.Stream.compactStored(s, dir,
      "centroid_id", maxFilesPerCell = 1)
    require(rewritten > 0, "compaction rewrote no cell dirs")
    require(!new java.io.File(dir, "_spark_metadata").exists(),
      "commit log must be gone after graduation")
    val qv = rows.find(_._1 == 9L)
      .getOrElse(throw new IllegalStateException("no vec_id 9"))._2
    graft.ops.Ann.searchIvfStored(s, dir, "vec_id", "embedding", model,
        typedlit(qv), graft.ops.Ann.L2, probes = 3, k = 10)
      .select("vec_id", "dist")
  }

  /** s09: watermark-bounded streaming dedup
    * ([[graft.streaming.Stream.dedupByDigest]] — `dropDuplicates
    * WithinWatermark` over a sha-256 content digest) under the oracle.
    * Batch 1 streams every document with row-unique content
    * (`text#id`); batch 2 streams a second copy of the corpus under
    * shifted ids where EVEN source ids repeat batch 1's exact content
    * (planted cross-batch duplicates → dropped by state) and odd ids
    * carry fresh content (→ kept). Duplicates arrive strictly AFTER
    * their originals and content is otherwise row-unique, so the
    * kept-set is deterministic at any parallelism; event times all sit
    * within one watermark window so nothing is late-dropped (the
    * watermark-expiry geometry stays StreamSpec's job). The oracle is
    * pure arithmetic over `documents`. */
  def streamDedupTwin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sc = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def t(i: Long) = new java.sql.Timestamp(base.getTime + (i % 60) * 1000)
    val rows = documents(s, d).select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    val b1 = rows.map { case (id, tx) =>
      (id, t(id), s"${if (tx == null) "" else tx}#$id") }
    val b2 = rows.map { case (id, tx) =>
      val txt = if (tx == null) "" else tx
      if (id % 2 == 0) (id + 10000000L, t(id + 1), s"$txt#$id")
      else (id + 10000000L, t(id + 1), s"$txt#dup#$id")
    }
    val sink = "graft_s09_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = graft.streaming.Stream.dedupByDigest(
        input.toDF().toDF("doc_id", "ts", "text"), "ts", "text",
        watermark = "1 hour")
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    s.table(sink).select("doc_id").orderBy("doc_id")
  }

  /** s10: the SPARSE streaming lifecycle under the oracle — the third
    * streamed-twin gate (s07 BM25, s08 IVF): documents' sparse vectors
    * stream through [[graft.streaming.Stream.ingestSparse]] (map-only
    * postings inversion appended exactly-once into the bucket-mod
    * layout, modulus pinned by marker), the grown layout GRADUATES via
    * [[graft.streaming.Stream.compactStored]], and
    * [[graft.functions.Sparse.searchStored]] answers over the
    * compacted bucket dirs — score-identical to r27/r29/r30/r31, so
    * the ONE sparse oracle now also gates the streamed path. */
  def streamSparseTwin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sc = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val emb = graft.functions.Md5SparseEmbedder(4096)
    val rows = documents(s, d).select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
      .map { case (id, t) =>
        val v = emb.embed(if (t == null) "" else t)
        (id, v.indices, v.values)
      }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_s10_dir").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_s10_ckpt").toString
    val input = MemoryStream[(Long, Seq[Int], Seq[Float])]
    val q = graft.streaming.Stream.ingestSparse(
      input.toDF().toDF("doc_id", "si", "sv"),
      "doc_id", "si", "sv", dir, ckpt, buckets = 16)
    try {
      val batches = 3
      (0 until batches).foreach { b =>
        input.addData(rows.slice(b * rows.length / batches,
          (b + 1) * rows.length / batches): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val rewritten = graft.streaming.Stream.compactStored(s, dir, "__b",
      maxFilesPerCell = 1)
    require(rewritten > 0, "compaction rewrote no bucket dirs")
    require(!new java.io.File(dir, "_spark_metadata").exists(),
      "commit log must be gone after graduation")
    graft.functions.Sparse.searchStored(s, dir,
        emb.embed(Retrieval.SparseQueryText), 10)
      .select(col("id").as("doc_id"), col("score"))
  }

  /** s11: the MULTIVEC streaming lifecycle under the oracle — the
    * fourth streamed-twin gate (s07 BM25, s08 dense IVF, s10 sparse),
    * closing the last search modality without a streamed ingest story.
    * Docs are r26's exact shape (vecs = [emb, reverse(emb)] per vec_id,
    * label-mean centroids over the persisted token-means, cosine
    * assignment); they stream through
    * [[graft.streaming.Stream.ingestMaxsim]] (token-mean summarized +
    * cosine-assigned per row, appended exactly-once into the
    * `partitionBy(centroid_id)` layout, model fingerprint pinned by
    * marker), the grown layout GRADUATES via
    * [[graft.streaming.Stream.compactStored]], and the two-phase maxsim
    * read path answers over the compacted cells — phase-1 top-20 by
    * persisted-mean dot within probes=3 cells
    * ([[graft.ops.Ann.maxsimCandidatesIvf]]), phase-2 exact maxsim over
    * those candidates — score-identical to r26, so the one
    * first-principles maxsim-IVF oracle now also gates the streamed
    * path. */
  def streamMaxsimTwin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sc = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val e = Tables.embeddings(s, d)
    val dim = e.select(size(col("embedding"))).head.getInt(0)
    val qts: Seq[Seq[Double]] = e.filter(col("vec_id").isin(0, 1))
      .orderBy("vec_id").select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toSeq).toSeq
    val docs = e.select(col("vec_id"), col("label"),
      array(col("embedding").cast("array<double>"),
        reverse(col("embedding")).cast("array<double>")).as("vecs"))
    // r26's deterministic label-mean model over the persisted means —
    // built BATCH-side (an ingest model always predates the stream)
    val withMean = docs.withColumn("mv_mean",
      graft.ops.Ann.tokenMeanCol(col("vecs"), dim))
    val model = graft.ops.Ann.buildIvf(withMean, "label", "mv_mean")
    val rows = docs.select(col("vec_id"), col("vecs"))
      .as[(Long, Seq[Seq[Double]])].collect().toSeq.sortBy(_._1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_s11_dir").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_s11_ckpt").toString
    val input = MemoryStream[(Long, Seq[Seq[Double]])]
    val q = graft.streaming.Stream.ingestMaxsim(
      input.toDF().toDF("vec_id", "vecs"), "vecs", dim, model, dir, ckpt)
    try {
      val batches = 3
      (0 until batches).foreach { b =>
        input.addData(rows.slice(b * rows.length / batches,
          (b + 1) * rows.length / batches): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val rewritten = graft.streaming.Stream.compactStored(s, dir,
      "centroid_id", maxFilesPerCell = 1)
    require(rewritten > 0, "compaction rewrote no cell dirs")
    require(!new java.io.File(dir, "_spark_metadata").exists(),
      "commit log must be gone after graduation")
    val stored = s.read.parquet(dir)
    val cand = graft.ops.Ann.maxsimCandidatesIvf(stored, "vec_id",
      "mv_mean", model, qts, n = 20, probes = 3)
    stored.join(cand, Seq("vec_id"), "left_semi")
      .withColumn("score", round(org.apache.spark.sql.graft.VecExprs
        .maxSimDot(typedlit(qts), col("vecs")), 6))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(10)
      .select("vec_id", "score")
  }

  /** s12: the QUANTIZED streaming lifecycle under the oracle — the
    * fifth streamed-twin gate (s07 BM25, s08 dense IVF, s10 sparse,
    * s11 maxsim): codes at rest from a stream, the 100 TB ingest shape
    * where full-precision vectors never need to land in the index
    * layout. r38's deterministic artifacts (label-mean IVF model,
    * cell-mean codebooks) are trained BATCH-side — an ingest quantizer
    * always predates the stream — then embeddings stream through
    * [[graft.streaming.Stream.ingestIvfPq]] (map-only assign+encode
    * per micro-batch, bit-identical to the batch encode, appended
    * exactly-once into `encoded/`'s cell dirs; geometry AND codebook
    * digest pinned by markers so a retrained quantizer is refused),
    * the grown layout GRADUATES via compactStored, and
    * [[graft.ops.Ann.searchIvfPqStored]] answers r38's exact query
    * over the root — shared oracle, so the streamed path must be
    * byte-identical to the batch index. */
  def streamPqTwin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sc = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val e = Tables.embeddings(s, d)
    val model = graft.ops.Ann.buildIvf(e, "label", "embedding")
    val idx = graft.ops.Ann.buildIvfPq(e, "embedding", model, m = 8,
      graft.ops.Ann.L2)
    val rows = e.select(col("vec_id"),
        col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_s12_dir").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_s12_ckpt").toString
    val input = MemoryStream[(Long, Seq[Double])]
    val q = graft.streaming.Stream.ingestIvfPq(
      input.toDF().toDF("vec_id", "embedding"), "embedding", idx.pq,
      model, graft.ops.Ann.L2, dir, ckpt)
    try {
      val batches = 3
      (0 until batches).foreach { b =>
        input.addData(rows.slice(b * rows.length / batches,
          (b + 1) * rows.length / batches): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val rewritten = graft.streaming.Stream.compactStored(s,
      s"$dir/encoded", "centroid_id", maxFilesPerCell = 1)
    require(rewritten > 0, "compaction rewrote no cell dirs")
    require(!new java.io.File(s"$dir/encoded", "_spark_metadata").exists(),
      "commit log must be gone after graduation")
    val qv = rows.find(_._1 == 5L)
      .getOrElse(throw new IllegalStateException("no vec_id 5"))._2
    graft.ops.Ann.searchIvfPqStored(s, dir, "vec_id", "embedding",
      qv, graft.ops.Ann.L2, probes = 3, k = 10, refine = 5)
  }

  /** s13: the SQ streaming lifecycle under the oracle — the 8-bit twin
    * of s12 (the reference's DEFAULT index quantization is residual
    * 8-bit, spec.py:437-444): bounds/centroids trained batch-side,
    * codes streamed in three micro-batches through
    * [[graft.streaming.Stream.ingestIvfSq]] (map-only assign +
    * quantize + pack, bit-identical to [[graft.ops.Ann.buildIvfSq]]),
    * compactStored graduation, then [[graft.ops.Ann
    * .searchIvfSqStored]] with r12's exact parameters — so the
    * streamed-then-compacted layout must reproduce the batch index
    * bit-for-bit (shared oracle). */
  def streamSqTwin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sc = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val e = Tables.embeddings(s, d)
    val model = graft.ops.Ann.buildIvf(e, "label", "embedding")
    val idx = graft.ops.Ann.buildIvfSq(e, "embedding", model,
      graft.ops.Ann.L2)
    val rows = e.select(col("vec_id"),
        col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_s13_dir").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_s13_ckpt").toString
    val input = MemoryStream[(Long, Seq[Double])]
    val q = graft.streaming.Stream.ingestIvfSq(
      input.toDF().toDF("vec_id", "embedding"), "embedding", idx,
      graft.ops.Ann.L2, dir, ckpt)
    try {
      val batches = 3
      (0 until batches).foreach { b =>
        input.addData(rows.slice(b * rows.length / batches,
          (b + 1) * rows.length / batches): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val rewritten = graft.streaming.Stream.compactStored(s,
      s"$dir/quantized", "centroid_id", maxFilesPerCell = 1)
    require(rewritten > 0, "compaction rewrote no cell dirs")
    require(!new java.io.File(s"$dir/quantized", "_spark_metadata")
        .exists(),
      "commit log must be gone after graduation")
    val qv = rows.find(_._1 == 11L)
      .getOrElse(throw new IllegalStateException("no vec_id 11"))._2
    graft.ops.Ann.searchIvfSqStored(s, dir, "vec_id", "embedding",
      typedlit(qv), graft.ops.Ann.L2, probes = 3, k = 10, refine = 5)
  }

  /** s14: the 1-BIT streaming lifecycle under the oracle — the last
    * quantized member (s12 PQ, s13 SQ): the IVF model trained
    * batch-side and pinned at the root, sign-bit residual codes + rnorm
    * streamed in three micro-batches through
    * [[graft.streaming.Stream.ingestIvfBitq]], compactStored
    * graduation, then [[graft.ops.Ann.searchIvfBitqStored]] with r14's
    * exact parameters (shared oracle — the streamed layout must
    * reproduce the batch index bit-for-bit). */
  def streamBitqTwin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sc = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val e = Tables.embeddings(s, d)
    val model = graft.ops.Ann.buildIvf(e, "label", "embedding")
    val rows = e.select(col("vec_id"),
        col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_s14_dir").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_s14_ckpt").toString
    val input = MemoryStream[(Long, Seq[Double])]
    val q = graft.streaming.Stream.ingestIvfBitq(
      input.toDF().toDF("vec_id", "embedding"), "embedding", model,
      graft.ops.Ann.L2, dir, ckpt)
    try {
      val batches = 3
      (0 until batches).foreach { b =>
        input.addData(rows.slice(b * rows.length / batches,
          (b + 1) * rows.length / batches): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val rewritten = graft.streaming.Stream.compactStored(s,
      s"$dir/quantized", "centroid_id", maxFilesPerCell = 1)
    require(rewritten > 0, "compaction rewrote no cell dirs")
    require(!new java.io.File(s"$dir/quantized", "_spark_metadata")
        .exists(),
      "commit log must be gone after graduation")
    val qv = rows.find(_._1 == 13L)
      .getOrElse(throw new IllegalStateException("no vec_id 13"))._2
    graft.ops.Ann.searchIvfBitqStored(s, dir, "vec_id", "embedding",
      typedlit(qv), graft.ops.Ann.L2, probes = 3, k = 10, refine = 5)
  }

  /** s15: the RANGE-INDEX streaming lifecycle — rows streamed through
    * [[graft.streaming.Stream.ingestIvf]] into `root/rows` in three
    * micro-batches, then [[graft.streaming.Stream.graduateRangeIndex]]
    * (compaction + centroids + covering radii computed AFTER the last
    * append — the sound order for the radii append-asymmetry), then
    * [[graft.ops.Ann.rangeSearchStoredSelf]] with r56's exact
    * parameters. The oracle is r56's plain threshold SQL: the streamed
    * root must be semantically indistinguishable from the batch-built
    * one, and radii pruning must stay invisible to results. */
  def streamRangeTwin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sc = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val e = Tables.embeddings(s, d)
    val model = graft.ops.Ann.buildIvf(e, "label", "embedding")
    val rows = e.select(col("vec_id"),
        col("embedding").cast("array<double>"), col("label"))
      .as[(Long, Seq[Double], Int)].collect().toSeq.sortBy(_._1)
    val root = java.nio.file.Files
      .createTempDirectory("graft_s15_root").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_s15_ckpt").toString
    val input = MemoryStream[(Long, Seq[Double], Int)]
    val q = graft.streaming.Stream.ingestIvf(
      input.toDF().toDF("vec_id", "embedding", "label"), "embedding",
      model, graft.ops.Ann.L2, s"$root/rows", ckpt)
    try {
      val batches = 3
      (0 until batches).foreach { b =>
        input.addData(rows.slice(b * rows.length / batches,
          (b + 1) * rows.length / batches): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val rewritten = graft.streaming.Stream.graduateRangeIndex(s, root,
      model, "embedding", maxFilesPerCell = 1)
    require(rewritten > 0, "graduation rewrote no cell dirs")
    val qv = rows.find(_._1 == 9L)
      .getOrElse(throw new IllegalStateException("no vec_id 9"))._2
    graft.ops.Ann.rangeSearchStoredSelf(s, root, "vec_id", "embedding",
        typedlit(qv), eps = 1.3, pred = col("label").isin(1, 3, 5))
      .select("vec_id", "dist")
  }

  /** s18: the MATRYOSHKA streaming lifecycle under the oracle — the
    * flat member of the at-rest ingest family (and the cheapest:
    * pure map, no model): dims pinned at the root before the stream,
    * (id, emb_pre, emb_full) rows in three micro-batches through
    * [[graft.streaming.Stream.ingestMatryoshka]], whole-directory
    * [[graft.streaming.Stream.compactFlat]] graduation (commit log
    * gone with the old directory), then
    * [[graft.ops.Ann.matryoshkaTopKStored]] with r70/r71's exact
    * parameters — the streamed layout is lossless, so the shared
    * matryoshka oracle must land verbatim. */
  def streamMatryoshkaTwin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sc = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val e = Tables.embeddings(s, d)
    val rows = e.select(col("vec_id"),
        col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_s18_dir").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_s18_ckpt").toString
    val input = MemoryStream[(Long, Seq[Double])]
    val q = graft.streaming.Stream.ingestMatryoshka(
      input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      dims = 8, dir, ckpt)
    try {
      val batches = 3
      (0 until batches).foreach { b =>
        input.addData(rows.slice(b * rows.length / batches,
          (b + 1) * rows.length / batches): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val nFiles = graft.streaming.Stream.compactFlat(s, s"$dir/rows")
    require(nFiles == 1, s"graduation left $nFiles files, wanted 1")
    require(!new java.io.File(s"$dir/rows", "_spark_metadata").exists(),
      "commit log must be gone after graduation")
    val qv = rows.find(_._1 == 3L)
      .getOrElse(throw new IllegalStateException("no vec_id 3"))._2
    graft.ops.Ann.matryoshkaTopKStored(s, dir, "vec_id", qv,
      candidates = 50, k = 10)
  }

  /** s19: streamed MAINTENANCE of a graduated range root
    * ([[graft.streaming.Stream.ingestRangeAppend]]) — the one index
    * family whose streaming story previously stopped at graduation:
    * half the corpus is batch-built into a
    * [[graft.ops.Ann.writeRangeIndex]] root, the other half arrives
    * in three micro-batches through foreachBatch over the
    * replay-safe append (radii grow BEFORE each batch's rows become
    * visible — the r67 soundness order per batch). Three pins
    * in-query: a REPLAYED batch appends zero rows (the crash-
    * redelivery contract), the stored radii cover every row of the
    * grown root (sound appends), and the final search must land on
    * r56's plain threshold scan verbatim (the shared oracle — radii
    * machinery invisible to results by contract). */
  def streamRangeAppend(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sc = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val e = Tables.embeddings(s, d)
    val model = graft.ops.Ann.buildIvf(e, "label", "embedding")
    // one value type across batch base and streamed appends: mixed
    // float/double parquet files in one rows/ dir would read back
    // from an arbitrary footer
    val base = e.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"),
        col("label"))
    val root = java.nio.file.Files
      .createTempDirectory("graft_s19_root").toString
    graft.ops.Ann.writeRangeIndex(
      graft.ops.Ann.assign(base, "embedding", model, graft.ops.Ann.L2),
      "embedding", model, root)
    val rows = e.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), col("embedding").cast("array<double>"),
        col("label"))
      .as[(Long, Seq[Double], Int)].collect().toSeq.sortBy(_._1)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_s19_ckpt").toString
    val input = MemoryStream[(Long, Seq[Double], Int)]
    val q = graft.streaming.Stream.ingestRangeAppend(
      input.toDF().toDF("vec_id", "embedding", "label"), "vec_id",
      "embedding", root, ckpt)
    try {
      val batches = 3
      (0 until batches).foreach { b =>
        input.addData(rows.slice(b * rows.length / batches,
          (b + 1) * rows.length / batches): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // pin 1: a crash-redelivered batch appends NOTHING
    val replay = rows.take(rows.length / 3)
      .toDF("vec_id", "embedding", "label")
    val dup = graft.ops.Ann.appendRangeIndexIdempotent(s, root,
      replay, "vec_id", "embedding")
    require(dup == 0L,
      s"s19: replayed batch appended $dup rows — append not replay-safe")
    // pin 2: radii stayed SOUND through every batch (each grew them
    // before its rows) — the stored radius covers every stored row
    val (m2, storedRadii) = graft.ops.Ann.loadRangeIndex(s, root)
    val uncovered = graft.ops.Ann.cellRadii(
        s.read.parquet(s"$root/rows"), "embedding", m2,
        graft.ops.Ann.L2)
      .withColumnRenamed("radius", "actual")
      .join(storedRadii.select(col("centroid_id"), col("radius")),
        "centroid_id")
      .filter(col("actual") > col("radius") + lit(1e-9)).count()
    require(uncovered == 0L,
      s"s19: $uncovered cells hold rows outside their stored radius")
    val qv = e.filter(col("vec_id") === 9)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toSeq
    graft.ops.Ann.rangeSearchStoredSelf(s, root, "vec_id", "embedding",
        typedlit(qv), eps = 1.3, pred = col("label").isin(1, 3, 5))
      .select("vec_id", "dist")
  }

  /** s20: the COMPOSED matryoshka-IVF streaming lifecycle
    * ([[graft.streaming.Stream.ingestMatryoshkaIvf]]) — the sixth
    * lifecycle form of the r78 layout: markers + centroids land
    * before any row, three micro-batches of assigned prefix-sliced
    * rows append cell-partitioned exactly-once,
    * [[graft.streaming.Stream.compactStored]] graduates the cells,
    * and the graduated root serves [[graft.ops.Ann.matryoshkaTopKIvf]]
    * with r78's exact parameters — the streamed layout is lossless,
    * so r78's composed replay must land verbatim (one oracle, two
    * build paths). A restart with different dims refuses (pinned
    * in-query). */
  def streamMatryoshkaIvf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sc = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val e = Tables.embeddings(s, d)
    val model = graft.ops.Ann.buildIvf(e, "label", "embedding")
    val rows = e.select(col("vec_id"),
        col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_s20_dir").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_s20_ckpt").toString
    val input = MemoryStream[(Long, Seq[Double])]
    val q = graft.streaming.Stream.ingestMatryoshkaIvf(
      input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      dims = 8, model, graft.ops.Ann.L2, dir, ckpt)
    try {
      val batches = 3
      (0 until batches).foreach { b =>
        input.addData(rows.slice(b * rows.length / batches,
          (b + 1) * rows.length / batches): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // a restart slicing a DIFFERENT prefix width must refuse — the
    // one-layout-one-geometry contract, pinned on the live root
    require(scala.util.Try(graft.streaming.Stream.ingestMatryoshkaIvf(
        input.toDF().toDF("vec_id", "embedding"), "vec_id",
        "embedding", dims = 4, model, graft.ops.Ann.L2, dir,
        ckpt)).isFailure,
      "s20: a restart with different dims did not refuse")
    graft.streaming.Stream.compactStored(s, s"$dir/rows",
      "centroid_id", maxFilesPerCell = 1)
    graft.ops.Ann.matryoshkaTopKIvf(s, dir, "vec_id",
      qvecSeqOf(s, d, 5), probes = 3, candidates = 50, k = 10)
  }

  private def qvecSeqOf(s: SparkSession, d: String,
                        id: Long): Seq[Double] =
    Tables.embeddings(s, d).filter(col("vec_id") === id)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toSeq

  /** s21: streamed MAINTENANCE of a graduated composed matryoshka-IVF
    * root ([[graft.streaming.Stream.ingestMatryoshkaIvfAppend]]) —
    * s19's twin for the r78 layout: half the corpus batch-built under
    * the full-corpus model, the other half in three micro-batches
    * through foreachBatch over the id-keyed replay-safe append. Pins:
    * a replayed batch appends zero rows, and the grown root serves
    * r78's replay verbatim (one oracle, day-one and grown builds
    * indistinguishable). */
  def streamMatryoshkaIvfAppend(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sc = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val e = Tables.embeddings(s, d)
    val model = graft.ops.Ann.buildIvf(e, "label", "embedding")
    val root = java.nio.file.Files
      .createTempDirectory("graft_s21_root").toString
    graft.ops.Ann.writeMatryoshkaIvf(
      e.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
      dims = 8, model, root)
    val rows = e.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_s21_ckpt").toString
    val input = MemoryStream[(Long, Seq[Double])]
    val q = graft.streaming.Stream.ingestMatryoshkaIvfAppend(
      input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      root, ckpt)
    try {
      val batches = 3
      (0 until batches).foreach { b =>
        input.addData(rows.slice(b * rows.length / batches,
          (b + 1) * rows.length / batches): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // pin: a crash-redelivered batch appends NOTHING
    val dup = graft.ops.Ann.appendMatryoshkaIvfIdempotent(s, root,
      rows.take(rows.length / 3).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    require(dup == 0L,
      s"s21: replayed batch appended $dup rows — append not replay-safe")
    graft.ops.Ann.matryoshkaTopKIvf(s, root, "vec_id",
      qvecSeqOf(s, d, 5), probes = 3, candidates = 50, k = 10)
  }

  /** s22: streamed MAINTENANCE of a graduated BM25 postings layout
    * ([[graft.streaming.Stream.ingestBm25Append]]) — the keyword
    * member of the graduated-root maintenance family (s19 range, s21
    * composed matryoshka): half the corpus batch-written, the other
    * half in three micro-batches through foreachBatch over the
    * id-keyed replay-safe append. Pins: a replayed batch appends
    * zero docs; the loaded grown index serves r23's query with its
    * bucket partition pruning intact — and the oracle is r23's
    * verbatim (a grown layout is indistinguishable from a one-shot
    * build, because BM25 stats re-derive from the full posting set
    * at load). */
  def streamBm25Append(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sc = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = Tables.documents(s, d)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_s22_dir").toString
    graft.ops.Bm25.writePostings(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", dir, buckets = 16)
    val rows = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_s22_ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.Stream.ingestBm25Append(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", dir, ckpt)
    try {
      val batches = 3
      (0 until batches).foreach { b =>
        input.addData(rows.slice(b * rows.length / batches,
          (b + 1) * rows.length / batches): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val dup = graft.ops.Bm25.appendPostingsIdempotent(s, dir,
      rows.take(rows.length / 3).toDF("doc_id", "text"), "doc_id",
      "text")
    require(dup == 0L,
      s"s22: replayed batch appended $dup docs — append not replay-safe")
    val idx = graft.ops.Bm25.loadStoredPostings(s, dir)
    val df = graft.ops.Bm25.search(idx, "window partition order", 10)
    val phys = df.queryExecution.executedPlan.toString
    Retrieval.assertPartitionPruned(phys, "bucket",
      "grown stored bm25 search")
    df
  }

  /** s23: streamed MAINTENANCE of a graduated SPARSE postings layout
    * ([[graft.streaming.Stream.ingestSparseAppend]]) — s22's sparse
    * twin: same half-and-half build, same replay pin, r30's query
    * and oracle verbatim over the grown layout (a pure dot has no
    * corpus stats at all, so growth is trivially invisible). */
  def streamSparseAppend(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sc = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val emb = graft.functions.Md5SparseEmbedder(4096)
    val sv = udf((t: String) => emb.embed(if (t == null) "" else t))
    val docs = Tables.documents(s, d)
      .withColumn("__sv", sv(col("text")))
      .select(col("doc_id"), col("__sv.indices").as("__i"),
        col("__sv.values").as("__v"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_s23_dir").toString
    graft.functions.Sparse.writePostings(
      graft.functions.Sparse.invertedPostings(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "__i", "__v"),
      dir, buckets = 16)
    val rows = docs.filter(col("doc_id") % 2 === 1)
      .as[(Long, Seq[Int], Seq[Float])].collect().toSeq.sortBy(_._1)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_s23_ckpt").toString
    val input = MemoryStream[(Long, Seq[Int], Seq[Float])]
    val q = graft.streaming.Stream.ingestSparseAppend(
      input.toDF().toDF("doc_id", "__i", "__v"), "doc_id", "__i",
      "__v", dir, ckpt)
    try {
      val batches = 3
      (0 until batches).foreach { b =>
        input.addData(rows.slice(b * rows.length / batches,
          (b + 1) * rows.length / batches): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val dup = graft.functions.Sparse.appendPostingsIdempotent(s, dir,
      rows.take(rows.length / 3).toDF("doc_id", "__i", "__v"),
      "doc_id", "__i", "__v")
    require(dup == 0L,
      s"s23: replayed batch appended $dup docs — append not replay-safe")
    val df = graft.functions.Sparse.searchStored(s, dir,
      emb.embed(Retrieval.SparseQueryText), 10)
    val phys = df.queryExecution.executedPlan.toString
    Retrieval.assertPartitionPruned(phys, "__b",
      "grown stored sparse search")
    df.select(col("id").as("doc_id"), col("score"))
  }

  /** s24: streamed MAINTENANCE of a graduated dense-cell layout
    * ([[graft.streaming.Stream.ingestIvfAppend]]) — the plain-IVF
    * member completing the graduated-root maintenance family (s19
    * range, s21 composed matryoshka, s22 BM25, s23 sparse; the
    * quantized layouts rebuild by design): half the corpus
    * batch-written under the full-corpus label model, the other half
    * in three micro-batches. Pins: a replayed batch appends zero
    * rows; the probed stored search partition-prunes the grown
    * layout and lands on r09's probe replay verbatim. */
  def streamIvfAppend(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sc = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val e = Tables.embeddings(s, d)
    val model = graft.ops.Ann.buildIvf(e, "label", "embedding")
    val base = e.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"),
        col("label"))
    val path = java.nio.file.Files
      .createTempDirectory("graft_s24_rows").toString + "/rows"
    graft.ops.Ann.writePartitioned(
      graft.ops.Ann.assign(base, "embedding", model, graft.ops.Ann.L2),
      path)
    // the model pin is DECLARED at build time; the append path only
    // validates (an unmarked layout refuses — adopt-on-append would
    // let a retrained model silently mix two geometries)
    graft.ops.Ann.ensureIvfModelMarker(s, path, model)
    val rows = e.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), col("embedding").cast("array<double>"),
        col("label"))
      .as[(Long, Seq[Double], Int)].collect().toSeq.sortBy(_._1)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_s24_ckpt").toString
    val input = MemoryStream[(Long, Seq[Double], Int)]
    val q = graft.streaming.Stream.ingestIvfAppend(
      input.toDF().toDF("vec_id", "embedding", "label"), "vec_id",
      "embedding", model, graft.ops.Ann.L2, path, ckpt)
    try {
      val batches = 3
      (0 until batches).foreach { b =>
        input.addData(rows.slice(b * rows.length / batches,
          (b + 1) * rows.length / batches): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val dup = graft.ops.Ann.appendIvfIdempotent(s, path, model,
      rows.take(rows.length / 3).toDF("vec_id", "embedding", "label"),
      "vec_id", "embedding")
    require(dup == 0L,
      s"s24: replayed batch appended $dup rows — append not replay-safe")
    val qv = e.filter(col("vec_id") === 5)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toSeq
    val df = graft.ops.Ann.searchIvfStored(s, path, "vec_id",
      "embedding", model, typedlit(qv), graft.ops.Ann.L2, probes = 3,
      k = 10)
    val phys = df.queryExecution.executedPlan.toString
    Retrieval.assertPartitionPruned(phys, "centroid_id",
      "grown dense-cell search")
    df.select("vec_id", "dist")
  }

  /** s25: streamed MAINTENANCE of a graduated QUANTIZED (PQ) root —
    * closing the family's last documented gap (s19 range, s21 composed
    * matryoshka, s22 BM25, s23 sparse, s24 dense cells; the quantized
    * layouts previously "rebuilt by design"). Codes are bound to
    * training-time codebooks, so the root never re-encodes per batch:
    * appended rows land RAW in the root's fresh side table
    * ([[graft.ops.Ann.appendQuantizedFreshIdempotent]] — id-keyed
    * replay-safe, existence probe pruned to touched cells of fresh
    * AND main, so a batch redelivered even AFTER compaction appends
    * nothing), and the fresh-aware search PQ-encodes them ON READ
    * under the frozen codebooks
    * ([[graft.ops.Ann.searchIvfPqStoredFresh]]) — bit-identical codes
    * to the batch build, so the result is EXACTLY a one-shot
    * full-corpus build's. Codebooks and centroids train on the full
    * corpus (the label-mean / offline-model seat s19 and c10 use),
    * which is what makes r38/r40's oracle replay verbatim over the
    * half-written + half-streamed root. The incremental-insert shape
    * matches the reference's own index maintenance
    * (/root/reference/vechord/spec.py:437-444 — vchordrq inserts are
    * incremental, never rebuilds). */
  def streamPqAppend(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sc = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // ONE value type across the batch-written root and streamed fresh
    // rows (the s19 rule): everything double
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"),
        col("label"))
    val model = graft.ops.Ann.buildIvf(e, "label", "embedding")
    val full = graft.ops.Ann.buildIvfPq(e, "embedding", model, m = 8,
      graft.ops.Ann.L2)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_s25_root").toString
    graft.ops.Ann.writeIvfPq(
      full.copy(encoded = full.encoded.filter(col("vec_id") % 2 === 0)),
      dir)
    // pin the coarse model at build time (writeIvfPq pins geometry +
    // codebook digest; the IVF fingerprint comes from ensureIvfPqRoot)
    graft.ops.Ann.ensureIvfPqRoot(s, dir, full.pq, model,
      spherical = false)
    val rows = e.filter(col("vec_id") % 2 === 1)
      .as[(Long, Seq[Double], Int)].collect().toSeq.sortBy(_._1)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_s25_ckpt").toString
    val input = MemoryStream[(Long, Seq[Double], Int)]
    val q = graft.streaming.Stream.ingestQuantizedFreshAppend(
      input.toDF().toDF("vec_id", "embedding", "label"), "vec_id",
      "embedding", dir, ckpt)
    try {
      val batches = 3
      (0 until batches).foreach { b =>
        input.addData(rows.slice(b * rows.length / batches,
          (b + 1) * rows.length / batches): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // pin: a crash-redelivered batch appends NOTHING
    val dup = graft.ops.Ann.appendQuantizedFreshIdempotent(s, dir,
      rows.take(rows.length / 3).toDF("vec_id", "embedding", "label"),
      "vec_id", "embedding")
    require(dup == 0L,
      s"s25: replayed batch appended $dup rows — append not replay-safe")
    // r38's exact search over the grown root; cell dirs of BOTH the
    // encoded layout and the fresh side table partition-prune
    val qv = e.filter(col("vec_id") === 5)
      .select(col("embedding")).head().getSeq[Double](0).toSeq
    val df = graft.ops.Ann.searchIvfPqStoredFresh(s, dir, "vec_id",
      "embedding", qv, graft.ops.Ann.L2, probes = 3, k = 10, refine = 5)
    Retrieval.assertPartitionPruned(
      df.queryExecution.executedPlan.toString, "centroid_id",
      "grown PQ-root search")
    df
  }

  /** s28: the fresh-table COMPACTION POLICY in the streaming loop —
    * the r14 verdict's lifecycle closure (#4: `compactQuantizedFresh`
    * existed and was oracle-pinned a no-op, but nothing TRIGGERED it;
    * at 100 TB fresh/ grows until someone remembers). s26's exact
    * chain with `compactRatio = 0.15` wired into
    * [[graft.streaming.Stream.ingestQuantizedFreshAppend]] — 0.15,
    * NOT the asymptotic per-batch ratio (1/6 ÷ 1/2 = 1/3)'s
    * boundary-adjacent 0.2: the trigger is a STRICT >, and a corpus
    * whose streamed half divides evenly by 3 would put a batch
    * exactly ON a boundary ratio, so the threshold needs real margin
    * below every batch's fresh/main ratio. Each ~1/6-corpus batch
    * pushes |fresh| above 0.15·|main|, so the
    * post-append seat folds it
    * ([[graft.ops.Ann.compactQuantizedFreshIfNeeded]]) — by stream
    * end EVERYTHING has graduated through threshold-triggered
    * compactions and `fresh/` is GONE (pinned in-query: a policy that
    * never fired would leave it), yet the search answers r12's
    * full-corpus oracle verbatim, pinning that the trigger points are
    * invisible to results (the s26 no-op contract, exercised at every
    * batch boundary instead of once). */
  def streamFreshPolicy(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sc = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"),
        col("label"))
    val model = graft.ops.Ann.buildIvf(e, "label", "embedding")
    val full = graft.ops.Ann.buildIvfSq(e, "embedding", model,
      graft.ops.Ann.L2)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_s28_root").toString
    graft.ops.Ann.writeIvfSq(
      full.copy(quantized =
        full.quantized.filter(col("vec_id") % 2 === 0)), dir)
    graft.ops.Ann.ensureIvfSqRoot(s, dir, full, spherical = false)
    val rows = e.filter(col("vec_id") % 2 === 1)
      .as[(Long, Seq[Double], Int)].collect().toSeq.sortBy(_._1)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_s28_ckpt").toString
    val input = MemoryStream[(Long, Seq[Double], Int)]
    val q = graft.streaming.Stream.ingestQuantizedFreshAppend(
      input.toDF().toDF("vec_id", "embedding", "label"), "vec_id",
      "embedding", dir, ckpt, compactRatio = Some(0.15))
    try {
      val batches = 3
      (0 until batches).foreach { b =>
        input.addData(rows.slice(b * rows.length / batches,
          (b + 1) * rows.length / batches): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // the policy must have folded the LAST batch too: a fresh side
    // surviving stream end means the threshold seat never fired
    require(!new java.io.File(dir, "fresh").exists(),
      "s28: the compaction policy never fired — fresh/ survived " +
        "the stream")
    // a redelivered batch still appends nothing POST-graduation (the
    // probe reads main where the rows now live)
    val dup = graft.ops.Ann.appendQuantizedFreshIdempotent(s, dir,
      rows.take(rows.length / 3).toDF("vec_id", "embedding", "label"),
      "vec_id", "embedding")
    require(dup == 0L,
      s"s28: replayed batch appended $dup rows after graduation")
    val qv = e.filter(col("vec_id") === 11)
      .select(col("embedding")).head().getSeq[Double](0).toSeq
    // the fresh-AWARE search on a fully-graduated root degenerates to
    // the stored search — r12's oracle lands verbatim
    graft.ops.Ann.searchIvfSqStoredFresh(s, dir, "vec_id", "embedding",
      typedlit(qv), graft.ops.Ann.L2, probes = 3, k = 10, refine = 5)
  }

  /** s26: s25's SQ twin — streamed maintenance of a graduated
    * [[graft.ops.Ann.writeIvfSq]] root through the same fresh-rows
    * side table, searched via
    * [[graft.ops.Ann.searchIvfSqStoredFresh]] (fresh rows SQ-encoded
    * on read under the stored per-cell bounds — codes bit-identical
    * to the batch build), then COMPACTED
    * ([[graft.ops.Ann.compactQuantizedFresh]]) and searched again:
    * both answers must land on r12's full-corpus two-phase oracle
    * verbatim, pinning in one gate that encode-on-read and
    * fold-into-layout are the same index. Bounds/centroids train on
    * the full corpus (the offline-model seat). */
  def streamSqAppend(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sc = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"),
        col("label"))
    val model = graft.ops.Ann.buildIvf(e, "label", "embedding")
    val full = graft.ops.Ann.buildIvfSq(e, "embedding", model,
      graft.ops.Ann.L2)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_s26_root").toString
    graft.ops.Ann.writeIvfSq(
      full.copy(quantized =
        full.quantized.filter(col("vec_id") % 2 === 0)), dir)
    graft.ops.Ann.ensureIvfSqRoot(s, dir, full, spherical = false)
    val rows = e.filter(col("vec_id") % 2 === 1)
      .as[(Long, Seq[Double], Int)].collect().toSeq.sortBy(_._1)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_s26_ckpt").toString
    val input = MemoryStream[(Long, Seq[Double], Int)]
    val q = graft.streaming.Stream.ingestQuantizedFreshAppend(
      input.toDF().toDF("vec_id", "embedding", "label"), "vec_id",
      "embedding", dir, ckpt)
    try {
      val batches = 3
      (0 until batches).foreach { b =>
        input.addData(rows.slice(b * rows.length / batches,
          (b + 1) * rows.length / batches): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val qv = e.filter(col("vec_id") === 11)
      .select(col("embedding")).head().getSeq[Double](0).toSeq
    def search() = graft.ops.Ann.searchIvfSqStoredFresh(s, dir,
      "vec_id", "embedding", typedlit(qv), graft.ops.Ann.L2,
      probes = 3, k = 10, refine = 5)
    // pin: compaction is OBSERVABLY a no-op — encode-on-read before,
    // folded codes after, same rows either way
    val before = search().collect().map(r =>
      (r.getLong(0), r.getDouble(1))).toSeq
    val folded = graft.ops.Ann.compactQuantizedFresh(s, dir, "vec_id",
      "embedding")
    require(folded == rows.length.toLong,
      s"s26: compaction folded $folded rows, wanted ${rows.length}")
    require(!new java.io.File(dir, "fresh").exists(),
      "s26: fresh/ must be gone after compaction")
    val df = search()
    val after = df.collect().map(r =>
      (r.getLong(0), r.getDouble(1))).toSeq
    require(before == after,
      s"s26: compaction changed the search:\nbefore $before\nafter $after")
    df
  }

  /** s27: the 1-bit member completing the quantized fresh-rows trio
    * (s25 PQ, s26 SQ) — same lifecycle over a
    * [[graft.ops.Ann.writeIvfBitq]] root: half the corpus at rest
    * under full-corpus-trained centroids, the other half streamed RAW
    * into `fresh/`, searched via
    * [[graft.ops.Ann.searchIvfBitqStoredFresh]] (fresh rows
    * sign-bit-encoded on read — residuals against the same frozen
    * centroids, so codes are bit-identical to the batch build's) with
    * r14's exact parameters, landing on r14's oracle verbatim.
    * Redelivery pinned like s25. */
  def streamBitqAppend(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sc = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"),
        col("label"))
    val model = graft.ops.Ann.buildIvf(e, "label", "embedding")
    val full = graft.ops.Ann.buildIvfBitq(e, "embedding", model,
      graft.ops.Ann.L2)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_s27_root").toString
    graft.ops.Ann.writeIvfBitq(
      full.copy(quantized =
        full.quantized.filter(col("vec_id") % 2 === 0)), dir)
    graft.ops.Ann.ensureIvfBitqRoot(s, dir, full.model,
      spherical = false)
    val rows = e.filter(col("vec_id") % 2 === 1)
      .as[(Long, Seq[Double], Int)].collect().toSeq.sortBy(_._1)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_s27_ckpt").toString
    val input = MemoryStream[(Long, Seq[Double], Int)]
    val q = graft.streaming.Stream.ingestQuantizedFreshAppend(
      input.toDF().toDF("vec_id", "embedding", "label"), "vec_id",
      "embedding", dir, ckpt)
    try {
      val batches = 3
      (0 until batches).foreach { b =>
        input.addData(rows.slice(b * rows.length / batches,
          (b + 1) * rows.length / batches): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val dup = graft.ops.Ann.appendQuantizedFreshIdempotent(s, dir,
      rows.take(rows.length / 3).toDF("vec_id", "embedding", "label"),
      "vec_id", "embedding")
    require(dup == 0L,
      s"s27: replayed batch appended $dup rows — append not replay-safe")
    val qv = e.filter(col("vec_id") === 13)
      .select(col("embedding")).head().getSeq[Double](0).toSeq
    graft.ops.Ann.searchIvfBitqStoredFresh(s, dir, "vec_id",
      "embedding", typedlit(qv), graft.ops.Ann.L2, probes = 3, k = 10,
      refine = 5)
  }

  /** s29: threshold-triggered OVERFULL-CELL SPLIT on the streamed
    * range-root maintenance path — the s28 lifecycle closure for the
    * cell-growth families: [[graft.ops.Ann.splitOverfullCells]] (r69)
    * was the actuator for the r66 health signal, but nothing
    * triggered it, so a streamed root's hot cells grew until probes
    * over-read. s19's chain runs with
    * [[graft.streaming.Stream.ingestRangeAppend]]'s new
    * `splitMaxRows` wired the way an operator would wire it — from
    * the OBSERVED occupancy (the r66 health signal): one below the
    * full-corpus maximum cell, so the policy MUST fire by stream end
    * (the max cell crosses by definition) while the near-balanced
    * sibling cells stay put (a 0.9×-average threshold fired on all
    * ten label cells and more than doubled the gate's cost for no
    * extra evidence) — pinned via centroid count strictly above the
    * trained `lists`. Split cells
    * re-pin the marker, so redelivery still appends ZERO against the
    * re-partitioned layout (the replayed rows re-assign into the
    * sub-cells where their copies now live), the grown radii stay
    * sound (every stored row within its cell's stored radius), and
    * the final range search answers r56's index-free oracle VERBATIM
    * — split boundaries are invisible to results, now proven at
    * every batch boundary of a live stream. */
  def streamRangeSplit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sc = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val e = Tables.embeddings(s, d)
    val model = graft.ops.Ann.buildIvf(e, "label", "embedding")
    val lists = model.centroids.count()
    val base = e.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"),
        col("label"))
    val root = java.nio.file.Files
      .createTempDirectory("graft_s29_root").toString
    graft.ops.Ann.writeRangeIndex(
      graft.ops.Ann.assign(base, "embedding", model, graft.ops.Ann.L2),
      "embedding", model, root)
    val rows = e.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), col("embedding").cast("array<double>"),
        col("label"))
      .as[(Long, Seq[Double], Int)].collect().toSeq.sortBy(_._1)
    // SF-relative threshold from the observed occupancy (an absolute
    // count would mis-fire across sf0.001/0.01/0.1): one below the
    // full-corpus max cell, so exactly the hottest cell(s) trip it
    val maxOcc = graft.ops.Ann
      .assign(e, "embedding", model, graft.ops.Ann.L2)
      .groupBy(col("centroid_id")).count()
      .agg(max(col("count"))).head().getLong(0)
    val maxRows = math.max(1L, maxOcc - 1)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_s29_ckpt").toString
    val input = MemoryStream[(Long, Seq[Double], Int)]
    val q = graft.streaming.Stream.ingestRangeAppend(
      input.toDF().toDF("vec_id", "embedding", "label"), "vec_id",
      "embedding", root, ckpt, splitMaxRows = Some(maxRows))
    try {
      val batches = 2 // no-fire batch, then the firing one
      (0 until batches).foreach { b =>
        input.addData(rows.slice(b * rows.length / batches,
          (b + 1) * rows.length / batches): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val (m2, storedRadii) = graft.ops.Ann.loadRangeIndex(s, root)
    // pin 1: the policy FIRED — the root holds more cells than the
    // trained model (a never-firing policy leaves exactly `lists`)
    val cellsNow = m2.centroids.count()
    require(cellsNow > lists,
      s"s29: split policy never fired — $cellsNow cells, trained $lists")
    // pin 2: redelivery appends ZERO against the re-partitioned
    // layout (the id probe finds the copies inside the sub-cells)
    val dup = graft.ops.Ann.appendRangeIndexIdempotent(s, root,
      rows.take(rows.length / 3).toDF("vec_id", "embedding", "label"),
      "vec_id", "embedding")
    require(dup == 0L,
      s"s29: replayed batch appended $dup rows post-split")
    // pin 3: radii stayed sound through appends AND splits
    val uncovered = graft.ops.Ann.cellRadii(
        s.read.parquet(s"$root/rows"), "embedding", m2,
        graft.ops.Ann.L2)
      .withColumnRenamed("radius", "actual")
      .join(storedRadii.select(col("centroid_id"), col("radius")),
        "centroid_id")
      .filter(col("actual") > col("radius") + lit(1e-9)).count()
    require(uncovered == 0L,
      s"s29: $uncovered cells hold rows outside their stored radius")
    val qv = e.filter(col("vec_id") === 9)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toSeq
    graft.ops.Ann.rangeSearchStoredSelf(s, root, "vec_id", "embedding",
        typedlit(qv), eps = 1.3, pred = col("label").isin(1, 3, 5))
      .select("vec_id", "dist")
  }

  /** s31: threshold-triggered OVERFULL-CELL SPLIT on the streamed
    * COMPOSED matryoshka-IVF maintenance path — s29's recipe on the
    * north-star layout, closing the asymmetry where the layout the
    * reference's own index runs (vchordrq holds IVF and truncation
    * together) was the one whose hot cells nothing bounded:
    * [[graft.streaming.Stream.ingestMatryoshkaIvfAppend]]'s new
    * `splitMaxRows` is wired from the OBSERVED occupancy (one below
    * the full-corpus maximum cell, so the policy MUST fire by stream
    * end while near-balanced siblings stay put — the s29 lesson),
    * the flagged cell locally retrains under the root's own pinned
    * geometry with `emb_pre` moving verbatim, and the final search
    * probes EVERY cell — at all-probe the composed two-phase equals
    * the FLAT prefix cut regardless of cell homes (the r91 oracle
    * argument), so r70's index-free oracle lands verbatim across
    * batch AND split boundaries while the operator still asserts its
    * partition-pruning and emb_pre-only pins on the split layout.
    * Pins: centroid count strictly above the trained `lists`
    * (policy fired), a replayed batch appends ZERO against the
    * re-partitioned root (the id probe finds the copies inside the
    * sub-cells). */
  def streamMrlIvfSplit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sc = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val e = Tables.embeddings(s, d)
    val model = graft.ops.Ann.buildIvf(e, "label", "embedding")
    val lists = model.centroids.count()
    val root = java.nio.file.Files
      .createTempDirectory("graft_s31_root").toString
    graft.ops.Ann.writeMatryoshkaIvf(
      e.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
      dims = 8, model, root)
    val rows = e.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)
    // SF-relative threshold from the observed occupancy (s29's
    // recipe): one below the full-corpus max cell, so exactly the
    // hottest cell(s) trip it by stream end
    val maxOcc = graft.ops.Ann
      .assign(e, "embedding", model, graft.ops.Ann.L2)
      .groupBy(col("centroid_id")).count()
      .agg(max(col("count"))).head().getLong(0)
    val maxRows = math.max(1L, maxOcc - 1)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_s31_ckpt").toString
    val input = MemoryStream[(Long, Seq[Double])]
    val q = graft.streaming.Stream.ingestMatryoshkaIvfAppend(
      input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      root, ckpt, splitMaxRows = Some(maxRows))
    try {
      val batches = 2 // no-fire batch, then the firing one
      (0 until batches).foreach { b =>
        input.addData(rows.slice(b * rows.length / batches,
          (b + 1) * rows.length / batches): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // pin 1: the policy FIRED — more cells than the trained model
    val cellsNow = s.read.parquet(s"$root/centroids").count()
    require(cellsNow > lists,
      s"s31: split policy never fired — $cellsNow cells, trained $lists")
    // pin 2: redelivery appends ZERO against the re-partitioned root
    // — via the SOUND whole-layout id probe the split-policy stream
    // itself uses (a split can strand a replayed neighbor row
    // off-argmin; the touched-cells probe would miss its copy)
    val dup = graft.ops.Ann.appendMatryoshkaIvfIdempotent(s, root,
      rows.take(rows.length / 2).toDF("vec_id", "embedding"),
      "vec_id", "embedding", probeAllCells = true)
    require(dup == 0L,
      s"s31: replayed batch appended $dup rows post-split")
    // all-probe: the composed two-phase equals the flat prefix cut —
    // r70's oracle verbatim, independent of which cells split
    graft.ops.Ann.matryoshkaTopKIvf(s, root, "vec_id",
      qvecSeqOf(s, d, 3), probes = cellsNow.toInt, candidates = 50,
      k = 10)
  }

  /** s32: the QUANTIZED lifecycle closed — compaction and the
    * overfull-cell split run as ONE streamed policy cadence
    * ([[graft.streaming.Stream.ingestQuantizedFreshAppend]]'s
    * `compactRatio` + `splitMaxRows`): each batch appends raw into
    * `fresh/`, the ratio-0 policy folds it immediately (the s28
    * trigger), and the split re-partitions any cell past the
    * observed-occupancy threshold right after the fold — the only
    * moment the quantized split's no-fresh precondition holds. SQ
    * codes stay bit-identical across splits (inherited bounds,
    * r95's spec-pinned property), so the final root answers the
    * plain index-free exact oracle at all-probe with covering
    * refine, no matter which cells split at which batch boundary.
    * Pins: the policy fired (cells grew past the trained count),
    * `fresh/` is gone, and a crash-redelivered batch appends ZERO
    * against the folded, re-partitioned root. */
  def streamQuantizedSplit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sc = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"),
        col("label"))
    val model = graft.ops.Ann.buildIvf(e, "label", "embedding")
    val lists = model.centroids.count()
    val full = graft.ops.Ann.buildIvfSq(e, "embedding", model,
      graft.ops.Ann.L2)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_s32_root").toString
    graft.ops.Ann.writeIvfSq(
      full.copy(quantized =
        full.quantized.filter(col("vec_id") % 2 === 0)), dir)
    graft.ops.Ann.ensureIvfSqRoot(s, dir, full, spherical = false)
    val rows = e.filter(col("vec_id") % 2 === 1)
      .as[(Long, Seq[Double], Int)].collect().toSeq.sortBy(_._1)
    // SF-relative threshold from the observed full-corpus occupancy
    // (the s29/s31 recipe): one below the max cell, so the policy
    // MUST fire by stream end while near-balanced siblings stay put
    val maxOcc = graft.ops.Ann
      .assign(e, "embedding", model, graft.ops.Ann.L2)
      .groupBy(col("centroid_id")).count()
      .agg(max(col("count"))).head().getLong(0)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_s32_ckpt").toString
    val input = MemoryStream[(Long, Seq[Double], Int)]
    val q = graft.streaming.Stream.ingestQuantizedFreshAppend(
      input.toDF().toDF("vec_id", "embedding", "label"), "vec_id",
      "embedding", dir, ckpt, compactRatio = Some(0.0),
      splitMaxRows = Some(math.max(1L, maxOcc - 1)))
    try {
      val batches = 2
      (0 until batches).foreach { b =>
        input.addData(rows.slice(b * rows.length / batches,
          (b + 1) * rows.length / batches): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val cellsNow = s.read.parquet(s"$dir/centroids").count()
    require(cellsNow > lists,
      s"s32: split policy never fired — $cellsNow cells, trained $lists")
    require(!new java.io.File(dir, "fresh").exists(),
      "s32: the ratio-0 cadence must leave no fresh/ behind")
    // the replay rides the SOUND whole-layout probe, as the
    // split-policy stream itself does
    val dup = graft.ops.Ann.appendQuantizedFreshIdempotent(s, dir,
      rows.take(rows.length / 2).toDF("vec_id", "embedding", "label"),
      "vec_id", "embedding", probeAllCells = true)
    require(dup == 0L,
      s"s32: replayed batch appended $dup rows post-split+fold")
    val total = s.read.parquet(s"$dir/quantized").count()
    graft.ops.Ann.searchIvfSqStored(s, dir, "vec_id", "embedding",
      typedlit(qvecSeqOf(s, d, 7)), graft.ops.Ann.L2,
      probes = cellsNow.toInt, k = 10,
      refine = (total / 10 + 1).toInt)
  }

  /** s30: streamed MAINTENANCE of a GRADUATED maxsim layout — the
    * multivec member closing the graduated-root append family's last
    * modality (s19 range, s21 composed, s22 BM25, s23 sparse, s24
    * dense, s25-s27 quantized fresh): the root is batch-built from
    * the EVEN half of s11's corpus under the full-corpus label-mean
    * model (the offline seat — an ingest model always predates the
    * stream), the odd half streams through
    * [[graft.streaming.Stream.ingestMaxsimAppend]] (per-batch
    * token-mean summarization + spherical assignment + id-keyed
    * replay-safe append), a redelivered batch appends ZERO, and
    * s11's exact two-phase read answers r26's oracle verbatim —
    * grown equals built for the multivec family too. */
  def streamMaxsimAppend(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sc = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val e = Tables.embeddings(s, d)
    val dim = e.select(size(col("embedding"))).head.getInt(0)
    val qts: Seq[Seq[Double]] = e.filter(col("vec_id").isin(0, 1))
      .orderBy("vec_id").select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toSeq).toSeq
    val docs = e.select(col("vec_id"), col("label"),
      array(col("embedding").cast("array<double>"),
        reverse(col("embedding")).cast("array<double>")).as("vecs"))
    val withMean = docs.withColumn("mv_mean",
      graft.ops.Ann.tokenMeanCol(col("vecs"), dim))
    val model = graft.ops.Ann.buildIvf(withMean, "label", "mv_mean")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_s30_dir").toString
    // graduated root from the even half: the same columns
    // ingestMaxsim lands (id, vecs, mean) + the cell partition
    graft.ops.Ann.writePartitioned(
      graft.ops.Ann.assign(
        withMean.filter(col("vec_id") % 2 === 0)
          .select(col("vec_id"), col("vecs"), col("mv_mean")),
        "mv_mean", model, graft.ops.Ann.Cosine), dir)
    graft.ops.Ann.ensureIvfModelMarker(s, dir, model)
    val rows = docs.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), col("vecs"))
      .as[(Long, Seq[Seq[Double]])].collect().toSeq.sortBy(_._1)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_s30_ckpt").toString
    val input = MemoryStream[(Long, Seq[Seq[Double]])]
    val q = graft.streaming.Stream.ingestMaxsimAppend(
      input.toDF().toDF("vec_id", "vecs"), "vec_id", "vecs", dim,
      model, dir, ckpt)
    try {
      val batches = 3
      (0 until batches).foreach { b =>
        input.addData(rows.slice(b * rows.length / batches,
          (b + 1) * rows.length / batches): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // redelivery appends ZERO (id-keyed replay safety)
    val dup = graft.ops.Ann.appendMaxsimIdempotent(s, dir, model,
      rows.take(rows.length / 3).toDF("vec_id", "vecs"), "vec_id",
      "vecs", dim)
    require(dup == 0L,
      s"s30: replayed batch appended $dup rows — append not replay-safe")
    val stored = s.read.parquet(dir)
    require(stored.count() == docs.count(),
      "s30: grown root does not hold the full corpus")
    val cand = graft.ops.Ann.maxsimCandidatesIvf(stored, "vec_id",
      "mv_mean", model, qts, n = 20, probes = 3)
    stored.join(cand, Seq("vec_id"), "left_semi")
      .withColumn("score", round(org.apache.spark.sql.graft.VecExprs
        .maxSimDot(typedlit(qts), col("vecs")), 6))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(10)
      .select("vec_id", "score")
  }

  /** s33: threshold-triggered OVERFULL-CELL SPLIT on the streamed
    * DENSE-root maintenance path — s29's recipe on the FOURTH and
    * last cell-partitioned family (VERDICT r16 #1: the plain layout
    * `ingestIvfAppend` grows had no actuator, and COULD not have one
    * — its geometry lived in the caller's hands; the self-contained
    * dense root owns its centroids, so
    * [[graft.streaming.Stream.ingestDenseRootAppend]]'s `splitMaxRows`
    * can retrain and re-pin without stranding anyone's model). The
    * even half lands as a [[graft.ops.Ann.writeDenseRoot]] root, the
    * odd half streams in with the observed-occupancy threshold, and
    * the final search at all-probe answers r01's index-free exact
    * top-k VERBATIM across batch AND split boundaries. Pins: policy
    * fired (cells grew past the trained count), a replayed batch
    * appends ZERO through the DEFAULT probe (the split-history marker
    * forces the sound whole-layout form — the round-17 ADVICE
    * closure, pinned here on a live lifecycle), and every stored row
    * sits at its true argmin after the dissolve. */
  def streamDenseSplit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sc = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val e = Tables.embeddings(s, d)
    val model = graft.ops.Ann.buildIvf(e, "label", "embedding")
    val lists = model.centroids.count()
    val root = java.nio.file.Files
      .createTempDirectory("graft_s33_root").toString
    val base = e.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"),
        col("label"))
    graft.ops.Ann.writeDenseRoot(
      graft.ops.Ann.assign(base, "embedding", model, graft.ops.Ann.L2),
      "embedding", model, graft.ops.Ann.L2, root)
    val rows = e.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), col("embedding").cast("array<double>"),
        col("label"))
      .as[(Long, Seq[Double], Int)].collect().toSeq.sortBy(_._1)
    // SF-relative threshold from the observed occupancy (the s29
    // recipe): one below the full-corpus max cell, so exactly the
    // hottest cell(s) trip it by stream end
    val maxOcc = graft.ops.Ann
      .assign(e, "embedding", model, graft.ops.Ann.L2)
      .groupBy(col("centroid_id")).count()
      .agg(max(col("count"))).head().getLong(0)
    val maxRows = math.max(1L, maxOcc - 1)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_s33_ckpt").toString
    val input = MemoryStream[(Long, Seq[Double], Int)]
    val q = graft.streaming.Stream.ingestDenseRootAppend(
      input.toDF().toDF("vec_id", "embedding", "label"), "vec_id",
      root, ckpt, splitMaxRows = Some(maxRows))
    try {
      val batches = 2 // no-fire batch, then the firing one
      (0 until batches).foreach { b =>
        input.addData(rows.slice(b * rows.length / batches,
          (b + 1) * rows.length / batches): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // pin 1: the policy FIRED — more cells than the trained model
    val cellsNow = s.read.parquet(s"$root/centroids").count()
    require(cellsNow > lists,
      s"s33: split policy never fired — $cellsNow cells, trained $lists")
    // pin 2: redelivery appends ZERO through the DEFAULT probe — the
    // split-history marker must force the sound whole-layout form
    // without the caller opting in (an out-of-band split between a
    // batch and its redelivery gets no opt-in)
    val dup = graft.ops.Ann.appendDenseRootIdempotent(s, root,
      rows.take(rows.length / 2).toDF("vec_id", "embedding", "label"),
      "vec_id")
    require(dup == 0L,
      s"s33: replayed batch appended $dup rows post-split")
    // pin 3: row conservation — the split re-partitions, never adds
    // or drops (NOT an every-row-at-argmin pin: a sub-centroid
    // legitimately steals NEIGHBORING cells' boundary rows' argmin
    // without moving them — the standard IVF staleness every probed
    // search absorbs and the sound replay probe exists for; only the
    // dissolved parent's own rows are guaranteed re-homed)
    val total = s.read.parquet(s"$root/rows").count()
    require(total == e.count(),
      s"s33: split lost or duplicated rows — $total of ${e.count()}")
    // all-probe: splits are invisible — r01's exact oracle verbatim
    graft.ops.Ann.searchDenseStoredSelf(s, root, "vec_id",
        typedlit(qvecSeqOf(s, d, 0)), probes = cellsNow.toInt, k = 10)
      .select("vec_id", "dist")
  }

  /** s34: threshold-triggered OVERFULL-CELL SPLIT on the streamed
    * MAXSIM (multivec) maintenance path — the graduated maxsim
    * layout IS a dense root over the persisted token-mean (Cosine by
    * construction), so
    * [[graft.streaming.Stream.ingestMaxsimRootAppend]] rides the
    * dense seat and inherits its whole actuator story: the even half
    * lands as a cosine [[graft.ops.Ann.writeDenseRoot]] over
    * (vec_id, vecs, mv_mean), the odd half streams in (the mean
    * computed per batch by the ONE shared transform), the hottest
    * mean-cell splits ON THE UNIT SPHERE, and the final search is
    * the EXACT maxsim top-10 (phase-1 keep-N covers the corpus at
    * all-probe, so cell homes are invisible) — an index-free
    * sum-of-max oracle in plain SQL. Pins: policy fired, replayed
    * batch appends zero through the maxsim delegation. */
  def streamMaxsimSplit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    implicit val sc = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val e = Tables.embeddings(s, d)
    val dim = e.select(size(col("embedding"))).head.getInt(0)
    val qts: Seq[Seq[Double]] = e.filter(col("vec_id").isin(0, 1))
      .orderBy("vec_id").select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toSeq).toSeq
    val docs = e.select(col("vec_id"),
      array(col("embedding").cast("array<double>"),
        reverse(col("embedding")).cast("array<double>")).as("vecs"))
    val withMean = docs.withColumn("mv_mean",
      graft.ops.Ann.tokenMeanCol(col("vecs"), dim))
    val model = graft.ops.Ann.buildIvf(
      withMean.join(e.select(col("vec_id"), col("label")), "vec_id"),
      "label", "mv_mean")
    val lists = model.centroids.count()
    val root = java.nio.file.Files
      .createTempDirectory("graft_s34_root").toString
    graft.ops.Ann.writeDenseRoot(
      graft.ops.Ann.assign(
        withMean.filter(col("vec_id") % 2 === 0),
        "mv_mean", model, graft.ops.Ann.Cosine),
      "mv_mean", model, graft.ops.Ann.Cosine, root)
    val rows = docs.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), col("vecs"))
      .as[(Long, Seq[Seq[Double]])].collect().toSeq.sortBy(_._1)
    val maxOcc = graft.ops.Ann
      .assign(withMean, "mv_mean", model, graft.ops.Ann.Cosine)
      .groupBy(col("centroid_id")).count()
      .agg(max(col("count"))).head().getLong(0)
    val maxRows = math.max(1L, maxOcc - 1)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_s34_ckpt").toString
    val input = MemoryStream[(Long, Seq[Seq[Double]])]
    val q = graft.streaming.Stream.ingestMaxsimRootAppend(
      input.toDF().toDF("vec_id", "vecs"), "vec_id", "vecs", dim,
      root, ckpt, splitMaxRows = Some(maxRows))
    try {
      val batches = 2 // no-fire batch, then the firing one
      (0 until batches).foreach { b =>
        input.addData(rows.slice(b * rows.length / batches,
          (b + 1) * rows.length / batches): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val cellsNow = s.read.parquet(s"$root/centroids").count()
    require(cellsNow > lists,
      s"s34: split policy never fired — $cellsNow cells, trained $lists")
    val dup = graft.ops.Ann.appendMaxsimRootIdempotent(s, root,
      rows.take(rows.length / 2).toDF("vec_id", "vecs"), "vec_id",
      "vecs", dim)
    require(dup == 0L,
      s"s34: replayed batch appended $dup rows post-split")
    val stored = s.read.parquet(s"$root/rows")
    val total = stored.count()
    // all-probe + corpus-covering keep-N ⇒ phase 1 admits everything
    // and the exact sum-of-max re-rank IS the oracle's scan
    val cand = graft.ops.Ann.maxsimCandidatesIvf(stored, "vec_id",
      "mv_mean",
      graft.ops.Ann.loadDenseRoot(s, root)._1, qts,
      n = total.toInt, probes = cellsNow.toInt)
    stored.join(cand, Seq("vec_id"), "left_semi")
      .withColumn("score", round(org.apache.spark.sql.graft.VecExprs
        .maxSimDot(typedlit(qts), col("vecs")), 6))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(10)
      .select("vec_id", "score")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s33_stream_dense_split" -> streamDenseSplit,
    "s34_stream_maxsim_split" -> streamMaxsimSplit,
    "s32_stream_quantized_split" -> streamQuantizedSplit,
    "s31_stream_mrl_ivf_split" -> streamMrlIvfSplit,
    "s30_stream_maxsim_append" -> streamMaxsimAppend,
    "s29_stream_range_split" -> streamRangeSplit,
    "s27_stream_bitq_append" -> streamBitqAppend,
    "s25_stream_pq_append" -> streamPqAppend,
    "s26_stream_sq_append" -> streamSqAppend,
    "s28_stream_fresh_policy" -> streamFreshPolicy,
    "s24_stream_ivf_append" -> streamIvfAppend,
    "s22_stream_bm25_append" -> streamBm25Append,
    "s23_stream_sparse_append" -> streamSparseAppend,
    "s21_stream_mrl_ivf_append" -> streamMatryoshkaIvfAppend,
    "s20_stream_matryoshka_ivf" -> streamMatryoshkaIvf,
    "s19_stream_range_append" -> streamRangeAppend,
    "s18_stream_matryoshka_twin" -> streamMatryoshkaTwin,
    "s15_stream_range_twin" -> streamRangeTwin,
    "s14_stream_bitq_twin" -> streamBitqTwin,
    "s13_stream_sq_twin" -> streamSqTwin,
    "s01_event_window_agg" -> windowAgg,
    "s02_user_sessions" -> userSessions,
    "s03_props_json" -> propsJson,
    "s04_asof_purchase" -> asofPurchase,
    "s05_range_clicks" -> rangeClicks,
    "s06_stream_interval_twin" -> streamIntervalTwin,
    "s07_stream_compact_twin" -> streamCompactTwin,
    "s08_stream_ivf_twin" -> streamIvfTwin,
    "s09_stream_dedup_twin" -> streamDedupTwin,
    "s10_stream_sparse_twin" -> streamSparseTwin,
    "s11_stream_maxsim_twin" -> streamMaxsimTwin,
    "s12_stream_pq_twin" -> streamPqTwin)

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
         FROM events GROUP BY 1 ORDER BY 1""",
    "s04_asof_purchase" ->
      """WITH v AS (SELECT user_id, ts
           FROM events WHERE event_type = 'view'),
          p AS (SELECT user_id, ts, sum(value) AS val
                FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
          j AS (SELECT v.user_id, p.val
                FROM v ASOF LEFT JOIN p
                ON v.user_id = p.user_id AND v.ts >= p.ts)
         SELECT user_id, count(*) AS n_views,
           count(val) AS n_matched,
           round(CAST(sum(CAST(val AS DECIMAL(38,6))) AS DOUBLE), 6)
             AS matched_total
         FROM j GROUP BY 1 ORDER BY 1""",
    "s05_range_clicks" ->
      """WITH e AS (SELECT user_id, ts, event_id
           FROM events WHERE event_type = 'error'),
          c AS (SELECT user_id, ts, value
                FROM events WHERE event_type = 'click'),
          j AS (SELECT e.user_id, e.event_id, c.value
                FROM e JOIN c ON e.user_id = c.user_id
                AND c.ts >= e.ts - INTERVAL 6 HOUR AND c.ts < e.ts)
         SELECT user_id, count(DISTINCT event_id) AS n_errors_with_click,
           count(*) AS n_pairs,
           round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6)
             AS click_total
         FROM j GROUP BY 1 ORDER BY 1""",
    // the streaming operator's batch twin shares s05's pair contract
    "s06_stream_interval_twin" ->
      """WITH e AS (SELECT user_id, ts, event_id
           FROM events WHERE event_type = 'error'),
          c AS (SELECT user_id, ts, value
                FROM events WHERE event_type = 'click'),
          j AS (SELECT e.user_id, e.event_id, c.value
                FROM e JOIN c ON e.user_id = c.user_id
                AND c.ts >= e.ts - INTERVAL 6 HOUR AND c.ts < e.ts)
         SELECT user_id, count(DISTINCT event_id) AS n_errors_with_click,
           count(*) AS n_pairs,
           round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6)
             AS click_total
         FROM j GROUP BY 1 ORDER BY 1""",
    // s07: the streamed-then-compacted layout is lossless, so the
    // replay is the r05 BM25 shape with this query's terms — scores
    // must be indistinguishable from a batch build over the same text.
    "s07_stream_compact_twin" ->
      s"""WITH ${Retrieval.bm25Cte(Seq("scan", "stream", "vector"))}
          SELECT id, round(sum(w), 6) AS score FROM scored GROUP BY id
          ORDER BY score DESC, id ASC LIMIT 10""",
    // s08: the streamed-then-compacted IVF layout is lossless, so the
    // replay is the r25/r09 IVF shape — label-mean centroids (round 5),
    // L2 argmin assignment (ties centroid_id asc), 3 probed cells by
    // distance to the query, exact top-10 within.
    "s08_stream_ivf_twin" ->
      """WITH dims AS (
            SELECT CAST(label AS BIGINT) AS centroid_id, pos,
                   round(avg(CAST(x AS DOUBLE)), 5) AS c
            FROM (SELECT label, unnest(embedding) AS x,
                         unnest(range(len(embedding))) AS pos
                  FROM embeddings)
            GROUP BY 1, 2),
          cents AS (
            SELECT centroid_id, list(c ORDER BY pos) AS centroid
            FROM dims GROUP BY 1),
          qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings
                 WHERE vec_id = 9),
          assigned AS (
            SELECT vec_id, embedding, centroid_id FROM (
              SELECT e.vec_id, e.embedding, c.centroid_id,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY list_distance(e.embedding::DOUBLE[],
                                              c.centroid) ASC,
                                c.centroid_id ASC) AS rn
              FROM embeddings e CROSS JOIN cents c) WHERE rn = 1),
          probes AS (
            SELECT centroid_id FROM cents
            ORDER BY list_distance(centroid, (SELECT v FROM qv)) ASC,
                     centroid_id ASC
            LIMIT 3)
          SELECT a.vec_id,
                 round(list_distance(a.embedding::DOUBLE[],
                                     (SELECT v FROM qv)), 6) AS dist
          FROM assigned a JOIN probes USING (centroid_id)
          ORDER BY dist ASC, vec_id ASC LIMIT 10""",
    // s09: kept = every batch-1 row (all content row-unique) + the
    // odd-source-id batch-2 rows (fresh content); even-source-id
    // batch-2 rows repeat batch-1 content exactly and are dropped.
    "s09_stream_dedup_twin" ->
      """SELECT doc_id FROM documents
         UNION ALL
         SELECT doc_id + 10000000 AS doc_id FROM documents
         WHERE doc_id % 2 = 1
         ORDER BY doc_id""",
    // s10: the streamed-then-compacted sparse layout is lossless —
    // the replay is the shared sparse oracle (same recipe as
    // r27/r29/r30/r31 in Retrieval)
    "s10_stream_sparse_twin" -> Retrieval.sparseOracle,
    // s11: the streamed-then-compacted multivec layout is lossless —
    // the replay is r26's first-principles maxsim-IVF oracle verbatim
    // (persisted means, label-mean centroids, cosine assignment +
    // probes, phase-1 within probed cells, exact maxsim re-rank)
    "s11_stream_maxsim_twin" -> Retrieval.oracles("r26_maxsim_ivf"),
    // s30: grown equals built — the appended multivec root answers
    // the same first-principles maxsim-IVF oracle as s11/r26.
    "s30_stream_maxsim_append" -> Retrieval.oracles("r26_maxsim_ivf"),
    // s14: the streamed-then-compacted 1-bit layout must be
    // byte-identical to the batch index; r14's oracle is shared.
    "s14_stream_bitq_twin" -> Retrieval.oracles("r14_ivf_bitq_topk"),
    // s18: the streamed-then-graduated matryoshka layout is lossless
    // — r70/r71's shared two-phase oracle lands verbatim.
    "s18_stream_matryoshka_twin" -> Retrieval.oracles("r70_matryoshka_topk"),
    // s15: the streamed range root must reproduce the batch-built
    // r56 exactly — radii pruning is invisible to results by
    // contract, so the shared oracle is the plain threshold scan.
    "s15_stream_range_twin" -> Retrieval.oracles("r56_range_ivf_stored"),
    // s19: half batch-built + half streamed-appended = the full
    // corpus, and sound radii make the pruning invisible — the same
    // r56 threshold scan lands verbatim on the grown root.
    "s19_stream_range_append" -> Retrieval.oracles("r56_range_ivf_stored"),
    // s32: the streamed compact+split cadence is invisible at
    // all-probe with covering refine — SQ codes stay bit-identical
    // across splits (inherited bounds), so r95's plain exact oracle
    // lands verbatim on the fully-streamed root.
    "s32_stream_quantized_split" ->
      Retrieval.oracles("r95_quantized_cell_split"),
    // s31: composed split boundaries are invisible at all-probe — the
    // grown, split north-star root equals the flat prefix cut (r70's
    // index-free oracle), regardless of which cells split.
    "s31_stream_mrl_ivf_split" -> Retrieval.oracles("r70_matryoshka_topk"),
    // s29: split boundaries are invisible to results — the grown,
    // policy-split root answers the same index-free range oracle.
    "s29_stream_range_split" -> Retrieval.oracles("r56_range_ivf_stored"),
    // s33: dense split boundaries are invisible at all-probe — the
    // grown, policy-split dense root answers r01's exact top-k.
    "s33_stream_dense_split" -> Retrieval.oracles("r01_ann_topk_l2"),
    // s34: the maxsim root's truth is the index-free EXACT sum-of-max
    // scan (all-probe + corpus-covering phase-1 keep-N make the
    // operator's exact re-rank the plain maxsim over every doc bag).
    "s34_stream_maxsim_split" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
                    FROM embeddings),
          d AS (SELECT vec_id, [emb, list_reverse(emb)] AS vecs FROM e),
          q AS (SELECT vec_id AS qi, emb AS qt FROM e
                WHERE vec_id IN (0, 1)),
          dt AS (SELECT vec_id, unnest(vecs) AS dtok FROM d),
          best AS (SELECT dt.vec_id, q.qi,
                          max(list_inner_product(q.qt, dt.dtok)) AS m
                   FROM dt CROSS JOIN q GROUP BY 1, 2),
          sc AS (SELECT vec_id, round(sum(m), 6) AS score
                 FROM best GROUP BY 1)
          SELECT vec_id, score FROM sc
          ORDER BY score DESC, vec_id ASC LIMIT 10""",
    // the fresh-rows maintenance gates land on the one-shot
    // full-corpus builds' oracles verbatim: frozen full-corpus
    // codebooks/bounds + encode-on-read == the rebuilt layout
    "s25_stream_pq_append" -> Retrieval.oracles("r38_ivf_pq"),
    "s26_stream_sq_append" -> Retrieval.oracles("r12_ivf_sq_topk"),
    // s28: the policy's trigger points are invisible to results — the
    // fully-graduated root answers the same full-corpus replay.
    "s28_stream_fresh_policy" -> Retrieval.oracles("r12_ivf_sq_topk"),
    "s27_stream_bitq_append" -> Retrieval.oracles("r14_ivf_bitq_topk"),
    // s20: the streamed-then-graduated composed layout is lossless —
    // r78's composed replay lands verbatim.
    "s20_stream_matryoshka_ivf" -> Retrieval.oracles("r78_matryoshka_ivf"),
    // s21: half batch-built + half streamed-appended under the
    // full-corpus model = indistinguishable from a day-one build —
    // r78's replay verbatim on the grown root.
    "s21_stream_mrl_ivf_append" -> Retrieval.oracles("r78_matryoshka_ivf"),
    // s22: BM25 stats re-derive from the full posting set at load, so
    // the grown layout is indistinguishable from a one-shot build —
    // r23's oracle verbatim.
    "s22_stream_bm25_append" -> Retrieval.oracles("r23_bm25_stored"),
    // s23: a pure dot has no corpus stats at all — growth is trivially
    // invisible; r30's oracle verbatim.
    "s23_stream_sparse_append" -> Retrieval.oracles("r30_sparse_stored"),
    // s24: the grown cell layout under the full-corpus model is
    // indistinguishable from a one-shot build — r09's probe replay.
    "s24_stream_ivf_append" -> Retrieval.oracles("r09_ann_rewrite_stored"),
    // s13: the streamed-then-compacted SQ layout must be byte-identical
    // to the batch index, so r12's first-principles oracle is shared.
    "s13_stream_sq_twin" -> Retrieval.oracles("r12_ivf_sq_topk"),
    // s12: the streamed-then-compacted PQ layout must be byte-identical
    // to the batch index — r38's first-principles replay verbatim.
    "s12_stream_pq_twin" -> Retrieval.oracles("r38_ivf_pq"))
}
