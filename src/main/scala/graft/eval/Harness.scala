package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Ann, Bm25, Fusion}
import graft.text.{HashEmbedder, LocalAugmenter}

/** Pass@K + QPS strategy-matrix harness — the network-free twin of the
  * reference's contextual-embeddings evaluation
  * (/root/reference/examples/anthropic.py:205-253): each strategy in
  * {vector, keyword, hybrid-RRF, hybrid-dedup} × {plain, contextual}
  * retrieves top-k for synthetic queries whose golden chunk is known by
  * construction; Pass@K = share of queries whose golden chunk is in the
  * top k (Metrics.passAt with one truth id), QPS = queries / wall time.
  *
  * Deterministic seats: [[HashEmbedder]] replaces the embedding API,
  * [[LocalAugmenter]] replaces the LLM context generator, the synthetic
  * query for a chunk is its rarest-term slice (an engine-free stand-in
  * for `GeminiEvaluator.produce_query`, evaluate.py:93-119).
  */
object Harness {

  final case class StrategyResult(strategy: String, contextual: Boolean,
                                  passAt5: Double, passAt10: Double,
                                  qps: Double)

  /** Synthetic query for a doc: its 5 rarest distinct tokens by corpus
    * document frequency (ties by token). Rare terms discriminate, so the
    * golden chunk is retrievable by construction — the deterministic
    * stand-in for LLM query synthesis. */
  def syntheticQuery(text: String, df: Map[String, Long]): String =
    graft.functions.Tokenizers.Simple.scala(text)
      .distinct.sortBy(t => (df.getOrElse(t, 0L), t)).take(5).mkString(" ")

  /** Synthetic query per source doc — the SHARED synthesis both the
    * strategy matrix ([[run]]) and the oracle gate
    * ([[passAtKeywordBatch]]) use, so the printed and the gated paths
    * can never silently diverge: corpus document frequency (collected
    * once; query corpora are sampled subsets — at raw-corpus scale this
    * would stay distributed), then the first `nQueries` ids with their
    * rarest-term queries, golden chunk = source id. */
  private def syntheticQueries(spark: SparkSession, base: DataFrame,
                               nQueries: Int): Seq[(Long, String)] = {
    import spark.implicits._
    val dfMap: Map[String, Long] = base
      .select(explode(array_distinct(Bm25.tokenize(col("text"))))
        .as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .as[(String, Long)].collect().toMap
    base.orderBy("id").limit(nQueries).as[(Long, String)]
      .collect().map { case (id, t) => (id, syntheticQuery(t, dfMap)) }
      .toSeq
  }

  /** Run the matrix over `docs` (idCol, textCol), sampling `nQueries`
    * docs as query sources. Returns one row per strategy. */
  def run(spark: SparkSession, docs: DataFrame, idCol: String,
          textCol: String, nQueries: Int = 50, dim: Int = 64,
          topk: Int = 10): Seq[StrategyResult] = {
    import spark.implicits._
    val emb = HashEmbedder(dim)
    val aug = LocalAugmenter()

    val base = docs.select(col(idCol).cast("long").as("id"),
      col(textCol).as("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .persist()
    val contextual = base.as[(Long, String)]
      .map { case (id, t) => (id, aug.augmentContext(t, t) + "\n" + t) }
      .toDF("id", "text")
      .persist()

    // query set: the first nQueries ids, with golden chunk = source id
    val qRows: Seq[(Long, String)] = syntheticQueries(spark, base, nQueries)

    def embedded(corpus: DataFrame): DataFrame =
      graft.text.Embed.withEmbedding(corpus, "text", "vec", emb).persist()

    val variants: Seq[(Boolean, DataFrame)] =
      Seq(false -> base, true -> contextual)

    // the strategy matrix rides the BATCH operators (the r14 verdict:
    // c13/c14-shaped jobs, never a per-query driver loop — one
    // distributed job per strategy, per-query ranks from the
    // operators' own qid windows; ranks are identical to the old
    // Fusion.ranked single-query path by the shared (dist, id) /
    // (score desc, id) tie rules)
    val qsText = qRows.toDF("qid", "qtext")

    variants.flatMap { case (ctx, corpus) =>
      val vecs = embedded(corpus)
      val bm = Bm25.build(corpus, "id", "text")

      // query embedding happens INSIDE the strategy timer (it's part
      // of serving a query — the pre-rewrite per-query path embedded
      // inside the timed retrieve, and QPS must stay comparable)
      def vecBatch(k: Int): DataFrame = {
        val qsVec = qRows.map { case (id, q) =>
          (id, emb.embedQuery(q).toSeq.map(_.toDouble)) }
          .toDF("qid", "qv")
        Ann.knnJoin(qsVec, "qid", "qv", vecs, "id", "vec",
          Ann.Cosine, k).select(col("qid"), col("id"), col("rank"))
      }
      def kwBatch(k: Int): DataFrame =
        Bm25.searchBatch(bm, qsText, "qid", "qtext", k)
          .select(col("qid"), col("id"), col("rank"))

      val strategies: Seq[(String, () => DataFrame)] = Seq(
        "vector" -> (() => vecBatch(topk)),
        "keyword" -> (() => kwBatch(topk)),
        "hybrid_rrf" -> (() => Fusion.rrfWeightedBatch(
          Seq(vecBatch(20), kwBatch(20)), Seq(1.0, 1.0), topK = topk)),
        "hybrid_dedup" -> (() => Fusion.dedupUnionBatch(
          Seq(vecBatch(20), kwBatch(20)), topK = topk)))

      strategies.map { case (name, retrieve) =>
        val t0 = System.nanoTime()
        // Pass@K per query from the one result frame: golden doc =
        // the query's own source id (anthropic.py:210-219's count)
        val agg = retrieve().filter(col("id") === col("qid"))
          .agg(
            coalesce(sum(when(col("rank") <= 5, 1).otherwise(0)),
              lit(0)).as("h5"),
            coalesce(sum(when(col("rank") <= 10, 1).otherwise(0)),
              lit(0)).as("h10"))
          .head()
        val secs = (System.nanoTime() - t0) / 1e9
        val n = qRows.length.toDouble
        StrategyResult(name, ctx,
          agg.getLong(0) / n, agg.getLong(1) / n,
          qRows.length / secs)
      }
    }
  }

  /** The ORACLE-facing slice of the strategy matrix (E9,
    * anthropic.py:205-225): Pass@K over the deterministic keyword
    * retriever as ONE batch job. The synthetic rarest-term query of
    * each of the first `nQueries` docs replays through
    * [[Bm25.searchBatch]] (one job, per-qid rank window — never a
    * per-query loop), and each query's golden doc is its own source
    * (Pass@K with a single truth id, the anthropic.py:210-219 count).
    * Returns one row per query: (qid, hit5, hit10), every term of it
    * pure column math a SQL engine can replay — QPS stays [[main]]'s
    * printed measurement (wall time is not oracle-able). */
  def passAtKeywordBatch(spark: SparkSession, docs: DataFrame,
                         idCol: String, textCol: String,
                         nQueries: Int = 50,
                         cacheKey: Option[String] = None): DataFrame = {
    import spark.implicits._
    val base = docs.select(col(idCol).cast("long").as("id"),
      col(textCol).as("text"))
    val queries = syntheticQueries(spark, base, nQueries)
      .toDF("qid", "qtext")
    // a content-versioned cacheKey shares the memoized index (the gate
    // path — repeated bench passes must not rebuild OR leak); without
    // one the index is private, so the bounded result is materialized
    // while its postings are live and the persist released before
    // return (the DataOps.materializedCopy discipline — an anonymous
    // persisted frame must never outlive its query)
    val idx = cacheKey match {
      case Some(k) => Bm25.buildCached(base, "id", "text", k)
      case None => Bm25.build(base, "id", "text")
    }
    val out = Bm25.searchBatch(idx, queries, "qid", "qtext", k = 10)
      .groupBy("qid")
      .agg(
        max(when(col("id") === col("qid") && col("rank") <= 5, 1)
          .otherwise(0)).as("hit5"),
        max(when(col("id") === col("qid") && col("rank") <= 10, 1)
          .otherwise(0)).as("hit10"))
      .orderBy("qid")
    cacheKey match {
      case Some(_) => out
      case None =>
        try {
          val rows = out.collect().toIndexedSeq // bounded by nQueries
          spark.createDataFrame(
            spark.sparkContext.parallelize(rows, numSlices = 1), out.schema)
        } finally idx.postings.unpersist(false)
    }
  }

  /** Standalone main: SPARK_GRAFT_SF_DIR corpus, prints one line per
    * strategy (the anthropic.py:223-225 printout shape). */
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    run(spark, docs, "doc_id", "text").foreach { r =>
      println(f"${r.strategy}%-13s ctx=${r.contextual}%-5s " +
        f"Pass@5=${r.passAt5}%.3f Pass@10=${r.passAt10}%.3f " +
        f"QPS=${r.qps}%.1f")
    }
    spark.stop()
  }
}
