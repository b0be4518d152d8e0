package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking fusion + hybrid set composition.
  *
  * Ports the reference's ReciprocalRankFusion (/root/reference/vechord/
  * rerank.py:95-113, k=60) and its order-preserving union+dedup hybrid
  * (model/web.py:87-93, examples/hybrid.py:48-57), replacing the Python
  * enumerate/loop rank bookkeeping with window functions — the
  * distributed-safe form of "position in list".
  */
object Fusion {

  val RrfK = 60

  /** Attach 1-based ranks to a scored list. `asc=false` ranks best-first
    * for similarity scores; ties broken by id asc for determinism.
    *
    * SCALE CONTRACT: the input must already be a bounded top-k list
    * (every call site ranks the `.limit(k)` output of a search op), so
    * the unpartitioned window touches O(k) rows on one core by design.
    * Ranking an unbounded frame belongs in the producing search operator
    * (partitioned by query) — `maxRows` trips loudly if the contract is
    * violated rather than letting a full table serialize through one
    * partition. */
  def ranked(df: DataFrame, idCol: String, scoreCol: String,
             asc: Boolean, maxRows: Int = 100000): DataFrame = {
    val ord = if (asc) col(scoreCol).asc else col(scoreCol).desc
    // rank by construction instead of a global window: pin the ≤k rows
    // to one partition, sort within it, number by in-partition row order
    // (monotonically_increasing_id is 0..n-1 on partition 0) — same
    // single-core O(k) work the contract already mandates, without a
    // WindowExec-moves-everything warning muddying real scale signals
    df.coalesce(1).sortWithinPartitions(ord, col(idCol).asc)
      .withColumn("rank",
        (monotonically_increasing_id() + 1).cast("int"))
      .withColumn("rank",
        when(col("rank") > maxRows, raise_error(
          lit(s"Fusion.ranked input exceeds $maxRows rows — " +
            "rank inside the search op instead")))
          .otherwise(col("rank")))
      .select(col(idCol).as("id"), col("rank"))
  }

  /** RRF: score(id) = Σ_lists 1/(k + rank_list(id)); input frames must
    * have columns (id, rank). Missing ids contribute nothing (same as the
    * reference: absent from a list = no term). The reference hardcodes
    * k=60 (rerank.py:95-113); `k` is exposed so the hybrid family can
    * sweep it the way e17 sweeps probes. */
  def rrf(lists: Seq[DataFrame], k: Int = RrfK, topK: Int = 10,
          roundTo: Int = 6): DataFrame =
    rrfWeighted(lists, Seq.fill(lists.length)(1.0), k, topK, roundTo)

  /** WEIGHTED RRF: score(id) = Σ_i w_i / (k + rank_i(id)) — the
    * modality-bias knob the plain form lacks (dense-heavy vs
    * keyword-heavy hybrids without re-ranking). `weights(i)` scales
    * `lists(i)`; weight 1.0 on every list is exactly [[rrf]] (the
    * 1.0·x multiply is an FP no-op, so the two forms share one oracle
    * at equal weights). Per-id groups hold ≤|lists| terms and FP
    * addition over ≤2 terms is order-independent, so the score is
    * deterministic for the canonical two-list hybrid. */
  def rrfWeighted(lists: Seq[DataFrame], weights: Seq[Double],
                  k: Int = RrfK, topK: Int = 10,
                  roundTo: Int = 6): DataFrame = {
    require(weights.length == lists.length,
      s"rrfWeighted: ${lists.length} lists but ${weights.length} weights")
    require(weights.forall(w => w >= 0.0 && !w.isNaN && !w.isInfinity),
      s"rrfWeighted: weights must be finite and >= 0, got $weights")
    val tagged = lists.zip(weights).map { case (l, w) =>
      l.withColumn("__w", lit(w))
    }
    val all = tagged.reduce(_ unionByName _)
    all.groupBy("id")
      .agg(round(sum(col("__w") / (lit(k) + col("rank"))), roundTo)
        .as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("id").asc)
      .limit(topK)
  }

  /** PER-QUERY weighted RRF — [[rrfWeighted]]'s batch form, composing
    * the batch search surfaces (searchBy*Batch all return
    * (qid, id, …, rank)): input frames carry (`qidCol`, id, rank),
    * score(qid, id) = Σ_i w_i / (k + rank_i(qid, id)), ranked per
    * query by ONE window — the hybrid strategy an eval loop runs per
    * question (reference analog: the per-question hybrid matrix of
    * examples/anthropic.py:244-253) as one distributed job, never a
    * per-query driver loop. Missing (qid, id) pairs contribute
    * nothing, exactly like the single-query form. Returns
    * (qidCol, id, rrf_score, rank), rank 1-based per query, ties
    * (score desc, id asc). */
  def rrfWeightedBatch(lists: Seq[DataFrame], weights: Seq[Double],
                       qidCol: String = "qid", k: Int = RrfK,
                       topK: Int = 10, roundTo: Int = 6): DataFrame = {
    require(weights.length == lists.length,
      s"rrfWeightedBatch: ${lists.length} lists but " +
        s"${weights.length} weights")
    require(weights.forall(w => w >= 0.0 && !w.isNaN && !w.isInfinity),
      s"rrfWeightedBatch: weights must be finite and >= 0, got $weights")
    val tagged = lists.zip(weights).map { case (l, w) =>
      l.select(col(qidCol), col("id"), col("rank"))
        .withColumn("__w", lit(w))
    }
    val all = tagged.reduce(_ unionByName _)
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("rrf_score").desc, col("id").asc)
    all.groupBy(col(qidCol), col("id"))
      .agg(round(sum(col("__w") / (lit(k) + col("rank"))), roundTo)
        .as("rrf_score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col(qidCol), col("id"), col("rrf_score"), col("rank"))
  }

  /** PER-QUERY order-preserving union + first-occurrence dedup —
    * [[dedupUnion]]'s batch form: within each query id, concatenate
    * the ranked lists in priority order, keep each doc's first
    * appearance, rank by the concatenated (src, rank) position.
    * Returns (qidCol, id, rank), rank 1-based per query. */
  def dedupUnionBatch(lists: Seq[DataFrame], topK: Int,
                      qidCol: String = "qid"): DataFrame = {
    val tagged = lists.zipWithIndex.map { case (l, i) =>
      l.select(col(qidCol), col("id"), col("rank"))
        .withColumn("src", lit(i))
    }
    val all = tagged.reduce(_ unionByName _)
    val occ = Window.partitionBy(col(qidCol), col("id"))
      .orderBy(col("src").asc, col("rank").asc)
    val pos = Window.partitionBy(col(qidCol))
      .orderBy(col("src").asc, col("rank").asc)
    all.withColumn("occ", row_number().over(occ))
      .filter(col("occ") === 1)
      .withColumn("__pos", row_number().over(pos))
      .filter(col("__pos") <= topK)
      .select(col(qidCol), col("id"), col("__pos").as("rank"))
  }

  /** Order-preserving union + first-occurrence dedup: concatenate ranked
    * lists in priority order and keep each id's first appearance,
    * preserving the concatenated order. DataFrames are unordered, so the
    * "position" is the explicit (src, rank) pair (SURVEY.md §7.3). */
  def dedupUnion(lists: Seq[DataFrame], topK: Int): DataFrame = {
    val tagged = lists.zipWithIndex.map { case (l, i) =>
      l.withColumn("src", lit(i))
    }
    val all = tagged.reduce(_ unionByName _)
    val w = Window.partitionBy("id").orderBy(col("src").asc,
      col("rank").asc)
    all.withColumn("occ", row_number().over(w))
      .filter(col("occ") === 1)
      .drop("occ")
      .orderBy(col("src").asc, col("rank").asc)
      .limit(topK)
  }
}
