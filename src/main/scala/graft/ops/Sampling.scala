package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus splitting — the train/val/test assignment a
  * training-data pipeline needs to be REPRODUCIBLE and engine-portable:
  * the split of a row depends only on its id (never on partitioning,
  * sampling order, or a session seed), so re-running the pipeline — or
  * recomputing the assignment in another engine — lands every document
  * in the same split. (The reference has no splitting surface; this is
  * a north-star extension like ops/Dedup.)
  *
  * Map-only: no shuffle, no state; at 100 TB it fuses into the scan.
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from the row id: the first 16 bits
    * of md5(id-as-string), mod buckets. md5 (not xxhash64) so any
    * engine reproduces the assignment bit-for-bit; the 16-bit source
    * gives a ≤0.06% modulo bias at buckets=100 — negligible for split
    * sizing and irrelevant to determinism. */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    (conv(substring(md5(id.cast("string")), 1, 4), 16, 10)
      .cast("int") % buckets).as("bucket")

  /** Add a `split` column from (name, weight) fractions, e.g.
    * Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)). Weights are
    * normalized; boundaries are cumulative-weight thresholds over the
    * [[hashBucket]] value, so splits are disjoint, exhaustive, and
    * stable under re-runs and corpus growth (a document's split never
    * changes when other documents are added). */
  def withSplit(df: DataFrame, idCol: String,
                weights: Seq[(String, Double)],
                buckets: Int = 100): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive")
    val total = weights.map(_._2).sum
    val bounds = weights.scanLeft(0.0) { case (acc, (_, w)) =>
      acc + w / total }.tail // cumulative upper fractions
    val b = hashBucket(col(idCol), buckets)
    // when-chain, first split outermost: bucket < ceil(hi·buckets) → name
    val chain = weights.zip(bounds).reverse
      .foldLeft(lit(weights.last._1)) { case (els, ((name, _), hi)) =>
        when(b < math.ceil(hi * buckets - 1e-9).toInt, lit(name))
          .otherwise(els)
      }
    df.withColumn("split", chain)
  }

  /** Deterministic sequence packing — the pretraining batcher's
    * "concatenate docs in order, cut every `budget` tokens" assignment,
    * doc-granular: within a hash shard, docs order by id and land in
    * pack `floor(tokens-before-this-doc / budget)`. Adds `shard`,
    * `pack_id`. Reproducible from (id, token count) alone — no RNG, no
    * partition-order dependence — so any engine re-derives the exact
    * same packs and a grown corpus only appends to the tail of each
    * shard's last pack.
    *
    * Scale shape: one shuffle (hash shard), then a per-shard ordered
    * cumulative sum. Shards bound window-partition size: pick `shards`
    * ≈ corpus_tokens / (desired packs per task × budget); the window
    * state is a single running counter. */
  def packSequences(df: DataFrame, idCol: String, nTokens: Column,
                    budget: Int, shards: Int = 64): DataFrame = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    df.withColumn("shard", hashBucket(col(idCol), shards))
      .withColumn("__n", nTokens.cast("long"))
      .withColumn("pack_id",
        floor(coalesce(sum(col("__n")).over(w), lit(0L)) / budget)
          .cast("long"))
      .drop("__n")
  }

  /** Uniform [0, 1) from the row id: the first 32 bits of
    * md5(id-as-string) over 2³². The division is by a power of two, so
    * the double is EXACT and any engine computing the same 32-bit
    * integer gets the bit-identical unit value — the boundary of a
    * probability comparison can never disagree across engines.
    * ([[hashBucket]]'s 16-bit source is enough for split/stratum
    * fractions; probability sampling needs the finer grid.) */
  def hashUnit(id: Column): Column =
    (conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("double") / 4294967296.0)

  /** Leakage-safe splits — [[withSplit]] with the guarantee that
    * near-duplicate documents NEVER straddle a split boundary: every
    * member of a near-dup component (from [[graft.ops.Dedup
    * .components]]: (id, component) with component = min reachable id)
    * takes the split of its component representative, so a test set
    * can't contain a paraphrase of a training document — the
    * train/test contamination a per-id hash split silently allows.
    * Docs outside any component split by their own id (identical to
    * [[withSplit]], so adopting this is a no-op for the unclustered
    * mass of the corpus). Adds `split_key` (the id actually hashed)
    * and `split`.
    *
    * Scale shape: the components relation is pair-graph-sized (only
    * docs with at least one near-dup edge appear — ≪ corpus), joined
    * id-keyed onto the corpus (AQE broadcasts it when small; a plain
    * shuffle join when not); the split itself stays map-only. */
  def leakageSafeSplit(docs: DataFrame, idCol: String,
                       components: DataFrame,
                       weights: Seq[(String, Double)],
                       buckets: Int = 100): DataFrame =
    withSplit(
      docs.join(components.withColumnRenamed("id", idCol),
          Seq(idCol), "left")
        .withColumn("split_key", coalesce(col("component"), col(idCol))),
      "split_key", weights, buckets)

  /** Gumbel-top-k resampling — draw `n` rows WITHOUT replacement with
    * probability ∝ exp(`logwCol`) (softmax over the corpus), no RNG:
    * the Gumbel-max trick (argmax of logw + Gumbel noise samples the
    * softmax exactly; top-k extends it to without-replacement) with
    * the noise derived from the md5 grid — u = (md5₃₂(seed:id) +
    * 0.5) / 2³² ∈ (0,1) exclusive on an exact power-of-two grid, g =
    * −ln(−ln u). A new seed is a fresh draw; the same seed replays
    * bit-for-bit on any engine. The selection key is rounded before
    * ranking and ties break by id, so the chosen set is exact, not
    * float-marginal. This is DSIR's "resample" step
    * ([[graft.ops.TextAnalysis.dsirWeights]] produces the weights),
    * usable over any per-row log-weight.
    *
    * Scale shape: map-only key computation fused into the scan, then
    * one `TakeOrderedAndProject` top-n — no shuffle beyond the
    * k-sized final merge. Adds `gkey`. */
  def gumbelTopK(df: DataFrame, idCol: String, logwCol: String,
                 n: Int, seed: String, roundTo: Int = 6): DataFrame = {
    require(n > 0, "n must be positive")
    val u = (conv(substring(md5(
        concat_ws(":", lit(seed), col(idCol).cast("string"))), 1, 8),
      16, 10).cast("double") + 0.5) / 4294967296.0
    df.withColumn("gkey",
        round(col(logwCol) - log(-log(u)), roundTo))
      .orderBy(col("gkey").desc, col(idCol).asc)
      .limit(n)
  }

  /** Greedy k-center (farthest-point / Gonzalez) coreset selection
    * over an embedding column — the DIVERSITY sampler next to the
    * quality-weighted ones: pick `k` centers so every point sits
    * close to one of them, the classic select-a-spread-of-the-
    * embedding-space pass (SemDeDup picks WITHIN-cluster
    * representatives; this picks the spread itself). Deterministic
    * and engine-portable: the seed is the MINIMUM id (no RNG), each
    * later round takes the point with the largest min-distance to
    * the selected set (every pairwise L2 rounded to `roundTo` before
    * any comparison — the recipe that lets an external engine replay
    * the argmax), ties by id asc. Returns the full coverage map, one
    * row per input point: (id, center_id, center_round, dist) —
    * nearest center, ties by earlier selection round — which pins
    * the whole selection trajectory, not just the final set.
    *
    * Scale shape: k−1 selection rounds, each ONE map-only distance
    * expression over the corpus (distances to ≤ k literal vectors,
    * no join) feeding a TakeOrdered-1; the final assignment is one
    * broadcast cross join against the k-row center frame plus a
    * per-point window bounded by k. Driver state is exactly the k
    * selected vectors (bounded, documented — the same contract as
    * the PQ codebook collects). At 100 TB: k linear passes, nothing
    * quadratic, nothing shuffled but the k-sized final merge. */
  def kCenterAssign(vecs: DataFrame, idCol: String, vecCol: String,
                    k: Int, roundTo: Int = 6): DataFrame = {
    require(k >= 1, s"kCenterAssign: k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val spark = vecs.sparkSession
    import spark.implicits._
    val base = vecs.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    def dTo(cv: Seq[Double]) = round(org.apache.spark.sql.graft.VecExprs
      .l2Dist(col("v"), typedlit(cv)), roundTo)
    val seed = base.orderBy(col("id").asc).limit(1).head()
    val centers = scala.collection.mutable.ArrayBuffer(
      (1, seed.getLong(0), seed.getSeq[Double](1).toSeq))
    (2 to k).foreach { r =>
      val mind = centers.map(c => dTo(c._3)).reduce(least(_, _))
      val next = base.select(col("id"), col("v"), mind.as("m"))
        .orderBy(col("m").desc, col("id").asc).limit(1).head()
      // max min-distance 0 means the selected set already covers
      // every DISTINCT vector: the argmax would silently re-select a
      // duplicate of an existing center (ties fall to the global min
      // id) and the trajectory would degenerate without an error
      require(next.getDouble(2) > 0.0,
        s"kCenterAssign: k=$k exceeds the corpus's distinct vectors " +
          s"(round $r found max min-distance 0) — every remaining " +
          "point duplicates a selected center")
      centers += ((r, next.getLong(0), next.getSeq[Double](1).toSeq))
    }
    val centDf = centers.toSeq
      .toDF("center_round", "center_id", "cv")
    val w = Window.partitionBy("id")
      .orderBy(col("dist").asc, col("center_round").asc)
    base.crossJoin(broadcast(centDf))
      .select(col("id"), col("center_id"), col("center_round"),
        round(org.apache.spark.sql.graft.VecExprs
          .l2Dist(col("v"), col("cv")), roundTo).as("dist"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1).drop("__rk")
  }

  /** Deterministic score-proportional sampling — the quality-weighted
    * downsampling pass (CCNet-style: keep high-quality docs with
    * higher probability) with NO RNG: a row survives iff
    * [[hashUnit]](id) < `probCol`, where `probCol` is any per-row
    * probability in [0, 1] (a quality score, a per-stratum rate, a
    * length damper). Per-row reproducible and engine-portable like
    * every sampler here: re-running keeps exactly the same rows;
    * growing the corpus never flips a previous decision; p = 1 keeps
    * everything, p = 0 nothing. Map-only — fuses into the scan. */
  def sampleByProb(df: DataFrame, idCol: String,
                   probCol: Column): DataFrame =
    df.filter(hashUnit(col(idCol)) < probCol.cast("double"))

  /** Deterministic epoch shuffle — the pretraining "shuffle the corpus
    * each epoch" pass, reproducible and engine-portable: every doc
    * gets a 60-bit order key md5(seed:id) (a new seed is a new
    * permutation; the same seed replays bit-for-bit on any engine) and
    * a GLOBAL position under (key, id) order, assigned distributed:
    * range-sharded by the key's high bits, ranked within each shard by
    * a streaming window, shard offsets added from one `shards`-row
    * driver collect — never a single-partition global window. Adds
    * `okey` and `pos` (0-based, a permutation of 0..n-1).
    *
    * At 100 TB: one shuffle (the range exchange the total order
    * inherently needs); md5 sharding makes ranges near-uniform, so no
    * shard skew defense is needed. Writers consume it as
    * `repartitionByRange/sortWithin(pos)` → epoch-ordered output
    * files. */
  def epochShuffle(df: DataFrame, idCol: String, seed: String,
                   shards: Int = 64): DataFrame = {
    require(shards > 0, "shards must be positive")
    val okey = conv(substring(md5(
        concat_ws(":", lit(seed), col(idCol).cast("string"))), 1, 15),
      16, 10).cast("long")
    val width = (1L << 60) / shards + 1 // ceil: shard < shards always
    val withKey = df.withColumn("okey", okey)
      .withColumn("__shard", expr(s"okey div ${width}L").cast("int"))
    // shard sizes: bounded driver collect (`shards` rows) → offsets
    val counts = withKey.groupBy("__shard").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((Int.MinValue, 0L)) {
      case ((_, acc), (s, c)) => (s, acc + c) }
      .sliding(2).collect { case Array((_, off), (s, _)) => (s, off) }
      .toArray
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__shard", "__off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__shard"))
      .orderBy(col("okey").asc, col(idCol).asc)
    withKey.join(broadcast(offDf), "__shard")
      .withColumn("pos", col("__off") + row_number().over(w) - 1)
      .drop("__shard", "__off")
  }

  /** Deterministic stratified sampling: keep a row iff its
    * [[hashBucket]] falls below its stratum's fraction of `buckets`.
    * The classic use is rebalancing a corpus by downsampling dominant
    * strata (language, source domain) — per-row reproducible (no RNG,
    * no partition-order dependence: resampling a grown corpus keeps
    * every previously kept row). Strata absent from `fractions` keep
    * everything. Map-only — fuses into the scan at any scale. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       fractions: Map[String, Double],
                       buckets: Int = 100): DataFrame = {
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0),
      "fractions must be in [0, 1]")
    val cut = fractions.foldLeft(lit(buckets): Column) {
      case (els, (stratum, f)) =>
        when(col(strataCol) === stratum,
          lit(math.round(f * buckets).toInt)).otherwise(els)
    }
    df.filter(hashBucket(col(idCol), buckets) < cut)
  }
}
