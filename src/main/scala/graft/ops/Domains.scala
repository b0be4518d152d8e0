package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-space domain discovery for corpus mixing — the DoReMi /
  * D4-style curation step a training-data pipeline runs before
  * sampling: cluster documents by embedding into k "domains", then
  * tabulate each domain against declared metadata so mixing weights
  * can be chosen per (discovered domain × declared stratum) cell.
  * (The reference has no clustering surface — its index build clusters
  * internally, vchordrq spec.py:437-444; this is a north-star
  * extension like ops/Dedup, built on the SAME oracle-replayable
  * trainer: [[Ann.buildIvfKMeans]]'s portable-md5 seed draw + Lloyd
  * iterations, the machinery r42 hash-matched against DuckDB.)
  *
  * Scale shape (100 TB): the trainer is iters× (broadcast-argmin
  * assign — map-only — plus one map-side-combinable vector-mean
  * shuffle of k cells); the final assignment is map-only; the
  * docs↔embeddings join is a shuffle on the primary key (co-partition
  * or bucket both tables by id to make it zero-shuffle); the mix
  * table aggregation reduces to k × |strata| rows with map-side
  * combine. Nothing driver-side except the k centroids.
  */
object Domains {

  /** Cluster `embs(vecId, vecCol)` into k domains and return one row
    * per (domain, stratum): `(domain, <strataCol>, n, avg_weight)` —
    * the mixing table. `weightCol` is the per-doc size/cost measure
    * the mixer balances (tokens, chars, bytes). Deterministic and
    * engine-portable end-to-end: the same corpus yields the same
    * domains, counts and averages in any engine (avg rounded to 4). */
  def domainMixTable(docs: DataFrame, docId: String,
                     embs: DataFrame, vecId: String, vecCol: String,
                     strataCol: String, weightCol: Column,
                     k: Int, iters: Int = 2): DataFrame = {
    val model = Ann.buildIvfKMeans(embs, vecCol, k, Ann.L2, iters)
    val assigned = Ann.assign(embs, vecCol, model, Ann.L2)
      .select(col(vecId).as(docId), col(model.idCol).as("domain"))
    assigned.join(docs, docId)
      .groupBy(col("domain"), col(strataCol))
      .agg(count(lit(1)).as("n"),
        round(avg(weightCol), 4).as("avg_weight"))
  }

  /** Temperature-scaled mixing rates — the multilingual/multi-domain
    * sampling recipe (w_d ∝ n_d^α, α < 1 upweights rare domains, the
    * classic temperature mixture for pretraining): per domain,
    * normalized weight and the per-row acceptance rate that realizes
    * a `budget`-row expected sample (rate = min(1, budget·w/n),
    * capped — an oversubscribed rare domain contributes all its
    * rows). Every float lands under the determinism discipline:
    * n^α rounded to 9 BEFORE the sum, the total and normalized
    * weights rounded to 9, the rate to `roundTo` — so an external
    * engine replays the chain addend-for-addend (the dsir rule).
    * Returns (domain, n, w_norm, rate).
    *
    * Scale shape: one combinable count by domain, a domains-sized
    * (broadcast) frame everywhere after — nothing corpus-sized
    * leaves the first aggregation. */
  def temperatureMix(docs: DataFrame, domainCol: String, alpha: Double,
                     budget: Long, roundTo: Int = 6): DataFrame = {
    require(alpha > 0, s"temperatureMix: alpha must be > 0, got $alpha")
    require(budget > 0, s"temperatureMix: budget must be > 0, got $budget")
    val cnt = docs.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n"))
    val w = cnt.withColumn("__w", round(pow(col("n"), alpha), 9))
    val tot = w.agg(round(sum(col("__w")), 9).as("__t"))
    w.crossJoin(broadcast(tot))
      .withColumn("w_norm", round(col("__w") / col("__t"), 9))
      .withColumn("rate", round(least(lit(1.0),
        lit(budget.toDouble) * col("w_norm") / col("n")), roundTo))
      .select(col("domain"), col("n"), col("w_norm"), col("rate"))
  }

  /** Apply [[temperatureMix]]'s rates with the deterministic unit
    * hash ([[Sampling.hashUnit]]): a row survives iff
    * hash(id) < its domain's rate — reproducible, engine-portable,
    * and growing the corpus never flips a previous decision within a
    * domain whose rate is stable. Map-only after the broadcast of
    * the domains-sized rate table. */
  def temperatureSample(docs: DataFrame, docId: String,
                        domainCol: String, alpha: Double,
                        budget: Long): DataFrame = {
    val rates = temperatureMix(docs, domainCol, alpha, budget)
      .select(col("domain"), col("rate"))
    val joined = docs.join(broadcast(rates),
        docs(domainCol) === rates("domain"))
      .filter(Sampling.hashUnit(col(docId)) < col("rate"))
    // drop the RATES side's key by reference — a name-based drop
    // would also take the caller's own column when domainCol is
    // literally "domain"
    joined.drop(rates("domain"))
  }
}
