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
}
