package graft.queries

import graft.SparkSpecBase
import graft.ops.Dedup

/** In-query persists must not outlive their gate query (VERDICT r10
  * wrong #1): `fingerprintOverlap`'s fpAll and `curationE2e`'s bySplit
  * leaked one cached RDD per bench pass, churning storage memory for
  * every query that ran after them — the likeliest mechanism behind the
  * round-10 record's phantom p07-p09 regressions. The contract checked
  * here: after a gate query that persists internally returns (its result
  * is already materialized in-query), the only persisted blocks left in
  * the session are the ones owned by the explicit memo caches
  * ([[Dedup]] shingle/gate/pair tables, evicted via `clearCaches`). */
class PersistLeakSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("fingerprintOverlap and curationE2e release their in-query " +
      "persists; only memo-cache blocks remain, and clearCaches frees " +
      "those") {
    Dedup.clearCaches()
    val before = persistedIds
    DataOps.fingerprintOverlap(spark, sf).count()
    DataOps.curationE2e(spark, sf).count()
    // memoized shingle tables (exactDedup/containmentPairs inside
    // curationE2e) are allowed to remain — they have an owner and an
    // eviction point; anonymous in-query persists are not
    Dedup.clearCaches()
    val leaked = persistedIds -- before
    assert(leaked.isEmpty,
      s"gate queries leaked persisted RDDs with no owning cache: $leaked")
  }
}
