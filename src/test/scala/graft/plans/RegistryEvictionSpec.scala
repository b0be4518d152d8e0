package graft.plans

import graft.SparkSpecBase
import graft.ops.{Ann, Bm25, Dedup}
import org.apache.spark.sql.functions._

/** The README single-JVM-seams inventory, executable (VERDICT r11 #8):
  * every driver-resident registry — [[AnnIndex]]'s per-family TrieMaps,
  * [[Bm25]]'s index cache, [[Dedup]]'s shingle/gate/pair memo caches,
  * [[graft.queries.GraphQ]]'s graph cache — must drain to exactly its
  * pre-test state after the matching unregister/clear sweep, so the
  * seam inventory cannot silently rot into a long-lived-session leak.
  * Diff discipline throughout (the [[graft.queries.PersistLeakSpec]]
  * pattern): suites share one session, so asserts compare against the
  * state observed before this spec touched anything. */
class RegistryEvictionSpec extends SparkSpecBase {

  test("AnnIndex registrations across all families unregister to empty") {
    val before = AnnIndex.hasAny
    // one registration per family, all thunk-backed (resolvers run at
    // rewrite time, never at registration) under spec-unique names
    AnnIndex.register("ev_dense", () => Seq((0L, Array(0.0))),
      "ev_cell", Ann.L2, 1, owner = "evspec")
    AnnIndex.registerDistributed("ev_dist",
      () => sys.error("never resolved"), "cid", "cent", Ann.L2, 1,
      cellCol = "cid", owner = "evspec")
    AnnIndex.registerQuantized("ev_sq", "id",
      () => sys.error("never resolved"), Ann.L2, 1, 4, owner = "evspec")
    AnnIndex.registerPq("ev_pq", "id",
      () => sys.error("never resolved"), Ann.L2, 1, 4, owner = "evspec")
    AnnIndex.registerMaxsim("ev_mv", "id",
      () => sys.error("never resolved"), 10, None, owner = "evspec")
    locally { // matryoshka needs a real marker root (read at register)
      val dir = java.nio.file.Files
        .createTempDirectory("graft_ev_mrl").toString
      graft.io.Markers.write(spark, dir, "_graft_matryoshka", "dims=2")
      AnnIndex.registerMatryoshka("ev_mrl", "id", dir, owner = "evspec")
    }
    AnnIndex.registerBm25("ev_text", "ev_id",
      () => sys.error("never resolved"), owner = "evspec")
    AnnIndex.registerSparse("ev_idx", "ev_val", "id",
      () => sys.error("never resolved"), owner = "evspec")
    locally {
      val sp = spark
      import sp.implicits._
      val model = Ann.IvfModel(
        Seq((0L, Seq(0.0))).toDF("centroid_id", "centroid"),
        "centroid_id", "centroid")
      AnnIndex.registerRange("ev_range", model,
        Seq((0L, 0.0)).toDF("centroid_id", "radius"), Ann.L2,
        owner = "evspec")
    }
    assert(AnnIndex.hasAny, "registrations must be visible to the rule")
    AnnIndex.unregister("ev_dense")
    AnnIndex.unregisterDistributed("ev_dist")
    AnnIndex.unregisterQuantized("ev_sq")
    AnnIndex.unregisterQuantized("ev_pq")
    AnnIndex.unregisterQuantized("ev_mrl")
    AnnIndex.unregisterMaxsim("ev_mv")
    AnnIndex.unregisterBm25("ev_text", "ev_id")
    AnnIndex.unregisterSparse("ev_idx")
    AnnIndex.unregisterRange("ev_range")
    assert(AnnIndex.lookup("ev_dense").isEmpty &&
      AnnIndex.lookupDist("ev_dist").isEmpty &&
      AnnIndex.lookupQuant("ev_sq").isEmpty &&
      AnnIndex.lookupQuant("ev_pq").isEmpty &&
      AnnIndex.lookupQuant("ev_mrl").isEmpty &&
      AnnIndex.lookupMaxsim("ev_mv").isEmpty &&
      AnnIndex.lookupBm25("ev_text").isEmpty &&
      AnnIndex.lookupSparse("ev_idx").isEmpty &&
      AnnIndex.lookupRange("ev_range").isEmpty,
      "every spec registration must be gone after its unregister")
    assert(AnnIndex.hasAny == before,
      "the sweep must restore the registries' pre-spec emptiness")
  }

  test("Bm25 and Dedup memo caches drain on their clear sweeps") {
    val sp = spark
    import sp.implicits._
    val docs = Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta"),
      (3L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    Bm25.clearCache()
    Dedup.clearCaches()
    val persistedBefore =
      spark.sparkContext.getPersistentRDDs.keySet.toSet
    Bm25.buildCached(docs, "doc_id", "text", key = "evspec|tiny")
    assert(Bm25.cachedCount >= 1)
    Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .count()
    assert(Dedup.cachedCount >= 1)
    Bm25.clearCache()
    Dedup.clearCaches()
    assert(Bm25.cachedCount == 0 && Dedup.cachedCount == 0,
      "clear sweeps must empty the driver-resident caches")
    val leaked =
      spark.sparkContext.getPersistentRDDs.keySet.toSet --
        persistedBefore
    assert(leaked.isEmpty,
      s"swept caches left persisted blocks behind: $leaked")
  }

  test("GraphQ cache sweep is idempotent and leaves zero graphs") {
    graft.queries.GraphQ.clearCache()
    assert(graft.queries.GraphQ.cachedCount == 0)
    graft.queries.GraphQ.clearCache() // second sweep: no-op, no throw
    assert(graft.queries.GraphQ.cachedCount == 0)
    graft.queries.GraphQ.clearStreamedCache()
    assert(graft.queries.GraphQ.streamedCachedCount == 0)
  }
}
