package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-key skew defenses for shuffle joins.
  *
  * Spark's own ladder handles most skew — broadcast the small side
  * when it fits, let AQE split oversized sort-merge partitions
  * (`spark.sql.adaptive.skewJoin`) otherwise. Salting is the manual
  * tool for the case both miss: the dimension is too big to
  * broadcast, AND one join key dominates so heavily that a single
  * reducer would own the hot key's entire fact slice (AQE can split a
  * skewed PARTITION, but every row of one key still hashes to one
  * reducer for the join itself — salting is what actually spreads a
  * single key).
  *
  * The reference never meets this (PostgreSQL executes its joins,
  * /root/reference/vechord/client.py's fixed SQL); at 100 TB the
  * engine must own it, so it is a named operator with the same
  * oracle-equality obligation as everything else: `saltedJoin` must
  * be RESULT-IDENTICAL to the plain join it replaces.
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Equi-join `big ⋈ small` on `keys`, with the big side's rows
    * spread over `salts` sub-keys and the small side replicated
    * `salts`× — a hot key's fact rows land on `salts` reducers
    * instead of one.
    *
    * Result-identical to `big.join(small, keys, joinType)`: each big
    * row carries exactly ONE salt (derived deterministically from its
    * full row content via xxhash64 — stable across runs, engines and
    * retries, never `rand()` which breaks task-retry idempotence) and
    * the small side carries ALL salts, so every (big row, small row)
    * key match survives exactly once.
    *
    * `joinType` may be `inner` or `left`/`left_outer` (the shapes
    * whose semantics replication preserves; a right/full join would
    * multiply unmatched small-side rows by `salts`).
    *
    * Cost model: replicates the small side `salts`× through the
    * shuffle — use the smallest `salts` that caps the hot key's
    * per-reducer share, and only when the small side is over the
    * broadcast threshold (a broadcast join needs no salting at all).
    *
    * Caveats: the salt hashes the big side's FULL row (hashing only
    * the key would put every hot-key row back on one salt), so rows
    * that are exact duplicates share a salt — content-duplicated hot
    * rows spread no further than their distinct payloads; and columns
    * xxhash64 cannot hash (e.g. maps) fail loudly at planning — project
    * them away before salting. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int = 16,
                 joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!big.columns.contains(SaltCol) &&
        !small.columns.contains(SaltCol),
      s"input already carries the reserved column $SaltCol")
    require(Set("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left joins, got $joinType " +
        "(replication would duplicate unmatched right-side rows)")
    require(keys.nonEmpty, "keys must be non-empty")
    val b = big.withColumn(SaltCol,
      pmod(xxhash64(big.columns.map(col): _*), lit(salts.toLong)))
    val sm = small.withColumn(SaltCol,
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    b.join(sm, keys :+ SaltCol, joinType).drop(SaltCol)
  }
}
