package graft.core

/** A transaction: a staged manifest state plus the per-table segments this
  * txn has inserted — the "rows inserted in this txn" buffer that the
  * reference implements with `WHERE xmin = pg_current_xact_id()`
  * (/root/reference/vechord/client.py:25-37,222). Nothing in `staged`
  * becomes visible until [[Registry.runTxn]] commits it atomically. */
final class Txn private[core] (initial: Map[String, Vector[String]]) {
  private[core] val base: Map[String, Vector[String]] = initial
  private[core] var staged: Map[String, Vector[String]] = initial
  private[core] var buffer: Map[String, Vector[String]] = Map.empty
  /** Deferred post-commit actions (delete hooks): run only after the
    * atomic manifest swap succeeds, never for a rolled-back txn. */
  private[core] var afterCommit: List[() => Unit] = Nil
}
