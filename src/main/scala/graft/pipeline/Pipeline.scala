package graft.pipeline

import org.apache.spark.sql.Dataset

import graft.core.{Registry, Txn}
import graft.core.Spec.TableDef

/** The `inject` dataflow + transactional pipeline — Spark twin of the
  * reference's core primitive (/root/reference/vechord/registry.py:353-442
  * `inject`, :28-62 `VechordPipeline.run`).
  *
  * A pipeline is a sequence of steps run in ONE transaction:
  *  - [[Source]] (inject with `input=None`): turns the caller's argument
  *    into rows of its output table.
  *  - [[Inject]] (row-level fn): reads its input table's **txn buffer**
  *    (only rows inserted earlier in this run — the xmin predicate twin),
  *    flatMaps the user function over typed rows (covers the reference's
  *    `B` / `list[B]` / generator returns), appends to the output table.
  *  - [[Transform]] (frame-level fn): same visibility, but the user
  *    function is `Dataset[I] => Dataset[O]` — the idiomatic Spark form
  *    for whole-frame stages (joins, window ranks, batch embedding).
  *  - [[Sink]] (inject with `output=None`): collects the typed buffer of
  *    its input table and returns it to the caller.
  *
  * Any step failure aborts the run: no table shows any of the run's rows
  * (rollback test twin tests/test_table.py:261-298). Commit is one atomic
  * manifest swap across all touched tables.
  */
object Pipeline {

  sealed trait Step {
    private[pipeline] def exec(reg: Registry, txn: Txn,
                               args: Any): Option[Seq[Any]]
  }

  /** First stage: caller args -> rows of `output`. */
  final case class Source[O <: Product](output: TableDef[O])(
      val f: Any => IterableOnce[O]) extends Step {
    private[pipeline] def exec(reg: Registry, txn: Txn, args: Any) = {
      reg.insert(output, f(args).iterator.toSeq, txn)
      None
    }
  }

  /** Row-level stage: for each row inserted into `input` during this run,
    * emit zero or more rows of `output`. */
  final case class Inject[I <: Product, O <: Product](
      input: TableDef[I], output: TableDef[O])(
      val f: I => IterableOnce[O]) extends Step {
    private[pipeline] def exec(reg: Registry, txn: Txn, args: Any) = {
      val in = reg.tableBuffer(input, txn).as[I](input.enc)
      val out: Dataset[O] = in.flatMap(f(_))(output.enc)
      reg.copyBulk(output, out.toDF(), txn)
      None
    }
  }

  /** Frame-level stage over the run's new `input` rows. */
  final case class Transform[I <: Product, O <: Product](
      input: TableDef[I], output: TableDef[O])(
      val f: Dataset[I] => Dataset[O]) extends Step {
    private[pipeline] def exec(reg: Registry, txn: Txn, args: Any) = {
      val in = reg.tableBuffer(input, txn).as[I](input.enc)
      reg.copyBulk(output, f(in).toDF(), txn)
      None
    }
  }

  /** Terminal stage: return the run's new `input` rows to the caller. */
  final case class Sink[I <: Product](input: TableDef[I]) extends Step {
    private[pipeline] def exec(reg: Registry, txn: Txn, args: Any) =
      Some(reg.tableBuffer(input, txn).as[I](input.enc).collect().toSeq)
  }

  def apply(reg: Registry, steps: Step*): PipelineRunner =
    new PipelineRunner(reg, steps)
}

final class PipelineRunner(reg: Registry, steps: Seq[Pipeline.Step]) {
  /** Run all steps in one transaction; returns the last Sink's rows. */
  def run(args: Any = ()): Seq[Any] = reg.runTxn { txn =>
    steps.foldLeft(Option.empty[Seq[Any]]) { (acc, s) =>
      s.exec(reg, txn, args).orElse(acc)
    }.getOrElse(Nil)
  }
}
