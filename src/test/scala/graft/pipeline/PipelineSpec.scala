package graft.pipeline

import java.nio.file.Files

import graft.SparkSpecBase
import graft.core.Spec._
import graft.core.Registry

/** Dataflow semantics ports: inject map/flatMap + buffer visibility
  * (/root/reference/tests/test_table.py:204-233) and pipeline rollback
  * (:261-298). */
case class PDoc(did: Long, text: String)
case class PChunk(cid: Long, did: Long, body: String)

class PipelineSpec extends SparkSpecBase {

  private def fresh(): (Registry, TableDef[PDoc], TableDef[PChunk]) = {
    val sp = spark
    import sp.implicits._
    val docs = TableDef[PDoc]("pdoc", primaryKey = Some("did"))
    val chunks = TableDef[PChunk]("pchunk", primaryKey = Some("cid"),
      foreignKeys = Seq(ForeignKey("did", "pdoc", "did")))
    val reg = new Registry(spark,
      Files.createTempDirectory("graft-pipe").toString)
      .register(docs, chunks)
    (reg, docs, chunks)
  }

  test("source -> inject -> sink; steps see only this run's rows") {
    val (reg, docs, chunks) = fresh()
    // pre-existing row must NOT be reprocessed by the pipeline
    reg.insert(docs, Seq(PDoc(99, "old old")))
    val pipe = Pipeline(reg,
      Pipeline.Source(docs) { args =>
        args.asInstanceOf[Seq[String]].zipWithIndex.map {
          case (t, i) => PDoc(i.toLong, t)
        }
      },
      Pipeline.Inject(docs, chunks) { d =>
        d.text.split(" ").zipWithIndex.map { case (w, i) =>
          PChunk(d.did * 100 + i, d.did, w)
        }
      },
      Pipeline.Sink(chunks))
    val out = pipe.run(Seq("a b", "c"))
    assert(out.map(_.asInstanceOf[PChunk].body).sorted ===
      Seq("a", "b", "c"))
    assert(reg.table(docs).count() === 3) // 1 old + 2 new
    assert(reg.table(chunks).count() === 3) // old doc not re-chunked
  }

  test("failing step rolls back every table") {
    val (reg, docs, chunks) = fresh()
    reg.insert(docs, Seq(PDoc(1, "kept")))
    val pipe = Pipeline(reg,
      Pipeline.Source(docs)(_ => Seq(PDoc(2, "new"))),
      Pipeline.Inject(docs, chunks) { d =>
        if (d.text == "new") throw new IllegalStateException("boom")
        Seq(PChunk(1, d.did, d.text))
      },
      Pipeline.Sink(chunks))
    intercept[Exception] { pipe.run() }
    assert(reg.table(docs).count() === 1)
    assert(reg.table(chunks).count() === 0)
  }

  test("transform step runs frame-level functions") {
    val (reg, docs, chunks) = fresh()
    val pipe = Pipeline(reg,
      Pipeline.Source(docs)(_ => Seq(PDoc(1, "x y z"), PDoc(2, "q"))),
      Pipeline.Transform(docs, chunks) { ds =>
        val sp = ds.sparkSession
        import sp.implicits._
        ds.flatMap(d => d.text.split(" ").zipWithIndex.map {
          case (w, i) => PChunk(d.did * 10 + i, d.did, w)
        })
      },
      Pipeline.Sink(chunks))
    assert(pipe.run().size === 4)
  }

  test("empty / generator-like returns are fine") {
    val (reg, docs, chunks) = fresh()
    val pipe = Pipeline(reg,
      Pipeline.Source(docs)(_ => Seq(PDoc(1, "skip"), PDoc(2, "keep"))),
      Pipeline.Inject(docs, chunks) { d =>
        if (d.text == "skip") Iterator.empty
        else Iterator.single(PChunk(1, d.did, d.text))
      })
    pipe.run()
    assert(reg.table(chunks).count() === 1)
  }
}
