package graft.core

import java.nio.file.Files

import graft.SparkSpecBase
import graft.core.Spec._
import graft.functions.Uuid

/** CRUD + cascade + transaction semantics, porting the reference's DB
  * integration assertions (/root/reference/tests/test_table.py:91-124
  * select/AnyOf/limit, :181-201 FK cascade delete, :261-298 rollback). */
case class TUser(uid: Long, name: String, email: Option[String])
case class TDoc(did: Long, uid: Long, text: String)
case class TChunk(cid: Long, did: Long, body: String, vec: Seq[Float])

class RegistrySpec extends SparkSpecBase {

  private def freshRegistry(): (Registry, TableDef[TUser], TableDef[TDoc],
      TableDef[TChunk]) = {
    val sp = spark
    import sp.implicits._
    val users = TableDef[TUser]("user", primaryKey = Some("uid"),
      idGen = IdGen.AutoIncrement,
      indexes = Seq(UniqueIndex("name")))
    val docs = TableDef[TDoc]("doc", primaryKey = Some("did"),
      foreignKeys = Seq(ForeignKey("uid", "user", "uid")))
    val chunks = TableDef[TChunk]("chunk", primaryKey = Some("cid"),
      foreignKeys = Seq(ForeignKey("did", "doc", "did")),
      vectorDims = Map("vec" -> 3))
    val root = Files.createTempDirectory("graft-reg").toString
    val reg = new Registry(spark, root).register(users, docs, chunks)
    (reg, users, docs, chunks)
  }

  test("insert + selectBy equality, AnyOf, IS NULL, limit") {
    val (reg, users, _, _) = freshRegistry()
    reg.insert(users, Seq(
      TUser(0, "alice", Some("a@x.io")),
      TUser(0, "bob", None),
      TUser(0, "carol", Some("c@x.io"))))
    assert(reg.table(users).count() === 3)
    val alice = reg.selectBy(users, Map("name" -> "alice")).collect()
    assert(alice.length === 1 && alice(0).getAs[String]("email") == "a@x.io")
    val two = reg.selectBy(users,
      Map("name" -> AnyOf(Seq("alice", "bob")))).collect()
    assert(two.map(_.getAs[String]("name")).sorted.toSeq ===
      Seq("alice", "bob"))
    assert(reg.selectBy(users, Map("email" -> IsNull)).count() === 1)
    assert(reg.selectBy(users, limit = 2).count() === 2)
    // projection: a partial row has only the selected columns (UNSET twin)
    val partial = reg.selectBy(users, cols = Seq("name"))
    assert(partial.columns.toSeq === Seq("name"))
  }

  test("auto-increment ids are 1..n and continue across batches") {
    val (reg, users, _, _) = freshRegistry()
    reg.insert(users, Seq(TUser(0, "a", None), TUser(0, "b", None)))
    reg.insert(users, Seq(TUser(0, "c", None)))
    val ids = reg.table(users).collect().map(_.getAs[Long]("uid")).sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L))
  }

  test("FK cascade delete: user -> doc -> chunk") {
    val (reg, users, docs, chunks) = freshRegistry()
    reg.insert(users, Seq(TUser(0, "alice", None), TUser(0, "bob", None)))
    reg.insert(docs, Seq(TDoc(10, 1, "d-alice"), TDoc(11, 2, "d-bob")))
    reg.insert(chunks, Seq(
      TChunk(100, 10, "c1", Seq(1f, 2f, 3f)),
      TChunk(101, 11, "c2", Seq(4f, 5f, 6f))))
    reg.removeBy(users, Map("name" -> "alice"))
    assert(reg.table(users).count() === 1)
    assert(reg.table(docs).collect().map(_.getAs[String]("text")).toSeq ===
      Seq("d-bob"))
    assert(reg.table(chunks).collect().map(_.getAs[String]("body")).toSeq ===
      Seq("c2"))
  }

  test("empty-filter delete removes all rows") {
    val (reg, users, _, _) = freshRegistry()
    reg.insert(users, Seq(TUser(0, "a", None)))
    reg.removeBy(users, Map.empty)
    assert(reg.table(users).count() === 0)
  }

  test("transaction rollback leaves no partial writes across tables") {
    val (reg, users, docs, _) = freshRegistry()
    reg.insert(users, Seq(TUser(0, "kept", None)))
    intercept[RuntimeException] {
      reg.runTxn { txn =>
        reg.insert(users, Seq(TUser(0, "ghost", None)), txn)
        reg.insert(docs, Seq(TDoc(1, 1, "ghost-doc")), txn)
        assert(reg.table(users, txn).count() === 2) // txn sees its writes
        throw new RuntimeException("boom")
      }
    }
    assert(reg.table(users).count() === 1)
    assert(reg.table(docs).count() === 0)
  }

  test("txn buffer sees only this txn's inserts") {
    val (reg, users, _, _) = freshRegistry()
    reg.insert(users, Seq(TUser(0, "old", None)))
    reg.runTxn { txn =>
      reg.insert(users, Seq(TUser(0, "new", None)), txn)
      val buf = reg.tableBuffer(users, txn).collect()
      assert(buf.map(_.getAs[String]("name")).toSeq === Seq("new"))
      assert(reg.table(users, txn).count() === 2)
      assert(reg.selectBy(users, fromBuffer = true, txn = txn).count() === 1)
    }
    assert(reg.table(users).count() === 2)
  }

  test("unique validation reports duplicate groups") {
    val (reg, users, _, _) = freshRegistry()
    reg.insert(users, Seq(TUser(0, "dup", None), TUser(0, "dup", None),
      TUser(0, "ok", None)))
    val v = reg.validateUnique(users).collect()
    assert(v.length === 1)
    assert(v(0).getAs[String]("value") === "dup" && v(0).getAs[Long]("n") === 2)
  }

  test("vector-dim validation flags wrong lengths") {
    val (reg, _, docs, chunks) = freshRegistry()
    reg.insert(docs, Seq(TDoc(1, 1, "d")))
    reg.insert(chunks, Seq(
      TChunk(1, 1, "ok", Seq(1f, 2f, 3f)),
      TChunk(2, 1, "bad", Seq(1f, 2f))))
    val bad = reg.validateVectorDims(chunks).collect()
    assert(bad.map(_.getAs[Long]("cid")).toSeq === Seq(2L))
  }

  test("foreign-key validation finds orphans") {
    val (reg, users, docs, _) = freshRegistry()
    reg.insert(users, Seq(TUser(0, "a", None)))
    reg.insert(docs, Seq(TDoc(1, 1, "ok"), TDoc(2, 99, "orphan")))
    val orphans = reg.validateForeignKeys(docs).collect()
    assert(orphans.map(_.getAs[Long]("did")).toSeq === Seq(2L))
  }

  test("drop and clear") {
    val (reg, users, docs, chunks) = freshRegistry()
    reg.insert(users, Seq(TUser(0, "a", None)))
    reg.insert(docs, Seq(TDoc(1, 1, "d")))
    reg.clear()
    assert(reg.table(users).count() === 0 && reg.table(docs).count() === 0)
    reg.drop(users, cascade = true)
    assert(!reg.catalog.tableExists("public_user"))
    assert(!reg.catalog.tableExists("public_doc"))
    assert(!reg.catalog.tableExists("public_chunk"))
  }

  test("uuid v7 ids are time-sortable and well-formed") {
    val a = Uuid.v7(1000L, 1, 42L)
    val b = Uuid.v7(2000L, 0, 7L)
    assert(a < b)
    assert(Uuid.timestampMs(a) === 1000L)
    assert(java.util.UUID.fromString(a).version() === 7)
    assert(java.util.UUID.fromString(a).variant() === 2)
  }

  test("catalog recovery: a new registry on the same root sees only committed state") {
    val sp = spark
    import sp.implicits._
    val users = TableDef[TUser]("user", primaryKey = Some("uid"))
    val root = Files.createTempDirectory("graft-recover").toString
    val reg = new Registry(spark, root).register(users)
    reg.insert(users, Seq(TUser(1L, "alice", None)))
    // a crashed transaction: segments staged, manifest never swapped
    intercept[RuntimeException] {
      reg.runTxn { txn =>
        reg.insert(users, Seq(TUser(2L, "ghost", None)), txn)
        throw new RuntimeException("crash before commit")
      }
    }
    // "restart": fresh Registry over the same root reloads the manifest
    val reg2 = new Registry(spark, root).register(users)
    val names = reg2.table(users).select("name").collect()
      .map(_.getString(0)).toSeq
    assert(names === Seq("alice")) // the ghost segment is orphan garbage
  }

  test("concurrent insert transactions all commit (no lost updates)") {
    val (reg, users, _, _) = freshRegistry()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // the reference's 5-concurrent-transactions service test
    // (tests/test_service.py:101-110): every txn's inserts must survive
    val fs = (0 until 5).map { i =>
      Future {
        reg.runTxn { txn =>
          reg.insert(users, Seq(TUser(0L, s"user$i", None)), txn)
        }
      }
    }
    Await.result(Future.sequence(fs), 60.seconds)
    assert(reg.table(users).count() === 5)
    // identity keys stay collision-free across concurrent txns? No —
    // AutoIncrement reads max(existing) at insert time, so concurrent
    // txns can draw the same key; uniqueness is a validation concern:
    val names = reg.table(users).select("name").collect()
      .map(_.getString(0)).toSet
    assert(names === (0 until 5).map(i => s"user$i").toSet)
  }

  test("concurrent overwrite conflicts are detected, not silently lost") {
    val (reg, users, _, _) = freshRegistry()
    reg.insert(users, Seq(TUser(0L, "base", None)))
    val sp = spark
    import sp.implicits._
    intercept[IllegalStateException] {
      reg.runTxn { outer =>
        reg.overwrite(users,
          Seq(TUser(1L, "outer", Option.empty[String])).toDF(), outer)
        // inner txn commits an overwrite of the same table first
        reg.runTxn { inner =>
          reg.overwrite(users,
            Seq(TUser(2L, "inner", Option.empty[String])).toDF(), inner)
        }
      }
    }
    // the inner (first-committed) state survives
    assert(reg.table(users).select("name").head().getString(0) === "inner")
  }

  test("cascade split never force-broadcasts the deleted-key set") {
    // a mass delete's key set can be half a table; with auto-broadcast
    // off, the (production) cascadeSplit joins must stay shuffle joins —
    // AQE re-adds the broadcast at runtime only when the keys are small
    import org.apache.spark.sql.functions.col
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val child = spark.range(0, 100000).select(
        col("id").as("pk"), (col("id") % 50000).as("fk"))
      val keys = spark.range(0, 25000).select(col("id").as("__key"))
      val (deleted, survivors) = Registry.cascadeSplit(child, keys, "fk")
      for (df <- Seq(deleted, survivors)) {
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("BroadcastExchange"),
          s"cascade split must not force-broadcast keys:\n$p")
      }
      assert(deleted.count() === 50000L)
      assert(survivors.count() === 50000L)
    } finally spark.conf.set(key, old)
  }

  test("self-referencing FK cascade terminates; a delete matching " +
      "nothing rewrites nothing and fires no hooks") {
    val sp = spark
    import sp.implicits._
    val nodes = TableDef[TNode]("node", primaryKey = Some("nid"),
      foreignKeys = Seq(ForeignKey("parent", "node", "nid")))
    val reg = new Registry(spark,
      Files.createTempDirectory("graft-reg-cyc").toString).register(nodes)
    reg.insert(nodes, Seq(TNode(1L, 0L, "root"), TNode(2L, 1L, "a"),
      TNode(3L, 2L, "b"), TNode(10L, 0L, "other")))
    var hookRows = -1L
    reg.onDelete("node")(df => hookRows = df.count())
    // a no-match delete must not rewrite the table or fire the hook
    reg.removeBy(nodes, Map("nid" -> 999L))
    assert(hookRows === -1L, "no-op delete fired the delete hook")
    assert(reg.table(nodes).count() === 4L)
    // deleting the root cascades down the self-FK chain and STOPS
    // (pre-fix this recursed forever writing empty segments)
    reg.removeBy(nodes, Map("nid" -> 1L))
    assert(reg.table(nodes).collect().map(_.getLong(0)).sorted
      === Array(10L))
  }

  test("clear truncates only this registry's namespace") {
    val sp = spark
    import sp.implicits._
    val root = Files.createTempDirectory("graft-reg-ns").toString
    val tdA = TableDef[TNode]("shared", primaryKey = Some("nid"))
    val tdB = TableDef[TNode]("shared", primaryKey = Some("nid"))
    val regA = new Registry(spark, root, "nsa").register(tdA)
    val regB = new Registry(spark, root, "nsb").register(tdB)
    regA.insert(tdA, Seq(TNode(1L, 0L, "a")))
    regB.insert(tdB, Seq(TNode(2L, 0L, "b")))
    regA.clear()
    assert(regA.table(tdA).count() === 0L)
    assert(regB.table(tdB).count() === 1L,
      "clear() on namespace nsa truncated nsb's table")
  }

  test("concurrent auto-increment inserts never assign duplicate ids") {
    val sp = spark
    import sp.implicits._
    val users = TableDef[TUser]("cuser", primaryKey = Some("uid"),
      idGen = IdGen.AutoIncrement)
    val reg = new Registry(spark,
      Files.createTempDirectory("graft-reg-ctr").toString).register(users)
    reg.insert(users, Seq(TUser(0L, "seed", None)))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (0 until 4).map { t =>
      Future(reg.insert(users,
        (0 until 10).map(i => TUser(0L, s"u$t-$i", None))))
    }
    Await.result(Future.sequence(fs), 120.seconds)
    val ids = reg.table(users).collect().map(_.getLong(0))
    assert(ids.length === 41)
    assert(ids.distinct.length === 41,
      s"duplicate auto-increment ids: ${ids.groupBy(identity)
        .filter(_._2.length > 1).keys.mkString(",")}")
  }

  test("memo-key identity: instanceId differs per registry, segDigest " +
      "tracks the manifest and can't alias across tables") {
    val (regA, usersA, _, _) = freshRegistry()
    val (regB, _, _, _) = freshRegistry()
    // identityHashCode could be reused after GC; UUIDs cannot collide
    assert(regA.instanceId !== regB.instanceId)
    val v0 = regA.segDigest("user")
    assert(v0 === regA.segDigest("user"), "digest must be stable")
    regA.insert(usersA, Seq(TUser(0L, "dana", None)))
    assert(regA.segDigest("user") !== v0,
      "a manifest change must change the digest")
    // multi-table digests separate per-table segment lists: the pair
    // (user, doc) must not alias (doc, user)
    assert(regA.segDigest("user", "doc") !== regA.segDigest("doc", "user"))
  }
}

/** Self-referencing fixture for the cyclic-cascade test. */
case class TNode(nid: Long, parent: Long, tag: String)
