package graft.graph

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.core.Registry
import graft.text.HashEmbedder

/** HashEmbedder twin that records every text it embeds (local-mode
  * tests share one JVM, so the static set sees executor-side calls). */
final case class RecordingEmbedder(dim: Int)
    extends graft.text.Embedder {
  def name: String = s"recording_$dim"
  private val inner = HashEmbedder(dim)
  def embedChunk(text: String): Array[Float] = {
    RecordingEmbedder.seen.add(text)
    inner.embedChunk(text)
  }
}
object RecordingEmbedder {
  val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
}

/** Graph merge-upsert + 2-hop search semantics
  * (pipeline.py:345-392, 444-487). */
class GraphSpec extends SparkSpecBase {

  private def fresh() = {
    val reg = new Registry(spark,
      Files.createTempDirectory("graft-graph").toString)
    val ents = Graph.entityDef()
    val rels = Graph.relationDef()
    reg.register(ents, rels)
    (reg, ents, rels, HashEmbedder(dim = 32))
  }

  test("entity merge: same-text entities merge descriptions and chunks") {
    val (reg, ents, _, emb) = fresh()
    val sp = spark
    import sp.implicits._
    val batch1 = Seq(
      ("Spark", "ENT", "a compute engine", Seq("c1"), 0L),
      ("Spark", "ENT", "runs on clusters", Seq("c2"), 1L),
      ("Flink", "ENT", "a stream engine", Seq("c3"), 2L))
      .toDF("text", "label", "description", "chunk_uuids", "ord")
    Graph.mergeInsertEntities(reg, ents, batch1, emb)
    val afterOne = reg.table(ents).collect()
      .map(r => r.getAs[String]("text") -> r).toMap
    assert(afterOne.size === 2)
    assert(afterOne("Spark").getAs[String]("description") ===
      "a compute engine\nruns on clusters")
    assert(afterOne("Spark").getAs[Seq[String]]("chunk_uuids") ===
      Seq("c1", "c2"))
    // second batch merges with the stored row, new description first
    val batch2 = Seq(("Spark", "ENT", "version three", Seq("c9"), 0L))
      .toDF("text", "label", "description", "chunk_uuids", "ord")
    Graph.mergeInsertEntities(reg, ents, batch2, emb)
    val spark2 = reg.table(ents).filter(col("text") === "Spark").collect()(0)
    assert(spark2.getAs[String]("description") ===
      "version three\na compute engine\nruns on clusters")
    assert(spark2.getAs[Seq[String]]("chunk_uuids") === Seq("c9", "c1", "c2"))
    assert(spark2.getAs[Seq[Float]]("vec").length === 32)
    // uid stable across merges
    assert(afterOne("Spark").getAs[String]("uid") ===
      spark2.getAs[String]("uid"))
  }

  test("merge re-embeds only the changed rows; labels pick the ord-min") {
    val (reg, ents, rels, _) = fresh()
    val emb = RecordingEmbedder(dim = 32)
    val sp = spark
    import sp.implicits._
    val batch1 = Seq(
      ("Spark", "B_LATER", "a compute engine", Seq("c1"), 1L),
      ("Spark", "A_FIRST", "runs on clusters", Seq("c2"), 0L),
      ("Flink", "ENT", "a stream engine", Seq("c3"), 2L))
      .toDF("text", "label", "description", "chunk_uuids", "ord")
    Graph.mergeInsertEntities(reg, ents, batch1, emb)
    // ord-min label, not a partition-order-dependent first()
    val sparkRow = reg.table(ents).filter(col("text") === "Spark")
      .collect()(0)
    assert(sparkRow.getAs[String]("label") === "A_FIRST")
    def vecOf(r: org.apache.spark.sql.Row): Seq[Float] =
      r.getSeq[Float](r.fieldIndex("vec")).toSeq
    val flinkVec = vecOf(reg.table(ents).filter(col("text") === "Flink")
      .collect()(0))
    // second batch touches ONLY Spark: Flink must not re-embed (at
    // scale the embedder is a paid network call — a merge batch costs
    // O(batch), not O(table)) and must keep its stored vector
    RecordingEmbedder.seen.clear()
    val batch2 = Seq(("Spark", "ENT", "v3", Seq("c9"), 0L))
      .toDF("text", "label", "description", "chunk_uuids", "ord")
    Graph.mergeInsertEntities(reg, ents, batch2, emb)
    import scala.jdk.CollectionConverters._
    assert(!RecordingEmbedder.seen.asScala.exists(_.startsWith("Flink")))
    assert(RecordingEmbedder.seen.asScala.exists(_.startsWith("Spark")))
    val flinkAfter = vecOf(reg.table(ents)
      .filter(col("text") === "Flink").collect()(0))
    assert(flinkAfter === flinkVec)
    // relations: same contract
    val rb1 = Seq(("u1", "u2", "A links B", 0L), ("u3", "u4", "C D", 1L))
      .toDF("source", "target", "description", "ord")
    Graph.mergeInsertRelations(reg, rels, rb1, emb)
    RecordingEmbedder.seen.clear()
    val rb2 = Seq(("u2", "u1", "B back-links A", 0L))
      .toDF("source", "target", "description", "ord")
    Graph.mergeInsertRelations(reg, rels, rb2, emb)
    assert(!RecordingEmbedder.seen.asScala.exists(_.contains("C D")))
    assert(RecordingEmbedder.seen.asScala
      .exists(_.contains("B back-links A")))
  }

  test("relation merge keys on the sorted endpoint pair") {
    val (reg, _, rels, emb) = fresh()
    val sp = spark
    import sp.implicits._
    val batch = Seq(
      ("u1", "u2", "A links B", 0L),
      ("u2", "u1", "B links A", 1L), // same undirected pair
      ("u1", "u3", "A links C", 2L))
      .toDF("source", "target", "description", "ord")
    Graph.mergeInsertRelations(reg, rels, batch, emb)
    val rows = reg.table(rels).collect()
    assert(rows.length === 2)
    val pair = rows.find(_.getAs[String]("description").contains("A links B"))
      .get
    assert(pair.getAs[String]("description") === "A links B\nB links A")
    // cross-CALL re-occurrence with reversed orientation: the STORED
    // (earliest) orientation survives — the within-call ord-min
    // contract extended across merges, which makes an incrementally
    // built graph orientation-identical to the all-at-once build (s17)
    val later = Seq(("u2", "u1", "B mentions A", 0L))
      .toDF("source", "target", "description", "ord")
    Graph.mergeInsertRelations(reg, rels, later, emb)
    val again = reg.table(rels).collect()
      .find(_.getAs[String]("description").contains("A links B")).get
    assert(again.getAs[String]("source") === "u1" &&
      again.getAs[String]("target") === "u2")
    assert(again.getAs[String]("description") ===
      "B mentions A\nA links B\nB links A")
  }

  test("2-hop graph search reaches chunks through relations and entities") {
    val (reg, ents, rels, emb) = fresh()
    val sp = spark
    import sp.implicits._
    val chunks = Seq(
      ("c1", "Spark processes big data with SQL"),
      ("c2", "Flink streams events continuously"),
      ("c3", "Postgres stores relational rows"))
      .toDF("uid", "text")
    val (entsDf, relsDf) = Graph.extractFromChunks(spark, chunks,
      "uid", "text", SimpleRecognizer())
    Graph.mergeInsertEntities(reg, ents, entsDf, emb)
    Graph.mergeInsertRelations(reg, rels, relsDf, emb)
    assert(reg.table(ents).count() >= 3)
    val hits = Graph.graphSearch(reg, "Tell me about Spark SQL engines",
      chunks, "uid", ents, rels, emb, SimpleRecognizer(),
      similarK = 3, topk = 2)
    val uids = hits.collect().map(_.getAs[String]("uid"))
    assert(uids.nonEmpty)
    assert(uids.contains("c1")) // the Spark chunk must surface
  }

  // PatternRecognizer: the 5 reference matcher patterns (graph.py:37-94),
  // POS-free. Each test mirrors one pattern's span semantics
  // (graph.py:113-139: source = first ENT, target = second ENT or the
  // span's last token, description = span text).
  test("pattern ENT_VERB_ENT: ENT VERB+ ENT") {
    val (_, rels) = PatternRecognizer().recognize("Alice founded Acme.")
    val r = rels.find(_.description == "Alice founded Acme")
    assert(r.isDefined)
    assert(r.get.source === "Alice" && r.get.target === "Acme")
  }

  test("pattern ENT_PREP_ENT: ENT AUX* VERB ADP ENT") {
    val (_, rels) = PatternRecognizer()
      .recognize("Obama was born in Hawaii.")
    val r = rels.find(_.description == "Obama was born in Hawaii")
    assert(r.isDefined)
    assert(r.get.source === "Obama" && r.get.target === "Hawaii")
    // zero-aux variant also matches (OP: * allows empty)
    val (_, rels2) = PatternRecognizer()
      .recognize("Alice works at Acme.")
    assert(rels2.exists(r => r.source == "Alice" && r.target == "Acme" &&
      r.description == "Alice works at Acme"))
  }

  test("pattern ENT_POSSESSIVE_ENT: ENT PUNCT? 's? NOUN is? ENT") {
    val (_, rels) = PatternRecognizer()
      .recognize("Obama's wife is Michelle.")
    val r = rels.find(_.description == "Obama 's wife is Michelle")
    assert(r.isDefined)
    assert(r.get.source === "Obama" && r.get.target === "Michelle")
  }

  test("pattern ENT_APPOSITION_ENT: ENT PUNCT? NOUN+ of? ENT") {
    val (_, rels) = PatternRecognizer()
      .recognize("Paris , capital of France")
    val r = rels.find(_.description == "Paris , capital of France")
    assert(r.isDefined)
    assert(r.get.source === "Paris" && r.get.target === "France")
  }

  test("pattern ENT_ATTRIBUTE_ENT: ENT PUNCT? NOUN LIKE_NUM") {
    val (_, rels) = PatternRecognizer()
      .recognize("Acme revenue 2024 grew")
    val r = rels.find(_.description == "Acme revenue 2024")
    assert(r.isDefined)
    // one ENT in span: target falls back to the span's last token
    // (graph.py:133-136)
    assert(r.get.source === "Acme" && r.get.target === "2024")
  }

  test("tagger: base-form verbs, plural nouns, pronouns, adjectives") {
    // base-form verb after a plural subject: "run" must tag VERB
    val (_, rels) = PatternRecognizer()
      .recognize("Bob and Alice run Acme.")
    assert(rels.exists(r => r.source == "Alice" && r.target == "Acme" &&
      r.description == "Alice run Acme"))
    // pluralized derivational noun stays NOUN: apposition matches
    val (_, rels2) = PatternRecognizer()
      .recognize("Paris , regions of France")
    assert(rels2.exists(r => r.source == "Paris" && r.target == "France"))
    // pronoun is PRON, not NOUN: no fake possessive-pattern slot
    val (_, rels3) = PatternRecognizer()
      .recognize("Alice , it is Bob")
    assert(!rels3.exists(r => r.description.contains("it is")))
    // adjective is ADJ, not NOUN: the NOUN+ element cannot start on it
    val (_, rels4) = PatternRecognizer()
      .recognize("Alice , famous Bob")
    assert(!rels4.exists(r => r.description == "Alice , famous Bob"))
  }

  test("pattern recognizer: entities are capitalized/vocab tokens, " +
      "deduped in order; vocab extends ENT class") {
    val (ents, _) = PatternRecognizer()
      .recognize("Spark beats Spark. Flink differs.")
    assert(ents.map(_.text) === Seq("Spark", "Flink"))
    // lowercase vocab terms become ENT and participate in patterns
    val (ents2, rels2) = PatternRecognizer(vocab = Seq("spark", "flink"))
      .recognize("spark outperforms flink")
    assert(ents2.map(_.text) === Seq("spark", "flink"))
    assert(rels2.exists(r => r.source == "spark" && r.target == "flink"))
  }

  test("pattern recognizer works through extractFromChunks") {
    val sp = spark
    import sp.implicits._
    val chunks = Seq(
      ("c1", "Alice founded Acme. Obama was born in Hawaii."))
      .toDF("uid", "text")
    val (entsDf, relsDf) = Graph.extractFromChunks(spark, chunks,
      "uid", "text", PatternRecognizer())
    assert(entsDf.count() >= 4)
    assert(relsDf.count() >= 2)
  }

  test("search with no recognizable entities returns empty") {
    val (reg, ents, rels, emb) = fresh()
    val sp = spark
    import sp.implicits._
    val chunks = Seq(("c1", "Spark rules")).toDF("uid", "text")
    val (entsDf, relsDf) = Graph.extractFromChunks(spark, chunks,
      "uid", "text", SimpleRecognizer())
    Graph.mergeInsertEntities(reg, ents, entsDf, emb)
    Graph.mergeInsertRelations(reg, rels, relsDf, emb)
    val hits = Graph.graphSearch(reg, "all lowercase nothing here",
      chunks, "uid", ents, rels, emb, SimpleRecognizer())
    assert(hits.count() === 0)
  }

  test("clusteringCoefficients: hand-computed triangles, shared-edge " +
      "double count, dedup of orientation/multi-edges, key guard") {
    val sp = spark
    import sp.implicits._
    // two triangles sharing edge B-C: A-B, A-C, B-C, B-D, C-D; E isolated
    // via a single edge E-A would change A's cc, so keep E edgeless:
    // it must NOT appear (degree table only sees edged nodes)
    val ents = Seq(("A", "a"), ("B", "b"), ("C", "c"), ("D", "d"),
        ("E", "e")).toDF("uid", "text")
    // duplicate + reversed + self-loop rows must all collapse
    val rels = Seq(("A", "B"), ("B", "A"), ("A", "C"), ("B", "C"),
        ("B", "D"), ("C", "D"), ("C", "D"), ("D", "D"))
      .toDF("source", "target")
    val got = Graph.clusteringCoefficients(ents, rels)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // deg: a=2 b=3 c=3 d=2 ; tri: abc, bcd
    assert(got("a") === ((2L, 1L, 1.0)))
    assert(got("b") === ((3L, 2L, 0.666667)))
    assert(got("c") === ((3L, 2L, 0.666667)))
    assert(got("d") === ((2L, 1L, 1.0)))
    assert(!got.contains("e"))
    // text-keyed endpoints must refuse (the g04 key-space lesson)
    val mismatched = Seq(("a", "b")).toDF("source", "target")
    intercept[IllegalArgumentException] {
      Graph.clusteringCoefficients(ents, mismatched)
    }
    // a hub star with no closing edge: zero triangles, hub cc = 0
    val star = Seq(("A", "B"), ("A", "C"), ("A", "D"))
      .toDF("source", "target")
    val s = Graph.clusteringCoefficients(ents, star)
      .collect().map(r => (r.getString(0), r.getDouble(3))).toMap
    assert(s("a") === 0.0 && s("b") === 0.0)
  }

  test("pageRank: hand-computed chain values, sinks keep base mass, " +
      "leaky total, determinism across runs") {
    val sp = spark
    import sp.implicits._
    // a -> b -> c, plus isolated d: N=4, d=0.85, 1 iteration:
    //   pr(a) = pr(d) = 0.15/4 = 0.0375 (no in-edges)
    //   pr(b) = 0.0375 + 0.85 * 0.25 = 0.25
    //   pr(c) = 0.0375 + 0.85 * 0.25 = 0.25
    // node ids live in an uppercase "uid" space distinct from text so
    // the test proves edges join the ID column, not the text column
    val ents = Seq(("A", "a"), ("B", "b"), ("C", "c"), ("D", "d"))
      .toDF("uid", "text")
    val rels = Seq(("A", "B"), ("B", "C")).toDF("source", "target")
    val one = Graph.pageRank(ents, rels, iters = 1)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(one("a") === 0.0375 && one("d") === 0.0375)
    assert(one("b") === 0.25 && one("c") === 0.25)
    // iteration 2: pr(b) = 0.0375 + .85*0.0375 = 0.069375;
    //              pr(c) = 0.0375 + .85*0.25 = 0.25
    val two = Graph.pageRank(ents, rels, iters = 2)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(two("b") === 0.069375 && two("c") === 0.25)
    // leaky variant: total mass <= 1 (c is a sink, its mass drains)
    assert(two.values.sum <= 1.0 + 1e-9)
    // deterministic across runs
    val again = Graph.pageRank(ents, rels, iters = 2)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(again === two)
    // edges keyed off the node id space must refuse loudly, never
    // degenerate to the all-teleport constant (the round-12 g04 bug:
    // text-keyed join against uid-keyed stored relation endpoints)
    val mismatched = Seq(("a", "b"), ("b", "c")).toDF("source", "target")
    intercept[IllegalArgumentException] {
      Graph.pageRank(ents, mismatched, iters = 1)
    }
  }

  test("personalizedPageRank: mass flows from the seed, non-reachable " +
      "nodes drain to 0, unknown seeds refuse") {
    val sp = spark
    import sp.implicits._
    val ents = Seq(("A", "a"), ("B", "b"), ("C", "c"), ("D", "d"))
      .toDF("uid", "text")
    val rels = Seq(("A", "B"), ("B", "C")).toDF("source", "target")
    val seeds = Seq("A").toDF("uid")
    // iter 1: pr(a)=0.15*1=0.15; pr(b)=0.85*pr0(a)=0.85; c,d = 0
    val one = Graph.personalizedPageRank(ents, rels, seeds, iters = 1)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(one("a") === 0.15 && one("b") === 0.85)
    assert(one("c") === 0.0 && one("d") === 0.0)
    // iter 2: pr(b)=0.85*0.15=0.1275; pr(c)=0.85*0.85=0.7225
    val two = Graph.personalizedPageRank(ents, rels, seeds, iters = 2)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(two("b") === 0.1275 && two("c") === 0.7225)
    assert(two("d") === 0.0) // unreachable from the question
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(ents, rels, Seq("Z").toDF("uid"))
    }
  }

  test("labelPropagation: two weighted triangles split into their own " +
      "communities across a weak bridge; isolated node keeps its label") {
    val sp = spark
    import sp.implicits._
    // triangles {a,b,c} and {d,e,f} with weight-2 internal edges
    // (description = 2 "\n"-joined lines) and a weight-1 c—d bridge;
    // g is isolated. Hand-rolled synchronous rounds converge to
    // communities 'a' and 'd' by round 3.
    val ents = Seq("A" -> "a", "B" -> "b", "C" -> "c", "D" -> "d",
      "E" -> "e", "F" -> "f", "G" -> "g").toDF("uid", "text")
    val two = "x\ny"
    val rels = Seq(
      ("A", "B", two), ("A", "C", two), ("B", "C", two),
      ("D", "E", two), ("D", "F", two), ("E", "F", two),
      ("C", "D", "x")).toDF("source", "target", "description")
    val got = Graph.labelPropagation(ents, rels, iters = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got("a") === "a" && got("b") === "a" && got("c") === "a")
    assert(got("d") === "d" && got("e") === "d" && got("f") === "d")
    assert(got("g") === "g") // isolated: keeps its own label
    // deterministic across runs
    val again = Graph.labelPropagation(ents, rels, iters = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(again === got)
    // key-space mismatch refuses loudly (same contract as pageRank)
    val mismatched2 = Seq(("a", "b", two)).toDF("source", "target",
      "description")
    intercept[IllegalArgumentException] {
      Graph.labelPropagation(ents, mismatched2, iters = 1)
    }
  }

  test("kCorePeel: chain cascade, triangle survives, self-loops and " +
      "round-0 isolation, last_deg at the removing check") {
    val sp = spark
    import sp.implicits._
    // chain 1-2-3 (+ a self-loop to drop) and triangle 4-5-6
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 3L),
        (4L, 5L), (5L, 6L), (4L, 6L)).toDF("a", "b")
    val got = Graph.kCorePeel(edges, k = 2, iters = 3)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2))))
      .toMap
    // round 1: chain ends peel at degree 1; round 2: the stranded
    // middle faces the check with degree 0 — the synchronous cascade
    assert(got(1L) === ((1, 1L)))
    assert(got(3L) === ((1, 1L)))
    assert(got(2L) === ((2, 0L)))
    // the triangle is the 2-core: survivors report round-3 degree
    assert(got(4L) === ((0, 2L)))
    assert(got(5L) === ((0, 2L)))
    assert(got(6L) === ((0, 2L)))
    // a node whose ONLY edge is a self-loop never enters the frame
    assert(!got.contains(7L))
    val loop = Seq((7L, 7L)).toDF("a", "b")
    assert(Graph.kCorePeel(loop, k = 2, iters = 2).count() === 0)
    // k=1 keeps everything edged; guards refuse nonsense parameters
    val all = Graph.kCorePeel(edges, k = 1, iters = 2)
    assert(all.filter(col("peel_round") === 0).count() === 6)
    intercept[IllegalArgumentException] { Graph.kCorePeel(edges, 0) }
    intercept[IllegalArgumentException] { Graph.kCorePeel(edges, 2, 0) }
  }
}
