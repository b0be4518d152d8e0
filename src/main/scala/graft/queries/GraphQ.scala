package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Registry
import graft.graph.{Graph, VocabRecognizer}
import graft.text.Md5Embedder
import Tables._

/** Graph-retrieval queries over entities/relations extracted from the
  * `documents` table — the reference's `graph_insert` merge-upsert
  * (/root/reference/vechord/pipeline.py:345-392) and 2-hop
  * `graph_search` (pipeline.py:444-487).
  *
  * ALL of g01-g03 are oracle-gated. g02/g03 replay the complete
  * build + search relationally (see [[g2Ctes]]): determinism comes
  * from data-derived merge ordering (extractFromChunks ord,
  * arg-min relation orientation, rank-ordered entity fetch) plus the
  * engine-portable [[Md5Embedder]] — no partition-order dependence
  * anywhere in the pipeline, which is also what makes the build
  * reproducible run-to-run at any cluster size.
  */
object GraphQ {

  /** Gazetteer for the synthetic corpus (all-lowercase word salad). */
  val Vocab = Seq("spark", "table", "join", "filter", "window", "vector",
    "stream", "shuffle", "partition", "query")

  private def recognizer = VocabRecognizer(Vocab)

  /** Graph build memoized per (session, corpus dir): the reference
    * builds the graph once at ingest (pipeline.py:332-342) and serves
    * many searches from it — rebuilding per query would misrepresent
    * the read path. Session-keyed (a second session in the same JVM
    * must not receive frames bound to a stopped one) and CAPPED
    * ACCESS-ORDERED with unpersist-on-evict ([[graft.core.LruCache]],
    * the shared discipline — FIFO memos thrashed in round 13) —
    * un-evicted entries were a slow leak in long-lived multi-corpus
    * sessions (advisor + verdict r6). */
  private val MaxCachedGraphs = 4
  private val built =
    new graft.core.LruCache[(String, String), (Registry, DataFrame)](
      MaxCachedGraphs, (k, v) => {
        val reg = v._1
        // lock order is always built -> ranked (rankedEntities resolves
        // buildGraph BEFORE touching ranked), so this cannot deadlock
        ranked.remove(k).foreach(r =>
          try r.unpersist(false) catch { case _: Throwable => () })
        try {
          reg.table(Graph.entityDef()).unpersist(false)
          reg.table(Graph.relationDef()).unpersist(false)
        } catch { case _: Throwable => () } // stopped session: no-op
      })

  private def buildGraph(s: SparkSession, d: String):
      (Registry, DataFrame) =
    built.getOrElseUpdate((graft.core.SessionId.of(s), d)) {
      buildGraphUncached(s, d)
    }

  /** Sweep every memoized graph (evict + unpersist each) — the
    * lifecycle clear for long-lived sessions, same contract as
    * [[graft.ops.Dedup.clearCaches]]/[[graft.ops.Bm25.clearCache]]. */
  def clearCache(): Unit = built.clear()
  private[graft] def cachedCount: Int = built.size

  private def buildGraphUncached(s: SparkSession, d: String):
      (Registry, DataFrame) = {
    val reg = new Registry(s,
      Files.createTempDirectory("graft_graph").toString)
    val (entDef, relDef) = (Graph.entityDef(), Graph.relationDef())
    reg.register(entDef, relDef)
    val chunks = documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("text"))
    val emb = Md5Embedder(dim = 32)
    val (ents, rels) = Graph.extractFromChunks(s, chunks, "doc_id", "text",
      recognizer)
    reg.runTxn { txn =>
      Graph.mergeInsertEntities(reg, entDef, ents, emb, txn)
      Graph.mergeInsertRelations(reg, relDef, rels, emb, txn)
    }
    // persist the (tiny) graph tables: the 2-hop search issues several
    // sequential driver actions against them, and Spark's cache manager
    // matches the canonicalized scan plan, so every later
    // reg.table(entDef/relDef) hits the in-memory copy
    reg.table(entDef).persist().count()
    reg.table(relDef).persist().count()
    (reg, chunks)
  }

  /** Post-merge entity table: top-20 entities by chunk coverage.
    * n_chunks counts one chunk_uuid entry per (chunk, entity) pair —
    * the recognizer dedups entities within a chunk, so this equals the
    * count of distinct documents mentioning the entity. */
  def entityMerge(s: SparkSession, d: String): DataFrame = {
    val (reg, _) = buildGraph(s, d)
    reg.table(Graph.entityDef())
      .select(col("text"), size(col("chunk_uuids")).as("n_chunks"))
      .orderBy(col("n_chunks").desc, col("text").asc)
      .limit(20)
  }

  /** Ranked-entity frame for the fixed bench query, memoized per
    * corpus dir alongside [[buildGraph]]: the entity ranking (which
    * embeds the concatenated entity descriptions — the expensive
    * phase) is the shared sub-computation of g02 and g03, exactly the
    * [[graft.ops.Dedup]] shared-shingle-table discipline. */
  private val ranked =
    new graft.core.LruCache[(String, String), DataFrame](MaxCachedGraphs,
      (_, r) => try r.unpersist(false) catch { case _: Throwable => () })
  private def rankedEntities(s: SparkSession, d: String): DataFrame = {
    val reg = buildGraph(s, d)._1 // outside the ranked lock (lock order)
    ranked.getOrElseUpdate((graft.core.SessionId.of(s), d)) {
      val r = Graph.graphSearchEntities(reg, "spark filter join",
        Graph.entityDef(), Graph.relationDef(), Md5Embedder(dim = 32),
        recognizer, similarK = 10).persist()
      r.count()
      r
    }
  }

  /** 2-hop graph search: query → similar relations → endpoint entities →
    * their chunks (full relational oracle below). */
  def graphSearch(s: SparkSession, d: String): DataFrame = {
    val (_, chunks) = buildGraph(s, d)
    Graph.graphSearchFromEntities(rankedEntities(s, d), chunks,
        "doc_id", topk = 10)
      .select("doc_id", "g_rank")
  }

  /** Hop-1.5 entity ranking of the same search ([[Graph
    * .graphSearchEntities]]): (text, dist) of the top-10 entities —
    * declared separately so the merge + embedding phases are gated at
    * full sensitivity (g02's chunk output is dominated by the chunk
    * lists of the leading entities). */
  def graphEntities(s: SparkSession, d: String): DataFrame =
    rankedEntities(s, d).select("text", "dist")

  /** g04: PageRank over the merged entity graph ([[Graph.pageRank]],
    * 3 iterations, d = 0.85, leaky-dangling variant) — the global
    * importance ranking a GraphRAG retriever mixes with similarity.
    * Top-20 by (pr desc, text asc); the oracle unrolls all three
    * iterations over the same entity/relation merge CTEs. */
  /** The g04 ranking (pageRank + top-20 + non-degeneracy pin), shared
    * with s17 so the two gates can never silently compute different
    * things. The pin: a key-space mismatch between relation endpoints
    * and node ids collapses every node to the teleport constant 0.15/N
    * — and the oracle, replaying the same joins, would agree (exactly
    * the round-12 g04 bug). A live graph must spread. */
  private def pagerankTop20(reg: Registry, gate: String): DataFrame = {
    val pr = Graph.pageRank(reg.table(Graph.entityDef()),
        reg.table(Graph.relationDef()))
      .orderBy(col("pr").desc, col("text").asc)
      .limit(20)
    require(pr.select(col("pr")).distinct().count() > 1,
      s"$gate: PageRank degenerated to a constant — key mismatch?")
    pr
  }

  def graphPagerank(s: SparkSession, d: String): DataFrame =
    pagerankTop20(buildGraph(s, d)._1, "g04")

  /** g05: weighted label-propagation communities over the merged
    * entity graph ([[Graph.labelPropagation]], 3 synchronous rounds,
    * co-occurrence-count edge weights, ties by label asc) — the
    * cluster structure a GraphRAG mixer budgets across, next to g04's
    * global importance. Integer-exact, so the oracle unrolls the same
    * three rounds with no float re-synchronization at all. */
  def graphCommunities(s: SparkSession, d: String): DataFrame = {
    val (reg, _) = buildGraph(s, d)
    val (ents, rels) =
      (reg.table(Graph.entityDef()), reg.table(Graph.relationDef()))
    // gate the whole trajectory, not just the fixed point: this dense
    // co-occurrence graph converges to ONE community by round 3 (the
    // correct LPA answer — every text would hash-match any other
    // single-community outcome except through the data-derived winning
    // label), while rounds 1-2 carry per-node, weight-dependent labels
    // that pin every argmax the algorithm took
    def at(i: Int) = Graph.labelPropagation(ents, rels, iters = i)
      .withColumnRenamed("community", s"c$i")
    at(1).join(at(2), "text").join(at(3), "text").orderBy(col("text").asc)
  }

  /** g07: triangle count + local clustering coefficient
    * ([[Graph.clusteringCoefficients]]) — the clique-ness lens next to
    * g04's importance and g05's membership: which entities sit in
    * tight co-mention cores vs bridge otherwise-separate clusters.
    * Degree-ordered wedge enumeration in the engine; the oracle
    * enumerates the same triangle set id-canonically (orientation-
    * invariant counts). Non-degeneracy pinned in-query: a graph with
    * zero triangles would let a broken wedge join pass silently. */
  def graphTriangles(s: SparkSession, d: String): DataFrame = {
    val (reg, _) = buildGraph(s, d)
    val (ents, rels) =
      (reg.table(Graph.entityDef()), reg.table(Graph.relationDef()))
    // one wedge-join execution serves the vacuity probe AND the
    // output (the r24-memoization lesson in single-call form: the
    // require used to re-execute the whole cc plan a second time)
    val cc = Graph.clusteringCoefficients(ents, rels)
      .localCheckpoint(true)
    require(cc.filter(col("triangles") > 0).limit(1).count() > 0,
      "g07 is vacuous: the entity graph has no triangle — the wedge " +
        "join was never exercised")
    cc.orderBy(col("cc").desc, col("triangles").desc, col("text").asc)
      .limit(20)
  }

  /** s16: the GRAPH streaming lifecycle — documents arrive in three
    * micro-batches and each batch merge-upserts into the stored
    * entity/relation tables through the SAME [[Graph
    * .mergeInsertEntities]]/[[Graph.mergeInsertRelations]] transaction
    * the batch path uses (`foreachBatch`, the incremental-KG ingest
    * shape: the graph is alive while the corpus streams in). Gated on
    * the merge outputs that are INVARIANT to arrival order — per
    * entity, chunk coverage (each doc contributes its uuid exactly
    * once across all batches) and total description mass
    * (`length(description)`: the same "\n"-joined line set regardless
    * of which batch carried each line) — so the oracle is the batch
    * build's entity CTE itself. Vectors re-embed per merge and track
    * batch-order-dependent line order; they are exercised, not gated. */
  /** The streamed 3-micro-batch graph build, memoized per (session,
    * corpus) — s16 gates the entity merge, s17 gates relation
    * orientation through PageRank; one streamed build serves both. */
  private val streamedBuilt =
    new graft.core.LruCache[(String, String), Registry](MaxCachedGraphs)

  private def buildGraphStreamed(s: SparkSession, d: String): Registry =
    streamedBuilt.getOrElseUpdate((graft.core.SessionId.of(s), d)) {
      buildGraphStreamedUncached(s, d)
    }

  private[graft] def streamedCachedCount: Int = streamedBuilt.size
  private[graft] def clearStreamedCache(): Unit = streamedBuilt.clear()

  private def buildGraphStreamedUncached(s: SparkSession,
                                         d: String): Registry = {
    import s.implicits._
    implicit val sc = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val reg = new Registry(s,
      Files.createTempDirectory("graft_s16").toString)
    val (entDef, relDef) = (Graph.entityDef(), Graph.relationDef())
    reg.register(entDef, relDef)
    val emb = Md5Embedder(dim = 32)
    val rows = documents(s, d).select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    val ckpt = Files.createTempDirectory("graft_s16_ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (ents, rels) = Graph.extractFromChunks(s, batch,
          "doc_id", "text", recognizer)
        reg.runTxn { txn =>
          Graph.mergeInsertEntities(reg, entDef, ents, emb, txn)
          Graph.mergeInsertRelations(reg, relDef, rels, emb, txn)
        }
        ()
      }
      .start()
    try {
      val batches = 3
      (0 until batches).foreach { b =>
        input.addData(rows.slice(b * rows.length / batches,
          (b + 1) * rows.length / batches): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    reg
  }

  def streamGraphTwin(s: SparkSession, d: String): DataFrame =
    buildGraphStreamed(s, d).table(Graph.entityDef())
      .select(col("text"), size(col("chunk_uuids")).as("n_chunks"),
        length(col("description")).as("n_desc_chars"))
      .orderBy(col("n_chunks").desc, col("text").asc)
      .limit(20)

  /** s17: PageRank over the STREAMED-built graph under g04's batch
    * oracle — the cross-call merge contract made executable: edges
    * (and so the whole rank vector) only match the all-at-once build
    * if a re-occurring relation pair keeps its EARLIEST orientation
    * across micro-batches (existing-wins in mergeInsertRelations;
    * before that fix a later batch silently flipped stored
    * orientations and this gate would fail). */
  def streamGraphPagerank(s: SparkSession, d: String): DataFrame =
    pagerankTop20(buildGraphStreamed(s, d), "s17")

  /** g06: personalized PageRank seeded by the fixed bench query's
    * recognized entities ({spark, filter, join} — the g02 query) —
    * importance relative to the question, the mixable signal next to
    * g04's global one. 3 rounds unrolled in the oracle with teleport
    * 1/3 on the three seed uids. */
  def graphPpr(s: SparkSession, d: String): DataFrame = {
    val (reg, _) = buildGraph(s, d)
    import s.implicits._
    val seeds = Seq("spark", "filter", "join")
      .map(t => graft.graph.Graph.entityUidScala(t)).toDF("uid")
    Graph.personalizedPageRank(reg.table(Graph.entityDef()),
        reg.table(Graph.relationDef()), seeds)
      .orderBy(col("pr").desc, col("text").asc)
      .limit(20)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g07_triangles" -> graphTriangles,
    "g06_personalized_pr" -> graphPpr,
    "s16_stream_graph_twin" -> streamGraphTwin,
    "s17_stream_graph_pagerank" -> streamGraphPagerank,
    "g01_entity_merge" -> entityMerge,
    "g02_graph_search" -> graphSearch,
    "g03_graph_entities" -> graphEntities,
    "g04_pagerank" -> graphPagerank,
    "g05_communities" -> graphCommunities)

  /** Shared oracle prefix: the FULL graph build + 2-hop search replayed
    * relationally — recognizer (sentence split → vocab hits → first-
    * occurrence entities + adjacent-pair relations, ord = (chunk uid,
    * emission index)), both merge-upserts (descriptions "\n"-joined in
    * ord order, relation orientation = arg_min(ord)), md5-feature-hash
    * embeddings as (bucket, weight) tables, and the two cosine top-k
    * hops (relations under the literal query relation text, entities
    * under the data-dependent concatenated entity text built by
    * string_agg in rank order). Deterministic end-to-end because the
    * Spark side derives every order from data, never partitioning. */
  private def g2Ctes: String = {
    def toksOf(s: String): String =
      s"list_filter(regexp_split_to_array(lower($s), '[^a-z0-9]+'), " +
        "x -> x != '')"
    def feats(toks: String): String =
      s"$toks || list_transform(range(len($toks) - 1), " +
        s"j -> ($toks)[j + 1] || ' ' || ($toks)[j + 2])"
    val h = "('0x' || substring(md5(f), 1, 8))::BIGINT"
    val dim = 32
    val ws = "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)"
    val vocab = Vocab.map(v => s"'$v'").mkString(",")
    s"""WITH
      ch AS (SELECT CAST(doc_id AS VARCHAR) AS uid, doc_id, text
             FROM documents),
      sent AS (
        SELECT uid, i AS si,
          trim(regexp_split_to_array(text, '[.!?\\n]+')[i + 1], $ws)
            AS sentence
        FROM (SELECT uid, text,
                unnest(range(len(regexp_split_to_array(text,
                  '[.!?\\n]+')))) AS i
              FROM ch)),
      sentok AS (SELECT uid, si, sentence FROM sent WHERE sentence != ''),
      hits0 AS (
        SELECT uid, si, sentence, j AS hi,
          regexp_split_to_array(sentence, '[^A-Za-z0-9]+')[j + 1] AS tok
        FROM (SELECT uid, si, sentence,
                unnest(range(len(regexp_split_to_array(sentence,
                  '[^A-Za-z0-9]+')))) AS j
              FROM sentok)),
      hits AS (SELECT * FROM hits0 WHERE tok IN ($vocab)),
      ents0 AS (
        SELECT uid, si, hi, sentence, tok,
          row_number() OVER (PARTITION BY uid, tok ORDER BY si, hi)
            AS occ
        FROM hits),
      ents1 AS (SELECT uid, tok, sentence, si, hi FROM ents0
                WHERE occ = 1),
      ents AS (
        SELECT uid, tok AS etext, sentence AS edesc,
          row_number() OVER (PARTITION BY uid ORDER BY si, hi) - 1 AS ei,
          count(*) OVER (PARTITION BY uid) AS ne
        FROM ents1),
      hr AS (
        SELECT uid, si, sentence, tok,
          row_number() OVER (PARTITION BY uid, si ORDER BY hi) AS rn
        FROM hits),
      rels0 AS (
        SELECT a.uid, a.si, a.rn, a.tok AS src, b.tok AS dst, a.sentence
        FROM hr a JOIN hr b ON a.uid = b.uid AND a.si = b.si
          AND b.rn = a.rn + 1
        WHERE a.tok != b.tok),
      rels AS (
        SELECT uid, src, dst, sentence AS rdesc,
          coalesce((SELECT any_value(ne) FROM ents e
                    WHERE e.uid = r.uid), 0)
            + row_number() OVER (PARTITION BY uid ORDER BY si, rn) - 1
            AS ri
        FROM rels0 r),
      entity AS (
        SELECT etext AS text,
          string_agg(edesc, chr(10)
            ORDER BY lpad(CAST(length(uid) AS VARCHAR), 3, '0') || uid
              || '#' || lpad(CAST(ei AS VARCHAR), 6, '0'))
            AS description,
          list(uid
            ORDER BY lpad(CAST(length(uid) AS VARCHAR), 3, '0') || uid
              || '#' || lpad(CAST(ei AS VARCHAR), 6, '0'))
            AS chunk_uuids,
          sha256(etext) AS uid
        FROM ents GROUP BY etext),
      relk AS (
        SELECT uid AS cuid, sha256(src) AS s, sha256(dst) AS t, rdesc,
          lpad(CAST(length(uid) AS VARCHAR), 3, '0') || uid || '#' ||
            lpad(CAST(ri AS VARCHAR), 6, '0') AS ord
        FROM rels),
      relation AS (
        SELECT least(s, t) || '|' || greatest(s, t) AS k,
          arg_min(s, ord) AS source, arg_min(t, ord) AS target,
          string_agg(rdesc, chr(10) ORDER BY ord) AS description,
          sha256(least(s, t) || '|' || greatest(s, t)) AS uid
        FROM relk GROUP BY least(s, t) || '|' || greatest(s, t)),
      ent_feat AS (
        SELECT uid, unnest(${feats("toks")}) AS f
        FROM (SELECT uid,
                ${toksOf("text || chr(10) || description")} AS toks
              FROM entity)),
      ent_w AS (
        SELECT uid, ($h // 2) % $dim AS bucket,
          sum(CASE WHEN $h % 2 = 0 THEN 1 ELSE -1 END) AS w
        FROM ent_feat GROUP BY 1, 2),
      ent_n AS (SELECT uid, sqrt(sum(w * w)) AS nrm FROM ent_w
                GROUP BY 1),
      rel_feat AS (
        SELECT uid, unnest(${feats("toks")}) AS f
        FROM (SELECT uid, ${toksOf("description")} AS toks
              FROM relation)),
      rel_w AS (
        SELECT uid, ($h // 2) % $dim AS bucket,
          sum(CASE WHEN $h % 2 = 0 THEN 1 ELSE -1 END) AS w
        FROM rel_feat GROUP BY 1, 2),
      rel_n AS (SELECT uid, sqrt(sum(w * w)) AS nrm FROM rel_w
                GROUP BY 1),
      qrel_feat AS (
        SELECT unnest(${feats("toks")}) AS f
        FROM (SELECT
          ${toksOf("'spark filter join spark filter join'")} AS toks)),
      qrel_w AS (
        SELECT ($h // 2) % $dim AS bucket,
          sum(CASE WHEN $h % 2 = 0 THEN 1 ELSE -1 END) AS qw
        FROM qrel_feat GROUP BY 1),
      qrel_n AS (SELECT sqrt(sum(qw * qw)) AS nq FROM qrel_w),
      simrel AS (
        SELECT r.uid, r.source, r.target,
          round(1 - coalesce(d.dot, 0) /
            (rn.nrm * (SELECT nq FROM qrel_n)), 6) AS dist
        FROM relation r
        JOIN rel_n rn ON rn.uid = r.uid
        LEFT JOIN (SELECT w.uid, sum(w.w * q.qw) AS dot
                   FROM rel_w w JOIN qrel_w q USING (bucket)
                   GROUP BY 1) d ON d.uid = r.uid
        ORDER BY dist ASC, r.uid ASC LIMIT 10),
      simrel_ranked AS (
        SELECT uid, source, target,
          row_number() OVER (ORDER BY dist ASC, uid ASC) AS rrank
        FROM simrel),
      pairs AS (
        SELECT source AS u, rrank * 2 - 1 AS pos FROM simrel_ranked
        UNION ALL
        SELECT target, rrank * 2 FROM simrel_ranked),
      entuids AS (
        SELECT u, row_number() OVER (ORDER BY min(pos)) AS urank
        FROM pairs GROUP BY u),
      ent_text_parts AS (
        SELECT t || ' ' || d AS part, seq FROM (
          SELECT 'spark' AS t, 'spark filter join' AS d, 1 AS seq
          UNION ALL SELECT 'filter', 'spark filter join', 2
          UNION ALL SELECT 'join', 'spark filter join', 3
          UNION ALL
          SELECT e.text, e.description, 3 + eu.urank
          FROM entuids eu JOIN entity e ON e.uid = eu.u)),
      ent_text AS (SELECT string_agg(part, ' ' ORDER BY seq) AS s
                   FROM ent_text_parts),
      qent_feat AS (
        SELECT unnest(${feats("toks")}) AS f
        FROM (SELECT ${toksOf("(SELECT s FROM ent_text)")} AS toks)),
      qent_w AS (
        SELECT ($h // 2) % $dim AS bucket,
          sum(CASE WHEN $h % 2 = 0 THEN 1 ELSE -1 END) AS qw
        FROM qent_feat GROUP BY 1),
      qent_n AS (SELECT sqrt(sum(qw * qw)) AS nq FROM qent_w),
      siment AS (
        SELECT e.uid, e.text, e.chunk_uuids,
          round(1 - coalesce(d.dot, 0) /
            (en.nrm * (SELECT nq FROM qent_n)), 6) AS dist
        FROM entity e
        JOIN ent_n en ON en.uid = e.uid
        LEFT JOIN (SELECT w.uid, sum(w.w * q.qw) AS dot
                   FROM ent_w w JOIN qent_w q USING (bucket)
                   GROUP BY 1) d ON d.uid = e.uid
        ORDER BY dist ASC, e.uid ASC LIMIT 10),
      siment_ranked AS (
        SELECT uid, text, chunk_uuids, dist,
          row_number() OVER (ORDER BY dist ASC, uid ASC) AS erank
        FROM siment)"""
  }

  /** g04's unrolled PageRank replay — shared verbatim by s17. */
  private def G04OracleSql: String =
    s"""$g2Ctes,
        nn AS (SELECT count(*) AS n FROM entity),
        outd AS (SELECT source, count(*) AS od FROM relation GROUP BY 1),
        pr0 AS (SELECT uid, 1.0 / (SELECT n FROM nn) AS pr FROM entity),
        pr1 AS (
          SELECT e.uid, round(0.15 / (SELECT n FROM nn) +
            0.85 * coalesce(c.s, 0), 9) AS pr
          FROM entity e LEFT JOIN (
            SELECT r.target AS uid, sum(p.pr / o.od) AS s
            FROM relation r JOIN outd o ON o.source = r.source
            JOIN pr0 p ON p.uid = r.source GROUP BY 1) c
            ON c.uid = e.uid),
        pr2 AS (
          SELECT e.uid, round(0.15 / (SELECT n FROM nn) +
            0.85 * coalesce(c.s, 0), 9) AS pr
          FROM entity e LEFT JOIN (
            SELECT r.target AS uid, sum(p.pr / o.od) AS s
            FROM relation r JOIN outd o ON o.source = r.source
            JOIN pr1 p ON p.uid = r.source GROUP BY 1) c
            ON c.uid = e.uid),
        pr3 AS (
          SELECT e.uid, round(0.15 / (SELECT n FROM nn) +
            0.85 * coalesce(c.s, 0), 9) AS pr
          FROM entity e LEFT JOIN (
            SELECT r.target AS uid, sum(p.pr / o.od) AS s
            FROM relation r JOIN outd o ON o.source = r.source
            JOIN pr2 p ON p.uid = r.source GROUP BY 1) c
            ON c.uid = e.uid)
        SELECT e.text, round(p.pr, 6) AS pr
        FROM pr3 p JOIN entity e USING (uid)
        ORDER BY pr DESC, text ASC LIMIT 20"""

  val oracles: Map[String, String] = Map(
    "g02_graph_search" ->
      s"""$g2Ctes,
        cu AS (
          SELECT chunk_uuids[j + 1] AS u, erank, j
          FROM (SELECT chunk_uuids, erank,
                  unnest(range(len(chunk_uuids))) AS j
                FROM siment_ranked)),
        chunk_ranked AS (
          SELECT u,
            row_number() OVER (ORDER BY min(erank * 1000000 + j))
              AS crank
          FROM cu GROUP BY u)
        SELECT d.doc_id, CAST(c.crank AS INT) AS g_rank
        FROM chunk_ranked c JOIN ch d ON d.uid = c.u
        WHERE c.crank <= 10
        ORDER BY g_rank""",
    "g03_graph_entities" ->
      s"""$g2Ctes
        SELECT text, dist FROM siment_ranked ORDER BY erank""",
    // g04: the three PageRank iterations unrolled over the same merged
    // entity/relation CTEs — leaky-dangling variant, per-iteration
    // round(9) re-synchronizing float drift, final round(6). Keyed by
    // entity UID throughout: relation endpoints live in the sha256-uid
    // space (relk CTE), NOT the text space — the text-keyed form of
    // this oracle silently agreed with a text-keyed Spark join on an
    // all-teleport constant (the round-12 g04 vacuity bug).
    "g04_pagerank" -> G04OracleSql,
    // s17: the STREAMED build must land on the identical rank
    // vector — the batch oracle verbatim (shared, the s07-s16
    // lifecycle-twin pattern); sensitive to relation ORIENTATION
    // through outdeg, which is exactly the cross-call contract
    // it gates.
    "s17_stream_graph_pagerank" -> G04OracleSql,
    // g06: personalized teleport 1/3 on the three seed TEXTS (uid =
    // sha256(text), consistent inside the oracle), pr0 = teleport,
    // rounds keyed by uid like g04.
    "g06_personalized_pr" -> {
      def pprRound(i: Int) =
        s"""ppr$i AS (
            SELECT e.uid, round(0.15 * t.t +
              0.85 * coalesce(c.s, 0), 9) AS pr
            FROM entity e JOIN tele t USING (uid) LEFT JOIN (
              SELECT r.target AS uid, sum(p.pr / o.od) AS s
              FROM relation r JOIN outd o ON o.source = r.source
              JOIN ppr${i - 1} p ON p.uid = r.source GROUP BY 1) c
              ON c.uid = e.uid)"""
      s"""$g2Ctes,
        outd AS (SELECT source, count(*) AS od FROM relation GROUP BY 1),
        tele AS (SELECT uid,
                   CASE WHEN text IN ('spark', 'filter', 'join')
                     THEN 1.0 / 3 ELSE 0.0 END AS t
                 FROM entity),
        ppr0 AS (SELECT uid, t AS pr FROM tele),
        ${pprRound(1)},
        ${pprRound(2)},
        ${pprRound(3)}
        SELECT e.text, round(p.pr, 6) AS pr
        FROM ppr3 p JOIN entity e USING (uid)
        ORDER BY pr DESC, text ASC LIMIT 20"""
    },
    // g07: the id-canonical triangle enumeration — undirected distinct
    // pairs a<b, triangles as the a<b<c triple join (the engine's
    // degree-ordered wedges enumerate the SAME set, counts are
    // orientation-invariant), per-node counts over the three roles,
    // cc = 2·tri/(deg·(deg−1)) with deg<2 pinned to 0.
    "g07_triangles" ->
      s"""$g2Ctes,
        und AS (
          SELECT DISTINCT least(source, target) AS a,
                 greatest(source, target) AS b
          FROM relation WHERE source != target),
        deg AS (
          SELECT node, count(*) AS degree FROM (
            SELECT a AS node FROM und
            UNION ALL SELECT b FROM und) GROUP BY 1),
        tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM und e1
          JOIN und e2 ON e2.a = e1.b
          JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
        trin AS (
          SELECT node, count(*) AS triangles FROM (
            SELECT x AS node FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri) GROUP BY 1)
        SELECT e.text, d.degree, coalesce(t.triangles, 0) AS triangles,
               CASE WHEN d.degree >= 2 THEN
                 round(2.0 * coalesce(t.triangles, 0)
                   / (d.degree * (d.degree - 1)), 6)
               ELSE 0.0 END AS cc
        FROM deg d
        JOIN entity e ON e.uid = d.node
        LEFT JOIN trin t ON t.node = d.node
        ORDER BY cc DESC, triangles DESC, text ASC LIMIT 20""",
    // g05: the three synchronous weighted-LPA rounds unrolled, uid-
    // keyed like g04 — edge weight = merged description line count,
    // argmax by (weighted sum desc, label asc), isolated nodes keep
    // their label. All-integer weights: nothing to round anywhere.
    "g05_communities" -> {
      def round(i: Int) =
        s"""pick$i AS (SELECT t AS uid, label FROM (
              SELECT e.t, l.label,
                row_number() OVER (PARTITION BY e.t
                  ORDER BY sum(e.w) DESC, l.label ASC) AS rk
              FROM und e JOIN lab${i - 1} l ON l.uid = e.s
              GROUP BY e.t, l.label) WHERE rk = 1),
            lab$i AS (SELECT n.uid, coalesce(p.label, n.label) AS label
                      FROM lab${i - 1} n LEFT JOIN pick$i p USING (uid))"""
      s"""$g2Ctes,
        und AS (
          SELECT source AS s, target AS t,
                 len(string_split(description, chr(10))) AS w
          FROM relation
          UNION ALL
          SELECT target, source,
                 len(string_split(description, chr(10)))
          FROM relation),
        lab0 AS (SELECT uid, text AS label FROM entity),
        ${round(1)},
        ${round(2)},
        ${round(3)}
        SELECT e.text, l1.label AS c1, l2.label AS c2, l3.label AS c3
        FROM entity e JOIN lab1 l1 USING (uid)
        JOIN lab2 l2 USING (uid) JOIN lab3 l3 USING (uid)
        ORDER BY e.text ASC"""
    },
    // s16: the BATCH entity CTE is the oracle for the streamed build —
    // chunk coverage and description mass are arrival-order-invariant,
    // so three merge-upserting micro-batches must land exactly here.
    "s16_stream_graph_twin" ->
      s"""$g2Ctes
        SELECT text, CAST(len(chunk_uuids) AS INT) AS n_chunks,
               CAST(length(description) AS INT) AS n_desc_chars
        FROM entity
        ORDER BY n_chunks DESC, text ASC LIMIT 20""",
    "g01_entity_merge" ->
      s"""SELECT token AS text, CAST(COUNT(DISTINCT doc_id) AS INTEGER) AS n_chunks
         FROM (
           SELECT doc_id,
                  unnest(list_filter(
                    regexp_split_to_array(text, '[^A-Za-z0-9]+'),
                    t -> list_contains(
                      [${Vocab.map(v => s"'$v'").mkString(", ")}], t)))
                    AS token
           FROM documents)
         GROUP BY 1
         ORDER BY n_chunks DESC, text ASC
         LIMIT 20""")
}
