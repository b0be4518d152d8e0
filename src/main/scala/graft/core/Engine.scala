package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Spec._
import graft.functions.Vec
import graft.ops.{Ann, Bm25}

/** Typed search surface over a [[Registry]] — the Spark twin of
  * `VechordRegistry.search_by_vector` / `search_by_multivec` /
  * `search_by_keyword` (/root/reference/vechord/registry.py:190-302):
  * resolves the table's index declarations, applies the reference's
  * defaults (projection excludes vector/keyword payloads; probes default
  * ceil(lists/16), client.py:285-292; maxsim_refine default 1000,
  * registry.py:233), and returns ranked partial rows.
  */
final class Engine(reg: Registry) {

  /** Dense top-k. With a [[Spec.VectorIndex]] whose `lists` > 0 an IVF
    * model built by [[buildIndex]] prunes cells with `probes` (explicit,
    * else ceil(lists/16)); otherwise exact brute-force top-k. A
    * `quantized` index additionally scans 8-bit codes within the probed
    * cells and exact-re-ranks the top-(topk·refine) survivors — the
    * vchordrq in-index quantization (spec.py:437-444) at engine level.
    * `refine <= 0` = auto: 8 (the engine default), raised to
    * [[Ann.defaultBitqRefine]] for spherical 1-bit indexes (the
    * measured recall floor — see that scaladoc). An `mrlDims` > 0
    * index runs the matryoshka two-phase instead (flat prefix cut +
    * exact re-rank); there `refine` is the candidate MULTIPLIER with
    * auto = 5 (matching
    * [[graft.plans.AnnIndex.registerMatryoshka]]'s default). */
  def searchByVector(td: TableDef[_], queryVec: Seq[Double], topk: Int = 10,
                     probes: Int = 0, refine: Int = -1,
                     returnFields: Seq[String] = Nil,
                     filter: Option[Column] = None): DataFrame = {
    val ix = td.vectorIndex.getOrElse(
      throw new IllegalStateException(s"${td.name} has no vector index"))
    val fields = if (returnFields.nonEmpty) returnFields else td.nonVecColumns
    val q = typedlit(queryVec)
    val base = reg.table(td)
    // `filter`: the metadata WHERE the reference's query_vec lacks
    // (registry.py:190-225 takes no predicate) but corpus curation
    // needs — the r52 contract: the predicate thins which docs can be
    // RETURNED (applied before every top-k/phase-1 cut, so disallowed
    // docs never consume candidate slots), never how anything is
    // scored; selective predicates are compensated with `probes` /
    // `refine`, the reference's own knobs. Quantized layouts carry
    // only (pk, codes, cell), so the predicate evaluates on the base
    // table and reaches them as a pk semi-join.
    def allowed(df: DataFrame): DataFrame =
      allowedBy(td, base, filter)(df)
    val ranked =
      indexModel(td) match {
        case Some(model) if ix.lists > 0 && ix.oneBit =>
          val p = if (probes > 0) probes
            else math.ceil(ix.lists / 16.0).toInt.max(1)
          val idx = ivfBitqCached(td, ix, model)
          Ann.searchIvfBitq(idx.copy(quantized = allowed(idx.quantized)),
            td.pk, ix.column, q, ix.distance, p, topk,
            autoBitqRefine(ix, refine))
        case Some(model) if ix.lists > 0 && ix.quantized =>
          val p = if (probes > 0) probes
            else math.ceil(ix.lists / 16.0).toInt.max(1)
          val idx = ivfSqCached(td, ix, model)
          Ann.searchIvfSq(idx.copy(quantized = allowed(idx.quantized)),
            td.pk, ix.column, q, ix.distance, p, topk,
            autoSqRefine(refine))
        case Some(model) if ix.lists > 0 && ix.pq > 0 =>
          val p = if (probes > 0) probes
            else math.ceil(ix.lists / 16.0).toInt.max(1)
          val idx = ivfPqCached(td, ix, model)
          Ann.searchIvfPq(idx.copy(encoded = allowed(idx.encoded)),
            td.pk, ix.column, queryVec, ix.distance, p, topk,
            autoSqRefine(refine))
        case Some(model) if ix.lists > 0 && ix.mrlDims > 0 =>
          // the COMPOSED index on the engine surface (the r78 shape
          // declaratively: cells prune first, the prefix cut runs
          // within probed cells, the re-rank at full precision) —
          // probe like the plain IVF branch, cut like the matryoshka
          // one; `refine` stays the candidate multiplier.
          // Cosine probes NORMALIZED centroids with L2 — the ONE probe
          // convention Ann.matryoshkaTopKIvf uses (spherical IVF:
          // monotone-equivalent to raw-cosine but not bit-identical on
          // floating-point near-ties; the two paths must pick the SAME
          // cells)
          val p = if (probes > 0) probes
            else math.ceil(ix.lists / 16.0).toInt.max(1)
          val (probeModel, qProbe) = ix.distance match {
            case Ann.Cosine =>
              (Ann.normalizeModel(model),
                typedlit(Ann.normalizeSeq(queryVec)))
            case _ => (model, q)
          }
          val pruned = allowed(assignedCached(td, ix, model))
            .join(org.apache.spark.sql.functions.broadcast(
              Ann.probeCells(probeModel, qProbe, Ann.L2, p)),
              Seq(model.idCol))
          val cand = topk * (if (refine > 0) refine else 5)
          Ann.matryoshkaTopK(pruned, td.pk, ix.column, queryVec,
            ix.mrlDims, cand.max(topk), topk, metric = ix.distance)
        case Some(model) if ix.lists > 0 =>
          val p = if (probes > 0) probes
            else math.ceil(ix.lists / 16.0).toInt.max(1)
          val assigned = assignedCached(td, ix, model)
          Ann.searchIvf(allowed(assigned), td.pk, ix.column, model, q,
            ix.distance, p, topk)
        case _ if ix.mrlDims > 0 =>
          // matryoshka two-phase: `refine` is the candidate multiplier
          // (the quantized families' knob — candidates = topk·refine,
          // default 5 matching AnnIndex.registerMatryoshka); the
          // predicate thins the corpus BEFORE the prefix cut (the
          // family's no-starvation contract)
          val cand = topk * (if (refine > 0) refine else 5)
          Ann.matryoshkaTopK(filter.fold(base)(base.filter), td.pk,
            ix.column, queryVec, ix.mrlDims, cand.max(topk), topk,
            metric = ix.distance)
        case _ =>
          Ann.topK(filter.fold(base)(base.filter), td.pk, ix.column,
            q, ix.distance, topk)
      }
    // the quantized searchers return (pk, dist) only — join the top-k
    // back to the base table when the caller wants more columns (k
    // rows, broadcast; re-sorted to keep the ranked order)
    val need = fields :+ "dist"
    val out =
      if (need.forall(ranked.columns.contains)) ranked
      else base
        .join(broadcast(ranked.select(col(td.pk), col("dist"))), td.pk)
        .orderBy(col("dist").asc, col(td.pk).asc)
    out.select(need.map(col): _*)
  }

  /** The ONE metadata-filter thinning shared by the single-query and
    * BATCH search surfaces (the r52/c08 contract): the predicate
    * evaluates on the BASE table (index frames carry only codes/
    * assignments) and reaches the index frame as a pk semi-join —
    * thinning what can be returned BEFORE any cut, never how anything
    * is scored. */
  private def allowedBy(td: TableDef[_], base: DataFrame,
                        filter: Option[Column])
                       (df: DataFrame): DataFrame = filter match {
    case None => df
    case Some(pred) =>
      df.join(base.filter(pred).select(col(td.pk)), Seq(td.pk),
        "left_semi")
  }

  /** The engine-default exact-re-rank budgets, shared by
    * [[searchByVector]] and [[installDeclarative]] so the declarative
    * and imperative paths return identical results at defaults. */
  private def autoSqRefine(refine: Int): Int =
    if (refine > 0) refine else 8
  private def autoBitqRefine(ix: VectorIndex, refine: Int): Int =
    if (refine > 0) refine else Ann.defaultBitqRefine(ix.distance).max(8)

  /** BATCH dense top-k — the query-log replay form of
    * [[searchByVector]]: one distributed job for the whole query frame
    * instead of per-query driver round-trips (the shape an eval loop
    * runs at 100 TB — reference analog: the retrieval loops of
    * examples/anthropic.py:205-225, one `query_vec` per question).
    * Delegates to the already-oracled batch operators
    * ([[graft.ops.Ann.knnJoin]] exact, [[graft.ops.Ann.knnJoinIvf]] /
    * `knnJoinIvfSq` / `knnJoinIvfPq(Cos)` / `knnJoinIvfBitq` under the
    * table's declared index), so the per-query results are
    * bit-identical to `searchByVector`'s and the shuffle is
    * corpus-partitioned, never Q×driver. Matryoshka and composed
    * matryoshka-IVF tables ride [[graft.ops.Ann.knnJoinMrl]] /
    * [[graft.ops.Ann.knnJoinMrlIvf]] (per-query probed cells, a
    * prefix-only phase 1, exact re-rank per query — `refine` stays
    * the candidate multiplier there, auto 5). Returns
    * (qIdCol, td.pk, dist, rank), rank 1-based per query, ties
    * (dist, pk asc). */
  def searchByVectorBatch(td: TableDef[_], rawQueries: DataFrame,
                          qIdCol: String, qVecCol: String,
                          topk: Int = 10, probes: Int = 0,
                          refine: Int = -1,
                          filter: Option[Column] = None): DataFrame = {
    val ix = td.vectorIndex.getOrElse(
      throw new IllegalStateException(s"${td.name} has no vector index"))
    Seq(qIdCol, qVecCol).foreach(c =>
      require(c != td.pk && c != ix.column,
        s"batch query column '$c' collides with ${td.name}'s " +
          s"'${td.pk}'/'${ix.column}' — rename the query frame's " +
          "columns"))
    // project the frame down to exactly (qIdCol, qVecCol): a stray
    // extra query column that happens to collide with a corpus column
    // would otherwise surface as an ambiguous-column analysis error
    // deep inside the knnJoin operators instead of here
    val queries = rawQueries.select(col(qIdCol), col(qVecCol))
    val base = reg.table(td)
    // `filter`: the c08/c12 contract extended to the batch surface —
    // the predicate thins the frames FEEDING phase 1 (disallowed docs
    // never consume any query's candidate slots), scoring untouched;
    // per-family placement identical to searchByVector's
    def allowed(df: DataFrame): DataFrame =
      allowedBy(td, base, filter)(df)
    def p = if (probes > 0) probes
      else math.ceil(ix.lists / 16.0).toInt.max(1)
    indexModel(td) match {
      case Some(model) if ix.lists > 0 && ix.oneBit =>
        val idx = ivfBitqCached(td, ix, model)
        Ann.knnJoinIvfBitq(queries, qIdCol, qVecCol,
          idx.copy(quantized = allowed(idx.quantized)), td.pk,
          ix.column, ix.distance, p, topk, autoBitqRefine(ix, refine))
      case Some(model) if ix.lists > 0 && ix.quantized =>
        val idx = ivfSqCached(td, ix, model)
        Ann.knnJoinIvfSq(queries, qIdCol, qVecCol,
          idx.copy(quantized = allowed(idx.quantized)), td.pk,
          ix.column, ix.distance, p, topk, autoSqRefine(refine))
      case Some(model) if ix.lists > 0 && ix.pq > 0 =>
        val idx = ivfPqCached(td, ix, model)
        val fidx = idx.copy(encoded = allowed(idx.encoded))
        if (ix.distance == Ann.Cosine)
          Ann.knnJoinIvfPqCos(queries, qIdCol, qVecCol, fidx, td.pk,
            ix.column, p, topk, autoSqRefine(refine))
        else
          Ann.knnJoinIvfPq(queries, qIdCol, qVecCol, fidx, td.pk,
            ix.column, p, topk, autoSqRefine(refine))
      case Some(model) if ix.lists > 0 && ix.mrlDims > 0 =>
        // the COMPOSED index's batch form — cells prune per query,
        // the prefix cut runs within each query's probed cells, the
        // re-rank at full precision; `refine` stays the candidate
        // MULTIPLIER (auto 5), exactly the single-query branch
        val cand = topk * (if (refine > 0) refine else 5)
        Ann.knnJoinMrlIvf(queries, qIdCol, qVecCol,
          allowed(assignedCached(td, ix, model)), td.pk, ix.column,
          model, ix.mrlDims, ix.distance, p, cand.max(topk), topk)
      case Some(model) if ix.lists > 0 =>
        Ann.knnJoinIvf(queries, qIdCol, qVecCol,
          allowed(assignedCached(td, ix, model)), td.pk, ix.column,
          model, ix.distance, p, topk)
      case _ if ix.mrlDims > 0 =>
        // flat matryoshka batch: phase 1 is the exact batch join over
        // the prefix columns, phase 2 the per-query full-precision
        // re-rank — `refine` the candidate multiplier (auto 5)
        val cand = topk * (if (refine > 0) refine else 5)
        Ann.knnJoinMrl(queries, qIdCol, qVecCol,
          filter.fold(base)(base.filter), td.pk,
          ix.column, ix.mrlDims, cand.max(topk), topk,
          metric = ix.distance)
      case _ =>
        Ann.knnJoin(queries, qIdCol, qVecCol,
          filter.fold(base)(base.filter), td.pk, ix.column,
          ix.distance, topk)
    }
  }

  /** Multi-vector maxsim top-k (registry.py:227-267) with the two-phase
    * `refine` knob: when 0 < refine < table size, a cheap first phase
    * scores each doc against the query-token centroid (one dot per doc)
    * and only the top-`refine` candidates get exact maxsim — the
    * batch twin of `vchordrq.maxsim_refine` full-precision rescoring. */
  def searchByMultivec(td: TableDef[_], queryVecs: Seq[Seq[Double]],
                       topk: Int = 10, refine: Int = 1000,
                       probes: Int = 0,
                       returnFields: Seq[String] = Nil,
                       filter: Option[Column] = None): DataFrame = {
    val mvIx = td.indexes.collectFirst { case ix: MultiVectorIndex => ix }
    val mvCol = mvIx.map(_.column)
      .orElse(td.multiVectorColumns.headOption)
      .getOrElse(throw new IllegalStateException(
        s"${td.name} has no multivector column"))
    val fields = if (returnFields.nonEmpty) returnFields else td.nonVecColumns
    if (queryVecs.isEmpty) throw new IllegalArgumentException(
      s"searchByMultivec on ${td.name}: empty query (no token vectors)")
    if (queryVecs.exists(_.length != queryVecs.head.length))
      throw new IllegalArgumentException(
        s"searchByMultivec on ${td.name}: ragged query token vectors " +
          s"(widths ${queryVecs.map(_.length).distinct.mkString(",")})")
    val base = reg.table(td)
    // `filter`: the family contract (r60's maxsim member) — the
    // predicate thins the frames FEEDING phase 1, so disallowed docs
    // never consume refine/probe candidate slots; scoring unchanged
    def allowedF(df: DataFrame): DataFrame = filter match {
      case None => df
      case Some(pred) =>
        df.join(base.filter(pred).select(col(td.pk)), Seq(td.pk),
          "left_semi")
    }
    val q = typedlit(queryVecs)
    val dim = queryVecs.head.length
    val centroid = Ann.queryCentroid(queryVecs)
    // phase-1 must hand the re-rank at least topk candidates — the
    // declarative twin's math.max(entry.refine, k) guard
    val rf = if (refine > 0) math.max(refine, topk) else refine
    // with a LISTS-built multivec IVF (buildIndex), phase-1 scans only
    // the `probes` cells nearest the query-token centroid — and only
    // the persisted mean column — instead of every doc's token matrix
    val ivfPhase1 = for {
      ix <- mvIx if ix.lists > 0 && rf > 0
      model <- mvIndexModel(td)
    } yield {
      val p = if (probes > 0) probes
        else math.ceil(ix.lists / 16.0).toInt.max(1)
      val ids = Ann.maxsimCandidatesIvf(
          allowedF(mvAssignedCached(td, ix, model)),
          td.pk, MvMeanCol, model, queryVecs, rf, p)
        .withColumnRenamed(td.pk, "__cand_id")
      base.join(broadcast(ids), col(td.pk) === col("__cand_id"),
        "left_semi")
    }
    // base filters directly (the searchByVector idiom — pred names
    // base's own columns, so it pushes into the scan); allowedF is
    // only for the ASSIGNED frame, which lacks the predicate columns
    val baseAllowed = filter.fold(base)(base.filter)
    val candidates = ivfPhase1.getOrElse {
      if (rf > 0) {
        baseAllowed.withColumn("__approx",
            Vec.dot(Ann.flattenMean(col(mvCol), dim), typedlit(centroid)))
          .orderBy(col("__approx").desc, col(td.pk).asc)
          .limit(rf)
          .drop("__approx")
      } else baseAllowed
    }
    candidates
      .withColumn("score", round(org.apache.spark.sql.graft.VecExprs
        .maxSimDot(q, col(mvCol)), 6))
      .orderBy(col("score").desc, col(td.pk).asc)
      .limit(topk)
      .select((fields :+ "score").map(col): _*)
  }

  /** BM25 keyword top-k (registry.py:269-302): builds/reuses the side
    * tables for the column's declared tokenizer model. The index is
    * memoized per table VERSION (the segment manifest) — it lives until
    * the table is written again, the create_index-once / query-many
    * split of client.py:146-174 vs 356-380. */
  def searchByKeyword(td: TableDef[_], query: String, topk: Int = 10,
                      returnFields: Seq[String] = Nil,
                      filter: Option[Column] = None): DataFrame = {
    val fields = if (returnFields.nonEmpty) returnFields else td.nonVecColumns
    val kw = td.keywordIndex.getOrElse(
      throw new IllegalStateException(s"${td.name} has no keyword index"))
    val idx = keywordIndex(td)
    // `filter`: the searchByVector metadata WHERE, keyword form — the
    // r58 contract: corpus statistics (df, N, avgdl) stay WHOLE-corpus
    // (scores of surviving docs identical to the unfiltered search),
    // the predicate only thins which docs can be returned, applied
    // BEFORE the top-k cut so disallowed docs never consume slots
    val hits = (filter match {
      case None => Bm25.search(idx, query, topk)
      case Some(pred) => Bm25.searchFiltered(idx, query, topk,
        reg.table(td).filter(pred), td.pk)
    }).withColumnRenamed("id", "__hit_id")
    joinHitsBack(td, hits, fields)
  }

  /** BATCH keyword top-k — [[searchByVectorBatch]]'s keyword twin and
    * the engine surface over the already-oracled
    * [[graft.ops.Bm25.searchBatch]]: every query row scores in ONE
    * distributed job against the table's memoized index (stats join
    * broadcast, postings pruned to the batch's distinct terms), the
    * eval-loop shape at scale. Returns (qid, id, score, rank) —
    * searchBatch's normalized column contract. */
  def searchByKeywordBatch(td: TableDef[_], queries: DataFrame,
                           qIdCol: String, qTextCol: String,
                           topk: Int = 10,
                           filter: Option[Column] = None): DataFrame = {
    require(td.keywordIndex.nonEmpty,
      s"${td.name} has no keyword index")
    // `filter`: the r58/c12 contract on the batch surface — corpus
    // stats stay WHOLE-corpus, the predicate thins returns before
    // every query's cut (Bm25.searchBatchFiltered)
    filter match {
      case None =>
        Bm25.searchBatch(keywordIndex(td), queries, qIdCol, qTextCol,
          topk)
      case Some(pred) =>
        Bm25.searchBatchFiltered(keywordIndex(td), queries, qIdCol,
          qTextCol, topk, reg.table(td).filter(pred), td.pk)
    }
  }

  /** Shared hits→payload join for the keyword/sparse searches. The
    * result carries the reserved `score` column, so a table declaring
    * its own `score` (or `__hit_id`) would make the projection
    * ambiguous — refuse loudly instead of an AnalysisException. */
  private def joinHitsBack(td: TableDef[_], hits: DataFrame,
                           fields: Seq[String]): DataFrame = {
    Seq("score", "__hit_id").foreach(c => require(!td.columns.contains(c),
      s"${td.name} declares reserved column '$c' — rename it or " +
        "project it away before searching"))
    reg.table(td)
      .join(broadcast(hits), col(td.pk) === col("__hit_id"))
      .orderBy(col("score").desc, col(td.pk).asc)
      .select((fields :+ "score").map(col): _*)
  }

  /** The table's BM25 side tables, memoized per table VERSION (the
    * resolver behind [[searchByKeyword]] and the declarative keyword
    * registration in [[installDeclarative]]). */
  def keywordIndex(td: TableDef[_]): Bm25.Bm25Index = {
    val kw = td.keywordIndex.getOrElse(
      throw new IllegalStateException(s"${td.name} has no keyword index"))
    val tok = graft.functions.Tokenizers.all.getOrElse(kw.model,
      graft.functions.Tokenizers.Simple)
    val version = reg.segDigest(td.name)
    val key = s"kw|${reg.instanceId}|${td.name}|" +
      s"${kw.column}|$version"
    Bm25.buildCached(reg.table(td), td.pk, kw.column, key, tok)
  }

  /** Scalar BM25 score column for a declarative keyword query over the
    * table (stats bound from the current version's index —
    * [[Bm25.scoreColumn]]). Call per query: the returned column
    * freezes this version's corpus stats, so a column retained across
    * table writes goes stale (the registered candidate phase does NOT
    * — it re-resolves per rewrite). */
  def keywordScoreColumn(td: TableDef[_], query: String,
                         roundTo: Int = 6): org.apache.spark.sql.Column =
    Bm25.scoreColumn(keywordIndex(td), query,
      col(td.keywordIndex.get.column), roundTo)

  private def sparseIx(td: TableDef[_]): Spec.SparseIndex =
    td.indexes.collectFirst { case s: Spec.SparseIndex => s }
      .getOrElse(throw new IllegalStateException(
        s"${td.name} has no sparse index"))

  /** Inverted sparse postings for the table's [[Spec.SparseIndex]] —
    * one row per non-zero, the index FORM of the sparse column and the
    * resolver behind the declarative registration (a lazy plan over
    * the CURRENT table version, so post-install writes stay
    * visible). */
  def sparsePostings(td: TableDef[_]): DataFrame = {
    val ix = sparseIx(td)
    graft.functions.Sparse.invertedPostings(reg.table(td), td.pk,
      ix.column, ix.valuesColumn)
  }

  /** Scalar sparse score column for a declarative query over the
    * table's sparse index — the [[keywordScoreColumn]] sibling: a
    * plain `orderBy(col.desc).limit(k)` over this column rewrites
    * (after [[installDeclarative]]) into the inverted-postings
    * candidate semi-join. */
  def sparseScoreColumn(td: TableDef[_],
                        query: graft.functions.SparseVec,
                        roundTo: Int = 6): org.apache.spark.sql.Column = {
    val ix = sparseIx(td)
    round(graft.functions.Sparse.scoreColumn(col(ix.column),
      col(ix.valuesColumn), query), roundTo)
  }

  /** BATCH sparse top-k — [[searchByVectorBatch]]'s sparse member,
    * the engine surface over the already-oracled
    * [[graft.functions.Sparse.invertedTopKBatch]]: every query's
    * buckets join the table's inverted postings in ONE job (a query
    * touches only its own buckets' posting lists, never the corpus
    * rows). The query frame carries its own (indices, values) sparse
    * columns. Returns (qid, id, score, rank). */
  def searchBySparseBatch(td: TableDef[_], queries: DataFrame,
                          qIdCol: String, qIdxCol: String,
                          qValCol: String, topk: Int = 10,
                          filter: Option[Column] = None): DataFrame = {
    // `filter`: the r59 contract on the batch surface — a pure dot
    // has no corpus statistics to protect, so the predicate thins the
    // POSTINGS feeding the scoring join (surviving scores identical,
    // no rank slot consumed by a disallowed doc)
    val posts = filter match {
      case None => sparsePostings(td)
      case Some(pred) => sparsePostings(td)
        .join(reg.table(td).filter(pred)
          .select(col(td.pk).as("id")), Seq("id"), "left_semi")
    }
    graft.functions.Sparse.invertedTopKBatch(posts,
      queries, qIdCol, qIdxCol, qValCol, topk)
  }

  /** Sparse top-k through the inverted postings (the imperative
    * sibling of [[searchByVector]]/[[searchByKeyword]] for the sparse
    * column): query-bucket join + per-doc sum, top-k joined back for
    * the payload fields. */
  def searchBySparse(td: TableDef[_], query: graft.functions.SparseVec,
                     topk: Int = 10,
                     returnFields: Seq[String] = Nil,
                     filter: Option[Column] = None): DataFrame = {
    val fields = if (returnFields.nonEmpty) returnFields
      else td.nonVecColumns
    // `filter`: the family contract (r59's sparse member) — a pure
    // dot has no corpus statistics to protect, so the predicate
    // semi-joins the postings before scoring; surviving scores
    // identical to the unfiltered search
    val hits = (filter match {
      case None =>
        graft.functions.Sparse.invertedTopK(sparsePostings(td), query,
          topk)
      case Some(pred) =>
        graft.functions.Sparse.invertedTopKWFiltered(
          sparsePostings(td), query.indices,
          query.values.map(_.toDouble), topk,
          reg.table(td).filter(pred), td.pk)
    }).withColumnRenamed("id", "__hit_id")
    joinHitsBack(td, hits, fields)
  }

  /** IVF index build job (`create_index_if_not_exists` twin for vector
    * indexes, client.py:146-174): KMeans over the vector column with
    * `lists` cells, assigning under the index's declared distance (the
    * cosine-distance assignment is the spherical-centroids analog,
    * spec.py:458-464). Stored as a `<table>__ivf` side table in the
    * same catalog. */
  def buildIndex(td: TableDef[_]): Unit = {
    td.vectorIndex.filter(_.lists > 0).foreach { ix =>
      val base = reg.table(td)
      val model = Ann.buildIvfKMeans(base, ix.column, ix.lists, ix.distance)
      val t = s"${td.name}__ivf"
      val seg = reg.catalog.writeSegment(s"${reg.namespace}_$t",
        model.centroids)
      reg.catalog.commit(reg.catalog.current +
        (s"${reg.namespace}_$t" -> Vector(seg)))
    }
    // multivec IVF (the reference's vector_maxsim_ops index with
    // `lists`, spec.py:447-464): KMeans over the per-doc token means,
    // spherical (cosine) like the reference's pinned
    // spherical_centroids — maxsim phase-1 then scans probed cells
    // only. Ann.buildMaxsimIvf is the ONE place that names the mean
    // column and the metric; the query side reuses both via MvMeanCol
    // and the Cosine defaults.
    td.indexes.collectFirst {
      case ix @ Spec.MultiVectorIndex(_, lists) if lists > 0 => ix
    }.foreach { ix =>
      val dim = mvDim(td, ix.column)
      val (_, model) = Ann.buildMaxsimIvf(reg.table(td), ix.column, dim,
        ix.lists, MvMeanCol)
      val t = s"${td.name}__mvivf"
      val seg = reg.catalog.writeSegment(s"${reg.namespace}_$t",
        model.centroids)
      reg.catalog.commit(reg.catalog.current +
        (s"${reg.namespace}_$t" -> Vector(seg)))
    }
  }

  /** Install EXTERNALLY-trained IVF centroids for `td`'s vector index
    * — the offline-training escape hatch [[buildIndex]]'s in-engine
    * KMeans doesn't need but a 100 TB corpus does: centroids are
    * trained once on a sample (cheap, driver-sized) and installed
    * here; every search path (plain IVF, quantized, the composed
    * matryoshka branch) then reads them through the same catalog
    * table `buildIndex` writes, so the two paths cannot diverge. The
    * model must carry exactly `lists` cells — a mismatched install
    * would silently skew the auto-probe arithmetic (probes =
    * lists/16) and misdescribe the layout. */
  def installIndexModel(td: TableDef[_], model: Ann.IvfModel): Unit = {
    val ix = td.vectorIndex.getOrElse(throw new IllegalStateException(
      s"${td.name} has no vector index"))
    require(ix.lists > 0,
      s"${td.name}: installIndexModel needs lists > 0 (a flat index " +
        "has no cells to install)")
    // canonical shape, validated at INSTALL (not first query): the
    // catalog side table is read back as (centroid_id: long,
    // centroid: array<double>) — a model with other column names or
    // types would install fine and NPE in the first search's
    // centroid collect, far from the mistake
    require(model.idCol == "centroid_id" && model.vecCol == "centroid",
      s"${td.name}: installIndexModel needs canonical model columns " +
        s"(centroid_id, centroid) — got (${model.idCol}, " +
        s"${model.vecCol}); rename before installing")
    val sch = model.centroids.schema
    val okTypes = sch.fields.exists(f => f.name == "centroid_id" &&
        f.dataType == org.apache.spark.sql.types.LongType) &&
      sch.fields.exists(f => f.name == "centroid" &&
        (f.dataType match {
          case org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, _) => true
          case _ => false
        }))
    require(okTypes,
      s"${td.name}: installIndexModel needs centroid_id: bigint and " +
        s"centroid: array<double> — got ${sch.simpleString}")
    val n = model.centroids.count()
    require(n == ix.lists,
      s"${td.name}: model carries $n cells but the index declares " +
        s"lists=${ix.lists} — the auto-probe arithmetic would skew")
    // the pinned vector dimension must match the centroids' — a
    // wrong-space install would rank every assignment in garbage
    td.vectorDims.get(ix.column).foreach { dim =>
      val clen = model.centroids
        .select(size(col("centroid"))).head().getInt(0)
      require(clen == dim,
        s"${td.name}: centroids have $clen dims but ${ix.column} " +
          s"declares vectorDims=$dim — wrong embedding space")
    }
    val t = s"${td.name}__ivf"
    val seg = reg.catalog.writeSegment(s"${reg.namespace}_$t",
      model.centroids)
    reg.catalog.commit(reg.catalog.current +
      (s"${reg.namespace}_$t" -> Vector(seg)))
  }

  /** [[installIndexModel]]'s MULTIVEC twin: externally-trained
    * centroids for `td`'s lists-built multivec IVF, written through
    * the same `__mvivf` catalog table [[buildIndex]] uses so the
    * search paths cannot diverge. The centroids live in the
    * TOKEN-MEAN space (phase-1 probes the persisted mean under
    * cosine), so the dimension check runs against the multivector
    * column's pinned token dim. */
  def installMultivecIndexModel(td: TableDef[_],
                                model: Ann.IvfModel): Unit = {
    val ix = td.indexes.collectFirst {
      case m @ Spec.MultiVectorIndex(_, lists) if lists > 0 => m
    }.getOrElse(throw new IllegalStateException(
      s"${td.name}: installMultivecIndexModel needs a " +
        "MultiVectorIndex with lists > 0"))
    require(model.idCol == "centroid_id" && model.vecCol == "centroid",
      s"${td.name}: install needs canonical model columns " +
        s"(centroid_id, centroid) — got (${model.idCol}, " +
        s"${model.vecCol}); rename before installing")
    val n = model.centroids.count()
    require(n == ix.lists,
      s"${td.name}: model carries $n cells but the multivec index " +
        s"declares lists=${ix.lists} — the auto-probe arithmetic " +
        "would skew")
    td.vectorDims.get(ix.column).foreach { dim =>
      val clen = model.centroids
        .select(size(col("centroid"))).head().getInt(0)
      require(clen == dim,
        s"${td.name}: centroids have $clen dims but ${ix.column} " +
          s"declares token dim $dim — wrong embedding space")
    }
    val t = s"${td.name}__mvivf"
    val seg = reg.catalog.writeSegment(s"${reg.namespace}_$t",
      model.centroids)
    reg.catalog.commit(reg.catalog.current +
      (s"${reg.namespace}_$t" -> Vector(seg)))
  }

  /** BATCH multivec maxsim — the fourth batch member (dense c13,
    * keyword c14, sparse c16), the engine surface over the
    * already-oracled [[Ann.maxsimBatch]]: every query bag probes its
    * cells and both phases run as SHARED scans (phase-1 touches only
    * probed cells' persisted means, phase-2 only the candidates'
    * token matrices). Needs a lists-built multivec IVF — the exact
    * table has no shared phase-1 structure to batch over, so it
    * refuses (run [[searchByMultivec]] per query). Returns
    * (qid, td.pk, score, rank). */
  def searchByMultivecBatch(td: TableDef[_], queries: DataFrame,
                            qIdCol: String, qVecsCol: String,
                            topk: Int = 10, refine: Int = 1000,
                            probes: Int = 0,
                            filter: Option[Column] = None): DataFrame = {
    val ix = td.indexes.collectFirst {
      case m @ Spec.MultiVectorIndex(_, lists) if lists > 0 => m
    }.getOrElse(throw new IllegalStateException(
      s"${td.name}: batch multivec needs a lists-built multivec IVF " +
        "(MultiVectorIndex(lists > 0) + buildIndex / " +
        "installMultivecIndexModel) — run searchByMultivec per query " +
        "on an exact table"))
    val model = mvIndexModel(td).getOrElse(
      throw new IllegalStateException(
        s"${td.name}: multivec IVF model not built — call buildIndex " +
          "or installMultivecIndexModel first"))
    val dim = mvDim(td, ix.column)
    val p = if (probes > 0) probes
      else math.ceil(ix.lists / 16.0).toInt.max(1)
    // `filter`: the r60 contract on the batch surface — maxsimBatch
    // reads BOTH phases from the assigned frame (probed means phase 1,
    // candidate token matrices phase 2), so one pk semi-join thins
    // everything feeding every cut
    Ann.maxsimBatch(queries, qIdCol, qVecsCol,
      allowedBy(td, reg.table(td), filter)(
        mvAssignedCached(td, ix, model)),
      td.pk, ix.column, MvMeanCol,
      model, dim, p, math.max(refine, topk), topk)
  }

  /** The persisted phase-1 mean column — [[Ann.buildMaxsimIvf]]'s
    * `meanCol` default; build and read paths share this one name. */
  private val MvMeanCol = "mv_mean"

  /** The pinned token dimension of a multivector column — the maxsim
    * index build needs it to materialize the token-mean; failing loud
    * here beats a scan-time arity error on an executor. */
  private def mvDim(td: TableDef[_], mvCol: String): Int =
    td.vectorDims.getOrElse(mvCol, throw new IllegalStateException(
      s"${td.name}.$mvCol needs its token dimension pinned in " +
        "TableDef.vectorDims to build a multivec IVF"))

  /** Register the table's vector index for DECLARATIVE queries: after
    * this, a plain `orderBy(dist(vecCol, q)).limit(k)` DataFrame plan
    * over the table is rewritten by [[graft.plans.AnnTopKRule]] into
    * the index's scan shape — probe-pruned IVF, or the two-phase
    * semi-join for `quantized` / `oneBit` indexes (codes scanned,
    * full-precision vectors read only for the top-(k·refine)
    * candidates). The Engine-surface twin of `SET vchordrq.probes`
    * (client.py:285-309): registration is the opt-in to approximate
    * search. Requires a built IVF model ([[buildIndex]] first).
    *
    * Quantized registrations hold a RESOLVER backed by the version-keyed
    * caches below, so the declarative plan re-resolves the index at
    * every rewrite: writes to the table after install are visible to
    * the next declarative query, same as [[searchByVector]] — no
    * re-install needed (round-6 advisor: the previous frozen snapshot
    * silently excluded post-install rows). */
  def installDeclarative(td: TableDef[_], probes: Int = 0,
                         refine: Int = -1,
                         maxsimRefine: Int = 1000): Unit = {
    // matryoshka's declarative form is DIR-backed (the rewrite's
    // candidate cut reads a writeMatryoshka root's emb_pre column —
    // AnnIndex.registerMatryoshka); an in-memory registration here
    // would silently serve EXACT results while searchByVector serves
    // the cut, breaking the declarative/imperative parity contract.
    // Refuse loudly instead of registering nothing.
    td.vectorIndex.filter(_.mrlDims > 0).foreach { ix =>
      throw new IllegalStateException(
        s"${td.name}: declarative matryoshka needs an at-rest root — " +
          s"write one (Ann.writeMatryoshka) and register it via " +
          s"AnnIndex.registerMatryoshka('${ix.column}', ...) — or, " +
          s"for a composed lists+mrlDims table, a writeMatryoshkaIvf " +
          s"root via AnnIndex.registerMatryoshkaIvf; " +
          "installDeclarative has no in-memory truncation form")
    }
    graft.plans.AnnIndex.install(reg.spark)
    // lists == 0 means exact brute-force — nothing to register for the
    // dense column (the maxsim registration below still applies)
    td.vectorIndex.filter(_.lists > 0).foreach { ix =>
      def model = indexModel(td).getOrElse(throw new IllegalStateException(
        s"${td.name} has no built IVF model — run buildIndex first"))
      model // fail install-time, not first-query-time, when unbuilt
      val p = if (probes > 0) probes
        else math.ceil(ix.lists / 16.0).toInt.max(1)
      if (ix.oneBit)
        graft.plans.AnnIndex.registerOneBit(ix.column, td.pk,
          () => ivfBitqCached(td, ix, model),
          ix.distance, p, autoBitqRefine(ix, refine), owner = owner(td))
      else if (ix.quantized)
        graft.plans.AnnIndex.registerQuantized(ix.column, td.pk,
          () => ivfSqCached(td, ix, model),
          ix.distance, p, autoSqRefine(refine), owner = owner(td))
      else if (ix.pq > 0)
        graft.plans.AnnIndex.registerPq(ix.column, td.pk,
          () => ivfPqCached(td, ix, model),
          ix.distance, p, autoSqRefine(refine), owner = owner(td))
      else
        // resolver-backed like every other registration: a buildIndex
        // re-run (new KMeans model) must reach declarative probe
        // selection without a re-install; the centroid collect is
        // memoized per __ivf side-table version
        graft.plans.AnnIndex.register(ix.column, () => centsCached(td),
          "centroid_id", ix.distance, p, owner = owner(td))
    }
    // multivector column: plain orderBy(maxsim_dot(q, mv).desc).limit(k)
    // plans rewrite into the two-phase refine (the declarative
    // `maxsim_refine`, registry.py:233) — resolver-backed like the
    // dense registrations, so post-install writes stay visible. A
    // LISTS-built multivec IVF additionally routes phase-1 through the
    // probe + dynamic-pruning machinery (MaxsimIvf) so candidates come
    // from probed cells, not a full token-matrix scan.
    td.indexes.collectFirst { case ix: Spec.MultiVectorIndex => ix }
      .foreach { ix =>
        val ivf = if (ix.lists > 0) {
          mvIndexModel(td).getOrElse(throw new IllegalStateException(
            s"${td.name} has no built multivec IVF model — run " +
              "buildIndex first")) // fail install-time, not query-time
          val p = if (probes > 0) probes
            else math.ceil(ix.lists / 16.0).toInt.max(1)
          def model = mvIndexModel(td).getOrElse(
            throw new IllegalStateException(
              s"${td.name}'s multivec IVF model (__mvivf) vanished " +
                "after install — rebuild with buildIndex"))
          Some(graft.plans.AnnIndex.MaxsimIvf(
            () => mvAssignedCached(td, ix, model),
            "centroid_id", MvMeanCol,
            () => model.centroids, "centroid_id", "centroid", p))
        } else None
        graft.plans.AnnIndex.registerMaxsim(ix.column, td.pk,
          () => reg.table(td), maxsimRefine, ivf, owner = owner(td))
      }
    // keyword column: plain orderBy(bm25_score.desc).limit(k) plans
    // ([[keywordScoreColumn]] builds the score) rewrite into the
    // postings-index semi-join — the declarative `<&>` (client.py:
    // 356-380); resolver-backed via the version-keyed keywordIndex
    td.keywordIndex.foreach { kw =>
      graft.plans.AnnIndex.registerBm25(kw.column, td.pk,
        () => keywordIndex(td), owner = owner(td))
    }
    // sparse column: plain orderBy(sparse_dot_q.desc).limit(k) plans
    // ([[sparseScoreColumn]] builds the score) rewrite into the
    // inverted-postings candidate semi-join; resolver-backed via
    // [[sparsePostings]]'s lazy current-version plan
    td.indexes.collectFirst { case ix: Spec.SparseIndex => ix }
      .foreach { ix =>
        graft.plans.AnnIndex.registerSparse(ix.column,
          ix.valuesColumn, td.pk,
          () => sparsePostings(td), owner = owner(td))
      }
    if (td.vectorIndex.isEmpty && td.keywordIndex.isEmpty &&
        !td.indexes.exists(ix => ix.isInstanceOf[Spec.MultiVectorIndex] ||
          ix.isInstanceOf[Spec.SparseIndex]))
      throw new IllegalStateException(
        s"${td.name} has no vector, multivector, keyword, or sparse " +
          "index")
  }

  /** Attach an AT-REST index layout to a table's delete lifecycle:
    * after this, every committed `Registry.removeBy` on the table
    * (including rows deleted INTO it by FK cascade) rewrites the
    * layout's affected cell directories ([[Ann.deleteStoredIds]]), so
    * stored searches ([[Ann.searchIvfSqStored]] etc.) and declarative
    * rewrites over the loaded layout never surface removed rows — the
    * maintenance PostgreSQL's DELETE performs implicitly on the
    * reference's indexes (client.py:268-283). `dir` is a
    * [[Ann.writeIvfSq]] / [[Ann.writeIvfBitq]] root (the `quantized`
    * subdir is detected), a [[Ann.writeIvfPq]] root (geometry marker —
    * deletes rewrite `encoded/` cells, codebooks stay trained), a
    * [[Ann.writePartitioned]] path, a [[Bm25.writePostings]]
    * keyword layout (detected by its `_graft_buckets` marker — deletes
    * rewrite the affected term buckets), a [[Ann.writeMatryoshka]]
    * root (detected via [[Ann.isMatryoshkaRoot]] — deletes swap
    * `rows/` whole-directory through [[Ann.deleteMatryoshkaIds]]), or
    * a [[Ann.writeDenseRoot]] cell root (family marker — deletes
    * rewrite only the `rows/` cells holding doomed rows; pair with
    * [[mergeUnderfullIfNeeded]] on a cadence so drained cells
    * eventually dissolve). */
  def attachStoredIndex(td: TableDef[_], dir: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(reg.spark.sparkContext.hadoopConfiguration)
    val q = new org.apache.hadoop.fs.Path(root, "quantized")
    // keyword / sparse / PQ layouts are self-describing (their
    // bucket-modulus / geometry markers)
    val keyword = Bm25.readBucketsMarker(reg.spark, dir).isDefined
    val sparse = graft.functions.Sparse.isStoredLayout(reg.spark, dir)
    val mrl = Ann.isMatryoshkaRoot(reg.spark, dir)
    val mrlIvf = Ann.isMatryoshkaIvfRoot(reg.spark, dir)
    // detected ONCE at attach like the flags above — the layout kind
    // is immutable, and the hook runs per committed delete
    val quantized = Ann.isQuantizedRoot(reg.spark, dir)
    val path =
      if (mrlIvf)
        // cell-composed truncation root: rows/ is an ordinary
        // cell-partitioned layout, so deletes rewrite ONLY the cells
        // holding doomed rows (deleteStoredIds), never the whole dir
        new org.apache.hadoop.fs.Path(root, "rows").toString
      else if (mrl)
        // flat truncation root: rows/ swaps whole-directory on delete
        new org.apache.hadoop.fs.Path(root, "rows").toString
      else if (Ann.isPqStoredLayout(reg.spark, dir))
        // PQ roots keep cell-partitioned data under encoded/ (beside
        // the trained codebooks/centroids, which deletes never touch —
        // the same codes-outlive-rows contract as SQ bounds)
        new org.apache.hadoop.fs.Path(root, "encoded").toString
      else if (fs.exists(q)) q.toString
      else if (Ann.isDenseRoot(reg.spark, dir))
        // self-contained dense cell root: data under rows/ (beside
        // the root-owned centroids, which deletes never touch)
        new org.apache.hadoop.fs.Path(root, "rows").toString
      else dir
    // fail at ATTACH, not first delete: a streaming-grown dir
    // (_spark_metadata commit log) cannot take batch cell rewrites —
    // compact it first (Stream.compactStored)
    Ann.requireBatchLayout(reg.spark, path)
    storedAttachments.synchronized {
      // idempotent per (table, dir): re-attaching must not stack a
      // second hook that rewrites the same layout twice per delete
      if (!storedAttachments.contains((td.name, dir))) {
        storedAttachments((td.name, dir)) = reg.onDelete(td.name) {
          deleted =>
            if (keyword)
              Bm25.deleteStoredPostings(reg.spark, path,
                deleted.select(td.pk))
            else if (sparse)
              graft.functions.Sparse.deleteStored(reg.spark, path,
                deleted.select(td.pk))
            else if (mrl)
              Ann.deleteMatryoshkaIds(reg.spark, dir, td.pk,
                deleted.select(td.pk))
            else {
              Ann.deleteStoredIds(reg.spark, path, td.pk,
                deleted.select(td.pk))
              // a quantized root may hold not-yet-compacted appends in
              // its fresh side table — purge those too, or the
              // fresh-aware searches resurrect the deleted rows
              if (quantized)
                Ann.deleteQuantizedFreshIds(reg.spark, dir, td.pk,
                  deleted.select(td.pk))
            }
            ()
        }
      }
    }
  }

  /** Threshold-triggered fresh-table compaction for a quantized
    * at-rest root serving `td` — the ENGINE seat of
    * [[graft.ops.Ann.compactQuantizedFreshIfNeeded]] (r14 verdict #4:
    * `compactQuantizedFresh` existed but nothing triggered it, so
    * fresh/ grew until someone remembered). Call at attach or on a
    * maintenance cadence: compacts exactly when |fresh| >
    * `maxFreshRatio` · |main|; results identical across the trigger
    * by the compaction contract. Returns Some(graduated rows) when
    * triggered, None otherwise. */
  def compactFreshIfNeeded(td: TableDef[_], dir: String,
                           maxFreshRatio: Double): Option[Long] = {
    val ix = td.vectorIndex.getOrElse(throw new IllegalStateException(
      s"${td.name} has no vector index"))
    require(Ann.isQuantizedRoot(reg.spark, dir),
      s"$dir is not a quantized root — fresh-table compaction only " +
        "applies to SQ/PQ/1-bit layouts")
    Ann.compactQuantizedFreshIfNeeded(reg.spark, dir, td.pk, ix.column,
      maxFreshRatio)
  }

  /** Threshold-triggered underfull-cell MERGE for a range, composed
    * matryoshka-IVF, or quantized (SQ/PQ/1-bit) root serving `td` —
    * [[compactFreshIfNeeded]]'s
    * sibling seat for the cell-count side of the r66 health signal
    * (the split's complement): [[attachStoredIndex]]'s delete
    * maintenance drains cells, and nothing dissolved them, so probe
    * arithmetic and small-file overhead grew with every delete cycle.
    * Dispatches on the root's own marker (the engine's maintenance
    * cadence must reach the north-star layout it manages — round 15
    * left composed roots mergeable only by a direct
    * [[graft.ops.Ann.mergeUnderfullCellsMrlIvf]] call): a
    * `_graft_matryoshka_ivf` root merges under its pinned geometry, a
    * quantized geometry marker routes to the re-encoding merge
    * ([[graft.ops.Ann.mergeUnderfullCellsQuantized]] — refuses while
    * `fresh/` exists; run [[compactFreshIfNeeded]] first), anything
    * else takes the range path. Call after a delete wave or
    * on a maintenance cadence: every cell below `minRows` dissolves,
    * its rows re-homing to their true argmin survivors (crash-healed
    * by re-run; readers refuse mid-merge). Returns dissolved cell id
    * → rows it held (empty when nothing was underfull). */
  def mergeUnderfullIfNeeded(td: TableDef[_], dir: String,
                             minRows: Long): Map[Long, Long] =
    if (Ann.isMatryoshkaIvfRoot(reg.spark, dir))
      Ann.mergeUnderfullCellsMrlIvf(reg.spark, dir, minRows)
    else if (Ann.isQuantizedRoot(reg.spark, dir))
      Ann.mergeUnderfullCellsQuantized(reg.spark, dir,
        vectorColumn(td), minRows)
    else if (Ann.isDenseRoot(reg.spark, dir))
      // the root's own marker carries metric + vector column — no
      // index declaration needed, which is what lets a MAXSIM table
      // (multivec index, no vectorIndex) ride the same cadence
      Ann.mergeUnderfullCellsDense(reg.spark, dir, minRows)
    else if (Ann.isRangeRoot(reg.spark, dir))
      Ann.mergeUnderfullCells(reg.spark, dir, vectorColumn(td), minRows)
    else throw new IllegalStateException(unknownFamily(dir))

  /** Threshold-triggered overfull-cell SPLIT for a range, composed
    * matryoshka-IVF, or quantized (SQ/PQ/1-bit) root serving `td` —
    * [[mergeUnderfullIfNeeded]]'s
    * complement, completing the engine's maintenance triad (fresh
    * compaction / merge / split) so an operator can run all three on
    * one cadence without remembering which layout needs which direct
    * call: appends grow hot cells the way deletes drain cold ones,
    * and a never-split root's probes over-read at 100 TB. Dispatches
    * on the root's own marker like the merge seat; every cell past
    * `maxRows` locally retrains into sub-cells (only its directories
    * rewritten, marker re-pinned — range results invariant, composed
    * results the reduced-geometry replay). Returns oldCell → new cell
    * ids (empty when nothing was overfull). */
  def splitOverfullIfNeeded(td: TableDef[_], dir: String,
                            maxRows: Long): Map[Long, Seq[Long]] =
    if (Ann.isMatryoshkaIvfRoot(reg.spark, dir))
      Ann.splitOverfullCellsMrlIvf(reg.spark, dir, maxRows)
    else if (Ann.isQuantizedRoot(reg.spark, dir))
      Ann.splitOverfullCellsQuantized(reg.spark, dir,
        vectorColumn(td), maxRows)
    else if (Ann.isDenseRoot(reg.spark, dir))
      Ann.splitOverfullCellsDense(reg.spark, dir, maxRows)
    else if (Ann.isRangeRoot(reg.spark, dir))
      Ann.splitOverfullCells(reg.spark, dir, vectorColumn(td), maxRows)
    else throw new IllegalStateException(unknownFamily(dir))

  /** The per-cell HEALTH SIGNAL for any maintainable root serving
    * `td` — the READ side of the maintenance triad, completing the
    * operator loop: [[mergeUnderfullIfNeeded]] /
    * [[splitOverfullIfNeeded]] exist precisely so an operator need
    * not know which family a dir is, but the SIGNALS that justify
    * pulling them ([[graft.ops.Ann.indexHealth]] range,
    * [[graft.ops.Ann.indexHealthDense]], [[graft.ops.Ann
    * .indexHealthMrlIvf]], [[graft.ops.Ann.indexHealthQuantized]])
    * still had to be matched to the root by hand. Dispatches on the
    * root's own marker like the actuators, with the same typed
    * refusal for unknowns. Every arm returns (centroid_id, n_rows,
    * mean_dist); the range arm adds its stored `radius`. */
  def indexHealthFor(td: TableDef[_], dir: String): DataFrame =
    if (Ann.isMatryoshkaIvfRoot(reg.spark, dir))
      Ann.indexHealthMrlIvf(reg.spark, dir)
    else if (Ann.isQuantizedRoot(reg.spark, dir))
      Ann.indexHealthQuantized(reg.spark, dir)
    else if (Ann.isDenseRoot(reg.spark, dir))
      Ann.indexHealthDense(reg.spark, dir)
    else if (Ann.isRangeRoot(reg.spark, dir))
      Ann.indexHealth(reg.spark, dir, vectorColumn(td))
    else throw new IllegalStateException(unknownFamily(dir))

  /** The families whose roots need the table's declared vector
    * column (quantized re-encodes moved rows; range radii grow over
    * it) — dense and composed roots carry their own. */
  private def vectorColumn(td: TableDef[_]): String =
    td.vectorIndex.getOrElse(throw new IllegalStateException(
      s"${td.name} has no vector index")).column

  /** The maintenance triad's typed refusal (round 17 — previously
    * anything unrecognized took the range path and died inside
    * `loadRangeIndex` with a bare missing-path error): name every
    * family the triad CAN dispatch, so a mis-pointed dir refuses by
    * contract, not by accident. */
  private def unknownFamily(dir: String): String =
    s"$dir is none of the maintainable cell-partitioned families — " +
      "no composed matryoshka-IVF marker, no quantized geometry " +
      "marker, no dense cell-root marker, no range radii table. " +
      "Flat writePartitioned layouts have no disk-owned geometry to " +
      "maintain: graduate one with Ann.graduateDenseRoot first."

  /** Undo [[attachStoredIndex]]: the layout stops tracking the table's
    * deletes (no-op if never attached). */
  def detachStoredIndex(td: TableDef[_], dir: String): Unit =
    storedAttachments.synchronized {
      storedAttachments.remove((td.name, dir)).foreach(detach => detach())
    }

  private val storedAttachments =
    scala.collection.mutable.Map[(String, String), () => Unit]()

  /** Remove [[installDeclarative]]'s registrations for the table. */
  def uninstallDeclarative(td: TableDef[_]): Unit = {
    td.vectorIndex.foreach { ix =>
      graft.plans.AnnIndex.unregister(ix.column)
      graft.plans.AnnIndex.unregisterQuantized(ix.column)
    }
    td.indexes.collectFirst { case Spec.MultiVectorIndex(c, _) => c }
      .foreach(graft.plans.AnnIndex.unregisterMaxsim)
    td.keywordIndex.foreach(kw =>
      graft.plans.AnnIndex.unregisterBm25(kw.column, td.pk))
    td.indexes.collectFirst { case s: Spec.SparseIndex => s.column }
      .foreach(graft.plans.AnnIndex.unregisterSparse)
  }

  /** Version key for the memoized index artifacts: the TABLE's segment
    * manifest AND the index side table's — a rebuilt model (buildIndex
    * after a lists change) must invalidate cached assignments/codes
    * even when the base table is untouched, or stale cell ids get
    * probed against the new model's id space. */
  private def segVersion(names: String*): String =
    reg.segDigest(names: _*)

  /** The registration owner tag: collisions between two TABLES sharing
    * column names fail loudly at install instead of silently serving
    * one table's candidates to the other's queries. */
  private def owner(td: TableDef[_]): String =
    s"${reg.namespace}.${td.name}"

  /** Driver-side centroid collect for the PLAIN declarative IVF
    * registration, memoized per `__ivf` side-table version: probe cells
    * are chosen at plan time (AnnIndex.Entry), so the centroids must be
    * driver-resident — but a buildIndex re-run must refresh them, and
    * re-collecting per query would be a per-plan job. */
  private val centsCache =
    scala.collection.mutable.HashMap[String, (String, Seq[(Long, Array[Double])])]()
  private def centsCached(td: TableDef[_]): Seq[(Long, Array[Double])] = {
    val version = segVersion(s"${td.name}__ivf")
    val key = s"${reg.instanceId}|${td.name}"
    centsCache.synchronized {
      centsCache.get(key) match {
        case Some((v, cs)) if v == version => cs
        case _ =>
          val model = indexModel(td).getOrElse(
            throw new IllegalStateException(
              s"${td.name}'s IVF model (__ivf) vanished after install — " +
                "rebuild with buildIndex"))
          val cs = model.centroids.collect().map(r =>
            (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq.sortBy(_._1)
          centsCache(key) = (version, cs)
          cs
      }
    }
  }

  /** IVF assignment memoized per table+model VERSION: assigning is a
    * map-only stage but still O(N·cells) compute — the index at rest is
    * the assignment, recomputed only when the table or model is
    * rewritten (at real scale it is written `partitionBy(centroid_id)`,
    * Ann.writePartitioned; here the persisted frame plays that role). */
  private val assignCache =
    scala.collection.mutable.HashMap[String, (String, DataFrame)]()
  private def assignedCached(td: TableDef[_], ix: VectorIndex,
                             model: Ann.IvfModel): DataFrame = {
    // version BEFORE the table resolve: the other order can cache
    // pre-commit data under the post-commit version key, pinning the
    // stale frame until the next write (mvAssignedCached's pattern)
    val version = segVersion(td.name, s"${td.name}__ivf")
    val key = s"${reg.instanceId}|${td.name}|${ix.column}"
    assignCache.synchronized {
      assignCache.get(key) match {
        case Some((v, df)) if v == version => df
        case stale =>
          // a rewritten table must not pin its old assignment in
          // executor storage — evict before caching the new version
          stale.foreach(_._2.unpersist(false))
          val df = Ann.assign(reg.table(td), ix.column, model, ix.distance)
            .persist()
          assignCache(key) = (version, df)
          df
      }
    }
  }

  /** IVF+SQ index memoized per table VERSION (same lifecycle as
    * [[assignedCached]]): per-cell bounds + quantized codes persist
    * until the table is rewritten. */
  private val ivfSqCacheMap =
    scala.collection.mutable.HashMap[String, (String, Ann.IvfSqIndex)]()
  private def ivfSqCached(td: TableDef[_], ix: VectorIndex,
                          model: Ann.IvfModel): Ann.IvfSqIndex = {
    // version before table resolve — see assignedCached
    val version = segVersion(td.name, s"${td.name}__ivf")
    val key = s"${reg.instanceId}|${td.name}|${ix.column}"
    ivfSqCacheMap.synchronized {
      ivfSqCacheMap.get(key) match {
        case Some((v, idx)) if v == version => idx
        case stale =>
          stale.foreach { case (_, old) =>
            old.quantized.unpersist(false)
            old.bounds.unpersist(false)
          }
          val built = Ann.buildIvfSq(reg.table(td), ix.column, model,
            ix.distance)
          val idx = Ann.IvfSqIndex(built.quantized.persist(),
            built.bounds.persist(), built.model)
          ivfSqCacheMap(key) = (version, idx)
          idx
      }
    }
  }

  /** IVF+1-bit index memoized per table VERSION (same lifecycle as
    * [[ivfSqCached]]): residual-sign codes + norms persist until the
    * table is rewritten. */
  private val ivfBitqCacheMap =
    scala.collection.mutable.HashMap[String, (String, Ann.IvfBitIndex)]()
  private def ivfBitqCached(td: TableDef[_], ix: VectorIndex,
                            model: Ann.IvfModel): Ann.IvfBitIndex = {
    // version before table resolve — see assignedCached
    val version = segVersion(td.name, s"${td.name}__ivf")
    val key = s"${reg.instanceId}|${td.name}|${ix.column}"
    ivfBitqCacheMap.synchronized {
      ivfBitqCacheMap.get(key) match {
        case Some((v, idx)) if v == version => idx
        case stale =>
          stale.foreach(_._2.quantized.unpersist(false))
          val built = Ann.buildIvfBitq(reg.table(td), ix.column, model,
            ix.distance)
          val idx = Ann.IvfBitIndex(built.quantized.persist(), built.model)
          ivfBitqCacheMap(key) = (version, idx)
          idx
      }
    }
  }

  /** IVF+PQ index memoized per table VERSION (same lifecycle as
    * [[ivfSqCached]]): codebooks + positional codes persist until the
    * table is rewritten. */
  private val ivfPqCacheMap =
    scala.collection.mutable.HashMap[String, (String, Ann.IvfPqIndex)]()
  private def ivfPqCached(td: TableDef[_], ix: VectorIndex,
                          model: Ann.IvfModel): Ann.IvfPqIndex = {
    // version before table resolve — see assignedCached
    val version = segVersion(td.name, s"${td.name}__ivf")
    val key = s"${reg.instanceId}|${td.name}|${ix.column}"
    ivfPqCacheMap.synchronized {
      ivfPqCacheMap.get(key) match {
        case Some((v, idx)) if v == version => idx
        case stale =>
          stale.foreach(_._2.encoded.unpersist(false))
          val built = Ann.buildIvfPq(reg.table(td), ix.column, model,
            ix.pq, ix.distance)
          val idx = built.copy(encoded = built.encoded.persist())
          ivfPqCacheMap(key) = (version, idx)
          idx
      }
    }
  }

  private def indexModel(td: TableDef[_]): Option[Ann.IvfModel] =
    sideModel(td, "__ivf")

  /** The multivec IVF built by [[buildIndex]] (the `__mvivf` centroid
    * side table) — the read half of the reference's `vector_maxsim_ops`
    * index (spec.py:447-464). */
  private def mvIndexModel(td: TableDef[_]): Option[Ann.IvfModel] =
    sideModel(td, "__mvivf")

  private def sideModel(td: TableDef[_],
                        suffix: String): Option[Ann.IvfModel] = {
    val t = s"${reg.namespace}_${td.name}$suffix"
    if (reg.catalog.current.get(t).exists(_.nonEmpty)) {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("centroid_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("centroid",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType))))
      Some(Ann.IvfModel(reg.catalog.read(t, schema, reg.catalog.current),
        "centroid_id", "centroid"))
    } else None
  }

  /** Multivec assignment (table + persisted [[MvMeanCol]] +
    * `centroid_id`) memoized per table VERSION — the maxsim twin of
    * [[assignedCached]]: assigning every doc's token-mean to its cell
    * is the index at rest (at real scale it is written
    * `partitionBy(centroid_id)`, [[Ann.writePartitioned]]; here the
    * persisted frame plays that role). Cosine assignment — the build's
    * spherical-centroids metric ([[Ann.buildMaxsimIvf]]). */
  private val mvAssignCache =
    scala.collection.mutable.HashMap[String, (String, DataFrame)]()
  private def mvAssignedCached(td: TableDef[_], ix: MultiVectorIndex,
                               model: Ann.IvfModel): DataFrame = {
    val version = segVersion(td.name, s"${td.name}__mvivf")
    val key = s"mv|${reg.instanceId}|${td.name}|${ix.column}"
    mvAssignCache.synchronized {
      mvAssignCache.get(key) match {
        case Some((v, df)) if v == version => df
        case stale =>
          // a rewritten table must not pin its old assignment in
          // executor storage — evict before caching the new version
          stale.foreach(_._2.unpersist(false))
          val dim = mvDim(td, ix.column)
          val withMean = reg.table(td).withColumn(MvMeanCol,
            Ann.tokenMeanCol(col(ix.column), dim))
          val df = Ann.assign(withMean, MvMeanCol, model, Ann.Cosine)
            .persist()
          mvAssignCache(key) = (version, df)
          df
      }
    }
  }
}
