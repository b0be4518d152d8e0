package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vec

/** Nearest-neighbor search operators over `array<float>` embedding columns.
  *
  * Mirrors the reference's `query_vec` top-k search
  * (/root/reference/vechord/client.py:294-321) and its IVF index + probes
  * pruning (client.py:285-292, spec.py:437-444), Spark-first:
  *
  *  - exact top-k is `withColumn(dist) → orderBy → limit(k)` which Catalyst
  *    executes as TakeOrderedAndProject — a per-partition bounded heap plus
  *    a driver merge, never a full sort; at 1000 executors each task keeps
  *    only k rows.
  *  - the ANN path prunes by IVF cell: vectors carry a precomputed
  *    `centroid_id` (assigned at index-build), the query probes only the
  *    nearest `probes` cells. When the table is written partitioned by
  *    `centroid_id`, the `isin(probes)` filter becomes partition pruning —
  *    the semantic twin of `SET LOCAL vchordrq.probes`.
  */
object Ann {

  sealed trait Metric {
    /** Distance column (smaller = more similar). */
    def dist(a: Column, b: Column): Column
  }
  case object L2 extends Metric {
    def dist(a: Column, b: Column): Column = Vec.l2Dist(a, b)
  }
  case object Cosine extends Metric {
    def dist(a: Column, b: Column): Column = Vec.cosDist(a, b)
  }
  case object InnerProduct extends Metric {
    def dist(a: Column, b: Column): Column = Vec.negDot(a, b)
  }

  /** Exact brute-force top-k: distances rounded to `roundTo` decimals for
    * a reproducible ordering (ties broken by id asc). */
  def topK(docs: DataFrame, idCol: String, vecCol: String, queryVec: Column,
           metric: Metric, k: Int, roundTo: Int = 6): DataFrame =
    docs
      .withColumn("dist", round(metric.dist(col(vecCol), queryVec), roundTo))
      .orderBy(col("dist").asc, col(idCol).asc)
      .limit(k)

  /** Batch kNN join: for every query row, the top-k nearest docs.
    * The query side is broadcast (queries << docs); rank within each
    * query via a window over (dist, doc id).
    *
    * At scale: broadcast keeps the doc side shuffle-free; the window
    * partitions by query id so state per task is bounded by k after the
    * partial `filter`. */
  def knnJoin(queries: DataFrame, qId: String, qVec: String,
              docs: DataFrame, dId: String, dVec: String,
              metric: Metric, k: Int, roundTo: Int = 6): DataFrame = {
    val joined = docs.crossJoin(broadcast(queries))
      .withColumn("dist",
        round(metric.dist(col(dVec), col(qVec)), roundTo))
    val w = Window.partitionBy(col(qId))
      .orderBy(col("dist").asc, col(dId).asc)
    joined
      .select(col(qId), col(dId), col("dist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF model: one row per cell — (centroidId, centroid array<double>). */
  final case class IvfModel(centroids: DataFrame, idCol: String,
                            vecCol: String)

  /** Deterministic IVF build: one centroid per value of `cellCol`
    * (e.g. a label, or a KMeans-assigned cluster id), centroid = per-
    * dimension mean rounded to `roundTo` decimals (rounding makes the
    * centroid reproducible across engines/run orders so the assignment
    * step is stable). */
  def buildIvf(docs: DataFrame, cellCol: String, vecCol: String,
               roundTo: Int = 5): IvfModel = {
    val dims = docs
      .select(col(cellCol).as("centroid_id"),
        posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("centroid_id", "pos")
      .agg(round(avg(col("x").cast("double")), roundTo).as("c"))
    val cents = dims
      .groupBy("centroid_id")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("centroid"))
    IvfModel(cents, "centroid_id", "centroid")
  }

  /** Assign every doc to its nearest centroid (argmin over cells, ties by
    * centroid id asc). The centroid set is tiny → broadcast; at scale this
    * is a map-only stage feeding a `partitionBy(centroid_id)` write. */
  def assign(docs: DataFrame, vecCol: String, model: IvfModel,
             metric: Metric): DataFrame = {
    val w = Window.partitionBy(col("__doc_row"))
      .orderBy(col("__cdist").asc, col(model.idCol).asc)
    val withAll = docs
      .withColumn("__doc_row", monotonically_increasing_id())
      .crossJoin(broadcast(model.centroids))
      .withColumn("__cdist", metric.dist(col(vecCol), col(model.vecCol)))
      .withColumn("__crank", row_number().over(w))
      .filter(col("__crank") === 1)
    withAll.drop("__doc_row", "__cdist", "__crank", model.vecCol)
  }

  /** Nearest `probes` centroid ids for a query vector. */
  def probeCells(model: IvfModel, queryVec: Column, metric: Metric,
                 probes: Int): DataFrame =
    model.centroids
      .withColumn("__qdist", metric.dist(col(model.vecCol), queryVec))
      .orderBy(col("__qdist").asc, col(model.idCol).asc)
      .limit(probes)
      .select(col(model.idCol))

  /** IVF-pruned ANN top-k: scan only the probed cells, then exact top-k
    * within them. `assigned` must carry a `centroid_id` column (from
    * [[assign]]); when the underlying table is disk-partitioned by it,
    * the semi join / isin prunes whole partitions. */
  def searchIvf(assigned: DataFrame, idCol: String, vecCol: String,
                model: IvfModel, queryVec: Column, metric: Metric,
                probes: Int, k: Int, roundTo: Int = 6): DataFrame = {
    val cells = probeCells(model, queryVec, metric, probes)
    val pruned = assigned.join(broadcast(cells), Seq(model.idCol))
    topK(pruned, idCol, vecCol, queryVec, metric, k, roundTo)
  }
}
