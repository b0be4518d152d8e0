package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * hybrid dense-cosine + BM25 retrieval fused with RRF. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Retrieval.rrfHybrid(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.Retrieval.queries ++
      graft.queries.DataOps.queries ++ graft.queries.E2e.queries ++
      graft.queries.Events.queries ++ graft.queries.Crud.queries ++
      graft.queries.Eval.queries ++ graft.queries.GraphQ.queries ++
      graft.queries.Media.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++ graft.queries.Retrieval.oracles ++
      graft.queries.DataOps.oracles ++ graft.queries.E2e.oracles ++
      graft.queries.Events.oracles ++ graft.queries.Crud.oracles ++
      graft.queries.Eval.oracles ++ graft.queries.GraphQ.oracles ++
      graft.queries.Media.oracles
}
