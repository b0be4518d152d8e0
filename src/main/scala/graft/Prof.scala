package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (dev-only). */
object Prof {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROF $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = queries.Tables.documents(spark, d)
    time("docs count")(docs.count())

    // bm25 build phases
    val tok = graft.functions.Tokenizers.Simple
    val tokensUdf = udf((s: String) => tok.scala(s)).asNondeterministic()
    val toks = docs
      .select(col("doc_id").as("id"), col("text").as("__text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("id"), tokensUdf(col("__text")).as("__toks"))
      .select(col("id"), explode(col("__toks")).as("term"))
    val tf = time("tf build+persist") {
      val t = toks.groupBy("id", "term").agg(count(lit(1)).as("tf")).persist()
      t.count(); t
    }
    val dl = tf.groupBy("id").agg(sum(col("tf")).as("dl"))
    time("dl head")(dl.agg(count(lit(1)), sum(col("dl"))).head())
    val termStats = time("termStats") {
      val t = tf.groupBy("term").agg(count(lit(1)).as("df")).persist()
      t.count(); t
    }
    val postings = time("postings persist") {
      val p = tf.join(dl, "id").persist(); p.count(); p
    }
    val idx = ops.Bm25.Bm25Index(postings, termStats, 5000, 300.0)
    time("search")(ops.Bm25.search(idx, "spark filter join", 10).count())
    time("search2")(ops.Bm25.search(idx, "group hash join", 10).count())

    // p06 phases
    time("p06 stats only")(
      ops.TextAnalysis.stats(docs, "text").count())
    time("p06 full")(queries.DataOps.tokenStats(spark, d).count())
    time("p06 full again")(queries.DataOps.tokenStats(spark, d).count())

    // g01 phases
    time("g01 extract") {
      val chunks = docs.select(col("doc_id"), col("text"))
      val (e, r) = graph.Graph.extractFromChunks(spark, chunks, "doc_id",
        "text", graph.VocabRecognizer(queries.GraphQ.Vocab))
      e.count() + r.count()
    }
    time("g01 full")(queries.GraphQ.entityMerge(spark, d).count())

    // p02 phases (mirror of Dedup.jaccardPairs internals)
    locally {
      val par = spark.sparkContext.defaultParallelism
      val n = 3; val threshold = 0.5
      import spark.implicits._
      val sets = docs.select(col("doc_id").cast("long"), col("text"))
        .repartition(par).as[(Long, String)]
        .mapPartitions(_.map { case (id, t) =>
          (id, ops.Dedup.shinglesScala(t, n)) })
        .toDF("id", "sh").withColumn("sz", size(col("sh"))).persist()
      time("p02 sets")(sets.count())
      val inv = sets.select(col("id"), explode(col("sh")).as("shingle"))
      val df = inv.groupBy("shingle").agg(count(lit(1)).as("df"))
      time("p02 df count")(println("  df rows " + df.count()))
      val sorted = inv.join(broadcast(df), "shingle")
        .repartition(par, col("id"))
        .groupBy("id")
        .agg(transform(array_sort(collect_list(
          struct(col("df"), col("shingle")))),
          s => s.getField("shingle")).as("sh"))
        .withColumn("sz", size(col("sh"))).persist()
      time("p02 sorted")(sorted.count())
      val prefix = sorted.select(col("id"), col("sz"),
        explode(slice(col("sh"), lit(1),
          (col("sz") - ceil(col("sz") * threshold) + 1).cast("int")))
          .as("shingle")).persist()
      time("p02 prefix")(println("  prefix rows " + prefix.count()))
      val cand = prefix.as("x")
        .join(prefix.as("y"), col("x.shingle") === col("y.shingle") &&
          col("x.id") < col("y.id") &&
          col("x.sz") >= ceil(col("y.sz") * threshold) &&
          col("x.sz") <= floor(col("y.sz") / threshold))
        .select(col("x.id").as("a"), col("y.id").as("b"))
      time("p02 cand raw")(println("  cand raw " + cand.count()))
      val candD = cand.distinct().persist()
      time("p02 cand distinct")(println("  cand " + candD.count()))
      spark.stop()
    }
  }
}
