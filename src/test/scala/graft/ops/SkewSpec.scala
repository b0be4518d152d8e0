package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Salted-join semantics: result identity with the plain join under
  * every supported shape — the parts q17's oracle-equality gate can't
  * see (left-join unmatched rows, broadcast disabled so the salted
  * shuffle path actually runs, determinism across invocations). */
class SkewSpec extends SparkSpecBase {

  private def fixtures = {
    val sp = spark
    import sp.implicits._
    // hot key 1 dominates the fact side; key 4 has no dim row (left
    // join coverage); dim key 9 has no fact rows
    val fact = ((1 to 40).map(i => (1L, s"f$i")) ++
      Seq((2L, "a"), (2L, "b"), (3L, "c"), (4L, "orphan")))
      .toDF("k", "payload")
    val dim = Seq((1L, "hot"), (2L, "warm"), (3L, "cold"), (9L, "unused"))
      .toDF("k", "name")
    (fact, dim)
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "payload", "name").collect()
      .map(r => (if (r.isNullAt(0)) Long.MinValue else r.getLong(0),
        r.getString(1), Option(r.get(2)).map(_.toString).orNull))
      .sortBy(t => (t._1, t._2, String.valueOf(t._3)))

  test("salted inner join equals the plain join with broadcast off") {
    val (fact, dim) = fixtures
    val was = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val salted = Skew.saltedJoin(fact, dim, Seq("k"), salts = 4)
      val plain = fact.join(dim, Seq("k"))
      assert(sortedRows(salted) === sortedRows(plain))
      // the shuffle path really ran: no broadcast join in the plan
      val phys = salted.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastHashJoin"),
        s"expected a shuffle join with broadcast disabled:\n$phys")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", was)
  }

  test("salted left join keeps unmatched fact rows exactly once") {
    val (fact, dim) = fixtures
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), salts = 4,
      joinType = "left")
    val plain = fact.join(dim, Seq("k"), "left")
    assert(sortedRows(salted) === sortedRows(plain))
    assert(salted.filter(col("k") === 4L).count() === 1L)
  }

  test("salting is deterministic and a single salt degenerates cleanly") {
    val (fact, dim) = fixtures
    val once = sortedRows(Skew.saltedJoin(fact, dim, Seq("k"), salts = 8))
    val again = sortedRows(Skew.saltedJoin(fact, dim, Seq("k"), salts = 8))
    assert(once === again)
    assert(sortedRows(Skew.saltedJoin(fact, dim, Seq("k"), salts = 1)) ===
      sortedRows(fact.join(dim, Seq("k"))))
  }

  test("null join keys behave exactly like the plain join") {
    val sp = spark
    import sp.implicits._
    val fact = Seq((Some(1L), "a"), (None, "n1"), (None, "n2"),
      (Some(2L), "b")).toDF("k", "payload")
    val dim = Seq((Some(1L), "one"), (None, "nulldim"))
      .toDF("k", "name")
    // SQL equi-join semantics: null keys never match — salted or not
    val salted = sortedRows(Skew.saltedJoin(fact, dim, Seq("k")))
    assert(salted === sortedRows(fact.join(dim, Seq("k"))))
    val left = Skew.saltedJoin(fact, dim, Seq("k"), joinType = "left")
    assert(sortedRows(left) === sortedRows(fact.join(dim, Seq("k"), "left")))
    assert(left.filter(col("k").isNull).count() === 2L)
  }

  test("property: salted equals plain on randomized skewed data") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(42)
    (0 until 5).foreach { round =>
      // 60% of fact rows pile on one hot key; dim covers half the space
      val hot = rnd.nextInt(10).toLong
      val fact = (0 until 300).map { i =>
        val k = if (rnd.nextDouble() < 0.6) hot else rnd.nextInt(20).toLong
        (k, rnd.nextInt(1000))
      }.toDF("k", "v")
      val dim = (0 until 10).map(i => (i.toLong, s"d$i")).toDF("k", "name")
      val salts = 1 + rnd.nextInt(8)
      val s1 = Skew.saltedJoin(fact, dim, Seq("k"), salts = salts)
        .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      val s2 = fact.join(dim, Seq("k"))
        .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      assert(s1 === s2, s"round $round salts=$salts")
    }
  }

  test("unsupported join types and bad salts are refused loudly") {
    val (fact, dim) = fixtures
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact, dim, Seq("k"), joinType = "right")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact, dim, Seq("k"), salts = 0)
    }
  }
}
