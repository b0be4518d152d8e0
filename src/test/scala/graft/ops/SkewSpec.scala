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
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.toString).orNull))
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
