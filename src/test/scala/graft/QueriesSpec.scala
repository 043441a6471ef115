package graft

/** Smoke: every catalog query runs at sf0.001 and the row-producing ones
  * return rows (pair queries may legitimately be empty on tiny data). */
class QueriesSpec extends SparkSpec {

  private val mayBeEmpty = Set("q_dedup_embed_cosine")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val n = fn(spark, sf).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("oracleSql keys are a subset of queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
