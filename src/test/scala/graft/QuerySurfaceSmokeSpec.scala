package graft

/** Executes EVERY registered query once at sf0.001 — the in-suite analog
  * of the driver's verify gate. Round 7's lesson: `sbt test` was green
  * while 8 event-time queries crashed, because the suite exercised
  * operators on fixtures but nothing ran the full registered surface
  * against the actual testdata (whose schema can change between rounds).
  * This spec makes "all tests pass" imply "every query at least executes
  * on current testdata".
  */
class QuerySurfaceSmokeSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a registered query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle SQL without a query: $dangling")
  }

  // One test per query: a crash names the query in the test report
  // instead of aborting one mega-test at the first failure.
  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query surface: $name executes on sf0.001") {
      val n = fn(spark, dir).count()
      assert(n >= 0) // executed without throwing; rows>0 is the gate's job
    }
  }
}
