package graft

/** The driver's smoke contract: entry() returns rows on sf0.001. */
class EntrySpec extends SparkSuite {
  test("SparkEntry.entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
  test("every query has a name and runs on sf0.001") {
    assert(SparkEntry.queries.size >= 60)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
  test("schedule covers every query exactly once (Bench/Verify run from it)") {
    val scheduled = SparkEntry.schedule.flatMap(_._1)
    assert(scheduled.size == scheduled.distinct.size, "duplicate scheduled query")
    assert(scheduled.toSet == SparkEntry.queries.keySet,
      s"schedule drift: ${(scheduled.toSet diff SparkEntry.queries.keySet) ++
        (SparkEntry.queries.keySet diff scheduled.toSet)}")
  }
}
