package graft

/** Contract guards for the driver-facing catalog: every query declared in
  * [[SparkEntry.queries]] must carry a DuckDB oracle (round 3 reached
  * 100% oracle coverage — this pins it), and the flagship entry must
  * return rows on the smallest scale factor. */
class SparkEntrySpec extends SparkSpec {

  test("every catalog query has a DuckDB oracle (no silent rows-only)") {
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    assert(queries == oracles,
      s"missing oracles: ${(queries -- oracles).toSeq.sorted.mkString(", ")}; " +
        s"orphan oracles: ${(oracles -- queries).toSeq.sorted.mkString(", ")}")
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
