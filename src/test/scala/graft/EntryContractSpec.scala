package graft

/** The driver's SparkEntry contract, pinned: the flagship entry() query
  * returns rows (the driver smoke-checks rows > 0 on sf0.001), and the
  * query↔oracle maps stay aligned — every query has a DuckDB twin
  * except the documented engine-native exception, and no twin is
  * orphaned. */
class EntryContractSpec extends SparkSpec {

  test("entry() returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0L)
  }

  test("every query has an oracle twin (q40 is the one documented " +
      "rows-only exception) and no twin is orphaned") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(qs -- os == Set("q40_approx_distinct"),
      s"queries without a DuckDB twin: ${qs -- os}")
    assert((os -- qs).isEmpty, s"orphaned oracle entries: ${os -- qs}")
  }
}
