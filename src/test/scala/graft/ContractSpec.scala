package graft

/** Guards on the driver contract itself: every oracle key must name a
  * real query (an orphan key would make the verify gate compare
  * against nothing), and the flagship entry must return rows (the
  * driver smoke-checks exactly that).
  */
class ContractSpec extends SparkSpec {

  test("every oracleSql key corresponds to a queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle keys without a query: $orphans")
  }

  test("every query has an oracle (no rows-only queries since r8)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty,
      s"queries without an oracle: $rowsOnly — the r8 gate-row scheme " +
        "(exact rows + deterministic claim literals) covers even the " +
        "approximate operators; new queries must follow it")
  }

  test("flagship entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
