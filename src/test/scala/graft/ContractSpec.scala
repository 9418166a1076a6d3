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

  test("rows-only queries are the documented approximate set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("q_a14_approx_stats", "q_d7_ann_lsh", "q_d8_ann_ivf"),
      s"unexpected rows-only queries: $rowsOnly")
  }

  test("flagship entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
