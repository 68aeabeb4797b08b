package graft

/** The driver-contract surface itself: entry() must smoke (rows > 0), every
  * registry name must be unique, and every oracle key must name a registered
  * query — a registration typo would otherwise surface only as a driver-side
  * correctness hole.
  */
class SparkEntrySpec extends SparkSpec {

  test("entry() returns rows on the smoke fixture") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    // one row per market segment, each with a positive order count
    assert(rows.forall(_.getLong(1) > 0))
  }

  test("registry names are unique and every oracle belongs to a query") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size === names.size,
      s"duplicate query names: ${names.diff(names.distinct).distinct.mkString(", ")}")
    val known = names.toSet
    val orphans = SparkEntry.oracleSql.keys.filterNot(known)
    assert(orphans.isEmpty, s"oracles without queries: ${orphans.mkString(", ")}")
  }

  test("query names follow the qNN_ convention the bench shortener assumes") {
    val bad = SparkEntry.registry.map(_.name).filterNot(_.matches("q\\d+_[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-conforming names: ${bad.mkString(", ")}")
  }
}
