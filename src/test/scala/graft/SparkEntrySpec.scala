package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract checks the driver relies on. */
class SparkEntrySpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("no query-name collisions across packs") {
    val all = SparkEntry.packs.flatMap(_.queries.keys)
    assert(all.size === all.distinct.size,
      s"duplicate names: ${all.diff(all.distinct).distinct}")
  }

  test("every oracle key has a query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every bench override replaces an existing query and returns rows") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.packs.flatMap(_.benchOverrides.keys).toSet.diff(qs)
    assert(orphans.isEmpty, s"bench overrides without queries: $orphans")
    // the production shape must still exercise the operator end-to-end
    SparkEntry.packs.flatMap(_.benchOverrides).foreach { case (name, fn) =>
      assert(fn(spark, SparkSuite.sf0001).count() > 0,
        s"bench override $name returned zero rows")
    }
  }

  test("flagship entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs and returns rows at sf0.001") {
    val empty = SparkEntry.queries.collect {
      case (name, fn) if fn(spark, SparkSuite.sf0001).count() == 0 => name
    }
    assert(empty.isEmpty, s"queries with zero rows at sf0.001: $empty")
  }
}
