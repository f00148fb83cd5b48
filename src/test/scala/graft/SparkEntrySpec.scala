package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{BreadthQueries, NorthStarQueries, ReferenceQueries}

/** Contract guards for the driver registry. */
class SparkEntrySpec extends AnyFunSuite {

  test("no query-name collisions across the three registries") {
    val sizes = ReferenceQueries.defs.size + BreadthQueries.defs.size +
      NorthStarQueries.defs.size
    assert(SparkEntry.queries.size === sizes,
      "a duplicate key would silently drop a query from the merged Map")
  }

  test("every oracle key has a query; names are well-formed") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
    assert(qs.forall(_.matches("[a-z0-9_]+")))
  }

  test("oracle SQL contains no tabs (driver JSON escaping hazard)") {
    val withTabs = SparkEntry.oracleSql.filter(_._2.contains("\t")).keys
    assert(withTabs.isEmpty, s"tabs in: $withTabs")
  }
}
