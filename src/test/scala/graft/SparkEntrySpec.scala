package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract guards for the driver registry. */
class SparkEntrySpec extends AnyFunSuite {

  test("no query-name collisions across the registries") {
    // derive from SparkEntry.registries (the same list `queries` merges)
    // so a newly added registry file is guarded automatically
    val allKeys = SparkEntry.registries.flatMap(_._1.keys)
    val dups = allKeys.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dups.isEmpty, s"duplicate query names (later registry shadows earlier): $dups")
    assert(SparkEntry.queries.size === allKeys.size)
    val allOracleKeys = SparkEntry.registries.flatMap(_._2.keys)
    val oDups = allOracleKeys.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(oDups.isEmpty, s"duplicate oracle names: $oDups")
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
