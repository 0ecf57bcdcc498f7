package graft

import org.scalatest.funsuite.AnyFunSuite

/** The oracle-SQL `round(x, n)` → portable floor-form rewriter must not
  * corrupt other SQL shapes — a bad rewrite breaks EVERY query at
  * registry construction, not just the offending one.
  */
class PortableRoundSqlSpec extends AnyFunSuite {

  test("two-arg round rewritten to the portable floor form") {
    assert(SparkEntry.portableRoundSql("round(x, 2)") ==
      "(floor((x) * 100.0 + 0.5) / 100.0)")
  }

  test("single-arg round(x) is left untouched (no registry-time crash)") {
    assert(SparkEntry.portableRoundSql("SELECT round(x) FROM t") ==
      "SELECT round(x) FROM t")
  }

  test("nested round inside a round argument is rewritten recursively") {
    assert(SparkEntry.portableRoundSql("round(round(x), 3)") ==
      "(floor((round(x)) * 1000.0 + 0.5) / 1000.0)")
  }

  test("identifiers merely ending in 'round(' are not calls") {
    assert(SparkEntry.portableRoundSql("workaround(x, 2)") == "workaround(x, 2)")
  }
}
