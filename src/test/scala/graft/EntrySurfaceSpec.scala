package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract surface invariants Verify also enforces at run
  * time, pinned here so `sbt test` catches a violation before a driver
  * round does (a failing Verify zeroes the whole round's correctness).
  *
  * The load-bearing one is the §7.4.6 closure: every `queries` entry is
  * either hash-checked directly (an `oracleSql` key — the driver's
  * DuckDB compare) or explicitly paired via `gatePairs` with a gate
  * that is. Without this, adding a rows-only query silently weakens the
  * correctness gate; with it, the rows-only surface can only grow past
  * a reviewed pairing. */
class EntrySurfaceSpec extends AnyFunSuite {

  test("every query is oracle-checked or gate-paired (no silent rows-only)") {
    val uncovered = SparkEntry.queries.keySet --
      SparkEntry.oracleSql.keySet -- SparkEntry.gatePairs.keySet
    assert(uncovered.isEmpty,
      s"add an oracleSql entry or a gatePairs backstop for: " +
        s"${uncovered.toSeq.sorted.mkString(", ")}")
  }

  test("gate pairings never dangle: query exists, gate is hash-checked") {
    SparkEntry.gatePairs.foreach { case (q, g) =>
      assert(SparkEntry.queries.contains(q),
        s"gatePairs names a query that no longer exists: $q")
      assert(SparkEntry.oracleSql.contains(g),
        s"gate $g (pairing for $q) is not itself oracle-checked")
      assert(SparkEntry.queries.contains(g),
        s"gate $g (pairing for $q) is not a registered query")
    }
  }

  test("rows-only queries have NO oracle (a paired query that gains an " +
       "oracle should drop its pairing)") {
    val both = SparkEntry.gatePairs.keySet
      .intersect(SparkEntry.oracleSql.keySet)
    assert(both.isEmpty,
      s"queries both oracle-checked and gate-paired (stale pairing): " +
        s"${both.toSeq.sorted.mkString(", ")}")
  }

  test("every oracle names a registered query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty,
      s"oracleSql entries with no matching query: " +
        s"${dangling.toSeq.sorted.mkString(", ")}")
  }
}
