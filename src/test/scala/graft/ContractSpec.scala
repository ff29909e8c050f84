package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants that don't need a SparkSession: the
  * correctness gate compares every `queries` entry against its
  * `oracleSql` twin, and the three query maps merge with `++`, which
  * would SILENTLY shadow a duplicated name — both failure modes are
  * zero-signal at verify time (a missing oracle degrades to rows-only;
  * a shadowed query runs the wrong code under the right name).
  */
class ContractSpec extends AnyFunSuite {

  test("every driver query has a DuckDB oracle (no rows-only degradation)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without an oracle: $missing")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without a query: $orphaned")
  }

  test("contributing query maps are internally consistent and disjoint") {
    val overlap = TrainingQueries.queries.keySet
      .intersect(MappingQueries.queries.keySet)
    assert(overlap.isEmpty,
      s"TrainingQueries and MappingQueries both define: $overlap")
    // each sub-map ships its own oracles — a drifted key pair here would
    // be silently reshuffled by the ++ merge
    assert(TrainingQueries.queries.keySet == TrainingQueries.oracleSql.keySet)
    assert(MappingQueries.queries.keySet == MappingQueries.oracleSql.keySet)
  }
}
