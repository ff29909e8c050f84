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

  test("every BucketBudget.cap call site has a truncation channel (no silent caps)") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = Paths.get("src/main/scala/graft")
    val sources = Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .map(p => p -> new String(Files.readAllBytes(p), "UTF-8"))
      .toSeq
    val capRe = "BucketBudget\\.cap(IfNeeded)?\\(".r
    val capSites = sources.filter { case (p, s) =>
      capRe.findFirstIn(s).isDefined &&
        !p.toString.endsWith("BucketBudget.scala")
    }
    assert(capSites.nonEmpty, "expected at least one BucketBudget.cap call site")
    // a future capped path must ship its own loud channel: every FILE
    // that caps must also expose a truncationReport-backed surface, and
    // the number of cap calls in it must not exceed the number of
    // truncation surfaces it defines (one twin per capped pipeline)
    capSites.foreach { case (p, s) =>
      val caps = capRe.findAllIn(s).size
      val reports = "BucketBudget\\.truncationReport\\(".r.findAllIn(s).size
      assert(reports >= caps,
        s"$p has $caps BucketBudget.cap call(s) but only $reports " +
          "truncationReport surface(s) — a capped pipeline without its " +
          "loud twin truncates silently")
    }
    // and the driver gate keeps at least one ACTIVE-cap budget +
    // truncation oracle pair, so the cap semantics stay engine-checked
    assert(SparkEntry.queries.contains("sim_lsh_budget"))
    assert(SparkEntry.queries.contains("sim_lsh_truncation"))
  }
}
