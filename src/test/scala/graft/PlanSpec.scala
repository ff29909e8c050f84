package graft

/** Physical-plan regression guards: the properties that make the engine
  * scale are asserted on the plan itself, so a refactor that silently
  * loses pushdown / adds a shuffle / drops a broadcast fails CI.
  */
class PlanSpec extends SparkSpecBase {

  val sfDir = "/root/testdata/sf0.001"
  def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("violations channel is shuffle-free (pure projection + generate)") {
    val p = planOf("violations")
    assert(!p.contains("Exchange"), s"violations must not shuffle:\n$p")
  }

  test("verdict grid is one partial+final aggregate (exactly one shuffle)") {
    val p = planOf("verdicts")
    assert("Exchange".r.findAllIn(p).size == 1, s"verdicts must shuffle once:\n$p")
    assert(p.contains("partial_"), "map-side partial aggregation missing")
  }

  test("dedup arg-max partially aggregates before its shuffle") {
    val p = planOf("dedup_url")
    val exchangeIdx = p.indexOf("Exchange")
    val partialIdx = p.indexOf("partial_max_by")
    assert(partialIdx >= 0, s"partial max_by missing:\n$p")
    assert(exchangeIdx >= 0 && p.indexOf("max_by", exchangeIdx) >= 0)
  }

  test("referential-integrity anti join broadcasts the parent keys") {
    val p = planOf("ri_dangling")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
  }

  test("filters and projection reach the parquet scan (q1)") {
    val p = planOf("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"), p)
    assert(p.contains("ReadSchema") &&
      !p.contains("l_tax"), "unused columns must be pruned from the scan")
  }

  test("brute-force knn broadcasts the query side") {
    val p = planOf("emb_knn")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("top-k collapses to TakeOrderedAndProject (no global sort)") {
    val p = planOf("q_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("emb_neardup is bucket-joined — no cartesian / nested-loop join anywhere") {
    val p = planOf("emb_neardup")
    assert(!p.contains("CartesianProduct"), s"cartesian in near-dup plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop in near-dup plan:\n$p")
  }

  test("every suite near-dup/LSH query stays equi-join-only (no all-pairs shapes)") {
    // the default suite contains no all-pairs operator: the exact
    // baselines (ngramJaccardPairs, cosineNearDupPairsExact) are test
    // oracles, and every candidate join here must be a band/bucket-keyed
    // equi join
    for (name <- Seq("sim_minhash_lsh", "sim_simhash_pairs", "emb_neardup")) {
      val p = planOf(name)
      assert(!p.contains("CartesianProduct"), s"cartesian in $name:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop in $name:\n$p")
    }
    assert(!SparkEntry.queries.contains("sim_ngram_pairs"),
      "all-pairs ngram baseline must stay demoted to a test oracle")
  }

  test("digest_record is a pure scan-side projection (no shuffle, no UDF)") {
    val p = planOf("digest_record")
    assert(!p.contains("Exchange"), s"record hashing must not shuffle:\n$p")
    assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("ScalaUDF"), p)
  }

  test("curate/invert are single-stage codegen projections (no shuffle)") {
    for (name <- Seq("mut_invert", "mut_curate")) {
      val p = planOf(name)
      assert(!p.contains("Exchange"), s"$name must not shuffle:\n$p")
    }
  }

  test("s_compare aligns sides with ONE join (pre-aggregated, no per-stratum loop)") {
    val p = planOf("s_compare")
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).size == 1,
      s"compare must align the two sides with a single join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("every sort-DSL branch collapses to TakeOrderedAndProject (no global sort)") {
    val p = planOf("q_sort_dsl")
    assert("TakeOrderedAndProject".r.findAllIn(p).size == 7, p)
  }
}
