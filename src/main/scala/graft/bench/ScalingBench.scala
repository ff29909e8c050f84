package graft.bench

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.constraints.Constraints
import graft.gen.WebGen
import graft.runner.Runner

/** Dual-parallelism throughput harness — the sandbox stand-in for the
  * north rule's N-vs-4N executor requirement (BASELINE.md): run the FULL
  * constraint suite over the same generated input at local[8] and
  * local[32], report docs/sec at each, the scaling efficiency
  * `thr@32 / (4 × thr@8)`, and verdict parity between the two runs.
  *
  * Usage: runMain graft.bench.ScalingBench [nRows] [outMd]
  */
object ScalingBench {

  private def session(cpus: Int): SparkSession =
    BenchUtil.session(cpus, "graft-scaling")

  /** The measured job — the FULL suite per the north-rule metric: all row
    * constraints + per-partition verdict grid + url-uniqueness + lineage
    * referential integrity + per-partition column stats, over every page.
    * Each output pass re-scans the (column-pruned) parquet rather than
    * caching the input: at the design scale the input never fits a
    * cache, and pruned scans (uniqueness/RI read only url/ts/id/part)
    * are cheaper than dragging text+html through a deserialized cache —
    * measured: the cached variant scales at 0.68, the re-scan variant
    * scales better because parquet decode is CPU-bound, not
    * memory-bandwidth-bound.
    */
  private def suiteJob(spark: SparkSession, path: String): Array[org.apache.spark.sql.Row] = {
    import graft.checks.DatasetChecks
    import graft.stats.Stats
    val pages = spark.read.parquet(path)
    locally {
      val valid = pages.filter(Constraints.validUrl)
      // deterministic synthetic lineage: 5/6 of valid urls have a fetch row
      val lineage = BenchUtil.syntheticLineage(valid)
      val ord = struct(coalesce(unix_timestamp(col("warc_ts")), lit(-1L)).as("ts"),
        (-col("doc_id")).as("negid"))
      val dsViol = DatasetChecks.uniquenessViolations(valid, ord)
        .unionByName(DatasetChecks.riViolations(valid, lineage, broadcastParent = false))
      val pc = valid.groupBy(col("part")).agg(count(lit(1)).as("row_count"))
      val grid = Runner.verdicts(pages, Constraints.webtextSuite)
        .unionByName(DatasetChecks.verdictsFromViolations(
          dsViol, pc, Seq("url_unique", "url_lineage")))
      val stats = Stats.columnStats(pages, Seq("url", "lang"))
      grid.collect() ++ stats.collect()
    }
  }

  /** Alternative measured job (arg 6 = "suite-fused"): the SAME suite
    * output rows, but with the row-constraint verdict grid and the
    * per-partition column stats computed by [[graft.runner.Profile]]'s
    * ONE-pass fused aggregate instead of two separate scans. The 64-row
    * aggregate frame is persisted so the second derivation reads the
    * cache, not the table: one wide scan total where `suite` pays a wide
    * scan plus a pruned url/lang scan. The url-keyed dataset checks are
    * identical between the modes. Output rows are row-identical to
    * `suite` (ProfileSpec asserts the operator equality; the gate checks
    * both against the same oracles), so cross-mode deltas are pure plan
    * effect.
    */
  private def suiteFusedJob(spark: SparkSession, path: String): Array[org.apache.spark.sql.Row] = {
    import graft.checks.DatasetChecks
    import graft.runner.Profile
    val pages = spark.read.parquet(path)
    val agg = Profile.fusedAggregate(pages, Constraints.webtextSuite,
      Seq("url", "lang")).persist()
    try {
      val valid = pages.filter(Constraints.validUrl)
      val lineage = BenchUtil.syntheticLineage(valid)
      val ord = struct(coalesce(unix_timestamp(col("warc_ts")), lit(-1L)).as("ts"),
        (-col("doc_id")).as("negid"))
      val dsViol = DatasetChecks.uniquenessViolations(valid, ord)
        .unionByName(DatasetChecks.riViolations(valid, lineage, broadcastParent = false))
      val pc = valid.groupBy(col("part")).agg(count(lit(1)).as("row_count"))
      val grid = Profile.verdictRows(agg, Constraints.webtextSuite)
        .unionByName(DatasetChecks.verdictsFromViolations(
          dsViol, pc, Seq("url_unique", "url_lineage")))
      grid.collect() ++ Profile.statRows(agg, Seq("url", "lang")).collect()
    } finally { agg.unpersist(); () }
  }

  /** Alternative measured job (arg 6 = "neardup"): the production MinHash
    * LSH near-dup pipeline — shingle → one-pass signature → banding →
    * hot-bucket budget gate (exact oversized-bucket pre-pass; the
    * truncation window only when a bucket exceeds the cap) → band
    * self-join → exact-jaccard verify. Run at both parallelism levels to
    * evidence that the budget machinery scales >= 0.8 and returns the
    * identical pair set (parity). "neardup-forcecap" runs the SAME
    * pipeline with `graft.sim.capGate=always` — the unconditional
    * WindowGroupLimit plan — so the window machinery's own scaling is
    * evidenced separately from the gated production plan.
    */
  private def neardupJob(spark: SparkSession, path: String): Array[org.apache.spark.sql.Row] = {
    val pages = spark.read.parquet(path).select(col("doc_id"), col("text"))
    graft.sim.Sim.minhashLshPairs(pages, "doc_id", "text",
      n = 3, k = 8, rows = 2, threshold = 0.2)
      .select(col("id_1"), col("id_2"), col("jac")).collect()
  }

  private def neardupForceCapJob(spark: SparkSession, path: String): Array[org.apache.spark.sql.Row] = {
    spark.conf.set("graft.sim.capGate", "always") // fresh session per run: no leak
    neardupJob(spark, path)
  }

  private def median(xs: Seq[Double]): Double = BenchUtil.median(xs)

  // Probes live in [[Probe]] (shared with TimeCap and the pre-run window
  // qualifier so every evidence file reads the SAME instruments):
  // probeThr = pure-register CPU ceiling; bwProbeThr = the 1.6 GB DRAM
  // stream ceiling that binds a parquet-decode suite on one socket. On a
  // real N-vs-4N cluster each executor brings its own memory
  // controllers, so the bw ceiling scales with N; on this box it cannot.
  private def probeThr(threads: Int, itersPerTask: Long = 400_000_000L): Double =
    Probe.lcgThr(threads, itersPerTask)

  private def bwProbeThr(threads: Int): Double = Probe.bwThr(threads)

  private def bwArr: Array[Long] = Probe.bwArr

  /** Interleaved A/B sampling (measurement hygiene): each rep times ONE
    * local[8] run then ONE local[32] run back-to-back, so slow host
    * windows (co-tenancy) hit both levels equally and cancel in the
    * per-rep efficiency; the headline is the MEDIAN with min–max
    * dispersion, not a best-of from separate windows. One warm-up pair
    * up front covers JIT + the JVM-global whole-stage-codegen cache;
    * sessions are rebuilt per sample so no run inherits cached blocks.
    */
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 2000000L
    val outMd = if (args.length > 1) args(1) else "BENCH/BASELINE.md"
    val reps = if (args.length > 2) args(2).toInt else 5
    val cA = if (args.length > 3) args(3).toInt else 8   // N
    val cB = if (args.length > 4) args(4).toInt else 32  // 4N
    val job = if (args.length > 5) args(5) else "suite"
    val ratio = cB.toDouble / cA
    // the neardup jobs measure the LSH pipeline over the planted
    // near-dup corpus (WebGen.neardupDocs scaladoc: pages' 32-word
    // vocabulary melts the band join quadratically and verifies zero
    // pairs — wrong corpus for that evidence); the suite job keeps the
    // violation-injected pages corpus
    val dataPath =
      if (job.startsWith("neardup")) s"/tmp/graft_neardup_docs_$n"
      else s"/tmp/graft_bench_pages_$n"
    val jobFn: (SparkSession, String) => Array[org.apache.spark.sql.Row] =
      job match {
        case "suite" => suiteJob
        case "suite-fused" => suiteFusedJob
        case "neardup" => neardupJob
        case "neardup-forcecap" => neardupForceCapJob
        case other => sys.error(s"unknown job '$other' (suite | suite-fused | neardup | neardup-forcecap)")
      }
    val jobDesc = job match {
      case "suite" =>
        s"""FULL suite: ${Constraints.webtextSuite.size} row constraints ->
           |verdict grid + url-uniqueness + lineage RI sort-merge anti join +
           |per-partition column stats""".stripMargin
      case "suite-fused" =>
        s"""FULL suite, FUSED pass: ${Constraints.webtextSuite.size} row constraints
           |AND per-partition column stats from Profile's ONE aggregate over
           |ONE scan (64-row aggregate persisted; stats derivation reads the
           |cache) + the identical url-uniqueness / lineage RI checks —
           |output rows identical to the `suite` job""".stripMargin
      case "neardup" =>
        """production (gated) MinHash LSH near-dup over the PLANTED
          |near-dup corpus (WebGen.neardupDocs: 50k-pseudo-word vocab,
          |25-member cliques + adjacent pairs): shingle -> one-pass
          |signature -> banding -> hot-bucket gate (exact pre-pass; no
          |oversized bucket -> window-free round-3 plan) -> band self-join
          |-> exact-jaccard verify; parity = the pair set itself""".stripMargin
      case "neardup-forcecap" =>
        """FORCED-cap MinHash LSH near-dup (capGate=always) over the
          |planted near-dup corpus: same pipeline with the unconditional
          |row_number<=cap WindowGroupLimit on the banded frame —
          |evidences the cap window machinery's own scaling;
          |parity = the pair set itself""".stripMargin
    }

    // generate once (not timed), partitioned by table partition column
    if (!Files.exists(Paths.get(dataPath))) {
      val s = session(32)
      val gen = if (job.startsWith("neardup")) WebGen.neardupDocs(s, n, parts = 64)
                else WebGen.pages(s, n, parts = 64)
      gen.write.partitionBy("part").mode("overwrite").parquet(dataPath)
    }

    def timedRun(cpus: Int): Double = {
      val s = session(cpus)
      val t0 = System.nanoTime(); jobFn(s, dataPath)
      (System.nanoTime() - t0) / 1e9
    }
    // force the bandwidth-probe array init OUTSIDE any timed region
    // (lazy 1.6 GB single-threaded tabulate would poison the first probe)
    require(bwArr.length > 0)
    probeThr(cA, itersPerTask = 10_000_000L) // JIT-warm both probe loops
    bwProbeThr(cA)
    // warm-up pair + verdict parity capture (untimed)
    val vA = jobFn(session(cA), dataPath).map(_.mkString("|")).sorted
    val vB = jobFn(session(cB), dataPath).map(_.mkString("|")).sorted
    val parity = vA.sameElements(vB)

    val samples = (1 to reps).map { i =>
      val pA = probeThr(cA); val bA = bwProbeThr(cA); val tA = timedRun(cA)
      val pB = probeThr(cB); val bB = bwProbeThr(cB); val tB = timedRun(cB)
      val eff = (n / tB) / (ratio * n / tA)
      val ceil = pB / (ratio * pA)
      val bwCeil = bB / (ratio * bA)
      println(f"[scaling $cA->$cB] rep $i: tN=$tA%.2f t4N=$tB%.2f eff=$eff%.3f " +
        f"cpu_ceiling=$ceil%.3f bw_ceiling=$bwCeil%.3f (bwN=$bA%.0fGB/s bw4N=$bB%.0fGB/s)")
      (tA, tB, ceil, bwCeil, eff)
    }
    val tAs = samples.map(_._1); val tBs = samples.map(_._2)
    val ceils = samples.map(_._3); val bwCeils = samples.map(_._4)
    val effs = samples.map(_._5) // the SAME value each rep printed
    val norms = (effs, ceils).zipped.map(_ / _)
    val mA = median(tAs); val mB = median(tBs)
    val thrA = n / mA; val thrB = n / mB
    val eff = thrB / (ratio * thrA)

    // one stamp for heading + footer: the heading carries it so repeated
    // sets of the same job/levels never collide as markdown anchors
    val stamp = java.time.Instant.now()
    val md =
      s"""
         |## Scaling set ($job job) @ $stamp — local[$cA] -> local[$cB]: interleaved A/B sampling
         |
         |Measured job ($jobDesc) over $n WebGen pages, driver heap
         |${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}. Hygiene per the round-2 review: $reps
         |interleaved N<->4N sample pairs (each rep: arithmetic probe @$cA,
         |timed run @$cA, probe @$cB, timed run @$cB; fresh session per run; one
         |untimed warm-up pair first), so co-tenant host noise hits both
         |levels of a pair about equally. Headline = median, dispersion =
         |min-max over reps; the probe measures what this box can physically
         |deliver for a $cA->$cB scale-up in the surrounding window.
         |
         || parallelism | median sec | min-max sec | median docs/sec |
         ||---|---|---|---|
         || local[$cA]  (N)  | ${f"$mA%.2f"} | ${f"${tAs.min}%.2f"}-${f"${tAs.max}%.2f"} | ${f"$thrA%.0f"} |
         || local[$cB] (4N) | ${f"$mB%.2f"} | ${f"${tBs.min}%.2f"}-${f"${tBs.max}%.2f"} | ${f"$thrB%.0f"} |
         |
         |- scaling efficiency (median thr@4N) / (4 x median thr@N) = **${f"$eff%.3f"}** (target >= 0.8)
         |- per-rep paired efficiencies: ${effs.map(e => f"$e%.3f").mkString(", ")}
         |  (median **${f"${median(effs)}%.3f"}**, min ${f"${effs.min}%.3f"}, max ${f"${effs.max}%.3f"})
         |- simultaneous CPU ceiling (pure-register LCG probe, no DRAM traffic):
         |  ${ceils.map(c => f"$c%.3f").mkString(", ")} (median **${f"${median(ceils)}%.3f"}**)
         |- simultaneous MEMORY-BANDWIDTH ceiling (1.6 GB stream-sum probe —
         |  the ceiling that binds a parquet-decode suite on ONE socket):
         |  ${bwCeils.map(c => f"$c%.3f").mkString(", ")} (median **${f"${median(bwCeils)}%.3f"}**)
         |- CPU-ceiling-normalized engine efficiency per rep: ${norms.map(x => f"$x%.3f").mkString(", ")}
         |  (median **${f"${median(norms)}%.3f"}**)
         |- verdict parity across parallelism levels: **${if (parity) "IDENTICAL" else "MISMATCH"}**
         |  (${vA.length} verdict rows compared)
         |
         |Generated by `graft.bench.ScalingBench` on $stamp.
         |""".stripMargin
    Option(Paths.get(outMd).getParent).foreach(Files.createDirectories(_))
    Files.writeString(Paths.get(outMd), md,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    println(s"""{"cpusA":$cA,"cpusB":$cB,"thrN":$thrA,"thr4N":$thrB,"efficiency":$eff,"eff_median_paired":${median(effs)},"eff_min":${effs.min},"eff_max":${effs.max},"cpu_ceiling_median":${median(ceils)},"bw_ceiling_median":${median(bwCeils)},"normalized_median":${median(norms)},"parity":$parity,"reps":$reps}""")
    SparkSession.getActiveSession.foreach(_.stop())
  }
}
