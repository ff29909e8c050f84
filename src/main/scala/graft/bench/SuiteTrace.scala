package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.checks.DatasetChecks
import graft.constraints.Constraints
import graft.runner.Runner
import graft.stats.Stats

/** Per-component timing of the ScalingBench suite job at ONE
  * parallelism level, so a scaling deficit between two levels can be
  * attributed to a specific sub-plan (wide row-constraint scan vs
  * url-shuffle checks vs column stats) or to the fixed per-action
  * scheduling floor, instead of being read off the end-to-end number
  * alone. Components are built EXACTLY like
  * [[ScalingBench.suiteJob]] builds them — same operators, same
  * broadcast settings — and the end-to-end grid is timed too, so the
  * parts can be checked against the whole.
  *
  * Usage: runMain graft.bench.SuiteTrace <cpus> <dataPath> [reps]
  * Prints one `[trace]` line per component per rep; run it at two
  * levels and compare per-component ratios offline.
  */
object SuiteTrace {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: runMain graft.bench.SuiteTrace <cpus> <dataPath> [reps]")
      sys.exit(2)
    }
    val cpus = args(0).toInt
    val path = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = BenchUtil.session(cpus, "graft-suitetrace")

    def pages = spark.read.parquet(path)
    def valid = pages.filter(Constraints.validUrl)
    def lineage = BenchUtil.syntheticLineage(valid)
    val ord = struct(coalesce(unix_timestamp(col("warc_ts")), lit(-1L)).as("ts"),
      (-col("doc_id")).as("negid"))
    def dsViol = DatasetChecks.uniquenessViolations(valid, ord)
      .unionByName(DatasetChecks.riViolations(valid, lineage, broadcastParent = false))
    def pc = valid.groupBy(col("part")).agg(count(lit(1)).as("row_count"))
    def dsGrid = DatasetChecks.verdictsFromViolations(
      dsViol, pc, Seq("url_unique", "url_lineage"))
    def rowGrid = Runner.verdicts(pages, Constraints.webtextSuite)
    def fullGrid = rowGrid.unionByName(dsGrid)
    def stats = Stats.columnStats(pages, Seq("url", "lang"))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val components: Seq[(String, () => Unit)] = Seq(
      "floor_action" -> (() => { spark.range(1).count(); () }),
      "floor_shuffle" -> (() => { spark.range(0, 1000000L, 1, cpus)
        .groupBy(pmod(col("id"), lit(cpus * 7))).count().collect(); () }),
      "row_verdicts" -> (() => { rowGrid.collect(); () }),
      "ds_checks" -> (() => { dsGrid.collect(); () }),
      "col_stats" -> (() => { stats.collect(); () }),
      "grid_e2e" -> (() => { fullGrid.collect(); () })
    )
    // one untimed warm-up of everything (JIT + codegen cache)
    components.foreach { case (_, f) => f() }
    spark.catalog.clearCache()
    (1 to reps).foreach { i =>
      components.foreach { case (name, f) =>
        val t = time(f())
        println(f"[trace] cpus=$cpus rep=$i $name%-13s ${t}%8.3f s")
      }
    }
    spark.stop()
  }
}
