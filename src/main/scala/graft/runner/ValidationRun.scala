package graft.runner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ckpt.Checkpoint
import graft.constraints.Constraint
import graft.io.Tables
import graft.stats.Stats

/** End-to-end resumable validation run: constraint suite → violations +
  * verdicts + per-partition metrics, appended to output tables under one
  * run id, checkpointed per table-partition batch.
  *
  * This is the engine's `ValidationRun: plan → execute → verdicts`
  * (SURVEY §7.1 runner/). Scale behavior:
  *   - The input filter `!part.isin(completed)` is a partition-pruning
  *     predicate when the source table is partitioned by `part` — a
  *     resumed run never rescans completed partitions' files.
  *   - Outputs are append-only with idempotence keys
  *     (run_id, part, check_name); a crashed run re-appends the same keys
  *     on retry and readers dedup by key (the reference's
  *     content-addressed upsert discipline, database/repo.py:204-218).
  */
object ValidationRun {

  final case class Report(runId: String, snapshotId: Long,
                          partsProcessed: Seq[Int], rows: Long)

  def violationsPath(root: String) = s"$root/violations"
  def verdictsPath(root: String) = s"$root/verdicts"
  def metricsPath(root: String) = s"$root/metrics"
  def lineagePath(root: String) = s"$root/run_lineage"

  /** Run the suite over all partitions not yet checkpointed under `root`.
    * `statsColumns` get a per-partition stats row each.
    */
  def run(spark: SparkSession, pages: DataFrame, suite: Seq[Constraint],
          root: String, runId: String, keyCols: Seq[String] = Seq("url"),
          statsColumns: Seq[String] = Seq("url", "lang")): Report = {
    val done = Checkpoint.completedParts(spark, root)
    val todo = if (done.isEmpty) pages
      else pages.filter(!col("part").isin(done.toSeq: _*))
    val parts = todo.select("part").distinct().collect().map(_.getInt(0)).toSeq.sorted
    if (parts.isEmpty) return Report(runId, Checkpoint.latestSnapshotId(spark, root), Nil, 0L)

    // cache: violations, verdicts and stats share one scan of the batch
    val batch = todo.persist()
    try {
      val viol = Runner.violations(batch, suite, keyCols)
        .withColumn("run_id", lit(runId))
      Tables.appendWithSchemaCheck(spark, viol, violationsPath(root))

      val verd = Runner.verdicts(batch, suite)
        .withColumn("run_id", lit(runId))
      Tables.appendWithSchemaCheck(spark, verd, verdictsPath(root))

      val stats = Stats.columnStats(batch, statsColumns)
        .withColumn("run_id", lit(runId))
      Tables.appendWithSchemaCheck(spark, stats, metricsPath(root))

      val lenHist = Stats.lengthHistogram(batch, "text")
        .withColumn("run_id", lit(runId))
      Tables.appendWithSchemaCheck(spark, lenHist, s"$root/len_hist")

      // cross-run row invariant: byte-identical text per url
      // (BASELINE.json::input_hint); changed digests append to the same
      // violations table as the row constraints
      val digViol = graft.checks.Invariants.checkAndStoreDigests(spark, batch, root, runId)
      val digTarget = if (keyCols == Seq("url")) violationsPath(root)
        else s"$root/digest_violations" // key shapes differ: keep own table
      Tables.appendWithSchemaCheck(spark, digViol, digTarget)

      val rows = batch.count()
      val snap = Checkpoint.commit(spark, root, runId, parts)

      // per-partition lineage rows (north rule): which run + snapshot
      // processed which partition, with its row count — the audit trail a
      // resumed run extends
      import spark.implicits._
      val lineage = batch.groupBy(col("part")).agg(count(lit(1)).as("row_count"))
        .withColumn("run_id", lit(runId))
        .withColumn("snapshot_id", lit(snap))
        .withColumn("committed_at", current_timestamp())
      Tables.appendWithSchemaCheck(spark, lineage, lineagePath(root))

      Report(runId, snap, parts, rows)
    } finally batch.unpersist()
  }

  /** Read back the verdicts table deduped by idempotence key — what a
    * consumer sees after any number of crashed/retried appends.
    */
  def currentVerdicts(spark: SparkSession, root: String): DataFrame =
    Tables.read(spark, verdictsPath(root))
      .dropDuplicates("run_id", "part", "check_name")
}
