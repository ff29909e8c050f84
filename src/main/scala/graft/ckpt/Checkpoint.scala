package graft.ckpt

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Snapshot-manifest checkpointing (FIXTURES.md §B.6) — the Iceberg
  * snapshot emulation that makes validation runs resumable.
  *
  * Contract (north rule): a re-run over the same input processes only
  * table partitions absent from the manifest; full-run ≡ resumed-run on
  * all output tables. Snapshot ids are monotonic; each snapshot row
  * records the partitions completed by one commit. Completed partitions
  * are the UNION over all snapshots (append-only, like Iceberg's
  * manifest list).
  *
  * The reference analogue is `CachedSemanticMappings` lazy resume
  * (io.py:1018-1032) + the content-addressed `_mutate` insert-then-delete
  * (database/repo.py:204-218): append-only bookkeeping, idempotence keyed
  * by content, crash between steps never double-counts.
  */
object Checkpoint {

  private def manifestPath(root: String) = s"$root/_snapshots"

  /** The committed-snapshot manifest (empty frame with the manifest
    * schema when no commit happened yet) — the certification source
    * audit readers join against (ValidationRun.currentLineage).
    */
  def manifest(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    if (Tables.exists(spark, manifestPath(root))) spark.read.parquet(manifestPath(root))
    else Seq.empty[(Long, String, Seq[Int], java.sql.Timestamp)]
      .toDF("snapshot_id", "run_id", "parts_done", "committed_at")
  }

  def latestSnapshotId(spark: SparkSession, root: String): Long = {
    if (!Tables.exists(spark, manifestPath(root))) return 0L
    val m = spark.read.parquet(manifestPath(root))
    if (m.isEmpty) 0L
    else m.agg(max(col("snapshot_id"))).head().getLong(0)
  }

  /** Partitions already completed (union across all snapshots). */
  def completedParts(spark: SparkSession, root: String): Set[Int] = {
    if (!Tables.exists(spark, manifestPath(root))) return Set.empty
    spark.read.parquet(manifestPath(root))
      .select(explode(col("parts_done")).as("p"))
      .distinct().collect().map(_.getInt(0)).toSet
  }

  /** The id the NEXT commit will use. Callers stamp audit rows
    * (run_lineage) with this and append them BEFORE committing: a crash
    * between the two then loses only a re-appendable audit row of a
    * failed attempt — the reverse order would mark the partitions done
    * and permanently skip the audit append on resume.
    */
  def nextSnapshotId(spark: SparkSession, root: String): Long =
    latestSnapshotId(spark, root) + 1

  /** Commit a snapshot recording `partsDone` as newly completed.
    * Returns the new monotonic snapshot id (single writer per root —
    * equals what [[nextSnapshotId]] returned just before).
    */
  def commit(spark: SparkSession, root: String, runId: String,
             partsDone: Seq[Int]): Long = {
    import spark.implicits._
    val next = nextSnapshotId(spark, root)
    val row = Seq((next, runId, partsDone, new java.sql.Timestamp(System.currentTimeMillis())))
      .toDF("snapshot_id", "run_id", "parts_done", "committed_at")
    row.write.mode("append").parquet(manifestPath(root))
    next
  }
}
