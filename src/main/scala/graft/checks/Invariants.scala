package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expr.Fnv64

/** Cross-run row invariants — the per-row identity contract.
  *
  * The reference's invariant is the content-addressed record hash: any
  * mutation changes identity and is detected on re-hash (reference:
  * src/sssom_pydantic/database/repo.py:204-218 `_mutate` re-hashes, and
  * api.py:883-936 `hash_mapping`). Ours (BASELINE.json::input_hint) is
  * byte-identical extracted `text` per `url`: a digest column stored per
  * run and re-verified against the previous run.
  *
  * Scale design: digests are computed scan-side (codegen'd FNV-64 /
  * built-in hash expressions, no UDF); the comparison is an equi-join on
  * the key — sort-merge at scale, with only (key, 8-byte digest) columns
  * shuffled, never the text itself.
  */
object Invariants {

  /** Reference-faithful digest: FNV-1a 64 over UTF-8 bytes, uppercase hex
    * of little-endian bytes (api.py:926-936).
    */
  def textDigest(c: Column): Column = Fnv64.fnv64Hex(c)

  /** Rows whose digest of `valueCol` differs between two runs, keyed by
    * `keyCols`. Emits key columns + both digests.
    */
  def digestChanged(current: DataFrame, baseline: DataFrame,
                    keyCols: Seq[String], digest: Column): DataFrame = {
    val cur = current.select(keyCols.map(col) :+ digest.as("digest_current"): _*)
    val base = baseline.select(keyCols.map(col) :+ digest.as("digest_baseline"): _*)
    cur.join(base, keyCols, "inner")
      .filter(col("digest_current") =!= col("digest_baseline"))
  }

  /** The cross-run invariant pass: compute FNV-64 digests for the batch,
    * compare against the stored FIRST-SEEN digest per url (a url's digest
    * must NEVER change, so the original is the contract), return the
    * violation rows in the standard shape, and append digests for urls
    * not seen before.
    *
    * Only (url, 16-char digest, part) ever moves through the comparison
    * join — never the text.
    *
    * BOUNDED STORE: the digests table holds exactly ONE row per url —
    * maintained inductively (the initial write is one canonical row per
    * url; every later run appends only urls absent from the store, via a
    * left-anti join that reuses the comparison join's shuffle key). Table
    * size is |distinct urls|, independent of run count; on Iceberg this
    * append-if-absent is `MERGE ... WHEN NOT MATCHED INSERT`. (Round 1
    * appended every run's digests and compared against a distinct() over
    * all history — unbounded growth.)
    *
    * RESUME CORRECTNESS REQUIRES URL-CO-PARTITIONED INPUT (north rule:
    * partition by url-hash, as WebGen does): resumed runs process
    * disjoint table partitions, and the canonical min-digest per url is
    * computed per batch — a url spanning partitions would store
    * conflicting canonical digests across batches and report spurious
    * changes (SURVEY §7.4 "partition must mean the table's partition
    * column" hazard, observable with the doc_id-partitioned Derive table).
    */
  /** One CANONICAL digest row per url (min over duplicates,
    * deterministic): divergent duplicate urls are the uniqueness check's
    * finding, not a digest-invariant break — the invariant is about the
    * url's canonical text changing across runs. Over a url-bucketed scan
    * the groupBy inherits the storage distribution: no exchange.
    */
  def canonicalDigests(batch: DataFrame): DataFrame =
    batch.filter(col("url").isNotNull)
      .select(col("part"), col("url"), textDigest(col("text")).as("digest"))
      .groupBy(col("url"))
      .agg(min(col("part")).as("part"), min(col("digest")).as("digest"))
      .select(col("part"), col("url"), col("digest"))

  /** Digest-invariant violation rows of `cur` against a stored
    * one-row-per-url baseline (standard violation shape, sans run_id).
    */
  def digestViolationsAgainst(cur: DataFrame, prev: DataFrame): DataFrame =
    cur.join(prev, Seq("url"))
      .filter(col("digest") =!= col("digest_prev"))
      .select(col("part"), col("url"),
        lit("text_digest").as("check_name"),
        concat(col("digest_prev"), lit("->"), col("digest")).as("detail"),
        lit("processing").as("stage"))

  /** LIFETIME CONTRACT: the returned violations DataFrame is PERSISTED
    * (it must materialize before the new-digest append below mutates the
    * store it reads) — the caller unpersists after consuming it, or a
    * long-lived session leaks one cached DataFrame per run.
    */
  def checkAndStoreDigests(spark: org.apache.spark.sql.SparkSession,
                           batch: DataFrame, root: String, runId: String): DataFrame = {
    import graft.io.Tables
    val path = s"$root/digests"
    val cur = canonicalDigests(batch)
    if (!Tables.exists(spark, path)) {
      Tables.appendWithSchemaCheck(spark,
        cur.withColumn("run_id", lit(runId)), path)
      return cur.limit(0).select(col("part"), col("url"),
        lit("text_digest").as("check_name"), lit("").as("detail"),
        lit("processing").as("stage")).withColumn("run_id", lit(runId))
    }
    // one row per url by construction — no distinct() over history needed
    val prev = Tables.read(spark, path)
      .select(col("url"), col("digest").as("digest_prev"))
    val out = digestViolationsAgainst(cur, prev)
      .withColumn("run_id", lit(runId)).persist()
    out.count() // materialize BEFORE appending new digests below
    val newUrls = cur.join(prev.select(col("url")), Seq("url"), "left_anti")
    Tables.appendWithSchemaCheck(spark,
      newUrls.select(col("part"), col("url"), col("digest"))
        .withColumn("run_id", lit(runId)), path)
    out
  }

  /** Bucketed twin of [[checkAndStoreDigests]]: the digest STORE is a
    * url-bucketed catalog table ([[graft.io.Tables.writeBucketed]]), so
    * when the batch also comes from a url-bucketed scan the compare join
    * AND the append-if-absent anti join both run with zero exchanges —
    * the cross-run invariant never re-shuffles the fact table. Joins are
    * merge-hinted (fact-fact; see [[graft.checks.DatasetChecks.urlChecksColocated]]).
    */
  def checkAndStoreDigestsBucketed(spark: org.apache.spark.sql.SparkSession,
                                   batch: DataFrame, table: String, path: String,
                                   runId: String, buckets: Int = 8): DataFrame = {
    import graft.io.Tables
    val cur = canonicalDigests(batch)
    if (!spark.catalog.tableExists(table)) {
      Tables.writeBucketed(cur.withColumn("run_id", lit(runId)),
        table, path, "url", buckets)
      return cur.limit(0).select(col("part"), col("url"),
        lit("text_digest").as("check_name"), lit("").as("detail"),
        lit("processing").as("stage")).withColumn("run_id", lit(runId))
    }
    val prev = spark.table(table)
      .select(col("url"), col("digest").as("digest_prev")).hint("merge")
    val out = digestViolationsAgainst(cur.hint("merge"), prev)
      .withColumn("run_id", lit(runId)).persist()
    out.count() // materialize BEFORE appending new digests below
    val newUrls = cur.hint("merge")
      .join(prev.select(col("url")).hint("merge"), Seq("url"), "left_anti")
    Tables.appendBucketed(spark,
      newUrls.select(col("part"), col("url"), col("digest"))
        .withColumn("run_id", lit(runId)), table, path, "url", buckets)
    out
  }
}
