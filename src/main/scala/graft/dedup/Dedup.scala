package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-uniqueness / dedup operators — the engine's analogue of the
  * reference's canonical-key dedup (reference: src/sssom_pydantic/
  * process.py:99-147 `remove_redundant_internal`: group by canonical key,
  * keep arg-max by score) and duplicates report (compare.py:192-206).
  *
  * Scale design: arg-max dedup is an AGGREGATE (`max_by`), not a window.
  * A window (`row_number over partitionBy(key)`) must co-locate every
  * duplicate of a key in one task — a hot url/domain becomes a straggler.
  * `max_by` partial-aggregates map-side, so each task contributes at most
  * one candidate row per key to the shuffle: skew collapses before it
  * moves. For extreme skew the two-phase salted variant splits the
  * reduction of a single hot key across `salts` reducers first.
  */
object Dedup {

  /** Keep exactly one row per key: the arg-max by `ord` (ties must be
    * broken inside `ord` by a unique column — pass a struct).
    * Mirrors process.py:124-127 `_score_mapping` arg-max semantics.
    */
  def uniqueByKey(df: DataFrame, key: Column, ord: Column, payload: Seq[String]): DataFrame =
    df.groupBy(key.as("key"))
      .agg(max_by(struct(payload.map(col): _*), ord).as("best"))
      .select(col("key") +: payload.map(c => col(s"best.$c").as(c)): _*)

  /** Two-phase salted variant for hot keys: phase 1 reduces each
    * (key, salt) slice, phase 2 reduces the ≤`salts` survivors per key.
    * Same result as [[uniqueByKey]]; use when one key can dominate a
    * reducer even after map-side combine (north rule: hot domains).
    */
  def uniqueByKeySalted(df: DataFrame, key: Column, ord: Column,
                        payload: Seq[String], salts: Int = 16): DataFrame = {
    val withOrd = df.withColumn("__ord", ord)
    val phase1 = withOrd
      .groupBy(key.as("key"), pmod(xxhash64(payload.map(col): _*), lit(salts)).as("__salt"))
      .agg(max_by(struct((payload :+ "__ord").map(col): _*), col("__ord")).as("best"))
    phase1
      .groupBy(col("key"))
      .agg(max_by(col("best"), col("best.__ord")).as("best"))
      .select(col("key") +: payload.map(c => col(s"best.$c").as(c)): _*)
  }

  /** Heavy-hitter detection on a deterministic row sample — the cheap
    * pre-pass that decides WHETHER a key needs [[uniqueByKeySalted]]
    * before the full shuffle runs: count key occurrences among rows
    * where `sampleOn % mod == 0` (systematic 1/mod sampling on a
    * key-uncorrelated id — deterministic, so the oracle reproduces it
    * exactly, unlike `df.sample`) and keep keys whose sampled count
    * clears `threshold`. `est_count = sampled_n × mod` is the unbiased
    * frequency estimate. At scale the groupBy shuffles 1/mod of the
    * rows, and a key hot enough to skew a reducer is hot enough to
    * clear any sensible threshold in the sample.
    */
  def hotKeys(df: DataFrame, key: Column, sampleOn: Column,
              mod: Int, threshold: Long): DataFrame =
    df.filter(sampleOn % mod === 0)
      .groupBy(key.as("key"))
      .agg(count(lit(1)).as("sampled_n"))
      .filter(col("sampled_n") >= threshold)
      .select(col("key"), col("sampled_n"),
        (col("sampled_n") * mod).as("est_count"))

  /** Duplicate-key report: keys appearing more than once, with counts
    * (compare.py:192-206 duplicates tabulation).
    */
  def duplicateReport(df: DataFrame, key: Column): DataFrame =
    df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** Exact content dedup: group rows by a content digest of `contentCol`,
    * keep the minimum `idCol` as the canonical representative; emits
    * (content_hash, doc_id = representative, n_copies).
    */
  def exactByContent(df: DataFrame, contentCol: Column, idCol: Column): DataFrame =
    df.groupBy(md5(contentCol).as("content_hash"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Referential-integrity check: rows of `child` whose `key` has no match
    * in `parent` — the dangling-lineage left-anti join (reference:
    * database/neo4j_database.py:118-121 `derived_from` edges; SURVEY §2.4).
    * Broadcast the parent keys when small; at scale the non-broadcast
    * path PINS a shuffled sort-merge anti join (merge hint): the parent
    * key set of a 100 TB fact table never fits an executor, and a
    * size-misestimate must not silently flip the plan to broadcast. AQE
    * skew-join then splits hot-key partitions at runtime (SkewBench
    * exercises a key holding ~10% of all child rows through this path).
    */
  def danglingRows(child: DataFrame, parent: DataFrame, keyCol: String,
                   broadcastParent: Boolean = false): DataFrame = {
    val parentKeys = parent.select(col(keyCol)).distinct()
    if (broadcastParent) child.join(broadcast(parentKeys), Seq(keyCol), "left_anti")
    else child.hint("merge").join(parentKeys.hint("merge"), Seq(keyCol), "left_anti")
  }
}
