package graft.drift

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift checks: KL divergence and PSI between a current and
  * a reference (baseline) categorical distribution — the engine's
  * generalization of the reference's distribution counters
  * (reference: src/sssom_pydantic/query.py:274-291 prefix-pair / entity
  * Counters) into a thresholded verdict, and of its confidence
  * aggregation's partial/final shape (process.py:472-568).
  *
  * Scale design: each side is one partial+final count aggregate; the
  * divergence is ONE ordinary partial+final aggregate over the joined
  * histograms (totals folded in algebraically — see [[klPsi]]), so there
  * is no single-partition stage anywhere and the histogram key domain
  * may be arbitrarily large (calling [[histogram]] on `url` is slow only
  * in proportion to its cardinality, never a one-task bottleneck).
  * Fully distributed; no collect.
  */
object Drift {

  /** Categorical histogram of `keyExpr` (one count aggregate). */
  def histogram(df: DataFrame, keyExpr: Column): DataFrame =
    df.groupBy(keyExpr.as("key")).agg(count(lit(1)).as("n"))

  /** A NULL key is a real histogram bucket (nullable keyExpr), but SQL
    * equi-joins never match NULL = NULL — the smoothing branch would
    * silently replace its true count with the smoothing constant and the
    * inner-join branch would drop it. Normalize to a string sentinel so
    * the bucket joins like any other. Non-null keys get a 'k:' prefix so
    * a genuine key VALUE equal to the sentinel can never collide with
    * the NULL bucket. LOCKSTEP: the drift_lang/drift_len oracles
    * (SparkEntry) mirror this exact expression as
    * COALESCE('k:' || CAST(key AS VARCHAR), '∅NULL') — change both or
    * neither.
    */
  private def normKeys(df: DataFrame): DataFrame =
    df.select(
      coalesce(concat(lit("k:"), col("key").cast("string")), lit("∅NULL"))
        .as("key"),
      col("n"))

  /** KL(p ‖ q) and PSI between two histograms over the SAME key domain.
    * `smoothing` > 0 applies additive smoothing over the union of keys
    * (required when a key can be absent on one side — KL/PSI are
    * undefined at q=0). With smoothing = 0, keys are inner-joined and the
    * caller guarantees shared support.
    */
  def klPsi(currentRaw: DataFrame, baselineRaw: DataFrame,
            smoothing: Double = 0.0): DataFrame = {
    val current = normKeys(currentRaw)
    val baseline = normKeys(baselineRaw)
    val joined =
      if (smoothing > 0.0) {
        // ONE full-outer join builds the key union directly from the two
        // (tiny, already-aggregated) histograms — the union+distinct+two-
        // left-join scaffold this replaces rebuilt the key set with three
        // extra shuffles for the same rows (r3 bench regression)
        current.withColumnRenamed("n", "n_p")
          .join(baseline.withColumnRenamed("n", "n_q"), Seq("key"), "full_outer")
          .select(col("key"),
            (coalesce(col("n_p"), lit(0L)) + smoothing).as("c_p"),
            (coalesce(col("n_q"), lit(0L)) + smoothing).as("c_q"))
      } else {
        current.withColumnRenamed("n", "c_p")
          .join(baseline.withColumnRenamed("n", "c_q"), Seq("key"), "inner")
          .select(col("key"), col("c_p").cast("double").as("c_p"),
            col("c_q").cast("double").as("c_q"))
      }
    // Totals folded in algebraically instead of a per-row normalization
    // pass: with p_i = c_p/T_p and q_i = c_q/T_q,
    //   KL  = Σ c_p·ln(c_p/c_q) / T_p  +  ln(T_q/T_p)
    //   PSI = Σ c_p·ln(c_p/c_q) / T_p  −  Σ c_q·ln(c_p/c_q) / T_q
    // (PSI's ln(T_q/T_p) cross-term cancels because Σp = Σq = 1). One
    // ordinary partial+final aggregate computes all four sums — no
    // second totals pass over `joined` (a second DataFrame reference
    // re-plans its whole subtree and scanned the input twice), no
    // single-partition window (the previous form's WindowExec was a
    // one-task bottleneck the moment a caller passed an unbounded key
    // column), no cardinality contract at all. LOCKSTEP: the
    // drift_lang/drift_len oracles (SparkEntry.klPsiOracle) mirror this
    // exact algebra — change both or neither.
    joined
      .agg(
        sum(col("c_p") * log(col("c_p") / col("c_q"))).as("s_p"),
        sum(col("c_q") * log(col("c_p") / col("c_q"))).as("s_q"),
        sum(col("c_p")).as("t_p"),
        sum(col("c_q")).as("t_q"))
      .select(
        // + 0.0 normalizes IEEE -0.0 (a tiny negative sum rounding to
        // zero) so engines can't disagree on the zero's sign
        (round(col("s_p") / col("t_p") + log(col("t_q") / col("t_p")), 6) + 0.0).as("kl"),
        (round(col("s_p") / col("t_p") - col("s_q") / col("t_q"), 6) + 0.0).as("psi"))
  }

  /** Drift verdict row: fails when PSI exceeds `psiThreshold`
    * (0.2 = "significant shift" in common PSI practice).
    */
  def verdict(current: DataFrame, baseline: DataFrame, name: String,
              psiThreshold: Double = 0.2, smoothing: Double = 0.0): DataFrame =
    klPsi(current, baseline, smoothing)
      .select(
        lit(name).as("check_name"),
        // coalesce false: an empty/disjoint histogram makes psi NULL and
        // `NULL <= t` is NULL — a drift gate filtering on !passed would
        // then silently pass (the failed-open three-valued trap the
        // constraint layer documents); an uncomputable divergence FAILS
        coalesce(col("psi") <= psiThreshold, lit(false)).as("passed"),
        col("kl"), col("psi"))
}
