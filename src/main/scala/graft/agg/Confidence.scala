package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Confidence/evidence aggregation algebra (reference: src/sssom_pydantic/
  * process.py:472-568 `estimate_confidence`): per-group creator
  * confidences combined by `mean` or by the binomial noisy-or
  * `1 - ∏(1 - cᵢ)`, negated evidence flipped to `1 - c` pre-aggregation,
  * and the reviewer blend `(1-W)·c + W·(1+R)/2` applied post-aggregation.
  *
  * Scale design: noisy-or is re-expressed as `1 - exp(Σ ln(1-cᵢ))` so it
  * is a plain partial+final `sum` aggregate (associative/commutative) —
  * the product form would need an order-sensitive fold. Everything stays
  * a single hash aggregate with map-side combine.
  */
object Confidence {

  sealed trait Model
  case object Mean extends Model
  case object Binomial extends Model // noisy-or, process.py:541-556

  /** Effective evidence confidence: negation flips (process.py:527-530). */
  def effective(conf: Column, negated: Column): Column =
    when(coalesce(negated, lit(false)), lit(1.0) - conf).otherwise(conf)

  /** Aggregate confidences per group. `conf` ∈ [0, 1]; a certain
    * evidence (c = 1) makes the noisy-or exactly 1 (its mathematical
    * limit) rather than tripping ln(0).
    */
  def aggregate(df: DataFrame, groupCols: Seq[String], conf: Column,
                model: Model, negated: Column = lit(false)): DataFrame = {
    val c = effective(conf, negated)
    val agg = model match {
      case Mean => avg(c)
      case Binomial =>
        when(max(c) >= 1.0, lit(1.0))
          .otherwise(lit(1.0) - exp(sum(log(lit(1.0) - c))))
    }
    df.groupBy(groupCols.map(col): _*)
      .agg(round(agg, 6).as("confidence"), count(lit(1)).as("n_evidence"))
  }

  /** Reviewer blend (process.py:559-567): direction/strength R ∈ [-1,1],
    * weight W ∈ [0,1]: (1-W)·c + W·(1+R)/2.
    */
  def reviewerBlend(c: Column, r: Column, w: Double): Column =
    round(lit(1.0 - w) * c + lit(w) * (lit(1.0) + r) / 2.0, 6)
}
