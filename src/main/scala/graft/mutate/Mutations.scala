package graft.mutate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-transform ("mutation") operators — pure conditional column
  * rewrites, the Spark re-expression of the reference's curation state
  * machine (reference: src/sssom_pydantic/process.py:206-341 curate /
  * review / publish, process.py:378-465 invert, api.py:515-538
  * standardize / negate).
  *
  * All of these are narrow `select`/`when` projections: no shuffle, full
  * codegen, safe inside any pipeline stage.
  */
object Mutations {

  /** exists_action policy (process.py:302-310, 329-337): what to do when
    * the target column already has a value.
    */
  sealed trait ExistsAction
  case object ErrorIfExists extends ExistsAction
  case object Keep extends ExistsAction
  case object Overwrite extends ExistsAction

  /** Batch conditional update (the `curate` pattern, process.py:206-261):
    * where `cond` holds, apply every assignment; other rows pass through.
    *
    * One `select` over the original row — `cond` and every assignment
    * value are evaluated against the INPUT columns, like the reference's
    * `model_copy(update=...)` which reads the old record and writes a new
    * one. (A `withColumn` fold would instead let an assignment that
    * overwrites a column referenced by `cond` change the condition seen
    * by later assignments, making results depend on Map iteration order.)
    * Assignments to columns not present in `df` are appended (null where
    * `cond` is false).
    */
  def conditionalUpdate(df: DataFrame, cond: Column,
                        assignments: Map[String, Column]): DataFrame = {
    val existing = df.columns.map { c =>
      assignments.get(c)
        .map(v => when(cond, v).otherwise(col(c)).as(c))
        .getOrElse(col(c))
    }
    val appended = assignments.view.filterKeys(!df.columns.contains(_)).toSeq
      .sortBy(_._1)
      .map { case (c, v) => when(cond, v).as(c) }
    df.select(existing ++ appended: _*)
  }

  /** Set a column under an exists_action policy (the review/publish
    * stamping pattern). With [[ErrorIfExists]], conflicting rows are
    * returned via the error channel instead of throwing — collect
    * violations, keep processing (io.py:86-102 discipline): the second
    * DataFrame holds rows whose existing value blocked the write.
    */
  def setWithPolicy(df: DataFrame, column: String, newValue: Column,
                    policy: ExistsAction): (DataFrame, DataFrame) = policy match {
    case Overwrite =>
      (df.withColumn(column, newValue), df.limit(0))
    case Keep =>
      (df.withColumn(column, coalesce(col(column), newValue)), df.limit(0))
    case ErrorIfExists =>
      val conflicts = df.filter(col(column).isNotNull)
      (df.filter(col(column).isNull).withColumn(column, newValue), conflicts)
  }

  /** Swap column pairs (the `invert` subject/object swap,
    * process.py:378-465: pairs computed from field names at import).
    */
  def swapColumns(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    val swapped = pairs.flatMap { case (a, b) => Seq(a -> col(b), b -> col(a)) }.toMap
    df.select(df.columns.map(c => swapped.getOrElse(c, col(c)).as(c)): _*)
  }

  /** Rewrite values through a broadcast dictionary, keeping unmapped
    * values (the `standardize` Bioregistry rewrite, api.py:515-531).
    */
  def rewriteViaMap(df: DataFrame, column: String,
                    mapping: Map[String, String]): DataFrame = {
    val m = map(mapping.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq: _*)
    df.withColumn(column, coalesce(element_at(m, col(column)), col(column)))
  }

  /** Attach names from a lookup table (the `relabel` PyOBO join,
    * api.py:504-513) — broadcast hash join on the key.
    */
  def attachLabels(df: DataFrame, labels: DataFrame, key: String,
                   labelCol: String): DataFrame =
    df.join(broadcast(labels.select(col(key), col(labelCol))), Seq(key), "left")

  /** Toggle a marker column null↔value (the `negate` predicate_modifier
    * toggle, api.py:533-538).
    */
  def toggleFlag(df: DataFrame, column: String, value: String): DataFrame =
    df.withColumn(column,
      when(col(column).isNull, lit(value)).otherwise(lit(null).cast("string")))
}
