package graft.query

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Two-corpus comparison report with conflict detection — the engine
  * form of the reference's stratified comparison markdown (reference:
  * src/sssom_pydantic/compare.py:66-316): stratify by
  * (subject-prefix, object-prefix) pair, align the two sides on the
  * (subject, object) key, and classify every key into duplicate /
  * one-side-only / predicate-conflict / modifier-conflict / agree.
  *
  * Scale design: one shuffle per side for the per-key aggregation (the
  * reference's `left_dd`/`right_dd` dict indexes), then a single
  * full-outer sort-merge join on the (subject_id, object_id) key — the
  * prefix-pair stratification is carried as grouping columns, NOT run as
  * a per-pair loop (compare.py iterates pairs in Python; a 10^12-row
  * engine must do one pass). The final classification report is a
  * map-side-combinable count aggregate.
  */
object Compare {

  /** Per-(subject, object) single-mapping view, keeping the reference's
    * "pairs with exactly one mapping" discipline (compare.py:205-206) —
    * duplicate pairs are counted separately, mirroring its Duplicates
    * table (compare.py:190-203). Restricted to manually-curated rows
    * like compare.py:135-136.
    */
  private def prep(df: DataFrame): DataFrame =
    df.filter(col("justification") === "semapv:ManualMappingCuration")
      .groupBy(col("subject_id"), col("object_id"))
      .agg(
        count(lit(1)).as("n"),
        min(col("predicate_id")).as("predicate_id"),
        min(col("predicate_modifier")).as("predicate_modifier"))

  /** Classification counts per (subject_prefix, object_prefix, class):
    * classes `duplicate_left`, `duplicate_right`, `left_only`,
    * `right_only`, `conflict_predicate`, `conflict_modifier`, `agree`.
    */
  def conflictReport(left: DataFrame, right: DataFrame): DataFrame = {
    val l = prep(left)
    val r = prep(right)
    val joined = l.select(
        col("subject_id"), col("object_id"), col("n").as("n_l"),
        col("predicate_id").as("pred_l"), col("predicate_modifier").as("mod_l"))
      .join(r.select(
        col("subject_id"), col("object_id"), col("n").as("n_r"),
        col("predicate_id").as("pred_r"), col("predicate_modifier").as("mod_r")),
        Seq("subject_id", "object_id"), "full_outer")
    val cls =
      when(col("n_l") > 1 && col("n_r").isNull, lit("duplicate_left"))
        .when(col("n_r") > 1 && col("n_l").isNull, lit("duplicate_right"))
        .when(col("n_l") > 1 || col("n_r") > 1, lit("duplicate_both"))
        .when(col("n_r").isNull, lit("left_only"))
        .when(col("n_l").isNull, lit("right_only"))
        .when(col("pred_l") =!= col("pred_r"), lit("conflict_predicate"))
        .when(F.not(col("mod_l") <=> col("mod_r")), lit("conflict_modifier"))
        .otherwise(lit("agree"))
    joined.select(
        substring_index(col("subject_id"), ":", 1).as("subject_prefix"),
        substring_index(col("object_id"), ":", 1).as("object_prefix"),
        cls.as("class"))
      .groupBy(col("subject_prefix"), col("object_prefix"), col("class"))
      .agg(count(lit(1)).as("n"))
  }
}
