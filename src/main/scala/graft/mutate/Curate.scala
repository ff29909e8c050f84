package graft.mutate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.canonical.Canonical

/** The curation-workflow operator family over mapping-record tables:
  * the mark-driven `curate` state machine, `review`/`publish` stamping,
  * the `invert` family with predicate inversion + derivation lineage,
  * and the named curation-state filters.
  *
  * Reference semantics re-expressed (all pure conditional projections —
  * no shuffle, full codegen):
  *  - curate: src/sssom_pydantic/process.py:206-261 (state table tested
  *    at tests/cases.py:316-473)
  *  - review: process.py:263-317
  *  - invert / invert_by_predicate / specializations:
  *    process.py:378-465, 639-947
  *  - exclude_negative / exclude_unsure / filter_by_confidence:
  *    process.py:603-636, 1030-1037
  *
  * Where the reference RAISES (curating an already-manually-curated
  * mapping, double inversion), the engine keeps the collect-violations
  * discipline: blocked rows are routed to an error channel / passed
  * through unchanged, never thrown — at 10^12 rows a poison record must
  * not kill the job.
  */
object Curate {

  val ManualCuration = "semapv:ManualMappingCuration"
  val MappingInversion = "semapv:MappingInversion"

  /** Predicate inversion table (public `curies.vocabulary`
    * `semantic_mapping_inversions`: skos exact/close/related are
    * self-inverse, broad ↔ narrow; process.py:429).
    */
  val InversionMap: Map[String, String] = Map(
    "skos:exactMatch" -> "skos:exactMatch",
    "skos:closeMatch" -> "skos:closeMatch",
    "skos:relatedMatch" -> "skos:relatedMatch",
    "skos:broadMatch" -> "skos:narrowMatch",
    "skos:narrowMatch" -> "skos:broadMatch")

  /** Scope marks → predicate rewrite (public `curies.vocabulary`
    * `semantic_mapping_scopes`; process.py:251-252).
    */
  val ScopeMap: Map[String, String] = Map(
    "BROAD" -> "skos:broadMatch",
    "NARROW" -> "skos:narrowMatch",
    "CLOSE" -> "skos:closeMatch",
    "RELATED" -> "skos:relatedMatch")

  /** The 7 valid curation marks (process.py:79-96 `Mark`); anything else
    * raises ValueError in the reference (process.py:257) and routes to
    * the blocked channel here.
    */
  val ValidMarks: Seq[String] =
    Seq("correct", "incorrect", "unsure") ++ ScopeMap.keys.toSeq.sorted

  private def litMap(m: Map[String, String]): Column =
    map(m.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq: _*)

  /** Mark-driven batch curation (process.py:206-261). Expects the
    * mapping-record column layout of `Derive.mappings`.
    *
    * Per mark (applied where the row is NOT already manually curated):
    *  - correct: stamp only (justification/author/confidence/date; zero
    *    the tool + similarity fields)
    *  - incorrect: stamp + predicate_modifier = 'Not'
    *  - BROAD/NARROW/CLOSE/RELATED: stamp + predicate := scope predicate
    *  - unsure: routes to review(score = 0.0) — reviewer fields set,
    *    everything else untouched (process.py:221-222)
    *  - any stamp also clears a previous unsure review
    *    (reviewer_agreement == 0.0 → reviewer fields nulled,
    *    process.py:238-242)
    *
    * Returns (curated, blocked): `blocked` holds rows whose
    * justification was already ManualMappingCuration — the reference
    * raises "should use review workflow" (process.py:217-219) — and rows
    * whose mark is not one of the 7 [[ValidMarks]] literals (the
    * reference raises ValueError, process.py:257); the engine returns
    * both on the error channel unchanged.
    */
  def curate(df: DataFrame, mark: Column, author: Column,
             confidence: Column, date: Column): (DataFrame, DataFrame) = {
    // coalesce both terms: a NULL mark or NULL justification makes the
    // predicate three-valued-NULL, which would drop the row from BOTH
    // filter channels. A null mark is not one of the 7 literals → error
    // channel; a null justification is not manual curation → eligible.
    val blockedCond = coalesce(col("justification") === ManualCuration, lit(false)) ||
      !coalesce(mark.isin(ValidMarks: _*), lit(false))
    val isUnsure = mark === "unsure"
    val isStamp = !isUnsure // correct / incorrect / scope marks
    val wasUnsure = col("reviewer_agreement") === 0.0
    val scoped = element_at(litMap(ScopeMap), mark)
    val updated = df.filter(!blockedCond).select(
      df.columns.map {
        case "predicate_id" =>
          when(isStamp && scoped.isNotNull, scoped)
            .otherwise(col("predicate_id")).as("predicate_id")
        case "predicate_modifier" =>
          when(isStamp && mark === "incorrect", lit("Not"))
            .otherwise(col("predicate_modifier")).as("predicate_modifier")
        case "justification" =>
          when(isStamp, lit(ManualCuration)).otherwise(col("justification"))
            .as("justification")
        case "author_id" =>
          when(isStamp, author).otherwise(col("author_id")).as("author_id")
        case "confidence" =>
          // the reference sets confidence to the parameter UNCONDITIONALLY
          // (even when None) — curation resets machine confidence
          when(isStamp, confidence).otherwise(col("confidence")).as("confidence")
        case "mapping_tool" =>
          when(isStamp, lit(null).cast("string")).otherwise(col("mapping_tool"))
            .as("mapping_tool")
        case "similarity_score" =>
          when(isStamp, lit(null).cast("double")).otherwise(col("similarity_score"))
            .as("similarity_score")
        case "similarity_measure" =>
          // zeroed alongside mapping_tool/similarity_score (process.py:231-233)
          when(isStamp, lit(null).cast("string")).otherwise(col("similarity_measure"))
            .as("similarity_measure")
        case "reviewer_id" =>
          when(isUnsure, author)
            .when(isStamp && wasUnsure, lit(null).cast("string"))
            .otherwise(col("reviewer_id")).as("reviewer_id")
        case "reviewer_agreement" =>
          when(isUnsure, lit(0.0))
            .when(isStamp && wasUnsure, lit(null).cast("double"))
            .otherwise(col("reviewer_agreement")).as("reviewer_agreement")
        case "review_date" =>
          when(isUnsure, date)
            .when(isStamp && wasUnsure, lit(null).cast("string"))
            .otherwise(col("review_date")).as("review_date")
        case "mapping_date" =>
          when(isStamp, date).otherwise(col("mapping_date")).as("mapping_date")
        case other => col(other)
      }: _*)
    (updated, df.filter(blockedCond))
  }

  /** review (process.py:263-317): stamp reviewer fields; existing
    * reviewer info follows the exists_action policy (error channel /
    * keep / overwrite) like [[Mutations.setWithPolicy]].
    */
  def review(df: DataFrame, reviewer: Column, score: Column, date: Column,
             policy: Mutations.ExistsAction): (DataFrame, DataFrame) = {
    val hasReviewers = col("reviewer_id").isNotNull
    def stamp(d: DataFrame): DataFrame = d
      .withColumn("reviewer_id", reviewer)
      .withColumn("reviewer_agreement", coalesce(score, lit(1.0)))
      .withColumn("review_date", date)
    policy match {
      case Mutations.Overwrite => (stamp(df), df.limit(0))
      case Mutations.Keep =>
        (stamp(df.filter(!hasReviewers)).unionByName(df.filter(hasReviewers)),
          df.limit(0))
      case Mutations.ErrorIfExists =>
        (stamp(df.filter(!hasReviewers)), df.filter(hasReviewers))
    }
  }

  /** Inversion core (process.py:409-465): where `pred` holds AND the row
    * is invertible — predicate has an inversion AND the row is not
    * itself a derived inversion (the double-inversion guard,
    * process.py:434 + the invert_by_predicate skip at process.py:665-668)
    * — swap subject/object (id + label), rewrite the predicate through
    * [[InversionMap]], and under `derivePolicy` stamp
    * justification = MappingInversion and `derived_from` = the triple
    * hash of the ORIGINAL mapping (process.py:448-450). Non-eligible
    * rows pass through unchanged (derived_from null).
    *
    * Composable: when `df` already carries a `derived_from` column (a
    * previous invert pass), eligible rows REPLACE it with this pass's
    * lineage and non-eligible rows keep the prior value — composing two
    * inverts (a normal reference pipeline) yields one well-defined
    * lineage column, never a duplicate.
    */
  def invertByPredicate(df: DataFrame, pred: Column,
                        derivePolicy: Boolean): DataFrame = {
    // coalesce: `=!=` is three-valued, so a NULL justification would
    // null `eligible` and silently skip the inversion — but a row with
    // no justification is NOT a prior inversion and must invert (the
    // reference inverts records whose justification is None). Same
    // hardening as curate()'s already-curated guard.
    val eligible = coalesce(col("justification") =!= MappingInversion, lit(true)) &&
      element_at(litMap(InversionMap), col("predicate_id")).isNotNull && pred
    val origTriple = Canonical.tripleHashCurie(
      col("subject_id"), col("predicate_id"), col("object_id"),
      col("predicate_modifier") === "Not")
    val priorDerived =
      if (df.columns.contains("derived_from")) col("derived_from")
      else lit(null).cast("string")
    val derivedCol = when(eligible && derivePolicy, origTriple)
      .otherwise(priorDerived).as("derived_from")
    val swapped = df.columns.filterNot(_ == "derived_from").map {
      case "subject_id" =>
        when(eligible, col("object_id")).otherwise(col("subject_id")).as("subject_id")
      case "object_id" =>
        when(eligible, col("subject_id")).otherwise(col("object_id")).as("object_id")
      case "subject_label" =>
        when(eligible, col("object_label")).otherwise(col("subject_label")).as("subject_label")
      case "object_label" =>
        when(eligible, col("subject_label")).otherwise(col("object_label")).as("object_label")
      case "predicate_id" =>
        when(eligible, element_at(litMap(InversionMap), col("predicate_id")))
          .otherwise(col("predicate_id")).as("predicate_id")
      case "justification" =>
        when(eligible && derivePolicy, lit(MappingInversion))
          .otherwise(col("justification")).as("justification")
      case other => col(other)
    } :+ derivedCol
    df.select(swapped: _*)
  }

  /** invert_on_unordered (process.py:678-693): invert rows whose subject
    * prefix sorts after the object prefix (casefolded).
    */
  def invertOnUnordered(df: DataFrame, derivePolicy: Boolean = false): DataFrame =
    invertByPredicate(df,
      lower(substring_index(col("subject_id"), ":", 1)) >
        lower(substring_index(col("object_id"), ":", 1)),
      derivePolicy)

  /** invert_narrow_matches (process.py:695-716): narrow → broad. */
  def invertNarrowMatches(df: DataFrame, derivePolicy: Boolean = false): DataFrame =
    invertByPredicate(df, col("predicate_id") === "skos:narrowMatch", derivePolicy)

  /** invert_broad_matches (process.py:719-739): broad → narrow. */
  def invertBroadMatches(df: DataFrame, derivePolicy: Boolean = false): DataFrame =
    invertByPredicate(df, col("predicate_id") === "skos:broadMatch", derivePolicy)

  /** invert_by_subject_prefix (process.py:757-816): invert mappings whose
    * subject CURIE prefix matches.
    */
  def invertBySubjectPrefix(df: DataFrame, prefix: String,
                            derivePolicy: Boolean = false): DataFrame =
    invertByPredicate(df,
      substring_index(col("subject_id"), ":", 1) === prefix, derivePolicy)

  /** invert_by_object_prefix (process.py:819-878). */
  def invertByObjectPrefix(df: DataFrame, prefix: String,
                           derivePolicy: Boolean = false): DataFrame =
    invertByPredicate(df,
      substring_index(col("object_id"), ":", 1) === prefix, derivePolicy)

  /** invert_by_prefix_pair (process.py:881-947): invert mappings whose
    * (subject, object) prefixes equal the given pair.
    */
  def invertByPrefixPair(df: DataFrame, subjectPrefix: String, objectPrefix: String,
                         derivePolicy: Boolean = false): DataFrame =
    invertByPredicate(df,
      substring_index(col("subject_id"), ":", 1) === subjectPrefix &&
        substring_index(col("object_id"), ":", 1) === objectPrefix,
      derivePolicy)

  // ===== named curation-state filters =====

  /** exclude_negative (process.py:603-619): no predicate modifier. */
  def excludeNegative(df: DataFrame): DataFrame =
    df.filter(col("predicate_modifier").isNull)

  /** exclude_unsure (process.py:621-636): reviewer_agreement != 0.0,
    * with the reference's None-passes semantics.
    */
  def excludeUnsure(df: DataFrame): DataFrame =
    df.filter(col("reviewer_agreement").isNull || col("reviewer_agreement") =!= 0.0)

  /** filter_by_confidence (process.py:1030-1037): drop rows whose
    * confidence is present AND below the cutoff (nulls pass).
    */
  def filterByConfidence(df: DataFrame, cutoff: Double): DataFrame =
    df.filter(col("confidence").isNull || col("confidence") >= cutoff)

  /** merge_manual_curations' merge step (process.py:963-1027): group the
    * MANUALLY-CURATED rows by their s-p-o triple (+ modifier) and
    * combine — sorted author-set union, noisy-or confidence
    * (`1 - ∏(1-cᵢ)` as a sum-of-logs aggregate; null confidences carry
    * no evidence), `derived_from` = the group's triple hash, member
    * count. The reference's `_not_all_same_triple` guard is enforced
    * STRUCTURALLY here: the grouping key IS the triple, so rows with
    * different triples cannot meet in one merge (the reference asserts
    * this at runtime on a caller-supplied list).
    *
    * Callers keep non-manual rows on the original channel
    * (process.py:981-985 passes them through unmerged).
    *
    * INTENTIONAL DIVERGENCE: this form aggregates single-member groups
    * too (they come out in the aggregate schema with a restamped
    * derived_from), whereas the reference yields lone rows unchanged
    * with all original fields (process.py:987-989). The aggregate is
    * idempotent on singles (author set = {author}, noisy-or = c, same
    * triple), so only the field layout differs. Use
    * [[mergeCurationsKeepSingles]] for the reference-faithful two-channel
    * shape.
    */
  def mergeCurations(df: DataFrame): DataFrame = {
    val negated = col("predicate_modifier") === "Not"
    df.filter(col("justification") === ManualCuration)
      .groupBy(col("subject_id"), col("predicate_id"), col("object_id"),
        col("predicate_modifier"))
      .agg(
        array_join(array_sort(collect_set(col("author_id"))), "|").as("authors"),
        round(when(max(col("confidence")) >= 1.0, lit(1.0))
          .otherwise(lit(1.0) - exp(sum(log(lit(1.0) - col("confidence"))))), 6)
          .as("confidence"),
        count(lit(1)).as("n_members"))
      .withColumn("derived_from",
        Canonical.tripleHashCurie(col("subject_id"), col("predicate_id"),
          col("object_id"), negated))
  }

  /** Reference-faithful merge (process.py:987-989): only genuine
    * multi-member triples are rewritten into the aggregate schema; lone
    * manually-curated rows return on the second channel UNCHANGED with
    * all their original fields. The group sizes are counted once and the
    * member-count frame is slim (triple key + count), so the semi/anti
    * split joins reuse the aggregation's shuffle key.
    */
  def mergeCurationsKeepSingles(df: DataFrame): (DataFrame, DataFrame) = {
    // null-safe triple key: predicate_modifier is null on non-negated rows
    // and a plain equi-join would never match null=null, misrouting every
    // non-negated group to the singles channel
    val modKey = coalesce(col("predicate_modifier"), lit("\u0000")).as("__mod")
    val key = Seq("subject_id", "predicate_id", "object_id", "__mod")
    val manual = df.filter(col("justification") === ManualCuration)
      .withColumn("__mod", modKey)
    val multiKeys = manual.groupBy(key.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
      .select(key.map(col): _*)
    // using-column joins reorder columns (keys first); restore the layout
    val merged = mergeCurations(
      manual.join(multiKeys, key, "left_semi").select(df.columns.map(col): _*))
    val singles = manual.join(multiKeys, key, "left_anti").select(df.columns.map(col): _*)
    (merged, singles)
  }

  /** remove_trivial_negative (process.py:1041-1056): a negative mapping
    * is trivial when a non-negative mapping with the same
    * (subject, object) exists — drop those, keep everything else.
    *
    * Scale shape: the reference builds an in-memory positive-pair set;
    * here the negatives left-anti join against the distinct positive
    * keys (broadcastable when the positive key set is small, sort-merge
    * otherwise) and the positives pass through untouched.
    */
  def removeTrivialNegative(df: DataFrame): DataFrame = {
    val pos = df.filter(col("predicate_modifier").isNull)
    val neg = df.filter(col("predicate_modifier").isNotNull)
    val nonTrivial = neg.join(
      pos.select(col("subject_id"), col("object_id")).distinct(),
      Seq("subject_id", "object_id"), "left_anti")
    pos.unionByName(nonTrivial)
  }
}
