package graft.constraints

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A compiled row-level constraint: pure Catalyst columns, no UDFs, so the
  * whole suite evaluates inside one whole-stage-codegen projection.
  *
  * Semantics mirror the reference's per-field pydantic validators
  * (reference: src/sssom_pydantic/models.py:62-146): each constraint is
  * independent; a row failing one constraint still gets checked by the
  * others; `applicable` gates checks that presuppose another constraint
  * (e.g. URI shape only applies to non-null urls — the not-null constraint
  * owns the null case, like pydantic's required-vs-format split).
  *
  * INVARIANT: `applicable` and `ok` must never evaluate to SQL NULL on any
  * input (wrap nullable comparisons in `coalesce`/`isNotNull` guards),
  * otherwise `applicable && !ok` silently drops the violation.
  */
final case class RowConstraint(
    name: String,
    stage: String, // "raw" (required/type) | "processing" (semantic), io.py:83
    applicable: Column,
    ok: Column,
    detail: Column
) {
  /** True iff this row violates the constraint; never NULL. */
  def violated: Column = applicable && !ok
}

/** Constraint ADT — the declarative layer (reference Query-model precedent:
  * one declarative model compiled per backend, database/sql_database.py:449-497;
  * here the single backend is Catalyst `Column`s).
  */
sealed trait Constraint { def name: String; def compile: RowConstraint }

/** Required field: non-null and (for strings) non-empty. models.py:62-70. */
final case class NotNullOrEmpty(name: String, column: String) extends Constraint {
  def compile: RowConstraint = RowConstraint(
    name, "raw",
    applicable = lit(true),
    ok = col(column).isNotNull && col(column) =!= "",
    detail = lit("null_or_empty"))
}

/** Non-null only (for non-string types). */
final case class NotNull(name: String, column: String) extends Constraint {
  def compile: RowConstraint = RowConstraint(
    name, "raw",
    applicable = lit(true),
    ok = col(column).isNotNull,
    detail = lit("null"))
}

/** Regex well-formedness on non-null values (CURIE/URI analogue,
  * io.py:146-155 strict reference parsing).
  */
final case class Shape(name: String, column: String, pattern: String) extends Constraint {
  def compile: RowConstraint = RowConstraint(
    name, "processing",
    applicable = col(column).isNotNull && length(col(column)) > 0,
    ok = coalesce(col(column).rlike(pattern), lit(false)),
    detail = col(column))
}

/** Enum membership (EntityTypeLiteral analogue, constants.py:46-59). */
final case class EnumMember(name: String, column: String, values: Seq[String]) extends Constraint {
  def compile: RowConstraint = RowConstraint(
    name, "processing",
    applicable = lit(true),
    ok = coalesce(col(column).isin(values: _*), lit(false)),
    detail = coalesce(col(column), lit("NULL")))
}

/** Numeric range on an arbitrary expression (confidence∈[0,1] analogue,
  * models.py:106-146). Bounds inclusive.
  */
final case class InRange(name: String, valueExpr: Column, lo: Long, hi: Long) extends Constraint {
  def compile: RowConstraint = RowConstraint(
    name, "processing",
    applicable = valueExpr.isNotNull,
    ok = coalesce(valueExpr.between(lo, hi), lit(false)),
    detail = valueExpr.cast("string"))
}

/** Cross-field implication: whenExpr ⇒ thenOk (mapping_tool_version
  * requires tool, io.py:157-168).
  */
final case class Implies(name: String, whenExpr: Column, thenOk: Column, detailMsg: String)
    extends Constraint {
  def compile: RowConstraint = RowConstraint(
    name, "processing",
    applicable = coalesce(whenExpr, lit(false)),
    ok = coalesce(thenOk, lit(false)),
    detail = lit(detailMsg))
}

/** Type-coercion check: a non-null string that casts to NULL in the
  * target type is a coercion failure — the "cast produced null from
  * non-null input" pattern (reference: pydantic coercion with per-line
  * errors, models.py:94-146 + io.py:894-907).
  */
final case class Coercible(name: String, column: String, targetType: String) extends Constraint {
  def compile: RowConstraint = RowConstraint(
    name, "raw",
    applicable = col(column).isNotNull && col(column) =!= "",
    ok = col(column).try_cast(targetType).isNotNull, // try_cast: ANSI-safe null-on-failure
    detail = col(column))
}

/** Escape hatch for fully custom checks. */
final case class Custom(name: String, stage: String, applicable: Column, ok: Column, detail: Column)
    extends Constraint {
  def compile: RowConstraint = RowConstraint(name, stage, applicable, ok, detail)
}

object Constraints {
  import graft.gen.Derive.{LangEnum, WindowStart, WindowLen}

  /** RFC-3986-ish shape for crawl urls: scheme http/https, lowercase
    * host of [a-z0-9.-], optional path with no spaces.
    */
  val UrlPattern = "^https?://[a-z0-9.-]+(/[^ ]*)?$"

  /** "This row's url passed the raw + shape checks" — the pass-channel
    * predicate every url-keyed pass (dedup, RI, digest, benches) filters
    * on. ONE definition: the SQL twin is SparkEntry.validUrlWhere; keep
    * them in lockstep.
    */
  def validUrl: org.apache.spark.sql.Column =
    col("url").isNotNull && length(col("url")) > 0 && col("url").rlike(UrlPattern)

  /** The webtext validation suite — the SURVEY §7.0 semantic bridge from
    * the reference's Record validators to the web-page table.
    */
  def webtextSuite: Seq[Constraint] = Seq(
    NotNullOrEmpty("url_required", "url"),
    Shape("url_shape", "url", UrlPattern),
    NotNull("warc_ts_required", "warc_ts"),
    InRange("warc_ts_window", unix_timestamp(col("warc_ts")),
      WindowStart, WindowStart + WindowLen - 1),
    EnumMember("lang_enum", "lang", LangEnum),
    NotNullOrEmpty("text_required", "text"),
    Implies("html_text_crossfield",
      whenExpr = length(col("html")) > 0,
      thenOk = col("text").isNotNull && length(col("text")) > 0,
      detailMsg = "html_nonempty_text_empty"),
    Custom("text_len_max", "processing",
      applicable = col("text").isNotNull,
      ok = length(col("text")) <= 4096,
      detail = length(col("text")).cast("string"))
  )

  /** Raw-string ingest coercion suite over Derive.webPagesRaw — the
    * reference's most-hit validator (per-line pydantic coercion errors,
    * io.py:894-907): a non-null, non-empty string that try_casts to NULL
    * is a per-row violation; NULL/empty belong to the required checks,
    * not here (the applicable gate).
    */
  def coercionSuite: Seq[Constraint] = Seq(
    Coercible("warc_ts_coercible", "warc_ts_raw", "timestamp"),
    Coercible("fetch_ms_coercible", "fetch_ms_raw", "bigint"),
    Coercible("conf_coercible", "conf_raw", "double"))

  def compile(suite: Seq[Constraint]): Seq[RowConstraint] = suite.map(_.compile)
}
