package graft.canonical

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.expr.Fnv64

/** Canonical full-record serialization + the two record identities.
  *
  * Re-expresses the reference's content-addressed identity scheme as a
  * pure codegen-friendly concat tree of built-in expressions:
  *
  *  1. The canonical S-expression netstring form of a record — every
  *     non-null field in declaration order, each rendered as
  *     `(<len>:<name><len>:<value>)` with floats rounded to 3 places,
  *     dates ISO-formatted, booleans `true`/`false`, list values wrapped
  *     in an extra paren group — then FNV-1a-64 hashed and rendered as
  *     uppercase hex of the little-endian bytes (reference:
  *     src/sssom_pydantic/models.py:299-393 `expanded_record_to_box` /
  *     `box_to_str` / `_fmt_primitive`, api.py:883-936 `hash_mapping`;
  *     golden vectors tests/test_hash.py:32-72, reproduced verbatim in
  *     CanonicalSpec).
  *
  *  2. The triple ("sameness") identity: lowercase-hex SHA-256 over the
  *     space-joined expanded subject/predicate/object URIs, with a `~`
  *     suffix when the mapping is negated (reference: api.py:947-976
  *     `hash_triple`, delegating to the published mapping-sameness-id
  *     scheme; golden vectors tests/test_hash.py:197-210, reproduced in
  *     CanonicalSpec).
  *
  * Scale design: both identities are row-local expression trees — no
  * UDF, no shuffle; the FNV fold is the custom codegen [[Fnv64]]
  * expression, SHA-256 is the built-in. CURIE→URI expansion is a literal
  * map lookup (the prefix map is tiny and ships inside the plan, the
  * Spark analogue of the reference's in-memory `curies.Converter`).
  */
object Canonical {

  /** Engine prefix map (public, reference-style `curies` converter
    * semantics): CURIE `p:rest` expands to `map(p) + rest`.
    */
  val PrefixMap: Map[String, String] = Map(
    "skos" -> "http://www.w3.org/2004/02/skos/core#",
    "semapv" -> "https://w3id.org/semapv/vocab/",
    "orcid" -> "https://orcid.org/",
    "wd" -> "https://www.wikidata.org/wiki/",
    "dbp" -> "https://dbpedia.org/resource/",
    "yago" -> "http://yago-knowledge.org/resource/",
    "mapping" -> "https://w3id.org/mapping/",
    "sssom.record" -> "https://w3id.org/sssom/record/"
  ) ++ (0 until 7).map(i => s"ex$i" -> s"https://ex$i.org/")

  /** Expand a CURIE column through a prefix map; unknown prefixes (and
    * values with no colon) pass through unchanged. Null-preserving.
    */
  def expandCurie(c: Column, pm: Map[String, String] = PrefixMap): Column = {
    val m = map(pm.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq: _*)
    val prefix = substring_index(c, ":", 1)
    val rest = c.substr(length(prefix) + lit(2), length(c))
    when(c.isNull, lit(null).cast("string"))
      .when(element_at(m, prefix).isNotNull && contains(c, lit(":")),
        concat(element_at(m, prefix), rest))
      .otherwise(c)
  }

  /** Compress a URI back to a CURIE (models.py:282-293 `compress`):
    * longest-base-first prefix match; URIs under no known base pass
    * through unchanged. Inverse of [[expandCurie]] for mapped prefixes.
    */
  def compressUri(c: Column, pm: Map[String, String] = PrefixMap): Column = {
    val whens = pm.toSeq.sortBy { case (_, base) => -base.length }.map {
      case (p, base) =>
        when(c.startsWith(base),
          concat(lit(p + ":"), c.substr(lit(base.length + 1), length(c))))
    }
    coalesce(whens :+ c: _*)
  }

  // ===== S-expression netstring form =====

  /** `<len>:<value>` (netstring). Lengths are character counts, equal to
    * the reference's `len(str)`; the engine's canonical fields are ASCII
    * so char length == UTF-8 byte length and the FNV over the rendered
    * string matches the reference's byte-level fold.
    */
  def ns(v: Column): Column = concat(length(v).cast("string"), lit(":"), v)

  /** How a field value renders inside its box (models.py:369-393). */
  sealed trait Fmt
  /** Plain string (also ISO date strings and verbatim URLs). */
  case object FmtStr extends Fmt
  /** CURIE expanded to a URI through [[PrefixMap]] (or a given map). */
  case object FmtUri extends Fmt
  /** Float: `str(round(v, 3))` — shortest round-trip decimal rendering,
    * identical across JVM / Python / DuckDB for 3-decimal grid values.
    */
  case object FmtFloat3 extends Fmt
  /** Boolean → `true` / `false`. */
  case object FmtBool extends Fmt
  /** List of strings: each element netstring'd inside one paren group. */
  case object FmtStrList extends Fmt
  /** List of CURIEs, expanded then rendered like [[FmtStrList]]. */
  case object FmtUriList extends Fmt

  final case class Field(name: String, value: Column, fmt: Fmt)

  /** ExpandedRecord declaration order (models.py:211-280), minus the
    * reference's SKIP_SLOTS (record_id, mapping_cardinality, extensions;
    * models.py:297). Canonicalization MUST emit boxes in this order.
    */
  val FieldOrder: Seq[String] = Seq(
    "subject_id", "subject_label", "subject_category",
    "predicate_id", "predicate_label", "predicate_modifier",
    "object_id", "object_label", "object_category",
    "mapping_justification",
    "author_id", "author_label", "reviewer_id", "reviewer_label",
    "creator_id", "creator_label", "license",
    "subject_type", "subject_source", "subject_source_version",
    "object_type", "object_source", "object_source_version",
    "predicate_type", "mapping_provider", "mapping_source",
    "cardinality_scope",
    "mapping_tool", "mapping_tool_id", "mapping_tool_version",
    "mapping_date", "publication_date", "review_date",
    "confidence", "reviewer_agreement",
    "curation_rule", "curation_rule_text",
    "subject_match_field", "object_match_field", "match_string",
    "subject_preprocessing", "object_preprocessing",
    "similarity_score", "similarity_measure",
    "see_also", "issue_tracker_item", "derived_from", "other", "comment")

  private def fmtValue(f: Field, pm: Map[String, String]): Column = f.fmt match {
    case FmtStr => f.value
    case FmtUri => expandCurie(f.value, pm)
    case FmtFloat3 => round(f.value, 3).cast("string")
    // two-arm when, NOT when/otherwise: otherwise("false") would render
    // a NULL boolean as "false" (never-null), so boxOf's isNotNull gate
    // could not omit the box — an absent boolean must drop its box like
    // every other absent slot (the reference omits None slots)
    case FmtBool => when(f.value, lit("true")).when(!f.value, lit("false"))
    case FmtStrList | FmtUriList =>
      throw new IllegalStateException("list fmts render via boxOf")
  }

  /** One `(len:name len:value)` box, or empty string when null — so the
    * whole record stays a single flat `concat`.
    */
  private def boxOf(f: Field, pm: Map[String, String]): Column = {
    val label = s"${f.name.length}:${f.name}"
    f.fmt match {
      case FmtStrList | FmtUriList =>
        val elems = if (f.fmt == FmtUriList) transform(f.value, e => ns(expandCurie(e, pm)))
                    else transform(f.value, e => ns(e))
        when(f.value.isNotNull && size(f.value) > 0,
          concat(lit(s"($label("), array_join(elems, ""), lit("))")))
          .otherwise(lit(""))
      case _ =>
        val v = fmtValue(f, pm)
        when(v.isNotNull, concat(lit(s"($label"), ns(v), lit(")")))
          .otherwise(lit(""))
    }
  }

  /** Canonical S-expression string for a record. Fields may be given in
    * any order; they are emitted in [[FieldOrder]]. Unknown field names
    * are rejected (they would silently break identity).
    *
    * `extensions` are extension slots (models.py:313-319): each is boxed
    * under its FULL property URI (the `Field.name` here IS the expanded
    * predicate, not a slot name), sorted by predicate, and the whole
    * group is wrapped in one `extensions` box emitted LAST — omitted
    * entirely when every extension value is null (the reference builds
    * the box only from present slots).
    */
  def sexpr(fields: Seq[Field], pm: Map[String, String] = PrefixMap,
            extensions: Seq[Field] = Nil): Column = {
    val unknown = fields.map(_.name).filterNot(FieldOrder.contains)
    require(unknown.isEmpty, s"unknown canonical fields: ${unknown.mkString(", ")}")
    val ordered = fields.sortBy(f => FieldOrder.indexOf(f.name))
    val extBox: Seq[Column] =
      if (extensions.isEmpty) Nil
      else {
        val inner = concat(extensions.sortBy(_.name).map(boxOf(_, pm)): _*)
        Seq(when(length(inner) > 0,
          concat(lit("(10:extensions("), inner, lit("))"))).otherwise(lit("")))
      }
    concat(lit("(7:mapping(") +: (ordered.map(boxOf(_, pm)) ++ extBox) :+ lit("))"): _*)
  }

  /** Record identity: uppercase-hex FNV-1a-64 of the canonical
    * S-expression (api.py:907-924 `hash_mapping`).
    */
  def recordHash(fields: Seq[Field], pm: Map[String, String] = PrefixMap,
                 extensions: Seq[Field] = Nil): Column =
    Fnv64.fnv64Hex(sexpr(fields, pm, extensions))

  // ===== triple ("sameness") identity =====

  /** Lowercase-hex SHA-256 over `subjURI + " " + predURI + " " + objURI`
    * with a trailing `~` when `negated` (api.py:947-976; the reference
    * negates via `predicate_modifier == "Not"`). Uses the thread-local
    * [[graft.expr.Sha256HexLower]] digest (value-identical to
    * `lower(sha2(x, 256))`, ~linear N→4N scaling vs 0.56 for the
    * per-row-getInstance built-in — BENCH/BASELINE.md).
    */
  def tripleHash(subj: Column, pred: Column, obj: Column, negated: Column,
                 pm: Map[String, String] = PrefixMap): Column = {
    // concat, NOT concat_ws: a null component must null the hash (the
    // reference raises on a None reference). concat_ws silently skips
    // nulls, which would assign (null,'a','b') and ('a','b',null) the
    // SAME identity "aURI bURI" — and diverge from the DuckDB oracle's
    // null-propagating `||`.
    val h = graft.expr.Sha256HexLower.sha256Hex(
      concat(expandCurie(subj, pm), lit(" "), expandCurie(pred, pm),
        lit(" "), expandCurie(obj, pm)))
    when(coalesce(negated, lit(false)), concat(h, lit("~"))).otherwise(h)
  }

  /** `mapping:<hash>` CURIE form (api.py:987-996
    * `hash_triple_to_reference`, TRIPLE_HASH_CURIE_PREFIX).
    */
  def tripleHashCurie(subj: Column, pred: Column, obj: Column, negated: Column,
                      pm: Map[String, String] = PrefixMap): Column =
    concat(lit("mapping:"), tripleHash(subj, pred, obj, negated, pm))
}
