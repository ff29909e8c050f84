package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.mutate.Curate
import graft.query.MappingSort

/** Curate state machine + invert family + curation filters + sort DSL,
  * mirroring the reference's behavior tables (reference:
  * tests/cases.py:316-473 curate, tests/test_process.py:451-670 invert,
  * process.py:603-636 + 1030-1037 filters, tests/cases.py:555-564 sorts).
  */
class CurateInvertSpec extends SparkSpecBase {
  import spark.implicits._

  private def mappingsDf(rows: Seq[(Long, String, String, String, String, String, String,
      Option[Double], Option[Double], String, String, String, String, String, Option[Double])]): DataFrame =
    rows.toDF("mapping_id", "subject_id", "subject_label", "predicate_id",
      "predicate_modifier", "object_id", "object_label", "confidence",
      "reviewer_agreement", "justification", "author_id", "reviewer_id",
      "mapping_date", "review_date", "similarity_score")
      .withColumn("mapping_tool",
        when(col("justification") === "semapv:LexicalMatching", lit("toolX")))
      .withColumn("publication_date", lit(null).cast("string"))

  private val lex = "semapv:LexicalMatching"
  private val man = "semapv:ManualMappingCuration"
  private val inv = "semapv:MappingInversion"

  private def base(id: Long, pred: String, just: String = lex,
                   modifier: String = null,
                   conf: Option[Double] = Some(0.95),
                   ra: Option[Double] = None) =
    (id, "mesh:C000089", "ammeline", pred, modifier, "CHEBI:28646", "ammeline",
      conf, ra, just, null.asInstanceOf[String], null.asInstanceOf[String],
      null.asInstanceOf[String], null.asInstanceOf[String], Option(0.8).filter(_ => just == lex))

  private def curateOne(df: DataFrame, mark: String): (Seq[Row], Seq[Row]) = {
    val (pass, blocked) = Curate.curate(df, lit(mark), lit("orcid:charlie"),
      lit(null).cast("double"), lit("2026-08-16"))
    (pass.collect().toSeq, blocked.collect().toSeq)
  }

  test("curate correct: stamp justification/author/date, zero tool+similarity+confidence (cases.py:316-340)") {
    val df = mappingsDf(Seq(base(1, "skos:exactMatch")))
    val (pass, blocked) = curateOne(df, "correct")
    assert(blocked.isEmpty)
    val r = pass.head
    assert(r.getAs[String]("justification") === man)
    assert(r.getAs[String]("author_id") === "orcid:charlie")
    assert(r.getAs[String]("mapping_date") === "2026-08-16")
    assert(r.getAs[String]("predicate_id") === "skos:exactMatch")
    assert(r.getAs[String]("predicate_modifier") === null)
    assert(r.getAs[Any]("confidence") === null)       // param unconditional
    assert(r.getAs[String]("mapping_tool") === null)  // zeroed
    assert(r.getAs[Any]("similarity_score") === null) // zeroed
  }

  test("curate incorrect: additionally sets predicate_modifier Not (cases.py:342-367)") {
    val (pass, _) = curateOne(mappingsDf(Seq(base(1, "skos:exactMatch"))), "incorrect")
    assert(pass.head.getAs[String]("predicate_modifier") === "Not")
    assert(pass.head.getAs[String]("justification") === man)
  }

  test("curate scope marks rewrite the predicate (cases.py:369-400)") {
    for ((mark, expected) <- Curate.ScopeMap) {
      val (pass, _) = curateOne(mappingsDf(Seq(base(1, "skos:exactMatch"))), mark)
      assert(pass.head.getAs[String]("predicate_id") === expected, s"mark=$mark")
      assert(pass.head.getAs[String]("justification") === man)
    }
  }

  test("curate unsure routes to review(score=0): reviewer fields set, rest untouched (process.py:221-222)") {
    val (pass, _) = curateOne(mappingsDf(Seq(base(1, "skos:exactMatch"))), "unsure")
    val r = pass.head
    assert(r.getAs[Double]("reviewer_agreement") === 0.0)
    assert(r.getAs[String]("reviewer_id") === "orcid:charlie")
    assert(r.getAs[String]("review_date") === "2026-08-16")
    assert(r.getAs[String]("justification") === lex)      // unchanged
    assert(r.getAs[Double]("confidence") === 0.95)        // unchanged
    assert(r.getAs[String]("mapping_tool") === "toolX")   // unchanged
  }

  test("curate stamp clears a previous unsure review (process.py:238-242)") {
    val df = mappingsDf(Seq(base(1, "skos:exactMatch", ra = Some(0.0))))
      .withColumn("reviewer_id", lit("orcid:old"))
      .withColumn("review_date", lit("2026-01-01"))
    val (pass, _) = curateOne(df, "correct")
    val r = pass.head
    assert(r.getAs[Any]("reviewer_agreement") === null)
    assert(r.getAs[String]("reviewer_id") === null)
    assert(r.getAs[String]("review_date") === null)
  }

  test("curate blocks already-manually-curated rows to the error channel (process.py:217-219)") {
    val df = mappingsDf(Seq(base(1, "skos:exactMatch", just = man),
      base(2, "skos:exactMatch")))
    val (pass, blocked) = curateOne(df, "correct")
    assert(pass.map(_.getLong(0)) === Seq(2L))
    assert(blocked.map(_.getLong(0)) === Seq(1L))
    assert(blocked.head.getAs[String]("justification") === man) // unchanged
  }

  test("invert: swap + predicate inversion + derived_from triple hash of original (process.py:409-465)") {
    val df = mappingsDf(Seq(base(1, "skos:narrowMatch")))
    val out = Curate.invertNarrowMatches(df, derivePolicy = true).collect().head
    assert(out.getAs[String]("subject_id") === "CHEBI:28646")
    assert(out.getAs[String]("object_id") === "mesh:C000089")
    assert(out.getAs[String]("subject_label") === "ammeline")
    assert(out.getAs[String]("predicate_id") === "skos:broadMatch")
    assert(out.getAs[String]("justification") === inv)
    // derived_from = triple hash of the ORIGINAL (mesh, narrowMatch, CHEBI)
    val expected = spark.range(1).select(
      graft.canonical.Canonical.tripleHashCurie(
        lit("mesh:C000089"), lit("skos:narrowMatch"), lit("CHEBI:28646"),
        lit(false),
        Map("mesh" -> "http://id.nlm.nih.gov/mesh/",
          "CHEBI" -> "http://purl.obolibrary.org/obo/CHEBI_",
          "skos" -> "http://www.w3.org/2004/02/skos/core#"))).head().getString(0)
    // engine uses its own PrefixMap (mesh/CHEBI unmapped → CURIE passthrough);
    // recompute with the same map for the assertion
    val enginePm = spark.range(1).select(
      graft.canonical.Canonical.tripleHashCurie(
        lit("mesh:C000089"), lit("skos:narrowMatch"), lit("CHEBI:28646"),
        lit(false))).head().getString(0)
    assert(out.getAs[String]("derived_from") === enginePm)
    assert(expected.startsWith("mapping:")) // shape sanity for the mapped form
  }

  test("curate routes unknown marks to the error channel (process.py:257 ValueError)") {
    val df = mappingsDf(Seq(base(1, "skos:exactMatch"), base(2, "skos:exactMatch")))
    val (pass, blocked) = curateOne(df, "definitely-not-a-mark")
    assert(pass.isEmpty)
    assert(blocked.map(_.getLong(0)).sorted === Seq(1L, 2L))
    assert(blocked.forall(_.getAs[String]("justification") === lex)) // unchanged
  }

  test("curate: NULL mark and NULL justification don't vanish in three-valued logic") {
    // NULL mark: not one of the 7 literals → error channel (not dropped
    // from both channels, which is what a raw `!isin` NULL would do)
    val df = mappingsDf(Seq(base(1, "skos:exactMatch"), base(2, "skos:exactMatch")))
    val (pass, blocked) = Curate.curate(df,
      when(col("mapping_id") === 1, lit(null).cast("string")).otherwise(lit("correct")),
      lit("orcid:charlie"), lit(null).cast("double"), lit("2026-08-16"))
    assert(pass.collect().map(_.getLong(0)).toSeq === Seq(2L))
    assert(blocked.collect().map(_.getLong(0)).toSeq === Seq(1L))
    // NULL justification: not manual curation → row stays eligible
    val dfNullJust = mappingsDf(Seq(base(3, "skos:exactMatch")))
      .withColumn("justification", lit(null).cast("string"))
    val (pass2, blocked2) = Curate.curate(dfNullJust, lit("correct"),
      lit("orcid:charlie"), lit(null).cast("double"), lit("2026-08-16"))
    assert(pass2.count() === 1 && blocked2.count() === 0)
  }

  test("curate zeroes similarity_measure when the layout has one (process.py:231-233)") {
    val df = mappingsDf(Seq(base(1, "skos:exactMatch")))
      .withColumn("similarity_measure", lit("levenshtein"))
    val (pass, _) = Curate.curate(df, lit("correct"), lit("orcid:charlie"),
      lit(null).cast("double"), lit("2026-08-16"))
    assert(pass.collect().head.getAs[String]("similarity_measure") === null)
  }

  test("composed inverts keep ONE derived_from column; later pass preserves earlier lineage") {
    val df = mappingsDf(Seq(
      base(1, "skos:narrowMatch"),     // inverted by pass 1 (→ broad), untouched by pass 2
      base(2, "skos:exactMatch")))     // untouched by pass 1, inverted by pass 2 (unordered)
    val once = Curate.invertNarrowMatches(df, derivePolicy = true)
    val twice = Curate.invertOnUnordered(once, derivePolicy = true)
    assert(twice.columns.count(_ == "derived_from") === 1)
    val rows = twice.collect().sortBy(_.getLong(0))
    // id1: pass 1 swapped to (CHEBI→mesh, broad) = already ordered → pass 2
    // skips it; pass 1's lineage survives
    assert(rows(0).getAs[String]("derived_from") !== null)
    assert(rows(0).getAs[String]("justification") === inv)
    // id2: (mesh > CHEBI) unordered → pass 2 inverts and stamps its own lineage
    assert(rows(1).getAs[String]("subject_id") === "CHEBI:28646")
    assert(rows(1).getAs[String]("derived_from") !== null)
  }

  test("prefix-driven invert specializations (process.py:757-947, tests/test_process.py:567-670)") {
    val df = mappingsDf(Seq(
      base(1, "skos:exactMatch"),   // mesh → CHEBI
      (2L, "CHEBI:1", "a", "skos:exactMatch", null, "mesh:2", "b",
        Some(0.5), None, lex, null, null, null, null, Some(0.8))))
    def subjects(out: DataFrame): Seq[String] =
      out.orderBy("mapping_id").select("subject_id").as[String].collect().toSeq
    // subject prefix 'mesh' matches only id1
    assert(subjects(Curate.invertBySubjectPrefix(df, "mesh"))
      === Seq("CHEBI:28646", "CHEBI:1"))
    // object prefix 'mesh' matches only id2
    assert(subjects(Curate.invertByObjectPrefix(df, "mesh"))
      === Seq("mesh:C000089", "mesh:2"))
    // pair (mesh, CHEBI) matches only id1
    assert(subjects(Curate.invertByPrefixPair(df, "mesh", "CHEBI"))
      === Seq("CHEBI:28646", "CHEBI:1"))
    // pair (CHEBI, mesh) matches only id2
    assert(subjects(Curate.invertByPrefixPair(df, "CHEBI", "mesh"))
      === Seq("mesh:C000089", "mesh:2"))
    // broad → narrow twin
    val broad = mappingsDf(Seq(base(3, "skos:broadMatch")))
    assert(Curate.invertBroadMatches(broad).collect()
      .head.getAs[String]("predicate_id") === "skos:narrowMatch")
  }

  test("mergeCurationsKeepSingles: lone curations pass through unchanged (process.py:987-989)") {
    val df = Seq(
      // two-member group (same triple, null modifier — the null-safe-key case)
      (1L, "ex0:a", "skos:exactMatch", null.asInstanceOf[String], "wd:Q1", man, "orcid:a", Some(0.6)),
      (2L, "ex0:a", "skos:exactMatch", null.asInstanceOf[String], "wd:Q1", man, "orcid:b", Some(0.5)),
      // singleton group
      (3L, "ex0:b", "skos:exactMatch", null.asInstanceOf[String], "wd:Q2", man, "orcid:c", Some(0.9)))
      .toDF("mapping_id", "subject_id", "predicate_id", "predicate_modifier",
        "object_id", "justification", "author_id", "confidence")
    val (merged, singles) = Curate.mergeCurationsKeepSingles(df)
    val m = merged.collect()
    assert(m.length === 1 && m.head.getAs[Long]("n_members") === 2L)
    assert(m.head.getAs[String]("authors") === "orcid:a|orcid:b")
    val s = singles.collect()
    assert(s.length === 1 && s.head.getAs[Long]("mapping_id") === 3L)
    assert(s.head.getAs[Double]("confidence") === 0.9) // original fields intact
    assert(singles.columns.toSeq === df.columns.toSeq)  // original schema
  }

  test("invert: double-inversion guard and retain policy (process.py:434, 639-677)") {
    val df = mappingsDf(Seq(
      base(1, "skos:narrowMatch", just = inv), // derived → pass through
      base(2, "skos:narrowMatch"),
      base(3, "skos:exactMatch")))             // predicate filter misses
    val rows = Curate.invertNarrowMatches(df, derivePolicy = false)
      .collect().sortBy(_.getLong(0))
    assert(rows(0).getAs[String]("subject_id") === "mesh:C000089") // untouched
    assert(rows(0).getAs[String]("derived_from") === null)
    assert(rows(1).getAs[String]("subject_id") === "CHEBI:28646")  // swapped
    assert(rows(1).getAs[String]("justification") === lex)          // retain
    assert(rows(1).getAs[String]("derived_from") === null)          // retain
    assert(rows(2).getAs[String]("subject_id") === "mesh:C000089") // untouched
  }

  test("invert_on_unordered inverts only out-of-order prefix pairs (process.py:678-693)") {
    val df = mappingsDf(Seq(
      base(1, "skos:exactMatch"),                                  // mesh > CHEBI → invert
      (2L, "CHEBI:1", "a", "skos:exactMatch", null, "mesh:2", "b",
        Some(0.5), None, lex, null, null, null, null, Some(0.8)))) // CHEBI < mesh → keep
    val rows = Curate.invertOnUnordered(df).collect().sortBy(_.getLong(0))
    assert(rows(0).getAs[String]("subject_id") === "CHEBI:28646")
    assert(rows(1).getAs[String]("subject_id") === "CHEBI:1")
  }

  test("invert: NULL justification is not a prior inversion — the row still inverts") {
    // three-valued trap: justification =!= MappingInversion is NULL for
    // a NULL justification, which would silently skip the row
    val df = mappingsDf(Seq(base(1, "skos:narrowMatch", just = null)))
    val r = Curate.invertNarrowMatches(df, derivePolicy = false).head()
    assert(r.getAs[String]("subject_id") === "CHEBI:28646")
    assert(r.getAs[String]("predicate_id") === "skos:broadMatch")
  }

  test("named filters: exclude_negative / exclude_unsure / filter_by_confidence null semantics") {
    val df = mappingsDf(Seq(
      base(1, "skos:exactMatch"),                                 // passes all
      base(2, "skos:exactMatch", modifier = "Not"),               // negative
      base(3, "skos:exactMatch", ra = Some(0.0)),                 // unsure
      base(4, "skos:exactMatch", ra = Some(1.0)),                 // reviewed-agree
      base(5, "skos:exactMatch", conf = None),                    // null conf passes
      base(6, "skos:exactMatch", conf = Some(0.2))))              // low conf drops
    assert(Curate.excludeNegative(df).select("mapping_id").as[Long].collect().sorted
      === Seq(1L, 3L, 4L, 5L, 6L))
    assert(Curate.excludeUnsure(df).select("mapping_id").as[Long].collect().sorted
      === Seq(1L, 2L, 4L, 5L, 6L))
    assert(Curate.filterByConfidence(df, 0.5).select("mapping_id").as[Long].collect().sorted
      === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("sort DSL: all 16 literals resolve; key shapes ordered as specified (query.py:196-248)") {
    val df = mappingsDf(Seq(
      base(1, "skos:exactMatch", conf = Some(0.9)),
      base(2, "skos:exactMatch", conf = None),
      base(3, "skos:exactMatch", conf = Some(0.1))))
      .withColumn("mapping_date",
        when(col("mapping_id") === 1, lit("2026-01-05"))
          .when(col("mapping_id") === 2, lit("2026-01-01")))
      .withColumn("publication_date",
        when(col("mapping_id") === 1, lit("2025-06-01"))
          .when(col("mapping_id") === 3, lit("2025-12-31")))
      .withColumn("review_date",
        when(col("mapping_id") === 2, lit("2026-03-03")))
    MappingSort.Literals.foreach { s =>
      assert(MappingSort.sortMappings(df, s).collect().length === 3, s"literal $s")
    }
    intercept[IllegalArgumentException] { MappingSort.cols("sideways") }
    def order(s: String): Seq[Long] =
      MappingSort.sortMappings(df, s).select("mapping_id").as[Long].collect().toSeq
    assert(order("desc") === Seq(1L, 3L, 2L))          // null conf → 0.0
    assert(order("+confidence") === Seq(2L, 3L, 1L))
    // date family: presence of mapping_date, VALUE of publication_date
    // (the reference's faithful quirk, query.py:227-234)
    // present mapping_date first (ids 1,2); within, publication_date DESC
    // NULLS LAST → id1 ('2025-06-01') before id2 (null); id3 (absent) last
    assert(order("date") === Seq(1L, 2L, 3L))
    assert(order("+date") === Seq(3L, 2L, 1L))
    assert(order("date-published") === Seq(3L, 1L, 2L))
    assert(order("+date-published") === Seq(2L, 1L, 3L))
    assert(order("subject") === Seq(1L, 2L, 3L))
  }
}
