package graft

import org.apache.spark.sql.functions._

import graft.canonical.Canonical
import graft.canonical.Canonical.{Field, FmtFloat3, FmtStr, FmtUri}

/** Golden-vector tests for the canonical S-expression + record FNV-64 and
  * the triple hash — the vectors are the reference's own, reproduced
  * verbatim (reference: tests/test_hash.py:32-72 CASES and
  * tests/test_hash.py:197-210 TestTripleHash).
  */
class CanonicalSpec extends SparkSpecBase {

  /** The reference test converter's prefix map (tests/test_hash.py:18-31). */
  private val pm = Map(
    "FOODON" -> "http://purl.obolibrary.org/obo/FOODON_",
    "KF_FOOD" -> "https://kewl-foodie.ince/food/",
    "semapv" -> "https://w3id.org/semapv/vocab/",
    "skos" -> "http://www.w3.org/2004/02/skos/core#",
    "wikidata" -> "https://www.wikidata.org/wiki/",
    "FBbt" -> "http://purl.obolibrary.org/obo/FBbt_",
    "HP" -> "http://purl.obolibrary.org/obo/HP_",
    "MP" -> "http://purl.obolibrary.org/obo/MP_",
    "UBERON" -> "http://purl.obolibrary.org/obo/UBERON_",
    "example" -> "https://example.org/sets/record-id#")

  /** TEST_CONVERTER subset used by the triple-hash vectors
    * (tests/cases.py; URIs are the public registry forms the reference
    * doctests print, api.py:895-901, 959-965).
    */
  private val pmTriple = Map(
    "mesh" -> "http://id.nlm.nih.gov/mesh/",
    "CHEBI" -> "http://purl.obolibrary.org/obo/CHEBI_",
    "cas" -> "https://commonchemistry.cas.org/detail?cas_rn=",
    "skos" -> "http://www.w3.org/2004/02/skos/core#")

  private def one(fields: Seq[Field]): (String, String) = {
    val row = spark.range(1).select(
      Canonical.sexpr(fields, pm).as("sexpr"),
      Canonical.recordHash(fields, pm).as("fnv")).head()
    (row.getString(0), row.getString(1))
  }

  test("golden case 1: full record with sources, date, confidence (test_hash.py:33-47)") {
    val fields = Seq(
      Field("subject_id", lit("KF_FOOD:F001"), FmtUri),
      Field("predicate_id", lit("skos:exactMatch"), FmtUri),
      Field("object_id", lit("FOODON:00002473"), FmtUri),
      Field("mapping_justification", lit("semapv:ManualMappingCuration"), FmtUri),
      Field("subject_source", lit("KF_FOOD:DB"), FmtUri),
      Field("object_source", lit("wikidata:Q55118395"), FmtUri),
      Field("object_source_version",
        lit("http://purl.obolibrary.org/obo/foodon/releases/2022-02-01/foodon.owl"), FmtStr),
      Field("mapping_date", lit("2022-05-02"), FmtStr),
      Field("confidence", lit(0.95), FmtFloat3))
    val (sexpr, fnv) = one(fields)
    assert(sexpr ===
      "(7:mapping((10:subject_id34:https://kewl-foodie.ince/food/F001)" +
      "(12:predicate_id46:http://www.w3.org/2004/02/skos/core#exactMatch)" +
      "(9:object_id46:http://purl.obolibrary.org/obo/FOODON_00002473)" +
      "(21:mapping_justification51:https://w3id.org/semapv/vocab/ManualMappingCuration)" +
      "(14:subject_source32:https://kewl-foodie.ince/food/DB)" +
      "(13:object_source39:https://www.wikidata.org/wiki/Q55118395)" +
      "(21:object_source_version68:http://purl.obolibrary.org/obo/foodon/releases/2022-02-01/foodon.owl)" +
      "(12:mapping_date10:2022-05-02)" +
      "(10:confidence4:0.95)))")
    assert(fnv === "97170EB542E9AE8F")
  }

  test("golden case 2: minimal record; record_id excluded (test_hash.py:49-58)") {
    val fields = Seq(
      Field("subject_id", lit("FBbt:0009124"), FmtUri),
      Field("predicate_id", lit("skos:exactMatch"), FmtUri),
      Field("object_id", lit("UBERON:0000003"), FmtUri),
      Field("mapping_justification", lit("semapv:LexicalMatching"), FmtUri))
    val (sexpr, fnv) = one(fields)
    assert(sexpr ===
      "(7:mapping((10:subject_id43:http://purl.obolibrary.org/obo/FBbt_0009124)" +
      "(12:predicate_id46:http://www.w3.org/2004/02/skos/core#exactMatch)" +
      "(9:object_id45:http://purl.obolibrary.org/obo/UBERON_0000003)" +
      "(21:mapping_justification45:https://w3id.org/semapv/vocab/LexicalMatching)))")
    assert(fnv === "18F3436E89AA1AA2")
  }

  test("golden case 3: provider URL verbatim + float similarity (test_hash.py:60-70)") {
    val fields = Seq(
      Field("subject_id", lit("HP:0009124"), FmtUri),
      Field("predicate_id", lit("skos:exactMatch"), FmtUri),
      Field("object_id", lit("MP:0000003"), FmtUri),
      Field("mapping_justification",
        lit("semapv:LexicalSimilarityThresholdMatching"), FmtUri),
      Field("mapping_provider", lit("https://w3id.org/sssom/core_team"), FmtStr),
      Field("similarity_score", lit(0.8), FmtFloat3))
    val (sexpr, fnv) = one(fields)
    assert(sexpr ===
      "(7:mapping((10:subject_id41:http://purl.obolibrary.org/obo/HP_0009124)" +
      "(12:predicate_id46:http://www.w3.org/2004/02/skos/core#exactMatch)" +
      "(9:object_id41:http://purl.obolibrary.org/obo/MP_0000003)" +
      "(21:mapping_justification64:https://w3id.org/semapv/vocab/LexicalSimilarityThresholdMatching)" +
      "(16:mapping_provider32:https://w3id.org/sssom/core_team)" +
      "(16:similarity_score3:0.8)))")
    assert(fnv === "0D45A2E8C64EBD65")
  }

  test("fields emit in declaration order regardless of spec order") {
    val shuffled = Seq(
      Field("confidence", lit(0.5), FmtFloat3),
      Field("subject_id", lit("HP:0009124"), FmtUri),
      Field("object_id", lit("MP:0000003"), FmtUri))
    val row = spark.range(1).select(Canonical.sexpr(shuffled, pm)).head()
    assert(row.getString(0) ===
      "(7:mapping((10:subject_id41:http://purl.obolibrary.org/obo/HP_0009124)" +
      "(9:object_id41:http://purl.obolibrary.org/obo/MP_0000003)" +
      "(10:confidence3:0.5)))")
  }

  test("null fields are skipped; floats round to 3 places; unknown fields rejected") {
    val fields = Seq(
      Field("subject_id", lit("HP:0009124"), FmtUri),
      Field("object_id", lit("MP:0000003"), FmtUri),
      Field("subject_label", lit(null).cast("string"), FmtStr),
      Field("similarity_score", lit(99.1234), FmtFloat3))
    val row = spark.range(1).select(Canonical.sexpr(fields, pm)).head()
    assert(row.getString(0) ===
      "(7:mapping((10:subject_id41:http://purl.obolibrary.org/obo/HP_0009124)" +
      "(9:object_id41:http://purl.obolibrary.org/obo/MP_0000003)" +
      "(16:similarity_score6:99.123)))")
    intercept[IllegalArgumentException] {
      Canonical.sexpr(Seq(Field("nonsense_slot", lit("x"), FmtStr)), pm)
    }
  }

  test("extension slots: boxed under full property URI, sorted, typed (test_hash.py:119-145)") {
    val pmExt = Map(
      "COMENT" -> "https://example.com/entities/",
      "EXPROP" -> "https://example.org/properties/",
      "ORGENT" -> "https://example.org/entities/",
      "semapv" -> "https://w3id.org/semapv/vocab/",
      "skos" -> "http://www.w3.org/2004/02/skos/core#")
    val fields = Seq(
      Field("subject_id", lit("ORGENT:0001"), FmtUri),
      Field("subject_label", lit("alice"), FmtStr),
      Field("predicate_id", lit("skos:closeMatch"), FmtUri),
      Field("object_id", lit("COMENT:0011"), FmtUri),
      Field("object_label", lit("alpha"), FmtStr),
      Field("mapping_justification", lit("semapv:ManualMappingCuration"), FmtUri))
    val exts = Seq(
      Field("https://example.org/properties/barProperty", lit("111"), FmtStr),
      Field("https://example.org/properties/bazProperty", lit("ORGENT:BAZ_0001"), FmtUri))
    val row = spark.range(1).select(
      Canonical.sexpr(fields, pmExt, exts).as("sexpr"),
      Canonical.recordHash(fields, pmExt, exts).as("fnv")).head()
    assert(row.getString(0) ===
      "(7:mapping((10:subject_id33:https://example.org/entities/0001)" +
      "(13:subject_label5:alice)" +
      "(12:predicate_id46:http://www.w3.org/2004/02/skos/core#closeMatch)" +
      "(9:object_id33:https://example.com/entities/0011)" +
      "(12:object_label5:alpha)" +
      "(21:mapping_justification51:https://w3id.org/semapv/vocab/ManualMappingCuration)" +
      "(10:extensions((42:https://example.org/properties/barProperty3:111)" +
      "(42:https://example.org/properties/bazProperty37:https://example.org/entities/BAZ_0001)))))")
    assert(row.getString(1) === "66BD0A57A976A109")
  }

  test("extension slots: typed values — float/bool/date/dateTime/anyURI (test_hash.py:152-189)") {
    val pmExt = Map(
      "COMENT" -> "https://example.com/entities/",
      "ORGENT" -> "https://example.org/entities/",
      "semapv" -> "https://w3id.org/semapv/vocab/",
      "skos" -> "http://www.w3.org/2004/02/skos/core#")
    val fields = Seq(
      Field("subject_id", lit("ORGENT:0002"), FmtUri),
      Field("predicate_id", lit("skos:exactMatch"), FmtUri),
      Field("object_id", lit("COMENT:0022"), FmtUri),
      Field("mapping_justification", lit("semapv:ManualMappingCuration"), FmtUri))
    val exts = Seq(
      Field("http://sssom.invalid/ext_verification_date", lit("2026-07-31"), FmtStr),
      Field("http://www.w3.org/2000/01/rdf-schema#seeAlso", lit("https://example.org/"), FmtStr),
      Field("https://example.org/properties/accuracy", lit(99.1234), Canonical.FmtFloat3),
      Field("https://example.org/properties/timestamp",
        lit("2026-07-31T11:11:11+01:00"), FmtStr),
      Field("https://example.org/properties/verified", lit(true), Canonical.FmtBool))
    val row = spark.range(1).select(
      Canonical.sexpr(fields, pmExt, exts).as("sexpr"),
      Canonical.recordHash(fields, pmExt, exts).as("fnv")).head()
    assert(row.getString(0) ===
      "(7:mapping((10:subject_id33:https://example.org/entities/0002)" +
      "(12:predicate_id46:http://www.w3.org/2004/02/skos/core#exactMatch)" +
      "(9:object_id33:https://example.com/entities/0022)" +
      "(21:mapping_justification51:https://w3id.org/semapv/vocab/ManualMappingCuration)" +
      "(10:extensions((42:http://sssom.invalid/ext_verification_date10:2026-07-31)" +
      "(44:http://www.w3.org/2000/01/rdf-schema#seeAlso20:https://example.org/)" +
      "(39:https://example.org/properties/accuracy6:99.123)" +
      "(40:https://example.org/properties/timestamp25:2026-07-31T11:11:11+01:00)" +
      "(39:https://example.org/properties/verified4:true)))))")
    assert(row.getString(1) === "1058491DA22C623E")
  }

  test("extensions box omitted when all extension values are null") {
    val fields = Seq(Field("subject_id", lit("HP:0009124"), FmtUri))
    val exts = Seq(
      Field("https://example.org/properties/x", lit(null).cast("string"), FmtStr))
    val row = spark.range(1).select(Canonical.sexpr(fields, pm, exts)).head()
    assert(row.getString(0) ===
      "(7:mapping((10:subject_id41:http://purl.obolibrary.org/obo/HP_0009124)))")
  }

  test("compress is expand's inverse; unknown URIs pass through (models.py:282-293)") {
    val row = spark.range(1).select(
      Canonical.compressUri(lit("http://purl.obolibrary.org/obo/HP_0009124"), pm).as("a"),
      Canonical.compressUri(Canonical.expandCurie(lit("KF_FOOD:F001"), pm), pm).as("b"),
      Canonical.compressUri(lit("https://unmapped.example/x"), pm).as("c"),
      Canonical.compressUri(lit(null).cast("string"), pm).as("d")).head()
    assert(row.getString(0) === "HP:0009124")
    assert(row.getString(1) === "KF_FOOD:F001")
    assert(row.getString(2) === "https://unmapped.example/x")
    assert(row.isNullAt(3))
  }

  test("triple hash golden vectors incl. ~ negation (test_hash.py:197-210)") {
    val rows = spark.range(1).select(
      Canonical.tripleHash(lit("mesh:C000089"), lit("skos:exactMatch"),
        lit("CHEBI:28646"), lit(false), pmTriple).as("h1"),
      Canonical.tripleHash(lit("mesh:C000089"), lit("skos:exactMatch"),
        lit("CHEBI:28646"), lit(true), pmTriple).as("h2"),
      Canonical.tripleHash(lit("CHEBI:28646"), lit("skos:exactMatch"),
        lit("cas:645-92-1"), lit(false), pmTriple).as("h3"),
      Canonical.tripleHashCurie(lit("mesh:C000089"), lit("skos:exactMatch"),
        lit("CHEBI:28646"), lit(null).cast("boolean"), pmTriple).as("h4")).head()
    assert(rows.getString(0) ===
      "36a1f9244ea7641a90987c82f33c25c0c13712ee8f48207b2a0825f8a4e4e26a")
    assert(rows.getString(1) ===
      "36a1f9244ea7641a90987c82f33c25c0c13712ee8f48207b2a0825f8a4e4e26a~")
    assert(rows.getString(2) ===
      "bb768f0b1e1643298f4df1a381001f6ed68fcc8fff49b371f0235b51dbab9e1e")
    assert(rows.getString(3) ===
      "mapping:36a1f9244ea7641a90987c82f33c25c0c13712ee8f48207b2a0825f8a4e4e26a")
  }

  test("triple hash null-propagates: a malformed triple has NO identity") {
    // concat_ws would skip the null and give (null, p, o) and (p, o, null)
    // the SAME digest; the reference raises on a None reference, so the
    // engine's analogue is a NULL hash (error-channel material)
    val r = spark.range(1).select(
      Canonical.tripleHash(lit(null).cast("string"), lit("skos:exactMatch"),
        lit("CHEBI:28646"), lit(false), pmTriple).as("h1"),
      Canonical.tripleHash(lit("mesh:C000089"), lit("skos:exactMatch"),
        lit(null).cast("string"), lit(true), pmTriple).as("h2")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("absent boolean slot omits its box instead of rendering false") {
    import Canonical.Field
    val fields = Seq(
      Field("subject_id", lit("a:1"), Canonical.FmtUri),
      Field("predicate_id", lit("a:2"), Canonical.FmtUri),
      Field("object_id", lit("a:3"), Canonical.FmtUri),
      Field("mapping_justification", lit("a:4"), Canonical.FmtUri))
    def sx(v: org.apache.spark.sql.Column): String =
      spark.range(1).select(Canonical.sexpr(fields, Map("a" -> "urn:a:"),
        Seq(Field("urn:a:flag", v, Canonical.FmtBool))).as("s")).head().getString(0)
    val absent = sx(lit(null).cast("boolean"))
    assert(!absent.contains("flag"), s"null boolean must drop its box: $absent")
    assert(!absent.contains("extensions"), "all-null extensions must drop the group box")
    assert(sx(lit(false)).contains("10:urn:a:flag5:false"))
    assert(sx(lit(true)).contains("10:urn:a:flag4:true"))
  }
}
