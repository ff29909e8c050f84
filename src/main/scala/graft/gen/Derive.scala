package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic derivation of a Common-Crawl-style `web_pages` table
  * (url, warc_ts, html, text, lang, part) from the driver-provided
  * `documents` parquet, with known violation-bearing subsets injected by
  * pure arithmetic on `doc_id` — the engine-side twin of the reference's
  * annotated example corpus (reference: src/sssom_pydantic/examples.py:127-675,
  * one example engineered per constraint).
  *
  * Everything here is expressible in ANSI-ish SQL so the driver's DuckDB
  * oracle (see [[Derive.duckCte]]) computes the identical table; keep the
  * two in lockstep.
  *
  * Injection map (mod-arithmetic on doc_id, mutually deterministic):
  *   - doc_id %  97 == 3  → url NULL            (required-field violation)
  *   - doc_id %  97 == 5  → url malformed       (URI well-formedness)
  *   - doc_id %  13 == 12 → url of doc_id-7     (uniqueness violation; same domain)
  *   - doc_id % 103 == 9  → warc_ts NULL        (required / type coercion)
  *   - doc_id % 101 == 7  → warc_ts before crawl window (range violation)
  *   - doc_id %  89 == 7  → lang 'zz'           (enum violation)
  *   - doc_id %  91 == 8  → lang ''             (enum violation)
  *   - doc_id %  83 == 11 → text ''             (required + cross-field)
  *   - doc_id % 107 == 21 → html empty          (cross-field counterpart)
  */
object Derive {

  /** Crawl window [2026-01-01T00:00Z, 2026-03-31T24:00Z) in epoch seconds. */
  val WindowStart: Long = 1767225600L
  val WindowLen: Long = 7776000L
  /** Allowed language codes (enum membership, reference constants.py:46-59). */
  val LangEnum: Seq[String] = Seq("en", "de", "fr", "es", "zh")
  /** Number of table partitions (the per-partition verdict unit). */
  val NumParts: Int = 8

  /** Spark-side derivation. `html` is real `binary` per the input hint. */
  def webPages(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val d = col("doc_id")
    val baseUrl = concat(
      lit("https://ex"), d % 7, lit(".org/doc/"),
      when(d % 13 === 12, d - 7).otherwise(d))
    val url = when(d % 97 === 3, lit(null).cast("string"))
      .when(d % 97 === 5, concat(lit("not a url "), d))
      .otherwise(baseUrl)
    val tsEpoch = when(d % 103 === 9, lit(null).cast("long"))
      .when(d % 101 === 7, lit(1750000000L))
      .otherwise(lit(WindowStart) + (d * 7919) % WindowLen)
    val langC = when(d % 89 === 7, lit("zz"))
      .when(d % 91 === 8, lit(""))
      .otherwise(col("lang"))
    val textC = when(d % 83 === 11, lit("")).otherwise(col("text"))
    val htmlStr = when(d % 107 === 21, lit(""))
      .otherwise(concat(lit("<html><body>"), col("text"), lit("</body></html>")))
    docs.select(
      d.as("doc_id"),
      url.as("url"),
      to_timestamp(tsEpoch).as("warc_ts"),
      encode(htmlStr, "UTF-8").as("html"),
      textC.as("text"),
      langC.as("lang"),
      (d % 8).cast("int").as("part")
    )
  }

  /** Referential-integrity target (FIXTURES.md §B.2): the fetch-lineage
    * table every valid page url must join to. Deterministically omits
    * doc_id % 6 == 5 so a known subset of pages dangles (the
    * `derived_from` dangling-edge analogue, neo4j_database.py:118-121).
    */
  def lineage(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val d = col("doc_id")
    docs.filter(d % 6 =!= 5).select(
      concat(lit("https://ex"), d % 7, lit(".org/doc/"), d).as("url"),
      to_timestamp(lit(WindowStart) + (d * 7919) % WindowLen).as("warc_ts"),
      concat(lit("fetch-"), d).as("fetch_id"))
  }

  /** DuckDB CTE computing the identical table (html kept as VARCHAR —
    * it never appears in query outputs, only `length(html)` does, and
    * the wrapped text is pure ASCII so char length == byte length).
    * `ts_epoch` carried alongside so range checks avoid timestamp codecs.
    */
  val duckCte: String =
    """WITH web_pages AS (
      |  SELECT
      |    doc_id,
      |    CASE WHEN doc_id % 97 = 3 THEN NULL
      |         WHEN doc_id % 97 = 5 THEN 'not a url ' || doc_id
      |         WHEN doc_id % 13 = 12 THEN 'https://ex' || (doc_id % 7) || '.org/doc/' || (doc_id - 7)
      |         ELSE 'https://ex' || (doc_id % 7) || '.org/doc/' || doc_id END AS url,
      |    CASE WHEN doc_id % 103 = 9 THEN NULL
      |         WHEN doc_id % 101 = 7 THEN 1750000000
      |         ELSE 1767225600 + (doc_id * 7919) % 7776000 END AS ts_epoch,
      |    CASE WHEN doc_id % 107 = 21 THEN ''
      |         ELSE '<html><body>' || text || '</body></html>' END AS html,
      |    CASE WHEN doc_id % 83 = 11 THEN '' ELSE text END AS text,
      |    CASE WHEN doc_id % 89 = 7 THEN 'zz'
      |         WHEN doc_id % 91 = 8 THEN ''
      |         ELSE lang END AS lang,
      |    CAST(doc_id % 8 AS INTEGER) AS part
      |  FROM documents
      |), lineage AS (
      |  SELECT 'https://ex' || (doc_id % 7) || '.org/doc/' || doc_id AS url,
      |         1767225600 + (doc_id * 7919) % 7776000 AS ts_epoch,
      |         'fetch-' || doc_id AS fetch_id
      |  FROM documents WHERE doc_id % 6 <> 5
      |)""".stripMargin
}
