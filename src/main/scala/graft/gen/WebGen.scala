package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic web-page generator (FIXTURES.md §B.1): builds
  * `(doc_id, url, warc_ts, html, text, lang, part)` from `spark.range(n)`
  * with pure column expressions — seeded, reproducible, no external data,
  * generated distributed (no driver-side loops).
  *
  * Violation injection reuses the Derive mod-arithmetic scheme so known
  * fractions of rows violate each constraint. `skew = true` routes ~50%
  * of rows to ONE hot domain (the north rule's hot-domain case for
  * salted dedup / AQE skew-join testing).
  *
  * `part` is derived from a hash of the url (north rule: "explicit
  * repartitioning by url-hash"), so duplicates of a url always land in
  * the same table partition.
  */
object WebGen {

  private val Vocab: Seq[String] = Seq(
    "the", "and", "of", "to", "in", "is", "data", "spark", "scan", "merge",
    "sort", "hash", "join", "table", "order", "key", "batch", "stream",
    "window", "part", "fast", "small", "dup", "page", "crawl", "web",
    "text", "lang", "byte", "row", "shard", "block")

  private def h(seed: Long, cols: Column*): Column =
    abs(xxhash64((lit(seed) +: cols): _*))

  def pages(spark: SparkSession, n: Long, parts: Int = 64, seed: Long = 42L,
            skew: Boolean = false): DataFrame = {
    val d = col("id")
    val vocab = array(Vocab.map(lit): _*)

    // ~1% duplicate urls: point at another doc's page. The domain hash
    // keys off urlDoc (NOT d) so both members of a dup pair build the
    // IDENTICAL url — hashing off d gave each row its own domain and no
    // url ever actually duplicated. Skew mode additionally makes ~10% of
    // ALL rows share ONE hot url — the pathological dedup key the salted
    // two-phase variant exists for.
    // guard d >= 1000: below it, d - 1000 is a negative id no real row
    // carries, so the "duplicate" built a unique url and the injection
    // was inert at small n (zero dup pressure for dedup tests)
    val urlDoc = when(d % 101 === 13 && d >= 1000, d - 1000).otherwise(d)

    // domain: skew mode sends every even-hash row to domain 0 (one hot
    // domain holds ~50% of all pages); otherwise uniform over 1000
    val domRaw = h(seed + 1, urlDoc) % 1000
    val domain = if (skew) when(h(seed + 2, urlDoc) % 2 === 0, lit(0L)).otherwise(domRaw) else domRaw
    val baseUrl = concat(lit("https://d"), domain, lit(".example.org/p/"), urlDoc)
    val urlNoSkew = when(d % 97 === 3, lit(null).cast("string"))
      .when(d % 97 === 5, concat(lit("bad url "), d))
      .otherwise(baseUrl)
    val url = if (skew)
      when(d % 10 === 3, lit("https://dhot.example.org/p/hot")).otherwise(urlNoSkew)
    else urlNoSkew

    val tsEpoch = when(d % 103 === 9, lit(null).cast("long"))
      .when(d % 101 === 7, lit(1750000000L))
      .otherwise(lit(Derive.WindowStart) + h(seed + 3, d) % Derive.WindowLen)

    val lang = when(d % 89 === 7, lit("zz"))
      .when(d % 91 === 8, lit("")) // empty-string enum violation (Derive twin)
      .otherwise(element_at(array(Derive.LangEnum.map(lit): _*),
        (h(seed + 4, d) % Derive.LangEnum.size).cast("int") + 1))

    // token count ~ 2^(4 + h%7): log-ish length distribution, 16..1024 words
    val nWords = lit(16L) * pow(lit(2.0), (h(seed + 5, d) % 7).cast("double")).cast("long")
    val body = array_join(
      transform(sequence(lit(1L), nWords),
        i => element_at(vocab, (h(seed + 6, d * 4096 + i) % Vocab.size).cast("int") + 1)),
      " ")
    val text = when(d % 83 === 11, lit("")).otherwise(body)
    val html = when(d % 107 === 21, lit(""))
      .otherwise(concat(lit("<html><body>"), body, lit("</body></html>")))

    spark.range(n).select(
      d.as("doc_id"),
      url.as("url"),
      to_timestamp(tsEpoch).as("warc_ts"),
      encode(html, "UTF-8").as("html"),
      text.as("text"),
      lang.as("lang"),
      pmod(xxhash64(coalesce(url, lit("∅")), lit(seed)), lit(parts)).cast("int").as("part"))
  }

  /** Deterministic near-dup corpus `(doc_id, text, part)` for the LSH
    * near-dup scaling evidence (ScalingBench `neardup` jobs).
    *
    * [[pages]] is the WRONG corpus for that job: its 32-word vocabulary
    * gives every pair of long documents a background Jaccard of ~2-3%,
    * so the banded self-join's candidate volume grows ~quadratically in
    * n (measured: 250k pages → 385 s and >40 GB of shuffle spill at
    * local[16]) while ZERO pairs survive the ≥0.2 verification — a
    * corpus-structure artifact real crawls don't have, and pair-set
    * parity over an empty result evidences nothing. This generator
    * instead models a healthy crawl the way the reference's near-dup
    * semantics assume (sssom-pydantic grouping on content keys,
    * `process.py:186-214`): a wide effective vocabulary (50 000
    * pseudo-words → word-3-shingle universe ~10¹⁴, so unrelated docs
    * share no shingles and band buckets are singletons) with PLANTED
    * near-dup structure:
    *
    *   - clique clusters: docs with `d % 10000 < 25` form a 25-member
    *     clique per 10k block — every member shares the block's base
    *     text with word #2 replaced by a member-specific word
    *     (pairwise Jaccard ≈ 0.75-0.9, all above the 0.2 threshold);
    *   - adjacent pairs: docs with `d % 40 == 17` (outside cliques)
    *     are a one-word-substituted near-copy of doc `d-1`.
    *
    * Every doc (member or not) draws its words from the SAME
    * hash-keyed scheme, so the only above-threshold pairs are the
    * planted ones and the expected pair set is computable in a spec.
    * Text length 24-40 words keyed off the text seed so clique members
    * agree on length.
    */
  def neardupDocs(spark: SparkSession, n: Long, parts: Int = 64,
                  seed: Long = 7L): DataFrame = {
    val d = col("id")
    val inClique = d % 10000 < 25
    // integer arithmetic only: Column./ is TRUE division (doubles), so
    // (d / 10000) * 10000 would hand every member its own float seed
    val cliqueBase = d - d % 10000
    val isPair = d % 40 === 17
    // textSeed: whose base text this doc carries; variant > 0 marks a
    // member that substitutes word #2 with a variant-specific word.
    // Clique membership wins over the pair rule (a d%40==17 doc inside
    // a clique window is a clique member, never a dangling pair copy).
    val textSeed = when(inClique, cliqueBase)
      .when(isPair, d - 1).otherwise(d)
    val variant = when(inClique, d % 10000)
      .when(isPair, lit(1L)).otherwise(lit(0L))
    val nWords = (lit(24L) + h(seed + 1, textSeed) % 17).cast("int")
    val body = array_join(
      transform(sequence(lit(1), nWords), i =>
        when(i === 2 && variant > 0,
          concat(lit("v"), d)) // member-unique substitution word
          .otherwise(concat(lit("w"),
            h(seed + 2, textSeed * 64 + i) % 50000))),
      " ")
    spark.range(n).select(
      d.as("doc_id"),
      body.as("text"),
      pmod(xxhash64(d, lit(seed)), lit(parts)).cast("int").as("part"))
  }
}
