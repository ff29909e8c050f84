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
}
