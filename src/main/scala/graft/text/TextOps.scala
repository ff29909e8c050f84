package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, language ID (stopword-hit heuristic), quality scoring,
  * and document fingerprinting (rolling polynomial hash).
  *
  * Scale design: every operator here is a ROW-LOCAL array expression —
  * zero shuffles, fully inside whole-stage codegen. Token arrays are
  * never exploded; counting/folding happens with `filter`/`aggregate`
  * higher-order functions on the array in place.
  */
object TextOps {

  /** Lowercased alphanumeric tokens; empty strings dropped.
    * (reference row-cleaning analogue: strip + drop empties,
    * io.py:575-590).
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Whitespace token count + BPE-ish regex token count
    * (letters runs | digit runs | single punctuation).
    */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(
      col("doc_id"),
      size(tokens(col(textCol))).cast("long").as("n_ws_tokens"),
      size(expr(s"regexp_extract_all(lower($textCol), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)"))
        .cast("long").as("n_re_tokens"))

  /** Tiny per-language stopword lists for the language-ID heuristic. */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est"),
    "es" -> Seq("el", "los", "y", "es", "las", "una"))

  /** Stopword hit count (repeats counted) for one language list. */
  def stopwordHits(toks: Column, stops: Seq[String]): Column =
    size(filter(toks, t => t.isin(stops: _*))).cast("long")

  /** Language-ID heuristic: per-language stopword hit counts, argmax with
    * deterministic priority tiebreak (list order), 'und' when no hits.
    */
  def languageId(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    // Scan.spread on every heavy TextOps entry: the token HOF pipelines
    // (interpreted lambdas + per-token md5) fuse into the scan stage and
    // the driver's one-row-group parquet cannot split (guide §2.5);
    // at scale (splits >= cores) spread is the identity.
    // (A two-layer tokenize-once rewrite was tried in r06 and measured
    // SLOWER than the inline form — Spark's codegen already shares the
    // repeated tokens() subtree here; keep the inline expressions.)
    val withScores = graft.io.Scan.spread(df).select(
      (col("doc_id") +: Stopwords.map { case (l, stops) =>
        stopwordHits(toks, stops).as(s"s_$l") }): _*)
    val langs = Stopwords.map(_._1)
    val maxScore = greatest(langs.map(l => col(s"s_$l")): _*)
    val pred = langs.foldRight(lit("und"): Column) { (l, elsePart) =>
      when(maxScore > 0 && col(s"s_$l") === maxScore, l).otherwise(elsePart)
    }
    withScores.select(
      (col("doc_id") +: pred.as("pred_lang") +: langs.map(l => col(s"s_$l"))): _*)
  }

  /** Quality score: token count, punctuation ratio, stopword ratio folded
    * through a logistic — the shape of heuristic web-text quality filters.
    * All arithmetic, engine-portable; rounded for cross-engine parity.
    */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val t = lower(col(textCol))
    val toks = tokens(col(textCol))
    val nTok = size(toks).cast("long")
    // punctuation = what remains after stripping [a-z0-9 ] — the length
    // of the RESIDUE itself (length(t) minus the residue would count the
    // alphanumerics, inverting the ratio)
    val punct = length(regexp_replace(t, "[a-z0-9 ]", "")).cast("double")
    val punctRatio = punct / greatest(length(t), lit(1)).cast("double")
    val stopRatio = stopwordHits(toks, Stopwords.head._2).cast("double") /
      greatest(nTok, lit(1L)).cast("double")
    graft.io.Scan.spread(df).select(
      col("doc_id"),
      nTok.as("n_tokens"),
      round(punctRatio, 6).as("punct_ratio"),
      round(stopRatio, 6).as("stop_ratio"),
      round(lit(1.0) / (lit(1.0) +
        exp(-(nTok * 0.05 + stopRatio * 2.0 - punctRatio * 5.0 - lit(2.0)))), 6)
        .as("quality"))
  }

  /** Rolling-hash fingerprint modulus. */
  val FpMod = 1000003L

  /** Integer hash of a token: first 12 hex digits of md5 as an integer,
    * mod FpMod — chosen because both Spark (`conv`) and plain positional
    * hex arithmetic compute it identically.
    */
  def tokenHash(t: Column): Column =
    conv(substring(md5(t), 1, 12), 16, 10).cast("long") % FpMod

  /** Document fingerprint: left fold acc = (acc*31 + h(tok)) % FpMod over
    * the token sequence — order-sensitive by design (a rolling content
    * hash, the SemanticMappingHash pluggable-identity analogue,
    * api.py:581). Row-local; no shuffle.
    */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(tokens(text), tokenHash(_)),
      lit(0L),
      (acc, h) => (acc * 31L + h) % FpMod)

  def fingerprints(df: DataFrame, textCol: String): DataFrame =
    graft.io.Scan.spread(df)
      .select(col("doc_id"), fingerprint(col(textCol)).as("fp"))
}
