package graft

import org.apache.spark.sql.functions._
import graft.query.{PageQuery, PageSort, QueryDsl, SetOps}
import graft.agg.Confidence

class QuerySetConfSpec extends SparkSpecBase {
  import spark.implicits._

  lazy val pages = Seq(
    (1L, "https://a.org/x", "Spark Is Fast", "en", "2026-01-05 00:00:00"),
    (2L, "https://b.org/y", "nothing here", "de", "2026-01-06 00:00:00"),
    (3L, "https://a.org/z", "spark again and again and again and again and again", "en", "2026-01-07 00:00:00"),
    (4L, "https://c.org/w", "spark", "fr", "2026-01-08 00:00:00"))
    .toDF("doc_id", "url", "text", "lang", "ts")
    .withColumn("warc_ts", to_timestamp(col("ts"))).drop("ts")

  test("PageQuery compiles to an AND of present clauses; casefolded contains") {
    val got = QueryDsl.filterPages(pages,
      PageQuery(textContains = Some("SPARK"), langIn = Some(Seq("en", "fr"))))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L, 4L))
    // empty query selects everything (reduceOption fallback)
    assert(QueryDsl.filterPages(pages, PageQuery()).count() == 4)
  }

  test("whitelist is a semi join") {
    val wl = Seq("https://a.org/x").toDF("url")
    val got = QueryDsl.filterPages(pages, PageQuery(), Some(wl))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }

  test("normText strips spaces and hyphens, lowercases (query.py:143-144)") {
    val r = Seq("Alzheimer-Disease x").toDF("s")
      .select(QueryDsl.normText(col("s"))).head().getString(0)
    assert(r == "alzheimerdiseasex")
  }

  test("sameText vs sameTextNegated: reference branch semantics (query.py:120-140)") {
    val m = Seq(
      (1L, "ammeline", "Amme-Line", "skos:exactMatch"),  // same after norm → positive
      (2L, "ammeline", "different", "skos:exactMatch"),  // differs → negated
      (3L, null.asInstanceOf[String], "x", "skos:exactMatch"), // null label → negated keeps it
      (4L, "ammeline", "ammeline", "skos:broadMatch"))   // non-exact → BOTH branches drop
      .toDF("id", "s_label", "o_label", "pred")
    def ids(c: org.apache.spark.sql.Column): Set[Long] =
      m.filter(c).select("id").as[Long].collect().toSet
    assert(ids(QueryDsl.sameText(col("s_label"), col("o_label"), col("pred"))) === Set(1L))
    assert(ids(QueryDsl.sameTextNegated(col("s_label"), col("o_label"), col("pred")))
      === Set(2L, 3L))
    // the naive !sameText gets BOTH of those wrong: drops the null-label
    // row and keeps the non-exactMatch row — the reason the named
    // negation exists
    assert(ids(!QueryDsl.sameText(col("s_label"), col("o_label"), col("pred")))
      === Set(2L, 4L))
  }

  test("paginate rejects negatives; sort + topk deterministic") {
    intercept[IllegalArgumentException](QueryDsl.paginate(pages, -1, 5))
    intercept[IllegalArgumentException](QueryDsl.paginate(pages, 0, -5))
    val ids = QueryDsl.topK(pages, 2, PageSort.LenDesc, PageSort.UrlAsc)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(3L, 1L))
  }

  test("paginate: offset past the end is empty; offset drops the prefix (tests/test_query.py:112-153)") {
    val sorted = pages.orderBy(col("doc_id"))
    assert(QueryDsl.paginate(sorted, 10000, 10).count() == 0L)
    val n = sorted.count().toInt
    val rest = QueryDsl.paginate(sorted, 1, n)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(rest == sorted.select("doc_id").collect().map(_.getLong(0)).toSeq.drop(1))
  }

  test("vennCounts/vennSplit/excludeByKey") {
    val a = Seq(1, 2, 3).toDF("k")
    val b = Seq(3, 4).toDF("k")
    val v = SetOps.vennCounts(a, b, "k").head()
    assert((v.getLong(0), v.getLong(1), v.getLong(2)) == ((2L, 1L, 1L)))
    val sides = SetOps.vennSplit(a, b, "k").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(sides == Map(1 -> "left_only", 2 -> "left_only", 3 -> "both", 4 -> "right_only"))
    val kept = SetOps.excludeByKey(a, b, col("k")).collect().map(_.getInt(0)).toSet
    assert(kept == Set(1, 2))
  }

  test("merge reconciles differing schemas, NULL-fills, keeps bags") {
    val a = Seq((1, "x"), (1, "x")).toDF("k", "s")     // duplicate row kept
    val b = Seq((2, 9L)).toDF("k", "n")
    val c = Seq((3, "z", 7L)).toDF("k", "s", "n")
    val m = SetOps.merge(Seq(a, b, c))
    assert(m.columns.toSet == Set("k", "s", "n"))
    assert(m.count() == 4) // bag semantics: the duplicate (1, x) survives
    val rows = m.collect().map(r =>
      (r.getInt(0), Option(r.getString(1)), if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(rows.count(_ == ((1, Some("x"), None))) == 2)
    assert(rows.contains((2, None, Some(9L))))
    assert(rows.contains((3, Some("z"), Some(7L))))
  }

  test("confidence: mean vs noisy-or vs negation vs reviewer blend") {
    val df = Seq(("t", 0.5, false), ("t", 0.5, false)).toDF("g", "c", "neg")
    val mean = Confidence.aggregate(df, Seq("g"), col("c"), Confidence.Mean).head()
    assert(mean.getDouble(1) == 0.5)
    val nor = Confidence.aggregate(df, Seq("g"), col("c"), Confidence.Binomial).head()
    assert(nor.getDouble(1) == 0.75) // 1 - 0.5*0.5
    val neg = Confidence.aggregate(
      Seq(("t", 0.8, true)).toDF("g", "c", "neg"),
      Seq("g"), col("c"), Confidence.Mean, negated = col("neg")).head()
    assert(math.abs(neg.getDouble(1) - 0.2) < 1e-9)
    val certain = Confidence.aggregate(
      Seq(("t", 1.0, false), ("t", 0.5, false)).toDF("g", "c", "neg"),
      Seq("g"), col("c"), Confidence.Binomial).head()
    assert(certain.getDouble(1) == 1.0) // noisy-or limit at c = 1, no ln(0)
    val blend = Seq((0.6, 1.0)).toDF("c", "r")
      .select(Confidence.reviewerBlend(col("c"), col("r"), 0.5)).head().getDouble(0)
    assert(blend == 0.8) // 0.5*0.6 + 0.5*1.0
  }
}
