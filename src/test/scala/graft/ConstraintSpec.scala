package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.constraints.Constraints
import graft.runner.Runner
import graft.schema.WebPage

/** Per-constraint unit tests over a hand-built fixture where each
  * constraint is violated by exactly one known row (style of the
  * reference's annotated example corpus, examples.py:127-675, and the
  * error-channel tests, tests/test_api.py:289-323).
  */
class ConstraintSpec extends SparkSpecBase {
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)
  val okTs: Timestamp = ts("2026-02-01 00:00:00")

  def page(url: String = "https://ex0.org/doc/1", t: Timestamp = okTs,
           html: String = "<html>x</html>", text: String = "x",
           lang: String = "en", part: Int = 0): WebPage =
    WebPage(url, t, if (html == null) null else html.getBytes("UTF-8"), text, lang, part)

  // one violation per row, keyed by url path for identification
  val fixture: Seq[WebPage] = Seq(
    page(url = "https://ex0.org/doc/ok"),
    page(url = null),                                        // url_required
    page(url = "not a url 7"),                               // url_shape
    page(url = "https://ex0.org/doc/nots", t = null),        // warc_ts_required
    page(url = "https://ex0.org/doc/early", t = ts("2025-06-15 00:00:00")), // warc_ts_window
    page(url = "https://ex0.org/doc/zz", lang = "zz"),       // lang_enum
    page(url = "https://ex0.org/doc/notext", text = "",
      html = ""),                                            // text_required only
    page(url = "https://ex0.org/doc/cross", text = ""),      // text_required + crossfield
    page(url = "https://ex0.org/doc/long", text = "y" * 5000) // text_len_max
  )

  lazy val df: DataFrame = spark.createDataset(fixture).toDF()
    .withColumn("doc_id", monotonically_increasing_id())
  lazy val viol: Map[(String, String), Long] =
    Runner.violations(df, Constraints.webtextSuite, Seq("url"))
      .groupBy("url", "check_name").count()
      .collect().map(r => (Option(r.getString(0)).getOrElse("<null>"), r.getString(1)) -> r.getLong(2))
      .toMap

  test("each engineered row violates exactly its constraint") {
    assert(viol(("<null>", "url_required")) == 1)
    assert(viol(("not a url 7", "url_shape")) == 1)
    assert(viol(("https://ex0.org/doc/nots", "warc_ts_required")) == 1)
    assert(viol(("https://ex0.org/doc/early", "warc_ts_window")) == 1)
    assert(viol(("https://ex0.org/doc/zz", "lang_enum")) == 1)
    assert(viol(("https://ex0.org/doc/notext", "text_required")) == 1)
    assert(!viol.contains(("https://ex0.org/doc/notext", "html_text_crossfield")),
      "empty html must not trigger the cross-field check")
    assert(viol(("https://ex0.org/doc/cross", "html_text_crossfield")) == 1)
    assert(viol(("https://ex0.org/doc/long", "text_len_max")) == 1)
  }

  test("the clean row violates nothing; total violation count is exact") {
    assert(!viol.keys.exists(_._1 == "https://ex0.org/doc/ok"))
    assert(viol.values.sum == 9) // 8 single + cross row fails text_required too
  }

  test("verdict grid is dense and consistent with violations") {
    val v = Runner.verdicts(df, Constraints.webtextSuite).collect()
    assert(v.length == Constraints.webtextSuite.size) // one part in fixture
    v.foreach { r =>
      assert(r.getBoolean(2) == (r.getLong(3) == 0L))
      assert(r.getLong(4) == fixture.size)
    }
    val failed = v.filter(!_.getBoolean(2)).map(_.getString(1)).toSet
    assert(failed == Set("url_required", "url_shape", "warc_ts_required",
      "warc_ts_window", "lang_enum", "text_required", "html_text_crossfield",
      "text_len_max"))
  }

  test("verdicts are identical across shuffle-partition settings (parity)") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    def run(): Set[String] =
      Runner.verdicts(df.repartition(13), Constraints.webtextSuite)
        .collect().map(_.mkString("|")).toSet
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      val a = run()
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      val b = run()
      assert(a == b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
