package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Arg-max dedup semantics (reference process.py:99-147) + salted-variant
  * equivalence + skew behavior.
  */
class DedupSpec extends SparkSpecBase {
  import spark.implicits._

  // (url, doc_id, score): url "hot" is heavily duplicated (skew)
  lazy val rows = (1L to 500L).map(i => ("hot", i, (i % 7).toInt)) ++
    Seq(("a", 1000L, 5), ("a", 1001L, 3), ("b", 2000L, 1))
  lazy val df = rows.toDF("url", "doc_id", "score")

  val ord = struct(col("score"), col("doc_id"))

  test("uniqueByKey keeps the arg-max with deterministic tiebreak") {
    val got = Dedup.uniqueByKey(df, col("url"), ord, Seq("doc_id", "score"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    // hot: max score 6 occurs at ids 6,13,...,496 -> max doc_id 496 wins
    assert(got("hot") == ((496L, 6)))
    assert(got("a") == ((1000L, 5)))
    assert(got("b") == ((2000L, 1)))
  }

  test("salted two-phase variant is result-identical") {
    val a = Dedup.uniqueByKey(df, col("url"), ord, Seq("doc_id", "score"))
      .collect().map(_.mkString("|")).toSet
    val b = Dedup.uniqueByKeySalted(df, col("url"), ord, Seq("doc_id", "score"), salts = 7)
      .collect().map(_.mkString("|")).toSet
    assert(a == b)
  }

  test("hotKeys flags the skewed key from a deterministic sample and nothing else") {
    // "hot" holds 500 of 503 rows; a 1/4 systematic sample on doc_id
    // sees 125 of them, far past any sane threshold, while "a"/"b"
    // contribute at most one sampled row each
    val got = Dedup.hotKeys(df, col("url"), col("doc_id"), mod = 4, threshold = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == Set("hot"))
    // doc_id 4,8,...,500 -> 125 sampled, est = 125 * 4 = 500 (exact here)
    assert(got("hot") == ((125L, 500L)))
  }

  test("dedup is idempotent") {
    val once = Dedup.uniqueByKey(df, col("url"), ord, Seq("doc_id", "score"))
    val twice = Dedup.uniqueByKey(
      once.withColumnRenamed("key", "url"), col("url"),
      struct(col("score"), col("doc_id")), Seq("doc_id", "score"))
    assert(once.collect().map(_.mkString("|")).toSet ==
      twice.collect().map(_.mkString("|")).toSet)
  }

  test("duplicateReport counts only keys with >1 row") {
    val got = Dedup.duplicateReport(df, col("url")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("hot" -> 500L, "a" -> 2L))
  }

  test("danglingRows = left anti on parent keys") {
    val parent = Seq("hot").toDF("url")
    val d = Dedup.danglingRows(df, parent, "url", broadcastParent = true)
    assert(d.select("url").distinct().collect().map(_.getString(0)).toSet == Set("a", "b"))
  }
}
