package graft

import org.apache.spark.sql.functions._
import graft.expr.Fnv64

/** Golden digest vectors (style of reference tests/test_hash.py:32-72):
  * FNV-1a 64 over UTF-8 bytes, little-endian uppercase hex, computed
  * independently with the reference's algorithm (api.py:926-936).
  */
class Fnv64Spec extends SparkSpecBase {
  import spark.implicits._

  val golden = Seq(
    "" -> "25232284E49CF2CB",
    "hello" -> "0BBDAA8046D830A4",
    "the quick brown fox" -> "22C1D80BB4B7AE59",
    "sssom" -> "40E91AD183CCF235",
    "a" -> "8CEC01864CDC63AF")

  test("golden vectors via the Column API (codegen path)") {
    val df = golden.map(_._1).toDF("s")
    val got = df.select(col("s"), Fnv64.fnv64Hex(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    golden.foreach { case (s, h) => assert(got(s) == h, s"input '$s'") }
  }

  test("interpreted eval matches codegen") {
    golden.foreach { case (s, h) =>
      val bytes = Fnv64.hashToLittleEndianBytes(s.getBytes("UTF-8"))
      assert(bytes.map("%02X".format(_)).mkString == h)
    }
  }

  test("binary input equals string input; null stays null") {
    val df = Seq(("hello", "hello".getBytes("UTF-8"))).toDF("s", "b")
    val r = df.select(Fnv64.fnv64Hex(col("s")), Fnv64.fnv64Hex(col("b"))).head()
    assert(r.getString(0) == r.getString(1))
    val n = Seq(Option.empty[String]).toDF("s")
      .select(Fnv64.fnv64(col("s"))).head()
    assert(n.isNullAt(0))
  }
}
