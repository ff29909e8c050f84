package graft

import graft.expr.GraftExtensions

/** SQL-surface check for the custom functions, registered on the shared
  * session (the builder-time extensions path only binds on a fresh
  * session; GraftExtensions.register covers the attach-to-running case).
  */
class ExtensionsSpec extends SparkSpecBase {

  test("fnv64_hex and cosine_sim are callable from SQL") {
    GraftExtensions.register(spark)
    val hex = spark.sql("SELECT fnv64_hex('hello') AS h").head().getString(0)
    assert(hex == "0BBDAA8046D830A4") // golden vector, Fnv64Spec
    val cos = spark.sql(
      "SELECT round(cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)), 6) AS c")
      .head().getDouble(0)
    assert(cos == 1.0)
    val n = spark.sql("SELECT fnv64(CAST(NULL AS STRING)) AS v").head()
    assert(n.isNullAt(0))
    val bad = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array('a'), array('b'))").collect()
    }
    assert(bad.getMessage.contains("array<double>"))
  }

  test("simhash60 is callable from SQL and matches the Column API") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT simhash60(array('alpha', 'beta', 'gamma')) AS h").head().getLong(0)
    import org.apache.spark.sql.functions._
    val viaCol = spark.range(1).select(
      graft.expr.SimHash60.simhash60(
        array(lit("alpha"), lit("beta"), lit("gamma")))).head().getLong(0)
    assert(viaSql == viaCol && viaSql != 0L)
    val badType = intercept[Exception] {
      spark.sql("SELECT simhash60('not an array')").collect()
    }
    assert(badType.getMessage.contains("array<string>"))
  }
}
