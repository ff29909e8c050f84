package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.constraints.Constraints
import graft.gen.Derive
import graft.runner.Runner

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry reads the driver-provided parquet tables under
  * `sfDir` and (where SQL-expressible) has a DuckDB oracle in `oracleSql`
  * producing identical rows, column names and types.
  */
object SparkEntry {

  /** Flagship: full webtext constraint suite → per-partition verdict grid
    * on sf0.001. Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    Runner.verdicts(
      Derive.webPages(spark, "/root/testdata/sf0.001"),
      Constraints.webtextSuite)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ===== core graft: row validation → violations + verdicts =====
    "violations" -> ((s, dir) =>
      Runner.violations(Derive.webPages(s, dir), Constraints.webtextSuite,
        keyCols = Seq("doc_id", "url"))),
    "verdicts" -> ((s, dir) =>
      Runner.verdicts(Derive.webPages(s, dir), Constraints.webtextSuite)),

    // ===== general relational coverage (TPC-H-ish) =====
    "q1_agg" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      li.filter(col("l_shipdate") < lit("1998-09-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    })
  )

  private val violationsUnion: String =
    """SELECT part, doc_id, url, 'url_required' AS check_name, 'null_or_empty' AS detail, 'raw' AS stage
      |  FROM web_pages WHERE NOT (url IS NOT NULL AND url <> '')
      |UNION ALL
      |SELECT part, doc_id, url, 'url_shape', url, 'processing'
      |  FROM web_pages WHERE url IS NOT NULL AND length(url) > 0
      |   AND NOT COALESCE(regexp_matches(url, '^https?://[a-z0-9.-]+(/[^ ]*)?$'), FALSE)
      |UNION ALL
      |SELECT part, doc_id, url, 'warc_ts_required', 'null', 'raw'
      |  FROM web_pages WHERE ts_epoch IS NULL
      |UNION ALL
      |SELECT part, doc_id, url, 'warc_ts_window', CAST(CAST(ts_epoch AS BIGINT) AS VARCHAR), 'processing'
      |  FROM web_pages WHERE ts_epoch IS NOT NULL
      |   AND NOT COALESCE(ts_epoch BETWEEN 1767225600 AND 1767225600 + 7776000 - 1, FALSE)
      |UNION ALL
      |SELECT part, doc_id, url, 'lang_enum', COALESCE(lang, 'NULL'), 'processing'
      |  FROM web_pages WHERE NOT COALESCE(lang IN ('en','de','fr','es','zh'), FALSE)
      |UNION ALL
      |SELECT part, doc_id, url, 'text_required', 'null_or_empty', 'raw'
      |  FROM web_pages WHERE NOT (text IS NOT NULL AND text <> '')
      |UNION ALL
      |SELECT part, doc_id, url, 'html_text_crossfield', 'html_nonempty_text_empty', 'processing'
      |  FROM web_pages WHERE COALESCE(length(html) > 0, FALSE)
      |   AND NOT COALESCE(text IS NOT NULL AND length(text) > 0, FALSE)
      |UNION ALL
      |SELECT part, doc_id, url, 'text_len_max', CAST(length(text) AS VARCHAR), 'processing'
      |  FROM web_pages WHERE text IS NOT NULL AND NOT (length(text) <= 4096)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "violations" ->
      s"""${Derive.duckCte}
         |SELECT * FROM ($violationsUnion) v""".stripMargin,
    "verdicts" ->
      s"""${Derive.duckCte},
         |v AS ($violationsUnion),
         |pc AS (SELECT part, CAST(count(*) AS BIGINT) AS row_count FROM web_pages GROUP BY part),
         |cons AS (SELECT * FROM (VALUES ('url_required'),('url_shape'),('warc_ts_required'),
         |  ('warc_ts_window'),('lang_enum'),('text_required'),('html_text_crossfield'),
         |  ('text_len_max')) c(check_name)),
         |vc AS (SELECT part, check_name, CAST(count(*) AS BIGINT) AS violation_count
         |       FROM v GROUP BY 1, 2)
         |SELECT pc.part, cons.check_name,
         |       COALESCE(vc.violation_count, 0) = 0 AS passed,
         |       CAST(COALESCE(vc.violation_count, 0) AS BIGINT) AS violation_count,
         |       pc.row_count
         |FROM pc CROSS JOIN cons
         |LEFT JOIN vc ON vc.part = pc.part AND vc.check_name = cons.check_name""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
