package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.gen.Derive

/** Storage-level co-location: writing both sides of the url join as
  * bucketed tables (same bucket count, same key) lets the sort-merge
  * join run with ZERO exchanges — the shuffle happened once at write
  * time and is amortized over every subsequent join/aggregation on the
  * key. This is the single-box stand-in for the north rule's "explicit
  * repartitioning by url-hash": on a cluster the same layout comes from
  * Iceberg bucket partition transforms, and repeated validation runs
  * (uniqueness, lineage RI, digest compare — all url-keyed) never
  * re-shuffle the fact table.
  */
class BucketSpec extends SparkSpecBase {

  test("bucketed url tables join with zero shuffle; unbucketed shuffles both sides") {
    val wh = Files.createTempDirectory("graft-bucket-wh").toString
    val pages = Derive.webPages(spark, "/root/testdata/sf0.001")
      .filter(col("url").isNotNull)
    val lineage = Derive.lineage(spark, "/root/testdata/sf0.001")
    spark.sql("DROP TABLE IF EXISTS pages_b")
    spark.sql("DROP TABLE IF EXISTS lineage_b")
    pages.write.bucketBy(8, "url").sortBy("url")
      .option("path", s"$wh/pages_b").saveAsTable("pages_b")
    lineage.write.bucketBy(8, "url").sortBy("url")
      .option("path", s"$wh/lineage_b").saveAsTable("lineage_b")

    // merge hint: at sf0.001 the lineage side fits the broadcast
    // threshold; the hint pins the plan to the sort-merge shape that a
    // 100 TB fact-fact join would take, which is what bucketing serves
    val bucketed = spark.table("pages_b").hint("merge")
      .join(spark.table("lineage_b").hint("merge"), Seq("url"))
      .groupBy(col("part")).agg(count(lit(1)).as("n"))
    val pb = bucketed.queryExecution.executedPlan.toString
    // the join itself needs no exchange: distribution comes from storage
    assert(pb.contains("SortMergeJoin"), pb)
    val joinIdx = pb.indexOf("SortMergeJoin")
    assert(!pb.substring(joinIdx).contains("Exchange"),
      s"bucketed join must not shuffle its inputs:\n$pb")

    val unbucketed = pages.hint("merge").join(lineage.hint("merge"), Seq("url"))
      .groupBy(col("part")).agg(count(lit(1)).as("n"))
    val up = unbucketed.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(up).size >= 2,
      s"unbucketed baseline shuffles both join inputs:\n$up")

    // identical results, of course
    val a = bucketed.collect().map(_.mkString("|")).sorted
    val b = unbucketed.collect().map(_.mkString("|")).sorted
    assert(a.sameElements(b))
    spark.sql("DROP TABLE IF EXISTS pages_b")
    spark.sql("DROP TABLE IF EXISTS lineage_b")
  }
}
