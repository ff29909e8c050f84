package graft

import org.apache.spark.sql.functions._

/** Guards for the unsplittable-input spread (graft.io.Scan.spread,
  * optimization guide §2.5): the mitigation must be value-invisible,
  * must fire only when the scan under-parallelizes, and must be a
  * strict no-op both at scale (enough splits) and under the off knob.
  */
class SpreadSpec extends SparkSpecBase {

  val sfDir = "/root/testdata/sf0.001"

  test("spread is the identity when input partitions already match parallelism") {
    val df = spark.range(0, 1000)
      .repartition(spark.sparkContext.defaultParallelism).toDF("id")
    assert(graft.io.Scan.spread(df) eq df,
      "spread must return the input object untouched when splits >= cores")
  }

  test("spread is the identity under graft.scan.spread=off") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    spark.conf.set("graft.scan.spread", "off")
    try assert(graft.io.Scan.spread(docs) eq docs)
    finally spark.conf.set("graft.scan.spread", "auto")
  }

  test("spread widens a one-split scan to the session parallelism") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    assume(docs.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
    assert(graft.io.Scan.spread(docs).rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
  }

  test("spread queries are value-identical to their unspread plans") {
    // the three spread families: codegen signature (minhash), token-HOF
    // (langid), canonical record hash (digest_record)
    for (name <- Seq("sim_minhash_sig", "t_langid", "digest_record")) {
      def rows() = SparkEntry.queries(name)(spark, sfDir)
        .collect().map(_.mkString("|")).sorted.toSeq
      val spread = rows()
      spark.conf.set("graft.scan.spread", "off")
      val plain = try rows() finally spark.conf.set("graft.scan.spread", "auto")
      assert(spread == plain, s"$name rows changed under spread")
    }
  }

  test("spread rows survive intact (count + key set) on the multimodal generate+decode path") {
    val out = SparkEntry.queries("mm_decode")(spark, sfDir)
    assert(out.count() == 500)
    assert(out.select(countDistinct(col("doc_id"))).head().getLong(0) == 500)
  }
}
