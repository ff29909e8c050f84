package graft

import org.apache.spark.sql.functions._
import graft.gen.WebGen

class WebGenSpec extends SparkSpecBase {

  test("generator is deterministic: same seed → identical rows") {
    def rows(seed: Long) = WebGen.pages(spark, 2000, seed = seed)
      .withColumn("html", hex(col("html"))) // binary compares by identity otherwise
      .collect().map(_.mkString("|")).sorted
    val a = rows(7L)
    assert(a.sameElements(rows(7L)))
    assert(!a.sameElements(rows(8L)))
  }

  test("skew mode concentrates ~50% of rows on one hot domain") {
    val df = WebGen.pages(spark, 10000, skew = true)
      .filter(col("url").startsWith("https://"))
      .select(split(regexp_replace(col("url"), "https://", ""), "\\.").getItem(0).as("dom"))
    val top = df.groupBy("dom").count().orderBy(col("count").desc).head()
    val total = df.count().toDouble
    assert(top.getString(0) == "d0")
    assert(top.getLong(1) / total > 0.4 && top.getLong(1) / total < 0.6)
  }

  test("duplicate urls land in the same table partition (url-hash parts)") {
    val df = WebGen.pages(spark, 50000)
    val multiPart = df.filter(col("url").isNotNull)
      .groupBy("url").agg(countDistinct(col("part")).as("nparts"))
      .filter(col("nparts") > 1)
    assert(multiPart.count() == 0)
  }

  test("~1% of rows duplicate another row's url (real dedup pressure)") {
    // regression for the round-3 fix: dup rows previously hashed their
    // domain from their own doc_id, so no url ever actually duplicated
    val df = WebGen.pages(spark, 50000).filter(col("url").isNotNull)
    val dupUrls = df.groupBy("url").count().filter(col("count") > 1).count()
    val expected = 50000.0 / 101 // d % 101 == 13 redirects (minus url-override losses)
    assert(dupUrls > expected * 0.7, s"got $dupUrls duplicated urls, expected ~$expected")
    assert(dupUrls < expected * 1.3, s"got $dupUrls duplicated urls, expected ~$expected")
  }

  test("neardupDocs: planted pairs are exactly the above-threshold pairs") {
    import graft.sim.Sim
    val n = 1200
    val docs = WebGen.neardupDocs(spark, n).cache()
    try {
      // determinism first (the scaling evidence depends on it)
      val a = docs.collect().map(_.mkString("|")).sorted
      assert(a.sameElements(
        WebGen.neardupDocs(spark, n).collect().map(_.mkString("|")).sorted))
      // exact all-pairs ground truth: ONLY the planted structure crosses
      // the 0.2 threshold — one 25-clique (docs 0..24 → 300 pairs) plus
      // the d%40==17 adjacent pairs outside the clique (57..1177 → 29)
      val truth = Sim.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.2)
        .select("id_1", "id_2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val cliquePairs = (for {
        i <- 0L until 25L; j <- (i + 1) until 25L
      } yield (i, j)).toSet
      val adjPairs = (57L until n by 40L).map(d => (d - 1, d)).toSet
      assert(truth == cliquePairs ++ adjPairs,
        s"ground truth ${truth.size} pairs != planted ${(cliquePairs ++ adjPairs).size}")
      // the production LSH pipeline: subset of truth (it verifies exact
      // jaccard) with recall >= 0.9 (4 bands of 2 at jac 0.75-0.9)
      val lsh = Sim.minhashLshPairs(docs, "doc_id", "text", 3, 8, 2, 0.2)
        .select("id_1", "id_2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(lsh.subsetOf(truth))
      assert(lsh.size >= truth.size * 0.9,
        s"LSH recall ${lsh.size}/${truth.size} below 0.9 floor")
    } finally docs.unpersist()
  }

  test("violation fractions roughly match the injection moduli") {
    val n = 20000.0
    val df = WebGen.pages(spark, 20000).cache()
    try {
      val nullUrls = df.filter(col("url").isNull).count()
      assert(math.abs(nullUrls - n / 97) < n / 97 * 0.2)
      val badLang = df.filter(col("lang") === "zz").count()
      assert(math.abs(badLang - n / 89) < n / 89 * 0.2)
    } finally df.unpersist()
  }
}
