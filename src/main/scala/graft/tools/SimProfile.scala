package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sim.Sim

/** Stage-by-stage timing of the ngram-jaccard pipeline at one sf. */
object SimProfile {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    // Sim operators persist() intermediates; clear between stages so a
    // later stage never times under the earlier stage's cached blocks
    org.apache.spark.sql.SparkSession.active.catalog.clearCache()
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("warm")(docs.count())
    time("full pairs")(Sim.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.2).count())
    time("minhash sigs")(Sim.minhashSignatures(docs, "doc_id", "text").count())
    time("minhash lsh")(Sim.minhashLshPairs(docs, "doc_id", "text", 3, 8, 2, 0.2).count())
    spark.stop()
  }
}
