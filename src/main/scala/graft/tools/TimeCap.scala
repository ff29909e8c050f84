package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.bench.BenchUtil
import graft.sim.{Ann, BucketBudget, Sim}

/** Cap-on vs cap-off attribution for the LSH pair family (round-4
  * verdict item 3): times the four pipelines the hot-bucket budget was
  * inserted into, with `bucketCap = DefaultCap` (production) and
  * `bucketCap = 0` (cap machinery absent — the round-3 plan), INTERLEAVED
  * per rep so host drift hits both variants of a pair about equally.
  * This isolates the plan cost of the always-on WindowGroupLimit sort on
  * a healthy (no oversized bucket) corpus, which the suite-level
  * BENCH_r04-vs-r03 diff could not separate from host noise.
  *
  * Usage: runMain graft.tools.TimeCap <sfDir> [reps=5]
  * Honors SPARK_GRAFT_CPUS (default 32) like Bench/TimeQ.
  */
object TimeCap {

  private def pipelines(s: SparkSession, dir: String, cap: Int): Seq[(String, () => DataFrame)] = {
    def docs = s.read.parquet(s"$dir/documents.parquet")
    def embs = s.read.parquet(s"$dir/embeddings.parquet")
    Seq(
      "sim_minhash_lsh" -> (() =>
        Sim.minhashLshPairs(docs, "doc_id", "text", n = 3, k = 8, rows = 2,
          threshold = 0.2, bucketCap = cap)),
      "sim_simhash_pairs" -> (() =>
        Sim.simhashPairs(Sim.simhash(docs, "doc_id", "text"), bucketCap = cap)),
      "emb_neardup" -> (() =>
        Ann.lshNearDupPairsMulti(embs, "vec_id", "embedding", dim = 64,
          threshold = 0.35, nTables = 1, bucketCap = cap)),
      "emb_neardup_multi" -> (() =>
        Ann.lshNearDupPairsMulti(embs, "vec_id", "embedding", dim = 64,
          threshold = 0.35, bucketCap = cap)))
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 1) {
      System.err.println("usage: runMain graft.tools.TimeCap <sfDir> [reps=5]")
      sys.exit(2)
    }
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = BenchUtil.session(cpus, "graft-timecap")

    def timed(mk: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      graft.Bench.force(mk())
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }

    val names = pipelines(spark, sfDir, BucketBudget.DefaultCap).map(_._1)
    names.foreach { name =>
      def mkOn  = pipelines(spark, sfDir, BucketBudget.DefaultCap).find(_._1 == name).get._2
      def mkOff = pipelines(spark, sfDir, 0).find(_._1 == name).get._2
      // row parity first (also warms both plans): at DefaultCap no sf0.1
      // bucket is oversized, so cap-on must equal cap-off exactly
      val rOn = mkOn().collect().map(_.mkString("|")).sorted
      spark.catalog.clearCache()
      val rOff = mkOff().collect().map(_.mkString("|")).sorted
      spark.catalog.clearCache()
      val parity = rOn.sameElements(rOff)
      val pairs = (1 to reps).map { i =>
        val on = timed(mkOn); val off = timed(mkOff)
        println(f"[timecap] $name rep$i: capOn=$on%.3f s capOff=$off%.3f s ratio=${on / off}%.3f")
        (on, off)
      }
      val mOn = BenchUtil.median(pairs.map(_._1))
      val mOff = BenchUtil.median(pairs.map(_._2))
      // min-of-reps: robust to intermittent co-tenant stalls (a stall
      // only ever ADDS time, so the min approximates the clean cost)
      val nOn = pairs.map(_._1).min; val nOff = pairs.map(_._2).min
      println(f"[timecap] $name MEDIAN capOn=$mOn%.3f s capOff=$mOff%.3f s " +
        f"overhead=${(mOn / mOff - 1) * 100}%.1f%% | MIN capOn=$nOn%.3f s " +
        f"capOff=$nOff%.3f s overhead=${(nOn / nOff - 1) * 100}%.1f%% " +
        f"parity=$parity rows=${rOn.length}")
    }
    spark.stop()
  }
}
