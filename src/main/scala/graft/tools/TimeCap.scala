package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.bench.{BenchUtil, Probe}
import graft.sim.{Ann, BucketBudget, Sim}

/** Cap attribution for the LSH pair family (round-4 verdict item 3):
  * times the four pipelines the hot-bucket budget was inserted into,
  * THREE-WAY per rep, INTERLEAVED so host drift hits all variants of a
  * rep about equally:
  *
  *   - `off`    — bucketCap = 0: cap machinery absent (the round-3 plan).
  *   - `always` — bucketCap = DefaultCap, capGate=always: the
  *     unconditional `row_number <= cap` window (the round-4 plan whose
  *     BENCH_r04 regression this tool attributes).
  *   - `gated`  — bucketCap = DefaultCap, capGate=auto: the round-5
  *     production plan (exact oversized-bucket pre-pass; window only
  *     when a bucket is actually over the cap).
  *
  * always/off isolates the plan cost of the always-on WindowGroupLimit
  * sort on a healthy (no oversized bucket) corpus — the split the
  * suite-level BENCH_r04-vs-r03 diff could not separate from host
  * noise. gated/off is the residual insurance premium of the round-5
  * gate (one count aggregate over the banded frame). Window quietness
  * is qualified with the shared [[Probe]] instruments before and after
  * the measured region.
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

  // (variant label, bucketCap, capGate conf value)
  private val variants = Seq(
    ("off", 0, "auto"), ("always", BucketBudget.DefaultCap, "always"),
    ("gated", BucketBudget.DefaultCap, "auto"))

  def main(args: Array[String]): Unit = {
    if (args.length < 1) {
      System.err.println("usage: runMain graft.tools.TimeCap <sfDir> [reps=5]")
      sys.exit(2)
    }
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = BenchUtil.session(cpus, "graft-timecap")

    def probeLine(tag: String): Unit = {
      val b4 = Probe.bwThr(4); val b32 = Probe.bwThr(32)
      println(f"[timecap] probe($tag): bw@4=$b4%.1f GB/s bw@32=$b32%.1f GB/s " +
        f"clean=${b4 >= Probe.CleanBwFloor}")
    }

    def mk(name: String, variant: (String, Int, String)): () => DataFrame = { () =>
      spark.conf.set("graft.sim.capGate", variant._3)
      pipelines(spark, sfDir, variant._2).find(_._1 == name).get._2()
    }

    def timed(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      graft.Bench.force(f())
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }

    require(Probe.bwArr.length > 0) // init the 1.6 GB probe array untimed
    Probe.bwThr(4) // JIT-warm the probe loop
    probeLine("before")

    val names = pipelines(spark, sfDir, 0).map(_._1)
    val results = names.map { name =>
      // row parity first (also warms all plans): at DefaultCap no sf0.1
      // bucket is oversized, so all three variants must agree exactly
      val rows = variants.map { v =>
        val r = mk(name, v)().collect().map(_.mkString("|")).sorted
        spark.catalog.clearCache(); r
      }
      val parity = rows.forall(_.sameElements(rows.head))
      val samples = (1 to reps).map { i =>
        val ts = variants.map { v => v._1 -> timed(mk(name, v)) }.toMap
        println(f"[timecap] $name rep$i: off=${ts("off")}%.3f s " +
          f"always=${ts("always")}%.3f s gated=${ts("gated")}%.3f s")
        ts
      }
      def stat(v: String, f: Seq[Double] => Double) = f(samples.map(_(v)))
      val med = variants.map(v => v._1 -> stat(v._1, BenchUtil.median)).toMap
      val mn = variants.map(v => v._1 -> stat(v._1, _.min)).toMap
      // min-of-reps: robust to intermittent co-tenant stalls (a stall
      // only ever ADDS time, so the min approximates the clean cost)
      println(f"[timecap] $name MEDIAN off=${med("off")}%.3f always=${med("always")}%.3f " +
        f"gated=${med("gated")}%.3f | window-overhead(always/off) " +
        f"med=${(med("always") / med("off") - 1) * 100}%+.1f%% " +
        f"min=${(mn("always") / mn("off") - 1) * 100}%+.1f%% | " +
        f"gate-overhead(gated/off) med=${(med("gated") / med("off") - 1) * 100}%+.1f%% " +
        f"min=${(mn("gated") / mn("off") - 1) * 100}%+.1f%% | " +
        f"parity=$parity rows=${rows.head.length}")
      (name, med, mn, parity, rows.head.length)
    }
    probeLine("after")
    results.foreach { case (name, med, mn, parity, n) =>
      println(f"""{"query":"$name","off_med":${med("off")}%.3f,"always_med":${med("always")}%.3f,"gated_med":${med("gated")}%.3f,"off_min":${mn("off")}%.3f,"always_min":${mn("always")}%.3f,"gated_min":${mn("gated")}%.3f,"parity":$parity,"rows":$n}""")
    }
    spark.stop()
  }
}
