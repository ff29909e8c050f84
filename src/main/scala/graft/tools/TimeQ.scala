package graft.tools

import org.apache.spark.sql.SparkSession

/** Times individual SparkEntry queries in isolation (warm-up + 2 timed
  * reps, same force/clearCache discipline as [[graft.Bench]]) with an
  * explicit windowGroupLimitThreshold, so a suite-context slowdown can
  * be split into plan effect vs shared-session/host effect.
  * Usage: runMain graft.tools.TimeQ <sfDir> <wglThreshold> <query...>
  * Honors SPARK_GRAFT_CPUS (default 32) like Bench/Verify, so timings
  * are comparable to the bench runs taken at the same parallelism.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        "usage: runMain graft.tools.TimeQ <sfDir> <wglThreshold> <query...>")
      sys.exit(2)
    }
    val sfDir = args(0)
    val wgl = args(1)  // windowGroupLimitThreshold
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.windowGroupLimitThreshold", wgl)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      graft.Bench.force(graft.SparkEntry.queries(n)(spark, sfDir)) // warm
      spark.catalog.clearCache()
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        graft.Bench.force(graft.SparkEntry.queries(n)(spark, sfDir))
        println(f"[timeq] $n wgl=$wgl rep$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
