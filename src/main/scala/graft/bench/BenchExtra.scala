package graft.bench

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Round-6 diagnostic bench — NOT a driver surface (graft.Bench is the
  * frozen harness). Times individual SparkEntry queries with the same
  * session config / force / clearCache discipline as graft.Bench, and
  * additionally attributes each timed run to its Spark JOBS (count +
  * per-job wall ms via a listener): a query whose wall time hides an
  * eager plan-construction pre-pass (e.g. the BucketBudget gate) shows
  * up as a multi-job run with the pre-pass job's cost visible.
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  * Usage: runMain graft.bench.BenchExtra <reps> [query...]   (default: all)
  */
object BenchExtra {

  private final case class JobRec(id: Int, desc: String, ms: Long)

  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // A/B bisection knob: GRAFT_CONF="k=v;k=v" applies extra session confs
    val extraConf = sys.env.getOrElse("GRAFT_CONF", "")
      .split(";").filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }
    val spark = extraConf.foldLeft(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.windowGroupLimitThreshold",
        graft.sim.BucketBudget.DefaultCap.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val starts = mutable.Map.empty[Int, Long]
    val jobs = mutable.ArrayBuffer.empty[JobRec]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
        starts(e.jobId) = System.nanoTime()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
        starts.remove(e.jobId).foreach { t0 =>
          jobs += JobRec(e.jobId, "", (System.nanoTime() - t0) / 1000000)
        }
      }
    })

    val names =
      if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      graft.Bench.force(graft.SparkEntry.queries(name)(spark, sfDir)) // warm
      spark.catalog.clearCache()
      (1 to reps).foreach { i =>
        jobs.synchronized(jobs.clear())
        val t0 = System.nanoTime()
        graft.Bench.force(graft.SparkEntry.queries(name)(spark, sfDir))
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        // listener events are async; give the bus a beat before reading
        Thread.sleep(150)
        val js = jobs.synchronized(jobs.toList)
        println(f"[benchx] $name rep$i: $dt%.3f s  jobs=${js.size}  " +
          js.map(j => s"j${j.id}:${j.ms}ms").mkString(" "))
      }
    }
    spark.stop()
  }
}
