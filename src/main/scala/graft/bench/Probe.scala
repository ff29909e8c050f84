package graft.bench

/** Host-window quietness probe, extracted from ScalingBench so every
  * measurement run (TimeCap, ScalingBench, ad-hoc) can qualify its
  * window the same way BEFORE burning minutes on a co-tenant-saturated
  * box: the round-4 evening sets showed identical plans swinging 20×
  * between reps when the 4-thread stream probe read below ~19 GB/s.
  *
  *   - [[lcgThr]]: pure-register LCG ops/sec at `threads` — the CPU
  *     ceiling (no DRAM traffic, SMT sharing only).
  *   - [[bwThr]]: 1.6 GB shared-array stream-sum GB/s at `threads` —
  *     the DRAM ceiling that binds parquet decode. Historical clean
  *     readings on this box: 19–21 GB/s @4 threads, 92–110 GB/s @32.
  *
  * `runMain graft.bench.Probe [threadsA=4] [threadsB=32]` prints one
  * JSON line; `clean` applies the round-3/4 evidence criterion
  * (bw@A ≥ 17 GB/s — just under the historical clean floor).
  */
object Probe {

  private val sink = new java.util.concurrent.atomic.AtomicLong()

  def lcgThr(threads: Int, itersPerTask: Long = 400_000_000L): Double = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val tasks = threads * 2
    val t0 = System.nanoTime()
    val futs = (1 to tasks).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = {
          var x = System.nanoTime(); var i = 0L
          while (i < itersPerTask) {
            x = x * 6364136223846793005L + 1442695040888963407L; i += 1
          }
          x
        }
      })
    }
    sink.addAndGet(futs.map(_.get()).sum)
    pool.shutdown()
    tasks * itersPerTask / ((System.nanoTime() - t0) / 1e9)
  }

  /** 1.6 GB shared read-only array (beyond LLC; every pass streams DRAM). */
  lazy val bwArr: Array[Long] = Array.tabulate(200_000_000)(_.toLong)

  def bwThr(threads: Int): Double = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val passes = 2
    val t0 = System.nanoTime()
    val futs = (1 to threads).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = {
          var s = 0L; var r = 0
          while (r < passes) {
            var i = 0
            while (i < bwArr.length) { s += bwArr(i); i += 1 }
            r += 1
          }
          s
        }
      })
    }
    sink.addAndGet(futs.map(_.get()).sum)
    pool.shutdown()
    threads.toDouble * passes * bwArr.length * 8 / ((System.nanoTime() - t0) / 1e9) / 1e9
  }

  /** Clean-window floor for the A-level stream probe (GB/s): historical
    * clean readings are 19–21 GB/s @4 threads on this box.
    */
  val CleanBwFloor: Double = 17.0

  def main(args: Array[String]): Unit = {
    val tA = if (args.length > 0) args(0).toInt else 4
    val tB = if (args.length > 1) args(1).toInt else 32
    require(bwArr.length > 0) // init outside timed region
    lcgThr(tA, itersPerTask = 10_000_000L) // JIT warm
    bwThr(tA)
    val lA = lcgThr(tA); val bA = bwThr(tA)
    val lB = lcgThr(tB); val bB = bwThr(tB)
    val clean = bA >= CleanBwFloor
    println(f"""{"threadsA":$tA,"threadsB":$tB,"lcgA":$lA%.3e,"lcgB":$lB%.3e,"bwA_gbps":$bA%.1f,"bwB_gbps":$bB%.1f,"clean":$clean}""")
  }
}
