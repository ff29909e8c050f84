package graft.bench

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.canonical.Canonical
import graft.canonical.Canonical.{Field, FmtFloat3, FmtStr, FmtUri, FmtUriList}
import graft.gen.Derive

/** Dual-parallelism throughput for the ROUND-2 record-identity path: the
  * canonical S-expression + FNV-64 record hash and the SHA-256 triple
  * hash, evaluated per row over a generated mapping-record table (same
  * N-vs-4N evidence shape as ScalingBench; the job is a pure row-local
  * expression tree, so this measures the codegen hash pipeline itself —
  * the component a 10^12-row identity pass is bound by).
  *
  * MEASUREMENT CAVEAT (why the published figure is the 8M-row run):
  * dual-parallelism microbenchmarks inside ONE shared JVM are layout-
  * and size-sensitive in ways a real multi-executor cluster is not —
  * measured on identical code: 256 small files punish the 8-thread run
  * (tiny-task overhead, apparent eff 1.14), 32M rows punish it further
  * (apparent eff 1.30 — superlinear, i.e. meaningless), while 8M rows /
  * tens-of-files layouts measure 0.68-0.74. The published
  * BENCH/BASELINE.md section reports the conservative 8M figure with a
  * single-JVM allocation confounder note; the cluster-real evidence for
  * the north rule remains ScalingBench's full-suite 0.840.
  *
  * Usage: runMain graft.bench.HashBench [nRows] [appendMd] [mode]
  */
object HashBench {

  private def session(cpus: Int): SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-hashbench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** digest_record's field layout (MappingQueries.mappingFields twin). */
  private def fields: Seq[Field] = Seq(
    Field("subject_id", col("subject_id"), FmtUri),
    Field("subject_label", col("subject_label"), FmtStr),
    Field("predicate_id", col("predicate_id"), FmtUri),
    Field("predicate_modifier", col("predicate_modifier"), FmtStr),
    Field("object_id", col("object_id"), FmtUri),
    Field("object_label", col("object_label"), FmtStr),
    Field("mapping_justification", col("justification"), FmtUri),
    Field("author_id", when(col("author_id").isNotNull, array(col("author_id"))), FmtUriList),
    Field("reviewer_id", when(col("reviewer_id").isNotNull, array(col("reviewer_id"))), FmtUriList),
    Field("mapping_tool", col("mapping_tool"), FmtStr),
    Field("mapping_date", col("mapping_date"), FmtStr),
    Field("publication_date", col("publication_date"), FmtStr),
    Field("review_date", col("review_date"), FmtStr),
    Field("confidence", col("confidence"), FmtFloat3),
    Field("reviewer_agreement", col("reviewer_agreement"), FmtFloat3),
    Field("similarity_score", col("similarity_score"), FmtFloat3))

  private def job(spark: SparkSession, path: String, mode: String): Long = {
    val m = spark.read.parquet(path)
    val cols = mode match {
      case "record" => Seq(Canonical.recordHash(fields).as("h1"))
      case "triple" => Seq(Canonical.tripleHash(col("subject_id"),
        col("predicate_id"), col("object_id"),
        col("predicate_modifier") === "Not").as("h1"))
      case _ => Seq(
        Canonical.recordHash(fields).as("h1"),
        Canonical.tripleHash(col("subject_id"), col("predicate_id"),
          col("object_id"), col("predicate_modifier") === "Not").as("h2"))
    }
    m.select(cols: _*)
      .agg(expr(s"bit_xor(xxhash64(${cols.indices.map(i => s"h${i + 1}").mkString(", ")}))"))
      .head().getLong(0)
  }

  private def timeBest(reps: Int)(f: => Unit): Double =
    (1 to reps).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 8000000L
    val outMd = if (args.length > 1) args(1) else "BENCH/BASELINE.md"
    val mode = if (args.length > 2) args(2) else "both"
    val dataPath = s"/tmp/graft_bench_mappings_$n"
    if (!Files.exists(Paths.get(dataPath))) {
      val s = session(32)
      Derive.mappingsOf(s.range(n).select(col("id").as("doc_id")))
        .repartition(64)
        .write.mode("overwrite").parquet(dataPath)
    }
    val results = Seq(8, 32).map { cpus =>
      val s = session(cpus)
      val check = job(s, dataPath, mode) // warm-up + parity value
      val secs = timeBest(3)(job(s, dataPath, mode))
      (cpus, secs, n / secs, check)
    }
    val Seq((_, s8, thr8, c8), (_, s32, thr32, c32)) = results
    val eff = thr32 / (4.0 * thr8)
    val md =
      s"""
         |## Record-identity hash throughput (round-2 canonical path)
         |
         |Canonical S-expression + FNV-64 record hash PLUS SHA-256 triple
         |hash per row (the digest_record/digest_triple pipeline — a pure
         |row-local codegen expression tree, zero shuffle) over $n
         |generated mapping records, best of 3 after warm-up:
         |
         || parallelism | seconds | hashed records/sec |
         ||---|---|---|
         || local[8]  (N)  | ${f"$s8%.2f"} | ${f"$thr8%.0f"} |
         || local[32] (4N) | ${f"$s32%.2f"} | ${f"$thr32%.0f"} |
         |
         |- scaling efficiency thr@4N / (4 × thr@N) = **${f"$eff%.3f"}**
         |- result parity across parallelism: **${if (c8 == c32) "IDENTICAL" else "MISMATCH"}**
         |  (xxhash64-combined digest of all record+triple hashes)
         |
         |Generated by `graft.bench.HashBench` on ${java.time.Instant.now()}.
         |""".stripMargin
    Files.writeString(Paths.get(outMd), md,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    println(s"""{"thr8":$thr8,"thr32":$thr32,"efficiency":$eff,"parity":${c8 == c32}}""")
    SparkSession.getActiveSession.foreach(_.stop())
  }
}
