package graft

import org.apache.spark.sql.functions._

import graft.sim.{Ann, Sim}

/** The exact all-pairs near-dup is demoted to a TEST ORACLE: here it
  * grades the multi-probe LSH path (the engine's `emb_neardup` entry)
  * at tiny scale — candidates must be a subset of exact pairs (cosine is
  * verified, so no false positives) with usable recall on the driver
  * data, and planted near-identical vectors must always be found.
  */
class AnnRecallSpec extends SparkSpecBase {
  import spark.implicits._

  test("LSH near-dup ⊆ exact; planted near-dups found; recall measured") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_1", "id_2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(Ann.cosineNearDupPairsExact(e, "vec_id", "embedding", 0.35))
    val lsh = pairSet(Ann.lshNearDupPairs(e, "vec_id", "embedding", 64, 0.35))
    assert(lsh.subsetOf(exact), "LSH verifies true cosine — no false positives")
    if (exact.nonEmpty) {
      val recall = lsh.size.toDouble / exact.size
      info(s"multi-probe LSH recall vs exact at threshold 0.35: " +
        f"$recall%.3f (${lsh.size}/${exact.size})")
      assert(recall > 0.15, s"recall collapsed: ${lsh.size}/${exact.size}")
    }
  }

  test("lsh_buckets codegen expression ≡ relational HOF pipeline, all 3 tables") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val both = e.select(col("vec_id"),
      graft.expr.LshBuckets.lshBuckets(col("v"), 64, 8, 3).as("fast"),
      array((0 until 3).map(t =>
        Ann.lshBucketRelational(col("v"), 64, 8, planeOffset = t * 8)): _*).as("slow"))
    assert(both.filter(col("fast") =!= col("slow")).count() == 0)
    // length-mismatch and null-element rows zero every bucket, like the
    // relational null propagation
    val edge = Seq(
      (1L, Seq(Option(1.0), Option(2.0))),
      (2L, Seq(Option(1.0), Option.empty[Double]) ++ Seq.fill(62)(Option(0.5))))
      .toDF("id", "v")
    val z = edge.select(graft.expr.LshBuckets.lshBuckets(col("v"), 64, 8, 2).as("b"))
      .collect().map(_.getSeq[Long](0))
    assert(z.forall(_ == Seq(0L, 0L)))
  }

  test("multi-table LSH: candidates strictly widen; driver-data recall measured") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_1", "id_2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(Ann.cosineNearDupPairsExact(e, "vec_id", "embedding", 0.35))
    val single = pairSet(Ann.lshNearDupPairs(e, "vec_id", "embedding", 64, 0.35))
    val multi = pairSet(Ann.lshNearDupPairsMulti(e, "vec_id", "embedding", 64, 0.35))
    info(f"thr=0.35: exact=${exact.size} single=${single.size} multi=${multi.size} " +
      f"recall_single=${single.size.toDouble / exact.size}%.3f " +
      f"recall_multi=${multi.size.toDouble / exact.size}%.3f")
    assert(single.subsetOf(multi), "table 0 of the multi index IS the single index")
    assert(multi.subsetOf(exact), "cosine is verified — no false positives")
    assert(multi.size > single.size,
      "independent tables must surface pairs the first table missed")
  }

  test("RECALL FLOOR: multi-table LSH finds >= 0.9 of true near-dups at threshold 0.85") {
    // seeded corpus with PLANTED near-duplicates: 100 pairs at cos ~0.97
    // (members = base + 0.25*independent-gaussian noise) over iid
    // gaussian base vectors (java.util.Random is LCG-specified, so the
    // corpus is deterministic) whose pairwise cosines sit near
    // N(0, 1/64) — the exact pair set at 0.85 is precisely the planted
    // pairs. Documented floor: recall >= 0.9 with the default 3-table,
    // 8-plane, 1-bit-probe index (expected ~0.99; a plan change trading
    // recall for speed fails here).
    val dim = 64
    def gauss(seed: Long): Array[Float] = {
      val rnd = new java.util.Random(seed)
      Array.fill(dim)(rnd.nextGaussian().toFloat)
    }
    val rows = (0 until 100).flatMap { k =>
      val b = gauss(k)
      val n = gauss(k + 100000)
      val m2 = Array.tabulate(dim)(d => b(d) + 0.25f * n(d))
      Seq((2L * k, b), (2L * k + 1, m2))
    }
    val e = rows.toDF("vec_id", "embedding")
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_1", "id_2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(Ann.cosineNearDupPairsExact(e, "vec_id", "embedding", 0.85))
    assert(exact.size >= 95 && exact.size <= 105,
      s"planting failed: ${exact.size} true pairs (expected ~100 planted)")
    val multi = pairSet(Ann.lshNearDupPairsMulti(e, "vec_id", "embedding", dim, 0.85))
    val recall = multi.size.toDouble / exact.size
    info(f"planted-corpus recall at 0.85: $recall%.3f (${multi.size}/${exact.size})")
    assert(multi.subsetOf(exact))
    assert(recall >= 0.9, f"recall floor broken: $recall%.3f < 0.9")
  }

  test("IVF: cell = argmax-cosine centroid; full probe ≡ brute force; nprobe=2 recall measured") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Ann.ivfCentroids(e, "vec_id", "embedding", stride = 7)
    assert(cents.size >= 2 && cents.map(_._1) == cents.map(_._1).sorted)

    // 1. cell assignment is the true rounded-cosine argmax (relational twin)
    val c = e.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val assigned = c.select(col("vec_id"), Ann.ivfCell(col("v"), cents).as("cell"))
    val centDf = cents.map { case (cid, cv) => (cid, cv.toSeq) }.toDF("cid", "cv")
    val best = c.crossJoin(centDf)
      .select(col("vec_id"), col("cid"),
        round(Ann.cosine(col("v"), col("cv")), 6).as("cos"))
      .groupBy("vec_id")
      .agg(expr("min_by(cid, struct(-cos, cid))").as("want"))
    assert(assigned.join(best, "vec_id").filter(col("cell") =!= col("want")).count() == 0)

    // 2. probing EVERY cell makes IVF exhaustive: identical to brute force
    val q = e.filter(col("vec_id") < 3)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Long)] =
      df.select("query_id", "id", "cos", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val full = rows(Ann.ivfTopK(e, q, "vec_id", "embedding", cents, k = 5,
      nprobe = cents.size))
    val brute = rows(Ann.bruteForceTopK(e, q, "vec_id", "embedding", k = 5))
    assert(full === brute, "nprobe = C must degrade IVF to exact search")

    // 3. nprobe=2: hits are true cosines (subset of brute-force scoring)
    val probed = Ann.ivfTopK(e, q, "vec_id", "embedding", cents, k = 5, nprobe = 2)
    val bruteAll = rows(Ann.bruteForceTopK(e, q, "vec_id", "embedding", k = 20))
      .map(t => (t._1, t._2) -> t._3).toMap
    val hits = rows(probed)
    hits.foreach { case (qid, id, cos, _) =>
      assert(bruteAll.get((qid, id)).forall(_ == cos), s"cos mismatch for ($qid,$id)")
    }
    val recall = rows(probed).map(t => (t._1, t._2))
      .intersect(brute.map(t => (t._1, t._2))).size.toDouble / brute.size
    info(f"IVF nprobe=2/${cents.size} recall@5 on driver data: $recall%.3f")
    assert(recall >= 0.2, f"IVF recall collapsed: $recall%.3f")
  }

  test("ivf_cells codegen expression ≡ relational greatest/array_sort twins") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Ann.ivfCentroids(e, "vec_id", "embedding", stride = 7)
    val c = e.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val both = c.select(
      Ann.ivfCell(col("v"), cents).as("fast_cell"),
      Ann.ivfCellRelational(col("v"), cents).as("slow_cell"),
      Ann.ivfProbeCells(col("v"), cents, 3).as("fast_probes"),
      Ann.ivfProbeCellsRelational(col("v"), cents, 3).as("slow_probes"))
    assert(both.filter(col("fast_cell") =!= col("slow_cell") ||
      col("fast_probes") =!= col("slow_probes")).count() == 0)
    // malformed vectors: length mismatch and null element → empty cell
    // list (unassignable row), null scalar cell
    val edge = Seq(
      (1L, Seq(Option(1.0), Option(2.0))),
      (2L, Seq(Option(1.0), Option.empty[Double]) ++ Seq.fill(62)(Option(0.5))))
      .toDF("id", "v")
    val z = edge.select(
        Ann.ivfProbeCells(col("v"), cents, 2).as("p"),
        Ann.ivfCell(col("v"), cents).as("c"))
      .collect()
    assert(z.forall(r => r.getSeq[Long](0).isEmpty && r.isNullAt(1)))
  }

  test("planted near-identical vectors always collide (bucket-stable)") {
    val dim = 64
    val base = Array.tabulate(dim)(i => math.sin(i * 1.7).toFloat)
    val near = base.clone(); near(0) = near(0) + 1e-4f
    val far = Array.tabulate(dim)(i => math.cos(i * 2.3 + 1).toFloat)
    val e = Seq((1L, base), (2L, near), (3L, far)).toDF("vec_id", "embedding")
    val lsh = Ann.lshNearDupPairs(e, "vec_id", "embedding", dim, 0.99)
      .select("id_1", "id_2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === Set((1L, 2L)))
  }

  test("simhash 15-bit bands: every pair within hamming 3 is a candidate (pigeonhole)") {
    // two docs whose simhashes differ in <= 3 bits must surface as a pair
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "completely different words entirely unrelated content here now"))
      .toDF("doc_id", "text")
    val sims = Sim.simhash(docs, "doc_id", "text")
    val m = sims.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hamming12 = java.lang.Long.bitCount(m(1L) ^ m(2L))
    val pairs = Sim.simhashPairs(sims, maxHamming = Sim.SimhashBands - 1)
      .select("id_1", "id_2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    if (hamming12 <= Sim.SimhashBands - 1)
      assert(pairs.contains((1L, 2L)), s"hamming=$hamming12 pair must be guaranteed")
    // 60-bit width sanity: hash uses bits above 32
    assert(m.values.exists(v => (v >>> 32) != 0L), "simhash must span 60 bits")
  }

  test("ivfCentroids fails loud (not driver OOM) when the stride violates the C << n contract") {
    import org.apache.spark.sql.functions._
    val dense = spark.range(0, graft.sim.Ann.MaxCentroids + 10)
      .select(col("id").as("vec_id"),
        array(lit(1.0f), lit(0.0f)).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      graft.sim.Ann.ivfCentroids(dense, "vec_id", "embedding", stride = 1)
    }
    assert(e.getMessage.contains("C \u226a n") || e.getMessage.contains("driver-sized"),
      s"error must name the IVF contract: ${e.getMessage}")
    // the guard must not disturb a contract-respecting call
    val ok = graft.sim.Ann.ivfCentroids(dense, "vec_id", "embedding", stride = 4096)
    assert(ok.nonEmpty && ok.size <= graft.sim.Ann.MaxCentroids)
    assert(ok.map(_._1) == ok.map(_._1).sorted)
  }
}
