package graft

import graft.multimodal.Multimodal

/** Focused guards for the r06 audio-codec internals change: the WAVE
  * writer/reader providers are now resolved once per task through the
  * public `javax.sound.sampled.spi` ServiceLoader surface instead of
  * per row through AudioSystem's synchronized registry. The SPI path
  * must be byte- and value-identical to the AudioSystem path, and the
  * poison-blob discipline must survive the provider loop.
  */
class MultimodalAudioSpec extends SparkSpecBase {

  test("SPI-resolved WAVE writer produces byte-identical output to AudioSystem") {
    val w = Multimodal.wavWriterOpt()
    assert(w.nonEmpty, "JRE must expose a WAVE AudioFileWriter via ServiceLoader")
    for (d <- Seq(0L, 1L, 17L, 499L)) {
      val viaSpi = Multimodal.syntheticWav(d, w)
      val viaSystem = Multimodal.syntheticWav(d, None)
      assert(java.util.Arrays.equals(viaSpi, viaSystem),
        s"WAV bytes diverge between SPI writer and AudioSystem for d=$d")
    }
  }

  test("SPI reader loop decodes what AudioSystem decodes; poison blobs are skipped") {
    import spark.implicits._
    val readers = Multimodal.wavReaderSeq()
    assert(readers.nonEmpty, "JRE must expose AudioFileReaders via ServiceLoader")
    val good = Multimodal.syntheticWav(7L)
    val truncated = good.take(10) // RIFF header cut mid-way
    val garbage = Array.fill[Byte](64)(0x5a)
    val docs = spark.createDataset(Seq(
      Multimodal.WavDoc(7L, good),
      Multimodal.WavDoc(8L, truncated),
      Multimodal.WavDoc(9L, garbage)))
    val out = Multimodal.decodeAudioFeatures(spark, docs).collect()
    assert(out.map(_.doc_id).toSeq == Seq(7L), "only the valid WAV row survives")
    val f = out.head
    // decoded stats must equal the generating arithmetic (WAV is lossless)
    val n = Multimodal.syntheticSampleCount(7L)
    val samples = (0 until n).map(Multimodal.syntheticSample(7L, _))
    assert(f.n_samples == n && f.sample_rate == 8000)
    assert(f.sum_amp == samples.map(_.toLong).sum)
    assert(f.min_amp == samples.min && f.max_amp == samples.max)
  }
}
