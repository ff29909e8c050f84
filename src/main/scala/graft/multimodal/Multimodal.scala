package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column support: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode and feature-extraction
  * run as partition-batched transforms over the bytes.
  *
  * The image decode is REAL: `javax.imageio` (PNG/JPEG/BMP/GIF codecs
  * ship in every JDK, headless-safe) decodes the payload to pixels and
  * the features (dimensions, per-channel sums) are computed from the
  * DECODED image. Test/bench images are generated deterministically
  * ([[syntheticPng]]: pure mod-arithmetic pixels, PNG-encoded), so the
  * decoded features have a closed-form arithmetic oracle — PNG is
  * lossless, hence decode(encode(pattern)) == pattern on every engine.
  *
  * Scale design: `mapPartitions` (not per-row map) so decoder state and
  * scratch buffers amortize per partition — the Scala twin of
  * `mapInPandas` batch semantics. Binary payloads never shuffle: decode
  * and feature extraction happen where the bytes live, and only the slim
  * feature rows move on.
  */
object Multimodal {

  final case class PngDoc(doc_id: Long, png: Array[Byte])

  /** Decoded-image features: dimensions + exact per-channel pixel sums
    * (integers, so the oracle comparison is exact — no float rounding).
    */
  final case class ImageFeatures(
      doc_id: Long,
      width: Int,
      height: Int,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long)

  /** Deterministic pixel pattern for doc `d` (mirrored by the DuckDB
    * oracle in TrainingQueries — keep in lockstep):
    *   width  = 8 + d % 9, height = 8 + d % 7,
    *   r(x,y) = (d*31 + x*7  + y*13) % 256
    *   g(x,y) = (d*17 + x*11 + y*3 ) % 256
    *   b(x,y) = (d*29 + x*5  + y*19) % 256
    */
  def syntheticPixel(d: Long, x: Int, y: Int): (Int, Int, Int) = (
    ((d * 31 + x * 7 + y * 13) % 256).toInt,
    ((d * 17 + x * 11 + y * 3) % 256).toInt,
    ((d * 29 + x * 5 + y * 19) % 256).toInt)

  def syntheticDims(d: Long): (Int, Int) = ((8 + d % 9).toInt, (8 + d % 7).toInt)

  /** PNG-encode the deterministic pattern for one doc id. */
  def syntheticPng(d: Long): Array[Byte] = {
    val (w, h) = syntheticDims(d)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = syntheticPixel(d, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Attach a deterministic PNG payload per row — the ingest stand-in
    * for crawl media (generated executor-side, never on the driver).
    */
  def withSyntheticPng(spark: SparkSession, df: DataFrame,
                       idCol: String): Dataset[PngDoc] = {
    import spark.implicits._
    // Scan.spread: encode+decode dominate this pipeline and fuse into
    // the scan stage; the driver's one-row-group parquet cannot split,
    // so without the spread all codec work runs on one core (guide
    // §2.5). The shuffled rows are bare ids — the blobs are generated
    // AFTER the exchange, so the spread moves 8 bytes/row, not media.
    graft.io.Scan.spread(df.select(col(idCol).cast("long"))).as[Long]
      .mapPartitions { it =>
        // default ImageIO behavior routes every stream through a disk
        // cache temp file — per-row filesystem traffic; keep it in memory
        ImageIO.setUseCache(false)
        it.map(d => PngDoc(d, syntheticPng(d)))
      }
  }

  /** REAL image decode + feature extraction over a binary PNG/JPEG/BMP/
    * GIF column: `ImageIO.read` the bytes, then per-channel pixel sums
    * from the decoded raster. Rows whose payload fails to decode are
    * skipped (collect-violations discipline: a poison blob must not kill
    * the partition; callers wanting the error rows anti-join on doc_id).
    */
  def decodeImageFeatures(spark: SparkSession, docs: Dataset[PngDoc]): Dataset[ImageFeatures] = {
    import spark.implicits._
    docs.mapPartitions { it =>
      // per-partition scope: ImageIO caches codec lookups; a real model-
      // based extractor would init here once. Disable the disk-backed
      // stream cache (temp file create/delete per row otherwise).
      ImageIO.setUseCache(false)
      it.flatMap { doc =>
        // NonFatal, not just IOException: the imageio codecs throw
        // unchecked exceptions (IllegalArgument, AIOOBE, CMMException)
        // on truncated/hostile bytes — any of them is a poison blob
        val img =
          try ImageIO.read(new ByteArrayInputStream(doc.png))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xff
              sg += (rgb >> 8) & 0xff
              sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          Some(ImageFeatures(doc.doc_id, w, h, sr, sg, sb))
        }
      }
    }
  }

  /** Oracle-friendly metadata projection over any binary column: byte
    * length and a fixed-width HEX head of the payload. Byte-level on
    * purpose: decoding arbitrary media bytes as UTF-8 THROWS under
    * Spark 4's default ANSI coding-error behavior (PNG magic 0x89 is
    * malformed UTF-8) — a metadata pass over a binary column must never
    * die on the very bytes it describes (poison-blob discipline).
    */
  def metadata(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(
      col(idCol),
      length(col(binCol)).cast("long").as("n_bytes"),
      substring(hex(col(binCol)), 1, 24).as("head_hex"))

  // ---------- audio: WAV (RIFF/PCM) via javax.sound.sampled ----------

  final case class WavDoc(doc_id: Long, wav: Array[Byte])

  /** Decoded-audio features — all integers, so the oracle is exact. */
  final case class AudioFeatures(
      doc_id: Long,
      n_samples: Int,
      sample_rate: Int,
      sum_amp: Long,
      min_amp: Int,
      max_amp: Int)

  /** Deterministic 16-bit PCM pattern (mirrored by the DuckDB oracle in
    * TrainingQueries — keep in lockstep):
    *   n(d)      = 64 + d % 64 samples, mono, 8000 Hz
    *   amp(d, i) = ((d*73 + i*31 + (i*i % 997) * 7) % 65536) - 32768
    */
  def syntheticSampleCount(d: Long): Int = (64 + d % 64).toInt

  def syntheticSample(d: Long, i: Int): Int = {
    val il = i.toLong
    ((d * 73 + il * 31 + (il * il % 997) * 7) % 65536 - 32768).toInt
  }

  /** WAVE SPI providers resolved once per TASK through the public
    * `javax.sound.sampled.spi` ServiceLoader surface. The static
    * `AudioSystem.write` / `getAudioInputStream` entry points route
    * EVERY call through the JDK's provider registry, whose lookup holds
    * one global monitor per call — 32 concurrent codec tasks convoy on
    * that lock (measured r06: the naively-parallelized pipeline ran
    * ~2.5x SLOWER than single-task). Hoisting the lookup out of the row
    * loop is the guide's "initialise heavyweight state once per task"
    * rule (§4.5); the located providers are the SAME classes
    * AudioSystem selects, so the bytes are identical. Fallback to the
    * AudioSystem path when the loader finds none (exotic JRE).
    */
  private[graft] def wavWriterOpt(): Option[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator().asScala
      .find(_.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
  }

  private[graft] def wavReaderSeq(): Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.toSeq
  }

  /** WAV-encode the deterministic PCM pattern for one doc id through the
    * real `javax.sound.sampled` WAVE writer (RIFF container, LE PCM).
    */
  def syntheticWav(d: Long): Array[Byte] = syntheticWav(d, wavWriterOpt())

  private[graft] def syntheticWav(
      d: Long, writer: Option[javax.sound.sampled.spi.AudioFileWriter]): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val n = syntheticSampleCount(d)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = syntheticSample(d, i)
      pcm(i * 2) = (s & 0xff).toByte
      pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false) // 16-bit signed LE mono
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    writer match {
      case Some(w) => w.write(ais, AudioFileFormat.Type.WAVE, bos)
      case None => AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    }
    bos.toByteArray
  }

  def withSyntheticWav(spark: SparkSession, df: DataFrame,
                       idCol: String): Dataset[WavDoc] = {
    import spark.implicits._
    // NOT spread (unlike the PNG/Y4M twins): even with the WAVE
    // writer/reader providers hoisted to once-per-task (the SPI path
    // below), the javax.sound write path still serializes internally —
    // measured r06, every parallel variant of this pipeline ran 1.5-2.5x
    // SLOWER than the single-task one. The provider hoist is kept (it is
    // correct §4.5 hygiene and byte-identical, MultimodalAudioSpec), the
    // parallelism is not.
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        val w = wavWriterOpt() // once per task, not per row (guide §4.5)
        it.map(d => WavDoc(d, syntheticWav(d, w)))
      }
  }

  /** REAL audio decode over a binary WAV column: `AudioSystem` parses the
    * RIFF container and exposes the PCM format; amplitude stats come from
    * the decoded samples. Same partition-batched shape and poison-blob
    * discipline as [[decodeImageFeatures]].
    */
  def decodeAudioFeatures(spark: SparkSession, docs: Dataset[WavDoc]): Dataset[AudioFeatures] = {
    import spark.implicits._
    import javax.sound.sampled.{AudioSystem, UnsupportedAudioFileException}
    docs.mapPartitions { it =>
      // readers resolved once per task (guide §4.5) — AudioSystem's
      // static entry point takes the synchronized registry lock per call
      val readers = wavReaderSeq()
      it.flatMap { doc =>
        try {
          // provider loop mirrors AudioSystem.getAudioInputStream: try
          // each reader, UnsupportedAudioFileException means "not mine";
          // a fresh ByteArrayInputStream per attempt replaces its
          // mark/reset discipline
          var ais: javax.sound.sampled.AudioInputStream = null
          if (readers.isEmpty)
            ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(doc.wav))
          else {
            val rit = readers.iterator
            while (ais == null && rit.hasNext) {
              val r = rit.next()
              try ais = r.getAudioInputStream(new ByteArrayInputStream(doc.wav))
              catch { case _: UnsupportedAudioFileException => () }
            }
            if (ais == null) throw new UnsupportedAudioFileException(
              "no provider recognized the stream")
          }
          val fmt = ais.getFormat
          val bytes = ais.readAllBytes()
          ais.close()
          if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 || fmt.isBigEndian) None
          else {
            val n = bytes.length / 2
            var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
            var i = 0
            while (i < n) {
              val s = ((bytes(i * 2 + 1) << 8) | (bytes(i * 2) & 0xff)).toShort.toInt
              sum += s
              if (s < mn) mn = s
              if (s > mx) mx = s
              i += 1
            }
            Some(AudioFeatures(doc.doc_id, n, fmt.getSampleRate.toInt, sum, mn, mx))
          }
        } catch {
          // NonFatal: the RIFF parser can throw unchecked exceptions on
          // hostile headers, not only UnsupportedAudioFile/IOException
          case scala.util.control.NonFatal(_) => None
        }
      }
    }
  }

  // ---------- video: YUV4MPEG2 (uncompressed), hand-parsed ----------

  final case class Y4mDoc(doc_id: Long, y4m: Array[Byte])

  /** Frame-sampled video features: container dims + frame count, the
    * number of sampled frames, and the exact luma sum over sampled
    * frames.
    */
  final case class VideoFeatures(
      doc_id: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      n_sampled: Int,
      sum_y: Long)

  /** Deterministic YUV420 pattern (DuckDB-mirrored):
    *   width  = 16 + (d%5)*2, height = 8 + (d%4)*2, frames = 6 + d%5
    *   Y(d,f,x,y) = (d*19 + f*83 + x*3 + y*11) % 256
    * (chroma planes are filled but not feature-extracted).
    */
  def syntheticVideoDims(d: Long): (Int, Int, Int) =
    ((16 + (d % 5) * 2).toInt, (8 + (d % 4) * 2).toInt, (6 + d % 5).toInt)

  def syntheticLuma(d: Long, f: Int, x: Int, y: Int): Int =
    ((d * 19 + f * 83 + x * 3 + y * 11) % 256).toInt

  /** Encode the deterministic pattern as a real YUV4MPEG2 stream — the
    * standard uncompressed interchange container (`YUV4MPEG2 W.. H.. F..`
    * header, then `FRAME` + planar 4:2:0 payload per frame). Raw video
    * is the honest sandbox stand-in for codec output: compressed-codec
    * decode (H.264 etc.) has no pure-JDK decoder, but the container
    * plumbing — header parse, frame stride, plane slicing, sampling — is
    * identical and is what the engine owns.
    */
  def syntheticY4m(d: Long): Array[Byte] = {
    val (w, h, nf) = syntheticVideoDims(d)
    val bos = new ByteArrayOutputStream()
    bos.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII"))
    val cw = w / 2; val ch = h / 2
    var f = 0
    while (f < nf) {
      bos.write("FRAME\n".getBytes("US-ASCII"))
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { bos.write(syntheticLuma(d, f, x, y)); x += 1 }
        y += 1
      }
      var p = 0 // U then V plane, quarter resolution
      while (p < 2) {
        var cy = 0
        while (cy < ch) {
          var cx = 0
          while (cx < cw) {
            bos.write(((d * (7 + p * 4) + f * 5 + cx * 13 + cy * 17) % 256).toInt)
            cx += 1
          }
          cy += 1
        }
        p += 1
      }
      f += 1
    }
    bos.toByteArray
  }

  def withSyntheticY4m(spark: SparkSession, df: DataFrame,
                       idCol: String): Dataset[Y4mDoc] = {
    import spark.implicits._
    // Scan.spread: same unsplittable-input mitigation as withSyntheticPng
    graft.io.Scan.spread(df.select(col(idCol).cast("long"))).as[Long]
      .mapPartitions(_.map(d => Y4mDoc(d, syntheticY4m(d))))
  }

  /** Parse a YUV4MPEG2 stream and sample every `step`-th frame (f = 0,
    * step, 2·step, …), summing the luma plane of sampled frames. Real
    * byte-level container parsing: stream header tokens, per-frame
    * `FRAME` markers (with optional parameters), planar 4:2:0 strides.
    * Malformed payloads are skipped (poison-blob discipline).
    */
  def decodeVideoFeatures(spark: SparkSession, docs: Dataset[Y4mDoc],
                          step: Int = 2): Dataset[VideoFeatures] = {
    import spark.implicits._
    require(step >= 1, s"frame-sampling step must be >= 1, got $step")
    docs.mapPartitions { it =>
      it.flatMap { doc =>
        try decodeOneY4m(doc, step)
        // NonFatal: non-numeric W/H tokens etc. are poison blobs, not
        // task killers
        catch { case scala.util.control.NonFatal(_) => None }
      }
    }
  }

  private def decodeOneY4m(doc: Y4mDoc, step: Int): Option[VideoFeatures] = {
    val b = doc.y4m
        val hEnd = b.indexOf('\n'.toByte)
        if (hEnd < 0) None
        else {
          val header = new String(b, 0, hEnd, "US-ASCII")
          val toks = header.split(' ')
          if (toks.head != "YUV4MPEG2") None
          else {
            val w = toks.collectFirst { case t if t.startsWith("W") => t.tail.toInt }
            val h = toks.collectFirst { case t if t.startsWith("H") => t.tail.toInt }
            (w, h) match {
              case (Some(w), Some(h)) if w > 0 && h > 0 =>
                val frameBytes = w * h + 2 * ((w / 2) * (h / 2))
                var pos = hEnd + 1
                var f = 0; var sampled = 0; var sumY = 0L; var bad = false
                while (!bad && pos < b.length) {
                  // FRAME marker line (may carry parameters up to '\n')
                  val mEnd = b.indexOf('\n'.toByte, pos)
                  if (mEnd < 0 || !new String(b, pos, mEnd - pos, "US-ASCII").startsWith("FRAME") ||
                      mEnd + 1 + frameBytes > b.length) bad = true
                  else {
                    if (f % step == 0) {
                      sampled += 1
                      var i = mEnd + 1
                      val yEnd = mEnd + 1 + w * h
                      while (i < yEnd) { sumY += b(i) & 0xff; i += 1 }
                    }
                    pos = mEnd + 1 + frameBytes
                    f += 1
                  }
                }
                if (bad) None else Some(VideoFeatures(doc.doc_id, w, h, f, sampled, sumY))
              case _ => None
            }
          }
        }
  }
}
