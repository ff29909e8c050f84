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
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(d => PngDoc(d, syntheticPng(d))))
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
      // based extractor would init here once
      it.flatMap { doc =>
        val img =
          try ImageIO.read(new ByteArrayInputStream(doc.png))
          catch { case _: java.io.IOException => null }
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
    * length and a fixed-width head of the payload, decoded as UTF-8.
    */
  def metadata(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(
      col(idCol),
      length(col(binCol)).cast("long").as("n_bytes"),
      substring(decode(col(binCol), "UTF-8"), 1, 12).as("head"))
}
