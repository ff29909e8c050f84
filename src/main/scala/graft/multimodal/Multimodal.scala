package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract
  * steps as partition-batched transforms.
  *
  * The actual media DECODE IS A STUB: this container has no image/audio
  * codecs, so [[fakeDecode]] produces a deterministic fake feature vector
  * from byte statistics. The Spark-side plumbing — schema, batching,
  * partition iteration, output shape — is real and tested; swapping
  * `fakeDecode` for a JNI/codec call is the only change needed for real
  * media.
  *
  * Scale design: `mapPartitions` (not per-row map) so a real decoder can
  * amortize init (model load / codec context) once per partition — the
  * Scala twin of `mapInPandas` batch semantics. Binary payloads never
  * shuffle; features are computed where the bytes live.
  */
object Multimodal {

  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      features: Array[Float])

  val FeatureDim = 8

  /** STUB decoder — deterministic byte-statistics "features" standing in
    * for a real image/audio decode (??? in the design sense: replace with
    * a codec). Keeps the batch shape and output schema honest.
    */
  def fakeDecode(bytes: Array[Byte], dim: Int = FeatureDim): Array[Float] = {
    val out = new Array[Float](dim)
    if (bytes == null || bytes.isEmpty) return out
    var i = 0
    while (i < bytes.length) {
      out(i % dim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    var d = 0
    while (d < dim) { out(d) = out(d) / bytes.length * dim; d += 1 }
    out
  }

  /** Partition-batched feature extraction over a binary column. */
  def extractFeatures(spark: SparkSession, df: DataFrame,
                      idCol: String, binCol: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real impl: init decoder/codec context HERE, once per partition
        it.map { case (id, bytes) =>
          MediaFeatures(id,
            if (bytes == null) 0L else bytes.length.toLong,
            fakeDecode(bytes))
        }
      }
  }

  /** Oracle-friendly metadata projection (no stubbed values): byte length
    * and a fixed-width head of the payload, decoded as UTF-8.
    */
  def metadata(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(
      col(idCol),
      length(col(binCol)).cast("long").as("n_bytes"),
      substring(decode(col(binCol), "UTF-8"), 1, 12).as("head"))
}
