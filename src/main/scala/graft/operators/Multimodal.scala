package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with a
  * typed metadata struct, batch-decoded on executors via `mapPartitions`
  * (the Scala analog of `mapInPandas` batches).
  *
  * The decode step is a DELIBERATE STUB — this container has no
  * image/audio codecs — producing deterministic fake features (byte
  * histogram). Everything around it is the real scale plumbing: payloads
  * never hit the driver, partitions stream through the decoder
  * iterator-to-iterator, and the output schema is a fixed-width feature
  * vector ready for the ANN operators.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, size_bytes: Long, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, media_type: String, size_bytes: Long, features: Array[Double])

  /** Synthesize a binary payload column + metadata from a text column
    * (stands in for reading real media blobs; deterministic).
    */
  def synthesizePayloads(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      // fake modality assignment, deterministic per doc
      element_at(array(lit("image"), lit("audio"), lit("video")), (pmod(col(idCol), lit(3)) + 1).cast("int"))
        .as("media_type"),
      octet_length(col(textCol)).cast("long").as("size_bytes"),
      encode(col(textCol), "UTF-8").as("payload")
    )

  private val Bins = 16

  /** STUB DECODER — a real implementation would decode the payload with
    * an image/audio library here, batched per partition. The fake is a
    * normalized 16-bin byte histogram: deterministic, shape-compatible
    * with real features.
    */
  private def decodeStub(payload: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](Bins)
    payload.foreach(b => hist((b & 0xff) / (256 / Bins)) += 1.0)
    val n = math.max(payload.length, 1)
    hist.map(_ / n)
  }

  final case class FrameFeatures(doc_id: Long, n_frames_total: Int, sampled_frames: Array[Int], frame_features: Array[Array[Double]])

  /** Frame sampling for "video" payloads: split the payload into
    * fixed-size frames, keep every `stride`-th frame, and extract
    * features per kept frame — the batch shape of a real video pipeline
    * (decode is the same STUB histogram; the sampling/batching plumbing
    * is the real part). Iterator-to-iterator on executors.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, frameBytes: Int, stride: Int): Dataset[FrameFeatures] = {
    import spark.implicits._
    require(frameBytes > 0 && stride > 0)
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val nFrames = math.max(1, (r.payload.length + frameBytes - 1) / frameBytes)
        val kept    = (0 until nFrames by stride).toArray
        val feats = kept.map { f =>
          val from = f * frameBytes
          val until = math.min(from + frameBytes, r.payload.length)
          decodeStub(java.util.Arrays.copyOfRange(r.payload, from, math.max(from + 1, until)))
        }
        FrameFeatures(r.doc_id, nFrames, kept, feats)
      }
    }
  }

  /** Batch feature extraction on executors; iterator-to-iterator, so a
    * partition never materializes in memory at once.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map(r => MediaFeatures(r.doc_id, r.media_type, r.size_bytes, decodeStub(r.payload)))
    }
  }
}
