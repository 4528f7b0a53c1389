package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** X4 multimodal-column plumbing: media as opaque `binary` payloads with a
  * typed metadata struct, plus a partition-wise feature-extraction pass.
  *
  * The Spark-side shape is the real thing — schema, batching, partitioning
  * — while the media decode itself is STUBBED (this container ships no
  * image/audio codecs): [[StubDecoder]] is a deterministic fake standing in
  * for e.g. a JPEG decoder. Swapping in a real decoder changes only the
  * body of `decode`, nothing in the plan.
  *
  * Scale notes: payloads stay columnar (parquet binary) end to end; feature
  * extraction is `mapPartitions` so a real decoder amortizes per-partition
  * init (model load, codec context) across rows — the same batching
  * rationale as Arrow-batched pandas UDFs on the Python side.
  */
object Multimodal {

  /** A decoded media record: what a real decoder would yield. */
  final case class MediaFeatures(doc_id: Long, n_bytes: Int, feature0: Int, width: Int, height: Int)

  final case class Payload(doc_id: Long, payload: Array[Byte])

  /** STUB decoder — deterministic fake of a media decode. A real
    * implementation would parse the codec header; the fake derives "pixel"
    * stats from the raw bytes so tests are reproducible.
    */
  object StubDecoder {
    def decode(id: Long, bytes: Array[Byte]): MediaFeatures = {
      val first = if (bytes.nonEmpty) bytes(0) & 0xff else 0
      // fake dimensions a header parse would return
      val w = 1 + (bytes.length % 64)
      MediaFeatures(id, bytes.length, first, w, if (w == 0) 0 else bytes.length / w)
    }
  }

  /** Attach an opaque binary payload + metadata struct to each row —
    * the multimodal column pattern (media bytes + typed sidecar).
    * Here the payload is the UTF-8 text itself (no codecs in-container);
    * a real pipeline reads `binaryFile` sources or parquet binary columns.
    */
  def attachPayload(id: String, text: String)(df: DataFrame): DataFrame =
    df.select(
      col(id),
      col(text).cast("binary").as("payload"),
      struct(
        length(col(text)).as("n_bytes"),
        lit("text/plain").as("mime"),
        lit(1).as("frames")).as("meta"))

  /** Partition-wise feature extraction over the payload column. */
  def extractFeatures(spark: SparkSession, payloads: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[Payload]
      .mapPartitions { it =>
        // per-partition init of a real decoder/model would go here
        it.map(p => StubDecoder.decode(p.doc_id, p.payload))
      }
  }
}
