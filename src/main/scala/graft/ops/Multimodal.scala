package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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

    /** Batch form — a real implementation would stack the payloads into
      * one tensor and run the model once per batch; the stub decodes
      * element-wise so both paths provably agree.
      */
    def decodeBatch(batch: Seq[Payload]): Seq[MediaFeatures] =
      batch.map(p => decode(p.doc_id, p.payload))
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

  /** X4 frame sampling WITHOUT decode: lay a fixed-size frame grid over an
    * opaque payload column (binary or string — `substr` handles both) and
    * keep every `everyK`-th frame. This is the Spark-side plumbing of
    * video/audio frame sampling: the grid, the stride and the row shape
    * are real; a codec would only change how `frame` bytes are produced.
    * All plain codegen'd expressions — the payload is sliced, never
    * decoded, and column pruning upstream is unaffected (no opaque
    * lambda boundary).
    */
  def sampleFrames(id: Column, payload: Column, frameSize: Int, everyK: Int)(
      df: DataFrame): DataFrame = {
    require(frameSize > 0 && everyK > 0, "frameSize and everyK must be positive")
    val nFrames = ceil(length(payload) / lit(frameSize.toDouble)).cast("int")
    df.select(id.as("doc_id"), payload.as("__p"), nFrames.as("__n"))
      .filter(col("__n") > 0)
      .select(col("doc_id"), col("__p"),
        explode(sequence(lit(0), col("__n") - 1)).as("frame_idx"))
      .filter(col("frame_idx") % everyK === 0)
      .select(col("doc_id"), col("frame_idx"),
        col("__p").substr(col("frame_idx") * frameSize + 1, lit(frameSize)).as("frame"))
  }

  /** Partition-wise feature extraction over the payload column. */
  def extractFeatures(spark: SparkSession, payloads: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    // NULL payloads are dropped, not decoded: a record with no media
    // bytes is malformed input, and the contract is the serde's
    // drop-on-malformed (KafkaStreamsApp.scala:64-70) — same rationale
    // as [[graft.ops.Similarity.wellFormedVec]]. A zero-LENGTH payload
    // is kept (an empty file is decodable metadata, unlike a missing one).
    payloads.select(col("doc_id"), col("payload"))
      .filter(col("payload").isNotNull).as[Payload]
      .mapPartitions { it =>
        // per-partition init of a real decoder/model would go here
        it.map(p => StubDecoder.decode(p.doc_id, p.payload))
      }
  }

  /** BATCHED feature extraction — the Arrow-batch shape of `mapInPandas`
    * expressed on the JVM side: rows stream through the partition in
    * fixed-size batches, and the decoder sees a whole batch at once (a
    * real media model wants batched tensors, not row-at-a-time calls —
    * batch size trades GPU utilization against executor memory). Every
    * batch is full except possibly the last of each partition;
    * `it.grouped` is lazy, so a partition never materializes more than
    * one batch beyond the iterator's own buffering.
    */
  def extractFeaturesBatched(spark: SparkSession, payloads: DataFrame,
      batchSize: Int,
      decodeBatch: Seq[Payload] => Seq[MediaFeatures] = StubDecoder.decodeBatch)
      : Dataset[MediaFeatures] = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    import spark.implicits._
    // NULL payloads dropped — see [[extractFeatures]]
    payloads.select(col("doc_id"), col("payload"))
      .filter(col("payload").isNotNull).as[Payload]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(decodeBatch)
      }
  }
}
