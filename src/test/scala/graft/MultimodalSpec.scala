package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** X4 multimodal plumbing tests: payload attachment, stub decode,
  * frame-grid sampling over binary payloads.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("attachPayload produces binary payload + typed metadata struct") {
    val df = Seq((1L, "hello")).toDF("doc_id", "text")
    val out = Multimodal.attachPayload("doc_id", "text")(df)
    assert(out.schema("payload").dataType.typeName === "binary")
    val meta = out.select(col("meta.n_bytes"), col("meta.mime")).collect()(0)
    assert(meta.getInt(0) === 5)
    assert(meta.getString(1) === "text/plain")
  }

  test("sampleFrames lays a frame grid over BINARY payloads, keeps every k-th") {
    val df = Seq((1L, "abcdefghij")).toDF("doc_id", "text") // 10 bytes
    val payloads = Multimodal.attachPayload("doc_id", "text")(df)
    // frameSize=4 → 3 frames (ceil 10/4); everyK=2 keeps idx 0 and 2
    val out = Multimodal.sampleFrames(col("doc_id"), col("payload"), 4, 2)(payloads)
      .select(col("doc_id"), col("frame_idx"), col("frame").cast("string"))
    assert(rowsOf(out) === Set(Seq(1L, 0, "abcd"), Seq(1L, 2, "ij")))
  }

  test("sampleFrames emits nothing for empty payloads") {
    val df = Seq((1L, "")).toDF("doc_id", "text")
    val out = Multimodal.sampleFrames(col("doc_id"), col("text"), 4, 1)(df)
    assert(out.count() === 0)
  }

  test("stub decoder derives deterministic features from raw bytes") {
    val f = Multimodal.StubDecoder.decode(7L, "abc".getBytes("UTF-8"))
    assert(f === Multimodal.MediaFeatures(7L, 3, 'a'.toInt, 1 + 3 % 64, 3 / (1 + 3 % 64)))
    val empty = Multimodal.StubDecoder.decode(8L, Array.emptyByteArray)
    assert(empty.n_bytes === 0 && empty.feature0 === 0)
  }

  test("batched extraction equals row-at-a-time, across batch sizes and partitions") {
    val df = Seq.tabulate(23)(i => (i.toLong, s"payload number $i with body"))
      .toDF("doc_id", "text").repartition(3)
    val payloads = Multimodal.attachPayload("doc_id", "text")(df)
    val rowWise = rowsOf(Multimodal.extractFeatures(spark, payloads).toDF())
    for (bs <- Seq(1, 4, 64)) {
      val batched = Multimodal.extractFeaturesBatched(spark, payloads, bs)
      assert(rowsOf(batched.toDF()) === rowWise, s"batchSize=$bs diverged")
    }
    // the batch boundary itself, observed THROUGH the production path: a
    // counting decoder records, per row, the size of the batch it arrived
    // in — only full batches of 4 plus at most one ragged tail per
    // partition may reach the decoder
    val counting: Seq[Multimodal.Payload] => Seq[Multimodal.MediaFeatures] =
      batch => batch.map(p => Multimodal.MediaFeatures(p.doc_id, batch.size, 0, 0, 0))
    val seen = Multimodal.extractFeaturesBatched(spark, payloads, 4, counting)
      .collect().map(_.n_bytes).toSeq
    assert(seen.size === 23)
    assert(seen.forall(s => s >= 1 && s <= 4), seen.toString)
    // 3 partitions → at most 3 ragged tails; everything else full
    assert(seen.count(_ != 4) <= 3 * 3, seen.toString) // ≤3 tails × ≤3 rows each
  }
}
