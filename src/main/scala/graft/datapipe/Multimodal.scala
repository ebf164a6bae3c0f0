package graft.datapipe

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns + typed metadata, processed in partition-sized batches.
  *
  * The decode step is STUBBED (no image/audio libraries in this
  * container): [[FakeDecoder]] is a deterministic stand-in with the same
  * signature a real (JNI/Pandas-UDF-style) decoder would have. Everything
  * around it — schema, batch iteration shape, partition-level processing,
  * metadata propagation — is real Spark plumbing: a `mapPartitions` over
  * a typed Dataset, the Scala analogue of `mapInPandas` (batched rows in,
  * batched rows out, arbitrary native code inside).
  *
  * At 100 TB: binaries ride in parquet with large row groups; decode is
  * partition-parallel with no shuffle; `spark.sql.files.maxPartitionBytes`
  * sizes decode batches to executor memory.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  final case class DecodedRow(doc_id: Long, media_type: String,
                              byte_len: Long, width: Int, height: Int,
                              n_frames: Int, feature: Array[Float])

  /** STUB decoder — deterministic fake standing in for libjpeg/ffmpeg.
    * Real implementation would parse `payload`; the fake derives metadata
    * from the byte stream so the pipeline is testable end-to-end.
    */
  object FakeDecoder {
    def decode(r: MediaRow): DecodedRow = {
      val len = if (r.payload == null) 0L else r.payload.length.toLong
      val checksum = if (r.payload == null) 0 else r.payload.foldLeft(0)((a, b) => (a * 31 + b) & 0x7FFFFFFF)
      DecodedRow(
        doc_id = r.doc_id,
        media_type = r.media_type,
        byte_len = len,
        width = 64 + (checksum % 512),
        height = 64 + ((checksum / 512) % 512),
        n_frames = if (r.media_type == "video") 1 + (checksum % 30) else 1,
        // 4-dim fake feature from byte statistics (a real extractor would
        // run the model here, batched per partition)
        feature = Array(len.toFloat, (checksum % 256).toFloat,
          ((checksum / 256) % 256).toFloat, (checksum % 7).toFloat))
    }
  }

  /** Wrap text docs as fake media rows (payload = utf-8 bytes) — the
    * testdata has no real binaries; the shape is what matters.
    */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Partition-batched decode: the mapInPandas-shaped stage. */
  def decodeAll(spark: SparkSession, media: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map(FakeDecoder.decode))
  }
}
