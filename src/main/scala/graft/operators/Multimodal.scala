package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing — harness north-star (BASELINE.json):
  * image/audio/video as opaque `binary` payloads with typed metadata.
  *
  * The Spark-side mechanics are real and tested: typed Dataset of
  * media records, `mapPartitions` batch processing (the Scala analogue
  * of mapInPandas — one decoder instantiation per partition, streaming
  * iterator, no per-row setup), deterministic chunk/frame explosion.
  * The actual media *decode* is stubbed behind [[MediaDecoder]]: the
  * container ships no image/audio libs, so [[FakeDecoder]] computes
  * deterministic byte-level features instead. Swapping in a real JNI/
  * javacv decoder changes one constructor, none of the plumbing.
  */
object Multimodal {

  /** One media object: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String,
      payload: Array[Byte],
      width: Int,
      height: Int)

  /** Per-payload features; produced partition-batched. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Long,
      first_byte: Long,
      n_chunks: Long)

  /** One sampled frame/chunk of a payload. */
  final case class MediaChunk(
      media_id: Long,
      chunk_idx: Long,
      chunk: Array[Byte])

  /** Decoder contract. A real implementation would wrap e.g. libjpeg /
    * ffmpeg bindings; none ship in this container. */
  trait MediaDecoder extends Serializable {
    def features(r: MediaRecord): MediaFeatures
  }

  /** Deterministic stand-in decoder (STUB): byte-level stats only.
    * Real decode is intentionally unimplemented here. */
  final class FakeDecoder(chunkSize: Int) extends MediaDecoder {
    override def features(r: MediaRecord): MediaFeatures =
      MediaFeatures(
        media_id = r.media_id,
        kind = r.kind,
        byte_len = r.payload.length.toLong,
        first_byte = if (r.payload.isEmpty) -1L else (r.payload(0) & 0xff).toLong,
        n_chunks = ((r.payload.length + chunkSize - 1) / chunkSize).toLong)
    // A real decoder would add: def decodeImage(r: MediaRecord): ??? = ???
  }

  /** Build a media table from the documents table: payload = UTF-8 bytes
    * of the text (deterministic stand-in for image/audio blobs). */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      lit("text/plain").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      lit(0).as("width"),
      lit(0).as("height")).as[MediaRecord]
  }

  /** Batch feature extraction: one decoder per partition, streamed.
    * This is the shape that scales — decoder init is amortized across
    * the partition and rows never buffer on the driver. */
  def extractFeatures(
      media: Dataset[MediaRecord],
      decoder: MediaDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it => it.map(decoder.features) }
  }

  /** Deterministic frame/chunk sampling: fixed-size payload slices,
    * exploded to one row per chunk (video frame-sample stand-in). */
  def sampleChunks(media: Dataset[MediaRecord], chunkSize: Int): Dataset[MediaChunk] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.payload.grouped(chunkSize).zipWithIndex.map { case (bytes, i) =>
        MediaChunk(r.media_id, i.toLong, bytes)
      }
    }
  }
}
