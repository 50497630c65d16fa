package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed per-partition in batches.
  *
  * The decode step is STUBBED (this container ships no image/audio codecs):
  * `decodeStub` derives deterministic fake dimensions/features from the
  * payload bytes. Everything Spark-side — schema, typed Dataset,
  * mapPartitions batch shape, partition sizing — is real and tested
  * (MediaPipelineSpec). Swapping `decodeStub` for a JNI/codec call is the
  * only change needed for real media.
  */
object MediaPipeline {

  /** Input row: an opaque media payload + its typed metadata. */
  case class MediaRow(docId: Long, mediaType: String, payload: Array[Byte])

  /** Extracted features (fake, deterministic — see decodeStub). */
  case class MediaFeatures(
      docId: Long,
      mediaType: String,
      byteLen: Int,
      width: Int,
      height: Int,
      frameSample: Array[Byte],
      featureVec: Array[Float])

  /** Deterministic fake decode: "dimensions" from a byte rolling hash.
    * Replace with a real codec for production media. */
  def decodeStub(payload: Array[Byte]): (Int, Int) = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + (payload(i) & 0xff); i += 1 }
    val w = 64 + ((h & Long.MaxValue) % 1024).toInt
    val ht = 64 + (((h >>> 17) & Long.MaxValue) % 1024).toInt
    (w, ht)
  }

  /** "Frame sample": every k-th byte, up to 16 bytes — stands in for video
    * frame sampling; pure byte slicing, no codec needed. */
  def frameSample(payload: Array[Byte], k: Int = 8): Array[Byte] =
    payload.indices.collect { case i if i % k == 0 && i / k < 16 => payload(i) }.toArray

  /** "Resize": deterministic nearest-neighbor downsample of the payload to
    * `target` bytes — the structural stand-in for image resizing (same
    * in/out shape a real scaler has; swap for a codec-backed implementation
    * in production). */
  def resizeStub(payload: Array[Byte], target: Int): Array[Byte] =
    if (payload.isEmpty || target <= 0) Array.empty
    else Array.tabulate(math.min(target, payload.length)) { i =>
      payload((i.toLong * payload.length / math.min(target, payload.length)).toInt)
    }

  /** Fake feature extraction: 8 floats from byte-window sums. */
  def features(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    payload.indices.foreach(i => out(i % 8) += (payload(i) & 0xff) / 255.0f)
    out
  }

  /** Batch feature extraction with the mapPartitions shape a real decoder
    * needs (amortized per-partition init — e.g. a codec context). */
  def extract(rows: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // per-partition init would go here (codec context, model handle)
      it.map { r =>
        val (w, h) = decodeStub(r.payload)
        MediaFeatures(r.docId, r.mediaType, r.payload.length, w, h,
          frameSample(r.payload), features(r.payload))
      }
    }
  }

  /** Registry entry: documents' text bytes as stand-in payloads → scalar
    * feature projection (rows-only driver check; exactness in the spec). */
  def query(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows = graft.core.Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) => MediaRow(id, "text/fake", text.getBytes("UTF-8")) }
    extract(rows)
      .select(col("docId").as("doc_id"), col("byteLen").as("byte_len"),
        col("width"), col("height"),
        round(element_at(col("featureVec"), 1), 4).as("f0"))
      .orderBy("doc_id")
  }
}
