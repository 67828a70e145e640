package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed partition-wise.
  *
  * The decode step is a STUB (this container ships no codec libraries): a
  * deterministic fake derives dimensions from the byte content. Everything
  * around it — schema, binary column handling, partition-batched execution,
  * feature output shape — is real and spec-tested; swapping `decodeStub` for
  * a JNI/javacv decoder changes no plumbing.
  */
object Multimodal {

  final case class MediaFeatures(
      doc_id: Long, width: Int, height: Int, n_bytes: Int,
      histogram: Array[Long])

  /** Media table: binary payload + format tag (here faked from `documents`
    * text bytes; in production this is the raw image/audio blob column).
    */
  def mediaFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      lit("fake/raw").as("format"))

  /** STUB decoder — deterministic fake standing in for a real image codec.
    * Pure function of the bytes so results are reproducible cluster-wide.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int) = {
    val h = java.util.Arrays.hashCode(bytes)
    (math.abs(h % 640) + 1, math.abs((h / 640) % 480) + 1)
  }

  /** Frame sampling: treat the payload as a "video" of fixed-size chunks
    * (`frameBytes` each) and emit every `stride`-th chunk as a frame row —
    * the explode-shaped plumbing a real video pipeline uses (one input row →
    * many frame rows, schema (doc_id, frame_idx, frame_bytes, n_bytes)).
    * Pure Column expressions (sequence + transform + explode): codegen'd,
    * partition-parallel, and exactly reproducible for the oracle. A real
    * decoder swaps the `substring` slice for a codec call inside
    * mapPartitions (see [[extractFeatures]] for that shape).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 256,
      stride: Int = 4): DataFrame = {
    val nChunks = ceil(length(col("media")).cast("double") / frameBytes)
      .cast("int")
    val idxs = sequence(lit(0),
      greatest(floor((nChunks - 1) / lit(stride)).cast("int"), lit(0)))
    media
      .select(col("doc_id"), col("media"), explode(idxs).as("k"))
      .select(col("doc_id"),
        (col("k") * stride).as("frame_idx"),
        col("media").substr(col("k") * stride * frameBytes + 1,
          lit(frameBytes)).as("frame_bytes"))
      .withColumn("n_bytes", octet_length(col("frame_bytes")))
  }

  /** Resize stub: deterministic fake resize — output dims are the requested
    * box, payload becomes a content-derived thumbnail-sized blob (first
    * `w*h/64` bytes). Plumbing (binary→binary, metadata columns) is real;
    * a decoder/encoder pair replaces the slice in production.
    */
  def resizeStub(media: DataFrame, w: Int, h: Int): DataFrame =
    media.select(col("doc_id"),
      lit(w).as("width"), lit(h).as("height"),
      substring(col("media"), 1, math.max(w * h / 64, 1)).as("media"))

  /** Feature extraction over the media column, partition-batched (the Scala
    * analogue of mapInPandas: one iterator per partition, no per-row task
    * overhead, arbitrary native calls allowed inside).
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (w, h) = decodeStub(bytes)
          val hist = new Array[Long](16)
          bytes.foreach(b => hist((b & 0xff) / 16) += 1)
          MediaFeatures(id, w, h, bytes.length, hist)
        }
      }
  }
}
