package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed partition-wise.
  *
  * The image codec is REAL — pure-JVM `javax.imageio` (PNG lossless,
  * JPEG accepted on decode by magic-byte sniffing). All codec calls run
  * inside `mapPartitions` (the Scala analogue of mapInPandas: one iterator
  * per partition, batch-shaped, no per-row task overhead, native/library
  * calls allowed) so the same plumbing carries a JNI video decoder or an
  * audio resampler unchanged.
  *
  * Test media are deterministic synthetic grayscale PNGs generated from
  * `doc_id` alone (dims and every pixel are closed-form functions of the
  * id), so a SQL oracle can verify the full decode → features → resize
  * pipeline value-exactly without shipping image files.
  */
object Multimodal {

  // ImageIO's default ImageInputStream/ImageOutputStream cache is DISK-
  // backed: every decode/encode call creates (and deletes) a temp file.
  // For many small in-memory payloads that file round-trip dominates the
  // codec itself; the in-memory cache is value-identical. Set once per JVM
  // — executors initialize it on first use of this object from a task
  // closure.
  ImageIO.setUseCache(false)

  /** Spread codec work across the cluster when the source layout
    * under-supplies partitions (a single small parquet file reads as ONE
    * partition — every ImageIO call would run on one core). Keyed on
    * doc_id (uniform); well-partitioned inputs pass through untouched.
    */
  private def parallelized(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.queryExecution.toRdd.getNumPartitions >= math.max(want / 2, 2)) df
    else df.repartition(want, col("doc_id"))
  }

  // ── deterministic synthetic media (generation side) ─────────────────────
  /** Synthetic image dims for a doc id: w ∈ [4,32], h ∈ [3,25]. */
  def synthDims(id: Long): (Int, Int) =
    (4 + math.floorMod(id, 29).toInt, 3 + math.floorMod(id * 7, 23).toInt)

  /** Synthetic gray pixel at (x, y) of doc `id`: (x + y·w + id) mod 256. */
  def synthPx(id: Long, w: Int, x: Int, y: Int): Int =
    math.floorMod(x + y.toLong * w + id, 256).toInt

  /** Deterministic grayscale PNG for a doc id — REAL ImageIO encode. */
  def synthPng(id: Long): Array[Byte] = {
    val (w, h) = synthDims(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, synthPx(id, w, x, y)); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Media table of synthetic PNGs keyed by the documents' ids: binary
    * payload + format tag. Encoding runs partition-batched — the shape a
    * real ingest uses for any per-blob codec work.
    */
  def pngMediaFromDocs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    parallelized(docs.select(col("doc_id"))).as[Long]
      .mapPartitions(it => it.map(id => (id, synthPng(id), "image/png")))
      .toDF("doc_id", "media", "format")
  }

  /** Media table from raw document text bytes (byte-level ops — length
    * stats, frame chunking; NOT image-decodable).
    */
  def mediaFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      lit("fake/raw").as("format"))

  // ── byte-level features (no codec) ──────────────────────────────────────
  final case class ByteStats(doc_id: Long, n_bytes: Int, histogram: Array[Long])

  /** Byte-level stats over any media column, partition-batched. */
  def byteStats(media: DataFrame): Dataset[ByteStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val hist = new Array[Long](16)
          bytes.foreach(b => hist((b & 0xff) / 16) += 1)
          ByteStats(id, bytes.length, hist)
        }
      }
  }

  /** Frame sampling: treat the payload as a "video" of fixed-size chunks
    * (`frameBytes` each) and emit every `stride`-th chunk as a frame row —
    * the explode-shaped plumbing a real video pipeline uses (one input row →
    * many frame rows, schema (doc_id, frame_idx, frame_bytes, n_bytes)).
    * Pure Column expressions (sequence + transform + explode): codegen'd,
    * partition-parallel, and exactly reproducible for the oracle. A real
    * decoder swaps the `substring` slice for a codec call inside
    * mapPartitions (see [[decodeFeatures]] for that shape).
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

  // ── real image decode (javax.imageio) ───────────────────────────────────
  final case class ImageFeatures(
      doc_id: Long, width: Int, height: Int, channels: Int, n_bytes: Int,
      px_sum: Long, histogram: Array[Long])

  /** Decode one image payload (PNG/JPEG/… — ImageIO sniffs magic bytes). */
  def decodeImage(bytes: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null)
      throw new IllegalArgumentException(
        s"undecodable image payload (${bytes.length} bytes)")
    img
  }

  /** Feature extraction with a REAL decode: dims, channel count, gray
    * (band-0) pixel sum and a 16-bin band-0 histogram. Partition-batched —
    * one codec context per partition iterator, arbitrary native calls
    * allowed inside, no per-row task overhead.
    */
  def decodeFeatures(media: DataFrame): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = decodeImage(bytes)
          val raster = img.getRaster
          val (w, h) = (img.getWidth, img.getHeight)
          val hist = new Array[Long](16)
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = raster.getSample(x, y, 0)
              sum += v; hist(v / 16) += 1; x += 1
            }
            y += 1
          }
          ImageFeatures(id, w, h, raster.getNumBands, bytes.length, sum, hist)
        }
      }
  }

  /** Nearest-neighbour resize with a REAL decode/encode round trip:
    * decode → sample src pixel (x·srcW/outW, y·srcH/outH) per output
    * pixel → re-encode PNG. NN sampling is done explicitly (not via
    * Graphics2D) so the resampling rule is exact integer arithmetic a SQL
    * oracle can replay; the codec work on both sides is real ImageIO.
    */
  def resizeNN(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    require(outW > 0 && outH > 0, "resize dims must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val src = decodeImage(bytes)
          val (sw, sh) = (src.getWidth, src.getHeight)
          val out = new BufferedImage(outW, outH, BufferedImage.TYPE_BYTE_GRAY)
          val sr = src.getRaster
          val or = out.getRaster
          var y = 0
          while (y < outH) {
            val sy = (y.toLong * sh / outH).toInt
            var x = 0
            while (x < outW) {
              val sx = (x.toLong * sw / outW).toInt
              or.setSample(x, y, 0, sr.getSample(sx, sy, 0))
              x += 1
            }
            y += 1
          }
          val bos = new ByteArrayOutputStream()
          ImageIO.write(out, "png", bos)
          (id, bos.toByteArray, "image/png")
        }
      }
      .toDF("doc_id", "media", "format")
  }
}
