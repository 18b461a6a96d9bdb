package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for a training-data pipeline.
  *
  * Media travel as opaque `binary` columns with typed metadata alongside;
  * decode / feature-extraction runs per partition in bounded batches so a
  * 100 TB corpus streams through executors without materializing more than
  * one batch of decoded media per task. Image payloads decode for REAL via
  * `javax.imageio` (PNG/JPEG/BMP/GIF — the JDK's built-in codecs);
  * non-image media (audio/video, whose codecs are not in this
  * environment) fall back to `decodeStub`, a clearly-marked deterministic
  * fake keeping the schema/batch contract identical — swap it for a
  * JNI/codec call in production.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String)
  case class MediaFeatures(doc_id: Long, n_bytes: Int, checksum: String,
      width: Int, height: Int, features: Array[Float])

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("checksum", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType), nullable = false)))

  /** STUB decode — deterministic fake standing in for an image/audio codec.
    * Real implementation would decode `payload` and pool pixel/sample data.
    */
  private[llm] def decodeStub(r: MediaRow): MediaFeatures = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(r.payload)
    val hex = digest.map("%02x".format(_)).mkString
    val w = 16 + (digest(0) & 0x3f) // fake dimensions from content bytes
    val h = 16 + (digest(1) & 0x3f)
    val feats = Array.tabulate(8)(i => (digest(i) & 0xff) / 255.0f)
    MediaFeatures(r.doc_id, r.payload.length, hex, w, h, feats)
  }

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  /** Shared guarded decode: None for anything ImageIO can't read. */
  private def readImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case _: Exception => None }

  /** REAL image decode via the JDK's ImageIO. Features: mean luminance of 8
    * equal-width vertical bands, in [0, 1] — a deterministic, resolution-
    * independent content summary (the classic cheap perceptual signature).
    * Returns None when the payload is not a decodable image.
    */
  private[llm] def decodeImage(r: MediaRow): Option[MediaFeatures] =
    readImage(r.payload).map { img =>
      val w = img.getWidth
      val h = img.getHeight
      val sums = new Array[Double](8)
      val counts = new Array[Long](8)
      var x = 0
      while (x < w) {
        val band = math.min(7, x * 8 / w)
        var y = 0
        while (y < h) {
          val rgb = img.getRGB(x, y)
          val luma = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / (3.0 * 255.0)
          sums(band) += luma
          counts(band) += 1
          y += 1
        }
        x += 1
      }
      val feats = Array.tabulate(8)(i =>
        if (counts(i) == 0) 0f else (sums(i) / counts(i)).toFloat)
      MediaFeatures(r.doc_id, r.payload.length, md5Hex(r.payload), w, h, feats)
    }

  /** Decode dispatch: real ImageIO for image payloads, stub otherwise. */
  private[llm] def decode(r: MediaRow): MediaFeatures =
    if (r.mime.startsWith("image/")) decodeImage(r).getOrElse(decodeStub(r))
    else decodeStub(r)

  /** Feature extraction over the binary column, partition-streamed. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decode))
  }

  /** REAL image resize: decode with ImageIO, scale to (w, h) with bilinear
    * interpolation, re-encode as PNG. Non-image payloads pass through
    * unchanged. Same mapPartitions streaming shape as the stubs.
    */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val resized =
        if (!r.mime.startsWith("image/")) None
        else readImage(r.payload).map { img =>
          val out = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
          g.dispose()
          val buf = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", buf)
          r.copy(payload = buf.toByteArray, mime = "image/png")
        }
      resized.getOrElse(r)
    })
  }

  /** STUB resize — a real implementation decodes, scales to (w, h) and
    * re-encodes; the stub deterministically truncates/pads the payload to
    * the target byte budget so the batch shape (binary in → binary out,
    * bounded size) is exercised end-to-end.
    */
  def resizeStub(media: Dataset[MediaRow], targetBytes: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val out = java.util.Arrays.copyOf(r.payload, targetBytes)
      r.copy(payload = out)
    })
  }

  /** STUB frame sampling — a real implementation demuxes video and emits
    * one row per sampled frame; the stub slices the payload into
    * `frames` deterministic chunks. One input row fans out to `frames`
    * rows, the shape that matters for downstream partition sizing.
    */
  case class FrameRow(doc_id: Long, frame_idx: Int, payload: Array[Byte])

  def sampleFramesStub(media: Dataset[MediaRow], frames: Int): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val n = math.max(1, r.payload.length / frames)
      (0 until frames).iterator.map { i =>
        val from = math.min(i * n, r.payload.length)
        val to = math.min(from + n, r.payload.length)
        FrameRow(r.doc_id, i, java.util.Arrays.copyOfRange(r.payload, from, to))
      }
    }
  }

  /** Wrap a text/bytes table into the media shape (fixture path: the test
    * corpus has no real media, so payload = utf-8 bytes).
    */
  def fromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text").cast(BinaryType).as("payload"),
        lit("text/plain").as("mime"))
      .as[MediaRow]
  }
}
