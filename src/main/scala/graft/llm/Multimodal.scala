package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for a training-data pipeline.
  *
  * Media travel as opaque `binary` columns with typed metadata alongside;
  * decode / feature-extraction runs per partition in bounded batches so a
  * 100 TB corpus streams through executors without materializing more than
  * one batch of decoded media per task. The actual codec is NOT available
  * in this environment, so `decodeStub` derives a deterministic fake
  * feature vector from the bytes — the Spark-side contract (schema,
  * batching, partitioning) is real and tested; swap `decodeStub` for a
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

  /** Feature extraction over the binary column, partition-streamed. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeStub))
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
