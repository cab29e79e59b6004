package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: images/audio/video ride through the engine as
  * opaque `binary` columns with a typed metadata struct; decode and feature
  * extraction run batched per partition.
  *
  * The actual codec step is STUBBED (this environment has no image/audio
  * libraries): `decodeStub` derives deterministic fake "pixels" from the
  * bytes. Everything around it — schema, batching, partitioning, the
  * mapPartitions contract — is the real plumbing a production decoder drops
  * into (swap `decodeStub` for an actual JNI/javacv call).
  *
  * Scale notes: media blobs make rows wide, so feature extraction uses
  * mapPartitions (one decoder init per partition, not per row) and the
  * output drops the payload (features only) to keep the shuffle thin.
  * Partition sizing: with ~1 MB blobs, keep
  * spark.sql.files.maxPartitionBytes at its 128 MB default → ~128 rows per
  * task; never collect media columns to the driver.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata (the schema contract). */
  case class MediaRow(
      media_id: Long,
      payload: Array[Byte],
      format: String,
      width: Int,
      height: Int)

  case class MediaFeatures(
      media_id: Long,
      n_bytes: Long,
      format: String,
      mean_intensity: Double,
      resized_w: Int,
      resized_h: Int,
      frame_offsets: Seq[Long])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Synthesize a media table from any (id, text) source — deterministic
    * fake payloads for pipeline tests.
    */
  def syntheticMediaTable(spark: SparkSession, src: DataFrame,
      idCol: String, textCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    src.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"),
      lit("fakeimg").as("format"),
      (pmod(col(idCol), lit(64)) + 32).cast("int").as("width"),
      (pmod(col(idCol), lit(48)) + 24).cast("int").as("height"))
      .as[MediaRow]
  }

  /** STUB decoder: deterministic fake pixel intensities from raw bytes.
    * A real build replaces this with an image library call; the signature
    * (bytes → row-major intensities) is what such a decoder provides.
    */
  private[ops] def decodeStub(payload: Array[Byte], w: Int, h: Int): Array[Double] = {
    val out = new Array[Double](w * h)
    var i = 0
    while (i < out.length) {
      val b = if (payload.length > 0) payload(i % payload.length) & 0xff else 0
      out(i) = b / 255.0
      i += 1
    }
    out
  }

  /** Batched feature extraction: decode → mean intensity, resize-stub dims,
    * frame-sample offsets. One decoder context per partition (the
    * mapPartitions contract production decoders need), payload dropped on
    * output.
    */
  def extractFeatures(media: Dataset[MediaRow], frameEvery: Int = 1024): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (e.g. native lib handle)
      rows.map { r =>
        val pixels = decodeStub(r.payload, r.width, r.height)
        val mean = if (pixels.isEmpty) 0.0 else pixels.sum / pixels.length
        val offsets = 0L.until(r.payload.length.toLong, frameEvery.toLong)
        MediaFeatures(r.media_id, r.payload.length.toLong, r.format,
          mean, r.width / 2, r.height / 2, offsets)
      }
    }
  }
}
