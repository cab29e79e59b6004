package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: images/audio/video ride through the engine as
  * opaque `binary` columns with a typed metadata struct; decode and feature
  * extraction run batched per partition.
  *
  * The codec step is pluggable ([[MediaCodec]]): [[ImageIoCodec]] is a REAL
  * decoder — JDK-only `javax.imageio` (PNG/JPEG/GIF/BMP), no external
  * dependency — and [[StubCodec]] keeps the deterministic fake-pixel path
  * for synthetic payloads (the `documents`-derived media fixtures are text
  * bytes, not encoded images). Audio/video codecs are not in the JDK; they
  * drop into the same interface (a JNI/javacv call behind `decode`).
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

  /** The decode contract: payload bytes → (actual width, actual height,
    * row-major intensities in [0, 1]). Serializable so an instance can ride
    * into a mapPartitions closure; implementations needing native handles
    * should lazy-init them per partition (see [[extractFeatures]]).
    */
  trait MediaCodec extends Serializable {
    def decode(payload: Array[Byte], declaredW: Int, declaredH: Int): (Int, Int, Array[Double])
  }

  /** Deterministic fake-pixel decoder for synthetic payloads (text bytes
    * posing as media): intensities derived from the raw bytes, dimensions
    * taken from the declared metadata.
    */
  object StubCodec extends MediaCodec {
    override def decode(payload: Array[Byte], w: Int, h: Int): (Int, Int, Array[Double]) =
      (w, h, decodeStub(payload, w, h))
  }

  /** REAL image decoder on the JDK's `javax.imageio` (PNG/JPEG/GIF/BMP —
    * zero external dependencies). Dimensions come from the decoded image,
    * not the declared metadata; intensities are ITU-R BT.601 luma of the
    * sRGB pixels, row-major, in [0, 1]. Fails loudly on undecodable bytes
    * rather than returning fake pixels.
    */
  object ImageIoCodec extends MediaCodec {
    override def decode(payload: Array[Byte], declaredW: Int, declaredH: Int): (Int, Int, Array[Double]) = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, s"ImageIoCodec: payload (${payload.length} bytes) is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      // one bulk getRGB per image, not one virtual call + ColorModel
      // conversion per pixel — several times faster on megapixel inputs
      val rgbs = img.getRGB(0, 0, w, h, null, 0, w)
      val out = new Array[Double](w * h)
      var i = 0
      while (i < out.length) {
        val rgb = rgbs(i)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        out(i) = (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
        i += 1
      }
      (w, h, out)
    }
  }

  /** Re-encode an image payload at new dimensions (bilinear-ish smooth
    * scale, PNG out) — the real counterpart of q_multimodal_resize's
    * metadata-cost planning. JDK-only; runs inside mapPartitions on
    * executors, payload in → payload out, nothing touches the driver.
    */
  def resizePng(payload: Array[Byte], newW: Int, newH: Int): Array[Byte] = {
    require(newW > 0 && newH > 0, s"bad resize target ${newW}x$newH")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, s"resizePng: payload (${payload.length} bytes) is not a decodable image")
    val scaled = img.getScaledInstance(newW, newH, java.awt.Image.SCALE_SMOOTH)
    val out = new java.awt.image.BufferedImage(newW, newH,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try g.drawImage(scaled, 0, 0, null) finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  /** STUB decoder body: deterministic fake pixel intensities from raw bytes
    * (kept for synthetic fixtures; [[ImageIoCodec]] is the real path).
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

  /** Batched feature extraction: decode → mean intensity, resize dims,
    * frame-sample offsets. One decoder context per partition (the
    * mapPartitions contract production decoders need), payload dropped on
    * output. Output width/height are the DECODED dimensions halved (for
    * StubCodec these equal the declared metadata, preserving the oracle
    * contract of q_multimodal_meta/frames).
    */
  def extractFeatures(media: Dataset[MediaRow], frameEvery: Int = 1024,
      codec: MediaCodec = StubCodec): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (e.g. native lib handle)
      rows.map { r =>
        val (w, h, pixels) = codec.decode(r.payload, r.width, r.height)
        val mean = if (pixels.isEmpty) 0.0 else pixels.sum / pixels.length
        val offsets = 0L.until(r.payload.length.toLong, frameEvery.toLong)
        MediaFeatures(r.media_id, r.payload.length.toLong, r.format,
          mean, w / 2, h / 2, offsets)
      }
    }
  }
}
