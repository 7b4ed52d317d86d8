package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media
  * payloads ride as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extraction runs per-partition so a real
  * codec library would be initialized once per task, not per row.
  *
  * The actual byte decoding is a STUB — image/audio codecs are not in
  * this environment — replaced by a deterministic fake that derives
  * plausible metadata from the byte stream. Everything around it
  * (schema, partitioning, batch iteration, frame-sampling shape) is
  * real Spark plumbing a codec drop-in would inherit unchanged.
  */
object Multimodal {

  /** Typed metadata carried next to every payload. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType), StructField("width", IntegerType),
    StructField("height", IntegerType), StructField("n_bytes", LongType)))

  /** Wrap a text/binary source as (id, payload) media rows. */
  def attachPayload(df: DataFrame, idCol: String,
                    contentCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      encode(col(contentCol).cast("string"), "UTF-8").as("payload"))

  /** STUB decoder — deterministic fake standing in for an image codec.
    * A real implementation would replace `fakeDecode` with e.g. a JNI
    * JPEG decode; the mapPartitions batching, output schema, and
    * per-task amortization are what matters to the pipeline.
    */
  private def fakeDecode(payload: Array[Byte]): (String, Int, Int, Long) = {
    val n = payload.length
    // ??? real codec goes here; fake derives metadata from content
    val fmt = if (n % 3 == 0) "jpeg" else if (n % 3 == 1) "png" else "webp"
    val width = 16 + (n % 640)
    val height = 16 + ((n / 7) % 480)
    (fmt, width, height, n.toLong)
  }

  private val PngMagic: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def isPng(p: Array[Byte]): Boolean =
    p.length >= 8 && java.util.Arrays.equals(p, 0, 8, PngMagic, 0, 8)

  // JPEG SOI marker + third magic byte
  private def isJpeg(p: Array[Byte]): Boolean =
    p.length >= 3 && p(0) == 0xFF.toByte && p(1) == 0xD8.toByte &&
      p(2) == 0xFF.toByte

  /** Magic-sniffed format for the REAL decode path, None → stub. */
  private def sniff(p: Array[Byte]): Option[String] =
    if (isPng(p)) Some("png")
    else if (isJpeg(p)) Some("jpeg")
    else None

  /** REAL decode path for PNG/JPEG payloads via the JDK's
    * `javax.imageio` (no external codec needed). Unreadable bytes fall
    * through to the stub rather than failing the pipeline — a corrupt
    * payload in a 100 TB corpus must not kill the job.
    */
  private def imageioDecode(fmt: String, payload: Array[Byte])
      : (String, Int, Int, Long) = {
    val img = try {
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    } catch { case _: java.io.IOException => null }
    if (img == null) fakeDecode(payload)
    else (fmt, img.getWidth, img.getHeight, payload.length.toLong)
  }

  private val DecodedSchema = StructType(
    StructField("media_id", LongType) +: MediaMetaSchema.fields.toSeq)

  /** Decode payloads per-partition into the typed metadata schema.
    * PNG and JPEG payloads (magic-sniffed) take the real
    * `javax.imageio` path; other formats use the documented stub.
    */
  def decodeMeta(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(DecodedSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      // per-task codec init would happen here, once (ImageIO's plugin
      // registry is JVM-global and lazily initialized on first read)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val (fmt, w, h, n) = sniff(payload) match {
          case Some(f) => imageioDecode(f, payload)
          case None => fakeDecode(payload)
        }
        Row(r.getLong(0), fmt, w, h, n)
      }
    }(enc)
  }

  private val ResizedSchema = StructType(Seq(
    StructField("media_id", LongType), StructField("format", StringType),
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("payload", BinaryType)))

  /** REAL image resize (PNG/JPEG via JDK imageio + Graphics2D): scale
    * every decodable payload to fit within `maxDim` (aspect
    * preserved), re-encoded as PNG — the thumbnailing/normalization
    * step of an image training pipeline. Per-partition shape matches
    * [[decodeMeta]]; undecodable payloads pass through unchanged with
    * their original bytes and (-1, -1) dims so a corrupt row never
    * kills the job and downstream can quarantine on the sentinel.
    */
  def resizeImages(media: DataFrame, maxDim: Int): DataFrame = {
    require(maxDim > 0, s"maxDim must be positive: $maxDim")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(ResizedSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val img = sniff(payload) match {
          case Some(_) =>
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload))
            catch { case _: java.io.IOException => null }
          case None => null
        }
        if (img == null) Row(r.getLong(0), "passthrough", -1, -1, payload)
        else {
          val scale = math.min(1.0,
            maxDim.toDouble / math.max(img.getWidth, img.getHeight))
          val (w, h) = (math.max(1, (img.getWidth * scale).round.toInt),
            math.max(1, (img.getHeight * scale).round.toInt))
          val out = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Row(r.getLong(0), "png", w, h, bos.toByteArray)
        }
      }
    }(enc)
  }

  private val FeatureSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("mean_r", DoubleType), StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType),
    StructField("luminance", DoubleType)))

  /** REAL per-image feature extraction (mean RGB + BT.601 luminance)
    * for decodable payloads — the cheap-feature stage before an
    * embedding model (filter black frames, near-constant images,
    * thumbnails). Undecodable payloads yield nulls, not failures.
    */
  def imageFeatures(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(FeatureSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val img = sniff(payload) match {
          case Some(_) =>
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload))
            catch { case _: java.io.IOException => null }
          case None => null
        }
        if (img == null) Row(r.getLong(0), null, null, null, null)
        else {
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF
              sb += rgb & 0xFF
              x += 1
            }
            y += 1
          }
          val n = img.getWidth.toLong * img.getHeight
          val (mr, mg, mb) =
            (sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
          Row(r.getLong(0), mr, mg, mb,
            0.299 * mr + 0.587 * mg + 0.114 * mb)
        }
      }
    }(enc)
  }

  /** Frame-sampling shape: emit every `step`-th synthetic frame index
    * per media row (a video decoder would emit real frame payloads).
    * posexplode keeps (media, frame_no) lineage for downstream joins.
    */
  def sampleFrames(media: DataFrame, nFrames: Int, step: Int): DataFrame =
    media.select(col("media_id"),
        posexplode(sequence(lit(0), lit(nFrames - 1), lit(step)))
          .as(Seq("pos", "frame_no")))
      .select(col("media_id"), col("frame_no").cast("long").as("frame_no"))
}
