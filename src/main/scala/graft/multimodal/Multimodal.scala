package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media
  * payloads ride as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extraction runs per-partition so a real
  * codec library would be initialized once per task, not per row.
  *
  * Metadata extraction is honest per format: PNG/JPEG decode through
  * the JDK's `javax.imageio` (true pixel dimensions); RIFF/WAV and
  * ISO-BMFF (`ftyp`) payloads are probed by parsing their public
  * container headers (sample rate / channels from the WAV fmt chunk,
  * brand from the ftyp box); anything unsniffable reports
  * `format='unknown'` with null media fields — never fabricated
  * values. Full audio/video FRAME decoding still needs an external
  * codec (not in this environment); the frame-sampling shape below is
  * the plumbing such a codec would drop into.
  */
object Multimodal {

  /** Typed metadata carried next to every payload. Image fields
    * (width/height) are null for non-image media; audio fields
    * (sample_rate/channels) are null for images; all four are null
    * when the payload is unsniffable.
    */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType), StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType), StructField("n_bytes", LongType)))

  /** Wrap a text/binary source as (id, payload) media rows. */
  def attachPayload(df: DataFrame, idCol: String,
                    contentCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      encode(col(contentCol).cast("string"), "UTF-8").as("payload"))

  private def ascii(p: Array[Byte], off: Int, n: Int): String =
    new String(p, off, n, java.nio.charset.StandardCharsets.US_ASCII)

  private def u16le(p: Array[Byte], i: Int): Int =
    (p(i) & 0xFF) | ((p(i + 1) & 0xFF) << 8)

  private def u32le(p: Array[Byte], i: Int): Long =
    u16le(p, i).toLong | (u16le(p, i + 2).toLong << 16)

  private def u32be(p: Array[Byte], i: Int): Long =
    ((p(i) & 0xFFL) << 24) | ((p(i + 1) & 0xFFL) << 16) |
      ((p(i + 2) & 0xFFL) << 8) | (p(i + 3) & 0xFFL)

  /** RIFF/WAV header probe (public format, RIFF 1991 spec): verifies
    * the RIFF/WAVE signature, then walks the word-aligned chunk list
    * to the `fmt ` chunk and returns (sampleRate, channels). None when
    * the container structure is absent or truncated — a payload whose
    * metadata can't actually be read reports nothing.
    */
  private def probeWav(p: Array[Byte]): Option[(Int, Int)] = {
    if (p.length < 12 || ascii(p, 0, 4) != "RIFF" ||
      ascii(p, 8, 4) != "WAVE") return None
    var off = 12
    while (off + 8 <= p.length) {
      val id = ascii(p, off, 4)
      val size = u32le(p, off + 4)
      if (id == "fmt ")
        return if (size >= 16 && off + 8 + 8 <= p.length)
          Some((u32le(p, off + 12).toInt, u16le(p, off + 10))) else None
      if (size < 0 || size > p.length) return None
      off += 8 + size.toInt + (size.toInt & 1)
    }
    None
  }

  /** ISO-BMFF (MP4-family) header probe: a leading `ftyp` box whose
    * declared big-endian size is self-consistent with the payload.
    * Returns the format derived from the major brand (`M4A ` → m4a,
    * anything else in the family → mp4). None when the box structure
    * doesn't hold.
    */
  private def probeBmff(p: Array[Byte]): Option[String] = {
    if (p.length < 12 || ascii(p, 4, 4) != "ftyp") return None
    val size = u32be(p, 0)
    if (size < 12 || size > p.length) return None
    val brand = ascii(p, 8, 4)
    if (!brand.forall(c => c >= ' ' && c < 127)) return None
    Some(if (brand.toLowerCase.startsWith("m4a")) "m4a" else "mp4")
  }

  private def beBytes(v: Int): Array[Byte] = Array(
    ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
    ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def leBytes(v: Int, n: Int): Array[Byte] =
    (0 until n).map(i => ((v >> (8 * i)) & 0xFF).toByte).toArray

  private def a(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Deterministic 44-byte PCM WAV header (44.1 kHz stereo 16-bit,
    * zero-length data chunk) — a real, spec-conformant container for
    * gates and specs to probe; byte-stable across engines and JDKs.
    */
  val WavFixture: Array[Byte] =
    a("RIFF") ++ leBytes(36, 4) ++ a("WAVE") ++
      a("fmt ") ++ leBytes(16, 4) ++ leBytes(1, 2) ++ leBytes(2, 2) ++
      leBytes(44100, 4) ++ leBytes(176400, 4) ++ leBytes(4, 2) ++
      leBytes(16, 2) ++ a("data") ++ leBytes(0, 4)

  /** Deterministic 20-byte ISO-BMFF `ftyp` box (brand isom) — the
    * minimal honest MP4-family container header.
    */
  val FtypFixture: Array[Byte] =
    beBytes(20) ++ a("ftyp") ++ a("isom") ++ beBytes(0) ++ a("mp42")

  private val PngMagic: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def isPng(p: Array[Byte]): Boolean =
    p.length >= 8 && java.util.Arrays.equals(p, 0, 8, PngMagic, 0, 8)

  // JPEG SOI marker + third magic byte
  private def isJpeg(p: Array[Byte]): Boolean =
    p.length >= 3 && p(0) == 0xFF.toByte && p(1) == 0xD8.toByte &&
      p(2) == 0xFF.toByte

  /** Magic-sniffed format for the REAL decode path, None → stub.
    * Null-safe: a null payload sniffs as nothing, so every decode
    * entry point degrades to its unknown/passthrough row instead of
    * NPE-killing the task (the corrupt-row contract).
    */
  private def sniff(p: Array[Byte]): Option[String] =
    if (p == null) None
    else if (isPng(p)) Some("png")
    else if (isJpeg(p)) Some("jpeg")
    else None

  private val DecodedSchema = StructType(
    StructField("media_id", LongType) +: MediaMetaSchema.fields.toSeq)

  /** Decode payloads per-partition into the typed metadata schema.
    * PNG/JPEG (magic-sniffed) decode via `javax.imageio` for true
    * pixel dimensions — a payload that declares an image format but
    * won't decode keeps its sniffed format with null dimensions (a
    * corrupt row in a 100 TB corpus must not kill the job). WAV and
    * ISO-BMFF metadata comes from their parsed container headers;
    * everything else is `format='unknown'` with null media fields.
    */
  def decodeMeta(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(DecodedSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      // per-task codec init would happen here, once (ImageIO's plugin
      // registry is JVM-global and lazily initialized on first read)
      rows.map { r =>
        val p = r.getAs[Array[Byte]]("payload")
        // a null payload (e.g. encode() of a null document) is a data
        // defect, not a task killer: unknown format, null n_bytes
        val n: Any = if (p == null) null else p.length.toLong
        val meta: Seq[Any] = if (p == null)
          Seq("unknown", null, null, null, null, n)
        else sniff(p) match {
          case Some(fmt) =>
            val img = try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(p))
            catch { case _: java.io.IOException => null }
            if (img == null) Seq(fmt, null, null, null, null, n)
            else Seq(fmt, img.getWidth, img.getHeight, null, null, n)
          case None => probeWav(p) match {
            case Some((rate, ch)) => Seq("wav", null, null, rate, ch, n)
            case None => probeBmff(p) match {
              case Some(fmt) => Seq(fmt, null, null, null, null, n)
              case None => Seq("unknown", null, null, null, null, n)
            }
          }
        }
        Row.fromSeq(r.getLong(0) +: meta)
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
    * [[decodeFrames]] is the payload-bearing form of this shape, with
    * the decoder injected as a [[FrameCodec]].
    */
  def sampleFrames(media: DataFrame, nFrames: Int, step: Int): DataFrame =
    media.select(col("media_id"),
        posexplode(sequence(lit(0), lit(nFrames - 1), lit(step)))
          .as(Seq("pos", "frame_no")))
      .select(col("media_id"), col("frame_no").cast("long").as("frame_no"))

  /** The injected media-codec seam — the multimodal twin of
    * [[graft.pipeline.Fetch.fetchNew]]'s `(list, fetch)` transport
    * injection: `(payload, maxFrames) → frames`. A real video/audio
    * decoder (not in this environment) drops in here exactly as
    * [[graft.pipeline.HttpTransport]] drops into `Fetch`; the engine
    * owns everything around the seam — schema, per-partition
    * execution, frame lineage, step sampling — and those parts are
    * real and tested. Implementations must return at most `maxFrames`
    * frames, Nil for an undecodable (or null) payload, and must be
    * serializable (they ship to executors).
    */
  type FrameCodec = (Array[Byte], Int) => Seq[Array[Byte]]

  /** The shipped default codec: a decodable PNG/JPEG payload is a
    * one-frame medium — the frame is the image re-encoded as PNG via
    * the same `javax.imageio` path as [[resizeImages]]. Anything
    * unsniffable or undecodable yields no frames.
    */
  val imageFrameCodec: FrameCodec = (payload, maxFrames) => {
    // check the frame budget BEFORE decoding: maxFrames = 0 must not
    // pay the ImageIO decode just to return Nil
    val img = if (maxFrames < 1) null
    else sniff(payload) match {
      case Some(_) =>
        try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        catch { case _: java.io.IOException => null }
      case None => null
    }
    if (img == null) Nil
    else {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      Seq(bos.toByteArray)
    }
  }

  /** Real audio codec through the seam: RIFF/WAVE PCM, parsed from
    * the public chunk layout (`"RIFF" sz "WAVE"` then `id sz body`
    * chunks, all sizes little-endian, chunks word-aligned so odd
    * sizes pad one byte). The `fmt ` chunk must declare PCM
    * (audioFormat 1); its blockAlign (bytes per sample-frame across
    * channels) sets the hop, and the `data` section is framed into
    * `samplesPerFrame`-sample windows — the fixed-duration framing
    * every audio feature extractor starts from. The trailing partial
    * window is kept (standard hop behavior). A `data` size of
    * 0xFFFFFFFF, or one that overruns the payload, means "rest of
    * payload" (the streaming-writer convention). Anything else —
    * truncated header, non-PCM, compressed, missing fmt — yields no
    * frames, per the [[FrameCodec]] contract.
    */
  def wavPcmFrameCodec(samplesPerFrame: Int): FrameCodec = {
    require(samplesPerFrame >= 1,
      s"samplesPerFrame must be >= 1: $samplesPerFrame")
    (p, maxFrames) => {
      def le32(o: Int): Long = (p(o) & 0xffL) | ((p(o + 1) & 0xffL) << 8) |
        ((p(o + 2) & 0xffL) << 16) | ((p(o + 3) & 0xffL) << 24)
      def le16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
      def id4(o: Int): String = new String(p, o, 4, "US-ASCII")
      if (p == null || maxFrames < 1 || p.length < 12 ||
        id4(0) != "RIFF" || id4(8) != "WAVE") Nil
      else {
        // ALL offset arithmetic in Long: chunk sizes are unsigned
        // 32-bit, and a malformed/adversarial size near 2^32 must
        // reject as Nil, not wrap to a negative/steady offset and
        // spin the task forever or index out of bounds
        var off = 12L
        var blockAlign = -1
        var frames: Seq[Array[Byte]] = Nil
        var done = false
        while (!done && off + 8 <= p.length) {
          val sz = le32(off.toInt + 4)
          val body = off + 8
          id4(off.toInt) match {
            // the chunk's own declared size must cover the 16 PCM fmt
            // bytes too — a short fmt chunk would otherwise read
            // audioFormat/blockAlign out of the NEXT chunk's header
            case "fmt " if sz >= 16 && body + 16 <= p.length &&
                le16(body.toInt) == 1 =>
              blockAlign = le16(body.toInt + 12)
            case "fmt " => done = true // truncated, short, or non-PCM
            case "data" =>
              done = true
              if (blockAlign >= 1) {
                val end =
                  if (sz == 0xffffffffL || body + sz > p.length)
                    p.length
                  else (body + sz).toInt
                frames = p.slice(body.toInt, end)
                  .grouped(samplesPerFrame * blockAlign)
                  .take(maxFrames).toSeq
              }
            case _ => () // LIST/fact/cue/... chunks skip
          }
          if (!done) {
            val next = body + sz + (sz & 1L)
            // a non-data chunk that extends past the payload (or the
            // 0xFFFFFFFF streaming sentinel) cannot be skipped over —
            // no data section is reachable, so the payload rejects
            if (next > p.length) done = true else off = next
          }
        }
        frames
      }
    }
  }

  /** Minimal spec-conformant AVI (RIFF) muxer: one video stream whose
    * frames land as `00dc` chunks inside the `movi` LIST, preceded by
    * an `hdrl` LIST carrying the 56-byte `avih` main header
    * (totalFrames/streams/width/height filled, rest zero). Odd-sized
    * chunk bodies pad one byte per the RIFF word-alignment rule.
    * Deterministic bytes for fixed input — fixture-grade, and a real
    * container: an MJPEG AVI is exactly this with JPEG frame bodies.
    */
  def aviMux(frames: Seq[Array[Byte]], width: Int = 0,
             height: Int = 0): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      a(id) ++ leBytes(body.length, 4) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray)
    val avih =
      leBytes(40000, 4) ++ leBytes(0, 4) ++ leBytes(0, 4) ++
        leBytes(0x10, 4) ++ leBytes(frames.size, 4) ++ leBytes(0, 4) ++
        leBytes(1, 4) ++ leBytes(0, 4) ++ leBytes(width, 4) ++
        leBytes(height, 4) ++ leBytes(0, 4) ++ leBytes(0, 4) ++
        leBytes(0, 4) ++ leBytes(0, 4)
    val hdrl = a("hdrl") ++ chunk("avih", avih)
    val movi = a("movi") ++
      frames.iterator.flatMap(f => chunk("00dc", f)).toArray
    val lists = chunk("LIST", hdrl) ++ chunk("LIST", movi)
    a("RIFF") ++ leBytes(lists.length + 4, 4) ++ a("AVI ") ++ lists
  }

  /** Real video-container codec through the seam: AVI (RIFF) demux.
    * Walks the public chunk layout (`"RIFF" sz "AVI "` then `id sz
    * body` word-aligned chunks), finds the `movi` LIST, and collects
    * the video-stream frame chunks — ids `NNdc` (compressed) / `NNdb`
    * (uncompressed), any stream number — recursing into the optional
    * `rec ` grouping LISTs interleaved AVIs use. Returns each chunk
    * body verbatim: for an MJPEG AVI every body is a complete JPEG,
    * so [[imageFrameCodec]]'s ImageIO path (or [[decodeMeta]])
    * decodes the sampled frames downstream — demux and pixel decode
    * stay separate stages, the way a real video pipeline composes.
    * Same adversarial hardening as [[wavPcmFrameCodec]]: all offset
    * arithmetic in Long (unsigned 32-bit sizes near 2^32 must reject,
    * not wrap), a chunk overrunning its enclosure stops the walk,
    * audio/index/header chunks skip, truncated or non-AVI payloads
    * yield no frames, and the frame budget stops the scan early.
    */
  val aviFrameCodec: FrameCodec = (p, maxFrames) => {
    def le32(o: Int): Long = (p(o) & 0xffL) | ((p(o + 1) & 0xffL) << 8) |
      ((p(o + 2) & 0xffL) << 16) | ((p(o + 3) & 0xffL) << 24)
    def id4(o: Int): String = new String(p, o, 4, "US-ASCII")
    if (p == null || maxFrames < 1 || p.length < 12 ||
      id4(0) != "RIFF" || id4(8) != "AVI ") Nil
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def isVideoChunk(id: String): Boolean =
        id.length == 4 && id(0) >= '0' && id(0) <= '9' &&
          id(1) >= '0' && id(1) <= '9' &&
          (id.endsWith("dc") || id.endsWith("db"))
      // depth caps at 3 (file → movi → rec): the spec nests no deeper,
      // and an unbounded recursion would let an adversarial payload of
      // nested LISTs (12 bytes per level) stack-overflow the task
      def walk(start: Long, lim: Long, inMovi: Boolean, depth: Int): Unit = {
        var off = start
        var ok = depth <= 3
        while (ok && out.size < maxFrames && off + 8 <= lim) {
          val id = id4(off.toInt)
          val sz = le32(off.toInt + 4)
          val body = off + 8
          val bodyEnd = body + sz
          if (bodyEnd > lim) ok = false // overruns its enclosure
          else {
            if (id == "LIST" && sz >= 4) {
              val listType = id4(body.toInt)
              if ((!inMovi && listType == "movi") ||
                  (inMovi && listType == "rec "))
                walk(body + 4, bodyEnd, inMovi = true, depth + 1)
              // hdrl/INFO/idx lists skip
            } else if (inMovi && isVideoChunk(id))
              out += p.slice(body.toInt, bodyEnd.toInt)
            off = bodyEnd + (sz & 1L)
          }
        }
      }
      // the RIFF size field bounds the walk; a lying size clamps to
      // the actual payload
      walk(12L, math.min(p.length.toLong, 8L + le32(4)), inMovi = false,
        depth = 1)
      out.toSeq
    }
  }

  /** Minimal spec-conformant ISO-BMFF (MP4) muxer for a single video
    * track: `ftyp` + `mdat` (concatenated sample payloads) + `moov`
    * carrying the real sample tables a demuxer needs — `stsz`
    * (per-sample sizes), `stsc` (sample-to-chunk runs; samples group
    * into chunks of `samplesPerChunk`, so the run table is genuinely
    * exercised), and `stco` (absolute chunk offsets into `mdat`) —
    * under the standard `moov/trak/mdia(hdlr 'vide')/minf/stbl`
    * nesting, with minimal valid `mvhd`/`tkhd`/`mdhd`/`stts`/`stsd`
    * siblings. Deterministic bytes for fixed input — fixture-grade,
    * and a real container: an AVC MP4 is exactly this with NAL-unit
    * sample bodies.
    */
  def mp4Mux(frames: Seq[Array[Byte]], samplesPerChunk: Int = 2,
             width: Int = 0, height: Int = 0): Array[Byte] = {
    require(samplesPerChunk >= 1,
      s"samplesPerChunk must be >= 1: $samplesPerChunk")
    def box(tp: String, body: Array[Byte]): Array[Byte] =
      beBytes(body.length + 8) ++ a(tp) ++ body
    def full(tp: String, body: Array[Byte]): Array[Byte] =
      box(tp, beBytes(0) ++ body) // version 0, flags 0
    val ftyp = box("ftyp", a("isom") ++ beBytes(0) ++ a("mp42"))
    val mdatBody = frames.iterator.flatten.toArray
    val mdat = box("mdat", mdatBody)
    // chunk layout: runs of samplesPerChunk, remainder as a short run
    val n = frames.size
    val fullChunks = n / samplesPerChunk
    val rem = n % samplesPerChunk
    val chunkSizes: Seq[Int] =
      Seq.fill(fullChunks)(samplesPerChunk) ++
        (if (rem > 0) Seq(rem) else Nil)
    val mdatStart = ftyp.length.toLong + 8L
    val chunkOffsets = chunkSizes
      .scanLeft((mdatStart, 0)) { case ((off, i), spc) =>
        (off + frames.slice(i, i + spc).map(_.length.toLong).sum, i + spc)
      }.init.map(_._1)
    val stsz = full("stsz", beBytes(0) ++ beBytes(n) ++
      frames.iterator.flatMap(f => beBytes(f.length)).toArray)
    // stsc runs: (first_chunk, samples_per_chunk, sdi) — one entry for
    // the full-chunk run, one more when a remainder chunk differs
    val stscRuns =
      (if (fullChunks > 0) Seq((1, samplesPerChunk)) else Nil) ++
        (if (rem > 0) Seq((fullChunks + 1, rem)) else Nil)
    val stsc = full("stsc", beBytes(stscRuns.size) ++
      stscRuns.iterator.flatMap { case (fc, spc) =>
        beBytes(fc) ++ beBytes(spc) ++ beBytes(1) }.toArray)
    // stco carries unsigned 32-bit offsets; a payload pushing any
    // chunk past that range would WRAP under a blind toInt — the
    // demuxer's posture is reject-never-wrap, so the muxer refuses
    // identically instead of emitting a corrupt container (co64 is
    // the >4 GiB spelling; this fixture-grade muxer stays stco-only)
    require(chunkOffsets.forall(_ <= 0xFFFFFFFFL),
      s"mp4Mux: chunk offset ${chunkOffsets.max} exceeds the 32-bit " +
        "stco range - payload too large for an stco-only container")
    val stco = full("stco", beBytes(chunkOffsets.size) ++
      chunkOffsets.iterator.flatMap(o => beBytes(o.toInt)).toArray)
    val stts = full("stts", beBytes(1) ++ beBytes(n) ++ beBytes(1))
    val stsd = full("stsd", beBytes(1) ++
      box("mp4v", Array.fill[Byte](78)(0)))
    val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
    val vmhd = full("vmhd", Array.fill[Byte](8)(0))
    val dref = full("dref", beBytes(1) ++ full("url ", Array.emptyByteArray))
    val dinf = box("dinf", dref)
    val minf = box("minf", vmhd ++ dinf ++ stbl)
    val hdlr = full("hdlr", beBytes(0) ++ a("vide") ++
      Array.fill[Byte](12)(0) ++ Array(0.toByte))
    val mdhd = full("mdhd", beBytes(0) ++ beBytes(0) ++ beBytes(1000) ++
      beBytes(n) ++ beBytes(0x55C40000 >> 16) ++ Array.emptyByteArray)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val tkhd = full("tkhd", Array.fill[Byte](80)(0))
    val trak = box("trak", tkhd ++ mdia)
    val mvhd = full("mvhd", beBytes(0) ++ beBytes(0) ++ beBytes(1000) ++
      beBytes(n) ++ beBytes(0x00010000) ++ beBytes(0x01000000 >>> 16) ++
      Array.fill[Byte](10 + 36 + 24)(0) ++ beBytes(2))
    val moov = box("moov", mvhd ++ trak)
    ftyp ++ mdat ++ moov
  }

  /** Real MP4 (ISO-BMFF) demux through the seam: walks the box tree
    * `moov → trak → mdia → (hdlr 'vide') → minf → stbl`, reads the
    * sample tables — `stsz` (sizes, fixed or per-sample), `stsc`
    * (sample-to-chunk runs), `stco`/`co64` (32/64-bit chunk offsets)
    * — and reconstructs each sample's absolute byte range in `mdat`:
    * chunk offset plus the sizes of its predecessors within the
    * chunk, exactly the lookup every MP4 player performs. Sample
    * bodies return verbatim (for an AVC file these are NAL units;
    * demux and pixel decode stay separate stages, as with
    * [[aviFrameCodec]]).
    *
    * Hardening, same posture as the RIFF codecs: all arithmetic in
    * Long (unsigned 32-bit and 64-bit box sizes must reject, never
    * wrap), box recursion depth-capped, table entry counts validated
    * against their box's actual byte length before allocation, a
    * sample range overrunning the payload stops the walk with what
    * was already collected, truncated/non-BMFF payloads yield no
    * frames, and the frame budget stops table expansion early.
    * `size==0` (to end-of-file, last top-level box) and `size==1`
    * (64-bit largesize) boxes are handled at every level.
    */
  val mp4FrameCodec: FrameCodec = (p, maxFrames) => {
    if (p == null || maxFrames < 1 || p.length < 12 ||
      ascii(p, 4, 4) != "ftyp") Nil
    else {
      def u64be(i: Int): Long =
        (u32be(p, i) << 32) | u32be(p, i + 4)
      // (boxType, bodyStart, bodyEnd) for each box in [start, lim)
      def boxes(start: Long, lim: Long): Seq[(String, Long, Long)] = {
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(String, Long, Long)]
        var off = start
        var ok = true
        while (ok && off + 8 <= lim) {
          val sz32 = u32be(p, off.toInt)
          val tp = ascii(p, off.toInt + 4, 4)
          val (body, end) =
            if (sz32 == 1L && off + 16 <= lim) {
              val sz64 = u64be(off.toInt + 8)
              (off + 16, off + sz64)
            } else if (sz32 == 0L) (off + 8, lim) // to end of enclosure
            else (off + 8, off + sz32)
          if (end < body || end > lim) ok = false // lying/overrunning size
          else {
            out += ((tp, body, end))
            off = end
          }
        }
        out.toSeq
      }
      def find(bs: Seq[(String, Long, Long)], tp: String) =
        bs.find(_._1 == tp)
      val top = boxes(0L, p.length.toLong)
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      for {
        (_, moovS, moovE) <- find(top, "moov").toSeq
        (_, trakS, trakE) <- boxes(moovS, moovE).filter(_._1 == "trak")
        if frames.size < maxFrames
        mdiaBs = boxes(trakS, trakE)
        (_, mdiaS, mdiaE) <- find(mdiaBs, "mdia").toSeq
        mdia = boxes(mdiaS, mdiaE)
        // video track only: hdlr handler_type at body offset 8
        (_, hS, hE) <- find(mdia, "hdlr").toSeq
        if hE - hS >= 12 && ascii(p, hS.toInt + 8, 4) == "vide"
        (_, minfS, minfE) <- find(mdia, "minf").toSeq
        (_, stblS, stblE) <- find(boxes(minfS, minfE), "stbl").toSeq
      } {
        val stbl = boxes(stblS, stblE)
        val sizes: Option[IndexedSeq[Long]] =
          find(stbl, "stsz").flatMap { case (_, s, e) =>
            if (e - s < 12) None
            else {
              val fixed = u32be(p, s.toInt + 4)
              val cnt = u32be(p, s.toInt + 8)
              if (fixed != 0L)
                if (cnt >= 0 && cnt <= Int.MaxValue)
                  Some(IndexedSeq.fill(math.min(cnt,
                    maxFrames.toLong).toInt)(fixed))
                else None
              else if (cnt * 4 > e - s - 12) None // lying entry count
              else Some((0L until math.min(cnt, maxFrames.toLong))
                .map(i => u32be(p, (s + 12 + i * 4).toInt)))
            }
          }
        val chunkOffs: Option[IndexedSeq[Long]] =
          find(stbl, "stco").flatMap { case (_, s, e) =>
            if (e - s < 8) None
            else {
              val cnt = u32be(p, s.toInt + 4)
              if (cnt * 4 > e - s - 8) None
              else Some((0L until cnt).map(i =>
                u32be(p, (s + 8 + i * 4).toInt)))
            }
          }.orElse(find(stbl, "co64").flatMap { case (_, s, e) =>
            if (e - s < 8) None
            else {
              val cnt = u32be(p, s.toInt + 4)
              if (cnt * 8 > e - s - 8) None
              else Some((0L until cnt).map(i => u64be((s + 8 + i * 8).toInt)))
            }
          })
        val stscRuns: Option[IndexedSeq[(Long, Long)]] =
          find(stbl, "stsc").flatMap { case (_, s, e) =>
            if (e - s < 8) None
            else {
              val cnt = u32be(p, s.toInt + 4)
              if (cnt * 12 > e - s - 8) None
              else Some((0L until cnt).map(i => (
                u32be(p, (s + 8 + i * 12).toInt),       // first_chunk
                u32be(p, (s + 8 + i * 12 + 4).toInt)))) // samples/chunk
            }
          }
        (sizes, chunkOffs, stscRuns) match {
          case (Some(sz), Some(chunks), Some(runs))
              if runs.nonEmpty && runs.forall(_._2 >= 1) =>
            // expand sample-to-chunk runs chunk by chunk, slicing each
            // sample at its accumulated offset; stop on the first
            // range that leaves the payload
            var sample = 0
            var ci = 0
            var ok = true
            while (ok && ci < chunks.size && sample < sz.size &&
                frames.size < maxFrames) {
              val spc = runs.takeWhile(_._1 <= ci + 1).lastOption
                .map(_._2).getOrElse(runs.head._2)
              var off = chunks(ci)
              var k = 0L
              while (ok && k < spc && sample < sz.size &&
                  frames.size < maxFrames) {
                val len = sz(sample)
                if (off < 0 || len < 0 || off + len > p.length)
                  ok = false
                else {
                  frames += p.slice(off.toInt, (off + len).toInt)
                  off += len
                  sample += 1
                  k += 1
                }
              }
              ci += 1
            }
          case _ => () // incomplete sample tables: no frames
        }
      }
      frames.toSeq
    }
  }

  /** Library chunking codec: fixed-size byte frames of the payload —
    * blob sharding for transport/storage, and the oracle-gateable
    * [[FrameCodec]] (text payloads chunk to byte-exact substrings, so
    * a SQL oracle can replay it, unlike image re-encoding).
    */
  def byteChunkCodec(chunkBytes: Int): FrameCodec = {
    require(chunkBytes >= 1, s"chunkBytes must be >= 1: $chunkBytes")
    (p, maxFrames) =>
      if (p == null || p.isEmpty) Nil
      else p.grouped(chunkBytes).take(maxFrames).toSeq
  }

  private val FrameSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("frame_no", LongType),
    StructField("frame", BinaryType)))

  /** Decode real frames through the injected `codec`, keeping every
    * `step`-th one: (media_id, frame_no, frame) with `frame_no` the
    * codec's frame index (0, step, 2·step, …) so lineage survives the
    * sampling. Per-partition like [[decodeMeta]] — a real codec
    * initializes once per task, not per row; a payload the codec
    * rejects contributes no rows and kills nothing.
    */
  def decodeFrames(media: DataFrame, codec: FrameCodec, maxFrames: Int,
                   step: Int = 1): DataFrame = {
    require(maxFrames >= 0, s"maxFrames must be >= 0: $maxFrames")
    require(step >= 1, s"step must be >= 1: $step")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(FrameSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        val frames = codec(r.getAs[Array[Byte]]("payload"), maxFrames)
        frames.iterator.zipWithIndex.collect {
          case (f, i) if i % step == 0 =>
            Row(r.getLong(0), i.toLong, f)
        }
      }
    }(enc)
  }
}
