package graft

import org.apache.spark.sql.functions._
import graft.etl.Stage1
import graft.functions.TextAnalysis
import graft.multimodal.Multimodal

/** Edge behavior of library surfaces not exercised by the oracle gate. */
class LibraryEdgeSpec extends SparkSpec {

  test("P3: Stage1 fails fast on missing required columns") {
    import spark.implicits._
    val bad = Seq(("j1", "n1")).toDF("jobID", "node") // no counters/ts
    val e = intercept[IllegalArgumentException](Stage1.cpu(bad))
    assert(e.getMessage.contains("missing required columns"))
  }

  test("hash60 stays within 60 bits and is stable") {
    import spark.implicits._
    val vals = Seq("a", "b", "", "the quick fox", "éü")
      .toDF("x").select(TextAnalysis.hash60(col("x")).as("h"))
      .collect().map(_.getLong(0))
    assert(vals.forall(h => h >= 0 && h < (1L << 60)))
    val again = Seq("a").toDF("x")
      .select(TextAnalysis.hash60(col("x"))).head().getLong(0)
    assert(again === vals.head, "deterministic across evaluations")
  }

  test("wordShingles: short text yields empty set, no failure") {
    import spark.implicits._
    val sh = Seq("one two", "", "a b c").toDF("text")
      .select(TextAnalysis.wordShingles(col("text"), 3).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(sh(0).isEmpty && sh(1).isEmpty)
    assert(sh(2) === Seq("a b c"))
  }

  test("multimodal decode is deterministic and honest about unknowns") {
    import spark.implicits._
    val media = Multimodal.attachPayload(
      Seq((1L, "hello world")).toDF("id", "content"), "id", "content")
    val out1 = Multimodal.decodeMeta(media).collect()
    val out2 = Multimodal.decodeMeta(media).collect()
    assert(out1 === out2)
    val r = out1.head
    assert(r.getAs[Long]("n_bytes") === 11L)
    // text bytes are not a media container: no fabricated metadata
    assert(r.getAs[String]("format") === "unknown")
    assert(r.isNullAt(r.fieldIndex("width")) &&
      r.isNullAt(r.fieldIndex("height")) &&
      r.isNullAt(r.fieldIndex("sample_rate")) &&
      r.isNullAt(r.fieldIndex("channels")))
  }

  test("multimodal decode: WAV fmt chunk and ftyp brand are really parsed") {
    import spark.implicits._
    val media = Seq(
      (1L, Multimodal.WavFixture),
      (2L, Multimodal.FtypFixture),
      // RIFF/WAVE signature but truncated before the fmt fields —
      // the probe must refuse, not invent a sample rate
      (3L, Multimodal.WavFixture.take(20)),
      // ftyp whose declared box size exceeds the payload
      (4L, Multimodal.FtypFixture.take(12))).toDF("media_id", "payload")
    val rs = Multimodal.decodeMeta(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rs(1L).getAs[String]("format") === "wav")
    assert(rs(1L).getAs[Int]("sample_rate") === 44100)
    assert(rs(1L).getAs[Int]("channels") === 2)
    assert(rs(1L).isNullAt(rs(1L).fieldIndex("width")))
    assert(rs(2L).getAs[String]("format") === "mp4")
    assert(rs(2L).isNullAt(rs(2L).fieldIndex("sample_rate")))
    assert(rs(3L).getAs[String]("format") === "unknown")
    assert(rs(4L).getAs[String]("format") === "unknown")
  }

  test("multimodal decode never throws: fuzzed bytes and all fixture " +
    "prefixes decode to honest rows") {
    import spark.implicits._
    // the 100 TB contract: a corrupt payload must never kill the task.
    // Deterministic fuzz: random byte blobs (some starting with real
    // magics) + EVERY prefix truncation of the WAV and ftyp fixtures.
    val rng = new scala.util.Random(42)
    val magics = Seq(
      Array[Byte](0x89.toByte, 'P', 'N', 'G'),
      "RIFF".getBytes("US-ASCII"),
      Array[Byte](0, 0, 0, 20) ++ "ftyp".getBytes("US-ASCII"),
      Array.empty[Byte])
    val fuzz = (0 until 40).map { i =>
      val body = Array.fill(rng.nextInt(64))(rng.nextInt().toByte)
      (i.toLong, magics(i % magics.size) ++ body)
    }
    val prefixes = (Multimodal.WavFixture.indices.map(n =>
      Multimodal.WavFixture.take(n)) ++
      Multimodal.FtypFixture.indices.map(n =>
        Multimodal.FtypFixture.take(n)))
      .zipWithIndex.map { case (p, i) => (1000L + i, p) }
    val media = (fuzz ++ prefixes).toDF("media_id", "payload")
    val rows = Multimodal.decodeMeta(media).collect()
    assert(rows.length === fuzz.size + prefixes.size, "no row lost")
    rows.foreach { r =>
      val fmt = r.getAs[String]("format")
      assert(fmt != null && fmt.nonEmpty)
      // honesty: an 'unknown' payload never carries fabricated metadata
      if (fmt == "unknown") {
        assert(r.isNullAt(r.fieldIndex("width")) &&
          r.isNullAt(r.fieldIndex("height")) &&
          r.isNullAt(r.fieldIndex("sample_rate")) &&
          r.isNullAt(r.fieldIndex("channels")), r.toString)
      }
      assert(r.getAs[Long]("n_bytes") >= 0L)
    }
  }

  test("multimodal decode: real PNG payloads take the javax.imageio path") {
    import spark.implicits._
    // render an actual 3x2 PNG in-memory: the magic-sniffed real-codec
    // path must report the true pixel dimensions, not the stub's fake
    val img = new java.awt.image.BufferedImage(
      3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val media = Seq((42L, png)).toDF("media_id", "payload")
    val r = Multimodal.decodeMeta(media).collect().head
    assert(r.getAs[String]("format") === "png")
    assert(r.getAs[Int]("width") === 3)
    assert(r.getAs[Int]("height") === 2)
    assert(r.getAs[Long]("n_bytes") === png.length.toLong)
    // corrupt PNG (magic but truncated body) keeps its declared
    // format with null dimensions instead of failing the task or
    // inventing values
    val broken = png.take(12)
    val media2 = Seq((43L, broken)).toDF("media_id", "payload")
    val r2 = Multimodal.decodeMeta(media2).collect().head
    assert(r2.getAs[Long]("n_bytes") === broken.length.toLong)
    assert(r2.getAs[String]("format") === "png")
    assert(r2.isNullAt(r2.fieldIndex("width")) &&
      r2.isNullAt(r2.fieldIndex("height")))
    // JPEG goes through the same real path
    val jbos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jbos)
    val jpg = jbos.toByteArray
    val r3 = Multimodal.decodeMeta(
      Seq((44L, jpg)).toDF("media_id", "payload")).collect().head
    assert(r3.getAs[String]("format") === "jpeg")
    assert(r3.getAs[Int]("width") === 3 && r3.getAs[Int]("height") === 2)
  }

  test("multimodal resize: real downscale, aspect kept, corrupt passthrough") {
    import spark.implicits._
    // 8x4 solid blue PNG -> maxDim 4 must give 4x2
    val img = new java.awt.image.BufferedImage(8, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(java.awt.Color.BLUE); g.fillRect(0, 0, 8, 4); g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val out = Multimodal.resizeImages(
      Seq((1L, png), (2L, "not an image".getBytes))
        .toDF("media_id", "payload"), maxDim = 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    val resized = out(1L)
    assert(resized.getAs[String]("format") === "png")
    assert(resized.getAs[Int]("width") === 4)
    assert(resized.getAs[Int]("height") === 2)
    // output is itself a decodable PNG of the claimed size
    val round = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized.getAs[Array[Byte]]("payload")))
    assert(round.getWidth === 4 && round.getHeight === 2)
    // an image already under maxDim is not upscaled
    val same = Multimodal.resizeImages(
      Seq((3L, png)).toDF("media_id", "payload"), maxDim = 100)
      .collect().head
    assert(same.getAs[Int]("width") === 8 && same.getAs[Int]("height") === 4)
    val passthrough = out(2L)
    assert(passthrough.getAs[String]("format") === "passthrough")
    assert(passthrough.getAs[Int]("width") === -1)
    assert(passthrough.getAs[Array[Byte]]("payload")
      .sameElements("not an image".getBytes))
  }

  test("multimodal features: mean RGB + luminance of a known image") {
    import spark.implicits._
    // half pure red, half pure blue, 2x2
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000); img.setRGB(0, 1, 0xFF0000)
    img.setRGB(1, 0, 0x0000FF); img.setRGB(1, 1, 0x0000FF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val out = Multimodal.imageFeatures(
      Seq((1L, bos.toByteArray), (2L, "text".getBytes))
        .toDF("media_id", "payload"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val f = out(1L)
    assert(f.getAs[Double]("mean_r") === 127.5)
    assert(f.getAs[Double]("mean_g") === 0.0)
    assert(f.getAs[Double]("mean_b") === 127.5)
    assert(math.abs(f.getAs[Double]("luminance") -
      (0.299 * 127.5 + 0.114 * 127.5)) < 1e-9)
    assert(out(2L).isNullAt(1), "undecodable -> null features")
  }

  test("multimodal decode: null payload rows degrade, never NPE") {
    import spark.implicits._
    val media = Seq((1L, "x".getBytes), (2L, null))
      .toDF("media_id", "payload")
    val meta = Multimodal.decodeMeta(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    val nullRow = meta(2L)
    assert(nullRow.getAs[String]("format") === "unknown")
    assert(nullRow.isNullAt(nullRow.fieldIndex("n_bytes")),
      "absent payload is not a 0-byte payload")
    assert(nullRow.isNullAt(nullRow.fieldIndex("width")) &&
      nullRow.isNullAt(nullRow.fieldIndex("sample_rate")))
    // resize and features take the same degradation path
    val resized = Multimodal.resizeImages(media, maxDim = 4).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(resized(2L).getAs[String]("format") === "passthrough")
    val feats = Multimodal.imageFeatures(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(feats(2L).isNullAt(1))
  }

  test("decodeFrames: a synthetic codec drives the injected seam — " +
    "lineage, step sampling, frame cap, rejects contribute nothing") {
    import spark.implicits._
    // synthetic codec: each 2-byte chunk of the payload is a 'frame';
    // payloads starting with 'X' (and nulls) are undecodable
    val chunker: Multimodal.FrameCodec = (p, maxFrames) =>
      if (p == null || p.isEmpty || p(0) == 'X'.toByte) Nil
      else p.grouped(2).take(maxFrames).map(_.toArray).toSeq
    val media = Seq(
      (1L, "abcdefgh".getBytes("UTF-8")), // 4 frames
      (2L, "Xbroken!".getBytes("UTF-8")), // rejected
      (3L, null)) // null payload: no rows, no NPE
      .toDF("media_id", "payload")
    val all = Multimodal.decodeFrames(media, chunker, maxFrames = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        new String(r.getAs[Array[Byte]]("frame"), "UTF-8")))
    assert(all.toSet === Set((1L, 0L, "ab"), (1L, 1L, "cd"),
      (1L, 2L, "ef"), (1L, 3L, "gh")),
      "codec frames carry (media, frame_no) lineage; rejects vanish")
    // step sampling keeps the codec's frame indices, not a re-ranking
    val stepped = Multimodal.decodeFrames(media, chunker,
      maxFrames = 10, step = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stepped === Set((1L, 0L), (1L, 2L)))
    // the codec's maxFrames contract bounds output
    val capped = Multimodal.decodeFrames(media, chunker, maxFrames = 3)
      .collect().map(_.getLong(1)).toSet
    assert(capped === Set(0L, 1L, 2L))
  }

  test("decodeFrames: the default image codec emits one decodable " +
    "PNG frame per decodable image") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(3, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq((1L, bos.toByteArray), (2L, "noise".getBytes))
      .toDF("media_id", "payload")
    val frames = Multimodal.decodeFrames(media,
      Multimodal.imageFrameCodec, maxFrames = 5).collect()
    assert(frames.length === 1, "undecodable payload emits no frame")
    assert(frames.head.getLong(0) === 1L && frames.head.getLong(1) === 0L)
    val round = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      frames.head.getAs[Array[Byte]]("frame")))
    assert(round.getWidth === 3 && round.getHeight === 2)
  }

  test("walltime parser rejects negatives inside H:MM:SS gracefully") {
    import spark.implicits._
    // malformed-but-colon-shaped inputs must not throw under ANSI mode
    val out = Seq("1:xx:00", ":::", "1:2:3:4:5").toDF("x")
      .select(graft.functions.Fresco.walltimeToSeconds(col("x")))
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(out(0) === null) // unparseable minute -> null arithmetic
    assert(out(1) === null)
    assert(out(2) === null) // 5 parts -> no branch -> null
  }
}
