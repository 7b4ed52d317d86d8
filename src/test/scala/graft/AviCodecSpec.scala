package graft

import java.nio.{ByteBuffer, ByteOrder}
import graft.multimodal.Multimodal

/** AVI (RIFF) mux + demux codec: movi walk, `rec ` grouping LISTs,
  * stream-chunk filtering, word alignment, the adversarial reject
  * paths (Nil, never a throw or garbage), and the REAL MJPEG pixel
  * path — JPEG frame bodies decoding via ImageIO downstream, which
  * the SQL-replayable `q_avi_frames` gate cannot cover.
  */
class AviCodecSpec extends SparkSpec {

  private val codec = Multimodal.aviFrameCodec

  private def frames(n: Int, len: Int): Seq[Array[Byte]] =
    (0 until n).map(i => Array.tabulate(len)(j => (i * 31 + j).toByte))

  test("mux → demux round-trips frame bodies byte-exactly") {
    val fs = frames(3, 48) :+ Array[Byte](1, 2, 3) // odd size → padded
    val got = codec(Multimodal.aviMux(fs), 10)
    assert(got.size === 4)
    got.zip(fs).foreach { case (g, w) => assert(g.toSeq === w.toSeq) }
  }

  test("real MJPEG path: JPEG frame bodies decode to pixels via ImageIO") {
    val jpegs = Seq((8, 5), (16, 9)).map { case (w, h) =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        img.setRGB(x, y, (x * 39 + y * 97) & 0xffffff)))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos))
      bos.toByteArray
    }
    val avi = Multimodal.aviMux(jpegs, width = 16, height = 9)
    val got = codec(avi, 10)
    assert(got.size === 2)
    // every demuxed frame is a complete JPEG: decode and check dims
    val dims = got.map { f =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(f))
      (img.getWidth, img.getHeight)
    }
    assert(dims === Seq((8, 5), (16, 9)))
  }

  test("`rec ` grouping LISTs recurse; audio and index chunks skip") {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val b = ByteBuffer.allocate(8 + body.length + pad)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      b.array()
    }
    val v0 = Array[Byte](10, 11, 12)
    val v1 = Array[Byte](20, 21)
    val rec = "rec ".getBytes("US-ASCII") ++
      chunk("00dc", v0) ++ chunk("01wb", Array[Byte](9, 9, 9))
    val movi = "movi".getBytes("US-ASCII") ++ chunk("LIST", rec) ++
      chunk("ix00", Array[Byte](0)) ++ chunk("01db", v1)
    val lists = chunk("LIST", movi)
    val b = ByteBuffer.allocate(12 + lists.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(lists.length + 4)
    b.put("AVI ".getBytes("US-ASCII")).put(lists)
    val got = codec(b.array(), 10)
    // 00dc inside rec, then 01db (any stream number); 01wb audio and
    // ix00 index skipped
    assert(got.map(_.toSeq) === Seq(v0.toSeq, v1.toSeq))
  }

  test("frame budget stops the walk; step-sampled decodeFrames composes") {
    val fs = frames(6, 16)
    assert(codec(Multimodal.aviMux(fs), 2).size === 2)
    assert(codec(Multimodal.aviMux(fs), 0) === Nil)
  }

  test("adversarial payloads reject as Nil, never throw") {
    val good = Multimodal.aviMux(frames(2, 32))
    // not RIFF / not AVI / truncated
    assert(codec(null, 4) === Nil)
    assert(codec(Array[Byte](1, 2, 3), 4) === Nil)
    assert(codec("RIFF1234WAVE".getBytes("US-ASCII"), 4) === Nil)
    assert(codec(good.take(11), 4) === Nil)
    // a chunk size near 2^32 must not wrap offsets
    val lying = good.clone()
    val moviOff = {
      // find the first 00dc header and blow up its size field
      val s = new String(good, "ISO-8859-1")
      s.indexOf("00dc")
    }
    assert(moviOff > 0)
    java.util.Arrays.fill(lying, moviOff + 4, moviOff + 8, 0xff.toByte)
    val survived = codec(lying, 4)
    assert(survived === Nil || survived.size < 2) // stopped, no wrap
    // a lying RIFF size clamps to the payload instead of overrunning
    val shortRiff = good.clone()
    shortRiff(4) = 0x10.toByte; shortRiff(5) = 0; shortRiff(6) = 0
    shortRiff(7) = 0
    assert(codec(shortRiff, 4).size <= 2)
  }

  test("a nested-rec LIST bomb cannot overflow the stack (depth capped)") {
    // 20k levels of LIST('rec ' ...) around one frame: an unbounded
    // recursion would need ~20k stack frames and die; the capped walk
    // skips past depth 3 and returns promptly
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val b = ByteBuffer.allocate(8 + body.length + pad)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      b.array()
    }
    var inner: Array[Byte] = chunk("00dc", Array[Byte](7, 7))
    (0 until 20000).foreach { _ =>
      inner = chunk("LIST", "rec ".getBytes("US-ASCII") ++ inner)
    }
    val movi = "movi".getBytes("US-ASCII") ++ inner
    val lists = chunk("LIST", movi)
    val b = ByteBuffer.allocate(12 + lists.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(lists.length + 4)
    b.put("AVI ".getBytes("US-ASCII")).put(lists)
    // depth 1=file, 2=movi, 3=first rec: the frame sits 20k levels
    // deeper and is unreachable; the point is "returns, no throw"
    assert(codec(b.array(), 4) === Nil)
    // one legitimate rec level still reaches its frame
    val shallow = chunk("LIST", "movi".getBytes("US-ASCII") ++
      chunk("LIST", "rec ".getBytes("US-ASCII") ++
        chunk("00dc", Array[Byte](1, 2))))
    val b2 = ByteBuffer.allocate(12 + shallow.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    b2.put("RIFF".getBytes("US-ASCII")).putInt(shallow.length + 4)
    b2.put("AVI ".getBytes("US-ASCII")).put(shallow)
    assert(codec(b2.array(), 4).map(_.toSeq) === Seq(Seq[Byte](1, 2)))
  }
}
