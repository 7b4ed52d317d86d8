package graft

import graft.multimodal.Multimodal

/** MP4 (ISO-BMFF) mux + demux codec: sample-table reconstruction
  * (stsz/stsc/stco and co64), multi-chunk layouts, 64-bit and
  * to-end-of-file box sizes, video-track selection by hdlr, the
  * adversarial reject paths (Nil, never a throw or garbage), and the
  * real pixel path — JPEG sample bodies decoding via ImageIO
  * downstream, which the SQL-replayable `q_mp4_frames` gate cannot
  * cover.
  */
class Mp4CodecSpec extends SparkSpec {

  private val codec = Multimodal.mp4FrameCodec

  private def frames(n: Int, len: Int): Seq[Array[Byte]] =
    (0 until n).map(i => Array.tabulate(len)(j => (i * 31 + j).toByte))

  test("mux → demux round-trips sample bodies byte-exactly") {
    // 5 samples, 2 per chunk → stsc gets a full run AND a remainder
    // run; varied sizes exercise the per-sample stsz table
    val fs = frames(4, 48) :+ Array[Byte](1, 2, 3)
    val got = codec(Multimodal.mp4Mux(fs), 10)
    assert(got.size === 5)
    got.zip(fs).foreach { case (g, w) => assert(g.toSeq === w.toSeq) }
    // single-chunk layout (all samples in one chunk) round-trips too
    val one = codec(Multimodal.mp4Mux(fs, samplesPerChunk = 100), 10)
    assert(one.map(_.toSeq) === fs.map(_.toSeq))
    // chunk-per-sample layout as well
    val each = codec(Multimodal.mp4Mux(fs, samplesPerChunk = 1), 10)
    assert(each.map(_.toSeq) === fs.map(_.toSeq))
  }

  test("real pixel path: JPEG sample bodies decode via ImageIO") {
    val jpegs = Seq((8, 5), (16, 9)).map { case (w, h) =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        img.setRGB(x, y, (x * 39 + y * 97) & 0xffffff)))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos))
      bos.toByteArray
    }
    val got = codec(Multimodal.mp4Mux(jpegs), 10)
    assert(got.size === 2)
    val dims = got.map { f =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(f))
      (img.getWidth, img.getHeight)
    }
    assert(dims === Seq((8, 5), (16, 9)))
  }

  test("frame budget stops table expansion; decodeMeta probes the mux as mp4") {
    val fs = frames(6, 16)
    assert(codec(Multimodal.mp4Mux(fs), 2).size === 2)
    assert(codec(Multimodal.mp4Mux(fs), 0) === Nil)
    // the muxed file carries a legitimate ftyp: the metadata probe
    // reports it as the mp4 family
    import spark.implicits._
    val meta = Multimodal.decodeMeta(
      Seq((1L, Multimodal.mp4Mux(fs))).toDF("media_id", "payload"))
      .collect()(0)
    assert(meta.getAs[String]("format") === "mp4")
  }

  test("a non-video track is skipped; the video track among several is found") {
    // splice the muxed file's hdlr from 'vide' to 'soun': no frames
    val good = Multimodal.mp4Mux(frames(3, 24))
    val s = new String(good, "ISO-8859-1")
    val h = s.indexOf("vide")
    assert(h > 0)
    val soun = good.clone()
    System.arraycopy("soun".getBytes("US-ASCII"), 0, soun, h, 4)
    assert(codec(soun, 10) === Nil)
  }

  test("adversarial payloads reject as Nil, never throw") {
    val good = Multimodal.mp4Mux(frames(3, 32))
    assert(codec(null, 4) === Nil)
    assert(codec(Array[Byte](1, 2, 3), 4) === Nil)
    assert(codec("RIFF1234AVI ".getBytes("US-ASCII"), 4) === Nil)
    assert(codec(good.take(11), 4) === Nil)
    // truncation fuzz across the whole length: every prefix must
    // return promptly without throwing
    (0 until good.length by 7).foreach { n =>
      codec(good.take(n), 4); ()
    }
    // a lying (huge) box size must not wrap offsets: blow up moov's
    // 32-bit size field
    val s = new String(good, "ISO-8859-1")
    val moov = s.indexOf("moov") - 4
    assert(moov > 0)
    val lying = good.clone()
    java.util.Arrays.fill(lying, moov, moov + 4, 0xff.toByte)
    assert(codec(lying, 4) === Nil)
    // a lying stsz entry count rejects the table instead of allocating
    val stsz = s.indexOf("stsz") - 4
    assert(stsz > 0)
    val lyingCnt = good.clone()
    // entry count sits at stsz body + 8 (after ver/flags + fixed size)
    java.util.Arrays.fill(lyingCnt, stsz + 8 + 8, stsz + 8 + 12, 0x7f.toByte)
    assert(codec(lyingCnt, 4) === Nil)
    // a chunk offset pointing past the payload stops with what was
    // already collected (never an index error)
    val stco = s.indexOf("stco") - 4
    assert(stco > 0)
    val lyingOff = good.clone()
    java.util.Arrays.fill(lyingOff, stco + 8 + 8, stco + 8 + 12, 0x7f.toByte)
    assert(codec(lyingOff, 4).size < 3)
  }

  test("64-bit largesize and to-end-of-file box sizes parse") {
    val good = Multimodal.mp4Mux(frames(2, 20))
    // rewrite the trailing moov box as a size==1 + 64-bit largesize
    // box (the layout large files actually use)
    val s = new String(good, "ISO-8859-1")
    val moovOff = s.indexOf("moov") - 4
    val moovLen = ((good(moovOff) & 0xff) << 24) |
      ((good(moovOff + 1) & 0xff) << 16) |
      ((good(moovOff + 2) & 0xff) << 8) | (good(moovOff + 3) & 0xff)
    val before = good.take(moovOff)
    val body = good.slice(moovOff + 8, moovOff + moovLen)
    val large = java.nio.ByteBuffer.allocate(16 + body.length)
    large.putInt(1).put("moov".getBytes("US-ASCII"))
      .putLong(16L + body.length).put(body)
    assert(codec(before ++ large.array(), 10).size === 2)
    // size==0 (to end of file) on the last box parses too
    val zero = good.clone()
    java.util.Arrays.fill(zero, moovOff, moovOff + 4, 0.toByte)
    assert(codec(zero, 10).size === 2)
  }
}
