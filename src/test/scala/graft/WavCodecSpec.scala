package graft

import java.nio.{ByteBuffer, ByteOrder}
import graft.multimodal.Multimodal

/** RIFF/WAVE PCM codec: header walk, blockAlign-sized hops, trailing
  * partial frames, streaming sizes, chunk skipping, and the reject
  * paths (the codec must yield Nil, never throw or return garbage).
  */
class WavCodecSpec extends SparkSpec {

  /** Build a WAV: optional extra chunk before fmt, declared data size
    * (-1 = streaming), configurable format code and blockAlign.
    */
  private def wav(data: Array[Byte], dataSize: Int,
                  audioFormat: Short = 1, channels: Short = 1,
                  blockAlign: Short = 1, bits: Short = 8,
                  preChunk: Option[(String, Array[Byte])] = None):
      Array[Byte] = {
    val pre = preChunk.map { case (id, body) =>
      val pad = body.length & 1
      val b = ByteBuffer.allocate(8 + body.length + pad)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      b.array()
    }.getOrElse(Array.empty[Byte])
    val b = ByteBuffer.allocate(12 + pre.length + 24 + 8 + data.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(-1)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put(pre)
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(audioFormat).putShort(channels)
    b.putInt(8000).putInt(8000 * blockAlign)
    b.putShort(blockAlign).putShort(bits)
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    b.put(data)
    b.array()
  }

  private val codec = Multimodal.wavPcmFrameCodec(4)

  test("frames PCM data in blockAlign-sized hops, trailing partial kept") {
    val data = (0 until 10).map(_.toByte).toArray
    // mono 8-bit: 4-sample frames = 4 bytes → [0..3], [4..7], [8..9]
    val frames = codec(wav(data, data.length), 10)
    assert(frames.map(_.toSeq) ===
      Seq(Seq[Byte](0, 1, 2, 3), Seq[Byte](4, 5, 6, 7), Seq[Byte](8, 9)))
  }

  test("blockAlign scales the hop: 16-bit stereo frames are 4x bytes") {
    val data = (0 until 20).map(_.toByte).toArray
    // blockAlign 4: 4-sample frames = 16 bytes → one full + one 4-byte
    val frames = codec(
      wav(data, data.length, channels = 2, blockAlign = 4, bits = 16), 10)
    assert(frames.map(_.length) === Seq(16, 4))
    assert(frames.head.toSeq === (0 until 16).map(_.toByte).toSeq)
  }

  test("maxFrames caps output; streaming data size reads to payload end") {
    val data = (0 until 12).map(_.toByte).toArray
    assert(codec(wav(data, -1), 2).map(_.toSeq) ===
      Seq((0 until 4).map(_.toByte).toSeq, (4 until 8).map(_.toByte).toSeq))
  }

  test("unknown chunks (odd-sized included) are skipped, not fatal") {
    val data = (0 until 4).map(_.toByte).toArray
    val frames = codec(wav(data, data.length,
      preChunk = Some("LIST" -> Array[Byte](1, 2, 3))), 10)
    assert(frames.map(_.toSeq) === Seq((0 until 4).map(_.toByte).toSeq))
  }

  test("adversarial chunk sizes reject as Nil instead of spinning or " +
    "throwing") {
    // a skip-chunk whose LE size is 0xFFFFFFF8 once made the offset
    // wrap to itself (infinite loop); 0x80000000 drove it negative
    // (ArrayIndexOutOfBounds). Both must reject within the contract.
    def withBadChunk(size: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(12 + 8 + 8)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(-1)
      b.put("WAVE".getBytes("US-ASCII"))
      b.put("LIST".getBytes("US-ASCII")).putInt(size)
      b.put("data".getBytes("US-ASCII")).putInt(-1)
      b.array()
    }
    assert(codec(withBadChunk(0xFFFFFFF8), 10) === Nil)
    assert(codec(withBadChunk(0x80000000), 10) === Nil)
    assert(codec(withBadChunk(0xFFFFFFFF), 10) === Nil)
  }

  test("an fmt chunk whose declared size is too short for PCM fields " +
    "rejects instead of reading the next chunk's bytes") {
    // fmt declares sz=4: blockAlign would come from the following
    // data chunk's header if the size weren't validated
    val b = ByteBuffer.allocate(12 + 8 + 4 + 8 + 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(-1)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(4)
    b.putShort(1).putShort(1) // "PCM mono" but the chunk ends here
    b.put("data".getBytes("US-ASCII")).putInt(4)
    b.put(Array[Byte](9, 9, 9, 9))
    assert(codec(b.array(), 10) === Nil)
  }

  test("reject paths all yield Nil: garbage, non-PCM, truncated, no data") {
    val data = (0 until 4).map(_.toByte).toArray
    assert(codec("not a wav at all".getBytes, 10) === Nil)
    assert(codec(Array[Byte](1, 2), 10) === Nil)
    assert(codec(wav(data, data.length, audioFormat = 3), 10) === Nil,
      "IEEE-float WAV is not PCM")
    assert(codec(wav(data, data.length).take(20), 10) === Nil,
      "payload truncated inside fmt")
    assert(codec(wav(data, data.length), 0) === Nil, "maxFrames 0")
  }
}
