package graft

import java.nio.{ByteBuffer, ByteOrder}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import graft.multimodal.Multimodal

/** Property-based fuzz for the pure-JVM container codecs: roundtrip
  * laws on arbitrary frame content, and the never-throw contract on
  * arbitrary byte garbage — the class of malformed-input defect
  * (offset wraps, stack bombs, short headers) that example-based
  * specs can only sample. Seeded: failures reproduce.
  */
class CodecFuzzSpec extends SparkSpec {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(200)
        .withInitialSeed(Seed(42L)),
      prop)
    assert(res.passed, s"$name: $res")
  }

  private val byteArrayGen: Gen[Array[Byte]] =
    Gen.chooseNum(0, 64).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
        .map(_.toArray))

  test("AVI: mux→demux returns every frame byte-exactly, any content/count") {
    check("avi roundtrip", Prop.forAll(
      Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, byteArrayGen))) {
      frames =>
        val got = Multimodal.aviFrameCodec(
          Multimodal.aviMux(frames), frames.size + 1)
        got.size == frames.size &&
          got.zip(frames).forall { case (g, w) => g.sameElements(w) }
    })
  }

  test("AVI: the frame budget is always honored") {
    check("avi budget", Prop.forAll(
      Gen.chooseNum(1, 10).flatMap(n => Gen.listOfN(n, byteArrayGen)),
      Gen.chooseNum(0, 15)) { (frames, budget) =>
      Multimodal.aviFrameCodec(Multimodal.aviMux(frames), budget)
        .size == math.min(frames.size, budget)
    })
  }

  private def wav(data: Array[Byte], blockAlign: Short): Array[Byte] = {
    val b = ByteBuffer.allocate(12 + 24 + 8 + data.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1).putShort(1).putInt(8000)
    b.putInt(8000 * blockAlign).putShort(blockAlign).putShort(8)
    b.put("data".getBytes("US-ASCII")).putInt(data.length)
    b.put(data)
    b.array()
  }

  test("WAV: frames re-concatenate to the data; hop sizes honored") {
    check("wav roundtrip", Prop.forAll(
      byteArrayGen,
      Gen.chooseNum[Short](1, 8),
      Gen.chooseNum(1, 16)) { (data, ba, spf) =>
      val frames = Multimodal.wavPcmFrameCodec(spf)(wav(data, ba), 1000)
      val hop = spf * ba
      frames.flatten.sameElements(data) &&
        frames.dropRight(1).forall(_.length == hop) &&
        frames.lastOption.forall(f => f.length <= hop && f.nonEmpty)
    })
  }

  test("byte chunks: re-concatenation law and chunk bounds") {
    check("chunk roundtrip", Prop.forAll(
      byteArrayGen, Gen.chooseNum(1, 16)) { (data, n) =>
      val frames = Multimodal.byteChunkCodec(n)(data, 1000)
      frames.flatten.sameElements(data) &&
        frames.dropRight(1).forall(_.length == n)
    })
  }

  test("all codecs: arbitrary byte garbage never throws") {
    val codecs = Seq[Multimodal.FrameCodec](
      Multimodal.aviFrameCodec,
      Multimodal.wavPcmFrameCodec(4),
      Multimodal.byteChunkCodec(8),
      Multimodal.imageFrameCodec)
    check("garbage never throws", Prop.forAll(
      Gen.chooseNum(0, 256).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
          .map(_.toArray))) { junk =>
      codecs.forall { c => c(junk, 4); true }
    })
  }

  test("AVI garbage with a valid RIFF prologue never throws either") {
    // the hard cases start with plausible headers and lie afterwards
    check("riff-prefixed garbage", Prop.forAll(byteArrayGen) { tail =>
      val p = "RIFF".getBytes("US-ASCII") ++
        Array[Byte](-1, -1, -1, -1) ++
        "AVI ".getBytes("US-ASCII") ++ tail
      Multimodal.aviFrameCodec(p, 4); true
    })
  }
}
