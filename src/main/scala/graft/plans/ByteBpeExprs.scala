package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** GPT-2's public byte↔unicode symbol table (Radford et al. 2019,
  * `bytes_to_unicode`): every byte 0–255 maps to a printable BMP code
  * point — the 188 visually safe Latin-1 bytes map to themselves, the
  * remaining 68 (controls, space, DEL, soft hyphen) map to 256+n in
  * table order. Byte-level BPE built on this alphabet can represent
  * ANY input — there is no OOV — and the mapping inverts exactly, so
  * decode ∘ encode is the identity on every valid UTF-8 string.
  */
object BpeBytes {
  val byteToChar: Array[Char] = {
    val direct = ((0x21 to 0x7e) ++ (0xa1 to 0xac) ++
      (0xae to 0xff)).toSet
    val out = new Array[Char](256)
    var next = 256
    (0 until 256).foreach { b =>
      if (direct(b)) out(b) = b.toChar
      else { out(b) = next.toChar; next += 1 }
    }
    out
  }

  val charToByte: Map[Char, Byte] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b.toByte }.toMap

  /** The word's UTF-8 bytes as their symbol characters. */
  def symbols(word: String): String = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    bytes.foreach(b => sb.append(byteToChar(b & 0xff)))
    sb.toString
  }
}

/** Byte-level BPE tokenization: the [[BpeEncodeExpr]] greedy walk over
  * the [[BpeBytes]] symbol alphabet instead of raw code points. The
  * text still pre-tokenizes on single spaces, but each word boundary's
  * space is ENCODED (prefixed to the following word's symbols, GPT-2's
  * leading-space convention), so the flattened token stream loses
  * nothing: [[ByteBpeDecodeExpr]] inverts it byte-exactly for any
  * input, merges or no merges — the merges table only affects
  * compression, never representability.
  */
case class ByteBpeEncodeExpr(child: Expression,
                             merges: Seq[(String, String)])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_byte_bpe_encode"

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(a + "\u0001" + b, i)
    }
    m
  }

  /** Public for the generated code path. */
  def encode(text: UTF8String): GenericArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val words = text.toString.split(" ", -1)
    var wi = 0
    while (wi < words.length) {
      val sym = BpeBytes.symbols(if (wi == 0) words(wi) else " " + words(wi))
      val toks = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < sym.length) { toks += sym.substring(i, i + 1); i += 1 }
      var merging = toks.length > 1
      while (merging) {
        var bestRank = Int.MaxValue
        var bestIdx = -1
        var j = 0
        while (j < toks.length - 1) {
          val r = ranks.get(toks(j) + "\u0001" + toks(j + 1))
          if (r != null && r < bestRank) { bestRank = r; bestIdx = j }
          j += 1
        }
        if (bestIdx < 0) merging = false
        else {
          toks(bestIdx) = toks(bestIdx) + toks(bestIdx + 1)
          toks.remove(bestIdx + 1)
          merging = toks.length > 1
        }
      }
      toks.foreach(t => out += UTF8String.fromString(t))
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val codec = ctx.addReferenceObj("byteBpeCodec", this,
      classOf[ByteBpeEncodeExpr].getName)
    defineCodeGen(ctx, ev, c => s"$codec.encode($c)")
  }

  override def toString: String =
    s"graft_byte_bpe_encode(${merges.size} merges, $child)"

  override protected def withNewChildInternal(
      newChild: Expression): ByteBpeEncodeExpr = copy(child = newChild)
}

/** Inverse of [[ByteBpeEncodeExpr]]: concatenate the symbol tokens,
  * map each symbol back to its byte, and UTF-8-decode. Symbols outside
  * the table (impossible for encoder output) decode as '?' rather than
  * throwing — the corrupt-row contract.
  */
case class ByteBpeDecodeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_byte_bpe_decode"

  /** Public for the generated code path. */
  def decode(toks: ArrayData): UTF8String = {
    val n = toks.numElements()
    val bos = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i).toString
      var j = 0
      while (j < t.length) {
        bos.write(BpeBytes.charToByte.getOrElse(t.charAt(j), '?'.toByte)
          .toInt)
        j += 1
      }
      i += 1
    }
    UTF8String.fromBytes(bos.toByteArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    decode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val codec = ctx.addReferenceObj("byteBpeDecoder", this,
      classOf[ByteBpeDecodeExpr].getName)
    defineCodeGen(ctx, ev, c => s"$codec.decode($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): ByteBpeDecodeExpr = copy(child = newChild)
}
