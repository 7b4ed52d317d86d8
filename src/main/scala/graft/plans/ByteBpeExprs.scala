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

  /** Flat inverse of [[byteToChar]] for the per-character decode hot
    * path (max symbol char is 323): chars outside the alphabet decode
    * as '?'. A boxed Map lookup per character would dominate a
    * corpus-wide decode; this is one array index, mirroring the
    * encode side's flat [[byteToChar]].
    */
  val charToByteFlat: Array[Byte] = {
    val out = Array.fill[Byte](byteToChar.max.toInt + 1)('?'.toByte)
    byteToChar.zipWithIndex.foreach { case (c, b) =>
      out(c.toInt) = b.toByte }
    out
  }

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

  @transient private lazy val ranks: java.util.HashMap[String, Integer] =
    BpeWalk.ranksOf(merges)

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
      BpeWalk.merge(toks, ranks)
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
        val c = t.charAt(j).toInt
        bos.write(
          if (c < BpeBytes.charToByteFlat.length)
            BpeBytes.charToByteFlat(c).toInt
          else '?'.toInt)
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
