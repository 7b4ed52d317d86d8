package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy merges-table BPE tokenization of whitespace-split text (the
  * published byte-pair-encoding scheme of Sennrich et al. 2016 /
  * GPT-2's tokenizer): each word starts as its character sequence and
  * the adjacent pair with the LOWEST merge rank is merged repeatedly
  * (ties → leftmost occurrence) until no pair is in the merges table;
  * the flattened per-word subword sequences are the output, in
  * document order.
  *
  * One expression rather than a `transform(split(...), w => ...)`
  * composition for the same reason as [[WordShinglesExpr]]: HOF
  * lambdas are interpreted per element and drop the projection out of
  * whole-stage codegen, while this node stays a single generated call
  * — the shape that matters when the tokenizer runs over every
  * document of a 100 TB corpus. The merges table rides the expression
  * as a plain reference object (`toString` prints its size, never its
  * contents, so plan strings stay O(1) like
  * [[BloomContainsExpr]]'s).
  */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  // an EMPTY merges table is legal: encoding degenerates to the
  // character split — iteration 0 of BPE training

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_bpe_encode"

  /** pair → rank; first occurrence wins, matching training-time merge
    * tables where each pair appears once. The U+0001 key separator
    * matches the oracle's chr(1) and is written as an escape so the
    * source stays pure ASCII.
    */
  @transient private lazy val ranks: java.util.HashMap[String, Integer] =
    BpeWalk.ranksOf(merges)

  /** Public for the generated code path; single pass per merge round,
    * bounded by word length (a word of n chars does at most n−1
    * merges).
    */
  def encode(text: UTF8String): GenericArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    text.toString.split(" ", -1).foreach { word =>
      val toks = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < word.length) {
        val n = Character.charCount(word.codePointAt(i))
        toks += word.substring(i, i + n)
        i += n
      }
      BpeWalk.merge(toks, ranks)
      toks.foreach(t => out += UTF8String.fromString(t))
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val codec = ctx.addReferenceObj("bpeCodec", this,
      classOf[BpeEncodeExpr].getName)
    defineCodeGen(ctx, ev, c => s"$codec.encode($c)")
  }

  override def toString: String =
    s"graft_bpe_encode(${merges.size} merges, $child)"

  override protected def withNewChildInternal(
      newChild: Expression): BpeEncodeExpr = copy(child = newChild)
}
