package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers shared by interpreted eval and generated code. */
object Hash60 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes), big-endian — numerically identical
    * to parsing the first 15 hex chars of the md5 hex string as
    * base-16 (7 full bytes = 56 bits, then the high nibble of byte 7).
    */
  def hashUtf8(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    (v << 4) | ((digest(7) & 0xf0L) >> 4)
  }
}

/** Native portable 60-bit content hash (TextAnalysis.hash60's fused
  * form): md5 digest bytes → long directly, skipping the 32-char hex
  * string materialization and the base-16 `conv` parse of the
  * composed `conv(substring(md5(x), 1, 15), 16, 10)` chain. Runs on
  * every shingle/fingerprint/sample-membership evaluation in the
  * dedup and curation paths, so the per-call saving multiplies by
  * corpus size × shingles per document.
  *
  * Bit-identical to the composed form (first 15 hex chars == first 60
  * bits of the digest, big-endian) — asserted across both paths in
  * Hash60Spec — and therefore identical to the DuckDB oracle rule
  * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`.
  */
case class Hash60Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_hash60"

  override protected def nullSafeEval(input: Any): Any =
    Hash60.hashUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.Hash60.hashUtf8($s);")

  override protected def withNewChildInternal(
      newChild: Expression): Hash60Expr = copy(child = newChild)
}

/** Vectorized form: `array<string>` → `array<long>` in one generated
  * loop, element-identical to `transform(arr, s => hash60(s))`
  * including null elements (null in → null out; the output type's
  * containsNull mirrors the input's). The composed alternative is an
  * interpreted lambda that leaves whole-stage codegen and pays
  * per-element closure dispatch; on the dedup paths the array is every
  * document's shingle set, so the loop body runs |corpus| × |shingles|
  * times. The child must be `array<string>` (the library constructs
  * inputs type-correctly — same posture as CosineSimilarityExpr).
  */
case class Hash60ArrayExpr(child: Expression) extends UnaryExpression {

  import org.apache.spark.sql.types.ArrayType

  private def childContainsNull: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = childContainsNull)

  override def prettyName: String = "graft_hash60_array"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[
      org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        out(i) = Hash60.hashUtf8(arr.getUTF8String(i))
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val gad = "org.apache.spark.sql.catalyst.util.GenericArrayData"
      s"""
         |int $n = $arr.numElements();
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    $out[$i] = graft.plans.Hash60.hashUtf8($arr.getUTF8String($i));
         |  }
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Hash60ArrayExpr = copy(child = newChild)
}
