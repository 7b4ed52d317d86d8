package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram shingling: token array → array of space-joined
  * n-grams. The composed form (`transform(sequence(...), i =>
  * concat_ws(element_at...))`) is an interpreted lambda that
  * re-evaluates its inputs per element and falls out of whole-stage
  * codegen — this expression is one generated loop over UTF8String
  * slices, keeping the dedup pipelines' hottest projection (shingling
  * every document of a 100 TB corpus) inside codegen.
  *
  * Semantics match TextAnalysis.wordShinglesOf exactly: fewer than n
  * tokens → empty array.
  */
case class WordShinglesExpr(child: Expression, n: Int)
  extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_word_shingles"

  private val Sep = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[ArrayData]
    val cnt = w.numElements() - (n - 1)
    if (cnt < 1) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](cnt)
      var i = 0
      while (i < cnt) {
        val parts = new Array[UTF8String](n)
        var o = 0
        while (o < n) { parts(o) = w.getUTF8String(i + o); o += 1 }
        out(i) = UTF8String.concatWs(Sep, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, w => {
      val cnt = ctx.freshName("cnt")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val sep = ctx.addReferenceObj("sep", Sep,
        classOf[UTF8String].getName)
      val parts = (0 until n)
        .map(o => s"$w.getUTF8String($i + $o)").mkString(", ")
      val gad = classOf[GenericArrayData].getName
      val u8 = classOf[UTF8String].getName
      s"""
         |int $cnt = $w.numElements() - ${n - 1};
         |if ($cnt < 1) {
         |  ${ev.value} = new $gad(new Object[0]);
         |} else {
         |  Object[] $out = new Object[$cnt];
         |  for (int $i = 0; $i < $cnt; $i++) {
         |    $out[$i] = $u8.concatWs($sep, new $u8[]{ $parts });
         |  }
         |  ${ev.value} = new $gad($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): WordShinglesExpr = copy(child = newChild)
}
