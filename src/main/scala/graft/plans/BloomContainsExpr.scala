package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter membership probe over a LONG key.
  *
  * Catalyst's own `BloomFilterMightContain` takes the serialized
  * filter as a child expression, which means a `Literal` of the whole
  * bit array — and every `.explain`/log line then prints the filter
  * as hex (megabytes of plan string for a real filter; observed 4.6 MB
  * at a toy 1 M-key sizing). Holding the bytes as a constructor field
  * instead keeps the plan string O(1) (`toString` prints the length
  * only), while the probe itself stays inside whole-stage codegen via
  * the same `addReferenceObj` route Spark's operator uses. The filter
  * deserializes lazily once per (de)serialized instance, not per row.
  *
  * Bit-compatible with filters built by `df.stat.bloomFilter` /
  * [[graft.etl.BloomJoin.buildFilter]] (both sides use
  * `putLong`/`mightContainLong`).
  */
case class BloomContainsExpr(filterBytes: Array[Byte], child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_bloom_contains"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$bf.mightContainLong($c)")
  }

  override def toString: String =
    s"graft_bloom_contains(${filterBytes.length}B, $child)"

  override protected def withNewChildInternal(
      newChild: Expression): BloomContainsExpr = copy(child = newChild)
}
