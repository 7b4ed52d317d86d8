package graft.plans

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{Intersection, SetOperation, Sketches,
  Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate
  .TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType,
  LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketches as native Catalyst aggregates — the SET-OPERATION
  * member of the mergeable-sketch family, and the one HLL cannot
  * substitute for: theta sketches INTERSECT (and A-not-B), so a
  * store of per-segment sketches answers "how many users in BOTH
  * segments" / "corpus overlap across shards" without ever joining
  * the raw sets. Same `TypedImperativeAggregate` shape as
  * [[KllSketchAgg]]: the live Union/Intersection gadget rides the
  * aggregation buffer (both are natively resumable — `toByteArray` +
  * `SetOperation.heapify` — so shuffle serialization is exact, not a
  * lossy compaction).
  */
case class ThetaSketchAgg(child: Expression, lgK: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(b: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType => b.update(v.asInstanceOf[Long])
      case DoubleType => b.update(v.asInstanceOf[Double])
      case StringType => b.update(v.asInstanceOf[UTF8String].toString)
      case other => throw new IllegalArgumentException(
        s"graft_theta_sketch: unsupported input type $other " +
          "(long, double and string are hashable)")
    }
    b
  }

  override def merge(b: Union, o: Union): Union = {
    b.union(o.getResult); b
  }

  override def eval(b: Union): Any = b.getResult.toByteArray
  override def serialize(b: Union): Array[Byte] = b.toByteArray
  override def deserialize(bytes: Array[Byte]): Union =
    SetOperation.heapify(Memory.wrap(bytes)).asInstanceOf[Union]

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_theta_sketch"
  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
}

/** Union previously-built theta sketches (binary column). */
case class ThetaUnionAgg(child: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def update(b: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) b.union(Sketches.heapifyCompactSketch(
      Memory.wrap(v.asInstanceOf[Array[Byte]])))
    b
  }

  override def merge(b: Union, o: Union): Union = {
    b.union(o.getResult); b
  }

  override def eval(b: Union): Any = b.getResult.toByteArray
  override def serialize(b: Union): Array[Byte] = b.toByteArray
  override def deserialize(bytes: Array[Byte]): Union =
    SetOperation.heapify(Memory.wrap(bytes)).asInstanceOf[Union]

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_theta_union"
  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaUnionAgg =
    copy(child = c)
}

/** INTERSECT previously-built theta sketches (binary column) across
  * the group's rows — the "users in EVERY segment" aggregate. The
  * Intersection gadget starts in its "no input yet" universal state;
  * it is itself resumable, so shuffle-boundary serialization
  * preserves that state exactly.
  */
case class ThetaIntersectAgg(child: Expression,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Intersection]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): Intersection =
    SetOperation.builder().buildIntersection()

  override def update(b: Intersection, input: InternalRow): Intersection = {
    val v = child.eval(input)
    if (v != null) b.intersect(Sketches.heapifyCompactSketch(
      Memory.wrap(v.asInstanceOf[Array[Byte]])))
    b
  }

  override def merge(b: Intersection, o: Intersection): Intersection = {
    if (o.hasResult) b.intersect(o.getResult)
    b
  }

  override def eval(b: Intersection): Any =
    if (b.hasResult) b.getResult.toByteArray
    else null // a group with zero sketches has no defined intersection

  override def serialize(b: Intersection): Array[Byte] = b.toByteArray
  override def deserialize(bytes: Array[Byte]): Intersection =
    SetOperation.heapify(Memory.wrap(bytes)).asInstanceOf[Intersection]

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_theta_intersect"
  override def withNewMutableAggBufferOffset(o: Int): ThetaIntersectAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaIntersectAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression)
      : ThetaIntersectAgg = copy(child = c)
}

/** A-NOT-B on two serialized theta sketches (scalar): the sketch of
  * the set difference — "users who clicked but never purchased" —
  * composing with [[ThetaEstimateExpr]] for the count.
  */
case class ThetaAnotBExpr(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with CodegenFallback {

  override def dataType: DataType = BinaryType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val op = SetOperation.builder().buildANotB()
    op.setA(Sketches.heapifyCompactSketch(
      Memory.wrap(a.asInstanceOf[Array[Byte]])))
    op.notB(Sketches.heapifyCompactSketch(
      Memory.wrap(b.asInstanceOf[Array[Byte]])))
    op.getResult(true).toByteArray
  }

  override def prettyName: String = "graft_theta_a_not_b"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaAnotBExpr = copy(l, r)
}

/** Distinct-count estimate of a serialized theta sketch (scalar, no
  * UDF; runs once per group).
  */
case class ThetaEstimateExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(sketch: Any): Any =
    Sketches.heapifyCompactSketch(
      Memory.wrap(sketch.asInstanceOf[Array[Byte]])).getEstimate

  override def prettyName: String = "graft_theta_estimate"
  override protected def withNewChildInternal(c: Expression)
      : ThetaEstimateExpr = copy(child = c)
}
