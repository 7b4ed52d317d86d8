package graft.dedup

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable MinHash sketch as a typed Aggregator (custom UDAF):
  * consumes pre-reduced shingle hashes (`TextAnalysis.hash60(s) % P`)
  * and keeps the k permutation minima. Because min is commutative and
  * associative, partial sketches merge — this is the building block
  * for *streaming* near-dup state (`mapGroupsWithState` keeping one
  * sketch per document/shard) and for map-side partial aggregation,
  * where the array-`transform` formulation cannot combine across rows.
  *
  * Produces exactly the same signature values as
  * [[Dedup.minhashSignatures]] (same `(a_i·h + b_i) mod p` family,
  * same empty-set sentinel p).
  */
class MinHashAgg(k: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Dedup.P)

  override def reduce(acc: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < k) {
      val v = (Dedup.hashA(i) * h + Dedup.hashB(i)) % Dedup.P
      if (v < acc(i)) acc(i) = v
      i += 1
    }
    acc
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(acc: Array[Long]): Seq[Long] = acc.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object MinHashAgg {
  /** Estimated Jaccard similarity of two equal-length signatures:
    * fraction of agreeing minima.
    */
  def estimateJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    require(a.length == b.length)
    a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
  }
}
