package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra–Gries heavy-hitters sketch as a typed Aggregator
  * (custom UDAF): bounded-memory frequent-items summary over an
  * unbounded key domain — the piece exact top-k aggregation lacks at
  * 100 TB, where a vocabulary aggregate's key space (all distinct
  * tokens/urls/ids) can itself exceed executor memory. The sketch
  * holds at most `2k` counters per partial regardless of input size,
  * partials combine map-side (merge-then-compress is associative in
  * the guarantee, if not bit-for-bit in the counts), and the same
  * structure drops into `mapGroupsWithState` as streaming state.
  *
  * GUARANTEE (order- and partitioning-independent, the property the
  * oracle gate checks): every compression subtracts its decrement from
  * at least k+1 distinct counters at once, so the total undercount of
  * any single item is at most n/(k+1). Hence any item with true
  * frequency > n/(k+1) is ALWAYS present in the final sketch, and each
  * stored count is in [true − n/(k+1), true]. The counts themselves
  * depend on merge order — gate on membership and exact-side counts,
  * never on sketch counts.
  *
  * The buffer grows to 2k before compressing back to ≤ k survivors
  * (subtract the (k+1)-th largest count, drop the non-positive): the
  * classic decrement-on-every-overflow variant pays an O(k) scan per
  * row once full; amortizing over k insertions makes reduce O(1)ish
  * while preserving the same guarantee.
  */
class HeavyHittersAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, s"k must be positive: $k")

  override def zero: Map[String, Long] = Map.empty

  private def compress(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= 2 * k) m
    else {
      // (k+1)-th largest stored count; subtracting it leaves <= k
      // positive survivors and decrements >= k+1 distinct items
      val c = m.values.toArray.sortInPlaceWith(_ > _).apply(k)
      m.collect { case (t, n) if n > c => t -> (n - c) }
    }

  override def reduce(acc: Map[String, Long], item: String)
      : Map[String, Long] =
    compress(acc.updated(item, acc.getOrElse(item, 0L) + 1L))

  override def merge(a: Map[String, Long], b: Map[String, Long])
      : Map[String, Long] = {
    val (small, big) = if (a.size < b.size) (a, b) else (b, a)
    compress(small.foldLeft(big) { case (m, (t, n)) =>
      m.updated(t, m.getOrElse(t, 0L) + n)
    })
  }

  override def finish(acc: Map[String, Long]): Map[String, Long] = acc

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Map[String, Long]]()
}

/** Fold PREVIOUSLY-BUILT Misra–Gries sketches (map columns) — the
  * store-merge aggregate behind [[graft.io.Sinks
  * .mergeHeavyHittersSketch]], reusing [[HeavyHittersAgg]]'s merge
  * so the n/(k+1) retention guarantee composes across batches
  * exactly as it does across partials.
  */
class HeavyHittersMergeAgg(k: Int)
    extends Aggregator[Map[String, Long], Map[String, Long],
      Map[String, Long]] {
  private val inner = new HeavyHittersAgg(k)
  override def zero: Map[String, Long] = inner.zero
  override def reduce(acc: Map[String, Long],
                      m: Map[String, Long]): Map[String, Long] =
    inner.merge(acc, if (m == null) inner.zero else m)
  override def merge(a: Map[String, Long],
                     b: Map[String, Long]): Map[String, Long] =
    inner.merge(a, b)
  override def finish(acc: Map[String, Long]): Map[String, Long] = acc
  override def bufferEncoder: Encoder[Map[String, Long]] =
    inner.bufferEncoder
  override def outputEncoder: Encoder[Map[String, Long]] =
    inner.outputEncoder
}
