package graft

import org.apache.spark.sql.functions._
import graft.graph.Graph

/** Fixed-point PageRank: hand-computed supersteps, dangling/dup/null
  * edge handling, and the determinism the integer arithmetic buys.
  */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  // A(1)→B(2), B→A, B→C(3); C dangles
  private def edges = Seq((1L, 2L), (2L, 1L), (2L, 3L))
    .toDF("src", "dst")

  private def ranks(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("hand-computed supersteps (unit/N start, div arithmetic)") {
    // r0 = 1e9/3 = 333333333 each
    assert(ranks(Graph.pageRank(edges, iters = 0)) ===
      Map(1L -> 333333333L, 2L -> 333333333L, 3L -> 333333333L))
    // base = 3e9/20/3 = 50000000
    // contribs: A←B/2=166666666, B←A=333333333, C←B/2=166666666
    // r1(A) = 50000000 + 17*166666666 div 20 = 191666666
    // r1(B) = 50000000 + 17*333333333 div 20 = 333333333
    assert(ranks(Graph.pageRank(edges, iters = 1)) ===
      Map(1L -> 191666666L, 2L -> 333333333L, 3L -> 191666666L))
  }

  test("duplicate and null edges collapse/drop; dangling mass is not redistributed") {
    val noisy = edges
      .unionByName(Seq((1L, 2L)).toDF("src", "dst")) // dup
      .unionByName(Seq((Option.empty[Long], Option(9L)))
        .toDF("src", "dst")) // null src
    assert(ranks(Graph.pageRank(noisy, iters = 1)) ===
      ranks(Graph.pageRank(edges, iters = 1)))
    // C dangles: total mass after an iteration is below 1e9 (leak is
    // documented, ordering is what matters)
    val total = ranks(Graph.pageRank(edges, iters = 2)).values.sum
    assert(total < 1000000000L)
  }

  test("bit-exact determinism across runs and partitionings") {
    val a = ranks(Graph.pageRank(edges.repartition(7), iters = 3))
    val b = ranks(Graph.pageRank(edges.repartition(2), iters = 3))
    assert(a === b)
  }

  test("triangle counts: hand graph, dedup/self-loop/reverse handling, zeros kept") {
    // triangles {1,2,3} and {2,3,4}; 5–6 is triangle-free
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L),
      (3L, 2L), // reverse duplicate
      (2L, 2L), // self loop
      (1L, 2L)) // duplicate
      .toDF("src", "dst")
    val got = Graph.triangleCounts(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L,
      5L -> 0L, 6L -> 0L))
    // no quadratic operator in the plan (wedge join is equi on u)
    val plan = Graph.triangleCounts(e)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("BFS hops: hand graph, depth bound, unreachable as NULL") {
    // 1→2→3→4, 5→4, 6 isolated-ish (6→6 self loop keeps it a node)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 4L), (6L, 6L))
      .toDF("src", "dst")
    val src = Seq(1L).toDF("id")
    def hops(iters: Int): Map[Long, Option[Long]] =
      Graph.shortestHops(e, src, iters).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(hops(4) === Map(1L -> Some(0L), 2L -> Some(1L),
      3L -> Some(2L), 4L -> Some(3L), 5L -> None, 6L -> None))
    // depth bound: 2 supersteps cannot reach node 4
    assert(hops(2)(4L) === None)
    // multi-source takes the min
    val multi = Graph.shortestHops(e, Seq(1L, 5L).toDF("id"), 4)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(multi(4L) === Some(1L)) // via 5, not the 3-hop path via 1
  }

  test("guards: empty graph and bad damping refuse") {
    val e1 = intercept[IllegalArgumentException](
      Graph.pageRank(edges.limit(0), iters = 1))
    assert(e1.getMessage.contains("no nodes"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Graph.pageRank(edges, iters = 1, dampingNum = 21, dampingDen = 20))
    assert(e2.getMessage.contains("damping"), e2.getMessage)
  }
}
