package graft.graph

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions.{coalesce, col, count, lit, sum}

/** Iterative graph analytics over edge tables — the Pregel-shaped
  * family ([[graft.dedup.Dedup.clusters]]' min-label propagation is
  * the other member). Everything here is expressed as joins +
  * aggregations so Catalyst plans it: one hash join on the source key
  * plus one groupBy on the destination per superstep, the canonical
  * MapReduce-PageRank shape that scales to any edge count.
  */
object Graph {

  /** Fixed-iteration PageRank in 1e-9 FIXED-POINT integer arithmetic:
    * every quantity is a non-negative long number of "nano-rank"
    * units, all divisions are integer divisions, so the result is
    * BIT-EXACT across engines (float summation order — the usual
    * cross-engine divergence — never appears; the driver's DuckDB
    * oracle replays the iterations with `//` and matches hashes).
    *
    *   r_0(v)   = 1e9 / N
    *   r_t+1(v) = ((den−num)·1e9/den)/N + num · Σ_{u→v} (r_t(u)/deg(u)) / den
    *
    * with damping num/den (default 17/20 = 0.85). Duplicate edges
    * collapse first (an edge table, not a multigraph); rank mass
    * leaking through dangling nodes and integer truncation is NOT
    * redistributed — the standard simplification when ranking is the
    * goal (ordering is unaffected; absolute mass is not conserved).
    *
    * Scale: each iteration is ONE equi-join of edges against the
    * current ranks on src (plus the tiny out-degree table, computed
    * once) and ONE sum-by-dst — both map-side combinable; lineage is
    * cut per iteration so a 50-superstep run doesn't build a
    * 50-join plan. Returns `(id, rank_q)` — nano-rank longs; divide
    * by 1e9 for the conventional value.
    */
  def pageRank(edges: DataFrame, iters: Int,
               srcCol: String = "src", dstCol: String = "dst",
               dampingNum: Long = 17L, dampingDen: Long = 20L): DataFrame = {
    require(iters >= 0, s"iters must be >= 0: $iters")
    require(dampingNum >= 0 && dampingDen > 0 && dampingNum <= dampingDen,
      s"damping $dampingNum/$dampingDen must sit in [0, 1]")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint()
    val n = nodes.count()
    require(n > 0, "pageRank: the edge table has no nodes")
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val unit = 1000000000L
    val base = (dampingDen - dampingNum) * unit / dampingDen / n
    var r = nodes.select(col("id"), lit(unit / n).as("rank_q"))
    for (_ <- 0 until iters) {
      val contribs = e.join(r, e("src") === r("id"))
        .join(deg, "src")
        .select(col("dst").as("id"),
          F.expr("rank_q div outdeg").as("c"))
        .groupBy("id").agg(sum("c").as("s"))
      r = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"), coalesce(col("s"), lit(0L)).as("s0"))
        .select(col("id"),
          (lit(base) + F.expr(s"($dampingNum * s0) div $dampingDen"))
            .as("rank_q"))
        .localCheckpoint()
    }
    r
  }
}
