package graft.plans

/** The greedy lowest-rank-first merge walk shared by every BPE apply
  * path — the char-level codegen expression ([[BpeEncodeExpr]]), the
  * byte-level one ([[ByteBpeEncodeExpr]]), and the trainer's
  * driver-side segmenter (`TextAnalysis.greedySegment`) — one
  * implementation, so a tie-break or separator change can never
  * desynchronize training from application.
  */
object BpeWalk {

  /** Rank-key separator: U+0001, matching the oracle's `chr(1)`, as
    * an escape so sources stay pure ASCII.
    */
  val Sep = "\u0001"

  /** pair → rank; first occurrence wins, matching training-time merge
    * tables where each pair appears once.
    */
  def ranksOf(merges: Seq[(String, String)])
      : java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(a + Sep + b, i)
    }
    m
  }

  /** In-place greedy merge: repeatedly fuse the adjacent pair with
    * the LOWEST rank (ties → leftmost occurrence) until no adjacent
    * pair is in the table. Single pass per round, bounded by the
    * token count (a sequence of n symbols does at most n−1 merges).
    */
  def merge(toks: scala.collection.mutable.ArrayBuffer[String],
            ranks: java.util.HashMap[String, Integer]): Unit = {
    var merging = toks.length > 1
    while (merging) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var j = 0
      while (j < toks.length - 1) {
        val r = ranks.get(toks(j) + Sep + toks(j + 1))
        if (r != null && r < bestRank) { bestRank = r; bestIdx = j }
        j += 1
      }
      if (bestIdx < 0) merging = false
      else {
        toks(bestIdx) = toks(bestIdx) + toks(bestIdx + 1)
        toks.remove(bestIdx + 1)
        merging = toks.length > 1
      }
    }
  }
}
