package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph centrality over an edge table — the crawl- and
  * catalog-prioritization primitive (CommonCrawl ranks its frontier
  * by link centrality; a marketplace ranks products by who buys
  * them). PageRank as iterated relational algebra: no graph runtime,
  * no message passing — each iteration is a join from ranks to edges
  * plus a map-side-combined sum on the destination, exactly the shape
  * Catalyst/AQE already know how to scale (skew-split the hot-page
  * join, combine contributions before the exchange — a celebrity
  * node's in-mass arrives as ≤ #partitions partials, never a row
  * list).
  *
  * Integer-deterministic (the q101/q116 DIV convention): mass starts
  * at `scale DIV n` per node, a node's contribution is
  * `rank DIV out_degree`, and the damped update is
  * `(100-d)·(scale DIV n) DIV 100 + d·in_mass DIV 100` — every value
  * non-negative int64 (in_mass ≤ scale = 10¹²; d·in_mass ≤ 10¹⁴), so
  * the q153 oracle replays all iterations bit-for-bit and the result
  * is independent of partitioning, join order and summation order.
  * Truncation loses mass deterministically — PageRank needs ordering
  * fidelity, not conservation.
  *
  * Dangling nodes (no out-edges): their mass leaks instead of
  * teleporting — deterministic and cheap (redistributing it costs a
  * global scalar per iteration); callers who need conservation
  * symmetrize the edge set (a symmetric graph has no dangling
  * nodes), which is what the q153 query does.
  */
object Graph {

  /** `iters` rounds of damped PageRank over directed `edges`.
    * Duplicate edges count once (the edge set is deduplicated here —
    * multiplicity-weighted ranking is a different operator).
    *
    * @return (node, score) for every node appearing as a src or dst,
    *         unordered — compose with orderBy/limit for a top-k board
    *         (TakeOrderedAndProject keeps that bounded). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 3, scale: Long = 1000000000000L,
               dampingPct: Int = 85): DataFrame = {
    require(iters >= 1 && iters <= 20,
      s"iters must be in [1, 20] (each is a full edge shuffle), got $iters")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0, 100], got $dampingPct")
    require(scale >= 1L && scale <= 1000000000000000L,
      s"scale must be in [1, 1e15] (keeps d*mass int64-safe), got $scale")
    val e = edges
      .select(col(srcCol).as("_src"), col(dstCol).as("_dst"))
      .distinct()
    val nodes = e.select(col("_src").as("node"))
      .union(e.select(col("_dst").as("node")))
      .distinct()
    val nn = nodes.agg(count(lit(1)).as("_n"))
    val deg = e.groupBy(col("_src")).agg(count(lit(1)).as("_d"))
    // base (teleport) share rides along as a column so each round is
    // pure relational algebra over (node, score, _base)
    var ranks = nodes.crossJoin(broadcast(nn))
      .select(col("node"), expr(s"${scale}L div _n").as("_base"))
      .select(col("node"), col("_base"), col("_base").as("score"))
    for (_ <- 1 to iters) {
      val inMass = ranks
        .join(deg, ranks("node") === deg("_src"))
        .select(col("_src"), expr("score div _d").as("_c"))
        .join(e, Seq("_src"))
        .groupBy(col("_dst")).agg(sum(col("_c")).as("_m"))
      ranks = ranks
        .join(inMass, ranks("node") === inMass("_dst"), "left")
        .select(col("node"), col("_base"),
          (expr(s"((100L - ${dampingPct}L) * _base) div 100L") +
            expr(s"(${dampingPct}L * coalesce(_m, 0L)) div 100L"))
            .as("score"))
    }
    ranks.select(col("node"), col("score"))
  }
}
