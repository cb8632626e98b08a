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
    * Duplicate edges count once (the edge set is deduplicated here
    * unless the caller vouches with `assumeDistinct` — multiplicity-
    * weighted ranking is a different operator).
    *
    * Iterated-lineage hygiene (the clusterReps lesson, re-measured
    * here as a 14 s q153 at sf0.1): the naive update references
    * `ranks` twice (out-mass + the left join's spine), so a lazily-
    * composed loop doubles the logical plan every round — 2^iters
    * copies of the caller's edge derivation by the end. Restructured
    * so each round references `ranks` exactly ONCE: the spine is a
    * STATIC `(node, base)` table and contributions flow through a
    * pre-joined `(src, dst, out_degree)` table, both eagerly
    * localCheckpointed up front. Lineage then grows linearly, the
    * whole loop executes lazily as ONE job (exchanges amortize, no
    * per-round barrier), and only deep runs (> 8 rounds) insert a
    * mid-loop checkpoint, freeing the superseded one registry-diff
    * style. Measured at sf0.1 (1.2 M edges, 3 rounds): 14.1 s → ~4 s.
    *
    * @return (node, score) for every node appearing as a src or dst,
    *         unordered — compose with orderBy/limit for a top-k board
    *         (TakeOrderedAndProject keeps that bounded). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 3, scale: Long = 1000000000000L,
               dampingPct: Int = 85,
               assumeDistinct: Boolean = false): DataFrame = {
    require(iters >= 1 && iters <= 20,
      s"iters must be in [1, 20] (each is a full edge shuffle), got $iters")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0, 100], got $dampingPct")
    require(scale >= 1L && scale <= 1000000000000000L,
      s"scale must be in [1, 1e15] (keeps d*mass int64-safe), got $scale")
    dampedLoop(edges, srcCol, dstCol, iters, dampingPct, assumeDistinct) {
      (nodes, nn) =>
        nodes.crossJoin(broadcast(nn))
          .select(col("node"), expr(s"${scale}L div _n").as("_base"))
    }
  }

  /** PERSONALIZED PageRank: identical damped loop, but the teleport
    * mass lands only on `seeds` (`scale div nSeeds` each; every other
    * node's base is 0) — "centrality as seen from this user segment /
    * crawl frontier", the recommendation and focused-crawl variant.
    * Seeds not present in the graph are ignored (they have no edges
    * to carry mass anyway); seed ids are deduplicated. */
  def personalizedPageRank(edges: DataFrame, srcCol: String,
                           dstCol: String, seeds: DataFrame,
                           seedCol: String, iters: Int = 3,
                           scale: Long = 1000000000000L,
                           dampingPct: Int = 85,
                           assumeDistinct: Boolean = false): DataFrame = {
    require(iters >= 1 && iters <= 20,
      s"iters must be in [1, 20] (each is a full edge shuffle), got $iters")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0, 100], got $dampingPct")
    require(scale >= 1L && scale <= 1000000000000000L,
      s"scale must be in [1, 1e15] (keeps d*mass int64-safe), got $scale")
    val sd = seeds.select(col(seedCol).as("node")).distinct()
    dampedLoop(edges, srcCol, dstCol, iters, dampingPct, assumeDistinct) {
      (nodes, _) =>
        // count only seeds that exist in the graph, so the per-seed
        // share matches what actually lands
        val inGraph = nodes.join(sd, Seq("node"), "left_semi")
        val ns = inGraph.agg(count(lit(1)).as("_ns"))
        nodes
          .join(inGraph.select(col("node"), lit(1).as("_is_seed")),
            Seq("node"), "left")
          .crossJoin(broadcast(ns))
          .select(col("node"),
            when(col("_is_seed").isNotNull, expr(s"${scale}L div _ns"))
              .otherwise(lit(0L)).as("_base"))
    }
  }

  /** Triangle census over an undirected graph — the clustering /
    * community-density primitive (a co-purchase or co-citation
    * neighborhood with many triangles is a tight cluster; triangle
    * counts also drive clustering coefficients and spam detection).
    * Pure relational algebra: edges are canonicalized to `a < b`
    * (either input orientation accepted, duplicates collapse,
    * self-loops dropped), wedges `e(a,b)⨝e(b,c)` close against
    * `e(a,c)` — each triangle emerges exactly once in `a < b < c`
    * order — and the per-node census explodes the three corners into
    * one map-side-combined count.
    *
    * Scale shape: the wedge join's cardinality is Σ_b deg(b)² — the
    * caller bounds it by thresholding edges first (q169 floors the
    * co-purchase weight), and a celebrity node's wedge fan-out is an
    * AQE-splittable JOIN key, never a window.
    *
    * @return (node, n_triangles) for nodes in ≥ 1 triangle. */
  def triangleCensus(edges: DataFrame, aCol: String,
                     bCol: String): DataFrame =
    triangleCensusCanon(canonEdges(edges, aCol, bCol))

  /** Canonical undirected edge set: `a < b`, orientation/duplicate
    * tolerant, self-loops dropped — the normalization both census
    * operators share. */
  private def canonEdges(edges: DataFrame, aCol: String,
                         bCol: String): DataFrame =
    edges
      .select(least(col(aCol), col(bCol)).as("_a"),
        greatest(col(aCol), col(bCol)).as("_b"))
      .filter(col("_a") =!= col("_b"))
      .distinct()

  private def triangleCensusCanon(canon: DataFrame): DataFrame = {
    val tri = canon.as("x")
      .join(canon.as("y"), col("x._b") === col("y._a"))
      .join(canon.as("z"),
        col("z._a") === col("x._a") && col("z._b") === col("y._b"))
      .select(col("x._a").as("_n1"), col("x._b").as("_n2"),
        col("y._b").as("_n3"))
    tri
      .select(explode(array(col("_n1"), col("_n2"), col("_n3")))
        .as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
  }

  /** Local clustering coefficient per node — how close each node's
    * neighborhood is to a clique: `2·T(v)·10⁶ div (deg·(deg−1))` ppm
    * (integer div — engine-exact; 1 000 000 = every neighbor pair
    * closed). Nodes of degree < 2 score 0 (no pair to close); nodes
    * in no triangle still appear (the degree census is the spine).
    * int64-exact while `2·T(v)·10⁶` fits — to ~3·10⁶ degree on a
    * clique-dense node; beyond that, stage the division like the PMI
    * convention.
    *
    * Scale shape: the degree census explodes endpoints into ONE
    * map-side-combined count; triangles via [[triangleCensus]] (the
    * wedge argument there); one left join on the node id.
    *
    * @return (node, degree, n_triangles, cc_ppm). */
  def clusteringCoefficients(edges: DataFrame, aCol: String,
                             bCol: String): DataFrame = {
    val canon = canonEdges(edges, aCol, bCol)
    val deg = canon
      .select(explode(array(col("_a"), col("_b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    deg.join(triangleCensusCanon(canon), Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .select(col("node"), col("degree"), col("n_triangles"),
        when(col("degree") < 2L, lit(0L))
          .otherwise(expr(
            "(n_triangles * 2000000L) div (degree * (degree - 1L))"))
          .as("cc_ppm"))
  }

  /** The shared damped-update loop (see [[pageRank]]'s scaladoc for
    * the lineage-hygiene design): `mkBase` builds the static
    * `(node, _base)` teleport table from the node set and its count. */
  /** HITS hubs & authorities (Kleinberg 1999) — the OTHER link
    * centrality: PageRank scores "where a random surfer lands"; HITS
    * separates DIRECTORY pages (hubs — point at good content) from
    * CONTENT pages (authorities — pointed at by good hubs), the
    * asymmetry a crawl scheduler exploits (fetch authorities for the
    * corpus, fetch hubs for DISCOVERY — a high-hub page refills the
    * frontier). Same iterated-relational discipline as [[pageRank]]:
    * each half-step is one join from the opposite score to the edge
    * table plus a map-side-combined sum — no graph runtime.
    *
    * Integer determinism: scores start at `scale` per node and each
    * half-step sum-normalizes back to ≈`scale` total via the integer
    * quotient `raw div greatest(tot div scale, 1)` — one global
    * scalar per half-step (HITS requires normalization; the L2 norm
    * of the textbook is replaced by the sum norm, which steers the
    * same power iteration and stays in int64: raw ≤ n·scale, so
    * `scale ≤ 1e9` keeps every sum exact for n ≤ 9.2e9 nodes).
    * Truncation loses mass deterministically, as in [[pageRank]].
    *
    * @return (node, hub_score, auth_score) for every node appearing
    *         as src or dst; nodes with no in-edges carry auth 0,
    *         no out-edges hub 0. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int = 2, scale: Long = 1000000000L,
           assumeDistinct: Boolean = false): DataFrame = {
    require(iters >= 1 && iters <= 20,
      s"iters must be in [1, 20] (each is two edge shuffles), got $iters")
    require(scale >= 1L && scale <= 1000000000L,
      s"scale must be in [1, 1e9] (keeps n·scale sums int64-safe), got $scale")
    val e0 = edges.select(col(srcCol).as("_src"), col(dstCol).as("_dst"))
    val e = (if (assumeDistinct) e0 else e0.distinct())
      .localCheckpoint(true)
    val nodes = e.select(col("_src").as("node"))
      .union(e.select(col("_dst").as("node")))
      .distinct().localCheckpoint(true)
    def normalized(rawPlan: DataFrame, keyCol: String): DataFrame = {
      // raw is consumed TWICE (global total + per-node values); the
      // eager checkpoint keeps lineage linear across rounds — without
      // it each half-step doubles the logical plan (the clusterReps
      // lesson). raw is node-sized, so the materialization is cheap.
      val raw = rawPlan.localCheckpoint(true)
      val tot = raw.agg(greatest(sum(col("_r")), lit(1L)).as("_t"))
      nodes
        .join(raw, nodes("node") === raw(keyCol), "left")
        .crossJoin(broadcast(tot))
        .select(col("node"),
          expr(s"coalesce(_r, 0L) div greatest(_t div ${scale}L, 1L)")
            .as("_s"))
    }
    var hub = nodes.select(col("node"), lit(scale).as("_s"))
    var auth = nodes.select(col("node"), lit(scale).as("_s"))
    for (_ <- 1 to iters) {
      auth = normalized(
        e.join(hub, e("_src") === hub("node"))
          .groupBy(col("_dst")).agg(sum(col("_s")).as("_r")),
        "_dst")
      hub = normalized(
        e.join(auth, e("_dst") === auth("node"))
          .groupBy(col("_src")).agg(sum(col("_s")).as("_r")),
        "_src")
    }
    hub.select(col("node"), col("_s").as("hub_score"))
      .join(auth.select(col("node"), col("_s").as("auth_score")),
        Seq("node"))
  }

  private def dampedLoop(edges: DataFrame, srcCol: String, dstCol: String,
                         iters: Int, dampingPct: Int,
                         assumeDistinct: Boolean)(
      mkBase: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val sc = edges.sparkSession.sparkContext
    def persistentIds: Set[Int] = sc.getPersistentRDDs.keySet.toSet
    val preE = persistentIds
    val e0 = edges.select(col(srcCol).as("_src"), col(dstCol).as("_dst"))
    val e = (if (assumeDistinct) e0 else e0.distinct())
      .localCheckpoint(true)
    val eIds = persistentIds -- preE
    // flows carries each edge's out-degree, so the loop's only joins
    // are flows⨝ranks (contribution) and nodesBase⨝inMass (update)
    val deg = e.groupBy(col("_src")).agg(count(lit(1)).as("_d"))
    val flows = e.join(deg, Seq("_src")).localCheckpoint(true)
    val nodes = e.select(col("_src").as("node"))
      .union(e.select(col("_dst").as("node")))
      .distinct()
    val nn = nodes.agg(count(lit(1)).as("_n"))
    val nodesBase = mkBase(nodes, nn).localCheckpoint(true)
    // flows and nodesBase are materialized — the raw edge blocks are
    // unreachable by any future plan; free them
    eIds.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    var ranks = nodesBase.select(col("node"), col("_base").as("score"))
    var supersededIds: Set[Int] = Set.empty
    for (i <- 1 to iters) {
      val inMass = flows
        .join(ranks, flows("_src") === ranks("node"))
        .select(col("_dst"), expr("score div _d").as("_c"))
        .groupBy(col("_dst")).agg(sum(col("_c")).as("_m"))
      ranks = nodesBase
        .join(inMass, nodesBase("node") === inMass("_dst"), "left")
        .select(col("node"),
          (expr(s"((100L - ${dampingPct}L) * _base) div 100L") +
            expr(s"(${dampingPct}L * coalesce(_m, 0L)) div 100L"))
            .as("score"))
      if (i % 8 == 0 && i < iters) {
        val pre = persistentIds
        ranks = ranks.localCheckpoint(true)
        val added = persistentIds -- pre
        supersededIds.foreach(id =>
          sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
        supersededIds = added
      }
    }
    ranks
  }
}
