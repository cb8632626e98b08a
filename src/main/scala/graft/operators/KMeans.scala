package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Distributed spherical k-means — the centroid-refinement step real
  * IVF deployments run before serving (VERDICT.md r2: ivfTopK ships
  * hash-seeded centroids with "k-means refinement noted"; this is that
  * refinement). Assignment uses cosine (the same metric the IVF probes
  * rank by), so refined cells are Voronoi regions of the served
  * geometry; centroid scale is irrelevant to cosine argmax, so means
  * are left unnormalized.
  *
  * Every step is DataFrame-distributed — no vector ever reaches the
  * driver:
  *  - seeding: deterministic farthest-first traversal — the
  *    hash-lowest point opens, then k−1 distributed top-1 jobs each
  *    pick the point least similar to its nearest existing seed. Every
  *    top-1 plans as TakeOrderedAndProject (per-partition top-1 then a
  *    k-row driver-side merge) — no single-partition shuffle anywhere;
  *  - assignment: corpus × broadcast(k centroids) with map-side
  *    `max_by` partial aggregation — the join fan-out collapses to one
  *    row per point before any exchange;
  *  - update: per-dimension means via posexplode → groupBy(cell, pos)
  *    — (n·dim) fixed-width rows through partial aggregation, the
  *    standard explode-mean shape (an Array-buffer Aggregator saves
  *    the explode at the cost of leaving codegen; at dim≈10²–10³ the
  *    explode wins on simplicity and stays whole-stage);
  *  - per-iteration eager localCheckpoint cuts the lineage (iterative
  *    plans otherwise nest a copy of every prior round).
  *
  * Cells that lose every point simply disappear (k shrinks) — the
  * Lloyd's degeneracy that IVF tolerates: fewer, fuller cells.
  */
object KMeans {

  /** Deterministic farthest-first seeding (the k-means++ shape minus
    * randomness): the hash-lowest point opens, then each next seed is
    * the point least similar to its nearest existing seed — one
    * distributed top-1 per seed, so two seeds can't open in the same
    * dense blob (plain hash seeding does exactly that and Lloyd's
    * never recovers — a merged-blob local optimum KMeansSpec caught). */
  private def seedCentroids(pts: DataFrame, k: Int): DataFrame = {
    // orderBy().limit(1) plans as TakeOrderedAndProject — per-partition
    // top-1, k-row merge — where a global row_number window (ADVICE r3)
    // would drag the whole dataset through one partition
    var seeds = pts
      .orderBy(xxhash64(col("_id").cast("string")), col("_id"))
      .limit(1)
      .select(lit(0).as("cell"), col("_v").as("centroid"))
      .localCheckpoint(true)
    for (i <- 1 until k) {
      val far = pts
        .crossJoin(broadcast(seeds))
        .select(col("_id"), col("_v"),
          cosineFast(col("_v"), col("centroid")).as("_sim"))
        .groupBy(col("_id"))
        .agg(max(col("_sim")).as("_near"), first(col("_v")).as("_v"))
        .orderBy(col("_near").asc, col("_id"))
        .limit(1)
        .select(lit(i).as("cell"), col("_v").as("centroid"))
      seeds = seeds.union(far).localCheckpoint(true)
    }
    seeds
  }

  /** Refine centroids over `points(idCol, vecCol: array<double>)`.
    * @return (cell: int, centroid: array<double>) with cell ids
    *         0..k-1 (gaps where a cell emptied). */
  def fit(points: DataFrame, idCol: String, vecCol: String, k: Int,
          iters: Int = 5): DataFrame = {
    val pts = points.select(col(idCol).as("_id"), col(vecCol).as("_v"))
    var cents = seedCentroids(pts, k)
    for (_ <- 0 until iters) {
      cents = assignCells(points, idCol, vecCol, cents)
        .select(col("cell"), posexplode(col(vecCol)).as(Seq("_pos", "_x")))
        .groupBy(col("cell"), col("_pos"))
        .agg(avg(col("_x")).as("_m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("_pos"), col("_m")))).as("_pm"))
        .select(col("cell"),
          transform(col("_pm"), e => e.getField("_m")).as("centroid"))
        .localCheckpoint(true)
    }
    cents
  }

  /** Nearest-centroid assignment by cosine over a centroid DataFrame
    * from [[fit]]: one row per point — (idCol, vecCol, cell, sim).
    * The broadcast fan-out (n×k rows) collapses through map-side
    * `max_by` in the same stage; ties break on the lower cell id. */
  def assignCells(points: DataFrame, idCol: String, vecCol: String,
                  cents: DataFrame): DataFrame =
    points.select(col(idCol).as("_id"), col(vecCol).as("_v"))
      .crossJoin(broadcast(cents.select(col("cell").as("_cell"),
        col("centroid").as("_c"))))
      .select(col("_id"), col("_v"), col("_cell"),
        cosineFast(col("_v"), col("_c")).as("_sim"))
      .groupBy(col("_id"))
      .agg(
        max_by(struct(col("_cell"), col("_sim")),
          struct(col("_sim"), -col("_cell"))).as("_best"),
        first(col("_v")).as("_v"))
      .select(col("_id").as(idCol), col("_v").as(vecCol),
        col("_best._cell").as("cell"), col("_best._sim").as("sim"))
}
