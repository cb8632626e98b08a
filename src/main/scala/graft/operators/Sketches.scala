package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mergeable frequency sketches for streaming / multi-shard census.
  *
  * Count-min sketch (Cormode & Muthukrishnan 2005): a d×w counter
  * grid; each occurrence of a term increments one cell per hash row;
  * a point estimate is the MIN over the term's d cells. Guarantees
  * estimate ≥ exact (one-sided error), with overcount bounded by
  * collisions.
  *
  * Why this shape at 100 TB: the exact term census over web text is
  * itself huge (10⁸–10⁹ distinct terms — the q130 lesson), but the
  * sketch's state is a CONSTANT d·w cells no matter the corpus. The
  * explode(d)→groupBy((row,cell)) plan map-side-combines every
  * partition down to ≤ d·w partial cells before the single exchange,
  * so shuffle bytes are O(partitions · d · w), independent of corpus
  * size — and cell-wise SUM is exactly the sketch merge operation, so
  * the same plan IS the multi-shard merge (build per shard, union,
  * re-aggregate).
  *
  * Hash family is the repo's md5-prefix draw ([[Dedup.md5Hash64]]
  * family): row r hashes term t to
  * `uint32(md5("salt:r:" || t)) mod width` — bit-for-bit replayable
  * in any engine with md5, which is what lets the DuckDB oracle
  * rebuild the whole grid and the min-over-rows estimate exactly.
  */
object Sketches {

  private def cellOf(salt: String, row: Int, term: Column,
                     width: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"$salt:$row:"), term)), 1, 8),
      16, 10).cast(LongType), lit(width.toLong))

  /** Build the d×w grid over one string column. Output: (row, cell,
    * cnt) — at most depth·width rows, dense cells only. Null terms
    * are dropped (they are absent from the census semantics, matching
    * the tokenizers' no-empty-token contract). */
  def countMinBuild(df: DataFrame, termCol: String, depth: Int,
                    width: Int, salt: String = "cms"): DataFrame = {
    require(depth > 0 && width > 0,
      s"depth/width must be positive, got $depth x $width")
    val t = col(termCol)
    val rows = array((0 until depth).map { r =>
      struct(lit(r).cast(LongType).as("row"),
        cellOf(salt, r, t, width).as("cell"))
    }: _*)
    df.filter(t.isNotNull)
      .select(explode(rows).as("rc"))
      .select(col("rc.row").as("row"), col("rc.cell").as("cell"))
      .groupBy(col("row"), col("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for a probe set: min over the d cells each probe
    * term hashes to. Both sides of the join are tiny — the sketch is
    * ≤ d·w rows and the probe list is user-sized — so both are
    * broadcast; nothing here scales with the corpus. A probe term
    * whose cell is absent from the grid (no colliding mass at all)
    * estimates 0 via the coalesce. */
  def countMinEstimate(sketch: DataFrame, probes: DataFrame,
                       termCol: String, depth: Int, width: Int,
                       salt: String = "cms"): DataFrame = {
    val t = col(termCol)
    val rows = array((0 until depth).map { r =>
      struct(lit(r).cast(LongType).as("row"),
        cellOf(salt, r, t, width).as("cell"))
    }: _*)
    val probeCells = probes
      .select(t.as("term"), explode(rows).as("rc"))
      .select(col("term"), col("rc.row").as("row"),
        col("rc.cell").as("cell"))
    probeCells
      .join(broadcast(sketch), Seq("row", "cell"), "left")
      .groupBy(col("term"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  // ---- KMV distinct-count sketch --------------------------------------

  /** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.
    * 2002) — the CARDINALITY member of the sketch family beside
    * count-min's frequencies: per group, the k smallest md5-uint32
    * draws over the distinct items. Where HLL (`approx_count_distinct`)
    * is engine-opaque, KMV is md5-REPLAYABLE — any engine rebuilds
    * the identical k-set, kth-minimum and estimate bit-for-bit, which
    * is what lets the oracle gate it exactly.
    *
    * Output: (groupCols…, kth_min, n_mins) — the sketch rows. With
    * fewer than k distinct items the group's sketch IS its exact
    * distinct set (n_mins < k), and [[kmvEstimate]] reports n_mins
    * exactly; otherwise estimate = `(k−1)·2³² div kth_min` (the
    * normalized-spacing estimator, integer division — no float
    * drift).
    *
    * Scale shape: hash + distinct collapses to (group, hash) — one
    * map-side-combined exchange — then the k smallest ride the
    * bounded-heap [[graft.plans.TopKPerGroup]] node (partial heaps
    * per task, ONE exchange on the group key, never a per-group
    * sort/window). State is groups×k everywhere. Merging shards =
    * union the per-shard sketch minima and re-run the same top-k —
    * min-k is associative/commutative/idempotent, the KMV merge law
    * ([[kmvMergeMins]]; spec-pinned). */
  def kmvMins(df: DataFrame, groupCols: Seq[String], itemCol: String,
              k: Int = 256, salt: String = "kmv"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val hashed = df.filter(col(itemCol).isNotNull)
      .select(groupCols.map(col) :+
        conv(substring(md5(concat(lit(salt + ":"),
          col(itemCol).cast(StringType))), 1, 8), 16, 10)
          .cast(LongType).as("_h"): _*)
      .distinct()
    graft.plans.TopKPerGroup(hashed, groupCols, Seq(("_h", true)), k)
  }

  /** Union-merge of per-shard KMV min-sets carried as `_h` rows:
    * distinct-then-re-top-k (a re-hashed duplicate row from shard
    * overlap must not occupy two of the k slots). */
  def kmvMergeMins(shards: Seq[DataFrame], groupCols: Seq[String],
                   k: Int = 256): DataFrame = {
    require(shards.nonEmpty, "need at least one shard sketch")
    val all = shards.reduce(_ unionByName _).distinct()
    graft.plans.TopKPerGroup(all, groupCols, Seq(("_h", true)), k)
  }

  /** Collapse a [[kmvMins]] frame to per-group estimates:
    * (groupCols…, n_distinct_est). Exact below k; the integer
    * spacing estimator at and above it. */
  def kmvEstimate(mins: DataFrame, groupCols: Seq[String],
                  k: Int = 256): DataFrame =
    mins.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("_n"), max(col("_h")).as("_kth"))
      .withColumn("n_distinct_est",
        when(col("_n") < k, col("_n"))
          .otherwise(expr(s"(${k - 1}L * 4294967296L) div _kth")))
      .drop("_n", "_kth")
}
