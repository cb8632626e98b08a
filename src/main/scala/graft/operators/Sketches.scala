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
}
