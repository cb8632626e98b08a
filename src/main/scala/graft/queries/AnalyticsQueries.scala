package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextFunctions.whitespaceTokens
import graft.operators.Sketches
import graft.sources.Tables

/** Corpus-scale analytics machinery: mergeable sketches, distributed
  * exact quantiles, robust statistics, weighted sampling, entity
  * resolution, and incremental aggregate-view maintenance. Each query
  * carries a DuckDB oracle replaying the full operator (md5 hash
  * grids, integer arithmetic, cumulative ranks), so the driver's hash
  * gate covers the machinery, not just the output shape.
  */
object AnalyticsQueries {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** Shared DuckDB fragment: whitespace tokenization matching
    * TextFunctions.whitespaceTokens (lowercase, drop empties). */
  private val tokensCte =
    """tok AS (
        SELECT unnest(list_filter(
            regexp_split_to_array(lower(text), '\s+'),
            x -> length(x) > 0)) AS token
        FROM documents)"""

  // ---- q192: count-min sketch census + probe --------------------------
  // The constant-state frequency census: a 3×16 grid deliberately
  // small enough that collisions happen at sf0.01, so the oracle
  // exercises the overcount path (est > exact), not just the identity
  // case. The probe set includes one absent term (est comes from
  // colliding mass only) so the coalesce(0) path is covered too.
  // Scale story in Sketches.scaladoc: shuffle bytes are O(d·w) per
  // partition regardless of corpus size, and the build plan IS the
  // multi-shard merge.

  private val cmsDepth = 3
  private val cmsWidth = 16
  private val cmsProbes = Seq("spark", "table", "the", "merge", "zzxq")

  private val q192 = GraftQuery(
    "q192_count_min",
    (s, d) => {
      val toks = docs(s, d)
        .select(explode(whitespaceTokens(col("text"))).as("token"))
      val sketch = Sketches.countMinBuild(toks, "token",
        cmsDepth, cmsWidth)
      val probes = s.createDataFrame(
        s.sparkContext.parallelize(cmsProbes.map(Tuple1(_)), 1)
      ).toDF("term")
      val est = Sketches.countMinEstimate(sketch, probes, "term",
        cmsDepth, cmsWidth)
      val exact = toks.groupBy(col("token").as("term"))
        .agg(count(lit(1)).as("exact_cnt"))
      est.join(exact, Seq("term"), "left")
        .select(col("term"), col("est"),
          coalesce(col("exact_cnt"), lit(0L)).as("exact_cnt"),
          (col("est") - coalesce(col("exact_cnt"), lit(0L)))
            .as("overcount"))
        .orderBy(col("term"))
    },
    Some(s"""WITH $tokensCte,
      rows_(r) AS (SELECT unnest([0, 1, 2])),
      grid AS (
        SELECT r.r AS row_,
          CAST(concat('0x', substring(md5(
            'cms:' || CAST(r.r AS VARCHAR) || ':' || token), 1, 8))
            AS BIGINT) % $cmsWidth AS cell,
          count(*) AS cnt
        FROM tok, rows_ r GROUP BY 1, 2),
      probes(term) AS (
        SELECT unnest(['spark', 'table', 'the', 'merge', 'zzxq'])),
      pc AS (
        SELECT term, r.r AS row_,
          CAST(concat('0x', substring(md5(
            'cms:' || CAST(r.r AS VARCHAR) || ':' || term), 1, 8))
            AS BIGINT) % $cmsWidth AS cell
        FROM probes, rows_ r),
      est AS (
        SELECT term, min(coalesce(g.cnt, 0)) AS est
        FROM pc LEFT JOIN grid g
          ON pc.row_ = g.row_ AND pc.cell = g.cell
        GROUP BY term),
      exact AS (SELECT token AS term, count(*) AS exact_cnt
        FROM tok GROUP BY 1)
      SELECT e.term, e.est, coalesce(x.exact_cnt, 0) AS exact_cnt,
        e.est - coalesce(x.exact_cnt, 0) AS overcount
      FROM est e LEFT JOIN exact x USING (term)
      ORDER BY e.term"""))

  def all: Seq[GraftQuery] = Seq(q192)
}
