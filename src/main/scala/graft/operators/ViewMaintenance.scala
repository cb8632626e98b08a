package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a grouped aggregate view (count + sum
  * per group) under a CDC changelog — the materialized-view side of
  * the repo's CDC family (snapshotDiff / applyChangelog for rows,
  * compactMinhashIndex / compactPostings / compactIvfIndex for
  * indexes; this is the same story for AGGREGATES).
  *
  * Why incremental: re-aggregating a 100 TB fact table to refresh a
  * dashboard view is a full scan per refresh. This operator touches
  * work proportional to the CHANGELOG: the only base-sized cost is
  * one id-join to fetch the old (group, value) of deleted/updated
  * rows — delta-keyed, so with the base bucketed on the id (the
  * repo's `writeBucketedTable` idiom) it is a zero-exchange probe;
  * the state-table join is delta-group-sized on the group key.
  *
  * Changelog contract (same as [[DatasetOps.applyChangelog]]): one
  * row per id, op ∈ I/U/D; U/I carry the NEW group and value (a U
  * may move the row between groups — both sides are handled: the old
  * group loses the old contribution, the new group gains the new
  * one). Groups whose count reaches zero leave the view.
  */
object ViewMaintenance {

  /** Build the view state from scratch: (grp, cnt, total). */
  def aggView(base: DataFrame, grpCol: String,
              valCol: String): DataFrame =
    base.groupBy(col(grpCol).as("grp"))
      .agg(count(lit(1)).as("cnt"), sum(col(valCol)).as("total"))

  /** Apply a changelog to an existing view state. `base` is the
    * PRE-changelog fact table (consulted only for the old rows of
    * D/U ids). Output schema matches [[aggView]]. */
  def maintainAggView(state: DataFrame, base: DataFrame,
                      changelog: DataFrame, idCol: String,
                      grpCol: String, valCol: String,
                      opCol: String = "op"): DataFrame = {
    val op = col(opCol)
    // old contributions leave their groups (delta-sized semi-join
    // against the base — the one base-touching step)
    val oldSide = base
      .join(changelog.filter(op.isin("D", "U")).select(col(idCol)),
        Seq(idCol), "left_semi")
      .select(col(grpCol).as("grp"), lit(-1L).as("_dc"),
        (-col(valCol)).as("_dv"))
    // new contributions enter theirs
    val newSide = changelog.filter(op.isin("U", "I"))
      .select(col(grpCol).as("grp"), lit(1L).as("_dc"),
        col(valCol).as("_dv"))
    val delta = oldSide.union(newSide)
      .groupBy("grp")
      .agg(sum("_dc").as("_dc"), sum("_dv").as("_dv"))
    state.join(delta, Seq("grp"), "full_outer")
      .select(col("grp"),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("_dc"), lit(0L)))
          .as("cnt"),
        (coalesce(col("total"), lit(0L)) + coalesce(col("_dv"), lit(0L)))
          .as("total"))
      .filter(col("cnt") > 0)
  }

  /** [[maintainAggView]] for a BEFORE-IMAGE changelog (the Debezium
    * shape: D/U rows carry `old_grp`/`old_val`) — no base-table
    * access at all, which is what a STREAMING maintainer needs: the
    * view is the only state; facts never ride along. Work is purely
    * changelog + delta-group sized. */
  def maintainAggViewCdc(state: DataFrame, changelog: DataFrame,
                         grpCol: String, valCol: String,
                         oldGrpCol: String = "old_grp",
                         oldValCol: String = "old_val",
                         opCol: String = "op"): DataFrame = {
    val op = col(opCol)
    val oldSide = changelog.filter(op.isin("D", "U"))
      .select(col(oldGrpCol).as("grp"), lit(-1L).as("_dc"),
        (-col(oldValCol)).as("_dv"))
    val newSide = changelog.filter(op.isin("U", "I"))
      .select(col(grpCol).as("grp"), lit(1L).as("_dc"),
        col(valCol).as("_dv"))
    val delta = oldSide.union(newSide)
      .groupBy("grp")
      .agg(sum("_dc").as("_dc"), sum("_dv").as("_dv"))
    state.join(delta, Seq("grp"), "full_outer")
      .select(col("grp"),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("_dc"), lit(0L)))
          .as("cnt"),
        (coalesce(col("total"), lit(0L)) + coalesce(col("_dv"), lit(0L)))
          .as("total"))
      .filter(col("cnt") > 0)
  }
}
