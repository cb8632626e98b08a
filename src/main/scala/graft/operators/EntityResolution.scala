package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage: blocked candidate generation + field-join for
  * pair scoring. The match decision itself is a caller-supplied
  * integer expression (domains differ); transitive resolution reuses
  * [[Dedup.clusterReps]].
  *
  * Blocking is the scale lever: the naive all-pairs comparison is
  * O(n²) and dead at any scale; a composite blocking key (e.g.
  * "last name-token : size-bucket") bounds the self-join to within-
  * block pairs. Each record carries exactly ONE key, so a pair is
  * generated at most once (no distinct pass needed) and recall loss
  * is the documented blocking tradeoff (boundary pairs whose keys
  * differ — production systems run multiple passes with shifted keys
  * and union the candidates; `blockedCandidates` composes for that:
  * union the outputs and `.distinct()`).
  *
  * Skew guard, same contract as the MinHash band join's
  * `maxBucketSize` (Dedup.scala): a degenerate key ("unknown") would
  * concentrate a quadratic self-join in one task at corpus scale, so
  * oversize blocks are dropped whole — a bounded, deliberate recall
  * loss instead of an unbounded hot task.
  */
object EntityResolution {

  /** Candidate pairs (id_a < id_b) within each block. The block
    * census join is key-keyed (no broadcast: the census is
    * block-count-sized, unbounded in general). */
  def blockedCandidates(records: DataFrame, idCol: String,
                        blockKey: Column,
                        maxBlockSize: Int = 1000): DataFrame = {
    require(maxBlockSize > 1, s"maxBlockSize must be > 1")
    val keyed = records
      .select(col(idCol).as("_id"), blockKey.as("_bk"))
      .filter(col("_bk").isNotNull)
    val okBlocks = keyed.groupBy("_bk")
      .agg(count(lit(1)).as("_bn"))
      .filter(col("_bn") <= maxBlockSize)
      .select("_bk")
    val guarded = keyed.join(okBlocks, Seq("_bk"))
    val a = guarded.select(col("_bk"), col("_id").as("id_a"))
    val b = guarded.select(col("_bk").as("_bk2"), col("_id").as("id_b"))
    a.join(b, col("_bk") === col("_bk2") && col("id_a") < col("id_b"))
      .select("id_a", "id_b")
  }

  /** Join each pair side back to its record fields, prefixed `a_` /
    * `b_`. Two hash joins on the id — the record table never
    * self-joins. */
  def joinPairFields(pairs: DataFrame, records: DataFrame,
                     idCol: String, fields: Seq[String]): DataFrame = {
    val aSide = records.select(
      col(idCol).as("id_a") +: fields.map(f => col(f).as(s"a_$f")): _*)
    val bSide = records.select(
      col(idCol).as("id_b") +: fields.map(f => col(f).as(s"b_$f")): _*)
    pairs.join(aSide, Seq("id_a")).join(bSide, Seq("id_b"))
  }
}
