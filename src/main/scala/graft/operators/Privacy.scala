package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Privacy-scrubbing primitives for training-data pipelines: the
  * anonymization pass run before order/user data may feed analytics
  * or model training. All pure `Column` expressions (codegen'd, one
  * narrow projection over the corpus); deterministic, so the q71
  * oracle replays them in SQL.
  */
object Privacy {

  /** Mask an email's local part, keeping the domain — enough for
    * domain-level analytics, nothing identifying left. */
  def maskEmail(email: Column): Column =
    regexp_replace(email, "^[^@]+", "***")

  /** Keep only the trailing `keep` characters of an identifier,
    * masking the rest (credit-card-receipt style). */
  def maskButLast(id: Column, keep: Int, maskChar: String = "*"): Column =
    when(length(id) <= keep, id).otherwise(
      concat(lit(maskChar * 4), substring(id, -keep, keep)))

  /** k-anonymity-style categorical generalization: values outside the
    * allowed head are coarsened to a single bucket, so rare categories
    * can't fingerprint a row. */
  def generalize(c: Column, kept: Seq[String], other: String = "OTHER"): Column =
    when(c.isin(kept: _*), c).otherwise(other)

  /** k-anonymity SUPPRESSION over quasi-identifier columns: any row
    * whose quasi combination has fewer than `k` peers gets every quasi
    * column replaced by `mask`, so no released row's quasi tuple
    * identifies a group smaller than k (suppressed rows all share one
    * tuple). Quasi columns come back as strings (the mask forces a
    * common type); all other columns pass through untouched.
    *
    * Scale shape: ONE map-side-combined census on the quasi tuple +
    * an equi-join back on the same keys (AQE broadcasts the census
    * when it is small, splits it when a tuple is hot) — never a
    * per-group window over the data. */
  def kAnonymize(df: org.apache.spark.sql.DataFrame, quasiCols: Seq[String],
                 k: Int, mask: String = "*"): org.apache.spark.sql.DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    val census = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("_qn"))
    // LEFT join: a null in any quasi column falls out of the equi-join
    // (null ≠ null), leaving _qn null — those rows SUPPRESS (a privacy
    // gate fails closed, never open on an unmatched row)
    val joined = df.join(census, quasiCols, "left")
    quasiCols.foldLeft(joined) { (acc, c) =>
      acc.withColumn(c,
        when(col("_qn").isNull || col("_qn") < k, lit(mask))
          .otherwise(col(c).cast(org.apache.spark.sql.types.StringType)))
    }.drop("_qn")
  }
}
