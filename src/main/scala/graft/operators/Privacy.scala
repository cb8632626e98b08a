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
}
