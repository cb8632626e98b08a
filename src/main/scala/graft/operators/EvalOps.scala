package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Eval-harness aggregation over model-sample tables — the scoring
  * mile downstream of the data pipeline (q326's exact-match/F1 family,
  * extended to the per-PROBLEM estimators every code/reasoning eval
  * publishes). Input shape is always the "samples" table a generation
  * run lands: one row per (problem, sample) with a correctness flag or
  * an answer string. Both operators are map-side-combined aggregations
  * with integer outputs (the cross-engine comparison rule); nothing
  * here shuffles more than once on the problem key.
  */
object EvalOps {

  /** Largest sample count per k for which the ppm arithmetic stays
    * exact in Long (num · 10⁶ must not overflow: n^k ≤ ~9.2e12). */
  private val MaxNByK: Map[Int, Long] = Map(
    1 -> 9000000000000L, 2 -> 3000000L, 3 -> 20000L, 4 -> 1700L,
    5 -> 390L)

  /** Unbiased pass@k (the HumanEval estimator, Chen et al. 2021):
    * per problem with `n` samples of which `c` passed,
    * `pass@k = 1 − C(n−c, k)/C(n, k)` — the probability a random
    * k-subset of the samples contains at least one pass. Computed as
    * the product form `Π_{i<k} (n−c−i)/(n−i)` in exact integer
    * arithmetic and emitted as ppm (`10⁶ − num·10⁶ div den`), so both
    * engines agree bit-for-bit. Problems with fewer than k samples
    * carry a NULL estimate (the estimator is undefined there — a
    * silent 0 or 1 would poison a mean over problems); a sample count
    * above the per-k exactness bound fails loudly instead of
    * overflowing.
    *
    * Scale shape: one map-side-combined (problem) aggregate; the
    * estimator is per-row arithmetic on the aggregate. */
  def passAtK(samples: DataFrame, problemCol: String, okCol: String,
              k: Int): DataFrame = {
    require(k >= 1 && k <= 5,
      s"k must be in [1, 5] (exact Long arithmetic bound), got $k")
    val maxN = MaxNByK(k)
    val agg0 = samples.groupBy(col(problemCol))
      .agg(count(lit(1)).as("n_samples"),
        sum(when(col(okCol), 1L).otherwise(0L)).as("n_correct"))
    val is = sequence(lit(0L), lit(k - 1L))
    // a factor hitting 0 (n−c < k) zeroes the product: pass@k = 1
    val num = aggregate(is, lit(1L), (acc, i) =>
      acc * greatest(col("n_samples") - col("n_correct") - i, lit(0L)))
    val den = aggregate(is, lit(1L), (acc, i) =>
      acc * (col("n_samples") - i))
    agg0.withColumn("_num", num).withColumn("_den", den)
      .select(col(problemCol), col("n_samples"), col("n_correct"),
        when(col("n_samples") > maxN,
          raise_error(concat(lit(s"passAtK(k=$k): n_samples exceeds the " +
            s"exact-arithmetic bound $maxN on problem "),
            col(problemCol).cast("string"))))
          .when(col("n_samples") < k, lit(null).cast(LongType))
          // integral div end to end — a double divide would round
          // above 2^53 and drift from the oracle
          .otherwise(expr("1000000L - (_num * 1000000L) div _den"))
          .cast(LongType).as(s"pass_at_${k}_ppm"))
  }

  /** Majority-vote / self-consistency scoring (Wang et al. 2022):
    * per problem, the most common answer across its samples, with
    * deterministic tie-break (votes DESC, answer ASC) and the
    * agreement rate as ppm. The rank is the `row_number() = 1` idiom
    * the injected rewrite turns into the bounded-heap TopKPerGroup
    * node — per-problem state is ONE row at any scale; totals come
    * from a map-side-combined second aggregate joined back on the
    * problem key (never a window over the vote rows). */
  def majorityVote(samples: DataFrame, problemCol: String,
                   answerCol: String): DataFrame = {
    val counts = samples.groupBy(col(problemCol), col(answerCol))
      .agg(count(lit(1)).as("votes"))
    val totals = samples.groupBy(col(problemCol))
      .agg(count(lit(1)).as("n_samples"))
    val w = Window.partitionBy(col(problemCol))
      .orderBy(col("votes").desc, col(answerCol).asc)
    counts.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .join(totals, Seq(problemCol))
      .select(col(problemCol), col("n_samples"),
        col(answerCol).as("majority_answer"), col("votes"),
        expr("votes * 1000000L div n_samples").as("agreement_ppm"))
  }
}
