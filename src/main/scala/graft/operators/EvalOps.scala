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

  /** Calibration buckets (the reliability-diagram / ECE census,
    * Guo et al. 2017): samples carry an integer confidence in ppm and
    * a correctness flag; bucketed by `conf div (10⁶/nBuckets)`, each
    * bucket reports its size, mean confidence, accuracy, and the
    * |accuracy − confidence| gap — all ppm, all integral (mean = sum
    * div n). ECE is the n-weighted mean of the gaps — left to the
    * caller's one-line aggregate so the census stays the atomic,
    * hashable unit. One map-side-combined aggregate on the bucket
    * key; conf = 10⁶ lands in the top bucket (not its own). */
  def calibrationBuckets(samples: DataFrame, confPpmCol: String,
                         okCol: String, nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 1000,
      s"nBuckets must be in [2, 1000], got $nBuckets")
    val w = 1000000L / nBuckets
    // integral div — Column./ is a double Divide and would drift
    val bucket = least(expr(s"`$confPpmCol` div ${w}L"),
      lit(nBuckets - 1L)).cast(LongType)
    samples.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col(confPpmCol).cast(LongType)).as("_cs"),
        sum(when(col(okCol), 1L).otherwise(0L)).as("_ok"))
      .select(col("bucket"), col("n"),
        expr("_cs div n").as("mean_conf_ppm"),
        expr("_ok * 1000000L div n").as("acc_ppm"),
        abs(expr("_ok * 1000000L div n") - expr("_cs div n"))
          .as("gap_ppm"))
  }

  /** Cohen's kappa — inter-annotator agreement for label-quality
    * audits (the gate preference/SFT label pipelines run before
    * trusting a batch): per group, observed agreement `po` vs the
    * chance agreement `pe` implied by each rater's marginals,
    * `κ = (po − pe)/(1 − pe)`. All ppm integer arithmetic:
    * po_ppm = matches·10⁶ div n; pe_ppm = Σ_label (aCount·bCount·10⁶
    * div n²); kappa_milli = (po − pe)·1000 div (10⁶ − pe), NULL when
    * pe = 10⁶ (both raters constant and equal — κ undefined).
    * Scale shape: one (group, labelA, labelB) census, then
    * group-level folds over the label-sized marginals — never a
    * window, labels broadcastable by construction. */
  def cohenKappa(df: DataFrame, grpCol: String, aCol: String,
                 bCol: String): DataFrame = {
    val cells = df.groupBy(col(grpCol), col(aCol).as("_la"),
        col(bCol).as("_lb"))
      .agg(count(lit(1)).as("_c"))
    val aMarg = cells.groupBy(col(grpCol), col("_la"))
      .agg(sum(col("_c")).as("_ca"))
    val bMarg = cells.groupBy(col(grpCol), col("_lb"))
      .agg(sum(col("_c")).as("_cb"))
    val n = cells.groupBy(col(grpCol)).agg(sum(col("_c")).as("n"),
      sum(when(col("_la") === col("_lb"), col("_c")).otherwise(0L))
        .as("_match"))
    // pe over the union of labels either rater used: Σ ca·cb·10⁶/n²
    val pe = aMarg.join(bMarg,
        aMarg(grpCol) === bMarg(grpCol) && col("_la") === col("_lb"))
      .select(aMarg(grpCol).as(grpCol),
        (col("_ca") * col("_cb")).as("_ab"))
      .groupBy(col(grpCol)).agg(sum(col("_ab")).as("_abSum"))
    n.join(pe, Seq(grpCol), "left")
      .select(col(grpCol), col("n"),
        expr("_match * 1000000L div n").as("po_ppm"),
        coalesce(expr("_abSum * 1000000L div (n * n)"), lit(0L))
          .as("pe_ppm"))
      .withColumn("kappa_milli",
        when(col("pe_ppm") === 1000000L, lit(null).cast(LongType))
          .otherwise(expr(
            "(po_ppm - pe_ppm) * 1000L div (1000000L - pe_ppm)")))
      .orderBy(col(grpCol))
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
