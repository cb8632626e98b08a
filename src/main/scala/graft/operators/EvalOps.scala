package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

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
    * Division TRUNCATES TOWARD ZERO for negative κ (below-chance
    * agreement, a realistic outcome for a bad annotation batch):
    * measured r14, Spark's `div` and DuckDB's `//` BOTH truncate
    * (-7 div 2 = -3 in each), so the cross-engine contract holds for
    * negative κ as-is — but a consumer replaying the formula with
    * Python-style floor division (-7 // 2 = -4) will sit 1 milli
    * below on every inexact negative ratio; EvalOpsSpec pins a
    * below-chance batch at the truncating value.
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

  /** Deterministic bootstrap confidence intervals for eval metrics
    * (r14 — VERDICT r13 Missing #4): EM/F1/pass@k point estimates
    * alone cannot say whether a 2-point move between corpus snapshots
    * is signal; this puts an engine-replayable CI beside them. `B`
    * md5-subsample replicates (the hashSplit idiom, round-salted:
    * item `i` joins replicate `b` iff the uint32 draw of
    * md5("salt:b:i") clears `frac`'s threshold — deterministic under
    * reshuffles, retries and appends, and exactly replayable by any
    * engine with md5), each replicate's metric is the integer-ppm
    * mean of its members' per-item values, and the CI bounds are
    * nearest-rank percentiles of the replicate census: with
    * `n` surviving replicates, the p-th bound is the smallest
    * replicate mean whose ≤-rank reaches ⌈p·n/100⌉. Replicates that
    * draw zero members are excluded from the census (their mean is
    * undefined — the same NULL-over-fabrication rule as pass@k).
    *
    * Scale shape: the only data-sized stage is one explode(B) +
    * map-side-combined aggregate over the PER-ITEM metric table
    * (eval-sized, not corpus-sized — B·items rows shuffle as B
    * partial sums); everything after runs on the B-row replicate
    * census (B ≤ 1000 by contract), where the nearest-rank self-join
    * is a broadcast over a parameter-bounded frame, never a window
    * over data.
    *
    * @param perItem one row per evaluation item: (idCol, valuePpmCol)
    *                — EM as 0/10⁶, token-F1 or pass@k in ppm
    * @return one row: (n_items, n_replicates, point_ppm, ci_lo_ppm,
    *         ci_hi_ppm). */
  def bootstrapMetricCi(perItem: DataFrame, idCol: String,
                        valuePpmCol: String, b: Int = 100,
                        frac: Double = 0.5, salt: String = "boot",
                        loPct: Int = 5, hiPct: Int = 95): DataFrame =
    bootstrapMetricCiBy(
      perItem.withColumn("_g1", lit("all")), "_g1", idCol, valuePpmCol,
      b, frac, salt, loPct, hiPct)
      .drop("_g1")

  /** [[bootstrapMetricCi]] PER GROUP — the leaderboard shape
    * (per-source, per-language, per-task CIs from one pass). An
    * item's replicate membership is a function of (salt, b, item id)
    * alone — group-independent, so regrouping the same items yields
    * consistent draws. One row per group: (grpCol, n_items,
    * n_replicates, point_ppm, ci_lo_ppm, ci_hi_ppm).
    *
    * Scale shape: the explode(B) aggregate is keyed (group, b) — still
    * map-side combined; the rank self-join is equi on the group key
    * with ≤ B rows per group on each side, so per-group work is
    * parameter-bounded and groups parallelize across the cluster. */
  def bootstrapMetricCiBy(perItem: DataFrame, grpCol: String,
                          idCol: String, valuePpmCol: String,
                          b: Int = 100, frac: Double = 0.5,
                          salt: String = "boot", loPct: Int = 5,
                          hiPct: Int = 95): DataFrame = {
    require(b >= 10 && b <= 1000,
      s"b must be in [10, 1000] (the census self-join is b², and fewer " +
        s"than 10 replicates bound nothing), got $b")
    require(frac > 0.0 && frac < 1.0, s"frac must be in (0, 1), got $frac")
    require(loPct >= 1 && hiPct <= 99 && loPct < hiPct,
      s"percentiles must satisfy 1 <= lo < hi <= 99, got ($loPct, $hiPct)")
    val vals = perItem.select(col(grpCol).as("_g"),
      col(idCol).cast(StringType).as("_id"),
      col(valuePpmCol).cast(LongType).as("_v"))
    val (point, _, nb, bounds) =
      bootstrapParts(vals, b, frac, salt, loPct, hiPct)
    // a group whose EVERY replicate drew zero members (pathologically
    // tiny) still reports its point estimate, with 0 replicates and
    // NULL bounds — the same NULL-over-fabrication rule as pass@k
    point.join(nb, Seq("_g"), "left").join(bounds, Seq("_g"), "left")
      .select(col("_g").as(grpCol), col("n_items"),
        coalesce(col("n_replicates"), lit(0L)).as("n_replicates"),
        col("point_ppm"), col("ci_lo_ppm"), col("ci_hi_ppm"))
  }

  /** The shared replicate machinery of [[bootstrapMetricCiBy]] and
    * [[pairedBootstrapCiBy]]: per-group point estimate, md5-drawn
    * replicate means, surviving-replicate census, and nearest-rank
    * bounds — over a (_g, _id, _v) frame. */
  private def bootstrapParts(vals: DataFrame, b: Int, frac: Double,
                             salt: String, loPct: Int, hiPct: Int)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val thr = DatasetOps.thr(frac)
    val point = vals.groupBy(col("_g"))
      .agg(count(lit(1)).as("n_items"),
        expr("sum(_v) div count(1)").as("point_ppm"))
    val reps = vals
      .select(col("_g"), col("_id"), col("_v"),
        explode(sequence(lit(0), lit(b - 1))).as("_b"))
      .filter(conv(substring(md5(concat(lit(salt + ":"),
        col("_b").cast(StringType), lit(":"), col("_id"))), 1, 8), 16, 10)
        .cast(LongType) < thr)
      .groupBy(col("_g"), col("_b"))
      .agg(expr("sum(_v) div count(1)").as("_m"))
    val nb = reps.groupBy(col("_g"))
      .agg(count(lit(1)).as("n_replicates"))
    val ms = reps.select(col("_g").as("_g2"), col("_m").as("_m2"))
    val bounds = reps
      .join(ms, col("_g2") === col("_g") && col("_m2") <= col("_m"))
      .groupBy(col("_g"), col("_b"), col("_m"))
      .agg(count(lit(1)).as("_rank"))
      .join(nb, Seq("_g"))
      .groupBy(col("_g"))
      .agg(
        min(when(col("_rank") >=
          expr(s"($loPct * n_replicates + 99) div 100"), col("_m")))
          .as("ci_lo_ppm"),
        min(when(col("_rank") >=
          expr(s"($hiPct * n_replicates + 99) div 100"), col("_m")))
          .as("ci_hi_ppm"))
    (point, reps, nb, bounds)
  }

  /** PAIRED model-comparison bootstrap (r15 — VERDICT r14 Missing #2):
    * the decision a leaderboard actually makes is "is A better than B
    * on the SAME items?", and comparing two marginal CIs throws away
    * the pairing — on correlated per-item scores (every real eval) the
    * paired interval is strictly tighter. Input is the JOINED per-item
    * table (one row per item with BOTH systems' ppm values); the
    * per-item delta A−B rides the identical md5 draws as
    * [[bootstrapMetricCi]] (same salt convention — an item's replicate
    * membership is a function of (salt, b, id) alone), so each
    * replicate's mean delta is over one consistent item subset.
    * Beside the CI, `a_wins_ppm` reports SIGN CONSISTENCY: the
    * fraction of replicates whose mean delta is strictly positive —
    * the "how often would A have won this eval" answer a CI straddling
    * zero still leaves open.
    *
    * Scale shape: identical to [[bootstrapMetricCiBy]] — one
    * explode(B) map-side-combined aggregate over the eval-sized joined
    * table, then parameter-bounded census arithmetic.
    *
    * @return one row: (n_items, n_replicates, point_delta_ppm,
    *         ci_lo_ppm, ci_hi_ppm, a_wins_ppm). */
  def pairedBootstrapCi(perItem: DataFrame, idCol: String,
                        aPpmCol: String, bPpmCol: String, b: Int = 100,
                        frac: Double = 0.5, salt: String = "boot",
                        loPct: Int = 5, hiPct: Int = 95): DataFrame =
    pairedBootstrapCiBy(
      perItem.withColumn("_g1", lit("all")), "_g1", idCol, aPpmCol,
      bPpmCol, b, frac, salt, loPct, hiPct)
      .drop("_g1")

  /** [[pairedBootstrapCi]] PER GROUP — per-source/per-task A-vs-B
    * verdicts from one pass (the q349 leaderboard shape). */
  def pairedBootstrapCiBy(perItem: DataFrame, grpCol: String,
                          idCol: String, aPpmCol: String,
                          bPpmCol: String, b: Int = 100,
                          frac: Double = 0.5, salt: String = "boot",
                          loPct: Int = 5, hiPct: Int = 95): DataFrame = {
    require(b >= 10 && b <= 1000,
      s"b must be in [10, 1000], got $b")
    require(frac > 0.0 && frac < 1.0, s"frac must be in (0, 1), got $frac")
    require(loPct >= 1 && hiPct <= 99 && loPct < hiPct,
      s"percentiles must satisfy 1 <= lo < hi <= 99, got ($loPct, $hiPct)")
    // an UNPAIRED item has no delta (ADVICE r15): a NULL ppm on either
    // side — the outer-joined per-item shape — would be excluded from
    // every sum(_v) yet still counted by count(1) in n_items, the
    // point estimate and every replicate mean, silently biasing the
    // delta toward zero. Refuse loudly (one eval-sized scan) instead:
    // the caller decides whether to inner-join or impute.
    val nUnpaired = perItem
      .filter(col(aPpmCol).isNull || col(bPpmCol).isNull).count()
    require(nUnpaired == 0L,
      s"pairedBootstrapCiBy: $nUnpaired rows carry a NULL $aPpmCol or " +
        s"$bPpmCol — an unpaired item cannot contribute a delta and " +
        s"would silently dilute the estimate; inner-join the two " +
        s"systems' per-item tables (or filter the unpaired rows) first")
    val vals = perItem.select(col(grpCol).as("_g"),
      col(idCol).cast(StringType).as("_id"),
      (col(aPpmCol).cast(LongType) - col(bPpmCol).cast(LongType))
        .as("_v"))
    val (point, reps, nb, bounds) =
      bootstrapParts(vals, b, frac, salt, loPct, hiPct)
    val wins = reps.groupBy(col("_g"))
      .agg(sum(when(col("_m") > 0, 1L).otherwise(0L)).as("_wins"))
    point.join(nb, Seq("_g"), "left").join(bounds, Seq("_g"), "left")
      .join(wins, Seq("_g"), "left")
      .select(col("_g").as(grpCol), col("n_items"),
        coalesce(col("n_replicates"), lit(0L)).as("n_replicates"),
        col("point_ppm").as("point_delta_ppm"),
        col("ci_lo_ppm"), col("ci_hi_ppm"),
        // NULL, not 0, when no replicate survived (0 would read as
        // "A never wins" — the NULL-over-fabrication rule)
        when(coalesce(col("n_replicates"), lit(0L)) === 0,
          lit(null).cast(LongType))
          .otherwise(expr("_wins * 1000000L div n_replicates"))
          .as("a_wins_ppm"))
  }

  /** Bradley-Terry preference ratings (r14 — VERDICT r13 Missing #3):
    * aggregate pairwise outcomes (winner, loser) into per-item
    * ratings — the step every RLHF data pipeline and eval leaderboard
    * runs between preference pairs (q314's output shape) and a
    * model board. The minorization-maximization iteration
    * (Hunter 2004) in pure integer arithmetic so the oracle can
    * unroll every round in int64:
    *
    *   p⁰_i = scale;
    *   D_i  = Σ_j n_ij · scale·10⁶ div (p_i + p_j)
    *          + 2·scale·10⁶ div (p_i + scale)      (anchor games)
    *   p'_i = (W_i + 1) · scale·10⁶ div max(D_i, 1)
    *
    * Denominator terms carry a fixed 10⁶ INNER multiplier — at bare
    * `scale` units a single game's term n·scale div (p_i+p_j) ≈ n/2
    * truncates to 0 and the whole update degenerates; the micro-unit
    * keeps ~6 digits through the truncation. The max(·,1) floor is
    * the documented guard for the fully-truncated regime (it can only
    * engage when every term underflows, where the rating is already
    * saturated) — both engines replay it as greatest(D, 1).
    *
    * where n_ij counts games between i and j (both orders) and W_i
    * counts i's wins. Every item additionally plays TWO virtual games
    * (one win, one loss) against a fixed reference of rating `scale` —
    * the standard anchor regularization: it pins the scale (so no
    * normalization round is needed), keeps a zero-win item at a
    * finite rating, and makes the MLE identifiable on a disconnected
    * comparison graph. Division is integer `div` end to end — both
    * engines replay the identical trajectory bit for bit.
    *
    * At-least-once ingest: pass `dedupIdCol` (an outcome id) and
    * re-landed duplicate rows collapse before counting — without it
    * every row is one real game (multiplicity-weighted). NOTE the
    * integer trajectory is NOT invariant under uniform multiplicity
    * inflation (2n·s div x ≠ 2·(n·s div x)), which is exactly why
    * the dedup seam exists.
    *
    * Scale shape (the q153 loop discipline): duels and wins are
    * STATIC map-side-combined aggregates, localCheckpointed once; each
    * round joins the ratings twice on the duel endpoints (inherent —
    * the update needs p_i + p_j) and is therefore checkpointed every
    * round, so lineage stays linear and per-round state is one
    * items-sized table. iters ≤ 20 (each round is a duels shuffle).
    *
    * @return (item, games, wins, rating) — rating integer at `scale`;
    *         compose with orderBy/limit for the board
    *         (TakeOrderedAndProject keeps that bounded). */
  def bradleyTerry(outcomes: DataFrame, winnerCol: String,
                   loserCol: String, iters: Int = 4,
                   scale: Long = 1000000L,
                   dedupIdCol: Option[String] = None): DataFrame = {
    val rows0 = dedupIdCol.map(outcomes.dropDuplicates(_)).getOrElse(outcomes)
    bradleyTerryFromGames(rows0
      .select(col(winnerCol).as("_w"), col(loserCol).as("_l"),
        lit(1L).as("_n")),
      iters, scale)
  }

  /** [[bradleyTerry]] over a pre-aggregated DUEL CENSUS (r16 —
    * VERDICT r15 stretch #8's operator half): one row per directed
    * (winner, loser) pair with its game COUNT — the compacted state a
    * leaderboard stream keeps once the outcome log outgrows taste.
    * The trajectory is IDENTICAL to feeding each game as its own row
    * (the MM arithmetic only ever consumes n_ij and W_i, and summed
    * counts equal counted rows — spec-pinned bit for bit); what the
    * census representation surrenders is the outcome-id audit seam,
    * which is exactly the tradeoff [[graft.streaming.DocIngest
    * .runOutcomeCensusIngest]] documents. Counts must be >= 1 —
    * a zero or negative count is a corrupted census, refused loudly
    * (one eval-sized scan). */
  def bradleyTerryCensus(census: DataFrame, winnerCol: String,
                         loserCol: String, nCol: String, iters: Int = 4,
                         scale: Long = 1000000L): DataFrame = {
    val bad = census.filter(col(nCol).isNull || col(nCol) < 1L).count()
    require(bad == 0L,
      s"bradleyTerryCensus: $bad census rows carry a NULL or " +
        s"non-positive $nCol — a duel census counts games, so every " +
        s"row must hold >= 1")
    bradleyTerryFromGames(census
      .select(col(winnerCol).as("_w"), col(loserCol).as("_l"),
        col(nCol).cast(LongType).as("_n")),
      iters, scale)
  }

  /** The shared MM core over weighted game rows (_w, _l, _n): the
    * [[bradleyTerry]] contract verbatim — counted rows and summed
    * counts are the same censuses by construction. */
  private def bradleyTerryFromGames(rows: DataFrame, iters: Int,
                                    scale: Long): DataFrame = {
    require(iters >= 1 && iters <= 20,
      s"iters must be in [1, 20] (each is a duels shuffle), got $iters")
    require(scale >= 1000L && scale <= 1000000L,
      s"scale must be in [1e3, 1e6] (keeps n·scale·10⁶ int64-safe for " +
        s"n up to ~9e6 games per pair), got $scale")
    val sk = scale * 1000000L // the micro-unit factor (see scaladoc)
    val games = rows.filter(col("_w") =!= col("_l"))
    // static spine: per-item totals + the DIRECTED duel census (each
    // unordered pair appears under both endpoints, so one groupBy(a)
    // per round covers every denominator term)
    val wins = games.groupBy(col("_w").as("item"))
      .agg(sum(col("_n")).as("wins"))
    val losses = games.groupBy(col("_l").as("item"))
      .agg(sum(col("_n")).as("losses"))
    val items = wins.select(col("item"), col("wins"))
      .join(losses, Seq("item"), "full")
      .select(col("item"),
        coalesce(col("wins"), lit(0L)).as("wins"),
        (coalesce(col("wins"), lit(0L)) + coalesce(col("losses"), lit(0L)))
          .as("games"))
      .localCheckpoint()
    val duels = games
      .select(col("_w").as("a"), col("_l").as("b"), col("_n"))
      .union(games.select(col("_l").as("a"), col("_w").as("b"),
        col("_n")))
      .groupBy(col("a"), col("b")).agg(sum(col("_n")).as("n"))
      .localCheckpoint()
    // numerator overflow guard: (wins+1)·scale·10⁶ must stay int64 —
    // a one-scan check on the materialized spine, loud not silent
    val maxW = Long.MaxValue / sk - 2L
    require(items.filter(col("wins") > maxW).isEmpty,
      s"bradleyTerry: an item exceeds $maxW wins — (wins+1)·scale·10⁶ " +
        s"would overflow int64; lower `scale`")
    // the matching DENOMINATOR guard (ADVICE r14): each round computes
    // n·scale·10⁶ div (p_i + p_j) per duel pair, so a pair with more
    // than Long.MaxValue/(scale·10⁶) games (~9.2e6 at scale = 1e6)
    // would overflow silently — refuse loudly on the same static spine
    val maxN = Long.MaxValue / sk
    require(duels.filter(col("n") > maxN).isEmpty,
      s"bradleyTerry: a duel pair exceeds $maxN games — n·scale·10⁶ " +
        s"would overflow int64 in the denominator sum; lower `scale`")
    var r = items.select(col("item"), lit(scale).as("p"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val dsum = duels
        .join(r.select(col("item").as("a"), col("p").as("_pa")), Seq("a"))
        .join(r.select(col("item").as("b"), col("p").as("_pb")), Seq("b"))
        .groupBy(col("a").as("item"))
        .agg(sum(expr(s"n * ${sk}L div (_pa + _pb)")).as("_dd"))
      r = items.join(r, Seq("item"))
        .join(dsum, Seq("item"), "left")
        .select(col("item"),
          expr(s"(wins + 1L) * ${sk}L div greatest(coalesce(_dd, 0L) " +
            s"+ 2L * ${sk}L div (p + ${scale}L), 1L)").as("p"))
        .localCheckpoint()
    }
    items.join(r, Seq("item"))
      .select(col("item"), col("games"), col("wins"),
        col("p").as("rating"))
  }

  /** Bradley-Terry ratings WITH uncertainty (r15 — VERDICT r14
    * Missing #3): every real leaderboard ships rating ± CI, and the
    * natural uncertainty for [[bradleyTerry]] is an OUTCOME bootstrap —
    * resample the games, re-run the integer MM trajectory per
    * replicate, take nearest-rank percentiles of each item's replicate
    * ratings. `idCol` is the outcome identity: it keys the
    * deterministic md5 draws (game `g` joins replicate `k` iff the
    * uint32 draw of md5("salt:k:g") clears `frac`'s threshold — the
    * [[bootstrapMetricCi]] convention exactly) AND doubles as the
    * at-least-once dedup seam (rows collapse on it before anything
    * counts, so a re-landed outcome can neither double a game nor
    * flip a draw).
    *
    * All `b` replicates run as ONE STACKED FRAME keyed by a replicate
    * column — plus the FULL set as replicate −1, which yields the
    * point ratings from the same machinery (and lets the spec pin
    * stacked ≡ plain [[bradleyTerry]] bit for bit). Each MM round is
    * therefore `iters` joins/shuffles TOTAL, not per replicate; the
    * stacked frame is ~(1 + b·frac) × outcomes — eval-sized, not
    * corpus-sized. Census, anchor, micro-unit and overflow guards are
    * the [[bradleyTerry]] contract verbatim, applied per replicate.
    *
    * An item whose every game missed a replicate's draw simply has no
    * rating there; its CI census shrinks (n_replicates per item) and
    * an item with ZERO surviving replicates reports NULL bounds — the
    * NULL-over-fabrication rule.
    *
    * @return one row per item: (item, games, wins, rating,
    *         n_replicates, rating_lo, rating_hi) — games/wins/rating
    *         from the full set. */
  def bradleyTerryCi(outcomes: DataFrame, winnerCol: String,
                     loserCol: String, idCol: String, iters: Int = 4,
                     scale: Long = 1000000L, b: Int = 20,
                     frac: Double = 0.5, salt: String = "bt",
                     loPct: Int = 5, hiPct: Int = 95): DataFrame =
    bradleyTerryCiBy(outcomes.withColumn("_g1", lit("all")), "_g1",
      winnerCol, loserCol, idCol, iters, scale, b, frac, salt, loPct,
      hiPct)
      .drop("_g1")

  /** [[bradleyTerryCi]] PER GROUP (r15) — independent leaderboards
    * with CIs per category/source/task from ONE pass, the q349/q355
    * grouped shape on the rating tier. Every group runs its own
    * comparison graph (censuses, anchor and trajectory are keyed
    * (group, replicate)); outcome dedup is on (group, id) so an id
    * convention that restarts per group cannot collapse rows across
    * groups, while the md5 DRAWS stay keyed on the id alone — the
    * bootstrap convention: an outcome's replicate membership is a
    * function of (salt, k, id), group-independent.
    *
    * Scale shape: identical to the scalar form — the group key rides
    * every aggregate/join key, so groups parallelize across the
    * cluster and each MM round is still `iters` shuffles TOTAL. */
  def bradleyTerryCiBy(outcomes: DataFrame, grpCol: String,
                       winnerCol: String, loserCol: String,
                       idCol: String, iters: Int = 4,
                       scale: Long = 1000000L, b: Int = 20,
                       frac: Double = 0.5, salt: String = "bt",
                       loPct: Int = 5, hiPct: Int = 95): DataFrame = {
    require(iters >= 1 && iters <= 20,
      s"iters must be in [1, 20] (each is a duels shuffle), got $iters")
    require(scale >= 1000L && scale <= 1000000L,
      s"scale must be in [1e3, 1e6], got $scale")
    require(b >= 10 && b <= 500,
      s"b must be in [10, 500] (each replicate multiplies the stacked " +
        s"frame), got $b")
    require(frac > 0.0 && frac < 1.0, s"frac must be in (0, 1), got $frac")
    require(loPct >= 1 && hiPct <= 99 && loPct < hiPct,
      s"percentiles must satisfy 1 <= lo < hi <= 99, got ($loPct, $hiPct)")
    val sk = scale * 1000000L
    val thr = DatasetOps.thr(frac)
    val games0 = outcomes.dropDuplicates(grpCol, idCol)
      .select(col(grpCol).as("_g"), col(idCol).cast(StringType).as("_id"),
        col(winnerCol).as("_w"), col(loserCol).as("_l"))
      .filter(col("_w") =!= col("_l"))
    // the stacked frame: replicate −1 carries every game (the point
    // trajectory); replicate k ≥ 0 carries its md5-drawn subset
    val stacked = games0
      .select(col("_g"), col("_id"), col("_w"), col("_l"),
        explode(sequence(lit(-1), lit(b - 1))).as("_k"))
      .filter(col("_k") === -1 ||
        conv(substring(md5(concat(lit(salt + ":"),
          col("_k").cast(StringType), lit(":"), col("_id"))), 1, 8),
          16, 10).cast(LongType) < thr)
    val wins = stacked.groupBy(col("_g"), col("_k"), col("_w").as("item"))
      .agg(count(lit(1)).as("wins"))
    val losses = stacked.groupBy(col("_g"), col("_k"), col("_l").as("item"))
      .agg(count(lit(1)).as("losses"))
    val items = wins.join(losses, Seq("_g", "_k", "item"), "full")
      .select(col("_g"), col("_k"), col("item"),
        coalesce(col("wins"), lit(0L)).as("wins"),
        (coalesce(col("wins"), lit(0L)) + coalesce(col("losses"), lit(0L)))
          .as("games"))
      .localCheckpoint()
    val duels = stacked
      .select(col("_g"), col("_k"), col("_w").as("a"), col("_l").as("b"))
      .union(stacked.select(col("_g"), col("_k"), col("_l").as("a"),
        col("_w").as("b")))
      .groupBy(col("_g"), col("_k"), col("a"), col("b"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    // the bradleyTerry overflow contract on the stacked spine (the
    // rep −1 slices hold the maxima, but one scan covers all slices)
    val maxW = Long.MaxValue / sk - 2L
    require(items.filter(col("wins") > maxW).isEmpty,
      s"bradleyTerryCi: an item exceeds $maxW wins — lower `scale`")
    val maxN = Long.MaxValue / sk
    require(duels.filter(col("n") > maxN).isEmpty,
      s"bradleyTerryCi: a duel pair exceeds $maxN games — lower `scale`")
    var r = items.select(col("_g"), col("_k"), col("item"),
        lit(scale).as("p"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val dsum = duels
        .join(r.select(col("_g"), col("_k"), col("item").as("a"),
          col("p").as("_pa")), Seq("_g", "_k", "a"))
        .join(r.select(col("_g"), col("_k"), col("item").as("b"),
          col("p").as("_pb")), Seq("_g", "_k", "b"))
        .groupBy(col("_g"), col("_k"), col("a").as("item"))
        .agg(sum(expr(s"n * ${sk}L div (_pa + _pb)")).as("_dd"))
      r = items.join(r, Seq("_g", "_k", "item"))
        .join(dsum, Seq("_g", "_k", "item"), "left")
        .select(col("_g"), col("_k"), col("item"),
          expr(s"(wins + 1L) * ${sk}L div greatest(coalesce(_dd, 0L) " +
            s"+ 2L * ${sk}L div (p + ${scale}L), 1L)").as("p"))
        .localCheckpoint()
    }
    val full = items.filter(col("_k") === -1).join(
        r.filter(col("_k") === -1), Seq("_g", "_k", "item"))
      .select(col("_g"), col("item"), col("games"), col("wins"),
        col("p").as("rating"))
    // nearest-rank bounds over each (group, item)'s replicate-rating
    // census — the bootstrapParts idiom (≤ b rows per key per side,
    // parameter-bounded)
    val reps = r.filter(col("_k") >= 0).select(col("_g"), col("item"),
      col("_k"), col("p"))
    val nb = reps.groupBy(col("_g"), col("item"))
      .agg(count(lit(1)).as("n_replicates"))
    val ms = reps.select(col("_g").as("_g2"), col("item").as("_i2"),
      col("p").as("_p2"))
    val bounds = reps
      .join(ms, col("_g2") === col("_g") && col("_i2") === col("item") &&
        col("_p2") <= col("p"))
      .groupBy(col("_g"), col("item"), col("_k"), col("p"))
      .agg(count(lit(1)).as("_rank"))
      .join(nb, Seq("_g", "item"))
      .groupBy(col("_g"), col("item"))
      .agg(
        min(when(col("_rank") >=
          expr(s"($loPct * n_replicates + 99) div 100"), col("p")))
          .as("rating_lo"),
        min(when(col("_rank") >=
          expr(s"($hiPct * n_replicates + 99) div 100"), col("p")))
          .as("rating_hi"))
    full.join(nb, Seq("_g", "item"), "left")
      .join(bounds, Seq("_g", "item"), "left")
      .select(col("_g").as(grpCol), col("item"), col("games"),
        col("wins"), col("rating"),
        coalesce(col("n_replicates"), lit(0L)).as("n_replicates"),
        col("rating_lo"), col("rating_hi"))
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
