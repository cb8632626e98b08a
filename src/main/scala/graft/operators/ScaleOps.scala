package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shuffle-shaping utilities for the 100 TB tier — the two manual
  * levers that complement AQE's automatic skew handling
  * (GraftSession enables `spark.sql.adaptive.skewJoin`):
  *
  *  - [[saltedJoin]] for a fact table whose join key is pathologically
  *    skewed (one key ≫ an executor's memory): the dimension side is
  *    replicated `numSalts` times and the fact side spreads each hot
  *    key across `numSalts` shuffle partitions. AQE's skew join splits
  *    oversized partitions AFTER a shuffle materializes them; salting
  *    prevents the oversized partition from existing at all, which is
  *    the difference between "slow" and "OOM" at the extreme tail.
  *
  *  - [[writeBucketed]] / co-located reads for repeated fact-fact
  *    joins on the same key: bucketing pre-shuffles ONCE at write
  *    time, so every subsequent join on the bucket key runs with zero
  *    exchange on either side (ScaleOpsSpec asserts the plan has no
  *    shuffle). At 100 TB, a daily-joined pair of fact tables pays
  *    for its bucketing on the first query.
  */
object ScaleOps {

  /** Skew-resistant equi-join of a big `fact` against a broadcastable-
    * or-small `dim` on `key`. `saltSrc` must be a fact column that
    * varies within a key (an id, a timestamp) — its hash spreads hot
    * keys over `numSalts` sub-partitions; the dim side is exploded
    * once per salt. Result equals `fact.join(dim, key)` exactly.
    *
    * Cost model: dim shuffle volume × numSalts (dims are small);
    * fact-side hot-key partition size ÷ numSalts. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltSrc: Column, numSalts: Int): DataFrame = {
    require(numSalts > 0, "numSalts must be positive")
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(saltSrc), lit(numSalts.toLong)))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(numSalts.toLong - 1))))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Bucketed write: pre-shuffles `df` on `key` into `numBuckets`
    * files per partition and registers `table` in the session catalog.
    * Joins between tables bucketed on the same key with the same
    * bucket count need no exchange at all. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Bucketed INTERVAL join — point-in-range without the nested loop:
    * pairs every `points` row whose `pointCol` falls in an `intervals`
    * row's half-open `[startCol, endCol)` (the standard event-in-
    * maintenance-window / click-in-session shape). Spark plans a bare
    * range-condition join as BroadcastNestedLoopJoin — O(points ×
    * intervals) work the moment the interval side outgrows a
    * broadcast. This is the classic bucketization instead: time is
    * cut into `bucketWidth`-second cells, each interval EXPANDS to
    * its covering cells (`len/width + 1` rows — bounded when interval
    * lengths are bounded, the caller's side of the contract), each
    * point maps to exactly ONE cell, and the join becomes an
    * EQUI-join on the cell id with the exact range predicate as a
    * post-filter. Because a point lives in one cell and an interval
    * appears at most once per cell, every qualifying pair emerges
    * exactly once — no dedup pass.
    *
    * Shuffle shape at 100 TB: one exchange on the cell id (or none,
    * when the expanded interval side broadcasts); cell skew is
    * governed by `bucketWidth` — size it so one cell's points fit a
    * task, the [[saltedJoin]] sizing argument.
    *
    * Columns: both frames' columns survive (caller disambiguates
    * names); `pointCol`/`startCol`/`endCol` may be numeric or
    * timestamps — timestamps bucket at SECOND resolution (Spark's
    * long cast) while the exact predicate compares at full precision;
    * the covering range is computed from the truncated endpoints, a
    * superset that the predicate prunes. Domain must be non-negative
    * (epoch time; integral `div` truncates toward zero, which equals
    * floor only there). Degenerate intervals (start >= end) match
    * nothing and are dropped before expansion. */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
                   pointCol: String, startCol: String, endCol: String,
                   bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    import org.apache.spark.sql.types.LongType
    // integral `div` (never float division then truncate — exact at
    // any long magnitude) over pre-projected long casts
    val p = points
      .withColumn("_pl", points(pointCol).cast(LongType))
      .withColumn("_cell", expr(s"_pl div ${bucketWidth}L"))
      .drop("_pl")
    val iv = intervals
      .filter(intervals(startCol) < intervals(endCol))
      .withColumn("_sl", intervals(startCol).cast(LongType))
      .withColumn("_el", intervals(endCol).cast(LongType))
      .withColumn("_cell", explode(sequence(
        expr(s"_sl div ${bucketWidth}L"), expr(s"_el div ${bucketWidth}L"))))
      .drop("_sl", "_el")
    p.join(iv, Seq("_cell"))
      .filter(p(pointCol) >= iv(startCol) && p(pointCol) < iv(endCol))
      .drop("_cell")
  }

  /** Key-skew diagnostic — the measurement step BEFORE reaching for
    * the levers above: per-key row counts, each key's share of the
    * table in parts-per-million (integer div — engine-exact), and the
    * salt factor [[saltedJoin]] would need so no sub-partition
    * exceeds `targetRowsPerTask` (ceiling division, ≥ 1). Top `topN`
    * keys by count. "Measure, don't guess": at 100 TB a join is sized
    * off this report, not off a sample.
    *
    * Scale shape: ONE map-side-combined census groupBy (the hottest
    * key collapses into partials — the census never concentrates a
    * key in one task), the table total derived from the census by a
    * scalar aggregate broadcast back (never a window), and a bounded
    * heap for the board (TakeOrderedAndProject). The report is
    * key-cardinality-sized; `df`'s rows are scanned once.
    *
    * @return (key, n_rows, share_ppm, n_salts) ordered by
    *         (n_rows desc, key), ≤ topN rows; `key` keeps the input
    *         column's type. */
  def skewReport(df: DataFrame, keyCol: String, targetRowsPerTask: Long,
                 topN: Int = 20): DataFrame = {
    require(targetRowsPerTask > 0L,
      s"targetRowsPerTask must be positive, got $targetRowsPerTask")
    require(topN > 0, s"topN must be positive, got $topN")
    val census = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_rows"))
    val total = census.agg(sum(col("n_rows")).as("_total"))
    census.crossJoin(broadcast(total))
      .select(col("key"), col("n_rows"),
        expr("(n_rows * 1000000L) div _total").as("share_ppm"),
        expr(s"(n_rows + ${targetRowsPerTask - 1}L) div " +
          s"${targetRowsPerTask}L").as("n_salts"))
      .orderBy(col("n_rows").desc, col("key"))
      .limit(topN)
  }

  /** SCD2 temporal dimension join — facts against a slowly-changing
    * dimension HISTORY: each fact row picks the dimension version
    * whose `[fromCol, toCol)` validity covers the fact's date, for
    * its key. Planned as a plain equi-join on the key with the range
    * test as a post-join filter — the equi key keeps it a hash/SMJ
    * join (a bare range join would plan BroadcastNestedLoop, the
    * [[intervalJoin]] problem; here the key IS the bucket). Inner
    * semantics: a fact with no covering version is dropped — with a
    * well-formed history (contiguous, non-overlapping) that only
    * happens for dates outside the history's span, and
    * [[scd2Overlaps]] is the contract check that the history IS
    * well-formed (overlapping versions would DUPLICATE facts here —
    * run the check when the history lands, not per join). */
  def scd2Join(facts: DataFrame, dimHistory: DataFrame, keyCol: String,
               factDateCol: String, fromCol: String,
               toCol: String): DataFrame =
    facts.join(dimHistory, Seq(keyCol))
      .filter(col(factDateCol) >= col(fromCol) &&
        col(factDateCol) < col(toCol))

  /** Overlapping-version pairs in an SCD2 history (empty = well-
    * formed). Self-join per key — version counts per key are small
    * by construction (a dimension row changes a handful of times),
    * so the per-key product is bounded; the hottest key is an
    * AQE-splittable join key. */
  def scd2Overlaps(dimHistory: DataFrame, keyCol: String,
                   fromCol: String, toCol: String): DataFrame = {
    val a = dimHistory.select(col(keyCol), col(fromCol).as("_fa"),
      col(toCol).as("_ta"))
    val b = dimHistory.select(col(keyCol), col(fromCol).as("_fb"),
      col(toCol).as("_tb"))
    a.join(b, Seq(keyCol))
      .filter(col("_fa") < col("_fb") ||
        (col("_fa") === col("_fb") && col("_ta") < col("_tb")))
      .filter(col("_fb") < col("_ta"))
  }

  /** Small-file compaction — the table-maintenance chore every
    * long-lived 100 TB parquet table needs (streaming ingests and
    * per-batch appends accumulate kilobyte files whose per-file open/
    * footer/task overhead eventually dominates scans): files under
    * `smallBytes` are read back and rewritten bin-packed toward
    * `targetBytes` outputs; files already big enough are COPIED
    * byte-identical, never decoded. Out-of-place publish (`outDir`),
    * the q108/q128 convention — readers of `inDir` are never racing a
    * half-compacted table, and the swap is the caller's atomic
    * rename. Row content is exactly preserved (the q205 oracle gates
    * the census); file-level layout is not (that is the point).
    *
    * @return (n_small_compacted, n_big_copied, n_files_out) one-row
    *         report */
  def compactSmallFiles(spark: org.apache.spark.sql.SparkSession,
                        inDir: String, outDir: String,
                        smallBytes: Long, targetBytes: Long): DataFrame = {
    require(smallBytes > 0 && targetBytes > 0,
      s"byte thresholds must be positive")
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val in = new Path(inDir)
    val fs = in.getFileSystem(conf)
    val parts = fs.listStatus(in).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val (small, big) = parts.partition(_.getLen < smallBytes)
    val out = new Path(outDir)
    if (fs.exists(out)) fs.delete(out, true)
    fs.mkdirs(out)
    big.foreach { st =>
      org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath, fs,
        new Path(out, st.getPath.getName), false, conf)
    }
    if (small.nonEmpty) {
      val totalSmall = small.map(_.getLen).sum
      val nOut = math.max(1L,
        (totalSmall + targetBytes - 1) / targetBytes).toInt
      spark.read.parquet(small.map(_.getPath.toString): _*)
        .repartition(nOut)
        .write.mode("append").parquet(outDir)
    }
    val nOut = fs.listStatus(out).count(st =>
      st.isFile && st.getPath.getName.endsWith(".parquet"))
    import spark.implicits._
    Seq((small.size.toLong, big.size.toLong, nOut.toLong))
      .toDF("n_small_compacted", "n_big_copied", "n_files_out")
  }

  /** Z-order (Morton) interleave of the low `bits` bits of two
    * non-negative integer columns: bit i of `a` lands at position 2i,
    * bit i of `b` at 2i+1. Sorting by this value clusters rows so
    * that a range predicate on EITHER dimension touches a bounded
    * band of the sort order — which is what turns parquet min/max
    * footer stats into file skipping for multi-dimensional filters
    * (the Delta/Iceberg OPTIMIZE ZORDER story, done with plain
    * arithmetic). Pure bit ops, codegen-friendly, and exactly
    * replayable in any engine with shifts (the q-oracle rebuilds it
    * term by term). Caller guarantees 0 ≤ value < 2^bits (mod/clamp
    * upstream); bits ≤ 31 keeps the result in the long's positive
    * range with room. */
  def zOrder2(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(
          shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` parquet laid out along the z-curve of (`colA` mod
    * 2^bits, `colB` mod 2^bits): range-repartition + in-partition
    * sort by the z-value, so each output file owns a contiguous,
    * disjoint z-range (ScaleOpsSpec asserts the disjointness — the
    * property parquet min/max pruning needs). One range exchange; no
    * global sort barrier beyond its sampling pass. */
  def zOrderWrite(df: DataFrame, dir: String, colA: String,
                  colB: String, bits: Int, numFiles: Int): Unit = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    val z = zOrder2(pmod(col(colA).cast("long"), lit(1L << bits)),
      pmod(col(colB).cast("long"), lit(1L << bits)), bits)
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .write.mode("overwrite").parquet(dir)
  }
}
