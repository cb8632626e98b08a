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
}
