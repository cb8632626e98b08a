package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining — the "bought X also bought Y"
  * primitive behind recommendations, substitution detection, and
  * bundling analytics. Kept deliberately relational: counts, two
  * integer divisions, a bounded board — no candidate-generation
  * machinery, because at pair length the Apriori frontier IS just the
  * pair census.
  */
object Association {

  /** Directed pair rules `ante → cons` over baskets: support counts,
    * confidence `c(ab)·10⁶ div c(a)` and lift as the STAGED division
    * `conf_ppm·N div c(b)` (the PMI convention — two integer divs,
    * deterministic everywhere, and the staging keeps the product
    * inside int64 up to ~9·10¹² baskets where the naive
    * `c(ab)·N·10⁶` overflows at ~10⁴ baskets × web-scale counts).
    * lift_ppm > 10⁶ means positively associated.
    *
    * Scale shape: basket/item pairs are dedup'd first, the pair
    * census is a self-equi-join on the basket id whose fan-out is
    * Σ basket_size² — bounded by the caller's basket semantics, the
    * [[Graph.triangleCensus]] wedge argument, and AQE-splittable on a
    * hot basket; the support floor prunes BEFORE the census joins;
    * both censuses and the total are map-side-combined; the board is
    * a bounded heap.
    *
    * @return (ante, cons, n_ab, n_a, n_b, conf_ppm, lift_ppm) ordered
    *         by (lift_ppm desc, ante, cons), ≤ topN rows. */
  def associationRules(baskets: DataFrame, basketCol: String,
                       itemCol: String, minPairSupport: Long,
                       topN: Int): DataFrame = {
    require(minPairSupport >= 1L,
      s"minPairSupport must be >= 1, got $minPairSupport")
    require(topN > 0, s"topN must be positive, got $topN")
    val bi = baskets
      .select(col(basketCol).as("_b"), col(itemCol).as("_i")).distinct()
    val total = bi.agg(count_distinct(col("_b")).as("_n"))
    val items = bi.groupBy(col("_i")).agg(count(lit(1)).as("_ni"))
    val pairs = bi.as("a")
      .join(bi.as("b"),
        col("a._b") === col("b._b") && col("a._i") =!= col("b._i"))
      .groupBy(col("a._i").as("ante"), col("b._i").as("cons"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairSupport)
    pairs
      .join(items.select(col("_i").as("ante"), col("_ni").as("n_a")), "ante")
      .join(items.select(col("_i").as("cons"), col("_ni").as("n_b")), "cons")
      .crossJoin(broadcast(total))
      .select(col("ante"), col("cons"), col("n_ab"), col("n_a"),
        col("n_b"), col("_n"),
        expr("(n_ab * 1000000L) div n_a").as("conf_ppm"))
      .withColumn("lift_ppm", expr("(conf_ppm * _n) div n_b"))
      .drop("_n")
      .orderBy(col("lift_ppm").desc, col("ante"), col("cons"))
      .limit(topN)
  }
}
