package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch main for isolating operator costs and smoke
  * checks (head-to-head A/B timings; see the memory notes — Probe
  * times construct vs count, Scratch hosts whatever experiment the
  * current round needs in one warm session).
  * Usage: `runMain graft.tools.Scratch`. Current body: clusterReps
  * fixpoint cost on a q63-shaped synthetic graph (920 edges over
  * ~1100 nodes in shallow clusters), isolated from the census/IO. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(s"$label: n=$n sec=${(System.nanoTime() - t0) / 1e9}")
    }
    // ~300 clusters of 3-4 nodes (diameter ≤ 2) + one 30-chain
    val clusters = (0 until 300).flatMap { c =>
      val base = c * 10L
      Seq((base, base + 1), (base, base + 2), (base + 1, base + 3))
    }
    val chain = (0 until 30).map(i => (5000L + i, 5001L + i))
    val pairs = (clusters ++ chain).toDF("idA", "idB")
      .repartition(4).cache()
    pairs.count()
    for (i <- 1 to 3)
      time(s"clusterReps-$i")(
        graft.operators.Dedup.clusterReps(pairs, checkpointPairs = false).count())
    spark.stop()
  }
}
