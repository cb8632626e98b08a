package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main for isolating operator costs and smoke
  * checks (head-to-head A/B timings; see the memory notes — Probe
  * times construct vs count, Scratch hosts whatever experiment the
  * current round needs in one warm session).
  * Usage: `runMain graft.tools.Scratch`. Current body: the driver's
  * entry smoke — `SparkEntry.entry` must return >0 rows on sf0.001. */
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
    val n = graft.SparkEntry.entry(spark).count()
    println(s"entry-smoke rows=$n ${if (n > 0) "OK" else "FAIL"}")
    spark.stop()
    if (n == 0) sys.exit(1)
  }
}
