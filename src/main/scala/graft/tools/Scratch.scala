package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch main for isolating operator costs (head-to-head
  * A/B timings; see the memory notes — Probe times construct vs count,
  * Scratch times alternative formulations in one warm session).
  * Usage: `runMain graft.tools.Scratch [sfDir]`. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(s"$label: n=$n sec=${(System.nanoTime() - t0) / 1e9}")
    }
    val docs = graft.sources.Tables.documents(spark, sfDir)
    time("docs-count")(docs.count())
    time("mix")(graft.operators.DatasetOps
      .temperatureMix(docs, "lang", "doc_id").count())
    spark.stop()
  }
}
