package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev-only plan/timing probe: `runMain graft.tools.Probe <sfDir> <q1> [q2 …]`
  * prints the formatted physical plan and wall time for each named query. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val tc = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      val constructSec = (System.nanoTime() - tc) / 1e9
      println(s"==== $n plan ====")
      df.explain("formatted")
      val t0 = System.nanoTime()
      val c = df.count()
      println(s"==== $n rows=$c construct=$constructSec sec=${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
