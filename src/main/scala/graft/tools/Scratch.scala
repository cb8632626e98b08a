package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.enrich.OrderEnrich
import graft.generate.SyntheticOrderSource
import graft.pipeline.OrderPipeline

/** Dev-only scratch main for isolating operator costs. */
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
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(s"$label: n=$n sec=${(System.nanoTime() - t0) / 1e9}")
    }
        
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
    val step1 = graft.operators.DatasetOps.temperatureMix(docs, "lang", "doc_id")
    println("mix rows=" + step1.count())
    println(step1.columns.mkString(","))

    spark.stop()
  }
}
