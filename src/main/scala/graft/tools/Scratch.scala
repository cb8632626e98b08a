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
    def enrichNarrow(df: org.apache.spark.sql.DataFrame) = {
      // simulate the pre-r4 narrow batch form: scalar enrich + the
      // intra-row HOF map, forced by a count over its serialized form
      OrderPipeline.processOrders(df, s"scr_${System.nanoTime()}")
        .drop("product_mix")
        .withColumn("product_mix", OrderEnrich.productMix(col("items")))
    }
    for (n <- Seq(5000, 100000, 400000)) {
      val raw = SyntheticOrderSource.orders(spark, n, 42)
      val dir = java.nio.file.Files.createTempDirectory("scr_raw_").toString
      raw.write.mode("overwrite").parquet(dir)
      // the real materialization shape: corruption tree ON TOP of the scan
      val fromDisk = SyntheticOrderSource.corrupt(spark.read.parquet(dir), 42)
      time(s"n=$n narrow-enrich-write") {
        val d = java.nio.file.Files.createTempDirectory("scr_n_").toString
        enrichNarrow(fromDisk).write.mode("overwrite").parquet(d)
        1L
      }
      time(s"n=$n batch-enrich-write") {
        val d = java.nio.file.Files.createTempDirectory("scr_b_").toString
        OrderPipeline.processOrders(fromDisk, s"scr2_${System.nanoTime()}")
          .write.mode("overwrite").parquet(d)
        1L
      }
    }
    spark.stop()
  }
}
