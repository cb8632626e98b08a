package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
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
    val corrupt = SyntheticOrderSource.corrupt(
      SyntheticOrderSource.orders(spark, 5000, 42), 42)
    val v = OrderPipeline.withValidation(corrupt)
    time("validated-count")(v.count())
    val errRows = v.select(explode(col("validation_errors")).as("check_name"))
      .groupBy(col("check_name")).agg(count(lit(1)).as("n"))
    time("errRows")(errRows.count())
    val validRow = v.filter(size(col("validation_errors")) === 0)
      .agg(count(lit(1)).as("n"))
      .select(lit("valid_orders").as("check_name"), col("n"))
    time("validRow")(validRow.count())
    time("union")(errRows.union(validRow).orderBy(col("check_name")).count())
    spark.stop()
  }
}
