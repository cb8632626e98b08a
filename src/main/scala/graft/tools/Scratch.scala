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
        
    import graft.functions.TextFunctions._
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
    def run(sorted: Boolean): Long = {
      val base = docs.filter(length(col("text")) >= 5)
      val shCol = if (sorted)
        array_sort(transform(charShingles(col("text"), 5), x => xxhash64(x)))
      else transform(charShingles(col("text"), 5), x => xxhash64(x))
      val fn = if (sorted) "jaccard_sim_sorted" else "jaccard_sim"
      val sh = base.select(col("doc_id"), col("source"), shCol.as("sh"))
        .withColumn("sz", size(col("sh")))
        .repartition(32)
      val a = sh.select(col("source"), col("doc_id").as("idA"), col("sh").as("shA"), col("sz").as("szA"))
      val b = sh.select(col("source").as("srcB"), col("doc_id").as("idB"), col("sh").as("shB"), col("sz").as("szB"))
      val guarded = when(
        greatest(col("szA"), col("szB")) <= least(col("szA"), col("szB")) * 2 + 1,
        round(call_function(fn, col("shA"), col("shB")), 6)).otherwise(lit(0.0))
      a.join(b, col("source") === col("srcB") && col("idA") < col("idB"))
        .withColumn("jaccard", guarded).filter(col("jaccard") >= 0.5).count()
    }
    run(false); run(true) // warm both code paths
    time("old-unsorted")(run(false))
    time("new-sorted")(run(true))
    time("old-unsorted2")(run(false))
    time("new-sorted2")(run(true))

    spark.stop()
  }
}
