package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Dev-only scratch main for isolating operator costs. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(s"$label: n=$n sec=${(System.nanoTime() - t0) / 1e9}")
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
    time("scan")(docs.count())
    val sh = docs.filter(length(col("text")) >= 5)
      .select(col("doc_id"), col("source"),
        transform(charShingles(col("text"), 5), x => xxhash64(x)).as("sh"))
    time("shingle")(sh.select(sum(size(col("sh")))).first().getLong(0))
    val posts = sh.select(col("source"), col("doc_id"),
      size(col("sh")).as("_sz"), explode(col("sh")).as("_g"))
    time("explode")(posts.count())
    val a = posts.select(col("source"), col("_g"), col("doc_id").as("idA"), col("_sz").as("_szA"))
    val b = posts.select(col("source").as("_srcB"), col("_g").as("_gB"), col("doc_id").as("idB"), col("_sz").as("_szB"))
    // variant 1: inverted-index with one reused exchange
    val pr = posts.repartition(32, col("source"), col("_g"))
    val a2 = pr.select(col("source"), col("_g"), col("doc_id").as("idA"), col("_sz").as("_szA"))
    val b2 = pr.select(col("source").as("_srcB"), col("_g").as("_gB"), col("doc_id").as("idB"), col("_sz").as("_szB"))
    val j2 = a2.join(b2, col("source") === col("_srcB") && col("_g") === col("_gB") && col("idA") < col("idB"))
    val agg2 = j2.groupBy(col("source"), col("idA"), col("idB"))
      .agg(count(lit(1)).as("_inter"), min(col("_szA")).as("_szA"), min(col("_szB")).as("_szB"))
      .withColumn("jaccard", round(col("_inter").cast("double") / (col("_szA") + col("_szB") - col("_inter")).cast("double"), 6))
      .filter(col("jaccard") >= 0.5)
    time("invindex-e2e")(agg2.count())
    // variant 2: block pair join, size-pruned, single intersect, repartitioned
    val shr = sh.withColumn("sz", size(col("sh"))).repartition(32)
    val pa = shr.select(col("source"), col("doc_id").as("idA"), col("sh").as("shA"), col("sz").as("szA"))
    val pb = shr.select(col("source").as("srcB"), col("doc_id").as("idB"), col("sh").as("shB"), col("sz").as("szB"))
    val inter = size(array_intersect(col("shA"), col("shB")))
    val blk = pa.join(pb, col("source") === col("srcB") && col("idA") < col("idB") &&
        greatest(col("szA"), col("szB")) <= least(col("szA"), col("szB")) * 2 + 1)
      .withColumn("jaccard", round(inter.cast("double") / (col("szA") + col("szB") - inter).cast("double"), 6))
      .filter(col("jaccard") >= 0.5)
    time("block-e2e")(blk.count())
    // variant 3: guard inside the jaccard expression (short-circuits pushed condition)
    val guarded = when(
      greatest(col("szA"), col("szB")) <= least(col("szA"), col("szB")) * 2 + 1,
      round(inter.cast("double") / (col("szA") + col("szB") - inter).cast("double"), 6))
      .otherwise(lit(0.0))
    val blk3 = pa.join(pb, col("source") === col("srcB") && col("idA") < col("idB"))
      .withColumn("jaccard", guarded)
      .filter(col("jaccard") >= 0.5)
    time("block-guarded-e2e")(blk3.count())
    spark.stop()
  }
}
