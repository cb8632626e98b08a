package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main: entry smoke by default (the driver's
  * `SparkEntry.entry` must return >0 rows), plus whatever isolated
  * experiment the current round needs behind an arg (see the memory
  * notes — Probe times construct vs count, Scratch hosts A/B
  * head-to-heads in one warm session).
  * Usage: `runMain graft.tools.Scratch [entry|cc]`. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("entry")
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
    mode match {
      case "cc" =>
        // clusterReps fixpoint cost on a q63-shaped synthetic graph
        // (~300 shallow clusters + one 30-chain), isolated from IO
        val clusters = (0 until 300).flatMap { c =>
          val base = c * 10L
          Seq((base, base + 1), (base, base + 2), (base + 1, base + 3))
        }
        val chain = (0 until 30).map(i => (5000L + i, 5001L + i))
        val pairs = (clusters ++ chain).toDF("idA", "idB").repartition(4).cache()
        pairs.count()
        for (i <- 1 to 3)
          time(s"clusterReps-$i")(
            graft.operators.Dedup.clusterReps(pairs, checkpointPairs = false).count())
      case _ =>
        val n = graft.SparkEntry.entry(spark).count()
        println(s"entry-smoke rows=$n ${if (n > 0) "OK" else "FAIL"}")
        if (n == 0) { spark.stop(); sys.exit(1) }
    }
    spark.stop()
  }
}
