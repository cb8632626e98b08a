package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Error bound for the approximate-percentile tier (q62): the
  * Greenwald-Khanna sketch at accuracy=10000 must track the exact
  * order statistics within 1% relative error on the real sf0.1 data —
  * the measured backing for shipping `approx_percentile` as the
  * 100 TB path (exact `percentile` holds all group values in memory;
  * the sketch is fixed-size and mergeable). */
class ApproxPercentileSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("approx_percentile relative error < 1% vs exact at sf0.1") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.1")
    val r = li.agg(
      percentile(col("l_extendedprice"), lit(0.5)).as("ex50"),
      percentile(col("l_extendedprice"), lit(0.9)).as("ex90"),
      percentile(col("l_extendedprice"), lit(0.99)).as("ex99"),
      approx_percentile(col("l_extendedprice"), lit(0.5), lit(10000)).as("ap50"),
      approx_percentile(col("l_extendedprice"), lit(0.9), lit(10000)).as("ap90"),
      approx_percentile(col("l_extendedprice"), lit(0.99), lit(10000)).as("ap99"))
      .head()
    def relErr(ex: Double, ap: Double): Double = math.abs(ap - ex) / math.abs(ex)
    Seq(("p50", 0, 3), ("p90", 1, 4), ("p99", 2, 5)).foreach { case (tag, ei, ai) =>
      val e = relErr(r.getDouble(ei), r.getDouble(ai))
      assert(e < 0.01, s"$tag relative error $e >= 1%")
    }
  }
}
