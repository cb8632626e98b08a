package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ScaleOps

/** The shuffle-shaping levers actually shape plans: salted joins
  * produce identical results while spreading hot keys, and bucketed
  * tables join with zero exchanges. */
class ScaleOpsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("saltedJoin equals the plain join on a skewed key") {
    // 90% of fact rows share key 1
    val fact = (0L until 2000L)
      .map(i => (if (i % 10 == 0) i % 7 + 2 else 1L, i, s"p$i"))
      .toDF("k", "row_id", "payload")
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"),
      (5L, "d"), (6L, "e"), (7L, "f"), (8L, "g")).toDF("k", "dim_val")
    val plain = fact.join(dim, Seq("k"))
      .select($"row_id", $"dim_val").as[(Long, String)].collect().toSet
    val salted = ScaleOps.saltedJoin(fact, dim, "k", $"row_id", numSalts = 8)
      .select($"row_id", $"dim_val").as[(Long, String)].collect().toSet
    assert(salted == plain)
    // the salt genuinely participates in the join partitioning
    val plan = ScaleOps.saltedJoin(fact, dim, "k", $"row_id", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), "salt column missing from the plan")
  }

  test("bucketed tables join with no shuffle exchange") {
    val a = (0L until 1000L).map(i => (i % 100, i)).toDF("k", "va")
    val b = (0L until 1000L).map(i => (i % 100, i * 2)).toDF("k", "vb")
    ScaleOps.writeBucketed(a, "graft_bucket_a", "k", 8)
    ScaleOps.writeBucketed(b, "graft_bucket_b", "k", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bucket_a")
        .join(spark.table("graft_bucket_b"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 10000) // 100 keys × 10 × 10
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    }
  }
}
