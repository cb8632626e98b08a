package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.TopKPerGroup

/** Ground truth for the custom top-k-per-group plan node: identical
  * rows to the window encoding under any input partitioning, with the
  * same total-order tie-break contract. */
class TopKPerGroupSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private lazy val df = {
    val rnd = new scala.util.Random(3)
    // duplicate v values on purpose: the id tie-breaker must decide
    (0 until 2000).map(i => (i.toLong, rnd.nextInt(20), rnd.nextInt(50).toDouble))
      .toDF("id", "g", "v")
  }

  private def viaWindow(k: Int) = {
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
    df.withColumn("_rn", row_number().over(w)).filter($"_rn" <= k)
      .select($"id", $"g", $"v")
  }

  test("equals the window encoding rows exactly, regardless of input partitioning") {
    for (parts <- Seq(1, 13)) {
      val got = TopKPerGroup(df.repartition(parts),
        Seq("g"), Seq(("v", false), ("id", true)), k = 4)
      val expected = viaWindow(4)
      assert(got.count() == expected.count())
      assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
        s"row mismatch at parts=$parts")
    }
  }

  test("k larger than every group keeps all rows") {
    val got = TopKPerGroup(df, Seq("g"), Seq(("v", true), ("id", true)), k = 10000)
    assert(got.count() == df.count())
  }

  test("unknown column fails with a clear error") {
    val e = intercept[IllegalArgumentException] {
      TopKPerGroup(df, Seq("nope"), Seq(("v", true)), k = 1)
    }
    assert(e.getMessage.contains("nope"))
  }
}
