package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EntityResolution

class EntityResolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val recs = Seq(
    (1L, "blk1", "alpha"), (2L, "blk1", "alpho"), (3L, "blk1", "beta"),
    (4L, "blk2", "gamma"), (5L, "blk2", "gamna"),
    (6L, "solo", "delta")
  ).toDF("id", "bk", "name")

  test("pairs are generated within blocks only, once, with id_a < id_b") {
    val got = EntityResolution.blockedCandidates(recs, "id", col("bk"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))
  }

  test("oversize blocks are dropped whole (the skew guard)") {
    val hot = (0 until 50).map(i => (100L + i, "hot", s"n$i")).toDF("id", "bk", "name")
    val got = EntityResolution.blockedCandidates(
      recs.union(hot), "id", col("bk"), maxBlockSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))
  }

  test("null block keys never pair") {
    val withNull = Seq((7L, null: String, "x"), (8L, null: String, "y"))
      .toDF("id", "bk", "name")
    assert(EntityResolution.blockedCandidates(
      recs.union(withNull), "id", col("bk"))
      .filter(col("id_a") >= 7L || col("id_b") >= 7L).count() === 0)
  }

  test("joinPairFields carries both sides' fields with a_/b_ prefixes") {
    val pairs = EntityResolution.blockedCandidates(recs, "id", col("bk"))
    val wide = EntityResolution.joinPairFields(pairs, recs, "id",
      Seq("name"))
    assert(wide.columns.toSet === Set("id_a", "id_b", "a_name", "b_name"))
    val row = wide.filter(col("id_a") === 4L).collect().head
    assert(row.getAs[String]("a_name") === "gamma" &&
      row.getAs[String]("b_name") === "gamna")
  }
}
