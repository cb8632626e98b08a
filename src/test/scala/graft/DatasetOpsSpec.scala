package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DatasetOps

/** Properties of the dataset-assembly operators: hash-split stability
  * (the whole point over rand()) and planted-contamination recovery. */
class DatasetOpsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("hashSplit: deterministic, repartition-invariant, fractions in range") {
    val ids = (0L until 5000L).toDF("id")
    val a = DatasetOps.hashSplit(ids, "id")
      .select($"id", $"split").as[(Long, String)].collect().toMap
    val b = DatasetOps.hashSplit(ids.repartition(13), "id")
      .select($"id", $"split").as[(Long, String)].collect().toMap
    assert(a == b, "split membership must not depend on physical layout")
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 5000.0).toMap
    assert(math.abs(frac("train") - 0.9) < 0.02, s"train ${frac("train")}")
    assert(math.abs(frac("val") - 0.05) < 0.01, s"val ${frac("val")}")
    assert(math.abs(frac("test") - 0.05) < 0.01, s"test ${frac("test")}")
  }

  test("contaminatedIds finds exactly the docs sharing a 5-gram with the benchmark") {
    val bench = Seq((1000L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "something about the quick brown fox jumps high today"), // shares a 5-gram
      (2L, "quick brown fox jumps over everything else entirely"),  // shares a 5-gram
      (3L, "completely unrelated text with no shared phrases at all"),
      (4L, "the quick brown dog sits still"))                       // 4-gram overlap only
      .toDF("doc_id", "text")
    val hit = DatasetOps.contaminatedIds(corpus, bench, "doc_id", "text")
      .as[Long].collect().toSet
    assert(hit == Set(1L, 2L), s"got $hit")
  }
}
