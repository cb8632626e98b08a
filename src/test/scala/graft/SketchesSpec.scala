package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches

/** Count-min sketch invariants: the one-sided error guarantee and the
  * cell-wise-sum merge law (the property that makes the same plan
  * serve as the multi-shard merge). */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val depth = 3
  private val width = 8

  private lazy val terms =
    (Seq.fill(40)("alpha") ++ Seq.fill(15)("beta") ++
      Seq.fill(7)("gamma") ++ Seq.fill(1)("delta") ++
      (0 until 30).map(i => s"noise$i")).toDF("term")

  test("estimate >= exact for every present term (one-sided error)") {
    val sketch = Sketches.countMinBuild(terms, "term", depth, width)
    val probes = terms.select("term").distinct()
    val est = Sketches.countMinEstimate(sketch, probes, "term",
      depth, width)
    val exact = terms.groupBy("term").agg(count(lit(1)).as("exact"))
    val bad = est.join(exact, "term")
      .filter(col("est") < col("exact")).count()
    assert(bad === 0)
  }

  test("absent term estimates >= 0 and only from colliding mass") {
    val sketch = Sketches.countMinBuild(terms, "term", depth, width)
    val est = Sketches.countMinEstimate(sketch,
      Seq("never_seen_term").toDF("term"), "term", depth, width)
      .collect()
    assert(est.length === 1 && est.head.getLong(1) >= 0L)
  }

  test("union-then-aggregate of two shard sketches equals the full build") {
    val a = terms.filter(md5(col("term")).substr(1, 1) < "8")
    val b = terms.filter(md5(col("term")).substr(1, 1) >= "8")
    val merged = Sketches.countMinBuild(a, "term", depth, width)
      .union(Sketches.countMinBuild(b, "term", depth, width))
      .groupBy("row", "cell").agg(sum("cnt").as("cnt"))
    val full = Sketches.countMinBuild(terms, "term", depth, width)
    assert(merged.except(full).count() === 0 &&
      full.except(merged).count() === 0)
  }

  test("grid never exceeds depth x width cells and rows cover 0..depth-1") {
    val sketch = Sketches.countMinBuild(terms, "term", depth, width)
      .collect()
    assert(sketch.length <= depth * width)
    val rows = sketch.map(_.getLong(0)).toSet
    assert(rows.subsetOf((0 until depth).map(_.toLong).toSet))
    assert(sketch.forall(r => r.getLong(1) >= 0 && r.getLong(1) < width))
  }

  test("null terms are dropped, not hashed") {
    val withNull = Seq(Some("x"), None, Some("x")).toDF("term")
    val sketch = Sketches.countMinBuild(withNull, "term", depth, width)
    val total = sketch.agg(sum("cnt")).collect().head.getLong(0)
    assert(total === 2L * depth)
  }

  test("probing an empty sketch estimates 0 for every term") {
    val emptySketch = Sketches.countMinBuild(
      terms.filter(col("term") === "no_such"), "term", depth, width)
    val est = Sketches.countMinEstimate(emptySketch,
      Seq("alpha", "beta").toDF("term"), "term", depth, width)
      .collect().map(_.getLong(1))
    assert(est.forall(_ === 0L))
  }
}
