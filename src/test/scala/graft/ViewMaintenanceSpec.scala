package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ViewMaintenance

/** The maintenance law: maintained state == state rebuilt from the
  * merged corpus, across every op class including group moves and
  * group births/deaths. */
class ViewMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val base = Seq(
    (1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "c", 40L)
  ).toDF("id", "grp", "val")

  // D 3 (kills b), U 2 (moves a→c, 20→25), I 5 (new group d), I 6 (a)
  private lazy val changelog = Seq(
    (3L, "D", "b", 30L), (2L, "U", "c", 25L),
    (5L, "I", "d", 50L), (6L, "I", "a", 60L)
  ).toDF("id", "op", "grp", "val")

  private def collectView(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("maintained view equals the from-scratch rebuild of the merged facts") {
    val state = ViewMaintenance.aggView(base, "grp", "val")
    val maintained = ViewMaintenance.maintainAggView(
      state, base, changelog, "id", "grp", "val")
    val merged = base.join(
        changelog.filter(col("op").isin("D", "U")).select("id"),
        Seq("id"), "left_anti")
      .select("id", "grp", "val")
      .union(changelog.filter(col("op").isin("U", "I"))
        .select("id", "grp", "val"))
    val rebuilt = ViewMaintenance.aggView(merged, "grp", "val")
    assert(collectView(maintained) === collectView(rebuilt))
  }

  test("a group whose last row is deleted leaves the view") {
    val state = ViewMaintenance.aggView(base, "grp", "val")
    val out = collectView(ViewMaintenance.maintainAggView(
      state, base, changelog, "id", "grp", "val"))
    assert(!out.exists(_._1 == "b"))
  }

  test("a group move debits the old group and credits the new one") {
    val state = ViewMaintenance.aggView(base, "grp", "val")
    val m = collectView(ViewMaintenance.maintainAggView(
      state, base, changelog, "id", "grp", "val"))
      .map(t => t._1 -> (t._2, t._3)).toMap
    // a: lost id2 (20), gained id6 (60) → cnt 2, total 70
    assert(m("a") === (2L, 70L))
    // c: kept id4 (40), gained moved id2 at NEW value 25 → cnt 2, 65
    assert(m("c") === (2L, 65L))
    assert(m("d") === (1L, 50L))
  }

  test("before-image changelog path equals the base-consulting path") {
    val state = ViewMaintenance.aggView(base, "grp", "val")
    // same ops as `changelog`, with old images attached (ids 3, 2)
    val cdc = Seq(
      ("D", "b", 30L, "b", 30L), ("U", "c", 25L, "a", 20L),
      ("I", "d", 50L, null.asInstanceOf[String], 0L),
      ("I", "a", 60L, null.asInstanceOf[String], 0L)
    ).toDF("op", "grp", "val", "old_grp", "old_val")
    val viaCdc = ViewMaintenance.maintainAggViewCdc(state, cdc,
      "grp", "val")
    val viaBase = ViewMaintenance.maintainAggView(state, base,
      changelog, "id", "grp", "val")
    assert(collectView(viaCdc) === collectView(viaBase))
  }

  test("an empty changelog is the identity") {
    val state = ViewMaintenance.aggView(base, "grp", "val")
    val out = ViewMaintenance.maintainAggView(state, base,
      changelog.limit(0), "id", "grp", "val")
    assert(collectView(out) === collectView(state))
  }
}
