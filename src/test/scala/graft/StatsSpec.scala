package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Stats

/** Order-statistics invariants for the distributed exact-quantile
  * machinery, plus the scale guard: no global (partition-less)
  * window anywhere in the plan. */
class StatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // skewed multiset: one hot value, negatives, a spread tail
  private lazy val values =
    (Seq.fill(500)(42L) ++ (-50L to 449L) ++ Seq(-1000L, 100000L))
      .toDF("v")

  test("cumulative census matches the single-node definition") {
    val got = Stats.cumulativeValueCensus(values, "v", coarseBuckets = 7)
      .orderBy("v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val local = values.collect().map(_.getLong(0)).sorted
    val expected = local.distinct.map { v =>
      (v, local.count(_ == v).toLong, local.count(_ <= v).toLong)
    }
    assert(got.toSeq === expected.toSeq)
  }

  test("quantile probes: p100 is the max, median reaches half the mass") {
    val q = Stats.exactQuantiles(values, "v",
        Seq(500000L, 1000000L), coarseBuckets = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val local = values.collect().map(_.getLong(0)).sorted
    assert(q(1000000L) === local.max)
    val n = local.length
    assert(q(500000L) === local((n + 1) / 2 - 1))
  }

  test("equi-depth buckets partition the mass with disjoint ranges") {
    val h = Stats.equiDepthHistogram(values, "v", k = 4,
      coarseBuckets = 7).orderBy("bucket").collect()
    assert(h.map(_.getLong(3)).sum === values.count())
    // ranges ordered and disjoint
    h.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) < b.getLong(1))
      case _ =>
    }
  }

  test("all-equal values collapse to one bucket and one quantile") {
    val flat = Seq.fill(100)(7L).toDF("v")
    val h = Stats.equiDepthHistogram(flat, "v", k = 8).collect()
    assert(h.length === 1 && h.head.getLong(3) === 100L)
    val q = Stats.exactQuantiles(flat, "v", Seq(10000L, 990000L))
      .collect()
    assert(q.forall(_.getLong(2) === 7L))
  }

  test("winsorized mean sits inside the clamp range") {
    val s = Stats.winsorizedStats(values, "v", 10000L, 990000L)
      .collect().head
    val (lo, hi) = (s.getLong(1), s.getLong(2))
    val mean = s.getDouble(3)
    assert(lo <= mean && mean <= hi)
    assert(s.getDouble(4) >= 0.0)
  }

  test("grouped quantiles match the per-group single-node definition") {
    val grouped = values.withColumn("g",
      (col("v") % 3 === 0).cast("string"))
    val got = Stats.groupedExactQuantiles(grouped, "g", "v",
        Seq(500000L, 1000000L), coarseBuckets = 5)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    val local = values.collect().map(_.getLong(0))
      .groupBy(v => (v % 3 == 0).toString)
    local.foreach { case (g, vs) =>
      val sorted = vs.sorted
      val n = sorted.length
      assert(got((g, 1000000L)) === sorted.max)
      assert(got((g, 500000L)) === sorted((n + 1) / 2 - 1))
    }
    // null groups and null values are excluded, not a crash
    val withNulls = grouped.union(
      Seq((Option.empty[Long], Option("x")),
        (Option(5L), Option.empty[String]))
        .toDF("v", "g"))
    assert(Stats.groupedExactQuantiles(withNulls, "g", "v",
      Seq(500000L)).filter(col("grp") === "x").count() === 0)
  }

  test("stats TVFs: SQL path matches the Scala operator; bad args refuse loudly") {
    values.createOrReplaceTempView("graft_stats_tvf")
    try {
      val viaSql = spark.sql(
        """SELECT q_ppm, rank_, value
          FROM exact_quantiles('graft_stats_tvf', 'v', '500000, 1000000')
          ORDER BY q_ppm""").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val viaScala = Stats.exactQuantiles(values, "v",
          Seq(500000L, 1000000L)).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(viaSql === viaScala)
      val histSql = spark.sql(
        """SELECT bucket, lo, hi, n_rows
          FROM equidepth_hist('graft_stats_tvf', 'v', 4)
          ORDER BY bucket""").collect().map(_.toSeq).toSeq
      val histScala = Stats.equiDepthHistogram(values, "v", 4)
        .collect().map(_.toSeq).toSeq
      assert(histSql === histScala)
      intercept[Exception] {
        spark.sql("SELECT * FROM exact_quantiles('graft_stats_tvf', 'v', 'nope')")
      }
      intercept[Exception] {
        spark.sql("SELECT * FROM equidepth_hist('graft_stats_tvf', 'v')")
      }
      intercept[Exception] {
        spark.sql("SELECT * FROM weighted_sample('graft_stats_tvf', 'v', 'v', 'v')")
      }
    } finally spark.catalog.dropTempView("graft_stats_tvf")
  }

  test("no global window in the quantile plan (the q130 guard)") {
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collect { case n => n }.flatMap {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a +: allNodes(a.executedPlan)
        case n => Seq(n)
      }
    val df = Stats.exactQuantiles(values, "v", Seq(500000L))
    df.collect()
    val global = allNodes(df.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.forall(_.foldable) => w
    }
    assert(global.isEmpty)
  }

  test("empty and all-null inputs yield empty results, not crashes") {
    val empty = values.filter(col("v") > Long.MaxValue - 1)
    assert(Stats.cumulativeValueCensus(empty, "v").count() === 0)
    assert(Stats.exactQuantiles(empty, "v", Seq(500000L)).count() === 0)
    assert(Stats.equiDepthHistogram(empty, "v", 4).count() === 0)
    val allNull = Seq(Option.empty[Long], Option.empty[Long]).toDF("v")
    assert(Stats.exactQuantiles(allNull, "v", Seq(500000L)).count() === 0)
    // profile still reports aggregate stats (null-valued) + row count,
    // but no p50 row for a value-less column
    val prof = Stats.profile(allNull, Seq("v")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(prof.contains(("_table", "n_rows")))
    assert(!prof.contains(("v", "p50")))
  }
}
