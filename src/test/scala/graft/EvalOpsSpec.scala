package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EvalOps

/** Hand-checked combinatorics for the eval estimators: pass@k against
  * the closed form on known (n, c) cases including both saturation
  * regimes and the undefined leg, the overflow guard, and
  * majority-vote determinism with the heap plan shape. */
class EvalOpsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("passAtK: closed-form cases, saturation, undefined leg") {
    // problem a: n=5, c=1 → 1 − C(4,3)/C(5,3) = 1 − 4/10 = 0.6
    // problem b: n=5, c=0 → 0
    // problem c: n=5, c=3 → n−c=2 < k → 1.0
    // problem d: n=2 < k → NULL (undefined, not 0 or 1)
    // problem e: n=6, c=2 → 1 − C(4,3)/C(6,3) = 1 − 4/20 = 0.8
    val rows =
      (1 to 5).map(i => ("a", i <= 1)) ++
      (1 to 5).map(_ => ("b", false)) ++
      (1 to 5).map(i => ("c", i <= 3)) ++
      (1 to 2).map(_ => ("d", true)) ++
      (1 to 6).map(i => ("e", i <= 2))
    val got = EvalOps.passAtK(rows.toDF("p", "ok"), "p", "ok", k = 3)
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got == Map("a" -> 600000L, "b" -> 0L, "c" -> 1000000L,
      "d" -> -1L, "e" -> 800000L), got.toString)
  }

  test("passAtK: guards — k range and the exact-arithmetic bound") {
    val df = Seq(("a", true)).toDF("p", "ok")
    intercept[IllegalArgumentException] {
      EvalOps.passAtK(df, "p", "ok", k = 0) }
    intercept[IllegalArgumentException] {
      EvalOps.passAtK(df, "p", "ok", k = 6) }
    // 400 samples exceed k=5's n-bound of 390: loud, not wrapped
    val big = (1 to 400).map(i => ("a", i % 2 == 0)).toDF("p", "ok")
    val e = intercept[Exception] {
      EvalOps.passAtK(big, "p", "ok", k = 5).collect() }
    assert(e.getMessage != null)
  }

  test("calibrationBuckets: decile assignment, ppm means, top-edge inclusion") {
    val rows = Seq((50000L, false), (55000L, false), (950000L, true),
      (940000L, false), (1000000L, true)) // conf=10⁶ joins the top bucket
      .toDF("conf", "ok")
    val got = EvalOps.calibrationBuckets(rows, "conf", "ok")
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(0L) == ((2L, 52500L, 0L, 52500L)), got(0L).toString)
    // bucket 9: n=3, mean (950000+940000+1000000)/3 = 963333, acc 2/3
    assert(got(9L) == ((3L, 963333L, 666666L, 296667L)), got(9L).toString)
    assert(got.keySet == Set(0L, 9L))
  }

  test("cohenKappa: hand-checked contingency, degenerate NULL") {
    // g: 5 (y,y), 2 (n,n), 2 (y,n), 1 (n,y) → po=0.7;
    // marginals a: y7/n3, b: y6/n4 → pe = (42+12)/100 = 0.54;
    // κ = 0.16/0.46 = 0.3478… → 347 milli (truncating div)
    val g = Seq.fill(5)(("g", "y", "y")) ++ Seq.fill(2)(("g", "n", "n")) ++
      Seq.fill(2)(("g", "y", "n")) ++ Seq(("g", "n", "y"))
    // h: both raters constant and equal → pe = 10⁶ → κ undefined
    val h = Seq.fill(4)(("h", "x", "x"))
    val got = EvalOps.cohenKappa((g ++ h).toDF("grp", "a", "b"),
        "grp", "a", "b")
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(got("g") == ((10L, 700000L, 540000L, 347L)), got("g").toString)
    assert(got("h") == ((4L, 1000000L, 1000000L, -1L)), got("h").toString)
  }

  test("majorityVote: majority, tie-break, agreement, heap plan") {
    val rows = Seq(
      // p1: x×3, y×2 → x wins, agreement 600000
      ("p1", "x"), ("p1", "x"), ("p1", "x"), ("p1", "y"), ("p1", "y"),
      // p2: tie 2–2 → lexicographically smaller answer wins
      ("p2", "bb"), ("p2", "aa"), ("p2", "bb"), ("p2", "aa"),
      // p3: unanimous
      ("p3", "z"), ("p3", "z"))
      .toDF("p", "ans")
    val mv = EvalOps.majorityVote(rows, "p", "ans")
    val got = mv.select($"p", $"majority_answer", $"votes",
        $"agreement_ppm", $"n_samples")
      .as[(String, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      ("p1", "x", 3L, 600000L, 5L),
      ("p2", "aa", 2L, 500000L, 4L),
      ("p3", "z", 2L, 1000000L, 2L)), got.toSeq.toString)
    val plan = mv.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroupFinal"),
      "majority rank must heap-rewrite")
    assert(!plan.contains("Window"), "no per-problem Window")
    // layout invariance
    val re = EvalOps.majorityVote(rows.toDF("p", "ans").repartition(5),
        "p", "ans")
      .select($"p", $"majority_answer", $"votes", $"agreement_ppm",
        $"n_samples")
      .as[(String, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(re.toSeq == got.toSeq)
  }
}
