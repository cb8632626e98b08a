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
