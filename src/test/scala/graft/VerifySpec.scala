package graft

import org.scalatest.funsuite.AnyFunSuite

/** The oracle-emit seam: [[Verify.materializeCtes]] must rewrite CTE
  * heads and ONLY CTE heads — a named WINDOW spec uses the same
  * `name AS (` spelling but its body never starts with SELECT. */
class VerifySpec extends AnyFunSuite {

  test("materializeCtes: CTE heads rewritten, window specs and aliases untouched") {
    val sql = """WITH a AS (SELECT 1 AS x),
      b AS (
        SELECT x, sum(x) OVER w AS s2
        FROM a
        WINDOW w AS (PARTITION BY x ORDER BY x),
          wf AS (PARTITION BY x))
      SELECT * FROM b"""
    val got = Verify.materializeCtes(sql)
    assert(got.contains("a AS MATERIALIZED (SELECT 1 AS x)"))
    assert(got.contains("b AS MATERIALIZED ("))
    assert(got.contains("WINDOW w AS (PARTITION BY x ORDER BY x)"),
      got)
    assert(got.contains("wf AS (PARTITION BY x)"), got)
    // idempotent: an already-materialized head is left alone
    assert(Verify.materializeCtes(got) == got)
    // multi-line CTE heads (the generated oracles' layout) rewrite too
    val ml = "WITH c AS (\n        SELECT 2)\nSELECT * FROM c"
    assert(Verify.materializeCtes(ml)
      .contains("c AS MATERIALIZED (\n        SELECT 2)"))
    // column aliases and scalar subqueries are not CTE heads
    val alias = "SELECT (SELECT 1) AS y, sum(x) AS (nope" // not valid SQL,
    // but proves the regex needs the SELECT anchor, not just `AS (`
    assert(Verify.materializeCtes(alias) == alias)
  }
}
