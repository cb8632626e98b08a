package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions over the real sf0.001 tables — the
  * "would this survive a 100× scale-up" properties as hard checks
  * rather than prose: filters reach the parquet scan, projections
  * prune columns, dimensions broadcast, top-k avoids a global sort,
  * and the hot path stays inside whole-stage codegen. */
class PlanSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q03: predicates are pushed into the parquet scans") {
    val p = plan("q03_shipping_priority")
    assert(p.contains("PushedFilters"), "no pushed filters at all")
    // the date and segment predicates reach the scans, not post-filters only
    assert(p.contains("IsNotNull"), p.take(500))
    assert(p.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThan\\(l_shipdate.*"),
      "l_shipdate filter not pushed to the lineitem scan")
    assert(p.matches("(?s).*PushedFilters: \\[[^\\]]*EqualTo\\(c_mktsegment.*"),
      "c_mktsegment filter not pushed to the customer scan")
  }

  test("q03: dimension side broadcasts; scans prune columns") {
    val p = plan("q03_shipping_priority")
    assert(p.contains("BroadcastHashJoin"), "customer join is not broadcast")
    // lineitem scan must not read all 16 columns for a 4-column need
    val readSchemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(readSchemas.nonEmpty)
    assert(readSchemas.forall(_.split(",").length <= 6),
      s"a scan reads too many columns: $readSchemas")
  }

  test("q09: top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("q09_top_k_orders")
    assert(p.contains("TakeOrderedAndProject"), p.take(400))
    assert(!p.contains("Exchange rangepartitioning"),
      "top-k is paying a full range-partitioned sort")
  }

  test("q01: aggregation runs inside whole-stage codegen with partial aggregation") {
    // AQE only finalizes (and annotates) the plan at execution time
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf)
    df.collect() // an action on THIS plan, so AQE finalizes it
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), "no whole-stage-codegen stage markers")
    assert(p.contains("HashAggregate"), "no hash aggregation")
    // partial + final pair ⇒ map-side combine before the exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "no partial aggregation before the shuffle")
  }

  test("q05: all dimension joins below the fact shuffle are broadcasts") {
    val p = plan("q05_nation_revenue")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q45: native cosine_sim appears in the plan (not a UDF)") {
    val p = plan("q45_knn_cosine")
    assert(p.contains("cosine_sim"), "native expression missing from plan")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      "similarity path fell back to a UDF")
  }

  test("q64: the hash split itself is narrow — one exchange, for the census only") {
    val p = plan("q64_hash_split")
    // the md5 assignment must not shuffle; only the groupBy census may
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"hash split introduced extra shuffles:\n${p.take(800)}")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "census lacks map-side partial aggregation")
  }

  test("q65: decontamination plans as a semi join (at most one row per doc)") {
    val p = plan("q65_decontaminate")
    assert(p.contains("LeftSemi"), s"no semi join in:\n${p.take(800)}")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"))
  }

  test("q34: exploded product mix keeps map-side partial aggregation") {
    val p = plan("q34_product_mix")
    assert("HashAggregate".r.findAllIn(p).size >= 2 ||
      "ObjectHashAggregate".r.findAllIn(p).size >= 2,
      "explode→groupBy lost its partial aggregate")
  }

  test("q63: cluster census consumes the verdict table — no all-pairs enumeration") {
    val p = plan("q63_dup_clusters")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q63 re-enumerates pairs with a non-equi join:\n${p.take(800)}")
    assert(p.contains("Scan parquet") || p.contains("Scan ExistingRDD"),
      "q63 does not read the materialized pair verdicts")
  }

  test("q87: native top-k plans as two heap phases, no Window, no per-group sort") {
    val p = plan("q87_native_topk_group")
    assert(p.contains("TopKPerGroupPartial") && p.contains("TopKPerGroupFinal"),
      s"custom operator not planned:\n${p.take(600)}")
    assert(!p.contains("Window"), "fell back to the window encoding")
    // exactly one hash exchange between the phases (the range exchange
    // on top belongs to the oracle's orderBy, not the operator)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "operator should shuffle exactly once, on the group keys")
  }

  test("q115: the per-group cap plans through the heap node, no Window") {
    val p = plan("q115_source_cap")
    assert(p.contains("TopKPerGroupPartial") && p.contains("TopKPerGroupFinal"),
      s"cap not planned through the heap operator:\n${p.take(600)}")
    assert(!p.contains("Window"), "fell back to the window encoding")
  }

  test("q121: the triplet positive ranks through the heap; only the ring windows remain") {
    val p = plan("q121_triplets")
    assert(p.contains("TopKPerGroupPartial") && p.contains("TopKPerGroupFinal"),
      s"hardest-positive rank not planned through the heap:\n${p.take(600)}")
    // the md5-ring successor windows (lead/first/nth_value) are real
    // window work and must stay; the rank window must not
    assert(!p.contains("row_number"), "positive rank fell back to a Window")
  }

  test("q07: the window-idiom top-k is REWRITTEN to the heap node by the optimizer rule") {
    // q07 is written as filter(row_number().over(...) <= 3) — the SQL
    // idiom every user query uses. WindowTopKRewrite must hand it the
    // same bounded-heap plan the bespoke q87 API gets: no Window, no
    // per-group sort of the fact table (VERDICT r4 item 2).
    val p = plan("q07_top_orders_per_customer")
    assert(p.contains("TopKPerGroupPartial") && p.contains("TopKPerGroupFinal"),
      s"optimizer rule did not fire:\n${p.take(600)}")
    assert(!p.contains("Window"), "window encoding survived the rewrite")
    // the one range exchange on top belongs to the query's global
    // orderBy; the operator itself shuffles once, on the group keys
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "rewritten operator should shuffle exactly once, on the group keys")
  }

  test("q92: the SQL table-function surface plans the same heap node as the API") {
    val p = plan("q92_sql_topk")
    assert(p.contains("TopKPerGroupPartial") && p.contains("TopKPerGroupFinal"),
      s"TVF did not plan the native operator:\n${p.take(600)}")
    assert(!p.contains("Window"), "TVF fell back to the window encoding")
  }

  test("q94/q95: rank() and dense_rank() top-k idioms plan the tie-aware heap, no Window") {
    // VERDICT r5 item 2: the tie-keeping forms, at least as common in
    // hand-written SQL as row_number, must reach the bounded-heap plan
    for (q <- Seq("q94_rank_topk_ties", "q95_dense_rank_topk")) {
      val p = plan(q)
      assert(p.contains("TopKPerGroupPartial") && p.contains("TopKPerGroupFinal"),
        s"$q did not plan the tie-aware heap:\n${p.take(600)}")
      assert(!p.contains("Window"), s"$q: window encoding survived the rewrite")
    }
  }

  test("q101: a NEW analytic written as the row_number idiom gets the heap plan for free") {
    // tf-idf top terms was added after the rewrite existed; nothing in
    // its code mentions TopKPerGroup — the rule alone must deliver the
    // bounded-heap plan, which is the whole value of having a rewrite
    // instead of a bespoke API
    val p = plan("q101_tfidf_terms")
    assert(p.contains("TopKPerGroupPartial") && p.contains("TopKPerGroupFinal"),
      s"q101 did not plan the heap:\n${p.take(600)}")
    assert(!p.contains("Window"), "q101: window encoding survived the rewrite")
  }

  test("q40/q54: keep-first dedup (rn = 1) also plans through the heap node") {
    // the rewrite folds the row_number()=1 idiom to a k=1 heap — every
    // keep-first dedup in the engine stops sorting its groups
    val p = plan("q54_dedup_keep_first")
    assert(p.contains("TopKPerGroupPartial") && p.contains("TopKPerGroupFinal"),
      s"keep-first dedup still uses the window encoding:\n${p.take(600)}")
    assert(!p.contains("Window"), "window encoding survived the rewrite")
  }

  test("q84: mix targets broadcast to the corpus — the doc table never shuffles on lang") {
    val p = plan("q84_temperature_mix")
    assert(p.contains("BroadcastHashJoin"), "stratum-target join is not broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "corpus totals re-introduced a cross join")
  }

  test("q85: vocab selection is a top-k, and the vocab probe broadcasts") {
    val p = plan("q85_oov_census")
    assert(p.contains("TakeOrderedAndProject"),
      "top-50 vocab is paying a global sort")
    assert(p.contains("BroadcastHashJoin"), "vocab join is not broadcast")
  }

  test("q84/q85: every single-partition window runs over a census-sized frame, never the corpus") {
    // the WindowExec 'No Partition Defined' warnings these plans emit
    // are BY CONSTRUCTION bounded: the only global windows sit above
    // a per-stratum aggregate, so the single partition holds
    // stratum-cardinality rows (a handful), not documents. Pin that
    // structurally so the warning never needs re-adjudicating.
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    // AQE's wrapper node hides the tree from collect(); the shape
    // under test is the static plan, so build it with AQE off
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val execPlan = SparkEntry.queries("q84_temperature_mix")(spark, sf)
        .queryExecution.executedPlan
      val windows = execPlan.collect { case w: WindowExec => w }
      assert(windows.nonEmpty, "expected the census window in q84's plan")
      windows.foreach { w =>
        val unpartitioned = w.partitionSpec.isEmpty ||
          w.partitionSpec.forall(_.foldable)
        if (unpartitioned) {
          // the frame feeding the global window must be an AGGREGATE
          // output (group-cardinality rows), not a raw scan
          val agg = w.child.collectFirst { case a: BaseAggregateExec => a }
          assert(agg.nonEmpty,
            s"a global window sits on an unaggregated frame:\n$w")
        }
      }
      // and the frame really is census-sized on the test corpus
      val docsDf = spark.read.parquet(s"$sf/documents.parquet")
      val nStrata = docsDf.select("lang").distinct().count()
      assert(nStrata >= 1 && nStrata <= 64,
        s"stratum census unexpectedly large: $nStrata")
      // q85's plan has no window at all — its top-50 is a heap
      val p85 = SparkEntry.queries("q85_oov_census")(spark, sf)
        .queryExecution.executedPlan
      assert(p85.collect { case w: WindowExec => w }.isEmpty,
        "q85 grew a window node")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
    }
  }

  test("q280: the frontier budget cap plans through the heap node — no Window, no per-group sort") {
    val p = plan("q280_budgeted_frontier")
    assert(p.contains("TopKPerGroupPartial") &&
      p.contains("TopKPerGroupFinal"),
      s"capPerGroup lost the bounded-heap plan:\n${p.take(600)}")
    assert(!p.contains("Window"),
      "the budget cap is paying a window sort over the frontier")
  }

  test("q46: multi-probe LSH broadcasts the probe side, not the corpus") {
    val p = plan("q46_ann_lsh")
    assert(p.contains("BroadcastHashJoin"), "probe join is not broadcast")
    assert(p.contains("BuildRight"), "broadcast landed on the corpus side")
  }

  test("q75: the corpus recipe fuses into one plan with bounded shuffles") {
    // filter → dedup window → split → census: Catalyst must collapse
    // the operator composition, leaving only the dedup window's
    // exchange, the census exchange, and the output sort
    val p = plan("q75_corpus_recipe")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 3, s"composition fragmented into $exchanges exchanges")
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"))
  }

  test("q01: flagship scan reads only the columns the aggregate needs") {
    // formatted mode: the simple-mode scan line truncates the schema
    // string before its closing bracket
    val p = SparkEntry.queries("q01_pricing_summary")(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val readSchemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(readSchemas.nonEmpty)
    assert(readSchemas.forall(_.split(",").length <= 7),
      s"q01 scan reads more columns than its aggregate uses: $readSchemas")
  }
}
