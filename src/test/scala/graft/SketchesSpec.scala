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

  test("KMV: exact below k; estimator within 30% at 50x k; shard merge equals whole-corpus sketch") {
    val k = 32
    // small group: 10 distinct items -> the sketch IS the set, exact
    val small = (0 until 10).map(i => ("g1", s"item$i")).toDF("g", "item")
    val estSmall = Sketches.kmvEstimate(
      Sketches.kmvMins(small, Seq("g"), "item", k), Seq("g"), k)
      .as[(String, Long)].collect().toMap
    assert(estSmall("g1") == 10L)
    // big group: 1600 distinct items, duplicated rows (distinct-ness
    // is the sketch's job); estimator concentrates near truth
    val big = ((0 until 1600) ++ (0 until 400)).map(i => ("g2", s"val:$i"))
      .toDF("g", "item")
    val estBig = Sketches.kmvEstimate(
      Sketches.kmvMins(big, Seq("g"), "item", k), Seq("g"), k)
      .as[(String, Long)].collect().toMap
    assert(estBig("g2") > 1100 && estBig("g2") < 2100,
      s"estimate ${estBig("g2")} for 1600 truth")
    // merge law: per-shard min-sets union-merged == whole-corpus
    // sketch, row for row (min-k is associative/commutative)
    val shardA = big.filter(col("item") < "val:5")
    val shardB = big.filter(col("item") >= "val:2") // overlapping
    val merged = Sketches.kmvMergeMins(
      Seq(Sketches.kmvMins(shardA, Seq("g"), "item", k),
        Sketches.kmvMins(shardB, Seq("g"), "item", k)), Seq("g"), k)
      .as[(String, Long)].collect().toSet
    val whole = Sketches.kmvMins(big, Seq("g"), "item", k)
      .as[(String, Long)].collect().toSet
    assert(merged == whole, s"merge law broken: ${merged.size}/${whole.size}")
  }

  test("kmv_distinct TVF equals the Scala sketch; bad k refused") {
    val df = (0 until 500).map(i => (s"g${i % 3}", s"it${i % 97}"))
      .toDF("g", "item")
    df.createOrReplaceTempView("kmv_tvf_spec")
    val viaSql = spark.sql(
      "SELECT * FROM kmv_distinct('kmv_tvf_spec', 'g', 'item', 16) " +
        "ORDER BY g").collect().map(_.toSeq).toSeq
    val direct = Sketches.kmvEstimate(
        Sketches.kmvMins(df, Seq("g"), "item", 16), Seq("g"), 16)
      .orderBy($"g").collect().map(_.toSeq).toSeq
    assert(viaSql == direct && direct.nonEmpty)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM kmv_distinct('kmv_tvf_spec', 'g', " +
        "'item', 1)").collect()
    }
    assert(e.getMessage.contains("k must be >= 2"), e.getMessage.take(200))
  }

  // ---- Datasketches HLL persisted-rollup properties (q316) -------------

  test("HLL: merged shard sketches track the whole-corpus sketch — exact in sparse mode, enveloped in dense") {
    def whole(n: Long): Long = (0L until n).toDF("id")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("id"), 14)).as("e"))
      .as[Long].collect().head
    def merged(n: Long, shards: Int): Long = (0L until n).toDF("id")
      .withColumn("shard", pmod(col("id"), lit(shards)))
      .groupBy("shard").agg(hll_sketch_agg(col("id"), 14).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
      .as[Long].collect().head
    // sparse regime: every path is coupon-exact, estimates are equal
    // AND equal to the true cardinality (the q316 sf0.01 regime)
    assert(whole(500L) == 500L)
    assert(merged(500L, 5) == 500L)
    // dense regime: union is register-lossless only once both sides
    // are dense — a sparse shard unioned into a dense gadget may land
    // ~0.5% off the direct build (5006 vs 4977 at 5k measured), so the
    // contract is the ERROR ENVELOPE, not equality: both estimates
    // within 2% of truth and of each other (q316's merge_within_2pct)
    for ((n, shards) <- Seq((5000L, 5), (20000L, 3), (20000L, 7))) {
      val w = whole(n); val m = merged(n, shards)
      assert(math.abs(w - n) <= n * 0.02, s"whole($n)=$w")
      assert(math.abs(m - n) <= n * 0.02, s"merged($n,$shards)=$m")
      assert(math.abs(m - w) * 50 <= n, s"merge drift $m vs $w at n=$n")
    }
  }

  test("HLL: sketch column survives a parquet round trip (the persisted tier)") {
    val ids = (0L until 5000L).toDF("id")
    val skT = ids.withColumn("day", pmod(col("id"), lit(5)))
      .groupBy("day").agg(hll_sketch_agg(col("id"), 14).as("sk"))
    assert(skT.schema("sk").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val dir = java.nio.file.Files.createTempDirectory("graft_hll_spec_")
    try {
      skT.write.mode("overwrite").parquet(dir.toString)
      // the same union computed from live sketches vs parquet-read
      // sketches must be IDENTICAL — the round trip preserves bytes
      val live = skT
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
        .as[Long].collect().head
      val back = spark.read.parquet(dir.toString)
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
        .as[Long].collect().head
      assert(back == live, s"parquet round trip moved the estimate: $back vs $live")
      assert(math.abs(back - 5000L) <= 100L, s"estimate off: $back")
    } finally graft.sources.AtomicCache.deleteRec(dir)
  }

  test("HLL: estimate within the lgK=14 error envelope at dense cardinality") {
    val n = 200000L
    val est = (0L until n).toDF("id")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("id"), 14)).as("e"))
      .as[Long].collect().head
    // rsd at lgK 14 is ~0.65%; 3 sigma ≈ 2% — use 3% for headroom
    assert(math.abs(est - n) <= n * 0.03, s"est $est vs exact $n")
  }
}
