package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Ground-truth tests for the similarity-search tiers: brute-force
  * cosine against analytically known neighbors, and LSH recall
  * measured against the brute-force tier on a deterministic vector
  * set (VERDICT.md r1: q46 shipped with no recall evidence). */
class SimilaritySpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val dim = 16

  private def deleteRec(base: String): Unit =
    graft.sources.AtomicCache.deleteRec(java.nio.file.Paths.get(base))

  /** Deterministic pseudo-random vectors (seeded Random —
    * reproducible across runs and JVMs). */
  private lazy val corpus: DataFrame = {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 200L).map { i =>
      (i, Seq.fill(dim)(rnd.nextGaussian()))
    }
    rows.toDF("cid", "cvec").cache()
  }

  private lazy val queries: DataFrame =
    corpus.limit(8).select($"cid".as("qid"), $"cvec".as("qvec"))

  test("cosine_near_dup TVF refuses quadratic plans above the row ceiling, names the banded tier") {
    // VERDICT r5: from SQL, nothing but this guard stands between a
    // user and an O(n²) job on a production table
    val n = graft.extensions.GraftExtensions.QuadraticTvfRowCeiling + 1
    spark.range(n.toLong)
      .selectExpr("id", "array(cast(id as double), 1.0d) AS vec")
      .createOrReplaceTempView("quad_guard_big")
    val e = intercept[Exception] {
      spark.sql(
        "SELECT * FROM cosine_near_dup('quad_guard_big', 'id', 'vec', 0.99)").collect()
    }
    assert(e.getMessage.contains("cosine_near_dup_banded"), e.getMessage.take(300))
    // the explicit boolean literal opts back in — same call, plus true
    val optIn = spark.sql(
      "SELECT * FROM cosine_near_dup('quad_guard_big', 'id', 'vec', 0.99, true)")
    assert(optIn.queryExecution.analyzed != null) // plans without refusal
    // under the ceiling: plans and runs with no opt-in
    corpus.createOrReplaceTempView("quad_guard_small")
    val small = spark.sql(
      "SELECT * FROM cosine_near_dup('quad_guard_small', 'cid', 'cvec', 0.999)")
    assert(small.count() >= 0)
    // and the banded tier accepts the same oversized table outright
    val banded = spark.sql(
      "SELECT * FROM cosine_near_dup_banded('quad_guard_big', 'id', 'vec', 0.99, 2)")
    assert(banded.queryExecution.analyzed != null)
  }

  test("bruteForceTopK ranks by cosine with deterministic tie-break") {
    val q = Seq((0L, Seq(1.0, 0.0, 0.0, 0.0))).toDF("qid", "qvec")
    val c = Seq(
      (1L, Seq(2.0, 0.0, 0.0, 0.0)),   // cos 1.0
      (2L, Seq(1.0, 1.0, 0.0, 0.0)),   // cos .7071
      (3L, Seq(0.0, 1.0, 0.0, 0.0)),   // cos 0
      (4L, Seq(-1.0, 0.0, 0.0, 0.0)),  // cos -1
      (5L, Seq(1.0, 0.0, 1.0, 0.0)))   // cos .7071 — ties with 2, id-break
      .toDF("cid", "cvec")
    val got = Similarity.bruteForceTopK(q, c, 3)
      .orderBy($"rank").select($"cid").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 5L))
  }

  test("lshTopK: multi-probe recall vs brute force, monotone in probe radius") {
    val exact = Similarity.bruteForceTopK(queries, corpus, 5)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    def recallAt(probeHamming: Int): Double = {
      val ann = Similarity.lshTopK(queries, corpus, 5, dim = dim,
        nPlanes = 4, probeHamming = probeHamming)
        .select($"qid", $"cid").as[(Long, Long)].collect().toSet
      (exact intersect ann).size.toDouble / exact.size
    }
    // single-probe (the r2 default) measured 0.325 on this fixture —
    // the multi-probe default must lift recall@5 to a usable tier
    val r0 = recallAt(0)
    val r1 = recallAt(1)
    val r2 = recallAt(2)
    assert(r2 >= 0.8, s"recall@5 at q46 default (Hamming<=2): $r2")
    assert(r1 >= r0 && r2 >= r1,
      s"recall must be monotone in probe radius: $r0 / $r1 / $r2")
    // and every query finds neighbors at the default radius
    val ann1 = Similarity.lshTopK(queries, corpus, 5, dim = dim, nPlanes = 4)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val perQuery = ann1.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perQuery.size == 8, s"queries with any ANN hit: ${perQuery.size}/8")
  }

  test("ivfTopK recall beats single-probe LSH and grows with nProbe") {
    val exact = Similarity.bruteForceTopK(queries, corpus, 5)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    def recallOf(nProbe: Int): Double = {
      val ivf = Similarity.ivfTopK(queries, corpus, 5, dim = dim,
        nCells = 8, nProbe = nProbe)
        .select($"qid", $"cid").as[(Long, Long)].collect().toSet
      (exact intersect ivf).size.toDouble / exact.size
    }
    val r2 = recallOf(2)
    val r6 = recallOf(6)
    assert(r2 >= 0.4, s"ivf recall@5 nProbe=2: $r2")
    assert(r6 >= r2, s"recall must grow with nProbe: $r6 < $r2")
    assert(r6 >= 0.8, s"ivf recall@5 nProbe=6 of 8 cells: $r6")
  }

  test("persisted IVF index: probe equals the in-session tier; scan is partition-pruned") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_spec_").toString
    try {
      val cents: Seq[Seq[Double]] = {
        val rnd = new scala.util.Random(11)
        Seq.fill(8)(Seq.fill(dim)(rnd.nextGaussian()))
      }
      Similarity.writeIvfIndex(corpus, dir, cents)
      // a FILTERED query batch (the realistic shape — and the DPP
      // precondition: Spark only plants the pruning subquery when the
      // filtering side carries a selective predicate; see the
      // probeIvfIndex scaladoc)
      val qBatch = corpus.filter($"cid" < 8)
        .select($"cid".as("qid"), $"cvec".as("qvec"))
      val probed = Similarity.probeIvfIndex(spark, dir, qBatch, k = 5, nProbe = 3)
      // the disk round-trip (cell typing, partition discovery) must be
      // lossless: identical rows AND ranks to the in-session operator
      val inSession = Similarity
        .ivfTopKWithCentroids(qBatch, corpus, k = 5, cents, nProbe = 3)
        .select($"qid", $"rank", $"cid").as[(Long, Long, Long)].collect().toSet
      val viaDisk = probed
        .select($"qid", $"rank", $"cid").as[(Long, Long, Long)].collect().toSet
      assert(viaDisk == inSession)
      // the scale claim: the cells scan carries a runtime pruning
      // subquery on the partition column — nProbe directories read,
      // not the whole index
      val plan = probed.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"no dynamic partition pruning in:\n${plan.take(2000)}")
    } finally {
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
    }
  }

  test("maintainIvfIndex: drift triggers re-cluster, recall recovers vs stale centroids, old snapshot immutable") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_ivf_drift_").toString
    try {
      // era A lives in dims 0/1 (+ tiny dim-2 residue). Era B — the
      // corpus after a re-embedding / domain shift — lives in dims
      // 2/3 (true clusters), with 0.5-weight NEIGHBOR groups in dims
      // 4..6 and a 0.1-weight residue in the OLD dims 0/1 keyed by
      // i%4: stale centroids bucket by that residue, which is
      // orthogonal to the neighbor structure, so every true neighbor
      // set splits across stale cells — exactly the failure drift
      // maintenance exists to catch
      val eraA = (0L until 40L).map { i =>
        val v = Array.fill(8)(0.0)
        v((i % 2).toInt) = 1.0
        v(2) = 0.01 * (i % 5)
        (i, v.toSeq)
      }.toDF("cid", "cvec")
      val eraB = (0L until 40L).map { i =>
        val v = Array.fill(8)(0.0)
        v((2 + i % 2).toInt) = 1.0
        v((4 + i % 3).toInt) = 0.5
        v(if (i % 4 < 2) 0 else 1) = 0.1
        (i, v.toSeq)
      }.toDF("cid", "cvec")
      val centsA = graft.operators.KMeans
        .fit(eraA, "cid", "cvec", 2, 5)
        .orderBy($"cell").select($"centroid")
        .as[Seq[Double]].collect().toSeq
      Similarity.writeIvfIndex(eraA, s"$base/v1", centsA)
      // healthy corpus: the monitor holds, nothing fires, nothing lands
      assert(!Similarity.maintainIvfIndex(spark, s"$base/v1", eraA,
        s"$base/v2", floor = 0.9, nCells = 2))
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$base/v2")), "healthy must write nothing")
      def listing(dir: String): Seq[(String, Long)] = {
        val p = java.nio.file.Paths.get(dir)
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
        java.nio.file.Files.walk(p).forEach { f =>
          if (java.nio.file.Files.isRegularFile(f))
            out += ((p.relativize(f).toString, java.nio.file.Files.size(f)))
        }
        out.sortBy(_._1).toSeq
      }
      val before = listing(s"$base/v1")
      // drifted corpus: centroid cosine vs the stored era collapses,
      // the refresh fires and publishes the successor OUT-OF-PLACE
      assert(Similarity.maintainIvfIndex(spark, s"$base/v1", eraB,
        s"$base/v2", floor = 0.9, nCells = 2))
      assert(listing(s"$base/v1") == before,
        "the old snapshot must stay byte-immutable through a refresh")
      // recall@5 on the drifted corpus, nProbe=1: refreshed centroids
      // vs the SAME vectors indexed under the stale era-A geometry
      Similarity.writeIvfIndex(eraB, s"$base/stale", centsA)
      val qB = eraB.filter($"cid" < 12)
        .select($"cid".as("qid"), $"cvec".as("qvec"))
      val exact = Similarity.bruteForceTopK(qB, eraB, 5)
        .select($"qid", $"cid").as[(Long, Long)].collect().toSet
      def recall(dir: String): Double = {
        val got = Similarity.probeIvfIndex(spark, dir, qB, k = 5, nProbe = 1)
          .select($"qid", $"cid").as[(Long, Long)].collect().toSet
        (exact intersect got).size.toDouble / exact.size
      }
      val fresh = recall(s"$base/v2")
      val stale = recall(s"$base/stale")
      assert(fresh > stale,
        s"refresh must beat stale geometry: fresh $fresh vs stale $stale")
      assert(fresh >= 0.9, s"refreshed recall@5 nProbe=1: $fresh")
      assert(stale <= 0.75, s"stale geometry should visibly miss: $stale")
    } finally deleteRec(base)
  }

  test("maintainPqIndex: drift retrains books, recall recovers vs stale books, old snapshot immutable") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_pq_drift_").toString
    try {
      // era A: 16 clusters living in dims 0..31; era B — the corpus
      // after a re-embedding — 16 clusters in dims 32..63, arranged
      // as 4 directions (one per PQ subspace 4..7) × 4 MAGNITUDES.
      // Books trained on A have near-zero codewords in those
      // subspaces, and a near-zero codeword set quantizes by
      // DIRECTION only (the argmin is linear in the magnitude), so
      // the stale index COLLIDES all four magnitudes of a direction
      // into one code and recall collapses — the silent degradation
      // the maintainer exists to catch.
      val rndA = new scala.util.Random(41)
      val centersA = Seq.fill(16)(Array.fill(32)(rndA.nextGaussian() * 4.0))
      val eraA = (0L until 160L).map { i =>
        val c = centersA((i % 16).toInt)
        (i, (c.map(_ + rndA.nextGaussian() * 0.3) ++
          Array.fill(32)(rndA.nextGaussian() * 0.01)).toSeq)
      }.toDF("cid", "v").cache()
      val rndB = new scala.util.Random(43)
      val rowsB: Seq[(Long, Array[Double])] = (0L until 160L).map { i =>
        val g = (i % 16).toInt
        val dir = 32 + (g % 4) * 8          // one dim per subspace 4..7
        val mag = 4.0 * (1 + g / 4)          // 4, 8, 12, 16
        val v = Array.fill(64)(rndB.nextGaussian() * 0.3)
        v(dir) += mag
        (i, v)
      }
      val eraB = rowsB.map { case (i, v) => (i, v.toSeq) }
        .toDF("cid", "v").cache()
      val booksA = Similarity.Pq.trainCodebooks(eraA, "cid", "v")
      Similarity.Pq.writePqIndex(eraA, "cid", "v", s"$base/v1", booksA)
      // healthy corpus: the monitor holds, nothing fires or lands
      assert(!Similarity.Pq.maintainPqIndex(spark, s"$base/v1", eraA,
        "cid", "v", s"$base/v2", floor = 0.9))
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$base/v2")), "healthy must write nothing")
      def listing(dir: String): Seq[(String, Long)] = {
        val p = java.nio.file.Paths.get(dir)
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
        java.nio.file.Files.walk(p).forEach { f =>
          if (java.nio.file.Files.isRegularFile(f))
            out += ((p.relativize(f).toString, java.nio.file.Files.size(f)))
        }
        out.sortBy(_._1).toSeq
      }
      val before = listing(s"$base/v1")
      // drifted corpus: fires, retrains, publishes out-of-place
      assert(Similarity.Pq.maintainPqIndex(spark, s"$base/v1", eraB,
        "cid", "v", s"$base/v2", floor = 0.9))
      assert(listing(s"$base/v1") == before,
        "the old snapshot must stay byte-immutable through a refresh")
      // recall@9 on era B: refreshed books vs the SAME vectors coded
      // under the stale era-A books
      Similarity.Pq.writePqIndex(eraB, "cid", "v", s"$base/stale", booksA)
      val qB = eraB.filter($"cid" < 8)
        .select($"cid".as("qid"), $"v".as("qvec"))
      // exact ground truth in the metric PQ serves (L2), JVM-computed:
      // a magnitude-only cluster pair is identical under cosine, so
      // the cosine brute force cannot gate this fixture
      def l2(a: Array[Double], b: Array[Double]): Double =
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      val exact = (0L until 8L).flatMap { q =>
        val qv = rowsB(q.toInt)._2
        rowsB.filter(_._1 != q)
          .sortBy(r => (l2(qv, r._2), r._1)).take(9)
          .map(r => (q, r._1))
      }.toSet
      def recall(dir: String): Double = {
        val got = Similarity.Pq.probePqIndex(spark, dir, qB, 9)
          .select($"qid", $"cid").as[(Long, Long)].collect().toSet
        (exact intersect got).size.toDouble / exact.size
      }
      val fresh = recall(s"$base/v2")
      val stale = recall(s"$base/stale")
      assert(fresh > stale,
        s"refresh must beat stale books: fresh $fresh vs stale $stale")
      assert(fresh >= 0.6, s"refreshed recall@9: $fresh")
      assert(stale <= 0.45, s"stale books should visibly miss: $stale")
      // in-place publish refuses loudly
      val e = intercept[IllegalArgumentException] {
        Similarity.Pq.maintainPqIndex(spark, s"$base/v1", eraB,
          "cid", "v", s"$base/v1")
      }
      assert(e.getMessage.contains("out-of-place"), e.getMessage)
      eraA.unpersist(); eraB.unpersist()
    } finally deleteRec(base)
  }

  test("maintainSqIndex: drift refits ranges, recall recovers vs clamped stale ranges, old snapshot immutable") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_sq_drift_").toString
    try {
      // era A lives in dims 0/1 at ~1.0; era B lives in dims 4..7 at
      // ~10 (4 clusters keyed by i%4). The stale era-A ranges are
      // DEGENERATE in dims 4..7 (min == max == ~0), so every era-B
      // vector codes to the same reconstruction there — the clamping
      // failure the maintainer exists to catch.
      val eraA = (0L until 80L).map { i =>
        val v = Array.fill(8)(0.0)
        v((i % 2).toInt) = 1.0 + 0.01 * (i % 5)
        (i, v.toSeq)
      }.toDF("cid", "v")
      // within-cluster members are IDENTICAL vectors: both the exact
      // tier (6dp cosine) and the SQ tier (quantized L2) tie them and
      // break by cid, so recall compares sets, not quantization-
      // boundary artifacts
      val eraB = (0L until 80L).map { i =>
        val v = Array.fill(8)(0.0)
        v((4 + i % 4).toInt) = 10.0
        v((i % 2).toInt) = 0.05
        (i, v.toSeq)
      }.toDF("cid", "v")
      val (mnsA, mxsA) = Similarity.Sq.minMax(eraA, "v", 8)
      Similarity.Sq.writeSqIndex(eraA, "cid", "v", s"$base/v1", mnsA, mxsA)
      assert(!Similarity.Sq.maintainSqIndex(spark, s"$base/v1", eraA,
        "cid", "v", s"$base/v2", floor = 0.9))
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$base/v2")), "healthy must write nothing")
      def listing(dir: String): Seq[(String, Long)] = {
        val p = java.nio.file.Paths.get(dir)
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
        java.nio.file.Files.walk(p).forEach { f =>
          if (java.nio.file.Files.isRegularFile(f))
            out += ((p.relativize(f).toString, java.nio.file.Files.size(f)))
        }
        out.sortBy(_._1).toSeq
      }
      val before = listing(s"$base/v1")
      assert(Similarity.Sq.maintainSqIndex(spark, s"$base/v1", eraB,
        "cid", "v", s"$base/v2", floor = 0.9))
      assert(listing(s"$base/v1") == before,
        "the old snapshot must stay byte-immutable through a refresh")
      Similarity.Sq.writeSqIndex(eraB, "cid", "v", s"$base/stale",
        mnsA, mxsA)
      val qB = eraB.filter($"cid" < 8)
        .select($"cid".as("qid"), $"v".as("qvec"))
      val exact = Similarity.bruteForceTopK(qB,
          eraB.select($"cid", $"v".as("cvec")), 5)
        .select($"qid", $"cid").as[(Long, Long)].collect().toSet
      def recall(dir: String): Double = {
        val got = Similarity.Sq.probeSqIndex(spark, dir, qB, 5)
          .select($"qid", $"cid").as[(Long, Long)].collect().toSet
        (exact intersect got).size.toDouble / exact.size
      }
      val fresh = recall(s"$base/v2")
      val stale = recall(s"$base/stale")
      assert(fresh > stale,
        s"refresh must beat stale ranges: fresh $fresh vs stale $stale")
      assert(fresh >= 0.9, s"refreshed recall@5: $fresh")
      assert(stale <= 0.6, s"stale ranges should visibly miss: $stale")
      val e = intercept[IllegalArgumentException] {
        Similarity.Sq.maintainSqIndex(spark, s"$base/v1", eraB,
          "cid", "v", s"$base/v1")
      }
      assert(e.getMessage.contains("out-of-place"), e.getMessage)
    } finally deleteRec(base)
  }

  test("appendToIvfIndex: appended vectors probe identically to a from-scratch rebuild") {
    val base = java.nio.file.Files.createTempDirectory("graft_ivf_app_").toString
    try {
      val cents: Seq[Seq[Double]] = {
        val rnd = new scala.util.Random(13)
        Seq.fill(8)(Seq.fill(dim)(rnd.nextGaussian()))
      }
      val first = corpus.filter($"cid" < 150)
      val late = corpus.filter($"cid" >= 150)
      Similarity.writeIvfIndex(first, s"$base/idx", cents)
      Similarity.appendToIvfIndex(spark, s"$base/idx", late)
      Similarity.writeIvfIndex(corpus, s"$base/rebuilt", cents)
      val qBatch = corpus.filter($"cid" < 8)
        .select($"cid".as("qid"), $"cvec".as("qvec"))
      def probe(dir: String) = Similarity
        .probeIvfIndex(spark, dir, qBatch, k = 5, nProbe = 3)
        .select($"qid", $"rank", $"cid").as[(Long, Long, Long)].collect().toSet
      val appended = probe(s"$base/idx")
      assert(appended == probe(s"$base/rebuilt"),
        "append must be indistinguishable from rebuilding over the union")
      // and the late vectors are genuinely reachable as neighbors
      assert(appended.exists(_._3 >= 150L),
        "no appended vector ever surfaced in the top-k")
    } finally {
      graft.sources.AtomicCache.deleteRec(java.nio.file.Paths.get(base))
    }
  }

  test("compactIvfIndex: D/U/I compaction probes like a from-scratch rebuild; a deleted neighbor vanishes") {
    val base = java.nio.file.Files.createTempDirectory("graft_ivf_cmp_").toString
    try {
      val cents: Seq[Seq[Double]] = {
        val rnd = new scala.util.Random(17)
        Seq.fill(8)(Seq.fill(dim)(rnd.nextGaussian()))
      }
      Similarity.writeIvfIndex(corpus, s"$base/idx", cents)
      val qBatch = corpus.filter($"cid" < 8)
        .select($"cid".as("qid"), $"cvec".as("qvec"))
      def probe(dir: String) = Similarity
        .probeIvfIndex(spark, dir, qBatch, k = 5, nProbe = 3)
        .select($"qid", $"rank", $"cid").as[(Long, Long, Long)].collect().toSet
      // pick a vector that IS currently someone's neighbor and delete
      // it — the compacted index must stop surfacing it (the index
      // staleness failure CDC maintenance exists to prevent)
      val victim = probe(s"$base/idx")
        .filter(_._3 >= 8L).map(_._3).min
      val del = Seq((victim, "D", null.asInstanceOf[Seq[Double]]))
        .toDF("cid", "op", "cvec")
        .select($"cid", $"op", $"cvec".cast("array<double>"))
      val upd = corpus.filter($"cid" % 41 === 0 && $"cid" =!= victim)
        .select($"cid", lit("U").as("op"),
          transform($"cvec", x => -x).as("cvec"))
      val ins = corpus.filter($"cid" % 43 === 0)
        .select(($"cid" + 5000L).as("cid"), lit("I").as("op"),
          reverse($"cvec").as("cvec"))
      Similarity.compactIvfIndex(spark, s"$base/idx",
        del.unionByName(upd).unionByName(ins), s"$base/cmp")
      // the rebuild ground truth: apply the same changelog relationally
      val corpus2 = corpus
        .filter($"cid" =!= victim && !($"cid" % 41 === 0 && $"cid" =!= victim))
        .unionByName(upd.select($"cid", $"cvec"))
        .unionByName(ins.select($"cid", $"cvec"))
      Similarity.writeIvfIndex(corpus2, s"$base/rebuilt", cents)
      val compacted = probe(s"$base/cmp")
      assert(compacted == probe(s"$base/rebuilt"),
        "compaction must be indistinguishable from rebuilding over the merged corpus")
      assert(!compacted.exists(_._3 == victim),
        s"deleted vector $victim still surfaced as a neighbor — stale index row")
      // the old snapshot is untouched (out-of-place publish)
      assert(probe(s"$base/idx").exists(_._3 == victim))
    } finally {
      graft.sources.AtomicCache.deleteRec(java.nio.file.Paths.get(base))
    }
  }

  test("recallAtK: per-query hits, zero-recall rows kept, cutoff respected") {
    // exact truth: q0 -> {10,11,12}; q1 -> {20,21}
    val exact = Seq((0L, 1L, 10L), (0L, 2L, 11L), (0L, 3L, 12L),
      (1L, 1L, 20L), (1L, 2L, 21L)).toDF("qid", "rank", "cid")
    // approx: q0 hits 2 of 3 (plus a miss); q1 finds nothing right;
    // rank-4 row for q0 would be a third hit but sits past the cutoff
    val approx = Seq((0L, 1L, 11L), (0L, 2L, 99L), (0L, 3L, 10L),
      (0L, 4L, 12L), (1L, 1L, 98L)).toDF("qid", "rank", "cid")
    val got = Similarity.recallAtK(exact, approx, k = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 3L, 2L, 666666L), (1L, 2L, 0L, 0L)), got)
    // cutoff applies to BOTH sides: at k=1 only the rank-1 rows count
    val k1 = Similarity.recallAtK(exact, approx, k = 1)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(k1 == Seq((0L, 1L, 0L, 0L), (1L, 1L, 0L, 0L)), k1)
    intercept[IllegalArgumentException] {
      Similarity.recallAtK(exact, approx, 0) }
  }

  test("semanticDedup: within-cell clusters collapse to min ids; cross-cell pairs stay split") {
    val cents = Seq(
      (0, Seq(1.0, 0.0, 0.0, 0.0)),
      (1, Seq(0.0, 1.0, 0.0, 0.0))).toDF("cell", "centroid")
    val vecs = Seq(
      // cluster near centroid 0: pairwise cosine ≈ 1
      (1L, Seq(1.0, 0.010, 0.0, 0.0)),
      (2L, Seq(1.0, 0.011, 0.0, 0.0)),
      (3L, Seq(1.0, 0.012, 0.0, 0.0)),
      // singleton near centroid 1
      (10L, Seq(0.0, 1.0, 0.5, 0.0)),
      // a near-dup PAIR the cell boundary splits: cosine(20,21) ≈ .9999
      // but 20 leans to centroid 0 and 21 to centroid 1
      (20L, Seq(1.0, 0.99, 0.0, 0.0)),
      (21L, Seq(0.99, 1.0, 0.0, 0.0))).toDF("vec_id", "v")
    val out = Similarity.semanticDedup(vecs, "vec_id", "v", cents, 0.95)
    val reps = out.select($"id", $"rep").as[(Long, Long)].collect().toMap
    assert(reps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L,
      20L -> 20L, 21L -> 21L),
      s"got $reps — the 1-2-3 cluster must collapse to 1, the 20/21 " +
        "near-dup pair must SURVIVE (the documented cell-confinement trade)")
    // the riding cell column matches the geometry the fixture plants
    val cellOf = out.select($"id", $"cell").as[(Long, Int)].collect().toMap
    assert(cellOf(1L) == 0 && cellOf(10L) == 1 &&
      cellOf(20L) == 0 && cellOf(21L) == 1, s"got $cellOf")
  }

  test("meanPoolEmbeddings: exact means, order-independent, null/ragged tolerant") {
    val df = Seq(
      (0, Some(Seq(Option(1.0), Option(2.0), Option(3.0)))),
      (0, Some(Seq(Option(3.0), Option(4.0), Option(5.0)))),
      (1, Some(Seq(Option(10.0), Option(20.0)))),
      (1, None), // null vector contributes nothing
      (1, Some(Seq(Option(30.0), Option(40.0), Option(50.0)))), // ragged
      (2, Some(Seq(Option(1.0), Option(2.0)))),
      (2, Some(Seq(Option(3.0), None)))) // in-array null: not a divisor
      .toDF("g", "v")
    val out = Similarity.meanPoolEmbeddings(df, "g", "v")
      .select($"g", $"n_vecs", $"centroid")
      .as[(Int, Long, Seq[Double])].collect().map(r => r._1 -> r).toMap
    assert(out(0) == ((0, 2L, Seq(2.0, 3.0, 4.0))))
    assert(out(1) == ((1, 2L, Seq(20.0, 30.0, 50.0))),
      s"ragged group pooled wrong: ${out(1)}")
    assert(out(2) == ((2, 2L, Seq(2.0, 2.0))),
      s"in-array null must not inflate the divisor: ${out(2)}")
    // decimal sums: any physical layout produces the identical result
    val reparted = Similarity.meanPoolEmbeddings(df.repartition(7), "g", "v")
      .select($"g", $"n_vecs", $"centroid")
      .as[(Int, Long, Seq[Double])].collect().map(r => r._1 -> r).toMap
    assert(reparted == out)
  }

  test("mineTriplets: hardest positive, ring negative never anchor/positive, JVM ring replay") {
    val pairs = Seq((1L, 2L, 0.9), (1L, 3L, 0.8), (5L, 6L, 0.7))
      .toDF("idA", "idB", "sim")
    val ids = (1L to 20L).toDF("vec_id")
    val nShards = 2
    val out = Similarity.mineTriplets(pairs, ids, "vec_id", nShards)
      .select($"anchor", $"positive", $"sim", $"negative")
      .as[(Long, Long, Double, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    // every paired id anchors exactly once; positives are the hardest
    assert(out.keySet == Set(1L, 2L, 3L, 5L, 6L))
    assert(out(1L)._2 == 2L, s"anchor 1 hardest positive: ${out(1L)}")
    assert(out(2L)._2 == 1L && out(3L)._2 == 1L)
    assert(out(5L)._2 == 6L && out(6L)._2 == 5L)
    // negative is present, never degenerate, and never a KNOWN
    // near-dup partner of the anchor (not merely not-the-positive)
    val partnersOf = Map(1L -> Set(2L, 3L), 2L -> Set(1L), 3L -> Set(1L),
      5L -> Set(6L), 6L -> Set(5L))
    for ((a, (_, p, _, n)) <- out) {
      assert(n.nonEmpty, s"anchor $a missing negative")
      assert(n.get != a && n.get != p, s"degenerate negative for $a: $n")
      assert(!partnersOf(a).contains(n.get),
        s"anchor $a drew a certified near-dup as negative: $n")
    }
    // JVM replay of the md5 ring pins the successor choice exactly
    val md = java.security.MessageDigest.getInstance("MD5")
    def draw(id: Long): Long = {
      val hex = md.digest(s"neg:$id".getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val ring = (1L to 20L).map(id => (id, draw(id)))
      .groupBy { case (_, u) => u % nShards }
      .view.mapValues(_.sortBy { case (id, u) => (u, id) }.map(_._1).toVector)
      .toMap
    def succ(id: Long, step: Int): Long = {
      val shard = ring(draw(id) % nShards)
      shard((shard.indexOf(id) + step) % shard.size)
    }
    for ((a, (_, p, _, n)) <- out) {
      val expect = Seq(succ(a, 1), succ(a, 2))
        .find(c => c != a && !partnersOf(a).contains(c))
      assert(n == expect, s"anchor $a: negative $n != ring $expect")
    }
  }

  test("embeddingDrift: identical sides cos 1, shifted population detected, empty side empty") {
    val a = Seq((0L, Seq(1.0, 0.0, 0.0)), (1L, Seq(0.8, 0.2, 0.0)),
      (2L, Seq(0.9, 0.1, 0.0))).toDF("id", "vec")
    val Array(same) = Similarity.embeddingDrift(a, a, "vec").collect()
    assert(same.getLong(0) == 3L && same.getLong(1) == 3L)
    assert(same.getDouble(2) == 1.0, s"identical sides: ${same.getDouble(2)}")
    assert(same.getDouble(3) == same.getDouble(4))
    // an orthogonally-shifted population drops the centroid cosine
    val b = Seq((0L, Seq(0.0, 0.0, 1.0)), (1L, Seq(0.1, 0.0, 0.9)))
      .toDF("id", "vec")
    val Array(drift) = Similarity.embeddingDrift(a, b, "vec").collect()
    assert(drift.getLong(1) == 2L)
    assert(drift.getDouble(2) < 0.2,
      s"orthogonal shift should read near 0: ${drift.getDouble(2)}")
    // empty side: loudly empty, never a null-poisoned row
    assert(Similarity.embeddingDrift(a, a.filter($"id" < 0), "vec")
      .count() == 0L)
  }

  test("cosineNearDupPairs finds planted duplicates") {
    val rnd = new scala.util.Random(11)
    val base = Seq.fill(dim)(rnd.nextGaussian())
    val near = base.updated(0, base.head * 1.01)
    val far = Seq.fill(dim)(rnd.nextGaussian())
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("vid", "v")
    val pairs = Similarity.cosineNearDupPairs(df, "vid", "v",
      threshold = 0.99, dim = dim)
      .select($"idA", $"idB").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("PQ: codes bounded, layout-invariant; ADC equals the coded-centroid distance sum") {
    import org.apache.spark.sql.functions._
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("cid"),
        col("embedding").cast("array<double>").as("v"))
    val codes = Similarity.Pq.encode(e, "cid", "v")
    assert(codes.filter(col("code") < 0 || col("code") >= 16).count() === 0)
    assert(codes.groupBy("cid").count().filter(col("count") =!= 8).count() === 0)
    val again = Similarity.Pq.encode(e.repartition(5), "cid", "v")
    assert(codes.collect().map(_.toSeq).toSet ===
      again.collect().map(_.toSeq).toSet)
// the defining ADC property: est_micro equals the sum of
    // integer-floored subspace distances to the CODED centroids —
    // replayed here in plain JVM arithmetic for every ranked pair
    // wide form agrees with the relational form
    val wide = Similarity.Pq.encodeWide(e, "cid", "v")
    val wideAsRows = wide.collect().flatMap { r =>
      (0 until 8).map(s2 => (r.getLong(0), s2.toLong, r.getLong(1 + s2)))
    }.toSet
    assert(wideAsRows === codes.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
    val queries = e.filter(col("cid") < 5)
      .select(col("cid").as("qid"), col("v").as("qvec"))
    // VERDICT r7: the old one-projection LUT build generated a
    // ~5110-line processNext() Janino refused, so this exact path ran
    // interpreted on every execution — assert the grid form compiles
    val (adcRows, codegenErrs) = graft.tools.CodegenErrorCapture.measuring {
      Similarity.Pq.adcTopK(queries, wide, 5).collect()
    }
    assert(codegenErrs === 0,
      "ADC LUT build fell out of whole-stage codegen: " +
        graft.tools.CodegenErrorCapture.sampleMessages().mkString(" || "))
    val adc = adcRows
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    val vecs = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val codeMap = codes.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def lutMicro(q: Seq[Double], sub: Int, k: Int): Long = {
      val cent = Similarity.Pq.codebook(sub)(k)
      val d2 = (0 until 8).map { dd =>
        val x = q(sub * 8 + dd) - cent(dd); x * x
      }.reduceLeft(_ + _)
      math.floor(d2 * 1e6).toLong
    }
    adc.foreach { case ((qid, cid), est) =>
      val want = (0 until 8).map(sub =>
        lutMicro(vecs(qid), sub, codeMap((cid, sub.toLong)).toInt)).sum
      assert(est === want, s"ADC mismatch for ($qid, $cid)")
    }
  }

  test("PQ trained codebooks: Lloyd's-refined books clear the ADC recall gate and cut distortion vs the md5 seed") {
    import org.apache.spark.sql.functions._
    // blob fixture: 16 well-separated Gaussian clusters of 10 points
    // each in 64-d, k = 9 — the truth set is EXACTLY the 9 cluster
    // mates, so the gate measures what PQ is deployed for
    // (inter-cluster separation under m-byte codes), not sub-codeword
    // resolution inside one dense blob (16 codewords per subspace
    // cannot order 40 near-identical mates — est ties, recall ~k/40
    // by construction, for trained and exact-centroid books alike)
    val rnd = new scala.util.Random(17)
    val centers = Seq.fill(16)(Array.fill(64)(rnd.nextGaussian() * 4.0))
    val rows = (0L until 160L).map { i =>
      val c = centers((i % 16).toInt)
      (i, c.map(_ + rnd.nextGaussian() * 0.3).toSeq)
    }
    val df = rows.toDF("cid", "v").cache()
    val vecs = rows.toMap
    val qids = (0L until 12L)
    val queries = df.filter($"cid" < 12)
      .select($"cid".as("qid"), $"v".as("qvec"))
    // exact L2 top-9 (ADC estimates squared L2, so the truth set is
    // L2, not the cosine bruteForceTopK ranks by), JVM-computed
    def l2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val k = 9
    val exactRows = qids.flatMap { q =>
      rows.filter(_._1 != q)
        .map { case (c, v) => (c, l2(vecs(q), v)) }
        .sortBy { case (c, d) => (d, c) }.take(k).zipWithIndex
        .map { case ((c, _), r) => (q, (r + 1).toLong, c) }
    }
    val exact = exactRows.toDF("qid", "rank", "cid")
    def meanRecallPpm(approx: org.apache.spark.sql.DataFrame): Double = {
      val r = Similarity.recallAtK(exact, approx, k)
        .select(avg($"recall_ppm")).head.getDouble(0)
      r
    }
    val books = Similarity.Pq.trainCodebooks(df, "cid", "v")
    // fixed shape: ksub never shrinks (LUT stride), subDim preserved
    assert(books.length === Similarity.Pq.m)
    assert(books.forall(_.length === Similarity.Pq.ksub))
    assert(books.forall(_.forall(_.length === Similarity.Pq.subDim)))
    val trainedCodes = Similarity.Pq.encodeWideWith(df, "cid", "v", books)
    val trained = meanRecallPpm(
      Similarity.Pq.adcTopKWith(queries, trainedCodes, k, books))
    // the deployability gate (VERDICT r7 next-round item 2): trained
    // books must clear 0.8 recall@9 on the blob fixture — "an index
    // whose recall silently decayed is worse than a slow exact scan"
    assert(trained >= 800000.0,
      s"trained recall@$k = ${trained / 1e6} < 0.8")
    // and training must CUT QUANTIZATION DISTORTION vs its md5 seed —
    // the objective Lloyd's minimizes, monotone from the seed by
    // construction, so a regression here means the update step is
    // wrong (recall alone can saturate at 1.0 for both books on
    // separated blobs and hide that)
    def distortion(bks: Similarity.Pq.Codebooks): Double =
      rows.map { case (_, v) =>
        (0 until Similarity.Pq.m).map { s =>
          val sv = v.slice(s * Similarity.Pq.subDim,
            (s + 1) * Similarity.Pq.subDim)
          bks(s).map(cw => l2(sv, cw)).min
        }.sum
      }.sum
    val dTrained = distortion(books)
    val dMd5 = distortion(Similarity.Pq.md5Codebooks)
    assert(dTrained < dMd5 * 0.5,
      s"training barely moved distortion: trained=$dTrained md5=$dMd5")
    df.unpersist()
  }

  test("compactPqCodes: D/U/I compaction equals a from-scratch re-encode; a deleted neighbor vanishes") {
    val base = java.nio.file.Files.createTempDirectory("graft_pqcmp_spec_").toString
    try {
      val rnd = new scala.util.Random(23)
      val rows = (0L until 60L).map(i => (i, Seq.fill(64)(rnd.nextGaussian())))
      val df = rows.toDF("cid", "v")
      Similarity.Pq.encodeWide(df, "cid", "v")
        .write.parquet(s"$base/old")
      // at-least-once re-delivery from runPqIngest: a duplicate slice
      // lands in the stored table; compaction must collapse it
      Similarity.Pq.encodeWide(df.filter($"cid" < 5), "cid", "v")
        .write.mode("append").parquet(s"$base/old")
      val del = df.filter($"cid" % 7 === 0)
        .select($"cid", lit("D").as("op"),
          lit(null).cast("array<double>").as("v"))
      val upd = df.filter($"cid" % 11 === 0 && $"cid" % 7 =!= 0)
        .select($"cid", lit("U").as("op"),
          transform($"v", x => -x).as("v"))
      val ins = df.filter($"cid" % 13 === 0)
        .select(($"cid" + 100000L).as("cid"), lit("I").as("op"),
          reverse($"v").as("v"))
      Similarity.Pq.compactPqCodes(spark, s"$base/old",
        del.unionByName(upd).unionByName(ins), s"$base/new")
      // the compacted snapshot must equal a from-scratch encode of the
      // post-changelog corpus, row for row
      val corpus2 = df.filter($"cid" % 7 =!= 0 && $"cid" % 11 =!= 0)
        .unionByName(df.filter($"cid" % 11 === 0 && $"cid" % 7 =!= 0)
          .select($"cid", transform($"v", x => -x).as("v")))
        .unionByName(df.filter($"cid" % 13 === 0)
          .select(($"cid" + 100000L).as("cid"), reverse($"v").as("v")))
      val rebuilt = Similarity.Pq.encodeWide(corpus2, "cid", "v")
        .collect().map(_.toSeq).toSet
      val compacted = spark.read.parquet(s"$base/new")
        .collect().map(_.toSeq).toSet
      assert(compacted === rebuilt)
      // and the stale-rank bug is dead: no deleted id survives into an
      // ADC ranking over the compacted snapshot
      val queries = df.filter($"cid" < 3)
        .select($"cid".as("qid"), $"v".as("qvec"))
      val ranked = Similarity.Pq.adcTopK(queries,
        spark.read.parquet(s"$base/new"), 60)
      assert(ranked.filter($"cid" < 100000L && $"cid" % 7 === 0)
        .count() === 0)
    } finally {
      val p = java.nio.file.Paths.get(base)
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
    }
  }

  test("persisted PQ index: trained books round-trip the sidecar; probe from disk equals the build session") {
    val base = java.nio.file.Files.createTempDirectory("graft_pqidx_spec_").toString
    try {
      // the trained-codebook deployment path (VERDICT r8 Missing #1):
      // blobs → trained books → writePqIndex → a probe that recovers
      // EVERYTHING from disk must rank identically to the build
      // session's in-memory books
      val rnd = new scala.util.Random(31)
      val centers = Seq.fill(16)(Array.fill(64)(rnd.nextGaussian() * 4.0))
      val rows = (0L until 160L).map { i =>
        val c = centers((i % 16).toInt)
        (i, c.map(_ + rnd.nextGaussian() * 0.3).toSeq)
      }
      val df = rows.toDF("cid", "v").cache()
      val books = Similarity.Pq.trainCodebooks(df, "cid", "v")
      Similarity.Pq.writePqIndex(df, "cid", "v", s"$base/idx", books)
      // bit-exact sidecar round-trip — the identical-LUT precondition
      assert(Similarity.Pq.readPqBooks(spark, s"$base/idx") === books)
      val queries = df.filter($"cid" < 8)
        .select($"cid".as("qid"), $"v".as("qvec"))
      val fromDisk = Similarity.Pq
        .probePqIndex(spark, s"$base/idx", queries, 9)
        .collect().map(_.toSeq).toSet
      val inSession = Similarity.Pq.adcTopKWith(queries,
          Similarity.Pq.encodeWideWith(df, "cid", "v", books), 9, books)
        .collect().map(_.toSeq).toSet
      assert(fromDisk === inSession)
      // and the books MATTER: probing the same codes with md5 books
      // (the pre-sidecar failure mode) ranks differently
      val misRanked = Similarity.Pq.adcTopK(queries,
          spark.read.parquet(s"$base/idx/codes"), 9)
        .collect().map(_.toSeq).toSet
      assert(misRanked !== fromDisk,
        "fixture cannot distinguish trained from md5 books")
      df.unpersist()
    } finally deleteRec(base)
  }

  test("persisted PQ index: missing sidecar and mismatched append books refuse loudly") {
    val base = java.nio.file.Files.createTempDirectory("graft_pqidx_refuse_").toString
    try {
      val rnd = new scala.util.Random(37)
      val rows = (0L until 40L).map(i => (i, Seq.fill(64)(rnd.nextGaussian())))
      val df = rows.toDF("cid", "v")
      // a bare code table without books — the exact artifact class the
      // sidecar exists to prevent — must refuse the probe, not guess
      Similarity.Pq.encodeWide(df, "cid", "v")
        .write.parquet(s"$base/bare/codes")
      val queries = df.filter($"cid" < 2)
        .select($"cid".as("qid"), $"v".as("qvec"))
      val e1 = intercept[IllegalArgumentException] {
        Similarity.Pq.probePqIndex(spark, s"$base/bare", queries, 3)
      }
      assert(e1.getMessage.contains("books"), e1.getMessage.take(200))
      // an append carrying DIFFERENT books than the sidecar must
      // refuse instead of silently mixing geometries in one table
      Similarity.Pq.writePqIndex(df, "cid", "v", s"$base/idx")
      val other = Similarity.Pq.md5Codebooks.map(_.map(_.map(-_)))
      val e2 = intercept[IllegalArgumentException] {
        Similarity.Pq.appendToPqIndex(spark, s"$base/idx",
          df.limit(1), "cid", "v", Some(other))
      }
      assert(e2.getMessage.contains("sidecar"), e2.getMessage.take(200))
      // matching books append fine, and the grown index still probes
      Similarity.Pq.appendToPqIndex(spark, s"$base/idx",
        df.limit(5), "cid", "v", Some(Similarity.Pq.md5Codebooks))
      val probed = Similarity.Pq
        .probePqIndex(spark, s"$base/idx", queries, 3)
      val direct = Similarity.Pq.adcTopK(queries,
        Similarity.Pq.encodeWide(df, "cid", "v"), 3)
      assert(probed.collect().map(_.toSeq).toSet ===
        direct.collect().map(_.toSeq).toSet)
    } finally deleteRec(base)
  }

  test("compactPqIndex: sidecar books drive the re-encode and ride to the successor snapshot") {
    val base = java.nio.file.Files.createTempDirectory("graft_pqidxcmp_").toString
    try {
      val rnd = new scala.util.Random(41)
      val rows = (0L until 60L).map(i => (i, Seq.fill(64)(rnd.nextGaussian())))
      val df = rows.toDF("cid", "v")
      // non-default books: the compaction must re-encode U/I rows with
      // THESE (from the sidecar), not the md5 default the raw-table
      // form would have assumed
      val books = Similarity.Pq.md5Codebooks.map(_.map(_.map(-_)))
      Similarity.Pq.writePqIndex(df, "cid", "v", s"$base/old", books)
      val del = df.filter($"cid" % 7 === 0)
        .select($"cid", lit("D").as("op"),
          lit(null).cast("array<double>").as("v"))
      val upd = df.filter($"cid" % 11 === 0 && $"cid" % 7 =!= 0)
        .select($"cid", lit("U").as("op"),
          transform($"v", x => -x).as("v"))
      Similarity.Pq.compactPqIndex(spark, s"$base/old",
        del.unionByName(upd), s"$base/new")
      val corpus2 = df.filter($"cid" % 7 =!= 0 && $"cid" % 11 =!= 0)
        .unionByName(df.filter($"cid" % 11 === 0 && $"cid" % 7 =!= 0)
          .select($"cid", transform($"v", x => -x).as("v")))
      val rebuilt = Similarity.Pq
        .encodeWideWith(corpus2, "cid", "v", books)
        .collect().map(_.toSeq).toSet
      assert(spark.read.parquet(s"$base/new/codes")
        .collect().map(_.toSeq).toSet === rebuilt)
      // books rode along: the successor is self-describing too
      assert(Similarity.Pq.readPqBooks(spark, s"$base/new") === books)
      // and the enforced out-of-place contract (ADVICE r8)
      val e = intercept[IllegalArgumentException] {
        Similarity.Pq.compactPqIndex(spark, s"$base/new", del,
          s"$base/new")
      }
      assert(e.getMessage.contains("out-of-place"), e.getMessage.take(200))
    } finally deleteRec(base)
  }

  test("IVF+PQ composition: same estimator, candidates confined to probed cells") {
    import org.apache.spark.sql.functions._
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qvec"))
    val cands = e.select(col("vec_id").as("cid"), col("v").as("cvec"))
    val codes = Similarity.Pq.encodeWide(
      e.select(col("vec_id").as("cid"), col("v")), "cid", "v")
    val cents = graft.functions.VectorFunctions.md5Vectors(16, 64, "cent")
    val full = Similarity.Pq.adcTopK(queries, codes, 1000).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    val pruned = Similarity.Pq.ivfAdcTopK(queries, cands, codes,
      cents, k = 5, nProbe = 4).collect()
    // the pruned ranking never invents a score: every returned pair's
    // est equals the full ADC estimate for that pair
    pruned.foreach { r =>
      assert(full((r.getLong(0), r.getLong(2))) === r.getLong(3))
    }
    // and pruning prunes: with nProbe=1 the candidate set shrinks
    val tight = Similarity.Pq.ivfAdcTopK(queries, cands, codes,
      cents, k = 1000, nProbe = 1).count()
    val wide = Similarity.Pq.ivfAdcTopK(queries, cands, codes,
      cents, k = 1000, nProbe = 16).count()
    assert(tight < wide)
  }

  test("IVF+SQ composition: same estimator, candidates confined to probed cells") {
    import org.apache.spark.sql.functions._
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val ev = e.select(col("vec_id").as("cid"), col("v"))
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qvec"))
    val cands = e.select(col("vec_id").as("cid"), col("v").as("cvec"))
    val (mns, mxs) = Similarity.Sq.minMax(ev, "v", 64)
    val codes = ev.select(col("cid"),
      Similarity.Sq.encode(col("v"), mns, mxs).as("codes"))
    val cents = graft.functions.VectorFunctions.md5Vectors(16, 64, "cent")
    val full = Similarity.Sq.sqTopK(queries, codes, 1000, mns, mxs)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3))
      .toMap
    val pruned = Similarity.Sq.ivfSqTopK(queries, cands, codes,
      cents, k = 5, nProbe = 4, mins = mns, maxs = mxs).collect()
    // the pruned ranking never invents a score: every returned pair's
    // est equals the full SQ estimate for that pair
    pruned.foreach { r =>
      assert(full((r.getLong(0), r.getLong(2))) === r.getLong(3))
    }
    // and pruning prunes: with nProbe=1 the candidate set shrinks
    val tight = Similarity.Sq.ivfSqTopK(queries, cands, codes,
      cents, k = 1000, nProbe = 1, mins = mns, maxs = mxs).count()
    val wide = Similarity.Sq.ivfSqTopK(queries, cands, codes,
      cents, k = 1000, nProbe = 16, mins = mns, maxs = mxs).count()
    assert(tight < wide)
  }

  test("ivfAdcTopK: duplicated qid rows collapse keep-one, no duplicate top-k slots") {
    import org.apache.spark.sql.functions._
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qvec"))
    val cands = e.select(col("vec_id").as("cid"), col("v").as("cvec"))
    val codes = Similarity.Pq.encodeWide(
      e.select(col("vec_id").as("cid"), col("v")), "cid", "v")
    val cents = graft.functions.VectorFunctions.md5Vectors(16, 64, "cent")
    val clean = Similarity.Pq.ivfAdcTopK(queries, cands, codes,
      cents, k = 5, nProbe = 4).collect().map(_.toSeq).toSet
    // the same queries delivered twice (an upstream at-least-once
    // retry): without the probe-side collapse each (qid, cid)
    // candidate row doubles and duplicates occupy top-k slots
    val doubled = Similarity.Pq.ivfAdcTopK(queries.union(queries),
      cands, codes, cents, k = 5, nProbe = 4)
      .collect().map(_.toSeq)
    assert(doubled.toSet === clean, "doubled-qid ranking diverged")
    assert(doubled.length == doubled.toSet.size, "duplicate output rows")
  }

  test("pq_search / ivf_search TVFs: equal the direct probe; wrong layouts refused loudly") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_vec_tvf_").toString
    try {
      val vecs = spark.range(40)
        .select($"id".as("cid"),
          transform(sequence(lit(0), lit(63)),
            i => sin($"id" * 7 + i).as("x")).as("v"))
      Similarity.Pq.writePqIndex(vecs, "cid", "v", s"$base/pq")
      Similarity.writeIvfIndex(
        vecs.select($"cid", $"v".as("cvec")), s"$base/ivf",
        graft.functions.VectorFunctions.md5Vectors(8, 64, "tvf-cent"))
      val queries = vecs.filter($"cid" < 3)
        .select($"cid".as("qid"), $"v".as("qvec"))
      queries.createOrReplaceTempView("vec_tvf_queries")
      // the TVF must be the direct Scala path through a parser door
      val directPq = Similarity.Pq
        .probePqIndex(spark, s"$base/pq", queries, 4)
        .orderBy($"qid", $"rank").collect().map(_.toSeq).toSeq
      val viaSqlPq = spark.sql(
        s"SELECT * FROM pq_search('$base/pq', 'vec_tvf_queries', 4) " +
          "ORDER BY qid, rank").collect().map(_.toSeq).toSeq
      assert(viaSqlPq == directPq && directPq.nonEmpty)
      val directIvf = Similarity
        .probeIvfIndex(spark, s"$base/ivf", queries, 4, nProbe = 3)
        .orderBy($"qid", $"rank").collect().map(_.toSeq).toSeq
      val viaSqlIvf = spark.sql(
        s"SELECT * FROM ivf_search('$base/ivf', 'vec_tvf_queries', 4, 3) " +
          "ORDER BY qid, rank").collect().map(_.toSeq).toSeq
      assert(viaSqlIvf == directIvf && directIvf.nonEmpty)
      // wrong queries schema: named refusal, not an unresolved column
      vecs.createOrReplaceTempView("vec_tvf_not_queries")
      val e1 = intercept[Exception] {
        spark.sql(s"SELECT * FROM pq_search('$base/pq', " +
          "'vec_tvf_not_queries', 4)").collect()
      }
      assert(e1.getMessage.contains("qid, qvec"), e1.getMessage.take(300))
      // a dir that is not an index: the expected layout is named
      val e2 = intercept[Exception] {
        spark.sql(s"SELECT * FROM pq_search('$base/nowhere', " +
          "'vec_tvf_queries', 4)").collect()
      }
      assert(e2.getMessage.contains("writePqIndex layout"),
        e2.getMessage.take(300))
      val e3 = intercept[Exception] {
        spark.sql(s"SELECT * FROM ivf_search('$base/pq', " +
          "'vec_tvf_queries', 4, 3)").collect()
      }
      assert(e3.getMessage.contains("writeIvfIndex layout"),
        e3.getMessage.take(300))
      // k / n_probe validation fires before any table is touched
      val e4 = intercept[Exception] {
        spark.sql(s"SELECT * FROM ivf_search('$base/ivf', " +
          "'vec_tvf_queries', 4, 0)").collect()
      }
      assert(e4.getMessage.contains("n_probe must be >= 1"),
        e4.getMessage.take(300))
      // sq_search: the SQ sibling through the same door pattern
      val (mns, mxs) = Similarity.Sq.minMax(vecs, "v", 64)
      Similarity.Sq.writeSqIndex(vecs, "cid", "v", s"$base/sq", mns, mxs)
      val directSq = Similarity.Sq
        .probeSqIndex(spark, s"$base/sq", queries, 4)
        .orderBy($"qid", $"rank").collect().map(_.toSeq).toSeq
      val viaSqlSq = spark.sql(
        s"SELECT * FROM sq_search('$base/sq', 'vec_tvf_queries', 4) " +
          "ORDER BY qid, rank").collect().map(_.toSeq).toSeq
      assert(viaSqlSq == directSq && directSq.nonEmpty)
      val e5 = intercept[Exception] {
        spark.sql(s"SELECT * FROM sq_search('$base/nowhere', " +
          "'vec_tvf_queries', 4)").collect()
      }
      assert(e5.getMessage.contains("writeSqIndex layout"),
        e5.getMessage.take(300))
      val e6 = intercept[Exception] {
        spark.sql(s"SELECT * FROM sq_search('$base/sq', " +
          "'vec_tvf_not_queries', 4)").collect()
      }
      assert(e6.getMessage.contains("qid, qvec"), e6.getMessage.take(300))
    } finally deleteRec(base)
  }

  test("compactPqCodes: aliased relative/absolute spellings of the same dir refuse out-of-place") {
    import org.apache.spark.sql.functions._
    val rel = "target/tmp/simspec_alias_pq"
    val abs = new java.io.File(rel).getAbsolutePath
    val df = spark.range(4)
      .select($"id".as("cid"),
        transform(sequence(lit(0), lit(63)),
          i => ($"id" + i).cast("double")).as("v"))
    val cl = df.limit(1).select($"cid", lit("D").as("op"),
      lit(null).cast("array<double>").as("v"))
    try {
      Similarity.Pq.encodeWide(df, "cid", "v")
        .write.mode("overwrite").parquet(rel)
      // raw Path equality misses this aliasing; FS-qualification
      // must not (ADVICE r9)
      val e = intercept[IllegalArgumentException] {
        Similarity.Pq.compactPqCodes(spark, rel, cl, abs)
      }
      assert(e.getMessage.contains("out-of-place"), e.getMessage.take(200))
    } finally deleteRec(new java.io.File(rel).getAbsolutePath)
  }

  test("JL projection (q243 geometry): distortion concentrates near 1 under the √(3/k) scale") {
    // uniform[-1,1) plane components have variance 1/3, so the
    // distance-preserving scale is √(3/k), NOT the gaussian 1/√k —
    // this pins the constant q243 ships (a 1/√k regression would read
    // ~0.577 mean distortion and fail here)
    import graft.functions.VectorFunctions.md5Vectors
    val planes = md5Vectors(16, 64, "jl")
    val vs = md5Vectors(40, 64, "jldata")
    val scale = math.sqrt(3.0) / 4.0
    def proj(v: Seq[Double]): Seq[Double] =
      planes.map(p => p.lazyZip(v).map(_ * _).sum * scale)
    def l2(a: Seq[Double], b: Seq[Double]): Double =
      math.sqrt(a.lazyZip(b).map((x, y) => (x - y) * (x - y)).sum)
    val ys = vs.map(proj)
    val ds = for (i <- vs.indices; j <- vs.indices if i < j)
      yield l2(ys(i), ys(j)) / l2(vs(i), vs(j))
    val mean = ds.sum / ds.size
    assert(mean > 0.85 && mean < 1.15, s"mean distortion $mean")
    assert(ds.forall(d => d > 0.3 && d < 2.2), s"range ${ds.min}..${ds.max}")
  }

  test("SQ: codes in [0,255], per-dim error under one cell, degenerate dims code 0 and decode exactly") {
    import graft.functions.VectorFunctions.md5Vectors
    // 8 varying dims + a constant 9th (the degenerate-dim guard path)
    val vs = md5Vectors(30, 8, "sq").map(_ :+ 5.0)
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val (mns, mxs) = Similarity.Sq.minMax(df, "v", 9)
    assert(mns(8) == 5.0 && mxs(8) == 5.0)
    val rows = df
      .withColumn("codes", Similarity.Sq.encode($"v", mns, mxs))
      .withColumn("vhat", Similarity.Sq.decode($"codes", mns, mxs))
      .select($"v", $"codes", $"vhat")
      .as[(Seq[Double], Seq[Int], Seq[Double])].collect()
    rows.foreach { case (v, codes, vhat) =>
      assert(codes.forall(c => c >= 0 && c <= 255))
      assert(codes(8) == 0 && vhat(8) == 5.0)
      (0 until 8).foreach { j =>
        val cell = (mxs(j) - mns(j)) / 255.0
        assert(math.abs(v(j) - vhat(j)) <= cell + 1e-12,
          s"dim $j err ${math.abs(v(j) - vhat(j))} > cell $cell")
      }
    }
    // extremes: the dim max codes exactly 255 (clamp), the min 0
    val atMax = rows.map(_._2.take(8).max).max
    val atMin = rows.map(_._2.take(8).min).min
    assert(atMax == 255 && atMin == 0)
  }

  test("persisted SQ index: minmax sidecar round-trips; probe from disk equals the build session; ranges matter") {
    import graft.functions.VectorFunctions.md5Vectors
    val base = java.nio.file.Files.createTempDirectory("graft_sqidx_spec_").toString
    try {
      val vs = md5Vectors(80, 16, "sqidx")
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("cid", "v")
      val (mns, mxs) = Similarity.Sq.minMax(df, "v", 16)
      Similarity.Sq.writeSqIndex(df, "cid", "v", s"$base/idx", mns, mxs)
      // bit-exact sidecar round-trip — the identical-decode precondition
      assert(Similarity.Sq.readSqMinMax(spark, s"$base/idx") ===
        ((mns, mxs)))
      val queries = df.filter($"cid" < 5)
        .select($"cid".as("qid"), $"v".as("qvec"))
      val fromDisk = Similarity.Sq
        .probeSqIndex(spark, s"$base/idx", queries, 7)
        .collect().map(_.toSeq).toSet
      val inSession = Similarity.Sq.sqTopK(queries,
          df.select($"cid",
            Similarity.Sq.encode($"v", mns, mxs).as("codes")),
          7, mns, mxs)
        .collect().map(_.toSeq).toSet
      assert(fromDisk === inSession)
      // and the ranges MATTER: decoding the same codes under squashed
      // ranges (the guessed-geometry failure mode) ranks differently
      val squashed = Similarity.Sq.sqTopK(queries,
          spark.read.parquet(s"$base/idx/codes"),
          7, mns.map(_ * 0.1), mxs.map(_ * 3.0))
        .collect().map(_.toSeq).toSet
      assert(squashed !== fromDisk,
        "fixture cannot distinguish sidecar from guessed ranges")
      // duplicated qid rows collapse keep-one (no duplicate top-k slots)
      val dupQ = queries.unionByName(queries.limit(2))
      val dup = Similarity.Sq.probeSqIndex(spark, s"$base/idx", dupQ, 7)
        .collect().map(_.toSeq).toSet
      assert(dup === fromDisk)
    } finally deleteRec(base)
  }

  test("persisted SQ index: missing sidecar / mismatched append refuse; compaction uses sidecar ranges out-of-place") {
    import graft.functions.VectorFunctions.md5Vectors
    val base = java.nio.file.Files.createTempDirectory("graft_sqidx_refuse_").toString
    try {
      val vs = md5Vectors(40, 16, "sqref")
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("cid", "v")
      val (mns, mxs) = Similarity.Sq.minMax(df, "v", 16)
      // a bare code table without its ranges must refuse the probe
      df.select($"cid", Similarity.Sq.encode($"v", mns, mxs).as("codes"))
        .write.parquet(s"$base/bare/codes")
      val queries = df.filter($"cid" < 2)
        .select($"cid".as("qid"), $"v".as("qvec"))
      val e1 = intercept[IllegalArgumentException] {
        Similarity.Sq.probeSqIndex(spark, s"$base/bare", queries, 3)
      }
      assert(e1.getMessage.contains("minmax"), e1.getMessage.take(200))
      // an append carrying DIFFERENT ranges than the sidecar refuses
      Similarity.Sq.writeSqIndex(df, "cid", "v", s"$base/idx", mns, mxs)
      val e2 = intercept[IllegalArgumentException] {
        Similarity.Sq.appendToSqIndex(spark, s"$base/idx",
          df.limit(1), "cid", "v", Some((mns.map(_ - 1.0), mxs)))
      }
      assert(e2.getMessage.contains("sidecar"), e2.getMessage.take(200))
      // matching ranges append fine; keep-first absorbs the retry re-land
      Similarity.Sq.appendToSqIndex(spark, s"$base/idx",
        df.limit(5), "cid", "v", Some((mns, mxs)))
      val probed = Similarity.Sq
        .probeSqIndex(spark, s"$base/idx", queries, 3)
        .collect().map(_.toSeq).toSet
      val direct = Similarity.Sq.sqTopK(queries,
          df.select($"cid",
            Similarity.Sq.encode($"v", mns, mxs).as("codes")),
          3, mns, mxs)
        .collect().map(_.toSeq).toSet
      assert(probed === direct)
      // compaction: D/U/I equals a from-scratch re-encode, ranges ride
      val del = df.filter($"cid" % 7 === 0)
        .select($"cid", lit("D").as("op"),
          lit(null).cast("array<double>").as("v"))
      val upd = df.filter($"cid" % 11 === 0 && $"cid" % 7 =!= 0)
        .select($"cid", lit("U").as("op"),
          transform($"v", x => -x).as("v"))
      Similarity.Sq.compactSqIndex(spark, s"$base/idx",
        del.unionByName(upd), s"$base/new")
      val corpus2 = df.filter($"cid" % 7 =!= 0 && $"cid" % 11 =!= 0)
        .unionByName(df.filter($"cid" % 11 === 0 && $"cid" % 7 =!= 0)
          .select($"cid", transform($"v", x => -x).as("v")))
      val rebuilt = corpus2
        .select($"cid", Similarity.Sq.encode($"v", mns, mxs).as("codes"))
        .collect().map(_.toSeq).toSet
      assert(spark.read.parquet(s"$base/new/codes")
        .collect().map(_.toSeq).toSet === rebuilt)
      assert(Similarity.Sq.readSqMinMax(spark, s"$base/new") ===
        ((mns, mxs)))
      val e3 = intercept[IllegalArgumentException] {
        Similarity.Sq.compactSqIndex(spark, s"$base/new", del,
          s"$base/new")
      }
      assert(e3.getMessage.contains("out-of-place"), e3.getMessage.take(200))
    } finally deleteRec(base)
  }
}
