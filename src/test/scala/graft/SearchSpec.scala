package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{DatasetOps, Search}

/** Gates for the keyword-retrieval surface (operators/Search.scala)
  * and the weighted interleave (DatasetOps.interleaveSources): a JVM
  * brute-force twin of the integer BM25 arithmetic, phrase-match
  * edge cases the relational oracle replays (overlaps, L=1,
  * case-folding), the bucketed-postings landing, and the stride
  * scheduler's proportionality/stability invariants.
  */
class SearchSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val corpus = Seq(
    (0L, "red fox jumps over the red fox"),
    (1L, "the quick red fox"),
    (2L, "a dog sleeps"),
    (3L, "fox fox fox dog"),
    (4L, "the dog and the fox")).toDF("doc_id", "text")

  // -- inverted index ----------------------------------------------------

  test("termPostings: tf and dl per (term, doc)") {
    val post = Search.termPostings(corpus, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getInt(3))).toMap
    assert(post(("fox", 0L)) == (2L, 7))   // two of 7 tokens
    assert(post(("fox", 3L)) == (3L, 4))
    assert(post(("the", 4L)) == (2L, 5))
    assert(!post.contains(("cat", 2L)))
  }

  test("corpusStats: n_docs and integer milli-avgdl") {
    val Array(st) = Search.corpusStats(corpus, "doc_id", "text").collect()
    assert(st.getLong(0) == 5L)
    // dls 7+4+3+4+5 = 23 tokens; (23*1000) div 5 = 4600
    assert(st.getLong(1) == 4600L)
  }

  test("corpusStats on an empty corpus is (0, 0), not a null-poisoned row") {
    val empty = corpus.filter(col("doc_id") < 0)
    val Array(st) = Search.corpusStats(empty, "doc_id", "text").collect()
    assert((st.getLong(0), st.getLong(1)) == (0L, 0L))
    val qs = Seq((0L, "fox")).toDF("qid", "qtext")
    assert(Search.bm25TopK(qs, Search.termPostings(empty, "doc_id", "text"),
      Search.corpusStats(empty, "doc_id", "text"), 3).count() == 0L)
  }

  // -- BM25 --------------------------------------------------------------

  /** The scoring formula, verbatim, on the JVM — the spec's oracle. */
  private def bm25Brute(docs: Seq[(Long, String)], query: String,
                        k: Int): Seq[(Long, Long, Long)] = {
    def toks(s: String) = s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val n = docs.size.toLong
    val dls = docs.map { case (id, t) => id -> toks(t).size.toLong }.toMap
    val a3 = dls.values.sum * 1000L / n
    val qts = toks(query).distinct
    val scores = docs.flatMap { case (id, t) =>
      val tfs = toks(t).groupBy(identity).map { case (w, o) => w -> o.size.toLong }
      val s = qts.map { term =>
        tfs.get(term).fold(0L) { tf =>
          val df = docs.count { case (_, t2) => toks(t2).contains(term) }.toLong
          val idf = (n - df + 1L) * 100000L / (df + 1L)
          val tfc = tf * 44L * a3 * 100000L /
            (20L * tf * a3 + 6L * a3 + 18000L * dls(id))
          idf * tfc
        }
      }.sum
      if (s > 0) Some(id -> s) else None
    }
    scores.sortBy { case (id, s) => (-s, id) }.take(k)
      .zipWithIndex.map { case ((id, s), i) => (i + 1L, id, s) }
  }

  test("bm25TopK matches the JVM integer replay (incl. OOV term)") {
    val data = Seq(
      (0L, "red fox jumps over the red fox"),
      (1L, "the quick red fox"),
      (2L, "a dog sleeps"),
      (3L, "fox fox fox dog"),
      (4L, "the dog and the fox"))
    val qs = Seq((0L, "red dog unicorn")).toDF("qid", "qtext")
    val got = Search.bm25TopK(qs,
        Search.termPostings(corpus, "doc_id", "text"),
        Search.corpusStats(corpus, "doc_id", "text"), k = 4)
      .orderBy(col("rank"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == bm25Brute(data, "red dog unicorn", 4))
  }

  test("bm25TopK: rarer term dominates equal-tf docs (idf ordering)") {
    val c = Seq(
      (0L, "common common rare"),
      (1L, "common common common"),
      (2L, "common other filler"),
      (3L, "common pad pad")).toDF("doc_id", "text")
    val qs = Seq((0L, "rare")).toDF("qid", "qtext")
    val top = Search.bm25TopK(qs,
        Search.termPostings(c, "doc_id", "text"),
        Search.corpusStats(c, "doc_id", "text"), k = 4).collect()
    assert(top.map(_.getLong(2)).toSeq == Seq(0L)) // only doc 0 has 'rare'
  }

  test("bm25TopK ranks through the bounded heap, not a Window sort") {
    val qs = Seq((0L, "fox dog")).toDF("qid", "qtext")
    val plan = Search.bm25TopK(qs,
        Search.termPostings(corpus, "doc_id", "text"),
        Search.corpusStats(corpus, "doc_id", "text"), k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"),
      s"expected the heap node in:\n$plan")
  }

  test("bucketed postings probe equals the in-session index") {
    val table = "graft_test_postings"
    Search.writePostingsBucketed(corpus, "doc_id", "text", table)
    try {
      val qs = Seq((0L, "red fox"), (1L, "dog")).toDF("qid", "qtext")
      val stats = Search.corpusStats(corpus, "doc_id", "text")
      val direct = Search.bm25TopK(qs,
          Search.termPostings(corpus, "doc_id", "text"), stats, 3)
        .orderBy(col("qid"), col("rank")).collect().toSeq
      val probed = Search.bm25TopK(qs, spark.table(table), stats, 3)
        .orderBy(col("qid"), col("rank")).collect().toSeq
      assert(probed == direct)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  // -- index compaction --------------------------------------------------

  test("compactPostings == from-scratch rebuild after D/U/I; stats move") {
    val oldPost = Search.termPostings(corpus, "doc_id", "text")
    val oldLens = Search.docLens(corpus, "doc_id", "text")
    val changelog = Seq(
      (1L, "D", null.asInstanceOf[String]),       // delete doc 1
      (3L, "U", "updated dog text"),              // rewrite doc 3
      (9L, "I", "a brand new fox document"),      // insert doc 9
      (10L, "I", "")                              // insert an EMPTY doc
    ).toDF("id", "op", "text")
    val (post2, lens2) = Search.compactPostings(oldPost, oldLens, changelog)
    val successor = Seq(
      (0L, "red fox jumps over the red fox"),
      (2L, "a dog sleeps"),
      (3L, "updated dog text"),
      (4L, "the dog and the fox"),
      (9L, "a brand new fox document"),
      (10L, "")).toDF("doc_id", "text")
    val want = Search.termPostings(successor, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSet
    val got = post2.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getInt(3))).toSet
    assert(got == want)
    // the length sidecar counts the EMPTY inserted doc postings cannot
    val Array(st) = Search.statsFromLens(lens2).collect()
    val Array(stW) = Search.corpusStats(successor, "doc_id", "text").collect()
    assert((st.getLong(0), st.getLong(1)) == (stW.getLong(0), stW.getLong(1)))
    assert(st.getLong(0) == 6L)
  }

  // -- phrase match ------------------------------------------------------

  test("phraseMatches: counts, overlaps, and non-matches") {
    val docs = Seq(
      (0L, "a b a b a"),        // "a b" starts at 0 and 2
      (1L, "a b"),
      (2L, "b a"),
      (3L, "a a b"),
      (4L, "x y z")).toDF("doc_id", "text")
    val got = Search.phraseMatches(docs, "doc_id", "text", Seq("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(0L -> 2, 1L -> 1, 3L -> 1))
  }

  test("phraseMatches: single-token phrase counts occurrences") {
    val got = Search.phraseMatches(corpus, "doc_id", "text", Seq("fox"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(0L -> 2, 1L -> 1, 3L -> 3, 4L -> 1))
  }

  test("phraseMatches: case-folds like the tokenizer") {
    val docs = Seq((0L, "Red FOX runs")).toDF("doc_id", "text")
    val got = Search.phraseMatches(docs, "doc_id", "text", Seq("red", "fox"))
      .collect()
    assert(got.length == 1 && got.head.getInt(1) == 1)
  }

  test("phraseMatches: three-token phrase needs full adjacency") {
    val docs = Seq(
      (0L, "one two three four"),
      (1L, "one two four three"),
      (2L, "one three two")).toDF("doc_id", "text")
    val got = Search.phraseMatches(docs, "doc_id", "text",
        Seq("one", "two", "three"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(0L -> 1))
  }

  test("phraseMatches: repeated-term phrases match, overlaps included") {
    val docs = Seq(
      (0L, "dup dup dup"),         // "dup dup" starts at 0 and 1
      (1L, "dup x dup"),           // no adjacency
      (2L, "new york new york"),
      (3L, "dup dup"),
      (4L, "x dup dup dup dup y")).toDF("doc_id", "text")
    val got2 = Search.phraseMatches(docs, "doc_id", "text", Seq("dup", "dup"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got2 == Map(0L -> 2, 3L -> 1, 4L -> 3))
    val got3 = Search.phraseMatches(docs, "doc_id", "text",
        Seq("dup", "dup", "dup"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got3 == Map(0L -> 1, 4L -> 2))
    // the classic: a 4-token phrase whose halves repeat — matches the
    // full run once, and the "new york" prefix alone does not count
    val got4 = Search.phraseMatches(docs, "doc_id", "text",
        Seq("new", "york", "new", "york"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got4 == Map(2L -> 1))
    // a term repeated in the phrase but adjacent to a DIFFERENT term
    // in the doc must not fake adjacency ("the fox the" vs "the the")
    val mixed = Search.phraseMatches(corpus, "doc_id", "text",
        Seq("the", "fox", "the"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(mixed.isEmpty) // no doc carries that exact run
  }

  test("phraseMatches equals a JVM sliding-window reference over random repeat-heavy corpora") {
    // tiny alphabet → dense repeats and overlaps, the adversarial
    // regime for the per-slot encoding (a wrong slot mapping or a
    // broken overlap count survives hand-picked fixtures; it does not
    // survive 30 random trials against the direct definition)
    val rnd = new scala.util.Random(41)
    val alphabet = Vector("a", "b", "c")
    for (trial <- 1 to 30) {
      val docs = (0L until 12L).map { i =>
        (i, Seq.fill(3 + rnd.nextInt(12))(
          alphabet(rnd.nextInt(alphabet.size))).mkString(" "))
      }
      val phrase = Seq.fill(1 + rnd.nextInt(3))(
        alphabet(rnd.nextInt(alphabet.size)))
      val want = docs.flatMap { case (id, text) =>
        val toks = text.split("\\s+").toSeq
        val n = toks.sliding(phrase.size).count(_ == phrase)
        if (n > 0) Some(id -> n) else None
      }.toMap
      val got = Search.phraseMatches(docs.toDF("doc_id", "text"),
          "doc_id", "text", phrase)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == want,
        s"trial $trial phrase=$phrase: got $got want $want docs=$docs")
    }
  }

  test("bestSnippets equals a JVM argmax reference over random corpora") {
    val rnd = new scala.util.Random(43)
    val alphabet = Vector("a", "b", "c", "d", "e")
    for (trial <- 1 to 20) {
      val docs = (0L until 10L).map { i =>
        (i, Seq.fill(2 + rnd.nextInt(20))(
          alphabet(rnd.nextInt(alphabet.size))).mkString(" "))
      }
      val terms = rnd.shuffle(alphabet).take(1 + rnd.nextInt(2))
      val w = 2 + rnd.nextInt(4)
      val want = docs.flatMap { case (id, text) =>
        val toks = text.split("\\s+").toSeq
        val hits = toks.zipWithIndex.collect {
          case (t, p) if terms.contains(t) => p }
        if (hits.isEmpty) None else {
          // candidate starts are hit positions; most hits in
          // [p, p+w), ties to the earliest start — the operator's
          // (and q135 oracle's) contract
          val (n, start) = hits
            .map(p => (hits.count(q => q >= p && q < p + w), -p))
            .max match { case (n0, negP) => (n0, -negP) }
          Some((id, start.toLong, n.toLong,
            toks.slice(start, start + w).mkString(" ")))
        }
      }.toSet
      val got = Search.bestSnippets(docs.toDF("doc_id", "text"),
          "doc_id", "text", terms, window = w)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSet
      assert(got == want, s"trial $trial terms=$terms w=$w")
    }
  }

  test("phraseMatches rejects malformed phrases") {
    intercept[IllegalArgumentException] {
      Search.phraseMatches(corpus, "doc_id", "text", Seq("two words"))
    }
    intercept[IllegalArgumentException] {
      Search.phraseMatches(corpus, "doc_id", "text", Seq.empty)
    }
  }

  // -- snippets ----------------------------------------------------------

  test("bestSnippets: densest window wins, ties take the earliest start") {
    val docs = Seq(
      // hits at 0, 4, 5: window 3 from 4 covers {4,5} (2 hits) > from 0
      (0L, "cat a b c cat cat d"),
      // symmetric two-hit windows at 0 and 4 — earliest start wins
      (1L, "cat cat x y cat cat"),
      (2L, "no match here at all"),
      // clip at doc end: best window starts at the last token
      (3L, "x y cat")).toDF("doc_id", "text")
    val got = Search.bestSnippets(docs, "doc_id", "text", Seq("cat"),
        window = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    assert(got(0L) == ((4L, 2L, "cat cat d")))
    assert(got(1L) == ((0L, 2L, "cat cat x")))
    assert(!got.contains(2L))
    assert(got(3L) == ((2L, 1L, "cat")))
  }

  // -- MMR re-ranking ----------------------------------------------------

  /** JVM greedy MMR with the operator's exact arithmetic. */
  private def mmrBrute(cands: Seq[(Long, Long, Array[Double])], m: Int,
                       k: Int): Seq[Long] = {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    def sim6(a: Array[Double], b: Array[Double]): Double =
      BigDecimal(cos(a, b)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble * 1e6
    var sel = Vector.empty[(Long, Long, Array[Double])]
    (1 to m).foreach { _ =>
      val rest = cands.filterNot(c => sel.exists(_._2 == c._2))
      if (rest.nonEmpty) {
        val best = rest.map { c =>
          val maxSim = if (sel.isEmpty) 0.0
            else sel.map(s => sim6(c._3, s._3)).max
          val rel = math.floor((k - c._1 + 1) * 1000000.0 / k)
          (-(rel * 0.5 - maxSim * 0.5), c._2, c)
        }.minBy(t => (t._1, t._2))
        sel = sel :+ best._3
      }
    }
    sel.map(_._2)
  }

  test("mmrRerank matches the JVM greedy replay and de-clumps duplicates") {
    // candidates: 0 and 1 near-identical (clump), 2 orthogonal-ish,
    // 3 a third direction; relevance order 0 > 1 > 2 > 3
    val vecs = Map(
      0L -> Array(1.0, 0.0, 0.0),
      1L -> Array(0.999, 0.04, 0.0),
      2L -> Array(0.0, 1.0, 0.0),
      3L -> Array(0.0, 0.0, 1.0))
    val ranked = Seq((7L, 1L, 0L), (7L, 2L, 1L), (7L, 3L, 2L), (7L, 4L, 3L))
      .toDF("qid", "rank", "cid")
    val vdf = vecs.toSeq.map { case (i, v) => (i, v.toSeq) }
      .toDF("id", "vec")
    val got = graft.operators.Search.mmrRerank(ranked, vdf, m = 3, k = 4)
      .orderBy(col("pos")).collect().map(_.getLong(2)).toSeq
    val want = mmrBrute(
      Seq((1L, 0L, vecs(0L)), (2L, 1L, vecs(1L)), (3L, 2L, vecs(2L)),
        (4L, 3L, vecs(3L))), 3, 4)
    assert(got == want)
    // diversification actually bites: the near-duplicate of the top
    // pick must NOT be second
    assert(got.head == 0L && got(1) != 1L)
  }

  test("mmrRerank over random vectors equals the JVM replay") {
    val rnd = new scala.util.Random(7)
    val cands = (0 until 12).map(i =>
      (i + 1L, i.toLong, Array.fill(8)(rnd.nextDouble() * 2 - 1)))
    val ranked = cands.map(c => (1L, c._1, c._2)).toDF("qid", "rank", "cid")
    val vdf = cands.map(c => (c._2, c._3.toSeq)).toDF("id", "vec")
    val got = graft.operators.Search.mmrRerank(ranked, vdf, m = 6, k = 12)
      .orderBy(col("pos")).collect().map(_.getLong(2)).toSeq
    assert(got == mmrBrute(cands, 6, 12))
  }

  // -- fuzzy terms -------------------------------------------------------

  test("fuzzyTermSuggestions: every distance-1 edit class is caught") {
    val docs = Seq(
      (0L, "stream stream vector"),
      (1L, "stream window"),
      (2L, "steam dream")).toDF("doc_id", "text")
    val got = Search.fuzzyTermSuggestions(docs, "doc_id", "text",
        Seq("streem", "stream", "strea", "streams", "xyz"), k = 5)
      .collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.sortBy(_.getLong(1)).map(_.getString(2)).toSeq).toMap
    assert(got("streem") == Seq("stream"))            // substitution
    assert(got("strea") == Seq("stream"))             // insertion repairs it
    assert(got("streams") == Seq("stream"))           // deletion repairs it
    assert(got("stream") == Seq("stream", "steam"))   // exact + neighbors
    assert(!got.contains("xyz"))                      // no neighbor
  }

  test("fuzzyTermSuggestions ranks by doc_freq desc then term") {
    val docs = Seq(
      (0L, "cat car"), (1L, "car"), (2L, "car cab")).toDF("doc_id", "text")
    val got = Search.fuzzyTermSuggestions(docs, "doc_id", "text",
        Seq("caz"), k = 3).collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, "car", 3L), (2L, "cab", 1L), (3L, "cat", 1L)))
  }

  // -- PMI expansion -----------------------------------------------------

  test("pmiExpansion: planted co-occurrence outranks background; floor bites") {
    // 'rocket' co-occurs with 'launch' in 3 of its 4 docs; 'filler' is
    // everywhere (low PMI); 'hapax' co-occurs once (under minJoint)
    val docs = Seq(
      (0L, "rocket launch filler"),
      (1L, "rocket launch filler"),
      (2L, "rocket launch filler"),
      (3L, "rocket hapax filler"),
      (4L, "filler other words"),
      (5L, "filler more words")).toDF("doc_id", "text")
    val got = Search.pmiExpansion(docs, "doc_id", "text", Seq("rocket"),
        k = 5, minJoint = 2L)
      .collect().map(r => (r.getString(2), r.getLong(3), r.getLong(4)))
    val byTerm = got.map(t => t._1 -> t).toMap
    // launch: joint 3, dft 4, dfu 3, N 6 → ((3e6 div 4)*6) div 3
    assert(byTerm("launch") == (("launch", 750000L * 6 / 3, 3L)))
    // hapax (joint 1) is floored out
    assert(!byTerm.contains("hapax"))
    // launch outranks the ubiquitous filler
    assert(got.head._1 == "launch")
    assert(byTerm("filler")._2 < byTerm("launch")._2)
  }

  // -- term drift --------------------------------------------------------

  test("termDrift: shares are exact integer ppm8 and one-sided terms rank") {
    val a = Seq((0L, "x x y"), (1L, "x z")).toDF("doc_id", "text") // x3 y1 z1
    val b = Seq((2L, "x y y y")).toDF("doc_id", "text")            // x1 y3
    val got = Search.termDrift(a, b, "doc_id", "text", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // a totals 5, b totals 4
    val xa = 3L * 100000000L / 5L; val xb = 1L * 100000000L / 4L
    val ya = 1L * 100000000L / 5L; val yb = 3L * 100000000L / 4L
    val za = 1L * 100000000L / 5L
    val want = Seq(
      ("y", ya, yb, yb - ya),
      ("x", xa, xb, xa - xb),
      ("z", za, 0L, za)).sortBy(t => (-t._4, t._1))
    assert(got == want)
    // the totals are broadcast scalars, never a single-partition
    // window over the vocabulary (VERDICT r6 item 3) — a reappearing
    // Window IS the scale regression
    val plan = Search.termDrift(a, b, "doc_id", "text", k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"vocabulary window reappeared:\n$plan")
  }

  test("termDrift: an empty side yields zero shares, not a null board") {
    val a = Seq((0L, "x y")).toDF("doc_id", "text")
    val b = a.filter(col("doc_id") < 0)
    val got = Search.termDrift(a, b, "doc_id", "text", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val half = 100000000L / 2L
    assert(got == Set(("x", half, 0L, half), ("y", half, 0L, half)))
  }

  // -- SQL TVF surface ---------------------------------------------------

  test("phrase_match and fuzzy_terms TVFs equal the Scala operators") {
    corpus.createOrReplaceTempView("search_tvf_docs")
    try {
      val pScala = Search.phraseMatches(corpus, "doc_id", "text",
        Seq("red", "fox")).orderBy(col("id")).collect().toSeq
      val pSql = spark.sql("""SELECT * FROM
          phrase_match('search_tvf_docs', 'doc_id', 'text', 'red fox')
        ORDER BY id""").collect().toSeq
      assert(pSql == pScala)
      val fScala = Search.fuzzyTermSuggestions(corpus, "doc_id", "text",
        Seq("fux", "dogg"), k = 2)
        .orderBy(col("query_term"), col("rank")).collect().toSeq
      val fSql = spark.sql("""SELECT * FROM
          fuzzy_terms('search_tvf_docs', 'doc_id', 'text', 'fux dogg', 2)
        ORDER BY query_term, rank""").collect().toSeq
      assert(fSql == fScala)
      intercept[Exception] {
        spark.sql(
          "SELECT * FROM fuzzy_terms('search_tvf_docs', 'doc_id', 'text', 'x', 0)")
      }
      val bScala = Search.booleanSearch(
        Search.termPostings(corpus, "doc_id", "text"),
        must = Seq("red"), should = Seq("fox"), k = 5)
        .collect().toSeq
      val bSql = spark.sql("""SELECT * FROM
          boolean_search('search_tvf_docs', 'doc_id', 'text',
            'red', 'fox', '', 5)""").collect().toSeq
      assert(bSql == bScala)
      intercept[Exception] {
        spark.sql("""SELECT * FROM boolean_search('search_tvf_docs',
          'doc_id', 'text', '', '', '', 5)""")
      }
    } finally spark.catalog.dropTempView("search_tvf_docs")
  }

  test("facet_search TVF equals the Scala operator; args validated") {
    val df = Seq((1L, "join scan a", "web"), (2L, "join b", "web"),
      (3L, "scan join c", "book"), (4L, "join scan", null))
      .toDF("doc_id", "text", "source")
    df.createOrReplaceTempView("facet_tvf_docs")
    try {
      val scala = Search.facetedSearch(
        Search.termPostings(df, "doc_id", "text"), df, "doc_id", "source",
        Seq("join", "scan"), topN = 10).collect().toSeq
      val sql = spark.sql("""SELECT * FROM
          facet_search('facet_tvf_docs', 'doc_id', 'text', 'source',
            'join scan', 10)""").collect().toSeq
      assert(sql == scala)
      intercept[Exception] {
        spark.sql("""SELECT * FROM facet_search('facet_tvf_docs',
          'doc_id', 'text', 'source', '', 10)""")
      }
      intercept[Exception] {
        spark.sql("""SELECT * FROM facet_search('facet_tvf_docs',
          'doc_id', 'text', 'source', 'join', 0)""")
      }
      val ssScala = Search.substringSearch(df, "doc_id", "text", "oin sc")
        .collect().toSeq
      val ssSql = spark.sql("""SELECT * FROM
          substring_search('facet_tvf_docs', 'doc_id', 'text', 'oin sc')""")
        .collect().toSeq
      assert(ssSql == ssScala && ssScala.nonEmpty)
      intercept[Exception] {
        spark.sql("""SELECT * FROM substring_search('facet_tvf_docs',
          'doc_id', 'text', 'ab')""") // shorter than the gram size
      }
    } finally spark.catalog.dropTempView("facet_tvf_docs")
  }

  test("best_snippets and pmi_expand TVFs equal the Scala operators") {
    corpus.createOrReplaceTempView("search_tvf_docs2")
    try {
      val sScala = Search.bestSnippets(corpus, "doc_id", "text",
        Seq("fox", "dog"), window = 3).orderBy(col("id")).collect().toSeq
      val sSql = spark.sql("""SELECT * FROM
          best_snippets('search_tvf_docs2', 'doc_id', 'text', 'fox dog', 3)
        ORDER BY id""").collect().toSeq
      assert(sSql == sScala)
      val pScala = Search.pmiExpansion(corpus, "doc_id", "text",
        Seq("fox"), k = 3, minJoint = 2L)
        .orderBy(col("query_term"), col("rank")).collect().toSeq
      val pSql = spark.sql("""SELECT * FROM
          pmi_expand('search_tvf_docs2', 'doc_id', 'text', 'fox', 3, 2)
        ORDER BY query_term, rank""").collect().toSeq
      assert(pSql == pScala)
      // arg validation surfaces at analysis time, loudly
      intercept[Exception] {
        spark.sql("SELECT * FROM best_snippets('search_tvf_docs2', 'doc_id', 'text', 'fox', 0)")
      }
      intercept[Exception] {
        spark.sql("SELECT * FROM best_snippets('search_tvf_docs2', 'doc_id', 'text', '   ')")
      }
      intercept[Exception] {
        spark.sql("SELECT * FROM pmi_expand('search_tvf_docs2', 'doc_id', 'text', 'fox', 0)")
      }
      intercept[Exception] {
        spark.sql("SELECT * FROM pmi_expand('search_tvf_docs2', 'doc_id', 'text', 'fox', 3, 0)")
      }
    } finally spark.catalog.dropTempView("search_tvf_docs2")
  }

  test("rrf_fuse and select_token_budget TVFs equal the Scala operators") {
    val a = Seq((0L, 1L, 10L), (0L, 2L, 11L)).toDF("qid", "rank", "doc_id")
    val b = Seq((0L, 1L, 11L), (0L, 2L, 12L)).toDF("qid", "rank", "doc_id")
    a.createOrReplaceTempView("graft_rrf_a")
    b.createOrReplaceTempView("graft_rrf_b")
    val scored = (0L until 50L).map(i => (i, i % 3, 5L + i % 7))
      .toDF("id", "score", "toks")
    scored.createOrReplaceTempView("graft_budget_t")
    try {
      val fScala = Search.rrfFuse(Seq(a, b), k0 = 60, k = 5)
        .orderBy(col("rank")).collect().toSeq
      val fSql = spark.sql("""SELECT * FROM
          rrf_fuse('graft_rrf_a', 'graft_rrf_b', 60, 5) ORDER BY rank""")
        .collect().toSeq
      assert(fSql == fScala)
      val tScala = DatasetOps.selectTokenBudget(scored, "id", "score",
        "toks", 120L).orderBy(col("id")).collect().toSeq
      val tSql = spark.sql("""SELECT * FROM
          select_token_budget('graft_budget_t', 'id', 'score', 'toks', 120)
        ORDER BY id""").collect().toSeq
      assert(tSql == tScala)
      intercept[Exception] {
        spark.sql("SELECT * FROM rrf_fuse('graft_rrf_a', 'graft_rrf_b', 0, 5)")
      }
      intercept[Exception] {
        spark.sql("SELECT * FROM rrf_fuse('graft_rrf_a', 'graft_rrf_b', 60, 0)")
      }
      intercept[Exception] {
        spark.sql("SELECT * FROM select_token_budget('graft_budget_t', 'id', 'score', 'toks', -1)")
      }
    } finally {
      spark.catalog.dropTempView("graft_rrf_a")
      spark.catalog.dropTempView("graft_rrf_b")
      spark.catalog.dropTempView("graft_budget_t")
    }
  }

  // -- weighted interleave ----------------------------------------------

  private def mixFixture = (0L until 600L)
    .map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")

  test("interleaveSources: prefixes carry sources ~proportionally to weight") {
    val out = DatasetOps.interleaveSources(mixFixture, "doc_id", "source",
        Map("src0" -> 3L, "src1" -> 2L), defaultWeight = 1L)
      .orderBy(col("vtime"), col("source"), col("doc_id"))
      .limit(120).collect()
    val bySrc = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // ideal 3:2:1 over 120 = 60/40/20; shard round-robin rank
    // reconstruction adds bounded noise
    assert(math.abs(bySrc("src0") - 60) <= 8, s"got $bySrc")
    assert(math.abs(bySrc("src1") - 40) <= 8, s"got $bySrc")
    assert(math.abs(bySrc("src2") - 20) <= 8, s"got $bySrc")
  }

  test("interleaveSources: vtime is the exact integer stride of src_rank") {
    val rows = DatasetOps.interleaveSources(mixFixture, "doc_id", "source",
        Map("src0" -> 3L), defaultWeight = 2L).collect()
    rows.foreach { r =>
      val (src, rank, v) =
        (r.getString(1), r.getLong(3), r.getLong(4))
      val w = if (src == "src0") 3L else 2L
      assert(v == rank * 1000000L / w)
    }
  }

  test("interleaveSources: deterministic under repartition") {
    val a = DatasetOps.interleaveSources(mixFixture, "doc_id", "source",
        Map("src1" -> 5L)).orderBy(col("doc_id"))
      .select(col("doc_id"), col("vtime")).collect().toSeq
    val b = DatasetOps.interleaveSources(mixFixture.repartition(7), "doc_id",
        "source", Map("src1" -> 5L)).orderBy(col("doc_id"))
      .select(col("doc_id"), col("vtime")).collect().toSeq
    assert(a == b)
  }

  test("interleaveSources: src_rank enumerates each source injectively") {
    val rows = DatasetOps.interleaveSources(mixFixture, "doc_id", "source",
        Map.empty).collect()
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      val ranks = rs.map(_.getLong(3))
      assert(ranks.distinct.length == ranks.length)
      assert(ranks.forall(_ >= 1L))
    }
  }

  test("interleaveSources rejects non-positive weights and shards") {
    intercept[IllegalArgumentException] {
      DatasetOps.interleaveSources(mixFixture, "doc_id", "source",
        Map("src0" -> 0L))
    }
    intercept[IllegalArgumentException] {
      DatasetOps.interleaveSources(mixFixture, "doc_id", "source",
        Map.empty, nShards = 0)
    }
  }

  // -- reciprocal-rank fusion --------------------------------------------

  test("rrfFuse: contribution arithmetic, single-arm docs, doc_id tie-break") {
    val a = Seq((0L, 1L, 10L), (0L, 2L, 11L), (0L, 3L, 12L))
      .toDF("qid", "rank", "doc_id")
    val b = Seq((0L, 1L, 11L), (0L, 2L, 20L)).toDF("qid", "rank", "doc_id")
    val got = Search.rrfFuse(Seq(a, b), k0 = 60, k = 10)
      .orderBy($"rank").as[(Long, Long, Long, Long)].collect().toSeq
    def c(r: Long) = 1000000000L / (60L + r)
    // doc 11 is in both arms; 10/12 keyword-only; 20 vector-only
    val exp = Seq(11L -> (c(2) + c(1)), 10L -> c(1), 20L -> c(2),
      12L -> c(3)).sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, s), i) => (0L, i + 1L, id, s) }
    assert(got == exp, s"got $got")
  }

  test("rrfFuse equals a JVM replay over random rankings; plans the bounded heap") {
    val rnd = new scala.util.Random(53)
    // three arms, 4 queries, overlapping doc pools with disjoint tails
    val arms = (0 until 3).map { arm =>
      (0L until 4L).flatMap { qid =>
        val docs = rnd.shuffle((0L until 30L) ++ (100L + arm * 10L until
          100L + arm * 10L + 5L)).take(12)
        docs.zipWithIndex.map { case (d, i) => (qid, i + 1L, d) }
      }
    }
    val dfs = arms.map(_.toDF("qid", "rank", "doc_id"))
    val fused = Search.rrfFuse(dfs, k0 = 60, k = 7)
    val got = fused.as[(Long, Long, Long, Long)].collect().toSet
    val exp = arms.flatten
      .groupBy(r => (r._1, r._3))
      .map { case ((qid, d), rs) =>
        (qid, d, rs.map(r => 1000000000L / (60L + r._2)).sum) }
      .groupBy(_._1).flatMap { case (qid, rows) =>
        rows.toSeq.sortBy(r => (-r._3, r._2)).take(7).zipWithIndex
          .map { case ((_, d, s), i) => (qid, i + 1L, d, s) }
      }.toSet
    assert(got == exp)
    val p = fused.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroupPartial") && p.contains("TopKPerGroupFinal"),
      s"fused ranking not planned through the heap:\n${p.take(600)}")
    intercept[IllegalArgumentException] { Search.rrfFuse(Seq(dfs.head)) }
    intercept[IllegalArgumentException] { Search.rrfFuse(dfs, k0 = 0) }
  }

  test("vocabCoverage: exact head sums, boundary ties, bounded-heap plan") {
    // counts: a=5, b=4, c=4, d=2, e=1 → 16 tokens; the b/c tie at the
    // size=2 boundary must cut by (cnt DESC, term): head(2) = {a, b}
    val docs = Seq(
      (1L, "a a b c d"), (2L, "a b c e"), (3L, "a a b b c c d")
    ).toDF("doc_id", "text")
    val got = Search.vocabCoverage(docs, "text", Seq(2, 3, 10))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (2L, 2L, 9L, 16L, 9L * 100000000L / 16L),
      (3L, 3L, 13L, 16L, 13L * 100000000L / 16L),
      (10L, 5L, 16L, 16L, 100000000L)), got.toString)
    // empty corpus: zero totals, zero coverage — never a null board
    val empty = Seq((1L, "")).toDF("doc_id", "text")
    val z = Search.vocabCoverage(empty, "text", Seq(5))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(z == Seq((5L, 0L, 0L, 0L, 0L)))
    // the head must plan as bounded per-partition heaps, never a
    // vocabulary sort (the q130 single-task lesson)
    val census = docs
      .select(explode(graft.functions.TextFunctions
        .whitespaceTokens($"text")).as("term"))
      .groupBy($"term").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"term").limit(10)
    census.collect()
    assert(census.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
    intercept[IllegalArgumentException] {
      Search.vocabCoverage(docs, "text", Seq.empty) }
    intercept[IllegalArgumentException] {
      Search.vocabCoverage(docs, "text", Seq(0)) }
    intercept[IllegalArgumentException] {
      Search.vocabCoverage(docs, "text", Seq(5, 5)) }
    intercept[IllegalArgumentException] {
      Search.vocabCoverage(docs, "text", Seq((1 << 20) + 1)) }
  }

  test("booleanSearch: must/should/mustNot clause semantics") {
    val docs = Seq(
      (1L, "join filter window"),        // both musts, 1 should
      (2L, "join filter window stream"), // both musts, 2 shoulds
      (3L, "join filter slow"),          // excluded by mustNot
      (4L, "join window stream sort"),   // missing a must
      (5L, "join filter")                // both musts, 0 shoulds
    ).toDF("doc_id", "text")
    val post = Search.termPostings(docs, "doc_id", "text")
    val got = Search.booleanSearch(post, must = Seq("join", "filter"),
        should = Seq("window", "stream", "sort"), mustNot = Seq("slow"),
        k = 10)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((2L, 2L), (1L, 1L), (5L, 0L)), got.toString)
    // empty must: any should-hit qualifies; docs without one don't show
    val any = Search.booleanSearch(post, must = Nil,
        should = Seq("sort"), k = 10)
      .as[(Long, Long)].collect().toSeq
    assert(any == Seq((4L, 1L)), any.toString)
    // tf must not leak into clause counts: repeated terms count once
    val rep = Seq((9L, "join join filter window window window"))
      .toDF("doc_id", "text")
    val postRep = Search.termPostings(rep, "doc_id", "text")
    val g2 = Search.booleanSearch(postRep, must = Seq("join", "filter"),
        should = Seq("window"), k = 1).as[(Long, Long)].collect().toSeq
    assert(g2 == Seq((9L, 1L)), g2.toString)
    intercept[IllegalArgumentException] {
      Search.booleanSearch(post, must = Nil, should = Nil) }
    intercept[IllegalArgumentException] {
      Search.booleanSearch(post, must = Seq("a"), mustNot = Seq("a")) }
  }

  test("substringSearch: scan-verify, counts, case-fold; agrees with the indexed tier") {
    val df = Seq(
      (1L, "the hash join strategy"), // crosses the token boundary
      (2L, "HASH JOIN twice hash join"), // case-folds; 2 occurrences
      (3L, "zab cq b cz cdq"), // all grams of "ab cd", NOT the substring
      (4L, "nothing here")).toDF("doc_id", "text")
    val got = Search.substringSearch(df, "doc_id", "text", "sh Jo")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((2L, 2L), (1L, 1L)), got)
    // a doc carrying all the pattern's grams but not the substring
    // must NOT match (the indexed tier admits it as a candidate and
    // kills it in verification; the scan tier never admits it) — and
    // the two tiers must agree row for row
    val fc = Search.substringSearch(df, "doc_id", "text", "ab cd")
      .as[(Long, Long)].collect().toSeq
    assert(fc == Nil, fc)
    for (pat <- Seq("sh Jo", "ab cd", "hash join")) {
      val scan = Search.substringSearch(df, "doc_id", "text", pat)
        .as[(Long, Long)].collect().toSeq
      val idx = Search.substringSearchFromIndex(
          Search.charGramPostings(df, "doc_id", "text"),
          df, "doc_id", "text", pat)
        .as[(Long, Long)].collect().toSeq
      assert(scan == idx, s"tiers disagree on '$pat': $scan vs $idx")
    }
    // non-overlapping replace-semantics: "aaaa" has 2 (not 3) "aa"s
    val ov = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val o = Search.substringSearch(ov, "doc_id", "text", "aa", k = 2)
      .as[(Long, Long)].collect().toSeq
    assert(o == Seq((1L, 2L)), o)
    intercept[IllegalArgumentException] {
      Search.substringSearch(df, "doc_id", "text", "ab") } // < k chars
    intercept[IllegalArgumentException] {
      Search.substringSearch(df, "doc_id", "text", "abc", k = 1) }
  }

  test("rankingMetrics: MRR/hits arithmetic, zero-hit alarms, cutoff") {
    // q0: relevant {10,11,12}; ranking hits 11 at rank 2 and 10 at 4
    // q1: relevant {20}; nothing ranked -> alarm row
    // q2: unlabeled -> absent from the board
    val ranking = Seq((0L, 1L, 99L), (0L, 2L, 11L), (0L, 3L, 98L),
      (0L, 4L, 10L), (1L, 1L, 97L), (2L, 1L, 20L)).toDF("qid", "rank", "id")
    val rel = Seq((0L, 10L), (0L, 11L), (0L, 12L), (1L, 20L))
      .toDF("qid", "id")
    val got = Search.rankingMetrics(ranking, "id", rel, k = 10)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 3L, 2L, 2L, 500000L), (1L, 1L, 0L, 0L, 0L)), got)
    // k=3 cuts the rank-4 hit; first_rank unchanged
    val k3 = Search.rankingMetrics(ranking, "id", rel, k = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(k3 == Seq((0L, 3L, 1L, 2L, 500000L), (1L, 1L, 0L, 0L, 0L)), k3)
    intercept[IllegalArgumentException] {
      Search.rankingMetrics(ranking, "id", rel, 0) }
  }

  test("facetedSearch: ALL-terms gate, null facet sentinel, tie order") {
    val corpus = Seq(
      (1L, "join scan filter", "web"),
      (2L, "join join scan", "web"), // repeated term counts once
      (3L, "join only here", "book"), // missing 'scan': excluded
      (4L, "scan join", null), // null facet -> (none)
      (5L, "scan join", "book"),
      (6L, "nothing relevant", "web"))
    val df = corpus.toDF("doc_id", "text", "source")
    val post = Search.termPostings(df, "doc_id", "text")
    val got = Search.facetedSearch(post, df, "doc_id", "source",
      must = Seq("Join", "SCAN")) // case-folds
      .as[(String, Long)].collect().toSeq
    // matched ids: 1,2 (web), 4 ((none)), 5 (book) — counts web=2,
    // (none)=1, book=1; ties break facet-asc
    assert(got == Seq(("web", 2L), ("(none)", 1L), ("book", 1L)), got)
    // topN bounds the board
    assert(Search.facetedSearch(post, df, "doc_id", "source",
      Seq("join", "scan"), topN = 1).count() == 1L)
    intercept[IllegalArgumentException] {
      Search.facetedSearch(post, df, "doc_id", "source", Nil) }
    intercept[IllegalArgumentException] {
      Search.facetedSearch(post, df, "doc_id", "source", Seq("a"), 0) }
  }

  test("booleanSearch: random-corpus sweep vs a JVM set reference") {
    val rnd = new scala.util.Random(20260814L)
    val vocab = ('a' to 'j').map(_.toString)
    for (round <- 1 to 5) {
      val corpus = (1L to 60L).map { id =>
        (id, Seq.fill(rnd.nextInt(12) + 1)(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      }
      val shuffled = rnd.shuffle(vocab)
      val must = shuffled.take(rnd.nextInt(2) + 1)
      val should = shuffled.slice(2, 2 + rnd.nextInt(3) + 1)
      val mustNot = shuffled.slice(6, 7)
      val k = rnd.nextInt(20) + 5
      val post = Search.termPostings(corpus.toDF("doc_id", "text"),
        "doc_id", "text")
      val got = Search.booleanSearch(post, must, should, mustNot, k)
        .as[(Long, Long)].collect().toSeq
      val want = corpus.flatMap { case (id, text) =>
        val ts = text.split(" ").toSet
        val ok = must.forall(ts) && mustNot.forall(t => !ts(t))
        if (ok) Some((id, should.count(ts).toLong)) else None
      }.sortBy { case (id, ns) => (-ns, id) }.take(k)
      assert(got == want, s"round $round: must=$must should=$should " +
        s"mustNot=$mustNot k=$k\ngot:  $got\nwant: $want")
    }
  }

  // -- persisted-index TVFs (the SQL route to the 0.26 s tier) ----------

  test("bm25_search_idx / substring_search_idx: equal the direct indexed path; wrong tables refused loudly") {
    corpus.createOrReplaceTempView("idx_tvf_docs")
    Search.termPostings(corpus, "doc_id", "text")
      .createOrReplaceTempView("idx_tvf_post")
    Search.docLens(corpus, "doc_id", "text")
      .createOrReplaceTempView("idx_tvf_lens")
    Search.charGramPostings(corpus, "doc_id", "text")
      .createOrReplaceTempView("idx_tvf_grams")
    // the TVF must be the direct Scala path through a parser door —
    // identical rows, identical order
    val qdf = Seq((0L, "red fox")).toDF("qid", "qtext")
    val direct = Search.bm25TopK(qdf,
        spark.table("idx_tvf_post"),
        Search.statsFromLens(spark.table("idx_tvf_lens")), k = 3)
      .collect().map(_.toSeq).toSeq
    val viaSql = spark.sql(
      """SELECT * FROM bm25_search_idx('idx_tvf_post', 'idx_tvf_lens',
        'red fox', 3) ORDER BY rank""").collect().map(_.toSeq).toSeq
    assert(viaSql == direct)
    val directSub = Search.substringSearchFromIndex(
        spark.table("idx_tvf_grams"), corpus, "doc_id", "text", "ed fo")
      .collect().map(_.toSeq).toSeq
    val viaSqlSub = spark.sql(
      """SELECT * FROM substring_search_idx('idx_tvf_grams',
        'idx_tvf_docs', 'doc_id', 'text', 'ed fo')
        ORDER BY n_occurrences DESC, id""").collect().map(_.toSeq).toSeq
    assert(viaSqlSub == directSub)
    // a wrong table (the docs table where an index landing belongs)
    // is refused with the expected layout named, not an unresolved-
    // column error deep in the scoring plan
    val e1 = intercept[Exception] {
      spark.sql("""SELECT * FROM bm25_search_idx('idx_tvf_docs',
        'idx_tvf_lens', 'red fox', 3)""").collect()
    }
    assert(e1.getMessage.contains("termPostings"), e1.getMessage.take(300))
    val e2 = intercept[Exception] {
      spark.sql("""SELECT * FROM bm25_search_idx('idx_tvf_post',
        'idx_tvf_docs', 'red fox', 3)""").collect()
    }
    assert(e2.getMessage.contains("docLens"), e2.getMessage.take(300))
    val e3 = intercept[Exception] {
      spark.sql("""SELECT * FROM substring_search_idx('idx_tvf_docs',
        'idx_tvf_docs', 'doc_id', 'text', 'ed fo')""").collect()
    }
    assert(e3.getMessage.contains("charGramPostings"), e3.getMessage.take(300))
    // k and arity validation fire before any table is touched
    val e4 = intercept[Exception] {
      spark.sql("""SELECT * FROM bm25_search_idx('idx_tvf_post',
        'idx_tvf_lens', 'red fox', 0)""").collect()
    }
    assert(e4.getMessage.contains("k must be >= 1"), e4.getMessage.take(300))
  }
}
