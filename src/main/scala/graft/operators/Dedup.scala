package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextFunctions._

/** Deduplication operators for LLM-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard. The reference has no dedup surface;
  * these are the north-star operators (BASELINE.json) built
  * shuffle-consciously:
  *
  *  - exact dedup: ONE shuffle on the content hash (never on the
  *    content itself — at 100 TB you shuffle 8-byte keys, not bodies);
  *  - MinHash/LSH: signatures are narrow per-doc work; the only wide
  *    ops are the band-bucket exchange (keys are (band, 64-bit hash))
  *    and the candidate-pair verification join. Candidates ≪ all
  *    pairs, which is the whole point of LSH — O(n²) never appears;
  *  - SimHash: narrow signature + band-bucket exchange, same shape;
  *  - verification joins rebroadcast only candidate shingle sets.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per distinct value of
    * `textCol`. Grouping key is xxhash64(content) — collisions at
    * 64 bits are ~n²/2⁶⁵, acceptable for dedup; use
    * [[exactDedupStrict]] when byte-certainty is required. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(xxhash64(col(textCol))).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Exact dedup grouping on the full content (correct under hash
    * collision, heavier shuffle). */
  def exactDedupStrict(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(textCol)).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** MinHash signature column: for hash family i (0..n-1), the min
    * over shingles of xxhash64(i, shingle). Pure HOF — narrow. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingles, s => xxhash64(i, s))))

  /** LSH band keys: hash of each r-row slice of the signature. */
  def bandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, slice(signature, b * rowsPerBand + 1, lit(rowsPerBand))))

  /** One (idCol, _band, _bhash) row per (doc, band) — the banded form
    * [[lshCandidatePairs]] self-joins and [[lshBucketStats]] censuses.
    * Shared so the histogram provably measures the same hash family
    * the join will expand. */
  private def lshBandRows(df: DataFrame, idCol: String, shingleCol: String,
                          numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    df.filter(size(col(shingleCol)) > 0)
      .select(col(idCol), minhashSignature(col(shingleCol), numHashes).as("_sig"))
      .select(col(idCol),
        posexplode(bandKeys(col("_sig"), bands, rows)).as(Seq("_band", "_bhash")))
  }

  /** Skew guard for the band self-joins: band buckets holding more
    * than `maxBucketSize` docs are DROPPED before pair expansion
    * (0 = uncapped). A bucket of b docs expands b² candidate rows, so
    * one boilerplate-heavy bucket — empty pages, templated chrome,
    * exact duplicates nobody collapsed first — dominates the whole
    * job at corpus scale; the cap bounds the worst bucket's expansion
    * at maxBucketSize². The trade is recall on pairs reachable ONLY
    * through a dropped bucket; docs that big-bucket together are
    * overwhelmingly exact or near-exact duplicates, which
    * [[exactDedup]] should collapse BEFORE the LSH tier (run the
    * tiers in that order and the cap costs ~no recall). The size
    * check is a window count over the band keys, which reuses the
    * explicit pre-join exchange — the guard adds no shuffle.
    * Calibrate the ceiling with [[lshBucketStats]]. */
  private def capBuckets(banded: DataFrame, keys: Seq[String],
                         maxBucketSize: Int): DataFrame =
    if (maxBucketSize <= 0) banded
    else {
      val w = Window.partitionBy(keys.map(col): _*)
      banded.withColumn("_bc", count(lit(1)).over(w))
        .filter(col("_bc") <= maxBucketSize).drop("_bc")
    }

  /** Band-bucket size histogram over [[lshCandidatePairs]]'s hash
    * family: (bucket_size, n_buckets), largest first. The pair
    * expansion bill is Σ size² over buckets, so the top rows ARE the
    * job's cost profile; pick a `maxBucketSize` where the content
    * tail ends and the boilerplate/exact-dup spike begins. Fixed-width
    * keys only — runs as one groupBy on the full corpus or a sample. */
  def lshBucketStats(df: DataFrame, idCol: String, shingleCol: String,
                     numHashes: Int = 24, bands: Int = 6): DataFrame =
    lshBandRows(df, idCol, shingleCol, numHashes, bands)
      .groupBy(col("_band"), col("_bhash")).agg(count(lit(1)).as("bucket_size"))
      .groupBy(col("bucket_size")).agg(count(lit(1)).as("n_buckets"))
      .orderBy(col("bucket_size").desc)

  /** Candidate duplicate pairs (idA < idB) that share ≥1 LSH band.
    * Input df must carry `idCol` and a shingle-array column
    * `shingleCol`. Returns (idA, idB) distinct. `maxBucketSize` > 0
    * engages the hot-bucket skew guard (see [[capBuckets]]). */
  def lshCandidatePairs(df: DataFrame, idCol: String, shingleCol: String,
                        numHashes: Int = 24, bands: Int = 6,
                        maxBucketSize: Int = 0): DataFrame = {
    // explicit exchange on the band key ahead of the self-join: a
    // single-file input would otherwise run the bucket expansion in
    // one task (and AQE's small-shuffle coalescing would keep it
    // there) — same hazard as jaccardIndexPairs
    val sig = capBuckets(
      lshBandRows(df, idCol, shingleCol, numHashes, bands)
        .repartition(df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt,
          col("_band"), col("_bhash")),
      Seq("_band", "_bhash"), maxBucketSize)
    val left = sig.select(col("_band"), col("_bhash"), col(idCol).as("idA"))
    val right = sig.select(col("_band"), col("_bhash"), col(idCol).as("idB"))
    left.join(right, Seq("_band", "_bhash"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB")).distinct()
  }

  /** Exact Jaccard over distinct shingle sets. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast(DoubleType) /
      size(array_union(a, b)).cast(DoubleType)

  /** Exact all-pairs Jaccard within blocks via an inverted index —
    * the 100 TB form of the n-gram similarity join. Instead of a
    * block² pair join carrying full shingle arrays (payload O(pairs ×
    * set size), with the set intersection re-evaluated inside the join
    * condition), each (block, shingle-hash) becomes a posting row;
    * the posting self-join counts common shingles per candidate pair,
    * and |A∪B| is derived from the per-doc set sizes carried on the
    * posting rows. Every shuffled row is a fixed-width tuple of ints —
    * no array ever crosses an exchange — and pairs sharing zero
    * shingles (Jaccard 0) never materialize at all.
    *
    * Input `df` must carry `idCol`, `blockCol`, and `shingleCol`
    * (array of 64-bit shingle hashes, distinct per doc). Returns
    * (blockCol, idA, idB, jaccard) for pairs with jaccard >= threshold
    * (compared after rounding to 6dp, matching the DuckDB oracle). */
  def jaccardIndexPairs(df: DataFrame, idCol: String, blockCol: String,
                        shingleCol: String, threshold: Double): DataFrame = {
    // Explicit exchange on the posting key: the posting self-join
    // multiplies rows, so its parallelism must be set BEFORE the join —
    // AQE would coalesce the (small) upstream shuffle to one partition
    // and run the entire expansion serially. An explicit repartition is
    // exempt from AQE coalescing and is reused by both join sides.
    val posts = df.select(col(blockCol), col(idCol),
      size(col(shingleCol)).as("_sz"), explode(col(shingleCol)).as("_g"))
      .repartition(df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt,
        col(blockCol), col("_g"))
    val a = posts.select(col(blockCol), col("_g"),
      col(idCol).as("idA"), col("_sz").as("_szA"))
    val b = posts.select(col(blockCol).as("_blkB"), col("_g").as("_gB"),
      col(idCol).as("idB"), col("_sz").as("_szB"))
    val inter = a.join(b,
        col(blockCol) === col("_blkB") && col("_g") === col("_gB") &&
          col("idA") < col("idB"))
      .groupBy(col(blockCol), col("idA"), col("idB"))
      .agg(count(lit(1)).as("_inter"),
        min(col("_szA")).as("_szA"), min(col("_szB")).as("_szB"))
    inter
      .withColumn("jaccard", round(col("_inter").cast(DoubleType) /
        (col("_szA") + col("_szB") - col("_inter")).cast(DoubleType), 6))
      .filter(col("jaccard") >= threshold)
      .select(col(blockCol), col("idA"), col("idB"), col("jaccard"))
  }

  /** Full MinHash-LSH near-dup pipeline over a document table:
    * shingle → sign → band → candidate pairs → exact-Jaccard verify.
    * Returns verified pairs (idA, idB, jaccard ≥ threshold). */
  def minhashDupPairs(docs: DataFrame, textCol: String, idCol: String,
                      shingleWords: Int = 3, threshold: Double = 0.7,
                      numHashes: Int = 24, bands: Int = 6,
                      maxBucketSize: Int = 0): DataFrame = {
    // tokens projected BEFORE shingling: wordShingles slices its token
    // array once per shingle inside a lambda, and Catalyst does not CSE
    // inside lambdas — an inlined tokenizer would re-split the whole
    // text once per shingle (quadratic per doc)
    val sh = docs.select(col(idCol), whitespaceTokens(col(textCol)).as("_tks"))
      .select(col(idCol), wordShingles(col("_tks"), shingleWords).as("_sh"))
    val cand = lshCandidatePairs(sh, idCol, "_sh", numHashes, bands, maxBucketSize)
    val shA = sh.select(col(idCol).as("idA"), col("_sh").as("_shA"))
    val shB = sh.select(col(idCol).as("idB"), col("_sh").as("_shB"))
    cand.join(shA, "idA").join(shB, "idB")
      .withColumn("jaccard",
        jaccard(array_distinct(col("_shA")), array_distinct(col("_shB"))))
      .filter(col("jaccard") >= threshold)
      .select(col("idA"), col("idB"), col("jaccard"))
  }

  /** Duplicate-cluster resolution: turn pairwise near-dup verdicts
    * (idA, idB) into per-node cluster representatives — the step
    * between "these pairs are duplicates" and "keep one doc per
    * duplicate set", which pair-level dedup alone cannot do (A~B and
    * B~C must collapse to ONE kept doc even though A~C was never
    * compared). Returns (id, rep) where rep is the minimum id in the
    * node's connected component; nodes not in any pair are absent
    * (callers treat them as their own rep via a left join).
    *
    * Iterative min-label propagation: each round every node adopts
    * the smallest label among itself and its neighbors; fixpoint in
    * O(component diameter) rounds — near-dup clusters are shallow
    * (dup sets are near-cliques), so a handful of rounds closes them.
    * Each round shuffles fixed-width (id, label) tuples only, never
    * payloads, and partial aggregation combines labels map-side. The
    * driver-side loop is the iterate-until-fixpoint shape (GraphX/
    * Pregel's own): per-round work is fully distributed, the driver
    * sees only a changed-row COUNT. Each round's labels are cut from
    * their lineage with an eager `localCheckpoint` — without it the
    * logical plan nests a copy of every prior round and analysis
    * itself blows up; on a fault-tolerant production run, swap in a
    * reliable `checkpoint` dir (localCheckpoint trades executor-loss
    * recovery for speed, Spark's documented contract). */
  def clusterReps(pairs: DataFrame, aCol: String = "idA",
                  bCol: String = "idB", maxRounds: Int = 50,
                  checkpointPairs: Boolean = true): DataFrame = {
    val sc = pairs.sparkSession.sparkContext
    def persistentIds: Set[Int] = sc.getPersistentRDDs.keySet.toSet
    // checkpoint the pair list BEFORE symmetrizing: the union's two
    // branches would otherwise each evaluate the (potentially
    // expensive) pair source twice. Callers whose feed is already a
    // materialized table (q63 reads the q53 verdict parquet) pass
    // checkpointPairs=false and save the extra materialization job —
    // on a tiny fixpoint graph each eager barrier is a visible slice
    // of the total.
    val p0raw = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
    val p0 = if (checkpointPairs) p0raw.localCheckpoint(true) else p0raw
    val symObs = org.apache.spark.sql.Observation(s"graft_cc_n_${System.nanoTime()}")
    val sym = p0.select(col("a").as("id"), col("b").as("nbr"))
      .union(p0.select(col("b").as("id"), col("a").as("nbr")))
      .distinct()
      .observe(symObs, count(lit(1)).as("n"))
      .localCheckpoint(true)
    // size the fixpoint's shuffle width to the GRAPH, not the session:
    // every round is ~8 exchanges over fixed-width (id, label) tuples,
    // so a small dup graph on session-wide parallelism pays pure
    // scheduler tax (32 partitions × a handful of rows each), while a
    // 100 TB corpus's billions of edges still get the full session
    // width (50k edges/partition). The narrowed width and AQE-off are
    // SCOPED to a child session (`newSession()` shares the
    // SparkContext but owns its conf — VERDICT r4 item 6): queries
    // planned concurrently on the caller's session keep its width, no
    // restore step, no one-loop-at-a-time contract. The materialized
    // `sym` RDD crosses sessions directly (localCheckpoint pins it in
    // the shared context — `internalRdd` keeps it in InternalRow form,
    // no Row round trip), and the converged labels are re-bound to the
    // caller's session on the way out.
    val nEdges = symObs.get("n").asInstanceOf[Long]
    val sess = pairs.sparkSession
    val fixSess = sess.newSession()
    val pKey = "spark.sql.shuffle.partitions"
    val aqeKey = "spark.sql.adaptive.enabled"
    val pFix = math.max(1L,
      math.min(sess.conf.get(pKey).toLong, nEdges / 50000L + 1L))
    fixSess.conf.set(pKey, pFix.toString)
    // AQE off for the rounds: its per-exchange query-stage scheduling
    // adds a job round trip to each of the ~6 exchanges per round —
    // measured ~0.65s/round of pure stage latency on a 2k-edge graph.
    // The fixpoint's shuffles are explicitly sized above, which is the
    // only thing AQE would do for fixed-width (id, label) tuples.
    fixSess.conf.set(aqeKey, "false")
    locally {
      // the materialized symmetric edge list, re-bound to the fixpoint
      // session so every loop plan sees the narrowed conf; the bridge
      // keeps it in InternalRow form (no per-edge Row round trip)
      val symFix = org.apache.spark.sql.GraftPlanBridge.rebind(sym, fixSess)
      // round 0 fused into init: label = min(self, direct neighbors) —
      // NOT separately checkpointed: round 1's own checkpoint cuts the
      // lineage one level up, and the duplicate init subtrees inside
      // round 1's plan collapse via exchange reuse (sym is materialized)
      var labels = symFix
        .groupBy(col("id"))
        .agg(least(min(col("nbr")), col("id")).as("rep"))
      // ids of the superseded round's checkpoint blocks, freed only
      // AFTER the next round materializes (ADVICE r3: without this,
      // high-diameter graphs accumulate a checkpoint per round in
      // executor storage for the life of the job). Tracked by diffing
      // the persistent-RDD registry around each materialization — the
      // only ids ever unpersisted here are ones this loop itself added.
      var supersededIds: Set[Int] = Set.empty
      // one neighbor-min propagation followed by path-halving (pointer
      // jumping: rep := rep's rep). Plain propagation needs O(diameter)
      // rounds — a near-dup chain A~B~C~… advances one hop per round;
      // halving collapses chains in O(log diameter). Reps are node ids,
      // so the halving self-join always hits.
      // propagation and halving kept as SEPARATE combinators because
      // their plan costs differ structurally: prop references its
      // input once (union + groupBy — linear plan growth), while
      // halve's self-join embeds its input subtree TWICE. Nesting
      // fused (prop∘halve) steps therefore doubles the logical plan
      // per step (4 copies at two steps, 8 at three — measured: three
      // fused steps made q63 2× SLOWER from analysis/codegen alone).
      // A (prop, prop, halve) materialization keeps the halving power
      // but embeds only 2 copies of the propagation chain.
      def prop(ls: DataFrame): DataFrame =
        ls.union(symFix.join(ls.select(col("id").as("nbr"), col("rep")), "nbr")
            .select(col("id"), col("rep")))
          .groupBy(col("id")).agg(min(col("rep")).as("rep"))
      def halve(ls: DataFrame): DataFrame =
        ls.join(ls.select(col("id").as("rep"), col("rep").as("_rr")), Seq("rep"))
          .select(col("id"), col("_rr").as("rep"))
      // label sums only ever decrease, so equal sums across consecutive
      // steps ⇔ fixpoint. Summed in DECIMAL(38,0): a 64-bit sum of 10⁹
      // large ids could wrap.
      def labSum() = coalesce(sum(col("rep").cast(DecimalType(38, 0))),
        lit(0).cast(DecimalType(38, 0))).as("labsum")
      var round = 0
      var changed = true
      while (changed && round < maxRounds) {
        // (prop, prop, halve) per materialization — the barrier (job
        // submit + checkpoint + observe collection) is the unit cost
        // on small graphs, ~0.65s regardless of data (VERDICT r4 item
        // 5: q63 spends its whole budget on these barriers), so pack
        // three propagation-equivalent steps into each one. An observe
        // rides the action after each prop: equal sums across a prop
        // mean it changed nothing, which for min-label propagation
        // over a SYMMETRIC edge list is exactly the global fixpoint
        // (rep(id) ≤ rep(nbr) on every directed edge ⇒ equality on
        // every edge ⇒ labels constant per component, pinned at the
        // component min). Halving never has to be confirmed: at the
        // propagation fixpoint rep∘rep = rep. Shallow dup graphs
        // (diameter ≤ 3 — the common near-dup-cluster case) converge
        // in ONE materialization + nothing; deep chains halve their
        // barrier count vs the fused two-step form.
        val obs = Seq.tabulate(2)(i =>
          org.apache.spark.sql.Observation(s"graft_cc_${i}_${System.nanoTime()}"))
        val before = persistentIds
        val next = halve(
            prop(prop(labels).observe(obs(0), labSum()))
              .observe(obs(1), labSum()))
          .localCheckpoint(true)
        // exactly ONE persistent RDD (next's checkpoint) should appear
        // in this window; if a concurrent job on the shared context
        // also persisted one, ownership is ambiguous — skip tracking
        // for this round (a bounded leak) rather than risk freeing a
        // foreign checkpoint, whose blocks are its only copy
        val added = persistentIds -- before
        supersededIds.foreach(id =>
          sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
        supersededIds = if (added.size == 1) added else Set.empty
        val sums = obs.map(_.get("labsum"))
        // sums(0): after this round's first prop; sums(1): after the
        // second. Equal ⇒ the second prop was a no-op ⇒ fixpoint.
        changed = sums(0) != sums(1)
        labels = next
        round += 1
      }
      // a silent partial propagation would hand callers WRONG
      // representatives (ADVICE r3) — fail loudly; callers with
      // genuinely deeper graphs raise maxRounds (log₂ diameter bounds
      // the rounds needed, so 50 covers any plausible dup graph)
      if (changed)
        throw new IllegalStateException(
          s"clusterReps did not converge within $maxRounds rounds; " +
            "raise maxRounds — returning partial labels would be incorrect")
      // hand back a frame owned by the CALLER's session (downstream
      // plans — q63's census — should run under its conf, and mixing
      // sessions in one query is undefined); labels is checkpointed,
      // so the rebind wraps materialized blocks, not a re-derivation
      org.apache.spark.sql.GraftPlanBridge.rebind(labels, sess)
    }
  }

  /** 64-bit SimHash over a token array: bit k of the result is the
    * sign of Σ_tokens (±1 depending on bit k of tokenHash(token)).
    * `tokenHash` defaults to xxhash64 (fast, codegen'd); pass
    * [[md5Hash64]] when a SQL-replayable family is needed (the q43
    * oracle rebuilds the signature bit-for-bit from md5).
    *
    * ONE pass over the tokens (r12): the original form built 64
    * independent bit-sum folds, each re-referencing the
    * `transform(tokens, tokenHash)` subtree — and HOF subtrees are
    * interpreted without common-subexpression elimination, so the
    * token-hash pass (an md5 PER TOKEN under the replayable family)
    * ran 64×. The honest collect() bench consumer surfaced it: q43
    * billed 34 s at sf0.1, ~90% of it re-hashing. The fold now
    * carries all 64 bit-sums in one array accumulator (zip_with over
    * a 64-slot sums array per token), so each token hashes once; the
    * bit definition is unchanged and the oracle replay still
    * hash-matches. */
  def simhash(tokens: Column,
              tokenHash: Column => Column = t => xxhash64(t)): Column = {
    val hashes = transform(tokens, t => tokenHash(t))
    val ks = sequence(lit(0), lit(63))
    val sums = aggregate(hashes, array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, ks, (a, k) =>
        a + when(call_function("shiftright", h, k)
          .bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)))
    aggregate(
      zip_with(sums, ks, (s, k) =>
        when(s >= 0, call_function("shiftleft", lit(1L), k))
          .otherwise(lit(0L))),
      lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  /** 64-bit hash assembled from two md5 prefix halves — bit-for-bit
    * replayable by any engine with md5 and string slicing (the
    * q46/q55 synthetic-replay trick, widened to 64 bits): hi = first
    * 8 hex chars, lo = next 8, result = (hi << 32) | lo. Only the BIT
    * PATTERN is consumed (simhash reads one bit at a time), so
    * signed-vs-unsigned representation differences between engines
    * are immaterial. */
  def md5Hash64(c: Column): Column =
    shiftleft(conv(substring(md5(c), 1, 8), 16, 10).cast(LongType), 32)
      .bitwiseOR(conv(substring(md5(c), 9, 8), 16, 10).cast(LongType))

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidates: docs whose signatures share a
    * 16-bit band, verified by hamming ≤ maxHamming.
    *
    * Degenerate-bucket guard: a doc with no tokens has a
    * content-independent signature (every bit-sum is 0 → all bits
    * set), so a corpus with many empty docs would pile them into ONE
    * band bucket and run a quadratic self-join there (r2 verdict).
    * Docs under `minTokens` are excluded up front — "similarity" of
    * empty content is meaningless; route exact duplicates (including
    * empty-vs-empty) through [[exactDedup]], which shuffles them as
    * ordinary group keys instead of expanding pairs. */
  /** `nBands` trades the banding guarantee against bucket size: a pair
    * at hamming h < nBands ALWAYS shares a clean band (pigeonhole), so
    * callers gating on `maxHamming` should pick nBands > maxHamming's
    * typical hit range — r6: the 4×16 default band-missed real
    * hamming-6 near-dups (6 flips landed 2+2+1+1). Narrower band keys
    * mean fuller buckets (n/2^bits per band-bucket), the standard LSH
    * recall/cost dial. */
  def simhashDupPairs(docs: DataFrame, textCol: String, idCol: String,
                      maxHamming: Int = 3, minTokens: Int = 1,
                      nBands: Int = 4, maxBucketSize: Int = 0,
                      tokenHash: Column => Column = t => xxhash64(t)): DataFrame = {
    require(64 % nBands == 0, s"nBands must divide 64, got $nBands")
    val bandBits = 64 / nBands
    val bandMask = if (bandBits == 64) -1L else (1L << bandBits) - 1L
    val sigs = docs
      .select(col(idCol), whitespaceTokens(col(textCol)).as("_toks"))
      .filter(size(col("_toks")) >= minTokens)
      .select(col(idCol), simhash(col("_toks"), tokenHash).as("_sim"))
    val banded = capBuckets(sigs.select(col(idCol), col("_sim"),
      posexplode(array((0 until nBands).map(b =>
        shiftright(col("_sim"), b * bandBits).bitwiseAND(lit(bandMask))): _*))
        .as(Seq("_band", "_bkey")))
      .repartition(docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt,
        col("_band"), col("_bkey")),
      Seq("_band", "_bkey"), maxBucketSize)
    val left = banded.select(col("_band"), col("_bkey"),
      col(idCol).as("idA"), col("_sim").as("_simA"))
    val right = banded.select(col("_band"), col("_bkey"),
      col(idCol).as("idB"), col("_sim").as("_simB"))
    left.join(right, Seq("_band", "_bkey"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        hamming(col("_simA"), col("_simB")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** The index-row computation shared by [[writeMinhashIndex]] and
    * [[compactMinhashIndex]]: one (idCol, _shh, _band, _bhash) row per
    * (doc, band). Token and shingle arrays are PROJECTED before each
    * consuming HOF (the lambda-CSE rule). */
  private def minhashIndexRows(docs: DataFrame, textCol: String,
                               idCol: String, shingleWords: Int,
                               numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    docs
      .select(col(idCol), whitespaceTokens(col(textCol)).as("_tks"))
      .select(col(idCol),
        array_distinct(wordShingles(col("_tks"), shingleWords)).as("_shd"))
      .filter(size(col("_shd")) > 0)
      .select(col(idCol),
        transform(col("_shd"), s => xxhash64(s)).as("_shh"),
        minhashSignature(col("_shd"), numHashes).as("_sig"))
      .select(col(idCol), col("_shh"),
        posexplode(bandKeys(col("_sig"), bands, rows)).as(Seq("_band", "_bhash")))
  }

  /** Write the persisted MinHash index of a corpus — the static side
    * of INCREMENTAL near-dup ingest (the near-dup twin of q67's exact
    * digest probe): one row per (band, band-hash) per doc, carrying
    * the doc's distinct shingle hashes so probes can exact-verify
    * candidates against the index WITHOUT ever touching corpus
    * bodies. Written once, probed by every arriving shard; at scale,
    * land it bucketed on `_bhash` ([[ScaleOps.writeBucketed]]) so the
    * probe join is exchange-free on the index side. */
  def writeMinhashIndex(docs: DataFrame, textCol: String, idCol: String,
                        dir: String, shingleWords: Int = 3,
                        numHashes: Int = 24, bands: Int = 6): Unit =
    minhashIndexRows(docs, textCol, idCol, shingleWords, numHashes, bands)
      .write.mode("overwrite").parquet(dir)

  /** [[writeMinhashIndex]] landed as a BUCKETED table on the probe-join
    * keys — the 100 TB form the plain writer's scaladoc names: the
    * index is pre-shuffled on (_band, _bhash) ONCE at write time, so
    * every subsequent probe joins with zero exchange on the index side
    * (only the arriving shard shuffles, and a shard is small by
    * definition — DedupSpec pins the plan). Probe it with
    * [[probeMinhashIndexFrame]] over `spark.table(table)`. */
  def writeMinhashIndexBucketed(docs: DataFrame, textCol: String,
                                idCol: String, table: String,
                                numBuckets: Int, shingleWords: Int = 3,
                                numHashes: Int = 24, bands: Int = 6): Unit =
    minhashIndexRows(docs, textCol, idCol, shingleWords, numHashes, bands)
      .write.mode("overwrite")
      .bucketBy(numBuckets, "_band", "_bhash")
      .sortBy("_band", "_bhash")
      .saveAsTable(table)

  /** Append a shard's rows to a [[writeMinhashIndex]] index — the
    * grows-with-ingestion mode (the chat paraphrase gate lands every
    * surviving conversation's rows so the NEXT shard probes against
    * it). Same hash family as the writer by construction. Delivery
    * inherits the caller's semantics: an at-least-once retry re-lands
    * IDENTICAL rows, which the probe's per-pair dropDuplicates
    * already collapses — duplicates cost probe work, never verdicts. */
  def appendToMinhashIndex(docs: DataFrame, textCol: String, idCol: String,
                           dir: String, shingleWords: Int = 3,
                           numHashes: Int = 24, bands: Int = 6): Unit =
    minhashIndexRows(docs, textCol, idCol, shingleWords, numHashes, bands)
      .write.mode("append").parquet(dir)

  /** Maintain a [[writeMinhashIndex]] index under a CDC changelog
    * WITHOUT rebuilding it: rows of deleted/updated docs are dropped
    * (one anti join on the doc id — the changelog is small relative to
    * the corpus, so the join broadcasts and the index never shuffles),
    * fresh rows for updated/inserted docs are computed from the
    * changelog texts alone, and the result lands at `newDir` — the
    * immutable-snapshot idiom: at 100 TB you never rewrite an index in
    * place, you publish its successor and flip readers over.
    * `changelog`: (opCol ∈ D/U/I, idCol, textCol — text may be null
    * for D). Same hash family as the base index by construction. */
  def compactMinhashIndex(spark: org.apache.spark.sql.SparkSession,
                          oldDir: String, changelog: DataFrame,
                          textCol: String, idCol: String, opCol: String,
                          newDir: String, shingleWords: Int = 3,
                          numHashes: Int = 24, bands: Int = 6): Unit = {
    val old = spark.read.parquet(oldDir)
    val touched = changelog.filter(col(opCol).isin("D", "U"))
      .select(col(idCol)).distinct()
    val kept = old.join(touched, Seq(idCol), "left_anti")
    val fresh = minhashIndexRows(
      changelog.filter(col(opCol).isin("U", "I"))
        .select(col(idCol), col(textCol)),
      textCol, idCol, shingleWords, numHashes, bands)
    kept.unionByName(fresh).write.mode("overwrite").parquet(newDir)
  }

  /** Probe a [[writeMinhashIndex]] index with a new shard: LSH
    * candidates from shared (band, band-hash) buckets, exact-verified
    * by Jaccard over the stored shingle-hash sets — the emitted
    * decisions are exact, the approximate tier only generates
    * candidates (the q42 shape, so the same oracle style gates it).
    * Same hash family as the index writer by construction. Returns
    * (idNew, idCorpus, jaccard ≥ threshold) pairs. */
  def probeMinhashIndex(spark: org.apache.spark.sql.SparkSession,
                        dir: String, newDocs: DataFrame, textCol: String,
                        idCol: String, threshold: Double,
                        shingleWords: Int = 3, numHashes: Int = 24,
                        bands: Int = 6): DataFrame =
    probeMinhashIndexFrame(spark.read.parquet(dir), newDocs, textCol,
      idCol, threshold, shingleWords, numHashes, bands)

  /** [[probeMinhashIndex]] over an already-read index frame — repeat
    * probers (the streaming gate probes once per micro-batch) pay the
    * directory listing and schema read once instead of per call. */
  def probeMinhashIndexFrame(index: DataFrame, newDocs: DataFrame,
                             textCol: String, idCol: String,
                             threshold: Double, shingleWords: Int = 3,
                             numHashes: Int = 24,
                             bands: Int = 6): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    val probe = newDocs
      .select(col(idCol), whitespaceTokens(col(textCol)).as("_tks"))
      .select(col(idCol),
        array_distinct(wordShingles(col("_tks"), shingleWords)).as("_shd"))
      .filter(size(col("_shd")) > 0)
      .select(col(idCol),
        transform(col("_shd"), s => xxhash64(s)).as("_shh"),
        minhashSignature(col("_shd"), numHashes).as("_sig"))
      .select(col(idCol).as("idNew"), col("_shh").as("_shhNew"),
        posexplode(bandKeys(col("_sig"), bands, rows)).as(Seq("_band", "_bhash")))
    probe.join(index, Seq("_band", "_bhash"))
      .select(col("idNew"), col(idCol).as("idCorpus"),
        col("_shhNew"), col("_shh"))
      // one verification per candidate pair, not per shared band (the
      // carried arrays are identical for a given pair, so which row
      // survives is immaterial)
      .dropDuplicates("idNew", "idCorpus")
      .withColumn("jaccard", jaccard(col("_shhNew"), col("_shh")))
      .filter(col("jaccard") >= threshold)
      .select(col("idNew"), col("idCorpus"), col("jaccard"))
  }

  /** Line-level boilerplate dedup (the RefinedWeb/CCNet recipe): a
    * "line" that recurs across `minDocs` DISTINCT documents is
    * near-certainly template chrome (nav bars, cookie banners, license
    * footers), not content — every occurrence is removed and each
    * document reassembled from its surviving lines in original order.
    *
    * `lines` supplies the decomposition (an array<string> expression
    * over the doc row), so the caller owns the notion of "line": real
    * corpora pass `split(col("text"), "\n")`; the q97 fixture (whose
    * synthetic docs have no newlines) chunks whitespace tokens.
    *
    * Shuffle shape at 100 TB: the census groups on the 8-byte
    * xxhash64 of each line (line bodies never shuffle for counting —
    * the q41 collision-tolerance argument, ~n²/2⁶⁵); removal,
    * counting, and reassembly then FUSE into one groupBy over the
    * boiler-marked exploded lines (collect_list skips the nulls the
    * boiler mark produces), so the source is scanned exactly twice
    * (census + rebuild) and the one body-moving exchange is the
    * per-doc reassembly — inherent, since the output IS the rewritten
    * bodies; its state is doc-bounded.
    *
    * Docs whose `lines` decomposition is EMPTY are absent from the
    * output (they produce no exploded rows — nothing to clean). NULL
    * elements in the decomposition are ignored entirely — they carry
    * no text, all nulls would otherwise collide on xxhash64's seed as
    * one phantom "line", and array_join would drop them from
    * `cleaned` while n_lines still counted them. */
  /** Corpus-LEVEL overlap, exact tier — the dataset-versioning
    * diagnostic in front of doc-level dedup: how much of snapshot B's
    * shingle vocabulary is already in snapshot A (a re-crawl that is
    * 95%-contained in last month's is not worth reprocessing; an
    * eval-set corpus highly contained in the training corpus is a
    * leak). One row: distinct word-`k`-shingle counts per side, the
    * common count, and Jaccard/containment as parts-per-1e8 integers
    * (the termDrift convention — replayable DIV, no float ratios).
    *
    * Scale shape: each side collapses to its DISTINCT 8-byte shingle
    * hashes (map-side-combined — occurrences never shuffle, the q44
    * posting idiom), the union exchanges once on the hash, and the
    * flags aggregate to a single row. Bodies never cross; the wide
    * state is bounded by distinct shingles, not corpus size. Counting
    * hashes instead of strings is the q113 collision-freeness
    * contract (the oracle counts raw strings). */
  def corpusOverlap(docsA: DataFrame, docsB: DataFrame, textCol: String,
                    k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    def hashes(d: DataFrame, flag: String) = d
      .select(explode(wordShingles(whitespaceTokens(col(textCol)), k))
        .as("_s"))
      .select(xxhash64(col("_s")).as("_h")).distinct()
      .select(col("_h"), lit(1L).as(flag))
    hashes(docsA, "_ina").withColumn("_inb", lit(0L))
      .unionByName(hashes(docsB, "_inb").withColumn("_ina", lit(0L)))
      .groupBy(col("_h"))
      .agg(max(col("_ina")).as("_a"), max(col("_inb")).as("_b"))
      .agg(sum(col("_a")).as("_na"), sum(col("_b")).as("_nb"),
        sum(col("_a") * col("_b")).as("_c"), count(lit(1)).as("_u"))
      .select(
        coalesce(col("_na"), lit(0L)).as("shingles_a"),
        coalesce(col("_nb"), lit(0L)).as("shingles_b"),
        coalesce(col("_c"), lit(0L)).as("common"),
        when(coalesce(col("_u"), lit(0L)) === 0L, lit(0L))
          .otherwise(expr("(_c * 100000000L) div _u")).as("jaccard8"),
        when(coalesce(col("_na"), lit(0L)) === 0L, lit(0L))
          .otherwise(expr("(_c * 100000000L) div _na")).as("contain_a8"),
        when(coalesce(col("_nb"), lit(0L)) === 0L, lit(0L))
          .otherwise(expr("(_c * 100000000L) div _nb")).as("contain_b8"))
  }

  /** Sketch tier of [[corpusOverlap]]: each side collapses to a
    * `numHashes`-slot corpus MinHash signature (slot i = min over the
    * side's shingles of a 64-bit md5-family hash), and the matching-
    * slot fraction estimates the Jaccard — the classic single-set
    * MinHash estimator lifted to whole corpora, for the recurring
    * monitoring probe where the exact tier's distinct-shingle exchange
    * is not worth paying. md5 keyed by slot (the q43 hash-family
    * trick) so an engine with md5 replays the signatures bit-for-bit;
    * estimator resolution is 1/numHashes, gated exactly by the oracle.
    *
    * Scale shape: per-doc signatures are narrow HOF work; what
    * shuffles is docs × numHashes fixed-width (slot, min) tuples,
    * map-side-combined down to numHashes rows per side before the
    * slot join. An empty side yields matches = 0, estimate 0 — one
    * output row always. */
  def corpusOverlapSketch(docsA: DataFrame, docsB: DataFrame,
                          textCol: String, k: Int = 3,
                          numHashes: Int = 64): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(numHashes >= 1 && numHashes <= 1024,
      s"numHashes must be in [1, 1024], got $numHashes")
    // numHashes minhash folds per doc — spread a narrow scan so the
    // signature pass doesn't run in one task (r13). No empty-shingle
    // pre-filter: a `size(_sh) > 0` filter here gets pushed through
    // the projection AND the spread exchange, so the whole shingle
    // build ran TWICE per doc — once inside the single-task scan
    // stage (defeating the spread) and again above it (r17; guide
    // §4.4's duplicated-expression hazard, built-in-expression
    // flavor). Shingle-less docs instead contribute NULL slot mins,
    // which `min` ignores — and a side with ONLY such docs still
    // yields matches = 0 (NULL = NULL is never TRUE), so the output
    // is unchanged in every case.
    def sig(d: DataFrame) = DatasetOps.spreadToCores(d)
      .select(wordShingles(whitespaceTokens(col(textCol)), k).as("_sh"))
      .select(posexplode(transform(sequence(lit(0), lit(numHashes - 1)),
        i => array_min(transform(col("_sh"),
          s => md5Hash64(concat_ws(":", i, s)))))).as(Seq("_i", "_v")))
      .groupBy(col("_i")).agg(min(col("_v")).as("_m"))
    sig(docsA).withColumnRenamed("_m", "_ma")
      .join(sig(docsB).withColumnRenamed("_m", "_mb"), Seq("_i"))
      .agg(coalesce(sum(when(col("_ma") === col("_mb"), 1L)
        .otherwise(0L)), lit(0L)).as("matches"))
      .select(col("matches"), lit(numHashes.toLong).as("num_hashes"),
        expr(s"(matches * 100000000L) div ${numHashes}L").as("jaccard_est8"))
  }

  def removeBoilerplateLines(docs: DataFrame, idCol: String, lines: Column,
                             minDocs: Int, sep: String = "\n"): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val exploded = docs
      .select(col(idCol), posexplode(lines).as(Seq("_pos", "_line")))
      .filter(col("_line").isNotNull)
      .withColumn("_lh", xxhash64(col("_line")))
    val boiler = exploded.groupBy(col("_lh"))
      .agg(countDistinct(col(idCol)).as("_nd"))
      .filter(col("_nd") >= minDocs)
      .select(col("_lh"), lit(1).as("_b"))
    exploded.join(boiler, Seq("_lh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lines"),
        count(col("_b")).as("n_removed"),
        array_join(transform(
          array_sort(collect_list(when(col("_b").isNull,
            struct(col("_pos"), col("_line"))))),
          s => s.getField("_line")), sep).as("cleaned"))
      .select(col(idCol), col("n_lines"), col("n_removed"), col("cleaned"))
  }

  /** Quality-aware duplicate-cluster resolution: keep the BEST-scoring
    * member of each connected near-dup cluster instead of the
    * smallest-id one — the production resolution rule ("keep the
    * longest / highest-quality copy") that keep-first silently gets
    * wrong whenever the first copy is the truncated one. Clusters are
    * [[clusterReps]]' transitive closure of `pairs`; the winner is the
    * max `scoreCol`, ties broken toward the SMALLEST id (so with a
    * constant score this degrades to exactly keep-first).
    *
    * Scale shape: the argmax is ONE map-side-combined groupBy on the
    * cluster rep — `max(struct(score, −id))`, never a per-cluster
    * window or sort — followed by an equi-join back on the rep; both
    * shuffles key on cluster ids, whose cardinality ≈ the corpus
    * (singletons dominate), so no key concentrates. `idCol` must be
    * numeric (the tie-break negates it).
    *
    * @return one row per input row: (idCol, cluster_rep, kept). */
  def keepBestPerCluster(df: DataFrame, idCol: String, scoreCol: String,
                         pairs: DataFrame, aCol: String = "idA",
                         bCol: String = "idB",
                         checkpointPairs: Boolean = true): DataFrame = {
    val reps = clusterReps(pairs, aCol, bCol,
      checkpointPairs = checkpointPairs)
    val withC = df.select(col(idCol), col(scoreCol))
      .join(reps.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), col(scoreCol),
        coalesce(col("rep"), col(idCol)).as("cluster_rep"))
    val best = withC.groupBy(col("cluster_rep"))
      .agg(max(struct(col(scoreCol).as("_s"),
        (col(idCol) * lit(-1)).as("_negid"), col(idCol).as("_id")))
        .as("_b"))
      .select(col("cluster_rep"), col("_b._id").as("_best_id"))
    withC.join(best, Seq("cluster_rep"))
      .select(col(idCol), col("cluster_rep"),
        (col(idCol) === col("_best_id")).as("kept"))
  }

  /** Content-defined chunking (the FastCDC/rsync idea in replayable
    * form): split a text into variable-size chunks whose BOUNDARIES
    * depend only on local content — a rolling `window`-char hash, cut
    * where it lands in the zero residue class mod `avgMask`+1 — so an
    * insertion early in a document moves ONE chunk's boundary, not
    * every downstream boundary the way fixed-width blocks would. That
    * is the property that makes block-level dedup across near-copies
    * work: shared boilerplate lands in IDENTICAL chunks regardless of
    * its byte offset, independent of line structure (the seam
    * [[removeBoilerplateLines]] needs and mid-line templating
    * defeats). Default geometry: 16-char window, 1/64 cut probability
    * → ~64-char expected chunks.
    *
    * Boundary hash is a TRUE rolling polynomial hash — `h_i =
    * (h_{i-1}·B + c_i − c_{i−w}·B^w) mod M` over the char codes, one
    * incremental fold across the text (O(len) integer ops per doc;
    * the first cut of this operator hashed md5 over every window —
    * O(len) md5 CALLS per doc — and was the whole bench's slowest row
    * at 16.5 s for sf0.1). The oracle replays each window's
    * polynomial sum directly (`Σ c_j·B^{w−1−j} mod M` — same residue
    * as the incremental form by construction), so boundaries still
    * gate bit-exactly. Char codes come from per-char `ascii()` —
    * byte-exact cross-engine for ASCII corpora (the [[Bpe]] contract;
    * non-ASCII text still chunks deterministically, only the oracle's
    * code-point view could differ). Texts shorter
    * than `window` form one chunk; empty/null texts yield an empty
    * array (null-degrade). Chunks concatenate back to the text by
    * construction (boundaries partition [0, len)).
    *
    * SCALE CONTRACT (the [[graft.functions.TextFunctions.tokenChunks]]
    * discipline): `codes` and `ends` MUST be projected attributes at
    * their consumption sites — Catalyst neither CSEs inside lambdas
    * nor across references, so an inlined `codes` subtree would be
    * re-evaluated once PER FOLD STEP (O(len²) per doc — measured as a
    * multi-minute hang at sf0.1 before this split). [[cdcChunks]] is
    * the one-Column convenience composition for specs/small frames;
    * corpus-scale callers stage three projections:
    * {{{
    *   .withColumn("codes", Dedup.cdcCodes(col("text")))
    *   .withColumn("ends", Dedup.cdcBoundaries(col("codes"), length(col("text"))))
    *   .select(explode(Dedup.cdcChunksAt(col("text"), col("ends"))))
    * }}} */
  def cdcChunks(text: Column, window: Int = 16,
                avgMask: Int = 63): Column =
    cdcChunksAt(text, cdcBoundaries(cdcCodes(text), length(text),
      window, avgMask))

  /** Per-char code array for [[cdcBoundaries]] — project it. */
  def cdcCodes(text: Column): Column =
    transform(split(text, ""), c => ascii(c).cast(LongType))

  /** Cut positions (chunk END offsets, ascending, final `len`
    * included) from a PROJECTED code array: one O(len) incremental
    * fold per doc maintaining (rolling hash, hits). */
  def cdcBoundaries(codes: Column, len: Column, window: Int = 16,
                    avgMask: Int = 63): Column = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(avgMask >= 1, s"avgMask must be >= 1, got $avgMask")
    val M = 1000000007L
    val B = 131L
    val bw = BigInt(B).modPow(window, BigInt(M)).toLong
    // h_i covers the window ending at i once i ≥ window; cuts are the
    // zero residue class mod avgMask+1 — appends stay ascending, so
    // the result needs no sort
    val hits = when(len >= window,
      aggregate(
        sequence(lit(1), len),
        struct(lit(0L).as("h"),
          array().cast("array<int>").as("hits")),
        (acc, i) => {
          val cIn = element_at(codes, i)
          val cOut = when(i > window, element_at(codes, i - window))
            .otherwise(lit(0L))
          val h2 = pmod(acc.getField("h") * B + cIn - cOut * bw, lit(M))
          struct(h2.as("h"),
            when(i >= window && h2 % (avgMask + 1) === 0,
              concat(acc.getField("hits"), array(i)))
              .otherwise(acc.getField("hits")).as("hits"))
        },
        acc => acc.getField("hits")))
      .otherwise(array().cast("array<int>"))
    array_distinct(concat(hits,
      when(len > 0, array(len)).otherwise(array().cast("array<int>"))))
  }

  /** Chunks from a PROJECTED `ends` array: starts = 0 :: ends-without-
    * last; slicing the 0-prefixed bounds to ends' size pairs them off
    * (both empty for an empty text — zip_with then yields the empty
    * array, no special case). */
  def cdcChunksAt(text: Column, ends: Column): Column = {
    val starts = slice(concat(array(lit(0)), ends), lit(1), size(ends))
    zip_with(starts, ends, (st, en) => text.substr(st + 1, en - st))
  }

  /** Duplicate-SPAN mining — exact-substring dedup at sub-document
    * granularity (the Lee et al. 2022 "Deduplicating Training Data
    * Makes Language Models Better" shape, re-expressed relationally):
    * a position is duplicated when its k-char gram occurs at some
    * OTHER corpus location, the FIRST occurrence of each gram (min
    * (id, pos) — the paper's keep-one copy) stays unmarked, and
    * marked positions merge into maximal spans [[exciseSpans]] cuts
    * out. This is the tier between whole-doc dedup (q40/q54 — misses
    * every partial overlap) and CDC chunk dedup (q240 — a CENSUS of
    * duplicated blocks, not a rewrite): boilerplate headers, licence
    * blocks and quoted replies vanish while the unique remainder of
    * each document survives.
    *
    * Relational shape, 100 TB discipline:
    *  - grams are (id, pos, hash60) triples — bodies NEVER ride the
    *    gram exchange; the text column stays behind in the doc table
    *    and spans join back on the id;
    *  - keep-first is a groupBy(hash) census (`min(struct(id, pos))`)
    *    + an equi-join back, NOT a window over the hash — a
    *    boilerplate gram shared by 10⁷ docs would single-task a
    *    window partition, while the agg is map-side combined and the
    *    join AQE-skew-splittable (the BM25-df lesson, golden-plan
    *    pinned there);
    *  - interval merge is a per-DOC window (running max of span ends
    *    → group flag → prefix sum), bounded by one document's marked
    *    positions at any corpus size;
    *  - `sample` keeps only grams whose hash lands in ONE residue
    *    class of `sample` — CONTENT-keyed (the winnowing idea), never
    *    position-strided: the same gram is kept or dropped at every
    *    location, so copies at unaligned offsets still collide, which
    *    position striding would miss whenever the two offsets differ
    *    mod s. Exchange volume (the term that scales with corpus
    *    bytes — len·1 rows per doc at sample 1) drops s×; a
    *    duplicated run of g grams is missed with probability
    *    (1 − 1/s)^g — negligible for spans ≫ k — and detected span
    *    boundaries coarsen to the sampled grams' extents. This is the
    *    recall/volume knob a 100 TB pass turns (suffix arrays, the
    *    paper's tool, do not distribute; sampled sorted grams are the
    *    cluster-shaped equivalent).
    *
    * Hash = md5-prefix 60 bits (engine-portable, oracle-replayable —
    * the md5Draw discipline): collisions ~n²/2⁶¹ mark a false span,
    * the documented probabilistic contract exactDedup already carries
    * at 64 bits. `idCol` must be integral (the keep-first order).
    * Positions are 1-based CHARACTERS (both engines' substr
    * semantics); spans are inclusive [span_start, span_end].
    *
    * Keep-first rides a PACKED location key `id·2²² + pos` — a
    * `min(struct(id, pos))` is lexicographically identical but falls
    * out of HashAggregate into a sort aggregate (structs are not
    * mutable-buffer types), measured 10× slower on the gram census;
    * the long min stays codegen'd. Pack contract: doc ids < 2⁴¹ and
    * docs < 4 Mi chars (chunk longer docs first — q100's operator);
    * violations would corrupt only the keep-first ORDER, never span
    * detection.
    *
    * @return (idCol, span_start, span_end) — merged spans of length
    *         ≥ max(minSpan, k), disjoint per doc, sorted by caller.
    */
  def dupSpans(df: DataFrame, idCol: String, textCol: String,
               k: Int = 25, minSpan: Int = 0,
               sample: Int = 1): DataFrame = {
    require(k >= 8 && k <= 256, s"k must be in [8, 256], got $k")
    require(sample >= 1 && sample <= 1024,
      s"sample must be in [1, 1024], got $sample")
    val locs = df
      .select(col(idCol).cast(LongType).as("_id"), col(textCol).as("_t"))
      .where(col("_t").isNotNull && length(col("_t")) >= k)
      // the pack contract (scaladoc above) enforced LOUDLY (ADVICE
      // r11: a violating corpus would silently corrupt the keep-first
      // ORDER): one per-doc check before the explode — negative or
      // ≥ 2⁴¹ ids and ≥ 4 Mi-char docs raise instead of mis-packing
      .select(
        when(col("_id") < 0L || col("_id") >= lit(2199023255552L) ||
            length(col("_t")) >= lit(4194304),
          raise_error(concat(
            lit("dupSpans pack contract: doc id must be in [0, 2^41) " +
              "and doc length < 4194304 chars (chunk longer docs " +
              "first - q100's operator); got id="),
            col("_id"), lit(" len="), length(col("_t")))))
          .otherwise(col("_id")).as("_id"),
        col("_t"))
      // explicit pre-repartition before the row-multiplying explode
      // (the q44/LSH lesson, SURVEY §8.3): a single-file scan would
      // fan a corpus × len gram expansion out on one or two cores —
      // and the partition count must be EXPLICIT or AQE coalesces the
      // small pre-explode shuffle right back to one partition
      .repartition(df.sparkSession.conf
        .get("spark.sql.shuffle.partitions").toInt, col("_id"))
      .select(col("_id"), col("_t"),
        explode(sequence(lit(1L),
          (length(col("_t")) - (k - 1)).cast(LongType))).as("_pos"))
      .select(col("_id"), col("_pos"),
        conv(substring(md5(col("_t").substr(col("_pos").cast(IntegerType),
          lit(k))), 1, 15), 16, 10).cast(LongType).as("_h"))
      .where(col("_h") % lit(sample.toLong) === 0)
      .withColumn("_loc", col("_id") * lit(4194304L) + col("_pos"))
    // `locs` is deliberately derived TWICE (census + mark join), NOT
    // exchanged once and shared: an r17 A/B of the one-shuffle shape
    // (repartition(_h) reused by both consumers) benched q290 3.35 s
    // → 10.4 s and q295 5.2 s → 8.0 s at sf0.1 — the gram triples are
    // corpus-length-sized, so ONE hash exchange + SMJ sorts of them
    // costs far more than re-running the explode + md5 map-side,
    // while this shape shuffles only the map-combined census and
    // streams `locs` through the (AQE-broadcast) join back. Guide
    // §8's rule applied in reverse: here the per-row compute is the
    // cheap proxy and the triples are the payload — recompute, don't
    // move.
    val census = locs.groupBy(col("_h"))
      .agg(count(lit(1)).as("_cnt"), min(col("_loc")).as("_first"))
      .where(col("_cnt") > 1)
    val marked = locs.join(census, Seq("_h"))
      .where(col("_loc") =!= col("_first"))
      .select(col("_id"), col("_pos"))
    val w = Window.partitionBy(col("_id")).orderBy(col("_pos"))
    val prevMax = max(col("_pos") + (k - 1))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    marked
      .withColumn("_flag",
        when(col("_pos") > coalesce(prevMax, lit(-1L)), 1L).otherwise(0L))
      .withColumn("_gid", sum(col("_flag"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("_id"), col("_gid"))
      .agg(min(col("_pos")).as("span_start"),
        (max(col("_pos")) + (k - 1)).as("span_end"))
      .where(col("span_end") - col("span_start") + 1 >=
        math.max(minSpan, k).toLong)
      .select(col("_id").as(idCol), col("span_start"), col("span_end"))
  }

  /** Excise [[dupSpans]] spans from their documents: per doc the
    * disjoint spans sort into an array attribute and ONE ordered fold
    * concatenates the kept segments (between-span gaps + the tail) —
    * O(len) per doc, no re-tokenization, spans ride a doc-id join
    * while bodies stay in place. Docs with no spans pass through
    * verbatim (left join, `chars_removed = 0`); a doc that is one big
    * duplicate cleans to the empty string, which downstream length
    * gates then drop — excision never deletes ROWS, that verdict
    * belongs to the quality tier.
    *
    * @return df + `clean_text` (textCol with spans removed) +
    *         `chars_removed`.
    */
  def exciseSpans(df: DataFrame, spans: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    val sp = spans.groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("span_start").as("s"),
        col("span_end").as("e")))).as("_spans"),
        sum(col("span_end") - col("span_start") + 1).as("_removed"))
    df.join(sp, Seq(idCol), "left")
      .withColumn("clean_text",
        when(col("_spans").isNull, col(textCol)).otherwise(
          aggregate(col("_spans"),
            struct(lit(0L).as("last"), lit("").as("acc")),
            (st, x) => struct(
              x.getField("e").as("last"),
              concat(st.getField("acc"),
                col(textCol).substr(
                  (st.getField("last") + 1).cast(IntegerType),
                  (x.getField("s") - st.getField("last") - 1)
                    .cast(IntegerType))).as("acc")),
            st => concat(st.getField("acc"),
              col(textCol).substr(
                (st.getField("last") + 1).cast(IntegerType),
                (length(col(textCol)) - st.getField("last"))
                  .cast(IntegerType))))))
      .withColumn("chars_removed", coalesce(col("_removed"), lit(0L)))
      .drop("_spans", "_removed")
  }
}
