package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import graft.operators.{DatasetOps, Dedup, Multimodal, Similarity}
import graft.sources.Tables

/** Persisted-index ingest/probe/compaction and selection queries (q106-q143 region) — one section of the [[LlmOps]] registry, split from the
  * single 3.8k-line file along its section comments (VERDICT r9 item
  * 4; no behavior change). The self-type gives every section
  * unqualified access to the shared helpers and to sibling sections'
  * materialized artifacts, exactly as when all sections shared one
  * object body. */
private[queries] trait LlmOpsIndexes { this: LlmOps.type =>

  // ---- q106: incremental near-dup ingest against a persisted index ----
  // The near-dup twin of q67: new docs are probed against the
  // PERSISTED MinHash index of the already-ingested corpus (written
  // once, probed by every arriving shard — corpus bodies are never
  // re-read). Emitted decisions are exact-verified (q42's shape), so
  // the oracle enumerates the full exact cross-pair set: any recall
  // loss in the index/probe machinery flips the row red.

  private[queries] val idxDirByInput = new graft.sources.JvmMemo[String]
  private[queries] def minhashIndexMaterialized(s: SparkSession, d: String): String =
    materializedTempDir(idxDirByInput, d, "graft_mhidx_") { out =>
      Dedup.writeMinhashIndex(
        docs(s, d).filter(col("doc_id") % 3 =!= 0), "text", "doc_id", out)
    }

  /** The probe census q106 and q108 share — "same probe, different
    * index snapshot" is exactly their relationship: the %3==0 shard
    * probes `dir`, and every probe doc gets its verdict row. */
  private[queries] def nearDupCensus(s: SparkSession, d: String, dir: String): DataFrame = {
    val probe = docs(s, d).filter(col("doc_id") % 3 === 0)
    val pairs = Dedup.probeMinhashIndex(s, dir, probe, "text", "doc_id",
      threshold = 0.5)
    val stats = pairs.groupBy(col("idNew").as("doc_id"))
      .agg(count(lit(1)).as("n_near_dups"),
        min(col("idCorpus")).as("nearest_corpus"))
    probe.select(col("doc_id"))
      .join(stats, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_near_dups"), lit(0L)).as("n_near_dups"),
        col("nearest_corpus"),
        col("n_near_dups").isNull.as("is_new"))
      .orderBy(col("doc_id"))
  }

  private[queries] val q106 = GraftQuery(
    "q106_incremental_neardup",
    (s, d) => nearDupCensus(s, d, minhashIndexMaterialized(s, d)),
    Some("""WITH toks AS (
        SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
            t -> len(t) > 0) AS tk
        FROM documents),
      sh AS (
        SELECT doc_id,
          CASE WHEN len(tk) >= 3
            THEN list_distinct(list_transform(
              generate_series(1, len(tk) - 2),
              i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2]))
            ELSE [] END AS sh
        FROM toks),
      pairs AS (
        SELECT p.doc_id AS idn, c.doc_id AS idc
        FROM sh p JOIN sh c ON p.doc_id % 3 = 0 AND c.doc_id % 3 <> 0
        WHERE len(p.sh) > 0 AND len(c.sh) > 0
          AND len(list_intersect(p.sh, c.sh)) * 1.0 /
              len(list_distinct(list_concat(p.sh, c.sh))) >= 0.5),
      stats AS (
        SELECT idn, count(*) AS n_near_dups, min(idc) AS nearest_corpus
        FROM pairs GROUP BY idn)
      SELECT d.doc_id, coalesce(s.n_near_dups, 0) AS n_near_dups,
        s.nearest_corpus, s.n_near_dups IS NULL AS is_new
      FROM documents d LEFT JOIN stats s ON d.doc_id = s.idn
      WHERE d.doc_id % 3 = 0
      ORDER BY d.doc_id"""))

  // ---- q107: persisted IVF index probe --------------------------------
  // The embedding twin of q106: the corpus's IVF index is WRITTEN once
  // (cell-assigned vectors hive-partitioned by cell + the centroid
  // table), then query batches probe it — dynamic partition pruning
  // confines each probe scan to its nProbe winning cell directories
  // (PlanSpec pins the pruning subquery). Same md5-derived centroid
  // family as q55, so the oracle replays assignment, probe ranking and
  // the within-cell top-8 end to end; any drift introduced by the disk
  // round-trip (cell typing, partition discovery, score rounding)
  // flips the row hash red.

  private[queries] val ivfDirByInput = new graft.sources.JvmMemo[String]
  private[queries] def ivfIndexMaterialized(s: SparkSession, d: String): String =
    materializedTempDir(ivfDirByInput, d, "graft_ivfidx_") { out =>
      Similarity.writeIvfIndex(candVecs(s, d), out, md5Vectors(16, 64, "cent"))
    }

  private[queries] val q107 = GraftQuery(
    "q107_ivf_index_probe",
    (s, d) => {
      val dir = ivfIndexMaterialized(s, d)
      Similarity.probeIvfIndex(s, dir, queryVecs(s, d), k = 8, nProbe = 3)
        .orderBy(col("qid"), col("rank"))
    },
    Some(ivfProbeOracleSql))

  /** q107's full-replay oracle (assignment, probe ranking, within-cell
    * top-8 rebuilt in SQL) — shared verbatim by the SQL-door probe
    * q236: the ivf_search TVF must rank exactly like the library call
    * it wraps. */
  private[queries] lazy val ivfProbeOracleSql: String = """WITH cents AS (
        SELECT c.c AS c, list(
            CAST(concat('0x', substring(md5('cent:'||c.c||':'||d.d), 1, 8)) AS BIGINT)
              / 4294967296.0 * 2 - 1 ORDER BY d.d) AS cv
        FROM generate_series(0, 15) c(c), generate_series(0, 63) d(d)
        GROUP BY c.c),
      vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      ranked AS (
        SELECT vec_id, v, c,
          row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, c) AS rn
        FROM (SELECT t.vec_id, t.v, k.c,
                list_dot_product(t.v, k.cv) /
                  (sqrt(list_dot_product(t.v, t.v)) *
                   sqrt(list_dot_product(k.cv, k.cv))) AS sim
              FROM vecs t CROSS JOIN cents k)),
      cells AS (SELECT vec_id, v, c AS cell FROM ranked WHERE rn = 1),
      probes AS (
        SELECT vec_id AS qid, v AS qv, c AS cell
        FROM ranked WHERE rn <= 3 AND vec_id < 10),
      scored AS (
        SELECT p.qid, ce.vec_id AS cid,
          round(list_dot_product(p.qv, ce.v) /
            (sqrt(list_dot_product(p.qv, p.qv)) *
             sqrt(list_dot_product(ce.v, ce.v))), 6) AS sim
        FROM probes p JOIN cells ce ON ce.cell = p.cell AND ce.vec_id <> p.qid)
      SELECT qid, rank, cid, sim FROM (
        SELECT qid, cid, sim,
          row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank
        FROM scored) t
      WHERE rank <= 8 ORDER BY qid, rank"""

  // ---- q236: ivf_search TVF — the SQL door to the stored IVF index ----
  // pq_search's sibling (VERDICT r9 Missing #2): the IDENTICAL stored
  // index q107 probes, reached as
  // `ivf_search('<dir>', 'ivf_queries_sql', 8, 3)` — centroids + cell
  // partitions read from disk by the TVF's probeIvfIndex call (same
  // DPP-pruned scan), query vectors from a registered temp view. The
  // oracle is q107's full replay verbatim.

  private[queries] val q236 = GraftQuery(
    "q236_ivf_search_sql",
    (s, d) => {
      val dir = ivfIndexMaterialized(s, d)
      queryVecs(s, d).createOrReplaceTempView("ivf_queries_sql")
      s.sql(s"SELECT * FROM ivf_search('$dir', 'ivf_queries_sql', 8, 3) " +
        "ORDER BY qid, rank")
    },
    Some(ivfProbeOracleSql))


  // ---- q108: near-dup index maintenance under a CDC changelog ---------
  // q91 (changelog merge) meets q106 (persisted near-dup index): the
  // corpus evolves — docs deleted, docs updated in place, new docs
  // inserted — and the MinHash index is COMPACTED to its successor
  // snapshot instead of rebuilt (deleted/updated rows anti-joined out,
  // fresh rows computed from the changelog texts alone). The probe
  // census then runs against the new snapshot; the oracle rebuilds the
  // post-changelog corpus in SQL and replays the full exact cross-pair
  // set, so a stale row surviving compaction (a deleted doc still
  // matching) or a lost fresh row (an inserted clone not matching)
  // flips the hash red.

  private[queries] val cmpDirByInput = new graft.sources.JvmMemo[String]
  private[queries] def compactedIndexMaterialized(s: SparkSession, d: String): String =
    materializedTempDir(cmpDirByInput, d, "graft_mhcmp_") { out =>
      val oldDir = minhashIndexMaterialized(s, d)
      val corpus = docs(s, d).filter(col("doc_id") % 3 =!= 0)
      val dels = corpus.filter(col("doc_id") % 9 === 1)
        .select(lit("D").as("op"), col("doc_id"),
          lit(null).cast("string").as("text"))
      val upds = corpus.filter(col("doc_id") % 9 === 4)
        .select(lit("U").as("op"), col("doc_id"),
          concat(lit("replaced content placeholder "),
            col("doc_id").cast("string")).as("text"))
      val ins = docs(s, d).filter(col("doc_id") % 6 === 0)
        .select(lit("I").as("op"), (col("doc_id") + 1000000L).as("doc_id"),
          col("text"))
      Dedup.compactMinhashIndex(s, oldDir,
        dels.unionByName(upds).unionByName(ins),
        "text", "doc_id", "op", out)
    }

  private[queries] val q108 = GraftQuery(
    "q108_index_compaction",
    (s, d) => nearDupCensus(s, d, compactedIndexMaterialized(s, d)),
    Some("""WITH corpus AS (
        SELECT doc_id, text FROM documents
        WHERE doc_id % 3 <> 0 AND doc_id % 9 NOT IN (1, 4)
        UNION ALL
        SELECT doc_id,
          'replaced content placeholder ' || CAST(doc_id AS VARCHAR)
        FROM documents WHERE doc_id % 3 <> 0 AND doc_id % 9 = 4
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 6 = 0),
      ctoks AS (
        SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
            t -> len(t) > 0) AS tk
        FROM corpus),
      csh AS (
        SELECT doc_id,
          CASE WHEN len(tk) >= 3
            THEN list_distinct(list_transform(
              generate_series(1, len(tk) - 2),
              i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2]))
            ELSE [] END AS sh
        FROM ctoks),
      ptoks AS (
        SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
            t -> len(t) > 0) AS tk
        FROM documents WHERE doc_id % 3 = 0),
      psh AS (
        SELECT doc_id,
          CASE WHEN len(tk) >= 3
            THEN list_distinct(list_transform(
              generate_series(1, len(tk) - 2),
              i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2]))
            ELSE [] END AS sh
        FROM ptoks),
      pairs AS (
        SELECT p.doc_id AS idn, c.doc_id AS idc
        FROM psh p JOIN csh c ON true
        WHERE len(p.sh) > 0 AND len(c.sh) > 0
          AND len(list_intersect(p.sh, c.sh)) * 1.0 /
              len(list_distinct(list_concat(p.sh, c.sh))) >= 0.5),
      stats AS (
        SELECT idn, count(*) AS n_near_dups, min(idc) AS nearest_corpus
        FROM pairs GROUP BY idn)
      SELECT d.doc_id, coalesce(s.n_near_dups, 0) AS n_near_dups,
        s.nearest_corpus, s.n_near_dups IS NULL AS is_new
      FROM documents d LEFT JOIN stats s ON d.doc_id = s.idn
      WHERE d.doc_id % 3 = 0
      ORDER BY d.doc_id"""))

  // ---- q137: IVF embedding index maintenance (CDC compaction) ---------
  // The q108/q128 pattern applied to the LAST index family without it
  // (VERDICT r6 missing item 1): the embedding corpus takes a D/U/I
  // changelog — vectors deleted, re-embedded in place (negated: a
  // deterministic re-embedding DuckDB replays exactly), inserted
  // (reversed: same norm, different cell) — and the persisted IVF
  // index is COMPACTED to its successor snapshot instead of rebuilt.
  // The verdict is the full q107 probe against the compacted
  // snapshot; the oracle rebuilds the post-changelog corpus in SQL
  // and replays assignment, probing and ranking from scratch with the
  // same md5 centroid family, so a stale surviving cell row (a
  // deleted vector still ranked), a lost fresh row, or a
  // wrongly-assigned update flips the hash red.

  private[queries] val ivfCmpDirByInput = new graft.sources.JvmMemo[String]
  private[queries] def ivfCompactedMaterialized(s: SparkSession, d: String): String =
    materializedTempDir(ivfCmpDirByInput, d, "graft_ivfcmp_") { out =>
      val oldDir = ivfIndexMaterialized(s, d)
      val e = candVecs(s, d)
      val del = e.filter(col("cid") % 13 === 0)
        .select(col("cid"), lit("D").as("op"),
          lit(null).cast("array<double>").as("cvec"))
      val upd = e.filter(col("cid") % 17 === 0 && col("cid") % 13 =!= 0)
        .select(col("cid"), lit("U").as("op"),
          transform(col("cvec"), x => -x).as("cvec"))
      val ins = e.filter(col("cid") % 19 === 0)
        .select((col("cid") + 1000000L).as("cid"), lit("I").as("op"),
          reverse(col("cvec")).as("cvec"))
      Similarity.compactIvfIndex(s, oldDir,
        del.unionByName(upd).unionByName(ins), out)
    }

  private[queries] val q137 = GraftQuery(
    "q137_ivf_compaction",
    (s, d) => {
      val dir = ivfCompactedMaterialized(s, d)
      Similarity.probeIvfIndex(s, dir, queryVecs(s, d), k = 8, nProbe = 3)
        .orderBy(col("qid"), col("rank"))
    },
    Some("""WITH cents AS (
        SELECT c.c AS c, list(
            CAST(concat('0x', substring(md5('cent:'||c.c||':'||d.d), 1, 8)) AS BIGINT)
              / 4294967296.0 * 2 - 1 ORDER BY d.d) AS cv
        FROM generate_series(0, 15) c(c), generate_series(0, 63) d(d)
        GROUP BY c.c),
      corpus2 AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        WHERE vec_id % 13 <> 0 AND vec_id % 17 <> 0
        UNION ALL
        SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]), x -> -x)
        FROM embeddings WHERE vec_id % 17 = 0 AND vec_id % 13 <> 0
        UNION ALL
        SELECT vec_id + 1000000, list_reverse(CAST(embedding AS DOUBLE[]))
        FROM embeddings WHERE vec_id % 19 = 0),
      cells AS (
        SELECT vec_id, v, c AS cell FROM (
          SELECT t.vec_id, t.v, k.c,
            row_number() OVER (PARTITION BY t.vec_id
              ORDER BY list_dot_product(t.v, k.cv) /
                (sqrt(list_dot_product(t.v, t.v)) *
                 sqrt(list_dot_product(k.cv, k.cv))) DESC, k.c) AS rn
          FROM corpus2 t CROSS JOIN cents k)
        WHERE rn = 1),
      q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id < 10),
      probes AS (
        SELECT vec_id AS qid, v AS qv, c AS cell FROM (
          SELECT t.vec_id, t.v, k.c,
            row_number() OVER (PARTITION BY t.vec_id
              ORDER BY list_dot_product(t.v, k.cv) /
                (sqrt(list_dot_product(t.v, t.v)) *
                 sqrt(list_dot_product(k.cv, k.cv))) DESC, k.c) AS rn
          FROM q t CROSS JOIN cents k)
        WHERE rn <= 3),
      scored AS (
        SELECT p.qid, ce.vec_id AS cid,
          round(list_dot_product(p.qv, ce.v) /
            (sqrt(list_dot_product(p.qv, p.qv)) *
             sqrt(list_dot_product(ce.v, ce.v))), 6) AS sim
        FROM probes p JOIN cells ce ON ce.cell = p.cell AND ce.vec_id <> p.qid)
      SELECT qid, rank, cid, sim FROM (
        SELECT qid, cid, sim,
          row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank
        FROM scored) t
      WHERE rank <= 8 ORDER BY qid, rank"""))

  // ---- q109: semantic dedup (the SemDeDup recipe) ---------------------
  // Cell-confined semantic deduplication: md5-derived centroids (the
  // q55 replay trick) assign every vector to a cell, the cosine pair
  // expansion runs within cells only (n²/k per cell — the SemDeDup
  // trade: cross-cell pairs are given up for a k-fold cheaper verify),
  // and the pair graph collapses to min-id representatives through the
  // same fixpoint q63 gates. Output is the per-cell census; the oracle
  // replays assignment, within-cell pairing, and reachability with a
  // recursive CTE, so drift in ANY stage (argmax tie-break, pair
  // confinement, label propagation) flips the hash red.

  // The (id, rep, cell) verdict is materialized once per (session,
  // dir), like the q53 pair table: the min-label fixpoint inside
  // semanticDedup is an iterative multi-job algorithm (~5s of barrier
  // rounds at sf0.1) that a second consumer — or Bench's second pass —
  // must not re-run; at 100 TB the cluster assignment is exactly the
  // product you land once and read columnar thereafter.
  private[queries] val semdedupDirByInput = new graft.sources.JvmMemo[String]
  private[queries] def semanticDedupMaterialized(s: SparkSession, d: String): DataFrame =
    s.read.parquet(
      materializedTempDir(semdedupDirByInput, d, "graft_semdedup_") {
        out =>
          import s.implicits._
          val centsDF = md5Vectors(16, 64, "cent").zipWithIndex
            .map { case (v, i) => (i, v) }.toDF("cell", "centroid")
          val vecs = emb(s, d)
            .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
          Similarity.semanticDedup(vecs, "vec_id", "v", centsDF, 0.4)
            .write.mode("overwrite").parquet(out)
      })

  private[queries] val q109 = GraftQuery(
    "q109_semantic_dedup",
    (s, d) => {
      semanticDedupMaterialized(s, d)
        .groupBy(col("cell").cast(LongType).as("cell"))
        .agg(count(lit(1)).as("n_vectors"),
          countDistinct(col("rep")).as("n_kept"),
          (count(lit(1)) - countDistinct(col("rep"))).as("n_dropped"))
        .orderBy(col("cell"))
    },
    Some("""WITH RECURSIVE cents AS (
        SELECT c.c AS c, list(
            CAST(concat('0x', substring(md5('cent:'||c.c||':'||d.d), 1, 8)) AS BIGINT)
              / 4294967296.0 * 2 - 1 ORDER BY d.d) AS cv
        FROM generate_series(0, 15) c(c), generate_series(0, 63) d(d)
        GROUP BY c.c),
      vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      ranked AS (
        SELECT vec_id, v, c,
          row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, c) AS rn
        FROM (SELECT t.vec_id, t.v, k.c,
                list_dot_product(t.v, k.cv) /
                  (sqrt(list_dot_product(t.v, t.v)) *
                   sqrt(list_dot_product(k.cv, k.cv))) AS sim
              FROM vecs t CROSS JOIN cents k)),
      cells AS (SELECT vec_id, v, c AS cell FROM ranked WHERE rn = 1),
      p AS (
        SELECT a.vec_id AS ida, b.vec_id AS idb
        FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE round(list_dot_product(a.v, b.v) /
            (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
            6) >= 0.4),
      sym AS (
        SELECT ida AS id, idb AS nbr FROM p
        UNION SELECT idb, ida FROM p),
      reach(id, lab) AS (
        SELECT vec_id, vec_id FROM embeddings
        UNION
        SELECT s.id, r.lab FROM sym s JOIN reach r ON r.id = s.nbr),
      labs AS (SELECT id, min(lab) AS rep FROM reach GROUP BY id)
      SELECT c.cell, count(*) AS n_vectors,
        count(DISTINCT l.rep) AS n_kept,
        count(*) - count(DISTINCT l.rep) AS n_dropped
      FROM cells c JOIN labs l ON l.id = c.vec_id
      GROUP BY c.cell ORDER BY c.cell"""))

  // ---- q110: adaptive quality gate (top-X% per language) --------------
  // The percentile form of quality filtering: q75's fixed floor keeps
  // "score ≥ c" regardless of how a language's corpus scores; this
  // keeps the TOP 30% of each language by its OWN distribution (the
  // FineWeb/Gopher policy — a fixed floor tuned on English
  // over-prunes low-resource languages wholesale). Exact tier runs
  // here (rank + count windows, per-group k = ceil(n·frac), IEEE
  // replayed); the approx_percentile sketch tier is the one-pass
  // 100 TB path, spec-gated against this tier.

  private[queries] val q110 = GraftQuery(
    "q110_quality_gate",
    (s, d) => {
      val scored = docs(s, d)
        .select(col("doc_id"), col("lang"), qualityMetrics(col("text")).as("m"))
        .select(col("doc_id"), col("lang"),
          round(col("m.stopword_ratio") - col("m.punct_ratio"), 6).as("q_score"))
      DatasetOps.qualityGateExact(scored, "lang", "q_score", "doc_id", 0.3)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          min(col("q_score")).as("min_kept"),
          max(col("q_score")).as("max_kept"))
        .orderBy(col("lang"))
    },
    Some("""WITH m AS (
        SELECT doc_id, lang,
          round((length(text) - length(regexp_replace(text,
            '[.,;:!?''"()\-]', '', 'g'))) / greatest(length(text), 1), 6)
            AS punct_ratio,
          round(len(list_filter(list_filter(
              regexp_split_to_array(lower(text), '\s+'), x -> length(x) > 0),
              t -> list_contains(['the','a','an','and','or','of','in','to',
                'is','it','that','for','on','with','as'], t)))
            / greatest(len(list_filter(regexp_split_to_array(lower(text),
                '\s+'), x -> length(x) > 0)), 1), 6) AS stopword_ratio
        FROM documents),
      sc AS (
        SELECT doc_id, lang,
          round(stopword_ratio - punct_ratio, 6) AS q_score
        FROM m),
      rk AS (
        SELECT doc_id, lang, q_score,
          row_number() OVER (PARTITION BY lang ORDER BY q_score DESC, doc_id)
            AS rk,
          count(*) OVER (PARTITION BY lang) AS n
        FROM sc)
      SELECT lang, count(*) AS n_kept,
        min(q_score) AS min_kept, max(q_score) AS max_kept
      FROM rk WHERE rk <= ceil(n * 0.3)
      GROUP BY lang ORDER BY lang"""))

  // ---- q111: the SQL surface for the quality gate ---------------------
  // The q104/q105 pattern over q110's operator: the scored corpus is a
  // temp view, the gate runs as the injected `quality_gate` TVF from
  // pure SQL text, and the census hash-matches the SAME DuckDB oracle
  // as q110 — the TVF layer adds a parser path, not semantics.

  private[queries] val q111 = GraftQuery(
    "q111_sql_quality_gate",
    (s, d) => {
      docs(s, d)
        .select(col("doc_id"), col("lang"), qualityMetrics(col("text")).as("m"))
        .select(col("doc_id"), col("lang"),
          round(col("m.stopword_ratio") - col("m.punct_ratio"), 6).as("q_score"))
        .createOrReplaceTempView("graft_scored_docs")
      s.sql("""SELECT lang, count(*) AS n_kept,
          min(q_score) AS min_kept, max(q_score) AS max_kept
        FROM quality_gate('graft_scored_docs', 'lang', 'q_score', 'doc_id', 0.3)
        GROUP BY lang ORDER BY lang""")
    },
    q110.oracle)

  // ---- q112: unicode normalization (nfc_clean native expression) ------
  // Corpus text normalization as a codegen'd Catalyst expression:
  // C0/C1 control stripping (tab/newline/CR kept) THEN NFC canonical
  // composition (so `e`+U+0301 and `é` dedup/shingle identically) —
  // strip-first makes the operation idempotent (normalize-first
  // leaves a newly composable pair wherever a control separated a
  // base from its combining mark). Deliberately NFC, not NFKC —
  // compatibility folding is lossy and belongs to the tokenizer. The
  // fixture plants decomposed combining sequences, a BEL, a C1
  // control, and an NFC-STABLE ligature (U+FB01 must survive) on top
  // of real doc prefixes; DuckDB replays the same strip-then-normalize
  // order and the emitted strings hash-match byte-for-byte.

  private[queries] val q112 = GraftQuery(
    "q112_nfc_clean",
    (s, d) =>
      docs(s, d).filter(col("doc_id") < 100)
        .select(col("doc_id"),
          call_function("nfc_clean",
            concat(substring(col("text"), 1, 20),
              lit(" é Å tail x ﬁ end")))
            .as("cleaned"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
        nfc_normalize(regexp_replace(
          substring(text, 1, 20) ||
            ' ' || chr(101) || chr(769) || ' ' || chr(65) || chr(778) ||
            ' tail' || chr(7) || chr(156) || ' x ' || chr(64257) || ' end',
          '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F\x{0080}-\x{009F}]', '', 'g'))
          AS cleaned
      FROM documents WHERE doc_id < 100 ORDER BY doc_id"""))

  // ---- q113: cross-doc repeated-span masking ---------------------------
  // The finer-than-line dedup tier: 8-grams recurring across >=2 docs
  // mark their tokens, overlapping marks merge into maximal spans
  // (relational gaps-and-islands, not a per-doc fold), and each doc is
  // reassembled with the spans cut. The oracle replays the census on
  // raw gram STRINGS (hashing is Spark-side only — the q41 64-bit
  // collision tolerance), the island arithmetic, and the rebuilt text.

  private[queries] val q113 = GraftQuery(
    "q113_span_mask",
    (s, d) =>
      DatasetOps.maskRepeatedSpans(docs(s, d), "doc_id", "text", k = 8)
        .orderBy(col("doc_id")),
    Some("""WITH toks AS (
        SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
          x -> length(x) > 0) AS tk
        FROM documents),
      gi AS (
        SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 7)) AS i
        FROM toks),
      g AS (
        SELECT doc_id, i - 1 AS s, array_to_string(tk[i:i+7], ' ') AS gram
        FROM gi),
      rep AS (
        SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
      st AS (SELECT g.doc_id, g.s FROM g JOIN rep USING (gram)),
      isl AS (
        SELECT doc_id, s,
          CASE WHEN s > coalesce(max(s + 7) OVER (PARTITION BY doc_id
              ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            -2) + 1 THEN 1 ELSE 0 END AS brk
        FROM st),
      g2 AS (
        SELECT doc_id, s, sum(brk) OVER (PARTITION BY doc_id ORDER BY s
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM isl),
      iv AS (
        SELECT doc_id, min(s) AS lo, max(s) + 7 AS hi
        FROM g2 GROUP BY doc_id, island),
      ti AS (
        SELECT doc_id, tk, unnest(generate_series(1, len(tk))) AS i
        FROM toks),
      tok AS (SELECT doc_id, i - 1 AS idx, tk[i] AS tok FROM ti),
      msk AS (
        SELECT t.doc_id, t.idx, t.tok,
          max(CASE WHEN iv.lo IS NOT NULL THEN 1 ELSE 0 END) AS m
        FROM tok t LEFT JOIN iv
          ON t.doc_id = iv.doc_id AND t.idx BETWEEN iv.lo AND iv.hi
        GROUP BY t.doc_id, t.idx, t.tok),
      re AS (
        SELECT doc_id, count(*) AS n_tokens, CAST(sum(m) AS BIGINT) AS n_masked,
          coalesce(string_agg(CASE WHEN m = 0 THEN tok END, ' '
            ORDER BY idx), '') AS cleaned
        FROM msk GROUP BY doc_id)
      SELECT d.doc_id,
        CAST(coalesce(r.n_tokens, 0) AS BIGINT) AS n_tokens,
        CAST(coalesce(r.n_masked, 0) AS BIGINT) AS n_masked,
        coalesce(r.cleaned, '') AS cleaned
      FROM documents d LEFT JOIN re r USING (doc_id)
      ORDER BY d.doc_id"""))

  // q114: q113's operator reached from pure SQL text via the injected
  // mask_spans TVF — same DuckDB oracle, so the parser path adds no
  // semantics (the q104/q105 convention).
  private[queries] val q114 = GraftQuery(
    "q114_sql_mask_spans",
    (s, d) => {
      Tables.registerAllOnce(s, d)
      s.sql("""SELECT doc_id, n_tokens, n_masked, cleaned
        FROM mask_spans('documents', 'doc_id', 'text', 8)
        ORDER BY doc_id""")
    },
    q113.oracle)

  // ---- q115: deterministic per-source cap ------------------------------
  // Share capping ("at most 12 docs per source"): membership is the
  // smallest-12 md5 draws per group — reshuffle/append-stable and
  // unbiased by crawl order — ranked through the bounded-heap node
  // (no Window, PlanSpec-pinned). The oracle replays the draw and the
  // per-group row_number cut.

  private[queries] val q115 = GraftQuery(
    "q115_source_cap",
    (s, d) =>
      DatasetOps.capPerGroup(
          docs(s, d).select(col("doc_id"), col("source")),
          "source", "doc_id", n = 12)
        .orderBy(col("doc_id")),
    Some("""WITH t AS (
        SELECT doc_id, source,
          CAST(concat('0x', substring(md5('cap:'||doc_id), 1, 8)) AS BIGINT) AS u
        FROM documents),
      r AS (
        SELECT doc_id, source,
          row_number() OVER (PARTITION BY source ORDER BY u, doc_id) AS rn
        FROM t)
      SELECT doc_id, source FROM r WHERE rn <= 12 ORDER BY doc_id"""))

  // ---- q116: DSIR-shaped importance scoring ----------------------------
  // Data SELECTION after cleaning: every corpus doc scored by how much
  // its bigram profile resembles the src1 target sample relative to
  // the corpus's own background distribution. Integer-deterministic
  // ratio sums (the q101 10⁶-DIV convention) instead of float
  // log-ratios, so the oracle replays gram counts, smoothing, ratios
  // and the per-doc fold exactly; Spark counts 8-byte gram hashes,
  // the oracle raw gram strings — identical by xxhash64
  // collision-freeness at corpus scale (same contract as q113).

  private[queries] val q116 = GraftQuery(
    "q116_importance_score",
    (s, d) => {
      val dd = docs(s, d)
      DatasetOps.importanceScores(
          dd.filter(col("source") =!= "src1"),
          dd.filter(col("source") === "src1"),
          "doc_id", "text")
        .orderBy(col("doc_id"))
    },
    Some("""WITH toks AS (
        SELECT doc_id, source,
          list_filter(regexp_split_to_array(lower(text), '\s+'),
            x -> length(x) > 0) AS tk
        FROM documents),
      g AS (
        SELECT doc_id, source,
          unnest(list_transform(generate_series(1, len(tk) - 1),
            i -> tk[i] || ' ' || tk[i + 1])) AS gram
        FROM toks),
      tgt AS (
        SELECT gram, count(*) AS ct FROM g WHERE source = 'src1'
        GROUP BY gram),
      srcc AS (
        SELECT gram, count(*) AS cs FROM g WHERE source <> 'src1'
        GROUP BY gram),
      r AS (
        SELECT s.gram,
          (1000000 * (coalesce(t.ct, 0) + 1)) // (s.cs + 1) AS ratio
        FROM srcc s LEFT JOIN tgt t USING (gram)),
      sc AS (
        SELECT g.doc_id, count(*) AS n_grams, sum(r.ratio) AS score
        FROM g JOIN r ON g.gram = r.gram WHERE g.source <> 'src1'
        GROUP BY g.doc_id)
      SELECT d.doc_id,
        coalesce(s.n_grams, 0) AS n_grams,
        CAST(coalesce(s.score, 0) AS BIGINT) AS score,
        CASE WHEN coalesce(s.n_grams, 0) > 0
          THEN CAST(s.score // s.n_grams AS BIGINT) ELSE 0 END AS avg_ratio
      FROM documents d LEFT JOIN sc s USING (doc_id)
      WHERE d.source <> 'src1'
      ORDER BY d.doc_id"""))

  // ---- q117: length-bucketed batch assembly ----------------------------
  // Padding-efficient batching for docs that must not be concatenated:
  // power-of-two bucket (16..128), md5 in-bucket order, runs of 8 per
  // (bucket, shard) become batches. Bucket ladder, shard deal, rank,
  // batch and position are all integer arithmetic — replayed
  // bit-for-bit.

  private[queries] val q117 = GraftQuery(
    "q117_length_batches",
    (s, d) =>
      DatasetOps.lengthBucketBatches(docs(s, d), "doc_id",
          tokenCount(col("text")), batchSize = 8,
          minBucket = 16, maxBucket = 128, nShards = 4)
        .select(col("doc_id"), col("n_tokens"), col("bucket"),
          col("shard"), col("batch_idx"), col("pos"))
        .orderBy(col("doc_id")),
    Some("""WITH t AS (
        SELECT doc_id,
          len(list_filter(regexp_split_to_array(lower(text), '\s+'),
            x -> length(x) > 0)) AS n_tok,
          CAST(concat('0x', substring(md5('batch:'||doc_id), 1, 8)) AS BIGINT) AS u
        FROM documents),
      b AS (
        SELECT doc_id, n_tok, u,
          CASE WHEN n_tok <= 16 THEN 16 WHEN n_tok <= 32 THEN 32
               WHEN n_tok <= 64 THEN 64 ELSE 128 END AS bucket,
          u % 4 AS shard
        FROM t),
      r AS (
        SELECT doc_id, n_tok, bucket, shard,
          row_number() OVER (PARTITION BY bucket, shard ORDER BY u, doc_id)
            AS rn
        FROM b)
      SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
        CAST(bucket AS BIGINT) AS bucket,
        CAST(shard AS BIGINT) AS shard,
        CAST((rn - 1) // 8 AS BIGINT) AS batch_idx,
        CAST((rn - 1) % 8 AS BIGINT) AS pos
      FROM r ORDER BY doc_id"""))

  // q118/q119: q116's and q117's operators reached from pure SQL text
  // via the injected TVFs — same DuckDB oracles, so the parser path
  // adds no semantics (the q104/q105/q114 convention). The corpus/
  // target split rides temp views, the shape a SQL user would write.
  private[queries] val q118 = GraftQuery(
    "q118_sql_importance",
    (s, d) => {
      Tables.registerAllOnce(s, d)
      s.sql("""CREATE OR REPLACE TEMPORARY VIEW imp_corpus AS
        SELECT * FROM documents WHERE source <> 'src1'""")
      s.sql("""CREATE OR REPLACE TEMPORARY VIEW imp_target AS
        SELECT * FROM documents WHERE source = 'src1'""")
      s.sql("""SELECT doc_id, n_grams, score, avg_ratio
        FROM importance_score('imp_corpus', 'imp_target', 'doc_id', 'text')
        ORDER BY doc_id""")
    },
    q116.oracle)

  private[queries] val q119 = GraftQuery(
    "q119_sql_length_batches",
    (s, d) => {
      Tables.registerAllOnce(s, d)
      s.sql("""SELECT doc_id, n_tokens, bucket, shard, batch_idx, pos
        FROM length_batches('documents', 'doc_id', 'text', 8, 16, 128, 4)
        ORDER BY doc_id""")
    },
    q117.oracle)

  // ---- q120: mean-pooled group embeddings ------------------------------
  // The chunk→doc (here label→class-centroid) embedding aggregation:
  // element-wise means with DECIMAL per-component sums — exact and
  // order-independent, so partitioning, AQE merge order and retries
  // cannot move a ulp, and the oracle replays the identical decimal
  // fold. The query explodes the centroid so the gate hash-matches
  // every component, not an array blob.

  private[queries] val q120 = GraftQuery(
    "q120_mean_pool",
    (s, d) =>
      Similarity.meanPoolEmbeddings(emb(s, d), "label", "embedding")
        .select(col("label"), col("n_vecs"),
          posexplode(col("centroid")).as(Seq("idx", "component")))
        .select(col("label"), col("n_vecs"),
          col("idx").cast(LongType).as("idx"), col("component"))
        .orderBy(col("label"), col("idx")),
    Some("""WITH c AS (
        SELECT label,
          unnest(list_transform(generate_series(1, len(embedding)),
            i -> struct_pack(idx := i - 1,
              x := CAST(embedding[i] AS DOUBLE)))) AS u
        FROM embeddings),
      s AS (
        SELECT label, u.idx AS idx,
          sum(CAST(u.x AS DECIMAL(30, 12))) AS sm,
          count(u.x) AS n
        FROM c GROUP BY label, u.idx)
      SELECT label, max(n) OVER (PARTITION BY label) AS n_vecs,
        CAST(idx AS BIGINT) AS idx,
        round(CAST(sm AS DOUBLE) / n, 6) AS component
      FROM s ORDER BY label, idx"""))

  // ---- q121: contrastive triplet mining --------------------------------
  // Embedding-training prep: (anchor, hardest positive, ring negative)
  // for every doc with a near-dup. The positive re-reads the q53/q63
  // materialized pair verdicts (the similarity pass is shared, not
  // recomputed) and ranks through the rewritten heap; the negative is
  // the anchor's first ring successor that is not one of its KNOWN
  // near-dup partners — one window pass, wrap via first/nth_value,
  // exclusion set from the pair table itself, all replayed by the
  // oracle.

  private[queries] val q121 = GraftQuery(
    "q121_triplets",
    (s, d) =>
      Similarity.mineTriplets(exactPairsMaterialized(s, d),
          emb(s, d).select(col("vec_id")), "vec_id")
        .orderBy(col("anchor")),
    Some("""WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      p AS (
        SELECT a.vec_id AS ia, b.vec_id AS ib,
          round(list_dot_product(a.v, b.v) /
            (sqrt(list_dot_product(a.v, a.v)) *
             sqrt(list_dot_product(b.v, b.v))), 6) AS sim
        FROM e a JOIN e b ON a.vec_id < b.vec_id),
      pf AS (SELECT * FROM p WHERE sim >= 0.4),
      sym AS (
        SELECT ia AS anchor, ib AS cand, sim FROM pf
        UNION ALL SELECT ib, ia, sim FROM pf),
      best AS (
        SELECT anchor, cand AS positive, sim FROM (
          SELECT *, row_number() OVER (
            PARTITION BY anchor ORDER BY sim DESC, cand) AS rn
          FROM sym) WHERE rn = 1),
      partners AS (
        SELECT anchor, list(cand) AS pl FROM sym GROUP BY anchor),
      ring AS (
        SELECT vec_id AS rid,
          CAST(concat('0x', substring(md5('neg:'||vec_id), 1, 8)) AS BIGINT)
            AS u
        FROM embeddings),
      r2 AS (SELECT rid, u, u % 8 AS shard FROM ring),
      s AS (
        SELECT rid AS anchor,
          coalesce(lead(rid, 1) OVER w, first_value(rid) OVER wf) AS s1,
          CASE WHEN lead(rid, 1) OVER w IS NULL
                 THEN nth_value(rid, 2) OVER wf
               WHEN lead(rid, 2) OVER w IS NULL
                 THEN first_value(rid) OVER wf
               ELSE lead(rid, 2) OVER w END AS s2
        FROM r2
        WINDOW w AS (PARTITION BY shard ORDER BY u, rid),
          wf AS (PARTITION BY shard ORDER BY u, rid
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
      SELECT b.anchor, b.positive, b.sim,
        CASE WHEN s.s1 IS NOT NULL AND s.s1 <> b.anchor
               AND NOT list_contains(p.pl, s.s1) THEN s.s1
             WHEN s.s2 IS NOT NULL AND s.s2 <> b.anchor
               AND NOT list_contains(p.pl, s.s2) THEN s.s2
             ELSE NULL END AS negative
      FROM best b JOIN s ON s.anchor = b.anchor
        JOIN partners p ON p.anchor = b.anchor
      ORDER BY b.anchor"""))

  // q122/q123: q120's and q121's operators from pure SQL text via the
  // injected TVFs — same oracles (the q118/q119 convention). q123
  // feeds the TVF the same materialized pair verdicts through a temp
  // view, the shape a SQL user holding a pair table would write.
  private[queries] val q122 = GraftQuery(
    "q122_sql_mean_pool",
    (s, d) => {
      Tables.registerAllOnce(s, d)
      s.sql("""SELECT label, n_vecs, CAST(p.idx AS BIGINT) AS idx,
          p.component
        FROM mean_pool('embeddings', 'label', 'embedding')
        LATERAL VIEW posexplode(centroid) p AS idx, component
        ORDER BY label, idx""")
    },
    q120.oracle)

  private[queries] val q123 = GraftQuery(
    "q123_sql_triplets",
    (s, d) => {
      Tables.registerAllOnce(s, d)
      exactPairsMaterialized(s, d).createOrReplaceTempView("triplet_pairs")
      s.sql("""SELECT anchor, positive, sim, negative
        FROM mine_triplets('triplet_pairs', 'embeddings', 'vec_id')
        ORDER BY anchor""")
    },
    q121.oracle)

  // ---- q143: token-budget corpus selection -----------------------------
  // "Fill a 16k-token budget with the best documents": quality tier =
  // n_chars div 100, cost = whitespace token count, membership = the
  // maximal (quality DESC, md5 draw, doc_id) prefix whose cumulative
  // cost fits. Spark runs the two-level histogram refinement
  // (class census → boundary class → 1024-bucket census → boundary
  // bucket prefix — no global sort anywhere); the oracle IS the naive
  // global running-sum definition, so the refinement's exactness —
  // boundary location at both levels, the remaining-budget handoffs,
  // the in-bucket prefix — is precisely what the hash gates. The
  // budget lands mid-class by construction (classes 5+4 fit, class 3
  // splits), so all three tiers of the machinery run.

  private[queries] val q143 = GraftQuery(
    "q143_token_budget",
    (s, d) => {
      val scored = docs(s, d).select(col("doc_id"), col("source"),
        expr("n_chars div 100L").as("quality"),
        tokenCount(col("text")).cast(LongType).as("toks"))
      DatasetOps.selectTokenBudget(scored, "doc_id", "quality", "toks",
          budget = 16000L)
        .orderBy(col("doc_id"))
    },
    Some("""WITH d AS (SELECT doc_id, source, n_chars // 100 AS quality,
        CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
          x -> length(x) > 0)) AS BIGINT) AS toks,
        CAST(concat('0x', substring(md5('budget:'||doc_id), 1, 8)) AS BIGINT)
          AS u
      FROM documents),
      c AS (SELECT *, sum(toks) OVER (ORDER BY quality DESC, u, doc_id
          ROWS UNBOUNDED PRECEDING) AS cum FROM d)
      SELECT doc_id, source, quality, toks FROM c
      WHERE cum <= 16000 ORDER BY doc_id"""))

  // ---- q145: token-budget selection from pure SQL ----------------------
  // The TVF parser path for q143: the scored corpus lands as a temp
  // view, `select_token_budget` plans the same two-level histogram
  // refinement, and the hash-match is against q143's own oracle.

  private[queries] val q145 = GraftQuery(
    "q145_sql_token_budget",
    (s, d) => {
      docs(s, d).select(col("doc_id"), col("source"),
          expr("n_chars div 100L").as("quality"),
          tokenCount(col("text")).cast(LongType).as("toks"))
        .createOrReplaceTempView("graft_q145_scored")
      s.sql("""SELECT doc_id, source, quality, toks
        FROM select_token_budget('graft_q145_scored', 'doc_id', 'quality',
                                 'toks', 16000)
        ORDER BY doc_id""")
    },
    q143.oracle)
}
