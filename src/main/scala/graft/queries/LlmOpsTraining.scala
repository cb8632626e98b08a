package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextFunctions.whitespaceTokens
import graft.operators.ChatOps
import graft.sources.Tables

/** Instruction/chat-data preparation queries (q312+ region) — the
  * SFT/DPO mile of the LLM pipeline: chat-JSONL parse + structural
  * validation, ChatML render with loss-mask spans, and preference-
  * pair construction. One section of the [[LlmOps]] registry.
  *
  * The chat fixture is fabricated from the `documents` table by pure
  * column arithmetic (the q305-sitemap / synthetic-generator replay
  * trick): the DuckDB oracle rebuilds the conversation GROUND TRUTH
  * from the same arithmetic WITHOUT going through JSON — so Spark's
  * whole encode→from_json→validate→render path is gated end to end
  * (a parse bug can't cancel out, because the oracle never parses). */
private[queries] trait LlmOpsTraining { this: LlmOps.type =>

  // ---- the chat-JSONL fixture ------------------------------------------
  // Per doc: 2 + id%5 alternating user/assistant turns whose contents
  // are sanitized text substrings; planted defects exercise every
  // verdict leg — id%41=11 truncated JSON (unparseable), id%23=7
  // role-swapped (first_not_user), id%17=3 a repeated role at turn 1
  // (role_repeat), id%19=5 an empty content at turn 1
  // (empty_content), id%29=2 a legal leading system prompt (stays ok).
  // r13 tool slices REPLACE the whole messages array (no system
  // prefix, no base defects): id%37=8 a legal tool-augmented
  // conversation [user, assistant, tool, assistant] plus a top-level
  // "tools" array (schema drift the fixed from_json schema ignores),
  // id%43=9 a misplaced tool result [user, tool, assistant]
  // (tool_out_of_place). id%47=10 plants a per-message "weight" drift
  // key on the base path (q338's census sees it; nothing else does).
  // Slice precedence: corrupt > tool > tool_bad > base(+system).

  /** Tool-slice turn content, shared by [[chatJson]] and the
    * [[chatTurnsOracleCte]] replay — distinct offsets from the base
    * `content(i)` so the tool conversations carry their own text. */
  private def toolContent(id: Column, text: Column, i: Int): Column =
    regexp_replace(
      text.substr((lit(1L) + (id + i * 7) % 23).cast(IntegerType),
        (lit(12L) + (id + i) % 11).cast(IntegerType)), "[^a-z ]", "")

  private def toolContentSql(i: Int): String =
    s"regexp_replace(substr(text, CAST(1 + (doc_id + ${i * 7}) % 23 AS INT), " +
      s"CAST(12 + (doc_id + $i) % 11 AS INT)), '[^a-z ]', '', 'g')"

  private[queries] def chatJson(id: Column, text: Column): Column = {
    def baseRole(i: Column): Column =
      when(id % 23 === 7,
        when(i % 2 === 0, lit("assistant")).otherwise(lit("user")))
        .otherwise(when(i % 2 === 0, lit("user")).otherwise(lit("assistant")))
    def role(i: Column): Column =
      when(i === 1 && id % 17 === 3, baseRole(lit(0L))).otherwise(baseRole(i))
    def content(i: Column): Column =
      when(i === 1 && id % 19 === 5, lit(""))
        .when(i === 1 && id % 31 === 6,
          lit("i cannot help with that")) // planted boilerplate (q324)
        .otherwise(regexp_replace(
          text.substr((lit(1L) + (id + i * 13) % 29).cast(IntegerType),
            (lit(10L) + (id + i) % 17).cast(IntegerType)),
          "[^a-z ]", ""))
    // drift key (q338): a producer-added per-message field the fixed
    // from_json schema silently drops — visible ONLY to the key census
    def wfield(i: Column): Column = when(id % 47 === 10,
      concat(lit(",\"weight\":"), ((id + i) % 5).cast(StringType)))
      .otherwise(lit(""))
    val msgs = array_join(
      transform(sequence(lit(0L), lit(1L) + id % 5), i =>
        concat(lit("{\"role\":\""), role(i), lit("\",\"content\":\""),
          content(i), lit("\""), wfield(i), lit("}"))), ",")
    val sysPrefix = when(id % 29 === 2,
      lit("{\"role\":\"system\",\"content\":\"stay factual\"},"))
      .otherwise(lit(""))
    def tmsg(role: String, i: Int): Column =
      concat(lit("{\"role\":\"" + role + "\",\"content\":\""),
        toolContent(id, text, i), lit("\"}"))
    val toolMsgs = concat_ws(",", tmsg("user", 0), tmsg("assistant", 1),
      tmsg("tool", 2), tmsg("assistant", 3))
    val toolBad = concat_ws(",", tmsg("user", 0), tmsg("tool", 1),
      tmsg("assistant", 2))
    // structured tool-call slices (r13, q339): the assistant issues a
    // machine-readable call and the tool turn answers it by id — the
    // %59 variant answers with a WRONG id (tool_call_mismatch)
    def tcallMsgs(badRef: Boolean): Column = {
      val cid = concat(lit("c"), (id % 97).cast(StringType))
      val refId = if (badRef) lit("zz") else cid
      concat_ws(",",
        tmsg("user", 0),
        concat(lit("{\"role\":\"assistant\",\"content\":\""),
          toolContent(id, text, 1),
          lit("\",\"tool_calls\":[{\"id\":\""), cid,
          lit("\",\"name\":\"search\",\"args\":\""),
          toolContent(id, text, 2), lit("\"}]}")),
        concat(lit("{\"role\":\"tool\",\"tool_call_id\":\""), refId,
          lit("\",\"content\":\""), toolContent(id, text, 3), lit("\"}")),
        tmsg("assistant", 4))
    }
    when(id % 41 === 11,
      concat(lit("{\"conv_id\":"), id.cast(StringType), lit(",\"messages\":[")))
      .when(id % 53 === 12,
        concat(lit("{\"conv_id\":"), id.cast(StringType),
          lit(",\"messages\":["), tcallMsgs(badRef = false), lit("]}")))
      .when(id % 59 === 13,
        concat(lit("{\"conv_id\":"), id.cast(StringType),
          lit(",\"messages\":["), tcallMsgs(badRef = true), lit("]}")))
      .when(id % 37 === 8,
        concat(lit("{\"conv_id\":"), id.cast(StringType),
          lit(",\"tools\":[\"search\"],\"messages\":["), toolMsgs, lit("]}")))
      .when(id % 43 === 9,
        concat(lit("{\"conv_id\":"), id.cast(StringType),
          lit(",\"messages\":["), toolBad, lit("]}")))
      .otherwise(concat(lit("{\"conv_id\":"), id.cast(StringType),
        lit(",\"messages\":["), sysPrefix, msgs, lit("]}")))
  }

  /** DuckDB ground truth for the fixture: turns rebuilt by the SAME
    * arithmetic, never through JSON. */
  private[queries] val chatTurnsOracleCte: String =
    s"""ct AS (
        SELECT doc_id, doc_id % 41 = 11 AS corrupt,
          CASE
            WHEN doc_id % 53 = 12 OR doc_id % 59 = 13 THEN [
              {'role': 'user', 'content': ${toolContentSql(0)}},
              {'role': 'assistant', 'content': ${toolContentSql(1)}},
              {'role': 'tool', 'content': ${toolContentSql(3)}},
              {'role': 'assistant', 'content': ${toolContentSql(4)}}]
            WHEN doc_id % 37 = 8 THEN [
              {'role': 'user', 'content': ${toolContentSql(0)}},
              {'role': 'assistant', 'content': ${toolContentSql(1)}},
              {'role': 'tool', 'content': ${toolContentSql(2)}},
              {'role': 'assistant', 'content': ${toolContentSql(3)}}]
            WHEN doc_id % 43 = 9 THEN [
              {'role': 'user', 'content': ${toolContentSql(0)}},
              {'role': 'tool', 'content': ${toolContentSql(1)}},
              {'role': 'assistant', 'content': ${toolContentSql(2)}}]
            WHEN doc_id % 29 = 2
            THEN list_prepend({'role': 'system', 'content': 'stay factual'},
              base)
            ELSE base END AS turns
        FROM (
          SELECT doc_id, text,
            list_transform(generate_series(0, 1 + doc_id % 5), i -> {
              'role': CASE WHEN i = 1 AND doc_id % 17 = 3
                  THEN CASE WHEN doc_id % 23 = 7
                    THEN 'assistant' ELSE 'user' END
                WHEN doc_id % 23 = 7
                  THEN CASE WHEN i % 2 = 0 THEN 'assistant' ELSE 'user' END
                ELSE CASE WHEN i % 2 = 0 THEN 'user' ELSE 'assistant' END
                END,
              'content': CASE WHEN i = 1 AND doc_id % 19 = 5 THEN ''
                WHEN i = 1 AND doc_id % 31 = 6
                  THEN 'i cannot help with that'
                ELSE regexp_replace(substr(text,
                  CAST(1 + (doc_id + i * 13) % 29 AS INT),
                  CAST(10 + (doc_id + i) % 17 AS INT)), '[^a-z ]', '', 'g')
                END
            }) AS base
          FROM documents) b)"""

  /** DuckDB replay of [[ChatOps.verdict]]'s precedence over the truth
    * turns (corrupt rows short-circuit to unparseable). */
  private[queries] val chatVerdictOracleCte: String =
    """rs AS (
        SELECT doc_id, corrupt, turns,
          CASE WHEN corrupt THEN 'unparseable'
            WHEN len(turns) = 0 THEN 'empty'
            WHEN len(list_filter(turns, t -> t.role <> 'system')) = 0
              OR list_filter(turns, t -> t.role <> 'system')[1].role
                <> 'user' THEN 'first_not_user'
            WHEN len(list_filter(generate_series(1, len(turns) - 1),
              i -> turns[i].role = turns[i + 1].role
                AND turns[i].role <> 'tool')) > 0
              THEN 'role_repeat'
            WHEN len(list_filter(turns, t -> len(t.content) = 0)) > 0
              THEN 'empty_content'
            WHEN len(list_filter(generate_series(2, len(turns)),
              i -> turns[i].role = 'tool'
                AND turns[i - 1].role NOT IN ('assistant', 'tool'))) > 0
              THEN 'tool_out_of_place'
            WHEN len(list_filter(turns,
              t -> t.role NOT IN ('user', 'assistant', 'system', 'tool'))) > 0
              THEN 'unknown_role'
            ELSE 'ok' END AS reason
        FROM ct)"""

  /** DuckDB replay of render + mask spans over parseable rows: per-turn
    * segments, a prefix-sum window for the cursor, string_agg'd spans
    * (null-skipping keeps only assistant turns, exactly like the Spark
    * fold's conditional append). */
  private[queries] val chatRenderOracleCte: String =
    """u AS (SELECT doc_id, unnest(turns) AS t,
          unnest(generate_series(1, len(turns))) AS i
        FROM rs WHERE NOT corrupt),
      r AS (SELECT doc_id, i, t.role AS role, t.content AS content,
          '<|im_start|>' || t.role || chr(10) || t.content ||
            '<|im_end|>' || chr(10) AS seg
        FROM u),
      p AS (SELECT doc_id, i, role, content, seg,
          coalesce(sum(len(seg)) OVER (PARTITION BY doc_id ORDER BY i
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pos
        FROM r),
      f AS (SELECT doc_id,
          string_agg(seg, '' ORDER BY i) AS rendered,
          coalesce(string_agg(CASE WHEN role = 'assistant'
            THEN (pos + 13 + len(role)) || '-' ||
                 (pos + 13 + len(role) + len(content)) END,
            ';' ORDER BY i), '') AS mask_spans,
          CAST(sum(CASE WHEN role = 'assistant' THEN len(content)
            ELSE 0 END) AS BIGINT) AS masked_chars
        FROM p GROUP BY doc_id)"""

  private[queries] def chatRaw(s: org.apache.spark.sql.SparkSession,
                               d: String) =
    // spread before the parse/verdict/render chains: every chat query
    // inherits the corpus scan, and a one-row-group input would run
    // the whole per-conversation work in one task (r13)
    graft.operators.DatasetOps.spreadToCores(docs(s, d))
      .select(col("doc_id"),
        chatJson(col("doc_id"), col("text")).as("j"))

  // ---- q312: chat-corpus structural validation census ------------------
  // The ingest gate a dialogue corpus passes before any rendering:
  // parse the JSONL, classify every conversation by the first failing
  // structural rule. The oracle derives each verdict arithmetically —
  // a from_json regression (mis-parsed role, dropped turn, silently
  // null content) moves a conversation between reason buckets and
  // flips the hash.

  private[queries] val q312: GraftQuery = GraftQuery(
    "q312_chat_validation",
    (s, d) =>
      ChatOps.flatten(chatRaw(s, d), "doc_id", "j")
        .groupBy(col("reason"))
        .agg(count(lit(1)).as("n_convs"),
          sum(col("n_turns")).as("total_turns"))
        .orderBy(col("reason")),
    Some(s"""WITH $chatTurnsOracleCte,
      $chatVerdictOracleCte
      SELECT reason, count(*) AS n_convs,
        CAST(sum(CASE WHEN corrupt THEN 0 ELSE len(turns) END) AS BIGINT)
          AS total_turns
      FROM rs GROUP BY reason ORDER BY reason"""))

  // ---- q313: ChatML render + loss-mask spans ---------------------------
  // The SFT tensor-prep contract: rendered training text (gated by
  // md5, so the whole template byte stream is covered) and the
  // character spans the loss is computed on. An off-by-one anywhere
  // in the template arithmetic — a forgotten newline, a role-length
  // miscount — shifts every span and flips the hash. conv_id comes
  // from the PARSED JSON while the oracle derives it arithmetically,
  // gating the parse itself.

  private[queries] val q313: GraftQuery = GraftQuery(
    "q313_chat_flatten",
    (s, d) =>
      ChatOps.flatten(chatRaw(s, d), "doc_id", "j")
        .filter(col("reason") === "ok")
        .select(col("conv_id"), col("n_turns"), col("rendered_len"),
          col("rendered_md5"), col("mask_spans"), col("masked_chars"))
        .orderBy(col("conv_id")),
    Some(s"""WITH $chatTurnsOracleCte,
      $chatVerdictOracleCte,
      $chatRenderOracleCte
      SELECT rs.doc_id AS conv_id,
        CAST(len(turns) AS BIGINT) AS n_turns,
        CAST(len(rendered) AS BIGINT) AS rendered_len,
        md5(rendered) AS rendered_md5, mask_spans, masked_chars
      FROM rs JOIN f ON rs.doc_id = f.doc_id
      WHERE reason = 'ok' ORDER BY conv_id"""))

  // ---- q314: preference-pair construction (DPO/RLHF prep) --------------
  // Within each prompt group, (highest, lowest)-scored pair with a
  // minimum-gap filter. Both ranks are the row_number()=1 idiom the
  // injected rewrite turns into the bounded-heap node — per-group
  // state is ONE row per direction at any corpus size. Integer score
  // (alpha character mass — the stand-in for the calibrated
  // classifier's ppm score, q150) so the cross-engine comparison is
  // exact.

  /** The shared prompt-group scoring frame (q314/q320/q335/q336):
    * 25 prompt groups per source, integer alpha-mass score — the
    * stand-in for the calibrated classifier's ppm score (q150). */
  private[queries] def promptScored(s: org.apache.spark.sql.SparkSession,
                                    d: String) =
    docs(s, d).select(
      concat(col("source"), lit("#"),
        (col("doc_id") % 25).cast(StringType)).as("prompt_grp"),
      col("doc_id"),
      length(regexp_replace(col("text"), "[^a-z]", ""))
        .cast(LongType).as("score"))

  private[queries] val q314: GraftQuery = GraftQuery(
    "q314_preference_pairs",
    (s, d) => {
      ChatOps.preferencePairs(promptScored(s, d), "prompt_grp", "doc_id",
          "score", minGap = 20L)
        .select(col("prompt_grp"), col("chosen_id"), col("chosen_score"),
          col("rejected_id"), col("rejected_score"), col("gap"))
        .orderBy(col("prompt_grp"))
    },
    Some("""WITH s0 AS (
        SELECT source || '#' || (doc_id % 25) AS prompt_grp, doc_id,
          CAST(len(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT)
            AS score
        FROM documents),
      c AS (SELECT prompt_grp, doc_id AS chosen_id, score AS chosen_score,
          row_number() OVER (PARTITION BY prompt_grp
            ORDER BY score DESC, doc_id) AS rn
        FROM s0),
      rj AS (SELECT prompt_grp, doc_id AS rejected_id,
          score AS rejected_score,
          row_number() OVER (PARTITION BY prompt_grp
            ORDER BY score ASC, doc_id) AS rn
        FROM s0)
      SELECT c.prompt_grp, chosen_id, chosen_score, rejected_id,
        rejected_score, chosen_score - rejected_score AS gap
      FROM c JOIN rj ON c.prompt_grp = rj.prompt_grp
        AND c.rn = 1 AND rj.rn = 1
      WHERE chosen_id <> rejected_id
        AND chosen_score - rejected_score >= 20
      ORDER BY c.prompt_grp"""))

  // ---- q346: Bradley-Terry preference ratings (r14) ----------------------
  // VERDICT r13 Missing #3: q314 constructs pairs, q335 selects
  // best-of-n, but nothing aggregated pairwise outcomes into
  // per-model ratings — the leaderboard step every RLHF pipeline
  // runs. Responses map to 7 "models" (doc_id % 7), q314's pairs
  // become (winner, loser) outcomes, and the integer MM iteration
  // (EvalOps.bradleyTerry — anchor-regularized, scale-pinned) runs 4
  // rounds. The oracle replays the pair construction, the outcome
  // mapping, the duel/win censuses and EVERY round's integer
  // trajectory in int64, then the same top-5 board — a drifted
  // denominator, a missed anchor game, or one round short flips the
  // hash.

  /** One unrolled oracle round: denominators from the directed duel
    * census at the previous ratings, then the anchored MM update. */
  private def btRoundSql(i: Int): String = {
    val prev = s"r${i - 1}"
    s"""d$i AS (SELECT du.a AS m,
          sum(du.n * 1000000000000 // (pa.p + pb.p)) AS dd
        FROM du JOIN $prev pa ON pa.m = du.a
        JOIN $prev pb ON pb.m = du.b
        GROUP BY du.a),
      r$i AS (SELECT it.m, CAST((it.wins + 1) * 1000000000000 //
          greatest(coalesce(d$i.dd, 0)
            + 2 * 1000000000000 // ($prev.p + 1000000), 1)
          AS BIGINT) AS p
        FROM it JOIN $prev ON $prev.m = it.m
        LEFT JOIN d$i ON d$i.m = it.m)"""
  }

  private[queries] val q346: GraftQuery = GraftQuery(
    "q346_bradley_terry",
    (s, d) => {
      val pairs = ChatOps.preferencePairs(promptScored(s, d),
        "prompt_grp", "doc_id", "score", minGap = 20L)
      val outcomes = pairs.select(
        (col("chosen_id") % 7).as("winner"),
        (col("rejected_id") % 7).as("loser"))
      graft.operators.EvalOps
        .bradleyTerry(outcomes, "winner", "loser", iters = 4)
        .withColumnRenamed("item", "model")
        .orderBy(col("rating").desc, col("model"))
        .limit(5)
    },
    Some(s"""WITH s0 AS (
        SELECT source || '#' || (doc_id % 25) AS prompt_grp, doc_id,
          CAST(len(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT)
            AS score
        FROM documents),
      c AS (SELECT prompt_grp, doc_id AS chosen_id, score AS chosen_score,
          row_number() OVER (PARTITION BY prompt_grp
            ORDER BY score DESC, doc_id) AS rn
        FROM s0),
      rj AS (SELECT prompt_grp, doc_id AS rejected_id,
          score AS rejected_score,
          row_number() OVER (PARTITION BY prompt_grp
            ORDER BY score ASC, doc_id) AS rn
        FROM s0),
      oc AS (SELECT chosen_id % 7 AS w, rejected_id % 7 AS l
        FROM c JOIN rj ON c.prompt_grp = rj.prompt_grp
          AND c.rn = 1 AND rj.rn = 1
        WHERE chosen_id <> rejected_id
          AND chosen_score - rejected_score >= 20
          AND chosen_id % 7 <> rejected_id % 7),
      wn AS (SELECT w AS m, count(*) AS wins FROM oc GROUP BY w),
      ls AS (SELECT l AS m, count(*) AS losses FROM oc GROUP BY l),
      it AS (SELECT m, coalesce(wins, 0) AS wins,
          coalesce(wins, 0) + coalesce(losses, 0) AS games
        FROM wn FULL JOIN ls USING (m)),
      du AS (SELECT a, b, count(*) AS n FROM (
          SELECT w AS a, l AS b FROM oc
          UNION ALL SELECT l AS a, w AS b FROM oc) GROUP BY a, b),
      r0 AS (SELECT m, CAST(1000000 AS BIGINT) AS p FROM it),
      ${btRoundSql(1)},
      ${btRoundSql(2)},
      ${btRoundSql(3)},
      ${btRoundSql(4)}
      SELECT CAST(it.m AS BIGINT) AS model,
        CAST(it.games AS BIGINT) AS games,
        CAST(it.wins AS BIGINT) AS wins, r4.p AS rating
      FROM it JOIN r4 ON r4.m = it.m
      ORDER BY rating DESC, model LIMIT 5"""))

  // ---- q347: bootstrap CIs for eval metrics (r14) -------------------------
  // VERDICT r13 Missing #4: q326/q340–q344 emit point estimates only —
  // a 2-point EM move between corpus snapshots is unactionable
  // without an interval. 40 md5-subsample replicates (round-salted
  // hashSplit draws over an arithmetically-planted per-document EM:
  // (doc_id·13) % 10 < 7), integer-ppm replicate means, nearest-rank
  // 5/95 bounds. The oracle replays EVERY draw (the same md5-prefix
  // uint32s), every replicate mean, the ≤-rank census and both
  // bounds — a drifted salt, a wrong threshold, or an off-by-one in
  // the nearest-rank arithmetic flips the hash.

  private[queries] val q347: GraftQuery = GraftQuery(
    "q347_bootstrap_ci",
    (s, d) => {
      val em = docs(s, d).select(col("doc_id"),
        when((col("doc_id") * 13) % 10 < 7, 1000000L).otherwise(0L)
          .as("em_ppm"))
      graft.operators.EvalOps.bootstrapMetricCi(em, "doc_id", "em_ppm",
        b = 40, frac = 0.5, salt = "boot", loPct = 5, hiPct = 95)
    },
    Some(s"""WITH it AS (SELECT doc_id AS id,
          CASE WHEN (doc_id * 13) % 10 < 7 THEN 1000000 ELSE 0 END AS v
        FROM documents),
      mem AS (SELECT b, id, v
        FROM it, (SELECT unnest(generate_series(0, 39)) AS b)
        WHERE CAST(concat('0x', substring(
            md5('boot:' || b || ':' || id), 1, 8)) AS BIGINT)
          < ${graft.operators.DatasetOps.thr(0.5)}),
      reps AS (SELECT b, CAST(sum(v) // count(*) AS BIGINT) AS m
        FROM mem GROUP BY b),
      nb AS (SELECT count(*) AS n_replicates FROM reps),
      rk AS (SELECT x.b, x.m,
          (SELECT count(*) FROM reps y WHERE y.m <= x.m) AS rank
        FROM reps x)
      SELECT CAST((SELECT count(*) FROM it) AS BIGINT) AS n_items,
        CAST(nb.n_replicates AS BIGINT) AS n_replicates,
        CAST((SELECT sum(v) // count(*) FROM it) AS BIGINT) AS point_ppm,
        (SELECT min(m) FROM rk
          WHERE rank >= (5 * nb.n_replicates + 99) // 100) AS ci_lo_ppm,
        (SELECT min(m) FROM rk
          WHERE rank >= (95 * nb.n_replicates + 99) // 100) AS ci_hi_ppm
      FROM nb"""))

  // ---- q349: per-source bootstrap CIs (r14) --------------------------------
  // q347's interval machinery in its leaderboard shape: one CI row
  // per SOURCE from one pass (the per-task/per-language report an
  // eval publishes). Same planted EM, same round-salted draws (an
  // item's membership is group-independent by construction), 30
  // replicates, nearest-rank 5/95 within each source's replicate
  // census. The oracle replays the grouped version of every step.

  private[queries] val q349: GraftQuery = GraftQuery(
    "q349_bootstrap_ci_by_source",
    (s, d) => {
      val em = docs(s, d).select(col("source"), col("doc_id"),
        when((col("doc_id") * 13) % 10 < 7, 1000000L).otherwise(0L)
          .as("em_ppm"))
      graft.operators.EvalOps.bootstrapMetricCiBy(em, "source",
          "doc_id", "em_ppm", b = 30, frac = 0.5, salt = "boot",
          loPct = 5, hiPct = 95)
        .orderBy(col("source"))
    },
    Some(s"""WITH it AS (SELECT source, doc_id AS id,
          CASE WHEN (doc_id * 13) % 10 < 7 THEN 1000000 ELSE 0 END AS v
        FROM documents),
      mem AS (SELECT source, b, id, v
        FROM it, (SELECT unnest(generate_series(0, 29)) AS b)
        WHERE CAST(concat('0x', substring(
            md5('boot:' || b || ':' || id), 1, 8)) AS BIGINT)
          < ${graft.operators.DatasetOps.thr(0.5)}),
      reps AS (SELECT source, b, CAST(sum(v) // count(*) AS BIGINT) AS m
        FROM mem GROUP BY source, b),
      nb AS (SELECT source, count(*) AS n_replicates
        FROM reps GROUP BY source),
      pt AS (SELECT source, count(*) AS n_items,
          CAST(sum(v) // count(*) AS BIGINT) AS point_ppm
        FROM it GROUP BY source),
      rk AS (SELECT x.source, x.b, x.m,
          (SELECT count(*) FROM reps y
            WHERE y.source = x.source AND y.m <= x.m) AS rank
        FROM reps x)
      SELECT pt.source, CAST(pt.n_items AS BIGINT) AS n_items,
        CAST(nb.n_replicates AS BIGINT) AS n_replicates, pt.point_ppm,
        (SELECT min(m) FROM rk WHERE rk.source = pt.source
          AND rank >= (5 * nb.n_replicates + 99) // 100) AS ci_lo_ppm,
        (SELECT min(m) FROM rk WHERE rk.source = pt.source
          AND rank >= (95 * nb.n_replicates + 99) // 100) AS ci_hi_ppm
      FROM pt JOIN nb ON nb.source = pt.source
      ORDER BY pt.source"""))

  // ---- q350: preference length-bias audit (r14) ----------------------------
  // The RLHF data-quality check beside q346's ratings: reward signals
  // notoriously correlate with verbosity, and a pair set whose chosen
  // side is longer in most pairs teaches length, not quality. q314's
  // pairs joined back to response TEXT lengths (the score was alpha
  // mass — correlated with, but not identical to, raw length, so the
  // census is informative, not tautological), censused per source.
  // The oracle replays the pair construction, both length joins and
  // every ratio — including the truncate-toward-zero mean gap, which
  // can go negative per source.

  private[queries] val q350: GraftQuery = GraftQuery(
    "q350_preference_length_bias",
    (s, d) => {
      val pairs = ChatOps.preferencePairs(promptScored(s, d),
        "prompt_grp", "doc_id", "score", minGap = 20L)
      val lens = docs(s, d).select(col("doc_id"),
        length(col("text")).cast(LongType).as("_len"))
      val withLens = pairs
        .join(lens.select(col("doc_id").as("chosen_id"),
          col("_len").as("chosen_len")), Seq("chosen_id"))
        .join(lens.select(col("doc_id").as("rejected_id"),
          col("_len").as("rejected_len")), Seq("rejected_id"))
        .withColumn("source", substring_index(col("prompt_grp"), "#", 1))
      ChatOps.preferenceLengthBias(withLens, "source",
          "chosen_len", "rejected_len")
        .orderBy(col("source"))
    },
    Some("""WITH s0 AS (
        SELECT source, source || '#' || (doc_id % 25) AS prompt_grp,
          doc_id,
          CAST(len(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT)
            AS score,
          CAST(len(text) AS BIGINT) AS tlen
        FROM documents),
      c AS (SELECT source, prompt_grp, doc_id AS chosen_id,
          score AS chosen_score, tlen AS chosen_len,
          row_number() OVER (PARTITION BY prompt_grp
            ORDER BY score DESC, doc_id) AS rn
        FROM s0),
      rj AS (SELECT prompt_grp, doc_id AS rejected_id,
          score AS rejected_score, tlen AS rejected_len,
          row_number() OVER (PARTITION BY prompt_grp
            ORDER BY score ASC, doc_id) AS rn
        FROM s0),
      pr AS (SELECT c.source, chosen_len, rejected_len
        FROM c JOIN rj ON c.prompt_grp = rj.prompt_grp
          AND c.rn = 1 AND rj.rn = 1
        WHERE chosen_id <> rejected_id
          AND chosen_score - rejected_score >= 20)
      SELECT source, count(*) AS n_pairs,
        CAST(sum(CASE WHEN chosen_len > rejected_len THEN 1 ELSE 0 END)
          AS BIGINT) AS n_chosen_longer,
        CAST(sum(CASE WHEN chosen_len > rejected_len THEN 1 ELSE 0 END)
          * 1000000 // count(*) AS BIGINT) AS chosen_longer_ppm,
        CAST(sum(chosen_len - rejected_len) // count(*) AS BIGINT)
          AS mean_len_gap
      FROM pr GROUP BY source ORDER BY source"""))

  // ---- q354/q355: paired A-vs-B bootstrap significance (r15) -------------
  // VERDICT r14 Missing #2: q347/q349 interval ONE system's metric,
  // but the decision a leaderboard makes is "is A better than B on the
  // SAME items?" — and comparing two marginal CIs throws away the
  // pairing. Two planted per-document systems (A: (doc_id·13)%10<7,
  // ~70% EM; B: (doc_id·7)%10<6, ~60% EM — correlated through doc_id,
  // neither uniformly better) join into one per-item delta table; the
  // delta rides the IDENTICAL md5 draws as q347 (same salt, same
  // threshold), so each replicate's mean delta is over one consistent
  // item subset. Beside the CI, a_wins_ppm counts the replicates whose
  // mean delta is strictly positive — sign consistency. The oracle
  // replays every draw, every replicate's delta mean, the ≤-rank
  // census, both bounds AND the win census — a drifted salt, an
  // unpaired draw, or a >=-vs-> slip in the win rule flips the hash.

  /** The planted A/B per-item ppm deltas — q354's scalar and q355's
    * grouped variant share the construction. */
  private def pairedEm(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(col("source"), col("doc_id"),
      when((col("doc_id") * 13) % 10 < 7, 1000000L).otherwise(0L)
        .as("a_ppm"),
      when((col("doc_id") * 7) % 10 < 6, 1000000L).otherwise(0L)
        .as("b_ppm"))

  private def pairedItSql: String =
    s"""it AS (SELECT source, doc_id AS id,
        CAST(CASE WHEN (doc_id * 13) % 10 < 7 THEN 1000000 ELSE 0 END
          - CASE WHEN (doc_id * 7) % 10 < 6 THEN 1000000 ELSE 0 END
          AS BIGINT) AS v
      FROM documents)"""

  private[queries] val q354: GraftQuery = GraftQuery(
    "q354_paired_bootstrap",
    (s, d) =>
      graft.operators.EvalOps.pairedBootstrapCi(pairedEm(s, d),
        "doc_id", "a_ppm", "b_ppm", b = 40, frac = 0.5, salt = "boot",
        loPct = 5, hiPct = 95),
    Some(s"""WITH $pairedItSql,
      mem AS (SELECT b, id, v
        FROM it, (SELECT unnest(generate_series(0, 39)) AS b)
        WHERE CAST(concat('0x', substring(
            md5('boot:' || b || ':' || id), 1, 8)) AS BIGINT)
          < ${graft.operators.DatasetOps.thr(0.5)}),
      reps AS (SELECT b, CAST(sum(v) // count(*) AS BIGINT) AS m
        FROM mem GROUP BY b),
      nb AS (SELECT count(*) AS n_replicates FROM reps),
      rk AS (SELECT x.b, x.m,
          (SELECT count(*) FROM reps y WHERE y.m <= x.m) AS rank
        FROM reps x)
      SELECT CAST((SELECT count(*) FROM it) AS BIGINT) AS n_items,
        CAST(nb.n_replicates AS BIGINT) AS n_replicates,
        CAST((SELECT sum(v) // count(*) FROM it) AS BIGINT)
          AS point_delta_ppm,
        (SELECT min(m) FROM rk
          WHERE rank >= (5 * nb.n_replicates + 99) // 100) AS ci_lo_ppm,
        (SELECT min(m) FROM rk
          WHERE rank >= (95 * nb.n_replicates + 99) // 100) AS ci_hi_ppm,
        CAST((SELECT count(*) FROM reps WHERE m > 0) * 1000000
          // nb.n_replicates AS BIGINT) AS a_wins_ppm
      FROM nb"""))

  // q355: the grouped leaderboard shape — one A-vs-B verdict row per
  // SOURCE from one pass (replicate membership is group-independent,
  // so per-source deltas ride the same draws).
  private[queries] val q355: GraftQuery = GraftQuery(
    "q355_paired_bootstrap_by_source",
    (s, d) =>
      graft.operators.EvalOps.pairedBootstrapCiBy(pairedEm(s, d),
          "source", "doc_id", "a_ppm", "b_ppm", b = 30, frac = 0.5,
          salt = "boot", loPct = 5, hiPct = 95)
        .orderBy(col("source")),
    Some(s"""WITH $pairedItSql,
      mem AS (SELECT source, b, id, v
        FROM it, (SELECT unnest(generate_series(0, 29)) AS b)
        WHERE CAST(concat('0x', substring(
            md5('boot:' || b || ':' || id), 1, 8)) AS BIGINT)
          < ${graft.operators.DatasetOps.thr(0.5)}),
      reps AS (SELECT source, b, CAST(sum(v) // count(*) AS BIGINT) AS m
        FROM mem GROUP BY source, b),
      nb AS (SELECT source, count(*) AS n_replicates
        FROM reps GROUP BY source),
      pt AS (SELECT source, count(*) AS n_items,
          CAST(sum(v) // count(*) AS BIGINT) AS point_delta_ppm
        FROM it GROUP BY source),
      wn AS (SELECT source, count(*) AS w FROM reps WHERE m > 0
        GROUP BY source)
      SELECT pt.source, CAST(pt.n_items AS BIGINT) AS n_items,
        CAST(nb.n_replicates AS BIGINT) AS n_replicates,
        pt.point_delta_ppm,
        (SELECT min(m) FROM (SELECT x.m,
            (SELECT count(*) FROM reps y
              WHERE y.source = pt.source AND y.m <= x.m) AS rank
          FROM reps x WHERE x.source = pt.source)
          WHERE rank >= (5 * nb.n_replicates + 99) // 100) AS ci_lo_ppm,
        (SELECT min(m) FROM (SELECT x.m,
            (SELECT count(*) FROM reps y
              WHERE y.source = pt.source AND y.m <= x.m) AS rank
          FROM reps x WHERE x.source = pt.source)
          WHERE rank >= (95 * nb.n_replicates + 99) // 100) AS ci_hi_ppm,
        CAST(coalesce(wn.w, 0) * 1000000 // nb.n_replicates AS BIGINT)
          AS a_wins_ppm
      FROM pt JOIN nb ON nb.source = pt.source
      LEFT JOIN wn ON wn.source = pt.source
      ORDER BY pt.source"""))

  // ---- q356: Bradley-Terry rating CIs (r15) -------------------------------
  // VERDICT r14 Missing #3: q346 emits point ratings; every real
  // leaderboard ships rating ± CI. Outcome bootstrap over q346's own
  // fixture: the pair outcomes (keyed by their unique prompt_grp)
  // md5-resample into 12 replicates, each replicate's FULL 3-round
  // integer MM trajectory re-runs (as one stacked frame — the oracle's
  // round CTEs are keyed by rep, so the SQL replays ALL 13
  // trajectories, point included, in the same unrolled int64
  // arithmetic as q346), then per-model nearest-rank 5/95 bounds over
  // the replicate ratings. A drifted draw, a replicate whose census
  // leaked into another's, or an off-by-one in the rank flips the hash.

  /** One rep-keyed oracle MM round — [[btRoundSql]] with every join
    * carrying the replicate key. */
  private def btCiRoundSql(i: Int): String = {
    val prev = s"r${i - 1}"
    s"""d$i AS (SELECT du.rep, du.a AS m,
          sum(du.n * 1000000000000 // (pa.p + pb.p)) AS dd
        FROM du JOIN $prev pa ON pa.rep = du.rep AND pa.m = du.a
        JOIN $prev pb ON pb.rep = du.rep AND pb.m = du.b
        GROUP BY du.rep, du.a),
      r$i AS (SELECT it.rep, it.m, CAST((it.wins + 1) * 1000000000000 //
          greatest(coalesce(d$i.dd, 0)
            + 2 * 1000000000000 // ($prev.p + 1000000), 1)
          AS BIGINT) AS p
        FROM it JOIN $prev ON $prev.rep = it.rep AND $prev.m = it.m
        LEFT JOIN d$i ON d$i.rep = it.rep AND d$i.m = it.m)"""
  }

  private[queries] val q356: GraftQuery = GraftQuery(
    "q356_bradley_terry_ci",
    (s, d) => {
      val pairs = ChatOps.preferencePairs(promptScored(s, d),
        "prompt_grp", "doc_id", "score", minGap = 20L)
      val outcomes = pairs.select(col("prompt_grp").as("oid"),
        (col("chosen_id") % 7).as("winner"),
        (col("rejected_id") % 7).as("loser"))
      graft.operators.EvalOps.bradleyTerryCi(outcomes, "winner",
          "loser", "oid", iters = 3, b = 12, frac = 0.5, salt = "bt",
          loPct = 5, hiPct = 95)
        .withColumnRenamed("item", "model")
        .orderBy(col("model"))
    },
    Some(s"""WITH s0 AS (
        SELECT source || '#' || (doc_id % 25) AS prompt_grp, doc_id,
          CAST(len(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT)
            AS score
        FROM documents),
      c AS (SELECT prompt_grp, doc_id AS chosen_id, score AS chosen_score,
          row_number() OVER (PARTITION BY prompt_grp
            ORDER BY score DESC, doc_id) AS rn
        FROM s0),
      rj AS (SELECT prompt_grp, doc_id AS rejected_id,
          score AS rejected_score,
          row_number() OVER (PARTITION BY prompt_grp
            ORDER BY score ASC, doc_id) AS rn
        FROM s0),
      oc AS (SELECT c.prompt_grp AS oid, chosen_id % 7 AS w,
          rejected_id % 7 AS l
        FROM c JOIN rj ON c.prompt_grp = rj.prompt_grp
          AND c.rn = 1 AND rj.rn = 1
        WHERE chosen_id <> rejected_id
          AND chosen_score - rejected_score >= 20
          AND chosen_id % 7 <> rejected_id % 7),
      st AS (SELECT oid, w, l, rep
        FROM oc, (SELECT unnest(generate_series(-1, 11)) AS rep)
        WHERE rep = -1 OR CAST(concat('0x', substring(
            md5('bt:' || rep || ':' || oid), 1, 8)) AS BIGINT)
          < ${graft.operators.DatasetOps.thr(0.5)}),
      wn AS (SELECT rep, w AS m, count(*) AS wins FROM st GROUP BY rep, w),
      ls AS (SELECT rep, l AS m, count(*) AS losses FROM st GROUP BY rep, l),
      it AS (SELECT rep, m, coalesce(wins, 0) AS wins,
          coalesce(wins, 0) + coalesce(losses, 0) AS games
        FROM wn FULL JOIN ls USING (rep, m)),
      du AS (SELECT rep, a, b, count(*) AS n FROM (
          SELECT rep, w AS a, l AS b FROM st
          UNION ALL SELECT rep, l AS a, w AS b FROM st) GROUP BY rep, a, b),
      r0 AS (SELECT rep, m, CAST(1000000 AS BIGINT) AS p FROM it),
      ${btCiRoundSql(1)},
      ${btCiRoundSql(2)},
      ${btCiRoundSql(3)},
      ptf AS (SELECT it.m, it.games, it.wins, r3.p AS rating
        FROM it JOIN r3 ON r3.rep = it.rep AND r3.m = it.m
        WHERE it.rep = -1),
      reps AS (SELECT rep, m, p FROM r3 WHERE rep >= 0),
      nb AS (SELECT m, count(*) AS n_replicates FROM reps GROUP BY m),
      rk AS (SELECT x.m, x.rep, x.p,
          (SELECT count(*) FROM reps y WHERE y.m = x.m AND y.p <= x.p)
            AS rank
        FROM reps x),
      bd AS (SELECT rk.m,
          min(CASE WHEN rank >= (5 * nb.n_replicates + 99) // 100
            THEN p END) AS rating_lo,
          min(CASE WHEN rank >= (95 * nb.n_replicates + 99) // 100
            THEN p END) AS rating_hi
        FROM rk JOIN nb ON nb.m = rk.m GROUP BY rk.m)
      SELECT CAST(ptf.m AS BIGINT) AS model,
        CAST(games AS BIGINT) AS games, CAST(wins AS BIGINT) AS wins,
        rating, CAST(coalesce(nb.n_replicates, 0) AS BIGINT)
          AS n_replicates,
        bd.rating_lo, bd.rating_hi
      FROM ptf LEFT JOIN nb ON nb.m = ptf.m
      LEFT JOIN bd ON bd.m = ptf.m
      ORDER BY model"""))

  // ---- q362: per-source Bradley-Terry rating CIs (r15) --------------------
  // q356's rating-CI machinery in its leaderboard shape — one
  // independent board (comparison graph, anchor, trajectory, bounds)
  // per SOURCE from one pass, the grouped symmetry q349/q355 already
  // have on the metric tier. Same fixture keyed by the prompt_grp's
  // source prefix; 10 replicates, 3 MM rounds. The oracle replays
  // every (group, replicate) trajectory with group-and-rep-keyed
  // round CTEs — a census leaking across groups, a draw keyed on the
  // group (it must be id-only), or a rank census mixing two sources'
  // replicate ratings flips the hash.

  /** One (g, rep)-keyed oracle MM round. */
  private def btCiRoundSqlBy(i: Int): String = {
    val prev = s"r${i - 1}"
    s"""d$i AS (SELECT du.g, du.rep, du.a AS m,
          sum(du.n * 1000000000000 // (pa.p + pb.p)) AS dd
        FROM du JOIN $prev pa ON pa.g = du.g AND pa.rep = du.rep
          AND pa.m = du.a
        JOIN $prev pb ON pb.g = du.g AND pb.rep = du.rep AND pb.m = du.b
        GROUP BY du.g, du.rep, du.a),
      r$i AS (SELECT it.g, it.rep, it.m,
          CAST((it.wins + 1) * 1000000000000 //
          greatest(coalesce(d$i.dd, 0)
            + 2 * 1000000000000 // ($prev.p + 1000000), 1)
          AS BIGINT) AS p
        FROM it JOIN $prev ON $prev.g = it.g AND $prev.rep = it.rep
          AND $prev.m = it.m
        LEFT JOIN d$i ON d$i.g = it.g AND d$i.rep = it.rep
          AND d$i.m = it.m)"""
  }

  private[queries] val q362: GraftQuery = GraftQuery(
    "q362_bradley_terry_ci_by_source",
    (s, d) => {
      val pairs = ChatOps.preferencePairs(promptScored(s, d),
        "prompt_grp", "doc_id", "score", minGap = 20L)
      val outcomes = pairs.select(
        substring_index(col("prompt_grp"), "#", 1).as("source"),
        col("prompt_grp").as("oid"),
        (col("chosen_id") % 7).as("winner"),
        (col("rejected_id") % 7).as("loser"))
      graft.operators.EvalOps.bradleyTerryCiBy(outcomes, "source",
          "winner", "loser", "oid", iters = 3, b = 10, frac = 0.5,
          salt = "bt", loPct = 5, hiPct = 95)
        .withColumnRenamed("item", "model")
        .orderBy(col("source"), col("model"))
    },
    Some(s"""WITH s0 AS (
        SELECT source || '#' || (doc_id % 25) AS prompt_grp, doc_id,
          CAST(len(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT)
            AS score
        FROM documents),
      c AS (SELECT prompt_grp, doc_id AS chosen_id, score AS chosen_score,
          row_number() OVER (PARTITION BY prompt_grp
            ORDER BY score DESC, doc_id) AS rn
        FROM s0),
      rj AS (SELECT prompt_grp, doc_id AS rejected_id,
          score AS rejected_score,
          row_number() OVER (PARTITION BY prompt_grp
            ORDER BY score ASC, doc_id) AS rn
        FROM s0),
      oc AS (SELECT split_part(c.prompt_grp, '#', 1) AS g,
          c.prompt_grp AS oid, chosen_id % 7 AS w, rejected_id % 7 AS l
        FROM c JOIN rj ON c.prompt_grp = rj.prompt_grp
          AND c.rn = 1 AND rj.rn = 1
        WHERE chosen_id <> rejected_id
          AND chosen_score - rejected_score >= 20
          AND chosen_id % 7 <> rejected_id % 7),
      st AS (SELECT g, oid, w, l, rep
        FROM oc, (SELECT unnest(generate_series(-1, 9)) AS rep)
        WHERE rep = -1 OR CAST(concat('0x', substring(
            md5('bt:' || rep || ':' || oid), 1, 8)) AS BIGINT)
          < ${graft.operators.DatasetOps.thr(0.5)}),
      wn AS (SELECT g, rep, w AS m, count(*) AS wins
        FROM st GROUP BY g, rep, w),
      ls AS (SELECT g, rep, l AS m, count(*) AS losses
        FROM st GROUP BY g, rep, l),
      it AS (SELECT g, rep, m, coalesce(wins, 0) AS wins,
          coalesce(wins, 0) + coalesce(losses, 0) AS games
        FROM wn FULL JOIN ls USING (g, rep, m)),
      du AS (SELECT g, rep, a, b, count(*) AS n FROM (
          SELECT g, rep, w AS a, l AS b FROM st
          UNION ALL SELECT g, rep, l AS a, w AS b FROM st)
        GROUP BY g, rep, a, b),
      r0 AS (SELECT g, rep, m, CAST(1000000 AS BIGINT) AS p FROM it),
      ${btCiRoundSqlBy(1)},
      ${btCiRoundSqlBy(2)},
      ${btCiRoundSqlBy(3)},
      ptf AS (SELECT it.g, it.m, it.games, it.wins, r3.p AS rating
        FROM it JOIN r3 ON r3.g = it.g AND r3.rep = it.rep
          AND r3.m = it.m
        WHERE it.rep = -1),
      reps AS (SELECT g, rep, m, p FROM r3 WHERE rep >= 0),
      nb AS (SELECT g, m, count(*) AS n_replicates
        FROM reps GROUP BY g, m),
      rk AS (SELECT x.g, x.m, x.rep, x.p,
          (SELECT count(*) FROM reps y
            WHERE y.g = x.g AND y.m = x.m AND y.p <= x.p) AS rank
        FROM reps x),
      bd AS (SELECT rk.g, rk.m,
          min(CASE WHEN rank >= (5 * nb.n_replicates + 99) // 100
            THEN p END) AS rating_lo,
          min(CASE WHEN rank >= (95 * nb.n_replicates + 99) // 100
            THEN p END) AS rating_hi
        FROM rk JOIN nb ON nb.g = rk.g AND nb.m = rk.m
        GROUP BY rk.g, rk.m)
      SELECT ptf.g AS source, CAST(ptf.m AS BIGINT) AS model,
        CAST(games AS BIGINT) AS games, CAST(wins AS BIGINT) AS wins,
        rating, CAST(coalesce(nb.n_replicates, 0) AS BIGINT)
          AS n_replicates,
        bd.rating_lo, bd.rating_hi
      FROM ptf LEFT JOIN nb ON nb.g = ptf.g AND nb.m = ptf.m
      LEFT JOIN bd ON bd.g = ptf.g AND bd.m = ptf.m
      ORDER BY source, model"""))

  // ---- q357: preference length-debias resampling (r15) -------------------
  // VERDICT r14 Missing #4: q350 *measures* length bias; this is the
  // correction step. The alpha-mass score makes EVERY chosen side
  // longer on this corpus (q350 reads 10⁶ ppm — an all-long set no
  // subsample can rebalance, the operator's documented degenerate
  // corner), so the fixture plants a mixed class: rejected responses
  // whose id ≡ 0 (mod 3) carry a +5000 length bonus (a "verbose
  // loser" — exactly the rows a real reward model mislabels), putting
  // the raw share near 667k with both classes populated. The pairs
  // then md5-subsample their strictly-longer-chosen rows down to an
  // expected 450k share, keyed on the pair's unique prompt_grp. The
  // query emits the q350 audit of BOTH sets side by side; the oracle
  // replays the pair construction, the length bonus, the 2-counter
  // census, the integer keep-fraction, every draw, and both audits —
  // the debiased row must land in the sampling band around 450k
  // while the raw row stays biased (and the hash pins exactly where
  // it lands).

  private[queries] val q357: GraftQuery = GraftQuery(
    "q357_preference_length_debias",
    (s, d) => {
      val pairs = ChatOps.preferencePairs(promptScored(s, d),
        "prompt_grp", "doc_id", "score", minGap = 20L)
      val lens = docs(s, d).select(col("doc_id"),
        length(col("text")).cast(LongType).as("_len"))
      val withLens = pairs
        .join(lens.select(col("doc_id").as("chosen_id"),
          col("_len").as("chosen_len")), Seq("chosen_id"))
        .join(lens.select(col("doc_id").as("rejected_id"),
          col("_len").as("rejected_len")), Seq("rejected_id"))
        .withColumn("rejected_len",
          col("rejected_len") +
            when(col("rejected_id") % 3 === 0, 5000L).otherwise(0L))
      val deb = ChatOps.debiasPreferenceLength(withLens, "prompt_grp",
        "chosen_len", "rejected_len", targetPpm = 450000L,
        salt = "lendebias")
      val both = withLens.withColumn("pair_set", lit("raw"))
        .unionByName(deb.withColumn("pair_set", lit("debiased")))
      ChatOps.preferenceLengthBias(both, "pair_set",
          "chosen_len", "rejected_len")
        .orderBy(col("pair_set"))
    },
    Some("""WITH s0 AS (
        SELECT source || '#' || (doc_id % 25) AS prompt_grp, doc_id,
          CAST(len(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT)
            AS score,
          CAST(len(text) AS BIGINT) AS tlen
        FROM documents),
      c AS (SELECT prompt_grp, doc_id AS chosen_id,
          score AS chosen_score, tlen AS chosen_len,
          row_number() OVER (PARTITION BY prompt_grp
            ORDER BY score DESC, doc_id) AS rn
        FROM s0),
      rj AS (SELECT prompt_grp, doc_id AS rejected_id,
          score AS rejected_score, tlen AS rejected_len,
          row_number() OVER (PARTITION BY prompt_grp
            ORDER BY score ASC, doc_id) AS rn
        FROM s0),
      pr AS (SELECT c.prompt_grp, chosen_len,
          rejected_len + CASE WHEN rejected_id % 3 = 0
            THEN 5000 ELSE 0 END AS rejected_len
        FROM c JOIN rj ON c.prompt_grp = rj.prompt_grp
          AND c.rn = 1 AND rj.rn = 1
        WHERE chosen_id <> rejected_id
          AND chosen_score - rejected_score >= 20),
      cs AS (SELECT
          CAST(sum(CASE WHEN chosen_len > rejected_len THEN 1 ELSE 0 END)
            AS BIGINT) AS nl,
          CAST(sum(CASE WHEN chosen_len > rejected_len THEN 0 ELSE 1 END)
            AS BIGINT) AS nr
        FROM pr),
      deb AS (SELECT pr.prompt_grp, chosen_len, rejected_len
        FROM pr, cs
        WHERE NOT (chosen_len > rejected_len)
          OR nl * 1000000 <= 450000 * (nl + nr)
          OR CAST(concat('0x', substring(
              md5('lendebias:' || prompt_grp), 1, 8)) AS BIGINT)
            % 1000000
            < (450000 * nr)
              // greatest(((1000000 - 450000) * nl) // 1000000, 1)),
      un AS (SELECT 'raw' AS pair_set, chosen_len, rejected_len FROM pr
        UNION ALL
        SELECT 'debiased', chosen_len, rejected_len FROM deb)
      SELECT pair_set, count(*) AS n_pairs,
        CAST(sum(CASE WHEN chosen_len > rejected_len THEN 1 ELSE 0 END)
          AS BIGINT) AS n_chosen_longer,
        CAST(sum(CASE WHEN chosen_len > rejected_len THEN 1 ELSE 0 END)
          * 1000000 // count(*) AS BIGINT) AS chosen_longer_ppm,
        CAST(sum(chosen_len - rejected_len) // count(*) AS BIGINT)
          AS mean_len_gap
      FROM un GROUP BY pair_set ORDER BY pair_set"""))

  // ---- q317: loss masks in PACKED-sequence coordinates ------------------
  // The step q313 hands to a packing trainer: conversations pack into
  // fixed 512-char sequences by q99's deterministic md5-order packer
  // (concatenate-and-cut, 4 shards), and every mask span TRANSLATES —
  // global offset inside the shard's concatenation, then CUT at each
  // sequence boundary into per-sequence local pieces (a straddling
  // span feeds the tail of one sequence and the head of the next).
  // Per (shard, seq): piece census, masked mass, and the piece list
  // itself. The oracle replays the md5 deal, the ordered prefix sum,
  // the span arithmetic from the render CTEs and every boundary cut —
  // an off-by-one in ANY coordinate system (turn-local, render-global,
  // shard-global, sequence-local) flips the hash.

  private[queries] val q317: GraftQuery = GraftQuery(
    "q317_packed_loss_masks",
    (s, d) => {
      val parsed = chatRaw(s, d)
        .withColumn("_c", from_json(col("j"), ChatOps.chatSchema))
        // fenced like ChatOps.flatten: the verdict filter must consume
        // the parsed attribute, not re-derive the parse per reference
        .withColumn("_turns", call_function("no_inline", col("_c.messages")))
      val okd = parsed.filter(ChatOps.verdict(col("_turns")) === "ok")
        .select(col("doc_id"),
          length(ChatOps.renderChatML(col("_turns")))
            .cast(LongType).as("rendered_len"),
          ChatOps.lossMaskSpanStructs(col("_turns")).as("spans"))
      ChatOps.packedMaskPieces(okd, "doc_id", "rendered_len", "spans",
          seqLen = 512, nShards = 4)
        .groupBy(col("shard"), col("seq"))
        .agg(count(lit(1)).as("n_pieces"),
          sum(col("piece_e") - col("piece_s")).as("masked_chars"),
          array_join(transform(
            sort_array(collect_list(struct(col("piece_s"), col("piece_e")))),
            x => concat(x.getField("piece_s").cast(StringType), lit("-"),
              x.getField("piece_e").cast(StringType))), ";").as("pieces"))
        .orderBy(col("shard"), col("seq"))
    },
    Some(s"""WITH $chatTurnsOracleCte,
      $chatVerdictOracleCte,
      $chatRenderOracleCte,
      ok2 AS (SELECT rs.doc_id, CAST(len(f.rendered) AS BIGINT) AS rlen
        FROM rs JOIN f ON rs.doc_id = f.doc_id WHERE rs.reason = 'ok'),
      pk AS (SELECT doc_id, rlen,
          CAST(concat('0x', substring(md5('sft:' || doc_id), 1, 8))
            AS BIGINT) AS u
        FROM ok2),
      pk2 AS (SELECT doc_id, rlen, u, u % 4 AS shard,
          coalesce(sum(rlen) OVER (PARTITION BY u % 4 ORDER BY u, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        FROM pk),
      spn AS (SELECT p.doc_id, pk2.shard,
          CAST(pk2.off + pos + 13 + len(role) AS BIGINT) AS gs,
          CAST(pk2.off + pos + 13 + len(role) + len(content) AS BIGINT)
            AS ge
        FROM p JOIN pk2 ON p.doc_id = pk2.doc_id
        WHERE p.role = 'assistant'),
      pc AS (SELECT shard, gs, ge,
          unnest(generate_series(gs // 512, (ge - 1) // 512)) AS seq
        FROM spn),
      pc2 AS (SELECT shard, CAST(seq AS BIGINT) AS seq,
          greatest(gs, seq * 512) - seq * 512 AS ps,
          least(ge, (seq + 1) * 512) - seq * 512 AS pe
        FROM pc)
      SELECT CAST(shard AS BIGINT) AS shard, seq,
        count(*) AS n_pieces,
        CAST(sum(pe - ps) AS BIGINT) AS masked_chars,
        string_agg(ps || '-' || pe, ';' ORDER BY ps, pe) AS pieces
      FROM pc2 GROUP BY shard, seq ORDER BY shard, seq"""))

  // ---- q322: token-aligned loss masks ------------------------------------
  // The step after q313 when the consumer is a TOKENIZER, not a char
  // stream: the rendered text segments on single spaces (each
  // segment's char range is pure arithmetic — start = Σ prev len+1,
  // split keeps empty segments so double spaces cannot desync the
  // cursor), and every segment classifies as fully masked (contained
  // in an assistant span), partially masked (crosses a span boundary
  // — what a real BPE must re-split), or unmasked. The oracle replays
  // the split, the prefix-sum cursor, and both containment/overlap
  // predicates per (segment × span) pair.

  private[queries] val q322: GraftQuery = GraftQuery(
    "q322_token_aligned_masks",
    (s, d) => {
      val parsed = chatRaw(s, d)
        .withColumn("_c", from_json(col("j"), ChatOps.chatSchema))
        .withColumn("_turns",
          call_function("no_inline", col("_c.messages")))
      val okd = parsed.filter(ChatOps.verdict(col("_turns")) === "ok")
        .select(col("doc_id").as("conv_id"),
          call_function("no_inline",
            ChatOps.renderChatML(col("_turns"))).as("_r"),
          ChatOps.lossMaskSpanStructs(col("_turns")).as("_sp"))
      val (nSegs, nFull, nPartial) =
        ChatOps.segmentMaskAlignment(col("_r"), col("_sp"))
      okd.select(col("conv_id"), nSegs.as("n_segs"), nFull.as("n_full"),
          nPartial.as("n_partial"))
        .orderBy(col("conv_id"))
    },
    Some(s"""WITH $chatTurnsOracleCte,
      $chatVerdictOracleCte,
      $chatRenderOracleCte,
      segs AS (SELECT doc_id, seg, i,
          coalesce(sum(len(seg) + 1) OVER (PARTITION BY doc_id ORDER BY i
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
        FROM (SELECT doc_id,
            unnest(string_split(rendered, ' ')) AS seg,
            unnest(generate_series(1, len(string_split(rendered, ' '))))
              AS i
          FROM f)),
      sp2 AS (SELECT doc_id, pos + 13 + len(role) AS s,
          pos + 13 + len(role) + len(content) AS e
        FROM p WHERE role = 'assistant'),
      cls AS (SELECT g.doc_id, g.i,
          max(CASE WHEN len(g.seg) > 0 AND sp2.s <= g.st
            AND g.st + len(g.seg) <= sp2.e THEN 1 ELSE 0 END) AS fl,
          max(CASE WHEN len(g.seg) > 0 AND sp2.s < g.st + len(g.seg)
            AND g.st < sp2.e THEN 1 ELSE 0 END) AS inter
        FROM segs g LEFT JOIN sp2 ON g.doc_id = sp2.doc_id
        GROUP BY g.doc_id, g.i)
      SELECT rs.doc_id AS conv_id,
        CAST(count(*) AS BIGINT) AS n_segs,
        CAST(sum(fl) AS BIGINT) AS n_full,
        CAST(sum(inter) - sum(fl) AS BIGINT) AS n_partial
      FROM cls JOIN rs ON cls.doc_id = rs.doc_id
      WHERE rs.reason = 'ok'
      GROUP BY rs.doc_id ORDER BY conv_id"""))

  // ---- q325: context fitting from SQL -------------------------------------
  // q323's operator through the injected chat_context_fit table
  // function — same fit, reached from the parser path, pinned by the
  // same oracle shape at a different budget (90 forces deeper drops
  // and exercises the overflow leg on more rows).

  private[queries] val q325: GraftQuery = GraftQuery(
    "q325_sql_context_fit",
    (s, d) => {
      chatRaw(s, d).createOrReplaceTempView("chat_fit_sql")
      s.sql("""SELECT doc_id, n_kept, n_dropped, fits, kept_len, kept_md5
        FROM chat_context_fit('chat_fit_sql', 'doc_id', 'j', 90)
        ORDER BY doc_id""")
    },
    Some(contextFitOracle(budget = 90, idAlias = "doc_id")))

  // ---- q332: sitemap entries via native from_xml --------------------------
  // The THIRD door on q305/q306's semantic: Spark 4's built-in XML
  // reader (schema-driven from_xml — repeated <url> elements land as
  // an array field) against the same fixture, pinned by the same
  // oracle as the hand-rolled extractor door. Where q306's extractor
  // is regex-anchored (tolerant of malformed markup — the crawl-side
  // requirement), from_xml is the schema-on-read route a WELL-FORMED
  // feed deserves; emitting identical rows proves the two tiers
  // agree on the well-formed core.

  private[queries] val q332: GraftQuery = GraftQuery(
    "q332_xml_sitemap_native",
    (s, d) => {
      val id = col("doc_id")
      val host = concat(col("source"), lit(".example.com"))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("url",
          ArrayType(org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("loc", StringType),
            org.apache.spark.sql.types.StructField("lastmod", StringType),
            org.apache.spark.sql.types.StructField("changefreq",
              StringType)))))))
      docs(s, d)
        .select(id.as("doc_id"),
          from_xml(sitemapEntriesXml(id, host), schema).as("x"))
        .select(col("doc_id"), explode(col("x.url")).as("e"))
        .select(col("doc_id"), trim(col("e.loc")).as("loc"),
          col("e.lastmod").as("lastmod"),
          col("e.changefreq").as("changefreq"))
        .orderBy(col("doc_id"), col("loc"))
    },
    q306.oracle)

  // ---- q330: conversation-level near-dup --------------------------------
  // SFT paraphrase dedup: the same conversation re-enters a corpus as
  // a re-ID'd duplicate (aggregator re-serialization — caught by the
  // ingest gate's exact digest, and here by minhash at J=1) or as a
  // light paraphrase (a system prompt prepended — the near tier only
  // minhash sees). The corpus is ok renders plus two planted twin
  // classes; decisions are q42's shape (exact word-3-shingle Jaccard
  // ≥ 0.5 verification of LSH candidates) and the oracle enumerates
  // the FULL qualifying pair set over the same union, so any recall
  // loss in the fixed md5 hash family flips the hash red.

  /** q330's verified pair table, materialized once per (JVM, dir) —
    * the q42/q156 deployment shape: the honest collect() consumer
    * priced the live parse→render→minhash→verify feed at ~5.2 s/pass
    * at sf0.1; steady state reads 16-byte parquet rows and the build
    * bill lands once in Bench's first_run. */
  private[queries] val chatPairsDirByInput =
    new graft.sources.JvmMemo[String]
  private[queries] def chatPairsMaterialized(
      s: org.apache.spark.sql.SparkSession, d: String) =
    s.read.parquet(
      materializedTempDir(chatPairsDirByInput, d, "graft_chatpairs_") {
        out =>
          val parsed = chatRaw(s, d)
            .withColumn("_c", from_json(col("j"), ChatOps.chatSchema))
            .withColumn("_turns",
              call_function("no_inline", col("_c.messages")))
            .filter(ChatOps.verdict(col("_turns")) === "ok")
          val base = parsed.select(col("doc_id").as("conv_id"),
            ChatOps.renderChatML(col("_turns")).as("rtext"))
          // twin class 1 (doc_id%6=1): byte-identical re-ID'd duplicate
          val dups = parsed.filter(col("doc_id") % 6 === 1)
            .select((col("doc_id") + 100000L).as("conv_id"),
              ChatOps.renderChatML(col("_turns")).as("rtext"))
          // twin class 2 (doc_id%6=2): paraphrase — a system prompt
          // prepended, the rest byte-identical
          val sys = struct(lit("system").as("role"),
            lit("stay factual").as("content"))
          val para = parsed.filter(col("doc_id") % 6 === 2)
            .select((col("doc_id") + 200000L).as("conv_id"),
              ChatOps.renderChatML(concat(array(sys), col("_turns")))
                .as("rtext"))
          val corpus = base.union(dups).union(para)
          // 12 bands × r=2 (not q42's 6×4): the paraphrase twins sit
          // at J 0.625–0.92, where 6×4 banding measurably missed 4/70
          // pairs (P(candidate)=1-(1-J⁴)⁶ ≈ 0.93 at J=0.77); at r=2
          // the miss probability drops to ≤ 0.3% per pair and the
          // fixed md5 family empirically finds the complete oracle
          // pair set. r=1 would guarantee recall but template shingles
          // shared by EVERY render make single-hash buckets
          // corpus-wide (the maxBucketSize trap).
          graft.operators.Dedup
            .minhashDupPairs(corpus, "rtext", "conv_id",
              threshold = 0.5, numHashes = 24, bands = 12)
            .select(col("idA"), col("idB"))
            .write.mode("overwrite").parquet(out)
      })

  private[queries] val q330: GraftQuery = GraftQuery(
    "q330_chat_near_dup",
    (s, d) => chatPairsMaterialized(s, d).orderBy(col("idA"), col("idB")),
    Some(s"""WITH $chatTurnsOracleCte,
      $chatVerdictOracleCte,
      okr AS (SELECT doc_id, turns FROM rs WHERE reason = 'ok'),
      corpus AS (
        SELECT doc_id AS conv_id, array_to_string(list_transform(turns,
            t -> '<|im_start|>' || t.role || chr(10) || t.content ||
              '<|im_end|>' || chr(10)), '') AS rtext
          FROM okr
        UNION ALL
        SELECT doc_id + 100000, array_to_string(list_transform(turns,
            t -> '<|im_start|>' || t.role || chr(10) || t.content ||
              '<|im_end|>' || chr(10)), '')
          FROM okr WHERE doc_id % 6 = 1
        UNION ALL
        SELECT doc_id + 200000, array_to_string(list_transform(
            list_prepend({'role': 'system', 'content': 'stay factual'},
              turns),
            t -> '<|im_start|>' || t.role || chr(10) || t.content ||
              '<|im_end|>' || chr(10)), '')
          FROM okr WHERE doc_id % 6 = 2),
      toks AS (SELECT conv_id,
          list_filter(string_split_regex(lower(rtext), '\\s+'),
            t -> len(t) > 0) AS tk
        FROM corpus),
      shx AS (SELECT conv_id,
          CASE WHEN len(tk) >= 3
            THEN list_distinct(list_transform(
              generate_series(1, len(tk) - 2),
              i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2]))
            ELSE [] END AS sh
        FROM toks)
      SELECT a.conv_id AS idA, b.conv_id AS idB
      FROM shx a JOIN shx b ON a.conv_id < b.conv_id
      WHERE len(a.sh) > 0 AND len(b.sh) > 0
        AND len(list_intersect(a.sh, b.sh)) * 1.0 /
            len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
      ORDER BY idA, idB"""))

  // ---- q326: eval-harness scoring (exact match + token F1) ----------------
  // The downstream mile of the data pipeline: scoring model outputs
  // against references (SQuAD-style). exact_match is string equality
  // after the shared tokenization; token F1 is the MULTISET overlap
  // (Σ min(count_ref, count_cand) over the union's distinct tokens —
  // duplicated tokens must not double-count), emitted as an integer
  // ppm (2·inter·10⁶ div (n_ref + n_cand), the cross-engine rule).
  // Candidates are deterministic perturbations of the reference
  // window — identical / truncated / first-two-swapped (F1-invariant
  // but EM-breaking, the multiset property the oracle would catch a
  // set-based implementation on) / one-token-replaced / disjoint
  // window — so every metric regime is planted.

  private[queries] val q326: GraftQuery = GraftQuery(
    "q326_eval_token_f1",
    (s, d) => {
      val id = col("doc_id")
      val tk = whitespaceTokens(col("text"))
      val ref = slice(tk, (lit(1L) + id % 5).cast(IntegerType), lit(8))
      val cand = when(id % 7 === 0, ref)
        .when(id % 7 === 1, slice(ref, 1, 7))
        .when(id % 7 === 2, concat(slice(ref, 2, 1), slice(ref, 1, 1),
          slice(ref, 3, 6)))
        .when(id % 7 === 3, concat(slice(ref, 1, 2),
          array(lit("xyzzy")), slice(ref, 4, 5)))
        .otherwise(slice(tk, (lit(3L) + (id + 3) % 5).cast(IntegerType),
          lit(8)))
      val scored = docs(s, d).select(id.as("doc_id"),
        call_function("no_inline", ref).as("_r"),
        call_function("no_inline", cand).as("_c"))
      val inter = aggregate(
        array_distinct(concat(col("_r"), col("_c"))), lit(0L),
        (acc, t) => acc + least(
          size(filter(col("_r"), x => x === t)).cast(LongType),
          size(filter(col("_c"), x => x === t)).cast(LongType)))
      scored.select(col("doc_id"),
          (array_join(col("_r"), " ") === array_join(col("_c"), " "))
            .as("exact_match"),
          size(col("_r")).cast(LongType).as("n_ref"),
          size(col("_c")).cast(LongType).as("n_cand"),
          inter.as("n_overlap"),
          // both-empty windows can only happen on a sub-8-word doc at
          // the window tail; score 0, never divide by zero (ANSI)
          when(size(col("_r")) + size(col("_c")) === 0, 0L)
            .otherwise(expr("n_overlap * 2000000L div (n_ref + n_cand)"))
            .as("f1_ppm"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH tk0 AS (
        SELECT doc_id, list_filter(
          regexp_split_to_array(lower(text), '\s+'),
          x -> length(x) > 0) AS tk
        FROM documents),
      rc AS (SELECT doc_id,
          list_slice(tk, CAST(1 + doc_id % 5 AS BIGINT),
            CAST(doc_id % 5 + 8 AS BIGINT)) AS r,
          CASE
            WHEN doc_id % 7 = 0 THEN list_slice(tk,
              CAST(1 + doc_id % 5 AS BIGINT), CAST(doc_id % 5 + 8 AS BIGINT))
            WHEN doc_id % 7 = 1 THEN list_slice(list_slice(tk,
              CAST(1 + doc_id % 5 AS BIGINT), CAST(doc_id % 5 + 8 AS BIGINT)),
              1, 7)
            WHEN doc_id % 7 = 2 THEN list_concat(list_concat(
              list_slice(list_slice(tk, CAST(1 + doc_id % 5 AS BIGINT),
                CAST(doc_id % 5 + 8 AS BIGINT)), 2, 2),
              list_slice(list_slice(tk, CAST(1 + doc_id % 5 AS BIGINT),
                CAST(doc_id % 5 + 8 AS BIGINT)), 1, 1)),
              list_slice(list_slice(tk, CAST(1 + doc_id % 5 AS BIGINT),
                CAST(doc_id % 5 + 8 AS BIGINT)), 3, 8))
            WHEN doc_id % 7 = 3 THEN list_concat(list_concat(
              list_slice(list_slice(tk, CAST(1 + doc_id % 5 AS BIGINT),
                CAST(doc_id % 5 + 8 AS BIGINT)), 1, 2),
              ['xyzzy']),
              list_slice(list_slice(tk, CAST(1 + doc_id % 5 AS BIGINT),
                CAST(doc_id % 5 + 8 AS BIGINT)), 4, 8))
            ELSE list_slice(tk, CAST(3 + (doc_id + 3) % 5 AS BIGINT),
              CAST((doc_id + 3) % 5 + 10 AS BIGINT))
          END AS c
        FROM tk0),
      m AS (SELECT doc_id, r, c,
          coalesce(list_sum(list_transform(
            list_distinct(list_concat(r, c)),
            t -> least(len(list_filter(r, x -> x = t)),
                       len(list_filter(c, x -> x = t))))), 0) AS inter
        FROM rc)
      SELECT doc_id,
        array_to_string(r, ' ') = array_to_string(c, ' ') AS exact_match,
        CAST(len(r) AS BIGINT) AS n_ref,
        CAST(len(c) AS BIGINT) AS n_cand,
        CAST(inter AS BIGINT) AS n_overlap,
        CAST(CASE WHEN len(r) + len(c) = 0 THEN 0
          ELSE inter * 2000000 // (len(r) + len(c)) END AS BIGINT) AS f1_ppm
      FROM m ORDER BY doc_id"""))

  // ---- q340: pass@k estimation (code/reasoning eval) ----------------------
  // The per-problem estimator every generation eval publishes
  // (HumanEval's unbiased pass@k): n samples per problem, c passing,
  // pass@k = 1 − C(n−c,k)/C(n,k), exact integer ppm via the product
  // form. The fixture plants every regime: doc_id%4=0 problems never
  // pass (ppm 0), high-c problems saturate (n−c < k → ppm 10⁶), the
  // rest land strict interior values the oracle recomputes from the
  // same combinatorics — a double-division drift or an off-by-one in
  // either binomial flips the hash.

  private[queries] val q340: GraftQuery = GraftQuery(
    "q340_pass_at_k",
    (s, d) => {
      val samples = docs(s, d).select(col("doc_id"),
          explode(sequence(lit(1L), lit(5L) + col("doc_id") % 6))
            .as("smp"))
        .withColumn("ok",
          (col("doc_id") * 31 + col("smp") * 17) % 10 < col("doc_id") % 4)
      graft.operators.EvalOps.passAtK(samples, "doc_id", "ok", k = 3)
        .orderBy(col("doc_id"))
    },
    Some("""WITH sm AS (SELECT doc_id,
          unnest(generate_series(1, 5 + doc_id % 6)) AS smp
        FROM documents),
      ag AS (SELECT doc_id, count(*) AS n,
          sum(CASE WHEN (doc_id * 31 + smp * 17) % 10 < doc_id % 4
            THEN 1 ELSE 0 END) AS c
        FROM sm GROUP BY doc_id)
      SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
        CAST(c AS BIGINT) AS n_correct,
        CAST(1000000 -
          (CASE WHEN n - c >= 3 THEN (n - c) * (n - c - 1) * (n - c - 2)
            ELSE 0 END) * 1000000 // (n * (n - 1) * (n - 2))
          AS BIGINT) AS pass_at_3_ppm
      FROM ag ORDER BY doc_id"""))

  // ---- q341: majority-vote / self-consistency scoring ---------------------
  // Self-consistency (sample n chains, answer by majority): per
  // problem the most common answer with deterministic tie-break
  // (votes DESC, answer ASC) and the agreement ppm. The rank is the
  // heap-rewritten row_number()=1 idiom (EvalOpsSpec plan-asserts);
  // totals come from a second map-side aggregate, never a window
  // over vote rows. The fixture deals each sample one of ≤3 token
  // answers with vote splits that force ties on some problems.

  private[queries] val q341: GraftQuery = GraftQuery(
    "q341_majority_vote",
    (s, d) => {
      val idx = (col("doc_id") * 7 + col("smp") * col("smp")) % 3
      val samples = docs(s, d)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(1L), lit(4L) + col("doc_id") % 5))
            .as("smp"))
        .withColumn("answer",
          coalesce(try_element_at(whitespaceTokens(col("text")),
            (idx + 1).cast(IntegerType)), lit("~")))
      graft.operators.EvalOps.majorityVote(samples, "doc_id", "answer")
        .orderBy(col("doc_id"))
    },
    Some("""WITH sm AS (SELECT doc_id, text,
          unnest(generate_series(1, 4 + doc_id % 5)) AS smp
        FROM documents),
      an AS (SELECT doc_id, coalesce(
          list_filter(regexp_split_to_array(lower(text), '\s+'),
            x -> length(x) > 0)[CAST((doc_id * 7 + smp * smp) % 3 + 1
              AS BIGINT)], '~') AS answer
        FROM sm),
      ct AS (SELECT doc_id, answer, count(*) AS votes
        FROM an GROUP BY doc_id, answer),
      tt AS (SELECT doc_id, count(*) AS n_samples FROM an GROUP BY doc_id),
      r AS (SELECT doc_id, answer, votes, row_number() OVER (
          PARTITION BY doc_id ORDER BY votes DESC, answer) AS rn
        FROM ct)
      SELECT r.doc_id, CAST(tt.n_samples AS BIGINT) AS n_samples,
        r.answer AS majority_answer, CAST(r.votes AS BIGINT) AS votes,
        CAST(r.votes * 1000000 // tt.n_samples AS BIGINT)
          AS agreement_ppm
      FROM r JOIN tt ON r.doc_id = tt.doc_id
      WHERE rn = 1 ORDER BY r.doc_id"""))

  // ---- q343: calibration buckets (reliability diagram / ECE census) -------
  // Confidence-quality auditing for scored outputs (classifier gates,
  // eval scorers): ppm confidences bucketed into deciles, each
  // reporting size, mean confidence, accuracy and the |acc − conf|
  // gap — ECE is the caller's n-weighted mean over these rows. The
  // fixture draws a pseudo-uniform correctness against the confidence
  // itself, so buckets are roughly calibrated with deterministic
  // deviations the oracle recomputes exactly.

  private[queries] val q343: GraftQuery = GraftQuery(
    "q343_calibration",
    (s, d) => {
      val samples = docs(s, d).select(col("doc_id"),
        ((col("doc_id") * 131071) % 1000000).as("conf"),
        ((col("doc_id") * 104729 + 11) % 1000000 <
          (col("doc_id") * 131071) % 1000000).as("ok"))
      graft.operators.EvalOps
        .calibrationBuckets(samples, "conf", "ok", nBuckets = 10)
        .orderBy(col("bucket"))
    },
    Some("""WITH s0 AS (SELECT doc_id, (doc_id * 131071) % 1000000 AS conf,
          (doc_id * 104729 + 11) % 1000000 < (doc_id * 131071) % 1000000 AS ok
        FROM documents),
      b AS (SELECT least(conf // 100000, 9) AS bucket, count(*) AS n,
          sum(conf) AS cs, sum(CASE WHEN ok THEN 1 ELSE 0 END) AS okn
        FROM s0 GROUP BY 1)
      SELECT CAST(bucket AS BIGINT) AS bucket, n,
        CAST(cs // n AS BIGINT) AS mean_conf_ppm,
        CAST(okn * 1000000 // n AS BIGINT) AS acc_ppm,
        CAST(abs(okn * 1000000 // n - cs // n) AS BIGINT) AS gap_ppm
      FROM b ORDER BY bucket"""))

  // ---- q344: inter-annotator agreement (Cohen's kappa) --------------------
  // The label-quality gate preference/SFT pipelines run before
  // trusting an annotation batch: per source, observed vs chance
  // agreement and κ in integer milli. The fixture gives rater B a
  // deterministic 70% copy of rater A over 3 labels (the disagreeing
  // 30% never coincides — offset 1..2 mod 3), so po is exact and pe
  // follows the marginals. Some sources land NEGATIVE κ, and this
  // oracle is the live cross-engine evidence that Spark's div and
  // DuckDB's // agree there: BOTH truncate toward zero (measured r14
  // while investigating ADVICE r13, whose floor-vs-truncate premise
  // was the reverse — a floor-division "fix" flipped these rows by
  // exactly 1 milli). EvalOpsSpec pins a below-chance batch.

  private[queries] val q344: GraftQuery = GraftQuery(
    "q344_annotator_kappa",
    (s, d) => {
      val a = (col("doc_id") * 13) % 3
      val b = when((col("doc_id") * 29) % 10 < 7, a)
        .otherwise((a + 1 + col("doc_id") % 2) % 3)
      val labeled = docs(s, d).select(col("source"), col("doc_id"),
        concat(lit("l"), a.cast(StringType)).as("la"),
        concat(lit("l"), b.cast(StringType)).as("lb"))
      graft.operators.EvalOps.cohenKappa(labeled, "source", "la", "lb")
    },
    Some("""WITH s0 AS (SELECT source, doc_id,
          'l' || ((doc_id * 13) % 3) AS la,
          'l' || (CASE WHEN (doc_id * 29) % 10 < 7 THEN (doc_id * 13) % 3
            ELSE ((doc_id * 13) % 3 + 1 + doc_id % 2) % 3 END) AS lb
        FROM documents),
      nn AS (SELECT source, count(*) AS n,
          sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS m
        FROM s0 GROUP BY source),
      am AS (SELECT source, la, count(*) AS ca FROM s0 GROUP BY source, la),
      bm AS (SELECT source, lb, count(*) AS cb FROM s0 GROUP BY source, lb),
      pe AS (SELECT am.source, sum(ca * cb) AS ab
        FROM am JOIN bm ON am.source = bm.source AND am.la = bm.lb
        GROUP BY am.source)
      SELECT nn.source, CAST(nn.n AS BIGINT) AS n,
        CAST(m * 1000000 // nn.n AS BIGINT) AS po_ppm,
        CAST(coalesce(ab * 1000000 // (nn.n * nn.n), 0) AS BIGINT)
          AS pe_ppm,
        CAST(CASE WHEN coalesce(ab * 1000000 // (nn.n * nn.n), 0)
            = 1000000 THEN NULL
          ELSE (m * 1000000 // nn.n
              - coalesce(ab * 1000000 // (nn.n * nn.n), 0)) * 1000
            // (1000000 - coalesce(ab * 1000000 // (nn.n * nn.n), 0))
          END AS BIGINT) AS kappa_milli
      FROM nn LEFT JOIN pe ON nn.source = pe.source
      ORDER BY nn.source"""))

  // ---- q342: per-language tokenizer fertility -----------------------------
  // The tokenizer-equity report every multilingual pipeline publishes:
  // fertility (tokens per word) by language under the learned
  // vocabulary — a vocabulary trained on skewed data tokenizes the
  // tail languages into fragments, and this census is where that
  // shows up BEFORE training pays for it. Pure composition: the
  // q154 encode (zero-shuffle vocabulary-folded replaces) aggregated
  // by the corpus lang column; non-ASCII words are counted but not
  // encoded (the learner's census contract — zh's low ascii share is
  // itself part of the report). Integer milli-ratios.

  private[queries] val q342: GraftQuery = GraftQuery(
    "q342_tokenizer_fertility",
    (s, d) => {
      val counts = graft.operators.Bpe.bpeTokenCounts(
        docs(s, d), "doc_id", "text", bpeMerges(s, d))
      docs(s, d).select(col("doc_id"), col("lang"))
        .join(counts, Seq("doc_id"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("n_words"),
          sum(col("n_ascii_words")).as("n_ascii_words"),
          sum(col("n_tokens")).as("n_tokens"))
        .select(col("lang"), col("n_docs"), col("n_words"),
          col("n_ascii_words"), col("n_tokens"),
          // fertility over the ENCODED (ascii) words; 0 when a lang
          // has none — never a divide error
          when(col("n_ascii_words") === 0, 0L)
            .otherwise(expr("n_tokens * 1000L div n_ascii_words"))
            .as("fertility_milli"),
          when(col("n_words") === 0, 0L)
            .otherwise(expr("n_ascii_words * 1000000L div n_words"))
            .as("ascii_share_ppm"))
        .orderBy(col("lang"))
    },
    Some(s"""WITH dtoks AS (SELECT doc_id, unnest(list_filter(
        regexp_split_to_array(lower(text), '\\s+'),
        x -> length(x) > 0)) AS w FROM documents),
      wc AS (SELECT w, count(*) AS n FROM dtoks
        WHERE regexp_matches(w, '^[\\x21-\\x7e]+$$') GROUP BY w),
      w0 AS (SELECT regexp_replace(w, '(.)',
          chr(31) || '\\1' || chr(31), 'g') AS w, n FROM wc),
      ${bpeRoundSql(1, "w0")},
      ${bpeRoundSql(2, "w1")},
      ${bpeRoundSql(3, "w2")},
      ${bpeRoundSql(4, "w3")},
      dw AS (SELECT doc_id, w,
          regexp_matches(w, '^[\\x21-\\x7e]+$$') AS ok FROM dtoks),
      de AS (SELECT doc_id, ok,
          CASE WHEN ok THEN
            replace(replace(replace(replace(
              regexp_replace(w, '(.)', chr(31) || '\\1' || chr(31), 'g'),
              chr(31) || m1.l || chr(31) || chr(31) || m1.r || chr(31),
              chr(31) || m1.l || m1.r || chr(31)),
              chr(31) || m2.l || chr(31) || chr(31) || m2.r || chr(31),
              chr(31) || m2.l || m2.r || chr(31)),
              chr(31) || m3.l || chr(31) || chr(31) || m3.r || chr(31),
              chr(31) || m3.l || m3.r || chr(31)),
              chr(31) || m4.l || chr(31) || chr(31) || m4.r || chr(31),
              chr(31) || m4.l || m4.r || chr(31))
          END AS we
        FROM dw, m1, m2, m3, m4),
      ag AS (SELECT doc_id,
          count(*) AS n_words,
          count(*) FILTER (WHERE ok) AS n_ascii_words,
          coalesce(sum((length(we) - length(replace(we, chr(31), ''))) // 2)
            FILTER (WHERE ok), 0) AS n_tokens
        FROM de GROUP BY doc_id),
      lg AS (SELECT d.lang,
          count(*) AS n_docs,
          sum(coalesce(a.n_words, 0)) AS n_words,
          sum(coalesce(a.n_ascii_words, 0)) AS n_ascii_words,
          sum(coalesce(a.n_tokens, 0)) AS n_tokens
        FROM documents d LEFT JOIN ag a USING (doc_id)
        GROUP BY d.lang)
      SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
        CAST(n_words AS BIGINT) AS n_words,
        CAST(n_ascii_words AS BIGINT) AS n_ascii_words,
        CAST(n_tokens AS BIGINT) AS n_tokens,
        CAST(CASE WHEN n_ascii_words = 0 THEN 0
          ELSE n_tokens * 1000 // n_ascii_words END AS BIGINT)
          AS fertility_milli,
        CAST(CASE WHEN n_words = 0 THEN 0
          ELSE n_ascii_words * 1000000 // n_words END AS BIGINT)
          AS ascii_share_ppm
      FROM lg ORDER BY lang"""))

  // ---- q324: duplicated-assistant-reply census ----------------------------
  // The boilerplate detector chat corpora need: an assistant reply
  // that recurs across MANY conversations ("i cannot help with
  // that", templated refusals, canned greetings) teaches the model
  // the template, not the behavior — SFT curation caps or drops
  // them. Replies are census'd by exact content across the ok
  // corpus; the fixture plants one such reply on the doc_id%31=6
  // slice (skipping rows the empty-content defect owns first), so
  // the census's head row is deterministic and the oracle decides
  // every count. The same digest-census shape as line dedup (q97),
  // one explode + one count shuffle on reply strings.

  private[queries] val q324: GraftQuery = GraftQuery(
    "q324_boilerplate_replies",
    (s, d) => {
      val parsed = chatRaw(s, d)
        .withColumn("_c", from_json(col("j"), ChatOps.chatSchema))
        .withColumn("_turns",
          call_function("no_inline", col("_c.messages")))
      parsed.filter(ChatOps.verdict(col("_turns")) === "ok")
        .select(col("doc_id").as("conv_id"),
          explode(filter(col("_turns"),
            t => t.getField("role") === "assistant")).as("t"))
        .select(col("conv_id"), col("t.content").as("reply"))
        .groupBy(col("reply"))
        .agg(count(lit(1)).as("n_uses"),
          count_distinct(col("conv_id")).as("n_convs"))
        .filter(col("n_uses") >= 2)
        .orderBy(col("n_uses").desc, col("reply"))
        .limit(20)
    },
    Some(s"""WITH $chatTurnsOracleCte,
      $chatVerdictOracleCte,
      ar AS (SELECT doc_id AS conv_id, unnest(list_transform(
          list_filter(turns, t -> t.role = 'assistant'),
          t -> t.content)) AS reply
        FROM rs WHERE reason = 'ok')
      SELECT reply, count(*) AS n_uses,
        count(DISTINCT conv_id) AS n_convs
      FROM ar GROUP BY reply HAVING count(*) >= 2
      ORDER BY n_uses DESC, reply LIMIT 20"""))

  // ---- q323: context-window fitting --------------------------------------
  // The truncation every chat trainer/server runs when a conversation
  // outgrows the window: keep the leading system prompt, keep the
  // longest SUFFIX of the rest whose render fits the budget, never
  // truncate to nothing (the final turn stays even when it alone
  // overflows — fits=false reports it). The oracle replays the
  // per-turn render cost, the prefix sums, the minimal-drop search
  // and the re-render of exactly the kept turns (md5-gated).

  private[queries] val q323: GraftQuery = GraftQuery(
    "q323_chat_context_fit",
    (s, d) =>
      ChatOps.fitContextFlat(chatRaw(s, d), "doc_id", "j", budget = 150L)
        .withColumnRenamed("doc_id", "conv_id")
        .orderBy(col("conv_id")),
    Some(contextFitOracle(budget = 150, idAlias = "conv_id")))

  /** Shared DuckDB replay of [[ChatOps.fitContext]] over the fixture
    * — parameterized on the budget so the Scala route (q323) and the
    * SQL door (q325) pin the same machinery at different depths. */
  private[queries] def contextFitOracle(budget: Int,
                                        idAlias: String): String =
    s"""WITH $chatTurnsOracleCte,
      $chatVerdictOracleCte,
      ok3 AS (SELECT doc_id, turns,
          turns[1].role = 'system' AS has_sys
        FROM rs WHERE reason = 'ok'),
      sp3 AS (SELECT doc_id, turns, has_sys,
          CASE WHEN has_sys THEN turns[2:] ELSE turns END AS body,
          CASE WHEN has_sys
            THEN 24 + len(turns[1].role) + len(turns[1].content)
            ELSE 0 END AS syslen
        FROM ok3),
      lp AS (SELECT doc_id, turns, has_sys, body, syslen,
          list_transform(body,
            t -> 24 + len(t.role) + len(t.content)) AS lens
        FROM sp3),
      mi AS (SELECT doc_id, turns, has_sys, body, syslen, lens,
          list_min(list_filter(generate_series(0, len(body) - 1),
            i -> syslen + list_sum(lens)
              - coalesce(list_sum(list_slice(lens, 1, i)), 0) <= $budget))
            AS min_i
        FROM lp),
      kp AS (SELECT doc_id,
          min_i IS NOT NULL AS fits,
          coalesce(min_i, len(body) - 1) AS n_dropped,
          list_concat(
            CASE WHEN has_sys THEN turns[1:1] ELSE [] END,
            list_slice(body,
              CAST(coalesce(min_i, len(body) - 1) + 1 AS BIGINT),
              len(body))) AS kept
        FROM mi),
      rr AS (SELECT doc_id, fits, CAST(n_dropped AS BIGINT) AS n_dropped,
          CAST(len(kept) AS BIGINT) AS n_kept,
          array_to_string(list_transform(kept,
            t -> '<|im_start|>' || t.role || chr(10) || t.content ||
              '<|im_end|>' || chr(10)), '') AS rendered
        FROM kp)
      SELECT doc_id AS $idAlias, n_kept, n_dropped, fits,
        CAST(len(rendered) AS BIGINT) AS kept_len,
        md5(rendered) AS kept_md5
      FROM rr ORDER BY $idAlias"""

  // ---- q320: preference pairs from SQL ----------------------------------
  // q314's operator through the injected preference_pairs table
  // function — same plan (heap-rewritten rn=1 both directions), same
  // oracle, reached from the parser path.

  private[queries] val q320: GraftQuery = GraftQuery(
    "q320_sql_preference_pairs",
    (s, d) => {
      promptScored(s, d).createOrReplaceTempView("pref_scored_sql")
      s.sql("""SELECT prompt_grp, chosen_id, chosen_score, rejected_id,
          rejected_score, gap
        FROM preference_pairs('pref_scored_sql', 'prompt_grp', 'doc_id',
          'score', 20)
        ORDER BY prompt_grp""")
    },
    q314.oracle)

  // ---- q319: chat-corpus decontamination (benchmark prompts) -----------
  // q65's gate pointed at the SFT corpus: an eval benchmark leaking
  // into instruction data arrives as a USER turn (the prompt), so the
  // probe text is the user-role concatenation per conversation — an
  // assistant turn sharing grams with the benchmark is a different
  // (answer-leak) policy and deliberately NOT this gate. Word-3-grams
  // (user contents are short fixture windows); the bench slice is the
  // doc_id % 13 = 4 documents — the very texts the fixture windows
  // were cut from, so planted contamination is guaranteed and the
  // oracle decides it row by row.

  private[queries] val q319: GraftQuery = GraftQuery(
    "q319_chat_decontamination",
    (s, d) => {
      val parsed = chatRaw(s, d)
        .withColumn("_c", from_json(col("j"), ChatOps.chatSchema))
        .withColumn("_turns",
          call_function("no_inline", col("_c.messages")))
      val convs = parsed.filter(ChatOps.verdict(col("_turns")) === "ok")
        .select(col("doc_id").as("conv_id"),
          ChatOps.roleConcat(col("_turns"), "user").as("user_text"))
      val bench = docs(s, d).filter(col("doc_id") % 13 === 4)
        .select(col("doc_id").as("conv_id"), col("text").as("user_text"))
      val cont = graft.operators.DatasetOps
        .contaminatedIds(convs, bench, "conv_id", "user_text", k = 3)
        .withColumn("_hit", lit(1))
      convs.join(cont, Seq("conv_id"), "left")
        .select(col("conv_id"), col("_hit").isNotNull.as("contaminated"))
        .orderBy(col("conv_id"))
    },
    Some(s"""WITH $chatTurnsOracleCte,
      $chatVerdictOracleCte,
      uc AS (SELECT doc_id AS conv_id,
          array_to_string(list_transform(list_filter(turns,
            t -> t.role = 'user'), t -> t.content), ' ') AS user_text
        FROM rs WHERE reason = 'ok'),
      ut AS (SELECT conv_id, list_filter(
          regexp_split_to_array(lower(user_text), '\\s+'),
          x -> length(x) > 0) AS tk
        FROM uc),
      ug AS (SELECT conv_id, unnest(list_distinct(
          list_transform(generate_series(1, len(tk) - 2),
            i -> array_to_string(tk[i:i+2], ' ')))) AS gram
        FROM ut),
      bt AS (SELECT list_filter(
          regexp_split_to_array(lower(text), '\\s+'),
          x -> length(x) > 0) AS tk
        FROM documents WHERE doc_id % 13 = 4),
      bg AS (SELECT DISTINCT unnest(list_distinct(
          list_transform(generate_series(1, len(tk) - 2),
            i -> array_to_string(tk[i:i+2], ' ')))) AS gram
        FROM bt),
      cont AS (SELECT DISTINCT conv_id FROM ug JOIN bg USING (gram))
      SELECT uc.conv_id, c.conv_id IS NOT NULL AS contaminated
      FROM uc LEFT JOIN cont c ON uc.conv_id = c.conv_id
      ORDER BY uc.conv_id"""))

  // ---- q315: the SFT-prep operator from SQL ----------------------------
  // q312/q313's operator through the injected chat_flatten table
  // function — every column for every row (verdicts AND renders),
  // pinned row by row including the unparseable leg's null/zero
  // contract.

  private[queries] val q315: GraftQuery = GraftQuery(
    "q315_sql_chat_flatten",
    (s, d) => {
      chatRaw(s, d).createOrReplaceTempView("chat_raw_sql")
      s.sql("""SELECT doc_id, conv_id, reason, n_turns, rendered_len,
          rendered_md5, mask_spans, masked_chars
        FROM chat_flatten('chat_raw_sql', 'doc_id', 'j')
        ORDER BY doc_id""")
    },
    Some(s"""WITH $chatTurnsOracleCte,
      $chatVerdictOracleCte,
      $chatRenderOracleCte
      SELECT rs.doc_id,
        CASE WHEN corrupt THEN NULL ELSE rs.doc_id END AS conv_id,
        reason,
        CAST(CASE WHEN corrupt THEN 0 ELSE len(turns) END AS BIGINT)
          AS n_turns,
        CAST(coalesce(len(rendered), 0) AS BIGINT) AS rendered_len,
        md5(rendered) AS rendered_md5,
        coalesce(f.mask_spans, '') AS mask_spans,
        coalesce(f.masked_chars, 0) AS masked_chars
      FROM rs LEFT JOIN f ON rs.doc_id = f.doc_id
      ORDER BY rs.doc_id"""))

  // ---- q333: tool-role conversations (verdict + render + masks) --------
  // VERDICT r12 Missing #1: tool-augmented transcripts are a corpus
  // class, not a defect — until r13 every one of them quarantined as
  // unknown_role. The fixture's two tool slices pin all three policy
  // decisions row by row: placement grammar (a tool RESULT after a
  // user/system turn is tool_out_of_place; after the assistant that
  // called it, legal — %43=9 vs %37=8), the render (tool turns render
  // as ordinary ChatML segments), and the mask policy (tool content
  // NEVER enters a loss span — an implementation that masked tool
  // output would add spans and flip the hash; the assistant reply
  // AFTER the tool result IS masked, which is the behavior taught).

  private[queries] val q333: GraftQuery = GraftQuery(
    "q333_chat_tool_role",
    (s, d) =>
      ChatOps.flatten(
          chatRaw(s, d).filter(col("doc_id") % 37 === 8 ||
            col("doc_id") % 43 === 9),
          "doc_id", "j")
        .select(col("doc_id"), col("reason"), col("n_turns"),
          col("rendered_len"), col("rendered_md5"), col("mask_spans"),
          col("masked_chars"))
        .orderBy(col("doc_id")),
    Some(s"""WITH $chatTurnsOracleCte,
      $chatVerdictOracleCte,
      $chatRenderOracleCte
      SELECT rs.doc_id, reason,
        CAST(CASE WHEN corrupt THEN 0 ELSE len(turns) END AS BIGINT)
          AS n_turns,
        CAST(coalesce(len(rendered), 0) AS BIGINT) AS rendered_len,
        md5(rendered) AS rendered_md5,
        coalesce(f.mask_spans, '') AS mask_spans,
        coalesce(f.masked_chars, 0) AS masked_chars
      FROM rs LEFT JOIN f ON rs.doc_id = f.doc_id
      WHERE rs.doc_id % 37 = 8 OR rs.doc_id % 43 = 9
      ORDER BY rs.doc_id"""))

  // ---- q339: STRUCTURED tool calls (parse → correlate → render → mask) --
  // The second half of VERDICT r12 Missing #1: beyond the tool ROLE,
  // modern corpora carry machine-readable tool_calls on assistant
  // turns and answer them by id. chatToolSchema parses the superset;
  // verdictTools adds the correlation leg (a tool RESULT must answer
  // its caller's id — the %59 slice answers with a wrong id and
  // quarantines as tool_call_mismatch); resolveToolCalls folds each
  // call into its assistant turn's content as
  // <tool_call>name\nargs</tool_call> — the call is the MODEL's
  // output, so it lands INSIDE the loss mask (emitting the call is
  // the behavior taught), while the tool result stays unmasked
  // context. After that one projection every downstream operator
  // (render, spans, fitting, packing) runs unchanged. The oracle
  // rebuilds both slices' turns, the effective contents, the fixed
  // 4-turn cursor arithmetic and both spans — so a wrong fold order,
  // a missed exemption, or a mask leaking into the tool result flips
  // the hash.

  private[queries] val q339: GraftQuery = GraftQuery(
    "q339_tool_calls",
    (s, d) => {
      val slice = chatRaw(s, d)
        .filter(col("doc_id") % 53 === 12 || col("doc_id") % 59 === 13)
      val parsed = slice
        .withColumn("_c", from_json(col("j"), ChatOps.chatToolSchema))
        .withColumn("_raw", call_function("no_inline", col("_c.messages")))
        .withColumn("_turns", call_function("no_inline",
          ChatOps.resolveToolCalls(col("_raw"))))
      val rendered = ChatOps.renderChatML(col("_turns"))
      parsed.select(col("doc_id"),
          ChatOps.verdictTools(col("_raw")).as("reason"),
          when(col("_raw").isNull, 0L)
            .otherwise(size(col("_raw")).cast(LongType)).as("n_turns"),
          when(col("_raw").isNull, 0L)
            .otherwise(length(rendered).cast(LongType)).as("rendered_len"),
          when(col("_raw").isNull, lit(null).cast(StringType))
            .otherwise(md5(rendered)).as("rendered_md5"),
          when(col("_raw").isNull, lit(""))
            .otherwise(ChatOps.lossMaskSpans(col("_turns")))
            .as("mask_spans"),
          when(col("_raw").isNull, 0L)
            .otherwise(ChatOps.maskedChars(col("_turns")))
            .as("masked_chars"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH td AS (
        SELECT doc_id, doc_id % 41 = 11 AS corrupt,
          doc_id % 59 = 13 AND doc_id % 53 <> 12 AS bad_ref,
          ${toolContentSql(0)} AS c0, ${toolContentSql(1)} AS c1,
          ${toolContentSql(2)} AS c2, ${toolContentSql(3)} AS c3,
          ${toolContentSql(4)} AS c4
        FROM documents WHERE doc_id % 53 = 12 OR doc_id % 59 = 13),
      tv AS (SELECT doc_id, corrupt, bad_ref, c0, c3, c4,
          c1 || '<tool_call>search' || chr(10) || c2 || '</tool_call>'
            AS e1,
          CASE WHEN corrupt THEN 'unparseable'
            WHEN len(c0) = 0 OR len(c3) = 0 OR len(c4) = 0
              THEN 'empty_content'
            WHEN bad_ref THEN 'tool_call_mismatch'
            ELSE 'ok' END AS reason
        FROM td),
      tr AS (SELECT doc_id,
          '<|im_start|>user' || chr(10) || c0 || '<|im_end|>' || chr(10)
            || '<|im_start|>assistant' || chr(10) || e1 || '<|im_end|>'
            || chr(10) || '<|im_start|>tool' || chr(10) || c3
            || '<|im_end|>' || chr(10) || '<|im_start|>assistant'
            || chr(10) || c4 || '<|im_end|>' || chr(10) AS rendered,
          CAST(28 + len(c0) AS BIGINT) AS l1,
          CAST(33 + len(e1) AS BIGINT) AS l2,
          CAST(28 + len(c3) AS BIGINT) AS l3,
          CAST(len(e1) AS BIGINT) AS le1, CAST(len(c4) AS BIGINT) AS lc4
        FROM tv WHERE NOT corrupt)
      SELECT tv.doc_id, tv.reason,
        CAST(CASE WHEN corrupt THEN 0 ELSE 4 END AS BIGINT) AS n_turns,
        CAST(coalesce(len(tr.rendered), 0) AS BIGINT) AS rendered_len,
        md5(tr.rendered) AS rendered_md5,
        coalesce((tr.l1 + 22) || '-' || (tr.l1 + 22 + tr.le1) || ';' ||
          (tr.l1 + tr.l2 + tr.l3 + 22) || '-' ||
          (tr.l1 + tr.l2 + tr.l3 + 22 + tr.lc4), '') AS mask_spans,
        CAST(coalesce(tr.le1 + tr.lc4, 0) AS BIGINT) AS masked_chars
      FROM tv LEFT JOIN tr ON tv.doc_id = tr.doc_id
      ORDER BY tv.doc_id"""))

  // ---- q334: TOKEN-budget context fitting ------------------------------
  // VERDICT r12 Missing #2: q323/q325 budget CHARACTERS; a trainer's
  // window holds TOKENS. Same keep-system / longest-fitting-suffix /
  // never-empty policy, with per-turn costs from the LEARNED BPE
  // vocabulary (q152's 4 merges): 4 framing tokens + the content's
  // encoded token count. The oracle re-learns the merges from the
  // same corpus census, re-encodes every turn's words, rebuilds the
  // per-turn costs, and replays the prefix sums and the minimal-drop
  // search — so a drifted merge, a wrong framing constant, or a
  // character budget smuggled back in flips the hash. Budget 30
  // tokens lands a mix of deep drops and overflowing final turns
  // (fits=false), exercising both legs.

  private[queries] val q334: GraftQuery = GraftQuery(
    "q334_token_context_fit",
    (s, d) =>
      ChatOps.fitContextTokensFlat(chatRaw(s, d), "doc_id", "j",
          budget = 30L, merges = bpeMerges(s, d))
        .withColumnRenamed("doc_id", "conv_id")
        .orderBy(col("conv_id")),
    Some(s"""WITH $chatTurnsOracleCte,
      $chatVerdictOracleCte,
      dtoks AS (SELECT doc_id, unnest(list_filter(
          regexp_split_to_array(lower(text), '\\s+'),
          x -> length(x) > 0)) AS w FROM documents),
      wc AS (SELECT w, count(*) AS n FROM dtoks
        WHERE regexp_matches(w, '^[\\x21-\\x7e]+$$') GROUP BY w),
      w0 AS (SELECT regexp_replace(w, '(.)',
          chr(31) || '\\1' || chr(31), 'g') AS w, n FROM wc),
      ${bpeRoundSql(1, "w0")},
      ${bpeRoundSql(2, "w1")},
      ${bpeRoundSql(3, "w2")},
      ${bpeRoundSql(4, "w3")},
      u2 AS (SELECT doc_id, i, t.role AS role, t.content AS content
        FROM (SELECT doc_id, unnest(turns) AS t,
            unnest(generate_series(1, len(turns))) AS i
          FROM rs WHERE reason = 'ok')),
      tw AS (SELECT doc_id, i, unnest(list_filter(
          regexp_split_to_array(lower(content), '\\s+'),
          x -> length(x) > 0)) AS w
        FROM u2),
      te AS (SELECT doc_id, i,
          CASE WHEN regexp_matches(w, '^[\\x21-\\x7e]+$$') THEN
            replace(replace(replace(replace(
              regexp_replace(w, '(.)', chr(31) || '\\1' || chr(31), 'g'),
              chr(31) || m1.l || chr(31) || chr(31) || m1.r || chr(31),
              chr(31) || m1.l || m1.r || chr(31)),
              chr(31) || m2.l || chr(31) || chr(31) || m2.r || chr(31),
              chr(31) || m2.l || m2.r || chr(31)),
              chr(31) || m3.l || chr(31) || chr(31) || m3.r || chr(31),
              chr(31) || m3.l || m3.r || chr(31)),
              chr(31) || m4.l || chr(31) || chr(31) || m4.r || chr(31),
              chr(31) || m4.l || m4.r || chr(31))
          END AS we
        FROM tw, m1, m2, m3, m4),
      tc0 AS (SELECT doc_id, i,
          coalesce(sum(CASE WHEN we IS NULL THEN 0
            ELSE (length(we) - length(replace(we, chr(31), ''))) // 2 END),
            0) AS wtok
        FROM te GROUP BY doc_id, i),
      tcost AS (SELECT u2.doc_id, u2.i,
          4 + coalesce(t0.wtok, 0) AS cost
        FROM u2 LEFT JOIN tc0 t0 ON u2.doc_id = t0.doc_id AND u2.i = t0.i),
      ok4 AS (SELECT doc_id, turns, turns[1].role = 'system' AS has_sys
        FROM rs WHERE reason = 'ok'),
      bl AS (SELECT t.doc_id,
          coalesce(max(CASE WHEN o.has_sys AND t.i = 1 THEN t.cost END), 0)
            AS syslen,
          list(t.cost ORDER BY t.i) FILTER (WHERE NOT (o.has_sys AND t.i = 1))
            AS lens
        FROM tcost t JOIN ok4 o ON t.doc_id = o.doc_id
        GROUP BY t.doc_id),
      ft AS (SELECT o.doc_id, o.turns, o.has_sys, b.syslen, b.lens,
          CASE WHEN o.has_sys THEN o.turns[2:] ELSE o.turns END AS body,
          list_min(list_filter(generate_series(0, len(b.lens) - 1),
            i -> b.syslen + list_sum(b.lens)
              - coalesce(list_sum(list_slice(b.lens, 1, i)), 0) <= 30))
            AS min_i
        FROM ok4 o JOIN bl b ON o.doc_id = b.doc_id),
      kp4 AS (SELECT doc_id, min_i IS NOT NULL AS fits,
          coalesce(min_i, len(body) - 1) AS n_dropped,
          syslen + coalesce(list_sum(lens), 0)
            - coalesce(list_sum(list_slice(lens, 1,
                CAST(coalesce(min_i, len(body) - 1) AS BIGINT))), 0)
            AS kept_tokens,
          list_concat(CASE WHEN has_sys THEN turns[1:1] ELSE [] END,
            list_slice(body,
              CAST(coalesce(min_i, len(body) - 1) + 1 AS BIGINT),
              len(body))) AS kept
        FROM ft)
      SELECT doc_id AS conv_id, CAST(len(kept) AS BIGINT) AS n_kept,
        CAST(n_dropped AS BIGINT) AS n_dropped, fits,
        CAST(kept_tokens AS BIGINT) AS kept_tokens,
        md5(array_to_string(list_transform(kept,
          t -> '<|im_start|>' || t.role || chr(10) || t.content ||
            '<|im_end|>' || chr(10)), '')) AS kept_md5
      FROM kp4 ORDER BY conv_id"""))

  // ---- q335: best-of-n / rejection-sampling selection -------------------
  // VERDICT r12 Missing #4: preferencePairs extracts (top, bottom);
  // the SFT-augmentation sibling selects, per prompt group, the top-k
  // responses ABOVE a score floor. The rank idiom is row_number()<=k,
  // heap-rewritten into TopKPerGroup (plan-asserted in ChatOpsSpec) —
  // per-group state is k rows at any corpus size. floor=50 drops
  // whole groups (every response rejected) and truncates others
  // below k, so both gates decide rows the oracle checks.

  private[queries] val q335: GraftQuery = GraftQuery(
    "q335_best_of_n",
    (s, d) =>
      ChatOps.bestOfN(promptScored(s, d), "prompt_grp", "doc_id", "score",
          k = 3, floor = 50L)
        .orderBy(col("prompt_grp"), col("rank")),
    Some("""WITH s0 AS (
        SELECT source || '#' || (doc_id % 25) AS prompt_grp, doc_id,
          CAST(len(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT)
            AS score
        FROM documents),
      r AS (SELECT prompt_grp, doc_id, score,
          row_number() OVER (PARTITION BY prompt_grp
            ORDER BY score DESC, doc_id) AS rank
        FROM s0 WHERE score >= 50)
      SELECT prompt_grp, CAST(rank AS BIGINT) AS rank, doc_id, score
      FROM r WHERE rank <= 3 ORDER BY prompt_grp, rank"""))

  // ---- q337: the composed SFT recipe -------------------------------------
  // VERDICT r12 Missing #3: every other tier has its end-to-end recipe
  // query (q75, q102, q263, q304); this is the chat tier's — validate
  // → boilerplate-reply gate (q324's census as a filter: a reply
  // shared by ≥3 conversations teaches the template, not the
  // behavior) → conversation near-dup keep-first (q330's verified
  // pair table, base corpus, higher id drops) → benchmark
  // decontamination on USER text (q319's gate) → context fitting at
  // 150 chars → deterministic packing (512-char sequences, 4 md5
  // shards, salt 'sftr') → loss masks in packed coordinates — ONE
  // plan whose interop contract is the point. Emits one row per stage
  // boundary: surviving count, mass (masked chars through stage 4,
  // kept render bytes at stage 5, masked piece mass at stage 6), and
  // an order-independent membership checksum (Σ 32-bit md5 of the
  // surviving conv ids; shard/seq coordinates at stage 6), so the
  // oracle decides WHICH conversations crossed every boundary, not
  // just how many. Scale shape: one narrow parse materialized once
  // (localCheckpoint), census-bounded broadcast gates, pair table
  // read from its parquet materialization, one 4-shard window for
  // the pack — the q304 discipline.

  private[queries] val q337: GraftQuery = GraftQuery(
    "q337_sft_recipe",
    (s, d) => {
      import graft.operators.DatasetOps
      // the corpus a recipe actually receives: the validated base
      // conversations PLUS the aggregator-feed duplicates (q330's two
      // twin classes — byte-identical re-IDs and system-prompt
      // paraphrases), so the near-dup stage has real work to do and
      // keep-first provably keeps the ORIGINAL (twins carry higher ids)
      val parsedOk = chatRaw(s, d)
        .withColumn("_c", from_json(col("j"), ChatOps.chatSchema))
        .withColumn("_turns", call_function("no_inline", col("_c.messages")))
        .filter(ChatOps.verdict(col("_turns")) === "ok")
        .select(col("doc_id"), col("_turns"))
      val sysT = struct(lit("system").as("role"),
        lit("stay factual").as("content"))
      val ok = parsedOk
        .select(col("doc_id").as("conv_id"), col("_turns").as("turns"))
        .union(parsedOk.filter(col("doc_id") % 6 === 1)
          .select((col("doc_id") + 100000L).as("conv_id"),
            col("_turns").as("turns")))
        .union(parsedOk.filter(col("doc_id") % 6 === 2)
          .select((col("doc_id") + 200000L).as("conv_id"),
            concat(array(sysT), col("_turns")).as("turns")))
        .select(col("conv_id"), col("turns"),
          ChatOps.maskedChars(col("turns")).as("masked_chars"))
        .localCheckpoint()
      val replies = ok.select(col("conv_id"),
          explode(filter(col("turns"),
            t => t.getField("role") === "assistant")).as("t"))
        .select(col("conv_id"), col("t.content").as("reply"))
      val boiler = replies.groupBy(col("reply"))
        .agg(count_distinct(col("conv_id")).as("nc"))
        .filter(col("nc") >= 3).select(col("reply"))
      // the three drop-id sets are materialized (r17): every stage()
      // census re-derives its anti-join CHAIN, so the boilerplate
      // census ran 4× and the decontamination shingle pass 3× in one
      // plan (r16 bench: 1366 tasks / 36 stages, cpu_frac 0.35);
      // checkpointed id lists are conv-id-sized, and Spark 4 carries
      // their stats so the anti-joins still broadcast
      val boilerIds = replies.join(broadcast(boiler), Seq("reply"))
        .select(col("conv_id")).distinct()
        .localCheckpoint()
      val s2 = ok.join(boilerIds, Seq("conv_id"), "left_anti")
      // keep-first: the HIGHER id of every verified near-dup pair
      // drops (q330's materialized pair table over this very corpus —
      // twins always carry the higher id, so originals survive)
      val dupIds = chatPairsMaterialized(s, d)
        .select(col("idB").as("conv_id")).distinct()
        .localCheckpoint()
      val s3 = s2.join(dupIds, Seq("conv_id"), "left_anti")
      val users = s3.select(col("conv_id"),
        ChatOps.roleConcat(col("turns"), "user").as("user_text"))
      val bench = docs(s, d).filter(col("doc_id") % 13 === 4)
        .select(col("doc_id").as("conv_id"), col("text").as("user_text"))
      val contIds = DatasetOps.contaminatedIds(users, bench,
        "conv_id", "user_text", k = 3).localCheckpoint()
      val s4 = s3.join(contIds, Seq("conv_id"), "left_anti")
      val fitted = s4.withColumn("_f",
          call_function("no_inline",
            ChatOps.fitContext(col("turns"), lit(150L))))
        .select(col("conv_id"),
          length(ChatOps.renderChatML(col("_f.kept"))).cast(LongType)
            .as("kept_len"),
          ChatOps.lossMaskSpanStructs(col("_f.kept")).as("spans"))
        .localCheckpoint()
      val packed = ChatOps.packedMaskPieces(fitted, "conv_id", "kept_len",
          "spans", seqLen = 512, nShards = 4, salt = "sftr")
        .groupBy(col("shard"), col("seq"))
        .agg(sum(col("piece_e") - col("piece_s")).as("m"))
      def cs(idc: Column): Column =
        conv(substring(md5(idc.cast(StringType)), 1, 8), 16, 10)
          .cast(LongType)
      def stage(name: String, df: org.apache.spark.sql.DataFrame,
                mass: Column) =
        df.agg(count(lit(1)).cast(LongType).as("n_convs"),
            coalesce(sum(mass), lit(0L)).cast(LongType).as("mass"),
            coalesce(sum(cs(col("conv_id"))), lit(0L)).cast(LongType)
              .as("checksum"))
          .select(lit(name).as("stage"), col("n_convs"), col("mass"),
            col("checksum"))
      val st6 = packed
        .agg(count(lit(1)).cast(LongType).as("n_convs"),
          coalesce(sum(col("m")), lit(0L)).cast(LongType).as("mass"),
          coalesce(sum(col("shard") * 100000L + col("seq")), lit(0L))
            .cast(LongType).as("checksum"))
        .select(lit("6_packed").as("stage"), col("n_convs"), col("mass"),
          col("checksum"))
      stage("1_ok", ok, col("masked_chars"))
        .union(stage("2_boilerplate", s2, col("masked_chars")))
        .union(stage("3_neardup", s3, col("masked_chars")))
        .union(stage("4_decontam", s4, col("masked_chars")))
        .union(stage("5_fit", fitted, col("kept_len")))
        .union(st6)
        .orderBy(col("stage"))
    },
    Some(s"""WITH $chatTurnsOracleCte,
      $chatVerdictOracleCte,
      okr9 AS (SELECT doc_id, turns FROM rs WHERE reason = 'ok'),
      corp AS (
        SELECT doc_id AS conv_id, turns FROM okr9
        UNION ALL
        SELECT doc_id + 100000, turns FROM okr9 WHERE doc_id % 6 = 1
        UNION ALL
        SELECT doc_id + 200000,
          list_prepend({'role': 'system', 'content': 'stay factual'},
            turns)
          FROM okr9 WHERE doc_id % 6 = 2),
      ok AS (SELECT conv_id, turns,
          CAST(coalesce(list_sum(list_transform(
            list_filter(turns, t -> t.role = 'assistant'),
            t -> len(t.content))), 0) AS BIGINT) AS masked_chars
        FROM corp),
      ar2 AS (SELECT conv_id, unnest(list_transform(
          list_filter(turns, t -> t.role = 'assistant'),
          t -> t.content)) AS reply
        FROM ok),
      bo AS (SELECT reply FROM ar2 GROUP BY reply
        HAVING count(DISTINCT conv_id) >= 3),
      bc AS (SELECT DISTINCT conv_id FROM ar2 JOIN bo USING (reply)),
      s2 AS (SELECT * FROM ok
        WHERE conv_id NOT IN (SELECT conv_id FROM bc)),
      rt AS (SELECT conv_id, array_to_string(list_transform(turns,
          t -> '<|im_start|>' || t.role || chr(10) || t.content ||
            '<|im_end|>' || chr(10)), '') AS rtext
        FROM ok),
      tk9 AS (SELECT conv_id, list_filter(
          string_split_regex(lower(rtext), '\\s+'),
          t -> len(t) > 0) AS tk
        FROM rt),
      sh9 AS (SELECT conv_id, CASE WHEN len(tk) >= 3
          THEN list_distinct(list_transform(
            generate_series(1, len(tk) - 2),
            i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2]))
          ELSE [] END AS sh
        FROM tk9),
      dup9 AS (SELECT DISTINCT b.conv_id
        FROM sh9 a JOIN sh9 b ON a.conv_id < b.conv_id
        WHERE len(a.sh) > 0 AND len(b.sh) > 0
          AND len(list_intersect(a.sh, b.sh)) * 1.0 /
              len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
      s3 AS (SELECT * FROM s2
        WHERE conv_id NOT IN (SELECT conv_id FROM dup9)),
      uc9 AS (SELECT conv_id, array_to_string(list_transform(
          list_filter(turns, t -> t.role = 'user'),
          t -> t.content), ' ') AS user_text
        FROM s3),
      ut9 AS (SELECT conv_id, list_filter(
          regexp_split_to_array(lower(user_text), '\\s+'),
          x -> length(x) > 0) AS tk
        FROM uc9),
      ug9 AS (SELECT conv_id, unnest(list_distinct(
          list_transform(generate_series(1, len(tk) - 2),
            i -> array_to_string(tk[i:i+2], ' ')))) AS gram
        FROM ut9),
      bt9 AS (SELECT list_filter(
          regexp_split_to_array(lower(text), '\\s+'),
          x -> length(x) > 0) AS tk
        FROM documents WHERE doc_id % 13 = 4),
      bg9 AS (SELECT DISTINCT unnest(list_distinct(
          list_transform(generate_series(1, len(tk) - 2),
            i -> array_to_string(tk[i:i+2], ' ')))) AS gram
        FROM bt9),
      cont9 AS (SELECT DISTINCT conv_id FROM ug9 JOIN bg9 USING (gram)),
      s4 AS (SELECT * FROM s3
        WHERE conv_id NOT IN (SELECT conv_id FROM cont9)),
      fo AS (SELECT conv_id, turns, turns[1].role = 'system' AS has_sys
        FROM s4),
      fs AS (SELECT conv_id, turns, has_sys,
          CASE WHEN has_sys THEN turns[2:] ELSE turns END AS body,
          CASE WHEN has_sys
            THEN 24 + len(turns[1].role) + len(turns[1].content)
            ELSE 0 END AS syslen
        FROM fo),
      fl AS (SELECT conv_id, turns, has_sys, body, syslen,
          list_transform(body,
            t -> 24 + len(t.role) + len(t.content)) AS lens
        FROM fs),
      fm AS (SELECT conv_id, turns, has_sys, body, syslen, lens,
          list_min(list_filter(generate_series(0, len(body) - 1),
            i -> syslen + list_sum(lens)
              - coalesce(list_sum(list_slice(lens, 1, i)), 0) <= 150))
            AS min_i
        FROM fl),
      fk AS (SELECT conv_id,
          list_concat(CASE WHEN has_sys THEN turns[1:1] ELSE [] END,
            list_slice(body,
              CAST(coalesce(min_i, len(body) - 1) + 1 AS BIGINT),
              len(body))) AS kept
        FROM fm),
      fr AS (SELECT conv_id, kept,
          CAST(len(array_to_string(list_transform(kept,
            t -> '<|im_start|>' || t.role || chr(10) || t.content ||
              '<|im_end|>' || chr(10)), '')) AS BIGINT) AS kept_len
        FROM fk),
      ku AS (SELECT conv_id, unnest(kept) AS t,
          unnest(generate_series(1, len(kept))) AS i
        FROM fk),
      kr AS (SELECT conv_id, i, t.role AS role, t.content AS content,
          '<|im_start|>' || t.role || chr(10) || t.content ||
            '<|im_end|>' || chr(10) AS seg
        FROM ku),
      kq AS (SELECT conv_id, i, role, content, seg,
          coalesce(sum(len(seg)) OVER (PARTITION BY conv_id ORDER BY i
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pos
        FROM kr),
      dl AS (SELECT conv_id, kept_len,
          CAST(concat('0x', substring(md5('sftr:' || conv_id), 1, 8))
            AS BIGINT) AS u
        FROM fr),
      dl2 AS (SELECT conv_id, kept_len, u, u % 4 AS shard,
          coalesce(sum(kept_len) OVER (PARTITION BY u % 4
            ORDER BY u, conv_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        FROM dl),
      sp9 AS (SELECT kq.conv_id, dl2.shard,
          CAST(dl2.off + pos + 13 + len(role) AS BIGINT) AS gs,
          CAST(dl2.off + pos + 13 + len(role) + len(content) AS BIGINT)
            AS ge
        FROM kq JOIN dl2 ON kq.conv_id = dl2.conv_id
        WHERE kq.role = 'assistant' AND len(content) > 0),
      pc9 AS (SELECT shard, gs, ge,
          unnest(generate_series(gs // 512, (ge - 1) // 512)) AS seq
        FROM sp9),
      pc10 AS (SELECT shard, CAST(seq AS BIGINT) AS seq,
          greatest(gs, seq * 512) - seq * 512 AS ps,
          least(ge, (seq + 1) * 512) - seq * 512 AS pe
        FROM pc9),
      st6 AS (SELECT shard, seq, sum(pe - ps) AS m
        FROM pc10 GROUP BY shard, seq),
      cks AS (SELECT conv_id,
          CAST(concat('0x', substring(md5(CAST(conv_id AS VARCHAR)), 1, 8))
            AS BIGINT) AS h
        FROM ok)
      SELECT stage, n_convs, mass, checksum FROM (
        SELECT '1_ok' AS stage, count(*) AS n_convs,
          CAST(coalesce(sum(masked_chars), 0) AS BIGINT) AS mass,
          CAST(coalesce(sum(h), 0) AS BIGINT) AS checksum
        FROM ok JOIN cks USING (conv_id)
        UNION ALL
        SELECT '2_boilerplate', count(*),
          CAST(coalesce(sum(masked_chars), 0) AS BIGINT),
          CAST(coalesce(sum(h), 0) AS BIGINT)
        FROM s2 JOIN cks USING (conv_id)
        UNION ALL
        SELECT '3_neardup', count(*),
          CAST(coalesce(sum(masked_chars), 0) AS BIGINT),
          CAST(coalesce(sum(h), 0) AS BIGINT)
        FROM s3 JOIN cks USING (conv_id)
        UNION ALL
        SELECT '4_decontam', count(*),
          CAST(coalesce(sum(masked_chars), 0) AS BIGINT),
          CAST(coalesce(sum(h), 0) AS BIGINT)
        FROM s4 JOIN cks USING (conv_id)
        UNION ALL
        SELECT '5_fit', count(*),
          CAST(coalesce(sum(kept_len), 0) AS BIGINT),
          CAST(coalesce(sum(h), 0) AS BIGINT)
        FROM fr JOIN cks USING (conv_id)
        UNION ALL
        SELECT '6_packed', count(*),
          CAST(coalesce(sum(m), 0) AS BIGINT),
          CAST(coalesce(sum(shard * 100000 + seq), 0) AS BIGINT)
        FROM st6)
      ORDER BY stage"""))

  // ---- q338: chat schema-drift census -------------------------------------
  // VERDICT r12 stretch: q327's key-census idea pointed at the chat
  // JSONL, so a producer format change (an extra per-message field, a
  // tools array) surfaces as a census ROW before it surfaces as
  // quarantine volume. Two scopes: top-level object keys
  // (json_object_keys on the raw line) and per-message keys (the
  // messages re-parsed as array<map<string,string>> — presence
  // per CONVERSATION, a key on any message counts once). The fixture
  // drifts deliberately: "tools" on the tool slice, "weight" on the
  // %47=10 base slice — both invisible to every other query because
  // the fixed from_json schema drops them; the oracle derives every
  // key set arithmetically (it never parses), so a census that
  // hallucinated or missed a key flips the hash.

  private[queries] val q338: GraftQuery = GraftQuery(
    "q338_chat_key_drift",
    (s, d) => {
      // ONE parse pass (r13 VERDICT What's-wrong #1: the census used
      // to consume the raw line through THREE branches — conv keys,
      // msg keys, per-reason totals — each re-running the scan, the
      // chatSchema parse and the verdict; the round's only
      // confirmed_change, 2.3× its mid-round self). Both key scopes
      // now emerge from a single projection: top-level keys via
      // json_object_keys on the raw line, per-message keys from the
      // messages re-parsed as RAW JSON strings (an object field read
      // with StringType keeps its source text, so a key of ANY value
      // type — the tool_calls array included — censuses without a
      // map-coercion gamble), per-conversation-distinct via
      // array_distinct. A '#' sentinel element per conversation
      // carries the per-reason denominator through the SAME
      // aggregation, so no second branch ever re-reads the corpus —
      // the denominator spread is a window over census rows, whose
      // cardinality is bounded by schema variety, not corpus size.
      val strSchema = StructType(Seq(StructField("messages",
        ArrayType(StringType))))
      val convKeys = transform(json_object_keys(col("j")),
        k => struct(lit("conv").as("scope"), k.as("key")))
      val msgKeys = transform(
        array_distinct(flatten(transform(
          from_json(col("j"), strSchema).getField("messages"),
          m => json_object_keys(m)))),
        k => struct(lit("msg").as("scope"), k.as("key")))
      val emptySk = typedlit(Seq.empty[(String, String)])
        .cast("array<struct<scope: string, key: string>>")
      val grouped = chatRaw(s, d)
        .withColumn("_c", from_json(col("j"), ChatOps.chatSchema))
        .withColumn("_turns", call_function("no_inline", col("_c.messages")))
        // reason is consumed TWICE (the filter and the census key) —
        // its own fence keeps the verdict HOFs evaluated once per row
        .withColumn("reason",
          call_function("no_inline", ChatOps.verdict(col("_turns"))))
        .filter(col("reason") =!= "unparseable")
        .select(col("reason"), explode(concat(
          array(struct(lit("#").as("scope"), lit("#").as("key"))),
          coalesce(convKeys, emptySk),
          coalesce(msgKeys, emptySk))).as("sk"))
        .groupBy(col("sk.scope").as("scope"), col("reason"),
          col("sk.key").as("key"))
        .agg(count(lit(1)).as("n_present"))
      val wr = org.apache.spark.sql.expressions.Window
        .partitionBy(col("reason"))
      grouped
        .withColumn("n_convs",
          max(when(col("scope") === "#", col("n_present"))).over(wr))
        .filter(col("scope") =!= "#")
        .select(col("scope"), col("reason"), col("key"), col("n_present"),
          expr("n_present * 1000000L div n_convs").as("presence_ppm"))
        .orderBy(col("scope"), col("reason"), col("key"))
    },
    Some(s"""WITH $chatTurnsOracleCte,
      $chatVerdictOracleCte,
      pk9 AS (SELECT doc_id, reason FROM rs WHERE NOT corrupt),
      k9 AS (
        SELECT doc_id, reason, 'conv' AS scope, unnest(
          CASE WHEN doc_id % 53 = 12 OR doc_id % 59 = 13
              THEN ['conv_id', 'messages']
            WHEN doc_id % 37 = 8 THEN ['conv_id', 'tools', 'messages']
            ELSE ['conv_id', 'messages'] END) AS key
        FROM pk9
        UNION ALL
        SELECT doc_id, reason, 'msg', unnest(
          CASE WHEN doc_id % 53 = 12 OR doc_id % 59 = 13
            THEN ['content', 'role', 'tool_call_id', 'tool_calls']
          WHEN doc_id % 37 <> 8 AND doc_id % 43 <> 9
              AND doc_id % 47 = 10
            THEN ['content', 'role', 'weight']
            ELSE ['content', 'role'] END)
        FROM pk9),
      t9 AS (SELECT reason, count(*) AS n_convs FROM pk9 GROUP BY reason)
      SELECT k9.scope, k9.reason, k9.key, count(*) AS n_present,
        CAST(count(*) * 1000000 // max(t9.n_convs) AS BIGINT)
          AS presence_ppm
      FROM k9 JOIN t9 ON k9.reason = t9.reason
      GROUP BY k9.scope, k9.reason, k9.key
      ORDER BY k9.scope, k9.reason, k9.key"""))

  // ---- q336: best-of-n from SQL ------------------------------------------
  // q335's operator through the injected best_of_n table function —
  // same heap-rewritten plan, same oracle, reached from the parser
  // path.

  private[queries] val q336: GraftQuery = GraftQuery(
    "q336_sql_best_of_n",
    (s, d) => {
      promptScored(s, d).createOrReplaceTempView("bestofn_scored_sql")
      s.sql("""SELECT prompt_grp, rank, doc_id, score
        FROM best_of_n('bestofn_scored_sql', 'prompt_grp', 'doc_id',
          'score', 3, 50)
        ORDER BY prompt_grp, rank""")
    },
    q335.oracle)
}
