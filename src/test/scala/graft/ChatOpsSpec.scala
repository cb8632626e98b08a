package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ChatOps

/** Properties of the SFT/DPO prep operators: verdict precedence over
  * planted structural defects, the render↔mask-span invariant (every
  * span extracts exactly its assistant content and nothing else), the
  * unparseable-row contract, and preference-pair determinism with the
  * heap-rewrite plan shape. */
class ChatOpsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def flat(rows: Seq[(Long, String)]) =
    ChatOps.flatten(rows.toDF("id", "j"), "id", "j")

  private def msg(role: String, content: String): String =
    s"""{"role":"$role","content":"$content"}"""

  private def conv(id: Long, msgs: String*): (Long, String) =
    id -> s"""{"conv_id":$id,"messages":[${msgs.mkString(",")}]}"""

  test("verdict: each structural rule fires, in the documented precedence") {
    val rows = Seq(
      conv(1, msg("user", "hi"), msg("assistant", "hello")), // ok
      conv(2, msg("system", "be brief"), msg("user", "hi"),
        msg("assistant", "ok")), // leading system prompt is legal
      conv(3, msg("assistant", "hi"), msg("user", "yo")), // first_not_user
      conv(4, msg("user", "a"), msg("user", "b"),
        msg("assistant", "c")), // role_repeat
      conv(5, msg("user", "a"), msg("assistant", "")), // empty_content
      conv(6, msg("user", "a"), msg("tool", "x")), // tool after user
      (7L, """{"conv_id":7,"messages":["""), // unparseable
      (8L, """{"conv_id":8,"messages":[]}"""), // empty
      // precedence: first_not_user beats the same conv's role_repeat
      conv(9, msg("assistant", "a"), msg("assistant", "b")),
      // precedence: role_repeat beats empty_content
      conv(10, msg("user", "a"), msg("user", ""), msg("assistant", "c")),
      // tool grammar (r13): a tool result after the assistant that
      // called it is LEGAL...
      conv(11, msg("user", "q"), msg("assistant", "calling"),
        msg("tool", "result"), msg("assistant", "answer")),
      // ...including several results in a row (parallel tool calls)
      conv(12, msg("user", "q"), msg("assistant", "calling"),
        msg("tool", "r1"), msg("tool", "r2"), msg("assistant", "a")),
      // a tool result right after a leading system prompt (the first
      // non-system turn) is first_not_user, not tool_out_of_place
      conv(13, msg("system", "s"), msg("tool", "r"), msg("user", "q")),
      // a genuinely unknown role still quarantines
      conv(14, msg("user", "q"), msg("assistant", "a"),
        msg("function", "x")),
      // precedence: empty_content beats tool_out_of_place
      conv(15, msg("user", ""), msg("tool", "r"), msg("assistant", "a")),
      // a conversation ENDING on the tool result (assistant never
      // replied) is structurally legal — truncation policy is the
      // caller's, grammar is ours
      conv(16, msg("user", "q"), msg("assistant", "calling"),
        msg("tool", "result")))
    val got = flat(rows).select($"id", $"reason")
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "ok" && got(2L) == "ok")
    assert(got(3L) == "first_not_user")
    assert(got(4L) == "role_repeat")
    assert(got(5L) == "empty_content")
    assert(got(6L) == "tool_out_of_place")
    assert(got(7L) == "unparseable")
    assert(got(8L) == "empty")
    assert(got(9L) == "first_not_user")
    assert(got(10L) == "role_repeat")
    assert(got(11L) == "ok")
    assert(got(12L) == "ok")
    assert(got(13L) == "first_not_user")
    assert(got(14L) == "unknown_role")
    assert(got(15L) == "empty_content")
    assert(got(16L) == "ok")
  }

  test("tool turns render as context and never enter the loss mask") {
    val rows = Seq(conv(1, msg("user", "query"),
      msg("assistant", "searching"), msg("tool", "toolpayload"),
      msg("assistant", "final answer")))
    val got = flat(rows).collect().head
    assert(got.getAs[String]("reason") == "ok")
    val spans = got.getAs[String]("mask_spans").split(";").toSeq
      .map { sp => val Array(a, b) = sp.split("-"); (a.toInt, b.toInt) }
    val parsed = rows.toDF("id", "j")
      .withColumn("c", from_json($"j", ChatOps.chatSchema))
      .select(ChatOps.renderChatML($"c.messages"))
      .as[String].collect().head
    assert(parsed.contains("<|im_start|>tool\ntoolpayload<|im_end|>"),
      "tool turn must render as an ordinary ChatML segment")
    assert(spans.map { case (s0, e0) => parsed.substring(s0, e0) } ==
      Seq("searching", "final answer"),
      "masks cover exactly the assistant contents")
    assert(got.getAs[Long]("masked_chars") ==
      "searching".length + "final answer".length)
  }

  test("render + mask spans: every span extracts exactly its assistant content") {
    val rows = Seq(
      conv(1, msg("user", "what is spark"), msg("assistant", "a query engine"),
        msg("user", "and catalyst"), msg("assistant", "its optimizer")),
      conv(2, msg("system", "be brief"), msg("user", "hi"),
        msg("assistant", "ok then")),
      conv(3, msg("user", "no answer yet")))
    val raw = rows.toDF("id", "j")
    val parsed = raw.withColumn("c", from_json($"j", ChatOps.chatSchema))
      .select($"id", $"c.messages".as("turns"))
    val got = parsed.select($"id",
        ChatOps.renderChatML($"turns").as("rendered"),
        ChatOps.lossMaskSpans($"turns").as("spans"),
        ChatOps.maskedChars($"turns").as("masked"))
      .as[(Long, String, String, Long)].collect()
    val expectedAssistant = Map(
      1L -> Seq("a query engine", "its optimizer"),
      2L -> Seq("ok then"),
      3L -> Seq.empty[String])
    for ((id, rendered, spans, masked) <- got) {
      val exp = expectedAssistant(id)
      val ranges = if (spans.isEmpty) Seq.empty
        else spans.split(";").toSeq.map { sp =>
          val Array(a, b) = sp.split("-"); (a.toInt, b.toInt)
        }
      assert(ranges.size == exp.size, s"conv $id span count")
      for (((s0, e0), want) <- ranges.zip(exp))
        assert(rendered.substring(s0, e0) == want,
          s"conv $id span [$s0,$e0) got '${rendered.substring(s0, e0)}'")
      assert(ranges.map { case (s0, e0) => e0 - s0 }.sum == masked,
        s"conv $id masked_chars")
      // spans are disjoint and ascending (the fold walks left to right)
      for (Seq((_, e1), (s2, _)) <- ranges.sliding(2).filter(_.size == 2))
        assert(e1 <= s2, s"conv $id spans overlap")
      // nothing outside the spans is assistant content: blanking the
      // spans and re-rendering with assistant contents emptied agree
      val blanked = ranges.reverse.foldLeft(rendered) { case (acc, (s0, e0)) =>
        acc.substring(0, s0) + acc.substring(e0) }
      assert(!exp.exists(c => c.nonEmpty && blanked.contains(c)),
        s"conv $id: assistant text left outside the mask")
    }
  }

  test("flatten: unparseable rows carry the documented null/zero contract") {
    val got = flat(Seq((7L, "{not json"))).collect().head
    assert(got.getAs[String]("reason") == "unparseable")
    assert(got.isNullAt(got.fieldIndex("conv_id")))
    assert(got.getAs[Long]("n_turns") == 0L)
    assert(got.getAs[Long]("rendered_len") == 0L)
    assert(got.isNullAt(got.fieldIndex("rendered_md5")))
    assert(got.getAs[String]("mask_spans") == "")
    assert(got.getAs[Long]("masked_chars") == 0L)
  }

  test("flatten: an empty messages array renders nothing and digests NULL") {
    // reason='empty' rows never reach the oracle's render CTE (the
    // unnest emits no row), so the operator must NOT emit md5('') for
    // them — the engines would disagree on the same nothing (ADVICE r12)
    val got = flat(Seq((8L, """{"conv_id":8,"messages":[]}"""))).collect().head
    assert(got.getAs[String]("reason") == "empty")
    assert(got.getAs[Long]("n_turns") == 0L)
    assert(got.getAs[Long]("rendered_len") == 0L)
    assert(got.isNullAt(got.fieldIndex("rendered_md5")))
    assert(got.getAs[String]("mask_spans") == "")
    assert(got.getAs[Long]("masked_chars") == 0L)
  }

  private val spanArrayType = "array<struct<s: bigint, e: bigint>>"

  test("packedMaskPieces: exact boundary cuts on a single known conversation") {
    // one doc → offset 0 whatever the md5 deal; spans (0,100) and
    // (250,600) against seqLen 256: the second span must straddle TWO
    // boundaries (256 and 512)
    val df = Seq((1L, 600L)).toDF("id", "len")
      .withColumn("spans",
        typedlit(Seq((0L, 100L), (250L, 600L))).cast(spanArrayType))
    val got = graft.operators.ChatOps
      .packedMaskPieces(df, "id", "len", "spans", seqLen = 256, nShards = 1)
      .select($"seq", $"piece_s", $"piece_e")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      (0L, 0L, 100L), (0L, 250L, 256L), // span 2's head piece
      (1L, 0L, 256L),                   // full middle sequence
      (2L, 0L, 88L)))                   // 600 - 512 tail
  }

  test("packedMaskPieces: zero-width spans cut to zero pieces") {
    // an empty assistant content emits a span with s == e; landing it
    // exactly on a sequence boundary made the boundary-cut sequence()
    // DESCEND and emit spurious zero-width pieces (ADVICE r12) — a
    // zero-width span must contribute NO piece rows at all
    val df = Seq((1L, 600L)).toDF("id", "len")
      .withColumn("spans",
        typedlit(Seq((0L, 100L), (256L, 256L), (300L, 300L)))
          .cast(spanArrayType))
    val got = graft.operators.ChatOps
      .packedMaskPieces(df, "id", "len", "spans", seqLen = 256, nShards = 1)
      .select($"seq", $"piece_s", $"piece_e")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L, 100L)),
      s"zero-width spans must vanish, got $got")
  }

  test("packedMaskPieces: conservation, bounds, and layout invariance") {
    // 40 docs with varying lengths and 1-2 spans each — enough mass
    // that straddles occur at seqLen 128
    val rows = (0L until 40L).map { i =>
      val len = 80L + (i % 7) * 40L
      val spans = if (i % 2 == 0) Seq((5L, len / 2)) else
        Seq((0L, len / 3), (len / 2, len))
      (i, len, spans)
    }
    val df = rows.toDF("id", "len", "spans")
      .withColumn("spans", $"spans".cast(spanArrayType))
    val pieces = graft.operators.ChatOps
      .packedMaskPieces(df, "id", "len", "spans", seqLen = 128, nShards = 2)
    val got = pieces.select($"shard", $"seq", $"piece_s", $"piece_e")
      .as[(Long, Long, Long, Long)].collect()
    val totalSpanMass = rows.flatMap(_._3).map { case (a, b) => b - a }.sum
    assert(got.map(r => r._4 - r._3).sum == totalSpanMass,
      "piece mass must equal span mass (conservation)")
    assert(got.forall(r => r._3 >= 0 && r._3 < r._4 && r._4 <= 128),
      "pieces must be non-empty and inside [0, seqLen]")
    assert(got.count(r => r._4 - r._3 == 128L) > 0,
      "expected at least one full-sequence piece (a straddle happened)")
    val re = graft.operators.ChatOps
      .packedMaskPieces(df.repartition(7), "id", "len", "spans",
        seqLen = 128, nShards = 2)
      .select($"shard", $"seq", $"piece_s", $"piece_e")
      .as[(Long, Long, Long, Long)].collect()
    assert(re.sortBy(r => (r._1, r._2, r._3)).toSeq ==
      got.sortBy(r => (r._1, r._2, r._3)).toSeq)
  }

  test("segmentMaskAlignment: full/partial classification by hand, empty segments keep the cursor") {
    // text: "ab cd ef"  → segments ab[0,2) cd[3,5) ef[6,8)
    //   span [3,5)  fully covers cd; span [7,8) partially covers ef
    // text: "ab  cd" (double space) → ab[0,2) ""[3,3) cd[4,6):
    //   the empty segment advances the cursor and is NEVER counted
    //   full even when inside a span
    val rows = Seq(
      (1L, "ab cd ef", Seq((3L, 5L), (7L, 8L))),
      (2L, "ab  cd", Seq((2L, 6L))),
      (3L, "ab cd", Seq.empty[(Long, Long)]))
      .toDF("id", "r", "sp")
      .withColumn("sp", $"sp".cast(spanArrayType))
    val (nSegs, nFull, nPartial) = graft.operators.ChatOps
      .segmentMaskAlignment($"r", $"sp")
    val got = rows.select($"id", nSegs, nFull, nPartial)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 3L, 1L, 1L), // cd full, ef partial
      // cd full; ab[0,2) vs span [2,6): half-open, no overlap; the
      // zero-width ""[3,3) sits strictly inside the span but carries
      // no chars — excluded from BOTH classes (the emptiness guard)
      (2L, 3L, 1L, 0L),
      (3L, 2L, 0L, 0L)))
  }

  test("fitContext: system retained, minimal suffix drop, overflow keeps the final turn") {
    // per-turn render cost: 24 + len(role) + len(content)
    //   system "s"      → 24 + 6 + 1 = 31
    //   user   "aaaa"   → 24 + 4 + 4 = 32
    //   assistant "bb"  → 24 + 9 + 2 = 35
    //   user   "cc"     → 24 + 4 + 2 = 30
    //   assistant "dd"  → 24 + 9 + 2 = 35   (total 163, body 132)
    val raw = Seq(conv(1, msg("system", "s"), msg("user", "aaaa"),
      msg("assistant", "bb"), msg("user", "cc"), msg("assistant", "dd")))
      .toDF("id", "j")
      .withColumn("t", from_json($"j", graft.operators.ChatOps.chatSchema)
        .getField("messages"))
    def fit(budget: Long) = raw.select(
        graft.operators.ChatOps.fitContext($"t", lit(budget)).as("f"))
      .select($"f.kept", $"f.n_dropped", $"f.fits")
      .as[(Seq[(String, String)], Long, Boolean)].collect().head
    // everything fits
    val all = fit(163L)
    assert(all._2 == 0L && all._3 && all._1.size == 5)
    // 162: must drop the oldest body turn (sys 31 + 100 of last three = 131 ≤ 162; 31+132=163 > 162)
    val drop1 = fit(162L)
    assert(drop1._2 == 1L && drop1._3)
    assert(drop1._1.map(_._2) == Seq("s", "bb", "cc", "dd"),
      s"got ${drop1._1}")
    // 70: sys(31) + dd(35) = 66 ≤ 70 → keep system + final turn only
    val drop3 = fit(70L)
    assert(drop3._2 == 3L && drop3._3 &&
      drop3._1.map(_._2) == Seq("s", "dd"))
    // 60: even the final turn overflows with the system prompt —
    // kept anyway, fits=false
    val over = fit(60L)
    assert(over._2 == 3L && !over._3 && over._1.map(_._2) == Seq("s", "dd"))
    // no system prompt: plain suffix policy
    val raw2 = Seq(conv(2, msg("user", "aaaa"), msg("assistant", "bb")))
      .toDF("id", "j")
      .withColumn("t", from_json($"j", graft.operators.ChatOps.chatSchema)
        .getField("messages"))
    val r2 = raw2.select(
        graft.operators.ChatOps.fitContext($"t", lit(35L)).as("f"))
      .select($"f.kept", $"f.n_dropped", $"f.fits")
      .as[(Seq[(String, String)], Long, Boolean)].collect().head
    assert(r2._2 == 1L && r2._3 && r2._1.map(_._2) == Seq("bb"))
  }

  test("verdictTools: call correlation, content exemption, precedence") {
    def tflat(rows: Seq[(Long, String)]) = {
      val df = rows.toDF("id", "j")
        .withColumn("c", from_json($"j", ChatOps.chatToolSchema))
      df.select($"id", ChatOps.verdictTools($"c.messages").as("r"))
        .as[(Long, String)].collect().toMap
    }
    def call(id: String) =
      s"""{"id":"$id","name":"search","args":"q"}"""
    val rows = Seq(
      // correlated call → legal
      1L -> s"""{"conv_id":1,"messages":[{"role":"user","content":"q"},{"role":"assistant","content":"hm","tool_calls":[${call("c1")}]},{"role":"tool","tool_call_id":"c1","content":"r"},{"role":"assistant","content":"a"}]}""",
      // wrong id → mismatch
      2L -> s"""{"conv_id":2,"messages":[{"role":"user","content":"q"},{"role":"assistant","content":"hm","tool_calls":[${call("c1")}]},{"role":"tool","tool_call_id":"zz","content":"r"},{"role":"assistant","content":"a"}]}""",
      // missing id when the assistant issued calls → mismatch
      3L -> s"""{"conv_id":3,"messages":[{"role":"user","content":"q"},{"role":"assistant","content":"hm","tool_calls":[${call("c1")}]},{"role":"tool","content":"r"},{"role":"assistant","content":"a"}]}""",
      // orphaned id when the assistant issued none → mismatch
      4L -> s"""{"conv_id":4,"messages":[{"role":"user","content":"q"},{"role":"assistant","content":"hm"},{"role":"tool","tool_call_id":"c9","content":"r"},{"role":"assistant","content":"a"}]}""",
      // free-form tool result (no calls, no id) → legal
      5L -> s"""{"conv_id":5,"messages":[{"role":"user","content":"q"},{"role":"assistant","content":"hm"},{"role":"tool","content":"r"},{"role":"assistant","content":"a"}]}""",
      // canonical modern shape: NULL content beside the call is legal
      6L -> s"""{"conv_id":6,"messages":[{"role":"user","content":"q"},{"role":"assistant","tool_calls":[${call("c1")}]},{"role":"tool","tool_call_id":"c1","content":"r"},{"role":"assistant","content":"a"}]}""",
      // …but a NULL-content assistant with NO calls still quarantines
      7L -> s"""{"conv_id":7,"messages":[{"role":"user","content":"q"},{"role":"assistant","content":""},{"role":"tool","content":"r"}]}""",
      // two results answering two parallel calls, both correlated
      8L -> s"""{"conv_id":8,"messages":[{"role":"user","content":"q"},{"role":"assistant","content":"hm","tool_calls":[${call("c1")},${call("c2")}]},{"role":"tool","tool_call_id":"c2","content":"r2"},{"role":"tool","tool_call_id":"c1","content":"r1"},{"role":"assistant","content":"a"}]}""",
      // placement beats correlation: tool after user
      9L -> s"""{"conv_id":9,"messages":[{"role":"user","content":"q"},{"role":"tool","tool_call_id":"zz","content":"r"},{"role":"assistant","content":"a"}]}""",
      // dangling (ADVICE r13): a call the next turn never answers —
      // the user replies as if no call had been issued
      10L -> s"""{"conv_id":10,"messages":[{"role":"user","content":"q"},{"role":"assistant","content":"hm","tool_calls":[${call("c1")}]},{"role":"user","content":"q2"},{"role":"assistant","content":"a"}]}""",
      // dangling: two parallel calls, only one answered in the block
      11L -> s"""{"conv_id":11,"messages":[{"role":"user","content":"q"},{"role":"assistant","content":"hm","tool_calls":[${call("c1")},${call("c2")}]},{"role":"tool","tool_call_id":"c1","content":"r"},{"role":"assistant","content":"a"}]}""",
      // dangling: the conversation ENDS on an unanswered call
      12L -> s"""{"conv_id":12,"messages":[{"role":"user","content":"q"},{"role":"assistant","content":"hm","tool_calls":[${call("c1")}]}]}""",
      // dangling: a NULL call id is unanswerable by construction
      13L -> s"""{"conv_id":13,"messages":[{"role":"user","content":"q"},{"role":"assistant","content":"hm","tool_calls":[{"name":"search","args":"q"}]},{"role":"tool","tool_call_id":"c1","content":"r"},{"role":"assistant","content":"a"}]}""")
    val got = tflat(rows)
    assert(got(1L) == "ok")
    assert(got(2L) == "tool_call_mismatch")
    assert(got(3L) == "tool_call_mismatch")
    assert(got(4L) == "tool_call_mismatch")
    assert(got(5L) == "ok")
    assert(got(6L) == "ok")
    assert(got(7L) == "empty_content")
    assert(got(8L) == "ok")
    assert(got(9L) == "tool_out_of_place")
    assert(got(10L) == "tool_call_dangling")
    assert(got(11L) == "tool_call_dangling")
    assert(got(12L) == "tool_call_dangling")
    assert(got(13L) == "tool_call_dangling")
  }

  test("resolveToolCalls: calls fold into assistant content and land inside the mask") {
    val j =
      """{"conv_id":1,"messages":[{"role":"user","content":"q"},{"role":"assistant","tool_calls":[{"id":"c1","name":"search","args":"spark shuffles"}]},{"role":"tool","tool_call_id":"c1","content":"result text"},{"role":"assistant","content":"final"}]}"""
    val df = Seq((1L, j)).toDF("id", "j")
      .withColumn("raw", from_json($"j", ChatOps.chatToolSchema)
        .getField("messages"))
      .withColumn("t", ChatOps.resolveToolCalls($"raw"))
    val (rendered, spans, masked) = df.select(
        ChatOps.renderChatML($"t"), ChatOps.lossMaskSpans($"t"),
        ChatOps.maskedChars($"t"))
      .as[(String, String, Long)].collect().head
    val want = "<tool_call>search\nspark shuffles</tool_call>"
    assert(rendered.contains(s"<|im_start|>assistant\n$want<|im_end|>"),
      s"call must serialize into the assistant turn: $rendered")
    val ranges = spans.split(";").toSeq.map { sp =>
      val Array(a, b) = sp.split("-"); (a.toInt, b.toInt) }
    assert(ranges.map { case (s0, e0) => rendered.substring(s0, e0) } ==
      Seq(want, "final"),
      "the serialized call is MASKED (model output); the tool result is not")
    assert(!ranges.exists { case (s0, e0) =>
      rendered.substring(s0, e0).contains("result text") },
      "tool result content must stay outside the mask")
    assert(masked == want.length + "final".length)
  }

  test("preferenceLengthBias: verbosity census, ppm ratio, negative mean gap truncates toward zero") {
    val pairs = Seq(
      ("a", 10L, 5L), // chosen strictly longer
      ("a", 8L, 8L),  // equal — NOT longer
      ("a", 3L, 9L),  // chosen shorter
      ("b", 4L, 9L),
      ("b", 5L, 7L))
      .toDF("g", "cl", "rl")
    val got = ChatOps.preferenceLengthBias(pairs, "g", "cl", "rl")
      .orderBy($"g").as[(String, Long, Long, Long, Long)].collect().toSeq
    // a: 1/3 longer → 333333 ppm; gap sum 5+0−6 = −1 → −1 div 3 = 0
    // b: 0/2 longer; gap sum −7 → −7 div 2 = −3 (truncate toward
    // zero — the measured cross-engine contract; floor would say −4)
    assert(got == Seq(("a", 3L, 1L, 333333L, 0L),
      ("b", 2L, 0L, 0L, -3L)), got.toString)
  }

  test("debiasPreferenceLength: JVM draw replay, band convergence, below-target passthrough") {
    // 800 strictly-longer-chosen pairs + 200 others → raw share 800k
    val pairs = (0L until 1000L).map { i =>
      if (i < 800L) (i, 20L, 10L) else (i, 10L, 20L)
    }.toDF("pid", "cl", "rl")
    val got = ChatOps.debiasPreferenceLength(pairs, "pid", "cl", "rl",
        targetPpm = 500000L, salt = "lendebias")
      .select($"pid", $"cl", $"rl")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // JVM replay of the operator's integer keep-fraction and draws:
    // nl=800, nr=200 → f_ppm = (5e5·200) div ((5e5·800) div 1e6)
    // = 1e8 div 400 = 250000 (keep 1/4 of the long pairs)
    val nl = 800L; val nr = 200L; val t = 500000L
    val fPpm = (t * nr) / math.max(((1000000L - t) * nl) / 1000000L, 1L)
    def draw(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"lendebias:$id".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 1000000L
    }
    val want = (0L until 1000L).filter { i =>
      i >= 800L || draw(i) < fPpm
    }.map(i => if (i < 800L) (i, 20L, 10L) else (i, 10L, 20L))
    assert(got == want, s"kept ${got.size}, JVM replay ${want.size}")
    // the realized share lands in a sampling band around the target
    // (f = 0.25 of 800 longs → E[kept longs] = 200 of ~400 total)
    val longKept = got.count(p => p._2 > p._3).toLong
    val share = longKept * 1000000L / got.size
    assert(share >= 350000L && share <= 650000L,
      s"debiased share $share outside the band (kept $longKept long)")
    // determinism under relayout
    val re = ChatOps.debiasPreferenceLength(pairs.repartition(13),
        "pid", "cl", "rl", targetPpm = 500000L, salt = "lendebias")
      .select($"pid", $"cl", $"rl")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(re == got)
    // a set already at/below the target returns UNCHANGED — including
    // its long pairs
    val balanced = (0L until 100L).map { i =>
      if (i < 40L) (i, 20L, 10L) else (i, 10L, 20L)
    }.toDF("pid", "cl", "rl")
    val gotB = ChatOps.debiasPreferenceLength(balanced, "pid", "cl",
        "rl", targetPpm = 500000L)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(gotB.size == 100 && gotB.count(p => p._2 > p._3) == 40)
    // n_long = 0 is total (the greatest(·,1) floor)
    val noLong = (0L until 10L).map(i => (i, 5L, 9L)).toDF("pid", "cl", "rl")
    assert(ChatOps.debiasPreferenceLength(noLong, "pid", "cl", "rl")
      .count() == 10L)
    // n_rest = 0: an ALL-longer set cannot be rebalanced by
    // subsampling — the arithmetic yields the empty set (the only
    // subsample satisfying any target < 10⁶), documented not hidden
    val allLong = (0L until 10L).map(i => (i, 9L, 5L)).toDF("pid", "cl", "rl")
    assert(ChatOps.debiasPreferenceLength(allLong, "pid", "cl", "rl")
      .count() == 0L)
    intercept[IllegalArgumentException] {
      ChatOps.debiasPreferenceLength(pairs, "pid", "cl", "rl",
        targetPpm = 0L)
    }
    // a NULL length is NOT strictly longer — the pair passes through
    // (the uncoalesced three-valued filter silently dropped it)
    val withNull = Seq((1L, Some(9L), Some(5L)), (2L, None, Some(5L)),
      (3L, Some(9L), None)).toDF("pid", "cl", "rl")
    val keptN = ChatOps.debiasPreferenceLength(withNull, "pid", "cl", "rl")
      .select($"pid").as[Long].collect().toSet
    assert(keptN.contains(2L) && keptN.contains(3L),
      s"NULL-length pairs must pass through, kept: $keptN")
  }

  test("resolveToolCalls: NULL name/args render deterministically, never vanish") {
    // ADVICE r13: concat over a NULL field used to null the element
    // and array_join silently skipped it — a malformed call vanished
    // from the render AND the loss mask
    val j =
      """{"conv_id":1,"messages":[{"role":"user","content":"q"},{"role":"assistant","content":"x","tool_calls":[{"id":"c1","name":"search"},{"id":"c2","args":"a2"}]}]}"""
    val rendered = Seq((1L, j)).toDF("id", "j")
      .withColumn("t", ChatOps.resolveToolCalls(
        from_json($"j", ChatOps.chatToolSchema).getField("messages")))
      .select(ChatOps.renderChatML($"t")).as[String].collect().head
    assert(rendered.contains(
      "x<tool_call>search\n</tool_call><tool_call>\na2</tool_call>"),
      s"malformed calls must serialize with '' holes, got: $rendered")
  }

  test("fitContextBy with token costs: the budget counts learned-BPE tokens, not characters") {
    // merges (a,b) then (ab,c): "abc" encodes to ONE token, "abcabc"
    // to two; unmergeable letters stay one token per char
    val merges = Seq(("a", "b"), ("ab", "c"))
    val cost = ChatOps.tokenTurnCost(merges) _
    val turns = Seq((1L,
      """{"conv_id":1,"messages":[{"role":"user","content":"abc abc"},{"role":"assistant","content":"abcabc"},{"role":"user","content":"q"}]}"""))
      .toDF("id", "j")
      .withColumn("t", from_json($"j", ChatOps.chatSchema).getField("messages"))
    val costs = turns.select(transform($"t", cost(_)).as("c"))
      .as[Seq[Long]].collect().head
    // 4 framing + encoded content: 2, 2, 1 tokens
    assert(costs == Seq(6L, 6L, 5L), s"per-turn token costs: $costs")
    // token budget 11 keeps the [assistant, user] suffix (6+5)…
    val tokFit = turns.select(
      ChatOps.fitContextBy($"t", lit(11L), cost).as("f"))
      .select($"f.n_dropped", $"f.fits").as[(Long, Boolean)].collect().head
    assert(tokFit == (1L, true), s"token fit: $tokFit")
    // …while the same 11 as a CHARACTER budget can't even hold the
    // final turn (24+4+1=29 chars): overflow leg, nothing else dropped
    val chFit = turns.select(
      ChatOps.fitContext($"t", lit(11L)).as("f"))
      .select($"f.n_dropped", $"f.fits").as[(Long, Boolean)].collect().head
    assert(chFit == (2L, false), s"char fit: $chFit")
  }

  test("flatten plan: the NoInline fence keeps exactly one from_json, even under a reason filter") {
    // without the fence PushPredicateThroughNonJoin substitutes the
    // JSON parse into the filter condition once per when-branch
    // reference (measured: q313 2.04 s → 0.88 s at sf0.1)
    // repartition barrier: over a bare LocalRelation the whole plan
    // constant-folds to a LocalTableScan and there is no plan to pin
    val src = Seq(conv(1, msg("user", "a"), msg("assistant", "b")))
      .toDF("id", "j").repartition(1)
    val p = graft.operators.ChatOps.flatten(src, "id", "j")
      .filter($"reason" === "ok")
      .queryExecution.executedPlan.toString
    val n = "from_json".r.findAllIn(p).size
    assert(n == 1, s"expected exactly one from_json in the plan, got $n in:\n${p.take(3000)}")
  }

  test("roleConcat: order-preserving per-role concatenation") {
    val raw = Seq(conv(1, msg("system", "s"), msg("user", "first"),
      msg("assistant", "x"), msg("user", "second"))).toDF("id", "j")
    val turns = from_json($"j", graft.operators.ChatOps.chatSchema)
      .getField("messages")
    val got = raw.select(
        graft.operators.ChatOps.roleConcat(turns, "user").as("u"),
        graft.operators.ChatOps.roleConcat(turns, "assistant").as("a"),
        graft.operators.ChatOps.roleConcat(turns, "tool").as("t"))
      .as[(String, String, String)].collect().head
    assert(got == (("first second", "x", "")))
  }

  test("property: spans extract exactly the assistant contents for random conversations") {
    // generator-driven version of the hand test: random role
    // sequences and contents (incl. spaces and empties avoided —
    // empties are the empty_content verdict's business), one batch
    val rnd = new scala.util.Random(4242L)
    val roles = Seq("system", "user", "assistant")
    val convs = (0 until 120).map { cid =>
      val n = 1 + rnd.nextInt(6)
      val msgs = (0 until n).map { _ =>
        val role = roles(rnd.nextInt(3))
        val content = (0 until (1 + rnd.nextInt(12)))
          .map(_ => ('a' + rnd.nextInt(26)).toChar)
          .mkString.grouped(4).mkString(" ") // inject spaces
        (role, content)
      }
      (cid.toLong, msgs)
    }
    val raw = convs.map { case (cid, msgs) =>
      (cid, s"""{"conv_id":$cid,"messages":[${
        msgs.map { case (r, c) => s"""{"role":"$r","content":"$c"}""" }
          .mkString(",")}]}""")
    }.toDF("id", "j")
    val parsed = raw.withColumn("c", from_json($"j", ChatOps.chatSchema))
      .select($"id", $"c.messages".as("turns"))
    val got = parsed.select($"id",
        ChatOps.renderChatML($"turns").as("r"),
        ChatOps.lossMaskSpans($"turns").as("sp"))
      .as[(Long, String, String)].collect()
    val expected = convs.toMap
    for ((id, rendered, spans) <- got) {
      val want = expected(id).filter(_._1 == "assistant").map(_._2)
      val ranges = if (spans.isEmpty) Seq.empty
        else spans.split(";").toSeq.map { s =>
          val Array(a, b) = s.split("-"); (a.toInt, b.toInt) }
      assert(ranges.size == want.size, s"conv $id")
      for (((s0, e0), w) <- ranges.zip(want))
        assert(rendered.substring(s0, e0) == w, s"conv $id")
      // the render itself reconstructs from the original turns
      val wantRender = expected(id).map { case (r, c) =>
        s"<|im_start|>$r\n$c<|im_end|>\n" }.mkString
      assert(rendered == wantRender, s"conv $id render")
    }
  }

  test("sftTokenRows: tokens match a JVM reference with per-segment flags; flags survive token-resolution packing") {
    import graft.operators.{Bpe, DatasetOps}
    import org.apache.spark.sql.types.LongType
    // three byte merges over raw UTF-8: 'll', 'he', then 'hell'
    val merges = Seq(("6c", "6c"), ("68", "65"), ("6865", "6c6c"))
    val convs = Seq(
      (1L, Seq(("user", "hello hello"),
        ("assistant", "hello world hi"))),
      (2L, Seq(("user", "a bb"),
        ("assistant", "ccc hello hello hello dd e"),
        ("user", "f"), ("assistant", "gg  hh"))))
    def render(ts: Seq[(String, String)]): String =
      ts.map { case (r, c) => s"<|im_start|>$r\n$c<|im_end|>\n" }.mkString
    def spans(ts: Seq[(String, String)]): Seq[(Long, Long)] = {
      var pos = 0L
      ts.flatMap { case (r, c) =>
        val s = pos + 13 + r.length
        pos += 24 + r.length + c.length
        if (r == "assistant") Some((s, s + c.length)) else None
      }
    }
    val df = convs.map { case (id, ts) => (id, render(ts), spans(ts)) }
      .toDF("id", "rendered", "spans")
      .select($"id", $"rendered",
        $"spans".cast("array<struct<s: bigint, e: bigint>>").as("spans"))
    val got = ChatOps.sftTokenRows(df, "id", "rendered", "spans", merges)
      .as[(Long, Long, Long, Long, String, Long)].collect().toSet

    // JVM reference: single-space segments with arithmetic char
    // ranges, full-containment flags, sequential byte-BPE encode
    def enc(seg: String): Seq[String] = {
      var syms = seg.getBytes("UTF-8").map(b => f"${b & 0xff}%02x").toVector
      for ((l, r) <- merges) {
        val out = Vector.newBuilder[String]; var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms
    }
    def idOf(sym: String): Long =
      if (sym.length == 2) java.lang.Long.parseLong(sym, 16)
      else 256L + merges.indexWhere { case (l, r) => l + r == sym }
    val want = convs.flatMap { case (id, ts) =>
      val sp = spans(ts); var pos = 0L
      render(ts).split(" ", -1).toSeq.zipWithIndex.flatMap {
        case (seg, i) =>
          val st = pos; val en = pos + seg.length; pos = en + 1
          if (seg.isEmpty) Seq.empty
          else {
            val flag = if (sp.exists(p => p._1 <= st && en <= p._2)) 1L
                       else 0L
            enc(seg).zipWithIndex.map { case (sym, ti) =>
              (id, i.toLong, ti.toLong, idOf(sym), sym, flag) }
          }
      }
    }.toSet
    assert(got == want,
      s"missing: ${want -- got}\nextra: ${got -- want}")
    // sanity on the policy itself: interior assistant words train,
    // boundary-glued segments and user words never do
    assert(want.exists(t => t._6 == 1L),
      "fixture must contain trained tokens")
    assert(want.filter(_._6 == 1L).forall(t => t._1 == 1L || t._1 == 2L))

    // flags ride the pack: census Σ n_trained equals the pre-pack flag
    // mass, and at seqLen 4 some doc's TRAINED tokens span >= 2
    // sequences — the boundary-splits-a-span case the q367 oracle
    // hashes per token
    val toks = ChatOps.sftTokenRows(df, "id", "rendered", "spans", merges)
      .localCheckpoint()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"id").orderBy($"seg_idx", $"tok_idx")
    val seqd = toks.withColumn("_tpos",
      row_number().over(w).cast(LongType) - 1L)
    val counts = toks.groupBy($"id").agg(count(lit(1)).as("n_tokens"))
    val packed = DatasetOps.packSequences(counts, "id", $"n_tokens",
        seqLen = 4, nShards = 2, salt = "sfttok")
      .select($"id", $"shard", $"offset")
    val perTok = seqd.join(packed, Seq("id"))
      .select($"id", $"shard", (($"offset" + $"_tpos") / 4).cast(LongType)
        .as("seq"), $"loss_flag")
      .localCheckpoint()
    val trainedTotal = toks.agg(sum($"loss_flag")).as[Long].collect().head
    val censusTrained = perTok.groupBy($"shard", $"seq")
      .agg(sum($"loss_flag").as("n_trained"))
      .agg(sum($"n_trained")).as[Long].collect().head
    assert(censusTrained == trainedTotal,
      s"packing must conserve trained-token mass: $censusTrained " +
        s"vs $trainedTotal")
    val spread = perTok.filter($"loss_flag" === 1L)
      .groupBy($"id").agg(countDistinct($"seq").as("ns"))
      .as[(Long, Long)].collect().toMap
    assert(spread.values.exists(_ >= 2L),
      s"a trained span must straddle a sequence boundary: $spread")
  }

  test("preferencePairs: planted scores, gap filter, tie-break, rewrite plan") {
    val df = Seq(
      // grp a: clear winner/loser, gap 30
      ("a", 1L, 40L), ("a", 2L, 10L), ("a", 3L, 25L),
      // grp b: gap below threshold — filtered
      ("b", 4L, 12L), ("b", 5L, 10L),
      // grp c: singleton — chosen == rejected, filtered
      ("c", 6L, 99L),
      // grp d: score ties — min id wins both directions deterministically
      ("d", 7L, 50L), ("d", 8L, 50L), ("d", 9L, 20L), ("d", 10L, 20L))
      .toDF("grp", "id", "score")
    val pairs = ChatOps.preferencePairs(df, "grp", "id", "score", minGap = 15L)
    val got = pairs.select($"grp", $"chosen_id", $"rejected_id", $"gap")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("a", 1L, 2L, 30L), ("d", 7L, 9L, 30L)))
    // the rn=1 idiom must have been rewritten into the bounded heap
    val p = pairs.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroupFinal"), "expected heap-rewritten ranking")
    assert(!p.contains("Window"), "per-group Window should not survive")
    // layout invariance
    val re = ChatOps.preferencePairs(df.repartition(7), "grp", "id", "score",
        minGap = 15L)
      .select($"grp", $"chosen_id", $"rejected_id", $"gap")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(re.toSeq == got.toSeq)
  }

  test("bestOfN: floor gate, k truncation, tie-break, heap-rewritten plan") {
    val df = Seq(
      // grp a: 4 above floor — rank cuts to 3, score ties break on id
      ("a", 1L, 90L), ("a", 2L, 90L), ("a", 3L, 70L), ("a", 4L, 60L),
      ("a", 5L, 10L), // below floor
      // grp b: every response below floor — the whole group vanishes
      ("b", 6L, 12L), ("b", 7L, 49L),
      // grp c: fewer than k survivors — all kept, ranked
      ("c", 8L, 55L))
      .toDF("grp", "id", "score")
    val sel = ChatOps.bestOfN(df, "grp", "id", "score", k = 3, floor = 50L)
    val got = sel.select($"grp", $"rank", $"id", $"score")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      ("a", 1L, 1L, 90L), ("a", 2L, 2L, 90L), ("a", 3L, 3L, 70L),
      ("c", 1L, 8L, 55L)), s"got ${got.toSeq}")
    // the rank<=k idiom must land on the bounded heap, not a Window
    val p = sel.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroupFinal"), "expected heap-rewritten ranking")
    assert(!p.contains("Window"), "per-group Window should not survive")
    // layout invariance
    val re = ChatOps.bestOfN(df.repartition(5), "grp", "id", "score",
        k = 3, floor = 50L)
      .select($"grp", $"rank", $"id", $"score")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(re.toSeq == got.toSeq)
  }
}
