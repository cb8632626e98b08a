package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** robots.txt evaluation — crawl politeness, the gate between the URL
  * frontier ([[graft.functions.TextFunctions.urlNormalize]]) and the
  * fetch ([[graft.sources.Warc]]): which of a host's paths may this
  * agent crawl. RFC 9309 semantics on the parts that decide real
  * verdicts:
  *
  *  - GROUPS: consecutive `User-agent` lines share the rule block
  *    that follows; a `User-agent` line after a non-agent line starts
  *    a new group. Comments (`#…`) and blank lines stripped; unknown
  *    directives (Crawl-delay, Sitemap) ignored without breaking the
  *    group, per the RFC.
  *  - AGENT PICK: a request matches its exact agent's groups when any
  *    exist for the host, else the `*` groups (the RFC's most-
  *    specific-agent rule at the granularity real robots files use).
  *  - RULE PICK: the most specific matching rule wins (the RFC's
  *    most-octets rule — rule LENGTH is the specificity, for literal
  *    prefixes identical to matched length); a tie goes to `Allow`;
  *    no matching rule (or no rules at all) means allowed. An empty
  *    rule value (`Disallow:` alone) is the RFC's explicit
  *    allow-everything form — it contributes no rule but DOES make
  *    its group exist for the agent pick (the common whitelist shape
  *    `User-agent: goodbot / Disallow:` + `User-agent: * /
  *    Disallow: /` must send goodbot to its own allow-all group,
  *    not to `*`).
  *  - PATTERNS: the RFC's optional `*` (any char run) and trailing
  *    `$` (end anchor) extensions are honored — a Disallow of
  *    slash-star-`?sid=` blocks every path carrying the parameter,
  *    the shape modern robots files lean on; a `$` anywhere but the
  *    end is literal.
  *    Literal rules (the overwhelming majority) keep the codegen'd
  *    substring prefix test; only rules that actually carry a
  *    metachar compile to an RE2-safe regex (escape specials, then
  *    `*` → `.*`, then re-anchor the stripped trailing `$`) — the
  *    per-row pattern compile is confined to the rare wildcard rows.
  *
  * Everything is relational:
  * line classification is one narrow projection, group numbering one
  * per-host window (bounded by file length — robots files are KB),
  * and the verdict join ships (host, agent, path) tuples against
  * rule rows with a map-side-combined longest-match argmax — no per-
  * request loop anywhere, which is what lets a frontier of billions
  * of URLs take verdicts as one join. */
object Robots {

  /** Shared line classifier + group numbering: one row per non-blank
    * directive line, `(host, grp, _kind, _val)`. */
  private def classified(robots: DataFrame, hostCol: String,
                         txtCol: String): DataFrame = {
    val w = Window.partitionBy(col("_h")).orderBy(col("_ln"))
    robots
      .select(col(hostCol).as("_h"),
        posexplode(split(col(txtCol), "\n")).as(Seq("_ln", "_raw")))
      .withColumn("_line", trim(regexp_replace(col("_raw"), "#.*$", "")))
      .filter(length(col("_line")) > 0)
      .withColumn("_kind",
        when(col("_line").rlike("(?i)^user-agent:"), "agent")
          .when(col("_line").rlike("(?i)^allow:"), "allow")
          .when(col("_line").rlike("(?i)^disallow:"), "disallow")
          .when(col("_line").rlike("(?i)^crawl-delay:"), "delay")
          .when(col("_line").rlike("(?i)^sitemap:"), "sitemap")
          .otherwise("other"))
      .withColumn("_val",
        trim(regexp_extract(col("_line"), "^[A-Za-z-]+:\\s*(.*)$", 1)))
      // a group starts at an agent line NOT preceded by an agent line
      .withColumn("_b",
        when(col("_kind") === "agent" &&
          coalesce(lag(col("_kind"), 1).over(w), lit("")) =!= "agent",
          1L).otherwise(0L))
      .withColumn("grp", sum(col("_b")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  private def agentsOf(typed: DataFrame): DataFrame =
    typed.filter(col("_kind") === "agent")
      .select(col("_h").as("host"), col("grp"),
        lower(col("_val")).as("agent"))

  /** Parse robots.txt bodies into flat rule rows:
    * `(host, grp, agent, allow, rpath)` — one row per (agent-in-group
    * × rule-in-group). Agents lowercase (agent names are
    * case-insensitive; PATHS are not and keep case). A group with NO
    * rules (only the empty `Disallow:` allow-all form, or nothing)
    * still emits one row per agent with NULL `allow`/`rpath` — the
    * group-EXISTENCE marker [[verdicts]]' agent pick needs: dropping
    * such groups entirely would wrongly send their agents to `*`
    * (RFC 9309 group selection inverted for the whitelist pattern). */
  def rules(robots: DataFrame, hostCol: String,
            txtCol: String): DataFrame = {
    val typed = classified(robots, hostCol, txtCol)
    val ruleRows = typed
      .filter(col("_kind").isin("allow", "disallow") &&
        length(col("_val")) > 0) // empty Disallow: = allow-all, no rule
      .select(col("_h").as("host"), col("grp"),
        (col("_kind") === "allow").as("allow"), col("_val").as("rpath"))
    agentsOf(typed).join(ruleRows, Seq("host", "grp"), "left")
  }

  /** Crawl-delay extraction — the politeness KNOB the scheduler
    * ([[graft.operators.DatasetOps.politeFetchSchedule]]) consumes:
    * `(host, agent, delay_s)` per group that declares one, in whole
    * seconds. Fractional values (`Crawl-delay: 0.5`) are honored and
    * CEILED — rounding a declared limit up is the conservative
    * direction; dropping it (the impolite one) is reserved for truly
    * non-numeric values like `fast`, which a crawler must not guess
    * at. Several delay lines in one group keep the LARGEST (the
    * conservative read). */
  def crawlDelays(robots: DataFrame, hostCol: String,
                  txtCol: String): DataFrame = {
    val typed = classified(robots, hostCol, txtCol)
    val delays = typed
      .filter(col("_kind") === "delay" &&
        col("_val").rlike("^\\d+(\\.\\d+)?$"))
      .select(col("_h").as("host"), col("grp"),
        ceil(col("_val").cast(DecimalType(18, 6))).cast(LongType)
          .as("delay_s"))
    agentsOf(typed).join(delays, Seq("host", "grp"))
      .groupBy(col("host"), col("agent"))
      .agg(max(col("delay_s")).as("delay_s"))
  }

  /** Sitemap discovery from robots.txt — where a crawler learns a
    * host's sitemap URLs without guessing paths. The `Sitemap:`
    * directive is HOST-WIDE per the sitemaps protocol, NOT
    * group-scoped (it may appear anywhere in the file, before any
    * group or between them, and applies to every agent), so the
    * extraction deliberately ignores group numbering: one distinct
    * `(host, sitemap_url)` row per declared URL, value verbatim
    * (it is a full URL by spec — fetch it and feed
    * [[graft.functions.TextFunctions.sitemapLocs]]). One narrow
    * projection + distinct, robots-file-census-sized. */
  def sitemaps(robots: DataFrame, hostCol: String,
               txtCol: String): DataFrame =
    classified(robots, hostCol, txtCol)
      .filter(col("_kind") === "sitemap" && length(col("_val")) > 0)
      .select(col("_h").as("host"), col("_val").as("sitemap_url"))
      .distinct()

  /** Compile an RFC 9309 pattern rule to its RE2-safe regex: strip
    * ONE trailing `$` (the only position where it anchors — anywhere
    * else it is literal and gets escaped), escape every regex special
    * except `*`, turn `*` into `.*`, re-anchor. The left `^` makes an
    * un-`$`-anchored pattern a PREFIX match — exactly the literal
    * rule semantics, extended. */
  private def rulePattern(rpath: Column): Column = {
    val anchored = rpath.endsWith("$")
    val bare = regexp_replace(rpath, "\\$$", "")
    val esc = regexp_replace(bare,
      "([\\\\.\\[\\]{}()+?^$|])", "\\\\$1")
    val wild = regexp_replace(esc, "\\*", ".*")
    concat(lit("^"), wild, when(anchored, lit("$")).otherwise(lit("")))
  }

  /** Verdicts for `(host, agent, upath)` requests against [[rules]]
    * rows: emits `(host, agent, upath, allowed)`. Most specific
    * matching rule wins (rule length = the RFC's most-octets
    * specificity; identical to matched length for literal rules),
    * ties to Allow, no match (or no applicable group) means allowed.
    * A NULL-rule row (a rule-less group's existence marker from
    * [[rules]]) claims the agent but contributes no match — its
    * verdicts all come out allowed, the RFC's semantics for an
    * allow-all group. Literal rules match via the codegen'd substring
    * prefix test; only rows actually carrying `*`/`$` pay the regex
    * path ([[rulePattern]]). ONE map-side-combined
    * `max(struct(len, allow))` per request — never a per-request
    * sort. */
  def verdicts(ruleRows: DataFrame, requests: DataFrame): DataFrame = {
    val reqs = requests.select(col("host"), col("agent"),
      col("upath")).distinct()
    val avail = ruleRows.select(col("host"),
      col("agent").as("_eff")).distinct()
    // exact agent group when the host defines one, else '*'
    val exact = reqs.join(avail,
        reqs("host") === avail("host") && lower(reqs("agent")) === avail("_eff"),
        "left_semi")
      .withColumn("_eff", lower(col("agent")))
    val star = reqs.join(avail,
        reqs("host") === avail("host") && lower(reqs("agent")) === avail("_eff"),
        "left_anti")
      .withColumn("_eff", lit("*"))
    val wild = col("rpath").contains("*") || col("rpath").endsWith("$")
    exact.unionByName(star)
      .join(ruleRows.withColumnRenamed("agent", "_eff"),
        Seq("host", "_eff"), "left")
      .withColumn("_mlen",
        when(col("rpath").isNull, lit(-1))
          .when(!wild,
            when(substring(col("upath"), lit(1), length(col("rpath"))) ===
              col("rpath"), length(col("rpath"))).otherwise(lit(-1)))
          .otherwise(
            when(regexp_like(col("upath"), rulePattern(col("rpath"))),
              length(col("rpath"))).otherwise(lit(-1))))
      .groupBy(col("host"), col("agent"), col("upath"))
      .agg(max(struct(col("_mlen").as("l"),
        when(col("allow"), 1).otherwise(0).as("a"))).as("_best"))
      .select(col("host"), col("agent"), col("upath"),
        (col("_best.l") < 0 || col("_best.a") === 1).as("allowed"))
  }
}
