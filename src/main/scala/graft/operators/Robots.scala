package graft.operators

import org.apache.spark.sql.{DataFrame}
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
  *  - RULE PICK: longest-path-prefix match wins; a tie goes to
  *    `Allow`; no matching rule (or no rules at all) means allowed.
  *    An empty rule value (`Disallow:` alone) is the RFC's explicit
  *    allow-everything form — it contributes no rule.
  *
  * Contract: literal path prefixes (the 1994 core every crawler
  * honors); the RFC's optional `*`/`$` pattern extensions are out of
  * scope and their rules match as literals. Everything is relational:
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
    * case-insensitive; PATHS are not and keep case). */
  def rules(robots: DataFrame, hostCol: String,
            txtCol: String): DataFrame = {
    val typed = classified(robots, hostCol, txtCol)
    val ruleRows = typed
      .filter(col("_kind").isin("allow", "disallow") &&
        length(col("_val")) > 0) // empty Disallow: = allow-all, no rule
      .select(col("_h").as("host"), col("grp"),
        (col("_kind") === "allow").as("allow"), col("_val").as("rpath"))
    agentsOf(typed).join(ruleRows, Seq("host", "grp"))
  }

  /** Crawl-delay extraction — the politeness KNOB the scheduler
    * ([[graft.operators.DatasetOps.interleaveSources]]' weights)
    * consumes: `(host, agent, delay_s)` per group that declares one,
    * integer seconds (the de-facto form; fractional or malformed
    * values drop — a crawler must not guess a rate limit). Several
    * delay lines in one group keep the LARGEST (the conservative
    * read). */
  def crawlDelays(robots: DataFrame, hostCol: String,
                  txtCol: String): DataFrame = {
    val typed = classified(robots, hostCol, txtCol)
    val delays = typed
      .filter(col("_kind") === "delay" && col("_val").rlike("^\\d+$"))
      .select(col("_h").as("host"), col("grp"),
        col("_val").cast(LongType).as("delay_s"))
    agentsOf(typed).join(delays, Seq("host", "grp"))
      .groupBy(col("host"), col("agent"))
      .agg(max(col("delay_s")).as("delay_s"))
  }

  /** Verdicts for `(host, agent, upath)` requests against [[rules]]
    * rows: emits `(host, agent, upath, allowed)`. Longest matching
    * prefix wins, ties to Allow, no match (or no applicable group)
    * means allowed. ONE map-side-combined `max(struct(len, allow))`
    * per request — never a per-request sort. */
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
    exact.unionByName(star)
      .join(ruleRows.withColumnRenamed("agent", "_eff"),
        Seq("host", "_eff"), "left")
      .withColumn("_mlen",
        when(col("rpath").isNotNull &&
          substring(col("upath"), lit(1), length(col("rpath"))) ===
            col("rpath"),
          length(col("rpath"))).otherwise(lit(-1)))
      .groupBy(col("host"), col("agent"), col("upath"))
      .agg(max(struct(col("_mlen").as("l"),
        when(col("allow"), 1).otherwise(0).as("a"))).as("_best"))
      .select(col("host"), col("agent"), col("upath"),
        (col("_best.l") < 0 || col("_best.a") === 1).as("allowed"))
  }
}
