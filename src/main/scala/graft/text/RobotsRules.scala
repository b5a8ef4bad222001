package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing + URL admission (RFC 9309, the Robots Exclusion
  * Protocol) — the crawl-governance gate a web-corpus pipeline runs
  * BEFORE fetching (and re-runs at curation time to honor retroactive
  * opt-outs, the Common Crawl takedown shape). Everything is relational:
  * parse is a line explode + window group-assignment, group selection and
  * longest-match evaluation are joins + one window — so the whole policy
  * evaluates for a BILLION urls as two shuffles, and a DuckDB oracle
  * replays the algebra exactly.
  *
  * Semantics implemented (RFC 9309 §2, documented simplifications):
  *   - groups = consecutive `User-agent:` lines sharing the rules below
  *     them; agent match is EXACT lowercase token equality, with `*` as
  *     the fallback group; if any group names the agent exactly, all
  *     such groups apply and `*` groups are ignored (RFC: most specific
  *     user-agent wins; multiple matching groups combine).
  *   - rules are path PREFIX matches; `*` matches any octet sequence; a
  *     TRAILING `$` anchors the end of the path (a mid-rule `$` is
  *     literal). An empty rule value is a no-op line, not a match-all.
  *   - precedence per URL = longest rule string wins (octet length of
  *     the rule as written); equal length → `allow` wins. No matching
  *     rule, no matching group, or no robots.txt → allowed.
  *   - `#` starts a comment; unknown directives are ignored.
  */
object RobotsRules {

  /** Parse robots.txt bodies into (host, grp, is_ua, k, v) rule rows:
    * one row per meaningful directive line, `grp` numbering each
    * user-agent group within its host (a UA line whose PREVIOUS directive
    * is not a UA line opens a new group — that's the "consecutive
    * User-agent lines head one group" rule).
    */
  def parseDirectives(robots: DataFrame, hostCol: String, txtCol: String): DataFrame = {
    val lines = robots.select(
      col(hostCol).as("host"),
      posexplode(split(col(txtCol), "\n")).as(Seq("ln", "raw")))
    val noComment = trim(regexp_replace(col("raw"), "#.*", ""))
    val parsed = lines
      .select(
        col("host"), col("ln"),
        lower(trim(regexp_extract(noComment, "^([A-Za-z-]+)\\s*:", 1))).as("k"),
        trim(regexp_replace(noComment, "^[A-Za-z-]+\\s*:", "")).as("v"))
      .filter(col("k").isin("user-agent", "allow", "disallow"))
    val w = Window.partitionBy("host").orderBy("ln")
    parsed
      .withColumn("_prev_k", lag(col("k"), 1).over(w))
      .withColumn("_new_grp",
        when(col("k") === "user-agent" &&
          (col("_prev_k").isNull || col("_prev_k") =!= "user-agent"), 1L)
          .otherwise(0L))
      .withColumn("grp", sum(col("_new_grp")).over(w))
      .drop("_prev_k", "_new_grp")
  }

  /** The rules that bind `agent` per host: groups naming the agent
    * exactly if any exist, else the `*` groups. Returns (host, verb,
    * rule) with empty-valued rules dropped (RFC no-op lines).
    */
  def effectiveRules(directives: DataFrame, agent: String): DataFrame = {
    val ag = agent.toLowerCase
    val flags = directives
      .groupBy("host", "grp")
      .agg(
        max(when(col("k") === "user-agent" && lower(col("v")) === ag, 1)
          .otherwise(0)).as("_exact"),
        max(when(col("k") === "user-agent" && col("v") === "*", 1)
          .otherwise(0)).as("_star"))
    val hostExact = flags.groupBy("host")
      .agg(max(col("_exact")).as("_host_exact"))
    val chosen = flags.join(hostExact, "host")
      .filter(col("_exact") === 1 ||
        (col("_host_exact") === 0 && col("_star") === 1))
      .select("host", "grp")
    directives
      .join(chosen, Seq("host", "grp"))
      .filter(col("k").isin("allow", "disallow") && col("v") =!= "")
      .select(col("host"), col("k").as("verb"), col("v").as("rule"))
  }

  /** Rule → SQL LIKE pattern (escape char `!`): detect the trailing `$`
    * anchor first, escape LIKE metacharacters, widen `*` to `%`, append
    * `%` unless anchored. Exposed for the oracle to mirror.
    */
  def likePattern(rule: Column): (Column, Column) = {
    val anchored = rule.endsWith("$")
    val bare = when(anchored, rule.substr(lit(1), length(rule) - 1)).otherwise(rule)
    val escaped = regexp_replace(
      regexp_replace(regexp_replace(bare, "!", "!!"), "%", "!%"), "_", "!_")
    val widened = regexp_replace(escaped, "\\*", "%")
    (when(anchored, widened).otherwise(concat(widened, lit("%"))), anchored)
  }

  /** Admission verdict per URL row: (host, path) × effective rules →
    * longest-match / allow-on-tie / allowed-by-default. Output keeps the
    * winning rule for audit (`rule` NULL = no rule matched). The join is
    * keyed on host — rules tables are tiny next to URL tables, so
    * broadcast; the single window ranks only MATCHED (url, rule) pairs.
    */
  def evaluate(urls: DataFrame, rules: DataFrame): DataFrame = {
    val (pat, _) = likePattern(col("rule"))
    val cand = urls
      .join(broadcast(rules.withColumn("_pat", pat)), Seq("host"), "left")
      .withColumn("_hit",
        col("rule").isNotNull && expr("path LIKE _pat ESCAPE '!'"))
    val w = Window.partitionBy("host", "path")
      .orderBy(
        when(col("_hit"), length(col("rule"))).otherwise(-1).desc,
        when(col("verb") === "allow", 1).otherwise(0).desc,
        col("rule").asc_nulls_last)
    cand
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .select(
        col("host"), col("path"),
        when(col("_hit"), col("rule")).as("rule"),
        (!col("_hit") || col("verb") === "allow").as("allowed"))
  }
}
