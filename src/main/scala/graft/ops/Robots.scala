package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** robots.txt evaluation (RFC 9309) — the crawl-compliance filter a
  * web-corpus pipeline applies before a page may enter training data
  * (and retroactively, when republishing: drop pages whose current
  * robots policy excludes your agent).
  *
  * Semantics implemented per RFC 9309 / the Google REP:
  *  - groups select by user-agent product token, case-insensitive;
  *    the most specific matching group wins (longest token match),
  *    `*` is the fallback; multiple groups with the same token merge.
  *  - rule paths support `*` (any octet sequence) and `$` (end
  *    anchor); matching is greedy with backtracking, octet-wise.
  *  - precedence: the matching rule with the LONGEST path entry wins;
  *    on a length tie, allow wins. No matching rule → allowed.
  *
  * Scale shape: a robots corpus is DOMAIN-count-sized (tens of
  * millions of small texts at web scale, not billions of pages) —
  * rules parse once per domain and join to the page table on the
  * domain key; the per-URL decision is a partition-local kernel over
  * the (tiny, often broadcast) rules side. Nothing here is per-page
  * quadratic.
  */
object Robots {

  final case class Rule(allow: Boolean, path: String)

  /** Parse robots.txt content and return the rule list governing
    * `userAgent` (most specific group, `*` fallback, merged across
    * repeated groups). Unknown directives are ignored per the RFC;
    * a rules-before-any-group prelude is ignored likewise.
    */
  def rulesFor(content: String, userAgent: String): Seq[Rule] = {
    val ua = userAgent.toLowerCase
    // (agent tokens of current group header run, rules of that group)
    val groups = scala.collection.mutable.ArrayBuffer.empty[(Seq[String], Seq[Rule])]
    var agents = scala.collection.mutable.ArrayBuffer.empty[String]
    var rules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var inHeader = true // consecutive user-agent lines extend one group
    def flush(): Unit = {
      if (agents.nonEmpty) groups += ((agents.toSeq, rules.toSeq))
      agents = scala.collection.mutable.ArrayBuffer.empty[String]
      rules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    }
    content.split("\n").foreach { raw =>
      val line = raw.split("#", 2)(0).trim // comments strip anywhere
      val i = line.indexOf(':')
      if (i > 0) {
        val key = line.substring(0, i).trim.toLowerCase
        val value = line.substring(i + 1).trim
        key match {
          case "user-agent" =>
            if (!inHeader) flush()
            agents += value.toLowerCase
            inHeader = true
          case "allow" | "disallow" =>
            inHeader = false
            // empty Disallow means "allow everything" — no rule
            if (value.nonEmpty && agents.nonEmpty)
              rules += Rule(key == "allow", value)
          case _ => () // sitemap, crawl-delay, unknown: not rules
        }
      }
    }
    flush()
    // most specific agent token: longest token that is a prefix of ua
    // (product-token semantics: "graftbot" matches "graftbot/1.2")
    val candidates = groups.flatMap { case (as, rs) =>
      as.collect {
        case a if a != "*" && ua.startsWith(a) => (a.length, rs)
      }
    }
    if (candidates.nonEmpty) {
      val best = candidates.map(_._1).max
      candidates.filter(_._1 == best).flatMap(_._2).toSeq
    } else groups.filter(_._1.contains("*")).flatMap(_._2).toSeq
  }

  /** RFC 9309 path match: `*` = any sequence, `$` = end anchor (only
    * meaningful as the final char; elsewhere it is literal). Greedy
    * with backtracking — worst case O(path·pattern), both tiny.
    */
  def pathMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.dropRight(1) else pattern
    def m(pi: Int, si: Int): Boolean = {
      if (pi == pat.length) !anchored || si == path.length
      else if (pat.charAt(pi) == '*')
        (si to path.length).exists(s2 => m(pi + 1, s2))
      else si < path.length && path.charAt(si) == pat.charAt(pi) && m(pi + 1, si + 1)
    }
    m(0, 0)
  }

  /** Decide one path: (allowed, winning rule path or "" for the
    * no-match default-allow).
    */
  def decide(rules: Seq[Rule], path: String): (Boolean, String) = {
    val matching = rules.filter(r => pathMatches(r.path, path))
    if (matching.isEmpty) (true, "")
    else {
      // longest path entry wins; allow wins length ties
      val best = matching.maxBy(r => (r.path.length, r.allow))
      (best.allow, best.path)
    }
  }

  /** Filter a (doc_id, path) table through one agent's rules (the
    * single-domain form; the multi-domain form joins a parsed-rules
    * table on the domain key first). Output adds (allowed, rule).
    */
  def allowFilter(spark: SparkSession, urls: DataFrame, robotsTxt: String,
      userAgent: String): DataFrame = {
    import spark.implicits._
    val rules = rulesFor(robotsTxt, userAgent) // parsed ONCE, serialized to tasks
    urls.select(col("doc_id"), col("path")).as[(Long, String)]
      .mapPartitions(_.map { case (id, p) =>
        val (allowed, rule) = decide(rules, p)
        (id, p, allowed, rule)
      }).toDF("doc_id", "path", "allowed", "rule")
  }
}
