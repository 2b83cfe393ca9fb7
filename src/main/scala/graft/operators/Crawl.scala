package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-front URL operators — the FIRST dedup any web pipeline runs,
  * before any text-level pass: the same page is typically fetched under
  * many URL spellings (scheme/host case, default ports, `www.`,
  * tracking params, fragments, `index.html`, trailing slashes), and
  * collapsing those is orders of magnitude cheaper than letting the
  * copies reach text shingling.
  *
  * Everything here is pure string composition over built-in functions
  * (codegen'd, map-only) — no UDF, no network, no IDN/punycode
  * dependency — and every rule is deterministic and replayable in
  * ANSI-ish SQL, so the queries carry exact DuckDB oracles. The regexes
  * avoid backreferences/lookarounds and are RE2-portable.
  */
object Crawl {

  /** Canonical form of a crawl URL. Rules, in order:
    *
    *  1. fragment dropped (`#...` never reaches the server);
    *  2. scheme and host lowercased (RFC 3986 §6.2.2.1 — path STAYS
    *     case-sensitive);
    *  3. leading `www.` dropped from the host;
    *  4. default ports stripped (`:80` for http, `:443` for https;
    *     any other explicit port kept);
    *  5. any TRAILING RUN of `/index.html` and `/` tokens dropped from
    *     the path in one anchored pass (so `/a/` ≡ `/a` ≡
    *     `/a/index.html` ≡ `/a/index.html/`), which makes the rule a
    *     FIXPOINT — canon(canon(u)) == canon(u), property-pinned. The
    *     earlier two-step form (strip `/index.html$`, then slashes)
    *     missed `/a/index.html/` and stacked `/index.html/index.html`,
    *     so a recrawl would re-digest the same page under a new key;
    *  6. query keys sorted (param order never matters), empty params
    *     and `utm_*` tracking params dropped; an emptied query drops
    *     its `?`.
    *
    * Malformed input (no `scheme://`) canonicalizes to itself
    * lowercased-scheme-less — garbage in, stable garbage out — so the
    * digest dedup still groups identical junk. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1)
    val host = regexp_replace(
      lower(regexp_replace(hostPort, ":[0-9]+$", "")), "^www\\.", "")
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val portPart =
      when(port === "", lit(""))
        .when(scheme === "http" && port === "80", lit(""))
        .when(scheme === "https" && port === "443", lit(""))
        .otherwise(concat(lit(":"), port))
    val rawPath = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?]*)", 1)
    val path = regexp_replace(rawPath, "(/index\\.html|/)+$", "")
    val rawQuery = regexp_extract(noFrag, "\\?(.*)$", 1)
    val params = array_sort(filter(split(rawQuery, "&"),
      p => p =!= "" && !p.startsWith("utm_")))
    val query = array_join(params, "&")
    val queryPart =
      when(query === "", lit("")).otherwise(concat(lit("?"), query))
    when(scheme === "", lower(url))
      .otherwise(concat(scheme, lit("://"), host, portPart, path, queryPart))
  }

  /** Host of a canonicalized URL (empty string for malformed input). */
  def urlHost(canonUrl: Column): Column =
    regexp_extract(canonUrl, "^[a-z][a-z0-9+.-]*://([^/:?]*)", 1)

  /** Registered domain (eTLD+1 approximation) of a host: the last two
    * labels, or the last three when the second-to-last label is a
    * well-known second-level registry label (`co.uk`, `com.au`,
    * `ac.jp`, ...). A deterministic HEURISTIC, not the Public Suffix
    * List — this build has no data files and the PSL churns; the
    * label-set covers the overwhelmingly common registries and the
    * rule is replayable in SQL, which is what the oracle checks. For
    * PSL-exact grouping at production, swap this column for a
    * broadcast-joined PSL lookup — the report shape is unchanged. */
  def registeredDomain(host: Column): Column = {
    val parts = split(host, "\\.")
    val n = size(parts)
    val secondLast = element_at(parts, -2)
    val registrySecond = secondLast.isin(
      "co", "com", "net", "org", "ac", "gov", "edu")
    when(n <= 2, host)
      .when(registrySecond, concat_ws(".", slice(parts, -3, 3)))
      .otherwise(concat_ws(".", slice(parts, -2, 2)))
  }

  /** Per-registered-domain rollup of [[hostReport]]: hosts, fetches,
    * distinct pages per eTLD+1 — the crawl-budget ledger one level up.
    * Same skew discipline as hostReport: collapse on the well-spread
    * (domain, host[, page]) pairs first, THEN count — never a
    * distinct-aggregate hanging off the low-cardinality domain key. */
  def domainReport(df: DataFrame, urlCol: String): DataFrame =
    hostReport(df, urlCol)
      .select(registeredDomain(col("host")).as("domain"),
        col("host"), col("n_fetches"), col("n_pages"))
      .groupBy(col("domain"))
      .agg(
        count(lit(1)).as("n_hosts"),
        sum(col("n_fetches")).as("n_fetches"),
        sum(col("n_pages")).as("n_pages"))

  /** Exact URL dedup: keep ONE row per canonical URL — the first under
    * `orderBy` (pass quality-descending columns to keep the best
    * fetch, e.g. `Seq(col("n_chars").desc, col(idCol))`). Output is
    * the surviving rows plus their `canon_url`.
    *
    * Scale shape: canonicalization is a map-only projection; the only
    * exchange hash-partitions rows by the canonical-URL DIGEST (never
    * by the raw URL string — equal-length fixed keys shuffle tighter
    * and skew-salt cleanly), and within each partition `row_number`
    * keeps one row per key. One shuffle total, same shape as
    * [[Dedup.dropExactDuplicates]]. */
  def urlDedup(
      df: DataFrame,
      urlCol: String,
      orderBy: Seq[Column]): DataFrame = {
    val withCanon = df.withColumn("canon_url", canonicalizeUrl(col(urlCol)))
    val w = Window
      .partitionBy(sha2(col("canon_url").cast("binary"), 256))
      .orderBy(orderBy: _*)
    withCanon
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** A canonical URL with its host swapped for `newHost` — scheme and
    * everything after the authority's host (port, path, query) kept.
    * Malformed input (no scheme) passes through untouched. Shared by
    * the batch [[mirrorAwareUrlDedup]] and the streaming twin so the
    * two rewrites can never diverge. */
  def rewriteHost(canonUrl: Column, newHost: Column): Column = {
    val scheme = regexp_extract(canonUrl, "^([a-z][a-z0-9+.-]*)://", 1)
    val rest = regexp_extract(canonUrl,
      "^[a-z][a-z0-9+.-]*://[^/:?]*(.*)$", 1)
    when(urlHost(canonUrl) === "", canonUrl)
      .otherwise(concat(scheme, lit("://"), newHost, rest))
  }

  /** MIRROR-AWARE exact URL dedup: [[urlDedup]] with the host first
    * rewritten to its cluster-canonical host ([[mirrorClusters]]'
    * `(host, canonical_host)` output, broadcast) — so the SAME page
    * fetched from a mirror (`m3.example.com/p/7` vs
    * `h3.example.com/p/7`) collapses to ONE survivor, which plain
    * urlDedup cannot do (the canonical URLs differ in host). This is
    * the decision the mirror-cluster election exists to feed: fetch
    * one copy of a mirrored site, not one per mirror.
    *
    * The rewrite is pure string surgery on the canonical URL —
    * scheme + elected host + everything after the original host
    * (port, path, query untouched) — and hosts absent from `hostMap`
    * map to themselves. Output keeps the input columns plus
    * `canon_url` (the MIRROR-canonical URL the survivor represents).
    *
    * Scale shape: [[urlDedup]]'s — map-only canonicalization, the
    * host map as one broadcast join (|hosts| rows, tiny relative to
    * fetches), then the single digest-keyed exchange. */
  def mirrorAwareUrlDedup(
      df: DataFrame,
      urlCol: String,
      hostMap: DataFrame,
      orderBy: Seq[Column]): DataFrame = {
    val canon = df.withColumn("__canon0", canonicalizeUrl(col(urlCol)))
      .withColumn("__host0", urlHost(col("__canon0")))
    val hm = broadcast(hostMap.select(
      col("host").as("__mh"), col("canonical_host").as("__mcanon")))
    val rewritten = canon
      .join(hm, col("__host0") === col("__mh"), "left")
      .withColumn("canon_url",
        rewriteHost(col("__canon0"),
          coalesce(col("__mcanon"), col("__host0"))))
      .drop("__canon0", "__host0", "__mh", "__mcanon")
    val w = Window
      .partitionBy(sha2(col("canon_url").cast("binary"), 256))
      .orderBy(orderBy: _*)
    rewritten
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Path component of a canonicalized URL (empty for malformed input
    * and for bare-host URLs — the canonicalizer already dropped the
    * lone trailing slash). */
  def urlPath(canonUrl: Column): Column =
    regexp_extract(canonUrl, "^[a-z][a-z0-9+.-]*://[^/?]*([^?]*)", 1)

  /** Path INCLUDING the query string — the REP match target. RFC 9309
    * §2.2.2 matches rules against "the path, and optionally the query"
    * (real policies gate on queries with star-wildcard session-id
    * Disallow rules), so the robots gate must not strip `?…` the way
    * [[urlPath]] does. Per the same section an EMPTY path defaults to
    * `/`: a bare-host query URL (`http://h?session=x` — the
    * canonicalizer drops the lone trailing slash, so this shape is
    * normal post-canon) must present `/?session=x` to the rules, or
    * every root-level star-wildcard session Disallow is silently
    * bypassed for exactly the URLs it exists to gate. */
  def urlPathQuery(canonUrl: Column): Column = {
    val pq = regexp_extract(canonUrl, "^[a-z][a-z0-9+.-]*://[^/?]*(.*)$", 1)
    when(pq.startsWith("/"), pq).otherwise(concat(lit("/"), pq))
  }

  /** RFC 9309 §2.2.3 rule-value translation: `*` matches any char
    * sequence, a TRAILING `$` anchors the end, everything else is
    * literal (a mid-pattern `$` included). Produces a `^`-anchored
    * regex — find-semantics `regexp_like`/`regexp_matches` then
    * equal full REP matching on both engines. */
  def repPatternRegex(pat: Column): Column = {
    val hasEnd = pat.endsWith("$")
    val core = when(hasEnd, pat.substr(lit(1), length(pat) - 1)).otherwise(pat)
    // Escape every regex metachar (star included), then turn the
    // now-escaped stars back into `.*` — two fixed passes, no
    // per-char loop.
    val escaped = regexp_replace(core, "[\\\\^$.|?*+()\\[\\]{}]", "\\\\$0")
    val wild = regexp_replace(escaped, "\\\\\\*", ".*")
    concat(lit("^"), wild, when(hasEnd, lit("$")).otherwise(lit("")))
  }

  /** Specificity of a rule value for the RFC's longest-match fold: the
    * count of LITERAL octets — `*` matches anything and the trailing
    * `$` matches nothing, so neither adds specificity (`/p*` must not
    * outrank `/page` on raw length). Equals `length(prefix)` for
    * wildcard-free rules, so plain-prefix tables rank exactly as
    * before. */
  def repLiteralLen(pat: Column): Column = {
    val hasEnd = pat.endsWith("$")
    val core = when(hasEnd, pat.substr(lit(1), length(pat) - 1)).otherwise(pat)
    length(translate(core, "*", ""))
  }

  /** A rule value is PLAIN (prefix-matchable) when it carries neither
    * a `*` nor a trailing `$` — the dispatch predicate every REP
    * matcher shares ([[repMatches]], [[robotsFilter]]'s broadcast
    * projection, [[robotsRulesPerHost]]), defined once so the plain/
    * wildcard split can never diverge between them. */
  def repIsPlain(pat: Column): Column =
    !pat.contains("*") && !pat.endsWith("$")

  /** The match against PRECOMPUTED dispatch columns — the form the
    * broadcast-side tables use ([[robotsFilter]], [[robotsVerdict]]'s
    * rule structs), where `plain`/`regex` were derived once per rule
    * by [[repIsPlain]]/[[repPatternRegex]]. */
  def repMatchesPrecomputed(
      target: Column, prefix: Column, plain: Column, regex: Column): Column =
    when(plain, target.startsWith(prefix))
      .otherwise(regexp_like(target, regex))

  /** One REP rule match: the wildcard-free fast path stays a codegen'd
    * `startsWith` (the overwhelmingly common rule shape); `*`/`$`
    * rules go through the translated anchored regex. */
  def repMatches(target: Column, pat: Column): Column =
    repMatchesPrecomputed(target, pat, repIsPlain(pat), repPatternRegex(pat))

  /** Robots-style URL gate: per-host longest-match allow/deny rules,
    * the politeness filter a crawler applies AFTER canonicalization
    * and BEFORE scheduling. `rules` is the parsed policy table —
    * `(host, prefix, allow)` where the prefix value may carry RFC 9309
    * §2.2.3 wildcards (`*` any chars, trailing `$` end anchor) — small
    * by construction (robots files are per-host and bounded), so it
    * broadcasts. Semantics follow RFC 9309: rules match the PATH PLUS
    * QUERY ([[urlPathQuery]]), the most specific match wins (most
    * LITERAL octets, [[repLiteralLen]] — `*`/`$` add no specificity),
    * an allow beats a disallow of equal specificity, and a URL
    * matching no rule is allowed.
    *
    * The verdict fold encodes each matching rule as the integer
    * `2*litlen + (allow ? 1 : 0)` and takes the MAX — most-literal
    * match dominates via the `2*litlen` term, allow wins equal ties
    * via the parity bit — which keeps the aggregation a plain
    * partial-aggregating `max` (map-side combine, no ordered
    * collection per URL) and is replayable verbatim in SQL
    * (`regexp_matches` on the same translated patterns). Wildcard-free
    * rules (the common case) match through the codegen'd `startsWith`
    * fast path and rank exactly as before.
    *
    * Scale shape: rules broadcast (one hash join, host equi-key +
    * rule-match residual), then ONE exchange on the high-cardinality
    * (id, url) group key. Never a shuffle of the rule fan-out beyond
    * that, never a per-URL sort. Output keeps every input URL with its
    * `allowed` verdict and `matched_len` (the winning rule's literal
    * length; null = no rule matched) — callers filter on `allowed` to
    * gate the frontier. */
  def robotsFilter(
      df: DataFrame,
      urlCol: String,
      idCol: String,
      rules: DataFrame): DataFrame = {
    val canon = canonicalizeUrl(col(urlCol))
    val base = df
      .select(col(idCol), canon.as("canon_url"))
      .withColumn("host", urlHost(col("canon_url")))
      .withColumn("path", urlPathQuery(col("canon_url")))
    // The wildcard translation and literal length precompute ONCE per
    // rule inside the broadcast projection (the robotsRulesPerHost
    // discipline) — left in the join residual they would re-derive
    // the pattern string per (URL × rule) pair.
    val r = broadcast(rules.select(
      col("host").as("__rhost"),
      col("prefix").as("__prefix"),
      col("allow").as("__allow"),
      repIsPlain(col("prefix")).as("__plain"),
      repPatternRegex(col("prefix")).as("__regex"),
      repLiteralLen(col("prefix")).as("__litlen")))
    base
      .join(r,
        base("host") === col("__rhost") &&
          repMatchesPrecomputed(base("path"), col("__prefix"),
            col("__plain"), col("__regex")),
        "left")
      .groupBy(col(idCol), col("canon_url"), col("host"), col("path"))
      .agg(max(when(col("__prefix").isNotNull,
        col("__litlen") * 2 + col("__allow").cast("int")))
        .as("__best"))
      .withColumn("allowed",
        col("__best").isNull || col("__best") % 2 === 1)
      .withColumn("matched_len",
        floor(col("__best") / 2).cast("int"))
      .drop("__best")
  }

  /** Parse raw robots.txt BODIES into the `(host, prefix, allow)`
    * rule table [[robotsFilter]]/[[robotsVerdict]] consume — the
    * missing first step of the fetch-to-frontier composition: a crawl
    * stores the robots fetch like any other page, and this turns that
    * raw text into policy, relationally.
    *
    * REP subset implemented (per the published REP / RFC 9309
    * grammar): `#` comments strip anywhere on a line; field names are
    * case-insensitive; CONSECUTIVE `User-agent` lines (comments and
    * blanks between them included) open one GROUP that owns the
    * following `Allow`/`Disallow` lines; a later `User-agent` line
    * after rules starts a new group. Group selection per host: if ANY
    * group names `agent` exactly (case-insensitive product token),
    * the union of those groups' rules applies, else the `*` groups —
    * the RFC's most-specific-agent rule. An empty `Disallow:` is
    * ignored (allow-all — matching no rule is allowed downstream).
    * Unknown fields (Crawl-delay, Sitemap, …) are ignored.
    *
    * Scale shape: one exchange on the host key for the line windows
    * (`lag` for group starts, a running sum for group ids — robots
    * bodies are small per host, so a host's lines fit one task by
    * construction), then host+group-keyed partial aggregations for
    * the agent-selection join. Output is DISTINCT (duplicate rule
    * lines collapse; the downstream max-fold is insensitive either
    * way). */
  def parseRobots(
      df: DataFrame,
      hostCol: String,
      bodyCol: String,
      agent: String): DataFrame = {
    val (lines, selected) = robotsSelectedGroups(df, hostCol, bodyCol, agent)
    lines
      .filter(col("__field").isin("allow", "disallow") &&
        col("__value") =!= "")
      .join(selected, Seq("host", "__grp"))
      .select(col("host"), col("__value").as("prefix"),
        (col("__field") === "allow").as("allow"))
      .distinct()
  }

  /** The politeness side of [[parseRobots]]: the selected groups'
    * `Crawl-delay` directives as the `(host, delay_s)` policy table
    * [[frontierPlan]]/[[frontierPlanGated]] consume — with this, every
    * policy input of the frontier composition derives from the raw
    * fetch log. Same group/selection grammar as the rules (the two
    * parsers can never diverge — shared machinery); several delay
    * lines in the selected groups take the MAXIMUM — the politeness-
    * preserving read (the minimum would be the most AGGRESSIVE crawl
    * rate); non-numeric or negative values drop (Spark's cast-to-null
    * semantics, mirrored with TRY_CAST in the oracle). Hosts with no
    * selected delay are absent — the scheduler's `defaultDelayS`
    * applies, exactly as with a hand-written policy table. */
  def parseCrawlDelay(
      df: DataFrame,
      hostCol: String,
      bodyCol: String,
      agent: String): DataFrame = {
    val (lines, selected) = robotsSelectedGroups(df, hostCol, bodyCol, agent)
    lines
      .filter(col("__field") === "crawl-delay")
      .join(selected, Seq("host", "__grp"))
      // try_cast, not cast: ANSI mode THROWS on a malformed delay
      // ("Crawl-delay: soon"), and a junk line in one robots body must
      // never abort the whole parse — null-and-drop is the contract.
      .select(col("host"),
        expr("try_cast(__value AS double)").as("delay_s"))
      .filter(col("delay_s").isNotNull && col("delay_s") >= 0)
      .groupBy(col("host"))
      .agg(max(col("delay_s")).as("delay_s"))
  }

  /** `Sitemap:` directives from raw robots bodies — `(host,
    * sitemap_url)`, DISTINCT. Per the REP, sitemap lines are GLOBAL:
    * they bind to the host, not to any user-agent group, so no group
    * selection applies (the one robots field that ignores the group
    * machinery — deliberately NOT routed through
    * [[robotsSelectedGroups]]' selection). The crawl's seed-discovery
    * input: canonicalize and feed [[frontierPlan]]. */
  def parseSitemaps(
      df: DataFrame,
      hostCol: String,
      bodyCol: String): DataFrame =
    df.select(col(hostCol).as("host"),
        // \r?\n, not \n: CRLF is the common wire format for
        // robots.txt and trim strips spaces only — a trailing \r
        // would ride into every value and kill prefix matching.
        posexplode(split(col(bodyCol), "\r?\n")))
      .withColumn("__clean", trim(regexp_replace(col("col"), "#.*", "")))
      .filter(lower(trim(regexp_extract(col("__clean"), "^([^:]+):", 1)))
        === "sitemap")
      .select(col("host"),
        trim(regexp_extract(col("__clean"), "^[^:]+:(.*)$", 1))
          .as("sitemap_url"))
      .filter(col("sitemap_url") =!= "")
      .distinct()

  /** Shared REP line/group machinery: cleaned field/value lines with
    * group ids, plus the `(host, __grp)` set selected for `agent`
    * (exact-agent groups if any exist for the host, else the `*`
    * groups). */
  private def robotsSelectedGroups(
      df: DataFrame,
      hostCol: String,
      bodyCol: String,
      agent: String): (DataFrame, DataFrame) = {
    val w = Window.partitionBy(col("host")).orderBy(col("ln"))
    val lines = df
      .select(col(hostCol).as("host"),
        posexplode(split(col(bodyCol), "\r?\n")))
      .withColumnRenamed("pos", "ln")
      .withColumnRenamed("col", "__raw")
      .withColumn("__clean", trim(regexp_replace(col("__raw"), "#.*", "")))
      .filter(col("__clean") =!= "")
      .withColumn("__field",
        lower(trim(regexp_extract(col("__clean"), "^([^:]+):", 1))))
      .withColumn("__value",
        trim(regexp_extract(col("__clean"), "^[^:]+:(.*)$", 1)))
      .withColumn("__isua", (col("__field") === "user-agent").cast("int"))
      .withColumn("__blockstart",
        (col("__isua") === 1 &&
          coalesce(lag(col("__isua"), 1).over(w), lit(0)) === 0).cast("int"))
      .withColumn("__grp", sum(col("__blockstart")).over(w))
    val uas = lines.filter(col("__isua") === 1)
      .select(col("host"), col("__grp"), lower(col("__value")).as("__ua"))
    val groups = uas.groupBy(col("host"), col("__grp")).agg(
      max((col("__ua") === lower(lit(agent))).cast("int")).as("__exact"),
      max((col("__ua") === "*").cast("int")).as("__star"))
    val hostHasExact = groups.groupBy(col("host"))
      .agg(max(col("__exact")).as("__has_exact"))
    val selected = groups.join(hostHasExact, "host")
      .filter(when(col("__has_exact") === 1, col("__exact") === 1)
        .otherwise(col("__star") === 1))
      .select(col("host"), col("__grp"))
    (lines, selected)
  }

  /** The rules table folded to one row per host — `(host,
    * rules: array<struct<prefix,allow,plain,regex,litlen>>)` — the
    * broadcast shape [[robotsVerdict]] consumes. The wildcard
    * translation ([[repPatternRegex]]/[[repLiteralLen]]) is
    * precomputed HERE, once per rule, so the per-row stream fold never
    * rebuilds pattern strings. Bounded by construction (robots
    * policies are per-host and small), so the collect_list is safe. */
  def robotsRulesPerHost(rules: DataFrame): DataFrame =
    rules.groupBy(col("host"))
      .agg(collect_list(struct(
        col("prefix"), col("allow"),
        repIsPlain(col("prefix")).as("plain"),
        repPatternRegex(col("prefix")).as("regex"),
        repLiteralLen(col("prefix")).as("litlen"))).as("rules"))

  /** Stateless single-row REP verdict: the same `max(2·litlen +
    * allow)` fold as [[robotsFilter]] — wildcard-free rules through
    * `startsWith`, `*`/`$` rules through the precomputed anchored
    * regex — computed by a higher-order `aggregate` over the host's
    * rule array instead of a relational group-by; -1 encodes "no rule
    * matched" (allowed). Because it is a pure per-row projection it
    * runs unchanged on a STREAM (no aggregation state, no watermark)
    * — [[graft.streaming.Streaming.robotsGateStream]] is exactly this
    * fold behind a broadcast stream-static join; parity with the
    * relational form is spec-pinned. */
  def robotsVerdict(path: Column, rulesArr: Column): Column =
    when(rulesArr.isNull, lit(-1L)).otherwise(
      aggregate(rulesArr, lit(-1L), (acc, r) =>
        when(repMatchesPrecomputed(path, r.getField("prefix"),
            r.getField("plain"), r.getField("regex")),
          greatest(acc, r.getField("litlen").cast("long") * 2 +
            r.getField("allow").cast("long")))
          .otherwise(acc)))

  /** Crawl-frontier politeness schedule: cap each host's queue at
    * `maxPerHost` best-priority URLs, then assign per-host fetch slots
    * `fetch_at_s = rank * delay` spaced by the host's crawl delay
    * (from the small broadcast `policy` table `(host, delay_s)`;
    * `defaultDelayS` where a host has no policy row).
    *
    * Scale shape: the per-host cap runs through
    * [[graft.plans.GroupedTopK.topKPerGroup]] — partial top-k per
    * input partition BEFORE the exchange, so a mega-host contributes
    * at most `maxPerHost` rows per partition to the shuffle instead of
    * funneling its whole queue into one task (the same
    * low-cardinality-key discipline as [[hostReport]]). The ranking
    * window after the cap partitions on host but is BOUNDED at
    * `maxPerHost` rows per partition by construction. One bounded
    * exchange + one broadcast join total. */
  def frontierPlan(
      df: DataFrame,
      urlCol: String,
      priorityCol: String,
      policy: DataFrame,
      defaultDelayS: Double,
      maxPerHost: Int): DataFrame = {
    val canon = canonicalizeUrl(col(urlCol))
    val base = df
      .select(canon.as("canon_url"),
        col(priorityCol).cast("double").as("priority"))
      .withColumn("host", urlHost(col("canon_url")))
    val capped = graft.plans.GroupedTopK.topKPerGroup(
      base, Seq("host"),
      Seq(col("priority").desc, col("canon_url").asc), maxPerHost)
    val w = Window.partitionBy(col("host"))
      .orderBy(col("priority").desc, col("canon_url").asc)
    val p = broadcast(policy.select(
      col("host").as("__phost"),
      col("delay_s").cast("double").as("__delay")))
    capped
      .withColumn("rank", row_number().over(w).cast("long"))
      .join(p, col("host") === col("__phost"), "left")
      .withColumn("delay_s", coalesce(col("__delay"), lit(defaultDelayS)))
      .withColumn("fetch_at_s", (col("rank") - 1) * col("delay_s"))
      .drop("__phost", "__delay")
  }

  /** [[frontierPlan]] under PER-HOST fetch budgets — the CONSUMER of
    * [[hostFetchBudget]]'s allocations, closing the crawl budget loop
    * into the schedule itself: host `h` schedules at most `alloc_h`
    * URLs this wave (an unallocated or zero-alloc host schedules
    * NOTHING — its pages all failed the quality gates, so it earns no
    * fetches), politeness-ranked and delay-spaced exactly as
    * [[frontierPlan]] ranks inside its cap. `allocs` is a
    * hostFetchBudget output (only `host` and `alloc` are read;
    * O(hosts), broadcast). `maxPerHost` stays the PHYSICAL bound on
    * the per-host heap — pass one at least your budget's largest seat
    * (the slot budget itself always works: no seat can exceed it) so
    * allocations are consumed exactly; it exists because the bounded
    * map-side heap must be sized by a plan-time constant, not a
    * runtime column (the [[frontierPlan]] low-cardinality-key
    * discipline — no construction-time job fetches the max seat).
    *
    * Scale shape: the allocation side is O(hosts), lazily PINNED once
    * (its census + Hamilton lineage is corpus-scale and feeds two
    * joins — the populationStabilityBy multi-consumption lesson) and
    * broadcast into both; the candidate lineage crosses exactly
    * [[frontierPlan]]'s ONE bounded top-k exchange — the schedule
    * body itself is frontierPlan's, DELEGATED, not copied (the
    * [[frontierFromScheduleGated]] discipline: one copy of the
    * politeness window). Output adds the host's `alloc` beside the
    * frontierPlan columns, where `alloc` is the EFFECTIVE wave cap
    * `min(granted seats, maxPerHost)` — when the physical bound
    * clamps an oversized grant, the row says so instead of reporting
    * seats this wave cannot consume (spec-pinned). */
  def frontierPlanBudgeted(
      df: DataFrame,
      urlCol: String,
      priorityCol: String,
      allocs: DataFrame,
      policy: DataFrame,
      defaultDelayS: Double,
      maxPerHost: Int): DataFrame = {
    val a = broadcast(Materialize.checkpoint(
      allocs
        .select(col("host").as("__ahost"),
          least(col("alloc").cast("long"), lit(maxPerHost.toLong))
            .as("__alloc"))
        .filter(col("__alloc") > 0),
      eager = false))
    val canon = canonicalizeUrl(col(urlCol))
    val budgeted = df
      .select(canon.as("canon_url"),
        col(priorityCol).cast("double").as("priority"))
      .withColumn("host", urlHost(col("canon_url")))
      .join(a, col("host") === col("__ahost"), "inner")
      .select(col("canon_url"), col("priority"))
    val planned = frontierPlan(budgeted, "canon_url", "priority",
      policy, defaultDelayS, maxPerHost)
    planned.join(a, planned("host") === col("__ahost"), "inner")
      .filter(col("rank") <= col("__alloc"))
      .withColumnRenamed("__alloc", "alloc")
      .drop("__ahost")
  }

  /** [[frontierPlan]] SEEDED from robots sitemaps: the `Sitemap:`
    * directives ([[parseSitemaps]]) are the REP's seed-discovery
    * channel, so their URLs union into the candidate side as
    * discoveries with a caller-chosen `seedPriority` (set it above the
    * organic priorities to fetch sitemaps first — they amortize into
    * many page discoveries). [[frontierPlan]] canonicalizes the merged
    * pool, so seed spellings dedup against explicit candidates the
    * same way any candidate does; rows surviving as duplicates
    * schedule twice, exactly like duplicated explicit candidates —
    * run [[urlDedup]] upstream when the feed may overlap.
    *
    * Scale shape: the union is map-side (no exchange of its own); the
    * sitemap DISTINCT exchanges only `(host, sitemap_url)` rows on the
    * small parse side; the candidate lineage still crosses exactly
    * frontierPlan's ONE bounded top-k exchange — spec-pinned. */
  def frontierPlanSeeded(
      df: DataFrame,
      urlCol: String,
      priorityCol: String,
      robots: DataFrame,
      hostCol: String,
      bodyCol: String,
      policy: DataFrame,
      defaultDelayS: Double,
      maxPerHost: Int,
      seedPriority: Double): DataFrame = {
    val seeds = parseSitemaps(robots, hostCol, bodyCol)
      .select(col("sitemap_url").as("__url"),
        lit(seedPriority).cast("double").as("__pri"))
    val cand = df
      .select(col(urlCol).as("__url"),
        col(priorityCol).cast("double").as("__pri"))
      .unionByName(seeds)
    frontierPlan(cand, "__url", "__pri", policy, defaultDelayS, maxPerHost)
  }

  /** Path template for trap mining: digit runs collapse to `N`, so a
    * calendar/pagination/session-id handler's unbounded URL spellings
    * all land in one (host, template) cell. Shared by
    * [[urlTemplateReport]] (which mines the cells) and
    * [[frontierPlanGated]] (which excludes candidates matching a
    * mined trap cell) — the two sides MUST template identically or
    * the gate silently misses. */
  def urlTemplate(path: Column): Column =
    regexp_replace(path, "[0-9]+", "N")

  /** The frontier, GATED: [[frontierPlan]] with the robots verdict and
    * the trap report composed IN FRONT of the politeness schedule —
    * what a production frontier actually runs (scheduling a denied or
    * trap URL wastes the crawl budget politeness exists to protect).
    *
    *   1. canonicalize each candidate (map-only);
    *   2. robots gate: [[robotsVerdict]] against the per-host rule
    *      array (one broadcast join + a row-local fold — NOT
    *      [[robotsFilter]]'s relational group-by, which would add an
    *      URL-key exchange for rule fan-out this per-row fold avoids);
    *   3. trap gate: (host, template) cells mined from `fetchLog` by
    *      [[urlTemplateReport]], flagged cells broadcast as the anti
    *      side (the trap table is bounded by the number of distinct
    *      path TEMPLATES per host, small by construction);
    *   4. survivors through the [[frontierPlan]] politeness schedule.
    *
    * Scale shape: both gates are broadcast joins over map-only
    * projections, so the ONLY exchange on the candidate (high-
    * cardinality) side is the politeness schedule's bounded per-host
    * top-k — plan-pinned in CrawlSpec: exactly one exchange upstream
    * of the final window, fed by the partial-top-k exec. The trap
    * MINING side aggregates the fetch log separately (hostReport
    * discipline, collapse-then-rollup) and only its flagged cells
    * cross to the candidate side. */
  def frontierPlanGated(
      df: DataFrame,
      urlCol: String,
      priorityCol: String,
      rules: DataFrame,
      fetchLog: DataFrame,
      logUrlCol: String,
      policy: DataFrame,
      defaultDelayS: Double,
      maxPerHost: Int,
      maxUrlsPerTemplate: Long): DataFrame = {
    val base = df
      .select(canonicalizeUrl(col(urlCol)).as("canon_url"),
        col(priorityCol).cast("double").as("priority"))
      .withColumn("host", urlHost(col("canon_url")))
      // Two match targets: REP rules see path PLUS query (RFC 9309),
      // trap templates stay on the query-free path — the cells are
      // mined from urlPath in urlTemplateReport and the two sides
      // must template identically.
      .withColumn("path", urlPath(col("canon_url")))
      .withColumn("__pq", urlPathQuery(col("canon_url")))
    val perHost = broadcast(robotsRulesPerHost(rules)
      .select(col("host").as("__rhost"), col("rules").as("__rules")))
    val traps = broadcast(
      urlTemplateReport(fetchLog, logUrlCol, maxUrlsPerTemplate)
        .filter(col("trap"))
        .select(col("host").as("__thost"), col("template").as("__ttpl")))
    val gated = base
      .join(perHost, col("host") === col("__rhost"), "left")
      .filter(robotsVerdict(col("__pq"), col("__rules")) % 2 =!= 0)
      .join(traps,
        col("host") === col("__thost") &&
          urlTemplate(col("path")) === col("__ttpl"),
        "left_anti")
      .select(col("canon_url"), col("priority"), col("host"))
    // canonicalizeUrl is a FIXPOINT (property-pinned), so handing the
    // already-canonical URL back through frontierPlan's own
    // canonicalization changes nothing — the survivors reuse the
    // schedule verbatim instead of a copy of its window logic.
    frontierPlan(gated, "canon_url", "priority", policy,
      defaultDelayS, maxPerHost)
  }

  /** Crawler-trap report: URL-template mining over the fetch log. Each
    * canonical URL's path collapses to a TEMPLATE (digit runs → `N`),
    * and a (host, template) cell whose distinct-URL count explodes past
    * `maxUrlsPerTemplate` is flagged — the calendar/pagination/session-id
    * trap signature (one handler generating unbounded URL spellings), the
    * standard frontier guard after robots and politeness.
    *
    * Scale shape: the [[hostReport]] discipline — collapse on the
    * well-spread (host, template, canon_url) triple FIRST, then a
    * partial-aggregating rollup to (host, template); never a
    * distinct-aggregate hanging off the low-cardinality template key.
    * Template extraction is a map-only RE2-portable projection. */
  def urlTemplateReport(
      df: DataFrame,
      urlCol: String,
      maxUrlsPerTemplate: Long): DataFrame = {
    val canon = canonicalizeUrl(col(urlCol))
    df.select(urlHost(canon).as("host"), urlPath(canon).as("path"),
        canon.as("canon_url"))
      .withColumn("template", urlTemplate(col("path")))
      .groupBy(col("host"), col("template"), col("canon_url"))
      .agg(count(lit(1)).as("__fetches"))
      .groupBy(col("host"), col("template"))
      .agg(
        sum(col("__fetches")).as("n_fetches"),
        count(lit(1)).as("n_urls"))
      .withColumn("trap", col("n_urls") > maxUrlsPerTemplate)
  }

  /** Mirror-host detection: pairs of hosts serving ≥ `minShared`
    * identical content items — the site-level dedup a crawl runs before
    * any text-level pass (a mirrored site is thousands of duplicate
    * pages that one host-pair decision removes).
    *
    * Digests with more than `maxDf` distinct hosts are EXCLUDED before
    * pairing: content on 50+ hosts is boilerplate (empty pages, error
    * stubs, licence text), not mirror evidence, and it is exactly the
    * hot key that would otherwise quadratically blow up the pair join
    * — the same hot-key cutoff invariant as [[Dedup]]'s `maxDf`/
    * `maxBucket` (SCALE.md: every pair generator carries one).
    *
    * Scale shape: one exchange to collapse (host, digest) distinct; a
    * partial-aggregating digest-frequency filter; the pair join fans
    * out at most `maxDf`² rows per digest by construction; one final
    * exchange on the (host_a, host_b) pair. Content text never crosses
    * a wire — only fixed-width digests. */
  def mirrorHosts(
      df: DataFrame,
      hostCol: String,
      contentCol: String,
      maxDf: Int,
      minShared: Long): DataFrame = {
    require(maxDf >= 2, s"maxDf=$maxDf would exclude every shared digest")
    val hd = df.select(col(hostCol).as("host"),
        sha2(col(contentCol).cast("binary"), 256).as("digest"))
      .distinct()
    val shared = hd.groupBy(col("digest"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= 2 && col("__n") <= maxDf)
      .select(col("digest"))
    val posting = hd.join(shared, "digest")
    posting
      .join(posting.withColumnRenamed("host", "host_b"), "digest")
      .filter(col("host") < col("host_b"))
      .select(col("host").as("host_a"), col("host_b"))
      .groupBy(col("host_a"), col("host_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Mirror CLUSTERS: [[mirrorHosts]] pairs closed into connected
    * components with a canonical host elected per cluster (the
    * lexicographically smallest — deterministic, like
    * [[Dedup.keepCanonical]]'s tiebreak). A mirror set is rarely just
    * two hosts (regional mirrors, www/cdn variants, archived copies),
    * and the decision a crawl actually takes — fetch ONE of them — is
    * per-cluster, not per-pair. Output: `(host, canonical_host)` for
    * every host in the input, identity for un-mirrored hosts.
    *
    * Scale shape: pair generation is [[mirrorHosts]] (digests-only,
    * maxDf-capped); the closure is [[Dedup.nearDupComponents]]'
    * pointer-jumping label propagation — O(log diameter) rounds, each
    * one partial-aggregating exchange, labels checkpointed between
    * rounds. Works on host STRINGS directly (min/least are the label
    * order), so no id-mapping pass and the oracle replays it with a
    * recursive CTE. */
  def mirrorClusters(
      df: DataFrame,
      hostCol: String,
      contentCol: String,
      maxDf: Int,
      minShared: Long): DataFrame = {
    val pairs = mirrorHosts(df, hostCol, contentCol, maxDf, minShared)
      .select(col("host_a").as("id_a"), col("host_b").as("id_b"))
    val hosts = df.select(col(hostCol).as("doc_id")).distinct()
    Dedup.nearDupComponents(hosts, pairs)
      .select(col("doc_id").as("host"), col("rep").as("canonical_host"))
  }

  /** INCREMENTAL mirror-cluster maintenance for the recrawl loop:
    * [[mirrorClusters]] recomputes the full closure every recrawl;
    * this maintains it through new pair evidence instead. The
    * CONTRACT is `closure(priorPairs ∪ newPairs)` — prior merges are
    * never retracted. Note the caveat that implies: [[mirrorHosts]]
    * evidence is append-only only while a shared digest's host-df
    * stays within `maxDf` (a digest crossing the cap as the corpus
    * grows drops from the new pair mining, but its PRIOR merge
    * persists in the cluster table — which is usually what a crawl
    * wants, and is exactly what the q_mirror_incremental oracle
    * replays: the union of both rounds' evidence). Given the PRIOR
    * cluster table (a valid depth-1 union-find forest:
    * `closure(priorPairs)` with the min host elected per cluster) and
    * the NEW pair evidence, the merged closure factors through the
    * QUOTIENT graph:
    * rewrite each new pair endpoint to its prior canonical, drop the
    * now-internal self-pairs, and close ONLY that contracted pair set
    * — its size is bounded by the clusters the new evidence touches,
    * not the host universe, so a recrawl that touches 1% of clusters
    * runs pointer-jumping on 1% of the reps. The final canonical is
    * `newRep(priorCanon(host))`: the min of prior-cluster minima IS
    * the min over the merged cluster, so the result is spec-pinned
    * EQUAL to a full [[mirrorClusters]]-style rebuild over
    * `priorPairs ∪ newPairs` (CrawlSpec), and exact-gated
    * cross-engine by q_mirror_incremental against the full-rebuild
    * oracle.
    *
    * `hosts` is the CURRENT host universe — output has one row per
    * host; hosts unknown to both the prior table and the new pairs
    * map to themselves.
    *
    * Scale shape: two hash joins keyed on host (prior table ×
    * new-pair endpoints, prior table × universe), then
    * [[Dedup.nearDupComponents]]' O(log diameter) pointer-jumping on
    * the TOUCHED subgraph only, then one hash join mapping touched
    * canonicals to their new reps. No closure work scales with the
    * untouched cluster count. Delegates to
    * [[Dedup.nearDupComponentsIncremental]], the id-space generic. */
  def mirrorClustersIncremental(
      hosts: DataFrame,
      priorClusters: DataFrame,
      newPairs: DataFrame): DataFrame =
    Dedup.nearDupComponentsIncremental(
        hosts.select(col("host").as("doc_id")).distinct(),
        priorClusters.select(col("host").as("doc_id"),
          col("canonical_host").as("rep")),
        newPairs.select(col("host_a").as("id_a"), col("host_b").as("id_b")))
      .select(col("doc_id").as("host"), col("rep").as("canonical_host"))

  /** Per-host crawl report over raw URLs: fetches, distinct canonical
    * pages, URL-level duplicate rate (the crawl-frontier health signal
    * — a host whose fetches collapse 10:1 wastes 90% of its crawl
    * budget on URL spellings).
    *
    * Deliberately NOT `groupBy(host).agg(countDistinct(canon))`: host
    * is a LOW-cardinality key (thousands of hosts, billions of
    * fetches), and Spark's distinct-aggregate plan funnels every
    * host's rows into one task for the dedup — the 1×/10× scale probe
    * measured that shape at ratio 15.4 (parallelism collapses to
    * |hosts|). Instead: first collapse to (host, canon_url) — an
    * exchange on the well-spread PAIR — then a partial-aggregating
    * per-host rollup whose exchange carries |hosts|×|partitions| tiny
    * partial rows. Same result, both exchanges skew-safe (probe ratio
    * 2.0 after the rewrite). */
  def hostReport(df: DataFrame, urlCol: String): DataFrame = {
    val canon = canonicalizeUrl(col(urlCol))
    df.select(urlHost(canon).as("host"), canon.as("canon_url"))
      .groupBy(col("host"), col("canon_url"))
      .agg(count(lit(1)).as("__fetches"))
      .groupBy(col("host"))
      .agg(
        sum(col("__fetches")).as("n_fetches"),
        count(lit(1)).as("n_pages"))
      .withColumn("dup_rate",
        round(lit(1.0) - col("n_pages").cast("double") / col("n_fetches"), 6))
  }

  /** Per-host quality census from per-document verdicts — the prior
    * behind quality-aware crawl budgeting (RefinedWeb-style domain
    * curation: a host is as good as the fraction of its pages that
    * survive the quality gates): `(host, n_docs, n_pass, pass_rate,
    * pass_mass)` where `passCol` is the caller's per-doc gate (e.g.
    * the Gopher repetition screens) and `pass_mass` is `massCol`
    * summed over PASSING docs only — the integer "quality-weighted
    * size" [[hostFetchBudget]] apportions on (pass_rate × demand
    * composed without a single double: Σ mass·pass IS the pass-rate
    * prior applied to the host's mass). A NULL pass verdict counts as
    * FAIL in every column (rate denominator included) — an
    * unmeasurable page earns no budget, the scorerGate discipline.
    *
    * Scale shape: verdict and mass are row-local; the rollup is ONE
    * partial-aggregating exchange on the host key carrying
    * O(hosts × partitions) buffer rows — the [[hostReport]]
    * low-cardinality-key discipline (no distinct-aggregate funnel). */
  def hostQuality(
      df: DataFrame,
      hostCol: String,
      passCol: Column,
      massCol: Column): DataFrame = {
    val pass = coalesce(passCol.cast("boolean"), lit(false))
    df.select(col(hostCol).as("host"), pass.as("__pass"),
        massCol.cast("long").as("__mass"))
      .groupBy(col("host"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__pass").cast("int")).as("n_pass"),
        round(avg(col("__pass").cast("int").cast("double")), 6)
          .as("pass_rate"),
        coalesce(sum(when(col("__pass"), col("__mass"))), lit(0L))
          .as("pass_mass"))
  }

  /** The crawl-side budget loop closure: [[hostQuality]]'s pass-mass
    * prior apportioned into next wave's fetch slots by Hamilton
    * largest-remainder ([[Curation.apportionBudget]] — integer seats
    * summing EXACTLY to `budget`, no double ever deciding a slot).
    * `(host, weight, alloc)`, one row per host with positive weight:
    * a host whose pages all fail the quality gates gets ZERO fetch
    * slots (dropped by the positive-weight contract), a host twice as
    * big at the same pass rate gets ~twice the slots — "which hosts
    * are good" finally DRIVES "who gets fetched next", the same
    * verdict→action composition as the drift-gated token budget.
    *
    * Scale shape: inherits apportionBudget's — one one-row total
    * broadcast + one ordered window over the per-HOST table
    * (low-cardinality by construction; the corpus-scale work already
    * collapsed in hostQuality's single exchange). `budget · max(w)`
    * must fit a long — ANSI mode errors loudly, not silently, if a
    * host's mass times the slot budget overflows; rescale the weights
    * (e.g. mass in KiB) in that regime. */
  def hostFetchBudget(
      quality: DataFrame,
      budget: Long,
      weightCol: String = "pass_mass"): DataFrame =
    Curation.apportionBudget(quality, "host", weightCol, budget)
      .withColumnRenamed("key", "host")

  /** Change-rate-driven recrawl scheduling — the freshness side of the
    * crawl loop (when to come BACK, where [[frontierPlan]] decides what
    * to fetch next). Per URL, the revisit history's observed changes
    * feed the Cho & Garcia-Molina frequency estimator
    * `lambda = -ln((n - c + 0.5) / (n + 0.5)) / meanGap` — the
    * bias-corrected MLE of a Poisson change process from n revisits
    * with c detected changes ("Estimating Frequency of Change", ACM
    * TOIT 3(3), 2003) — and the next fetch lands one expected change
    * period `1/lambda` after the last observation, clamped to
    * `[minIntervalS, maxIntervalS]`. URLs with no revisit signal
    * (seen once) and URLs never observed changing schedule at
    * `maxIntervalS`: a page earns frequent recrawls only by being SEEN
    * to change — the estimator's lambda -> 0 limit, made explicit so
    * the `1/0` does not ride IEEE signed-zero semantics.
    *
    * Scale shape: ONE exchange on the url key — the change flags need
    * a per-url `lag` over the fetch history (window), and the per-url
    * rollup groups on the SAME key, so the window's hashpartitioning
    * satisfies the aggregation's distribution and the plan reuses the
    * exchange (spec-pinned). url is the high-cardinality key and a
    * url's history depth is bounded by the crawl cadence — no skew.
    * All arithmetic is double + round(6); DuckDB replays it exactly
    * (the estimator's ln hits only a handful of distinct (n, c)
    * rationals, nowhere near rounding boundaries). */
  def recrawlSchedule(
      history: DataFrame,
      urlCol: String,
      tsCol: String,
      digestCol: String,
      minIntervalS: Double,
      maxIntervalS: Double): DataFrame = {
    require(minIntervalS > 0 && maxIntervalS >= minIntervalS,
      "need 0 < minIntervalS <= maxIntervalS")
    val agg = recrawlAggregate(history, urlCol, tsCol, digestCol)
    val interval = observedInterval(minIntervalS, maxIntervalS)
    agg.select(col("url"), col("n_revisits"), col("n_changes"),
      round(interval, 6).as("interval_s"),
      round(col("__last") + interval, 6).as("next_fetch_at_s"))
  }

  /** The per-url change-flag projection every recrawl derivation
    * starts from: a lag window on the SAME url key the downstream
    * rollup groups on, so each derivation's plan shuffles ONCE (the
    * spec-pinned shape). */
  private def recrawlFlagged(
      history: DataFrame,
      urlCol: String,
      tsCol: String,
      digestCol: String): DataFrame = {
    // The digest tiebreak makes the visit order DETERMINISTIC on tied
    // timestamps (coarse clocks, log-dedup artifacts) — and it is the
    // SAME (ts, digest) order recrawlStats' struct-min/max extremes
    // use, so the incremental path cannot diverge from this one on
    // tie-carrying data.
    val w = Window.partitionBy(col("url"))
      .orderBy(col("__ts"), col("__dg"))
    val prev = lag(col("__dg"), 1).over(w)
    history
      .select(col(urlCol).as("url"), col(tsCol).cast("double").as("__ts"),
        col(digestCol).as("__dg"))
      // First fetch of a url is an observation, not a revisit: its
      // flag stays NULL so count/sum skip it.
      .withColumn("__chg",
        when(prev.isNull, lit(null).cast("int"))
          .otherwise((col("__dg") =!= prev).cast("int")))
  }

  /** The per-url revisit rollup [[recrawlSchedule]] and
    * [[recrawlScheduleSeeded]] share. */
  private def recrawlAggregate(
      history: DataFrame,
      urlCol: String,
      tsCol: String,
      digestCol: String): DataFrame =
    recrawlFlagged(history, urlCol, tsCol, digestCol)
      .groupBy(col("url")).agg(
        (count(lit(1)) - 1).as("n_revisits"),
        coalesce(sum(col("__chg")), lit(0L)).as("n_changes"),
        min(col("__ts")).as("__first"), max(col("__ts")).as("__last"))

  /** SUFFICIENT STATISTICS for the Cho & Garcia-Molina estimator —
    * what a production scheduler PERSISTS so no wave ever re-scans the
    * full fetch history: per url, the observation count, detected
    * changes, first/last timestamps and first/last digests (the
    * digests carry exactly the information a segment boundary needs).
    * [[recrawlStatsMerge]] folds a new batch's stats into the prior
    * table in O(urls); [[scheduleFromStats]] derives the identical
    * schedule [[recrawlSchedule]] computes from raw history —
    * q_recrawl_inc exact-gates the incremental path against the
    * FULL-history oracle, so "incremental ≡ full" is itself a DuckDB
    * row-hash fact, the [[graft.operators.Dedup]]-incremental /
    * pageRankDelta discipline applied to the crawl clock.
    *
    * Scale shape: one url-key exchange (window + rollup share it);
    * output is O(distinct urls) regardless of history depth. */
  def recrawlStats(
      history: DataFrame,
      urlCol: String,
      tsCol: String,
      digestCol: String): DataFrame =
    recrawlFlagged(history, urlCol, tsCol, digestCol)
      .groupBy(col("url")).agg(
        count(lit(1)).as("n_obs"),
        coalesce(sum(col("__chg")), lit(0L)).as("n_changes"),
        min(col("__ts")).as("first_ts"), max(col("__ts")).as("last_ts"),
        // struct extremes, NOT min_by/max_by: the (ts, digest) struct
        // order matches recrawlFlagged's window order exactly, so the
        // boundary digests are deterministic on tied timestamps and
        // a null digest is carried as a VALUE (the true last
        // observation), never skipped for an earlier non-null one.
        min(struct(col("__ts"), col("__dg"))).getField("__dg")
          .as("first_digest"),
        max(struct(col("__ts"), col("__dg"))).getField("__dg")
          .as("last_digest"))

  /** Fold a LATER batch's [[recrawlStats]] into the PRIOR table.
    * Contract: every fetch in `later` happened after `prior`'s
    * `last_ts` for that url (a crawler's natural batch invariant —
    * waves are time-ordered) — ENFORCED: a url whose later-side
    * `first_ts` is at or before the prior's `last_ts` raises at
    * execution (detected for free inside the join this fold already
    * performs) rather than persisting corrupt statistics every future
    * wave would inherit. Counts and extremes add; the one change
    * the two segments cannot see internally — the boundary — is
    * exactly `later.first_digest != prior.last_digest`. URLs on one
    * side only pass through unchanged, so the fold is closed over the
    * stats schema and chains across any number of waves.
    *
    * Scale shape: one full-outer join of two url-partitioned stats
    * tables; the batch side builds the hash map (SHUFFLE_HASH — the
    * [[recrawlScheduleSeeded]] trade: no sort of the url strings, and
    * the BATCH side is the small one by construction; per-partition
    * build must fit executor memory). */
  def recrawlStatsMerge(prior: DataFrame, later: DataFrame): DataFrame = {
    val p = prior.select(col("url"), col("n_obs").as("__pn"),
      col("n_changes").as("__pc"), col("first_ts").as("__pf"),
      col("last_ts").as("__pl"), col("first_digest").as("__pfd"),
      col("last_digest").as("__pld"))
    val l = later.select(col("url"), col("n_obs").as("__ln"),
      col("n_changes").as("__lc"), col("first_ts").as("__lf"),
      col("last_ts").as("__ll"), col("first_digest").as("__lfd"),
      col("last_digest").as("__lld"))
    // Side PRESENCE is n_obs being non-null (count never nulls for a
    // present url) — digests and timestamps select by presence, NOT by
    // value coalesce: a null digest is a legal VALUE (failed fetch)
    // and value-coalescing it to an older wave's digest would mint a
    // phantom boundary change in the NEXT merge, breaking the
    // incremental == full invariant.
    val pPresent = col("__pn").isNotNull
    val lPresent = col("__ln").isNotNull
    // The boundary change the segments cannot see internally — null
    // boundary digests compare to no-change, exactly as the raw
    // lag-window flag skips null comparisons.
    val boundary = when(
      col("__pld").isNotNull && col("__lfd").isNotNull,
      (col("__lfd") =!= col("__pld")).cast("long")).otherwise(lit(0L))
    // The time-order contract, ENFORCED where it is free to detect:
    // both sides in hand, a later wave starting at or before the
    // prior's last observation is a replayed/out-of-order batch whose
    // merged stats would be confidently wrong — fail the job instead
    // of persisting corruption every future wave folds into. The
    // guard is anchored in EVERY stat column, not just last_ts:
    // column pruning eliminates unreferenced expressions, so a guard
    // living in one column would silently vanish for a consumer that
    // selects, say, only url/n_obs/n_changes — with it in each
    // output, any read of the merged statistics trips the check.
    val outOfOrder = pPresent && lPresent && col("__lf") <= col("__pl")
    // raise_error is NullType, so the when-branch coerces to each
    // output's own type — the guard wraps any column unchanged.
    def guarded(out: Column): Column =
      when(outOfOrder, raise_error(concat(
        lit("recrawlStatsMerge: out-of-order wave for url "), col("url"),
        lit(" (later first_ts <= prior last_ts)"))))
        .otherwise(out)
    p.join(l.hint("SHUFFLE_HASH"), Seq("url"), "full_outer")
      .select(col("url"),
        guarded(coalesce(col("__pn"), lit(0L)) +
          coalesce(col("__ln"), lit(0L))).as("n_obs"),
        guarded(coalesce(col("__pc"), lit(0L)) +
          coalesce(col("__lc"), lit(0L)) + boundary).as("n_changes"),
        guarded(when(pPresent, col("__pf")).otherwise(col("__lf")))
          .as("first_ts"),
        guarded(when(lPresent, col("__ll")).otherwise(col("__pl")))
          .as("last_ts"),
        guarded(when(pPresent, col("__pfd")).otherwise(col("__lfd")))
          .as("first_digest"),
        guarded(when(lPresent, col("__lld")).otherwise(col("__pld")))
          .as("last_digest"))
  }

  /** The schedule off a [[recrawlStats]] table — the same estimator,
    * clamps and output columns as [[recrawlSchedule]], derived from
    * the persisted statistics instead of raw history. */
  def scheduleFromStats(
      stats: DataFrame,
      minIntervalS: Double,
      maxIntervalS: Double): DataFrame = {
    require(minIntervalS > 0 && maxIntervalS >= minIntervalS,
      "need 0 < minIntervalS <= maxIntervalS")
    val agg = stats.select(col("url"),
      (col("n_obs") - 1).as("n_revisits"), col("n_changes"),
      col("first_ts").as("__first"), col("last_ts").as("__last"))
    val interval = observedInterval(minIntervalS, maxIntervalS)
    agg.select(col("url"), col("n_revisits"), col("n_changes"),
      round(interval, 6).as("interval_s"),
      round(col("__last") + interval, 6).as("next_fetch_at_s"))
  }

  /** Cho & Garcia-Molina interval off [[recrawlAggregate]]'s columns:
    * clamped `1/lambda` when changes were observed, `maxIntervalS`
    * when the url was seen once or never seen changing (the lambda→0
    * limit made explicit). */
  private def observedInterval(
      minIntervalS: Double, maxIntervalS: Double): Column = {
    val n = col("n_revisits").cast("double")
    val c = col("n_changes").cast("double")
    val meanGap = (col("__last") - col("__first")) / n
    val lambda = -log((n - c + lit(0.5)) / (n + lit(0.5))) / meanGap
    when(col("n_revisits") === 0 || col("n_changes") === 0,
      lit(maxIntervalS))
      .otherwise(least(greatest(lit(1.0) / lambda, lit(minIntervalS)),
        lit(maxIntervalS)))
  }

  /** Parse fetched SITEMAP XML bodies (sitemaps.org protocol) into the
    * per-URL table the frontier and the recrawl scheduler consume:
    * `(host, loc, lastmod, kind)` with `kind` `'url'` for `<url>`
    * entries and `'sitemap'` for sitemap-INDEX children (`<sitemap>`
    * entries — feed those back through the fetch loop). `lastmod`
    * parses W3C date prefixes (`YYYY-MM-DD`, with or without a time
    * suffix) to a DATE, null when absent/junk — the per-URL freshness
    * signal [[recrawlSchedule]] refines with observed change history.
    *
    * Deliberately a REGEX SUBSET of XML, not a parser: `<url>`/
    * `<sitemap>` blocks via non-greedy `(?s)` extraction, `<loc>`/
    * `<lastmod>` fields within a block, entities and CDATA left as-is
    * (the protocol requires entity-escaped URLs; callers needing
    * unescaping do it downstream). RE2-portable, so the DuckDB oracle
    * replays the extraction byte-for-byte — the same trade as
    * [[registeredDomain]]'s PSL heuristic, documented rather than
    * hidden. Map-only until one DISTINCT exchange on the (host, loc)
    * output — scales like every parse in this family. */
  def parseSitemapBodies(
      df: DataFrame,
      hostCol: String,
      bodyCol: String): DataFrame = {
    def entries(kind: String): DataFrame = df
      .select(col(hostCol).as("host"),
        explode(regexp_extract_all(col(bodyCol),
          lit(s"(?s)<$kind>(.*?)</$kind>"), lit(1))).as("__block"))
      .select(col("host"),
        trim(regexp_extract(col("__block"),
          "(?s)<loc>\\s*(.*?)\\s*</loc>", 1)).as("loc"),
        expr("try_cast(regexp_extract(__block, " +
          "'<lastmod>\\\\s*([0-9]{4}-[0-9]{2}-[0-9]{2})', 1) AS DATE)")
          .as("lastmod"),
        lit(kind).as("kind"))
      .filter(col("loc") =!= "")
    entries("url").unionByName(entries("sitemap")).distinct()
  }

  /** Unescape XML references — the boundary step between
    * [[parseSitemapBodies]] (which keeps references as-is, the
    * documented regex-subset trade) and any consumer that treats `loc`
    * as a real URL: the sitemaps protocol REQUIRES `&` in URLs to be
    * written `&amp;`, so a frontier or scheduler fed the escaped form
    * would fetch the wrong URL. The five predefined entities PLUS
    * decimal/hex numeric character references (`&#38;`, `&#x26;` —
    * common in wild sitemaps, previously documented-out), via the
    * codegen'd one-pass [[graft.functions.XmlUnescape]] scanner:
    * decoded output never rescans, which exactly generalizes the old
    * replace chain's "`&amp;` last" rule (`&amp;lt;` -> `&lt;`
    * literal; byte-identical to the chain on named-entities-only
    * input, so existing oracle replays hold); malformed references
    * pass through verbatim — wild text must not throw. Map-only. */
  def xmlUnescape(c: Column): Column =
    graft.functions.XmlUnescape.xmlUnescape(c)

  /** [[recrawlSchedule]] SEEDED with sitemap `lastmod` priors — the
    * composition that closes the freshness loop: [[parseSitemapBodies]]
    * yields per-URL publisher-declared modification dates, and a URL
    * the crawler has no revisit signal for (never fetched, or seen
    * once) schedules off that PRIOR instead of falling to the max
    * clamp: `interval = clamp(nowS − lastmod)` — a page modified
    * recently likely changes often (the age-proportional heuristic Cho
    * & Garcia-Molina start from before history accumulates), a page
    * untouched for a year earns its slow lane. Observed history
    * SUPERSEDES the prior: any revisit evidence — even "revisited,
    * never changed", which is genuine stability evidence a publisher
    * claim cannot override — routes through the observed estimator.
    * `basis` says which lane each URL took (`observed` / `sitemap` /
    * `default`).
    *
    * Sitemap `loc`s pass through [[xmlUnescape]] at this boundary (the
    * protocol mandates entity-escaped URLs; the history side carries
    * real fetched URLs) — spell both feeds canonically upstream if
    * they can differ (e.g. [[canonicalizeUrl]]).
    *
    * Next fetch anchors at the last observation when one exists, else
    * at `nowS` (a never-fetched URL's clock starts now).
    *
    * Scale shape: the history side is [[recrawlAggregate]]'s ONE
    * url-key exchange; the sitemap side collapses duplicate
    * declarations per URL (newest lastmod wins) in one exchange on the
    * SAME key, and the full-outer join joins two url-partitioned
    * sides. lastmod→seconds is `unix_date`-based (whole days × 86400),
    * timezone-free in both engines. */
  def recrawlScheduleSeeded(
      history: DataFrame,
      urlCol: String,
      tsCol: String,
      digestCol: String,
      sitemap: DataFrame,
      locCol: String,
      lastmodCol: String,
      nowS: Double,
      minIntervalS: Double,
      maxIntervalS: Double): DataFrame = {
    require(minIntervalS > 0 && maxIntervalS >= minIntervalS,
      "need 0 < minIntervalS <= maxIntervalS")
    val agg = recrawlAggregate(history, urlCol, tsCol, digestCol)
    // try_cast + a POST-cast filter: a non-null but unparseable
    // lastmod string must behave exactly like a missing one — the
    // contract is "no usable date => the URL is absent from the prior
    // side". A pre-cast null check would let such rows through as
    // basis='default' rows anchored at nowS (and a plain ANSI cast
    // would fail the whole wave on one malformed sitemap date).
    val prior = sitemap
      .select(xmlUnescape(col(locCol)).as("url"),
        col(lastmodCol).try_cast("date").as("__lm"))
      .filter(col("__lm").isNotNull)
      .groupBy(col("url")).agg(max(col("__lm")).as("__lm"))
    // SHUFFLE_HASH: both sides arrive hash-partitioned on url from
    // their aggregations, so the full-outer join needs no re-exchange
    // either way — but sort-merge would SORT both sides on the long
    // url strings (measured 1.5x slower at 2M urls; at corpus scale,
    // sorting the key dominates the stage). The trade is real, not
    // free: ShuffledHashJoinExec builds the SMALLER side's partition
    // as an in-memory map with NO runtime spill-to-sort-merge path, so
    // shuffle-partition sizing must keep the per-partition build side
    // (the deduped sitemap table here — one row per declared URL)
    // within executor memory; where that cannot be guaranteed, drop
    // the hint and take the sort. The hint is planning-advisory only:
    // results are strategy-independent (oracle-gated either way).
    val joined = agg.hint("SHUFFLE_HASH").join(prior, Seq("url"), "full_outer")
    val priorAge =
      lit(nowS) - unix_date(col("__lm")).cast("double") * 86400
    val interval =
      when(col("n_revisits") > 0,
        observedInterval(minIntervalS, maxIntervalS))
        .when(col("__lm").isNotNull,
          least(greatest(priorAge, lit(minIntervalS)), lit(maxIntervalS)))
        .otherwise(lit(maxIntervalS))
    joined.select(col("url"),
      coalesce(col("n_revisits"), lit(0L)).as("n_revisits"),
      coalesce(col("n_changes"), lit(0L)).as("n_changes"),
      round(interval, 6).as("interval_s"),
      round(coalesce(col("__last"), lit(nowS)) + interval, 6)
        .as("next_fetch_at_s"),
      when(col("n_revisits") > 0, lit("observed"))
        .when(col("__lm").isNotNull, lit("sitemap"))
        .otherwise(lit("default")).as("basis"))
  }

  /** [[frontierPlanSeeded]] extended with the sitemap-INDEX arm — the
    * composition that closes the sitemap fetch loop: robots `Sitemap:`
    * directives seed the first sitemap fetches, and the fetched
    * bodies' `kind='sitemap'` children ([[parseSitemapBodies]] on a
    * sitemap INDEX) seed the next layer, so a site publishing an index
    * of 50 000 child sitemaps actually gets them all fetched instead
    * of stopping one level deep. Child `loc`s pass through
    * [[xmlUnescape]] at this boundary (entity-escaped by protocol —
    * an `&amp;` child would otherwise enter the frontier misspelled).
    *
    * Scale shape: both seed arms are map-side unions into the
    * candidate pool (the index arm's DISTINCT exchanges only parsed
    * `(host, loc)` rows on the small parse side); the merged pool
    * still crosses exactly [[frontierPlan]]'s ONE bounded top-k
    * exchange — the frontierPlanSeeded pin, unchanged. */
  def frontierPlanSeededXml(
      df: DataFrame,
      urlCol: String,
      priorityCol: String,
      robots: DataFrame,
      sitemapBodies: DataFrame,
      hostCol: String,
      bodyCol: String,
      policy: DataFrame,
      defaultDelayS: Double,
      maxPerHost: Int,
      seedPriority: Double): DataFrame = {
    val idxSeeds = parseSitemapBodies(sitemapBodies, hostCol, bodyCol)
      .filter(col("kind") === "sitemap")
      .select(xmlUnescape(col("loc")).as("__url"),
        lit(seedPriority).cast("double").as("__pri"))
    val cand = df
      .select(col(urlCol).as("__url"),
        col(priorityCol).cast("double").as("__pri"))
      .unionByName(idxSeeds)
    // Delegate the robots Sitemap-directive arm to frontierPlanSeeded
    // — ONE implementation of directive seeding, so the two seeded
    // frontiers cannot drift; the index arm stays a map-side union
    // into the same single bounded candidate exchange.
    frontierPlanSeeded(cand, "__url", "__pri", robots, hostCol, bodyCol,
      policy, defaultDelayS, maxPerHost, seedPriority)
  }

  /** The crawl loop's CLOSING arc: a recrawl schedule
    * ([[recrawlSchedule]] / [[recrawlScheduleSeeded]]) becomes the next
    * wave's politeness frontier. URLs due at `nowS`
    * (`next_fetch_at_s <= nowS`) enter [[frontierPlan]] with their
    * OVERDUENESS (`nowS − next_fetch_at_s`, seconds) as priority — the
    * longest-overdue page fetches first within each host's politeness
    * budget, which is the Cho & Garcia-Molina objective (minimize
    * expected staleness) expressed as a schedule: a page overdue by a
    * week has accumulated more expected change than one overdue by a
    * minute. Composes fetch → schedule → due → frontier into a cycle;
    * not-yet-due URLs simply stay out of this wave.
    *
    * Scale shape: the due filter and overdueness projection are
    * map-only on the schedule (which arrives url-partitioned from its
    * own aggregation); the only exchange is frontierPlan's bounded
    * per-host top-k — the one every frontier variant shares. */
  def frontierFromSchedule(
      schedule: DataFrame,
      urlCol: String,
      nextFetchCol: String,
      nowS: Double,
      policy: DataFrame,
      defaultDelayS: Double,
      maxPerHost: Int): DataFrame =
    frontierPlan(
      schedule
        .filter(col(nextFetchCol) <= nowS)
        .select(col(urlCol).as("__url"),
          (lit(nowS) - col(nextFetchCol)).as("__pri")),
      "__url", "__pri", policy, defaultDelayS, maxPerHost)

  /** The due-wave frontier, GATED — the loop closure
    * [[frontierFromSchedule]] left open: that plan fed the politeness
    * schedule directly, so it could schedule fetches a robots
    * `Disallow` forbids, a mined trap cell wastes, or a stale robots
    * cache cannot legitimize (RFC 9309 §2.4: cached rules SHOULD NOT
    * be used past 24 h). This composes all three gates in front of
    * the schedule, routing by robots-cache freshness FIRST:
    *
    *   1. due filter + overdueness priority (as the ungated form);
    *   2. freshness split ([[robotsFreshness]]'s verdict, inlined as
    *      a broadcast host join): hosts whose robots fetch is within
    *      `robotsTtlS` are CONTENT-eligible; stale or never-fetched
    *      hosts must not content-fetch on rules we cannot trust —
    *      their due queue collapses to ONE robots.txt refetch
    *      candidate per host (lane `robots`), at the urgency of the
    *      host's most overdue URL and under the scheme of that URL,
    *      so the hottest queue gets its rules refreshed first;
    *   3. fresh hosts' URLs pass the [[robotsVerdict]] rule fold and
    *      the mined-trap anti join (the [[frontierPlanGated]] arms,
    *      broadcast both); robots.txt refetches bypass both gates —
    *      fetching robots.txt is always permitted and its fixed path
    *      cannot be a trap cell;
    *   4. both lanes share ONE politeness schedule (a robots refetch
    *      still costs the host a fetch slot), then label `lane` by
    *      the broadcast fresh-host set — exact because a stale host
    *      contributes only its robots row and a fresh host only
    *      content rows.
    *
    * Scale shape: the freshness/rules/trap sides are all per-host or
    * per-(host, template) — broadcast at any corpus size. The
    * CONTENT lineage (the high-cardinality side) crosses exactly one
    * exchange: the schedule's bounded per-host top-k. The robots
    * lane adds one partial-aggregating host-key exchange over the
    * STALE subset only — O(stale hosts) rows out. Plan-pinned in
    * CrawlSpec (two exchanges total, window reuses the top-k
    * partitioning). */
  def frontierFromScheduleGated(
      schedule: DataFrame,
      urlCol: String,
      nextFetchCol: String,
      nowS: Double,
      rules: DataFrame,
      fetchLog: DataFrame,
      logUrlCol: String,
      robotsLog: DataFrame,
      robotsHostCol: String,
      robotsTsCol: String,
      policy: DataFrame,
      defaultDelayS: Double,
      maxPerHost: Int,
      maxUrlsPerTemplate: Long,
      robotsTtlS: Double = 86400.0): DataFrame = {
    require(robotsTtlS > 0, "robotsTtlS must be positive")
    val due = schedule
      .filter(col(nextFetchCol) <= nowS)
      .select(canonicalizeUrl(col(urlCol)).as("canon_url"),
        (lit(nowS) - col(nextFetchCol)).as("priority"))
      .withColumn("host", urlHost(col("canon_url")))
    // Hosts with a robots fetch inside the TTL — the only hosts whose
    // cached rules may gate a content fetch. Per-host by construction:
    // broadcast at any corpus size. Lazily pinned: the set feeds THREE
    // consumers (the content gate, the robots lane's complement, the
    // final lane label), and a crawl-scale robots log must fold to its
    // per-host rows once, not once per consumer — the
    // populationStabilityBy multi-consumption lesson on the gate side.
    val freshHosts = broadcast(Materialize.checkpoint(
      robotsLog
        .select(col(robotsHostCol).as("__fhost"),
          col(robotsTsCol).cast("double").as("__fts"))
        .groupBy(col("__fhost")).agg(max(col("__fts")).as("__lts"))
        .filter(lit(nowS) - col("__lts") <= robotsTtlS)
        .select(col("__fhost")),
      eager = false))
    val flagged = due.join(freshHosts, col("host") === col("__fhost"), "left")
    val perHost = broadcast(robotsRulesPerHost(rules)
      .select(col("host").as("__rhost"), col("rules").as("__rules")))
    val traps = broadcast(
      urlTemplateReport(fetchLog, logUrlCol, maxUrlsPerTemplate)
        .filter(col("trap"))
        .select(col("host").as("__thost"), col("template").as("__ttpl")))
    val content = flagged.filter(col("__fhost").isNotNull)
      .join(perHost, col("host") === col("__rhost"), "left")
      .filter(robotsVerdict(urlPathQuery(col("canon_url")),
        col("__rules")) % 2 =!= 0)
      .join(traps,
        col("host") === col("__thost") &&
          urlTemplate(urlPath(col("canon_url"))) === col("__ttpl"),
        "left_anti")
      .select(col("canon_url"), col("priority"))
    // Struct max: the host's peak overdueness AND (on priority ties,
    // deterministically) the greatest url — whose scheme AND authority
    // the refetch candidate inherits. The authority (canonicalizeUrl
    // keeps non-default ports; urlHost strips them) matters: a stale
    // host served on :8080 must refetch robots.txt from :8080, not the
    // default port. Ports sharing a host still collapse to ONE
    // candidate (the host-keyed group), at the max row's authority.
    val robotsLane = flagged.filter(col("__fhost").isNull)
      .groupBy(col("host"))
      .agg(max(struct(col("priority"), col("canon_url"))).as("__top"))
      .select(
        concat(
          regexp_extract(col("__top").getField("canon_url"),
            "^([a-z][a-z0-9+.-]*://[^/?]*)", 1),
          lit("/robots.txt")).as("canon_url"),
        col("__top").getField("priority").as("priority"))
    val planned = frontierPlan(content.unionByName(robotsLane),
      "canon_url", "priority", policy, defaultDelayS, maxPerHost)
    planned.join(freshHosts, planned("host") === col("__fhost"), "left")
      .withColumn("lane",
        when(col("__fhost").isNull, lit("robots")).otherwise(lit("content")))
      .drop("__fhost")
  }

  /** RFC 9309 §2.4 robots-cache freshness: crawlers MAY cache a fetched
    * robots.txt but SHOULD NOT use it for longer than 24 hours
    * (`ttlS` default 86400). Per frontier host: the queued-URL count,
    * the policy's last fetch time and age at `nowS`, and the staleness
    * verdict — a host never fetched is stale by definition (its rules
    * are unknown, so its URLs need a robots fetch before any crawl).
    * The pre-flight report a scheduler runs before committing a crawl
    * wave: stale hosts' queues refetch robots.txt first, the same
    * freshness-gate discipline as the cache layer's mtime checks and
    * the IVF quantizer drift report.
    *
    * Scale shape: the frontier side collapses per host with a
    * partial-aggregating count (the [[hostReport]] discipline —
    * count-only, no distinct-aggregate funnel on the low-cardinality
    * key), then joins the robots log folded to one row per host and
    * BROADCAST (robots fetches are per-host by construction — the
    * small side at any corpus size). One candidate-side exchange. */
  def robotsFreshness(
      frontier: DataFrame,
      urlCol: String,
      robotsLog: DataFrame,
      hostCol: String,
      tsCol: String,
      nowS: Double,
      ttlS: Double = 86400.0): DataFrame = {
    require(ttlS > 0, "ttlS must be positive")
    val canon = canonicalizeUrl(col(urlCol))
    val queued = frontier.select(urlHost(canon).as("host"))
      .groupBy(col("host")).agg(count(lit(1)).as("n_queued"))
    val lastFetch = broadcast(robotsLog
      .select(col(hostCol).as("__lhost"), col(tsCol).cast("double").as("__lts"))
      .groupBy(col("__lhost")).agg(max(col("__lts")).as("last_fetch_s")))
    queued.join(lastFetch, col("host") === col("__lhost"), "left")
      .select(col("host"), col("n_queued"), col("last_fetch_s"),
        round(lit(nowS) - col("last_fetch_s"), 6).as("age_s"),
        (col("last_fetch_s").isNull ||
          lit(nowS) - col("last_fetch_s") > lit(ttlS)).as("stale"))
  }
}
