package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-16 queries: closing the crawl loop's LAST open gate and the
  * scorer-observability keying the round-15 verdict ranked next.
  *
  *  - q_frontier_due_gated: [[operators.Crawl.frontierFromScheduleGated]]
  *    — the due wave through robots verdict + mined trap cells +
  *    RFC 9309 §2.4 robots-cache freshness; stale-robots hosts route
  *    to a robots.txt refetch lane instead of content fetches.
  */
object QueriesR16 {

  private def docs(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/documents.parquet")

  /** q_frontier_due_gated's clock (same horizon as q_frontier_due). */
  private val GatedNowS = 9100000.0

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- the gated loop closure: the q_frontier_due wave with every
    //     production gate composed in front of the schedule. h1
    //     disallows /d/1*; h2 is deny-all with an allow-back on
    //     /d/2*; h5's /d/N template is a mined trap cell (its due
    //     queue vanishes entirely); h3's robots fetch is stale and h6
    //     was never fetched — both collapse to a single robots.txt
    //     refetch candidate at their queue's peak overdueness. ---
    "q_frontier_due_gated" -> { (s, d) =>
      import s.implicits._
      val rules = Seq(
        ("h1.example.com", "/d/1", false),
        ("h2.example.com", "/", false),
        ("h2.example.com", "/d/2", true)).toDF("host", "prefix", "allow")
      // Trap-mining fetch log: even ids mint one /d/<id> URL each on
      // h5 (the unbounded-template signature), odd ids cycle 7 stable
      // /p/<id%7> pages on h6 (NOT a trap: 7 distinct urls <= 20).
      val logUrl = when(col("doc_id") % 2 === 0,
          concat(lit("http://h5.example.com/d/"),
            col("doc_id").cast("string")))
        .otherwise(concat(lit("http://h6.example.com/p/"),
          (col("doc_id") % 7).cast("string")))
      val fetchLog = docs(s, d).select(logUrl.as("url"))
      // Robots fetch log: h3 fetched 200 000 s ago (stale past the
      // 86 400 s TTL), h6 never fetched (stale by definition), the
      // rest fetched 1 000 s ago.
      val robotsLog = Seq(
        ("h0.example.com", 9099000.0), ("h1.example.com", 9099000.0),
        ("h2.example.com", 9099000.0), ("h3.example.com", 8900000.0),
        ("h4.example.com", 9099000.0), ("h5.example.com", 9099000.0))
        .toDF("host", "fetched_at_s")
      val policy = Seq(("h0.example.com", 2.0), ("h3.example.com", 5.0))
        .toDF("host", "delay_s")
      operators.Crawl.frontierFromScheduleGated(
        QueriesR15.seededScheduleFixture(s, d), "url", "next_fetch_at_s",
        nowS = GatedNowS, rules, fetchLog, "url",
        robotsLog, "host", "fetched_at_s",
        policy, defaultDelayS = 7.0, maxPerHost = 50,
        maxUrlsPerTemplate = 20)
    })

  val oracles: Map[String, String] = Map(
    // The gated due wave replayed end to end: the shared schedule
    // CTEs, the due filter, the freshness split (fresh = max fetch
    // age within TTL), the REP longest-match fold over path+query,
    // the trap-template anti filter on the query-free path, the
    // stale hosts' argmax-by-(priority, url) robots.txt collapse,
    // then the shared politeness rank/cap and the lane label.
    "q_frontier_due_gated" ->
      (QueriesR15.seededScheduleCtes + """,
        |due AS (SELECT url AS canon_url,
        |    CAST(9100000 AS DOUBLE) - next_fetch_at_s AS priority
        |  FROM sched WHERE next_fetch_at_s <= CAST(9100000 AS DOUBLE)),
        |du AS (SELECT canon_url, priority,
        |    regexp_extract(canon_url, '^[a-z][a-z0-9+.-]*://([^/:?]*)', 1)
        |      AS host,
        |    regexp_extract(canon_url, '^[a-z][a-z0-9+.-]*://[^/?]*(.*)$', 1)
        |      AS pq,
        |    regexp_extract(canon_url,
        |      '^[a-z][a-z0-9+.-]*://[^/?]*([^?]*)', 1) AS pth
        |  FROM due),
        |fr(fhost, fts) AS (VALUES
        |  ('h0.example.com', CAST(9099000 AS DOUBLE)),
        |  ('h1.example.com', CAST(9099000 AS DOUBLE)),
        |  ('h2.example.com', CAST(9099000 AS DOUBLE)),
        |  ('h3.example.com', CAST(8900000 AS DOUBLE)),
        |  ('h4.example.com', CAST(9099000 AS DOUBLE)),
        |  ('h5.example.com', CAST(9099000 AS DOUBLE))),
        |fresh AS (SELECT fhost FROM fr GROUP BY fhost
        |  HAVING CAST(9100000 AS DOUBLE) - max(fts)
        |    <= CAST(86400 AS DOUBLE)),
        |rl(rhost, prefix, allow) AS (VALUES
        |  ('h1.example.com', '/d/1', false),
        |  ('h2.example.com', '/', false),
        |  ('h2.example.com', '/d/2', true)),
        |m AS (SELECT du.canon_url, du.priority, du.host, du.pth,
        |    max(CASE WHEN rl.prefix IS NOT NULL
        |        THEN len(rl.prefix) * 2 + CAST(rl.allow AS INT) END) AS best
        |  FROM du JOIN fresh ON du.host = fresh.fhost
        |  LEFT JOIN rl
        |    ON du.host = rl.rhost AND starts_with(du.pq, rl.prefix)
        |  GROUP BY 1, 2, 3, 4),
        |fl AS (SELECT CASE WHEN doc_id % 2 = 0
        |      THEN 'http://h5.example.com/d/' || CAST(doc_id AS VARCHAR)
        |      ELSE 'http://h6.example.com/p/' || CAST(doc_id % 7 AS VARCHAR)
        |    END AS url FROM documents),
        |fc AS (SELECT
        |    regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/:?]*)', 1) AS host,
        |    regexp_replace(
        |      regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/?]*([^?]*)', 1),
        |      '[0-9]+', 'N', 'g') AS template, url FROM fl),
        |g AS (SELECT host, template, url FROM fc GROUP BY 1, 2, 3),
        |traps AS (SELECT host, template FROM g
        |          GROUP BY host, template HAVING count(*) > 20),
        |content AS (SELECT m.canon_url, m.priority FROM m
        |  WHERE (m.best IS NULL OR m.best % 2 = 1)
        |    AND NOT EXISTS (SELECT 1 FROM traps t
        |      WHERE t.host = m.host
        |        AND t.template = regexp_replace(m.pth, '[0-9]+', 'N', 'g'))),
        |stale AS (SELECT host, canon_url, priority,
        |    row_number() OVER (PARTITION BY host
        |      ORDER BY priority DESC, canon_url DESC) AS rn
        |  FROM du WHERE host NOT IN (SELECT fhost FROM fresh)),
        |rlane AS (SELECT
        |    regexp_extract(canon_url, '^([a-z][a-z0-9+.-]*)://', 1)
        |      || '://' || host || '/robots.txt' AS canon_url, priority
        |  FROM stale WHERE rn = 1),
        |pool AS (SELECT canon_url, priority FROM content
        |         UNION ALL SELECT canon_url, priority FROM rlane),
        |ph AS (SELECT canon_url, priority,
        |    regexp_extract(canon_url, '^[a-z][a-z0-9+.-]*://([^/:?]*)', 1)
        |      AS host
        |  FROM pool),
        |rk AS (SELECT canon_url, priority, host,
        |    row_number() OVER (PARTITION BY host
        |      ORDER BY priority DESC, canon_url) AS rank
        |  FROM ph),
        |cp AS (SELECT * FROM rk WHERE rank <= 50),
        |delays AS (SELECT dhost, CAST(dd AS DOUBLE) AS delay_s
        |  FROM (VALUES ('h0.example.com', 2.0), ('h3.example.com', 5.0))
        |    v(dhost, dd))
        |SELECT cp.canon_url, cp.priority, cp.host, cp.rank,
        |       coalesce(delays.delay_s, CAST(7 AS DOUBLE)) AS delay_s,
        |       (cp.rank - 1) * coalesce(delays.delay_s, CAST(7 AS DOUBLE))
        |         AS fetch_at_s,
        |       CASE WHEN cp.host IN (SELECT fhost FROM fresh)
        |         THEN 'content' ELSE 'robots' END AS lane
        |FROM cp LEFT JOIN delays ON cp.host = delays.dhost""".stripMargin))
}
