package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streaming
import graft.streaming.Streaming.{Event, UserStat}

/** Structured-Streaming operators driven through MemoryStream — real
  * micro-batch execution, not batch-mode shortcuts. */
class StreamingSpec extends AnyFunSuite {

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")

  private val batch1 = Seq(
    Event(1L, ts(0), 100L, "view", 1.0),
    Event(2L, ts(5), 100L, "click", 2.0),
    Event(3L, ts(10), 200L, "view", 3.0))
  private val batch2 = Seq(
    Event(4L, ts(50), 100L, "purchase", 10.0),
    Event(5L, ts(55), 200L, "view", 4.0))

  test("watermarked hourly counts aggregate across micro-batches") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val counts = Streaming.hourlyEventCounts(stream.toDF())
    val q = counts.writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Update()).start()
    try {
      stream.addData(batch1: _*); q.processAllAvailable()
      stream.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("hourly").collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out("view") == 3L, "views across both batches in the 10:00 window")
    assert(out("purchase") == 1L)
  }

  test("session_window merges events within the gap per user") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData((batch1 ++ batch2): _*)
    val sessions = Streaming.sessionize(stream.toDF(), gap = "15 minutes")
    // session_window aggregations only support Append (emit after the
    // watermark passes) or Complete; Complete shows all sessions now.
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Complete()).start()
    try q.processAllAvailable() finally q.stop()
    val byUser = spark.table("sessions").collect()
      .groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    // user 100: events at :00/:05 then :50 => 2 sessions with 15-min gap
    assert(byUser(100L) == 2, s"user 100 sessions: $byUser")
    assert(byUser(200L) == 2)
  }

  test("late events beyond the watermark are dropped, windows emit once") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val counts = Streaming.hourlyEventCounts(stream.toDF(), watermark = "10 minutes")
    // Append mode: a window row is emitted exactly once, when the
    // watermark passes its end — the strictest late-data contract.
    val q = counts.writeStream.format("memory").queryName("late_drop")
      .outputMode(OutputMode.Append()).start()
    try {
      // Three views in the 10:00 window.
      stream.addData(batch1: _*); q.processAllAvailable()
      // 12:00 event pushes the watermark to 11:50 — past the 10:00
      // window's end, scheduling its emission.
      stream.addData(Event(6L, Timestamp.valueOf("2026-01-01 12:00:00"), 300L, "view", 1.0))
      q.processAllAvailable()
      // LATE: a 10:20 view, far behind the 11:50 watermark — must be
      // dropped, not appended to the already-emitted window.
      stream.addData(Event(7L, ts(20), 100L, "view", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("late_drop").collect()
      .map(r => (r.getStruct(0).getTimestamp(0), r.getString(1), r.getLong(2)))
    val tenOclock = rows.filter(_._1 == Timestamp.valueOf("2026-01-01 10:00:00"))
    assert(tenOclock.map(t => t._2 -> t._3).toMap == Map("view" -> 2L, "click" -> 1L)
      && tenOclock.length == 2,
      s"10:00 window must hold exactly batch1's events, got ${tenOclock.toSeq}")
    // The 12:00 window is still open (watermark 11:50) — not emitted.
    assert(!rows.exists(_._1 == Timestamp.valueOf("2026-01-01 12:00:00")))
  }

  test("mapGroupsWithState keeps per-user running stats across batches") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val stats = Streaming.runningUserStats(stream.toDS())
    val q = stats.writeStream.format("memory").queryName("userstats")
      .outputMode(OutputMode.Update()).start()
    try {
      stream.addData(batch1: _*); q.processAllAvailable()
      stream.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    // memory sink in Update mode appends each state revision; take the last
    val last = spark.table("userstats").as[UserStat].collect()
      .groupBy(_.user_id).view.mapValues(_.maxBy(_.n_events)).toMap
    assert(last(100L).n_events == 3L)
    assert(last(100L).total_value == 13.0)
    assert(last(100L).last_type == "purchase")
    assert(last(200L).n_events == 2L)
  }

  test("flatMapGroupsWithState emits closed sessions when watermark passes") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val sessions = graft.streaming.Streaming
      .expiringSessions(stream.toDS(), gapMs = 15L * 60 * 1000)
    val q = sessions.writeStream.format("memory").queryName("closed")
      .outputMode(OutputMode.Append()).start()
    try {
      // session 1 for user 100 at :00-:05; user 200 at :10
      stream.addData(batch1: _*); q.processAllAvailable()
      assert(spark.table("closed").count() == 0, "nothing closed yet")
      // :50/:55 events start NEW sessions (gap 15m) and push the
      // watermark past the old sessions' timeouts
      stream.addData(batch2: _*); q.processAllAvailable()
      // one more far-future event advances the watermark further so the
      // timed-out states flush
      stream.addData(Event(99L, ts(59), 300L, "view", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val closed = spark.table("closed").as[graft.streaming.Streaming.ClosedSession]
      .collect().map(s => s.user_id -> s.n_events).toMap
    assert(closed.get(100L).contains(2L), s"user 100 first session closed: $closed")
    assert(closed.get(200L).contains(1L), s"user 200 first session closed: $closed")
  }

  test("intra-batch gaps split sessions (no batch-boundary dependence)") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val sessions = Streaming.expiringSessions(stream.toDS(), gapMs = 15L * 60 * 1000)
    val q = sessions.writeStream.format("memory").queryName("closed_intra")
      .outputMode(OutputMode.Append()).start()
    try {
      // ONE micro-batch spanning two sessions for user 100 (:00/:05 then
      // :40/:45, gap 35min > 15min): the first session must be emitted
      // even though no batch boundary separates them (backfill shape).
      stream.addData(
        Event(1L, ts(0), 100L, "view", 1.0),
        Event(2L, ts(5), 100L, "click", 2.0),
        Event(3L, ts(40), 100L, "view", 3.0),
        Event(4L, ts(45), 100L, "view", 4.0))
      q.processAllAvailable()
    } finally q.stop()
    val closed = spark.table("closed_intra")
      .as[graft.streaming.Streaming.ClosedSession].collect()
    assert(closed.exists(s => s.user_id == 100L && s.n_events == 2L &&
      s.total_value == 3.0),
      s"intermediate session must close on intra-batch gap: ${closed.toSeq}")
  }

  test("parquet file sink with checkpoint recovers across query restarts") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val out = s"$dir/out"
    val ckpt = s"$dir/ckpt"
    val stream = MemoryStream[Event]
    def start() = stream.toDF().writeStream
      .format("parquet")
      .option("checkpointLocation", ckpt)
      .option("path", out)
      .outputMode(OutputMode.Append())
      .start()
    val q1 = start()
    try { stream.addData(batch1: _*); q1.processAllAvailable() } finally q1.stop()
    // restart against the SAME checkpoint: offsets resume, no replays
    val q2 = start()
    try { stream.addData(batch2: _*); q2.processAllAvailable() } finally q2.stop()
    val rows = spark.read.parquet(out)
    assert(rows.count() == (batch1.size + batch2.size),
      "exactly-once across restart: no loss, no duplication")
    assert(rows.select("event_id").distinct().count() == 5)
  }

  test("dropDuplicatesWithinWatermark dedups re-delivered events across batches") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val deduped = Streaming.dedupEventStream(stream.toDF(), watermark = "2 hours")
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(batch1: _*); q.processAllAvailable()
      // re-deliver batch1 (same event_ids) plus one new event
      stream.addData(batch1 :+ Event(10L, ts(20), 300L, "view", 7.0): _*)
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup_stream").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L, 10L),
      s"re-delivered ids must be dropped, got ${ids.toSeq}")
  }

  test("streaming url dedup drops re-fetches of the same canonical url") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val deduped = Streaming.urlDedupStream(
      stream.toDF().toDF("fetch_id", "url", "ts"), watermark = "2 hours")
    val q = deduped.writeStream.format("memory").queryName("url_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      // Three spellings of the SAME page across two batches + one
      // distinct page: only the first spelling and the distinct page
      // survive; the canonical column is populated on survivors.
      stream.addData(
        (1L, "HTTP://WWW.X.COM:80/p/?utm_source=a", ts(0)),
        (2L, "http://x.com/q", ts(1)))
      q.processAllAvailable()
      stream.addData(
        (3L, "http://x.com/p", ts(5)),
        (4L, "http://x.com/p/index.html#top", ts(6)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("url_stream").collect()
      .map(r => (r.getLong(0), r.getString(3))).toSet
    assert(rows == Set((1L, "http://x.com/p"), (2L, "http://x.com/q")),
      s"one survivor per canonical url expected, got $rows")
  }

  test("streaming robots gate verdicts fetches with zero streaming state") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rules = Seq(
      ("x.com", "/private/", false),
      ("x.com", "/private/open/", true)).toDF("host", "prefix", "allow")
    val perHost = graft.operators.Crawl.robotsRulesPerHost(rules)
    val stream = MemoryStream[(Long, String)]
    val gated = Streaming.robotsGateStream(
      stream.toDF().toDF("fetch_id", "url"), perHost)
    val q = gated.writeStream.format("memory").queryName("robots_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData((1L, "http://x.com/private/a"), (2L, "http://x.com/ok"))
      q.processAllAvailable()
      stream.addData((3L, "http://x.com/private/open/a"),
        (4L, "http://other.com/anything"))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("robots_stream")
      .select("fetch_id", "allowed").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> true, 4L -> true),
      s"deny under /private/, allow the longer /private/open/, default allow: $out")
  }

  test("streaming robots-freshness screen matches the batch verdicts") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val log = Seq(("fresh.com", 2000.0), ("old.com", 100.0))
      .toDF("host", "ts")
    val stream = MemoryStream[(Long, String)]
    val flagged = Streaming.robotsFreshnessStream(
      stream.toDF().toDF("fetch_id", "url"), log, "host", "ts",
      nowS = Some(88400.0), ttlS = 86400.0)
    val q = flagged.writeStream.format("memory").queryName("rfresh_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData((1L, "http://fresh.com/a"), (2L, "http://old.com/x"))
      q.processAllAvailable()
      stream.addData((3L, "http://never.com/y"))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("rfresh_stream")
      .select("fetch_id", "stale", "age_s").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    // same boundary contract as the batch robotsFreshness: age ==
    // TTL exactly is still fresh (strict >), never-fetched is stale
    assert(out == Map(
      1L -> ((false, Some(86400.0))),
      2L -> ((true, Some(88300.0))),
      3L -> ((true, None))), s"stream verdicts: $out")
  }

  test("streaming mirror-aware url dedup drops the mirror's copy") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hostMap = Seq(("a.com", "a.com"), ("b.com", "a.com"))
      .toDF("host", "canonical_host")
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val deduped = Streaming.mirrorAwareUrlDedupStream(
      stream.toDF().toDF("fetch_id", "url", "ts"), hostMap,
      watermark = "2 hours")
    val q = deduped.writeStream.format("memory").queryName("mirror_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(
        (1L, "http://a.com/p/1", ts(0)),
        (2L, "http://d.com/p/9", ts(1))) // unmapped host: identity
      q.processAllAvailable()
      stream.addData(
        (3L, "http://b.com/p/1", ts(5)), // mirror copy of fetch 1: dropped
        (4L, "http://b.com/p/2", ts(6))) // mirror-only page: kept, rewritten
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("mirror_stream").select("fetch_id", "canon_url")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set(
      (1L, "http://a.com/p/1"),
      (2L, "http://d.com/p/9"),
      (4L, "http://a.com/p/2")), s"got $rows")
  }

  test("streaming frontier gate: robots verdict + trap cells, batch parity") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions.{broadcast, col}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rules = Seq(("a.com", "/private/", false)).toDF("host", "prefix", "allow")
    val perHost = graft.operators.Crawl.robotsRulesPerHost(rules)
    // Trap cells as the batch miner produces them on a calendar trap.
    val trapLog = ((1 to 30).map(i => s"http://a.com/cal/2026/$i") ++
      Seq("http://a.com/about")).toDF("url")
    val traps = graft.operators.Crawl
      .urlTemplateReport(trapLog, "url", maxUrlsPerTemplate = 10)
      .filter(col("trap")).select("host", "template")
    val fetches = Seq(
      (1L, "http://a.com/private/x"), // robots-denied
      (2L, "http://a.com/cal/2026/5"), // trap template
      (3L, "http://a.com/ok/1"),
      (4L, "http://b.com/ok/9")) // no rules, no traps
    val stream = MemoryStream[(Long, String)]
    val gated = Streaming.frontierGateStream(
      stream.toDF().toDF("fetch_id", "url"), perHost, traps)
    val q = gated.writeStream.format("memory").queryName("frontier_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(fetches: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamIds = spark.table("frontier_stream").select("fetch_id")
      .collect().map(_.getLong(0)).toSet
    assert(streamIds == Set(3L, 4L), s"admitted: $streamIds")
    // Batch parity: the same fetches through the batch gate (the
    // frontierPlanGated admission, before scheduling).
    val batchIds = graft.operators.Crawl
      .robotsFilter(fetches.toDF("fetch_id", "url"), "url", "fetch_id", rules)
      .filter(col("allowed"))
      .join(broadcast(traps.select(col("host").as("__th"),
        col("template").as("__tt"))),
        col("host") === col("__th") &&
          graft.operators.Crawl.urlTemplate(col("path")) === col("__tt"),
        "left_anti")
      .select("fetch_id")
      .collect().map(_.getLong(0)).toSet
    assert(batchIds == streamIds, "stream and batch gates must agree")
  }

  test("stream-stream interval join attributes purchases to preceding views") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val attributed = Streaming.purchaseAttribution(
      stream.toDF(), window = "50 minutes", watermark = "1 hour")
    val q = attributed.writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 100: views at :00 (batch1) then purchase at :50 (batch2) —
      // inside the 50-minute window; user 200 never purchases.
      stream.addData(batch1: _*); q.processAllAvailable()
      stream.addData(batch2: _*); q.processAllAvailable()
      // push the watermark so joined results flush in Append mode
      stream.addData(Event(98L, ts(59), 300L, "view", 0.0))
      q.processAllAvailable()
      stream.addData(
        Event(99L, Timestamp.valueOf("2026-01-01 13:00:00"), 300L, "view", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("attrib").collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toSet
    assert(rows == Set((100L, 10.0)),
      s"exactly user 100's purchase attributes to its view, got ${rows.toSeq}")
  }

  test("stream-static enrichment joins a batch dim without stream state") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((100L, "gold"), (300L, "trial")).toDF("user_id", "segment")
    val stream = MemoryStream[Event]
    val enriched = Streaming.enrichEvents(stream.toDF(), dim)
      .select("event_id", "user_id", "segment")
    val q = enriched.writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(batch1: _*); q.processAllAvailable()
      stream.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("enriched").collect()
      .map(r => (r.getLong(0), Option(r.getString(2)))).toMap
    assert(rows.size == 5, s"every event passes through, got $rows")
    assert(rows(1L).contains("gold") && rows(4L).contains("gold"),
      "user 100's events enrich with its segment")
    assert(rows(3L).isEmpty && rows(5L).isEmpty,
      "unmatched users keep null segment (left join), not dropped")
  }

  test("streaming decontamination drops eval-overlapping docs statelessly") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evalPool = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val stream = MemoryStream[(Long, String)]
    val clean = Streaming.decontaminateStream(
      stream.toDF().toDF("doc_id", "text"), evalPool, minShared = 3)
    val q = clean.writeStream.format("memory").queryName("decontam")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(
        (1L, "alpha beta gamma delta epsilon zeta eta theta"), // full copy: dropped
        (2L, "some alpha beta gamma tail"),                    // 2 shared < 3: kept
        (3L, "nothing in common whatsoever here"))             // kept
      q.processAllAvailable()
      stream.addData((4L, "beta gamma delta epsilon zeta tail")) // 4 shared: dropped
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "decontamination must not register a stateful streaming operator")
    } finally q.stop()
    val kept = spark.table("decontam").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L), s"got $kept")
  }

  test("streaming incremental dedup anti-joins reference digests statelessly") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val reference = Seq((100L, "already ingested content"),
      (101L, "another known document")).toDF("doc_id", "text")
    val stream = MemoryStream[(Long, String)]
    val fresh = Streaming.dedupAgainstReferenceStream(
      stream.toDF().toDF("doc_id", "text"), reference)
    val q = fresh.writeStream.format("memory").queryName("incdedup")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(
        (1L, "already ingested content"),   // exact ref copy: dropped
        (2L, "already ingested content!"),  // one char off: kept
        (3L, "brand new material"))         // kept
      q.processAllAvailable()
      stream.addData((4L, "another known document")) // dropped
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "reference dedup must not register a stateful streaming operator")
    } finally q.stop()
    val kept = spark.table("incdedup").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L), s"got $kept")
  }

  test("streaming near-dup screen drops banded matches statelessly, keeps short docs") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // One word edited in a 22-word doc: shingle Jaccard ≈ 17/23 ≈ 0.74,
    // comfortably above the (r=2, b=8) banding threshold (1/8)^(1/2) ≈ 0.35,
    // so the near-dup collides deterministically under the fixed hash family.
    val base = "the quick brown fox jumps over the lazy dog tonight again " +
      "while the pale moon rises slowly above the silent sleeping town"
    val reference = Seq((100L, base)).toDF("doc_id", "text")
    val stream = MemoryStream[(Long, String)]
    val fresh = Streaming.nearDupAgainstReferenceStream(
      stream.toDF().toDF("doc_id", "text"), reference,
      rowsPerBand = 2, numBands = 8)
    val q = fresh.writeStream.format("memory").queryName("neardedup")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(
        (1L, base),                                                        // exact: dropped
        (2L, base.replace("lazy dog", "lazy cat")),                        // near: dropped
        (3L, "completely unrelated words appear in this document here now and nothing matches the other text at all"), // kept
        (4L, "too short"))                                                 // un-shingleable: kept
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "near-dup screen must not register a stateful streaming operator")
    } finally q.stop()
    val kept = spark.table("neardedup").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L), s"got $kept")
  }

  test("streaming semantic-match detections: LSH candidates, exact cosine, stateless") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Reference spans two directions; stream sends a same-direction
    // vector (detected, sim ≈ 0.999), an orthogonal one (no bucket in
    // common — and the exact-cosine filter would kill it regardless),
    // and a NULL embedding (no postings by construction).
    val reference = Seq(
      (100L, Array(1.0f, 0.01f, 0.0f)),
      (101L, Array(0.0f, 1.0f, 0.01f))).toDF("vec_id", "embedding")
    val stream = MemoryStream[(Long, Option[Array[Float]])]
    val det = Streaming.semanticMatchesStream(
      stream.toDF().toDF("doc_id", "embedding"), reference, "vec_id",
      threshold = 0.9)
    val q = det.writeStream.format("memory").queryName("semdet")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(
        (1L, Some(Array(0.99f, 0.02f, 0.01f))), // near ref 100: detected
        (2L, Some(Array(0.0f, 0.0f, 1.0f))),    // orthogonal: clean
        (3L, None))                             // null embedding: clean
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "semantic match screen must not register a stateful streaming operator")
    } finally q.stop()
    // A pair may emit once per shared bucket — assert on the DISTINCT
    // (doc, ref) pairs, which is the operator's documented contract.
    val pairs = spark.table("semdet")
      .select("doc_id", "ref_vec_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 100L)), s"got $pairs")
    val sims = spark.table("semdet").select("sim").collect().map(_.getDouble(0))
    assert(sims.forall(_ >= 0.9), s"every detection must clear the threshold: ${sims.mkString(",")}")
  }

  test("streaming substring-match detections: pasted reference run detected, stateless") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val run = "the quick brown fox jumps over the lazy dog while seventeen " +
      "astronauts carefully measured the gravitational constant of the " +
      "asteroid belt using borrowed instruments from the orbital station"
    val reference = Seq((100L, run)).toDF("doc_id", "text")
    val stream = MemoryStream[(Long, String)]
    val det = Streaming.substringMatchesStream(
      stream.toDF().toDF("doc_id", "text"), reference)
    val q = det.writeStream.format("memory").queryName("subdet")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(
        (1L, "brand new intro text then " + run), // pastes the run: detected
        (2L, "entirely novel words that never appeared in any reference document at all, nothing shared here today"), // clean
        (3L, "short"))                            // below spanLen: clean
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "substring screen must not register a stateful streaming operator")
    } finally q.stop()
    val detected = spark.table("subdet").select("doc_id")
      .distinct().collect().map(_.getLong(0)).toSet
    assert(detected == Set(1L), s"got $detected")
    // batch parity: the detected span digests are exactly the stream
    // doc's anchored digests that the reference also produces
    import org.apache.spark.sql.functions.{col, explode}
    val refSpans = reference.select(
      explode(graft.functions.AnchoredSpanDigests
        .anchoredSpanDigests(col("text"), 50, 8, 1)).as("h"))
      .collect().map(_.getString(0)).toSet
    val streamed = spark.table("subdet").select("span_h")
      .collect().map(_.getString(0)).toSet
    assert(streamed.nonEmpty && streamed.subsetOf(refSpans))
  }

  test("map-only upsample runs unchanged on a stream, stateless") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    import org.apache.spark.sql.functions.{col, when}
    val up = graft.operators.Curation.upsampleByWeight(
      stream.toDF().toDF("doc_id", "lang"), "doc_id",
      when(col("lang") === "en", 2.0).otherwise(1.0))
    val q = up.writeStream.format("memory").queryName("upstream")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData((1L, "en"), (2L, "de"))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "upsample must not register a stateful streaming operator")
    } finally q.stop()
    val got = spark.table("upstream").collect()
      .map(r => (r.getLong(0), r.getInt(2))).toSet
    assert(got == Set((1L, 1), (1L, 2), (2L, 1)), s"got $got")
  }

  test("streaming PII screen redacts at ingest, stateless, batch-parity") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val screened = Streaming.scrubStream(
      stream.toDF().toDF("doc_id", "text"))
    val q = screened.writeStream.format("memory").queryName("scrubstream")
      .outputMode(OutputMode.Append()).start()
    val rows = Seq(
      (1L, "mail me at a.b@example.com about the ten tokens quality " +
        "gate passing text body here today"),
      (2L, "host 10.1.2.3 short"))
    try {
      stream.addData(rows: _*)
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "scrub screen must not register streaming state")
    } finally q.stop()
    val got = spark.table("scrubstream").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[String]("redacted")))
      .toMap
    assert(got(1L)._1 == 1L && got(1L)._3.contains("<EMAIL>"))
    assert(got(2L)._2 == 1L && got(2L)._3.contains("<IP>"))
    // batch parity: identical expressions, identical rows
    val batch = Streaming.scrubStream(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[String]("redacted"))).toMap
    assert(batch == got)
  }

  test("streaming temperature mix screens with census rates, batch-parity") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val census = (0 until 900).map(i => (i.toLong, "big")) ++
      (900 until 1000).map(i => (i.toLong, "small"))
    val censusDf = census.toDF("doc_id", "source")
    val stream = MemoryStream[(Long, String)]
    val screened = Streaming.temperatureMixStream(
      stream.toDF().toDF("doc_id", "source"), censusDf,
      alpha = 0.5, total = 300L)
    val q = screened.writeStream.format("memory").queryName("mixstream")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(census: _*)
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "mixture screen must be stateless")
    } finally q.stop()
    val got = spark.table("mixstream").collect()
      .map(_.getLong(0)).toSet
    val batch = graft.operators.Curation
      .temperatureMix(censusDf, "doc_id", "source", 0.5, 300L)
      .collect().map(_.getLong(0)).toSet
    assert(got == batch && got.nonEmpty)
  }

  test("streaming line dedup strips census-hot lines, stateless, batch-parity") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // "nav bar" is in 3 census docs (> maxDf=2) -> hot; "footer" (2) not.
    val census = Seq(
      (1L, "nav bar\nbody one\nfooter"),
      (2L, "nav bar\nbody two\nfooter"),
      (3L, "body three\nnav bar"))
    val censusDf = census.toDF("doc_id", "text")
    val stream = MemoryStream[(Long, String)]
    val screened = Streaming.lineDedupStream(
      stream.toDF().toDF("doc_id", "text"), censusDf, maxDf = 2)
    val q = screened.writeStream.format("memory").queryName("linestream")
      .outputMode(OutputMode.Append()).start()
    try {
      // An ARRIVING doc (not in the census) carrying the hot line.
      stream.addData((10L, "nav bar\nfresh content\nfooter"))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "line screen must be stateless")
    } finally q.stop()
    val got = spark.table("linestream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq((10L, 3L, 2L, "fresh content\nfooter")))
    // Batch parity: census-self-screened stream == batch lineDedup.
    val selfStream = graft.operators.SubstringDedup.stripHotLines(
      censusDf, "doc_id", "text",
      graft.operators.SubstringDedup.hotLineDigests(censusDf, "text", 2)
        .collect().map(_.getString(0)).toSeq)
      .collect().map(_.toSeq).toSet
    val batch = graft.operators.SubstringDedup
      .lineDedup(censusDf, "doc_id", "text", maxDf = 2)
      .collect().map(_.toSeq).toSet
    assert(selfStream == batch)
  }

  test("streaming decontamination flags eval-gram carriers, stateless, batch-parity") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evalText = "zero one two three four five six seven eight nine ten eleven twelve"
    val evalDf = Seq((0, evalText)).toDF("eval_set", "text")
    val stream = MemoryStream[(Long, String)]
    val screened = Streaming.decontamMatchesStream(
      stream.toDF().toDF("doc_id", "text"), evalDf, k = 13)
    val q = screened.writeStream.format("memory").queryName("decontamstream")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(
        (10L, "prefix words " + evalText + " suffix words"), // carries the eval 13-gram
        (11L, "completely unrelated text with plenty of its own words here okay then"))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "decontamination screen must be stateless")
    } finally q.stop()
    val got = spark.table("decontamstream").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("eval_set")))
    assert(got.toSet == Set((10L, 0)), s"only the carrier flags, got ${got.toSeq}")
    // Batch parity: the flagged (doc, set) pairs equal the batch
    // operator's at the same preset.
    val batchDocs = Seq(
      (10L, "prefix words " + evalText + " suffix words"),
      (11L, "completely unrelated text with plenty of its own words here okay then"))
      .toDF("doc_id", "text")
    val batch = graft.operators.Decontaminate.ngramOverlapPerSet(
      batchDocs, evalDf, "doc_id", "text", "eval_set", k = 13, minShared = 1)
      .select("doc_id", "eval_set")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got.toSet == batch)
  }

  test("streaming transforms run identically over a batch frame") {
    val spark = TestSpark.spark
    import spark.implicits._
    val batchDf = (batch1 ++ batch2).toDF()
    val out = Streaming.hourlyEventCounts(batchDf).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out("view") == 3L && out("click") == 1L && out("purchase") == 1L)
  }

  test("streaming calibration remap: offline isotonic mapping, stateless, batch-parity") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    // the mapping is fitted OFFLINE on a batch reliability table...
    val train = Seq(
      (0.05, true), (0.05, false), (0.15, true), (0.15, false),
      (0.15, false), (0.15, false), (0.95, true), (0.95, true))
      .toDF("score", "label")
    val mapping = graft.operators.QualityModel
      .recalibrate(train, "score", "label")
    // ...and applied to ARRIVING scores across micro-batches
    val stream = MemoryStream[(Long, Double)]
    val screened = Streaming.applyCalibrationStream(
      stream.toDF().toDF("id", "score"), "score", mapping)
    val q = screened.writeStream.format("memory").queryName("calstream")
      .outputMode(OutputMode.Append()).start()
    val rows1 = Seq((1L, 0.07), (2L, 0.12))
    val rows2 = Seq((3L, 0.99), (4L, 0.55)) // 0.55: unseen bin -> raw
    try {
      stream.addData(rows1: _*); q.processAllAvailable()
      stream.addData(rows2: _*); q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "calibration remap must not register streaming state")
    } finally q.stop()
    val got = spark.table("calstream").collect()
      .map(r => r.getLong(0) ->
        r.getDouble(r.fieldIndex("calibrated_score"))).toMap
    // bins 0 and 1 violate (1/2 then 1/4) -> pooled 2/6; bin 9 = 1.0
    assert(got == Map(1L -> 0.333333, 2L -> 0.333333, 3L -> 1.0,
      4L -> 0.55), got.toString)
    // batch parity: the SAME operator on the same rows, same values
    val batch = graft.operators.QualityModel.applyCalibration(
        (rows1 ++ rows2).toDF("id", "score"), "score", mapping)
      .collect().map(r => r.getLong(0) ->
        r.getDouble(r.fieldIndex("calibrated_score"))).toMap
    assert(batch == got)
  }

  test("KEYED streaming calibration remap: per-source mapping deploys online, " +
    "stateless, batch-parity") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // per-source fits that genuinely differ: srcA pools bins 0/1 to
    // 0.375, srcB's bin 0 stands at 0.5 — a global mapping could not
    // produce both values for the same arriving score.
    val train =
      Seq.fill(2)(("srcA", 0.05, true)) ++ Seq.fill(2)(("srcA", 0.05, false)) ++
        Seq.fill(1)(("srcA", 0.15, true)) ++ Seq.fill(3)(("srcA", 0.15, false)) ++
        Seq.fill(1)(("srcB", 0.05, false)) ++ Seq.fill(1)(("srcB", 0.05, true)) ++
        Seq.fill(2)(("srcB", 0.95, true))
    val mapping = graft.operators.QualityModel.recalibrateBy(
      train.toDF("source", "score", "label"), "source", "score", "label")
    val stream = MemoryStream[(Long, String, Double)]
    val screened = Streaming.applyCalibrationStreamBy(
      stream.toDF().toDF("id", "source", "score"), "source", "score", mapping)
    val q = screened.writeStream.format("memory").queryName("calstreamby")
      .outputMode(OutputMode.Append()).start()
    val rows1 = Seq((1L, "srcA", 0.07), (2L, "srcB", 0.07))
    val rows2 = Seq(
      (3L, "srcB", 0.55),   // (srcB, bin 5) unseen -> raw
      (4L, "srcNew", 0.07)) // brand-new source -> raw
    try {
      stream.addData(rows1: _*); q.processAllAvailable()
      stream.addData(rows2: _*); q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "keyed calibration remap must not register streaming state")
    } finally q.stop()
    val got = spark.table("calstreamby").collect()
      .map(r => r.getLong(0) ->
        r.getDouble(r.fieldIndex("calibrated_score"))).toMap
    assert(got == Map(1L -> 0.375, 2L -> 0.5, 3L -> 0.55, 4L -> 0.07),
      got.toString)
    // batch parity: the SAME keyed operator over the same rows
    val batch = graft.operators.QualityModel.applyCalibrationBy(
        (rows1 ++ rows2).toDF("id", "source", "score"),
        "source", "score", mapping)
      .collect().map(r => r.getLong(0) ->
        r.getDouble(r.fieldIndex("calibrated_score"))).toMap
    assert(batch == got)
  }

  test("streaming per-source threshold filter: offline selection deploys " +
    "online, stateless, batch-parity") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // offline: srcA's max-F1 point is 0.7, srcB's is 0.2 (hand-checked
    // in QualityModelSpec); srcC gets no row (never scored offline)
    val train = Seq(
      ("srcA", 0.9, true), ("srcA", 0.8, false), ("srcA", 0.7, true),
      ("srcA", 0.5, false), ("srcA", 0.4, false),
      ("srcB", 0.9, false), ("srcB", 0.6, true), ("srcB", 0.2, true))
      .toDF("source", "score", "label")
    val thresholds = graft.operators.QualityModel.thresholdSelectBy(
      train, "source", "score", "label")
    val stream = MemoryStream[(String, Long, Double)]
    val kept = Streaming.applyThresholdStreamBy(
      stream.toDF().toDF("source", "doc_id", "score"), "source", "score",
      thresholds)
    val q = kept.writeStream.format("memory").queryName("thr_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(("srcA", 1L, 0.8), ("srcA", 2L, 0.69),
        ("srcB", 3L, 0.3), ("srcC", 4L, 0.99))
      q.processAllAvailable()
      // half-band: rounds up to srcA's grid point -> kept
      stream.addData(("srcA", 5L, 0.6999996), ("srcB", 6L, 0.1))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "threshold deployment must not register streaming state")
    } finally q.stop()
    val out = spark.table("thr_stream").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(out == Set(1L, 3L, 5L), s"kept: $out")
    // batch parity
    val batch = Seq(("srcA", 1L, 0.8), ("srcA", 2L, 0.69),
      ("srcB", 3L, 0.3), ("srcC", 4L, 0.99), ("srcA", 5L, 0.6999996),
      ("srcB", 6L, 0.1)).toDF("source", "doc_id", "score")
    val bOut = Streaming.applyThresholdStreamBy(
      batch, "source", "score", thresholds)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(bOut == out, s"stream/batch filter divergence: $bOut vs $out")
  }

  test("streaming drift gate quarantines drifted and unmeasured sources, " +
    "stateless, batch-parity") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // offline verdict: srcGood's distribution holds release-over-
    // release; srcBad's collapsed into the top bin (PSI >> 0.25)
    def spread(src: String) =
      Seq.tabulate(40)(i => (src, (i % 10) / 10.0 + 0.05))
    val base = (spread("srcGood") ++ spread("srcBad"))
      .toDF("source", "score")
    val cur = (spread("srcGood") ++
      Seq.fill(40)(("srcBad", 0.95))).toDF("source", "score")
    // inject a NULL verdict: an unmeasurable source must gate FALSE,
    // not ride a coalesce-to-zero through the bound
    val verdicts = graft.operators.QualityModel.psiTotalBy(
        base, cur, "source", "score")
      .unionByName(Seq(("srcNullV", Option.empty[Double]))
        .toDF("source", "psi_total"))
    val stream = MemoryStream[(String, Long)]
    val gated = Streaming.driftGateStream(
      stream.toDF().toDF("source", "doc_id"), "source", verdicts)
    val q = gated.writeStream.format("memory").queryName("drift_gate")
      .outputMode(OutputMode.Append()).start()
    try {
      // srcNew has NO verdict row: unmeasured does not ship
      stream.addData(("srcGood", 1L), ("srcBad", 2L), ("srcNew", 3L))
      q.processAllAvailable()
      stream.addData(("srcGood", 4L), ("srcBad", 5L), ("srcNullV", 6L))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "the drift gate must not register streaming state")
    } finally q.stop()
    val out = spark.table("drift_gate").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(out == Set(1L, 4L),
      s"only the stable source ships (drifted/unmeasured/null drop): $out")
    // batch parity: the same gate over a batch frame agrees row-for-row
    val batch = Seq(("srcGood", 1L), ("srcBad", 2L), ("srcNew", 3L),
      ("srcGood", 4L), ("srcBad", 5L), ("srcNullV", 6L))
      .toDF("source", "doc_id")
    val bOut = Streaming.driftGateStream(batch, "source", verdicts)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(bOut == out, s"stream/batch gate divergence: $bOut vs $out")
  }
}
