package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LinkGraph

/** Fixed-point PageRank semantics (hand-computed iteration, dangling
  * mass, mass conservation, partitioning bit-stability) and the degree
  * / link-locality report. */
class LinkGraphSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  /** 1 -> 2, 2 -> {1, 3}; vertex 3 dangling. */
  private def triangle = {
    val s = spark
    import s.implicits._
    Seq((1L, 2L), (2L, 1L), (2L, 3L)).toDF("src", "dst")
  }

  private def rankMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("pageRank: one hand-computed fixed-point iteration") {
    // N=3, scale=1e9: init = 333333333, base = (15*init) div 100 = 49999999.
    // Contribs: 1->2 full 333333333; 2 splits 166666666 to 1 and 3.
    // Dangling 3 contributes 333333333 div 3 = 111111111 to everyone.
    // r1(1) = r1(3) = 49999999 + 85*(166666666+111111111) div 100 = 286111109
    // r1(2) =          49999999 + 85*(333333333+111111111) div 100 = 427777776
    val r = rankMap(LinkGraph.pageRank(triangle, "src", "dst", iterations = 1))
    assert(r == Map(1L -> 286111109L, 2L -> 427777776L, 3L -> 286111109L))
  }

  test("pageRank: mass conserved up to truncation loss") {
    val r = LinkGraph.pageRank(triangle, "src", "dst", iterations = 5)
      .agg(sum("rank_fp")).collect()(0).getLong(0)
    // Each div truncates < 1 unit per edge/vertex per iteration: the
    // total can only drift a few hundred units below the scale.
    assert(r <= 1000000000L && r > 999990000L, s"mass $r")
  }

  test("pageRank: bit-identical under repartitioning") {
    val a = rankMap(LinkGraph.pageRank(triangle, "src", "dst", 3))
    val b = rankMap(LinkGraph.pageRank(triangle.repartition(7), "src", "dst", 3))
    assert(a == b)
  }

  test("pageRank: sink accumulates rank, no-inlink vertex keeps base") {
    val s = spark
    import s.implicits._
    // Star into 9: vertices 0-8 each link only to 9 (9 dangling).
    val star = (0L to 8L).map(u => (u, 9L)).toDF("src", "dst")
    val r = rankMap(LinkGraph.pageRank(star, "src", "dst", 2))
    assert(r(9L) > r(0L) * 3, s"sink should dominate: ${r(9L)} vs ${r(0L)}")
    assert((0L to 8L).map(r).toSet.size == 1, "symmetric sources tie exactly")
  }

  test("degreeReport: degrees, locality, full-outer vertex coverage") {
    val s = spark
    import s.implicits._
    val e = Seq(
      (1L, 2L, "a", "a"), // intra
      (1L, 3L, "a", "b"), // cross
      (2L, 3L, "a", "b")) // cross
      .toDF("src", "dst", "sh", "dh")
    val rows = LinkGraph.degreeReport(e, "src", "dst", "sh", "dh")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3))))).toMap
    assert(rows(1L) == ((2L, 0L, Some(0.5))))
    assert(rows(2L) == ((1L, 1L, Some(0.0))))
    // in-only vertex: out_deg 0, intra_rate null (not 0 — no out-links
    // to be local, and 0.0 would alias the all-cross case)
    assert(rows(3L) == ((0L, 2L, None)))
  }

  test("pageRank warm-start: resume from k1 ranks == running k1+k2 straight") {
    val full = rankMap(LinkGraph.pageRank(triangle, "src", "dst", 5))
    val k2 = LinkGraph.pageRank(triangle, "src", "dst", 2)
    val resumed = rankMap(LinkGraph.pageRank(
      triangle, "src", "dst", 3, initial = Some(k2)))
    assert(resumed == full, "warm-start must be exact, not approximate")
  }

  test("pageRank warm-start: new vertices enter at uniform, dead rows drop") {
    val s = spark
    import s.implicits._
    // Prior ranks cover vertex 1 only (+ a dead vertex 99); the graph
    // has vertices 1,2,3 — 2 and 3 must enter at scale div 3.
    val prior = Seq((1L, 777L), (99L, 123L)).toDF("id", "rank_fp")
    val r = LinkGraph.pageRank(triangle, "src", "dst", 1,
      initial = Some(prior))
    assert(!rankMap(r).contains(99L), "dead vertices drop")
    // One iteration from (777, init, init) — just pin it runs and keeps
    // the full current vertex set.
    assert(rankMap(r).keySet == Set(1L, 2L, 3L))
  }

  test("anchorTerms: top-k terms per destination, count desc / term asc ties") {
    val s = spark
    import s.implicits._
    val e = Seq(
      (1L, "big cat"), (1L, "big dog"), (1L, "big cat"), (1L, "ant"),
      (2L, "zz aa")) // one in-link: both terms tie at 1, term asc breaks
      .toDF("dst", "anchor")
    val rows = LinkGraph.anchorTerms(e, "dst", "anchor", k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    // dst 1: big=3, cat=2, dog/ant tie at 1 -> ant wins rank 3 (term asc)
    assert(rows == Set(
      (1L, "big", 3L, 1L), (1L, "cat", 2L, 2L), (1L, "ant", 1L, 3L),
      (2L, "aa", 1L, 1L), (2L, "zz", 1L, 2L)))
  }

  test("pageRank materializeEvery: bit-identical ranks, plan depth bounded") {
    // The checkpoint discipline is a PHYSICAL decision only: fixed-
    // point Longs make the materialized run provably equal to the
    // straight one, value for value.
    val straight = rankMap(LinkGraph.pageRank(
      triangle, "src", "dst", 7, materializeEvery = 0))
    val pinned = LinkGraph.pageRank(
      triangle, "src", "dst", 7, materializeEvery = 2)
    assert(rankMap(pinned) == straight,
      "materialization must not change a single rank unit")
    // And it is WHY the option exists: the pinned plan's analyzed
    // depth stays bounded by the window since the last checkpoint
    // instead of growing with the full iteration count.
    val unpinnedDepth = LinkGraph.pageRank(
      triangle, "src", "dst", 7, materializeEvery = 0)
      .queryExecution.analyzed.treeString.linesIterator.size
    val pinnedDepth = pinned.queryExecution.analyzed.treeString
      .linesIterator.size
    assert(pinnedDepth < unpinnedDepth / 2,
      s"pinned plan should be far shallower: $pinnedDepth vs $unpinnedDepth")
  }

  test("pageRankConverged: stops at the exact fixed point") {
    val (conv, k) = LinkGraph.pageRankConverged(
      triangle, "src", "dst", tolFp = 0L, maxIterations = 64, segment = 4)
    val m = rankMap(conv)
    // The converged state equals a straight run of the same length
    // (warm-start exactness), and one more iteration is the identity
    // — the definition of a fixed point in fixed-point arithmetic.
    assert(m == rankMap(LinkGraph.pageRank(
      triangle, "src", "dst", k, materializeEvery = 4)), s"k=$k")
    assert(m == rankMap(LinkGraph.pageRank(
      triangle, "src", "dst", 1, initial = Some(conv))),
      "fixed point must be stable under one more iteration")
    assert(k >= 8 && k < 64, s"plausible convergence length, got $k")
  }

  test("applyEdgeDelta: multiset patch semantics") {
    val s = spark
    import s.implicits._
    // prev holds 1->2 TWICE (a doubled link) plus 2->3; the delta adds
    // 3->1 and removes ONE instance of 1->2 — the other must survive.
    val prev = Seq((1L, 2L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val added = Seq((3L, 1L)).toDF("src", "dst")
    val removed = Seq((1L, 2L)).toDF("src", "dst")
    val patched = LinkGraph.applyEdgeDelta(prev, added, removed, "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(patched == Seq((1L, 2L), (2L, 3L), (3L, 1L)), patched.toString)
  }

  test("pageRankDelta == warm-started pageRank on the hand-patched graph") {
    val s = spark
    import s.implicits._
    val prev = Seq((1L, 2L), (2L, 1L), (2L, 3L), (4L, 1L)).toDF("src", "dst")
    val added = Seq((3L, 4L), (1L, 3L)).toDF("src", "dst")
    val removed = Seq((4L, 1L)).toDF("src", "dst")
    val prior = LinkGraph.pageRank(prev, "src", "dst", 3)
    val viaDelta = rankMap(LinkGraph.pageRankDelta(
      prev, added, removed, "src", "dst", prior, iterations = 2))
    val handPatched = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (1L, 3L))
      .toDF("src", "dst")
    val fromScratch = rankMap(LinkGraph.pageRank(
      handPatched, "src", "dst", 2, initial = Some(prior)))
    assert(viaDelta == fromScratch)
    // Vertex 4 lost its only out-edge but gained an in-edge: it must
    // still be in the result (the vertex set is the patched graph's).
    assert(viaDelta.contains(4L))
  }

  test("hits: bit-identical across materialization cadences") {
    val a = LinkGraph.hits(triangle, "src", "dst", 4, materializeEvery = 0)
    val b = LinkGraph.hits(triangle, "src", "dst", 4, materializeEvery = 1)
    val c = LinkGraph.hits(triangle, "src", "dst", 4, materializeEvery = 2)
    // cadence > iterations: NO iteration ever pins (1..3 % 4 != 0), so
    // the statics must stay lazy too — and values still agree.
    val d = LinkGraph.hits(triangle, "src", "dst", 3, materializeEvery = 4)
    val dRef = LinkGraph.hits(triangle, "src", "dst", 3, materializeEvery = 0)
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m(a) == m(b) && m(b) == m(c))
    assert(m(d) == m(dRef))
  }

  test("pageRankConverged: bit-identical across inner cadences") {
    val (a, ka) = LinkGraph.pageRankConverged(
      triangle, "src", "dst", tolFp = 0L, maxIterations = 24, segment = 4,
      materializeEvery = 0)
    val (b, kb) = LinkGraph.pageRankConverged(
      triangle, "src", "dst", tolFp = 0L, maxIterations = 24, segment = 4,
      materializeEvery = 1)
    assert(ka == kb && rankMap(a) == rankMap(b))
  }

  test("pageRankConverged: never overruns maxIterations (clamped last segment)") {
    // segment=4, maxIterations=6: 4 then a CLAMPED 2 — the old loop
    // ran 4+4=8, contradicting the "or maxIterations is hit" contract.
    val (ranks, k) = LinkGraph.pageRankConverged(
      triangle, "src", "dst", tolFp = 0L, maxIterations = 6, segment = 4)
    assert(k == 6, s"must stop exactly at maxIterations, ran $k")
    // The clamped 4+2 run equals the straight 6-iteration run
    // (warm-start exactness holds for any segment lengths).
    assert(rankMap(ranks) ==
      rankMap(LinkGraph.pageRank(triangle, "src", "dst", 6)))
  }

  test("personalizedPageRank: phantom seeds outside the graph are excluded") {
    val s = spark
    import s.implicits._
    // Seed 99 appears in no edge: it can never receive teleport mass,
    // so counting it would ship scale/|seeds| of rank to nowhere.
    // |S ∩ V| = 1, so the result must equal the {1}-only run and total
    // mass must stay at full scale (up to truncation).
    val phantom = LinkGraph.personalizedPageRank(
      triangle, "src", "dst", Seq(1L, 99L).toDF("id"), iterations = 3)
    val clean = LinkGraph.personalizedPageRank(
      triangle, "src", "dst", Seq(1L).toDF("id"), iterations = 3)
    assert(rankMap(phantom) == rankMap(clean))
    val mass = phantom.agg(sum("rank_fp")).collect()(0).getLong(0)
    assert(mass > 999990000L && mass <= 1000000000L, s"mass $mass")
    // An all-phantom seed set has no vertex to teleport to — refuse.
    intercept[IllegalArgumentException] {
      LinkGraph.personalizedPageRank(
        triangle, "src", "dst", Seq(99L).toDF("id"), iterations = 1)
    }
  }

  test("personalizedPageRank: one hand-computed iteration, seed-only teleport") {
    val s = spark
    import s.implicits._
    val seeds = Seq(1L).toDF("id")
    // s=1: init=1e9 on vertex 1 only; base=(15*1e9)/100.
    // Contribs after r0: 1 -> 2 carries the full 1e9; 2's rank is 0.
    // Dangling 3 holds 0. So r1 = (seed base, 85% of 1e9, 0).
    val r = rankMap(LinkGraph.personalizedPageRank(
      triangle, "src", "dst", seeds, iterations = 1))
    assert(r == Map(1L -> 150000000L, 2L -> 850000000L, 3L -> 0L), r.toString)
  }

  test("personalizedPageRank: mass stays in the seed neighborhood") {
    val s = spark
    import s.implicits._
    // Two disconnected triangles 1-2-3 and 11-12-13; seeding {1} must
    // leave the other component at exactly zero forever.
    val twoTri = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (11L, 12L), (12L, 13L), (13L, 11L)).toDF("src", "dst")
    val r = rankMap(LinkGraph.personalizedPageRank(
      twoTri, "src", "dst", Seq(1L).toDF("id"), iterations = 5))
    assert(Seq(11L, 12L, 13L).forall(r(_) == 0L),
      s"unreachable component must hold zero mass: $r")
    assert(r(1L) > 0 && r(2L) > 0 && r(3L) > 0)
  }

  test("hits: star graph — sink is the authority, sources are the hubs") {
    val s = spark
    import s.implicits._
    val star = (0L to 8L).map(u => (u, 9L)).toDF("src", "dst")
    val rows = LinkGraph.hits(star, "src", "dst", iterations = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // auth: only 9 has in-links; renorm gives it the whole scale.
    // hub: each source's raw hub = auth(9) = 1e9; nine-way split.
    assert(rows(9L) == ((0L, 1000000000L)), rows.toString)
    (0L to 8L).foreach(u => assert(rows(u) == ((111111111L, 0L))))
  }

  test("hits: mass renormalizes to scale each half-step, runs deep") {
    // Every half-step pins its raw frame before the renorm total, so
    // 6 iterations stay linear work (unpinned this would be 4^6 plan
    // copies). Both totals must sit within one truncation unit per
    // vertex of the full scale.
    val rows = LinkGraph.hits(triangle, "src", "dst", 6).collect()
    val hubMass = rows.map(_.getLong(1)).sum
    val authMass = rows.map(_.getLong(2)).sum
    assert(hubMass > 999999990L && hubMass <= 1000000000L, s"hub $hubMass")
    assert(authMass > 999999990L && authMass <= 1000000000L, s"auth $authMass")
  }

  test("pageRank: the only driver action is the vertex count") {
    // Plan sanity: with materialization OFF, ranks is a lazy frame —
    // building k iterations must not run per-iteration jobs (the
    // dangling total is a broadcast cross join, not a collect), so
    // construction cost is the vertex count alone, independent of k.
    // (The materializeEvery default deliberately trades this laziness
    // for bounded lineage past 4 iterations — its eager checkpoint
    // jobs are the feature, covered by the bit-identity test above.)
    // Count job STARTS with a listener — statusTracker's retained-job
    // list is bounded, so length deltas go negative once the suite has
    // run enough jobs (observed after the convergence test landed).
    val started = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        started.incrementAndGet()
    }
    val sc = spark.sparkContext
    sc.addSparkListener(listener)
    try {
      // The bus posts asynchronously; drain it DETERMINISTICALLY
      // (waitUntilEmpty via the main-scope bridge) so a late-posted
      // job-start event can never land between the two deltas — a
      // fixed sleep flaked under CI load.
      def settled(): Int = {
        org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(sc)
        started.get()
      }
      val b1 = settled()
      val df = LinkGraph.pageRank(triangle, "src", "dst", 1,
        materializeEvery = 0)
      val oneIter = settled() - b1
      val b6 = settled()
      LinkGraph.pageRank(triangle, "src", "dst", 6, materializeEvery = 0)
      val sixIter = settled() - b6
      assert(sixIter == oneIter,
        s"construction jobs must not scale with iterations: 1-iter=$oneIter 6-iter=$sixIter")
      assert(df.columns.toSeq == Seq("id", "rank_fp"))
    } finally sc.removeSparkListener(listener)
  }
}
