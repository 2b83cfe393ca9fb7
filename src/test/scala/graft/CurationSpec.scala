package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

/** Curation operators: the funnel report cross-checked against direct
  * cumulative filters, and the prefix-sum-backed selection operators
  * (curriculum / shuffle / budget) pinned EQUAL to their single-task
  * global-window formulations — plus the plan pin that the distributed
  * version never actually plans that global window. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs = spark.read
    .parquet(TestSpark.sf001 + "/documents.parquet")

  private val stages = Seq(
    "min_len" -> (col("n_chars") >= 100),
    "lang" -> (col("lang") =!= "zh"),
    "min_toks" -> (operators.TextAnalysis.tokenCount(col("text")) >= 40))

  test("filterFunnel matches direct cumulative filter counts") {
    val report = Curation.filterFunnel(docs, stages)
      .orderBy("stage_idx").collect()
    assert(report.map(_.getString(1)).toSeq ==
      Seq("min_len", "lang", "min_toks"))
    val total = docs.count()
    var surviving = docs
    var expectedIn = total
    report.foreach { r =>
      assert(r.getLong(2) == expectedIn,
        s"stage ${r.getString(1)}: rows_in ${r.getLong(2)} != $expectedIn")
      surviving = surviving.filter(stages(r.getInt(0))._2)
      val out = surviving.count()
      assert(r.getLong(3) == out,
        s"stage ${r.getString(1)}: rows_out ${r.getLong(3)} != $out")
      expectedIn = out
    }
    // The funnel must actually funnel on this fixture: every stage
    // drops something, so a broken first-fail index can't pass by
    // accident on all-pass/all-fail degenerate columns.
    assert(report.forall(r => r.getLong(3) < r.getLong(2)))
  }

  test("filterFunnel counts a NULL predicate as a failure, like WHERE") {
    val s = spark
    import s.implicits._
    val df = Seq[(Integer, String)]((1, "a"), (null, "b"), (3, "c"))
      .toDF("v", "k")
    val rep = Curation.filterFunnel(df, Seq(
      "pos" -> (col("v") > 0),          // NULL for row 2 -> fails here
      "always" -> lit(true)))
      .orderBy("stage_idx").collect()
    assert(rep(0).getLong(2) == 3 && rep(0).getLong(3) == 2)
    assert(rep(1).getLong(2) == 2 && rep(1).getLong(3) == 2)
  }

  test("filterFunnel on an empty corpus reports zeros, not nulls") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, String)].toDF("v", "k")
    val rep = Curation.filterFunnel(empty, Seq("any" -> (col("v") > 0)))
      .collect()
    assert(rep.length == 1 && rep(0).getLong(2) == 0 && rep(0).getLong(3) == 0)
  }

  test("curriculumSample equals the global-window formulation") {
    val base = docs.select("doc_id", "n_chars")
    val got = Curation.curriculumSample(
      base, "doc_id", col("n_chars"), keepPerMille = Seq(250, 500, 750, 1000))
      .select("doc_id", "bin")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_chars"), col("doc_id"))
    val n = base.count()
    val expected = base
      .withColumn("bin",
        floor(((row_number().over(w) - 1) * 4).cast("double") / n).cast("int"))
      .filter(operators.Splits.hashBucket(
        concat(lit("cur:"), col("doc_id").cast("string"))) <
        element_at(map(lit(0), lit(250), lit(1), lit(500),
          lit(2), lit(750), lit(3), lit(1000)), col("bin")) * 10)
      .select("doc_id", "bin")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    // Rates actually bite: the low-quality bin keeps fewer than the top
    // bin (bin 3 keeps everything).
    val byBin = got.groupBy("bin").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byBin(0) < byBin(3))
    // Decorrelated from assignSplit: composing a 50%-rate curriculum
    // with the 90/5/5 split must still populate val/test (with the
    // bare-id bucket every survivor would be train).
    val half = Curation.curriculumSample(
      base, "doc_id", col("n_chars"), keepPerMille = Seq(500, 500))
    val splits = half.select(operators.Splits.assignSplit(col("doc_id"),
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)).as("split"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(splits == Set("train", "val", "test"),
      s"curriculum survivors must span all splits, got $splits")
  }

  test("shuffleOrder is a deterministic seeded permutation") {
    val base = docs.select("doc_id")
    val got = Curation.shuffleOrder(base, "doc_id", seed = "s42")
    val n = base.count()
    // Permutation: positions are exactly 0..n-1.
    assert(got.agg(countDistinct("pos")).head.getLong(0) == n)
    assert(got.agg(min("pos"), max("pos")).head match {
      case r => r.getLong(0) == 0L && r.getLong(1) == n - 1
    })
    // Deterministic: a second evaluation and a different partitioning
    // yield the identical assignment.
    val again = Curation.shuffleOrder(
      base.repartition(7), "doc_id", seed = "s42")
    assert(got.exceptAll(again).isEmpty && again.exceptAll(got).isEmpty)
    // Seed-sensitive: a different seed is a different permutation.
    val other = Curation.shuffleOrder(base, "doc_id", seed = "s43")
    assert(got.exceptAll(other).count() > 0)
    // Actually shuffled: not the identity order.
    assert(got.filter(col("pos") =!= col("doc_id")).count() > 0)
  }

  test("budgetSelect keeps the best docs and never exceeds the budget") {
    val base = docs.select(col("doc_id"), col("n_chars"),
      operators.TextAnalysis.tokenCount(col("text")).as("n_tok"))
    val got = Curation.budgetSelect(
      base, "doc_id", "n_tok", col("n_chars"), budget = 12000L)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_chars").desc, col("doc_id"))
      .rowsBetween(Long.MinValue, 0)
    val expected = base
      .withColumn("cum_tokens", sum(col("n_tok").cast("long")).over(w))
      .filter(col("cum_tokens") <= 12000L)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    assert(got.agg(max("cum_tokens")).head.getLong(0) <= 12000L)
    // Greedy by score: every kept doc outscores (or ties) every dropped
    // doc — min kept n_chars >= max dropped n_chars is too strong at
    // the boundary tie, so compare against docs strictly above it.
    val minKept = got.agg(min("n_chars")).head.getLong(0)
    val droppedAbove = base.join(got.select("doc_id"), Seq("doc_id"), "left_anti")
      .filter(col("n_chars") > minKept).count()
    // A dropped doc with n_chars above the min kept can only be the
    // straddling boundary doc's betters... there are none: selection is
    // a prefix of the (n_chars desc, doc_id) order.
    assert(droppedAbove == 0, s"$droppedAbove dropped docs outscore a kept doc")
  }

  test("importanceWeights ranks target-like docs above off-domain docs") {
    val s = spark
    import s.implicits._
    // Target = "a b"-language; off-domain = "x y"-language. Docs drawn
    // purely from the target vocabulary must weigh strictly higher
    // than docs from the off-domain vocabulary; a mixed doc in between.
    val corpus = Seq(
      (1L, "a b a b a"),
      (2L, "a b x y b"),
      (3L, "x y x y x"),
      (4L, "y x y y x")
    ).toDF("doc_id", "text")
    val target = corpus.filter(col("doc_id") === 1)
    val w = operators.Curation
      .importanceWeights(corpus, target, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("avg_llr"))
      .toMap
    assert(w(1L) > w(2L) && w(2L) > w(3L),
      s"expected target > mixed > off-domain, got $w")
    assert(w(3L) < 0 && w(1L) > 0)
    // n_tok accounting: every token of every doc is scored.
    val n = operators.Curation
      .importanceWeights(corpus, target, "doc_id", "text")
      .agg(org.apache.spark.sql.functions.sum("n_tok"))
      .collect()(0).getLong(0)
    assert(n == 20L)
  }

  test("importanceWeights with an empty target degrades to uniform, not -inf") {
    val s = spark
    import s.implicits._
    val corpus = Seq((1L, "a b c"), (2L, "a a a")).toDF("doc_id", "text")
    val w = operators.Curation
      .importanceWeights(corpus, corpus.filter(lit(false)), "doc_id", "text")
      .collect()
    assert(w.length == 2)
    assert(w.forall(r => !r.getAs[Double]("avg_llr").isInfinite &&
      !r.getAs[Double]("avg_llr").isNaN))
  }

  test("qualityStages conjunction is exactly qualityFilter; gateAttrition chains") {
    val ta = operators.TextAnalysis
    val viaStages = docs.filter(
      ta.qualityStages(col("text"), 20, 500, 0.15, 2.0, 8.0)
        .map(_._2).reduce(_ && _))
    val viaFilter = docs.filter(
      ta.qualityFilter(col("text"), 20, 500, 0.15, 2.0, 8.0))
    assert(viaStages.exceptAll(viaFilter).isEmpty &&
      viaFilter.exceptAll(viaStages).isEmpty)
    val rep = operators.Pipeline.gateAttrition(docs, "text")
      .orderBy("stage_idx").collect()
    assert(rep.head.getLong(2) == docs.count())
    assert(rep.last.getLong(3) == viaFilter.count())
    rep.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) == b.getLong(2))
      case _ => ()
    }
  }

  test("fixedSample takes exactly n via bounded heaps, deterministically") {
    val base = docs.select("doc_id", "source")
    val got = Curation.fixedSample(base, "doc_id", n = 100, seed = "fs7")
    assert(got.count() == 100)
    val again = Curation.fixedSample(
      base.repartition(7), "doc_id", n = 100, seed = "fs7")
    assert(got.exceptAll(again).isEmpty && again.exceptAll(got).isEmpty)
    // Bounded-heap top-n, never a global sort.
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject:\n${plan.take(2000)}")
  }

  test("tokenShardOffsets matches the window formulation, offsets in range") {
    val base = docs.select(col("doc_id"),
      operators.TextAnalysis.tokenCount(col("text")).as("n_tok"))
    val got = operators.Packing.tokenShardOffsets(
      base, "doc_id", "n_tok", budget = 2048L)
      .select("doc_id", "shard", "tok_offset")
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      .rowsBetween(Long.MinValue, 0)
    val expected = base
      .withColumn("cum", sum(col("n_tok").cast("long")).over(w))
      .withColumn("shard", floor((col("cum") - col("n_tok")) / lit(2048.0)))
      .withColumn("tok_offset",
        col("cum") - col("n_tok").cast("long") - col("shard") * 2048L)
      .select("doc_id", "shard", "tok_offset")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    assert(got.filter(col("tok_offset") < 0 || col("tok_offset") >= 2048L)
      .count() == 0)
  }

  test("upsampleByWeight: integer weights exact, fractional converge, map-only") {
    val s = spark
    import s.implicits._
    val base = docs.select("doc_id", "lang")
    // Integer weight: every row exactly twice.
    val twice = Curation.upsampleByWeight(base, "doc_id", lit(2.0))
    assert(twice.count() == 2 * base.count())
    assert(twice.groupBy("doc_id").count().filter(col("count") =!= 2)
      .count() == 0)
    // Weight 0 drops everything.
    assert(Curation.upsampleByWeight(base, "doc_id", lit(0.0)).count() == 0)
    // Fractional: realized/nominal within hash-uniformity slack, and
    // copy indexes are 1..n_copies.
    val up = Curation.upsampleByWeight(base, "doc_id", lit(1.5))
    val ratio = up.count().toDouble / base.count()
    assert(math.abs(ratio - 1.5) < 0.1, s"realized weight $ratio, want ~1.5")
    assert(up.filter(col("copy") < 1).count() == 0)
    // Deterministic.
    val again = Curation.upsampleByWeight(
      base.repartition(5), "doc_id", lit(1.5))
    assert(up.exceptAll(again).isEmpty && again.exceptAll(up).isEmpty)
  }

  test("upsampleByWeight throws loudly on a NULL weight, not silent drop") {
    val s = spark
    import s.implicits._
    val base = Seq((1L, "en"), (2L, "xx")).toDF("doc_id", "lang")
    // when-chain with no otherwise: "xx" gets NULL weight.
    val holey = when(col("lang") === "en", 2.0)
    val e = intercept[Exception] {
      Curation.upsampleByWeight(base, "doc_id", holey).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("NULL or negative weight")),
      s"expected the NULL-weight error, got: $e")
    // Negative weights are the same caller-bug class: loud, not a drop.
    val e2 = intercept[Exception] {
      Curation.upsampleByWeight(base, "doc_id", lit(-0.5)).count()
    }
    assert(messages(e2).exists(_.contains("NULL or negative weight")),
      s"expected the negative-weight error, got: $e2")
  }

  test("dupGroupMatrix counts unordered group pairs") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "x"), (2L, "y"), (3L, "x"), (4L, "z"))
      .toDF("id", "grp")
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("id_a", "id_b")
    val got = operators.Dedup.dupGroupMatrix(df, pairs, "id", "grp")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // (1,2)=x,y and (2,3)=y,x both land in (x,y); (1,3) is the x
    // diagonal; (3,4)=(x,z).
    assert(got == Map(("x", "y") -> 2L, ("x", "x") -> 1L, ("x", "z") -> 1L))
    // NULL labels form their own group, never the diagonal (least/
    // greatest skip nulls — a (x, NULL) pair must not count as (x, x)).
    val dfn = Seq((1L, Option("x")), (2L, Option.empty[String]))
      .toDF("id", "grp")
    val gotN = operators.Dedup.dupGroupMatrix(
      dfn, Seq((1L, 2L)).toDF("id_a", "id_b"), "id", "grp")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(gotN == Map(("(unknown)", "x") -> 1L), s"got $gotN")
  }

  test("upsample is shuffle-free; funnel scans the corpus exactly once") {
    val up = Curation.upsampleByWeight(
      docs.select("doc_id", "lang"), "doc_id",
      when(col("lang") === "en", 2.5).otherwise(1.0))
    val shuffles = PlanCheck.shuffles(up)
    assert(shuffles.isEmpty, "upsample fan-out must be map-only")
    val funnel = Curation.filterFunnel(docs, stages)
    val scans = funnel.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1,
      s"funnel must classify in ONE corpus scan, saw $scans")
  }

  test("no single-task global window in any curation plan") {
    val base = docs.select(col("doc_id"), col("n_chars"),
      operators.TextAnalysis.tokenCount(col("text")).as("n_tok"))
    Seq(
      Curation.curriculumSample(base.select("doc_id", "n_chars"), "doc_id",
        col("n_chars"), Seq(250, 500, 750, 1000)),
      Curation.shuffleOrder(base.select("doc_id"), "doc_id", "s42"),
      Curation.budgetSelect(base, "doc_id", "n_tok", col("n_chars"), 12000L)
    ).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      // A global window shows an empty partition spec; the distributed
      // form partitions its window by the frozen range-partition id.
      assert(!plan.contains("Window [sum") || plan.contains("__pid"),
        s"global window detected:\n${plan.take(3000)}")
    }
  }

  test("weightedSample: deterministic, weight-dominant rows always in, non-positive weights out") {
    val s = spark
    import s.implicits._
    val rows = (1L to 200L).map(i => (i, if (i == 7L) 1000000L else 10L)) ++
      Seq((201L, 0L), (202L, -5L))
    val df = rows.toDF("doc_id", "w")
    val a = Curation.weightedSample(df, "doc_id", "w", k = 20)
      .collect().map(_.getLong(0)).toSet
    val b = Curation.weightedSample(df, "doc_id", "w", k = 20)
      .collect().map(_.getLong(0)).toSet
    assert(a == b, "same seed must reproduce the same sample")
    assert(a.contains(7L), "a 100000x weight practically guarantees selection")
    assert(!a.contains(201L) && !a.contains(202L), "non-positive weights excluded")
    assert(a.size == 20)
    // k >= population returns every positive-weight row
    val all = Curation.weightedSample(df, "doc_id", "w", k = 500).count()
    assert(all == 200L)
    // different seed draws a different sample (equal-weight pool)
    val c = Curation.weightedSample(df.filter(col("doc_id") <= 200), "doc_id", "w", k = 20, seed = "other")
      .collect().map(_.getLong(0)).toSet
    assert(c != a, "seed must steer the draw")
    // plan: bounded-heap top-k, not a global sort
    val plan = Curation.weightedSample(df, "doc_id", "w", k = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$plan")
  }

  test("weightedSampleByLogWeight matches the linear form and survives overflow-scale weights") {
    val s = spark
    import s.implicits._
    val df = (1L to 100L).map(i => (i, (i % 7 + 1).toDouble)).toDF("doc_id", "w")
      .withColumn("lw", log(col("w")))
    val lin = Curation.weightedSample(df, "doc_id", "w", k = 15)
      .collect().map(_.getLong(0)).toSet
    val logf = Curation.weightedSampleByLogWeight(df, "doc_id", "lw", k = 15)
      .collect().map(_.getLong(0)).toSet
    assert(lin == logf, "Gumbel form must select the same rows as -ln(u)/w")
    // log weights far beyond ln(Double.MaxValue): the dominant row wins,
    // nothing overflows
    val huge = (1L to 50L).map(i => (i, if (i == 9L) 1.0e6 else 10.0))
      .toDF("doc_id", "lw")
    val sel = Curation.weightedSampleByLogWeight(huge, "doc_id", "lw", k = 5)
      .collect().map(_.getLong(0)).toSet
    assert(sel.contains(9L) && sel.size == 5)
  }

  test("sourceDriftReport: identical distributions score 0, disjoint vocab matches hand replay") {
    val s = spark
    import s.implicits._
    // two sources with IDENTICAL token distributions -> each equals the
    // corpus distribution -> JS exactly 0 after rounding
    val same = Seq(("a", "x y z"), ("b", "x y z")).toDF("source", "text")
    val r0 = Curation.sourceDriftReport(same, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(r0 == Map("a" -> 0.0, "b" -> 0.0), s"got $r0")
    // disjoint vocabularies, equal sizes: p = 2q on own words, zero on
    // the other half; JS = 0.5*[ln(4/3)] + 0.5*[0.5*ln(2/3)] + 0.25*ln2
    // per source (replayed numerically below rather than on paper)
    val disj = Seq(("a", "x x y y"), ("b", "u u v v")).toDF("source", "text")
    val rd = Curation.sourceDriftReport(disj, "source", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val p = 0.5; val q = 0.25 // per own word: 2 of 4 source tokens, 2 of 8 corpus tokens
    val inSum = 2 * 0.5 * (p * math.log(2 * p / (p + q)) + q * math.log(2 * q / (p + q)))
    val expected = BigDecimal(inSum + 0.5 * math.log(2.0) * (1 - 2 * q))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rd.foreach { case (src, nt, nw, js) =>
      assert(nt == 4L && nw == 2L, s"$src totals")
      assert(math.abs(js - expected) < 1e-6, s"$src js=$js expected=$expected")
    }
    // real corpus: every source's drift is in (0, ln 2)
    val real = Curation.sourceDriftReport(docs, "source", "text").collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      val js = r.getDouble(3)
      assert(js > 0.0 && js < math.log(2.0), s"${r.getString(0)} js=$js out of range")
    }
  }

  test("temperatureMix: α=1 reproduces uniform rates, α<1 lifts small sources") {
    val total = docs.count()
    // α = 1: every source's rate is total_target/N — a uniform thin.
    val uniform = Curation.temperatureMix(docs, "doc_id", "source", 1.0, total)
    assert(uniform.count() == total, "rate 1 must keep everything")
    val sel = Curation.temperatureMix(docs, "doc_id", "source", 0.5, 200L)
    val n = sel.count()
    assert(n > 100 && n < 320, s"realized size $n should concentrate near 200")
    // Flattening needs skew (the parquet fixture's sources are equal
    // sized): 900 docs in 'big', 100 in 'small'. At α=0.5 the rate
    // ratio small:big is √9 = 3 — the small source's selected FRACTION
    // must come out clearly higher.
    val s = spark
    import s.implicits._
    val skewed = (0 until 1000)
      .map(i => (i.toLong, if (i < 900) "big" else "small"))
      .toDF("doc_id", "source")
    val pick = Curation.temperatureMix(skewed, "doc_id", "source", 0.5, 300L)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fBig = pick.getOrElse("big", 0L).toDouble / 900
    val fSmall = pick.getOrElse("small", 0L).toDouble / 100
    assert(fSmall > 1.5 * fBig, s"small=$fSmall big=$fBig")
  }

  test("temperatureMix excludes null-source rows instead of crashing") {
    val s = spark
    import s.implicits._
    val withNulls = Seq(
      (1L, "a"), (2L, "a"), (3L, null.asInstanceOf[String]), (4L, "b"))
      .toDF("doc_id", "source")
    val out = Curation.temperatureMix(withNulls, "doc_id", "source", 0.5, 4L)
    assert(!out.select("doc_id").collect().map(_.getLong(0)).contains(3L))
  }

  test("applyMixRates drops rows whose source is absent from the census") {
    // The streaming path screens with rates learned on a batch census;
    // a source that appears only after the census must be DROPPED, not
    // passed unscreened (a NaN fold default would invert this: Spark
    // orders NaN above every double, so u < NaN is TRUE).
    val s = spark
    import s.implicits._
    val screened = Seq(
      (1L, "known"), (2L, "known"),
      (3L, "unseen"), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "source")
    val out = Curation.applyMixRates(
      screened, "doc_id", "source", Seq("known" -> 1.0))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L),
      s"unseen/null sources must be dropped, kept=$out")
  }

  test("temperatureMix selection is deterministic and map-only after the count") {
    val a = Curation.temperatureMix(docs, "doc_id", "source", 0.5, 100L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Curation.temperatureMix(
      docs.repartition(7), "doc_id", "source", 0.5, 100L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    val plan = Curation.temperatureMix(docs, "doc_id", "source", 0.5, 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("apportionBudget: Hamilton seats, integer ties, exact budget sum") {
    val s = spark
    import s.implicits._
    // W=10, budget 7: quotas 3.5/2.1/1.4 -> bases 3/2/1, remainders
    // 5/1/4 -> the one leftover seat goes to the largest remainder.
    val out = Curation.apportionBudget(
        Seq(("a", 5L), ("b", 3L), ("c", 2L)).toDF("k", "w"), "k", "w", 7L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out == Map("a" -> 4L, "b" -> 2L, "c" -> 1L), s"seats: $out")
    // equal weights, equal remainders: the tie is broken by KEY, so
    // the result is a pure function of the input (no partition order)
    val tied = Curation.apportionBudget(
        Seq(("x", 1L), ("y", 1L), ("z", 1L)).toDF("k", "w"), "k", "w", 10L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(tied == Map("x" -> 4L, "y" -> 3L, "z" -> 3L), s"tied: $tied")
    // zero/null weights drop; the allocation still sums EXACTLY
    val mixed = Curation.apportionBudget(
        Seq(("p", 7L), ("q", 0L), ("r", 13L), ("s", 1L))
          .toDF("k", "w"), "k", "w", 999L)
    assert(mixed.count() == 3)
    assert(mixed.agg(sum("alloc")).collect()(0).getLong(0) == 999L,
      "allocations must sum to the budget exactly")
  }
}
