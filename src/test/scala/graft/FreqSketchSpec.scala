package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FreqSketch.freqSketch

/** Misra–Gries heavy-hitters aggregate: capture guarantee, lower-bound
  * property, partition robustness, SQL registration. */
class FreqSketchSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  /** A skewed stream: "hot" at 60%, "warm" at 25%, tail of rare items. */
  private def stream(parts: Int) = {
    val s = spark
    import s.implicits._
    val items = Seq.fill(600)("hot") ++ Seq.fill(250)("warm") ++
      (1 to 150).map(i => s"rare$i")
    items.toDF("tok").repartition(parts)
  }

  private def summary(parts: Int, k: Int): Map[String, Long] =
    stream(parts)
      .agg(freqSketch(col("tok"), k).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item"), col("e.count_lb"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap

  test("captures every item above N/(k+1) and honors the lower-bound error") {
    for (parts <- Seq(1, 4, 32)) {
      val m = summary(parts, k = 8)
      // N=1000, k=8 → guarantee threshold N/9 ≈ 111: hot and warm must
      // be present regardless of how the stream was partitioned.
      assert(m.contains("hot") && m.contains("warm"), s"parts=$parts: $m")
      assert(m.size <= 8, s"state cap violated: ${m.size}")
      // Lower bounds: never above truth, within N/(k+1) of it.
      assert(m("hot") <= 600L && m("hot") >= 600L - 1000L / 9 - 1)
      assert(m("warm") <= 250L && m("warm") >= 250L - 1000L / 9 - 1)
      m.foreach { case (item, c) =>
        assert(c > 0, s"non-positive counter for $item") }
    }
  }

  test("exact when distinct items fit the counters") {
    val s = spark
    import s.implicits._
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
      .toDF("tok").repartition(3)
    val m = df.agg(freqSketch(col("tok"), 8).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item"), col("e.count_lb"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("a" -> 5L, "b" -> 3L, "c" -> 1L))
  }

  test("grouped sketches stay per-group") {
    val s = spark
    import s.implicits._
    val df = Seq(("g1", "x"), ("g1", "x"), ("g1", "y"), ("g2", "z"))
      .toDF("g", "tok")
    val rows = df.groupBy("g").agg(freqSketch(col("tok"), 4).as("sk"))
      .select(col("g"), explode(col("sk")).as("e"))
      .select(col("g"), col("e.item"), col("e.count_lb"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(rows == Set(("g1", "x", 2L), ("g1", "y", 1L), ("g2", "z", 1L)))
  }

  test("freq_sketch is callable from SQL") {
    val s = spark
    import s.implicits._
    Seq("a", "a", "b").toDF("tok").createOrReplaceTempView("fs_toks")
    val out = s.sql(
      "SELECT freq_sketch(tok, 4) AS sk FROM fs_toks")
      .select(explode(col("sk")).as("e"))
      .select(col("e.item"), col("e.count_lb"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 2L, "b" -> 1L))
  }
}
