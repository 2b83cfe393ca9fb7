package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the pure hashing/counting kernel (SURVEY §5:
  * property tests for hash determinism/sensitivity). The scalatest
  * interop artifact isn't in the offline cache, so generators are
  * sampled with fixed seeds — deterministic across runs. */
class PropertySpec extends AnyFunSuite {

  private def forAll[T](gen: Gen[T], n: Int = 100)(f: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body

  private val schema = StructType(Seq(
    StructField("a", IntegerType), StructField("b", StringType)))

  private val rowsGen: Gen[List[(Int, String)]] =
    Gen.listOfN(8, Gen.zip(Gen.chooseNum(-1000, 1000), Gen.alphaNumStr))

  test("hashRows is deterministic and 32-hex") {
    forAll(rowsGen) { data =>
      val rows = data.map { case (a, b) => Row(a, b) }
      val h1 = DirectData.hashRows(rows, schema)
      val h2 = DirectData.hashRows(rows, schema)
      assert(h1 == h2)
      assert(h1.matches("[a-f0-9]{32}"))
    }
  }

  test("any single-cell perturbation changes the hash") {
    forAll(rowsGen, Gen.chooseNum(0, 7)) { (data, idx) =>
      whenever(data.nonEmpty) {
        val rows = data.map { case (a, b) => Row(a, b) }
        val i = idx % data.size
        val perturbed = rows.updated(i, Row(rows(i).getInt(0) + 1, rows(i).getString(1)))
        assert(DirectData.hashRows(rows, schema) !=
          DirectData.hashRows(perturbed, schema))
      }
    }
  }

  test("row order is part of the identity") {
    forAll(rowsGen) { data =>
      whenever(data.distinct.size > 1) {
        val rows = data.map { case (a, b) => Row(a, b) }
        val reversed = rows.reverse
        if (rows != reversed)
          assert(DirectData.hashRows(rows, schema) !=
            DirectData.hashRows(reversed, schema))
      }
    }
  }

  test("countOcc matches a sliding-window reference implementation") {
    val strGen = Gen.listOfN(30, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    val subGen = Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    forAll(strGen, subGen) { (s, sub) =>
      // Python str.count semantics: non-overlapping left-to-right
      var i = 0; var n = 0
      while ({ val j = s.indexOf(sub, i); if (j >= 0) { n += 1; i = j + sub.length }; j >= 0 }) ()
      assert(Complexity.countOcc(s, sub) == n)
    }
  }

  test("catalog-table pattern finds hashes only under the configured db") {
    val hexGen = Gen.listOfN(32, Gen.oneOf("0123456789abcdef".toSeq)).map(_.mkString)
    forAll(hexGen) { h =>
      val txt = s"Relation spark_catalog.cache_db.$h[x] parquet"
      assert(PlanFingerprint.findCatalogTablePattern(txt, "cache_db").contains(h))
      assert(PlanFingerprint.findCatalogTablePattern(txt, "other_db").isEmpty)
    }
  }
}
