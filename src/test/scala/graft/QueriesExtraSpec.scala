package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke coverage for the round-3 corpus widening: every QueriesExtra
  * entry executes at sf0.001 and returns rows, and every entry carries an
  * oracle (exactness is the driver's DuckDB gate; replicated locally by
  * tools/check_oracles.py). */
class QueriesExtraSpec extends AnyFunSuite {

  test("every extra query has a matching oracle entry") {
    assert(QueriesExtra.all.keySet == QueriesExtra.oracles.keySet)
  }

  QueriesExtra.all.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows") {
      val n = fn(TestSpark.spark, TestSpark.sf0001).count()
      assert(n > 0, s"$name returned no rows")
    }
  }
}
