package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke-level contract checks for the driver harness: every query runs on
  * sf0.001 and returns rows; every oracle key has a query; entry() works.
  * (Value-level oracle checks run in the driver's DuckDB harness; the local
  * emulation lives in tools/check_oracle.py.)
  */
class QueriesSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle entries without queries: $extra")
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs and returns rows on sf0.001") {
      val n = fn(spark, dir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }
}
