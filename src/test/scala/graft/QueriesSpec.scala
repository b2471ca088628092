package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke for every SparkEntry query at sf0.001: runs, yields rows,
  * has stable column names (value-level correctness is the driver's
  * DuckDB oracle gate, replicated locally by tools/check.py).
  */
class QueriesSpec extends AnyFunSuite {
  import SparkSuite._

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
