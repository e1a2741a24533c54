package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() returns rows; every queries() entry
  * runs at sf0.001; every oracleSql key has a matching query.
  */
class SparkEntrySuite extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def haveData = new java.io.File(sfDir).isDirectory

  test("entry() yields rows at sf0.001") {
    assume(haveData)
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries twin") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }

  test("all queries run at sf0.001 (schema + execution sanity)") {
    assume(haveData)
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val n = df.count() // executes the full plan
      assert(n >= 0, s"$name failed")
      assert(df.columns.nonEmpty, s"$name has no columns")
    }
  }
}
