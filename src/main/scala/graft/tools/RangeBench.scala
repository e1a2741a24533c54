package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.GraftExtensions

/** Throwaway: BroadcastRangeJoinExec vs BroadcastNestedLoopJoin on a
  * selective inequality (few matches — matching-bound, not output-bound).
  */
object RangeBench {
  def main(args: Array[String]): Unit = {
    def mk(ext: Boolean): SparkSession = {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val b = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
      (if (ext) b.withExtensions(new GraftExtensions) else b).getOrCreate()
    }
    def run(s: SparkSession, label: String): Unit = {
      import s.implicits._
      val l = s.range(200000).select($"id".as("lid"), (rand(1) * 1000 + 10).as("a"))
      val r = s.range(30000).select($"id".as("rid"), (rand(2) * 10).as("b"))
      val j = l.join(r, $"a" < $"b")
      j.count() // warm
      val t0 = System.nanoTime()
      val n = j.count()
      println(f"[rb] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows, " +
        s"exec=${if (j.queryExecution.executedPlan.toString.contains("BroadcastRangeJoin")) "range" else "bnlj"}")
    }
    val plain = mk(ext = false)
    run(plain, "nested-loop")
    plain.stop()
    val extd = mk(ext = true)
    run(extd, "range-join ")
    extd.stop()
  }
}
