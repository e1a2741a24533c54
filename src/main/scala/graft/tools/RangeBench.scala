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

/** Large-scale / skew evidence for ShuffledRangeJoinExec: 5M x 1M
  * selective inequality (barely-overlapping ranges) where the
  * 5e12-comparison nested loop is infeasible, plus a worst-case skew run
  * (half the right keys identical — SaltedRangePartitioning spreads the
  * hot key's bucket over proportional sub-slots; before salting this
  * case ran 2.5× the uniform per-row cost, after it is at parity).
  */
object RangeBenchLarge {
  def main(args: Array[String]): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._
    def time(label: String)(f: => Long): Unit = (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = f
      println(f"[rbl] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    // selective: right values sit almost entirely below the left range,
    // so l < r matches only at the overlap sliver
    val l = s.range(5000000).select($"id".as("lid"), (rand(1) * 1e9).as("a"))
      .localCheckpoint(true)
    val r = s.range(1000000).select($"id".as("rid"), (rand(2) * 2e6 - 1.99e6).as("b"))
      .localCheckpoint(true)
    val j = l.join(r, $"a" < $"b")
    assert(j.queryExecution.executedPlan.toString.contains("ShuffledRangeJoin"))
    time("5M x 1M selective shuffled")(j.count())
    // output-bound regime: right range centered inside the left range
    val r2 = s.range(1000000).select($"id".as("rid"), (rand(2) * 2e6 - 1e6).as("b"))
      .localCheckpoint(true)
    time("5M x 1M output-bound      ")(l.join(r2, $"a" < $"b").count())
    // skew: half the right side shares ONE key value
    val rs = s.range(1000000).select($"id".as("rid"),
      org.apache.spark.sql.functions.when($"id" % 2 === 0, 5e5).otherwise(rand(3) * 2e6 - 1e6).as("b"))
      .localCheckpoint(true)
    val js = l.join(rs, $"a" < $"b")
    time("5M x 1M skewed shuffled  ")(js.count())
    s.stop()
  }
}
