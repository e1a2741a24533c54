package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Custom broadcast range-join exec: plan shape under the strategy,
  * result equivalence with Catalyst's nested loop across operators and
  * types, residual conjuncts, null keys, fallback conditions.
  */
class BroadcastRangeJoinSuite extends SparkSpec {
  import spark.implicits._

  private def withStrategy[T](f: SparkSession => T): T = {
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      f(s2)
    } finally {
      SparkSession.setActiveSession(orig)
      SparkSession.setDefaultSession(orig)
    }
  }

  test("inequality join plans as BroadcastRangeJoinExec under the extension") {
    withStrategy { s =>
      import s.implicits._
      val l = (0 until 100).map(i => (i, i * 1.0)).toDF("lid", "a")
      val r = (0 until 50).map(i => (i, i * 2.0)).toDF("rid", "b")
      val j = l.join(r, col("a") < col("b"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastRangeJoin"), plan.take(600))
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
    }
  }

  test("all four operators match the nested-loop results (seeded random doubles)") {
    val rnd = new scala.util.Random(21)
    val ldata = (0 until 80).map(i => (i, rnd.nextDouble() * 100))
    val rdata = (0 until 60).map(i => (i, rnd.nextDouble() * 100))
    val expected = {
      val l = ldata.toDF("lid", "a")
      val r = rdata.toDF("rid", "b")
      Map(
        "<" -> rowSet(l.join(r, col("a") < col("b")).select("lid", "rid")),
        "<=" -> rowSet(l.join(r, col("a") <= col("b")).select("lid", "rid")),
        ">=" -> rowSet(l.join(r, col("a") >= col("b")).select("lid", "rid")),
        ">" -> rowSet(l.join(r, col("a") > col("b")).select("lid", "rid")))
    }
    withStrategy { s =>
      import s.implicits._
      val l = ldata.toDF("lid", "a")
      val r = rdata.toDF("rid", "b")
      def run(c: org.apache.spark.sql.Column) = c
      for ((op, want) <- expected) {
        val cond = op match {
          case "<" => col("a") < col("b")
          case "<=" => col("a") <= col("b")
          case ">=" => col("a") >= col("b")
          case ">" => col("a") > col("b")
        }
        val j = l.join(r, cond)
        assert(j.queryExecution.executedPlan.toString.contains("BroadcastRangeJoin"))
        assert(rowSet(j.select("lid", "rid")) == want, s"op $op")
      }
    }
  }

  test("swapped condition sides mirror the operator") {
    withStrategy { s =>
      import s.implicits._
      val l = Seq((1, 10), (2, 20)).toDF("lid", "a")
      val r = Seq((10, 15)).toDF("rid", "b")
      // b > a  <=>  a < b
      val j = l.join(r, col("b") > col("a"))
      assert(j.queryExecution.executedPlan.toString.contains("BroadcastRangeJoin"))
      assert(rowSet(j.select("lid", "rid")) == Set(Seq("1", "10")))
    }
  }

  test("residual conjuncts are applied on top of the range match") {
    withStrategy { s =>
      import s.implicits._
      val l = Seq((1, 10), (2, 20), (3, 30)).toDF("lid", "a")
      val r = Seq((10, 25, "x"), (20, 25, "y")).toDF("rid", "b", "tag")
      val j = l.join(r, col("a") < col("b") && col("tag") === "x")
      assert(j.queryExecution.executedPlan.toString.contains("BroadcastRangeJoin"))
      assert(rowSet(j.select("lid", "rid")) == Set(Seq("1", "10"), Seq("2", "10")))
    }
  }

  test("string keys order correctly") {
    withStrategy { s =>
      import s.implicits._
      val l = Seq((1, "apple"), (2, "pear")).toDF("lid", "k")
      val r = Seq((10, "banana")).toDF("rid", "k2")
      val j = l.join(r, col("k") < col("k2"))
      assert(j.queryExecution.executedPlan.toString.contains("BroadcastRangeJoin"))
      assert(rowSet(j.select("lid", "rid")) == Set(Seq("1", "10")))
    }
  }

  test("null keys on either side never match") {
    withStrategy { s =>
      import s.implicits._
      val l = Seq((1, Some(10)), (2, None)).toDF("lid", "a")
      val r = Seq((10, Some(15)), (20, None)).toDF("rid", "b")
      val j = l.join(r, col("a") < col("b"))
      assert(rowSet(j.select("lid", "rid")) == Set(Seq("1", "10")))
    }
  }

  test("equi-conjunct joins are left to the hash join") {
    withStrategy { s =>
      import s.implicits._
      val l = Seq((1, 1, 10)).toDF("lid", "k", "a")
      val r = Seq((10, 1, 20)).toDF("rid", "k2", "b")
      val j = l.join(r, col("k") === col("k2") && col("a") < col("b"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastRangeJoin"), plan.take(400))
      assert(j.count() == 1)
    }
  }

  test("IneqJoin operator rides the custom exec under the extension") {
    withStrategy { s =>
      import s.implicits._
      val l = Seq((1, 10), (2, 20), (3, 30)).toDF("lid", "a")
      val r = Seq((10, 15), (20, 25)).toDF("rid", "b")
      val j = graft.operators.IneqJoin(l, r, "<",
        leftOn = Some("a"), rightOn = Some("b"), prune = false)
      assert(j.queryExecution.executedPlan.toString.contains("BroadcastRangeJoin"))
      assert(rowSet(j.select("lid", "rid")) == Set(
        Seq("1", "10"), Seq("1", "20"), Seq("2", "20")))
    }
  }
}
