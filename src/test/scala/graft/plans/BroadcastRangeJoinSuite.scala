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

  test("non-broadcastable right side plans as ShuffledRangeJoinExec") {
    withStrategy { s =>
      import s.implicits._
      val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
      try {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val l = (0 until 100).map(i => (i, i * 1.0)).toDF("lid", "a")
        val r = (0 until 50).map(i => (i, i * 2.0)).toDF("rid", "b")
        val j = l.join(r, col("a") < col("b"))
        val plan = j.queryExecution.executedPlan.toString
        assert(plan.contains("ShuffledRangeJoin"), plan.take(600))
        assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
      } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("shuffled range join matches the nested-loop results for all operators") {
    val rnd = new scala.util.Random(33)
    val ldata = (0 until 90).map(i => (i, rnd.nextDouble() * 100))
    val rdata = (0 until 70).map(i => (i, rnd.nextDouble() * 100))
    val expected = {
      val l = ldata.toDF("lid", "a")
      val r = rdata.toDF("rid", "b")
      Seq("<", "<=", ">=", ">").map { op =>
        op -> rowSet(l.join(r, condOf(op)).select("lid", "rid"))
      }.toMap
    }
    withStrategy { s =>
      import s.implicits._
      val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
      try {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val l = ldata.toDF("lid", "a")
        val r = rdata.toDF("rid", "b")
        for ((op, want) <- expected) {
          val j = l.join(r, condOf(op))
          assert(j.queryExecution.executedPlan.toString.contains("ShuffledRangeJoin"))
          assert(rowSet(j.select("lid", "rid")) == want, s"op $op")
        }
      } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("shuffled range join: residuals, null keys, string keys, duplicates") {
    withStrategy { s =>
      import s.implicits._
      val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
      try {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val l = Seq((1, Some("aa")), (2, Some("mm")), (3, None), (4, Some("aa")))
          .toDF("lid", "k")
        val r = Seq((10, Some("bb"), 1), (20, Some("zz"), 0), (30, None, 1))
          .toDF("rid", "k2", "keep")
        val j = l.join(r, col("k") < col("k2") && col("keep") === 1)
        assert(j.queryExecution.executedPlan.toString.contains("ShuffledRangeJoin"))
        // duplicates expand, nulls drop, residual keeps only rid=10
        assert(rowSet(j.select("lid", "rid")) ==
          Set(Seq("1", "10"), Seq("4", "10")))
      } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("shuffled range join stays correct under heavy duplicate keys (skew)") {
    // range partitioning cannot split equal keys — a hot key lands in
    // one partition; slower, but every pair must still appear exactly once
    val ldata = (0 until 200).map(i => (i, if (i % 2 == 0) 50.0 else i.toDouble))
    val rdata = (0 until 100).map(i => (i, if (i % 3 == 0) 50.0 else i * 2.0))
    val expected = (for {
      (lid, a) <- ldata; (rid, b) <- rdata; if a < b
    } yield Seq(lid.toString, rid.toString)).toSet
    withStrategy { s =>
      import s.implicits._
      val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
      try {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val j = ldata.toDF("lid", "a").join(rdata.toDF("rid", "b"), col("a") < col("b"))
        assert(j.queryExecution.executedPlan.toString.contains("ShuffledRangeJoin"))
        assert(rowSet(j.select("lid", "rid")) == expected)
      } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("small LEFT side broadcasts swapped (no shuffle, original column order)") {
    withStrategy { s =>
      import s.implicits._
      // leave the threshold at default: both sides are tiny, but the
      // strategy prefers broadcast-right; force the left-swap arm by
      // making only the right side exceed the threshold
      val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
      try {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "2048")
        val l = Seq((1, 10), (2, 20)).toDF("lid", "a") // tiny
        val r = (0 until 2000).map(i => (i, i % 40, f"pad$i%06d" * 4)).toDF("rid", "b", "pad")
        val j = l.join(r, col("a") < col("b"))
        val plan = j.queryExecution.executedPlan.toString
        assert(plan.contains("BroadcastRangeJoin"), plan.take(800))
        assert(j.columns.toSeq == Seq("lid", "a", "rid", "b", "pad"))
        val expected = (for {
          (lid, a) <- Seq((1, 10), (2, 20)); i <- 0 until 2000; if a < i % 40
        } yield Seq(lid.toString, i.toString)).toSet
        assert(rowSet(j.select("lid", "rid")) == expected)
      } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  private def condOf(op: String): org.apache.spark.sql.Column = op match {
    case "<" => col("a") < col("b")
    case "<=" => col("a") <= col("b")
    case ">=" => col("a") >= col("b")
    case ">" => col("a") > col("b")
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
