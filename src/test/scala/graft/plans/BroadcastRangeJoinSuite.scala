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

  test("salted sub-slots: exactly-once under a hot right key (multiset compare)") {
    // >50% of the right rows share ONE key, so SaltedRangePartitioning
    // assigns that bucket multiple sub-slots; every qualifying pair must
    // still appear exactly once — including pairs from FULLY identical
    // right rows, which the round-robin salt spreads across slots
    val ldata = (0 until 300).map(i => (i, i.toDouble / 3))
    val rdata = (0 until 200).map(i => (i, if (i % 2 == 0) 42.0 else i.toDouble)) ++
      Seq((999, 42.0), (999, 42.0)) // identical rows: pair count must be 2
    val expected = (for { (lid, a) <- ldata; (rid, b) <- rdata; if a < b }
      yield (lid, rid)).groupBy(identity).view.mapValues(_.size.toLong).toMap
    withStrategy { s =>
      import s.implicits._
      val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
      try {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val j = ldata.toDF("lid", "a").join(rdata.toDF("rid", "b"), col("a") < col("b"))
        assert(j.queryExecution.executedPlan.toString.contains("ShuffledRangeJoin"))
        val got = j.groupBy("lid", "rid").count().collect()
          .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
        assert(got == expected)
      } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("SaltedRangePartitioning gives a hot key proportional sub-slots") {
    withStrategy { s =>
      import org.apache.spark.sql.catalyst.InternalRow
      // 50% of the mass on one key -> its bucket should get ~p/2 slots
      val keys = s.sparkContext.parallelize(
        (0 until 10000).map(i =>
          (if (i % 2 == 0) 500.0 else i.toDouble): Any), 8)
        .map(k => (k, null: InternalRow))
      implicit val ord: Ordering[Any] =
        org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(
          org.apache.spark.sql.types.DoubleType)
      val part = new SaltedRangePartitioning(keys, 32)
      val hot = part.bucketOf(500.0)
      assert(part.sizes(hot) >= 8,
        s"hot bucket got ${part.sizes(hot)} slots of ${part.numPartitions}")
      // round-robin salt actually reaches every slot of the hot bucket
      val slots = (0 until 200).map(c => part.slotOf(500.0, c)).distinct
      assert(slots.size == part.sizes(hot))
      // left fan-out (ascending) covers exactly the suffix of slots
      val r = part.leftSlotRange(400.0, ascending = true)
      assert(r.last == part.numPartitions - 1 && r.nonEmpty)
      // a balanced distribution degenerates to one slot per bucket
      val uniform = s.sparkContext.parallelize(
        (0 until 10000).map(i => (i.toDouble: Any)), 8)
        .map(k => (k, null: InternalRow))
      val upart = new SaltedRangePartitioning(uniform, 32)
      assert(upart.maxSlots <= 2, s"uniform keys salted to ${upart.maxSlots} slots")
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
