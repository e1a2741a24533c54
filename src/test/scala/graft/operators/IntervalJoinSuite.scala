package graft.operators

import java.sql.Timestamp
import java.time.Duration

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Interval-overlap join: hand-computed cases, exactly-once bucket
  * attribution (no duplicate pairs regardless of how many buckets an
  * interval spans), cross-check vs the naive overlap predicate.
  */
class IntervalJoinSuite extends SparkSpec {
  import spark.implicits._

  test("numeric overlap, hand-computed") {
    val l = Seq((1, 0.0, 10.0), (2, 20.0, 30.0)).toDF("lid", "s", "e")
    val r = Seq((10, 5.0, 6.0), (20, 9.0, 21.0), (30, 50.0, 60.0)).toDF("rid", "s2", "e2")
    val out = IntervalJoin.numeric(l, r, "s", "e", "s2", "e2", bucketWidth = 10.0)
    assert(rowSet(out.select("lid", "rid")) ==
      Set(Seq("1", "10"), Seq("1", "20"), Seq("2", "20")))
  }

  test("touching endpoints count as overlap (closed intervals)") {
    val l = Seq((1, 0.0, 5.0)).toDF("lid", "s", "e")
    val r = Seq((10, 5.0, 9.0)).toDF("rid", "s2", "e2")
    val out = IntervalJoin.numeric(l, r, "s", "e", "s2", "e2", bucketWidth = 2.0)
    assert(out.count() == 1)
  }

  test("exactly one output row per overlapping pair even when many buckets are shared") {
    // intervals spanning ~50 buckets each; naive bucket join would emit
    // the pair once per shared bucket without the anchor condition
    val l = Seq((1, 0.0, 100.0)).toDF("lid", "s", "e")
    val r = Seq((10, 1.0, 99.0), (20, 50.0, 200.0)).toDF("rid", "s2", "e2")
    val out = IntervalJoin.numeric(l, r, "s", "e", "s2", "e2", bucketWidth = 2.0)
    assert(out.count() == 2)
  }

  test("property: bucketed == naive overlap join (seeded random, several widths)") {
    val rnd = new scala.util.Random(13)
    val l = (0 until 60).map { i =>
      val s = rnd.nextDouble() * 100; (i, s, s + rnd.nextDouble() * 15)
    }.toDF("lid", "s", "e")
    val r = (0 until 60).map { i =>
      val s = rnd.nextDouble() * 100; (i, s, s + rnd.nextDouble() * 15)
    }.toDF("rid", "s2", "e2")
    val naive = l.join(r, col("s") <= col("e2") && col("s2") <= col("e"))
    for (wdt <- Seq(0.5, 7.0, 40.0)) {
      val fast = IntervalJoin.numeric(l, r, "s", "e", "s2", "e2", bucketWidth = wdt)
      assert(rowSet(fast.select("lid", "rid")) == rowSet(naive.select("lid", "rid")),
        s"mismatch at bucketWidth=$wdt")
    }
  }

  test("timestamp intervals with Duration bucket width") {
    def ts(s: String) = Timestamp.valueOf(s)
    val l = Seq((1, ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00")))
      .toDF("lid", "s", "e")
    val r = Seq(
      (10, ts("2024-01-01 01:00:00"), ts("2024-01-01 03:00:00")),
      (20, ts("2024-01-01 05:00:00"), ts("2024-01-01 06:00:00"))).toDF("rid", "s2", "e2")
    val out = IntervalJoin.time(l, r, "s", "e", "s2", "e2", Duration.ofHours(1))
    assert(rowSet(out.select("lid", "rid")) == Set(Seq("1", "10")))
  }

  test("overlapping output columns are suffixed") {
    val l = Seq((1, 0.0, 10.0)).toDF("id", "s", "e")
    val r = Seq((2, 5.0, 15.0)).toDF("id", "s", "e")
    val out = IntervalJoin.numeric(l, r, "s", "e", "s", "e", bucketWidth = 10.0)
    assert(out.columns.toSeq == Seq("id_x", "s_x", "e_x", "id_y", "s_y", "e_y"))
    assert(out.count() == 1)
  }

  test("null bounds are dropped") {
    val l = Seq((1, Some(0.0), Some(10.0)), (2, None, Some(5.0))).toDF("lid", "s", "e")
    val r = Seq((10, Some(1.0), Some(2.0))).toDF("rid", "s2", "e2")
    val out = IntervalJoin.numeric(l, r, "s", "e", "s2", "e2", bucketWidth = 5.0)
    assert(rowSet(out.select("lid", "rid")) == Set(Seq("1", "10")))
  }
}
