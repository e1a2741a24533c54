package graft.operators

import java.sql.Timestamp
import java.time.Duration

import graft.SparkSpec

/** As-of join (band-join extension, SURVEY.md §2.4): nearest / backward /
  * forward directions, tolerance cutoff, deterministic tie-breaks.
  */
class AsOfJoinSuite extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def clicks = Seq(
    (1, ts("2024-01-01 00:10:00")),
    (2, ts("2024-01-01 01:00:00"))).toDF("cid", "cts")

  private def views = Seq(
    (10, ts("2024-01-01 00:09:00")), // 60s before click 1
    (11, ts("2024-01-01 00:10:30")), // 30s after click 1
    (12, ts("2024-01-01 05:00:00"))  // far from everything
  ).toDF("vid", "vts")

  test("nearest picks the smallest |delta| within tolerance") {
    val out = AsOfJoin.time(clicks, views, Duration.ofMinutes(2), rightId = "vid",
      leftOn = Some("cts"), rightOn = Some("vts"))
    assert(rowSet(out.select("cid", "vid")) == Set(Seq("1", "11")))
  }

  test("backward only matches right rows at or before the left timestamp") {
    val out = AsOfJoin.time(clicks, views, Duration.ofMinutes(2), rightId = "vid",
      leftOn = Some("cts"), rightOn = Some("vts"), direction = "backward")
    assert(rowSet(out.select("cid", "vid")) == Set(Seq("1", "10")))
  }

  test("forward only matches right rows at or after the left timestamp") {
    val out = AsOfJoin.time(clicks, views, Duration.ofMinutes(2), rightId = "vid",
      leftOn = Some("cts"), rightOn = Some("vts"), direction = "forward")
    assert(rowSet(out.select("cid", "vid")) == Set(Seq("1", "11")))
  }

  test("left rows with no candidate in band are dropped (inner as-of)") {
    val out = AsOfJoin.time(clicks, views, Duration.ofMinutes(2), rightId = "vid",
      leftOn = Some("cts"), rightOn = Some("vts"))
    assert(out.count() == 1) // click 2 has no view within 2 minutes
  }

  test("exactly one output row per matched left row even with many candidates") {
    val manyViews = (0 until 20)
      .map(i => (100 + i, ts(f"2024-01-01 00:09:${i}%02d")))
      .toDF("vid", "vts")
    val out = AsOfJoin.time(clicks, manyViews, Duration.ofMinutes(5), rightId = "vid",
      leftOn = Some("cts"), rightOn = Some("vts"))
    assert(out.count() == 1)
    // nearest candidate is 00:09:19 (41s before 00:10:00) -> vid 119
    assert(rowSet(out.select("cid", "vid")) == Set(Seq("1", "119")))
  }

  test("tie on |delta| breaks to the earlier right timestamp") {
    val tied = Seq(
      (50, ts("2024-01-01 00:09:30")), // 30s before
      (51, ts("2024-01-01 00:10:30"))  // 30s after
    ).toDF("vid", "vts")
    val out = AsOfJoin.time(clicks.filter($"cid" === 1), tied,
      Duration.ofMinutes(2), rightId = "vid",
      leftOn = Some("cts"), rightOn = Some("vts"))
    assert(rowSet(out.select("cid", "vid")) == Set(Seq("1", "50")))
  }

  test("invalid direction raises") {
    intercept[IllegalArgumentException] {
      AsOfJoin.time(clicks, views, Duration.ofMinutes(2), rightId = "vid",
        leftOn = Some("cts"), rightOn = Some("vts"), direction = "sideways")
    }
  }

  // ---- unbounded (merge_asof shape) ----------------------------------

  private def unboundedExpected(
      ls: Seq[(Int, Int)], rs: Seq[(Int, Int)], backward: Boolean): Set[Seq[String]] =
    ls.flatMap { case (lid, v) =>
      val cand =
        if (backward) rs.filter(_._2 <= v) else rs.filter(_._2 >= v)
      if (cand.isEmpty) None
      else {
        val bestW = if (backward) cand.map(_._2).max else cand.map(_._2).min
        val ties = cand.filter(_._2 == bestW).map(_._1)
        // ts tie: backward keeps the LARGEST rightId, forward the smallest
        val rid = if (backward) ties.max else ties.min
        Some(Seq(lid.toString, rid.toString))
      }
    }.toSet

  test("unbounded backward: latest right at-or-before each left row, across partitions") {
    val rnd = new scala.util.Random(11)
    val ls = (0 until 60).map(i => (i, rnd.nextInt(1000)))
    val rs = (0 until 25).map(i => (1000 + i, rnd.nextInt(1000)))
    val out = AsOfJoin.unbounded(
      ls.toDF("lid", "v"), rs.toDF("rid", "w"), rightId = "rid",
      leftOn = Some("v"), rightOn = Some("w"))
    assert(rowSet(out.select("lid", "rid")) == unboundedExpected(ls, rs, backward = true))
  }

  test("unbounded forward: earliest right at-or-after, min-id tie break") {
    val ls = Seq((1, 10), (2, 55), (3, 97), (4, 200))
    val rs = Seq((10, 50), (11, 50), (12, 98))
    val out = AsOfJoin.unbounded(
      ls.toDF("lid", "v"), rs.toDF("rid", "w"), rightId = "rid",
      leftOn = Some("v"), rightOn = Some("w"), direction = "forward")
    // lid 4 has no following right row -> dropped (inner)
    assert(rowSet(out.select("lid", "rid")) ==
      Set(Seq("1", "10"), Seq("2", "12"), Seq("3", "12")))
  }

  test("unbounded: heavy timestamp duplication across partitions, both directions") {
    // only ~20 distinct ts values over 180 rows: range-partition bounds
    // fall ON duplicated timestamps, which is exactly where a (ts, tag)
    // partitioning would split right rows from left rows at equal ts
    // and lose forward equal-ts matches
    val rnd = new scala.util.Random(23)
    val ls = (0 until 120).map(i => (i, rnd.nextInt(20) * 10))
    val rs = (0 until 60).map(i => (1000 + i, rnd.nextInt(20) * 10))
    for (dir <- Seq("backward", "forward")) {
      val out = AsOfJoin.unbounded(
        ls.toDF("lid", "v"), rs.toDF("rid", "w"), rightId = "rid",
        leftOn = Some("v"), rightOn = Some("w"), direction = dir)
      assert(rowSet(out.select("lid", "rid")) ==
        unboundedExpected(ls, rs, backward = dir == "backward"), s"direction $dir")
    }
  }

  test("unbounded: equal timestamps are inclusive, backward tie keeps max id") {
    val ls = Seq((1, 50))
    val rs = Seq((10, 50), (11, 50), (12, 40))
    val out = AsOfJoin.unbounded(
      ls.toDF("lid", "v"), rs.toDF("rid", "w"), rightId = "rid",
      leftOn = Some("v"), rightOn = Some("w"))
    assert(rowSet(out.select("lid", "rid")) == Set(Seq("1", "11")))
  }

  test("unbounded: carry crosses partitions when all rights precede all lefts") {
    // rights cluster at tiny values, lefts at large — with 4 shuffle
    // partitions the match for every left row lives in an earlier range
    // partition, so only the carry can supply it
    val rs = (0 until 8).map(i => (100 + i, i))
    val ls = (0 until 40).map(i => (i, 10000 + i))
    val out = AsOfJoin.unbounded(
      ls.toDF("lid", "v"), rs.toDF("rid", "w"), rightId = "rid",
      leftOn = Some("v"), rightOn = Some("w"))
    assert(out.count() == 40)
    // every left matches the globally-latest right (rid 107, w=7)
    assert(out.select("rid").distinct().collect().map(_.getInt(0)).toSeq == Seq(107))
  }

  test("unbounded: timestamps work end to end (type-generic join column)") {
    val ls = Seq((1, Timestamp.valueOf("2024-01-01 10:00:30")),
      (2, Timestamp.valueOf("2024-01-01 09:00:00"))).toDF("lid", "cts")
    val rs = Seq((10, Timestamp.valueOf("2024-01-01 10:00:00")),
      (11, Timestamp.valueOf("2024-01-01 09:30:00"))).toDF("rid", "vts")
    val out = AsOfJoin.unbounded(ls, rs, rightId = "rid",
      leftOn = Some("cts"), rightOn = Some("vts"))
    // click at 09:00 precedes every view -> dropped
    assert(rowSet(out.select("lid", "rid")) == Set(Seq("1", "10")))
  }

  // ---- grouped (merge_asof by=...) -----------------------------------

  private def groupedExpected(
      ls: Seq[(Int, String, Int)], rs: Seq[(Int, String, Int)],
      backward: Boolean): Set[Seq[String]] =
    ls.flatMap { case (lid, g, v) =>
      val cand = rs.filter(r => r._2 == g &&
        (if (backward) r._3 <= v else r._3 >= v))
      if (cand.isEmpty) None
      else {
        val bestW = if (backward) cand.map(_._3).max else cand.map(_._3).min
        val ties = cand.filter(_._3 == bestW).map(_._1)
        Some(Seq(lid.toString, (if (backward) ties.max else ties.min).toString))
      }
    }.toSet

  test("unbounded by-key: matches stay inside the group, both directions") {
    val rnd = new scala.util.Random(23)
    val groups = Vector("a", "b", "c", "d")
    // duplicated values across groups so an ungrouped join WOULD cross
    // keys; 32 shuffle partitions over 120 rows force most groups to
    // span partition boundaries, exercising the per-group carry
    val ls = (0 until 80).map(i => (i, groups(rnd.nextInt(4)), rnd.nextInt(300)))
    val rs = (0 until 40).map(i => (1000 + i, groups(rnd.nextInt(4)), rnd.nextInt(300)))
    val ldf = ls.toDF("lid", "g", "v")
    val rdf = rs.toDF("rid", "g", "w")
    val back = AsOfJoin.unbounded(ldf, rdf, rightId = "rid",
      leftOn = Some("v"), rightOn = Some("w"), by = Seq("g"))
    assert(rowSet(back.select("lid", "rid")) == groupedExpected(ls, rs, backward = true))
    // group key comes out suffixed on both sides (standard header rules)
    assert(back.columns.contains("g_x") && back.columns.contains("g_y"))
    assert(back.filter($"g_x" =!= $"g_y").count() == 0)
    val fwd = AsOfJoin.unbounded(ldf, rdf, rightId = "rid",
      leftOn = Some("v"), rightOn = Some("w"), direction = "forward", by = Seq("g"))
    assert(rowSet(fwd.select("lid", "rid")) == groupedExpected(ls, rs, backward = false))
  }

  test("unbounded by-key: carry crosses partitions inside one group only") {
    // group "hot" has all rights at small values and lefts at large
    // values (carry must supply every match); group "cold" has NO right
    // rows at all — its lefts must drop, never borrow hot's carry
    val rs = (0 until 6).map(i => (100 + i, "hot", i))
    val ls = (0 until 30).map(i => (i, if (i % 2 == 0) "hot" else "cold", 10000 + i))
    val out = AsOfJoin.unbounded(
      ls.toDF("lid", "g", "v"), rs.toDF("rid", "g", "w"), rightId = "rid",
      leftOn = Some("v"), rightOn = Some("w"), by = Seq("g"))
    val got = out.select("lid", "rid").collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(got.length == 15 && got.forall(_._1 % 2 == 0))
    assert(got.map(_._2).distinct.toSeq == Seq(105)) // latest hot right
  }

  test("time by-key: tolerance matches stay inside the group; nulls drop") {
    val clicks = Seq(
      (1, "u1", ts("2024-01-01 00:10:00")),
      (2, "u2", ts("2024-01-01 00:10:00")),
      (3, null.asInstanceOf[String], ts("2024-01-01 00:10:00"))
    ).toDF("cid", "user", "cts")
    val views = Seq(
      (10, "u1", ts("2024-01-01 00:09:00")),
      (11, "u2", ts("2024-01-01 00:10:30")),
      (12, null.asInstanceOf[String], ts("2024-01-01 00:10:00"))
    ).toDF("vid", "user", "vts")
    val out = AsOfJoin.time(clicks, views, Duration.ofMinutes(2), rightId = "vid",
      leftOn = Some("cts"), rightOn = Some("vts"), by = Seq("user"))
    // u1 click matches ONLY u1's view (ungrouped would pick vid 12 at
    // zero delta); null keys never match anything
    assert(rowSet(out.select("cid", "vid")) == Set(Seq("1", "10"), Seq("2", "11")))
  }

  test("time left: unmatched left rows survive once with null right columns") {
    val out = AsOfJoin.time(clicks, views, Duration.ofMinutes(2), rightId = "vid",
      leftOn = Some("cts"), rightOn = Some("vts"), joinType = "left")
    assert(out.count() == clicks.count()) // pandas merge_asof: |out| == |left|
    assert(rowSet(out.select("cid", "vid")) == Set(Seq("1", "11"), Seq("2", "null")))
  }

  test("time left: null-timestamp left rows survive (inner drops them)") {
    val withNull = clicks.unionByName(
      Seq((3, null.asInstanceOf[Timestamp])).toDF("cid", "cts"))
    val inner = AsOfJoin.time(withNull, views, Duration.ofMinutes(2), rightId = "vid",
      leftOn = Some("cts"), rightOn = Some("vts"))
    assert(inner.filter($"cid" === 3).count() == 0)
    val lout = AsOfJoin.time(withNull, views, Duration.ofMinutes(2), rightId = "vid",
      leftOn = Some("cts"), rightOn = Some("vts"), joinType = "left")
    assert(lout.count() == 3)
    assert(rowSet(lout.filter($"cid" === 3).select("cid", "vid")) == Set(Seq("3", "null")))
  }

  test("time left by-key: null-key and unmatched-group left rows survive with nulls") {
    val clicks3 = Seq(
      (1, "u1", ts("2024-01-01 00:10:00")),
      (2, "u9", ts("2024-01-01 00:10:00")), // no u9 views at all
      (3, null.asInstanceOf[String], ts("2024-01-01 00:10:00"))
    ).toDF("cid", "user", "cts")
    val views3 = Seq(
      (10, "u1", ts("2024-01-01 00:09:00")),
      (12, null.asInstanceOf[String], ts("2024-01-01 00:10:00"))
    ).toDF("vid", "user", "vts")
    val out = AsOfJoin.time(clicks3, views3, Duration.ofMinutes(2), rightId = "vid",
      leftOn = Some("cts"), rightOn = Some("vts"), by = Seq("user"),
      joinType = "left")
    assert(out.count() == 3)
    assert(rowSet(out.select("cid", "vid")) ==
      Set(Seq("1", "10"), Seq("2", "null"), Seq("3", "null")))
  }

  test("unbounded left: every left row survives; matched subset == inner") {
    val rnd = new scala.util.Random(31)
    val ls = (0 until 60).map(i => (i, rnd.nextInt(1000)))
    val rs = (0 until 10).map(i => (1000 + i, 400 + rnd.nextInt(600)))
    for (dir <- Seq("backward", "forward")) {
      val out = AsOfJoin.unbounded(
        ls.toDF("lid", "v"), rs.toDF("rid", "w"), rightId = "rid",
        leftOn = Some("v"), rightOn = Some("w"), direction = dir,
        joinType = "left")
      val expected = ls.map { case (lid, _) => lid.toString }.toSet
      assert(out.count() == ls.size)
      val inner = unboundedExpected(ls, rs, backward = dir == "backward")
      val got = rowSet(out.select("lid", "rid"))
      assert(got.filter(_(1) != "null") == inner)
      assert(got.map(_(0)).toSet == expected) // unmatched carry null rid
      assert(got.exists(_(1) == "null"), "fixture must exercise the null leg")
    }
  }

  test("unbounded left by-key: group with no rights keeps its lefts null-filled") {
    // same fixture as the inner carry test: group "cold" has NO right
    // rows — inner drops its lefts, left keeps them with null rid
    val rs = (0 until 6).map(i => (100 + i, "hot", i))
    val ls = (0 until 30).map(i => (i, if (i % 2 == 0) "hot" else "cold", 10000 + i))
    val out = AsOfJoin.unbounded(
      ls.toDF("lid", "g", "v"), rs.toDF("rid", "g", "w"), rightId = "rid",
      leftOn = Some("v"), rightOn = Some("w"), by = Seq("g"), joinType = "left")
    assert(out.count() == 30)
    val got = out.select("lid", "rid").collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) -1 else r.getInt(1)))
    assert(got.filter(_._1 % 2 == 0).map(_._2).distinct.toSeq == Seq(105))
    assert(got.filter(_._1 % 2 == 1).map(_._2).distinct.toSeq == Seq(-1))
  }

  test("unbounded left: null-ts and null-key left rows rejoin with null right columns") {
    val ls = Seq(
      (1, "a", java.lang.Integer.valueOf(10)),
      (2, "a", null.asInstanceOf[java.lang.Integer]),
      (3, null.asInstanceOf[String], java.lang.Integer.valueOf(10))
    ).toDF("lid", "g", "v")
    val rs = Seq((100, "a", 5)).toDF("rid", "g", "w")
    val out = AsOfJoin.unbounded(ls, rs, rightId = "rid",
      leftOn = Some("v"), rightOn = Some("w"), by = Seq("g"), joinType = "left")
    assert(rowSet(out.select("lid", "rid")) ==
      Set(Seq("1", "100"), Seq("2", "null"), Seq("3", "null")))
  }

  test("unbounded nearest: closer directional pick wins, |delta| ties to the preceding") {
    val ls = Seq((1, 10), (2, 55), (3, 97), (4, 300), (5, 50)).toDF("lid", "v")
    // rights at 40 and 60: lid 2 (55) is 15 from 40 and 5 from 60 ->
    // forward; lid 5 (50) is EQUIDISTANT (10 both ways) -> preceding;
    // lid 1 (10) has no preceding -> forward; lid 4 only preceding
    val rs = Seq((100, 40), (101, 60)).toDF("rid", "w")
    val out = AsOfJoin.unbounded(ls, rs, rightId = "rid",
      leftOn = Some("v"), rightOn = Some("w"), direction = "nearest")
    assert(rowSet(out.select("lid", "rid")) ==
      Set(Seq("1", "100"), Seq("2", "101"), Seq("3", "101"),
        Seq("4", "101"), Seq("5", "100")))
  }

  test("unbounded nearest: differential vs scalar oracle across partitions, grouped + left") {
    val rnd = new scala.util.Random(53)
    val groups = Vector("a", "b")
    val ls = (0 until 70).map(i => (i, groups(rnd.nextInt(2)), rnd.nextInt(500)))
    val rs = (0 until 15).map(i => (1000 + i, groups(rnd.nextInt(2)), rnd.nextInt(500)))
    def expected(lid: Int, g: String, v: Int): Option[Int] = {
      val cand = rs.filter(_._2 == g)
      if (cand.isEmpty) return None
      val back = cand.filter(_._3 <= v)
      val fwd = cand.filter(_._3 >= v)
      val bPick = if (back.isEmpty) None else {
        val w = back.map(_._3).max
        Some((back.filter(_._3 == w).map(_._1).max, v - w))
      }
      val fPick = if (fwd.isEmpty) None else {
        val w = fwd.map(_._3).min
        Some((fwd.filter(_._3 == w).map(_._1).min, w - v))
      }
      (bPick, fPick) match {
        case (Some((r, _)), None) => Some(r)
        case (None, Some((r, _))) => Some(r)
        case (Some((rb, db)), Some((rf, df))) => Some(if (db <= df) rb else rf)
        case _ => None
      }
    }
    val out = AsOfJoin.unbounded(
      ls.toDF("lid", "g", "v"), rs.toDF("rid", "g", "w"), rightId = "rid",
      leftOn = Some("v"), rightOn = Some("w"), direction = "nearest",
      by = Seq("g"), joinType = "left")
    val got = out.select("lid", "rid").collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(got.size == 70)
    for ((lid, g, v) <- ls)
      assert(got(lid) == expected(lid, g, v), s"lid=$lid g=$g v=$v")
  }

  test("allowExactMatches = false: equal-timestamp rights are invisible in every form") {
    // time (banded): click 1's exact-ts view is skipped for the next band member
    val clicks1 = Seq((1, ts("2024-01-01 00:10:00"))).toDF("cid", "cts")
    val views1 = Seq(
      (10, ts("2024-01-01 00:10:00")), // exact hit
      (11, ts("2024-01-01 00:09:30"))
    ).toDF("vid", "vts")
    val t1 = AsOfJoin.time(clicks1, views1, Duration.ofMinutes(2), rightId = "vid",
      leftOn = Some("cts"), rightOn = Some("vts"), allowExactMatches = false)
    assert(rowSet(t1.select("cid", "vid")) == Set(Seq("1", "11")))
    val t1b = AsOfJoin.time(clicks1, views1, Duration.ofMinutes(2), rightId = "vid",
      leftOn = Some("cts"), rightOn = Some("vts"), direction = "backward",
      allowExactMatches = false)
    assert(rowSet(t1b.select("cid", "vid")) == Set(Seq("1", "11")))
    // unbounded backward/forward/nearest: strict on both sides
    val ls = Seq((1, 50), (2, 80)).toDF("lid", "v")
    val rs = Seq((100, 50), (101, 40), (102, 80), (103, 90)).toDF("rid", "w")
    val back = AsOfJoin.unbounded(ls, rs, rightId = "rid",
      leftOn = Some("v"), rightOn = Some("w"), allowExactMatches = false)
    assert(rowSet(back.select("lid", "rid")) == Set(Seq("1", "101"), Seq("2", "100")))
    val fwd = AsOfJoin.unbounded(ls, rs, rightId = "rid",
      leftOn = Some("v"), rightOn = Some("w"), direction = "forward",
      allowExactMatches = false)
    assert(rowSet(fwd.select("lid", "rid")) == Set(Seq("1", "102"), Seq("2", "103")))
    val near = AsOfJoin.unbounded(ls, rs, rightId = "rid",
      leftOn = Some("v"), rightOn = Some("w"), direction = "nearest",
      allowExactMatches = false)
    // lid 1 at 50: exact 100 skipped; 101 (Δ10) beats 102 (Δ30).
    // lid 2 at 80: exact 102 skipped; 100 (Δ30) vs 103 (Δ10) -> 103.
    assert(rowSet(near.select("lid", "rid")) == Set(Seq("1", "101"), Seq("2", "103")))
    // inclusive default unchanged
    val inc = AsOfJoin.unbounded(ls, rs, rightId = "rid",
      leftOn = Some("v"), rightOn = Some("w"))
    assert(rowSet(inc.select("lid", "rid")) == Set(Seq("1", "100"), Seq("2", "102")))
  }

  test("unbounded nearest rejects a non-subtractable join column") {
    val ls = Seq((1, "a")).toDF("lid", "v")
    val rs = Seq((2, "b")).toDF("rid", "w")
    intercept[IllegalArgumentException] {
      AsOfJoin.unbounded(ls, rs, rightId = "rid",
        leftOn = Some("v"), rightOn = Some("w"), direction = "nearest")
    }
  }

  test("invalid joinType raises on both forms") {
    intercept[IllegalArgumentException] {
      AsOfJoin.time(clicks, views, Duration.ofMinutes(2), rightId = "vid",
        leftOn = Some("cts"), rightOn = Some("vts"), joinType = "full")
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.unbounded(clicks, views, rightId = "vid",
        leftOn = Some("cts"), rightOn = Some("vts"), joinType = "right")
    }
  }

  test("by column missing on a side raises") {
    intercept[IllegalArgumentException] {
      AsOfJoin.time(clicks, views, Duration.ofMinutes(2), rightId = "vid",
        leftOn = Some("cts"), rightOn = Some("vts"), by = Seq("user"))
    }
  }

  test("interpolate differential fuzz: Spark == scalar oracle, grouped + duplicates") {
    // the single-pass union+carry machinery is exercised against a
    // brute scalar replica over random data: duplicate right
    // timestamps (max-value contract), grouped and ungrouped, left
    // rows with no group match, many range partitions
    val rnd = new scala.util.Random(421)
    def t(sec: Int) = new Timestamp(sec * 1000L)
    for (trial <- 0 until 3; grouped <- Seq(false, true)) {
      val nGroups = if (grouped) 3 else 1
      val left = (0 until 120).map { i =>
        (i.toLong, rnd.nextInt(500), rnd.nextInt(nGroups + 1)) // group 3 has no right rows
      }
      val right = (0 until 150).map { _ =>
        (rnd.nextInt(500), rnd.nextInt(50).toDouble, rnd.nextInt(nGroups))
      }
      val lDf = left.map { case (id, s, g) => (id, t(s), g) }.toDF("id", "lts", "g")
      val rDf = right.map { case (s, v, g) => (t(s), v, g) }.toDF("rts", "v", "g")
      val by = if (grouped) Seq("g") else Nil
      val got = AsOfJoin.interpolate(lDf, rDf, valueCol = "v", leftId = "id",
          leftOn = Some("lts"), rightOn = Some("rts"), by = by)
        .select("id", "value_interp").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
      // scalar replica: per group, dedup right per ts by max, bracket,
      // interpolate with the IDENTICAL double expression
      val rByG = right.groupBy(_._3).map { case (g, rows) =>
        g -> rows.groupBy(_._1).map { case (s, vs) => s -> vs.map(_._2).max }
      }
      val expect = left.map { case (id, ls, g) =>
        val inG = if (grouped) rByG.getOrElse(g, Map.empty[Int, Double])
          else rByG.values.flatten.groupBy(_._1).map { case (s, vs) => s -> vs.map(_._2).max }
        val ts = inG.keys.toSeq.sorted
        val b = ts.filter(_ <= ls).lastOption.map(s => (s, inG(s)))
        val f = ts.filter(_ >= ls).headOption.map(s => (s, inG(s)))
        id -> ((b, f) match {
          case (None, None) => None
          case (Some((_, v1)), None) => Some(v1)
          case (None, Some((_, v2))) => Some(v2)
          case (Some((t1, v1)), Some((t2, v2))) =>
            if (t1 == t2) Some(v1)
            else Some(v1 + (v2 - v1) *
              ((ls.toLong * 1000000L - t1.toLong * 1000000L).toDouble /
                (t2.toLong * 1000000L - t1.toLong * 1000000L).toDouble))
        })
      }.toMap
      assert(got == expect, s"trial=$trial grouped=$grouped")
    }
  }

  test("interpolate: brackets, exact hits, one-sided edges, no-match nulls") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    // right stream: value 10 at t=100, 30 at t=200, 90 at t=500
    val right = Seq((ts(100), 10.0), (ts(200), 30.0), (ts(500), 90.0))
      .toDF("vts", "v")
    val left = Seq(
      (1L, ts(150)),  // midpoint of 10..30 -> 20
      (2L, ts(200)),  // exact hit -> 30
      (3L, ts(425)),  // 3/4 of 30..90 -> 75
      (4L, ts(50)),   // before first -> 10 (one-sided)
      (5L, ts(600))   // after last -> 90 (one-sided)
    ).toDF("id", "cts")
    val out = AsOfJoin.interpolate(left, right, valueCol = "v",
        leftId = "id", leftOn = Some("cts"), rightOn = Some("vts"))
      .select("id", "value_interp").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(1L -> 20.0, 2L -> 30.0, 3L -> 75.0,
      4L -> 10.0, 5L -> 90.0))
    // empty right: every left row yields null
    val none = AsOfJoin.interpolate(left, right.limit(0), valueCol = "v",
        leftId = "id", leftOn = Some("cts"), rightOn = Some("vts"))
      .select("value_interp").collect()
    assert(none.forall(_.isNullAt(0)))
    // collision guard
    intercept[IllegalArgumentException] {
      AsOfJoin.interpolate(
        left.withColumn("value_interp",
          org.apache.spark.sql.functions.lit(1)),
        right, "v", "id", leftOn = Some("cts"), rightOn = Some("vts"))
    }
  }

  test("interpolate: numeric axes (long exact-diff, double) and axis-type guard") {
    // LONG axis (sensor position): same bracket semantics as the
    // timestamp form, differences as exact longs
    val right = Seq((100L, 10.0), (200L, 30.0), (500L, 90.0))
      .toDF("pos", "v")
    val left = Seq(
      (1L, 150L),  // midpoint of 10..30 -> 20
      (2L, 200L),  // exact hit -> 30
      (3L, 425L),  // 3/4 of 30..90 -> 75
      (4L, 50L),   // before first -> 10
      (5L, 600L)   // after last -> 90
    ).toDF("id", "lpos")
    val out = AsOfJoin.interpolate(left, right, valueCol = "v",
        leftId = "id", leftOn = Some("lpos"), rightOn = Some("pos"))
      .select("id", "value_interp").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(1L -> 20.0, 2L -> 30.0, 3L -> 75.0,
      4L -> 10.0, 5L -> 90.0))
    // DOUBLE axis: fractional positions interpolate too
    val rightD = Seq((1.0, 10.0), (2.0, 30.0)).toDF("pos", "v")
    val leftD = Seq((1L, 1.25)).toDF("id", "lpos")
    val outD = AsOfJoin.interpolate(leftD, rightD, valueCol = "v",
        leftId = "id", leftOn = Some("lpos"), rightOn = Some("pos"))
      .select("value_interp").head.getDouble(0)
    assert(outD == 15.0)
    // a string axis cannot bracket-interpolate: rejected up front
    val leftS = Seq((1L, "a")).toDF("id", "lpos")
    val rightS = Seq(("a", 1.0)).toDF("pos", "v")
    intercept[IllegalArgumentException] {
      AsOfJoin.interpolate(leftS, rightS, valueCol = "v",
        leftId = "id", leftOn = Some("lpos"), rightOn = Some("pos"))
    }
  }

  test("time rejects non-temporal keys loudly (no silent epoch-seconds cast)") {
    // a LONG key cast to timestamp silently reinterprets as epoch
    // seconds; a STRING key casts to null and every row is dropped —
    // both must raise instead, mirroring FuzzyJoin.time's validation
    val longKeyed = Seq((1L, 600L)).toDF("cid", "cts")
    intercept[IllegalArgumentException] {
      AsOfJoin.time(longKeyed, views, Duration.ofMinutes(2), rightId = "vid",
        leftOn = Some("cts"), rightOn = Some("vts"))
    }
    val strKeyed = Seq((10, "not a time")).toDF("vid", "vts")
    intercept[IllegalArgumentException] {
      AsOfJoin.time(clicks, strKeyed, Duration.ofMinutes(2), rightId = "vid",
        leftOn = Some("cts"), rightOn = Some("vts"))
    }
    // DATE keys still widen and join (the documented widening set)
    val dClicks = Seq((1, java.sql.Date.valueOf("2024-01-02")))
      .toDF("cid", "cts")
    val dViews = Seq((10, java.sql.Date.valueOf("2024-01-01")))
      .toDF("vid", "vts")
    val out = AsOfJoin.time(dClicks, dViews, Duration.ofDays(2),
      rightId = "vid", leftOn = Some("cts"), rightOn = Some("vts"))
    assert(rowSet(out.select("cid", "vid")) == Set(Seq("1", "10")))
  }
}
