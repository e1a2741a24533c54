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
}
