package graft.operators

import graft.SparkSpec

/** Snapshot diff: the four statuses, the unchanged filter, multi-column
  * fingerprints, and null-edit visibility.
  */
class CorpusDiffSuite extends SparkSpec {
  import spark.implicits._

  test("statuses: added/removed/changed, unchanged filtered by default") {
    val oldS = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val newS = Seq((2L, "b"), (3L, "C2"), (4L, "d")).toDF("id", "text")
    val got = CorpusDiff.diff(oldS, newS, "id", Seq("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
    val all = CorpusDiff.diff(oldS, newS, "id", Seq("text"), includeUnchanged = true)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(all == got + (2L -> "unchanged"))
  }

  test("multi-column fingerprint sees an edit in any content column; null edits count") {
    val oldS = Seq((1L, "a", "x"), (2L, "b", null.asInstanceOf[String]))
      .toDF("id", "text", "meta")
    val newS = Seq((1L, "a", "y"), (2L, "b", "now-set"))
      .toDF("id", "text", "meta")
    val got = CorpusDiff.diff(oldS, newS, "id", Seq("text", "meta"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(1L -> "changed", 2L -> "changed"))
    // restricting the fingerprint to text alone sees no change
    assert(CorpusDiff.diff(oldS, newS, "id", Seq("text")).count() == 0)
  }
}
