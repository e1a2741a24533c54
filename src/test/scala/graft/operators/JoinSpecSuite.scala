package graft.operators

import graft.SparkSpec

/** Join-column resolution + suffixing rules
  * (reference pandance/pandance.py:920-946).
  */
class JoinSpecSuite extends SparkSpec {
  import spark.implicits._

  test("on wins; leftOn/rightOn required together otherwise") {
    assert(JoinSpec.resolve(Some("c"), None, None) == JoinSpec.Cols("c", "c"))
    assert(JoinSpec.resolve(None, Some("l"), Some("r")) == JoinSpec.Cols("l", "r"))
    intercept[IllegalArgumentException](JoinSpec.resolve(None, Some("l"), None))
    intercept[IllegalArgumentException](JoinSpec.resolve(None, None, None))
  }

  test("missing join column raises with the available columns listed") {
    val df = Seq((1, 2)).toDF("a", "b")
    val e = intercept[IllegalArgumentException](
      JoinSpec.requireColumn(df, "zz", "left"))
    assert(e.getMessage.contains("zz") && e.getMessage.contains("a, b"))
  }

  test("only overlapping columns are suffixed; join cols tracked through renames") {
    val l = Seq((1, 10, "x")).toDF("id", "v", "lonly")
    val r = Seq((2, 20, "y")).toDF("id", "w", "ronly")
    val (ls, rs, c) = JoinSpec.applySuffixes(l, r, JoinSpec.Cols("v", "w"), ("_x", "_y"))
    assert(ls.columns.toSeq == Seq("id_x", "v", "lonly"))
    assert(rs.columns.toSeq == Seq("id_y", "w", "ronly"))
    assert(c == JoinSpec.Cols("v", "w"))
  }

  test("join columns themselves are suffixed when they collide") {
    val l = Seq((1, 10)).toDF("id", "v")
    val r = Seq((2, 20)).toDF("id", "v")
    val (_, _, c) = JoinSpec.applySuffixes(l, r, JoinSpec.Cols("v", "v"), ("_x", "_y"))
    assert(c == JoinSpec.Cols("v_x", "v_y"))
  }

  test("identical suffixes are rejected") {
    val l = Seq((1, 10)).toDF("id", "v")
    val r = Seq((2, 20)).toDF("id", "w")
    intercept[IllegalArgumentException](
      JoinSpec.applySuffixes(l, r, JoinSpec.Cols("v", "w"), ("_s", "_s")))
  }
}
