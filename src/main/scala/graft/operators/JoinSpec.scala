package graft.operators

import org.apache.spark.sql.{AnalysisException, DataFrame}

/** Join-column resolution and output-header construction shared by all
  * graft join operators.
  *
  * Semantics follow the reference engine's rules
  * (pandance/pandance.py:920-928 `_validate_input_col_names`,
  * pandance/pandance.py:931-946 `_get_join_column_names`):
  *
  *  - exactly one join column per side — either `on` (same name both
  *    sides) or `leftOn`/`rightOn`;
  *  - every output column name that occurs on BOTH sides is suffixed
  *    (left gets `suffixes._1`, right gets `suffixes._2`), left columns
  *    first, original order preserved.
  *
  * We apply the renames to the *inputs* before building the join plan, so
  * the whole operator stays one declarative logical plan that Catalyst
  * can optimize end-to-end (column pruning + predicate pushdown still
  * reach the scans through the renames, which are plain `Project`s).
  */
object JoinSpec {

  /** Resolved pair of join columns (post-validation, pre-suffix). */
  final case class Cols(leftCol: String, rightCol: String)

  /** Resolve `on` vs `leftOn`/`rightOn` (reference:
    * pandance/pandance.py:920-928). `on` wins if given; otherwise both
    * `leftOn` and `rightOn` are required.
    */
  def resolve(on: Option[String], leftOn: Option[String], rightOn: Option[String]): Cols =
    on match {
      case Some(c) => Cols(c, c)
      case None =>
        (leftOn, rightOn) match {
          case (Some(l), Some(r)) => Cols(l, r)
          case _ =>
            throw new IllegalArgumentException(
              "Specify either `on` or both `leftOn` and `rightOn` (exactly one join column per side)")
        }
    }

  def requireColumn(df: DataFrame, col: String, side: String): Unit =
    if (!df.columns.contains(col))
      throw new IllegalArgumentException(
        s"$side join column `$col` not found; available: ${df.columns.mkString(", ")}")

  /** Rename collisions on both inputs (left first, as in the reference's
    * merged header, pandance/pandance.py:931-946) and return the renamed
    * frames plus the post-rename join-column names.
    *
    * Renames are `Project` nodes — free for Catalyst, no shuffle.
    */
  def applySuffixes(
      left: DataFrame,
      right: DataFrame,
      cols: Cols,
      suffixes: (String, String)): (DataFrame, DataFrame, Cols) = {
    val overlap = left.columns.toSet intersect right.columns.toSet
    if (overlap.isEmpty) (left, right, cols)
    else {
      val (sl, sr) = suffixes
      if (sl == sr)
        throw new IllegalArgumentException(s"suffixes must differ, got ($sl, $sr)")
      def renamed(df: DataFrame, suf: String): DataFrame =
        overlap.foldLeft(df)((d, c) => d.withColumnRenamed(c, c + suf))
      val lc = if (overlap(cols.leftCol)) cols.leftCol + sl else cols.leftCol
      val rc = if (overlap(cols.rightCol)) cols.rightCol + sr else cols.rightCol
      (renamed(left, sl), renamed(right, sr), Cols(lc, rc))
    }
  }
}
