package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types._

/** Column min/max from parquet FOOTER statistics — the metadata answer
  * to the question [[IneqJoin]]'s prune fast paths otherwise pay two
  * full pre-scans for (round-16 verdict watch #3). At 100 TB a footer
  * listing is thousands of small driver-side reads; an extreme
  * aggregate is a full pass over the table.
  *
  * Sound by construction: footer stats bound ALL non-null values in
  * the file, so the returned (min, max) is a conservative superset of
  * the live data's extremes — a fast path that fires on it would also
  * fire on exact bounds. Returns None (caller falls back to the
  * aggregates) unless EVERY condition holds:
  *
  *  - the DataFrame is an unfiltered parquet scan (only column-pruning
  *    projects and subquery aliases above the relation — a filter or
  *    join could narrow the true extremes below the file bounds, which
  *    would make the all-match fast path fire spuriously);
  *  - the column is a top-level INT32/INT64-backed primitive whose
  *    raw ordering equals the logical ordering (ints, longs, dates,
  *    MICROS timestamps — NOT floats/doubles, because common writers
  *    such as pyarrow EXCLUDE NaN from footer min/max while Spark
  *    orders NaN greater than everything, so a NaN row invisible to
  *    the stats could make the noneMatch path drop matches and the
  *    allMatch cross join emit predicate-violating pairs; NOT
  *    decimals, whose sides may carry different scales; NOT strings,
  *    whose footer truncation rules differ by writer; NOT unsigned
  *    ints, whose raw two's-complement order misorders large values;
  *    NOT MILLIS/NANOS timestamps or INT96, whose units differ from
  *    the epoch-micros the caller compares against);
  *  - every row group in every file carries usable stats (all-null
  *    row groups contribute nothing; absent stats bail).
  */
object ParquetFooterBounds {

  /** Spark types whose parquet primitive min/max orders like the
    * value. Float/Double are deliberately absent: NaN rows may be
    * omitted from footer stats (pyarrow does), and Spark's total
    * order puts NaN above +Inf, so float footer bounds are NOT a
    * conservative superset of the data's extremes.
    */
  private def orderedPrimitive(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | DateType |
        TimestampType | TimestampNTZType | ShortType | ByteType => true
    case _ => false
  }

  private val RawTypes: Set[PrimitiveTypeName] = Set(
    PrimitiveTypeName.INT32, PrimitiveTypeName.INT64)

  /** The parquet logical-type annotations under which raw INT32/INT64
    * min/max order like (and in the unit of) the Spark-side value:
    * none (plain signed int), DATE (epoch days), signed INT(bits),
    * and TIMESTAMP in MICROS. Unsigned ints misorder; MILLIS/NANOS
    * timestamps are the wrong unit for the caller's epoch-micros
    * comparison.
    */
  private def annotationOrdered(
      pt: org.apache.parquet.schema.PrimitiveType): Boolean = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation._
    pt.getLogicalTypeAnnotation match {
      case null => true
      case i: IntLogicalTypeAnnotation => i.isSigned
      case _: DateLogicalTypeAnnotation => true
      case t: TimestampLogicalTypeAnnotation =>
        t.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS
      case _ => false
    }
  }

  /** The scan's data files, when `df` is a bare (project/alias-only)
    * parquet relation; None for anything with a filter, join, cast, or
    * non-parquet source in between.
    */
  private def scanFiles(df: DataFrame): Option[Seq[String]] = {
    def strip(p: LogicalPlan): Option[LogicalRelation] = p match {
      case SubqueryAlias(_, child) => strip(child)
      case Project(exprs, child)
          if exprs.forall(_.isInstanceOf[AttributeReference]) => strip(child)
      case lr: LogicalRelation => Some(lr)
      case _ => None
    }
    strip(df.queryExecution.analyzed).flatMap { lr =>
      lr.relation match {
        case fs: HadoopFsRelation if fs.fileFormat.isInstanceOf[ParquetFileFormat] =>
          Some(fs.location.inputFiles.toSeq)
        case _ => None
      }
    }
  }

  private def less(a: Number, b: Number): Boolean = (a, b) match {
    case (x: java.lang.Long, y: java.lang.Long) => x < y
    case _ => a.doubleValue() < b.doubleValue()
  }

  /** Per-file bounds: outer None = stats unusable (caller must bail),
    * Some(None) = the file holds no non-null rows for the column.
    */
  private def fileBounds(
      file: String, conf: Configuration, colName: String)
      : Option[Option[(Number, Number)]] = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), conf))
    try {
      var lo: Number = null
      var hi: Number = null
      val blocks = reader.getFooter.getBlocks
      var bi = 0
      while (bi < blocks.size()) {
        val block = blocks.get(bi)
        if (block.getRowCount > 0) {
          val cols = block.getColumns
          var found = false
          var ci = 0
          while (ci < cols.size()) {
            val cc = cols.get(ci)
            val p = cc.getPath.toArray
            if (p.length == 1 && p(0) == colName) {
              found = true
              val pt = cc.getPrimitiveType.getPrimitiveTypeName
              if (!RawTypes.contains(pt)) return None
              if (!annotationOrdered(cc.getPrimitiveType)) return None
              val st = cc.getStatistics
              if (st == null || st.isEmpty) return None
              if (!st.hasNonNullValue) {
                // a row group can be all-null for the column — that
                // contributes no bound; anything else means the writer
                // skipped stats and the footer cannot answer
                if (!(st.isNumNullsSet && st.getNumNulls == block.getRowCount))
                  return None
              } else {
                val (mn, mx): (Number, Number) = pt match {
                  case PrimitiveTypeName.INT32 =>
                    (Long.box(st.genericGetMin.asInstanceOf[Integer].longValue()),
                      Long.box(st.genericGetMax.asInstanceOf[Integer].longValue()))
                  case _ =>
                    (st.genericGetMin.asInstanceOf[java.lang.Long],
                      st.genericGetMax.asInstanceOf[java.lang.Long])
                }
                if (lo == null || less(mn, lo)) lo = mn
                if (hi == null || less(hi, mx)) hi = mx
              }
            }
            ci += 1
          }
          // a row-bearing block without the column at all (schema
          // evolution): its values read as null — contributes nothing
          if (!found) ()
        }
        bi += 1
      }
      Some(Option(lo).zip(Option(hi)))
    } finally reader.close()
  }

  /** (min, max) of `colName` across the scan's footers as mutually
    * comparable [[java.lang.Number]]s (ints/dates widened to epoch-day
    * longs, timestamps as epoch micros —
    * ordinal-equivalent to the logical values), or None when the
    * plan/type/stats preconditions fail. Footer reads fan out on a
    * bounded thread pool — metadata IO, not data IO.
    */
  def bounds(df: DataFrame, colName: String): Option[(Number, Number)] = {
    val field = df.schema.fields.find(_.name == colName)
      .orElse(df.schema.fields.find(_.name.equalsIgnoreCase(colName)))
    if (field.isEmpty || !orderedPrimitive(field.get.dataType)) return None
    val parquetName = field.get.name
    scanFiles(df).filter(_.nonEmpty).flatMap { files =>
      val conf = df.sparkSession.sessionState.newHadoopConf()
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration._
      implicit val ec: ExecutionContext = ExecutionContext.global
      val per =
        try Await.result(
          Future.traverse(files.toVector)(f =>
            Future(fileBounds(f, conf, parquetName))),
          10.minutes)
        catch { case scala.util.control.NonFatal(_) => return None }
      if (per.exists(_.isEmpty)) None // some file's stats are unusable
      else {
        val vals = per.flatten.flatten
        if (vals.isEmpty) None // no non-null rows anywhere: let the
        // aggregate path return its null row and take the empty branch
        else Some((vals.map(_._1).reduce((a, b) => if (less(a, b)) a else b),
          vals.map(_._2).reduce((a, b) => if (less(a, b)) b else a)))
      }
    }
  }
}
