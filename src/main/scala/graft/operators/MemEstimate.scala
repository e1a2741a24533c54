package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Port of the reference's exported utility
  * `_estimate_mem_cost_cartesian` (pandance/pandance.py:894-917): estimate
  * the size in MiB of the Cartesian join of two single-column frames.
  *
  * In Spark this is not a safety valve (shuffles spill to disk instead of
  * OOMing, so the reference's `MemoryError` admission check at
  * pandance/pandance.py:879-891 has no equivalent failure mode) — it is a
  * *planning heuristic*: operators that may fall back to a cross join use
  * it to log a warning before launching a job whose output would be
  * enormous, mirroring the reference's 75%-of-RAM warning.
  */
object MemEstimate {

  /** Estimated MiB of `a × b` on the given columns, from row counts ×
    * fixed-width type sizes (strings estimated via their average length
    * when `exact`, else a 20-byte guess).
    */
  def cartesianMiB(a: DataFrame, aCol: String, b: DataFrame, bCol: String): Long = {
    val rows = a.count() * b.count()
    val bytes = rows * (typeWidth(a.schema(aCol).dataType) + typeWidth(b.schema(bCol).dataType))
    bytes / (1024L * 1024L)
  }

  /** Rough per-value width in bytes (Tungsten row layout is 8-byte
    * aligned; strings get a conservative average).
    */
  def typeWidth(dt: DataType): Long = dt match {
    case ByteType | BooleanType => 8L
    case ShortType | IntegerType | FloatType => 8L
    case LongType | DoubleType | TimestampType | TimestampNTZType | DateType => 8L
    case _: DecimalType => 16L
    case StringType => 28L
    case ArrayType(et, _) => 16L + 8L * 8L // opaque guess: ~8 elements
    case _ => 16L
  }

  /** Log a warning when an operator is about to materialize a cross join
    * estimated above `warnMiB` (reference warns at 75% of available RAM,
    * pandance/pandance.py:886-890; on a cluster "available RAM" is not
    * observable from the driver, so the threshold is explicit).
    */
  def warnIfLarge(
      a: DataFrame, aCol: String, b: DataFrame, bCol: String,
      warnMiB: Long = 4096): Long = {
    val est = cartesianMiB(a, aCol, b, bCol)
    if (est > warnMiB)
      System.err.println(
        s"[graft] WARN: cross-join estimated at ${est} MiB (> $warnMiB MiB); " +
          "result is O(n*m) — consider a more selective predicate")
    est
  }
}
