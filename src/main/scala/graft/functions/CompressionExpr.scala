package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio kernel: `deflate(text).length / text.length` at a
  * FIXED level (BEST_SPEED, raw deflate) — the
  * RedPajama/DCLM-family repetitiveness signal: templated, looped, or
  * boilerplate-heavy documents compress far below prose (a page of
  * repeated nav bars lands near 0.05; natural text sits ~0.4-0.7).
  * Complements the exact repetition gates ([[TextFunctions.dupLineRatio]],
  * `topTokenRatio`): compression catches DIFFUSE redundancy no single
  * line or token dominates.
  *
  * Deterministic for a fixed JVM zlib (level and strategy pinned;
  * ratios floored to the 1e-4 grid) but NOT replayable in SQL — no
  * engine-portable deflate exists, so this signal is suite-covered
  * (ordering properties) rather than oracle-checked, and downstream
  * gates should treat thresholds as tunables, not contracts. Empty
  * text scores 1.0 (incompressible by definition, never a
  * divide-by-zero).
  */
object CompressionKernel {

  def ratio(u: UTF8String): Double = {
    if (u == null) return 1.0
    val bytes = u.getBytes
    if (bytes.length == 0) return 1.0
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var out = 0L
      while (!d.finished()) out += d.deflate(buf)
      math.floor(out.toDouble / bytes.length * 10000.0) / 10000.0
    } finally d.end()
  }
}

/** `compression_ratio(text)`: deflated-size ratio on the 1e-4 grid —
  * one kernel call per row in the scan projection.
  */
case class CompressionRatioExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_compression_ratio"
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    CompressionKernel.ratio(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val resultCode =
      code"""
        ${childGen.code}
        double ${ev.value} = graft.functions.CompressionKernel.ratio(
          ${childGen.isNull} ? null : ${childGen.value});
      """
    ev.copy(code = resultCode,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
