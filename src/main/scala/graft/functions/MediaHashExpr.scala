package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** Kernels for the perceptual-hash expressions — thin shims over the
  * [[graft.multimodal.Multimodal]] hash functions, plus the one piece of
  * per-executor codec state worth owning explicitly: ImageIO's
  * plugin registry is a JVM-wide singleton (scanned once per executor),
  * and `ImageIO.setUseCache(false)` — applied once per JVM on first
  * kernel use — keeps every decode's working buffer in MEMORY instead
  * of the default temp-FILE cache, so a hashing scan over millions of
  * images never touches executor-local disk.
  *
  * Total functions: null payloads hash like empty ones (the hash
  * functions' own contract), so the expressions are non-nullable and
  * safe inside streaming gates and filters.
  */
object MediaHashKernel {
  // one volatile read per call after the first; the JDK setter is a
  // static field write, safe to race
  @volatile private var configured = false
  private def ensureConfigured(): Unit =
    if (!configured) {
      javax.imageio.ImageIO.setUseCache(false)
      configured = true
    }

  def ahash(bytes: Array[Byte]): Long = {
    ensureConfigured()
    graft.multimodal.Multimodal.aHash64(bytes)
  }

  def phash(bytes: Array[Byte]): Long = {
    ensureConfigured()
    graft.multimodal.Multimodal.pHash64(bytes)
  }

  def audioHash(bytes: Array[Byte]): Long =
    graft.multimodal.Multimodal.audioHash64(bytes)

  def audioSubFps(bytes: Array[Byte], windowSamples: Int, k: Int,
      w: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      graft.multimodal.Multimodal.audioSubFingerprints(bytes, windowSamples, k, w))
}

/** `binary -> bigint`: 64-bit average-hash perceptual image fingerprint
  * ([[graft.multimodal.Multimodal.aHash64]]) as a native expression —
  * the hash evaluates inside the scan projection / whole-stage span
  * like the text kernels (`ShinglesExpr`, `SimHash64Expr`), instead of
  * forcing a `mapPartitions` object boundary, and therefore composes
  * with streaming gates for free. Values are bit-identical to the
  * former partitioned form (suite-pinned).
  */
case class AHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ahash64"
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    MediaHashKernel.ahash(child.eval(input).asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        ${childGen.code}
        long ${ev.value} = graft.functions.MediaHashKernel.ahash(
          ${childGen.isNull} ? null : ${childGen.value});
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `binary -> bigint`: 64-bit DCT perceptual hash
  * ([[graft.multimodal.Multimodal.pHash64]]) — [[AHash64Expr]]'s
  * crop/rescale-robust sibling, same expression shape.
  */
case class PHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_phash64"
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    MediaHashKernel.phash(child.eval(input).asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        ${childGen.code}
        long ${ev.value} = graft.functions.MediaHashKernel.phash(
          ${childGen.isNull} ? null : ${childGen.value});
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `binary -> bigint`: 64-bit energy-envelope audio fingerprint
  * ([[graft.multimodal.Multimodal.audioHash64]]) as a native
  * expression — same contract as the image hashes.
  */
/** `binary -> array<bigint>`: time-shift-robust audio subfingerprints
  * ([[graft.multimodal.Multimodal.audioSubFingerprints]]) — fixed-
  * duration window energies, delta-sign bits, winnowed k-gram hashes.
  * Array-returning like `graft_shingles`; non-nullable (undecodable
  * payloads yield the empty array).
  */
case class AudioSubFpExpr(child: Expression, windowSamples: Int, k: Int,
    w: Int) extends UnaryExpression {
  require(windowSamples > 0 && k > 0 && k <= 64 && w > 0,
    s"graft_audiosubfp: need windowSamples > 0, 0 < k <= 64, w > 0; " +
      s"got windowSamples=$windowSamples k=$k w=$w")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_audiosubfp"
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    MediaHashKernel.audioSubFps(
      child.eval(input).asInstanceOf[Array[Byte]], windowSamples, k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.MediaHashKernel.audioSubFps(
            ${childGen.isNull} ? null : ${childGen.value},
            $windowSamples, $k, $w);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class AudioHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_audiohash64"
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    MediaHashKernel.audioHash(child.eval(input).asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        ${childGen.code}
        long ${ev.value} = graft.functions.MediaHashKernel.audioHash(
          ${childGen.isNull} ? null : ${childGen.value});
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
