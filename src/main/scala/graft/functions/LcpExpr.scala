package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for [[LcpCharsExpr]]: length IN CHARACTERS of the longest
  * common prefix of two strings, byte-scanned over the Tungsten
  * `UTF8String`s (no decode) and backed off to a UTF-8 character
  * boundary when the first differing byte splits a multi-byte
  * character — so the result is exactly the char-level LCP an engine
  * with 1-based char `substr` (Spark SQL, DuckDB) can act on. Null on
  * either side is an empty prefix.
  */
object LcpKernel {
  def chars(a: UTF8String, b: UTF8String): Int = {
    if (a == null || b == null) return 0
    val ab = a.getBytes
    val bb = b.getBytes
    val n = math.min(ab.length, bb.length)
    var i = 0
    while (i < n && ab(i) == bb(i)) i += 1
    // a differing byte (both strings continue) may split a character;
    // a byte-prefix containment (i == one side's length) cannot — the
    // shorter string's last character is complete in a valid UTF-8
    // string
    if (i < ab.length && i < bb.length)
      while (i > 0 && (ab(i) & 0xc0) == 0x80) i -= 1
    var c = 0
    var j = 0
    while (j < i) {
      if ((ab(j) & 0xc0) != 0x80) c += 1
      j += 1
    }
    c
  }
}

/** `(string, string) -> int`: char-level longest-common-prefix length
  * as a native expression — the group-boilerplate detector's core
  * ([[graft.operators.Boilerplate]]): the LCP of a GROUP of strings
  * equals the LCP of its min and max (binary string order, the same
  * order Spark and DuckDB both aggregate), so per-group boilerplate
  * detection is one `(min, max)` aggregate plus this comparison —
  * never a cross-row scan.
  */
case class LcpCharsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_lcp_chars"
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    LcpKernel.chars(
      left.eval(input).asInstanceOf[UTF8String],
      right.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val resultCode =
      code"""
        ${l.code}
        ${r.code}
        int ${ev.value} = graft.functions.LcpKernel.chars(
          ${l.isNull} ? null : ${l.value}, ${r.isNull} ? null : ${r.value});
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
