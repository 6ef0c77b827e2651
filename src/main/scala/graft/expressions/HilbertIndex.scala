package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of a 2-D cell on the 2^bits × 2^bits grid.
  *
  * WHY a custom Catalyst expression: the xy→d conversion is an
  * iterative loop with a data-dependent rotation per bit level — each
  * level rewrites BOTH coordinates from both previous coordinates, so a
  * pure Column formulation duplicates the (x, y) subtrees ~4× per level
  * and the expression tree grows 4^bits nodes (the Morton interleave, by
  * contrast, is a flat 2·bits-term sum and stays a plain expression in
  * [[graft.operators.ZOrder.interleave]]). Here it is one tight integer
  * loop (the classic public-domain xy2d algorithm), codegen'd via a
  * static call inside whole-stage codegen, with an interpreted `eval`
  * fallback of the same code.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits=$bits out of [1, 31]")

  // Precondition (enforced by the ZOrder.hilbertValue call site, which
  // casts both children): long inputs in [0, 2^bits).
  override def dataType: DataType = LongType

  override def prettyName: String = "graft_hilbert"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.compute(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.expressions.HilbertIndex.compute($x, $y, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {

  /** xy→d on the 2^bits grid — the standard iterative conversion
    * (reflect+swap rotation per bit level, highest level first). Called
    * from generated code via the companion's static forwarder.
    */
  def compute(x0: Long, y0: Long, bits: Int): Long = {
    val n = 1L << bits
    var x = x0
    var y = y0
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) { // rotate the sub-quadrant: reflect (if rx) then swap
        if (rx == 1) {
          x = n - 1 - x
          y = n - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
