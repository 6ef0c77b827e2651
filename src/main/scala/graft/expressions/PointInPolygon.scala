package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Ray-casting point-in-polygon test against a FIXED polygon (flat
  * [x0,y0, x1,y1, …] vertex list baked into the expression, the way
  * [[HilbertIndex]] bakes its bit width).
  *
  * WHY a custom Catalyst expression: the even-odd rule is a loop over
  * edges where each term reads BOTH point coordinates and four vertex
  * components — a Column formulation unrolls to 4·V subtree copies of
  * (x, y) and defeats common-subexpression reuse, while geofence sets
  * in production have hundreds of vertices. Here it is one tight loop
  * over a vertex array shipped as a codegen REFERENCE OBJECT
  * (`ctx.addReferenceObj`, so the compiled plan carries the vertices
  * to every executor — a driver-side static table would be empty on a
  * real cluster), with an interpreted `eval` of the same code. The
  * crossing test is the classic
  * `(yi > y) != (yj > y) && x < (xj−xi)·(y−yi)/(yj−yi) + xi`
  * (division kept, not cross-multiplied, so an external SQL engine
  * replays it float-for-float).
  *
  * Boundary semantics follow the raw even-odd rule: points exactly on
  * an edge fall wherever the strict comparisons put them — consistent
  * across engines because every engine runs the identical float ops.
  */
case class PointInPolygon(left: Expression, right: Expression, poly: Seq[Double])
    extends BinaryExpression {

  require(poly.length >= 6 && poly.length % 2 == 0,
    s"polygon needs >= 3 (x, y) vertex pairs, got ${poly.length} values")

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_point_in_polygon"

  private lazy val verts: Array[Double] = poly.toArray

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PointInPolygon.compute(a.asInstanceOf[Double], b.asInstanceOf[Double], verts)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vsRef = ctx.addReferenceObj("pipVerts", verts, "double[]")
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.expressions.PointInPolygon.compute($x, $y, $vsRef)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PointInPolygon =
    copy(left = newLeft, right = newRight)
}

object PointInPolygon {

  /** Even-odd ray cast; called from generated code via the companion's
    * static forwarder with the reference-object vertex array.
    */
  def compute(x: Double, y: Double, vs: Array[Double]): Boolean = {
    var inside = false
    val n = vs.length / 2
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = vs(2 * i); val yi = vs(2 * i + 1)
      val xj = vs(2 * j); val yj = vs(2 * j + 1)
      if (((yi > y) != (yj > y)) && x < (xj - xi) * (y - yi) / (yj - yi) + xi)
        inside = !inside
      j = i
      i += 1
    }
    inside
  }
}
