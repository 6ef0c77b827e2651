package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * WHY a custom Catalyst expression (the one place the engine drops
  * below the built-in API): Spark's higher-order functions
  * (`aggregate`/`zip_with`) evaluate INTERPRETED — a lambda closure and
  * boxed Double per element — and they sit on the engine's hottest
  * per-pair loop (ANN scoring, embedding near-dup, norms: millions of
  * 64-element dot products). This expression is a tight primitive loop
  * over `ArrayData`, participates in whole-stage codegen via
  * `doGenCode`, and keeps the exact left-to-right summation order of the
  * `aggregate` formulation so results (and the DuckDB oracles) are
  * bit-identical.
  *
  * Float arrays are accepted through an implicit element-wise cast
  * (itself codegen'd). Shorter arrays zero-pad implicitly (min length),
  * matching `zip_with` + `aggregate` over the common prefix. Null
  * ELEMENTS are treated as 0.0 (the HOF formulation propagates null
  * into the sum; embeddings with null components are malformed input —
  * prefer a defined result).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Precondition (enforced by the VectorFunctions.dot call site, which
  // casts both children): array<double> inputs. ImplicitCastInputTypes
  // is private[sql] in Spark 4, so the cast lives at the wrapper.
  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
