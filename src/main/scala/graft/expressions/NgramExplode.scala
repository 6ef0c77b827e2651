package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** A true UDTF — a Catalyst `Generator`, the table-valued shape the
  * reference's weather fetcher only mimicked through UDF + explode
  * (SURVEY §2.9 D3: "a true UDTF would be a Catalyst Generator"):
  * one text row in, one (pos, ngram) row out per word n-gram.
  *
  * Registered as `graft_ngrams(text, n)` by [[graft.GraftExtensions]],
  * so SQL users reach it through `LATERAL VIEW` exactly like
  * `explode`/`posexplode`. Compared to the equivalent
  * split→transform→posexplode chain it produces rows directly from the
  * tokenizer loop — no intermediate array-of-structs materializes per
  * row. Evaluation is interpreted (CodegenFallback), the standard
  * trade-off for custom generators; the surrounding plan still
  * whole-stage-codegens up to the Generate node.
  */
case class NgramExplode(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n >= 1, s"graft_ngrams: n=$n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ngrams expects a string column, got ${other.catalogString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val words = v.asInstanceOf[UTF8String].toString.split(" ")
      if (words.length < n) Nil
      else (0 to words.length - n).map { i =>
        InternalRow(i, UTF8String.fromString(words.slice(i, i + n).mkString(" ")))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NgramExplode =
    copy(child = newChild)
}
