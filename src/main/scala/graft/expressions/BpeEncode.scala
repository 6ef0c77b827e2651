package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE tokenizer APPLY — encodes one word with a fitted merge list:
  * start from the character sequence, apply each merge in rank order
  * with one greedy left-to-right non-overlapping pass, return the final
  * symbols space-joined. This is the operation every token-budget
  * operator (packing, mixtures) approximates with whitespace counts
  * when no tokenizer is wired in.
  *
  * Correctness contract: the merge list must be TRAINING-CONSISTENT — a
  * pair that mentions a merged symbol ranks after the merge creating it
  * (true of every actually-fitted BPE list, asserted by
  * [[graft.operators.BpeApply.requireConsistent]]). Under that
  * contract a single rank-ordered pass equals the reference
  * lowest-rank-first loop (GPT-2's encoder): applying rank r can only
  * create pairs that rank AFTER r, so no earlier rank ever reappears —
  * and within one rank, a left-to-right pass cannot create a new
  * occurrence of its own pair (the merged symbol ab differs from both a
  * and b). `BpeApplySpec` pins this against a literal
  * lowest-rank-first reference model, and the DuckDB oracle of
  * `q_text_bpe_encode` re-implements the same loop as a recursive CTE
  * splicing ONE merge occurrence per step.
  *
  * Row-local and allocation-light (one ArrayBuffer per row, merged in
  * place): zero shuffle, O(len × merges) per word. Interpreted
  * (CodegenFallback) like the other custom expressions; the surrounding
  * projection still whole-stage-codegens around it.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {
  require(merges.nonEmpty, "bpe_encode: need at least one merge")
  merges.foreach { case (a, b) =>
    require(a.nonEmpty && b.nonEmpty && !a.contains(" ") && !b.contains(" "),
      s"bpe_encode: merge symbols must be non-empty and space-free, got ('$a','$b')")
  }

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects a string column, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[UTF8String].toString
    val syms = new scala.collection.mutable.ArrayBuffer[String](w.length)
    var ci = 0
    while (ci < w.length) { // by code point, so surrogate pairs stay whole
      val cp = w.codePointAt(ci)
      val n = Character.charCount(cp)
      syms += w.substring(ci, ci + n)
      ci += n
    }
    merges.foreach { case (a, b) =>
      // one greedy left-to-right non-overlapping pass for this rank
      var i = 0
      var out = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          syms(out) = a + b
          i += 2
        } else {
          syms(out) = syms(i)
          i += 1
        }
        out += 1
      }
      syms.dropRightInPlace(syms.length - out)
    }
    UTF8String.fromString(syms.mkString(" "))
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
