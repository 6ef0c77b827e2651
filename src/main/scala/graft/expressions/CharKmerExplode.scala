package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Character k-mer generator — the byte/char-granularity sibling of the
  * word-level [[NgramExplode]]: one text row in, one (pos, kmer) row
  * per CHARACTER offset out (`pos` 0-based, so `substr(text, pos+1,
  * k)` replays the k-mer in both Spark and DuckDB). This is the
  * substrate of exact-substring deduplication
  * ([[graft.operators.DupSpans]]): emitting rows straight from the
  * scan loop keeps the corpus-sized k-mer stream out of any
  * per-document array materialization.
  *
  * Registered as `graft_char_kmers(text, k)` for SQL `LATERAL VIEW`
  * use. Interpreted (CodegenFallback) like every custom Generator; the
  * surrounding plan whole-stage-codegens up to the Generate node.
  */
case class CharKmerExplode(child: Expression, k: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(k >= 1, s"graft_char_kmers: k=$k must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_char_kmers expects a string column, got ${other.catalogString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("kmer", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      // CODE-POINT offsets (not bytes, not UTF-16 code units): both
      // engines' substr() is code-point-addressed, so replay stays
      // identical under multibyte text INCLUDING supplementary-plane
      // characters (emoji) — UTF-16 indexing would shift every span
      // after the first surrogate pair and could split pairs into
      // invalid k-mers. cpStarts(i) is the code-unit start of the i-th
      // code point; the k-mer at pos i spans code units
      // [cpStarts(i), cpStarts(i + k)).
      val s = v.asInstanceOf[UTF8String].toString
      val n = s.codePointCount(0, s.length)
      if (n < k) Nil
      else {
        val cpStarts = new Array[Int](n + 1)
        var cu = 0
        var i = 0
        while (i < n) {
          cpStarts(i) = cu
          cu += Character.charCount(s.codePointAt(cu))
          i += 1
        }
        cpStarts(n) = s.length
        (0 to n - k).iterator.map { p =>
          InternalRow(p, UTF8String.fromString(s.substring(cpStarts(p), cpStarts(p + k))))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CharKmerExplode =
    copy(child = newChild)
}
