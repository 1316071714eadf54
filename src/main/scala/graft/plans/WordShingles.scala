package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles in one pass: trim → whitespace-split → sliding
  * windows of `n` tokens joined by a single space.
  *
  * Replaces the composed built-in form
  * `transform(sequence(1, size(toks)-n+1), i -> array_join(slice(toks,i,n)))`
  * whose lambda re-evaluated `toks` (a full regex split of the document) for
  * EVERY output element — O(tokens²) regex work per row, interpreted. This
  * expression splits once per row. Semantics are bit-identical to the old
  * form (and to `TextFns.shinglesSql`'s DuckDB twin): Spark `trim` strips
  * spaces only, Spark `split` keeps leading/trailing empty tokens (Java
  * split with limit -1), blank or shorter-than-n token lists give an empty
  * array, null gives null.
  *
  * CodegenFallback: the per-row work is one regex split + string builds —
  * dominated by I/O either way; falling out of whole-stage codegen here is
  * harmless because the expression feeds a Generate (explode) boundary.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val trimmed = input.asInstanceOf[UTF8String].trim().toString
    if (trimmed.isEmpty) new GenericArrayData(Array.empty[Any])
    else {
      val toks = trimmed.split("\\s+", -1)
      if (toks.length < n) new GenericArrayData(Array.empty[Any])
      else {
        val out = new Array[Any](toks.length - n + 1)
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i < out.length) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          out(i) = UTF8String.fromString(sb.toString)
          i += 1
        }
        new GenericArrayData(out)
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}
