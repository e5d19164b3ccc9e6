package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass token n-gram windows — the map-side substrate of the
  * decontamination family (contaminatedIds, contaminationReport,
  * jaccardContamination). Replaces the declarative
  * `transform(sequence(1, size-(n-1)), i → array_join(slice(toks, i, n)))`
  * composition: higher-order functions evaluate INTERPRETED per element
  * (outside whole-stage codegen), and the slice/join pair re-copies token
  * arrays once per window — the exact HOF-fold shape that measured ~100×
  * against native expressions elsewhere in this library.
  *
  * Parity contract with the declarative form (WordGramParity test pins it,
  * and the DuckDB oracle rows replay it):
  *  - tokens: `split(trim(text), "[ \t\n\r\f]+")` with Spark's exact
  *    semantics — `UTF8String.trim()` itself is called for the trim, and
  *    Java-regex split with limit −1 (a leading separator yields a leading
  *    EMPTY token; a trailing non-space separator a trailing one);
  *  - windows: every run of `n` consecutive tokens joined by single
  *    spaces, in position order;
  *  - fewer than `n` tokens → EMPTY array (the callers' `size >= n`
  *    guard, folded in — `explode` then drops the document);
  *  - `distinct = true` keeps first occurrences in order
  *    (`array_distinct` semantics);
  *  - `dropEmpty = true` filters empty tokens first — the
  *    `filter(split(...), t => length(t) > 0)` tokenization used by the
  *    span-dedup op (boundary separators then produce no empty tokens).
  */
case class WordGrams(child: Expression, n: Int, distinct: Boolean,
                     dropEmpty: Boolean = false)
    extends UnaryExpression {
  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING input, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_grams"

  override protected def nullSafeEval(v: Any): Any =
    WordGrams.compute(v.asInstanceOf[UTF8String], n, distinct, dropEmpty)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.WordGrams.compute($v, $n, $distinct, $dropEmpty);")

  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)
}

object WordGrams {

  private val Sep = java.util.regex.Pattern.compile("[ \\t\\n\\r\\f]+")

  def compute(s: UTF8String, n: Int, distinct: Boolean,
              dropEmpty: Boolean): GenericArrayData = {
    // UTF8String.trim() is the exact Spark `trim` (spaces only — a leading
    // tab survives and yields a leading empty token, like the declarative
    // form); split with limit -1 keeps boundary empties the same way
    val raw = Sep.split(s.trim().toString, -1)
    val toks = if (dropEmpty) raw.filter(_.nonEmpty) else raw
    if (toks.length < n)
      return new GenericArrayData(Array.empty[Any])
    val nW = toks.length - n + 1
    if (distinct) {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i < nW) {
        seen.add(joinWindow(toks, i, n))
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](nW)
      var i = 0
      while (i < nW) {
        out(i) = UTF8String.fromString(joinWindow(toks, i, n))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  private def joinWindow(toks: Array[String], off: Int, n: Int): String = {
    var len = n - 1
    var j = 0
    while (j < n) { len += toks(off + j).length; j += 1 }
    val sb = new java.lang.StringBuilder(len)
    j = 0
    while (j < n) {
      if (j > 0) sb.append(' ')
      sb.append(toks(off + j))
      j += 1
    }
    sb.toString
  }
}
