package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass per-document term frequencies: tokenize on whitespace
  * and emit `ARRAY<STRUCT<term STRING, tf INT>>`, one entry per DISTINCT
  * token in first-occurrence order.
  *
  * Why: computing tf declaratively costs `explode(tokens)` →
  * `groupBy(doc, term).count()` — a corpus-sized shuffle keyed by
  * (doc, term) that exists only to count within single documents. This
  * expression counts map-side in one pass, so an inverted-index build
  * (RetrievalOps) ships pre-aggregated (doc, term, tf) rows with NO
  * corpus shuffle at all for the tf stage.
  *
  * Tokenization contract matches [[NgramBucketHashes]] and the DuckDB
  * oracles: maximal runs split on space/tab/LF/CR/FF, empties dropped,
  * case-folding done by the CALLER (`lower(trim(text))`). Determinism:
  * entry order is first occurrence, and consumers aggregate anyway. */
case class TokenTfEntries(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING input, got ${other.simpleString}")
    }

  override def dataType: DataType = TokenTfEntries.OutType

  override def prettyName: String = "token_tf_entries"

  override protected def nullSafeEval(v: Any): Any =
    TokenTfEntries.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TokenTfEntries.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): TokenTfEntries =
    copy(child = newChild)
}

object TokenTfEntries {

  val OutType: ArrayType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", IntegerType, nullable = false))), containsNull = false)

  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.length
    // LinkedHashMap: first-occurrence order, deterministic output
    val counts = new java.util.LinkedHashMap[String, Integer]()
    var i = 0
    while (i < n) {
      var start = i
      var inSep = true
      while (i < n && inSep) {
        val c = str.charAt(i)
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f') { i += 1; start = i }
        else inSep = false
      }
      if (i < n) {
        var tokEnd = false
        while (i < n && !tokEnd) {
          val c = str.charAt(i)
          if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f') tokEnd = true
          else i += 1
        }
        val tok = str.substring(start, i)
        val prev = counts.get(tok)
        counts.put(tok, if (prev == null) 1 else prev + 1)
      }
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue.intValue()))
      j += 1
    }
    new GenericArrayData(out)
  }
}
