package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-3-gram shingles of a document, as ONE fused scalar
  * Expression — the zero-shuffle form of the corpus's most shared
  * intermediate. The relational `shingleRows` pipeline pays three
  * exchanges over the tokenized corpus (posexplode → window `lead`
  * sort, the `distinct()` hash-agg, and the per-doc `count` window
  * for `sz`); `shingles3(text)` produces the same distinct shingle
  * set per ROW, so the (doc_id, s, sz) table becomes
  * `select(doc_id, size(arr), explode(arr))` — a map-only scan. At
  * 100 TB that is the difference between shuffling the tokenized
  * corpus three times and never shuffling it at all.
  *
  * Tokenizer and window semantics are IDENTICAL to
  * [[MinHashSigs.compute]] (shared [[MinHashSigs.tokenize]]):
  * `split(trim(lower(text)), '\s+')` with Spark's limit -1, 3-token
  * windows joined by ' ', first-occurrence order, de-duplicated —
  * matching the relational form and the oracles' SQL
  * `list_distinct(list_transform(...))` derivation. Docs under 3
  * tokens yield an empty array (explode drops them — same as the
  * relational form emitting no rows). Parity is pinned row-for-row
  * on real corpora by FunctionsSpec.
  */
case class Shingles3(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingles3"

  override def nullSafeEval(input: Any): Any =
    Shingles3.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Shingles3$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Shingles3 {
  def compute(text: UTF8String): ArrayData = {
    val toks = MinHashSigs.tokenize(text)
    if (toks.length < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    val last = toks.length - 3
    while (i <= last) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1))
        .append(' ').append(toks(i + 2))
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** register `shingles3` in the session's function registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingles3", exprs => Shingles3(exprs(0)), "built-in")

  /** Column-API entry point (requires `register(spark)` once). */
  def shingles3(textCol: String): Column = expr(s"shingles3($textCol)")
}
