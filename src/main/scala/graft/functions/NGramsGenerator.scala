package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst GENERATOR (the UDTF rung of SURVEY §2.10's
  * escalation ladder, alongside the scalar Expressions and typed
  * Aggregators): `ngrams(tokens, n)` emits one (pos, gram) row per
  * word n-gram of a token array — the table-function form of the
  * shingle builder.
  *
  * Implements `CollectionGenerator` so the planner places it in a
  * `Generate` node exactly like `posexplode` (outer=false here;
  * wrap in `outer()` at call sites needing left-outer semantics).
  * Generators evaluate row-at-a-time (CodegenFallback is the norm —
  * Spark's own `Stack`/`JsonTuple` do the same), which is fine for
  * a generator whose output dominates its own evaluation cost; the
  * HOT shingle pipeline (TextOps.shingleRows) instead uses the
  * scalar `shingles3` Expression + built-in explode — fully inside
  * whole-stage codegen AND shuffle-free — so this operator exists
  * for the API surface and for ad-hoc n-gram expansion at other
  * window sizes where plan shape matters less.
  *
  * `n` must be a foldable positive integer (checked at plan time via
  * the first eval; a data-dependent n would make the output schema
  * row-dependent, which generators forbid).
  */
case class NGramsGenerator(child: Expression, n: Int)
    extends UnaryExpression with CollectionGenerator with CodegenFallback {

  require(n > 0, "ngrams: n must be positive")

  override def position: Boolean = true
  override def inline: Boolean = false

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  override def collectionType: ArrayType =
    ArrayType(elementSchema, containsNull = false)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) return Nil
    val tokens = arr.asInstanceOf[ArrayData]
    val m = tokens.numElements() - n + 1
    if (m <= 0) return Nil
    // windows containing a null token are skipped (not emitted),
    // matching the containsNull-tolerant behavior of the built-in
    // generators — the function is SQL-registered, so ad-hoc input
    // arrays may carry nulls even though split() output never does
    (0 until m).iterator.flatMap { i =>
      val sb = new StringBuilder
      var j = 0
      var hasNull = false
      while (j < n && !hasNull) {
        if (tokens.isNullAt(i + j)) hasNull = true
        else {
          if (j > 0) sb.append(' ')
          sb.append(tokens.getUTF8String(i + j).toString)
          j += 1
        }
      }
      if (hasNull) Iterator.empty
      else Iterator.single(
        InternalRow(i.toLong, UTF8String.fromString(sb.toString)))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NGramsGenerator {
  /** register `ngrams(tokens, n)` in the session's function registry;
    * usable in SQL as `SELECT ... FROM t LATERAL VIEW ngrams(tk, 3)`
    * or via `selectExpr("ngrams(tk, 3)")`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ngrams",
      exprs => {
        val nLit = exprs(1) match {
          case e if e.foldable =>
            e.eval(InternalRow.empty).asInstanceOf[Number].intValue()
          case _ => throw new IllegalArgumentException(
            "ngrams: n must be a literal")
        }
        NGramsGenerator(exprs(0), nLit)
      },
      "built-in")
}
