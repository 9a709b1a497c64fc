package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native codegen'd intersection of two SORTED `array<long>` (or
  * `array<int>`) columns via a two-pointer merge scan — O(n+m) on
  * primitive elements inside whole-stage codegen.
  *
  * Why not `array_intersect`: Spark's ArrayIntersect builds a boxed
  * hash set per row (and is CodegenFallback in the binary-null-safe
  * shape used here), which is exactly the per-row allocation storm
  * the §2.10 escalation ladder exists to avoid — on the triangle
  * counting adjacency intersection it was the dominant cost of the
  * whole query. Callers guarantee sortedness (both graph adjacency
  * arrays and shingle-hash sets are built with `sort_array`) and
  * distinctness; under those preconditions the merge scan emits the
  * same element set ascending.
  *
  * The int form exists for the compact-id regime of the graph
  * family (GraphOps.orientedAdjacency): when every node id fits in
  * 32 bits, int adjacency arrays halve the bytes the triangle join
  * shuffles AND the bytes this merge scan streams — the dominant
  * cost of the whole query once the adjacency outgrows broadcast.
  * Both inputs must have the SAME element type; mixing int and long
  * fails at analysis rather than silently widening.
  */
case class SortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  // SQL-registered and extension-injected, so misuse (array<string>,
  // mixed widths) must fail at ANALYSIS — getLong/getInt on
  // mistyped ArrayData would silently read garbage otherwise.
  // Element nullability is accepted (collect_list-built arrays are
  // typed containsNull=true even when no null can occur); a null
  // element reads as 0, within the caller-guaranteed sorted/distinct
  // precondition documented above.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_common requires two array<bigint> or two array<int> " +
          s"arguments, got ${l.catalogString} and ${r.catalogString}")
    }

  private def isInt: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == IntegerType

  override def dataType: DataType =
    ArrayType(if (isInt) IntegerType else LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_common"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    if (isInt) {
      val buf = new Array[Int](math.min(n, m))
      var i = 0; var j = 0; var k = 0
      while (i < n && j < m) {
        val xa = x.getInt(i); val yb = y.getInt(j)
        if (xa < yb) i += 1
        else if (xa > yb) j += 1
        else { buf(k) = xa; k += 1; i += 1; j += 1 }
      }
      ArrayData.toArrayData(java.util.Arrays.copyOf(buf, k))
    } else {
      val buf = new Array[Long](math.min(n, m))
      var i = 0; var j = 0; var k = 0
      while (i < n && j < m) {
        val xa = x.getLong(i); val yb = y.getLong(j)
        if (xa < yb) i += 1
        else if (xa > yb) j += 1
        else { buf(k) = xa; k += 1; i += 1; j += 1 }
      }
      ArrayData.toArrayData(java.util.Arrays.copyOf(buf, k))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val (jt, getter) = if (isInt) ("int", "getInt") else ("long", "getLong")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val buf = ctx.freshName("buf")
      val xa = ctx.freshName("xa"); val yb = ctx.freshName("yb")
      s"""
         |int $n = $x.numElements();
         |int $m = $y.numElements();
         |$jt[] $buf = new $jt[java.lang.Math.min($n, $m)];
         |int $i = 0, $j = 0, $k = 0;
         |while ($i < $n && $j < $m) {
         |  $jt $xa = $x.$getter($i);
         |  $jt $yb = $y.$getter($j);
         |  if ($xa < $yb) { $i++; }
         |  else if ($xa > $yb) { $j++; }
         |  else { $buf[$k++] = $xa; $i++; $j++; }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData
         |  .toArrayData(java.util.Arrays.copyOf($buf, $k));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersect {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_common", exprs => SortedIntersect(exprs(0), exprs(1)),
      "built-in")

  /** Column-API entry point (requires `register(spark)` once). */
  def sorted_common(a: String, b: String): Column =
    expr(s"sorted_common($a, $b)")
}
