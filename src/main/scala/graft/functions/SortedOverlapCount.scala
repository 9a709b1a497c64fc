package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** `sorted_overlap(a, b)` — the COUNT of common elements of two
  * SORTED, DISTINCT arrays, via the same two-pointer merge scan as
  * [[SortedIntersect]] but without materializing the intersection:
  * the Jaccard/containment verify stages only ever consume |A∩B|,
  * and skipping the output array removes the per-pair allocation
  * entirely. Adds the `array<string>` regime the intersect form
  * deliberately rejects — shingle sets are strings, and comparing
  * them directly (UTF8String binary order, the exact order Spark's
  * `sort_array` produces) keeps the verify BIT-EXACT by construction
  * where a hash-projected compare would ride on 2⁻⁶⁰ collision odds.
  *
  * Preconditions (caller-guaranteed, as for sorted_common): both
  * arrays ascending and duplicate-free — `sort_array` over a
  * distinct set. Same element type both sides, checked at analysis.
  */
case class SortedOverlapCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_overlap requires two array<bigint>, two array<int> or " +
          s"two array<string> arguments, got ${l.catalogString} and " +
          s"${r.catalogString}")
    }

  private def elemType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_overlap"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var k = 0
    elemType match {
      case StringType =>
        while (i < n && j < m) {
          val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
          if (c < 0) i += 1
          else if (c > 0) j += 1
          else { k += 1; i += 1; j += 1 }
        }
      case IntegerType =>
        while (i < n && j < m) {
          val xa = x.getInt(i); val yb = y.getInt(j)
          if (xa < yb) i += 1
          else if (xa > yb) j += 1
          else { k += 1; i += 1; j += 1 }
        }
      case _ =>
        while (i < n && j < m) {
          val xa = x.getLong(i); val yb = y.getLong(j)
          if (xa < yb) i += 1
          else if (xa > yb) j += 1
          else { k += 1; i += 1; j += 1 }
        }
    }
    k
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val step = elemType match {
        case StringType =>
          val c = ctx.freshName("c")
          s"""int $c = $x.getUTF8String($i).compareTo($y.getUTF8String($j));
             |if ($c < 0) { $i++; }
             |else if ($c > 0) { $j++; }
             |else { $k++; $i++; $j++; }""".stripMargin
        case IntegerType =>
          val xa = ctx.freshName("xa"); val yb = ctx.freshName("yb")
          s"""int $xa = $x.getInt($i); int $yb = $y.getInt($j);
             |if ($xa < $yb) { $i++; } else if ($xa > $yb) { $j++; }
             |else { $k++; $i++; $j++; }""".stripMargin
        case _ =>
          val xa = ctx.freshName("xa"); val yb = ctx.freshName("yb")
          s"""long $xa = $x.getLong($i); long $yb = $y.getLong($j);
             |if ($xa < $yb) { $i++; } else if ($xa > $yb) { $j++; }
             |else { $k++; $i++; $j++; }""".stripMargin
      }
      s"""
         |int $n = $x.numElements();
         |int $m = $y.numElements();
         |int $i = 0, $j = 0, $k = 0;
         |while ($i < $n && $j < $m) {
         |  $step
         |}
         |${ev.value} = $k;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedOverlapCount {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_overlap", exprs => SortedOverlapCount(exprs(0), exprs(1)),
      "built-in")

  /** Column-API entry point (requires `register(spark)` once). */
  def sorted_overlap(a: String, b: String): Column =
    expr(s"sorted_overlap($a, $b)")
}
