package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native codegen'd squared-L2 distance over two numeric array
  * columns — the sibling of [[CosineSimilarity]] for distance-based
  * paths (PQ encode/ADC, IVF assignment). Unlike cosine the two
  * sides may carry DIFFERENT element types (the PQ encode compares a
  * quantized long subvector against a double centroid), so getters
  * dispatch per side. Accumulates left-to-right in double — the same
  * IEEE op sequence as the `aggregate(zip_with(...))` higher-order
  * formulation, so swapping it in changes nothing but speed (HOFs
  * are interpreted per element; this is a fused loop inside
  * whole-stage codegen).
  */
case class SquaredL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq_l2_dist"

  private def elemOf(e: Expression, side: String) = e.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(
      s"sq_l2_dist: $side must be a numeric array, got $other")
  }
  private lazy val leftElem = elemOf(left, "left")
  private lazy val rightElem = elemOf(right, "right")

  private def getterName(et: DataType): String = et match {
    case FloatType   => "getFloat"
    case DoubleType  => "getDouble"
    case LongType    => "getLong"
    case IntegerType => "getInt"
    case other => throw new IllegalArgumentException(
      s"sq_l2_dist: unsupported element type $other")
  }

  private def get(et: DataType): (ArrayData, Int) => Double = et match {
    case FloatType   => (ar, j) => ar.getFloat(j).toDouble
    case DoubleType  => (ar, j) => ar.getDouble(j)
    case LongType    => (ar, j) => ar.getLong(j).toDouble
    case IntegerType => (ar, j) => ar.getInt(j).toDouble
    case other => throw new IllegalArgumentException(
      s"sq_l2_dist: unsupported element type $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val gx = get(leftElem); val gy = get(rightElem)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = gx(x, i) - gy(y, i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $x.${getterName(leftElem)}($i)
         |    - (double) $y.${getterName(rightElem)}($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SquaredL2 {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sq_l2_dist", exprs => SquaredL2(exprs(0), exprs(1)), "built-in")
}
