package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native codegen'd cosine similarity over two numeric array columns
  * (`array<float|double|long|int>`) — the perf-escalation path of
  * SURVEY.md §2.10: the higher-order-function formulation
  * (`aggregate(zip_with(...))`) allocates lambda frames per element;
  * this compiles to a tight primitive loop inside whole-stage
  * codegen, the right shape for scoring billions of pairs (measured
  * ~10× over the HOF form on the KNN verify stages).
  *
  * Accumulates in double, left to right. For quantized integer
  * vectors this is EXACT: every partial dot/norm sum stays below
  * 2^53, so the doubles are the true integers and the result is
  * bit-identical to the integer-sum + `dot/sqrt(na*nb)` formulation
  * the DuckDB oracles compute — which is why the oracle-checked
  * KNN/near-dup queries can run their verify stage on this
  * Expression without losing hash-exactness.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be numeric arrays; resolution-time type checks are
  // private[sql] API, so misuse surfaces at runtime (element getter)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  /** element type, dispatched once at plan time (both sides must
    * match; the quantized paths pass long, the float path float). */
  private lazy val elemType = left.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(
      s"cosine_sim expects array inputs, got $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val get: (ArrayData, Int) => Double = elemType match {
      case FloatType   => (ar, j) => ar.getFloat(j).toDouble
      case DoubleType  => (ar, j) => ar.getDouble(j)
      case LongType    => (ar, j) => ar.getLong(j).toDouble
      case IntegerType => (ar, j) => ar.getInt(j).toDouble
      case other => throw new IllegalArgumentException(
        s"cosine_sim: unsupported element type $other")
    }
    while (i < n) {
      val xa = get(x, i); val xb = get(y, i)
      dot += xa * xb; na += xa * xa; nb += xb * xb
      i += 1
    }
    val denom = math.sqrt(na * nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val getter = elemType match {
        case FloatType   => "getFloat"
        case DoubleType  => "getDouble"
        case LongType    => "getLong"
        case IntegerType => "getInt"
        case other => throw new IllegalArgumentException(
          s"cosine_sim: unsupported element type $other")
      }
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xa = ctx.freshName("xa")
      val xb = ctx.freshName("xb")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xa = (double) $x.$getter($i);
         |  double $xb = (double) $y.$getter($i);
         |  $dot += $xa * $xb;
         |  $na += $xa * $xa;
         |  $nb += $xb * $xb;
         |}
         |double $denom = java.lang.Math.sqrt($na * $nb);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** register `cosine_sim` in the session's function registry
    * (per-session alternative to GraftExtensions). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")

  /** Column-API entry point (requires `register(spark)` once). */
  def cosine_sim(a: String, b: String): Column = expr(s"cosine_sim($a, $b)")
}

/** SQL-side registration: `SparkSession.builder()
  * .withExtensions(new GraftExtensions)` (or config
  * `spark.sql.extensions=graft.functions.GraftExtensions`) exposes
  * `cosine_sim(a, b)` to SQL — the SparkSessionExtensions mechanism
  * reserved for operators Spark lacks. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) =>
        CosineSimilarity(children(0), children(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("sq_l2_dist"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SquaredL2].getName, "sq_l2_dist"),
      (children: Seq[Expression]) =>
        SquaredL2(children(0), children(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("sorted_common"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SortedIntersect].getName, "sorted_common"),
      (children: Seq[Expression]) =>
        SortedIntersect(children(0), children(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("minhash16"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[MinHashSigs].getName, "minhash16"),
      (children: Seq[Expression]) => MinHashSigs(children(0))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("shingles3"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[Shingles3].getName, "shingles3"),
      (children: Seq[Expression]) => Shingles3(children(0))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("nfc"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[NfcNormalize].getName, "nfc"),
      (children: Seq[Expression]) => NfcNormalize(children(0))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("sorted_overlap"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SortedOverlapCount].getName, "sorted_overlap"),
      (children: Seq[Expression]) =>
        SortedOverlapCount(children(0), children(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("ngrams"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[NGramsGenerator].getName, "ngrams"),
      (children: Seq[Expression]) => {
        val n = children(1) match {
          case c if c.foldable => c.eval(
            org.apache.spark.sql.catalyst.InternalRow.empty)
            .asInstanceOf[Number].intValue()
          case _ => throw new IllegalArgumentException(
            "ngrams: n must be a literal")
        }
        NGramsGenerator(children(0), n)
      }))
    // NOTE: the native as-of join strategy (graft.plans) is NOT
    // injected here — AsOfJoin.backward registers it idempotently via
    // ExperimentalMethods (works on already-built sessions too), and
    // registering through both paths would have the planner consult
    // the same strategy twice on every query
  }
}
