package graft

import org.apache.spark.sql.functions._
import graft.functions.HilbertIndex
import graft.queries.LayoutOps

/** Properties of the native order-16 Hilbert expression that the
  * DuckDB oracle (q225) can't check by hash-matching alone:
  *
  *  - bijectivity on a full sub-grid (no two cells share an address);
  *  - the UNIT-STEP walk: consecutive curve addresses are 4-neighbor
  *    moves. Checked on a 128×128 grid placed in the TOP bits
  *    (x << 9, y << 9): Hilbert curves are self-similar, so with the
  *    low 9 bits zero the remaining rounds contribute 0 and the
  *    order-16 walk restricted to the sub-grid IS the order-7 walk —
  *    consecutive addresses must differ by one 512-step in exactly
  *    one dimension;
  *  - the locality win over the z-curve — the reason the expression
  *    exists: the z-order walk over the same grid takes seam jumps
  *    (|Δx|+|Δy| up to grid size), so its mean step length must be
  *    strictly larger;
  *  - the codegen contract: not CodegenFallback, and interpreted
  *    eval == codegen'd eval on a boundary sample.
  */
class HilbertSpec extends SparkSpec {
  import spark.implicits._

  test("hilbert address: bijective, unit-step, tighter than z-order") {
    HilbertIndex.register(spark)
    val n = 128L
    val grid = (for { x <- 0L until n; y <- 0L until n } yield (x, y))
      .toDF("gx", "gy")
      .select($"gx", $"gy",
        expr("hilbert_xy2d(shiftleft(gx, 9), shiftleft(gy, 9))").as("hval"),
        LayoutOps.zValue($"gx", $"gy").as("zval"))
      .cache()

    assert(grid.select($"hval").distinct().count() === n * n,
      "hilbert addresses must be distinct per cell")

    def steps(orderCol: String): Seq[(Long, Long)] = grid
      .orderBy(col(orderCol))
      .select($"gx", $"gy")
      .as[(Long, Long)].collect().toSeq
      .sliding(2).map { case Seq((x1, y1), (x2, y2)) =>
        (math.abs(x2 - x1), math.abs(y2 - y1))
      }.toSeq

    val hSteps = steps("hval")
    assert(hSteps.forall { case (dx, dy) => dx + dy == 1 },
      "every hilbert step must be a 4-neighbor move")

    val zMean = steps("zval").map { case (dx, dy) => dx + dy }.sum.toDouble /
      (n * n - 1)
    assert(zMean > 1.3,
      s"z-curve seam jumps should push its mean step well above 1, got $zMean")
  }

  test("hilbert codegen: no fallback; interpreted == codegen on boundaries") {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    assert(!classOf[CodegenFallback].isAssignableFrom(classOf[HilbertIndex]),
      "HilbertIndex is CodegenFallback — doGenCode is dead code")
    HilbertIndex.register(spark)
    // quadrant seams + extremes, where the rotate/reflect logic flips
    val pts = Seq(0L, 1L, 32767L, 32768L, 32769L, 65535L)
    val df = (for { x <- pts; y <- pts } yield (x, y)).toDF("x", "y")
    val viaPlan = df.select(expr("hilbert_xy2d(x, y)")).as[Long].collect()
    import org.apache.spark.sql.catalyst.expressions.Literal
    val interp = (for { x <- pts; y <- pts } yield
      HilbertIndex(Literal(x), Literal(y)).eval(null)
        .asInstanceOf[Long]).toArray
    assert(viaPlan.sorted.sameElements(interp.sorted),
      "codegen and interpreted eval disagree")
    // masking contract: out-of-range bits are ignored, like zValue
    val masked = spark.sql(
      "SELECT hilbert_xy2d(BIGINT(65536 + 5), BIGINT(131072 + 9)) = " +
        "hilbert_xy2d(BIGINT(5), BIGINT(9))")
      .as[Boolean].head()
    assert(masked, "inputs must be masked to 16 bits")
  }
}
