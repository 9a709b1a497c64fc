package graft

/** q56's sketch percentiles carry no oracle (engine-specific sketch),
  * so this spec supplies the bound instead — the q19-HLL convention:
  * percentile_approx(accuracy = 1000) guarantees rank error
  * ≤ 1/accuracy, so every approximate value must lie between the
  * exact values at p ± 0.005 (5× headroom over the guarantee).
  */
class ApproxPercentileSpec extends SparkSpec {
  import spark.implicits._

  test("approx percentiles sit within the exact p±0.005 rank band") {
    val approx = SparkEntry.queries("q56_approx_percentile")(spark, sf())
      .as[(String, Double, Double, Double)].collect()
      .map { case (t, p50, p90, p99) => t -> Seq(0.5 -> p50, 0.9 -> p90, 0.99 -> p99) }
    val byType = graft.queries.Q.events(spark, sf())
      .select($"event_type", $"value").as[(String, Double)].collect()
      .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).sorted }
    approx.foreach { case (t, ps) =>
      val sorted = byType(t)
      val n = sorted.length
      def exactAt(p: Double): Double =
        sorted(math.min(n - 1, math.max(0, math.ceil(p * n).toInt - 1)))
      ps.foreach { case (p, v) =>
        val lo = exactAt(math.max(0.0, p - 0.005))
        val hi = exactAt(math.min(1.0, p + 0.005))
        assert(v >= lo && v <= hi,
          s"$t p=$p: $v outside [$lo, $hi] (n=$n)")
      }
    }
  }
}
