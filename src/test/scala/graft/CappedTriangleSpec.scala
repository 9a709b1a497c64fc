package graft

import org.apache.spark.sql.functions._

import graft.queries.GraphOps

/** The degree-capped triangle variant's bias contract (q261), pinned
  * on the real co-purchase graph: capping is a DETERMINISTIC
  * under-count — never above exact, monotone in the cap, and exactly
  * the q123 counts once the cap clears the max oriented out-degree.
  * These three properties ARE the stated bound: the only error is
  * triangles whose wedge node had >dMax oriented neighbors, so the
  * count converges to exact from below as dMax grows.
  */
class CappedTriangleSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf()

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.select($"node", $"triangles").as[(Long, Long)].collect().toMap

  test("uncapped-in-practice dMax reproduces exact q123 bit-for-bit") {
    val exact = GraphOps.triangles(spark, dir).collect().toSeq
    val capped = GraphOps.trianglesCapped(spark, dir, 1 << 20)
      .collect().toSeq
    assert(capped === exact)
  }

  test("capped counts are <= exact and monotone in dMax") {
    val exact = asMap(GraphOps.triangles(spark, dir))
    val c8 = asMap(GraphOps.trianglesCapped(spark, dir, 8))
    val c32 = asMap(GraphOps.trianglesCapped(spark, dir, 32))
    // per node (on the reported top-100s): under-count, monotone
    c8.foreach { case (n, t) =>
      c32.get(n).foreach(t32 => assert(t <= t32, s"node $n: c8 > c32"))
      exact.get(n).foreach(te => assert(t <= te, s"node $n: c8 > exact"))
    }
    c32.foreach { case (n, t) =>
      exact.get(n).foreach(te => assert(t <= te, s"node $n: c32 > exact"))
    }
    // aggregate mass: any 100-node selection of capped counts is
    // bounded by the top-100 exact mass
    assert(c8.values.sum <= exact.values.sum)
    assert(c32.values.sum <= exact.values.sum)
    // the cap at 8 must actually bite on this graph (k-core 60+ —
    // a vacuous test would pass on an empty difference)
    assert(c8.values.sum < exact.values.sum,
      "dMax=8 did not truncate anything; contract untested")
  }
}
