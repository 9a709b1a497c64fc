package graft

import graft.queries.GraphOps

/** q264's estimator contract: the md5 coin makes the whole estimator
  * deterministic (so the oracle hash-matches), p = 100% degenerates
  * to EXACT counting (the reference the envelope is measured
  * against), and the p = 25% estimate lands inside a measured error
  * envelope on the real co-purchase graph at two SFs. The envelope
  * is generous vs the measured errors (6.8% at sf0.001, 2.3% at
  * sf0.01) because the md5 coin is fixed — this pins against
  * regressions in the sampling/orientation/scaling arithmetic, not
  * against sampling luck, which cannot vary. */
class SampledTriangleSpec extends SparkSpec {

  private def row(sfDir: String, p: Int): (Long, Long, Long) = {
    val r = GraphOps.trianglesSampled(spark, sfDir, p).head()
    (r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("p=100% sampling is exact: every edge kept, scale factor 1") {
    val (nE, tri, est) = row(sf(), 100)
    assert(est == tri, s"est $est != tri $tri at p=100")
    // every edge survives the <100 bucket test
    val (nE25, tri25, _) = row(sf(), 25)
    assert(nE25 < nE, "p=25 kept every edge — the coin is dead")
    assert(tri25 < tri, "sampling removed no triangles")
  }

  test("p=25% estimate lands in the measured envelope at two SFs") {
    Seq(sf(), sf("sf0.01")).foreach { d =>
      val (_, _, exact) = row(d, 100) // p=100 IS the exact total
      val (_, _, est) = row(d, 25)
      val rel = math.abs(est - exact).toDouble / exact
      assert(rel <= 0.15,
        s"$d: relative error $rel (est $est vs exact $exact) " +
          "outside the pinned envelope")
    }
  }

  test("the estimator is deterministic call-to-call") {
    assert(row(sf(), 25) == row(sf(), 25))
  }
}
