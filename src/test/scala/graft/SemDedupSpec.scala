package graft

import graft.queries.SimilarityOps

/** q116 SemDeDup (sf0.001, 500 vectors, k=8, τ=0.4 — the corpus-
  * calibrated "near" threshold q60 uses; the synthetic embeddings
  * top out at cosine ≈ 0.51): the summary
  * must be deterministic and account for every vector, and the
  * keep/drop rule must satisfy its two defining invariants, verified
  * here against BRUTE-FORCE exact cosines recomputed in plain Scala
  * from the same quantized integer vectors:
  *  - no two KEPT members of one cluster are ≥ τ similar (the
  *    dedup guarantee — the farther-from-centroid survivor rule
  *    kills at least one side of every within-cluster ≥ τ pair);
  *  - every DROPPED member has a within-cluster ≥ τ witness that
  *    out-ranks it (farther from the centroid, or equal-distance
  *    with a lower id) — nothing is dropped without cause.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private val tau = 0.4

  private def cos(a: Seq[Long], b: Seq[Long]): Double = {
    var dot = 0L; var na = 0L; var nb = 0L; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot.toDouble / math.sqrt(na.toDouble * nb.toDouble)
  }

  test("q116 SemDeDup: deterministic, accounted, invariants hold") {
    val s1 = SimilarityOps.semanticDedup(spark, sf())
      .as[(Long, Long, Long, Long)].collect().toSeq
    val s2 = SimilarityOps.semanticDedup(spark, sf())
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(s1 == s2, "two identical runs diverged")
    assert(s1.map(_._2).sum == 500, "every vector accounted once")
    assert(s1.forall(r => r._3 + r._4 == r._2), "kept + dropped = points")
    assert(s1.map(_._4).sum > 0, "τ=0.4 should drop at least one vector")

    val (assignedDf, droppedDf) =
      SimilarityOps.semanticDedupParts(spark, sf(), 8, 5, tau)
    val assigned = assignedDf
      .select($"vec_id", $"v", $"cluster", $"dist")
      .as[(Long, Seq[Long], Long, Long)].collect().toSeq
    val dropped = droppedDf.as[Long].collect().toSet

    val byCluster = assigned.groupBy(_._3)
    for ((_, members) <- byCluster) {
      val kept = members.filterNot(m => dropped(m._1))
      for (Seq(a, b) <- kept.combinations(2))
        assert(cos(a._2, b._2) < tau,
          s"kept pair ${a._1},${b._1} still ≥ τ similar")
      for (m <- members if dropped(m._1)) {
        val witness = members.exists { w =>
          w._1 != m._1 && cos(w._2, m._2) >= tau &&
            (w._4 > m._4 || (w._4 == m._4 && w._1 < m._1))
        }
        assert(witness, s"vec ${m._1} dropped without a ≥ τ witness")
      }
    }
  }
}
