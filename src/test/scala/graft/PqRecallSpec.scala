package graft

import graft.queries.SimilarityOps

/** PQ-ADC quality (q84, sf0.001, 500 vectors): 4-byte codes + lookup
  * distances must still put most true top-5 neighbors in the exact
  * re-rank output, and widening the shortlist can only help (the
  * re-rank is exact, so recall is monotone in shortlist size — the
  * PQ analog of IVF's nprobe dial).
  */
class PqRecallSpec extends SparkSpec {
  import spark.implicits._

  private def top5(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select($"qid", $"vec_id").as[(Long, Long)].collect().toSet

  test("q84 PQ recall@5 vs brute force; monotone in shortlist size") {
    val truth = top5(SparkEntry.queries("q40_knn_bruteforce")(spark, sf()))
    val narrow = top5(SimilarityOps.knnPq(spark, sf(), shortlist = 20))
    val wide = top5(SimilarityOps.knnPq(spark, sf(), shortlist = 100))
    val rNarrow = (truth intersect narrow).size.toDouble / truth.size
    val rWide = (truth intersect wide).size.toDouble / truth.size
    assert(rWide >= rNarrow, s"wide=$rWide < narrow=$rNarrow")
    assert(rWide >= 0.5, s"PQ recall unusable: $rWide")
  }
}
