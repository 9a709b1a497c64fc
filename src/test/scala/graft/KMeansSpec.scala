package graft

import graft.queries.SimilarityOps

/** q111 k-means (sf0.001, 500 vectors): the clustering must be
  * bit-deterministic (integer centroids, md5 init, first-index
  * tie-break), produce k populated clusters on this data, and
  * actually descend its objective — WCSS under the final centroids
  * must improve materially on the objective under the initial ones.
  * Per-step monotonicity allows a hair of slack: truncating the mean
  * to integer units can cost a rounding epsilon of the exact-mean
  * optimality that Lloyd's proof assumes.
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  test("q111 k-means: deterministic, k clusters, objective descends") {
    val (out1, hist1) = SimilarityOps.kmeans(spark, sf(), k = 8, iters = 5)
    val (out2, hist2) = SimilarityOps.kmeans(spark, sf(), k = 8, iters = 5)
    val r1 = out1.select($"cluster", $"n_points", $"wcss")
      .as[(Long, Long, Long)].collect().toSeq
    val r2 = out2.select($"cluster", $"n_points", $"wcss")
      .as[(Long, Long, Long)].collect().toSeq
    assert(r1 == r2, "two identical runs diverged")
    assert(hist1 == hist2, "WCSS trajectories diverged")

    assert(r1.map(_._1).toSet == (0L until 8L).toSet,
      s"expected 8 populated clusters, got ${r1.map(_._1)}")
    assert(r1.map(_._2).sum == 500, "every vector assigned exactly once")

    val finalWcss = r1.map(_._3).sum
    assert(finalWcss < hist1.head,
      s"objective did not improve: init=${hist1.head} final=$finalWcss")
    // near-monotone descent (integer-truncated centroids may cost a
    // rounding epsilon per step)
    (hist1 :+ finalWcss).sliding(2).foreach { case Seq(a, b) =>
      assert(b.toDouble <= a.toDouble * 1.001, s"ascent $a -> $b")
    }
  }
}
