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

  private def summarize(fit: (org.apache.spark.sql.DataFrame, Seq[Long])) =
    (fit._1.groupBy($"cluster")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum($"dist").as("w"))
      .orderBy($"cluster")
      .as[(Long, Long, Long)].collect().toSeq, fit._2)

  test("literal and broadcast-join assignment paths are bit-identical") {
    // one k, both paths forced — every (cluster, count, wcss) row and
    // the whole WCSS trajectory must match exactly
    val lit = summarize(SimilarityOps.kmeansFit(spark, sf(), k = 8,
      iters = 3, assignViaJoin = Some(false)))
    val join = summarize(SimilarityOps.kmeansFit(spark, sf(), k = 8,
      iters = 3, assignViaJoin = Some(true)))
    assert(lit == join, s"paths diverged:\n$lit\n$join")
  }

  test("k=64 via the join path: deterministic, populated, descending") {
    // k=64 auto-selects the broadcast-join path (> KmeansLiteralMaxK);
    // the production SemDeDup shape where plan-literal centroids stop
    // being viable
    val (sum1, hist1) = summarize(
      SimilarityOps.kmeansFit(spark, sf(), k = 64, iters = 3))
    val (sum2, hist2) = summarize(
      SimilarityOps.kmeansFit(spark, sf(), k = 64, iters = 3))
    assert(sum1 == sum2 && hist1 == hist2, "k=64 runs diverged")
    assert(sum1.map(_._2).sum == 500, "every vector assigned exactly once")
    assert(sum1.size > 32, s"only ${sum1.size} of 64 clusters populated")
    val finalWcss = sum1.map(_._3).sum
    assert(finalWcss < hist1.head,
      s"objective did not improve: init=${hist1.head} final=$finalWcss")
  }
}
