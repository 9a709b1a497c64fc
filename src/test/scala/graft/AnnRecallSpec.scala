package graft

import graft.queries.SimilarityOps

/** ANN quality at two LSH resolutions (sf0.001, 500 vectors,
  * brute-force ground truth): the production setting q41 pins (8
  * tables × 4-plane buckets) and the finer setting a 100× corpus
  * needs (8-plane buckets = 256 buckets/table — collision rate cut
  * ~16×, recall bought back with 128 tables; a true neighbor's
  * per-table collision odds fall as p₁^planes, so halving bucket
  * sizes needs geometrically more tables, not linearly more).
  * Asserting the finer setting's recall is at least the coarse
  * setting's demonstrates the knob works: growing the corpus means
  * turning (tables, planes) up, not redesigning the operator.
  *
  * Also pins near-dup recall: the q60 LSH pair search must recover
  * the overwhelming share of true ≥0.4-cosine pairs found by an
  * exact all-pairs pass.
  */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  private def top5(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select($"qid", $"vec_id").as[(Long, Long)].collect().toSet

  test("finer buckets with more tables: recall >= the q41 setting") {
    val truth = top5(SparkEntry.queries("q40_knn_bruteforce")(spark, sf()))
    val coarse = top5(SimilarityOps.knnLsh(spark, sf(), tables = 8, planes = 4))
    val fine = top5(SimilarityOps.knnLsh(spark, sf(), tables = 128, planes = 8))
    val rCoarse = (truth intersect coarse).size.toDouble / truth.size
    val rFine = (truth intersect fine).size.toDouble / truth.size
    assert(rFine >= rCoarse, s"fine=$rFine < coarse=$rCoarse")
    assert(rFine > 0.4, s"fine recall unusable: $rFine")
  }

  test("near-dup LSH pairs recover >=80% of exact >=0.4-cosine pairs") {
    val lsh = SparkEntry.queries("q60_embed_neardup")(spark, sf())
      .select($"da", $"db").as[(Long, Long)].collect().toSet
    // exact ground truth: brute-force all pairs at the same threshold
    val all = SimilarityOps.vecs(spark, sf())
    import org.apache.spark.sql.functions._
    val a = all.select(col("vec_id").as("da"), col("v").as("av"),
      col("n2").as("an2"))
    val b = all.select(col("vec_id").as("db"), col("v").as("bv"),
      col("n2").as("bn2"))
    val exact = a.join(b, col("da") < col("db"))
      .select(col("da"), col("db"),
        (aggregate(zip_with(col("av"), col("bv"), (x, y) => x * y),
          lit(0L), (acc, x) => acc + x).cast("double")
          / sqrt(col("an2").cast("double") * col("bn2").cast("double")))
          .as("cosine"))
      .filter(col("cosine") >= 0.4)
      .select($"da", $"db").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "no exact pairs at sf0.001 — threshold too high")
    val recall = (exact intersect lsh).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall=$recall, missed=${exact diff lsh}")
    // and the LSH path never invents a pair the exact pass rejects
    assert(lsh.subsetOf(exact), s"false positives: ${lsh diff exact}")
  }
}
