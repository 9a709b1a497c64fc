package graft

import org.apache.spark.sql.functions._

/** Catalog-wide sanity at sf0.001 (the DuckDB hash-compare runs
  * driver-side at sf0.01; these pin cross-query invariants the oracle
  * can't express).
  */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every query runs at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf()).count()
      assert(n >= 0, name)
    }
  }

  test("approx distinct is within 10% of exact") {
    val got = SparkEntry.queries("q19_approx_distinct")(spark, sf())
      .select($"event_type", $"approx_users").as[(String, Long)].collect().toMap
    val exact = graft.queries.Q.events(spark, sf())
      .groupBy($"event_type").agg(countDistinct($"user_id").as("u"))
      .as[(String, Long)].collect().toMap
    got.foreach { case (k, approx) =>
      val ex = exact(k).toDouble
      assert(math.abs(approx - ex) / ex < 0.10, s"$k: $approx vs $ex")
    }
  }

  test("LSH KNN recall against brute force is usable (>40%)") {
    val bf = SparkEntry.queries("q40_knn_bruteforce")(spark, sf())
      .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
    val lsh = SparkEntry.queries("q41_knn_lsh")(spark, sf())
      .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect lsh).size.toDouble / bf.size
    assert(recall > 0.4, s"recall=$recall")
  }

  test("minhash LSH recovers every exact >=0.8 jaccard pair") {
    val lsh = SparkEntry.queries("q36_minhash_lsh")(spark, sf())
      .select($"da", $"db").as[(Long, Long)].collect().toSet
    val exact = SparkEntry.queries("q35_jaccard_pairs")(spark, sf())
      .filter($"jaccard" >= 0.8)
      .select($"da", $"db").as[(Long, Long)].collect().toSet
    assert(exact.subsetOf(lsh), s"missing: ${exact diff lsh}")
  }
}
