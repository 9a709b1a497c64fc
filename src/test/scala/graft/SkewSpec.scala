package graft

import org.apache.spark.sql.functions._
import graft.queries.Skew

/** Salted join: result parity with the plain join and actual spread
  * of the hot key across salt values; SQL-surface registration.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join is row-identical to the plain join under skew") {
    // 10k rows, 90% on one hot key
    val fact = spark.range(10000)
      .select($"id",
        when($"id" % 10 === 0, $"id" % 5 + 1).otherwise(0L).as("k"),
        ($"id" * 2).as("payload"))
    val dim = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c"),
      (4L, "d"), (5L, "e")).toDF("k", "name")
    val plain = fact.join(dim, "k").select($"id", $"name")
    val salted = Skew.saltedJoin(fact, dim, "k", 8, Seq("id"))
      .select($"id", $"name")
    assert(plain.except(salted).isEmpty && salted.except(plain).isEmpty)
    assert(salted.count() == 10000)
  }

  test("salt actually spreads the hot key") {
    val fact = spark.range(1000).select($"id", lit(0L).as("k"))
    val spread = fact
      .withColumn("__salt", pmod(hash($"id"), lit(8)))
      .groupBy($"__salt").count().count()
    assert(spread == 8)
  }

  test("registerTables exposes the SQL surface") {
    Skew.registerTables(spark, sf())
    val n = spark.sql(
      "SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
      .head().getLong(0)
    assert(n > 0)
  }
}
