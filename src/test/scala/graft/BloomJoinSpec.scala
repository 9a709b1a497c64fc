package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the shuffle-reduction path for
  * 100 TB fact⋈dim joins that can't broadcast: when one join side has
  * a selective filter, Catalyst plants a bloom filter built from that
  * side's keys UNDER the other side's shuffle, so non-matching fact
  * rows are dropped at the scan instead of being shuffled. This spec
  * pins (a) that the engine's config surface actually injects the
  * filter (`might_contain` in the final plan) and (b) that results
  * are unchanged.
  */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("selective dim filter injects a bloom filter under the fact shuffle") {
    val dir = Files.createTempDirectory("bloom").toString
    spark.range(0, 200000).select(
        (col("id") % 1000).as("k"), col("id").as("v"))
      .write.parquet(s"$dir/fact")
    spark.range(0, 1000).select(col("id").as("k"),
        (col("id") % 50).as("cat"))
      .write.parquet(s"$dir/dim")

    val prev = Map(
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.enabled" ->
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        spark.conf.get(
          "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"))
    try {
      // no broadcast (the 100 TB case: both sides exceed driver memory)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // test-sized tables are below the default 10 GB application-side
      // threshold; at real scale the default applies as-is
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")

      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter($"cat" === 7)
      val joined = fact.join(dim, "k")
        .groupBy($"cat").agg(count(lit(1)).as("n"), sum($"v").as("sv"))

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")

      val row = joined.collect().head
      // cat 7 ⇒ dim keys {7, 57, …, 957} = 20 keys × 200 fact rows
      assert(row.getLong(1) == 4000L, row.toString)
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
