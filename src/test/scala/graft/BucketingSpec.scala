package graft

import org.apache.spark.sql.functions._

/** Bucketing: pre-partitioned co-located joins — the shuffle-free
  * join path for repeated large-table joins at scale (write once
  * bucketed by the join key; every subsequent join on that key skips
  * both Exchanges).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
      spark.read.parquet(s"${sf()}/lineitem.parquet")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      spark.read.parquet(s"${sf()}/orders.parquet")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("ord_bucketed")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).count()
      val plan = joined.queryExecution.executedPlan.toString
      // join itself is exchange-free; the only shuffle is the final agg
      val joinPart = plan.split("HashAggregate").last
      assert(joinPart.contains("SortMergeJoin"))
      assert(!joinPart.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(joined.count() == 5)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
