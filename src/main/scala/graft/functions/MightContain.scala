package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL registration for Spark's internal bloom-filter expression pair.
  *
  * `BloomFilterAggregate` (build) and `BloomFilterMightContain`
  * (probe — the codegen'd bit test) are the expressions the runtime
  * bloom-join rule injects; neither is resolvable from user SQL, so
  * the library registers them as `graft_bloom_agg(xxhash64, n_items)`
  * and `graft_might_contain(bloom, xxhash64)` exactly the way
  * [[CosineSimilarity]] registers. This is what lets q118 run the
  * two-phase decontamination shape — a plan-literal bloom prefilter
  * on the corpus scan, then an exact semi-join on the survivors —
  * with both phases in whole-stage codegen and zero UDFs.
  */
object MightContain {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => new BloomFilterAggregate(exprs(0), exprs(1))
        .toAggregateExpression(), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
  }
}
