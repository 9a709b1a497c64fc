package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing-K carry for bucketed rows-frame windows — the missing
  * piece that lets a bounded trailing window (lag-16 EWMA, trailing-
  * 100 rolling moments) run WITHIN (key, bucket) partitions while
  * seeing exactly the global trailing context across bucket edges.
  *
  * The q166/q239/q241 two-phase family stitches boundary effects at
  * SUMMARY level, which works when the boundary contribution is a
  * closed form (one gap, two products, one backfilled lag). A K-row
  * trailing frame has no such closed form — the first K rows of every
  * bucket each need a DIFFERENT suffix of the preceding rows. So the
  * carry is materialized instead: for every (key, bucket) partition,
  * the K rows that globally precede it are duplicated INTO it,
  * flagged `is_carry = true`, and dropped after the window runs.
  * Correctness: any row that is among the K global predecessors of
  * bucket b lies within the LAST K rows of ONE of the K nearest
  * preceding non-empty buckets (each holds ≥1 row), so concatenating
  * those buckets' K-row tails in order and keeping the last K is
  * exactly the global trailing context.
  *
  * Scale shape: per-bucket tails are K-row `collect_list`s, the
  * concatenation window runs over the ≤nBuckets-row summary per key,
  * and the carry union adds ≤ K·nBuckets rows per key — all bounded
  * by (K, nBuckets), never by |rows|. The data-sized work stays in
  * (key, bucket)-parallel windows.
  */
object Bucketed {

  /** Extend `df` (columns: key, "bucket", "ts_ms", "event_id",
    * payload…) with carry rows and an `is_carry` flag. In-bucket
    * (ts_ms, event_id) order must compose to the global per-key
    * order (true whenever `bucket` is a range-bucket of ts_ms, which
    * pins equal timestamps to one bucket). Callers run their
    * trailing window partitioned by (key, bucket), then
    * `filter(!col("is_carry"))`.
    */
  def withTrailingCarry(df: DataFrame, key: String, k: Int): DataFrame = {
    val fields = Seq("ts_ms", "event_id") ++
      df.columns.filterNot(Set(key, "bucket", "ts_ms", "event_id"))
    val winD = Window.partitionBy(col(key), col("bucket"))
      .orderBy(col("ts_ms").desc, col("event_id").desc)
    // last ≤K rows of each bucket, as one sorted struct array:
    // (ts_ms, event_id) is a unique prefix, so sort_array's
    // lexicographic struct order IS the row order
    val tails = df
      .withColumn("__rnd", row_number().over(winD))
      .filter(col("__rnd") <= k)
      .groupBy(col(key), col("bucket"))
      .agg(sort_array(collect_list(struct(fields.map(col): _*)))
        .as("__tl"))
    // summary-level concatenation of the K nearest preceding tails
    // (frame order = bucket order, each tail internally sorted), then
    // keep the last K elements — the global trailing context
    val wS = Window.partitionBy(col(key)).orderBy(col("bucket"))
      .rowsBetween(-k, -1)
    val carry = tails
      .withColumn("__prev", flatten(collect_list(col("__tl")).over(wS)))
      .withColumn("__carry", expr(
        s"CASE WHEN size(__prev) > $k THEN slice(__prev, -$k, $k) " +
          "ELSE __prev END"))
      .select(col(key), col("bucket"), explode(col("__carry")).as("__e"))
      .select(col(key) +: col("bucket") +:
        fields.map(f => col(s"__e.$f").as(f)) :+
        lit(true).as("is_carry"): _*)
    df.withColumn("is_carry", lit(false)).unionByName(carry)
  }
}
