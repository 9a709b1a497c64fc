package graft

import org.apache.spark.sql.{Encoders, functions => F}
import org.apache.spark.sql.functions._

/** Spark 4 defaults `spark.sql.ansi.enabled=true`, which turns two
  * formerly-silent degradations into runtime throws: casting a
  * regexp_extract non-match ('') to a number, and element_at past
  * the end of an array. The catalog uses try_cast / try_element_at
  * so malformed or small inputs degrade to NULL exactly like the
  * DuckDB oracle's permissive CAST / conditional-max formulations.
  * These specs drive the paths the parquet testdata never exercises
  * (every props row matches; every event_type group has ≥3 rows).
  */
class AnsiSafetySpec extends SparkSpec {
  import spark.implicits._

  test("q59 shape: non-matching props rows yield NULL k, not a throw") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    val df = Seq("{\"k\": 7}", "no digits here", "", "{\"k\":}")
      .toDF("props")
      .select(regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1)
        .try_cast("long").as("k"))
    val ks = df.collect().map(r => Option(r.get(0)))
    assert(ks.toSeq == Seq(Some(7L), None, None, None))
  }

  test("q61 shape: groups smaller than k pad with NULL via try_element_at") {
    val top3 = udaf(new graft.functions.TopKMin(3), Encoders.scalaDouble)
    val out = Seq(("a", 2.0), ("a", 1.0), ("b", 5.0))
      .toDF("event_type", "value")
      .groupBy(col("event_type"))
      .agg(top3(col("value")).as("t3"))
      .select(col("event_type"),
        F.try_element_at(col("t3"), lit(1)).as("v1"),
        F.try_element_at(col("t3"), lit(2)).as("v2"),
        F.try_element_at(col("t3"), lit(3)).as("v3"))
      .orderBy(col("event_type"))
      .collect()
    assert(out.length == 2)
    val a = out(0); val b = out(1)
    assert(a.getDouble(1) == 1.0 && a.getDouble(2) == 2.0 && a.isNullAt(3))
    assert(b.getDouble(1) == 5.0 && b.isNullAt(2) && b.isNullAt(3))
  }
}
