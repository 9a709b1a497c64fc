package graft

import org.apache.spark.sql.types._
import graft.queries.Q

/** Fails FAST — and with a pointer to the fix — when the driver
  * regenerates `/root/testdata` with different column types.
  *
  * Round 8 precedent: `events.ts` silently changed from parquet
  * TIMESTAMP(NANOS) (read as an epoch-nanos long under
  * `nanosAsLong`) to TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ),
  * which surfaced only as a `DATATYPE_MISMATCH` inside one query's
  * bench run. This spec turns any such drift into a named one-line
  * diagnosis: fix it by normalizing in `graft.queries.Q`'s loaders
  * (the way `Q.events` canonicalizes `ts`), never by editing the
  * 167 call sites.
  *
  * The RAW parquet schema is allowed to drift where a loader
  * normalizes it (events.ts below accepts either encoding); what
  * must stay fixed is the POST-LOADER schema the catalog sees.
  */
class SchemaGuardSpec extends SparkSpec {

  private def raw(name: String) =
    spark.read.parquet(s"${sf()}/$name.parquet").schema

  private def fieldTypes(s: StructType): Map[String, DataType] =
    s.fields.map(f => f.name -> f.dataType).toMap

  private def assertTypes(table: String, got: StructType,
      want: Map[String, DataType]): Unit = {
    val g = fieldTypes(got)
    assert(g.keySet == want.keySet,
      s"$table columns drifted: got ${g.keySet.toSeq.sorted}, " +
        s"want ${want.keySet.toSeq.sorted} — normalize in graft.queries.Q")
    for ((c, t) <- want)
      assert(g(c) == t,
        s"$table.$c drifted to ${g(c)} (want $t) — add a cast in " +
          "graft.queries.Q's loader, not in the query bodies")
  }

  test("dimension and fact tables keep the catalog's expected types") {
    assertTypes("region", raw("region"), Map(
      "r_regionkey" -> IntegerType, "r_name" -> StringType))
    assertTypes("nation", raw("nation"), Map(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType))
    assertTypes("customer", raw("customer"), Map(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType))
    assertTypes("supplier", raw("supplier"), Map(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
    assertTypes("part", raw("part"), Map(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
    assertTypes("orders", raw("orders"), Map(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType,
      "o_orderpriority" -> StringType))
    assertTypes("lineitem", raw("lineitem"), Map(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType))
  }

  test("documents and embeddings keep the text/ANN family's types") {
    assertTypes("documents", raw("documents"), Map(
      "doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType,
      "n_chars" -> LongType))
    assertTypes("embeddings", raw("embeddings"), Map(
      "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))
  }

  test("events.ts normalizes to an epoch-nanos long via Q.events") {
    // The RAW ts encoding may drift (nanos long vs TIMESTAMP_NTZ —
    // both seen from the driver); the loader output must not.
    val ev = Q.events(spark, sf())
    val g = fieldTypes(ev.schema)
    assert(g("ts") == LongType,
      s"Q.events must yield ts as epoch-nanos LONG, got ${g("ts")}")
    assert(g("ts_ms") == LongType)
    assert(g("event_id") == LongType && g("user_id") == LongType &&
      g("event_type") == StringType && g("value") == DoubleType &&
      g("props") == StringType,
      s"events columns drifted: $g — normalize in Q.events")
    // sanity: the integer timeline is epoch-scale nanos (year >
    // 2000), not µs/ms misread a thousandfold off
    val ns = ev.selectExpr("min(ts)").head.getLong(0)
    assert(ns > 946684800L * 1000000000L,
      s"events.ts magnitude looks wrong for epoch-nanos: $ns")
  }
}
