package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.queries.Q

/** `Q.events` must yield the SAME epoch-nanos integer timeline under
  * every `ts` encoding the driver has shipped: an epoch-nanos LONG
  * (parquet TIMESTAMP(NANOS) read under `nanosAsLong` — rounds ≤7)
  * and TIMESTAMP(MICROS) → TIMESTAMP_NTZ (round 8+). SchemaGuardSpec
  * pins what the CURRENT testdata looks like; this spec pins that the
  * normalization itself is encoding-invariant, so a future flip back
  * (or a third encoding landing in the LongType branch) cannot
  * silently shift every timestamp a thousandfold.
  */
class EventsEncodingSpec extends SparkSpec {

  test("Q.events yields identical epoch-nanos under both ts encodings") {
    import spark.implicits._
    // instants chosen to cross second/ms boundaries and include a
    // sub-ms µs component that a ms-precision bug would drop
    val micros = Seq(
      1609459200000000L,      // 2021-01-01 00:00:00
      1609459200000001L,      // +1 µs
      1700000000123456L,      // arbitrary modern instant, sub-ms tail
      1765432109876543L)
    val base = micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, us, i.toLong, "trade", 1.5, "{}")
    }.toDF("event_id", "us", "user_id", "event_type", "value", "props")

    val dirA = Files.createTempDirectory("graft-enc-long").toString
    base.withColumn("ts", col("us") * 1000L)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dirA/events.parquet")

    val dirB = Files.createTempDirectory("graft-enc-ntz").toString
    base.withColumn("ts",
        timestamp_micros(col("us")).cast("timestamp_ntz"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dirB/events.parquet")

    // confirm the fixtures actually exercise the two distinct branches
    assert(spark.read.parquet(s"$dirA/events.parquet").schema("ts")
      .dataType == org.apache.spark.sql.types.LongType)
    assert(spark.read.parquet(s"$dirB/events.parquet").schema("ts")
      .dataType == org.apache.spark.sql.types.TimestampNTZType)

    def normalized(dir: String): Seq[(Long, Long, Long)] =
      Q.events(spark, dir)
        .select(col("event_id"), col("ts"), col("ts_ms"))
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq

    val a = normalized(dirA)
    val b = normalized(dirB)
    assert(a == b, s"encodings diverged:\n long  -> $a\n ntz   -> $b")
    // and both equal the ground-truth epoch arithmetic
    val want = micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us * 1000L, us / 1000L) }
    assert(a == want, s"normalized timeline wrong: $a vs $want")
  }
}
