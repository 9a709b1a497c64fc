package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ingest.Projections
import graft.queries.SketchOps
import graft.streaming.StandingHllRegisters

/** End-to-end ingest→artifact integration: the reference's wire
  * surface (ws-replay source → envelope parse → trade projection)
  * feeding a batch-id-versioned maintenance loop — the full
  * production chain in one query, exactly-once from wire frames to
  * standing parquet. The register full-merge must equal a batch
  * derivation over every frame regardless of micro-batch chopping
  * (max-merge is chop-independent), and a stop → file-grow → restart
  * from the same checkpoint must absorb exactly the new frames.
  */
class IngestToArtifactSpec extends SparkSpec {
  import spark.implicits._

  private def tradeLine(sym: String, tt: Long): String =
    s"""{"stream":"trades","symbol":"$sym","data":"{\\"event_time\\":$tt,""" +
      s"""\\"price\\":\\"1.0\\",\\"quantity\\":\\"2\\",\\"trade_time\\":$tt,""" +
      s"""\\"is_buyer_maker\\":\\"True\\"}"}"""

  /** batch-side expected registers over (grp, trade_time) pairs. */
  private def expectedRegs(pairs: Seq[(String, Long)])
      : Set[(String, Long, Long)] =
    SketchOps.hllRho(pairs.toDF("grp", "tt")
        .select(col("grp"), md5(col("tt").cast("string")).as("h")))
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("rho")).cast("long").as("m"))
      .select(col("grp"), col("bucket").cast("long"), col("m"))
      .as[(String, Long, Long)].collect().toSet

  private def fullMerge(root: String): Set[(String, Long, Long)] =
    StandingHllRegisters.readLatest(spark, root)
      .groupBy(col("grp"), col("bucket")).agg(max(col("m")).as("m"))
      .as[(String, Long, Long)].collect().toSet

  test("wire frames maintain standing HLL registers exactly-once across restart") {
    val trades = (1L to 20L).map(i =>
      (if (i % 3 == 0) "ETHUSDT" else "BTCUSDT", i))
    val f = Files.createTempFile("ws-loop", ".jsonl")
    Files.writeString(f,
      trades.map { case (s, t) => tradeLine(s, t) }
        .mkString("", "\n", "\n"))
    val root = Files.createTempDirectory("ingest-hll").toString
    val ckpt = Files.createTempDirectory("ingest-hll-ckpt").toString
    def start() = {
      val stream = spark.readStream.format("ws-replay")
        .option("path", f.toString)
        .option("maxFramesPerTrigger", "7") // forces >= 3 micro-batches
        .load()
      val obs = Projections.parseEnvelope(stream, "trades")
        .select(col("symbol").as("grp"),
          md5(col("trade_time").cast("string")).as("h"))
      StandingHllRegisters.maintainStream(obs, root, ckpt)
    }
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(fullMerge(root) == expectedRegs(trades))
    // stop → grow the wire file → restart from the SAME checkpoint:
    // the source resumes after its committed frame offsets, so the
    // loop absorbs exactly frames 21-30 (no re-absorb, no gap), and
    // the standing artifact converges to all 30 trades
    val more = (21L to 30L).map(i => ("BTCUSDT", i))
    Files.writeString(f,
      Files.readString(f) +
        more.map { case (s, t) => tradeLine(s, t) }
          .mkString("", "\n", "\n"))
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    assert(fullMerge(root) == expectedRegs(trades ++ more))
    // the consumer-facing estimates off the standing artifact equal
    // an independent estimate over the expected registers bit-for-bit
    val est = StandingHllRegisters.estimates(spark, root)
      .select(col("grp"), col("s_fp"), col("est_fp"))
      .as[(String, Long, Long)].collect().toSet
    val expEst = SketchOps.hllEstimate(
        expectedRegs(trades ++ more).toSeq.toDF("grp", "bucket", "m"),
        Seq("grp"))
      .select(col("grp"), col("s_fp"), col("est_fp"))
      .as[(String, Long, Long)].collect().toSet
    assert(est == expEst)
  }
}
