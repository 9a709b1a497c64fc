package graft

import java.nio.file.Files
import graft.ingest.{IngestConfig, IngestJob}

/** End-to-end ingest: multiplexed envelope frames → per-stream
  * projected, symbol-partitioned, multi-format output with per-key
  * sample caps — the reference's primary pipeline
  * (`--symbol ... --load ... --output ... --samples N`).
  */
class IngestJobSpec extends SparkSpec {
  import spark.implicits._

  private def tickerFrame(sym: String, i: Int) =
    s"""{"stream":"ticker","symbol":"$sym","data":"{\\"last_price\\":\\"$i.0\\",\\"event_time\\":$i}"}"""
  private def tradeFrame(sym: String, i: Int) =
    s"""{"stream":"trades","symbol":"$sym","data":"{\\"price\\":\\"$i.5\\",\\"event_time\\":$i,\\"is_buyer_maker\\":\\"True\\"}"}"""

  test("replay ingest routes, projects, partitions, caps and fans out") {
    val replay = Files.createTempFile("ingest", ".jsonl")
    val frames =
      (1 to 8).map(i => tickerFrame("BTCUSDT", i)) ++
      (1 to 4).map(i => tickerFrame("ETHUSDT", i)) ++
      (1 to 6).map(i => tradeFrame("BTCUSDT", i)) ++
      (1 to 3).map(i => tickerFrame("DOGEUSDT", i)) // not configured
    Files.writeString(replay, frames.mkString("", "\n", "\n"))
    val out = Files.createTempDirectory("ingest-out").toString

    IngestJob.runReplay(spark, replay.toString, IngestConfig(
      symbols = Seq("BTCUSDT", "ETHUSDT"),
      loadTypes = Seq("ticker", "trades"),
      outputDir = out,
      formats = Seq("json", "parquet"),
      samplesPerKey = Some(5)))

    val ticker = spark.read.parquet(s"$out/stream=ticker/fmt=parquet")
    // BTC capped at 5, ETH has 4, DOGE filtered out
    val bySym = ticker.groupBy($"symbol").count()
      .as[(String, Long)].collect().toMap
    assert(bySym == Map("BTCUSDT" -> 5L, "ETHUSDT" -> 4L))
    assert(ticker.columns.contains("last_price"))

    val trades = spark.read.json(s"$out/stream=trades/fmt=json")
    assert(trades.count() == 5) // capped
    assert(trades.select($"is_buyer_maker").distinct().head().getString(0) == "True")

    // symbol-partitioned directory layout
    assert(new java.io.File(s"$out/stream=ticker/fmt=parquet/symbol=BTCUSDT").exists())
  }
}
