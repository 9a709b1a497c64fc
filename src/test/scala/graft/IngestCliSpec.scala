package graft

import java.nio.file.Files

import graft.ingest.IngestCli

/** The CLI surface (`binance-di.py:217-240` parity): argv parsing
  * rules and the full main path — argv → config → replay ingest →
  * partitioned files / console modes.
  */
class IngestCliSpec extends SparkSpec {
  import spark.implicits._

  test("parseArguments: defaults, comma lists, upcased symbols") {
    val p = IngestCli.parseArguments(Array(
      "--symbol", "btcusdt,ethusdt", "--output", "json,parquet",
      "--samples", "7", "--replay", "/tmp/x.jsonl"))
    assert(p.config.symbols == Seq("BTCUSDT", "ETHUSDT"))
    // reference defaults: klines is opt-in (binance-di.py:220),
    // output dir is 'data' (binance-di.py:223)
    assert(p.config.loadTypes == Seq("ticker", "trades", "order-book"))
    assert(p.config.formats == Seq("json", "parquet"))
    assert(p.config.samplesPerKey.contains(7))
    assert(p.config.outputDir == "data")
    assert(p.interval == "1m")
    assert(!p.printHuman && !p.printOnly)
    assert(p.checkpoint.isEmpty)
    assert(!p.testnet && p.log.isEmpty)
  }

  test("parseArguments: reference-only flags accepted (--testnet, --log)") {
    val p = IngestCli.parseArguments(Array(
      "--symbol", "X", "--print", "--replay", "f",
      "--testnet", "--log"))
    assert(p.testnet && p.log.contains("binance-di.log"))
    val q = IngestCli.parseArguments(Array(
      "--symbol", "X", "--print", "--log", "custom.log", "--replay", "f"))
    assert(q.log.contains("custom.log"))
  }

  test("parseArguments: rejects bad input") {
    def bad(args: String*): String =
      intercept[IllegalArgumentException](
        IngestCli.parseArguments(args.toArray)).getMessage
    assert(bad("--output", "json", "--replay", "f").contains("--symbol"))
    assert(bad("--symbol", "X", "--output", "json")
      .contains("--replay or --ws-url"))
    assert(bad("--symbol", "X", "--load", "sushi", "--replay", "f")
      .contains("sushi"))
    assert(bad("--symbol", "X", "--output", "xml", "--replay", "f")
      .contains("xml"))
    assert(bad("--symbol", "X", "--samples", "many", "--output", "json",
      "--replay", "f").contains("number"))
    assert(bad("--symbol", "X", "--replay", "f").contains("nothing to do"))
    // argparse mutually-exclusive group parity (binance-di.py:229-231)
    assert(bad("--symbol", "X", "--print", "--print-only", "--replay", "f")
      .contains("mutually exclusive"))
    assert(bad("--wat").contains("--wat"))
  }

  private def frame(stream: String, sym: String, i: Int) =
    s"""{"stream":"$stream","symbol":"$sym","data":"{\\"price\\":\\"$i.5\\",\\"event_time\\":$i,\\"is_buyer_maker\\":\\"True\\"}"}"""

  test("main path: argv to partitioned files, caps applied") {
    val replay = Files.createTempFile("cli", ".jsonl")
    val frames = (1 to 9).map(i => frame("trades", "BTCUSDT", i)) ++
      (1 to 3).map(i => frame("trades", "ETHUSDT", i)) ++
      (1 to 2).map(i => frame("ticker", "BTCUSDT", i))
    Files.writeString(replay, frames.mkString("", "\n", "\n"))
    val out = Files.createTempDirectory("cli-out").toString

    IngestCli.run(spark, IngestCli.parseArguments(Array(
      "--symbol", "BTCUSDT,ETHUSDT", "--load", "trades",
      "--output", "parquet", "--output-dir", out,
      "--samples", "4", "--replay", replay.toString)))

    val trades = spark.read.parquet(s"$out/stream=trades/fmt=parquet")
    val bySym = trades.groupBy($"symbol").count()
      .as[(String, Long)].collect().toMap
    assert(bySym == Map("BTCUSDT" -> 4L, "ETHUSDT" -> 3L))
  }

  test("print-only mode emits one envelope line per frame, no files") {
    val replay = Files.createTempFile("cli-print", ".jsonl")
    val frames = (1 to 5).map(i => frame("trades", "BTCUSDT", i))
    Files.writeString(replay, frames.mkString("", "\n", "\n"))
    val out = Files.createTempDirectory("cli-print-out").toString

    val emitted = collection.mutable.ArrayBuffer.empty[String]
    IngestCli.run(spark, IngestCli.parseArguments(Array(
      "--symbol", "BTCUSDT", "--load", "trades", "--print-only",
      "--output-dir", out, "--replay", replay.toString)),
      (s: String) => emitted.synchronized { emitted += s })

    assert(emitted.toSeq == frames)
    assert(!new java.io.File(s"$out/stream=trades").exists())
  }

  test("print-only streams a large batch through the driver intact") {
    // the console path uses toLocalIterator, not a whole-batch
    // collect — this drives a batch far bigger than any spec above
    // and checks order + completeness survive the partition-at-a-time
    // delivery
    val replay = Files.createTempFile("cli-big", ".jsonl")
    val frames = (1 to 20000).map(i => frame("trades", "BTCUSDT", i))
    Files.writeString(replay, frames.mkString("", "\n", "\n"))

    val emitted = collection.mutable.ArrayBuffer.empty[String]
    IngestCli.run(spark, IngestCli.parseArguments(Array(
      "--symbol", "BTCUSDT", "--load", "trades", "--print-only",
      "--replay", replay.toString)),
      (s: String) => emitted.synchronized { emitted += s })

    assert(emitted.size == frames.size)
    assert(emitted.toSeq == frames)
  }

  test("--checkpoint gives console streams a durable, stable location") {
    val replay = Files.createTempFile("cli-ckpt", ".jsonl")
    Files.writeString(replay,
      (1 to 3).map(i => frame("trades", "BTCUSDT", i))
        .mkString("", "\n", "\n"))
    val ckpt = Files.createTempDirectory("cli-ckpt-root").toString

    IngestCli.run(spark, IngestCli.parseArguments(Array(
      "--symbol", "BTCUSDT", "--load", "trades", "--print-only",
      "--checkpoint", ckpt, "--replay", replay.toString)), _ => ())

    // offsets written under the named subdir → a restart resumes
    assert(new java.io.File(s"$ckpt/print-only/offsets").listFiles()
      .nonEmpty)
  }

  test("human print mode banners each record") {
    val replay = Files.createTempFile("cli-human", ".jsonl")
    val frames = (1 to 3).map(i => frame("ticker", "BTCUSDT", i))
    Files.writeString(replay, frames.mkString("", "\n", "\n"))

    val emitted = collection.mutable.ArrayBuffer.empty[String]
    IngestCli.run(spark, IngestCli.parseArguments(Array(
      "--symbol", "BTCUSDT", "--load", "ticker", "--print",
      "--replay", replay.toString)),
      (s: String) => emitted.synchronized { emitted += s })

    assert(emitted.count(_.startsWith("----")) == 3)
    assert(emitted.filterNot(_.startsWith("----")).toSeq == frames)
  }
}
