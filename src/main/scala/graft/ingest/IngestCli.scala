package graft.ingest

import java.net.URI

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.WsFeedClient

/** CLI entry point — argv parity with the reference's
  * `parse_arguments` (`binance-di.py:217-240`) so a user of the
  * reference can invoke the Spark engine the same way they invoke
  * `python binance-di.py`:
  *
  * {{{
  * --symbol BTCUSDT,ETHUSDT      required, comma list
  * --load ticker,trades          default: all four stream types
  * --output json,csv,parquet,orc default: none (no file sinks)
  * --output-dir DIR              default: output (reference OUTPUT_DIR)
  * --samples N                   per-(stream,symbol) cap
  * --interval 1m                 kline interval suffix
  * --print                       human mode: banner + record per frame
  * --print-only                  machine mode: envelope JSON lines only,
  *                               no file sinks (`--silent` implied; the
  *                               reference's pipe-to-jq surface)
  * --max-frames-per-trigger N    admission control (engine addition)
  * --replay PATH                 offline frame source (line file)
  * --ws-url wss://...            live source via WsFeedClient
  * }}}
  *
  * Exactly one of `--replay`/`--ws-url` selects the frame source: the
  * replay file is the offline/backfill harness, the WebSocket URL is
  * the reference's live loop (`binance-di.py:96-120`) via
  * [[WsFeedClient]] → feed-mode DSv2 source.
  */
object IngestCli {

  final case class Parsed(
      config: IngestConfig,
      replay: Option[String],
      wsUrl: Option[String],
      printHuman: Boolean,
      printOnly: Boolean,
      interval: String)

  private val Usage =
    "usage: graft-ingest --symbol SYMS [--load TYPES] [--output FMTS] " +
      "[--output-dir DIR] [--samples N] [--interval 1m] [--print] " +
      "[--print-only] [--max-frames-per-trigger N] " +
      "(--replay PATH | --ws-url URL)"

  private val StreamTypes = Set("ticker", "order-book", "trades", "klines")
  private val Formats = Set("json", "csv", "parquet", "orc")

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"$msg\n$Usage")

  private def csvList(v: String): Seq[String] =
    v.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  /** argv → typed config (`binance-di.py:217-240`: argparse with
    * comma-list normalization at `binance-di.py:234-236,273`). */
  def parseArguments(args: Array[String]): Parsed = {
    var symbols = Seq.empty[String]
    var load = Seq("ticker", "order-book", "trades", "klines")
    var formats = Seq.empty[String]
    var outputDir = "output" // reference OUTPUT_DIR, binance-di.py:246
    var samples = Option.empty[Int]
    var maxPerTrigger = Option.empty[Long]
    var interval = "1m"
    var printHuman = false
    var printOnly = false
    var replay = Option.empty[String]
    var wsUrl = Option.empty[String]

    def num[T](flag: String, v: String, f: String => T): T =
      try f(v) catch { case _: NumberFormatException =>
        fail(s"$flag expects a number, got '$v'") }

    var rest = args.toList
    while (rest.nonEmpty) rest = rest match {
      case "--symbol" :: v :: tail =>
        symbols = csvList(v).map(_.toUpperCase); tail
      case "--load" :: v :: tail =>
        load = csvList(v)
        load.filterNot(StreamTypes).foreach(x =>
          fail(s"unknown stream type '$x' (one of ${StreamTypes.mkString(",")})"))
        tail
      case "--output" :: v :: tail =>
        formats = csvList(v)
        formats.filterNot(Formats).foreach(x =>
          fail(s"unknown output format '$x' (one of ${Formats.mkString(",")})"))
        tail
      case "--output-dir" :: v :: tail => outputDir = v; tail
      case "--samples" :: v :: tail =>
        samples = Some(num("--samples", v, _.toInt)); tail
      case "--max-frames-per-trigger" :: v :: tail =>
        maxPerTrigger = Some(num("--max-frames-per-trigger", v, _.toLong)); tail
      case "--interval" :: v :: tail => interval = v; tail
      case "--print" :: tail => printHuman = true; tail
      case "--print-only" :: tail => printOnly = true; tail
      case "--silent" :: tail => tail // implied by --print-only, accepted
      case "--replay" :: v :: tail => replay = Some(v); tail
      case "--ws-url" :: v :: tail => wsUrl = Some(v); tail
      case other :: _ => fail(s"unknown or incomplete argument '$other'")
      case Nil => Nil
    }

    if (symbols.isEmpty) fail("--symbol is required")
    if (replay.isDefined == wsUrl.isDefined)
      fail("exactly one of --replay or --ws-url is required")
    if (formats.isEmpty && !printOnly && !printHuman)
      fail("nothing to do: give --output formats, --print or --print-only")

    Parsed(
      IngestConfig(symbols = symbols, loadTypes = load,
        outputDir = outputDir, formats = formats,
        samplesPerKey = samples, maxFramesPerTrigger = maxPerTrigger),
      replay, wsUrl, printHuman, printOnly, interval)
  }

  /** the multiplexed frame stream for the chosen source. */
  private def lines(spark: SparkSession, p: Parsed, feedName: String): DataFrame = {
    var reader = spark.readStream.format("ws-replay")
    p.replay.foreach(path => reader = reader.option("path", path))
    p.wsUrl.foreach(_ => reader = reader.option("feed", feedName))
    p.config.maxFramesPerTrigger.foreach(n =>
      reader = reader.option("maxFramesPerTrigger", n.toString))
    reader.load()
  }

  /** Run the configured pipeline; `emit` receives console-mode output
    * (stdout in `main`, a capturing sink in specs). Returns once a
    * replay source is drained; a live source runs until the process
    * is interrupted (the reference's Ctrl-C loop).
    *
    * Console modes are driver-serial by design — they exist to feed a
    * human terminal or a Unix pipe (`binance-di.py:127-141`), the one
    * place a collect to the driver is the point, not a scale bug.
    */
  def run(spark: SparkSession, p: Parsed,
      emit: String => Unit = println): Unit = {
    val feedName = s"cli-${System.nanoTime()}"
    val client = p.wsUrl.map { url =>
      val c = new WsFeedClient(new URI(url), feedName)
      c.connect(); c
    }
    try {
      val frames = lines(spark, p, feedName)
      val queries =
        if (p.printOnly) {
          // machine mode: one envelope JSON line per frame, no sinks
          // (frames are already the `{"stream","symbol","data"}`
          // envelope the reference prints, binance-di.py:130-132)
          Seq(frames.writeStream.outputMode("append")
            .option("checkpointLocation",
              java.nio.file.Files.createTempDirectory("cli-ckpt").toString)
            .foreachBatch { (batch: DataFrame, _: Long) =>
              batch.select(col("value")).collect()
                .foreach(r => emit(r.getString(0)))
            }.queryName("cli-print-only").start())
        } else {
          val human =
            if (!p.printHuman) Seq.empty
            else Seq(frames.writeStream.outputMode("append")
              .option("checkpointLocation",
                java.nio.file.Files.createTempDirectory("cli-ckpt").toString)
              .foreachBatch { (batch: DataFrame, _: Long) =>
                // S9 human mode: banner + record (binance-di.py:134-136)
                batch.select(col("value")).collect().foreach { r =>
                  emit("-" * 40); emit(r.getString(0))
                }
              }.queryName("cli-print").start())
          val sinks =
            if (p.config.formats.isEmpty) Seq.empty
            else IngestJob.start(spark, frames, p.config)
          human ++ sinks
        }
      if (p.replay.isDefined) {
        queries.foreach(_.processAllAvailable())
        queries.foreach(_.stop())
      } else queries.foreach(_.awaitTermination())
    } finally client.foreach(_.close())
  }

  def main(args: Array[String]): Unit = {
    val p = parseArguments(args)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-ingest")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try run(spark, p) finally spark.stop()
  }
}
