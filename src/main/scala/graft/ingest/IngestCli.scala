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
  * --load ticker,trades          default: ticker,trades,order-book
  *                               (binance-di.py:220; klines opt-in)
  * --output json,csv,parquet,orc default: none (no file sinks)
  * --output-dir DIR              default: data (binance-di.py:223)
  * --samples N                   per-(stream,symbol) cap
  * --interval 1m                 kline interval suffix
  * --print                       human mode: banner + record per frame
  * --print-only                  machine mode: envelope JSON lines only,
  *                               no file sinks (`--silent` implied; the
  *                               reference's pipe-to-jq surface).
  *                               Mutually exclusive with --print
  *                               (binance-di.py:229-231)
  * --max-frames-per-trigger N    admission control (engine addition)
  * --checkpoint DIR              durable checkpoint root (engine
  *                               addition): live runs resume instead of
  *                               replaying; default is a temp dir that
  *                               is deleted on exit
  * --testnet                     accepted for argv parity
  *                               (binance-di.py:222); endpoint selection
  *                               is the live client's concern — recorded
  *                               on Parsed for the caller to act on
  * --log [PATH]                  file status logging (binance-di.py:226);
  *                               PATH optional, default binance-di.log
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
      interval: String,
      checkpoint: Option[String] = None,
      testnet: Boolean = false,
      log: Option[String] = None)

  private val Usage =
    "usage: graft-ingest --symbol SYMS [--load TYPES] [--output FMTS] " +
      "[--output-dir DIR] [--samples N] [--interval 1m] [--print | " +
      "--print-only] [--max-frames-per-trigger N] [--checkpoint DIR] " +
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
    // reference default: klines is opt-in (binance-di.py:220)
    var load = Seq("ticker", "trades", "order-book")
    var formats = Seq.empty[String]
    var outputDir = "data" // reference default, binance-di.py:223
    var samples = Option.empty[Int]
    var maxPerTrigger = Option.empty[Long]
    var interval = "1m"
    var printHuman = false
    var printOnly = false
    var replay = Option.empty[String]
    var wsUrl = Option.empty[String]
    var checkpoint = Option.empty[String]
    var testnet = false
    var log = Option.empty[String]

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
      case "--testnet" :: tail => testnet = true; tail
      // argparse nargs='?': value optional (binance-di.py:226)
      case "--log" :: v :: tail if !v.startsWith("--") =>
        log = Some(v); tail
      case "--log" :: tail => log = Some("binance-di.log"); tail
      case "--checkpoint" :: v :: tail => checkpoint = Some(v); tail
      case "--replay" :: v :: tail => replay = Some(v); tail
      case "--ws-url" :: v :: tail => wsUrl = Some(v); tail
      case other :: _ => fail(s"unknown or incomplete argument '$other'")
      case Nil => Nil
    }

    if (symbols.isEmpty) fail("--symbol is required")
    // argparse mutually-exclusive group, binance-di.py:229-231
    if (printHuman && printOnly)
      fail("--print and --print-only are mutually exclusive")
    if (replay.isDefined == wsUrl.isDefined)
      fail("exactly one of --replay or --ws-url is required")
    if (formats.isEmpty && !printOnly && !printHuman)
      fail("nothing to do: give --output formats, --print or --print-only")

    Parsed(
      IngestConfig(symbols = symbols, loadTypes = load,
        outputDir = outputDir, formats = formats,
        samplesPerKey = samples, maxFramesPerTrigger = maxPerTrigger),
      replay, wsUrl, printHuman, printOnly, interval, checkpoint,
      testnet, log)
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
    * human terminal or a Unix pipe (`binance-di.py:127-141`), so rows
    * MUST reach the driver; `toLocalIterator` streams them one
    * partition at a time instead of materializing the whole
    * micro-batch in driver memory (a live burst can make one batch
    * arbitrarily large).
    *
    * Checkpoints: with `--checkpoint DIR` the console streams get
    * stable subdirectories under DIR, so a killed live run resumes
    * from its offsets instead of replaying. Without it, temp dirs are
    * created and deleted on exit — a throwaway run leaves no litter.
    */
  def run(spark: SparkSession, p: Parsed,
      emit: String => Unit = println): Unit = {
    val feedName = s"cli-${System.nanoTime()}"
    val client = p.wsUrl.map { url =>
      val c = new WsFeedClient(new URI(url), feedName)
      c.connect(); c
    }
    // --log: append status lines (the reference's logging.basicConfig
    // file handler surface, binance-di.py:226) — start/stop markers
    // plus the effective source + sink config
    def statusLog(msg: String): Unit = p.log.foreach { path =>
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
        s"${java.time.Instant.now()} graft-ingest $msg\n",
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      catch { case _: java.io.IOException => () }
    }
    val tempCkpts = collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
    def ckptDir(name: String): String = p.checkpoint match {
      case Some(root) => s"$root/$name"
      case None =>
        val d = java.nio.file.Files.createTempDirectory(s"cli-ckpt-$name")
        tempCkpts += d
        d.toString
    }
    def emitBatch(batch: DataFrame)(f: String => Unit): Unit = {
      val it = batch.select(col("value")).toLocalIterator()
      while (it.hasNext) f(it.next().getString(0))
    }
    try {
      statusLog(s"start symbols=${p.config.symbols.mkString(",")} " +
        s"load=${p.config.loadTypes.mkString(",")} " +
        s"source=${p.replay.map("replay:" + _).orElse(p.wsUrl).getOrElse("")}")
      val frames = lines(spark, p, feedName)
      val queries =
        if (p.printOnly) {
          // machine mode: one envelope JSON line per frame, no sinks
          // (frames are already the `{"stream","symbol","data"}`
          // envelope the reference prints, binance-di.py:130-132)
          Seq(frames.writeStream.outputMode("append")
            .option("checkpointLocation", ckptDir("print-only"))
            .foreachBatch { (batch: DataFrame, _: Long) =>
              emitBatch(batch)(emit)
            }.queryName("cli-print-only").start())
        } else {
          val human =
            if (!p.printHuman) Seq.empty
            else Seq(frames.writeStream.outputMode("append")
              .option("checkpointLocation", ckptDir("print"))
              .foreachBatch { (batch: DataFrame, _: Long) =>
                // S9 human mode: banner + record (binance-di.py:134-136)
                emitBatch(batch) { v => emit("-" * 40); emit(v) }
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
    } finally {
      statusLog("stop")
      client.foreach(_.close())
      tempCkpts.foreach { d =>
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(d).iterator().asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(java.nio.file.Files.deleteIfExists(_))
        } catch { case _: java.io.IOException => () }
      }
    }
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
