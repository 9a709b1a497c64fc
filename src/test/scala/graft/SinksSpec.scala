package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sinks.Sinks

/** Sink behavior (SURVEY.md §2.1): keyed partitioned layout, rotation
  * file counts (ceil(n/max) lower bound, §7.4), multi-format fan-out,
  * and the machine-mode envelope line shape.
  */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() =
    Files.createTempDirectory("graft-sinks").toString

  private def sample(n: Int) =
    spark.range(n).select(
      lit("ticker").as("stream"),
      when($"id" % 2 === 0, "BTCUSDT").otherwise("ETHUSDT").as("symbol"),
      $"id".as("seq"),
      ($"id" * 1.5).as("last_price"))

  test("S5-S8 keyed write partitions by (stream, symbol) and rotates") {
    val dir = freshDir()
    Sinks.writeKeyed(sample(1000).repartition(1), dir, "json",
      maxRecordsPerFile = 300)
    val base = new java.io.File(s"$dir/stream=ticker")
    assert(base.exists())
    val partDirs = base.listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(partDirs.sameElements(Array("symbol=BTCUSDT", "symbol=ETHUSDT")))
    val files = base.listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".json"))
    // 500 rows per key at 300/file → ≥ 2 files per key
    assert(files.length >= 4)
    val back = spark.read.json(dir)
    assert(back.count() == 1000)
  }

  test("compact rewrites a fragmented directory into few files, same rows") {
    val in = freshDir() + "/frag"
    val out = freshDir() + "/compacted"
    // 32 micro-batch-sized fragments (repartition forces 32 files)
    spark.range(10000).select($"id", ($"id" % 7).as("k"))
      .repartition(32).write.parquet(in)
    val (before, after) = Sinks.compact(spark, in, out, targetBytes = 1L << 20)
    assert(before == 32, s"expected 32 input files, saw $before")
    assert(after < 8, s"compaction left $after files")
    // content identical: same rows, same checksum
    val a = spark.read.parquet(in).agg(count(lit(1)), sum($"id")).head()
    val b = spark.read.parquet(out).agg(count(lit(1)), sum($"id")).head()
    assert(a == b)
  }

  test("S11 fan-out writes every format from one persisted batch") {
    val dir = freshDir()
    Sinks.fanOutBatch(sample(100), dir, Seq("json", "csv", "parquet", "orc"))
    for (f <- Seq("json", "csv", "parquet", "orc")) {
      val r = spark.read.format(f)
        .option("header", "true").option("inferSchema", "true")
        .load(s"$dir/fmt=$f")
      assert(r.count() == 100, s"format $f")
    }
  }

  test("S10 envelope lines carry the {stream,symbol,data} shape") {
    val line = Sinks.envelopeLines(sample(1)).head().getString(0)
    assert(line.contains(""""stream":"ticker""""))
    assert(line.contains(""""symbol":"BTCUSDT""""))
    assert(line.contains(""""data":{"""))
  }

  test("S4 Redis XADD sink round-trips through the pluggable client") {
    import graft.sinks.{InMemoryRedis, RedisSink}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val store = s"redis-spec-${System.nanoTime()}"
    val in = MemoryStream[(String, String, Long, Double)]
    val df = in.toDF().toDF("stream", "symbol", "seq", "last_price")
    val q = RedisSink.start(df,
      Files.createTempDirectory("redis-ckpt").toString,
      () => InMemoryRedis.named(store))
    in.addData(("ticker", "BTCUSDT", 1L, 10.5), ("ticker", "ETHUSDT", 2L, 3.25))
    q.processAllAvailable()
    in.addData(("orderbook", "BTCUSDT", 3L, 11.0))
    q.processAllAvailable(); q.stop()
    val redis = InMemoryRedis.named(store)
    // canonical key scheme binance:{stream}:{symbol}, lower-cased —
    // one scheme on both paths (fixes the reference's orderbook/
    // order-book producer/consumer mismatch)
    assert(redis.keys == Seq("binance:orderbook:btcusdt",
      "binance:ticker:btcusdt", "binance:ticker:ethusdt"))
    val entries = redis.xrange("binance:ticker:btcusdt")
    assert(entries.size == 1)
    val fields = entries.head._2.toMap
    assert(fields("seq") == "1" && fields("last_price") == "10.5")
    // XADD ids are monotonically increasing per key
    val ids = redis.xrange("binance:orderbook:btcusdt").map(_._1)
    assert(ids == ids.sorted && ids.distinct.size == ids.size)
  }

  test("S11 streaming fan-out writes all formats via foreachBatch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = freshDir()
    val in = MemoryStream[(String, String, Long)]
    val df = in.toDF().toDF("stream", "symbol", "seq")
    val q = graft.sinks.Sinks.startFanOut(df, s"$dir/out", s"$dir/ckpt",
      Seq("json", "parquet"))
    in.addData((1 to 50).map(i => ("ticker", "BTCUSDT", i.toLong)))
    q.processAllAvailable()
    in.addData((51 to 80).map(i => ("trades", "ETHUSDT", i.toLong)))
    q.processAllAvailable(); q.stop()
    assert(spark.read.json(s"$dir/out/fmt=json").count() == 80)
    assert(spark.read.parquet(s"$dir/out/fmt=parquet").count() == 80)
  }

  test("keyed stream name fixes the reference's key mismatch") {
    val key = sample(1).select(Sinks.streamKey().as("k")).head().getString(0)
    assert(key == "binance:ticker:btcusdt")
  }
}
