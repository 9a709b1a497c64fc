package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.ingest.Projections
import graft.sources.WsFeeds

/** End-to-end tests of the custom DataSourceV2 micro-batch source
  * (S1/S2/S12 shape): replay mode with rate limiting and partitioned
  * reads, socket-style feed mode with frames arriving mid-query, and
  * the full wire pipeline (source → envelope parse → projection).
  */
class WsReplaySourceSpec extends SparkSpec {
  import spark.implicits._

  private def envelopeLine(i: Int): String =
    s"""{"stream":"ticker","symbol":"BTCUSDT","data":"{\\"last_price\\":\\"$i.0\\",\\"event_time\\":$i}"}"""

  test("replay mode reads all frames, honors maxFramesPerTrigger") {
    val f = Files.createTempFile("ws-replay", ".jsonl")
    Files.writeString(f, (1 to 97).map(envelopeLine).mkString("", "\n", "\n"))
    val stream = spark.readStream.format("ws-replay")
      .option("path", f.toString)
      .option("maxFramesPerTrigger", "20")
      .option("numPartitions", "3")
      .load()
    val q = stream.writeStream.format("memory").queryName("replayed")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("replayed").count() == 97)
    // batches were rate-limited: recentProgress shows ≤20 rows per batch
    assert(q.recentProgress.forall(_.numInputRows <= 20))
  }

  test("socket-style feed delivers frames pushed across micro-batches") {
    val feed = s"spec-feed-${System.nanoTime()}"
    val stream = spark.readStream.format("ws-replay")
      .option("feed", feed).load()
    val q = stream.writeStream.format("memory").queryName("fed")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    WsFeeds.push(feed, (1 to 5).map(envelopeLine): _*)
    q.processAllAvailable()
    WsFeeds.push(feed, (6 to 8).map(envelopeLine): _*)
    q.processAllAvailable(); q.stop()
    assert(spark.table("fed").count() == 8)
  }

  test("T6 checkpointed restart resumes exactly after committed offsets") {
    val f = Files.createTempFile("ws-ckpt", ".jsonl")
    val ckpt = Files.createTempDirectory("ws-ckpt-dir").toString
    val out = Files.createTempDirectory("ws-ckpt-out").toString
    Files.writeString(f, (1 to 30).map(envelopeLine).mkString("", "\n", "\n"))
    def run(): Unit = {
      val q = spark.readStream.format("ws-replay")
        .option("path", f.toString).option("maxFramesPerTrigger", "10")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    run()
    assert(spark.read.parquet(out).count() == 30)
    // new frames arrive while the query is down
    Files.writeString(f,
      Files.readString(f) + (31 to 45).map(envelopeLine).mkString("", "\n", "\n"))
    run() // fresh query, same checkpoint: exactly the new frames are
          // appended — no duplicates of 1..30, nothing skipped
    val ids = spark.read.parquet(out)
      .select(get_json_object($"value", "$.data").as("d"))
      .select(get_json_object($"d", "$.event_time").cast("long").as("t"))
      .as[Long].collect().toSeq.sorted
    assert(ids == (1L to 45L).toSeq)
  }

  test("LineIndex scans only the appended tail, seeks via stride checkpoints") {
    import graft.sources.LineIndex
    val f = Files.createTempFile("ws-idx", ".jsonl")
    val first = (1 to 1000).map(envelopeLine).mkString("", "\n", "\n")
    Files.writeString(f, first)
    val idx = new LineIndex(f.toString, stride = 64)
    assert(idx.refresh() == 1000)
    val afterFirst = idx.totalBytesScanned
    assert(afterFirst == first.getBytes("UTF-8").length.toLong)
    // append 10 lines; the refresh must read ONLY those bytes —
    // round 1 re-read the whole file every trigger
    val tail = (1001 to 1010).map(envelopeLine).mkString("", "\n", "\n")
    Files.writeString(f, first + tail)
    assert(idx.refresh() == 1010)
    assert(idx.totalBytesScanned - afterFirst ==
      tail.getBytes("UTF-8").length.toLong)
    // a refresh with nothing appended reads zero bytes
    assert(idx.refresh() == 1010)
    assert(idx.totalBytesScanned - afterFirst ==
      tail.getBytes("UTF-8").length.toLong)
    // seek: checkpoint every 64 lines, so the residual skip is <64 and
    // the byte offset is a true line start
    val (startByte, skip) = idx.seek(700)
    assert(skip == 700 % 64 && skip < 64)
    val src = scala.io.Source.fromFile(f.toFile)
    try {
      val all = src.getLines().toVector
      val fromByte = new String(
        Files.readAllBytes(f)).substring(startByte.toInt)
      assert(fromByte.startsWith(all((700 / 64) * 64)))
    } finally src.close()
    // a half-written trailing frame is not counted until terminated
    Files.writeString(f, first + tail + "{\"partial\":")
    assert(idx.refresh() == 1010)
    Files.writeString(f, first + tail + "{\"partial\":true}\n")
    assert(idx.refresh() == 1011)
  }

  test("full wire pipeline: source frames parse into the ticker projection") {
    val f = Files.createTempFile("ws-pipe", ".jsonl")
    Files.writeString(f, (1 to 10).map(envelopeLine).mkString("", "\n", "\n"))
    val stream = spark.readStream.format("ws-replay")
      .option("path", f.toString).load()
    val parsed = Projections.parseEnvelope(stream, "ticker")
    val q = parsed.writeStream.format("memory").queryName("parsed")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("parsed")
    assert(rows.count() == 10)
    val r = rows.filter($"event_time" === 7).head()
    assert(r.getAs[String]("last_price") == "7.0")
    assert(r.getAs[String]("symbol") == "BTCUSDT")
  }

  test("ingest chain with quarantine: good frames sink keyed, bad frames dead-letter") {
    val f = Files.createTempFile("ws-dlq", ".jsonl")
    val lines = (1 to 5).map(envelopeLine) ++ Seq(
      "{broken frame", """{"data":"{\"c\":\"9\"}"}""")
    Files.writeString(f, lines.mkString("", "\n", "\n"))
    val out = Files.createTempDirectory("dlq-out").toString
    val stream = spark.readStream.format("ws-replay")
      .option("path", f.toString).load()
    val q = stream.writeStream
      .option("checkpointLocation", s"$out/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val (ok, bad) = graft.ingest.Projections.deadLetterSplit(batch)
        graft.sinks.Sinks.writeKeyed(ok, s"$out/good")
        bad.write.mode("append").json(s"$out/dead")
        ()
      }
      .start()
    q.processAllAvailable(); q.stop()
    val good = spark.read.parquet(s"$out/good")
    assert(good.count() == 5)
    // keyed layout preserved for partition pruning downstream
    assert(good.filter($"symbol" === "BTCUSDT").count() == 5)
    val dead = spark.read.json(s"$out/dead")
    assert(dead.count() == 2)
    assert(dead.filter($"reason" === "unparseable_json").count() == 1)
    assert(dead.filter($"reason" === "missing_envelope_fields").count() == 1)
  }
}
