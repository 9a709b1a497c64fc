package graft

import java.net.URI
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.concurrent.Eventually.eventually
import org.scalatest.concurrent.PatienceConfiguration.Timeout
import org.scalatest.time.{Seconds, Span}
import graft.sources.{WsFeedClient, WsFeeds}

/** Live-network half of S1/S2 (reference `binance-di.py:96-120`):
  * a real `java.net.http.WebSocket` handshake + frame delivery over a
  * loopback socket, reconnect-with-backoff across a server-side drop,
  * and the complete wire → feed → DSv2 micro-batch pipeline.
  */
class WsFeedClientSpec extends SparkSpec {

  private def frame(i: Int): String =
    s"""{"stream":"trade","symbol":"BTCUSDT","data":"{\\"trade_id\\":$i}"}"""

  test("S1: frames flow wire -> WsFeeds -> micro-batches") {
    val feed = s"ws-live-${System.nanoTime()}"
    // one connection serving 6 frames, then a clean close
    val server = new TinyWsServer(n => if (n == 1) (1 to 6).map(frame) else Nil)
    val client = new WsFeedClient(
      new URI(s"ws://127.0.0.1:${server.port}/ws/btcusdt@trade"), feed,
      maxRetries = 0)
    try {
      client.connect()
      eventually(Timeout(Span(10, Seconds))) {
        assert(WsFeeds.queue(feed).size == 6)
      }
      // now drain the feed through the DSv2 source
      val q = spark.readStream.format("ws-replay").option("feed", feed).load()
        .writeStream.format("memory").queryName("ws_live")
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      q.processAllAvailable(); q.stop()
      assert(spark.table("ws_live").count() == 6)
    } finally { client.close(); server.close() }
  }

  test("S2: reconnect with backoff resumes after a server-side drop") {
    val feed = s"ws-reconn-${System.nanoTime()}"
    // connection 1 sends 3 frames then drops; connection 2 sends 2 more
    val server = new TinyWsServer(n =>
      if (n == 1) (1 to 3).map(frame)
      else if (n == 2) (4 to 5).map(frame)
      else Nil)
    val client = new WsFeedClient(
      new URI(s"ws://127.0.0.1:${server.port}/"), feed,
      maxRetries = 4, initialBackoffMs = 20)
    try {
      client.connect()
      eventually(Timeout(Span(10, Seconds))) {
        assert(WsFeeds.queue(feed).size == 5)
      }
      assert(server.connections >= 2) // the drop really forced a re-dial
    } finally { client.close(); server.close() }
  }
}
