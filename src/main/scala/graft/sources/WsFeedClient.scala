package graft.sources

import java.net.URI
import java.net.http.{HttpClient, WebSocket}
import java.util.concurrent.{CompletionStage, Executors, ThreadFactory, TimeUnit}

/** Live WebSocket → [[WsFeeds]] adapter — the network half of S1
  * (reference `binance-di.py:96-120`: one connection per
  * (symbol, stream), each complete text message is one frame).
  *
  * Each complete message (multi-part continuations reassembled) is
  * pushed into the named in-JVM feed, where the `ws-replay` source's
  * `feed` mode turns it into micro-batches — so the full live path is
  * wire → WsFeedClient → WsFeeds → DSv2 admission-controlled source →
  * DataFrame, with the reference's per-stream projections downstream.
  *
  * Reconnect with exponential backoff on close or error (S2,
  * reference `binance-di.py:110-118` — its bare `while True:
  * try/except/sleep` loop, here with a capped doubling delay). Frames
  * already pushed are never re-pushed by a reconnect; delivery across
  * a drop is at-least-once from the exchange's point of view, exactly
  * like the reference.
  *
  * No egress exists in this sandbox, so the spec drives this client
  * against an in-process WebSocket server (`TinyWsServer`) — handshake,
  * frame delivery, reconnect, and the wire→micro-batch pipeline are
  * all exercised for real over a loopback TCP socket.
  */
final class WsFeedClient(
    uri: URI,
    feed: String,
    maxRetries: Int = 8,
    initialBackoffMs: Long = 50L) extends AutoCloseable {

  @volatile private var closed = false
  @volatile private var current: WebSocket = _
  private val http = HttpClient.newHttpClient()
  private val scheduler = Executors.newSingleThreadScheduledExecutor(
    new ThreadFactory {
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"ws-feed-$feed"); t.setDaemon(true); t
      }
    })

  /** open the connection; returns once the first attempt is launched
    * (reconnects happen on the scheduler thread). */
  def connect(): Unit = open(0)

  private def open(attempt: Int): Unit = if (!closed) {
    http.newWebSocketBuilder()
      .buildAsync(uri, new FeedListener)
      .whenComplete { (ws, err) =>
        if (err != null) scheduleReconnect(attempt + 1)
        else {
          // a connect can complete after close(): publish first, then
          // re-check `closed` and abort — whichever order close() ran
          // in, either it sees `current` or we see `closed`, so no
          // socket (or its daemon reader) is ever left open
          current = ws
          if (closed) ws.abort()
        }
      }
  }

  private def scheduleReconnect(attempt: Int): Unit =
    if (!closed && attempt <= maxRetries) {
      val delay = initialBackoffMs << math.min(attempt.toLong, 6L)
      scheduler.schedule(new Runnable { def run(): Unit = open(attempt) },
        delay, TimeUnit.MILLISECONDS)
    }

  private final class FeedListener extends WebSocket.Listener {
    private val partial = new java.lang.StringBuilder
    override def onOpen(ws: WebSocket): Unit = ws.request(1)
    override def onText(ws: WebSocket, data: CharSequence,
        last: Boolean): CompletionStage[_] = {
      partial.append(data)
      if (last) { WsFeeds.push(feed, partial.toString); partial.setLength(0) }
      ws.request(1)
      null
    }
    override def onClose(ws: WebSocket, statusCode: Int,
        reason: String): CompletionStage[_] = {
      // server dropped us: dial again from a fresh backoff ladder
      scheduleReconnect(1)
      null
    }
    override def onError(ws: WebSocket, error: Throwable): Unit =
      scheduleReconnect(1)
  }

  override def close(): Unit = {
    closed = true
    scheduler.shutdownNow()
    val ws = current
    if (ws != null) ws.abort()
  }
}
