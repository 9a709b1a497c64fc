package graft

import java.io.{BufferedReader, InputStreamReader, OutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
import java.security.MessageDigest
import java.util.Base64
import java.util.concurrent.atomic.AtomicInteger

/** Minimal in-process RFC-6455 WebSocket server for driving
  * [[graft.sources.WsFeedClient]] without network egress: performs
  * the HTTP/1.1 upgrade handshake, then runs `script(connectionN)` to
  * decide which text frames to send before closing the socket. Each
  * accepted connection increments the counter, so a script can serve
  * different frames per connection (reconnect testing).
  *
  * Server→client text frames are unmasked single frames (FIN=1,
  * opcode=1) per the RFC; payloads here are < 126 bytes so the short
  * length form suffices.
  */
final class TinyWsServer(script: Int => Seq[String]) extends AutoCloseable {
  private val server = new ServerSocket(0)
  private val conns = new AtomicInteger(0)
  @volatile private var running = true
  val port: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        val n = conns.incrementAndGet()
        new Thread(() => serve(sock, n), s"tiny-ws-conn-$n").start()
      } catch { case _: Throwable => () } // socket closed on shutdown
    }
  }, "tiny-ws-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  def connections: Int = conns.get()

  private def serve(sock: Socket, n: Int): Unit = {
    try {
      val in = new BufferedReader(new InputStreamReader(sock.getInputStream, US_ASCII))
      var key: String = null
      var line = in.readLine()
      while (line != null && line.nonEmpty) {
        if (line.toLowerCase.startsWith("sec-websocket-key:"))
          key = line.substring(line.indexOf(':') + 1).trim
        line = in.readLine()
      }
      val accept = Base64.getEncoder.encodeToString(
        MessageDigest.getInstance("SHA-1").digest(
          (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes(US_ASCII)))
      val out = sock.getOutputStream
      out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
        "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
        s"Sec-WebSocket-Accept: $accept\r\n\r\n").getBytes(US_ASCII))
      out.flush()
      script(n).foreach(sendText(out, _))
      // close frame (FIN=1, opcode=8, empty payload), then drop TCP
      out.write(Array(0x88.toByte, 0x00.toByte)); out.flush()
      Thread.sleep(50) // let the client read before the RST
    } catch { case _: Throwable => () }
    finally { try sock.close() catch { case _: Throwable => () } }
  }

  private def sendText(out: OutputStream, msg: String): Unit = {
    val payload = msg.getBytes(UTF_8)
    require(payload.length < 126, "TinyWsServer supports short frames only")
    out.write(0x81); out.write(payload.length); out.write(payload)
    out.flush()
  }

  override def close(): Unit = {
    running = false
    try server.close() catch { case _: Throwable => () }
  }
}
