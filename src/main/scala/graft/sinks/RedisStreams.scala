package graft.sinks

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** XADD-semantics client seam for the S4 Redis Streams sink
  * (reference `binance-di.py:143-145`: `redis.xadd(key, fields)` with
  * flat string field maps, key = `binance:{stream}:{symbol}`).
  *
  * The engine side is [[RedisSink.start]]; this trait is the
  * network seam. Production wraps a real client (jedis/lettuce — not
  * installable in this zero-egress sandbox) one connection per
  * partition; tests use [[InMemoryRedis]], which implements XADD's
  * observable contract: per-key append order, monotonically
  * increasing `ms-seq` entry ids, flat string fields.
  */
trait RedisStreamsClient extends Serializable {
  /** append one entry; returns the generated stream entry id. */
  def xadd(key: String, fields: Seq[(String, String)]): String
  /** release the connection (called once per partition). */
  def close(): Unit = ()
}

/** In-memory XADD fake. Entry ids follow Redis's `<ms>-<seq>` scheme
  * and are strictly increasing per key even when the clock doesn't
  * advance between calls. Instances are named and JVM-global so a
  * serialized factory closure on a local-mode executor resolves the
  * same store the test asserts on.
  */
final class InMemoryRedis private () extends RedisStreamsClient {
  private val streams = new ConcurrentHashMap[String, ArrayBuffer[(String, Seq[(String, String)])]]()
  private var lastMs = 0L
  private var lastSeq = -1L

  // id generation and buffer append happen under ONE lock: two
  // concurrent writers to the same key must observe append order ==
  // id order (XADD's contract — ids are monotonic in stream order),
  // so the id can't be minted in one critical section and appended
  // in another.
  override def xadd(key: String, fields: Seq[(String, String)]): String = {
    val buf = streams.computeIfAbsent(key, _ => new ArrayBuffer)
    synchronized {
      val now = System.currentTimeMillis()
      if (now > lastMs) { lastMs = now; lastSeq = 0L }
      else lastSeq += 1
      val id = s"$lastMs-$lastSeq"
      buf += ((id, fields))
      id
    }
  }

  /** XRANGE - +: all entries of a key in append order. */
  def xrange(key: String): Seq[(String, Seq[(String, String)])] = {
    val buf = streams.get(key)
    if (buf == null) Seq.empty else synchronized(buf.toSeq)
  }

  def keys: Seq[String] = {
    import scala.jdk.CollectionConverters._
    streams.keySet().asScala.toSeq.sorted
  }
}

object InMemoryRedis {
  private val instances = new ConcurrentHashMap[String, InMemoryRedis]()
  /** JVM-global named instance — the test-side factory. */
  def named(name: String): InMemoryRedis =
    instances.computeIfAbsent(name, _ => new InMemoryRedis)
}

object RedisSink {

  /** One micro-batch → XADD per row, executor-side. Every column
    * becomes a flat string field (XADD's value model; the reference
    * serializes its dicts to strings the same way, `binance-di.py:145`);
    * null columns are omitted (Redis fields can't hold null). The
    * client factory runs once per partition — the standard
    * connection-per-partition Spark sink shape, so no client or
    * connection is ever serialized through a closure.
    */
  def writeBatch(batch: DataFrame, clientFactory: () => RedisStreamsClient,
      prefix: String = "binance"): Unit = {
    val fieldCols = batch.columns
    val keyed = batch.withColumn("redis_key", Sinks.streamKey(prefix))
    keyed.foreachPartition { rows: Iterator[Row] =>
      val client = clientFactory()
      try rows.foreach { r =>
        val fields = fieldCols.flatMap { c =>
          Option(r.getAs[Any](c)).map(v => c -> v.toString)
        }.toSeq
        client.xadd(r.getAs[String]("redis_key"), fields)
      } finally client.close()
    }
  }

  /** S4 — streaming Redis Streams sink: `foreachBatch` + checkpointing
    * give at-least-once to Redis (XADD is not idempotent — matching
    * the reference's delivery model; the file sinks carry the
    * exactly-once path). */
  def start(df: DataFrame, checkpoint: String,
      clientFactory: () => RedisStreamsClient,
      prefix: String = "binance"): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        writeBatch(batch, clientFactory, prefix)
      }
      .start()
}
