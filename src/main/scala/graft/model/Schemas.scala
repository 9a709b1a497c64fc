package graft.model

import org.apache.spark.sql.types._

/** Explicit schemas for the four keyed record streams of the reference
  * engine (stream types selected by `--load`, reference
  * `binance-di.py:279-286`; field lists defined by the payload
  * processors at `binance-di.py:35-67`; golden examples
  * `README.md:168-241`).
  *
  * Wire fidelity: every payload field is a nullable string (the
  * exchange delivers numerics as JSON strings and the reference
  * preserves that — SURVEY.md §1.3). Analytics casts are applied
  * inside queries, never at the schema edge.
  *
  * Scale note: fixed explicit schemas (no inference) are mandatory at
  * 100 TB — schema inference would scan data twice and can drift
  * per-file; explicit StructTypes make the Parquet reader vectorized
  * and the scan prunable.
  */
object Schemas {

  /** ticker payload — reference `binance-di.py:35-41`. */
  val ticker: StructType = StructType(Seq(
    StructField("price_change", StringType),
    StructField("price_change_percent", StringType),
    StructField("last_price", StringType),
    StructField("high_price", StringType),
    StructField("low_price", StringType),
    StructField("total_volume_asset", StringType),
    StructField("total_volume_quote", StringType),
    StructField("event_time", LongType)))

  /** order-book payload — reference `binance-di.py:43-47`. bids/asks
    * travel as JSON strings (Redis stream entries must be flat); the
    * decoded shape is `array<array<string>>` with each level
    * `[price, qty]`, best level first. */
  val orderBook: StructType = StructType(Seq(
    StructField("lastUpdateId", LongType),
    StructField("bids", StringType),
    StructField("asks", StringType)))

  /** decoded bids/asks levels — consumer side, reference
    * `tests/test_redis-data.py:71-72`. */
  val bookLevels: ArrayType = ArrayType(ArrayType(StringType))

  /** trade payload — reference `binance-di.py:49-54`. */
  val trade: StructType = StructType(Seq(
    StructField("event_time", LongType),
    StructField("price", StringType),
    StructField("quantity", StringType),
    StructField("trade_time", LongType),
    StructField("is_buyer_maker", StringType)))

  /** kline payload (flattened from the nested `k` struct at ingest) —
    * reference `binance-di.py:56-67`. */
  val kline: StructType = StructType(Seq(
    StructField("event_time", LongType),
    StructField("kline_start_time", LongType),
    StructField("kline_close_time", LongType),
    StructField("symbol", StringType),
    StructField("interval", StringType),
    StructField("open_price", StringType),
    StructField("close_price", StringType),
    StructField("high_price", StringType),
    StructField("low_price", StringType),
    StructField("base_asset_volume", StringType),
    StructField("quote_asset_volume", StringType),
    StructField("number_of_trades", LongType),
    StructField("is_kline_closed", StringType)))

  /** raw (pre-projection) wire frames as delivered by the exchange
    * WebSocket — single-letter field names. Used by the projection
    * tests to prove P1-P4 rename/flatten semantics. */
  val rawTicker: StructType = StructType(Seq(
    StructField("e", StringType), StructField("E", LongType),
    StructField("s", StringType), StructField("p", StringType),
    StructField("P", StringType), StructField("c", StringType),
    StructField("h", StringType), StructField("l", StringType),
    StructField("v", StringType), StructField("q", StringType)))

  val rawDepth: StructType = StructType(Seq(
    StructField("u", LongType),
    StructField("b", ArrayType(ArrayType(StringType))),
    StructField("a", ArrayType(ArrayType(StringType)))))

  val rawTrade: StructType = StructType(Seq(
    StructField("e", StringType), StructField("E", LongType),
    StructField("s", StringType), StructField("p", StringType),
    StructField("q", StringType), StructField("T", LongType),
    StructField("m", BooleanType)))

  val rawKline: StructType = StructType(Seq(
    StructField("e", StringType), StructField("E", LongType),
    StructField("s", StringType),
    StructField("k", StructType(Seq(
      StructField("t", LongType), StructField("T", LongType),
      StructField("s", StringType), StructField("i", StringType),
      StructField("o", StringType), StructField("c", StringType),
      StructField("h", StringType), StructField("l", StringType),
      StructField("v", StringType), StructField("q", StringType),
      StructField("n", LongType), StructField("x", BooleanType))))))

  /** multiplexed envelope — reference `binance-di.py:130`:
    * `{"stream": k, "symbol": s, "data": payload}`. `data` is kept as
    * a JSON string here (the union of four payload shapes); queries
    * `from_json` it with the per-stream schema after filtering on
    * `stream` — mirroring the documented jq surface
    * (`README.md:128-134`). */
  def envelope(payload: DataType = StringType): StructType = StructType(Seq(
    StructField("stream", StringType),
    StructField("symbol", StringType),
    StructField("data", payload)))
}
