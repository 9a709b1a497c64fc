package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** The reference's four payload processors (`binance-di.py:35-67`)
  * re-expressed as pure column projections — the registry pattern of
  * `stream_producer(process_func)` (`binance-di.py:96,108`) becomes a
  * `Map[String, DataFrame => DataFrame]`.
  *
  * All projections are plain `select`s of codegen'd built-ins: Catalyst
  * pushes them into the scan (column pruning) so at 100 TB only the
  * projected columns are ever read, and no UDF breaks whole-stage
  * codegen. Missing input keys yield nulls (`.get()` semantics,
  * reference P8) because every schema field is nullable.
  *
  * NOTE: exchange wire frames carry case-significant single-letter
  * keys (`p` price-change vs `P` percent, `e` type vs `E` time), so
  * sessions parsing RAW frames must set `spark.sql.caseSensitive=true`
  * or column resolution is ambiguous. The projected (long-name)
  * schemas have no collisions.
  */
object Projections {

  /** P1 — ticker: 8-field project + rename (`binance-di.py:35-41`). */
  def ticker(raw: DataFrame): DataFrame = raw.select(
    col("p").as("price_change"),
    col("P").as("price_change_percent"),
    col("c").as("last_price"),
    col("h").as("high_price"),
    col("l").as("low_price"),
    col("v").as("total_volume_asset"),
    col("q").as("total_volume_quote"),
    col("E").as("event_time"))

  /** P2 — order-book: 3-field project; nested bids/asks arrays are
    * serialized to JSON strings exactly as the reference does for its
    * flat Redis-stream entries (`binance-di.py:43-47`). */
  def orderBook(raw: DataFrame): DataFrame = raw.select(
    col("u").as("lastUpdateId"),
    to_json(col("b")).as("bids"),
    to_json(col("a")).as("asks"))

  /** P3 — trade: 5-field project + rename; boolean stringified as the
    * reference's `str(data.get('m'))` (`binance-di.py:49-54`). Python
    * `str(True)` is `"True"`, so capitalize the cast. */
  def trade(raw: DataFrame): DataFrame = raw.select(
    col("E").as("event_time"),
    col("p").as("price"),
    col("q").as("quantity"),
    col("T").as("trade_time"),
    initcap(col("m").cast("string")).as("is_buyer_maker"))

  /** P4 — kline: flatten 11 fields out of the nested `k` struct plus
    * top-level `E` (`binance-di.py:56-67`). */
  def kline(raw: DataFrame): DataFrame = raw.select(
    col("E").as("event_time"),
    col("k.t").as("kline_start_time"),
    col("k.T").as("kline_close_time"),
    col("k.s").as("symbol"),
    col("k.i").as("interval"),
    col("k.o").as("open_price"),
    col("k.c").as("close_price"),
    col("k.h").as("high_price"),
    col("k.l").as("low_price"),
    col("k.v").as("base_asset_volume"),
    col("k.q").as("quote_asset_volume"),
    col("k.n").as("number_of_trades"),
    initcap(col("k.x").cast("string")).as("is_kline_closed"))

  /** the processor registry keyed by stream type
    * (`binance-di.py:280-286`). */
  val registry: Map[String, DataFrame => DataFrame] = Map(
    "ticker" -> ticker,
    "order-book" -> orderBook,
    "trades" -> trade,
    "klines" -> kline)

  /** P5 — envelope construction (`binance-di.py:130`):
    * `{"stream","symbol","data"}` as one JSON line, the machine-mode
    * stdout surface (`--print-only --silent`, `binance-di.py:130-132`). */
  def envelope(df: DataFrame, stream: String, symbolCol: Column): Column =
    to_json(struct(
      lit(stream).as("stream"),
      symbolCol.as("symbol"),
      struct(df.columns.map(col).toIndexedSeq: _*).as("data")))

  /** inverse of P5 for the consumer side: parse an envelope line and
    * project `.data` with the per-stream schema — the documented jq
    * query surface (`README.md:128-134`) as Catalyst expressions. */
  def parseEnvelope(lines: DataFrame, stream: String): DataFrame = {
    val payloadSchema = stream match {
      case "ticker"     => Schemas.ticker
      case "order-book" => Schemas.orderBook
      case "trades"     => Schemas.trade
      case "klines"     => Schemas.kline
      case other        => throw new IllegalArgumentException(other)
    }
    lines
      .select(from_json(col("value"), Schemas.envelope()).as("env"))
      .filter(col("env.stream") === stream)
      .select(col("env.symbol").as("symbol"),
        from_json(col("env.data"), payloadSchema).as("data"))
      .select(col("symbol") +: payloadSchema.fieldNames.toIndexedSeq
        .map(f => col(s"data.$f").as(f)): _*)
  }

  /** Dead-letter split: partition raw lines into (parsed, quarantine)
    * by envelope parseability. A malformed frame must neither kill
    * the job (the reference's bare `json.loads` would throw,
    * `binance-di.py:124`) nor silently vanish: the quarantine side
    * keeps the RAW line + why it failed, ready for a dead-letter
    * sink. Uses PERMISSIVE mode's corrupt-record column (`from_json`
    * yields an all-null struct on bad JSON, so a plain null check
    * can't tell broken JSON from valid JSON missing the envelope
    * keys). Both branches stay pure column expressions over the same
    * scan, so this splits a 100 TB backfill without custom
    * partitioning. */
  def deadLetterSplit(lines: DataFrame): (DataFrame, DataFrame) = {
    val schema = Schemas.envelope()
      .add("_corrupt", org.apache.spark.sql.types.StringType)
    val parsed = lines.withColumn("env",
      from_json(col("value"), schema,
        Map("columnNameOfCorruptRecord" -> "_corrupt")))
    val broken = col("env._corrupt").isNotNull
    val incomplete =
      col("env.stream").isNull || col("env.symbol").isNull
    val ok = parsed.filter(!broken && !incomplete)
      .select(col("env.stream").as("stream"),
        col("env.symbol").as("symbol"), col("env.data").as("data"))
    val bad = parsed.filter(broken || incomplete)
      .select(col("value").as("raw_line"),
        when(broken, "unparseable_json")
          .otherwise("missing_envelope_fields").as("reason"))
    (ok, bad)
  }
}
