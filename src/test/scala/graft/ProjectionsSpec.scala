package graft

import org.apache.spark.sql.functions._
import graft.ingest.Projections
import graft.model.Schemas

/** Golden-record tests for the P1-P4 projections using the payload
  * examples published in the reference README (FIXTURES.md §A), plus
  * the envelope round trip (P5 ∘ parse = id).
  */
class ProjectionsSpec extends SparkSpec {
  import spark.implicits._

  test("P1 ticker projection renames and projects the golden record") {
    val raw = Seq(
      """{"e":"24hrTicker","E":1678886400000,"s":"BTCUSDT","p":"150.50",
        |"P":"0.127","c":"118050.00","h":"119000.00","l":"117500.00",
        |"v":"12345.67","q":"1459876543.21"}""".stripMargin.replace("\n", ""))
      .toDF("value")
      .select(from_json($"value", Schemas.rawTicker).as("r")).select("r.*")
    val row = Projections.ticker(raw).head()
    assert(row.getAs[String]("price_change") == "150.50")
    assert(row.getAs[String]("last_price") == "118050.00")
    assert(row.getAs[String]("high_price") == "119000.00")
    assert(row.getAs[Long]("event_time") == 1678886400000L)
  }

  test("P2 order-book projection serializes bids/asks to JSON strings") {
    val raw = Seq(
      """{"u":123456789,"b":[["118050.00","0.5"],["118049.90","1.2"]],
        |"a":[["118050.10","0.8"],["118050.20","2.1"]]}"""
        .stripMargin.replace("\n", ""))
      .toDF("value")
      .select(from_json($"value", Schemas.rawDepth).as("r")).select("r.*")
    val row = Projections.orderBook(raw).head()
    assert(row.getAs[Long]("lastUpdateId") == 123456789L)
    assert(row.getAs[String]("bids") ==
      """[["118050.00","0.5"],["118049.90","1.2"]]""")
    // consumer-side decode (tests/test_redis-data-full.py:49-52 semantics)
    val metrics = Projections.orderBook(raw)
      .withColumn("b", from_json($"bids", Schemas.bookLevels))
      .withColumn("a", from_json($"asks", Schemas.bookLevels))
      .select(
        element_at(element_at($"b", 1), 1).cast("double").as("best_bid"),
        element_at(element_at($"a", 1), 1).cast("double").as("best_ask"))
      .withColumn("mid", ($"best_bid" + $"best_ask") / 2)
      .withColumn("spread", $"best_ask" - $"best_bid")
      .head()
    assert(metrics.getAs[Double]("best_bid") == 118050.00)
    assert(metrics.getAs[Double]("best_ask") == 118050.10)
    assert(metrics.getAs[Double]("mid") == 118050.05)
    assert(math.abs(metrics.getAs[Double]("spread") - 0.10) < 1e-9)
  }

  test("P3 trade projection stringifies the maker flag like Python str()") {
    val raw = Seq(
      """{"e":"aggTrade","E":1678886400123,"s":"BTCUSDT","p":"118050.10",
        |"q":"0.005","T":1678886400120,"m":true}""".stripMargin.replace("\n", ""))
      .toDF("value")
      .select(from_json($"value", Schemas.rawTrade).as("r")).select("r.*")
    val row = Projections.trade(raw).head()
    assert(row.getAs[String]("is_buyer_maker") == "True")
    assert(row.getAs[String]("price") == "118050.10")
    assert(row.getAs[Long]("trade_time") == 1678886400120L)
  }

  test("P4 kline projection flattens the nested k struct") {
    val raw = Seq(
      """{"e":"kline","E":1678886400234,"s":"BTCUSDT","k":{"t":1678886340000,
        |"T":1678886399999,"s":"BTCUSDT","i":"1m","o":"118040.00","c":"118050.00",
        |"h":"118060.00","l":"118030.00","v":"50.123","q":"5917890.12","n":542,
        |"x":false}}""".stripMargin.replace("\n", ""))
      .toDF("value")
      .select(from_json($"value", Schemas.rawKline).as("r")).select("r.*")
    val row = Projections.kline(raw).head()
    assert(row.getAs[Long]("kline_start_time") == 1678886340000L)
    assert(row.getAs[String]("interval") == "1m")
    assert(row.getAs[Long]("number_of_trades") == 542L)
    assert(row.getAs[String]("is_kline_closed") == "False")
  }

  test("P8 missing keys project to null, not error") {
    val raw = Seq("""{"e":"24hrTicker","s":"BTCUSDT"}""").toDF("value")
      .select(from_json($"value", Schemas.rawTicker).as("r")).select("r.*")
    val row = Projections.ticker(raw).head()
    assert(row.isNullAt(row.fieldIndex("last_price")))
    assert(row.isNullAt(row.fieldIndex("event_time")))
  }

  test("P5 envelope round trip: parseEnvelope recovers the payload") {
    val raw = Seq(
      """{"e":"aggTrade","E":1678886400123,"s":"BTCUSDT","p":"118050.10",
        |"q":"0.005","T":1678886400120,"m":true}""".stripMargin.replace("\n", ""))
      .toDF("value")
      .select(from_json($"value", Schemas.rawTrade).as("r")).select("r.*")
    val projected = Projections.trade(raw)
    val line = projected
      .select(Projections.envelope(projected, "trades", lit("BTCUSDT")).as("value"))
    val back = Projections.parseEnvelope(line, "trades").head()
    assert(back.getAs[String]("symbol") == "BTCUSDT")
    assert(back.getAs[String]("price") == "118050.10")
    assert(back.getAs[Long]("event_time") == 1678886400123L)
  }

  test("P6 envelope filter drops other streams") {
    val lines = Seq(
      """{"stream":"ticker","symbol":"BTCUSDT","data":"{\"last_price\":\"1\"}"}""",
      """{"stream":"trades","symbol":"BTCUSDT","data":"{\"price\":\"2\"}"}""")
      .toDF("value")
    assert(Projections.parseEnvelope(lines, "ticker").count() == 1)
  }

  test("dead-letter split quarantines malformed frames with the raw line") {
    val lines = Seq(
      """{"stream":"ticker","symbol":"BTCUSDT","data":"{\"c\":\"1\"}"}""",
      """{not json at all""",
      """{"data":"{\"c\":\"2\"}"}""") // parses but has no envelope keys
      .toDF("value")
    val (ok, bad) = Projections.deadLetterSplit(lines)
    assert(ok.count() == 1)
    val quarantined = bad.collect().map(r =>
      (r.getString(0), r.getString(1))).toSet
    assert(quarantined == Set(
      ("""{not json at all""", "unparseable_json"),
      ("""{"data":"{\"c\":\"2\"}"}""", "missing_envelope_fields")))
  }
}
