package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.ingest.Projections
import graft.model.Schemas

/** Property-style tests (SURVEY.md §5.3): projection totality on
  * records with arbitrary missing keys, envelope round-trip identity,
  * and rotation's ceil(n/max) file bound — each over a generated
  * batch evaluated in one Spark job.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val seed = org.scalacheck.rng.Seed(42L)
  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, seed)

  test("P8 totality: ticker projection never throws on partial records") {
    // frames with a random subset of keys present
    val keys = Seq("p" -> "\"1.0\"", "P" -> "\"2.0\"", "c" -> "\"3.0\"",
      "h" -> "\"4.0\"", "l" -> "\"5.0\"", "v" -> "\"6.0\"",
      "q" -> "\"7.0\"", "E" -> "123")
    val gen = Gen.someOf(keys).map(ks =>
      ks.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}"))
    val frames = sample(gen, 200)
    val out = Projections.ticker(
      frames.toDF("value")
        .select(from_json($"value", Schemas.rawTicker).as("r")).select("r.*"))
    assert(out.count() == 200) // total: no row lost, no exception
    // a missing key is null, a present key is its value
    val withC = frames.count(_.contains("\"c\""))
    assert(out.filter($"last_price".isNotNull).count() == withC)
  }

  test("P5 round trip: parseEnvelope . envelope = id for random trades") {
    val gen = for {
      e <- Gen.choose(1L, 1L << 40)
      p <- Gen.choose(1, 99999999).map(c => s"$c.${c % 100}")
      q <- Gen.choose(1, 999999).map(c => s"0.$c")
      t <- Gen.choose(1L, 1L << 40)
      m <- Gen.oneOf("True", "False")
    } yield (e, p, q, t, m)
    val rows = sample(gen, 150)
    val df = rows.toDF("event_time", "price", "quantity", "trade_time",
      "is_buyer_maker")
    val lines = df.select(
      Projections.envelope(df, "trades", lit("BTCUSDT")).as("value"))
    val back = Projections.parseEnvelope(lines, "trades")
      .select($"event_time", $"price", $"quantity", $"trade_time",
        $"is_buyer_maker")
      .as[(Long, String, String, Long, String)].collect().toSet
    assert(back == rows.toSet)
  }

  test("rotation: ceil(n/max) <= files, every row preserved") {
    for (n <- Seq(1, 250, 999, 1000, 1001)) {
      val dir = java.nio.file.Files.createTempDirectory(s"rot$n").toString
      graft.sinks.Sinks.writeKeyed(
        spark.range(n).select(lit("s").as("stream"), lit("x").as("symbol"),
          $"id").repartition(1),
        dir, "json", maxRecordsPerFile = 250)
      val files = new java.io.File(s"$dir/stream=s/symbol=x")
        .listFiles().count(_.getName.endsWith(".json"))
      assert(files >= math.ceil(n / 250.0).toInt, s"n=$n files=$files")
      assert(spark.read.json(dir).count() == n)
    }
  }
}
