package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.ingest.{IngestConfig, IngestJob}

/** dev bench: end-to-end ingest throughput of the replay pipeline
  * (envelope JSONL → parse → project → partitioned parquet), the
  * engine's equivalent of the reference's producer→consumer→sink
  * loop. Prints frames/sec. */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 500000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val f = Files.createTempFile("ingest-bench", ".jsonl")
    val syms = Array("BTCUSDT", "ETHUSDT", "SOLUSDT", "XRPUSDT")
    val w = Files.newBufferedWriter(f)
    var i = 0
    while (i < n) {
      val s = syms(i % syms.length)
      w.write(s"""{"stream":"ticker","symbol":"$s","data":"{\\"last_price\\":\\"$i.0\\",\\"high_price\\":\\"$i.5\\",\\"low_price\\":\\"$i.25\\",\\"event_time\\":$i}"}""")
      w.write("\n")
      i += 1
    }
    w.close()
    val out = Files.createTempDirectory("ingest-bench-out").toString
    // warmup on a small slice via a second config? measure cold e2e:
    val t0 = System.nanoTime()
    IngestJob.runReplay(spark, f.toString, IngestConfig(
      symbols = syms.toSeq, loadTypes = Seq("ticker"),
      outputDir = out, formats = Seq("parquet")))
    val secs = (System.nanoTime() - t0) / 1e9
    val written = spark.read.parquet(s"$out/stream=ticker/fmt=parquet").count()
    println(f"INGEST $written frames in $secs%.1fs = ${written / secs}%.0f frames/sec")
    spark.stop()
  }
}
