package graft.tools

import org.apache.spark.sql.SparkSession

/** dev-only: print the formatted physical plan (and optionally time)
  * for one catalog query: runMain graft.tools.Explain <name> [sfDir] [time]. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    if (args.contains("time")) {
      val t0 = System.nanoTime()
      println(s"ROWS=${df.count()} in ${(System.nanoTime() - t0) / 1e9}s")
      val t1 = System.nanoTime()
      println(s"ROWS=${df.count()} in ${(System.nanoTime() - t1) / 1e9}s (warm)")
    }
    spark.stop()
  }
}
