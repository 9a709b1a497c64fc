package graft.tools

import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Scratch diagnostic main (not part of the catalog). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val g0 = gcMs; val r = f
      println(f"[probe] $tag: ${(System.nanoTime()-t0)/1e9}%.2f s " +
        f"(gc ${(gcMs-g0)/1000.0}%.2f s)"); r
    }
    time("warmup q01")(
      graft.SparkEntry.queries("q01_pricing_summary")(spark, dir).count())
    for (i <- 1 to 3)
      time(s"tri run$i")(
        graft.SparkEntry.queries("q123_triangles")(spark, dir).count())
    spark.stop()
  }
}
