package graft.queries

import org.apache.spark.sql.SparkSession

/** Dev tool: time the text family's shared-table stages and q36
  * end-to-end at a given SF dir — separates the one-off memoized
  * builds (shingle table, signature slots, band index) from the
  * per-query work (candidate self-join + verify), which min-of-2
  * bench numbers conflate. Usage:
  * `runMain graft.queries.StageProbe <sfDir>` */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        f"  ($n rows)")
    }
    t("shingleTable")(TextOps.shingleTable(spark, dir).count())
    t("minhashSlots")(TextOps.minhashSlots(spark, dir).count())
    t("minhashBands")(TextOps.minhashBands(spark, dir).count())
    t("candidates")(TextOps.minhashCandidates(spark, dir).count())
    t("q36 full")(
      graft.SparkEntry.queries("q36_minhash_lsh")(spark, dir).count())
    t("q36 again")(
      graft.SparkEntry.queries("q36_minhash_lsh")(spark, dir).count())
    spark.stop()
  }
}
