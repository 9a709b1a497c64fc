package graft
import org.apache.spark.sql.SparkSession

/** One-off: dump a single catalog query's result to parquet. */
object ProbeOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, out) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(out)
    spark.stop()
  }
}
