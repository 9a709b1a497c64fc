package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** shared local session; one per suite (JVM-wide getOrCreate). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // exchange wire frames use case-significant keys (p/P, e/E) —
    // raw-frame projections require case-sensitive resolution
    .config("spark.sql.caseSensitive", "true")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def sf(path: String = "sf0.001"): String = s"/root/testdata/$path"
}
