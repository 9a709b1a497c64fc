package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sinks.Sinks

/** Read-side scale proofs over the sink layout:
  *
  *  1. partition PRUNING — a symbol predicate against the
  *     `partitionBy(stream, symbol)` directory layout must become a
  *     PartitionFilter (directory-level skip), not a row filter over
  *     a full scan. At 100 TB this is the difference between reading
  *     one symbol's files and reading everything.
  *  2. schema EVOLUTION — a later snapshot adding a column must union
  *     with an earlier one (`unionByName(allowMissingColumns)`), the
  *     everyday reality of long-lived ingest directories.
  */
class ScaleReadSpec extends SparkSpec {
  import spark.implicits._

  test("symbol filter on the partitioned sink layout is partition-pruned") {
    val dir = Files.createTempDirectory("prune").toString
    val df = Seq(
      ("ticker", "BTCUSDT", 1.0), ("ticker", "ETHUSDT", 2.0),
      ("trades", "BTCUSDT", 3.0), ("trades", "SOLUSDT", 4.0))
      .toDF("stream", "symbol", "price")
    Sinks.writeKeyed(df, dir)
    val read = spark.read.parquet(dir).filter($"symbol" === "BTCUSDT")
    val scan = read.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    // the predicate lands in partitionFilters (directory pruning)...
    assert(scan.partitionFilters.exists(_.references.exists(
      _.name == "symbol")), s"symbol not in ${scan.partitionFilters}")
    // ...and the scan actually selects only the 2 BTCUSDT partitions
    assert(scan.relation.location.listFiles(
      scan.partitionFilters, scan.dataFilters).map(_.files.size).sum == 2)
    assert(read.count() == 2)
  }

  test("schema evolution: later snapshot's new column unions as null") {
    val v1 = Seq((1L, "a")).toDF("id", "payload")
    val v2 = Seq((2L, "b", "EU")).toDF("id", "payload", "region")
    val all = v1.unionByName(v2, allowMissingColumns = true)
    assert(all.columns.toSeq == Seq("id", "payload", "region"))
    val rows = all.orderBy($"id").collect()
    assert(rows(0).isNullAt(2)) // old snapshot: region backfills null
    assert(rows(1).getString(2) == "EU")
  }
}
