package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.queries.LayoutOps

/** Write-side layout proof for q77's z-curve (LayoutOps.clusterByZ):
  * on a 64×64 (x, y) grid written as 16 files, a predicate on the
  * NON-leading dimension must skip most z-clustered files, while the
  * 1-D x-sorted layout can never skip any (every x-run spans all of
  * y). File-level min/max footprints stand in for parquet row-group
  * stats — the same interval-overlap test every scan planner runs.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def fileRanges(dir: String): Array[(Long, Long, Long, Long)] =
    spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg(min($"x").as("xmin"), max($"x").as("xmax"),
        min($"y").as("ymin"), max($"y").as("ymax"))
      .select($"xmin", $"xmax", $"ymin", $"ymax")
      .as[(Long, Long, Long, Long)].collect()

  test("z-clustered files prune a 2nd-dimension predicate; 1-D sort cannot") {
    val grid = (for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y))
      .toDF("x", "y")
    val zdir = Files.createTempDirectory("zorder").toString + "/t"
    val ldir = Files.createTempDirectory("linear").toString + "/t"
    LayoutOps.clusterByZ(grid, $"x", $"y", 16)
      .drop("zval").write.parquet(zdir)
    grid.repartitionByRange(16, $"x").sortWithinPartitions($"x")
      .write.parquet(ldir)

    // the scan-planner question: which files can contain y ∈ [0, 7]?
    def overlapping(rs: Array[(Long, Long, Long, Long)]): Int =
      rs.count { case (_, _, ymin, ymax) => ymin <= 7 && ymax >= 0 }

    val zr = fileRanges(zdir)
    val lr = fileRanges(ldir)
    assert(zr.length == 16 && lr.length == 16)
    // x-sorted: every file spans the full y range — zero skipping
    assert(overlapping(lr) == 16,
      s"expected no y-pruning in the linear layout, got ${overlapping(lr)}")
    // z-clustered: consecutive z ranges are spatial tiles; only the
    // bottom row of tiles touches y ≤ 7 (≤ 6 of 16 with sampled
    // range boundaries; exactly 4 under perfect tiling)
    assert(overlapping(zr) <= 6,
      s"z layout should skip most files for y ≤ 7: ${zr.toSeq}")
    // and the z files are tight on BOTH dims (no file spans a full
    // dimension, which is what makes 2-D pruning possible at all)
    assert(zr.forall { case (xmin, xmax, ymin, ymax) =>
      xmax - xmin < 63 && ymax - ymin < 63 }, zr.toSeq.toString)
  }
}
