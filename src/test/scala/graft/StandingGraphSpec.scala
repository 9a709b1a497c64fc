package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.queries.PipelineOps
import graft.streaming.StandingGraph

/** The CDC graph loop: a changelog of edge adds and node deletes,
  * absorbed batch-by-batch into a standing (edges, labels) artifact,
  * must track what a from-scratch solve over the surviving graph
  * would say at every step — deletes before adds within a batch,
  * same-batch re-introduction legal, replays idempotent against the
  * multi-table commit marker.
  */
class StandingGraphSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def labels(root: String): Map[Long, Long] =
    StandingGraph.readLatest(spark, root)("labels")
      .as[(Long, Long)].collect().toMap

  private def edges(root: String): Set[(Long, Long)] =
    StandingGraph.readLatest(spark, root)("edges")
      .as[(Long, Long)].collect().toSet

  test("CDC stream: deletes split, adds re-bridge and resurrect, state tracks truth") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmp("sg-state")
    val in = MemoryStream[(String, Long, Long)]
    val q = StandingGraph.maintainStream(
      in.toDF().toDF("kind", "src", "dst"), root, tmp("sg-ckpt"))
    try {
      in.addData(("add", 1L, 2L), ("add", 2L, 3L), ("add", 10L, 11L))
      q.processAllAvailable()
      assert(labels(root) ==
        Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
      // delete the cut vertex 2 (splits {1,2,3}; 1 and 3 survive
      // isolated) and add (3,4) in the SAME batch — the delete
      // applies first, so 4 chains onto the isolated 3
      in.addData(("del", 2L, -1L), ("add", 3L, 4L))
      q.processAllAvailable()
      assert(labels(root) ==
        Map(1L -> 1L, 3L -> 3L, 4L -> 3L, 10L -> 10L, 11L -> 10L))
      assert(edges(root) == Set((3L, 4L), (10L, 11L)))
      // resurrection: a later add re-introduces node 2; another add
      // bridges the split half into the other standing component
      in.addData(("add", 1L, 2L), ("add", 4L, 10L))
      q.processAllAvailable()
      assert(labels(root) ==
        Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 10L -> 3L,
          11L -> 3L))
      // a DELETE-ONLY batch (the adds fast path must not skip it)
      in.addData(("del", 11L, -1L))
      q.processAllAvailable()
    } finally q.stop()
    assert(labels(root) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 10L -> 3L))
    // the final labels equal a from-scratch solve over the final edges
    val scratch = PipelineOps.connectedComponents(
        edges(root).toSeq.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(labels(root) == scratch)
  }

  test("multi-table replay: committed version no-ops, crash debris recomputes") {
    val root = tmp("sg-replay")
    StandingGraph.absorbBatch(
      Seq(("add", 1L, 2L), ("add", 10L, 11L)).toDF("kind", "src", "dst"),
      0L, root)
    StandingGraph.absorbBatch(
      Seq(("del", 2L, -1L)).toDF("kind", "src", "dst"), 1L, root)
    assert(labels(root) == Map(1L -> 1L, 10L -> 10L, 11L -> 10L))
    // committed version → reader-safe no-op even with new content
    StandingGraph.absorbBatch(
      Seq(("del", 11L, -1L)).toDF("kind", "src", "dst"), 1L, root)
    assert(labels(root) == Map(1L -> 1L, 10L -> 10L, 11L -> 10L))
    // crash mid-write (tables landed, _COMMIT didn't): the replay
    // must read v=0 — where node 2 and edge (1,2) still exist — and
    // overwrite the debris whole
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(root, "v=1", "_COMMIT"))
    StandingGraph.absorbBatch(
      Seq(("del", 11L, -1L)).toDF("kind", "src", "dst"), 1L, root)
    assert(labels(root) == Map(1L -> 1L, 2L -> 1L, 10L -> 10L))
    assert(edges(root) == Set((1L, 2L)))
    assert(StandingGraph.committedVersions(spark, root) == Seq(0L, 1L))
  }

  test("re-adding standing edges never accretes duplicates, in both gate regimes") {
    // the edge-set invariant is maintained by a shard-side anti probe
    // (standing is never shuffled); a re-add of an edge that is
    // ALREADY standing must vanish, and the shuffle-fallback regime
    // (gate=0, the AvailableNow-backfill path) must produce identical
    // state
    for (gate <- Seq(None, Some("0"))) {
      gate.foreach(System.setProperty("graft.relabel.bcast.max.rows", _))
      try {
        val root = tmp("sg-readd")
        StandingGraph.absorbBatch(
          Seq(("add", 1L, 2L), ("add", 2L, 3L)).toDF("kind", "src", "dst"),
          0L, root)
        // re-add (1,2) — already standing — alongside a fresh edge,
        // with an in-batch duplicate of the fresh edge too
        StandingGraph.absorbBatch(
          Seq(("add", 1L, 2L), ("add", 3L, 4L), ("add", 3L, 4L))
            .toDF("kind", "src", "dst"), 1L, root)
        assert(edges(root) == Set((1L, 2L), (2L, 3L), (3L, 4L)))
        assert(StandingGraph.readLatest(spark, root)("edges").count() == 3L)
        assert(labels(root) ==
          Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
      } finally gate.foreach(_ =>
        System.clearProperty("graft.relabel.bcast.max.rows"))
    }
  }

  /** every regular file under `dir` → (size, mtime) — the
    * bytes-untouched probe for standing partitions. */
  private def snap(dir: String): Map[String, (Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(dir)
    java.nio.file.Files.walk(p).iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .map(f => f.toString -> (java.nio.file.Files.size(f),
        java.nio.file.Files.getLastModifiedTime(f).toMillis))
      .toMap
  }

  test("a batch touching one component writes only that component's partitions") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmp("sg-delta")
    // comp A: chain 1-2-3 (2 edges); comp B: a 100-edge star that no
    // batch below touches — its label-partition bytes must never move
    val big = (0 until 100).map(i => (1000L, 1001L + i))
    val base = (Seq((1L, 2L), (2L, 3L)) ++ big).toDF("src", "dst")
    StandingGraph.bootstrap(base,
      PipelineOps.connectedComponents(base), root)
    val bigDir = s"$root/v=-1/edges/label=1000"
    val compADir = s"$root/v=-1/edges/label=1"
    val bigFiles = snap(bigDir)
    val compAFiles = snap(compADir)
    // an extending add on comp A changes no existing row's label, so
    // it APPENDS exactly the fresh edge — 1 row, and even comp A's
    // own standing bytes stay untouched (not 3 rows, never 103)
    StandingGraph.absorbBatch(
      Seq(("add", 3L, 4L)).toDF("kind", "src", "dst"), 0L, root)
    val st0 = graft.streaming.PartitionedArtifact.writeStats(
      spark, root, 0L)
    assert(st0("edges") == 1L, st0.toString)
    assert(snap(bigDir) == bigFiles)
    assert(snap(compADir) == compAFiles)
    // a delete that SPLITS comp A: partition 1 is replaced (its
    // survivors moved out), the surviving edge appends into the new
    // split partition — 1 row written, comp B still untouched
    StandingGraph.absorbBatch(
      Seq(("del", 2L, -1L)).toDF("kind", "src", "dst"), 1L, root)
    val st1 = graft.streaming.PartitionedArtifact.writeStats(
      spark, root, 1L)
    assert(st1("edges") == 1L, st1.toString)
    assert(snap(bigDir) == bigFiles)
    // equality with a from-scratch solve over the surviving graph
    val scratch = PipelineOps.connectedComponents(
        edges(root).toSeq.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    // isolated node 1 lost all edges; the loop keeps it labeled
    assert(labels(root) == scratch ++ Map(1L -> 1L))
    assert(edges(root) == Set((3L, 4L)) ++ big.toSet)
  }

  test("append fragmentation compacts at the ref ceiling, state intact") {
    // each pure-insert batch appends one file set to the target
    // partition; at GRAFT_ARTIFACT_MAX_PART_REFS the partition must
    // fold back to a single reference (inline, replay-safe), and the
    // graph must still equal the from-scratch truth
    System.setProperty("graft.artifact.max.part.refs", "3")
    try {
      val root = tmp("sg-compact")
      StandingGraph.bootstrap(Seq((1L, 2L)).toDF("src", "dst"),
        PipelineOps.connectedComponents(Seq((1L, 2L)).toDF("src", "dst")),
        root)
      // 6 single-edge extending adds onto component 1
      (0L to 5L).foreach { i =>
        StandingGraph.absorbBatch(
          Seq(("add", 2L + i, 3L + i)).toDF("kind", "src", "dst"),
          i, root)
      }
      val refs = graft.streaming.PartitionedArtifact
        .partRefCounts(spark, root, "edges")
      assert(refs.nonEmpty && refs.values.max <= 3, refs.toString)
      assert(edges(root) ==
        (0L to 6L).map(i => (1L + i, 2L + i)).toSet)
      val scratch = PipelineOps.connectedComponents(
          edges(root).toSeq.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      assert(labels(root) == scratch)
    } finally System.clearProperty("graft.artifact.max.part.refs")
  }

  test("bootstrap seeds the loop from a batch-built graph") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmp("sg-boot")
    val base = Seq((1L, 2L), (10L, 11L)).toDF("src", "dst")
    StandingGraph.bootstrap(base,
      PipelineOps.connectedComponents(base), root)
    val in = MemoryStream[(String, Long, Long)]
    val q = StandingGraph.maintainStream(
      in.toDF().toDF("kind", "src", "dst"), root, tmp("sg-boot-ckpt"))
    try {
      // the delete needs the BOOTSTRAPPED edges to know 11 survives
      in.addData(("del", 10L, -1L), ("add", 2L, 11L))
      q.processAllAvailable()
    } finally q.stop()
    assert(labels(root) == Map(1L -> 1L, 2L -> 1L, 11L -> 1L))
    assert(edges(root) == Set((1L, 2L), (2L, 11L)))
  }
}
