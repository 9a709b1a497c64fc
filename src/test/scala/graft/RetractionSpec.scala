package graft

import org.apache.spark.sql.functions._
import graft.queries.{GraphOps, PipelineOps}

/** The retraction family (q274-q277): standing artifacts must FORGET
  * — the GDPR/retraction half of the absorb story — and forgetting
  * must equal a from-scratch rebuild over the surviving data. These
  * specs pin the shapes the SF-swept oracles can't isolate:
  * component SPLITS (including deleting the min-label node), whole
  * components vanishing, survivors isolated by the purge, untouched
  * components passing through byte-identical, both relabel gate
  * regimes, and the triangle decrement against the engine's own
  * from-scratch counter.
  */
class RetractionSpec extends SparkSpec {
  import spark.implicits._

  test("retractNodesComponents equals from-scratch CC on every retraction shape") {
    // the shapes deletion can take: (a) a cut vertex SPLITS a path
    // component, (b) the component's MIN-LABEL node is deleted (the
    // survivors must re-elect a min), (c) a whole component is
    // deleted (no output rows), (d) survivors isolated by the purge
    // (label themselves), (e) an untouched component (byte-identical
    // pass-through)
    val base = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), // (a) path, cut at 3
      (10L, 11L), (11L, 12L), (10L, 12L),     // (b) triangle, min 10 dies
      (20L, 21L),                             // (c) vanishes entirely
      (30L, 31L), (31L, 32L),                 // (d) 31 left isolated
      (40L, 41L)                              // (e) untouched
    ).toDF("src", "dst")
    val deleted = Seq(3L, 10L, 20L, 21L, 30L, 32L).toDF("node")
    val standing = PipelineOps.connectedComponents(base)
    val got = PipelineOps.retractNodesComponents(standing, base, deleted)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L, // split: two new comps
      11L -> 11L, 12L -> 11L,                 // min re-elected
      31L -> 31L,                             // isolated survivor
      40L -> 40L, 41L -> 40L))                // untouched
    // deleted nodes must be gone from the labeling
    assert(Seq(3L, 10L, 20L, 21L, 30L, 32L).forall(!got.contains(_)))
  }

  test("retractNodesComponents matches connectedComponents on the surviving graph") {
    // randomized-ish cross-check on a denser graph: the retraction
    // output must equal a from-scratch solve over surviving edges
    // plus self-labels for survivors that lost every edge
    val base = (0L until 60L).map(i => (i, (i + 7) % 60))
      .toDF("src", "dst")
    val deleted = (0L until 60L).filter(_ % 5 == 0).map(Tuple1(_))
      .toDF("node")
    val standing = PipelineOps.connectedComponents(base)
    val got = PipelineOps.retractNodesComponents(standing, base, deleted)
      .as[(Long, Long)].collect().toMap
    val keep = (0L until 60L).filterNot(_ % 5 == 0).toSet
    val retained = base.as[(Long, Long)].collect()
      .filter { case (a, b) => keep(a) && keep(b) }
    val scratch = PipelineOps.connectedComponents(
      retained.toSeq.toDF("src", "dst")).as[(Long, Long)].collect().toMap
    val withEdge = retained.flatMap { case (a, b) => Seq(a, b) }.toSet
    val isolated = (keep -- withEdge).map(n => n -> n).toMap
    assert(got == scratch ++ isolated)
  }

  test("retractNodesComponents gate regimes: broadcast gated, fallback agrees") {
    // same discipline as mergeDeltaComponents' relabel gate: the
    // touched-label set broadcasts below the ceiling and falls back
    // to shuffle-hash at 0 — identical labels either way. The
    // touched joins are the label-keyed semi/anti pair.
    val base = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
      .toDF("src", "dst")
    val deleted = Seq(2L, 20L, 21L).toDF("node")
    val standing = PipelineOps.connectedComponents(base)
    def touchedJoins(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") &&
          (l.contains("LeftAnti") || l.contains("LeftSemi")) &&
          l.contains("label#")).toSeq
    val viaB = PipelineOps.retractNodesComponents(standing, base, deleted)
    val bJoins = touchedJoins(viaB)
    assert(bJoins.nonEmpty &&
      bJoins.forall(_.contains("BroadcastHashJoin")), bJoins.toString)
    val setOf = (df: org.apache.spark.sql.DataFrame) =>
      df.as[(Long, Long)].collect().toSet
    System.setProperty("graft.relabel.bcast.max.rows", "0")
    val viaX = try {
      val x = PipelineOps.retractNodesComponents(standing, base, deleted)
      val xJoins = touchedJoins(x)
      assert(xJoins.nonEmpty &&
        xJoins.forall(_.contains("ShuffledHashJoin")), xJoins.toString)
      setOf(x)
    } finally System.clearProperty("graft.relabel.bcast.max.rows")
    assert(setOf(viaB) == viaX)
    assert(setOf(viaB) ==
      Set((1L, 1L), (3L, 3L), (10L, 10L), (11L, 10L)))
  }

  test("q275 triangle decrement equals the engine's own from-scratch count") {
    // retracted = standing − delta-decomposition decrement must match
    // triCorners over the surviving edges — same engine, two paths
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val e = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v")).distinct()
    val coin = conv(substring(md5(concat_ws(":", col("u"), col("v"))),
      1, 15), 16, 10).cast("long") % 100
    graft.functions.SortedIntersect.register(spark)
    val scratchRet = GraphOps.triCorners(e.filter(coin < 90))
      .withColumnRenamed("tri", "sc_ret")
    val scratchFull = GraphOps.triCorners(e)
      .withColumnRenamed("tri", "sc_full")
    val got = SparkEntry.queries("q275_triangles_retract")(spark, sf())
    val joined = got
      .join(scratchFull, Seq("node"), "left")
      .join(scratchRet, Seq("node"), "left")
      .select(col("node"), col("tri_full"), col("tri_retained"),
        coalesce(col("sc_full"), lit(0L)).as("sc_full"),
        coalesce(col("sc_ret"), lit(0L)).as("sc_ret"))
      .collect()
    assert(joined.length == got.count().toInt && joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getLong(1) == r.getLong(3),
        s"node ${r.getLong(0)}: tri_full ${r.getLong(1)} != scratch ${r.getLong(3)}")
      assert(r.getLong(2) == r.getLong(4),
        s"node ${r.getLong(0)}: tri_retained ${r.getLong(2)} != scratch ${r.getLong(4)}")
    }
    // the retraction must actually bite at this SF
    assert(joined.exists(r => r.getLong(1) != r.getLong(2)),
      "no node lost a triangle — the coin removed nothing")
  }

  test("IVF cell subtraction drops fully-emptied cells, keeps exact sums") {
    // the branch the q278 oracle can't reach at the tested SFs: a
    // cell whose every vector is deleted must VANISH (a from-scratch
    // rebuild emits no row for it), not linger as a zero vector
    val full = Seq(
      (1L, Seq(10L, 20L), 3L),  // partially purged
      (2L, Seq(5L, 5L), 2L),    // fully purged -> must drop
      (3L, Seq(7L, 9L), 1L)     // untouched
    ).toDF("label", "sv", "n")
    val del = Seq(
      (1L, Seq(4L, 6L), 2L),
      (2L, Seq(5L, 5L), 2L)
    ).toDF("label", "sv", "n")
    val got = graft.queries.SimilarityOps.subtractCellStats(full, del)
      .as[(Long, Seq[Long], Long)].collect().toSet
    assert(got == Set(
      (1L, Seq(6L, 14L), 1L),
      (3L, Seq(7L, 9L), 1L)))
  }
}
