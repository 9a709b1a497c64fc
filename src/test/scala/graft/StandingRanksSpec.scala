package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.{Ckpt, PipelineOps}
import graft.streaming.StandingRanks

/** The rank maintenance loop (q270/q283's warm-start absorb as a
  * pipeline): stream-maintained ranks must land inside the fixpoint's
  * contraction neighborhood of a cold solve over every edge that ever
  * arrived, each absorb must pay warm (not cold) rounds, per-batch
  * edge writes must be the fresh delta only, and replays must no-op.
  */
class StandingRanksSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** |stream − cold| per node must be within 2·eps·d/(1−d) fixed-
    * point units: both are eps-stable states of the same contraction,
    * so they can differ by at most twice the stability radius. */
  private val ContractionBoundFp = 2L * 1000000L * 85L / 15L

  private def prepared(edges: DataFrame): (DataFrame, Long) = {
    val sym = edges.unionByName(
      edges.select(col("dst").as("src"), col("src").as("dst")))
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val ej = Ckpt.cutPartitioned(
      sym.join(deg, "src").repartition(col("src")))
    (ej, ej.select(col("src")).distinct().count())
  }

  // a standing graph big enough that the delta is genuinely small —
  // warm starts only beat cold when |delta| ≪ |graph| (the q270
  // regime); batch 2 grows a leaf chain and adds an internal edge
  private val b0 = (2L to 31L).map(i => (1L, i)) ++
    Seq((100L, 101L), (101L, 102L))
  private val b1 = Seq((31L, 200L), (102L, 103L), (2L, 3L))

  test("stream-maintained ranks track the cold fixpoint within the contraction bound") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmp("sr-state")
    val in = MemoryStream[(Long, Long)]
    val q = StandingRanks.maintainStream(
      in.toDF().toDF("src", "dst"), root, tmp("sr-ckpt"))
    try {
      in.addData(b0); q.processAllAvailable()
      in.addData(b1); q.processAllAvailable()
    } finally q.stop()
    val got = StandingRanks.readLatest(spark, root)("ranks")
    val (ej, n) = prepared((b0 ++ b1).toDF("src", "dst"))
    val (cold, coldRounds) = PipelineOps.pagerankFixpoint(ej, n)
    val gap = got.select(col("node"), col("r"))
      .join(cold.withColumnRenamed("r", "rc"), "node")
      .agg(max(abs(col("r") - col("rc")))).head().getLong(0)
    assert(gap <= ContractionBoundFp, s"gap $gap fp")
    assert(got.count() == cold.count())
    // the second absorb ran WARM: fewer rounds than its cold solve
    val warm = got.agg(max(col("warm_rounds"))).head().getLong(0)
    assert(warm < coldRounds, s"warm $warm !< cold $coldRounds")
    // per-batch edge writes are the fresh delta only
    assert(graft.streaming.PartitionedArtifact
      .writeStats(spark, root, 1L)("edges") == b1.size.toLong)
  }

  test("bootstrap from a batch-built vector; replay no-ops; duplicate edges are dropped") {
    val root = tmp("sr-boot")
    val base = b0.toDF("src", "dst")
    val (ej, n) = prepared(base)
    val (ranks, rounds) = PipelineOps.pagerankFixpoint(ej, n)
    StandingRanks.bootstrap(base, ranks, rounds.toLong, root)
    // absorb with a RE-DELIVERED edge alongside fresh ones: the dup
    // must not inflate out-degrees (set semantics)
    StandingRanks.absorbBatch(
      (b1 ++ Seq((1L, 2L))).toDF("src", "dst"), 0L, root)
    assert(StandingRanks.readLatest(spark, root)("edges")
      .count() == (b0 ++ b1).size.toLong)
    assert(graft.streaming.PartitionedArtifact
      .writeStats(spark, root, 0L)("edges") == b1.size.toLong)
    val after = StandingRanks.readLatest(spark, root)("ranks")
      .as[(Long, Long, Long)].collect().toSet
    // replay of the committed batch is a reader-safe no-op
    StandingRanks.absorbBatch(
      Seq((99L, 100L)).toDF("src", "dst"), 0L, root)
    assert(StandingRanks.readLatest(spark, root)("ranks")
      .as[(Long, Long, Long)].collect().toSet == after)
  }
}
