package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.queries.PipelineOps

/** The MAINTENANCE LOOP for a standing component labeling — the piece
  * that turns the batch absorb law ([[PipelineOps.mergeDeltaComponents]],
  * proven merged==rebuilt by q263/q279/q280) into a RUNNING pipeline:
  * edge shards arrive as a stream, and every micro-batch is absorbed
  * into a persisted (node, label) table that downstream consumers read
  * between batches. This is the third leg of the lifecycle story —
  * batch artifacts (SideTables), keyed streaming state
  * (BandIndexProcessor), and a foreachBatch loop that maintains a
  * DISK artifact a whole cluster can read, not per-key state locked
  * inside one query's checkpoint.
  *
  * Exactly-once, replay, bootstrap, and pruning are
  * [[VersionedArtifact]]'s versioned-by-batch-id contract; this
  * object supplies the component-specific absorb: the previous label
  * table + the arriving edges, never a re-read of old shards — the
  * per-shard cost proven data-proportional at sf10 (PERF.md
  * q265/q272 family). An existing batch-built labeling hands off into
  * the loop via [[bootstrap]], mirroring `bandIndexStreamFrom`'s
  * standing→stream direction.
  */
object StandingLabels {

  private val EdgeSchema = StructType(Seq(
    StructField("src", LongType), StructField("dst", LongType)))
  private val LabelSchema = StructType(Seq(
    StructField("node", LongType), StructField("label", LongType)))

  private[graft] def committedVersions(s: SparkSession,
      root: String): Seq[Long] =
    VersionedArtifact.committedVersions(s, root)

  /** the current standing labels — what a downstream consumer reads
    * between batches. Empty (zero-row) table before any commit. */
  def readLatest(s: SparkSession, root: String): DataFrame =
    VersionedArtifact.readLatest(s, root, LabelSchema)

  /** seed the loop from a batch-built labeling (version -1 sorts
    * before every real batch id, so the first micro-batch absorbs
    * into it). Refuses to clobber an already-running loop's state. */
  def bootstrap(standing: DataFrame, root: String): Unit =
    VersionedArtifact.bootstrap(
      standing.select(col("node").cast("long"), col("label").cast("long")),
      root)

  // empty standing is the cold start: mergeDeltaComponents maps
  // every delta node to itself and solves the shard alone — i.e.
  // the first batch IS a from-scratch solve, no special case
  private val absorb: (DataFrame, DataFrame, Long) => DataFrame =
    (standing, batch, _) =>
      PipelineOps.mergeDeltaComponents(standing,
        batch.select(col("src").cast("long"), col("dst").cast("long")))

  /** one absorb step — the foreachBatch body, callable directly for
    * deterministic-replay tests. */
  def absorbBatch(edges: DataFrame, batchId: Long, root: String): Unit =
    VersionedArtifact.absorbBatch(edges, batchId, root, LabelSchema)(absorb)

  /** start the loop: every micro-batch of (src, dst) edges is
    * absorbed into the standing labels at `root`. */
  def maintainComponentsStream(edges: DataFrame, root: String,
      checkpoint: String): StreamingQuery = {
    require(EdgeSchema.fieldNames.toSet
        .subsetOf(edges.schema.fieldNames.toSet),
      s"edge stream must have columns (src, dst), got " +
        edges.schema.fieldNames.mkString(","))
    VersionedArtifact.maintain(edges, root, checkpoint, LabelSchema)(absorb)
  }
}
