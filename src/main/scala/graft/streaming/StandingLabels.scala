package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}

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
  * between batches. This is the missing third leg of the lifecycle
  * story — batch artifacts (SideTables), keyed streaming state
  * (BandIndexProcessor), and now a foreachBatch loop that maintains a
  * DISK artifact a whole cluster can read, not per-key state locked
  * inside one query's checkpoint.
  *
  * Exactly-once without a transactional sink: the state directory is
  * VERSIONED BY BATCH ID (`<root>/v=<batchId>`). foreachBatch is
  * at-least-once — after a crash, Structured Streaming re-runs the
  * last uncommitted batch with the SAME id — so [[absorbBatch]] makes
  * re-runs deterministic instead of trying to make them not happen:
  * it reads the newest committed version STRICTLY BELOW the incoming
  * batch id (a half-written or fully-written `v=N` from the failed
  * attempt is ignored, never merged twice) and overwrites `v=N`
  * whole. Replaying batch N against the same predecessor state yields
  * byte-identical output, so duplicate delivery collapses to an
  * idempotent overwrite — the same recipe Spark's own file sinks use
  * (batch-id-named manifests), applied to a derived artifact.
  *
  * The loop NEVER re-reads old shards: per batch it touches the
  * previous label table + the arriving edges — the absorb cost proven
  * data-proportional at sf10 (PERF.md q265/q272 family). An existing
  * batch-built labeling hands off into the loop via [[bootstrap]]
  * (written as version -1, i.e. "before every batch"), mirroring
  * `bandIndexStreamFrom`'s standing→stream direction. A version is
  * committed iff parquet's `_SUCCESS` marker is present; older
  * versions are pruned to a small keep-window (re-runs only ever
  * target the LAST batch, so deep history is never consulted).
  *
  * CLUSTER CONTRACT: like SideTables, `root` must be storage every
  * executor and the driver see at the same path; all probes go
  * through the Hadoop FileSystem of the root's scheme.
  */
object StandingLabels {

  private val EdgeSchema = StructType(Seq(
    StructField("src", LongType), StructField("dst", LongType)))
  private val LabelSchema = StructType(Seq(
    StructField("node", LongType), StructField("label", LongType)))

  /** versions kept behind the newest (the newest itself plus this
    * many predecessors survive pruning). One predecessor is enough
    * for re-run correctness; a second is margin for an operator
    * inspecting "what changed" across the last absorb. */
  private val KeepBehind = 2

  private def fsFor(s: SparkSession, p: Path): FileSystem =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  /** committed (`_SUCCESS`-marked) version ids under `root`, sorted
    * ascending. A `v=` directory without the marker is an aborted
    * write and is invisible to readers. */
  private[graft] def committedVersions(s: SparkSession,
      root: String): Seq[Long] = {
    val rootP = new Path(root)
    val fs = fsFor(s, rootP)
    if (!fs.exists(rootP)) return Seq.empty
    fs.listStatus(rootP).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .filter(st => fs.exists(new Path(st.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .sorted
  }

  /** the current standing labels — what a downstream consumer reads
    * between batches. Empty (zero-row) table before any commit. */
  def readLatest(s: SparkSession, root: String): DataFrame =
    committedVersions(s, root).lastOption match {
      case Some(v) => s.read.parquet(s"$root/v=$v")
      case None => s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row], LabelSchema)
    }

  /** seed the loop from a batch-built labeling (version -1 sorts
    * before every real batch id, so the first micro-batch absorbs
    * into it). Refuses to clobber an already-running loop's state. */
  def bootstrap(standing: DataFrame, root: String): Unit = {
    val s = standing.sparkSession
    require(committedVersions(s, root).isEmpty,
      s"standing-label root $root already has committed versions")
    standing.select(col("node").cast("long"), col("label").cast("long"))
      .write.mode("overwrite").parquet(s"$root/v=-1")
  }

  /** one absorb step — the foreachBatch body, callable directly for
    * deterministic-replay tests. Reads the newest committed version
    * BELOW `batchId`, merges the batch's edges, overwrites
    * `v=<batchId>`, prunes committed versions older than the keep
    * window. */
  def absorbBatch(edges: DataFrame, batchId: Long, root: String): Unit = {
    val s = edges.sparkSession
    val versions = committedVersions(s, root)
    val standing = versions.filter(_ < batchId).lastOption match {
      case Some(v) => s.read.parquet(s"$root/v=$v")
      case None => s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row], LabelSchema)
    }
    // empty standing is the cold start: mergeDeltaComponents maps
    // every delta node to itself and solves the shard alone — i.e.
    // the first batch IS a from-scratch solve, no special case
    val merged = PipelineOps.mergeDeltaComponents(standing,
      edges.select(col("src").cast("long"), col("dst").cast("long")))
    merged.write.mode("overwrite").parquet(s"$root/v=$batchId")
    // prune: only versions at or below the batch just written — a
    // replayed batch must never delete state AHEAD of itself
    val live = committedVersions(s, root).filter(_ <= batchId)
    val fs = fsFor(s, new Path(root))
    live.dropRight(KeepBehind + 1)
      .foreach(v => fs.delete(new Path(root, s"v=$v"), true))
  }

  /** start the loop: every micro-batch of (src, dst) edges is
    * absorbed into the standing labels at `root`. `checkpoint` is the
    * Structured Streaming offset checkpoint (source progress);
    * the label state itself lives in `root` and is versioned by batch
    * id, which is what makes the at-least-once re-run exactly-once on
    * the artifact. */
  def maintainComponentsStream(edges: DataFrame, root: String,
      checkpoint: String): StreamingQuery = {
    require(edges.schema.fieldNames.toSet == EdgeSchema.fieldNames.toSet,
      s"edge stream must have columns (src, dst), got " +
        edges.schema.fieldNames.mkString(","))
    edges.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) => absorbBatch(b, id, root))
      .start()
  }
}
