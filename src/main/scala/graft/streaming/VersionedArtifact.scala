package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Batch-id-versioned standing artifact — the generic mechanics under
  * every foreachBatch maintenance loop ([[StandingLabels]],
  * [[StandingHllRegisters]]): a disk artifact whose version directory
  * is the micro-batch id, which converts foreachBatch's at-least-once
  * delivery into exactly-once state.
  *
  * The contract, shared by every instance:
  *  - a version is COMMITTED iff parquet's `_SUCCESS` marker exists
  *    (an aborted write is invisible);
  *  - an absorb for batch N reads the newest committed version
  *    STRICTLY BELOW N — its own failed attempt's `v=N` is never
  *    consulted, so a replay merges against the same predecessor and
  *    overwrites `v=N` byte-identically (absorb must be a
  *    deterministic function of (predecessor state, batch rows,
  *    batch id) — every caller here is);
  *  - pruning keeps the newest [[keepBehind]]+1 versions at or below
  *    the batch just written, never state ahead of a replayed batch;
  *  - `v=-1` is the bootstrap slot: a batch-built artifact handed
  *    into the loop sorts before every real batch id.
  *
  * CLUSTER CONTRACT: like SideTables, `root` must be storage the
  * driver and every executor see at the same path; all probes go
  * through the Hadoop FileSystem of the root's scheme.
  */
object VersionedArtifact {

  /** versions kept behind the newest. One predecessor suffices for
    * replay correctness; the second is margin for an operator
    * diffing "what changed" across the last absorb. */
  private val keepBehind = 2

  private def fsFor(s: SparkSession, p: Path): FileSystem =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  /** committed (`_SUCCESS`-marked) version ids under `root`,
    * ascending. */
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

  /** the newest committed state — what consumers read between
    * batches. Zero-row table of `schema` before any commit. */
  def readLatest(s: SparkSession, root: String,
      schema: StructType): DataFrame =
    committedVersions(s, root).lastOption match {
      case Some(v) => s.read.parquet(s"$root/v=$v")
      case None => s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  /** seed the loop from a batch-built artifact (version -1). Refuses
    * to clobber a root that already has committed versions. */
  def bootstrap(artifact: DataFrame, root: String): Unit = {
    require(committedVersions(artifact.sparkSession, root).isEmpty,
      s"versioned-artifact root $root already has committed versions")
    artifact.write.mode("overwrite").parquet(s"$root/v=-1")
  }

  /** one absorb step — the foreachBatch body. `absorb` must be a
    * deterministic function of its arguments (see object scaladoc);
    * it receives the predecessor state (zero rows of `schema` on cold
    * start), the batch rows, and the batch id. */
  def absorbBatch(batch: DataFrame, batchId: Long, root: String,
      schema: StructType)
      (absorb: (DataFrame, DataFrame, Long) => DataFrame): Unit = {
    val s = batch.sparkSession
    val standing = committedVersions(s, root).filter(_ < batchId)
      .lastOption match {
        case Some(v) => s.read.parquet(s"$root/v=$v")
        case None => s.createDataFrame(
          s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      }
    absorb(standing, batch, batchId)
      .write.mode("overwrite").parquet(s"$root/v=$batchId")
    // prune: only versions at or below the batch just written — a
    // replayed batch must never delete state AHEAD of itself
    val live = committedVersions(s, root).filter(_ <= batchId)
    val fs = fsFor(s, new Path(root))
    live.dropRight(keepBehind + 1)
      .foreach(v => fs.delete(new Path(root, s"v=$v"), true))
  }

  /** start a maintenance loop: every micro-batch is absorbed into the
    * standing artifact at `root`. `checkpoint` holds the source's
    * offset progress; the artifact itself is versioned by batch id,
    * which is what makes the at-least-once re-run exactly-once. */
  def maintain(stream: DataFrame, root: String, checkpoint: String,
      schema: StructType)
      (absorb: (DataFrame, DataFrame, Long) => DataFrame)
      : StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) =>
        absorbBatch(b, id, root, schema)(absorb))
      .start()
}
