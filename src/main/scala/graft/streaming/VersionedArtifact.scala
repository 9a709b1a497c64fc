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

  // ------------------------------------------------------------------
  // MULTI-TABLE versions — for standing state that is several tables
  // with different schemas updated atomically per batch (e.g. a graph
  // artifact = edge list + label table: deletion support NEEDS the
  // edges, so labels alone aren't a sufficient state). Layout:
  // `root/v=<id>/<table>/` parquet per table, plus an explicit
  // `root/v=<id>/_COMMIT` marker written AFTER every table — parquet's
  // own per-table `_SUCCESS` can't express "all tables landed", so
  // the version-level marker is the commit point. A replay deletes
  // the stale marker FIRST, so a crash mid-overwrite leaves the
  // version invisible, never half-new.
  // ------------------------------------------------------------------

  private def commitMarker(root: String, v: Long) =
    new Path(s"$root/v=$v", "_COMMIT")

  /** committed multi-table version ids under `root`, ascending. */
  private[graft] def committedTableVersions(s: SparkSession,
      root: String): Seq[Long] = {
    val rootP = new Path(root)
    val fs = fsFor(s, rootP)
    if (!fs.exists(rootP)) return Seq.empty
    fs.listStatus(rootP).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .filter(v => fs.exists(commitMarker(root, v)))
      .sorted
  }

  private def readTables(s: SparkSession, root: String, v: Long,
      schemas: Map[String, StructType]): Map[String, DataFrame] =
    schemas.keys.map(n => n -> s.read.parquet(s"$root/v=$v/$n")).toMap

  private def emptyTables(s: SparkSession,
      schemas: Map[String, StructType]): Map[String, DataFrame] =
    schemas.map { case (n, sch) => n -> s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row], sch) }

  /** the newest committed state, one DataFrame per table — zero-row
    * tables before any commit. */
  def readLatestTables(s: SparkSession, root: String,
      schemas: Map[String, StructType]): Map[String, DataFrame] =
    committedTableVersions(s, root).lastOption match {
      case Some(v) => readTables(s, root, v, schemas)
      case None => emptyTables(s, schemas)
    }

  /** seed a multi-table loop from batch-built tables (version -1). */
  def bootstrapTables(tables: Map[String, DataFrame],
      root: String): Unit = {
    require(tables.nonEmpty, "bootstrapTables needs at least one table")
    val s = tables.head._2.sparkSession
    require(committedTableVersions(s, root).isEmpty,
      s"versioned-artifact root $root already has committed versions")
    tables.foreach { case (n, df) =>
      df.write.mode("overwrite").parquet(s"$root/v=-1/$n") }
    fsFor(s, new Path(root)).create(commitMarker(root, -1L), true).close()
  }

  /** one multi-table absorb step — same replay contract as
    * [[absorbBatch]]; `absorb` must return every table in `schemas`. */
  def absorbBatchTables(batch: DataFrame, batchId: Long, root: String,
      schemas: Map[String, StructType])
      (absorb: (Map[String, DataFrame], DataFrame, Long)
        => Map[String, DataFrame]): Unit = {
    val s = batch.sparkSession
    val standing = committedTableVersions(s, root).filter(_ < batchId)
      .lastOption match {
        case Some(v) => readTables(s, root, v, schemas)
        case None => emptyTables(s, schemas)
      }
    val out = absorb(standing, batch, batchId)
    require(out.keySet == schemas.keySet,
      s"absorb returned tables ${out.keySet}, expected ${schemas.keySet}")
    val fs = fsFor(s, new Path(root))
    // stale marker from a completed-but-uncommitted attempt: drop it
    // before touching the tables so readers never see half-new state
    fs.delete(commitMarker(root, batchId), false)
    out.foreach { case (n, df) =>
      df.write.mode("overwrite").parquet(s"$root/v=$batchId/$n") }
    fs.create(commitMarker(root, batchId), true).close()
    val live = committedTableVersions(s, root).filter(_ <= batchId)
    live.dropRight(keepBehind + 1)
      .foreach(v => fs.delete(new Path(root, s"v=$v"), true))
  }

  /** start a multi-table maintenance loop. */
  def maintainTables(stream: DataFrame, root: String, checkpoint: String,
      schemas: Map[String, StructType])
      (absorb: (Map[String, DataFrame], DataFrame, Long)
        => Map[String, DataFrame]): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) =>
        absorbBatchTables(b, id, root, schemas)(absorb))
      .start()
}
