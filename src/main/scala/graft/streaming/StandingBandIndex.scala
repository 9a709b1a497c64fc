package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.queries.TextOps
import PartitionedArtifact.{ByPart, PartsDelta, TableSpec}

/** The dedup-index instance of the maintenance loop — completing the
  * family symmetry (components [[StandingLabels]], sketches
  * [[StandingHllRegisters]], CDC graph [[StandingGraph]]): each
  * micro-batch of arriving documents' BAND ROWS (doc_id, band_id, bh
  * — the per-doc MinHash band digests, which are slice-independent,
  * so any upstream signature stage can feed the stream) absorbs into
  * a standing (bands, collisions) artifact by q265's proven delta
  * legs ([[TextOps.bandDeltaLegs]]): the shard probes the standing
  * band index asymmetrically (|shard bands| × bucket occupancy, never
  * |corpus|²) and self-joins within itself. Multi-table state because
  * the collision table alone cannot absorb the NEXT shard — the probe
  * needs the band index, exactly the reason [[StandingGraph]] carries
  * its edge list.
  *
  * EPOCH-PARTITIONED, APPEND-ONLY versions ([[PartitionedArtifact]]):
  * both tables are partitioned by the shard epoch (= batch id; -1 is
  * the bootstrap corpus), and a version writes ONLY its own epoch —
  * the standing corpus's bytes are never rewritten, so per-batch I/O
  * is |shard bands| + |delta pairs|, not O(standing) (the `_STATS`
  * counter machine-checks this in StandingBandIndexSpec). Collisions
  * are stored as PER-EPOCH CONTRIBUTIONS; [[readLatest]] presents the
  * summed (da, db, n_bands) view, exact because the legs partition
  * pair contributions disjointly across epochs (a straddling doc's
  * later rows add their shared bands in their own epoch).
  *
  * Versus [[graft.streaming.Streams.bandIndexStream]] (keyed
  * `transformWithState`, per-bucket occupancy caps, per-row emission):
  * that is the LOW-LATENCY form — candidates surface mid-batch,
  * state lives in the query's RocksDB checkpoint, and the parquet
  * artifact is reconstructed by draining admit events. This loop is
  * the ARTIFACT-FIRST form: the standing parquet IS the state,
  * readable by the whole cluster between batches, exactly-once by
  * batch-id versioning, bootstrap-able from the batch-built
  * SideTables index — the form a downstream batch dedup pass
  * consumes. A deployment picks per stream, or runs both off one
  * signature stage.
  */
object StandingBandIndex {

  private val BandSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("band_id", LongType),
    StructField("bh", StringType), StructField("epoch", LongType)))
  private val CollSchema = StructType(Seq(
    StructField("da", LongType), StructField("db", LongType),
    StructField("n_bands", LongType), StructField("epoch", LongType)))
  private[graft] val Specs: Map[String, TableSpec] = Map(
    "bands" -> TableSpec(BandSchema, ByPart("epoch")),
    "collisions" -> TableSpec(CollSchema, ByPart("epoch")))

  private val absorb: (PartitionedArtifact.Standing, DataFrame, Long)
      => Map[String, PartitionedArtifact.Delta] =
    (standing, batch, epoch) => {
      val shardRaw = batch
        .select(col("doc_id").cast("long"), col("band_id").cast("long"),
          col("bh").cast("string"))
      val standingBands = standing.table("bands").drop("epoch")
      // FIRST-WRITE-WINS per (doc_id, band_id): an at-least-once
      // UPSTREAM can re-deliver band rows in a LATER batch (different
      // batch id — the versioned-replay guard can't see it), and
      // without the gate the cross leg would join a row against its
      // own standing copy (da == db self-pairs, duplicated true
      // pairs). The grain is the ROW, not the doc: a doc whose 16
      // band rows straddle a batch boundary on FIRST delivery must
      // have its remainder inserted, not dropped. The shard side
      // rides [[Gate]]'s broadcast ceiling, so an AvailableNow
      // backfill degrades to a shuffle join instead of a driver OOM;
      // either way the standing table is scanned, never shuffled.
      val shardBands = Gate.antiAgainstStanding(
        standingBands, shardRaw, Seq("doc_id", "band_id"))
      // this epoch's pair contributions — cross-epoch contributions
      // to one (da, db) are summed at READ time, exact because the
      // legs partition the band-pair contributions disjointly
      val delta = TextOps.bandDeltaLegs(standingBands, shardBands)
        .groupBy(col("da"), col("db"))
        .agg(sum(col("n_bands")).as("n_bands"))
      Map(
        "bands" -> PartsDelta(
          shardBands.withColumn("epoch", lit(epoch)), Seq(epoch)),
        "collisions" -> PartsDelta(
          delta.withColumn("epoch", lit(epoch)), Seq(epoch)))
    }

  private[graft] def committedVersions(s: SparkSession,
      root: String): Seq[Long] =
    PartitionedArtifact.committedVersions(s, root)

  /** the current (bands, collisions) views — the epoch partitioning
    * is internal; `collisions` is the summed pair table downstream
    * dedup consumes, bit-compatible with the batch artifact. */
  def readLatest(s: SparkSession, root: String): Map[String, DataFrame] = {
    val st = PartitionedArtifact.readLatestStanding(s, root, Specs)
    Map(
      "bands" -> st.table("bands").drop("epoch"),
      "collisions" -> st.table("collisions")
        .groupBy(col("da"), col("db"))
        .agg(sum(col("n_bands")).as("n_bands")))
  }

  /** seed from the batch-built standing index (epoch -1) — e.g. the
    * SideTables `band_index_base` / `band_collisions_base` pair. */
  def bootstrap(bands: DataFrame, collisions: DataFrame,
      root: String): Unit =
    PartitionedArtifact.bootstrap(Map(
      "bands" -> bands.select(col("doc_id").cast("long"),
        col("band_id").cast("long"), col("bh").cast("string"),
        lit(-1L).as("epoch")),
      "collisions" -> collisions.select(col("da").cast("long"),
        col("db").cast("long"), col("n_bands").cast("long"),
        lit(-1L).as("epoch"))), root, Specs)

  /** one absorb step — the foreachBatch body, callable directly for
    * deterministic-replay tests. */
  def absorbBatch(bands: DataFrame, batchId: Long, root: String): Unit =
    PartitionedArtifact.absorbBatch(bands, batchId, root, Specs)(absorb)

  /** start the loop over a (doc_id, band_id, bh) band-row stream. */
  def maintainStream(bands: DataFrame, root: String,
      checkpoint: String): StreamingQuery = {
    require(Set("doc_id", "band_id", "bh")
        .subsetOf(bands.schema.fieldNames.toSet),
      s"band stream must have columns (doc_id, band_id, bh), got " +
        bands.schema.fieldNames.mkString(","))
    PartitionedArtifact.maintain(bands, root, checkpoint, Specs)(absorb)
  }
}
