package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.queries.PipelineOps

/** CDC maintenance of a standing graph — the full-algebra loop:
  * [[StandingLabels]] absorbs edge arrivals, but a real changelog
  * also DELETES (GDPR purges, corpus retractions), and deletion
  * needs the edge list (a split re-solves the touched components'
  * surviving induced edges — labels alone are not a sufficient
  * state, which is exactly why this instance is multi-table). The
  * standing artifact is therefore (edges, labels), versioned
  * atomically per batch by [[VersionedArtifact]]'s multi-table
  * contract.
  *
  * Event stream: (kind, src, dst) — `kind = "add"` is an edge
  * arrival, `kind = "del"` retracts the node `src` (dst ignored) and
  * every incident edge. WITHIN a batch, changelog order is "deletes
  * first, then adds", both against the predecessor state: an add
  * incident to a node deleted in the same batch RE-INTRODUCES that
  * node — CDC semantics, where a later add legitimately resurrects.
  * (The standing-tombstone policy — a purged id may never return —
  * is q280's, enforced by filtering the event stream against the
  * tombstone set BEFORE this loop; the loop itself stays
  * policy-free.) Batch-to-batch, each absorb applies
  * [[PipelineOps.retractNodesComponents]] then
  * [[PipelineOps.mergeDeltaComponents]] — the two halves whose
  * arbitrary interleaving q280 proved equal to a from-scratch solve.
  *
  * Scale note: the labels update touches only delta + touched
  * components (the absorb/retract laws' shape), but this instance
  * REWRITES the edge table per version — the honest cost of deletion
  * support in a versioned artifact. The 100 TB deployment partitions
  * the persisted edge table BY LABEL (q274's layout) and overwrites
  * only touched partitions; the per-batch labels math is identical.
  */
object StandingGraph {

  private val EventSchema = StructType(Seq(
    StructField("kind", StringType), StructField("src", LongType),
    StructField("dst", LongType)))
  private[graft] val Schemas: Map[String, StructType] = Map(
    "edges" -> StructType(Seq(
      StructField("src", LongType), StructField("dst", LongType))),
    "labels" -> StructType(Seq(
      StructField("node", LongType), StructField("label", LongType))))

  private val absorb: (Map[String, DataFrame], DataFrame, Long)
      => Map[String, DataFrame] =
    (state, batch, _) => {
      val dels = batch.filter(col("kind") === "del")
        .select(col("src").cast("long").as("node")).distinct()
      val adds = batch.filter(col("kind") === "add")
        .select(col("src").cast("long"), col("dst").cast("long"))
      val edges0 = state("edges")
      val labels0 = state("labels")
      // fast paths decided on the MICRO-BATCH (one tiny job each):
      // an add-dominated stream must not pay the retraction
      // machinery's standing-state jobs for every delete-free batch,
      // nor the merge's for a delete-only one
      val hasDels = !dels.isEmpty
      val hasAdds = !adds.isEmpty
      // deletes against the predecessor state...
      val edges1 =
        if (!hasDels) edges0
        else edges0
          .join(dels.select(col("node").as("src")), Seq("src"), "left_anti")
          .join(dels.select(col("node").as("dst")), Seq("dst"), "left_anti")
          .select(col("src"), col("dst"))
      val labels1 =
        if (!hasDels) labels0
        else PipelineOps.retractNodesComponents(labels0, edges0, dels)
      // ...then adds on top (same-batch re-introduction is legal CDC)
      val labels2 =
        if (!hasAdds) labels1
        else PipelineOps.mergeDeltaComponents(labels1, adds)
      // edge-set invariant WITHOUT shuffling the standing table: a
      // re-added edge must not accrete duplicates across delete/
      // re-add cycles, but a full-width distinct() over standing ∪
      // adds would shuffle the ENTIRE standing edge list per
      // micro-batch — exactly the O(standing) cost the labels math
      // avoids. Instead dedupe the SHARD against standing with the
      // StandingBandIndex asymmetry: in-batch distinct (|batch|-
      // bounded), then a shard-side left_semi probe of standing
      // (bounded by |batch|), then drop already-present rows from
      // the shard — standing edges stream through UNTOUCHED into the
      // union. Both probes ride the relabel broadcast gate so an
      // AvailableNow backfill (shard = whole source) degrades to a
      // shuffle join instead of a driver OOM.
      val edges2 =
        if (!hasAdds) edges1
        else {
          val addsD = adds.distinct()
          val fresh = Gate.antiAgainstStanding(edges1, addsD,
            Seq("src", "dst"))
          edges1.unionByName(fresh)
        }
      Map("edges" -> edges2, "labels" -> labels2)
    }

  private[graft] def committedVersions(s: SparkSession,
      root: String): Seq[Long] =
    VersionedArtifact.committedTableVersions(s, root)

  /** the current (edges, labels) tables. */
  def readLatest(s: SparkSession, root: String): Map[String, DataFrame] =
    VersionedArtifact.readLatestTables(s, root, Schemas)

  /** seed from a batch-built graph: the edge list plus its solved
    * labeling (version -1). */
  def bootstrap(edges: DataFrame, labels: DataFrame,
      root: String): Unit =
    VersionedArtifact.bootstrapTables(Map(
      // distinct at ingress: the absorb maintains the edge-set
      // invariant inductively (its add path dedupes), so the seed
      // must establish it — a duplicated seed row would otherwise
      // survive delete-only batches
      "edges" -> edges.select(col("src").cast("long"),
        col("dst").cast("long")).distinct(),
      "labels" -> labels.select(col("node").cast("long"),
        col("label").cast("long"))), root)

  /** one absorb step — the foreachBatch body, callable directly for
    * deterministic-replay tests. */
  def absorbBatch(events: DataFrame, batchId: Long, root: String): Unit =
    VersionedArtifact.absorbBatchTables(events, batchId, root, Schemas)(
      absorb)

  /** start the loop over a (kind, src, dst) changelog stream. */
  def maintainStream(events: DataFrame, root: String,
      checkpoint: String): StreamingQuery = {
    require(EventSchema.fieldNames.toSet
        .subsetOf(events.schema.fieldNames.toSet),
      s"event stream must have columns (kind, src, dst), got " +
        events.schema.fieldNames.mkString(","))
    VersionedArtifact.maintainTables(events, root, checkpoint, Schemas)(
      absorb)
  }
}
