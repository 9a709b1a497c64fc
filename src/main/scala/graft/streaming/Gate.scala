package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col}

import graft.queries.PipelineOps

/** Size-gated shard-vs-standing dedup — the asymmetric probe shared
  * by the [[StandingGraph]] edge path and [[StandingBandIndex]]'s
  * first-write-wins gate: the standing table is SCANNED (streamed
  * through a join probe), never shuffled or broadcast; only the
  * shard side — |micro-batch|-bounded in normal operation — crosses
  * the wire. A `Trigger.AvailableNow` backfill makes "the shard" the
  * whole source, so both probes ride
  * [[PipelineOps.relabelBroadcastMaxRows]]: past the ceiling they
  * degrade to shuffle-hash joins with the shard as build side (one
  * data-proportional shuffle of standing — the honest price of a
  * corpus-sized batch) instead of a driver OOM.
  */
private[streaming] object Gate {

  /** shard rows whose `keys` are NOT already present in `standing`.
    * Two probes, both shard-bounded: `dup` = standing ⋉ shard (at
    * most |shard| rows — the standing copies of re-delivered keys),
    * then shard ▷ dup drops them. The gating count is one job over
    * the micro-batch (shard-sized, cheap); one decision drives both
    * probes since |dup| ≤ |shard|. */
  def antiAgainstStanding(standing: DataFrame, shard: DataFrame,
      keys: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    val small = shard.count() <= PipelineOps.relabelBroadcastMaxRows
    def side(df: DataFrame): DataFrame =
      if (small) broadcast(df) else df.hint("shuffle_hash")
    val dup = standing.select(keyCols: _*)
      .join(side(shard.select(keyCols: _*)), keys, "left_semi")
    shard.join(side(dup), keys, "left_anti")
  }
}
