package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, BoundReference, Expression,
  GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftshim.Shim

/** Native as-of join (backward + forward) — the whole-operator
  * escalation tier of SURVEY.md §2.10: a custom `LogicalPlan` +
  * `SparkStrategy` + physical `SparkPlan`, for semantics the built-in
  * operators can only express with a union + window trick (q22) that
  * materializes BOTH tables through one window and carries every
  * probe column through the event stream.
  *
  * Semantics (left-outer, "backward"): for every left row, the LAST
  * right row with the same key and `rightTime <= leftTime` in
  * (key, time) sort order; left rows with no such match get nulls.
  * The "forward" direction flips it: the FIRST right row with
  * `rightTime >= leftTime` (pandas merge_asof direction='forward').
  * This is the reference's enrich-quote-with-latest-trade shape
  * (binance-data-ingestor joins each event against the latest known
  * state for the symbol) and DuckDB's `ASOF JOIN`.
  *
  * Physical shape — exactly a sort-merge join with a different merge:
  * both sides hash-cluster on the key (`ClusteredDistribution`, so
  * EnsureRequirements co-partitions them and AQE can still coalesce)
  * and sort within partitions by (key, time); the merge walks the two
  * sorted iterators ONCE — O(|L|+|R|) per partition, one row of
  * as-of state, no window buffering, no union. At 100 TB this is the
  * same cost envelope as the best built-in join Spark has for the
  * job, while the union+window form shuffles the CONCATENATION of
  * both tables and windows over it.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Long] = None,
    forward: Boolean = false)
  extends BinaryNode {

  require(leftKeys.size == rightKeys.size && leftKeys.nonEmpty,
    "as-of join needs matching, non-empty key lists")
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "as-of join key types must match pairwise")
  require(leftTime.dataType == rightTime.dataType,
    "as-of join time columns must share a type")
  require(tolerance.isEmpty ||
    leftTime.dataType == org.apache.spark.sql.types.LongType,
    "as-of tolerance requires LONG time columns (epoch units)")
  require(tolerance.forall(_ >= 0), "as-of tolerance must be >= 0")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] physically, choosing between the two execs
  * the same way Spark chooses hash-join sides: if the RIGHT side's
  * estimated size fits under `spark.sql.autoBroadcastJoinThreshold`,
  * use [[BroadcastAsOfJoinExec]] — the probe side then needs NO
  * shuffle and NO sort, which at 100 TB is the difference between
  * streaming the fact table through a projection and re-clustering
  * all of it. Otherwise fall back to the co-partitioned merge
  * [[AsOfJoinExec]]. Everything else falls through to the built-in
  * strategies. */
/** Optimizer `Rule[LogicalPlan]` — the rule rung of the §2.10 custom
  * ladder, solving the real problem custom nodes create: Catalyst's
  * PushDownPredicates does not know [[AsOfJoinPlan]], so a filter
  * written ABOVE an as-of join sits there and the full fact table is
  * scanned, joined, and only then filtered. Left-side conjuncts are
  * safe to push — as-of output is per-left-row independent (each left
  * row's match depends only on the right TABLE, never on other left
  * rows) — so deterministic predicates referencing only left-side
  * columns move below the join, where the physical planner folds them
  * into the parquet scan's PushedFilters. Right-side predicates are
  * NOT pushed: filtering candidate state rows before the join would
  * change which row is "the latest" (semantics, not just cost).
  */
object PushFilterThroughAsOfJoin
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
  with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet}
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsOfJoinPlan) =>
      val leftOut = AttributeSet(aj.left.output)
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(c => c.deterministic && c.references.subsetOf(leftOut))
      if (push.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(push.reduce(And), aj.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Column pruning through the custom node — the other optimizer rule
  * Catalyst can't apply for us (ColumnPruning, like
  * PushDownPredicates, stops at unknown operators): without it an
  * as-of join materializes and shuffles EVERY column of both inputs
  * even when the query reads two of them — at 100 TB the difference
  * between shuffling the join keys + one payload column and shuffling
  * the whole fact row. A Project above the node narrows each child to
  * the columns the projection references plus the node's own
  * keys/times; the guard (only rewrite when a side actually narrows)
  * keeps the fixed-point batch stable.
  */
object PruneColumnsThroughAsOfJoin
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(fields, aj: AsOfJoinPlan) =>
      val needed = AttributeSet(fields.flatMap(_.references)) ++
        AttributeSet(aj.leftKeys.flatMap(_.references)) ++
        AttributeSet(aj.rightKeys.flatMap(_.references)) ++
        aj.leftTime.references ++ aj.rightTime.references
      val lKeep = aj.left.output.filter(needed.contains)
      val rKeep = aj.right.output.filter(needed.contains)
      if (lKeep.length == aj.left.output.length &&
        rKeep.length == aj.right.output.length) p
      else p.copy(child = aj.copy(
        left = if (lKeep.length == aj.left.output.length) aj.left
          else Project(lKeep, aj.left),
        right = if (rKeep.length == aj.right.output.length) aj.right
          else Project(rKeep, aj.right)))
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tol, fwd) =>
      val threshold =
        org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      if (threshold > 0 && r.stats.sizeInBytes >= 0 &&
        r.stats.sizeInBytes <= threshold)
        BroadcastAsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r),
          tol, fwd) :: Nil
      else
        AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r), tol,
          fwd) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan,
    tolerance: Option[Long] = None,
    forward: Boolean = false)
  extends SparkPlan with BinaryExecNode {
  import AsOfJoin.norm

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** both children cluster on the join key: EnsureRequirements makes
    * the two shuffles co-partitioned (same mechanism SMJ uses), and
    * an already-suitably-partitioned child skips its exchange.
    * Float/double keys are NORMALIZED (-0.0→0.0, canonical NaN)
    * before hashing/sorting/comparison — a custom plan never gets the
    * optimizer's NormalizeFloatingNumbers rewrite that built-in joins
    * rely on, so without this a 0.0 probe would miss a -0.0 state row
    * (they'd even hash to different partitions). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys.map(norm)) ::
      ClusteredDistribution(rightKeys.map(norm)) :: Nil

  /** within each partition both sides arrive sorted by (key, time) —
    * the merge below relies on it. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys.map(norm) :+ norm(leftTime)).map(SortOrder(_, Ascending)),
    (rightKeys.map(norm) :+ norm(rightTime)).map(SortOrder(_, Ascending)))

  /** left rows pass through in their sorted order, so both the
    * partitioning and the ordering survive — a downstream groupBy on
    * the key or window over (key, time) plans with NO extra
    * exchange/sort. */
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys.map(norm) :+ norm(leftTime)).map(SortOrder(_, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val nRight = rOut.size
    val lKeyExprs = leftKeys.map(norm)
    val rKeyExprs = rightKeys.map(norm)
    val lTimeExpr = norm(leftTime)
    val rTimeExpr = norm(rightTime)
    val outExprs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val keyOrd = GenerateOrdering.generate(keyTypes.zipWithIndex.map {
        case (dt, i) => SortOrder(BoundReference(i, dt, nullable = true), Ascending)
      })
      val timeOrd = GenerateOrdering.generate(
        Seq(SortOrder(BoundReference(0, timeType, nullable = true), Ascending)))
      // bind against NULLABLE right attrs: the null-extended row must
      // project as nulls, not as zero-valued primitives
      val outProj = UnsafeProjection.create(outExprs,
        lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(nRight)

      // one row of merge state: the current right cursor plus the
      // last right row admitted for ITS key (guarded by key equality
      // before use, so a stale match from a previous key group can
      // never leak).
      var rCur: InternalRow = null
      var rCurKey: UnsafeRow = null // aliases rKeyProj's buffer — valid until the next advance
      var matched: InternalRow = null
      var matchedKey: UnsafeRow = null
      var matchedTime: Long = 0L // valid only when tolerance is set (LONG times)
      def advanceRight(): Unit =
        if (rIter.hasNext) { rCur = rIter.next(); rCurKey = rKeyProj(rCur) }
        else { rCur = null; rCurKey = null }
      advanceRight()

      if (forward) {
        // FORWARD merge: for each left row, the FIRST right row with
        // the same key and rightTime >= leftTime. Discarding a right
        // row with rTime < lTime is safe — later left rows only have
        // larger (key, time), so a discarded row can never become
        // eligible again; the current right cursor IS the candidate
        // and the merge needs NO match memory at all.
        lIter.map { l =>
          val lKey = lKeyProj(l)
          val lTime = lTimeProj(l)
          val lTimeNull = lTime.isNullAt(0)
          var scanning = rCur != null && !lKey.anyNull && !lTimeNull
          while (scanning) {
            val c = keyOrd.compare(rCurKey, lKey)
            if (c < 0) advanceRight() // right is on an earlier key group
            else if (c > 0) scanning = false // right has overtaken: stop
            else {
              val rTime = rTimeProj(rCur)
              // null times sort first and never match forward either
              if (rTime.isNullAt(0) || timeOrd.compare(rTime, lTime) < 0)
                advanceRight()
              else scanning = false // first rTime >= lTime for this key
            }
            if (rCur == null) scanning = false
          }
          val hit = rCur != null && !lKey.anyNull && !lTimeNull &&
            keyOrd.compare(rCurKey, lKey) == 0 && {
              val rTime = rTimeProj(rCur)
              !rTime.isNullAt(0) && timeOrd.compare(rTime, lTime) >= 0 &&
                tolerance.forall(rTime.getLong(0) - lTime.getLong(0) <= _)
            }
          outProj(joined(l, if (hit) rCur else nullRight))
        }
      } else lIter.map { l =>
        val lKey = lKeyProj(l)
        // no copy: rTimeProj has its own buffer, nothing overwrites
        // lTimeProj's result during the scan below
        val lTime = lTimeProj(l)
        val lTimeNull = lTime.isNullAt(0)
        var scanning = rCur != null && !lKey.anyNull
        while (scanning) {
          val c = keyOrd.compare(rCurKey, lKey)
          if (c < 0) advanceRight() // right is on an earlier key group
          else if (c > 0) scanning = false // right has overtaken: stop
          else {
            // same key: admit while rightTime <= leftTime (non-null)
            val rTime = rTimeProj(rCur)
            if (!lTimeNull && !rTime.isNullAt(0) &&
              timeOrd.compare(rTime, lTime) <= 0) {
              matched = rCur.copy()
              matchedKey = rCurKey.copy()
              matchedTime = if (tolerance.isDefined) rTime.getLong(0) else 0L
              advanceRight()
            } else if (rTime.isNullAt(0)) {
              advanceRight() // null times sort first and never match
            } else scanning = false
          }
          if (rCur == null) scanning = false
        }
        // tolerance (LONG times only, enforced by the plan node):
        // the latest admitted match may still be too stale for THIS
        // probe row — null-extend instead, same as merge_asof
        val hit = matched != null && !lKey.anyNull && !lTimeNull &&
          keyOrd.compare(matchedKey, lKey) == 0 &&
          tolerance.forall(lTime.getLong(0) - matchedTime <= _)
        outProj(joined(l, if (hit) matched else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Broadcast backward as-of join: collect the right side, group it
  * by key with each group sorted by time, broadcast the index, and
  * probe it per left row with a binary search. The left side keeps
  * its partitioning AND its row order untouched — zero exchanges,
  * zero sorts — so an as-of enrich against a bounded state table
  * (the reference's "latest known ticker per symbol" shape) composes
  * into a 100 TB scan pipeline without re-clustering the scan.
  * Build cost is O(|R| log |R|) on the driver, probe is
  * O(log group) per row.
  */
case class BroadcastAsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan,
    tolerance: Option[Long] = None,
    forward: Boolean = false)
  extends SparkPlan with BinaryExecNode {
  import AsOfJoin.norm

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // no requirements on either child: the whole point is that the
  // probe side stays exactly as the scan produced it
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  /** driver-side build: key -> rows sorted by time, broadcast once
    * per plan instance however many times execute() runs (the same
    * memoization contract as BroadcastExchangeExec's relationFuture). */
  @transient private lazy val indexBroadcast = {
    val rOut = right.output
    val timeType = leftTime.dataType
    val rKeyProj = UnsafeProjection.create(rightKeys.map(norm), rOut)
    val rTimeProj = UnsafeProjection.create(Seq(norm(rightTime)), rOut)
    val rRowProj = UnsafeProjection.create(rOut.map(a => a: Expression), rOut)
    val timeOrdDriver = GenerateOrdering.generate(
      Seq(SortOrder(BoundReference(0, timeType, nullable = true), Ascending)))
    val grouped = new java.util.HashMap[UnsafeRow, ArrayBuffer[(UnsafeRow, UnsafeRow)]]
    right.executeCollect().foreach { row =>
      val key = rKeyProj(row)
      val time = rTimeProj(row)
      // null keys / null times can never be the "latest at-or-before"
      // match for any probe row — drop them at build
      if (!key.anyNull && !time.isNullAt(0)) {
        var buf = grouped.get(key)
        if (buf == null) {
          buf = ArrayBuffer.empty[(UnsafeRow, UnsafeRow)]
          grouped.put(key.copy(), buf)
        }
        buf += ((time.copy(), rRowProj(row).copy()))
      }
    }
    val index = new java.util.HashMap[UnsafeRow, Array[(UnsafeRow, UnsafeRow)]](
      grouped.size())
    grouped.forEach { (k, buf) =>
      index.put(k, buf.sortWith((a, b) => timeOrdDriver.compare(a._1, b._1) < 0).toArray)
    }
    sparkContext.broadcast(index)
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val timeType = leftTime.dataType
    val nRight = rOut.size
    val lKeyExprs = leftKeys.map(norm)
    val lTimeExpr = norm(leftTime)
    val outExprs = output
    val bcast = indexBroadcast

    // ---- executor-side probe --------------------------------------
    left.execute().mapPartitions({ lIter =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val timeOrd = GenerateOrdering.generate(
        Seq(SortOrder(BoundReference(0, timeType, nullable = true), Ascending)))
      val outProj = UnsafeProjection.create(outExprs,
        lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(nRight)
      val idx = bcast.value

      lIter.map { l =>
        val lKey = lKeyProj(l)
        val lTime = lTimeProj(l)
        var matched: InternalRow = null
        if (!lKey.anyNull && !lTime.isNullAt(0)) {
          val group = idx.get(lKey)
          if (group != null) {
            var lo = 0
            var hi = group.length - 1
            var hit = -1
            if (forward) {
              // first entry with time >= lTime
              while (lo <= hi) {
                val mid = (lo + hi) >>> 1
                if (timeOrd.compare(group(mid)._1, lTime) >= 0) {
                  hit = mid; hi = mid - 1
                } else lo = mid + 1
              }
              // tolerance: reject a match too far in the future
              if (hit >= 0 && tolerance.forall(t =>
                  group(hit)._1.getLong(0) - lTime.getLong(0) <= t))
                matched = group(hit)._2
            } else {
              // last entry with time <= lTime
              while (lo <= hi) {
                val mid = (lo + hi) >>> 1
                if (timeOrd.compare(group(mid)._1, lTime) <= 0) {
                  hit = mid; lo = mid + 1
                } else hi = mid - 1
              }
              // tolerance (LONG times only): reject a stale latest match
              if (hit >= 0 && tolerance.forall(t =>
                  lTime.getLong(0) - group(hit)._1.getLong(0) <= t))
                matched = group(hit)._2
            }
          }
        }
        outProj(joined(l, if (matched != null) matched else nullRight))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public entry point. Key/time columns are referenced by NAME on
  * each side (Spark 4 `Column` no longer exposes its expression —
  * names resolve against each child's analyzed output instead). */
object AsOfJoin {

  /** float/double join-key/time normalization (-0.0 → 0.0, canonical
    * NaN): custom plans sit outside the optimizer's
    * NormalizeFloatingNumbers rewrite, so both execs apply it at
    * every key/time projection AND in the merge exec's required
    * distribution/ordering (a -0.0 and 0.0 key must land in the SAME
    * partition). Identity for every other type. */
  private[plans] def norm(e: Expression): Expression = e.dataType match {
    case org.apache.spark.sql.types.FloatType |
         org.apache.spark.sql.types.DoubleType => Shim.normalizeFloat(e)
    case _ => e
  }

  /** `left ASOF LEFT JOIN right ON keys AND right.time <= left.time`,
    * taking the latest eligible right row per left row. Output =
    * left columns ++ right columns (right side nullable); disambiguate
    * clashing names by renaming before the call.
    *
    * Tie contract: among several right rows sharing the SAME
    * (key, time), which payload survives is unspecified — and may
    * differ between the merge and broadcast paths (same contract as
    * DuckDB ASOF JOIN and pandas merge_asof). Pre-aggregate the right
    * side to unique (key, time) when the payload must be
    * deterministic, as q101 does. */
  /** Optional `tolerance` (same units as the LONG time columns):
    * a match additionally requires `leftTime - rightTime <=
    * tolerance` — pandas `merge_asof(tolerance=...)`. Stale state
    * null-extends instead of matching. */
  def backward(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      tolerance: Option[Long] = None): DataFrame =
    build(left, right, leftKeys, rightKeys, leftTime, rightTime,
      tolerance, forward = false)

  /** `left ASOF LEFT JOIN right ON keys AND right.time >= left.time`,
    * taking the EARLIEST eligible right row per left row — the
    * time-to-next-event direction (pandas merge_asof
    * `direction='forward'`). `tolerance` bounds how far in the
    * future a match may be. Same tie and output contract as
    * [[backward]]. */
  def forward(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      tolerance: Option[Long] = None): DataFrame =
    build(left, right, leftKeys, rightKeys, leftTime, rightTime,
      tolerance, forward = true)

  private def build(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      tolerance: Option[Long],
      forward: Boolean): DataFrame = {
    val spark: SparkSession = left.sparkSession
    Shim.addStrategy(spark, AsOfJoinStrategy)
    Shim.addOptimizerRule(spark, PushFilterThroughAsOfJoin)
    Shim.addOptimizerRule(spark, PruneColumnsThroughAsOfJoin)
    val lp = Shim.analyzed(left)
    val rp = Shim.analyzed(right)
    def resolve(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"as-of join: no column '$name' in [${plan.output.map(_.name).mkString(", ")}]"))
    Shim.ofRows(spark, AsOfJoinPlan(lp, rp,
      leftKeys.map(resolve(lp, _)), rightKeys.map(resolve(rp, _)),
      resolve(lp, leftTime), resolve(rp, rightTime), tolerance, forward))
  }
}
