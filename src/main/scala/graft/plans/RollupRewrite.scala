package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, AttributeReference, Cast, Coalesce, Divide, Expression,
  Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim

/** Materialized-rollup rewrite — the aggregate-navigation feature a
  * 100 TB deployment actually leans on: once a coarse-grained rollup
  * of a fact table is registered (per-grain `cnt` + `sum/min/max` of
  * each measure), any aggregate the rollup COVERS is answered from
  * the rollup scan instead of the fact scan. Covered means: grouping
  * keys ⊆ grain columns, filters reference grain columns only, and
  * every aggregate is `count(literal)` / `sum` / `min` / `max` /
  * `avg` of a registered measure — exactly the algebra that
  * re-aggregates losslessly (count → sum of cnt; sum → sum of sums;
  * min/max → min/max of per-cell bounds; avg → exact sum-of-sums ÷
  * sum-of-cnt). The rewrite is EXACT by
  * construction, not approximate: the rollup is derived from the
  * base table by the same engine, so a hash-compare against the
  * fact-table form is the correctness gate (q235/q236).
  *
  * At the 100 TB design point this is the difference between a
  * dashboard query scanning the fact table (10¹¹ rows) and scanning
  * the |grain| rollup (10³–10⁶ rows): the rewrite turns O(facts)
  * into O(cells) with bit-identical results. Spark has no built-in
  * aggregate-navigation (OSS Catalyst has no materialized-view
  * rewrite), which is why this is a custom `Rule[LogicalPlan]` — the
  * same §2.10 rung as the as-of pushdown rules.
  *
  * Two application paths, both exercised:
  *  - explicit: [[Rollup.rewrite]] applies the rule to one
  *    DataFrame's analyzed plan — deterministic, scoped, what the
  *    catalog queries use so suite plans never depend on execution
  *    order;
  *  - transparent: `Shim.addOptimizerRule(spark, RollupRewrite)`
  *    injects it into the session optimizer via the public
  *    `ExperimentalMethods` channel (spec-verified on an isolated
  *    `newSession()`), where it rewrites matching aggregates with no
  *    query change at all.
  *
  * Safety: a query the rollup does not cover (distinct aggregates,
  * agg filters, non-grain filter columns, uncovered measures or
  * functions, expression-valued grouping keys) is left untouched —
  * the rule returns the original node, never a partial rewrite. The
  * rewritten Aggregate preserves every output `exprId`, so parent
  * operators (sorts, projections, joins) resolve unchanged.
  */
object RollupRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate =>
      tryRewrite(agg).getOrElse(agg)
  }

  /** Strip the [Project(attrs-only) | Filter]* chain the analyzer or
    * optimizer may have placed between the Aggregate and the scan,
    * collecting filter conjuncts. A Project with computed columns
    * (Alias) aborts — grain/measure identity is by column name, and
    * a rename or derivation breaks the mapping. */
  private def stripToScan(plan: LogicalPlan)
      : Option[(LogicalRelation, Seq[Expression])] = plan match {
    case lr: LogicalRelation => Some((lr, Nil))
    case Filter(cond, child) =>
      stripToScan(child).map { case (lr, fs) => (lr, cond +: fs) }
    case Project(fields, child)
        if fields.forall(_.isInstanceOf[AttributeReference]) =>
      stripToScan(child)
    case _ => None
  }

  /** Navigator selection: candidates arrive coarsest-first (fewest
    * grain columns ⇒ fewest cells when rollups form a hierarchy, the
    * registered shape); the first candidate that COVERS the query
    * wins, so a lang-grain query reads the |langs|-row rollup even
    * when a (lang, source) one also exists, and a query needing a
    * dropped column simply falls through to the finer rollup (or to
    * the fact scan). */
  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    for {
      (baseRel, filters) <- stripToScan(agg.child)
      rewritten <- Rollup.lookup(baseRel).iterator
        .flatMap(rd => rewriteWith(agg, rd, filters))
        .nextOption()
    } yield rewritten
  }

  private def rewriteWith(
      agg: Aggregate,
      rd: Rollup.RollupDef,
      filters: Seq[Expression]): Option[LogicalPlan] = {
    val rollupScan = rd.scan.newInstance()
    def rollupAttr(name: String): Option[AttributeReference] =
      rollupScan.output.find(_.name == name)

    // grouping keys: plain grain attributes only
    val groupNames = agg.groupingExpressions.map {
      case a: AttributeReference if rd.grain.contains(a.name) => a.name
      case _ => return None
    }
    // filters: deterministic, grain columns only (grain columns are
    // present in the rollup schema by construction of register(), so
    // after this check every filter attribute remaps)
    if (!filters.forall(f => f.deterministic && f.references.forall(a =>
      rd.grain.contains(a.name) && rollupAttr(a.name).isDefined)))
      return None

    def remapToRollup(e: Expression): Expression = e.transform {
      case a: AttributeReference => rollupAttr(a.name).get
    }

    val newAggExprs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      // grouping key in the output: alias the rollup attr under the
      // ORIGINAL exprId so parents resolve unchanged
      case a: AttributeReference if rd.grain.contains(a.name) =>
        Alias(rollupAttr(a.name).getOrElse(return None), a.name)(
          exprId = a.exprId)
      case al @ Alias(
          ae @ AggregateExpression(fn, _, false, None, _), name) =>
        val merged: Expression = fn match {
          // count(1)/count(*) over facts = sum of per-cell counts.
          // count(col) (null-skipping) is NOT covered: the rollup
          // stores no per-column null counts.
          case Count(children) if children.forall(c =>
              c.foldable && c.eval() != null) =>
            val sumCnt = ae.copy(aggregateFunction =
              Sum(rollupAttr(rd.cnt).getOrElse(return None)))
            // UNGROUPED count(*) over zero matching rollup cells:
            // global Count returns 0 but a global Sum returns NULL —
            // coalesce restores the contract. (The avg path needs no
            // guard: ungrouped Average over empty input is NULL, and
            // so is the merged NULL÷NULL divide.) Grouped aggregates
            // emit no row for an empty group either way.
            if (agg.groupingExpressions.isEmpty)
              Coalesce(Seq(sumCnt, Literal(0L, LongType)))
            else sumCnt
          case Sum(a: AttributeReference, _)
              if rd.measures.contains(a.name) &&
                fn.dataType == LongType =>
            // integral sums only: long re-sum is exact and keeps its
            // type. A DOUBLE re-sum would regroup the additions
            // (float addition isn't associative) and a DECIMAL
            // re-sum widens precision — both bail to the fact scan.
            // min/max below stay open to any orderable type; exact
            // selection doesn't care how cells were grouped.
            val src = rollupAttr(s"sum_${a.name}").getOrElse(return None)
            if (src.dataType != LongType) return None
            ae.copy(aggregateFunction =
              fn.withNewChildren(Seq(src))
                .asInstanceOf[org.apache.spark.sql.catalyst
                  .expressions.aggregate.AggregateFunction])
          case Min(a: AttributeReference)
              if rd.measures.contains(a.name) =>
            ae.copy(aggregateFunction =
              Min(rollupAttr(s"min_${a.name}").getOrElse(return None)))
          case Max(a: AttributeReference)
              if rd.measures.contains(a.name) =>
            ae.copy(aggregateFunction =
              Max(rollupAttr(s"max_${a.name}").getOrElse(return None)))
          // avg over facts = exact long sum-of-sums ÷ exact count.
          // Covered only for integral measures with a LONG rollup
          // sum: there the merged form is bit-identical below 2^53
          // total (integer partials are exact doubles) and MORE
          // exact above it (built-in Average accumulates the fact
          // rows in a double, the rewrite divides two exact longs
          // once). Decimal averages bail — re-summing widens the
          // intermediate precision.
          case Average(a: AttributeReference, _)
              if rd.measures.contains(a.name) &&
                fn.dataType == DoubleType =>
            val sumSrc = rollupAttr(s"sum_${a.name}").getOrElse(return None)
            if (sumSrc.dataType != LongType) return None
            val sumAgg = ae.copy(aggregateFunction = Sum(sumSrc))
            val cntAgg = ae.copy(
              aggregateFunction =
                Sum(rollupAttr(rd.cnt).getOrElse(return None)),
              resultId = NamedExpression.newExprId)
            Divide(Cast(sumAgg, DoubleType), Cast(cntAgg, DoubleType))
          case _ => return None
        }
        Alias(merged, name)(exprId = al.exprId)
      case _ => return None
    }

    val filtered = filters.map(remapToRollup).reduceOption(And)
      .map(Filter(_, rollupScan)).getOrElse(rollupScan: LogicalPlan)
    Some(Aggregate(
      groupNames.map(n => rollupAttr(n).getOrElse(return None)),
      newAggExprs, filtered))
  }
}

/** Rollup registry + builder. A rollup is registered against the
  * CANONICAL root paths of the base table's file relation (taken
  * from the base scan's own `HadoopFsRelation.location`, so path
  * spelling can't diverge), and looked up the same way — two scans
  * of the same files match regardless of how the path string was
  * written. */
object Rollup {

  /** `scan` is the analyzed relation of the rollup parquet;
    * `newInstance()` is called per rewrite so repeated use in one
    * query tree can't alias attribute ids. */
  case class RollupDef(
      scan: LogicalRelation,
      grain: Set[String],
      cnt: String,
      measures: Set[String])

  /** per base table, the registered rollups sorted coarsest-first
    * (fewest grain columns) — the navigator's preference order. */
  private val registry = mutable.Map[String, List[RollupDef]]()

  private def pathKey(lr: LogicalRelation): Option[String] =
    lr.relation match {
      case fs: HadoopFsRelation =>
        Some(fs.location.rootPaths.map(_.toString).sorted.mkString(","))
      case _ => None
    }

  def lookup(lr: LogicalRelation): List[RollupDef] =
    registry.synchronized {
      pathKey(lr).flatMap(registry.get).getOrElse(Nil)
    }

  private def scanOf(df: DataFrame): LogicalRelation =
    Shim.analyzed(df).collectFirst { case lr: LogicalRelation => lr }
      .getOrElse(throw new IllegalArgumentException(
        "rollup base/rollup must be a file-relation scan"))

  /** Build the rollup parquet for `base` at `grain` × `measures`
    * (cnt + sum/min/max per measure), write it under `rollupDir`,
    * and register it. Idempotent per path key: repeated calls (the
    * memoized catalog path, bench re-runs) skip the rebuild. The
    * build itself is one map-side-combinable hash-agg over the base
    * — the same one-off cost any materialized view has — and its
    * output is |grain-cells| rows, the whole point of the exchange.
    */
  def register(
      spark: SparkSession,
      base: DataFrame,
      grain: Seq[String],
      measures: Seq[String],
      rollupDir: String): Unit = registry.synchronized {
    val key = pathKey(scanOf(base)).getOrElse(
      throw new IllegalArgumentException("base has no file location"))
    val existing = registry.getOrElse(key, Nil)
    if (existing.exists(_.grain == grain.toSet)) return
    val aggs = count(lit(1)).as("cnt") +: measures.flatMap(m => Seq(
      sum(col(m)).as(s"sum_$m"),
      min(col(m)).as(s"min_$m"),
      max(col(m)).as(s"max_$m")))
    base.groupBy(grain.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(rollupDir)
    val rd = RollupDef(
      scanOf(spark.read.parquet(rollupDir)),
      grain.toSet, "cnt", measures.toSet)
    registry(key) = (rd :: existing).sortBy(_.grain.size)
  }

  /** Explicit, scoped application: rewrite this one DataFrame's plan
    * (used by the catalog queries so the rest of the suite's plans
    * are independent of whether/when a rollup was registered). */
  def rewrite(df: DataFrame): DataFrame = {
    val spark = SparkSession.active
    Shim.ofRows(spark, RollupRewrite(Shim.analyzed(df)))
  }
}
