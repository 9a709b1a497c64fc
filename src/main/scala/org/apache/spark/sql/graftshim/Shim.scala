package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.SparkStrategy

/** The one tiny `org.apache.spark.sql.*` bridge the custom-plan path
  * needs. Spark deliberately leaves "DataFrame from a custom
  * LogicalPlan" behind `private[sql]` (`Dataset.ofRows`), and every
  * production Spark extension (Delta, Iceberg, Sedona) bridges it the
  * same way: a minimal object compiled into an `org.apache.spark.sql`
  * subpackage. Nothing else in graft lives outside the `graft`
  * namespace, and nothing here contains logic — three one-line
  * forwarders, so the entire private-API surface the project depends
  * on is auditable in one file.
  */
object Shim {

  /** the analyzed logical plan of a DataFrame (resolved attributes —
    * safe to reference from a parent custom node). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** wrap a (resolved) logical plan back into a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** float/double normalization expression (-0.0 → 0.0, canonical
    * NaN) — the same rewrite the optimizer's NormalizeFloatingNumbers
    * rule applies to built-in join keys; `private[sql]` upstream. */
  def normalizeFloat(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
    : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers
      .normalize(e)

  /** idempotently add a planner strategy to the session (public
    * `ExperimentalMethods` — the documented injection point that,
    * unlike `SparkSessionExtensions`, also works on an already-built
    * session). */
  def addStrategy(spark: SparkSession, strategy: SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    cs.experimental.synchronized {
      if (!cs.experimental.extraStrategies.contains(strategy))
        cs.experimental.extraStrategies =
          cs.experimental.extraStrategies :+ strategy
    }
  }

  /** idempotently add an optimizer rule to the session — same public
    * `ExperimentalMethods` channel as [[addStrategy]]; the rules run
    * in the optimizer's user-provided batch, BEFORE physical
    * planning, so a Filter a rule places over a file relation still
    * reaches the scan's PushedFilters. */
  def addOptimizerRule(
      spark: SparkSession,
      rule: org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    cs.experimental.synchronized {
      if (!cs.experimental.extraOptimizations.contains(rule))
        cs.experimental.extraOptimizations =
          cs.experimental.extraOptimizations :+ rule
    }
  }
}
