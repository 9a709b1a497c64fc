package graft

import graft.plans.AsOfJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The native as-of join (custom LogicalPlan + Strategy + SparkPlan)
  * against an independent window-based reference implementation, plus
  * edge cases the merge has to get right and a physical-plan audit.
  */
class AsOfJoinPlanSpec extends SparkSpec {
  import spark.implicits._

  /** reference as-of: union trick — tag both sides, window by key
    * over time, last non-null right payload at or before each left
    * row. Independent of the exec's merge logic. */
  private def referenceAsOf(
      left: DataFrame, right: DataFrame): DataFrame = {
    // left: (k, t, lv)  right: (k, t, rv); right time ties on a left
    // time admit the right row (rt <= lt), so rights sort BEFORE
    // lefts at equal t — side=0 for right, 1 for left.
    val l = left.select(col("k"), col("t"), lit(1).as("side"),
      col("lv"), lit(null).cast("long").as("rv"))
    val r = right.select(col("k"), col("t"), lit(0).as("side"),
      lit(null).cast("long").as("lv"), col("rv"))
    val w = Window.partitionBy("k").orderBy(col("t"), col("side"), col("rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionAll(r)
      .withColumn("last_rv", last(col("rv"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("k"), col("t"), col("lv"), col("last_rv"))
  }

  /** run f with spark.sql.autoBroadcastJoinThreshold set: "-1" forces
    * the co-partitioned merge exec, a large value forces broadcast. */
  private def withThreshold[A](v: String)(f: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, v)
    try f finally spark.conf.set(key, old)
  }

  private def nativeAsOf(left: DataFrame, right: DataFrame): DataFrame =
    AsOfJoin.backward(
      left, right.select(col("k").as("rk"), col("t").as("rt"), col("rv")),
      Seq("k"), Seq("rk"), "t", "rt")
      .select(col("k"), col("t"), col("lv"), col("rv").as("last_rv"))

  /** both physical paths must agree with the reference — the strategy
    * picking differently at scale must never change results. */
  private def onBothPaths(f: => Unit): Unit = {
    withThreshold("-1")(f)      // merge exec
    withThreshold("1073741824")(f) // broadcast exec
  }

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    val n = a.count()
    assert(n == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(n > 0)
  }

  test("matches the window-based reference on a dense mixed corpus (both paths)") {
    // 40 keys x 50 left rows, right rows at every 3rd tick with
    // deliberate duplicates-in-time removed (unique (k,t) on the
    // right so the reference's tiebreak is immaterial).
    val left = spark.range(2000).select(
      (col("id") % 40).as("k"), (col("id") * 7 % 997).as("t"),
      col("id").as("lv"))
    val right = spark.range(700).select(
      (col("id") % 35).as("k"), (col("id") * 13 % 491).as("t"),
      col("id").as("rv"))
      .groupBy("k", "t").agg(max("rv").as("rv"))
    onBothPaths {
      assertSame(nativeAsOf(left, right), referenceAsOf(left, right))
    }
  }

  test("tie on time is admitted; later rights are not (both paths)") {
    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L)).toDF("k", "t", "lv")
    val right = Seq((1L, 10L, 7L), (1L, 15L, 8L), (1L, 21L, 9L))
      .toDF("k", "t", "rv")
    onBothPaths {
      val out = nativeAsOf(left, right)
        .orderBy("t").select("last_rv").as[Long].collect()
      assert(out.toSeq == Seq(7L, 8L))
    }
  }

  test("keys with no right rows null-extend; empty right side works (both paths)") {
    val left = Seq((1L, 10L, 1L), (2L, 10L, 2L)).toDF("k", "t", "lv")
    val right = Seq((1L, 5L, 50L)).toDF("k", "t", "rv")
    onBothPaths {
      val out = nativeAsOf(left, right).orderBy("k")
        .select("last_rv").collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0))
      assert(out.toSeq == Seq(50L, -1L))
      val empty = right.filter(col("t") < 0)
      assert(nativeAsOf(left, empty).filter(col("last_rv").isNotNull).isEmpty)
    }
  }

  test("right rows strictly after every left row never match (both paths)") {
    val left = Seq((1L, 10L, 1L)).toDF("k", "t", "lv")
    val right = Seq((1L, 11L, 50L), (1L, 12L, 51L)).toDF("k", "t", "rv")
    onBothPaths {
      assert(nativeAsOf(left, right).filter(col("last_rv").isNotNull).isEmpty)
    }
  }

  test("null keys and null times never match (both paths)") {
    val left = Seq((Some(1L), Some(10L), 1L), (None, Some(10L), 2L),
      (Some(1L), None, 3L)).toDF("k", "t", "lv")
    val right = Seq((Some(1L), Some(5L), 50L), (None, Some(1L), 60L),
      (Some(1L), None, 70L)).toDF("k", "t", "rv")
    onBothPaths {
      val out = nativeAsOf(left, right).orderBy("lv")
        .select("last_rv").collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0))
      // only the fully non-null left row matches, and only the non-null
      // right row is eligible
      assert(out.toSeq == Seq(50L, -1L, -1L))
    }
  }

  /** treeString of the FINALIZED plan: Spark 4 AQE wraps stages in
    * leaf QueryStageExec nodes that `collect` can't cross, but
    * toString renders through them. */
  private def finalPlan(df: DataFrame): String = {
    df.collect() // materialize so AQE finalizes the adaptive plan
    // AdaptiveSparkPlan renders "== Final Plan ==" then "== Initial
    // Plan ==" — audit only the final section or every count doubles
    df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
  }

  private def countOf(plan: String, re: String): Int =
    re.r.findAllMatchIn(plan).size

  test("float keys normalize: -0.0 matches 0.0 and NaN matches NaN (both paths)") {
    // custom plans sit outside NormalizeFloatingNumbers; the operator
    // must normalize at distribution/projection itself or a 0.0 probe
    // misses a -0.0 state row (built-in joins match them)
    val left = Seq((0.0, 10L, 1L), (-0.0, 20L, 2L), (Double.NaN, 30L, 3L))
      .toDF("k", "t", "lv")
    val right = Seq((-0.0, 5L, 50L), (Double.NaN, 6L, 60L))
      .toDF("rk", "rt", "rv")
    onBothPaths {
      val out = AsOfJoin.backward(left, right, Seq("k"), Seq("rk"), "t", "rt")
        .orderBy("lv").select("rv").collect()
        .map(r => if (r.isNullAt(0)) -1L else r.getLong(0))
      assert(out.toSeq == Seq(50L, 50L, 60L))
    }
  }

  test("merge path: custom exec over co-partitioned sorted children") {
    withThreshold("-1") {
      val left = spark.range(100).select((col("id") % 5).as("k"),
        col("id").as("t"), col("id").as("lv"))
      val right = spark.range(50).select((col("id") % 5).as("rk"),
        (col("id") * 2).as("rt"), col("id").as("rv"))
      val plan = finalPlan(
        AsOfJoin.backward(left, right, Seq("k"), Seq("rk"), "t", "rt"))
      assert(countOf(plan, """AsOfJoin \[""") == 1, plan)
      // EnsureRequirements must have inserted per-side sorts on (key, time)
      assert(countOf(plan, """Sort \[k#\d+L ASC NULLS FIRST, t#\d+L ASC NULLS FIRST\]""") == 1, plan)
      assert(countOf(plan, """Sort \[rk#\d+L ASC NULLS FIRST, rt#\d+L ASC NULLS FIRST\]""") == 1, plan)
      // ... and a hash-clustering exchange per side (EnsureRequirements
      // co-partitions the children exactly as it would for an SMJ)
      assert(countOf(plan, """(?<!Reused)Exchange hashpartitioning""") == 2, plan)
    }
  }

  test("merge path: downstream window reuses ordering/partitioning, no exchange") {
    withThreshold("-1") {
      val left = spark.range(100).select((col("id") % 5).as("k"),
        col("id").as("t"), col("id").as("lv"))
      val right = spark.range(50).select((col("id") % 5).as("rk"),
        (col("id") * 2).as("rt"), col("id").as("rv"))
      val joinedDf = AsOfJoin.backward(left, right, Seq("k"), Seq("rk"), "t", "rt")
      val plan = finalPlan(joinedDf.withColumn("rn",
        row_number().over(Window.partitionBy("k").orderBy("t"))))
      assert(plan.contains("Window"), plan)
      // one exchange per side feeding the join and NOTHING above it: the
      // window on (k, t) reuses the join's output partitioning+ordering,
      // and no extra Sort appears beyond the two join-input sorts
      assert(countOf(plan, """(?<!Reused)Exchange hashpartitioning""") == 2, plan)
      assert(countOf(plan, """\bSort \[""") == 2, plan)
    }
  }

  test("broadcast path: probe side runs with zero exchanges and zero sorts") {
    withThreshold("1073741824") {
      val left = spark.range(100).select((col("id") % 5).as("k"),
        col("id").as("t"), col("id").as("lv"))
      val right = spark.range(50).select((col("id") % 5).as("rk"),
        (col("id") * 2).as("rt"), col("id").as("rv"))
      val plan = finalPlan(
        AsOfJoin.backward(left, right, Seq("k"), Seq("rk"), "t", "rt"))
      assert(countOf(plan, """BroadcastAsOfJoin \[""") == 1, plan)
      // the whole point: the probe side is never re-clustered
      assert(!plan.contains("Exchange"), plan)
      assert(!plan.contains("Sort ["), plan)
    }
  }

  test("tolerance: stale matches null-extend, fresh ones survive (both paths)") {
    val left = Seq((1L, 100L, 1L), (1L, 200L, 2L), (2L, 50L, 3L))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 95L, 50L), (1L, 120L, 51L), (2L, 10L, 60L))
      .toDF("rk", "rt", "rv")
    onBothPaths {
      // tol=30: (1,100)->95 fresh; (1,200)->120 stale (gap 80);
      // (2,50)->10 stale (gap 40)
      val out = AsOfJoin.backward(left, right, Seq("k"), Seq("rk"),
        "t", "rt", tolerance = Some(30L))
        .orderBy("lv").select("rv").collect()
        .map(r => if (r.isNullAt(0)) -1L else r.getLong(0))
      assert(out.toSeq == Seq(50L, -1L, -1L))
      // tol large enough admits everything the plain as-of admits
      val loose = AsOfJoin.backward(left, right, Seq("k"), Seq("rk"),
        "t", "rt", tolerance = Some(1000L))
        .orderBy("lv").select("rv").collect().map(_.getLong(0))
      assert(loose.toSeq == Seq(50L, 51L, 60L))
      // tol=0 admits only exact-tie times
      val exact = AsOfJoin.backward(
        Seq((1L, 95L, 9L)).toDF("k", "t", "lv"), right,
        Seq("k"), Seq("rk"), "t", "rt", tolerance = Some(0L))
        .select("rv").collect()
      assert(exact.map(_.getLong(0)).toSeq == Seq(50L))
    }
  }

  /** forward reference: at equal t the right row is eligible
    * (rt >= lt), so rights sort AFTER lefts at equal t — side=0 for
    * left, 1 for right; first non-null right payload at-or-after. */
  private def referenceAsOfFwd(
      left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.select(col("k"), col("t"), lit(0).as("side"),
      col("lv"), lit(null).cast("long").as("rv"))
    val r = right.select(col("k"), col("t"), lit(1).as("side"),
      lit(null).cast("long").as("lv"), col("rv"))
    val w = Window.partitionBy("k").orderBy(col("t"), col("side"), col("rv"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l.unionAll(r)
      .withColumn("next_rv", first(col("rv"), ignoreNulls = true).over(w))
      .filter(col("side") === 0)
      .select(col("k"), col("t"), col("lv"), col("next_rv"))
  }

  private def nativeAsOfFwd(left: DataFrame, right: DataFrame): DataFrame =
    AsOfJoin.forward(
      left, right.select(col("k").as("rk"), col("t").as("rt"), col("rv")),
      Seq("k"), Seq("rk"), "t", "rt")
      .select(col("k"), col("t"), col("lv"), col("rv").as("next_rv"))

  test("forward: matches the window-based reference on a dense corpus (both paths)") {
    val left = spark.range(2000).select(
      (col("id") % 40).as("k"), (col("id") * 7 % 997).as("t"),
      col("id").as("lv"))
    val right = spark.range(700).select(
      (col("id") % 35).as("k"), (col("id") * 13 % 491).as("t"),
      col("id").as("rv"))
      .groupBy("k", "t").agg(max("rv").as("rv"))
    onBothPaths {
      assertSame(nativeAsOfFwd(left, right), referenceAsOfFwd(left, right))
    }
  }

  test("forward: ties admit, earlier rights never match, tolerance bounds (both paths)") {
    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 5L, 6L), (1L, 10L, 7L), (1L, 26L, 9L))
      .toDF("k", "t", "rv")
    onBothPaths {
      val out = nativeAsOfFwd(left, right).orderBy("lv")
        .select("next_rv").collect()
        .map(r => if (r.isNullAt(0)) -1L else r.getLong(0))
      // (1,10) -> tie at 10; (1,20) -> 26; (2,5) -> no right key 2
      assert(out.toSeq == Seq(7L, 9L, -1L))
      val tol = AsOfJoin.forward(left,
        right.select(col("k").as("rk"), col("t").as("rt"), col("rv")),
        Seq("k"), Seq("rk"), "t", "rt", tolerance = Some(3L))
        .orderBy("lv").select("rv").collect()
        .map(r => if (r.isNullAt(0)) -1L else r.getLong(0))
      // gap 0 <= 3 fresh; gap 6 > 3 too far in the future; no key
      assert(tol.toSeq == Seq(7L, -1L, -1L))
    }
  }

  test("strategy picks by right-side stats: default threshold broadcasts tiny state") {
    // default session threshold is 10MB; a 50-row right side is far
    // under it, so the auto path must choose broadcast — and forcing
    // -1 must flip it back to the merge exec
    val left = spark.range(100).select((col("id") % 5).as("k"),
      col("id").as("t"), col("id").as("lv"))
    val right = spark.range(50).select((col("id") % 5).as("rk"),
      (col("id") * 2).as("rt"), col("id").as("rv"))
    val auto = finalPlan(
      AsOfJoin.backward(left, right, Seq("k"), Seq("rk"), "t", "rt"))
    assert(countOf(auto, """BroadcastAsOfJoin \[""") == 1, auto)
    withThreshold("-1") {
      val merge = finalPlan(
        AsOfJoin.backward(left, right, Seq("k"), Seq("rk"), "t", "rt"))
      assert(countOf(merge, """(?<!Broadcast)AsOfJoin \[""") == 1, merge)
    }
  }

  test("optimizer rule pushes left-side filters under the as-of join, to the scan") {
    // parquet-backed LEFT so the pushed conjunct can reach the scan's
    // PushedFilters; built-in PushDownPredicates can't see through
    // the custom node, so any pushdown observed is OUR rule's work.
    val dir = java.nio.file.Files
      .createTempDirectory("asof-pushdown").toString
    spark.range(1000).select((col("id") % 50).as("k"),
      col("id").as("t"), col("id").as("lv"))
      .write.mode("overwrite").parquet(s"$dir/left")
    val pleft = spark.read.parquet(s"$dir/left")
    val right = spark.range(200).select((col("id") % 50).as("rk"),
      (col("id") * 3).as("rt"), col("id").as("rv"))
    val joined = AsOfJoin
      .backward(pleft, right, Seq("k"), Seq("rk"), "t", "rt")
      .filter(col("lv") < 100 && col("rv") > 3)
    val plan = joined.queryExecution.executedPlan.toString
    // left conjunct reached the parquet scan
    assert(plan.contains("LessThan(lv,100)"),
      s"left-side filter not pushed to the scan:\n$plan")
    // right conjunct must NOT be pushed (it would change which right
    // row is latest) — no scan-level pushdown of rv anywhere
    assert(!plan.contains("GreaterThan(rv,3)"),
      s"right-side filter illegally pushed:\n$plan")
    // semantics unchanged: identical to pre-filtering the left side
    // by hand and filtering the right payload after the join
    val manual = AsOfJoin
      .backward(pleft.filter(col("lv") < 100), right,
        Seq("k"), Seq("rk"), "t", "rt")
      .filter(col("rv") > 3)
    assert(joined.count() == manual.count())
    assert(joined.exceptAll(manual).isEmpty &&
      manual.exceptAll(joined).isEmpty)
    assert(joined.count() > 0)
  }

  test("optimizer rule prunes unread columns of both as-of inputs at the scan") {
    // wide parquet inputs; the query reads 2 of 6 payload columns —
    // without PruneColumnsThroughAsOfJoin both scans read full width
    // (ColumnPruning can't see through the custom node)
    val dir = java.nio.file.Files
      .createTempDirectory("asof-prune").toString
    spark.range(500).select((col("id") % 20).as("k"), col("id").as("t"),
      col("id").as("lv1"), (col("id") * 2).as("lv2"),
      (col("id") * 3).as("lv3"))
      .write.mode("overwrite").parquet(s"$dir/left")
    spark.range(100).select((col("id") % 20).as("rk"),
      (col("id") * 5).as("rt"), col("id").as("rv1"),
      (col("id") * 7).as("rv2"), (col("id") * 11).as("rv3"))
      .write.mode("overwrite").parquet(s"$dir/right")
    val joined = AsOfJoin.backward(
        spark.read.parquet(s"$dir/left"),
        spark.read.parquet(s"$dir/right"),
        Seq("k"), Seq("rk"), "t", "rt")
      .select(col("lv2"), col("rv3"))
    val plan = joined.queryExecution.executedPlan.toString
    val schemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(schemas.length == 2, s"expected two scans:\n$plan")
    schemas.foreach { cols =>
      assert(!cols.contains("lv1") && !cols.contains("lv3:") &&
        !cols.contains("rv1") && !cols.contains("rv2"),
        s"unread column survived pruning: $cols\n$plan")
    }
    // keys/times must still be read
    assert(schemas.exists(c => c.contains("k:") && c.contains("t:")))
    assert(schemas.exists(c => c.contains("rk:") && c.contains("rt:")))
    // and the result is still correct
    val rows = joined.orderBy("lv2").collect()
    assert(rows.length == 500)
  }
}
