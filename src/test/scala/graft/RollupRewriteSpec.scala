package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim

import graft.plans.{Rollup, RollupRewrite}
import graft.queries.Q

/** The materialized-rollup rewrite, pinned from both ends: the plan
  * MUST scan the rollup (a hash-matching result alone can't prove
  * the rule fired — the un-rewritten query is equally correct), and
  * the guards MUST leave uncovered queries on the fact scan (a
  * rewrite there would be silently wrong, e.g. count(col) with
  * nulls, avg, distinct). */
class RollupRewriteSpec extends SparkSpec {

  private val dir = sf()
  private def base = Q.t(spark, dir, "documents")
  private val rollupDir =
    java.nio.file.Files.createTempDirectory("graft-rollup-spec").toString

  private def ensure(): Unit =
    Rollup.register(spark, base, Seq("lang", "source"), Seq("n_chars"),
      rollupDir)

  private def physPlan(df: org.apache.spark.sql.DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain(true) }
    out.toString
  }

  test("covered aggregate is answered from the rollup scan, exactly") {
    ensure()
    val q = base.groupBy(col("lang")).agg(
      count(lit(1)).as("docs"),
      sum(col("n_chars")).as("chars_sum"),
      min(col("n_chars")).as("chars_min"),
      max(col("n_chars")).as("chars_max"))
    val rewritten = Rollup.rewrite(q).orderBy("lang")
    val plan = physPlan(rewritten)
    assert(plan.contains("graft-rollup-spec") ||
      plan.contains("graft_rollup"),
      s"rewritten plan does not scan the rollup:\n$plan")
    assert(!plan.contains("documents.parquet"),
      s"rewritten plan still scans the fact table:\n$plan")
    val expect = q.orderBy("lang").collect().toSeq
    assert(rewritten.collect().toSeq === expect)
  }

  test("grain filter is remapped and pushed into the rollup scan") {
    ensure()
    val q = base.filter(col("lang") =!= "en").groupBy(col("source"))
      .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("s"))
    val rewritten = Rollup.rewrite(q).orderBy("source")
    val plan = physPlan(rewritten)
    assert(!plan.contains("documents.parquet"), s"not rewritten:\n$plan")
    // the remapped predicate reaches the rollup scan's pushed filters
    assert(plan.contains("PushedFilters: [IsNotNull(lang), Not(EqualTo(lang,en))]")
      || plan.contains("Not(EqualTo(lang,en))"),
      s"grain filter not pushed into the rollup scan:\n$plan")
    assert(rewritten.collect().toSeq === q.orderBy("source").collect().toSeq)
  }

  test("uncovered shapes stay on the fact scan (guards)") {
    ensure()
    val uncovered = Seq(
      // count(col) skips nulls; the rollup has no per-column null cnt
      base.groupBy(col("lang")).agg(count(col("text")).as("c")),
      // avg of an UNCOVERED measure (covered-measure avg rewrites)
      base.groupBy(col("lang")).agg(avg(col("doc_id")).as("a")),
      // distinct aggregate
      base.groupBy(col("lang")).agg(countDistinct(col("source")).as("d")),
      // filter on a NON-grain column
      base.filter(col("n_chars") > 100).groupBy(col("lang"))
        .agg(count(lit(1)).as("c")),
      // uncovered measure
      base.groupBy(col("lang")).agg(sum(col("doc_id")).as("s")),
      // expression-valued grouping key
      base.groupBy(upper(col("lang")).as("l")).agg(count(lit(1)).as("c")))
    uncovered.foreach { q =>
      val plan = physPlan(Rollup.rewrite(q))
      assert(plan.contains("documents.parquet"),
        s"guard failed — uncovered query was rewritten:\n$plan")
    }
  }

  test("global (ungrouped) aggregate navigates too") {
    ensure()
    val q = base.agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s"),
      min(col("n_chars")).as("lo"))
    val rewritten = Rollup.rewrite(q)
    val plan = physPlan(rewritten)
    assert(!plan.contains("documents.parquet"),
      s"global aggregate did not navigate:\n$plan")
    assert(rewritten.collect().toSeq === q.collect().toSeq)
  }

  test("ungrouped count over an empty filter result is 0, not NULL") {
    ensure()
    // the advisor's round-9 finding: count(*) rewrites to sum(cnt),
    // and a GLOBAL Sum over zero rollup cells is NULL while the
    // un-rewritten global Count is 0 — the coalesce guard must make
    // the navigated answer identical. 'zz' matches no document lang.
    val q = base.filter(col("lang") === "zz")
      .agg(count(lit(1)).as("n"))
    val rewritten = Rollup.rewrite(q)
    val plan = physPlan(rewritten)
    assert(!plan.contains("documents.parquet"),
      s"empty-filter global count did not navigate:\n$plan")
    assert(rewritten.collect().toSeq === q.collect().toSeq)
    assert(rewritten.head().getLong(0) === 0L)
    // avg needs no guard — NULL on both paths over empty input
    val qa = base.filter(col("lang") === "zz")
      .agg(avg(col("n_chars")).as("m"))
    val ra = Rollup.rewrite(qa)
    assert(!physPlan(ra).contains("documents.parquet"))
    assert(ra.collect().toSeq === qa.collect().toSeq)
    assert(ra.head().isNullAt(0))
  }

  test("avg of a covered measure merges as exact sums and matches") {
    ensure()
    val q = base.groupBy(col("lang")).agg(
      avg(col("n_chars")).as("mean_chars"),
      count(lit(1)).as("docs"))
    val rewritten = Rollup.rewrite(q).orderBy("lang")
    val plan = physPlan(rewritten)
    assert(!plan.contains("documents.parquet"),
      s"covered avg was not rewritten:\n$plan")
    // bit-identical here: total chars < 2^53, so Average's double
    // accumulation over facts is exact and equals sum-of-sums ÷ cnt
    assert(rewritten.collect().toSeq === q.orderBy("lang").collect().toSeq)
  }

  test("streaming maintenance converges to the batch rollup cells") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = base.select("lang", "source", "n_chars")
      .as[(String, String, Long)].collect().toSeq
    val want = base.groupBy(col("lang"), col("source")).agg(
      count(lit(1)).as("cnt"),
      sum(col("n_chars")).as("sum_n_chars"),
      min(col("n_chars")).as("min_n_chars"),
      max(col("n_chars")).as("max_n_chars"))
      .orderBy("lang", "source").collect().toSeq
    // chopping invariance: one batch vs five — the merge algebra
    // can't depend on how the stream was chopped
    Seq(1, 5).foreach { chops =>
      val in = MemoryStream[(String, String, Long)]
      val q = graft.streaming.Streams.rollupMaintenanceStream(
          in.toDF().toDF("lang", "source", "n_chars"),
          Seq("lang", "source"), "n_chars")
        .writeStream.format("memory").queryName(s"roll_mem_$chops")
        .outputMode("complete").start()
      rows.grouped(math.max(1, rows.size / chops)).foreach { b =>
        in.addData(b); q.processAllAvailable()
      }
      q.stop()
      val got = spark.table(s"roll_mem_$chops")
        .orderBy("lang", "source").collect().toSeq
      assert(got === want, s"streaming rollup != batch at chops=$chops")
    }
  }

  // declared AFTER every test that pins which rollup a lang-grain
  // plan scans: registering the coarse rollup changes that choice
  test("navigator prefers the coarsest covering rollup") {
    ensure()
    val coarseDir = java.nio.file.Files
      .createTempDirectory("graftcoarse").toString
    Rollup.register(spark, base, Seq("lang"), Seq("n_chars"), coarseDir)
    // lang grain: covered by BOTH rollups → must pick the |langs|-row
    // coarse one
    val langQ = Rollup.rewrite(base.groupBy(col("lang"))
      .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("s")))
    val langPlan = physPlan(langQ)
    assert(langPlan.contains("graftcoarse"),
      s"lang grain did not pick the coarse rollup:\n$langPlan")
    // source grain: the coarse rollup dropped `source` → must fall
    // through to the (lang, source) rollup, never the fact scan
    val srcQ = Rollup.rewrite(base.groupBy(col("source"))
      .agg(count(lit(1)).as("docs")))
    val srcPlan = physPlan(srcQ)
    assert(!srcPlan.contains("graftcoarse") &&
      !srcPlan.contains("documents.parquet"),
      s"source grain did not fall through to the fine rollup:\n$srcPlan")
    // both remain exact
    assert(langQ.orderBy("lang").collect().toSeq ===
      base.groupBy(col("lang")).agg(count(lit(1)).as("docs"),
        sum(col("n_chars")).as("s")).orderBy("lang").collect().toSeq)
    assert(srcQ.orderBy("source").collect().toSeq ===
      base.groupBy(col("source")).agg(count(lit(1)).as("docs"))
        .orderBy("source").collect().toSeq)
  }

  test("double measures: min/max rewrite (exact selection), sum bails") {
    val li = Q.t(spark, dir, "lineitem")
    Rollup.register(spark, li, Seq("l_returnflag", "l_linestatus"),
      Seq("l_quantity"),
      java.nio.file.Files.createTempDirectory("graftliroll").toString)
    // exact selection over double cells: safe to navigate
    val mm = li.groupBy(col("l_returnflag")).agg(
      min(col("l_quantity")).as("qmin"),
      max(col("l_quantity")).as("qmax"),
      count(lit(1)).as("n"))
    val mmPlan = physPlan(Rollup.rewrite(mm))
    assert(mmPlan.contains("graftliroll") &&
      !mmPlan.contains("lineitem.parquet"),
      s"double min/max did not navigate:\n$mmPlan")
    assert(Rollup.rewrite(mm).orderBy("l_returnflag").collect().toSeq ===
      mm.orderBy("l_returnflag").collect().toSeq)
    // double re-sum would regroup non-associative float additions:
    // must stay on the fact scan
    val s = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("q"))
    val sPlan = physPlan(Rollup.rewrite(s))
    assert(sPlan.contains("lineitem.parquet"),
      s"double sum was navigated — unsound:\n$sPlan")
  }

  test("catalog q240 really navigates the events rollup") {
    val plan = physPlan(
      SparkEntry.queries("q240_rollup_events")(spark, dir))
    assert(!plan.contains("events.parquet") &&
      plan.contains("graft_rollup"),
      s"q240 did not navigate to the events rollup:\n$plan")
  }

  test("transparent path: extraOptimizations rewrites with no query change") {
    ensure()
    // isolated session: same SparkContext, fresh SessionState —
    // registering the rule here can't leak into other suites' plans
    val iso = spark.newSession()
    iso.conf.set("spark.sql.session.timeZone", "UTC")
    Shim.addOptimizerRule(iso, RollupRewrite)
    val q = Q.t(iso, dir, "documents").groupBy(col("lang"))
      .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("s"))
      .orderBy("lang")
    val plan = physPlan(q)
    assert(!plan.contains("documents.parquet"),
      s"optimizer-injected rule did not rewrite:\n$plan")
    val direct = Q.t(spark, dir, "documents").groupBy(col("lang"))
      .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("s"))
      .orderBy("lang")
    assert(q.collect().toSeq === direct.collect().toSeq)
  }
}
