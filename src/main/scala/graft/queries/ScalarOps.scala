package graft.queries

import org.apache.spark.sql.functions._
import Q._

/** Scalar-function surface (SURVEY.md §2.8 F1-F14) plus the remaining
  * aggregation shapes of §2.4/§2.6 (rollup/grouping, exact + approx
  * distinct, global sort/limit). All codegen'd built-ins — no UDFs in
  * any hot path.
  */
object ScalarOps {

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // F3-F6, F12, string length/split/md5 — the reference's key/url/
    // filename construction (`binance-di.py:97,144,156,170,199`) and
    // display transforms (`tests/test_redis-ticker.py:58`).
    QueryDef("q15_scalar_strings",
      (s, dir) => t(s, dir, "documents").select(
        col("doc_id"),
        upper(col("lang")).as("lang_u"),
        lower(col("source")).as("source_l"),
        concat_ws(":", lit("graft"), col("lang"), lower(col("source"))).as("stream_key"),
        length(col("text")).cast("long").as("len"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
        substring(col("text"), 1, 20).as("prefix"),
        regexp_replace(col("source"), "src", "source_").as("renamed"),
        md5(col("text")).as("text_md5"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
        |  upper(lang) AS lang_u,
        |  lower(source) AS source_l,
        |  concat_ws(':', 'graft', lang, lower(source)) AS stream_key,
        |  CAST(length(text) AS BIGINT) AS len,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |  substring(text, 1, 20) AS prefix,
        |  regexp_replace(source, 'src', 'source_', 'g') AS renamed,
        |  md5(text) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // F13 — timestamp semantics: epoch-millis at the edge, explicit
    // conversions inside (SURVEY.md §7.4).
    QueryDef("q16_dates",
      (s, dir) => t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        unix_millis(date_trunc("month", col("o_orderdate")).cast("timestamp"))
          .as("month_ms"),
        datediff(to_date(lit("2000-01-01")), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_2000"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
        |  year(o_orderdate) AS y,
        |  month(o_orderdate) AS m,
        |  day(o_orderdate) AS d,
        |  epoch_ms(date_trunc('month', o_orderdate)) AS month_ms,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS BIGINT) AS days_to_2000,
        |  strftime(o_orderdate, '%Y-%m-%d') AS iso
        |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // ------------------------------------------------------------------
    // A8 — ROLLUP with grouping markers: subtotal/total rows for the
    // pricing summary. One shuffle; Catalyst expands the grouping sets.
    QueryDef("q17_rollup",
      (s, dir) => t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(d(sum(dec(col("l_quantity")))).as("sum_qty"),
          count(lit(1)).as("n"),
          grouping(col("l_returnflag")).cast("long").as("g_rf"),
          grouping(col("l_linestatus")).cast("long").as("g_ls"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    // ------------------------------------------------------------------
    // A8 — exact distinct counts (the expensive one: per-group distinct
    // forces a two-phase expand+agg; fine to pay when asked exactly).
    QueryDef("q18_distinct_agg",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ------------------------------------------------------------------
    // A8 — approximate distinct (HLL++). Sketch values are
    // engine-specific, so no SQL oracle (driver records rows-only);
    // the ScalaTest spec bounds the relative error against exact.
    // This is the 100 TB path for cardinality: no expand, no exact
    // dedup shuffle.
    QueryDef("q19_approx_distinct",
      (s, dir) => events(s, dir)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("approx_users"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type")),
      None),

    // ------------------------------------------------------------------
    // O2/O3 — global top-k: orderBy+limit plans as TakeOrdered (per-
    // partition heap + driver merge of k) — no full sort at scale.
    QueryDef("q20_sort_limit",
      (s, dir) => t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),

    // ------------------------------------------------------------------
    // A8 — CUBE: all grouping-set combinations with markers.
    QueryDef("q47_cube",
      (s, dir) => t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(d(sum(dec(col("l_quantity")))).as("sum_qty"),
          count(lit(1)).as("n"),
          grouping(col("l_returnflag")).cast("long").as("g_rf"),
          grouping(col("l_linestatus")).cast("long").as("g_ls"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    // ------------------------------------------------------------------
    // §2.5 — ranking family: rank/dense_rank/percent_rank over
    // tie-capable orderings, ntile over a fully deterministic one.
    QueryDef("q48_rank_family",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val sv = events(s, dir)
          .groupBy(col("event_type"), col("user_id"))
          .agg(d(sum(dec(col("value")))).as("sv"))
        val wTies = Window.partitionBy(col("event_type"))
          .orderBy(col("sv").desc)
        val wDet = Window.partitionBy(col("event_type"))
          .orderBy(col("sv").desc, col("user_id"))
        sv.select(col("event_type"), col("user_id"), col("sv"),
          rank().over(wTies).cast("long").as("rnk"),
          dense_rank().over(wTies).cast("long").as("drnk"),
          percent_rank().over(wTies).as("prnk"),
          ntile(4).over(wDet).cast("long").as("quartile"))
          .orderBy(col("event_type"), col("user_id"))
      },
      Some("""WITH sv AS (
        |  SELECT event_type, user_id,
        |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv
        |  FROM events GROUP BY event_type, user_id)
        |SELECT event_type, user_id, sv,
        |  CAST(rank() OVER (PARTITION BY event_type ORDER BY sv DESC) AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER (PARTITION BY event_type ORDER BY sv DESC) AS BIGINT) AS drnk,
        |  percent_rank() OVER (PARTITION BY event_type ORDER BY sv DESC) AS prnk,
        |  CAST(ntile(4) OVER (PARTITION BY event_type ORDER BY sv DESC, user_id) AS BIGINT) AS quartile
        |FROM sv
        |ORDER BY event_type, user_id""".stripMargin)),

    // ------------------------------------------------------------------
    // A8 — exact interpolated percentiles (both engines: type-7
    // (n-1)·p interpolation over the sorted values; identical IEEE
    // arithmetic on identical operands). The approximate scale path
    // is approx_percentile (engine-specific sketch, like q19's HLL).
    QueryDef("q49_percentiles",
      (s, dir) => events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          expr("percentile(value, 0.5)").as("median"),
          expr("percentile(value, 0.9)").as("p90"),
          min(col("value")).as("vmin"),
          max(col("value")).as("vmax"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type,
        |  quantile_cont(value, 0.5) AS median,
        |  quantile_cont(value, 0.9) AS p90,
        |  min(value) AS vmin,
        |  max(value) AS vmax
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // F10 — numeric display formatting (the consumer's pretty-print
    // surface, tests/test_redis-data-full.py:54-57): printf-style,
    // identical in both engines on these 2-decimal inputs.
    QueryDef("q51_formatting",
      (s, dir) => events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"),
          format_string("%.2f", col("value")).as("price_2f"),
          format_string("%08d", col("user_id")).as("user_padded"),
          // %.2f only: the inputs are 2-decimal, so no rounding happens.
          // Rounding formats differ across engines (Java formats the
          // shortest-decimal repr HALF_UP; C rounds the binary value):
          // %.1f of 7.05 is "7.1" in Java but "7.0" in C/DuckDB.
          concat(lit("user="), col("user_id").cast("string"),
            lit(" value="), format_string("%.2f", col("value"))).as("display"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
        |  printf('%.2f', value) AS price_2f,
        |  printf('%08d', user_id) AS user_padded,
        |  'user=' || CAST(user_id AS VARCHAR) || ' value=' || printf('%.2f', value) AS display
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // A8 — explicit GROUPING SETS via the SQL surface (returnflag
    // totals and linestatus totals in one pass, no cross terms).
    QueryDef("q52_grouping_sets",
      (s, dir) => {
        Skew.registerTables(s, dir)
        s.sql("""SELECT l_returnflag, l_linestatus,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
          |  count(*) AS n
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
          |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin))
  )
}
