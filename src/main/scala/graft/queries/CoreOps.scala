package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Q._

/** Core relational operator surface (SURVEY.md §2.2-§2.7): the
  * reference's projections/predicates/routing plus the full
  * join/agg/window/sort/set-op families the new engine adds. Every
  * query is a declarative DataFrame plan — Catalyst handles pushdown,
  * pruning and join selection; broadcast hints mark the genuinely
  * small dimensions so the 100 TB plan never shuffles them.
  */
object CoreOps {

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // A7/A8 — grouped aggregation with partial (map-side) combine.
    // TPC-H Q1 shape over lineitem: the flagship scan+agg. At scale:
    // one shuffle on the 6-value group key; decimal sums are exact.
    QueryDef("q01_pricing_summary",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp_ntz(lit("1998-09-01 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          d(sum(dec(col("l_quantity")))).as("sum_qty"),
          d(sum(money(col("l_extendedprice")))).as("sum_base_price"),
          dSplit(sum(money(col("l_extendedprice")) * oneMinus(col("l_discount"))))
            .as("sum_disc_price"),
          dSplit(sum(money(col("l_extendedprice")) * oneMinus(col("l_discount"))
            * onePlus(col("l_tax")))).as("sum_charge"),
          (d(sum(dec(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
          (d(sum(money(col("l_extendedprice")))) / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some(s"""SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,4))) AS DOUBLE) AS sum_base_price,
        |  ${dSplitSql("sum(CAST(l_extendedprice AS DECIMAL(14,4)) * CAST(1 - CAST(l_discount AS DECIMAL(8,4)) AS DECIMAL(6,4)))")} AS sum_disc_price,
        |  ${dSplitSql("sum(CAST(l_extendedprice AS DECIMAL(14,4)) * CAST(1 - CAST(l_discount AS DECIMAL(8,4)) AS DECIMAL(6,4)) * CAST(1 + CAST(l_tax AS DECIMAL(8,4)) AS DECIMAL(6,4)))")} AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,4))) AS DOUBLE) / count(*) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ------------------------------------------------------------------
    // P6 — the reference's documented jq surface: filter the
    // multiplexed stream on its type discriminator, project payload
    // fields (`jq 'select(.stream=="ticker") | .data.last_price'`,
    // README.md:128-134). Filter + projection reach the parquet scan.
    QueryDef("q02_envelope_filter",
      (s, dir) => events(s, dir)
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), d(col("value")).as("value"),
          col("ts_ms").as("event_ms"),
          regexp_extract(col("props"), """"k":\s*(\d+)""", 1).cast("long").as("prop_k"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, user_id, value,
        |  epoch_ms(CAST(ts AS TIMESTAMP)) AS event_ms,
        |  CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS prop_k
        |FROM events WHERE event_type = 'click'
        |ORDER BY event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // P7/A1 — routing predicates (stream/symbol membership,
    // `binance-di.py:278-286`) + per-key counting (`--samples`
    // accounting, binance-di.py:111-115).
    QueryDef("q03_routing_agg",
      (s, dir) => events(s, dir)
        .filter(col("event_type").isin("click", "view") && col("user_id") < 75)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), d(sum(dec(col("value")))).as("sum_value"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE event_type IN ('click','view') AND user_id < 75
        |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // O1 — top-k per key (top-3 book levels, tests/test_redis-data.py:74-75)
    // generalized: rank-within-partition + filter. Single hash
    // partition shuffle on the key; no global sort of the fact table.
    QueryDef("q04_topk_per_key",
      (s, dir) => {
        val w = Window.partitionBy(col("l_partkey"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        t(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .orderBy(col("l_partkey"), col("rn"))
      },
      Some("""SELECT l_partkey, l_orderkey, l_linenumber, l_extendedprice, rn
        |FROM (
        |  SELECT l_partkey, l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_partkey
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem)
        |WHERE rn <= 3
        |ORDER BY l_partkey, rn""".stripMargin)),

    // ------------------------------------------------------------------
    // §2.3 — star-schema enrichment join. nation (25) and region (5)
    // are broadcast: at 100 TB the fact side never shuffles for
    // dimension joins.
    QueryDef("q05_join_broadcast_star",
      (s, dir) => t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          d(sum(dec(col("c_acctbal")))).as("sum_acctbal"))
        .orderBy(col("r_name"), col("n_name")),
      Some("""SELECT r_name, n_name, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin)),

    // ------------------------------------------------------------------
    // §2.3 — large-side equi join (shuffle hash / sort-merge; AQE
    // picks at runtime). Both sides hash-partition on the orderkey.
    QueryDef("q06_join_revenue",
      (s, dir) => t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          dSplit(sum(money(col("l_extendedprice")) * oneMinus(col("l_discount"))))
            .as("revenue"))
        .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority, count(*) AS n_lines,
        |  (CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(14,4)) * CAST(1 - CAST(l_discount AS DECIMAL(8,4)) AS DECIMAL(6,4)))) AS DOUBLE) + CAST((sum(CAST(l_extendedprice AS DECIMAL(14,4)) * CAST(1 - CAST(l_discount AS DECIMAL(8,4)) AS DECIMAL(6,4)))) - floor(sum(CAST(l_extendedprice AS DECIMAL(14,4)) * CAST(1 - CAST(l_discount AS DECIMAL(8,4)) AS DECIMAL(6,4)))) AS DOUBLE)) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)),

    // ------------------------------------------------------------------
    // §2.3 — left-semi (EXISTS): orders having any heavy line.
    QueryDef("q07_join_semi",
      (s, dir) => t(s, dir, "orders")
        .join(t(s, dir, "lineitem").filter(col("l_quantity") > 45)
          .select(col("l_orderkey")),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        |ORDER BY o_orderkey""".stripMargin)),

    // ------------------------------------------------------------------
    // §2.3 — left-anti (NOT EXISTS): customers with no big-ticket order.
    QueryDef("q08_join_anti",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_totalprice") > 400000)
          .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name, c_acctbal
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin)),

    // ------------------------------------------------------------------
    // §2.7 — the queue fan-in is a UNION ALL of keyed sources
    // (binance-di.py:109,266); tag + aggregate.
    QueryDef("q09_union_all_agg",
      (s, dir) => {
        val ev = events(s, dir)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("value"), lit("c").as("src"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("value"), lit("v").as("src"))
        clicks.unionByName(views)
          .groupBy(col("src"))
          .agg(count(lit(1)).as("n"), d(sum(dec(col("value")))).as("sum_value"))
          .orderBy(col("src"))
      },
      Some("""SELECT src, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM (
        |  SELECT user_id, value, 'c' AS src FROM events WHERE event_type='click'
        |  UNION ALL
        |  SELECT user_id, value, 'v' AS src FROM events WHERE event_type='view')
        |GROUP BY src ORDER BY src""".stripMargin)),

    // ------------------------------------------------------------------
    // §2.7 — INTERSECT (distinct) of key domains.
    QueryDef("q10_intersect",
      (s, dir) => t(s, dir, "customer")
        .select(col("c_nationkey").cast("long").as("nationkey"))
        .intersect(t(s, dir, "supplier")
          .select(col("s_nationkey").cast("long").as("nationkey")))
        .orderBy(col("nationkey")),
      Some("""SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        |INTERSECT
        |SELECT CAST(s_nationkey AS BIGINT) FROM supplier
        |ORDER BY nationkey""".stripMargin)),

    // ------------------------------------------------------------------
    // §2.7 — EXCEPT (distinct): high-value clickers who never made a
    // high-value purchase.
    QueryDef("q11_except",
      (s, dir) => {
        val ev = events(s, dir)
        ev.filter(col("event_type") === "click" && col("value") > 400)
          .select(col("user_id"))
          .except(ev.filter(col("event_type") === "purchase" && col("value") > 400)
            .select(col("user_id")))
          .orderBy(col("user_id"))
      },
      Some("""SELECT DISTINCT user_id FROM events
        |  WHERE event_type = 'click' AND value > 400
        |EXCEPT
        |SELECT DISTINCT user_id FROM events
        |  WHERE event_type = 'purchase' AND value > 400
        |ORDER BY user_id""".stripMargin)),

    // ------------------------------------------------------------------
    // §2.5 — analytic window: per-key previous value + delta (the
    // tick-to-tick change a market consumer derives from the stream).
    QueryDef("q12_window_lag",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        events(s, dir)
          .select(col("event_id"), col("ts"), col("user_id"), col("value"))
          .withColumn("prev_value", lag(col("value"), 1).over(w))
          .withColumn("delta", col("value") - col("prev_value"))
          .drop("ts")
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id, value,
        |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
        |  value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
        |FROM events
        |ORDER BY event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // §2.5 — rolling 1-hour range frame per key (rolling volume; the
    // rolling-VWAP frame shape from SURVEY §2.5).
    QueryDef("q13_window_rolling",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"))
          .rangeBetween(-3600000L, 0L)
        events(s, dir)
          .select(col("event_id"), col("user_id"), col("ts_ms"), col("value"))
          .withColumn("rolling_1h", d(sum(dec(col("value"))).over(w)))
          .drop("value")
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) OVER (
        |    PARTITION BY user_id ORDER BY epoch_ms(CAST(ts AS TIMESTAMP))
        |    RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_1h
        |FROM events
        |ORDER BY event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // A7 — OHLCV candles *computed* from the trade-shaped stream (the
    // reference only ingests exchange-computed klines,
    // binance-di.py:56-67; an equivalent engine must compute them).
    // open/close picked by deterministic (ts, event_id) rank; single
    // shuffle on (hour, key).
    QueryDef("q14_ohlcv",
      (s, dir) => {
        val ev = events(s, dir)
          .withColumn("bucket_ms", expr("ts DIV 3600000000000 * 3600000"))
        val wAsc = Window.partitionBy(col("bucket_ms"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        val wDesc = Window.partitionBy(col("bucket_ms"), col("event_type"))
          .orderBy(col("ts").desc, col("event_id").desc)
        ev.withColumn("rna", row_number().over(wAsc))
          .withColumn("rnd", row_number().over(wDesc))
          .groupBy(col("bucket_ms"), col("event_type"))
          .agg(
            max(when(col("rna") === 1, col("value"))).as("open"),
            max(col("value")).as("high"),
            min(col("value")).as("low"),
            max(when(col("rnd") === 1, col("value"))).as("close"),
            d(sum(dec(col("value")))).as("volume"),
            count(lit(1)).as("n_trades"))
          .orderBy(col("bucket_ms"), col("event_type"))
      },
      Some("""WITH tagged AS (
        |  SELECT epoch_ms(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS bucket_ms,
        |    event_type, value,
        |    row_number() OVER (PARTITION BY date_trunc('hour', CAST(ts AS TIMESTAMP)), event_type
        |      ORDER BY ts, event_id) AS rna,
        |    row_number() OVER (PARTITION BY date_trunc('hour', CAST(ts AS TIMESTAMP)), event_type
        |      ORDER BY ts DESC, event_id DESC) AS rnd
        |  FROM events)
        |SELECT bucket_ms, event_type,
        |  max(CASE WHEN rna = 1 THEN value END) AS open,
        |  max(value) AS high,
        |  min(value) AS low,
        |  max(CASE WHEN rnd = 1 THEN value END) AS close,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS volume,
        |  count(*) AS n_trades
        |FROM tagged
        |GROUP BY bucket_ms, event_type
        |ORDER BY bucket_ms, event_type""".stripMargin))
  )
}
