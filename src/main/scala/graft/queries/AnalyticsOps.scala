package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{ArrayType, StringType}
import Q._

/** Market-analytics surface: the consumer-side derivations of the
  * reference (best bid/ask, mid-price, spread — A4-A6,
  * `tests/test_redis-data-full.py:49-52`; top-of-book slices — O1,
  * `tests/test_redis-data.py:74-75`) plus the joins the domain
  * naturally needs (range join, as-of trade↔quote alignment,
  * SURVEY.md §2.3).
  */
object AnalyticsOps {

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // §2.3 — equi+range predicate join (interval matching). The equi
    // key keeps it a hash join; the range predicate is evaluated
    // post-match, so no nested-loop blowup at scale.
    QueryDef("q21_range_join",
      (s, dir) => t(s, dir, "lineitem")
        .join(t(s, dir, "part"),
          col("l_partkey") === col("p_partkey") &&
            col("l_quantity") >= col("p_size") - 2 &&
            col("l_quantity") <= col("p_size") + 2)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          d(sum(money(col("l_extendedprice")))).as("sum_price"))
        .orderBy(col("p_brand")),
      Some("""SELECT p_brand, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,4))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN part
        |  ON l_partkey = p_partkey
        |  AND l_quantity >= p_size - 2 AND l_quantity <= p_size + 2
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // ------------------------------------------------------------------
    // §2.3 — AS-OF join (trade↔quote alignment): for each purchase,
    // the most recent click value of the same user at or before it.
    // Composed from built-ins: union the two streams on one time axis,
    // carry the quote forward with last(ignoreNulls) over an ordered
    // per-key frame — one shuffle on the key, no range self-join.
    QueryDef("q22_asof_join",
      (s, dir) => {
        val ev = events(s, dir)
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("event_id"), col("ts"), col("ts_ms"), col("user_id"),
            col("event_type"), col("value"))
          .withColumn("c_val",
            when(col("event_type") === "click", col("value")))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.withColumn("last_click", last(col("c_val"), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_ms"),
            col("value"), col("last_click"))
          .orderBy(col("event_id"))
      },
      Some("""WITH u AS (
        |  SELECT event_id, ts, user_id, event_type, value,
        |    CASE WHEN event_type = 'click' THEN value END AS c_val
        |  FROM events WHERE event_type IN ('click','purchase')),
        |w AS (
        |  SELECT *, last_value(c_val IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click
        |  FROM u)
        |SELECT event_id, user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
        |  value, last_click
        |FROM w WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // §2.3 — the SAME as-of semantics through the native operator
    // (graft.plans.AsOfJoin: custom LogicalPlan + Strategy + SparkPlan,
    // SURVEY.md §2.10 escalation tier (c)). One O(|L|+|R|) merge per
    // co-partitioned (user) partition, one row of state — vs q22's
    // union+window, which shuffles the CONCATENATION of both streams
    // and buffers a window frame. The right side is pre-aggregated to
    // one row per (user, ts) so "latest click at or before" is
    // deterministic; the oracle is DuckDB's own ASOF LEFT JOIN.
    QueryDef("q101_asof_native",
      (s, dir) => {
        val ev = events(s, dir)
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id").as("c_user"), col("ts").as("c_ts"))
          .agg(max(col("value")).as("last_click"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("ts_ms"), col("value"))
        graft.plans.AsOfJoin.backward(purchases, clicks,
          Seq("user_id"), Seq("c_user"), "ts", "c_ts")
          .select(col("event_id"), col("user_id"), col("ts_ms"),
            col("value"), col("last_click"),
            expr("c_ts DIV 1000000").as("click_ms"))
          .orderBy(col("event_id"))
      },
      Some("""WITH c AS (
        |  SELECT user_id AS c_user, ts AS c_ts, max(value) AS last_click
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (
        |  SELECT event_id, user_id, ts, value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id,
        |  epoch_ms(CAST(p.ts AS TIMESTAMP)) AS ts_ms, p.value,
        |  c.last_click,
        |  epoch_ms(CAST(c.c_ts AS TIMESTAMP)) AS click_ms
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.c_user AND p.ts >= c.c_ts
        |ORDER BY event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // As-of join with a TOLERANCE window (pandas merge_asof
    // tolerance): same native operator as q101, but a click older
    // than 2 h at purchase time is STALE state and null-extends
    // instead of matching — the freshness contract real enrichment
    // pipelines carry ("use the last quote, but never one from
    // before the halt"). Exercised through the same strategy, so
    // both the merge and broadcast execs implement it (the spec pins
    // both paths); DuckDB has no ASOF tolerance, so the oracle is
    // the windowed-max formulation over the bounded range.
    QueryDef("q115_asof_tolerance",
      (s, dir) => {
        val tolNs = 7200000000000L // 2 h in ns (ts is epoch-nanos)
        val ev = events(s, dir)
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id").as("c_user"), col("ts").as("c_ts"))
          .agg(max(col("value")).as("last_click"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("ts_ms"), col("value"))
        graft.plans.AsOfJoin.backward(purchases, clicks,
          Seq("user_id"), Seq("c_user"), "ts", "c_ts",
          tolerance = Some(tolNs))
          .select(col("event_id"), col("user_id"), col("ts_ms"),
            col("value"), col("last_click"),
            expr("c_ts DIV 1000000").as("click_ms"))
          .orderBy(col("event_id"))
      },
      Some("""WITH c AS (
        |  SELECT user_id AS c_user, ts AS c_ts, max(value) AS last_click
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (
        |  SELECT event_id, user_id, ts, value
        |  FROM events WHERE event_type = 'purchase'),
        |m AS (
        |  SELECT p.event_id, max(c.c_ts) AS m_ts
        |  FROM p JOIN c ON p.user_id = c.c_user
        |    AND c.c_ts <= p.ts
        |    AND c.c_ts >= p.ts - INTERVAL 2 HOUR
        |  GROUP BY p.event_id)
        |SELECT p.event_id, p.user_id,
        |  epoch_ms(CAST(p.ts AS TIMESTAMP)) AS ts_ms, p.value,
        |  c.last_click,
        |  epoch_ms(CAST(c.c_ts AS TIMESTAMP)) AS click_ms
        |FROM p
        |LEFT JOIN m ON p.event_id = m.event_id
        |LEFT JOIN c ON c.c_user = p.user_id AND c.c_ts = m.m_ts
        |ORDER BY p.event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // FORWARD as-of through the same native operator — "first
    // purchase at or after each click", the time-to-conversion
    // enrich (pandas merge_asof direction='forward'). The forward
    // merge needs NO match memory at all: with both sides sorted by
    // (key, time), the right cursor IS the candidate, and a skipped
    // right row can never become eligible for a later probe. Both
    // execs implement the direction (the strategy still picks by
    // right-side stats); the oracle is DuckDB's own forward ASOF
    // (p_ts >= ts). Right side pre-aggregated to unique (user, ts)
    // for a deterministic payload, as q101 does.
    QueryDef("q121_asof_forward",
      (s, dir) => {
        val ev = events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id").as("p_user"), col("ts").as("p_ts"))
          .agg(max(col("value")).as("next_purchase"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("ts_ms"), col("value"))
        graft.plans.AsOfJoin.forward(clicks, purchases,
          Seq("user_id"), Seq("p_user"), "ts", "p_ts")
          .select(col("event_id"), col("user_id"), col("ts_ms"),
            col("value"), col("next_purchase"),
            expr("p_ts DIV 1000000").as("purchase_ms"))
          .orderBy(col("event_id"))
      },
      Some("""WITH p AS (
        |  SELECT user_id AS p_user, ts AS p_ts, max(value) AS next_purchase
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |c AS (
        |  SELECT event_id, user_id, ts, value
        |  FROM events WHERE event_type = 'click')
        |SELECT c.event_id, c.user_id,
        |  epoch_ms(CAST(c.ts AS TIMESTAMP)) AS ts_ms, c.value,
        |  p.next_purchase,
        |  epoch_ms(CAST(p.p_ts AS TIMESTAMP)) AS purchase_ms
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.p_user AND p.p_ts >= c.ts
        |ORDER BY event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // §2.3 — interval OVERLAP join with NO equi key, via binning: the
    // one join shape Spark's built-ins can only plan as a nested loop.
    // Each interval explodes to the fixed-width bins it covers, the
    // join is an EQUI join on bin + overlap predicate, and the pair
    // is emitted exactly once by keeping only the bin containing
    // greatest(start_a, start_b) — the standard first-overlap-bin
    // trick, so no distinct pass. At 100 TB this turns O(|A|·|B|)
    // into Σ_bin |A_b|·|B_b| with both sides hash-clustered on bin;
    // bin width tunes the fan-out/selectivity trade like any range
    // join bin hint. The BIN width (6 h) is deliberately FINER than
    // the day-wide intervals, so every interval really does explode
    // to ~4-5 bins and the single-emission predicate is load-bearing
    // (the oracle's plain overlap join would expose any double
    // emission as an inflated n_pairs). Shape: user-day activity
    // intervals × per-type daily windows — "which users were active
    // during which stream's live window".
    QueryDef("q102_interval_overlap",
      (s, dir) => {
        val W = 86400000L  // interval grouping: 1 day (ms)
        val Wb = 21600000L // bin width: 6 h — several bins per interval
        val ev = events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts_ms"))
        val a = ev.groupBy(col("user_id"),
            expr(s"ts_ms DIV $W").as("a_day"))
          .agg(min(col("ts_ms")).as("a_start"), max(col("ts_ms")).as("a_end"))
        val b = ev.groupBy(col("event_type"),
            expr(s"ts_ms DIV $W").as("b_day"))
          .agg(min(col("ts_ms")).as("b_start"), max(col("ts_ms")).as("b_end"))
        val aBin = a.withColumn("bin",
          explode(sequence(expr(s"a_start DIV $Wb"), expr(s"a_end DIV $Wb"))))
        val bBin = b.withColumn("bin",
          explode(sequence(expr(s"b_start DIV $Wb"), expr(s"b_end DIV $Wb"))))
        aBin.join(bBin,
            aBin("bin") === bBin("bin") &&
              col("a_start") <= col("b_end") &&
              col("b_start") <= col("a_end") &&
              aBin("bin") === expr(s"greatest(a_start, b_start) DIV $Wb"))
          .groupBy(col("event_type"), col("b_day"))
          .agg(count(lit(1)).as("n_pairs"),
            count_distinct(col("user_id")).as("n_users"))
          .orderBy(col("event_type"), col("b_day"))
      },
      Some("""WITH e AS (
        |  SELECT user_id, event_type,
        |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms FROM events),
        |a AS (
        |  SELECT user_id, ts_ms // 86400000 AS a_day,
        |    min(ts_ms) AS a_start, max(ts_ms) AS a_end
        |  FROM e GROUP BY 1, 2),
        |b AS (
        |  SELECT event_type, ts_ms // 86400000 AS b_day,
        |    min(ts_ms) AS b_start, max(ts_ms) AS b_end
        |  FROM e GROUP BY 1, 2)
        |SELECT b.event_type, b.b_day,
        |  count(*) AS n_pairs, count(DISTINCT a.user_id) AS n_users
        |FROM a JOIN b ON a.a_start <= b.b_end AND b.b_start <= a.a_end
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ------------------------------------------------------------------
    // A4-A6 — best bid / best ask / mid-price / spread
    // (tests/test_redis-data-full.py:49-52) over keyed hourly windows:
    // views quote the bid side, clicks the ask side.
    QueryDef("q23_best_bid_ask",
      (s, dir) => events(s, dir)
        .withColumn("bucket_ms", expr("ts DIV 3600000000000 * 3600000"))
        .groupBy(col("bucket_ms"), col("user_id"))
        .agg(max(when(col("event_type") === "view", col("value"))).as("best_bid"),
          min(when(col("event_type") === "click", col("value"))).as("best_ask"))
        .filter(col("best_bid").isNotNull && col("best_ask").isNotNull)
        .withColumn("mid_price", (col("best_bid") + col("best_ask")) / 2)
        .withColumn("spread", col("best_ask") - col("best_bid"))
        .orderBy(col("bucket_ms"), col("user_id")),
      Some("""SELECT epoch_ms(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS bucket_ms,
        |  user_id,
        |  max(CASE WHEN event_type = 'view' THEN value END) AS best_bid,
        |  min(CASE WHEN event_type = 'click' THEN value END) AS best_ask,
        |  (max(CASE WHEN event_type = 'view' THEN value END)
        |   + min(CASE WHEN event_type = 'click' THEN value END)) / 2 AS mid_price,
        |  min(CASE WHEN event_type = 'click' THEN value END)
        |   - max(CASE WHEN event_type = 'view' THEN value END) AS spread
        |FROM events
        |GROUP BY 1, 2
        |HAVING best_bid IS NOT NULL AND best_ask IS NOT NULL
        |ORDER BY bucket_ms, user_id""".stripMargin)),

    // ------------------------------------------------------------------
    // §2.3 — full outer join: per-nation customer/supplier presence,
    // including nations with only one side (null-preserving).
    QueryDef("q50_join_full_outer",
      (s, dir) => {
        val c = t(s, dir, "customer").groupBy(col("c_nationkey").cast("long")
          .as("nationkey")).agg(count(lit(1)).as("n_customers"))
        val su = t(s, dir, "supplier").groupBy(col("s_nationkey").cast("long")
          .as("nationkey")).agg(count(lit(1)).as("n_suppliers"))
        c.withColumnRenamed("nationkey", "ck")
          .join(su.withColumnRenamed("nationkey", "sk"),
            col("ck") === col("sk"), "full_outer")
          .select(coalesce(col("ck"), col("sk")).as("nationkey"),
            coalesce(col("n_customers"), lit(0L)).as("n_customers"),
            coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
          .orderBy(col("nationkey"))
      },
      Some("""SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
        |  coalesce(c.n_customers, 0) AS n_customers,
        |  coalesce(s.n_suppliers, 0) AS n_suppliers
        |FROM (SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        |        count(*) AS n_customers FROM customer GROUP BY 1) c
        |FULL OUTER JOIN (SELECT CAST(s_nationkey AS BIGINT) AS nationkey,
        |        count(*) AS n_suppliers FROM supplier GROUP BY 1) s
        |  ON c.nationkey = s.nationkey
        |ORDER BY nationkey""".stripMargin)),

    // ------------------------------------------------------------------
    // P2/F1/F2/F11/O1/A4 — the full order-book wire round trip: build
    // a best-first [[price,qty],...] book per key, serialize to the
    // reference's JSON-string wire format (`binance-di.py:45-46`),
    // parse it back (`tests/test_redis-data.py:71-72`), then derive
    // top-of-book metrics by array indexing and a top-3 slice — all
    // inside one plan. The oracle computes the same metrics
    // relationally, proving the round trip is lossless.
    QueryDef("q24_orderbook_roundtrip",
      (s, dir) => {
        val levels = t(s, dir, "lineitem").select(
          col("l_orderkey"),
          struct((-col("l_extendedprice")).as("np"),
            col("l_linenumber").as("ln"),
            col("l_quantity").as("q")).as("lvl"))
        levels.groupBy(col("l_orderkey"))
          .agg(sort_array(collect_list(col("lvl"))).as("sorted"))
          // wire format: best-first [[price, qty], ...] JSON string
          .withColumn("bids_json", to_json(transform(col("sorted"),
            x => array((-x.getField("np")).cast("string"),
              x.getField("q").cast("string")))))
          .select(col("l_orderkey"), col("bids_json"))
          // consumer side: parse the JSON wire string back
          .withColumn("book",
            from_json(col("bids_json"), ArrayType(ArrayType(StringType))))
          .select(col("l_orderkey"),
            element_at(element_at(col("book"), 1), 1).cast("double").as("best_bid"),
            element_at(element_at(col("book"), 1), 2).cast("double").as("best_bid_qty"),
            size(col("book")).cast("long").as("n_levels"),
            aggregate(
              transform(slice(col("book"), 1, 3),
                x => element_at(x, 2).cast("double")),
              lit(0.0), (acc, x) => acc + x).as("top3_qty"))
          .orderBy(col("l_orderkey"))
      },
      Some("""WITH ranked AS (
        |  SELECT l_orderkey, l_extendedprice, l_quantity,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_extendedprice DESC, l_linenumber) AS rn
        |  FROM lineitem)
        |SELECT l_orderkey,
        |  max(CASE WHEN rn = 1 THEN l_extendedprice END) AS best_bid,
        |  max(CASE WHEN rn = 1 THEN l_quantity END) AS best_bid_qty,
        |  count(*) AS n_levels,
        |  CAST(sum(CASE WHEN rn <= 3 THEN l_quantity ELSE 0 END) AS DOUBLE) AS top3_qty
        |FROM ranked
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin)),

    // ------------------------------------------------------------------
    // NEAREST-direction as-of join — pandas merge_asof
    // direction='nearest', composed from the native operator's two
    // primitive directions: one backward pass (latest signup ≤ click)
    // and one forward pass (earliest signup ≥ click) over the same
    // inputs, then a per-row pick of the smaller |Δt| (ties →
    // backward, which is also the earlier timestamp — matching the
    // oracle's (abs diff, ts) order). Each pass is the native
    // merge/broadcast as-of exec; the pick is a map-side projection
    // after an equi-join of the two outputs on the left row id — no
    // new plan node needed, which is the point of composable
    // primitives. Right side pre-aggregated to unique (key, time)
    // per the operator's tie contract.
    QueryDef("q141_asof_nearest",
      (s, dir) => {
        val ev = events(s, dir)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"), col("ts_ms"))
        // tie contract shared with the oracle: ONE row per
        // (user_id, millisecond) — max(value) over the whole ms
        // group, with the representative ns timestamp derived FROM
        // the ms (ms start). Grouping by the raw ns ts instead would
        // keep two same-ms signups distinct and let the backward pass
        // pick the latest-ns row's value where the oracle (which only
        // sees ms) takes the group max — a data-dependent mismatch.
        val signups = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id").as("s_user"),
            expr("ts DIV 1000000").as("s_ms"))
          .agg(max(col("value")).as("s_val"))
          .withColumn("s_ts", col("s_ms") * 1000000L)
        val back = graft.plans.AsOfJoin.backward(clicks, signups,
            Seq("user_id"), Seq("s_user"), "ts", "s_ts")
          .select(col("event_id"), col("s_ms").as("b_ms"),
            col("s_val").as("b_val"))
        val fwd = graft.plans.AsOfJoin.forward(clicks, signups,
            Seq("user_id"), Seq("s_user"), "ts", "s_ts")
          .select(col("event_id"), col("s_ms").as("f_ms"),
            col("s_val").as("f_val"))
        val pickBack = col("f_ms").isNull ||
          (col("b_ms").isNotNull &&
            col("ts_ms") - col("b_ms") <= col("f_ms") - col("ts_ms"))
        clicks.select(col("event_id"), col("user_id"), col("ts_ms"))
          .join(back, "event_id").join(fwd, "event_id")
          .select(col("event_id"), col("user_id"), col("ts_ms"),
            when(pickBack, col("b_ms")).otherwise(col("f_ms"))
              .as("nearest_ms"),
            when(pickBack, col("b_val")).otherwise(col("f_val"))
              .as("nearest_value"))
          .withColumn("delta_ms", col("nearest_ms") - col("ts_ms"))
          .orderBy(col("event_id"))
      },
      Some(s"""WITH sg AS (
        |  SELECT user_id, $tsMs AS s_ms, max(value) AS s_val
        |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2),
        |c AS (
        |  SELECT event_id, user_id, $tsMs AS ts_ms
        |  FROM events WHERE event_type = 'click'),
        |j AS (
        |  SELECT c.event_id, sg.s_ms, sg.s_val,
        |    row_number() OVER (PARTITION BY c.event_id
        |      ORDER BY abs(sg.s_ms - c.ts_ms), sg.s_ms) AS rn
        |  FROM c JOIN sg USING (user_id))
        |SELECT c.event_id, c.user_id, c.ts_ms,
        |  j.s_ms AS nearest_ms, j.s_val AS nearest_value,
        |  j.s_ms - c.ts_ms AS delta_ms
        |FROM c LEFT JOIN (SELECT * FROM j WHERE rn = 1) j
        |  USING (event_id)
        |ORDER BY event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // VWAP — the volume-weighted average price every execution/TCA
    // report leads with, per ship-day and return flag over lineitem's
    // (extendedprice = price·qty, quantity) pair: Σ(p·q)/Σq. Both
    // sums ride the exact DECIMAL path, so the single final division
    // is on identical operands in both engines. One hash-agg keyed
    // by (day, flag); at scale this is the canonical partial-agg
    // shape with no shuffle beyond the group key.
    QueryDef("q149_vwap",
      (s, dir) => {
        t(s, dir, "lineitem")
          .groupBy(col("l_shipdate").cast("date").as("ship_date"),
            col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            d(sum(dec(col("l_quantity")))).as("total_qty"),
            (d(sum(money(col("l_extendedprice"))))
              / d(sum(dec(col("l_quantity"))))).as("vwap"))
          .select(col("ship_date").cast("string").as("ship_date"),
            col("l_returnflag"), col("n"), col("total_qty"), col("vwap"))
          .orderBy(col("ship_date"), col("l_returnflag"))
      },
      Some("""SELECT CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_date,
        |  l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |    AS total_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,4))) AS DOUBLE)
        |    / CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |    AS vwap
        |FROM lineitem
        |GROUP BY 1, 2 ORDER BY ship_date, l_returnflag""".stripMargin)),

    // ------------------------------------------------------------------
    // Tick-rule signed order flow — classify each print as
    // buyer/seller-initiated by the classic tick test (uptick ⇒ +1,
    // downtick ⇒ −1, zero tick CARRIES the last sign — the
    // last(ignoreNulls) window is the carry), then net signed flow
    // per hour per event type. Sign comparisons are on raw doubles
    // (same bits both engines ⇒ same comparison); the signed value
    // sum rides the DECIMAL path. Two windows and one hash-agg, all
    // partitioned by event_type — nothing global.
    QueryDef("q150_tick_flow",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // Two-phase bucketed sign carry (q239's boundary-stitch
        // generalized to last_value semantics), NOT windows
        // partitioned by event_type alone — ~4 types would serialize
        // |events|/4 rows through ONE task. The tick sign per row
        // depends on (a) the in-bucket lag, (b) for each bucket's
        // first row, the boundary comparison with the previous
        // bucket's last value, and (c) when no in-bucket change
        // precedes, the sign carried INTO the bucket. (b) and (c)
        // are closed forms over the ≤256-row per-bucket summary
        // (first/last value + last in-bucket change), broadcast back.
        val nBuckets = 256L
        val ev0 = events(s, dir)
          .select(col("event_type"), col("event_id"), col("ts_ms"),
            col("value"))
        val Array(minT, maxT) = ev0
          .agg(min(col("ts_ms")), max(col("ts_ms")))
          .head().toSeq.map(_.asInstanceOf[Long]).toArray
        val width = math.max(1L, (maxT - minT + nBuckets) / nBuckets)
        val wIn = Window.partitionBy(col("event_type"), col("bucket"))
          .orderBy(col("ts_ms"), col("event_id"))
        val wS = Window.partitionBy(col("event_type"))
          .orderBy(col("bucket"))
        val rows = ev0
          .withColumn("bucket",
            expr(s"(ts_ms - ${minT}L) DIV ${width}L"))
          .withColumn("rn", row_number().over(wIn))
          .withColumn("prev", lag(col("value"), 1).over(wIn))
          .withColumn("chg_in",
            when(col("prev").isNull, lit(null))
              .when(col("value") > col("prev"), 1L)
              .when(col("value") < col("prev"), -1L)
              .otherwise(lit(null)))
        val summ = rows.groupBy(col("event_type"), col("bucket"))
          .agg(
            min(struct(col("ts_ms"), col("event_id"), col("value")))
              .getField("value").as("v_first"),
            max(struct(col("ts_ms"), col("event_id"), col("value")))
              .getField("value").as("v_last"),
            // last row of the bucket whose in-bucket change is
            // non-null (max over structs skips null inputs)
            max(when(col("chg_in").isNotNull,
              struct(col("ts_ms"), col("event_id"), col("chg_in"))))
              .getField("chg_in").as("last_chg_in"))
          .withColumn("prev_last", lag(col("v_last"), 1).over(wS))
          .withColumn("bnd_chg",
            when(col("prev_last").isNull, lit(null))
              .when(col("v_first") > col("prev_last"), 1L)
              .when(col("v_first") < col("prev_last"), -1L)
              .otherwise(lit(null)))
          // the last effective change WITHIN the bucket (its own
          // boundary change when no interior one exists) — the value
          // later buckets inherit when they open with no change
          .withColumn("eff",
            coalesce(col("last_chg_in"), col("bnd_chg")))
          .withColumn("carry_in",
            last(col("eff"), ignoreNulls = true).over(
              wS.rowsBetween(Window.unboundedPreceding, -1)))
          .select(col("event_type"), col("bucket"), col("bnd_chg"),
            col("carry_in"))
        val ev = rows
          .join(broadcast(summ), Seq("event_type", "bucket"))
          .withColumn("chg",
            when(col("rn") === 1, col("bnd_chg")).otherwise(col("chg_in")))
          .withColumn("sgn",
            coalesce(
              last(col("chg"), ignoreNulls = true).over(
                wIn.rowsBetween(Window.unboundedPreceding, 0)),
              col("carry_in"), lit(0L)))
        ev.groupBy(col("event_type"),
            expr("ts_ms div 3600000 * 3600000").as("hour_ms"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("sgn") === 1, 1L).otherwise(0L)).as("n_up"),
            sum(when(col("sgn") === -1, 1L).otherwise(0L)).as("n_down"),
            d(sum(dec(col("value")) * col("sgn"))).as("net_flow"))
          .orderBy(col("event_type"), col("hour_ms"))
      },
      Some(s"""WITH ev AS (
        |  SELECT event_type, event_id, $tsMs AS ts_ms, value,
        |    lag(value) OVER (PARTITION BY event_type
        |      ORDER BY $tsMs, event_id) AS prev
        |  FROM events),
        |chg AS (
        |  SELECT event_type, event_id, ts_ms, value,
        |    CASE WHEN prev IS NULL THEN NULL
        |         WHEN value > prev THEN 1
        |         WHEN value < prev THEN -1
        |         ELSE NULL END AS c
        |  FROM ev),
        |sg AS (
        |  SELECT event_type, ts_ms, value,
        |    coalesce(last_value(c IGNORE NULLS) OVER (
        |      PARTITION BY event_type ORDER BY ts_ms, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS sgn
        |  FROM chg)
        |SELECT event_type, ts_ms // 3600000 * 3600000 AS hour_ms,
        |  count(*) AS n,
        |  CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
        |  CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_down,
        |  CAST(sum(CAST(value AS DECIMAL(18,4)) * sgn) AS DOUBLE)
        |    AS net_flow
        |FROM sg GROUP BY 1, 2
        |ORDER BY event_type, hour_ms""".stripMargin)),

    // ------------------------------------------------------------------
    // Realized volatility (quantized) — Σ r² over per-print returns,
    // per type per day. Prices quantize to exact 1e-4 integers
    // (they ARE 4-decimal), returns to ×10⁶ fixed point via integer
    // division, so the power sum is exact and order-independent —
    // the float log-return formulation would hash-diverge on both
    // the log and the accumulation order. One lag window + one
    // hash-agg, both keyed by event_type.
    QueryDef("q151_realized_vol",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // Two-phase bucketed lag (q241's backfill shape), NOT a
        // window partitioned by event_type alone — ~4 types would
        // funnel |events|/4 rows through ONE task at any SF. Each
        // bucket's first row reads its previous price from the
        // ≤256-row per-bucket boundary summary, broadcast back; all
        // other rows lag within (type, bucket) in parallel.
        val nBuckets = 256L
        val ev = events(s, dir)
          .select(col("event_type"), col("event_id"), col("ts_ms"),
            floor(col("value") * 10000 + 0.5).cast("long").as("p"))
        val Array(minT, maxT) = ev
          .agg(min(col("ts_ms")), max(col("ts_ms")))
          .head().toSeq.map(_.asInstanceOf[Long]).toArray
        val width = math.max(1L, (maxT - minT + nBuckets) / nBuckets)
        val wIn = Window.partitionBy(col("event_type"), col("bucket"))
          .orderBy(col("ts_ms"), col("event_id"))
        val rows = ev
          .withColumn("bucket",
            expr(s"(ts_ms - ${minT}L) DIV ${width}L"))
          .withColumn("pp_in", lag(col("p"), 1).over(wIn))
        val bounds = rows.groupBy(col("event_type"), col("bucket"))
          .agg(max(struct(col("ts_ms"), col("event_id"), col("p")))
            .getField("p").as("p_last"))
          .withColumn("prev_last", expr("lag(p_last, 1) OVER " +
            "(PARTITION BY event_type ORDER BY bucket)"))
          .select(col("event_type"), col("bucket"), col("prev_last"))
        rows
          .join(broadcast(bounds), Seq("event_type", "bucket"))
          .withColumn("pp", coalesce(col("pp_in"), col("prev_last")))
          .filter(col("pp").isNotNull && col("pp") =!= 0)
          // clamp at ±10× (±10⁷ fp): synthetic event values are not a
          // smooth price path, and an uncapped ratio overflows the
          // squared sum — the same winsorizing clamp every returns
          // pipeline applies before moment estimation
          .withColumn("r_fp", expr(
            "greatest(-10000000L, least(10000000L, ((p - pp) * 1000000L) div pp))"))
          .groupBy(col("event_type"),
            expr("ts_ms div 86400000").as("day"))
          .agg(count(lit(1)).as("n_returns"),
            sum(col("r_fp") * col("r_fp")).as("rv_fp2"))
          .orderBy(col("event_type"), col("day"))
      },
      Some(s"""WITH p AS (
        |  SELECT event_type, event_id, $tsMs AS ts_ms,
        |    CAST(floor(value * 10000 + 0.5) AS BIGINT) AS p,
        |    lag(CAST(floor(value * 10000 + 0.5) AS BIGINT)) OVER (
        |      PARTITION BY event_type ORDER BY $tsMs, event_id) AS pp
        |  FROM events),
        |r AS (
        |  SELECT event_type, ts_ms // 86400000 AS day,
        |    greatest(-10000000, least(10000000,
        |      ((p - pp) * 1000000) // pp)) AS r_fp
        |  FROM p WHERE pp IS NOT NULL AND pp <> 0)
        |SELECT event_type, day, count(*) AS n_returns,
        |  CAST(sum(r_fp * r_fp) AS BIGINT) AS rv_fp2
        |FROM r GROUP BY 1, 2
        |ORDER BY event_type, day""".stripMargin)),

    // ------------------------------------------------------------------
    // Maximum drawdown — the deepest peak-to-trough fall of each
    // type's price path: running max (a rows-frame window, exact on
    // quantized integers), per-row drop = peak − price, then the max
    // drop and where it bottomed. Every op is an integer comparison
    // or subtraction — no float anywhere until the final ×1e-4
    // presentation division.
    QueryDef("q152_max_drawdown",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // Two-phase bucketed running max (the q165 offset-handoff
        // shape), NOT a window partitioned by event_type alone — ~4
        // types would serialize |events|/4 rows through ONE task.
        // Running max decomposes exactly: peak(row) = max(in-bucket
        // running max, max over ALL previous buckets), and the
        // latter is a prefix max over the ≤256-row per-bucket
        // summary, broadcast back.
        val nBuckets = 256L
        val ev = events(s, dir)
          .select(col("event_type"), col("event_id"), col("ts_ms"),
            floor(col("value") * 10000 + 0.5).cast("long").as("p"))
        val Array(minT, maxT) = ev
          .agg(min(col("ts_ms")), max(col("ts_ms")))
          .head().toSeq.map(_.asInstanceOf[Long]).toArray
        val width = math.max(1L, (maxT - minT + nBuckets) / nBuckets)
        val wIn = Window.partitionBy(col("event_type"), col("bucket"))
          .orderBy(col("ts_ms"), col("event_id"))
        val rows = ev.withColumn("bucket",
          expr(s"(ts_ms - ${minT}L) DIV ${width}L"))
        val carry = rows.groupBy(col("event_type"), col("bucket"))
          .agg(max(col("p")).as("p_max"))
          .withColumn("carry_peak", max(col("p_max")).over(
            Window.partitionBy(col("event_type")).orderBy(col("bucket"))
              .rowsBetween(Window.unboundedPreceding, -1)))
          .select(col("event_type"), col("bucket"), col("carry_peak"))
        rows
          .withColumn("peak_in", max(col("p")).over(
            wIn.rowsBetween(Window.unboundedPreceding, 0)))
          .join(broadcast(carry), Seq("event_type", "bucket"))
          // greatest skips nulls: first bucket has no carry
          .withColumn("peak", greatest(col("peak_in"), col("carry_peak")))
          .withColumn("drop", col("peak") - col("p"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            (max(col("peak")).cast("double") / 10000).as("high_water"),
            (max(col("drop")).cast("double") / 10000).as("max_drawdown"),
            min_by(col("ts_ms"), struct(col("drop") * -1, col("ts_ms"),
              col("event_id"))).as("trough_ms"))
          .orderBy(col("event_type"))
      },
      Some(s"""WITH p AS (
        |  SELECT event_type, event_id, $tsMs AS ts_ms,
        |    CAST(floor(value * 10000 + 0.5) AS BIGINT) AS p
        |  FROM events),
        |dd AS (
        |  SELECT event_type, event_id, ts_ms, p,
        |    max(p) OVER (PARTITION BY event_type
        |      ORDER BY ts_ms, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - p
        |      AS dr
        |  FROM p),
        |m AS (SELECT event_type, max(dr) AS mx FROM dd GROUP BY 1)
        |SELECT dd.event_type, count(*) AS n,
        |  CAST(max(p) AS DOUBLE) / 10000 AS high_water,
        |  CAST(max(dr) AS DOUBLE) / 10000 AS max_drawdown,
        |  min(CASE WHEN dr = mx THEN ts_ms END) AS trough_ms
        |FROM dd JOIN m USING (event_type)
        |GROUP BY dd.event_type
        |ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // Truncated EWMA (α = 1/2, 16 lags) — exponential smoothing in
    // EXACT integer arithmetic: weights 2^(15−k) over the last 16
    // prints, normalized by Σ2^j = 2¹⁶−1 with one truncating div.
    // The recursive float EWMA is order-UNstable to hash (every
    // engine accumulates differently); the truncated form drops
    // weight ≤ 2⁻¹⁶ of the signal — far below the 1e-4 quantization
    // floor — and becomes a fixed dot product over a rows frame,
    // which is also the form that vectorizes on a cluster (no
    // sequential dependence, just a bounded window). Warmup rows
    // (fewer than 16 lags) renormalize by the weights actually
    // present, exactly like pandas ewm(adjust=True).
    QueryDef("q154_ewma",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // Two-phase bucketed lags (Bucketed.withTrailingCarry), NOT a
        // window partitioned by event_type alone — ~4 types would
        // funnel |events|/4 rows through ONE task at any SF. The
        // 16-tap dot product needs 15 preceding rows, so each (type,
        // bucket) partition is extended with its 15 global
        // predecessors (flagged, dropped post-window); warmup
        // renormalization is untouched because the carry provides
        // exactly the lags that globally exist.
        val lags = 16
        val nBuckets = 256L
        val base0 = events(s, dir)
          .select(col("event_type"), col("event_id"), col("ts_ms"),
            floor(col("value") * 10000 + 0.5).cast("long").as("p"))
        val Array(minT, maxT) = base0
          .agg(min(col("ts_ms")), max(col("ts_ms")))
          .head().toSeq.map(_.asInstanceOf[Long]).toArray
        val width = math.max(1L, (maxT - minT + nBuckets) / nBuckets)
        val w = Window.partitionBy(col("event_type"), col("bucket"))
          .orderBy(col("ts_ms"), col("event_id"))
        val base = Bucketed.withTrailingCarry(
          base0.withColumn("bucket",
            expr(s"(ts_ms - ${minT}L) DIV ${width}L")),
          "event_type", lags - 1)
        val num = (0 until lags).map(k =>
          coalesce(lag(col("p"), k).over(w) * (1L << (lags - 1 - k)),
            lit(0L))).reduce(_ + _)
        val den = (0 until lags).map(k =>
          when(lag(col("p"), k).over(w).isNotNull,
            lit(1L << (lags - 1 - k))).otherwise(0L)).reduce(_ + _)
        base
          .withColumn("num", num).withColumn("den", den)
          .filter(!col("is_carry"))
          .withColumn("ewma_fp", expr("num div den"))
          .select(col("event_type"), col("event_id"), col("ts_ms"),
            col("p"), col("ewma_fp"))
          .orderBy(col("event_type"), col("ts_ms"), col("event_id"))
      },
      Some(ewmaOracle)),

    // ------------------------------------------------------------------
    // TWAP — time-weighted average price per type per day:
    // Σ pᵢ·(tᵢ₊₁−tᵢ) div Σ(Δt), each print weighted by how long it
    // WAS the price (lead window gives the holding interval; the
    // day's last print carries zero weight — the standard
    // right-open convention). VWAP's time-domain sibling; exact
    // integer numerators/denominators, one truncating div.
    QueryDef("q163_twap",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("event_type"), col("day"))
          .orderBy(col("ts_ms"), col("event_id"))
        events(s, dir)
          .select(col("event_type"), col("event_id"), col("ts_ms"),
            expr("ts_ms div 86400000").as("day"),
            floor(col("value") * 10000 + 0.5).cast("long").as("p"))
          .withColumn("hold_ms",
            coalesce(lead(col("ts_ms"), 1).over(w) - col("ts_ms"), lit(0L)))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("n"),
            sum(col("hold_ms")).as("span_ms"),
            expr("sum(p * hold_ms) div sum(hold_ms)").as("twap_fp"))
          .filter(col("span_ms") > 0)
          .orderBy(col("event_type"), col("day"))
      },
      Some(s"""WITH base AS (
        |  SELECT event_type, event_id, $tsMs AS ts_ms,
        |    $tsMs // 86400000 AS day,
        |    CAST(floor(value * 10000 + 0.5) AS BIGINT) AS p
        |  FROM events),
        |h AS (
        |  SELECT event_type, day, p,
        |    coalesce(lead(ts_ms) OVER (
        |      PARTITION BY event_type, day
        |      ORDER BY ts_ms, event_id) - ts_ms, 0) AS hold_ms
        |  FROM base)
        |SELECT event_type, day, count(*) AS n,
        |  CAST(sum(hold_ms) AS BIGINT) AS span_ms,
        |  CAST(sum(p * hold_ms) AS BIGINT) // CAST(sum(hold_ms) AS BIGINT)
        |    AS twap_fp
        |FROM h GROUP BY event_type, day
        |HAVING CAST(sum(hold_ms) AS BIGINT) > 0
        |ORDER BY event_type, day""".stripMargin)),

    // ------------------------------------------------------------------
    // Order-book imbalance + microprice — the two microstructure
    // readouts traders derive from the reference's depth stream
    // beyond q23's mid/spread: imbalance = bidVolume/(bid+ask)
    // (direction pressure) and microprice = size-WEIGHTED mid
    // (ask·bidSz + bid·askSz)/(bidSz+askSz), the fair-value estimate
    // that tilts toward the thin side. Same view=bid/click=ask proxy
    // and hourly-bucket keying as q23; sizes are event counts. All
    // integer: prices quantized to ×10⁴ units via exact DECIMAL(18,4)
    // (the q65 quantization contract), imbalance in ppm, both DIVs on
    // longs. One map-side-combinable hash-agg over the event scan —
    // the same shape as q23, nothing new to shuffle at 100 TB.
    QueryDef("q238_microprice",
      (s, dir) => {
        val priceU = expr(
          "CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)")
        events(s, dir)
          .withColumn("bucket_ms", expr("ts DIV 3600000000000 * 3600000"))
          .withColumn("p_u", priceU)
          .groupBy(col("bucket_ms"), col("user_id"))
          .agg(
            max(when(col("event_type") === "view", col("p_u")))
              .as("bid_u"),
            min(when(col("event_type") === "click", col("p_u")))
              .as("ask_u"),
            sum(when(col("event_type") === "view", 1L).otherwise(0L))
              .as("n_bid"),
            sum(when(col("event_type") === "click", 1L).otherwise(0L))
              .as("n_ask"))
          .filter(col("bid_u").isNotNull && col("ask_u").isNotNull)
          .select(col("bucket_ms"), col("user_id"), col("n_bid"),
            col("n_ask"),
            expr("n_bid * 1000000 DIV (n_bid + n_ask)")
              .as("imbalance_ppm"),
            expr("(ask_u * n_bid + bid_u * n_ask) DIV (n_bid + n_ask)")
              .as("microprice_fp"))
          .orderBy(col("bucket_ms"), col("user_id"))
      },
      Some("""WITH b AS (
        |  SELECT epoch_ms(date_trunc('hour', CAST(ts AS TIMESTAMP)))
        |      AS bucket_ms,
        |    user_id,
        |    max(CASE WHEN event_type = 'view' THEN
        |      CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) END)
        |      AS bid_u,
        |    min(CASE WHEN event_type = 'click' THEN
        |      CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) END)
        |      AS ask_u,
        |    CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT)
        |      AS n_bid,
        |    CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT)
        |      AS n_ask
        |  FROM events GROUP BY 1, 2
        |  HAVING bid_u IS NOT NULL AND ask_u IS NOT NULL)
        |SELECT bucket_ms, user_id, n_bid, n_ask,
        |  n_bid * 1000000 // (n_bid + n_ask) AS imbalance_ppm,
        |  (ask_u * n_bid + bid_u * n_ask) // (n_bid + n_ask)
        |    AS microprice_fp
        |FROM b ORDER BY bucket_ms, user_id""".stripMargin)),

    // ------------------------------------------------------------------
    // Global interval-containment join — "how many error bursts were
    // LIVE when each purchase happened?" — the point-in-interval join
    // with NO shared key at all (q21 has an equi key beside its range;
    // the as-of family matches one nearest row, not all containers;
    // q102 is this family's interval×interval sibling and needs the
    // first-overlap-bin single-emission trick — a POINT sits in
    // exactly one cell, so this variant needs no dedup at all).
    // Intervals are per-user error bursts (10-minute-gap runs of
    // error events, the sessionize contract); points are purchase
    // events; a pair matches when burst_start ≤ ts ≤ burst_end.
    //
    // Scale shape — the MANUFACTURED-equi-key pattern Spark needs to
    // avoid a cartesian range join: carve the time axis into 1-hour
    // cells, explode each interval to the cells it touches (cells/
    // interval = duration/1 h + 1 — bounded by the burst gap rule),
    // key each point by its single containing cell, and equi-join on
    // the cell before the exact containment filter. Every matched
    // pair shares EXACTLY the point's cell, so no pair dedup is ever
    // needed (the classic double-count trap of interval-interval
    // cell joins doesn't arise for point-in-interval). At 100 TB the
    // join is an ordinary shuffled equi join on a well-distributed
    // key; the oracle runs the O(n·m) range-predicate join directly,
    // so the hash match PROVES the cell decomposition lossless.
    QueryDef("q250_interval_join",
      (s, dir) => {
        val cellMs = 3600000L
        val ev = events(s, dir)
        val gap = 600000L
        val wU = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_ms"), col("event_id"))
        val bursts = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts_ms"), col("event_id"))
          .withColumn("new_b", when(col("ts_ms") - lag(col("ts_ms"), 1)
            .over(wU) >= gap || lag(col("ts_ms"), 1).over(wU).isNull, 1L)
            .otherwise(0L))
          .withColumn("bid", sum(col("new_b")).over(
            wU.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("bid"))
          .agg(min(col("ts_ms")).as("b_start"), max(col("ts_ms")).as("b_end"))
        val burstCells = bursts
          .withColumn("cell", explode(sequence(
            expr(s"b_start DIV ${cellMs}L"), expr(s"b_end DIV ${cellMs}L"))))
          .select(col("cell"), col("b_start"), col("b_end"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("ts_ms"),
            expr(s"ts_ms DIV ${cellMs}L").as("cell"),
            expr("ts_ms DIV 86400000").as("day"))
        val live = purchases.join(burstCells, Seq("cell"))
          .filter(col("b_start") <= col("ts_ms") &&
            col("ts_ms") <= col("b_end"))
          .groupBy(col("event_id"), col("day"))
          .agg(count(lit(1)).as("n_live"))
        purchases.join(live, Seq("event_id", "day"), "left")
          .withColumn("n_live", coalesce(col("n_live"), lit(0L)))
          .groupBy(col("day"))
          .agg(count(lit(1)).as("n_purchases"),
            sum(when(col("n_live") > 0, 1L).otherwise(0L)).as("n_exposed"),
            sum(col("n_live")).as("sum_live"),
            max(col("n_live")).as("max_live"))
          .withColumn("mean_live_milli",
            expr("sum_live * 1000 DIV n_purchases"))
          .orderBy(col("day"))
      },
      Some(s"""WITH ev AS (
        |  SELECT event_id, user_id, event_type, $tsMs AS ts_ms
        |  FROM events),
        |err AS (
        |  SELECT user_id, ts_ms, event_id,
        |    CASE WHEN lag(ts_ms) OVER w IS NULL
        |      OR ts_ms - lag(ts_ms) OVER w >= 600000 THEN 1 ELSE 0 END
        |      AS new_b
        |  FROM ev WHERE event_type = 'error'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
        |bursts AS (
        |  SELECT user_id, bid, min(ts_ms) AS b_start, max(ts_ms) AS b_end
        |  FROM (SELECT user_id, ts_ms,
        |          sum(new_b) OVER (PARTITION BY user_id
        |            ORDER BY ts_ms, event_id
        |            ROWS UNBOUNDED PRECEDING) AS bid
        |        FROM err)
        |  GROUP BY 1, 2),
        |pur AS (
        |  SELECT event_id, ts_ms, ts_ms // 86400000 AS day
        |  FROM ev WHERE event_type = 'purchase'),
        |live AS (
        |  SELECT p.event_id, p.day, count(*) AS n_live
        |  FROM pur p JOIN bursts b
        |    ON b.b_start <= p.ts_ms AND p.ts_ms <= b.b_end
        |  GROUP BY 1, 2)
        |SELECT p.day, CAST(count(*) AS BIGINT) AS n_purchases,
        |  CAST(coalesce(sum(CASE WHEN l.n_live > 0 THEN 1 END), 0)
        |    AS BIGINT) AS n_exposed,
        |  CAST(coalesce(sum(l.n_live), 0) AS BIGINT) AS sum_live,
        |  CAST(coalesce(max(l.n_live), 0) AS BIGINT) AS max_live,
        |  CAST(coalesce(sum(l.n_live), 0) * 1000 // count(*) AS BIGINT)
        |    AS mean_live_milli
        |FROM pur p LEFT JOIN live l
        |  ON l.event_id = p.event_id AND l.day = p.day
        |GROUP BY 1 ORDER BY p.day""".stripMargin))
  )

  /** q154's oracle — 16 explicit lag terms, built programmatically. */
  private lazy val ewmaOracle: String = {
    val lagTerms = (0 until 16).map { k =>
      val wgt = 1L << (15 - k)
      s"coalesce(lag(p, $k) OVER win * $wgt, 0)"
    }.mkString(" + ")
    val denTerms = (0 until 16).map { k =>
      val wgt = 1L << (15 - k)
      s"(CASE WHEN lag(p, $k) OVER win IS NOT NULL THEN $wgt ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH base AS (
       |  SELECT event_type, event_id, $tsMs AS ts_ms,
       |    CAST(floor(value * 10000 + 0.5) AS BIGINT) AS p
       |  FROM events)
       |SELECT event_type, event_id, ts_ms, p,
       |  ($lagTerms) // ($denTerms) AS ewma_fp
       |FROM base
       |WINDOW win AS (PARTITION BY event_type ORDER BY ts_ms, event_id)
       |ORDER BY event_type, ts_ms, event_id""".stripMargin
  }
}
