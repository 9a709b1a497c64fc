package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Q._

/** Batch forms of the streaming time semantics (SURVEY.md §2.9 T3):
  * sliding windows and gap-based sessionization, expressed so the
  * DuckDB oracle can replicate them exactly (epoch-ms bucket
  * arithmetic rather than engine window() structs).
  */
object TemporalOps {

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // T3 — sliding window (2h length, 1h slide): each event lands in
    // exactly two hourly-aligned buckets; explode the two offsets and
    // hash-aggregate. Same shape Spark's window(ts, "2 hours",
    // "1 hour") produces, stated as bucket arithmetic.
    QueryDef("q53_sliding_window",
      (s, dir) => events(s, dir)
        .select(col("event_type"), col("value"),
          expr("ts DIV 3600000000000").as("hour_idx"))
        .withColumn("k", explode(sequence(lit(0), lit(1))))
        .withColumn("win_start_ms", (col("hour_idx") - col("k")) * 3600000L)
        .filter(col("win_start_ms") >= 0)
        .groupBy(col("win_start_ms"), col("event_type"))
        .agg(count(lit(1)).as("n"), d(sum(dec(col("value")))).as("sum_value"))
        .orderBy(col("win_start_ms"), col("event_type")),
      Some("""SELECT (hour_idx - k) * 3600000 AS win_start_ms, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM (SELECT event_type, value,
        |        epoch_ms(CAST(ts AS TIMESTAMP)) // 3600000 AS hour_idx
        |      FROM events),
        |     (SELECT unnest(range(2)) AS k)
        |WHERE (hour_idx - k) * 3600000 >= 0
        |GROUP BY 1, 2
        |ORDER BY win_start_ms, event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // T3 — gap-based sessionization (the batch form of
    // session_window): a >30-minute silence starts a new session;
    // sessions numbered by a running sum of boundary flags. Classic
    // islands: two window passes over one (user) partitioning — a
    // single shuffle. Gaps compared in integer epoch-µs on BOTH
    // engines (DuckDB reads the TIMESTAMP(NANOS) column at µs
    // precision, so ns-side comparison could flip on a boundary);
    // session_id cast to BIGINT to match DuckDB's HUGEINT sum.
    QueryDef("q54_sessionize",
      (s, dir) => {
        val wOrd = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
        val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events(s, dir)
          .select(col("user_id"), expr("ts DIV 1000").as("ts_us"),
            col("ts_ms"), col("event_id"))
          .withColumn("new_session",
            when(col("ts_us") - lag(col("ts_us"), 1).over(wOrd)
              > 1800L * 1000000L, 1L)
              .otherwise(when(lag(col("ts_us"), 1).over(wOrd).isNull, 1L)
                .otherwise(0L)))
          .withColumn("session_id", sum(col("new_session")).over(wRun))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            min(col("ts_ms")).as("start_ms"),
            max(col("ts_ms")).as("end_ms"))
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""WITH base AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms, event_id
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, ts_us, ts_ms, event_id,
        |    CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
        |         WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
        |         ELSE 0 END AS new_session
        |  FROM base
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |numbered AS (
        |  SELECT user_id, ts_ms,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts_ms) AS start_ms, max(ts_ms) AS end_ms
        |FROM numbered
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin)),

    // ------------------------------------------------------------------
    // Rolling-window anomaly detection — flag values more than 3
    // rolling standard deviations from the trailing-100-event mean,
    // per event type: the streaming-shaped QC that q87's static 3σ
    // can't do (a regime change poisons a global mean; a trailing
    // window adapts). The entire test is EXACT INTEGER arithmetic:
    // values quantize to 1e-4 units (v), the window keeps Σv and Σv²
    // (both bounded: 100·(4.9e6)² < 2^53 ≪ 2^63), and
    //   (v-μ)² > 9σ²  ⟺  (n·v − S1)² > 9·(n·S2 − S1²)
    // clears every denominator — no float mean, no float variance,
    // no accumulation-order dependence on either engine. One window
    // shuffle keyed by event_type; full (n=100) windows only, so the
    // flag never fires on cold start noise.
    QueryDef("q114_rolling_outliers",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // Two-phase bucketed trailing window (Bucketed.withTrailingCarry),
        // NOT a window partitioned by event_type alone: ~4 types would
        // funnel |events|/4 rows through ONE task at any SF. The
        // trailing-100 frame crosses bucket edges, so each (type,
        // bucket) partition is extended with the 100 globally
        // preceding rows (flagged, dropped post-window) — bounded
        // carry, bucket-parallel window, identical frames.
        val nBuckets = 256L
        val ev = events(s, dir)
          .select(col("event_type"), col("event_id"), col("ts_ms"),
            round(col("value") * 10000).cast("long").as("v"))
        val Array(minT, maxT) = ev
          .agg(min(col("ts_ms")), max(col("ts_ms")))
          .head().toSeq.map(_.asInstanceOf[Long]).toArray
        val width = math.max(1L, (maxT - minT + nBuckets) / nBuckets)
        val w = Window.partitionBy(col("event_type"), col("bucket"))
          .orderBy(col("ts_ms"), col("event_id"))
          .rowsBetween(-100, -1)
        Bucketed.withTrailingCarry(
            ev.withColumn("bucket",
              expr(s"(ts_ms - ${minT}L) DIV ${width}L")),
            "event_type", 100)
          .withColumn("n", count(lit(1)).over(w))
          .withColumn("s1", sum(col("v")).over(w))
          .withColumn("s2", sum(col("v") * col("v")).over(w))
          .filter(!col("is_carry") && col("n") === 100)
          .withColumn("dev", col("n") * col("v") - col("s1"))
          .withColumn("var_n2", col("n") * col("s2") - col("s1") * col("s1"))
          .filter(col("dev") * col("dev") > lit(9L) * col("var_n2"))
          .select(col("event_type"), col("event_id"), col("ts_ms"),
            (col("v").cast("double") / 10000).as("value"),
            col("s1"), col("s2"))
          .orderBy(col("event_type"), col("ts_ms"), col("event_id"))
      },
      Some(s"""WITH q AS (
        |  SELECT event_type, event_id, $tsMs AS ts_ms,
        |    CAST(round(value * 10000) AS BIGINT) AS v
        |  FROM events),
        |r AS (
        |  SELECT event_type, event_id, ts_ms, v,
        |    count(*) OVER w AS n,
        |    CAST(sum(v) OVER w AS BIGINT) AS s1,
        |    CAST(sum(v * v) OVER w AS BIGINT) AS s2
        |  FROM q
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts_ms, event_id
        |    ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, event_id, ts_ms,
        |  CAST(v AS DOUBLE) / 10000 AS value, s1, s2
        |FROM r
        |WHERE n = 100
        |  AND (n * v - s1) * (n * v - s1) > 9 * (n * s2 - s1 * s1)
        |ORDER BY event_type, ts_ms, event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // Equi-depth discretization — ntile(10) per event type over a
    // TOTAL deterministic order (value, event_id): the binning step
    // feature pipelines run before bucketed histograms, monotonic
    // features, or drift baselines (q107's fixed-width cousin).
    // ntile's floor-based split is engine-identical given the same
    // total order, so bin edges (min/max per bin) hash-match the
    // oracle exactly. One window shuffle keyed by event_type — at
    // scale the skew knob is the same salting q89 diagnoses, and
    // the approximate path is q56's KLL quantiles.
    QueryDef("q119_equidepth_bins",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // Two-phase bucketed rank (the q95 global-index shape), NOT
        // ntile over a window partitioned by event_type alone — ~4
        // types would sort |events|/4 rows in ONE task at any SF.
        // VALUE-range buckets (monotone in the sort key, equal values
        // pinned to one bucket) keep in-bucket (value, event_id) order
        // composing to the per-type total order; the global rank is
        // in-bucket row_number + a cumsum offset over the ≤256-row
        // summary, and ntile's floor split is then pure arithmetic on
        // (rank, n): tiles 1..(n mod 10) get ⌈n/10⌉ rows, the rest
        // ⌊n/10⌋ — the exact ntile contract both engines implement.
        val nBuckets = 256
        val ev = events(s, dir)
        val Array(vmin, vmax) = ev.agg(min(col("value")), max(col("value")))
          .head().toSeq.map(_.asInstanceOf[Double]).toArray
        val width =
          if (vmax > vmin) (vmax - vmin) / nBuckets else 1.0
        val wIn = Window.partitionBy(col("event_type"), col("bucket"))
          .orderBy(col("value"), col("event_id"))
        val wOff = Window.partitionBy(col("event_type"))
          .orderBy(col("bucket"))
        val rows = ev.withColumn("bucket",
          least(floor((col("value") - lit(vmin)) / lit(width)),
            lit(nBuckets - 1L)).cast("long"))
        val offs = rows.groupBy(col("event_type"), col("bucket"))
          .agg(count(lit(1)).as("c"))
          .withColumn("offset",
            coalesce(sum(col("c")).over(
              wOff.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .withColumn("n_tot", sum(col("c")).over(
            wOff.rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)))
          .select(col("event_type"), col("bucket"), col("offset"),
            col("n_tot"))
        rows
          .withColumn("rk_in", row_number().over(wIn))
          .join(broadcast(offs), Seq("event_type", "bucket"))
          .withColumn("rk", col("offset") + col("rk_in"))
          .withColumn("bin", expr(
            """CASE WHEN rk <= (n_tot DIV 10 + 1) * (n_tot % 10)
              |  THEN (rk - 1) DIV (n_tot DIV 10 + 1) + 1
              |  ELSE n_tot % 10 +
              |    (rk - 1 - (n_tot DIV 10 + 1) * (n_tot % 10))
              |      DIV greatest(n_tot DIV 10, 1L) + 1
              |END""".stripMargin))
          .groupBy(col("event_type"), col("bin"))
          .agg(count(lit(1)).as("n"),
            min(col("value")).as("lo"), max(col("value")).as("hi"),
            d(sum(dec(col("value")))).as("sum_value"))
          .orderBy(col("event_type"), col("bin"))
      },
      Some(s"""WITH b AS (
        |  SELECT event_type, event_id, value,
        |    ntile(10) OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS bin
        |  FROM events)
        |SELECT event_type, CAST(bin AS BIGINT) AS bin, count(*) AS n,
        |  min(value) AS lo, max(value) AS hi,
        |  ${sumDec("value")} AS sum_value
        |FROM b GROUP BY event_type, bin
        |ORDER BY event_type, bin""".stripMargin)),

    // ------------------------------------------------------------------
    // Winsorized robust statistics — clamp each event type's values
    // at its own [p5, p95] before the mean, the standard tail-taming
    // step before any scale-sensitive aggregate (and q87's 3σ rule
    // recomputed on a basis outliers can't poison). Percentiles are
    // LOWER-RANK selections at integer positions ((n−1)·q div 100 + 1
    // over the total (value, event_id) order), not interpolated — so
    // the bounds are actual data values both engines pick
    // identically, and the clipped DECIMAL sum is exact. One window
    // shuffle + one hash-agg, bounds joined back by event type.
    QueryDef("q132_winsorized_stats",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("value"), col("event_id"))
        val wn = Window.partitionBy(col("event_type"))
        val ranked = events(s, dir)
          .select(col("event_type"), col("event_id"), col("value"))
          .withColumn("rk", row_number().over(w))
          .withColumn("n", count(lit(1)).over(wn))
        val bounds = ranked.groupBy(col("event_type"))
          .agg(
            min(when(col("rk") === expr("((n - 1) * 5) div 100 + 1"),
              col("value"))).as("p05"),
            min(when(col("rk") === expr("((n - 1) * 95) div 100 + 1"),
              col("value"))).as("p95"))
        ranked.join(bounds, "event_type")
          .withColumn("clip", least(greatest(col("value"), col("p05")),
            col("p95")))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            first(col("p05")).as("p05"), first(col("p95")).as("p95"),
            count(when(col("value") < col("p05"), 1)).as("n_clipped_low"),
            count(when(col("value") > col("p95"), 1)).as("n_clipped_high"),
            (d(sum(dec(col("clip")))) / count(lit(1))).as("wmean"))
          .orderBy(col("event_type"))
      },
      Some("""WITH r AS (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS rk,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events),
        |b AS (
        |  SELECT event_type,
        |    min(CASE WHEN rk = ((n - 1) * 5) // 100 + 1 THEN value END)
        |      AS p05,
        |    min(CASE WHEN rk = ((n - 1) * 95) // 100 + 1 THEN value END)
        |      AS p95
        |  FROM r GROUP BY event_type)
        |SELECT r.event_type, count(*) AS n, b.p05, b.p95,
        |  CAST(count(CASE WHEN value < p05 THEN 1 END) AS BIGINT)
        |    AS n_clipped_low,
        |  CAST(count(CASE WHEN value > p95 THEN 1 END) AS BIGINT)
        |    AS n_clipped_high,
        |  CAST(sum(CAST(least(greatest(value, p05), p95)
        |    AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS wmean
        |FROM r JOIN b USING (event_type)
        |GROUP BY r.event_type, b.p05, b.p95
        |ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // Salted two-phase aggregation — the skew-mitigation pattern
    // (q89 diagnoses it, SkewSpec proves the join variant) as a
    // first-class catalog query with an equality oracle: phase 1
    // aggregates on (key, salt = event_id % 8) so one hot key spreads
    // over 8 reducers, phase 2 merges the 8 partials per key. The
    // result is EXACTLY the plain per-key aggregate (count and
    // DECIMAL sums are associative), which is what the oracle
    // computes directly — the query proves the rewrite is free.
    QueryDef("q138_salted_agg",
      (s, dir) => {
        events(s, dir)
          .groupBy(col("event_type"), (col("event_id") % 8).as("salt"))
          .agg(count(lit(1)).as("pn"), sum(dec(col("value"))).as("psum"))
          .groupBy(col("event_type"))
          .agg(sum(col("pn")).as("n"), d(sum(col("psum"))).as("sum_value"))
          .orderBy(col("event_type"))
      },
      Some(s"""SELECT event_type, count(*) AS n,
        |  ${sumDec("value")} AS sum_value
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // Event-transition matrix — first-order Markov counts over each
    // user's event sequence (the session-flow model behind funnel
    // design and anomalous-sequence detection). One window `lead`
    // per user over the total (ts, event_id) order, one hash-agg on
    // the (from, to) pair, transition probability in ×10⁶ fixed
    // point against the from-state total.
    QueryDef("q139_transition_matrix",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_ms"), col("event_id"))
        val pairs = events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts_ms"),
            col("event_type"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("from_type"),
            col("next_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
        val fromTot = pairs.groupBy(col("from_type"))
          .agg(sum(col("n")).as("n_from"))
        pairs.join(fromTot, "from_type")
          .select(col("from_type"), col("to_type"), col("n"),
            expr("(n * 1000000L) div n_from").as("p_fp"))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some(s"""WITH seq AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY $tsMs, event_id) AS next_type
        |  FROM events),
        |p AS (
        |  SELECT event_type AS from_type, next_type AS to_type,
        |    count(*) AS n
        |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |ft AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
        |  FROM p GROUP BY 1)
        |SELECT p.from_type, p.to_type, p.n,
        |  (p.n * 1000000) // ft.n_from AS p_fp
        |FROM p JOIN ft USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin)),

    // ------------------------------------------------------------------
    // Multi-step ordered funnel — view → click → purchase in strict
    // event-time order per user (q83's 2-step conditional-window
    // generalized to k steps). Each stage is a conditional min over
    // the user's events AT OR AFTER the previous stage's timestamp:
    // three column-pruned passes with one user-keyed hash-agg each,
    // never a self-join (pair explosion on active users is the
    // classic funnel trap). Ties at the same ms resolve by event_id
    // order — the same total order every funnel query here uses.
    QueryDef("q140_multistep_funnel",
      (s, dir) => {
        val ev = events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts_ms"))
          // three conditional passes over the same pruned projection
          .localCheckpoint(false)
        val s1 = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts_ms")).as("t1"))
        val s2 = ev.filter(col("event_type") === "click")
          .join(s1, "user_id")
          .filter(col("ts_ms") >= col("t1"))
          .groupBy(col("user_id")).agg(min(col("ts_ms")).as("t2"))
        val s3 = ev.filter(col("event_type") === "purchase")
          .join(s2, "user_id")
          .filter(col("ts_ms") >= col("t2"))
          .groupBy(col("user_id")).agg(min(col("ts_ms")).as("t3"))
        val counts = Seq(("1_view", s1), ("2_view_click", s2),
          ("3_view_click_purchase", s3)).map { case (label, df) =>
          df.agg(count(lit(1)).as("n_users"))
            .select(lit(label).as("stage"), col("n_users"))
        }
        counts.reduce(_ unionAll _).orderBy(col("stage"))
      },
      Some(s"""WITH ev AS (
        |  SELECT user_id, event_type, $tsMs AS ts_ms FROM events),
        |s1 AS (
        |  SELECT user_id, min(ts_ms) AS t1 FROM ev
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT ev.user_id, min(ts_ms) AS t2
        |  FROM ev JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND ts_ms >= t1
        |  GROUP BY ev.user_id),
        |s3 AS (
        |  SELECT ev.user_id, min(ts_ms) AS t3
        |  FROM ev JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND ts_ms >= t2
        |  GROUP BY ev.user_id)
        |SELECT stage, n_users FROM (
        |  SELECT '1_view' AS stage, count(*) AS n_users FROM s1
        |  UNION ALL
        |  SELECT '2_view_click', count(*) FROM s2
        |  UNION ALL
        |  SELECT '3_view_click_purchase', count(*) FROM s3)
        |ORDER BY stage""".stripMargin)),

    // ------------------------------------------------------------------
    // Cross-series correlation matrix — pairwise Pearson between
    // event types' HOURLY COUNT series (the co-movement diagnostic
    // behind metric dashboards and anomaly root-causing). Counts are
    // integers, so every power sum (Σx, Σy, Σxy, Σx², Σy²) is exact
    // and order-independent — the same trick as q65's exact moments —
    // and the only float work is the final (nΣxy−ΣxΣy) /
    // (sqrt(·)·sqrt(·)) on identical operands. Hours where either
    // series is absent are excluded (pairwise-present semantics,
    // stated in the join); zero-variance pairs are filtered on the
    // INTEGER radicand, so no engine ever divides by zero. Shape:
    // one hash-agg to hourly counts (tiny: types × hours), one
    // self-join on hour, one pair agg.
    QueryDef("q142_type_correlation",
      (s, dir) => {
        val h = events(s, dir)
          .groupBy(col("event_type"), expr("ts_ms div 3600000").as("hour"))
          .agg(count(lit(1)).as("n"))
        val pairs = h.as("a").join(h.as("b"),
            col("a.hour") === col("b.hour")
              && col("a.event_type") < col("b.event_type"))
          .select(col("a.event_type").as("ta"), col("b.event_type").as("tb"),
            col("a.n").as("x"), col("b.n").as("y"))
        pairs.groupBy(col("ta"), col("tb"))
          .agg(count(lit(1)).as("np"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
          .filter(col("np") * col("sxx") - col("sx") * col("sx") > 0 &&
            col("np") * col("syy") - col("sy") * col("sy") > 0)
          .select(col("ta"), col("tb"), col("np").as("n_hours"),
            ((col("np") * col("sxy") - col("sx") * col("sy")).cast("double")
              / (sqrt((col("np") * col("sxx") - col("sx") * col("sx"))
                  .cast("double"))
                * sqrt((col("np") * col("syy") - col("sy") * col("sy"))
                  .cast("double")))).as("corr"))
          .orderBy(col("ta"), col("tb"))
      },
      Some(s"""WITH h AS (
        |  SELECT event_type, $tsMs // 3600000 AS hour, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb,
        |    a.n AS x, b.n AS y
        |  FROM h a JOIN h b
        |    ON a.hour = b.hour AND a.event_type < b.event_type),
        |agg AS (
        |  SELECT ta, tb, count(*) AS np,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM p GROUP BY ta, tb)
        |SELECT ta, tb, np AS n_hours,
        |  CAST(np * sxy - sx * sy AS DOUBLE)
        |    / (sqrt(CAST(np * sxx - sx * sx AS DOUBLE))
        |       * sqrt(CAST(np * syy - sy * sy AS DOUBLE))) AS corr
        |FROM agg
        |WHERE np * sxx - sx * sx > 0 AND np * syy - sy * sy > 0
        |ORDER BY ta, tb""".stripMargin)),

    // ------------------------------------------------------------------
    // Least-squares trend per series — the slope of value over time
    // per event type (metric drift direction, the regression sibling
    // of q107's distribution drift). Same exact-power-sum discipline
    // as q142: x is HOURS SINCE THE SERIES START (two-pass min join —
    // raw epoch-ms x² sums would overflow long), y is the ×10⁴
    // quantized value, all five sums exact integers, slope =
    // (nΣxy−ΣxΣy)/(nΣx²−(Σx)²) as one double division at the end
    // (per-hour slope in 1e-4 value units).
    QueryDef("q143_trend_slope",
      (s, dir) => {
        val ev = events(s, dir)
          .select(col("event_type"), col("ts_ms"),
            floor(col("value") * 10000 + 0.5).cast("long").as("y"))
        val m = ev.groupBy(col("event_type")).agg(min(col("ts_ms")).as("t0"))
        ev.join(m, "event_type")
          .withColumn("x", expr("(ts_ms - t0) div 3600000"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .filter(col("n") * col("sxx") - col("sx") * col("sx") > 0)
          .select(col("event_type"), col("n"),
            ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
              / (col("n") * col("sxx") - col("sx") * col("sx"))
                .cast("double")).as("slope_fp_per_hour"))
          .orderBy(col("event_type"))
      },
      Some(s"""WITH ev AS (
        |  SELECT event_type, $tsMs AS ts_ms,
        |    CAST(floor(value * 10000 + 0.5) AS BIGINT) AS y
        |  FROM events),
        |m AS (SELECT event_type, min(ts_ms) AS t0 FROM ev GROUP BY 1),
        |x AS (
        |  SELECT ev.event_type, (ev.ts_ms - m.t0) // 3600000 AS x, y
        |  FROM ev JOIN m USING (event_type)),
        |agg AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM x GROUP BY event_type)
        |SELECT event_type, n,
        |  CAST(n * sxy - sx * sy AS DOUBLE)
        |    / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_fp_per_hour
        |FROM agg WHERE n * sxx - sx * sx > 0
        |ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // EXACT rolling 7-day distinct users (q93's sketch path, made
    // exact): each (user, active-day) pair is EXPLODED into the ≤7
    // trailing windows it belongs to — the explode factor is the
    // window length (a bounded constant), so the shape is
    // distinct → bounded explode → distinct → hash-agg, with no
    // range self-join and nothing quadratic. This is the exact
    // complement: q93 unions per-day HLL sketches when the distinct
    // sets are too large to rescan; this form IS the rescan, correct
    // to the row. Only windows fully inside the observed day span
    // are emitted (the same guard q93 applies).
    QueryDef("q148_rolling_distinct_exact",
      (s, dir) => {
        // checkpointed: the day-span action below and the main explode
        // would otherwise each re-run the event scan + distinct shuffle
        val days = events(s, dir)
          .select(col("user_id"), expr("ts_ms div 86400000").as("day"))
          .distinct()
          .localCheckpoint(false)
        val Array(minD, maxD) = days.agg(min(col("day")), max(col("day")))
          .head().toSeq.map(_.asInstanceOf[Long]).toArray
        days
          .select(col("user_id"),
            explode(sequence(col("day"), col("day") + 6)).as("win_end"))
          .filter(col("win_end") >= minD + 6 && col("win_end") <= maxD)
          .distinct()
          .groupBy(col("win_end"))
          .agg(count(lit(1)).as("n_distinct_users"))
          .orderBy(col("win_end"))
      },
      Some(s"""WITH days AS (
        |  SELECT DISTINCT user_id, $tsMs // 86400000 AS day FROM events),
        |span AS (SELECT min(day) AS mn, max(day) AS mx FROM days),
        |ex AS (
        |  SELECT DISTINCT user_id, day + o AS win_end
        |  FROM days, (SELECT unnest(range(7)) AS o))
        |SELECT win_end, count(*) AS n_distinct_users
        |FROM ex, span
        |WHERE win_end >= mn + 6 AND win_end <= mx
        |GROUP BY win_end ORDER BY win_end""".stripMargin)),

    // ------------------------------------------------------------------
    // Survival curve (time-to-conversion) — for each signed-up user,
    // days from first signup to first subsequent purchase; for each
    // horizon d ∈ [0, 13], the fraction still unconverted (the
    // Kaplan-Meier shape without censoring corrections — every user
    // here is observed over the full span, so the empirical curve IS
    // the estimator). Durations are integer day counts; the curve is
    // one bounded 14-way explode + hash-agg (no per-day rescan), and
    // survival fractions are ×10⁶ integer ratios.
    QueryDef("q159_survival",
      (s, dir) => {
        val ev = events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts_ms"))
        val s0 = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts_ms")).as("t0"))
        val conv = ev.filter(col("event_type") === "purchase")
          .join(s0, "user_id")
          .filter(col("ts_ms") >= col("t0"))
          .groupBy(col("user_id")).agg(min(col("ts_ms")).as("t1"))
        val n = s0.count()
        val durations = s0.join(conv, Seq("user_id"), "left")
          .select(expr("(t1 - t0) div 86400000").as("dur_days"))
        durations
          // sequence(start, stop) DESCENDS when start > stop — filter
          // the unconverted/late rows out instead of relying on an
          // empty range
          .filter(col("dur_days").isNotNull && col("dur_days") <= 13)
          .select(explode(sequence(col("dur_days"), lit(13L))).as("d"))
          .groupBy(col("d")).agg(count(lit(1)).as("n_converted"))
          // the explode emits a row for every horizon ≥ duration, so
          // per-horizon counts are already cumulative
          .select(col("d"), lit(n).as("n_signups"), col("n_converted"),
            expr(s"((${n}L - n_converted) * 1000000L) div ${n}L")
              .as("surv_fp"))
          .orderBy(col("d"))
      },
      Some(s"""WITH ev AS (
        |  SELECT user_id, event_type, $tsMs AS ts_ms FROM events),
        |s0 AS (
        |  SELECT user_id, min(ts_ms) AS t0 FROM ev
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |conv AS (
        |  SELECT ev.user_id, min(ts_ms) AS t1
        |  FROM ev JOIN s0 USING (user_id)
        |  WHERE event_type = 'purchase' AND ts_ms >= t0
        |  GROUP BY ev.user_id),
        |nn AS (SELECT count(*) AS n FROM s0),
        |dur AS (
        |  SELECT s0.user_id, (t1 - t0) // 86400000 AS dur_days
        |  FROM s0 LEFT JOIN conv USING (user_id)),
        |curve AS (
        |  SELECT d, count(*) AS n_converted
        |  FROM dur, (SELECT unnest(range(14)) AS d)
        |  WHERE dur_days IS NOT NULL AND dur_days <= d
        |  GROUP BY d)
        |SELECT d, (SELECT n FROM nn) AS n_signups, n_converted,
        |  (((SELECT n FROM nn) - n_converted) * 1000000)
        |    // (SELECT n FROM nn) AS surv_fp
        |FROM curve ORDER BY d""".stripMargin)),

    // ------------------------------------------------------------------
    // Hour-of-week seasonality profile — the 168-slot traffic
    // template (capacity planning, anomaly baselines), with peaks
    // flagged where a slot runs ≥1.5× the mean slot load. The
    // comparison is the integer cross product 2·n·S > 3·total (no
    // division), day-of-week from epoch arithmetic ((days+4) mod 7 —
    // epoch day 0 was a Thursday) so no calendar/timezone functions
    // diverge between engines.
    QueryDef("q160_seasonality",
      (s, dir) => {
        val ev = events(s, dir)
          .select(expr("((ts_ms div 86400000 + 4) % 7)").as("dow"),
            expr("(ts_ms div 3600000) % 24").as("hour"))
        // 168-row table checkpointed so the totals action and the main
        // projection share one event scan
        val slots = ev.groupBy(col("dow"), col("hour"))
          .agg(count(lit(1)).as("n"))
          .localCheckpoint(false)
        val Array(tot, nslots) = slots
          .agg(sum(col("n")), count(lit(1))).head().toSeq
          .map(_.asInstanceOf[Long]).toArray
        slots
          .withColumn("is_peak",
            (col("n") * 2 * nslots > lit(3L) * tot).cast("long"))
          .orderBy(col("dow"), col("hour"))
      },
      Some(s"""WITH sl AS (
        |  SELECT (($tsMs // 86400000 + 4) % 7) AS dow,
        |    (($tsMs // 3600000) % 24) AS hour, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |tt AS (SELECT CAST(sum(n) AS BIGINT) AS tot,
        |  count(*) AS nslots FROM sl)
        |SELECT dow, hour, n,
        |  CAST(CASE WHEN n * 2 * nslots > 3 * tot THEN 1 ELSE 0 END
        |    AS BIGINT) AS is_peak
        |FROM sl, tt ORDER BY dow, hour""".stripMargin)),

    // ------------------------------------------------------------------
    // Conversion-latency percentiles — p50/p90 of the signup→first-
    // purchase delay (q159's durations, summarized the way an SLA
    // dashboard needs them). Percentiles are q132's integer
    // lower-rank selections over the total (latency, user) order —
    // actual observed latencies, engine-identical — plus the exact
    // DECIMAL-free integer mean.
    QueryDef("q162_conversion_latency",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts_ms"))
        val s0 = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts_ms")).as("t0"))
        val lat = ev.filter(col("event_type") === "purchase")
          .join(s0, "user_id")
          .filter(col("ts_ms") >= col("t0"))
          .groupBy(col("user_id")).agg((min(col("ts_ms")) - first(col("t0")))
            .as("latency_ms"))
        val w = Window.orderBy(col("latency_ms"), col("user_id"))
        val wn = Window.partitionBy(lit(1))
        // single-group output: the ranked set is one global window,
        // acceptable because the CONVERTED-user set is orders smaller
        // than the event table (the same justification as q95's
        // 1-row aggregates); per-segment variants partition it
        lat
          .withColumn("rk", row_number().over(w))
          .withColumn("n", count(lit(1)).over(wn))
          .groupBy()
          .agg(count(lit(1)).as("n_converted"),
            min(when(col("rk") === expr("((n - 1) * 50) div 100 + 1"),
              col("latency_ms"))).as("p50_ms"),
            min(when(col("rk") === expr("((n - 1) * 90) div 100 + 1"),
              col("latency_ms"))).as("p90_ms"),
            expr("sum(latency_ms) div count(1)").as("mean_ms"))
      },
      Some(s"""WITH ev AS (
        |  SELECT user_id, event_type, $tsMs AS ts_ms FROM events),
        |s0 AS (
        |  SELECT user_id, min(ts_ms) AS t0 FROM ev
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |lat AS (
        |  SELECT ev.user_id, min(ts_ms) - min(t0) AS latency_ms
        |  FROM ev JOIN s0 USING (user_id)
        |  WHERE event_type = 'purchase' AND ts_ms >= t0
        |  GROUP BY ev.user_id),
        |r AS (
        |  SELECT latency_ms,
        |    row_number() OVER (ORDER BY latency_ms, user_id) AS rk,
        |    count(*) OVER () AS n
        |  FROM lat)
        |SELECT count(*) AS n_converted,
        |  min(CASE WHEN rk = ((n - 1) * 50) // 100 + 1
        |    THEN latency_ms END) AS p50_ms,
        |  min(CASE WHEN rk = ((n - 1) * 90) // 100 + 1
        |    THEN latency_ms END) AS p90_ms,
        |  CAST(sum(latency_ms) AS BIGINT) // count(*) AS mean_ms
        |FROM r""".stripMargin)),

    // ------------------------------------------------------------------
    // Peak concurrency via the boundary-sweep — the interval-algebra
    // staple (peak load, max simultaneous sessions): each user-day
    // presence interval [first, last] becomes a +1 boundary at start
    // and a −1 at end+1ms, a running sum over the ordered boundaries
    // is the live concurrency, and its max per day is the answer.
    // One window running sum per day — no interval self-join, no
    // minute grid. Boundary order (ts, then −1 before +1 at equal
    // ts... here +1 sorts first via the delta DESC tiebreak, the
    // inclusive convention) is total, so the sweep is deterministic.
    QueryDef("q165_peak_concurrency",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // Two-phase bucketed sweep, NOT a window partitioned by day
        // alone: the testdata spans a fixed ~30 days, so per-day
        // partitions grow linearly with SF at constant parallelism —
        // the naive form serializes the whole table through ~30 tasks.
        // Instead each day's [0, 86.4M ms) offset axis is cut into 256
        // FIXED-width sub-buckets (boundary ts for day d lies in
        // [d·86400000, (d+1)·86400000], so the bucket id is pure
        // arithmetic — no min/max pass): the delta running sum is
        // computed WITHIN (day, bucket) in parallel, and each bucket
        // inherits the live-count offset from its predecessors via a
        // cumsum over the tiny (day, bucket) totals table (≤257 rows
        // per day), joined back. live = offset + in-bucket run.
        val bWidth = 86400000L / 256L + 1L
        val iv = events(s, dir)
          .groupBy(col("user_id"), expr("ts_ms div 86400000").as("day"))
          .agg(min(col("ts_ms")).as("t_start"),
            (max(col("ts_ms")) + 1).as("t_end"))
        val bounds = iv.select(col("day"), col("t_start").as("ts"),
            lit(1L).as("delta"), col("user_id"))
          .unionAll(iv.select(col("day"), col("t_end").as("ts"),
            lit(-1L).as("delta"), col("user_id")))
          .withColumn("bucket", expr(s"(ts - day * 86400000L) DIV ${bWidth}L"))
        val wIn = Window.partitionBy(col("day"), col("bucket"))
          .orderBy(col("ts"), col("delta").desc, col("user_id"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val offsets = bounds.groupBy(col("day"), col("bucket"))
          .agg(sum(col("delta")).as("bd"))
          .withColumn("offset",
            coalesce(sum(col("bd")).over(Window.partitionBy(col("day"))
              .orderBy(col("bucket"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("day"), col("bucket"), col("offset"))
        bounds
          .withColumn("run", sum(col("delta")).over(wIn))
          .join(broadcast(offsets), Seq("day", "bucket"))
          .withColumn("live", col("offset") + col("run"))
          .groupBy(col("day"))
          .agg(count(lit(1)).as("n_boundaries"),
            (count(lit(1)) / 2).cast("long").as("n_users"),
            max(col("live")).as("peak_concurrent"))
          .orderBy(col("day"))
      },
      Some(s"""WITH iv AS (
        |  SELECT user_id, $tsMs // 86400000 AS day,
        |    min($tsMs) AS t_start, max($tsMs) + 1 AS t_end
        |  FROM events GROUP BY 1, 2),
        |b AS (
        |  SELECT day, t_start AS ts, 1 AS delta, user_id FROM iv
        |  UNION ALL
        |  SELECT day, t_end AS ts, -1 AS delta, user_id FROM iv),
        |sw AS (
        |  SELECT day, sum(delta) OVER (
        |    PARTITION BY day ORDER BY ts, delta DESC, user_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
        |  FROM b)
        |SELECT day, count(*) AS n_boundaries,
        |  CAST(count(*) / 2 AS BIGINT) AS n_users,
        |  CAST(max(live) AS BIGINT) AS peak_concurrent
        |FROM sw GROUP BY day ORDER BY day""".stripMargin)),

    // ------------------------------------------------------------------
    // Inter-arrival burstiness — per event type: mean gap and the
    // variance-style dispersion n·Σg²−(Σg)² (÷n² gives variance; the
    // raw integer form hashes exactly), over SECOND-quantized gaps so
    // squared sums stay far inside long. A Poisson stream has
    // dispersion ≈ mean²·n; heavier means bursts — the arrival-
    // process diagnostic behind rate-limit and autoscale sizing.
    QueryDef("q166_interarrival",
      (s, dir) => {
        // Two-phase bucketed gaps (the q95/q180 shape), NOT a window
        // partitioned by event_type alone: event_type has ~4 values, so
        // the naive per-type lag funnels |events|/4 rows through ONE
        // task — correct but parallelism-capped at any scale. Instead:
        // range-bucket the timeline (equal ts always lands in one
        // bucket, so in-bucket (ts, event_id) order agrees with the
        // global order), lag WITHIN (type, bucket) in parallel, and
        // stitch each bucket to its predecessor with ONE boundary gap
        // computed on the tiny per-bucket summary (≤256 rows per type).
        // Gap values depend only on ts, so first/last ts per bucket
        // fully determine the boundary gap.
        val nBuckets = 256L
        val ev = events(s, dir)
          .select(col("event_type"), col("event_id"), col("ts_ms"))
        val Array(minT, maxT) = ev.agg(min(col("ts_ms")), max(col("ts_ms")))
          .head().toSeq.map(_.asInstanceOf[Long]).toArray
        val width = math.max(1L, (maxT - minT + nBuckets) / nBuckets)
        val partials = ev
          .withColumn("bucket", expr(s"(ts_ms - ${minT}L) DIV ${width}L"))
          .withColumn("gap_s",
            expr(s"(ts_ms - lag(ts_ms, 1) OVER (PARTITION BY event_type, " +
              "bucket ORDER BY ts_ms, event_id)) div 1000"))
          .groupBy(col("event_type"), col("bucket"))
          .agg(min(col("ts_ms")).as("first_ts"),
            max(col("ts_ms")).as("last_ts"),
            sum(when(col("gap_s").isNotNull, 1L).otherwise(0L)).as("n_in"),
            sum(coalesce(col("gap_s"), lit(0L))).as("sg"),
            sum(coalesce(col("gap_s") * col("gap_s"), lit(0L))).as("sg2"))
        partials
          .withColumn("bgap",
            expr("(first_ts - lag(last_ts, 1) OVER (PARTITION BY " +
              "event_type ORDER BY bucket)) div 1000"))
          .groupBy(col("event_type"))
          .agg(
            (sum(col("n_in")) + sum(when(col("bgap").isNotNull, 1L)
              .otherwise(0L))).as("n_gaps"),
            (sum(col("sg")) + sum(coalesce(col("bgap"), lit(0L)))).as("sgt"),
            (sum(col("sg2")) + sum(coalesce(col("bgap") * col("bgap"),
              lit(0L)))).as("sg2t"))
          .select(col("event_type"), col("n_gaps"),
            expr("sgt div n_gaps").as("mean_gap_s"),
            (col("n_gaps") * col("sg2t") - col("sgt") * col("sgt"))
              .as("dispersion_fp"))
          .orderBy(col("event_type"))
      },
      Some(s"""WITH g AS (
        |  SELECT event_type,
        |    ($tsMs - lag($tsMs) OVER (PARTITION BY event_type
        |      ORDER BY $tsMs, event_id)) // 1000 AS gap_s
        |  FROM events),
        |f AS (SELECT event_type, gap_s FROM g WHERE gap_s IS NOT NULL)
        |SELECT event_type, count(*) AS n_gaps,
        |  CAST(sum(gap_s) AS BIGINT) // count(*) AS mean_gap_s,
        |  count(*) * CAST(sum(gap_s * gap_s) AS BIGINT)
        |    - CAST(sum(gap_s) AS BIGINT) * CAST(sum(gap_s) AS BIGINT)
        |    AS dispersion_fp
        |FROM f GROUP BY event_type
        |ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // Cohort LTV matrix — q88's retention counts upgraded to VALUE:
    // per (signup-week cohort, week offset), active users and their
    // summed purchase value (exact DECIMAL). The cumulative-LTV read
    // is a running sum along each cohort row — left to the consumer,
    // since the per-cell matrix is the reusable artifact. Shuffles
    // keyed by (user) then (cohort, offset); nothing global.
    QueryDef("q167_cohort_ltv",
      (s, dir) => {
        val ev = events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts_ms"),
            col("value"))
        val cohort = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id"))
          .agg(expr("min(ts_ms) div 604800000").as("cohort_wk"))
        // Two-level pre-agg (the q197 shape) instead of countDistinct
        // beside plain aggs, which Catalyst plans as a 2-way Expand —
        // doubling the shuffled row count. Level 1 collapses to
        // (cell, user) with partial counts/sums riding along; level 2
        // is then an ordinary hash-agg where count(*) IS the distinct
        // user count. DECIMAL sums re-sum exactly, so revenue is
        // bit-identical to the single-level form.
        ev.filter(col("event_type") === "purchase")
          .join(cohort, "user_id")
          .withColumn("offset_wk",
            expr("ts_ms div 604800000") - col("cohort_wk"))
          .filter(col("offset_wk") >= 0)
          .groupBy(col("cohort_wk"), col("offset_wk"), col("user_id"))
          .agg(count(lit(1)).as("np"), sum(dec(col("value"))).as("rev"))
          .groupBy(col("cohort_wk"), col("offset_wk"))
          .agg(count(lit(1)).as("n_active"),
            sum(col("np")).as("n_purchases"),
            d(sum(col("rev"))).as("revenue"))
          .orderBy(col("cohort_wk"), col("offset_wk"))
      },
      Some(s"""WITH c AS (
        |  SELECT user_id, min($tsMs) // 604800000 AS cohort_wk
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |p AS (
        |  SELECT e.user_id, c.cohort_wk,
        |    $tsMs // 604800000 - c.cohort_wk AS offset_wk, e.value
        |  FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase')
        |SELECT cohort_wk, offset_wk,
        |  count(DISTINCT user_id) AS n_active,
        |  count(*) AS n_purchases,
        |  ${sumDec("value")} AS revenue
        |FROM p WHERE offset_wk >= 0
        |GROUP BY 1, 2 ORDER BY cohort_wk, offset_wk""".stripMargin)),

    // ------------------------------------------------------------------
    // RFM segmentation — the classic customer triage: quintile each
    // user's Recency (days since last purchase), Frequency (purchase
    // count), Monetary (×10⁴-quantized value sum, exact), via
    // ntile(5) over TOTAL deterministic orders (metric, then user_id
    // — engine-identical ntile given identical order), then count
    // users per (r, f, m) cell. Three windows over the users table
    // (small next to events) + one hash-agg.
    QueryDef("q168_rfm",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, dir).filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_ms"),
            floor(col("value") * 10000 + 0.5).cast("long").as("v"))
        val maxDay = ev.agg(max(expr("ts_ms div 86400000"))).head().getLong(0)
        val users = ev.groupBy(col("user_id"))
          .agg((lit(maxDay) - expr("max(ts_ms) div 86400000"))
            .as("recency_d"),
            count(lit(1)).as("freq"), sum(col("v")).as("monetary_fp"))
        users
          // recency scores 5=most recent: ascending recency → ntile
          // then invert; frequency/monetary descending-as-5 likewise
          .withColumn("r", lit(6) - ntile(5).over(
            Window.orderBy(col("recency_d"), col("user_id"))))
          .withColumn("f", ntile(5).over(
            Window.orderBy(col("freq"), col("user_id"))))
          .withColumn("m", ntile(5).over(
            Window.orderBy(col("monetary_fp"), col("user_id"))))
          .groupBy(col("r").cast("long").as("r"),
            col("f").cast("long").as("f"), col("m").cast("long").as("m"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("r"), col("f"), col("m"))
      },
      Some(s"""WITH ev AS (
        |  SELECT user_id, $tsMs AS ts_ms,
        |    CAST(floor(value * 10000 + 0.5) AS BIGINT) AS v
        |  FROM events WHERE event_type = 'purchase'),
        |mx AS (SELECT max(ts_ms // 86400000) AS mx FROM ev),
        |u AS (
        |  SELECT user_id,
        |    (SELECT mx FROM mx) - max(ts_ms) // 86400000 AS recency_d,
        |    count(*) AS freq, CAST(sum(v) AS BIGINT) AS monetary_fp
        |  FROM ev GROUP BY user_id),
        |sc AS (
        |  SELECT user_id,
        |    6 - ntile(5) OVER (ORDER BY recency_d, user_id) AS r,
        |    ntile(5) OVER (ORDER BY freq, user_id) AS f,
        |    ntile(5) OVER (ORDER BY monetary_fp, user_id) AS m
        |  FROM u)
        |SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
        |  CAST(m AS BIGINT) AS m, count(*) AS n_users
        |FROM sc GROUP BY 1, 2, 3
        |ORDER BY r, f, m""".stripMargin)),

    // ------------------------------------------------------------------
    // Batch shadow of the streaming CDC latest-state view
    // (LatestStateProcessor / transformWithState): events replayed as
    // a change stream (key = user_id; 'error' events are deletes,
    // everything else upserts). Latest-wins by the processor's exact
    // tie contract — (ts_ms, value) descending, event_id as the final
    // total-order disambiguator — and a winning tombstone removes the
    // key from the view while still counting its changes. This gives
    // the streaming state machine a hash-checked ground truth: the
    // processor's own spec pins batching-independence, and THIS query
    // pins what the converged state must equal. One hash-agg keyed by
    // user_id (max_by is partial-aggregable — no window sort).
    QueryDef("q172_cdc_latest_state",
      (s, dir) => {
        val ch = events(s, dir).select(col("user_id"), col("event_id"),
          col("ts_ms"), col("value"),
          when(col("event_type") === "error", lit("delete"))
            .otherwise(lit("upsert")).as("kind"))
        ch.groupBy(col("user_id"))
          .agg(max(struct(col("ts_ms"), col("value"), col("event_id"),
            col("kind"))).as("w"), count(lit(1)).as("n_changes"))
          .filter(col("w.kind") =!= "delete")
          .select(col("user_id"), col("w.ts_ms").as("last_ms"),
            col("w.value").as("last_value"), col("n_changes"))
          .orderBy(col("user_id"))
      },
      Some(s"""WITH ch AS (
        |  SELECT user_id, event_id, $tsMs AS ts_ms, value,
        |    CASE WHEN event_type = 'error' THEN 'delete'
        |      ELSE 'upsert' END AS kind
        |  FROM events),
        |w AS (
        |  SELECT user_id, ts_ms, value, kind,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts_ms DESC, value DESC, event_id DESC) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n_changes
        |  FROM ch)
        |SELECT user_id, ts_ms AS last_ms, value AS last_value, n_changes
        |FROM w WHERE rn = 1 AND kind <> 'delete'
        |ORDER BY user_id""".stripMargin)),

    // ------------------------------------------------------------------
    // Batch shadow of the streaming windowed heavy hitters
    // (HeavyHittersProcessor): tumbling 1-day windows keyed by window
    // start, top-3 users per window under the processor's exact
    // ordering contract — count desc, item id asc (`sortBy
    // ((-n, item)).take(k)`). The streaming operator's spec pins
    // emit-on-window-close and late-row handling; this pins the
    // per-window result the state machine must converge to. Two
    // hash-aggs + one per-window top-k window function — the
    // partition key is the day, so the sort is k-bounded per group.
    QueryDef("q173_heavy_hitters_shadow",
      (s, dir) => {
        val cnt = events(s, dir)
          .select(expr("ts_ms div 86400000").as("day"), col("user_id"))
          .groupBy(col("day"), col("user_id"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("day"))
          .orderBy(col("n").desc, col("user_id"))
        cnt.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select((col("day") * 86400000L).as("win_start_ms"),
            col("rk").cast("long").as("rk"), col("user_id"), col("n"))
          .orderBy(col("win_start_ms"), col("rk"))
      },
      Some(s"""WITH cnt AS (
        |  SELECT $tsMs // 86400000 AS day, user_id, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |ranked AS (
        |  SELECT day, user_id, n,
        |    row_number() OVER (PARTITION BY day
        |      ORDER BY n DESC, user_id) AS rk
        |  FROM cnt)
        |SELECT day * 86400000 AS win_start_ms, CAST(rk AS BIGINT) AS rk,
        |  user_id, n
        |FROM ranked WHERE rk <= 3
        |ORDER BY win_start_ms, rk""".stripMargin)),

    // ------------------------------------------------------------------
    // SCD type-2 run collapse (gaps-and-islands) — the dimension-build
    // step every warehouse CDC pipeline runs: collapse each user's
    // CONSECUTIVE events of the same type into one validity row
    // [valid_from, valid_to) with the run's event count, where
    // valid_to is the next run's start (NULL = still current).
    // Distinct from q72 (one validity row per EVENT) and q172 (latest
    // state only): this is the full change history at run
    // granularity. Tie contract shared with the oracle: events order
    // by (ts_ms, event_id) within user.
    //
    // Scale shape: two stacked windows partitioned by the SAME
    // user_id key (change flag + running run_id), one (user, run)
    // hash-agg, then one more user-partitioned window for valid_to —
    // Catalyst plans ONE Exchange on user_id and sorts once; nothing
    // is joined, nothing is quadratic in events per user.
    QueryDef("q193_scd2_runs",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_ms"), col("event_id"))
        val wRun = Window.partitionBy(col("user_id"))
          .orderBy(col("run_id"))
        events(s, dir)
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("ts_ms"))
          .withColumn("chg",
            when(lag(col("event_type"), 1).over(w).isNull ||
              lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
              .otherwise(0L))
          .withColumn("run_id", sum(col("chg"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("run_id"))
          .agg(min(col("event_type")).as("event_type"),
            min(col("ts_ms")).as("valid_from_ms"),
            count(lit(1)).as("n_events"))
          .withColumn("valid_to_ms",
            lead(col("valid_from_ms"), 1).over(wRun))
          .select(col("user_id"), col("run_id"), col("event_type"),
            col("valid_from_ms"), col("valid_to_ms"), col("n_events"))
          .orderBy(col("user_id"), col("run_id"))
      },
      Some(s"""WITH ev AS (
        |  SELECT user_id, event_id, event_type, $tsMs AS ts_ms
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, event_type, ts_ms,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |      OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END
        |      AS chg
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
        |runs AS (
        |  SELECT user_id, event_id, event_type, ts_ms,
        |    CAST(sum(chg) OVER (PARTITION BY user_id
        |      ORDER BY ts_ms, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
        |  FROM flagged),
        |collapsed AS (
        |  SELECT user_id, run_id, min(event_type) AS event_type,
        |    min(ts_ms) AS valid_from_ms,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM runs GROUP BY 1, 2)
        |SELECT user_id, run_id, event_type, valid_from_ms,
        |  lead(valid_from_ms) OVER (PARTITION BY user_id
        |    ORDER BY run_id) AS valid_to_ms,
        |  n_events
        |FROM collapsed
        |ORDER BY user_id, run_id""".stripMargin)),

    // ------------------------------------------------------------------
    // Behavioral sequence mining — the top-20 event-type TRIGRAMS
    // (three consecutive events per user, ordered by (ts_ms,
    // event_id)): the path-mining step funnel design starts from,
    // one order up from q139's 1-step transition matrix. Sequences
    // that cross users never form (the window partitions by user).
    //
    // Scale shape: two lead() columns on ONE user-partitioned window
    // (same Exchange the other behavioral queries use), then a
    // |distinct trigrams|-sized hash-agg and a top-k sort on that
    // small aggregate — the event table itself is never re-scanned
    // or joined.
    QueryDef("q202_event_trigrams",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_ms"), col("event_id"))
        events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts_ms"),
            col("event_type"))
          .withColumn("t2", lead(col("event_type"), 1).over(w))
          .withColumn("t3", lead(col("event_type"), 2).over(w))
          .filter(col("t3").isNotNull)
          .select(concat_ws(">", col("event_type"), col("t2"), col("t3"))
            .as("trigram"))
          .groupBy(col("trigram"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("trigram"))
          .limit(20)
      },
      Some(s"""WITH seq AS (
        |  SELECT user_id, event_type, $tsMs AS ts_ms, event_id,
        |    lead(event_type, 1) OVER w AS t2,
        |    lead(event_type, 2) OVER w AS t3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY $tsMs, event_id))
        |SELECT event_type || '>' || t2 || '>' || t3 AS trigram,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM seq WHERE t3 IS NOT NULL
        |GROUP BY 1
        |ORDER BY n DESC, trigram
        |LIMIT 20""".stripMargin)),

    // ------------------------------------------------------------------
    // Merkle-style bucket-digest reconciliation — how two 100 TB
    // replicas are compared WITHOUT a row-level diff: each side folds
    // its rows into 256 per-bucket (count, digest-sum) summaries, and
    // only buckets whose summaries disagree need row-level repair
    // (q134's snapshot diff, now localized). Snapshot A simulates a
    // 2%-loss replica (md5-bucket split — the standard deterministic
    // sampling rule here); digests are md5-derived longs summed in
    // DECIMAL(38,0)/HUGEINT so the fold is exact and order-free on
    // both engines. Output: ONLY the differing buckets (count +
    // digest deltas) — at scale this is what crosses the wire, 256
    // rows per replica regardless of table size.
    QueryDef("q204_merkle_bucket_diff",
      (s, dir) => {
        val digested = events(s, dir)
          .select(col("event_id"), col("user_id"))
          .withColumn("hv",
            conv(substring(md5(col("event_id").cast("string")), 1, 15),
              16, 10).cast("long"))
          .withColumn("bucket", col("user_id") % 256)
        def fold(df: org.apache.spark.sql.DataFrame, suffix: String) =
          df.groupBy(col("bucket"))
            .agg(count(lit(1)).as(s"n_$suffix"),
              sum(col("hv").cast(org.apache.spark.sql.types
                .DataTypes.createDecimalType(38, 0))).as(s"d_$suffix"))
        val a = fold(digested.filter(col("hv") % 100 < 98), "a")
        val b = fold(digested, "b")
        b.join(a, Seq("bucket"), "left_outer")
          .withColumn("n_a", coalesce(col("n_a"), lit(0L)))
          .filter(col("n_a") =!= col("n_b") ||
            !(col("d_a") <=> col("d_b")))
          .select(col("bucket"), col("n_a"), col("n_b"),
            (col("n_b") - col("n_a")).as("n_missing"))
          .orderBy(col("bucket"))
      },
      Some("""WITH digested AS (
        |  SELECT event_id, user_id,
        |    CAST(('0x' || substring(md5(event_id::VARCHAR), 1, 15))
        |      AS BIGINT) AS hv,
        |    user_id % 256 AS bucket
        |  FROM events),
        |a AS (
        |  SELECT bucket, count(*) AS n_a, sum(CAST(hv AS HUGEINT)) AS d_a
        |  FROM digested WHERE hv % 100 < 98 GROUP BY 1),
        |b AS (
        |  SELECT bucket, count(*) AS n_b, sum(CAST(hv AS HUGEINT)) AS d_b
        |  FROM digested GROUP BY 1)
        |SELECT b.bucket,
        |  CAST(coalesce(a.n_a, 0) AS BIGINT) AS n_a,
        |  CAST(b.n_b AS BIGINT) AS n_b,
        |  CAST(b.n_b - coalesce(a.n_a, 0) AS BIGINT) AS n_missing
        |FROM b LEFT JOIN a ON a.bucket = b.bucket
        |WHERE coalesce(a.n_a, 0) <> b.n_b
        |  OR a.d_a IS DISTINCT FROM b.d_b
        |ORDER BY b.bucket""".stripMargin)),

    // ------------------------------------------------------------------
    // Point-in-time feature join — the feature-store correctness
    // contract: enrich each purchase with the user's STATE AS OF the
    // purchase instant, where state is the q193-style SCD2 dimension
    // built from the user's non-purchase events. Composing the two
    // operators is the point: runs partition each user's timeline, so
    // "the run containing t" ≡ "the latest run starting ≤ t", which
    // is exactly the native backward as-of operator — no range
    // predicate, no interval join, no leakage from the future (the
    // bug PIT joins exist to prevent). Right side deduped to one run
    // per (user, ms) per the operator's unique-(key, time) contract.
    //
    // Scale shape: the dimension build is q193's single user-keyed
    // Exchange; the as-of is the native merge exec on the same key.
    QueryDef("q205_pit_feature_join",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_ms"), col("event_id"))
        val ev = events(s, dir)
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("ts_ms"))
        val state = ev.filter(col("event_type") =!= "purchase")
          .withColumn("chg",
            when(lag(col("event_type"), 1).over(w).isNull ||
              lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
              .otherwise(0L))
          .withColumn("run_id", sum(col("chg"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("run_id"))
          .agg(min(col("event_type")).as("state_type"),
            min(col("ts_ms")).as("state_since_ms"))
        val dedup = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"), col("state_since_ms"))
          .orderBy(col("run_id").desc)
        val dim = state.withColumn("rn", row_number().over(dedup))
          .filter(col("rn") === 1)
          .select(col("user_id").as("d_user"), col("run_id"),
            col("state_type"), col("state_since_ms"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_ms"))
        graft.plans.AsOfJoin.backward(purchases, dim,
            Seq("user_id"), Seq("d_user"), "ts_ms", "state_since_ms")
          .select(col("event_id"), col("user_id"), col("ts_ms"),
            col("state_type"), col("state_since_ms"), col("run_id"))
          .orderBy(col("event_id"))
      },
      Some(s"""WITH ev AS (
        |  SELECT user_id, event_id, event_type, $tsMs AS ts_ms
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, event_type, ts_ms,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |      OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END
        |      AS chg
        |  FROM ev WHERE event_type <> 'purchase'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
        |runs AS (
        |  SELECT user_id, event_type, ts_ms,
        |    CAST(sum(chg) OVER (PARTITION BY user_id
        |      ORDER BY ts_ms, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
        |  FROM flagged),
        |state AS (
        |  SELECT user_id, run_id, min(event_type) AS state_type,
        |    min(ts_ms) AS state_since_ms
        |  FROM runs GROUP BY 1, 2),
        |dim AS (
        |  SELECT user_id, run_id, state_type, state_since_ms FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id,
        |      state_since_ms ORDER BY run_id DESC) AS rn
        |    FROM state)
        |  WHERE rn = 1),
        |p AS (
        |  SELECT event_id, user_id, ts_ms FROM ev
        |  WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT p.event_id, d.state_type, d.state_since_ms, d.run_id,
        |    row_number() OVER (PARTITION BY p.event_id
        |      ORDER BY d.state_since_ms DESC) AS rn
        |  FROM p JOIN dim d
        |    ON d.user_id = p.user_id AND d.state_since_ms <= p.ts_ms)
        |SELECT p.event_id, p.user_id, p.ts_ms,
        |  j.state_type, j.state_since_ms, j.run_id
        |FROM p LEFT JOIN (SELECT * FROM j WHERE rn = 1) j
        |  USING (event_id)
        |ORDER BY p.event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // Event debounce audit — the TTL-dedup every log/metrics pipeline
    // applies at ingest: an event is SUPPRESSED when the same
    // (user, type) fired within the trailing hour. Reported per type
    // as counts + suppressed per-mille, the dial that decides the
    // debounce window before it is enforced. One lag() on a
    // (user, type)-partitioned window — no self-join against the
    // trailing interval.
    QueryDef("q206_event_debounce",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts_ms"), col("event_id"))
        events(s, dir)
          .select(col("user_id"), col("event_type"), col("event_id"),
            col("ts_ms"))
          .withColumn("gap", col("ts_ms") - lag(col("ts_ms"), 1).over(w))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("gap") < 3600000L, 1L).otherwise(0L))
              .as("n_suppressed"))
          .withColumn("suppressed_pm",
            expr("(n_suppressed * 1000) DIV n_events"))
          .orderBy(col("event_type"))
      },
      Some(s"""WITH g AS (
        |  SELECT event_type,
        |    $tsMs - lag($tsMs) OVER (PARTITION BY user_id, event_type
        |      ORDER BY $tsMs, event_id) AS gap
        |  FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(*) FILTER (WHERE gap < 3600000) AS BIGINT)
        |    AS n_suppressed,
        |  CAST((count(*) FILTER (WHERE gap < 3600000) * 1000)
        |    // count(*) AS BIGINT) AS suppressed_pm
        |FROM g GROUP BY 1 ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // Position-based (U-shaped) multi-touch attribution — the
    // marketing-analytics standard: each purchase's value is credited
    // across the user's clicks in the prior 7 days, 40% to the first
    // touch, 40% to the last, 20% split over the middle (1 touch →
    // 100%, 2 → 50/50); campaign = the click's props k. Credit is
    // integer BASIS POINTS and money stays DECIMAL, so the credited
    // totals are exact and order-free; the middle share uses a
    // truncating div (the remainder basis points stay unattributed —
    // deterministic, identical on both engines).
    //
    // Scale shape: the touch table is an equi-join on user_id with
    // the 7-day band as a post-join filter (per-user × per-week
    // fan-out, bounded by activity, never |events|²); position ranks
    // are two windows on ONE purchase-keyed Exchange; the rollup is a
    // |campaigns|-sized hash-agg.
    QueryDef("q211_position_attribution",
      (s, dir) => {
        val ev = events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("pid"), col("user_id"),
            col("ts_ms").as("pts"), dec(col("value")).as("pval"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("cid"),
            col("ts_ms").as("cts"),
            regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1)
              .cast("long").as("campaign"))
        val touches = purchases.join(clicks, Seq("user_id"))
          .filter(col("cts") < col("pts") &&
            col("cts") >= col("pts") - lit(7L * 86400000L))
        val w = Window.partitionBy(col("pid"))
        val ranked = touches
          .withColumn("rk", row_number().over(
            w.orderBy(col("cts"), col("cid"))))
          .withColumn("n", count(lit(1)).over(w))
          .withColumn("bp",
            when(col("n") === 1, 10000L)
              .when(col("n") === 2, 5000L)
              .when(col("rk") === 1 || col("rk") === col("n"), 4000L)
              .otherwise(expr("2000L DIV (n - 2)")))
        ranked.groupBy(col("campaign"))
          .agg(count(lit(1)).as("n_touches"),
            sum(col("pval") * col("bp")).as("craw"))
          .select(col("campaign"), col("n_touches"),
            expr("CAST(craw * 10000 AS BIGINT)").as("credited_fp"))
          .orderBy(col("campaign"))
      },
      Some(s"""WITH p AS (
        |  SELECT event_id AS pid, user_id, $tsMs AS pts,
        |    CAST(value AS DECIMAL(18,4)) AS pval
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, event_id AS cid, $tsMs AS cts,
        |    CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT)
        |      AS campaign
        |  FROM events WHERE event_type = 'click'),
        |touches AS (
        |  SELECT p.pid, p.pval, c.cid, c.cts, c.campaign,
        |    row_number() OVER (PARTITION BY p.pid
        |      ORDER BY c.cts, c.cid) AS rk,
        |    count(*) OVER (PARTITION BY p.pid) AS n
        |  FROM p JOIN c ON c.user_id = p.user_id
        |  WHERE c.cts < p.pts AND c.cts >= p.pts - 604800000),
        |credited AS (
        |  SELECT campaign, pval,
        |    CASE WHEN n = 1 THEN 10000
        |         WHEN n = 2 THEN 5000
        |         WHEN rk = 1 OR rk = n THEN 4000
        |         ELSE 2000 // (n - 2) END AS bp
        |  FROM touches)
        |SELECT campaign, CAST(count(*) AS BIGINT) AS n_touches,
        |  CAST(sum(pval * bp) * 10000 AS BIGINT) AS credited_fp
        |FROM credited GROUP BY 1
        |ORDER BY campaign""".stripMargin)),

    // ------------------------------------------------------------------
    // Theil-Sen robust trend — q143's OLS slope is pulled arbitrarily
    // far by one corrupted batch of events; the median of pairwise
    // slopes (breakdown point 29%) is the estimator monitoring
    // pipelines actually want. Computed over the HOURLY pre-aggregate,
    // so the O(n²) pair step is bounded by the time range (~720 hours
    // → ≤260k pairs per type), NOT by corpus size: at 100 TB the
    // hourly rollup is the same ~720 rows per type and the pair/rank
    // stages don't grow at all — the only SF-scaling stage is the
    // map-side-combinable hourly hash-agg. Each pairwise slope is ONE
    // division of exact fixed-point longs; the median is the k-th
    // order statistic (ties in `slope` can permute row_numbers but
    // never change the selected VALUE).
    QueryDef("q226_theil_sen",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val hourly = events(s, dir)
          .select(col("event_type"), expr("ts_ms DIV 3600000").as("x"),
            floor(col("value") * 10000 + 0.5).cast("long").as("v"))
          .groupBy(col("event_type"), col("x"))
          .agg(sum(col("v")).as("y"))
        val pairs = hourly.as("a").join(hourly.as("b"),
            col("a.event_type") === col("b.event_type")
              && col("a.x") < col("b.x"))
          .select(col("a.event_type").as("event_type"),
            ((col("b.y") - col("a.y")).cast("double") /
              (col("b.x") - col("a.x")).cast("double")).as("slope"))
        pairs
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("event_type")).orderBy(col("slope")))
            .cast("long"))
          .withColumn("np", count(lit(1)).over(
            Window.partitionBy(col("event_type"))))
          .filter(col("rn") === expr("(np + 1) DIV 2"))
          .select(col("event_type"), col("np").as("n_pairs"),
            col("slope").as("ts_slope"))
          .orderBy(col("event_type"))
      },
      Some(s"""WITH ev AS (
        |  SELECT event_type, $tsMs // 3600000 AS x,
        |    CAST(floor(value * 10000 + 0.5) AS BIGINT) AS v
        |  FROM events),
        |h AS (SELECT event_type, x, CAST(sum(v) AS BIGINT) AS y
        |  FROM ev GROUP BY 1, 2),
        |p AS (
        |  SELECT a.event_type,
        |    CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
        |  FROM h a JOIN h b
        |    ON a.event_type = b.event_type AND a.x < b.x),
        |r AS (
        |  SELECT event_type, slope,
        |    row_number() OVER (PARTITION BY event_type ORDER BY slope)
        |      AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS np
        |  FROM p)
        |SELECT event_type, CAST(np AS BIGINT) AS n_pairs, slope AS ts_slope
        |FROM r WHERE rn = (np + 1) // 2
        |ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // Batch shadow of the streaming conversion funnel
    // (FunnelProcessor / transformWithState): the CONVERGED
    // per-conversion rows the live state machine must end at when the
    // stream drains in event-time order — one row per 'view' with a
    // 'purchase' by the same user at or after it within 1 h, matched
    // to the EARLIEST such purchase (the processor's sorted-buffer
    // `find`; purchases are never consumed, so one purchase may
    // attribute many views). q83 aggregates this relation to cohort
    // conversion rates; THIS query pins the row-level contract the
    // processor emits (key, view_ms, purchase_ms, latency_ms), and
    // StreamsSpec replays the same rows through funnelStream and
    // asserts set equality. Tie contract: a purchase in the same
    // millisecond as the view converts it (b >= v), which the window
    // encodes by sorting purchases BEFORE views at equal ts in the
    // descending cumulative min.
    //
    // Scale shape: q83's no-self-join form — one shuffle on user_id,
    // a running min over the time-reversed per-user sequence, no
    // view x purchase range join (which shuffles the event table
    // twice and explodes on active users).
    QueryDef("q228_funnel_shadow",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_ms").desc, col("is_view"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events(s, dir)
          .filter(col("event_type").isin("view", "purchase"))
          .select(col("user_id"), col("ts_ms"),
            (col("event_type") === "view").cast("int").as("is_view"))
          .withColumn("purchase_ms",
            min(when(col("is_view") === 0, col("ts_ms"))).over(w))
          .filter(col("is_view") === 1 && col("purchase_ms").isNotNull &&
            col("purchase_ms") - col("ts_ms") <= 3600000L)
          .select(col("user_id").as("key"), col("ts_ms").as("view_ms"),
            col("purchase_ms"),
            (col("purchase_ms") - col("ts_ms")).as("latency_ms"))
          .orderBy(col("key"), col("view_ms"))
      },
      Some(s"""WITH ev AS (
        |  SELECT user_id, $tsMs AS ts_ms,
        |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_view
        |  FROM events WHERE event_type IN ('view', 'purchase')),
        |m AS (
        |  SELECT user_id, ts_ms, is_view,
        |    min(CASE WHEN is_view = 0 THEN ts_ms END)
        |      OVER (PARTITION BY user_id ORDER BY ts_ms DESC, is_view
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS purchase_ms
        |  FROM ev)
        |SELECT user_id AS key, ts_ms AS view_ms, purchase_ms,
        |  purchase_ms - ts_ms AS latency_ms
        |FROM m
        |WHERE is_view = 1 AND purchase_ms IS NOT NULL
        |  AND purchase_ms - ts_ms <= 3600000
        |ORDER BY key, view_ms""".stripMargin)),

    // ------------------------------------------------------------------
    // Batch shadow of the custom-state streaming sessionizer
    // (Streams.sessionizeStream / flatMapGroupsWithState): the
    // converged ClosedSession rows — per-user gap sessions under the
    // processor's EXACT merge contract, gap strictly < 15 min merges
    // (q54 uses the complementary <= boundary and carries no value
    // payload; this row pins the processor's strict boundary AND its
    // foldable payload: count + value sum + first/last bounds).
    // StreamsSpec replays the same rows through sessionizeStream —
    // including the event-time-timeout flush of the final open
    // sessions — and asserts row equality, which makes the streaming
    // timeout path oracle-checked, not just spec-asserted.
    //
    // Scale shape: q54's islands form — two stacked windows on the
    // SAME user_id partitioning (one Exchange, one sort) + one
    // hash-agg; nothing quadratic, no join.
    QueryDef("q229_session_shadow",
      (s, dir) => {
        val wOrd = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_ms"), col("event_id"))
        val wRun = wOrd.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)
        events(s, dir)
          .select(col("user_id"), col("ts_ms"), col("event_id"),
            col("value"))
          .withColumn("new_session",
            when(lag(col("ts_ms"), 1).over(wOrd).isNull, 1L)
              .when(col("ts_ms") - lag(col("ts_ms"), 1).over(wOrd)
                >= 900000L, 1L)
              .otherwise(0L))
          .withColumn("session_id", sum(col("new_session")).over(wRun))
          .groupBy(col("user_id"), col("session_id"))
          .agg(min(col("ts_ms")).as("start_ms"),
            max(col("ts_ms")).as("end_ms"),
            count(lit(1)).as("n_events"),
            d(sum(dec(col("value")))).as("sum_value"))
          .select(col("user_id").as("key"), col("start_ms"),
            col("end_ms"), col("n_events"), col("sum_value"))
          .orderBy(col("key"), col("start_ms"))
      },
      Some(s"""WITH base AS (
        |  SELECT user_id, $tsMs AS ts_ms, event_id, value FROM events),
        |flagged AS (
        |  SELECT user_id, ts_ms, event_id, value,
        |    CASE WHEN lag(ts_ms) OVER w IS NULL THEN 1
        |         WHEN ts_ms - lag(ts_ms) OVER w >= 900000 THEN 1
        |         ELSE 0 END AS new_session
        |  FROM base
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
        |numbered AS (
        |  SELECT user_id, ts_ms, value,
        |    sum(new_session) OVER (PARTITION BY user_id
        |      ORDER BY ts_ms, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_id
        |  FROM flagged)
        |SELECT user_id AS key, min(ts_ms) AS start_ms,
        |  max(ts_ms) AS end_ms, count(*) AS n_events,
        |  ${sumDec("value")} AS sum_value
        |FROM numbered
        |GROUP BY user_id, session_id
        |ORDER BY key, start_ms""".stripMargin)),

    // ------------------------------------------------------------------
    // Roll (1984) autocovariance — the effective-spread estimator's
    // core: cov(Δp_t, Δp_{t−1}) over the per-type price series (a
    // negative value ⇒ bid/ask bounce; spread ≈ 2·√−cov). Exact
    // integer numerator form: prices quantized ×10⁴ (q65/q238
    // contract), cov_num = n·Σ(d_t·d_{t−1}) − Σd_t·Σd_{t−1},
    // accumulated in DECIMAL(38,0)/HUGEINT and EMITTED as an exact
    // (sign, hi, lo) int64 TRIPLE — cov = sign·(hi·10¹⁸ + lo). The
    // n·Σde term scales ~quadratically with rows/type, so a single
    // BIGINT overflows already at sf0.1 (−1.003e20 — found by this
    // round's sf0.1 sweep; the ANSI cast threw loudly, as designed).
    // hi/lo split on the ABSOLUTE value: Spark's DIV/% truncate
    // toward zero while DuckDB's //% floor, so the decomposition is
    // only engine-portable on non-negative operands — the sign rides
    // its own column. Scale-0 DECIMAL output stays banned
    // catalog-wide — the driver's parquet→pandas hash channel renders
    // it float64 (lossy past 2⁵³) while DuckDB renders integer, so
    // value-equal results would hash-diverge.
    //
    // Scale shape: q166's two-phase bucketed pattern GENERALIZED to a
    // lag-2 statistic — a per-type window would funnel |events|/4
    // rows through one task, so instead: 256 timeline range-buckets,
    // windows within (type, bucket), and a TWO-row boundary handoff
    // on the ≤256-row summary. The delta sequence per type is
    // [in-bucket deltas of b₁] ++ [boundary Δ, in-bucket deltas]
    // per following bucket; in-bucket partials cover products where
    // BOTH deltas are interior (lag-2 ⇒ rn ≥ 3), and each boundary
    // delta bd(b) = p_first(b) − p_last(b−1) contributes exactly two
    // products, stitched at summary level: bd(b)·effLast(b−1) (the
    // delta ENDING in the previous bucket — its last interior delta,
    // or its own boundary delta when the bucket is a singleton, so
    // chains of singleton buckets hand the delta through) and
    // firstInteriorDelta(b)·bd(b). Σd telescopes: the sum of ALL
    // deltas is p_last − p_first globally, so the end-exclusive sums
    // B = Σ_{t≥2}d_t and C = Σ_{t≥2}d_{t−1} need only the global
    // first/last TWO prices — read off the summary's first/last
    // buckets (falling back to the neighbor bucket's edge price when
    // the edge bucket is a singleton).
    QueryDef("q239_roll_autocov",
      (s, dir) => {
        val nBuckets = 256L
        val ev = events(s, dir).select(
          col("event_type"), col("event_id"), col("ts_ms"),
          expr("CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)")
            .as("p_u"))
        val Array(minT, maxT) = ev
          .agg(min(col("ts_ms")), max(col("ts_ms")))
          .head().toSeq.map(_.asInstanceOf[Long]).toArray
        val width = math.max(1L, (maxT - minT + nBuckets) / nBuckets)
        val win = "PARTITION BY event_type, bucket ORDER BY ts_ms, event_id"
        val winD =
          "PARTITION BY event_type, bucket ORDER BY ts_ms DESC, event_id DESC"
        val rows = ev
          .withColumn("bucket", expr(s"(ts_ms - ${minT}L) DIV ${width}L"))
          .withColumn("rn", expr(s"row_number() OVER ($win)"))
          .withColumn("rnd", expr(s"row_number() OVER ($winD)"))
          .withColumn("d", expr(s"p_u - lag(p_u, 1) OVER ($win)"))
          .withColumn("e", expr(s"lag(d, 1) OVER ($win)"))
        val parts = rows.groupBy(col("event_type"), col("bucket")).agg(
          max(when(col("rn") === 1, col("p_u"))).as("p_first"),
          max(when(col("rn") === 2, col("p_u"))).as("p_second"),
          max(when(col("rnd") === 1, col("p_u"))).as("p_last"),
          max(when(col("rnd") === 2, col("p_u"))).as("p_secondlast"),
          max(when(col("rn") === 2, col("d"))).as("first_in_d"),
          max(when(col("rnd") === 1, col("d"))).as("last_in_d"),
          sum(when(col("e").isNotNull,
            expr("CAST(d * e AS DECIMAL(38,0))"))).as("a_in"),
          sum(when(col("e").isNotNull, 1L).otherwise(0L)).as("n_in"))
        val wsum = "PARTITION BY event_type ORDER BY bucket"
        val st = parts
          .withColumn("bd", expr(s"p_first - lag(p_last, 1) OVER ($wsum)"))
          .withColumn("eff_last", expr("coalesce(last_in_d, bd)"))
          .withColumn("prev_eff_last",
            expr(s"lag(eff_last, 1) OVER ($wsum)"))
          .withColumn("rb", expr(s"row_number() OVER ($wsum)"))
          .withColumn("rbd", expr("row_number() OVER (PARTITION BY " +
            "event_type ORDER BY bucket DESC)"))
          .withColumn("t1", expr("CASE WHEN bd IS NOT NULL AND " +
            "prev_eff_last IS NOT NULL THEN " +
            "CAST(bd * prev_eff_last AS DECIMAL(38,0)) END"))
          .withColumn("t2", expr("CASE WHEN bd IS NOT NULL AND " +
            "first_in_d IS NOT NULL THEN " +
            "CAST(first_in_d * bd AS DECIMAL(38,0)) END"))
        st.groupBy(col("event_type")).agg(
            expr("sum(n_in) + sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 " +
              "END) + sum(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END)")
              .as("n_pairs"),
            expr("coalesce(sum(a_in), CAST(0 AS DECIMAL(38,0))) + " +
              "coalesce(sum(t1), CAST(0 AS DECIMAL(38,0))) + " +
              "coalesce(sum(t2), CAST(0 AS DECIMAL(38,0)))").as("a_tot"),
            max(when(col("rb") === 1, col("p_first"))).as("pf_g"),
            max(when(col("rb") === 1, col("p_second"))).as("ps_g"),
            max(when(col("rb") === 2, col("p_first"))).as("pf2_g"),
            max(when(col("rbd") === 1, col("p_last"))).as("pl_g"),
            max(when(col("rbd") === 1, col("p_secondlast"))).as("psl_g"),
            max(when(col("rbd") === 2, col("p_last"))).as("pl2_g"))
          .withColumn("b_sum",
            expr("(pl_g - pf_g) - (coalesce(ps_g, pf2_g) - pf_g)"))
          .withColumn("c_sum",
            expr("(pl_g - pf_g) - (pl_g - coalesce(psl_g, pl2_g))"))
          .filter(col("n_pairs") >= 1)
          .withColumn("cov_full",
            expr("CAST(n_pairs AS DECIMAL(38,0)) * a_tot - " +
              "CAST(b_sum AS DECIMAL(38,0)) * c_sum"))
          .select(col("event_type"), col("n_pairs"),
            col("a_tot").cast("long").as("sum_prod"),
            expr("CAST(CASE WHEN cov_full < 0 THEN -1 ELSE 1 END " +
              "AS BIGINT)").as("cov_sign"),
            expr("CAST(abs(cov_full) DIV " +
              "CAST(1000000000000000000 AS DECIMAL(38,0)) AS BIGINT)")
              .as("cov_hi"),
            expr("CAST(abs(cov_full) % " +
              "CAST(1000000000000000000 AS DECIMAL(38,0)) AS BIGINT)")
              .as("cov_lo"))
          .orderBy(col("event_type"))
      },
      Some(s"""WITH pu AS (
        |  SELECT event_type, event_id, $tsMs AS ts_ms,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS p_u
        |  FROM events),
        |d AS (
        |  SELECT event_type, ts_ms, event_id,
        |    p_u - lag(p_u) OVER (PARTITION BY event_type
        |      ORDER BY ts_ms, event_id) AS d
        |  FROM pu),
        |dd AS (
        |  SELECT event_type, d,
        |    lag(d) OVER (PARTITION BY event_type
        |      ORDER BY ts_ms, event_id) AS e
        |  FROM d WHERE d IS NOT NULL),
        |f AS (SELECT * FROM dd WHERE e IS NOT NULL),
        |cov AS (
        |  SELECT event_type, count(*) AS n_pairs,
        |    sum(CAST(d AS HUGEINT) * e) AS sum_prod_h,
        |    count(*) * sum(CAST(d AS HUGEINT) * e)
        |      - sum(CAST(d AS HUGEINT)) * sum(CAST(e AS HUGEINT))
        |      AS cov_full
        |  FROM f GROUP BY event_type)
        |SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
        |  CAST(sum_prod_h AS BIGINT) AS sum_prod,
        |  CAST(CASE WHEN cov_full < 0 THEN -1 ELSE 1 END AS BIGINT)
        |    AS cov_sign,
        |  CAST(abs(cov_full) // CAST(1000000000000000000 AS HUGEINT)
        |    AS BIGINT) AS cov_hi,
        |  CAST(abs(cov_full) % CAST(1000000000000000000 AS HUGEINT)
        |    AS BIGINT) AS cov_lo
        |FROM cov
        |ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // Amihud illiquidity — mean per-tick |Δp|/p_prev by (type, day),
    // the standard price-impact-per-activity readout, in exact
    // integers: per-tick ratio = |Δp|·10⁶ DIV p_prev (both engines
    // compute the identical integer per tick — no float averaging),
    // day mean = Σratio DIV n in DECIMAL(38,0) (tiny p_prev makes a
    // single ratio up to ~10¹³, so day sums pass long at ~10⁶
    // ticks/cell).
    //
    // Third variant of the bucketed low-cardinality-window family:
    // q166 aggregates per-bucket summaries, q239 stitches boundary
    // PRODUCTS at summary level — here every ROW needs its lag value
    // (the ratio is per-tick, then grouped by day), so the boundary
    // is backfilled the other way: the ≤256-row-per-type summary of
    // per-bucket last prices is BROADCAST-joined back onto the fact
    // rows, and only each bucket's FIRST row reads its p_prev from
    // it (everyone else lags within the bucket). The fact table is
    // scanned once and never re-shuffled for the join.
    QueryDef("q241_amihud",
      (s, dir) => {
        val nBuckets = 256L
        val ev = events(s, dir).select(
          col("event_type"), col("event_id"), col("ts_ms"),
          expr("CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)")
            .as("p_u"))
        val Array(minT, maxT) = ev
          .agg(min(col("ts_ms")), max(col("ts_ms")))
          .head().toSeq.map(_.asInstanceOf[Long]).toArray
        val width = math.max(1L, (maxT - minT + nBuckets) / nBuckets)
        val win = "PARTITION BY event_type, bucket ORDER BY ts_ms, event_id"
        val rows = ev
          .withColumn("bucket", expr(s"(ts_ms - ${minT}L) DIV ${width}L"))
          .withColumn("p_prev_in", expr(s"lag(p_u, 1) OVER ($win)"))
        val bounds = rows.groupBy(col("event_type"), col("bucket"))
          .agg(expr("max_by(p_u, struct(ts_ms, event_id))").as("p_last"))
          .withColumn("prev_last", expr("lag(p_last, 1) OVER " +
            "(PARTITION BY event_type ORDER BY bucket)"))
          .select(col("event_type"), col("bucket"), col("prev_last"))
        rows
          .join(broadcast(bounds), Seq("event_type", "bucket"))
          .withColumn("p_prev", expr("coalesce(p_prev_in, prev_last)"))
          .withColumn("ratio", expr(
            "abs(p_u - p_prev) * 1000000 DIV nullif(p_prev, 0)"))
          .filter(col("ratio").isNotNull)
          .withColumn("day", expr("ts_ms DIV 86400000"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("n_ticks"),
            expr("CAST(sum(CAST(ratio AS DECIMAL(38,0))) DIV count(*) " +
              "AS BIGINT)").as("amihud_fp"))
          .orderBy(col("event_type"), col("day"))
      },
      Some(s"""WITH pu AS (
        |  SELECT event_type, event_id, $tsMs AS ts_ms,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS p_u
        |  FROM events),
        |lagd AS (
        |  SELECT event_type, ts_ms, p_u,
        |    lag(p_u) OVER (PARTITION BY event_type
        |      ORDER BY ts_ms, event_id) AS p_prev
        |  FROM pu),
        |r AS (
        |  SELECT event_type, ts_ms // 86400000 AS day,
        |    abs(p_u - p_prev) * 1000000 // nullif(p_prev, 0) AS ratio
        |  FROM lagd)
        |SELECT event_type, day, CAST(count(*) AS BIGINT) AS n_ticks,
        |  CAST(sum(CAST(ratio AS HUGEINT)) // count(*) AS BIGINT)
        |    AS amihud_fp
        |FROM r WHERE ratio IS NOT NULL
        |GROUP BY event_type, day
        |ORDER BY event_type, day""".stripMargin)),

    // ------------------------------------------------------------------
    // Median/MAD robust outlier screen — the heavy-tail-immune
    // complement of q114's mean/σ z-score and q132's rank trims:
    // median and median-absolute-deviation are breakdown-50% robust,
    // so a contaminated feed can't drag its own outlier threshold.
    // Exact integer form: values quantized ×10⁴ (q238/q239
    // contract), median = LOWER median (the ⌈n/2⌉-th smallest — a
    // value from the data, no interpolated float to diverge between
    // engines), MAD = lower median of |v − med|, outlier ⇔
    // |v − med| > 5·MAD (robust z ≈ 3.4 under normality).
    //
    // Scale shape: q227's VALUE-DOMAIN-grid pattern — one map-side-
    // combinable count to (type, value) cells, then every window,
    // join and re-aggregation runs on the grid (distinct quantized
    // values × types, bounded by the value domain, NOT the corpus).
    // Selecting a median by cumulative-count rank on the grid is
    // O(domain) per type; no per-type sort of raw rows anywhere, so
    // the low-cardinality-window trap (q166's old shape) never
    // appears. MAD = 0 (majority-identical values) degrades to
    // flagging every deviation > 0 — documented, not special-cased.
    QueryDef("q242_mad_outliers",
      (s, dir) => {
        val ev = events(s, dir).select(col("event_type"),
          expr("CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)")
            .as("v"))
        val grid = ev.groupBy(col("event_type"), col("v"))
          .agg(count(lit(1)).as("c"))
        val n = grid.groupBy(col("event_type")).agg(sum(col("c")).as("n"))
        val wv = Window.partitionBy(col("event_type")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val med = grid.join(broadcast(n), "event_type")
          .withColumn("cum", sum(col("c")).over(wv))
          .filter(expr("cum >= (n + 1) DIV 2"))
          .groupBy(col("event_type"), col("n"))
          .agg(min(col("v")).as("med"))
        val devGrid = grid.join(broadcast(med), "event_type")
          .withColumn("dev", expr("abs(v - med)"))
          .groupBy(col("event_type"), col("n"), col("med"), col("dev"))
          .agg(sum(col("c")).as("c"))
        val wd = Window.partitionBy(col("event_type")).orderBy(col("dev"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val mad = devGrid
          .withColumn("cumd", sum(col("c")).over(wd))
          .filter(expr("cumd >= (n + 1) DIV 2"))
          .groupBy(col("event_type"))
          .agg(min(col("dev")).as("mad"))
        devGrid.join(broadcast(mad), "event_type")
          .groupBy(col("event_type"), col("n"), col("med"), col("mad"))
          .agg(
            coalesce(sum(when(col("dev") > col("mad") * 5, col("c"))),
              lit(0L)).as("n_outliers"),
            max(col("dev")).as("max_dev"))
          .select(col("event_type"), col("n"),
            col("med").as("med_fp"), col("mad").as("mad_fp"),
            col("n_outliers"), col("max_dev"),
            expr("n_outliers * 1000000 DIV n").as("outlier_ppm"))
          .orderBy(col("event_type"))
      },
      Some("""WITH v AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v
        |  FROM events),
        |grid AS (SELECT event_type, v, count(*) AS c FROM v GROUP BY 1, 2),
        |n AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n
        |  FROM grid GROUP BY 1),
        |cum AS (
        |  SELECT g.event_type, g.v, n.n,
        |    CAST(sum(g.c) OVER (PARTITION BY g.event_type ORDER BY g.v)
        |      AS BIGINT) AS cum
        |  FROM grid g JOIN n USING (event_type)),
        |med AS (SELECT event_type, n, min(v) AS med
        |  FROM cum WHERE cum >= (n + 1) // 2 GROUP BY 1, 2),
        |dg AS (
        |  SELECT g.event_type, m.n, m.med, abs(g.v - m.med) AS dev,
        |    CAST(sum(g.c) AS BIGINT) AS c
        |  FROM grid g JOIN med m USING (event_type) GROUP BY 1, 2, 3, 4),
        |cumd AS (
        |  SELECT event_type, n, med, dev, c,
        |    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY dev)
        |      AS BIGINT) AS cumd
        |  FROM dg),
        |mad AS (SELECT event_type, min(dev) AS mad
        |  FROM cumd WHERE cumd >= (n + 1) // 2 GROUP BY 1)
        |SELECT dg.event_type, dg.n,
        |  dg.med AS med_fp, mad.mad AS mad_fp,
        |  CAST(coalesce(sum(CASE WHEN dg.dev > 5 * mad.mad THEN dg.c END),
        |    0) AS BIGINT) AS n_outliers,
        |  max(dg.dev) AS max_dev,
        |  CAST(coalesce(sum(CASE WHEN dg.dev > 5 * mad.mad THEN dg.c END),
        |    0) * 1000000 // dg.n AS BIGINT) AS outlier_ppm
        |FROM dg JOIN mad USING (event_type)
        |GROUP BY 1, 2, 3, 4
        |ORDER BY dg.event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // Benford first-digit screen — the classic fabricated-/corrupted-
    // feed detector: naturally-generated multiplicative magnitudes
    // follow P(d) = log10(1 + 1/d); a per-type chi² against that law
    // flags synthetic fills, unit mix-ups and truncation bugs (the
    // testdata's uniform values rightly score huge — the screen's
    // job is the NUMBER, not a verdict). Exact integer form: first
    // significant digit read off the ×10⁴-quantized positive value's
    // decimal string (identical on both engines — integers print
    // without leading zeros); expected shares are the standard ×10⁶
    // Benford constants as a 9-row literal table; chi²×10⁶ =
    // Σ (obs·10⁶ − n·exp)² DIV (n·exp) with the square in
    // DECIMAL(38,0)/HUGEINT (passes 2^63 at ~3·10³ rows/type — the
    // q137 overflow-contract class). `worst_digit` is the largest
    // absolute ppm deviation (smallest digit on ties).
    //
    // Scale shape: one map-side-combinable count to (type, digit)
    // cells, then everything runs on the ≤ 9·|types| grid — the
    // digit domain is constant, so the screen is one aggregation
    // pass at any corpus size. Zero-count digits still contribute
    // n·exp to chi² via the types × digits cross of two tiny tables.
    QueryDef("q246_benford",
      (s, dir) => {
        import s.implicits._
        val benford = Seq(1 -> 301030L, 2 -> 176091L, 3 -> 124939L,
          4 -> 96910L, 5 -> 79181L, 6 -> 66947L, 7 -> 57992L,
          8 -> 51153L, 9 -> 45757L).toDF("digit", "exp_ppm")
        val ev = events(s, dir).select(col("event_type"),
          expr("CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)")
            .as("v"))
          .filter(col("v") > 0)
        val obs = ev
          .withColumn("digit",
            expr("CAST(substring(CAST(v AS STRING), 1, 1) AS INT)"))
          .groupBy(col("event_type"), col("digit"))
          .agg(count(lit(1)).as("c"))
        val n = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        val grid = n.crossJoin(broadcast(benford))
          .join(obs, Seq("event_type", "digit"), "left")
          .withColumn("c", coalesce(col("c"), lit(0L)))
          .withColumn("dev", expr("c * 1000000 - n * exp_ppm"))
        grid.groupBy(col("event_type"), col("n"))
          .agg(
            expr("CAST(sum(CAST(dev AS DECIMAL(38,0)) * dev DIV " +
              "(CAST(n AS DECIMAL(38,0)) * exp_ppm)) AS BIGINT)")
              .as("chi2_fp"),
            // scalar argmin key: larger |dev| dominates, digit breaks
            // ties (digit ∈ 1..9 < 16) — DuckDB's min_by has no
            // composite-key overload, so both engines use the same
            // integer key
            expr("min_by(digit, CAST(-abs(dev) AS DECIMAL(38,0)) * 16 " +
              "+ digit)").as("worst_digit"),
            max(when(col("digit") === 1,
              expr("c * 1000000 DIV n"))).as("d1_obs_ppm"))
          .select(col("event_type"), col("n"), col("chi2_fp"),
            col("worst_digit"), col("d1_obs_ppm"))
          .orderBy(col("event_type"))
      },
      Some("""WITH benford(digit, exp_ppm) AS (VALUES
        |  (1, 301030), (2, 176091), (3, 124939), (4, 96910), (5, 79181),
        |  (6, 66947), (7, 57992), (8, 51153), (9, 45757)),
        |v AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v
        |  FROM events
        |  WHERE CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) > 0),
        |obs AS (
        |  SELECT event_type,
        |    CAST(substring(CAST(v AS VARCHAR), 1, 1) AS INT) AS digit,
        |    count(*) AS c
        |  FROM v GROUP BY 1, 2),
        |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM v GROUP BY 1),
        |grid AS (
        |  SELECT n.event_type, n.n, b.digit, b.exp_ppm,
        |    CAST(coalesce(obs.c, 0) AS BIGINT) AS c,
        |    CAST(coalesce(obs.c, 0) AS BIGINT) * 1000000
        |      - n.n * b.exp_ppm AS dev
        |  FROM n CROSS JOIN benford b
        |  LEFT JOIN obs ON obs.event_type = n.event_type
        |    AND obs.digit = b.digit)
        |SELECT event_type, n,
        |  CAST(sum(CAST(dev AS HUGEINT) * dev
        |    // (CAST(n AS HUGEINT) * exp_ppm)) AS BIGINT) AS chi2_fp,
        |  CAST(min_by(digit, CAST(-abs(dev) AS HUGEINT) * 16 + digit)
        |    AS INT) AS worst_digit,
        |  CAST(max(CASE WHEN digit = 1 THEN c * 1000000 // n END)
        |    AS BIGINT) AS d1_obs_ppm
        |FROM grid
        |GROUP BY 1, 2
        |ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // CUSUM change-point screen — where did this metric's level
    // shift? Classic cumulative-sum statistic per event type over the
    // daily grid, in a DIVISION-FREE exact integer form: with daily
    // (n_d, s_d = Σv·10⁴) and per-type totals (N, V), the scaled
    // deviation dev_d = s_d·N − V·n_d sums to EXACTLY ZERO over all
    // days (it telescopes), so its running sum S_d is a bridge whose
    // extreme |S_d| marks the most likely single change point — the
    // same argmax CUSUM locates with float means, ×(N·V) to clear
    // both denominators. Reported per type: the arg-max day, the
    // signed excursion as ppm of V·N (level-shift size × duration,
    // scale-free), and the day count. Products are DECIMAL(38,0)/
    // HUGEINT per the q137 overflow contract (s_d·N passes 2⁶³ at
    // ~10⁵ rows/day·type of 10⁴-quantized values).
    //
    // Scale shape: one map-side-combinable hash-agg to the (type,
    // day) grid; every window/join after it runs on the ~30·|types|
    // grid rows. The q227/q242 grid discipline, on the time axis.
    QueryDef("q249_cusum",
      (s, dir) => {
        val ev = events(s, dir).select(col("event_type"),
          expr("ts_ms DIV 86400000").as("day"),
          expr("CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)")
            .as("v"))
        val daily = ev.groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("n_d"), sum(col("v")).as("s_d"))
        val tot = daily.groupBy(col("event_type"))
          .agg(sum(col("n_d")).as("n_tot"), sum(col("s_d")).as("v_tot"),
            count(lit(1)).as("n_days"))
        val wS = Window.partitionBy(col("event_type")).orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val bridged = daily.join(broadcast(tot), "event_type")
          .withColumn("dev", expr(
            "CAST(s_d AS DECIMAL(38,0)) * n_tot - " +
              "CAST(v_tot AS DECIMAL(38,0)) * n_d"))
          .withColumn("s_cum", sum(col("dev")).over(wS))
          .withColumn("a_cum", abs(col("s_cum")))
        val peak = bridged.groupBy(col("event_type"))
          .agg(max(col("a_cum")).as("peak"))
        bridged.join(broadcast(peak), "event_type")
          .filter(col("a_cum") === col("peak"))
          .groupBy(col("event_type"), col("n_days"), col("n_tot"),
            col("v_tot"), col("peak"))
          .agg(min(col("day")).as("change_day"),
            min_by(col("s_cum"), col("day")).as("s_at"))
          .select(col("event_type"), col("n_days"), col("change_day"),
            expr("CAST(s_at * 1000000 DIV (CAST(v_tot AS DECIMAL(38,0)) " +
              "* n_tot) AS BIGINT)").as("cusum_ppm"))
          .orderBy(col("event_type"))
      },
      Some("""WITH ev AS (
        |  SELECT event_type,
        |    epoch_ms(CAST(ts AS TIMESTAMP)) // 86400000 AS day,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v
        |  FROM events),
        |daily AS (
        |  SELECT event_type, day, CAST(count(*) AS BIGINT) AS n_d,
        |    CAST(sum(v) AS BIGINT) AS s_d
        |  FROM ev GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, CAST(sum(n_d) AS BIGINT) AS n_tot,
        |    CAST(sum(s_d) AS BIGINT) AS v_tot,
        |    CAST(count(*) AS BIGINT) AS n_days
        |  FROM daily GROUP BY 1),
        |bridged AS (
        |  SELECT d.event_type, d.day, t.n_days, t.n_tot, t.v_tot,
        |    sum(CAST(d.s_d AS HUGEINT) * t.n_tot
        |      - CAST(t.v_tot AS HUGEINT) * d.n_d)
        |      OVER (PARTITION BY d.event_type ORDER BY d.day) AS s_cum
        |  FROM daily d JOIN tot t USING (event_type)),
        |peak AS (
        |  SELECT event_type, max(abs(s_cum)) AS peak
        |  FROM bridged GROUP BY 1)
        |SELECT b.event_type, b.n_days, min(b.day) AS change_day,
        |  CAST(min_by(b.s_cum, b.day) * 1000000
        |    // (CAST(max(b.v_tot) AS HUGEINT) * max(b.n_tot)) AS BIGINT)
        |    AS cusum_ppm
        |FROM bridged b JOIN peak p ON p.event_type = b.event_type
        |  AND abs(b.s_cum) = p.peak
        |GROUP BY 1, 2
        |ORDER BY b.event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // Clamped running balance — the nonlinear recurrence
    // b_t = max(0, b_{t−1} + d_t) (inventory that can't go negative,
    // a prepaid wallet, a queue depth) looks window-inexpressible
    // because the clamp is applied at EVERY step, but it has an exact
    // prefix-form: b_t = S_t − min(0, min_{j≤t} S_j) with S the plain
    // prefix sum — each clamp "forgives" exactly the amount the
    // running minimum dropped below zero, so the deepest minimum so
    // far is the only state the recurrence carries. (Proof shape: by
    // induction both sides agree at every step; pinned against the
    // literal sequential fold in NewOpsSpec.) Credits: signup grants
    // 100.0000; debits: each purchase spends its value; floor 0.
    //
    // Scale shape: two STACKED windows (running sum, running min) on
    // ONE user_id exchange — q193's discipline; user_id is
    // high-cardinality so no bucketing is needed. Final per-user
    // balances then roll up per type-of-user-activity day count.
    QueryDef("q253_clamped_balance",
      (s, dir) => {
        val ev = events(s, dir)
          .filter(col("event_type").isin("signup", "purchase"))
          .select(col("user_id"), col("ts_ms"), col("event_id"),
            when(col("event_type") === "signup", lit(1000000L))
              .otherwise(expr(
                "-CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)"))
              .as("d"))
        // the END-state balance needs only the prefix-sum column: with
        // S_N = sum(d) and M_N = min over prefix sums, b_N = S_N −
        // min(0, M_N) — ONE window, one exchange, then a hash-agg
        val w = "PARTITION BY user_id ORDER BY ts_ms, event_id"
        ev.withColumn("s_run", expr(s"sum(d) OVER ($w)"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_moves"),
            expr("sum(d) - least(0L, min(s_run))").as("balance_fp"),
            expr("-least(0L, min(s_run))").as("forgiven_fp"))
          .orderBy(col("user_id"))
      },
      Some(s"""WITH ev AS (
        |  SELECT user_id, $tsMs AS ts_ms, event_id,
        |    CASE WHEN event_type = 'signup' THEN 1000000
        |      ELSE -CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)
        |      END AS d
        |  FROM events WHERE event_type IN ('signup', 'purchase')),
        |run AS (
        |  SELECT user_id, d,
        |    sum(d) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id)
        |      AS s_run
        |  FROM ev)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_moves,
        |  CAST(sum(d) - least(0, min(s_run)) AS BIGINT) AS balance_fp,
        |  CAST(-least(0, min(s_run)) AS BIGINT) AS forgiven_fp
        |FROM run GROUP BY user_id
        |ORDER BY user_id""".stripMargin)),

    // ------------------------------------------------------------------
    // Out-of-order depth profile — the number every Structured
    // Streaming job needs BEFORE choosing `withWatermark`: for each
    // event in ARRIVAL order (event_id — the ingest sequence), how
    // far behind the running max event-time did it arrive? Per type:
    // out-of-order ppm, max depth, and the exact p99 depth — set the
    // watermark there and 99% of late data is admitted.
    //
    // Scale shape: the running max over arrival order is the fourth
    // member of the bucketed low-cardinality-window family (q166
    // gaps, q239 lag-2 products, q241 per-row backfill — here the
    // statistic is MAX, the friendliest: associative and
    // prefix-monotone). 256 arrival buckets, in-bucket running max,
    // per-bucket max prefix-maxed on the ≤256-row summary and
    // broadcast back; depth = max(in-bucket running max, previous
    // buckets' max) − ts. The p99 selection runs on a (type, depth
    // DIV 1s) GRID (q242's cumulative-rank discipline), never on raw
    // rows.
    QueryDef("q254_ooo_depth",
      (s, dir) => {
        val nBuckets = 256L
        val ev = events(s, dir)
          .select(col("event_type"), col("event_id"), col("ts_ms"))
        val Seq(minId, maxId) = ev
          .agg(min(col("event_id")), max(col("event_id")))
          .head().toSeq.map(_.asInstanceOf[Long])
        val width = math.max(1L, (maxId - minId + nBuckets) / nBuckets)
        val w = "PARTITION BY event_type, bucket ORDER BY event_id"
        val rows = ev
          .withColumn("bucket", expr(s"(event_id - ${minId}L) DIV ${width}L"))
          .withColumn("run_in", expr(s"max(ts_ms) OVER ($w)"))
        val bounds = rows.groupBy(col("event_type"), col("bucket"))
          .agg(max(col("ts_ms")).as("b_max"))
          .withColumn("prev_max", expr("max(b_max) OVER (PARTITION BY " +
            "event_type ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING " +
            "AND 1 PRECEDING)"))
          .select(col("event_type"), col("bucket"), col("prev_max"))
        val depths = rows
          .join(broadcast(bounds), Seq("event_type", "bucket"))
          .withColumn("depth",
            expr("greatest(run_in, coalesce(prev_max, run_in)) - ts_ms"))
        val grid = depths
          .groupBy(col("event_type"), expr("depth DIV 1000").as("dsec"))
          .agg(count(lit(1)).as("c"))
        val n = grid.groupBy(col("event_type")).agg(sum(col("c")).as("n"))
        val wc = Window.partitionBy(col("event_type")).orderBy(col("dsec"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val p99 = grid.join(broadcast(n), "event_type")
          .withColumn("cum", sum(col("c")).over(wc))
          .filter(expr("cum * 100 >= n * 99"))
          .groupBy(col("event_type"), col("n"))
          .agg(min(col("dsec")).as("p99_depth_sec"))
        grid.groupBy(col("event_type"))
          .agg(coalesce(sum(when(col("dsec") > 0, col("c"))), lit(0L))
            .as("n_late_1s"),
            max(col("dsec")).as("max_depth_sec"))
          .join(p99, "event_type")
          .select(col("event_type"), col("n"),
            expr("n_late_1s * 1000000 DIV n").as("ooo_ppm"),
            col("p99_depth_sec"), col("max_depth_sec"))
          .orderBy(col("event_type"))
      },
      Some(s"""WITH ev AS (
        |  SELECT event_type, event_id, $tsMs AS ts_ms FROM events),
        |runm AS (
        |  SELECT event_type, ts_ms,
        |    max(ts_ms) OVER (PARTITION BY event_type ORDER BY event_id)
        |      AS run_max
        |  FROM ev),
        |grid AS (
        |  SELECT event_type, (run_max - ts_ms) // 1000 AS dsec,
        |    count(*) AS c
        |  FROM runm GROUP BY 1, 2),
        |n AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n
        |  FROM grid GROUP BY 1),
        |p99 AS (
        |  SELECT g.event_type, n.n, min(g.dsec) AS p99_depth_sec
        |  FROM (SELECT event_type, dsec, c,
        |          sum(c) OVER (PARTITION BY event_type ORDER BY dsec)
        |            AS cum
        |        FROM grid) g JOIN n USING (event_type)
        |  WHERE g.cum * 100 >= n.n * 99
        |  GROUP BY 1, 2)
        |SELECT g.event_type, p99.n,
        |  CAST(coalesce(sum(CASE WHEN g.dsec > 0 THEN g.c END), 0)
        |    * 1000000 // p99.n AS BIGINT) AS ooo_ppm,
        |  p99.p99_depth_sec,
        |  max(g.dsec) AS max_depth_sec
        |FROM grid g JOIN p99 ON p99.event_type = g.event_type
        |GROUP BY 1, 2, 4
        |ORDER BY g.event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // Seasonal-naive forecast eval (MASE) — the sanity baseline every
    // event-volume forecast must beat: predict each day's count with
    // the SAME WEEKDAY last week (lag 7), and score it as the Mean
    // Absolute Scaled Error — Σ|c_d − c_{d−7}| over Σ|c_d − c_{d−1}|,
    // the lag-1 naive as the scale. MASE < 10⁶ (ppm fixed point)
    // means weekly seasonality is real signal (the weekly forecast
    // beats persistence); ≥10⁶ means the series has no usable weekly
    // structure. Pure integer counts, one DIV at the end.
    //
    // Scale shape: one map-side-combinable count to the (type, day)
    // grid, lag windows on the ~30·|types| grid rows only.
    QueryDef("q255_seasonal_naive",
      (s, dir) => {
        val daily = events(s, dir)
          .groupBy(col("event_type"), expr("ts_ms DIV 86400000").as("day"))
          .agg(count(lit(1)).as("c"))
        val w = "PARTITION BY event_type ORDER BY day"
        daily
          .withColumn("c7", expr(s"lag(c, 7) OVER ($w)"))
          .withColumn("c1", expr(s"lag(c, 1) OVER ($w)"))
          .filter(col("c7").isNotNull)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"),
            sum(abs(col("c") - col("c7"))).as("sae_seasonal"),
            sum(abs(col("c") - col("c1"))).as("sae_naive"))
          .select(col("event_type"), col("n_days"),
            col("sae_seasonal"), col("sae_naive"),
            expr("CASE WHEN sae_naive > 0 THEN " +
              "sae_seasonal * 1000000 DIV sae_naive END").as("mase_ppm"))
          .orderBy(col("event_type"))
      },
      Some(s"""WITH daily AS (
        |  SELECT event_type, $tsMs // 86400000 AS day, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |lagd AS (
        |  SELECT event_type, c,
        |    lag(c, 7) OVER w AS c7, lag(c, 1) OVER w AS c1
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day))
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(abs(c - c7)) AS BIGINT) AS sae_seasonal,
        |  CAST(sum(abs(c - c1)) AS BIGINT) AS sae_naive,
        |  CAST(CASE WHEN sum(abs(c - c1)) > 0 THEN
        |    sum(abs(c - c7)) * 1000000 // sum(abs(c - c1)) END AS BIGINT)
        |    AS mase_ppm
        |FROM lagd WHERE c7 IS NOT NULL
        |GROUP BY 1 ORDER BY event_type""".stripMargin))
  )
}
