package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Q._

/** Data-layout and sampling operators — the write-side half of the
  * 100 TB story. Reading fast at scale is mostly decided before the
  * query runs: how the files were clustered (z-order → multi-column
  * min/max pruning) and how a reproducible subset is drawn
  * (deterministic hash sampling, never `rand()`).
  *
  * The reference ingestor (`binance-di.py:155-191`) writes
  * append-order files with no layout control at all; these operators
  * are what its output would need before a 100 TB corpus is queryable
  * interactively.
  */
object LayoutOps {

  /** Morton/z-order bit-spread: the low 16 bits of `c` spaced out to
    * even bit positions (0,2,4,…,30). Two spread values OR-ed with a
    * 1-bit shift interleave into a z-curve address: sorting by it
    * makes file-level min/max ranges tight on BOTH source dimensions
    * simultaneously, so a 2-D predicate prunes files on either (or
    * both) columns — a 1-D sort can only ever prune on its leading
    * column. Pure integer bit-math, codegen'd, no shuffle beyond the
    * final range partition of the write. */
  def spreadBits16(c: Column): Column = {
    val m = c.bitwiseAND(lit(0xFFFFL))
    val s1 = m.bitwiseOR(shiftleft(m, 8)).bitwiseAND(lit(0x00FF00FFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** z-curve address of two 16-bit dimensions. */
  def zValue(x: Column, y: Column): Column =
    spreadBits16(x).bitwiseOR(shiftleft(spreadBits16(y), 1))

  /** Cluster a frame for writing: range-partition by z-value (files
    * cover disjoint z ranges ⇒ disjoint 2-D tiles) and sort within
    * partitions so parquet row-group stats are tight too. The actual
    * pruning win is pinned by ZOrderSpec; this is the write path a
    * 100 TB backfill would call before `.write.parquet`. */
  def clusterByZ(df: DataFrame, x: Column, y: Column,
      numFiles: Int): DataFrame =
    df.withColumn("zval", zValue(x, y))
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions(col("zval"))

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // z-order address computation over events: dimension 1 = user_id
    // (the key queries filter on), dimension 2 = minute time bucket
    // (the range queries filter on). Every step is exact integer
    // bit-math, so the oracle reproduces it bit-for-bit.
    QueryDef("q77_zorder_address",
      (s, dir) => {
        val ev = events(s, dir)
          .withColumn("x", col("user_id").bitwiseAND(lit(0xFFFFL)))
          .withColumn("y", expr("ts_ms DIV 60000").bitwiseAND(lit(0xFFFFL)))
        ev.select(col("event_id"), col("x"), col("y"),
            zValue(col("x"), col("y")).as("zval"))
          .orderBy(col("zval"), col("event_id"))
      },
      Some("""WITH b AS (
        |  SELECT event_id, user_id & 65535 AS x,
        |    (epoch_ms(CAST(ts AS TIMESTAMP)) // 60000) & 65535 AS y
        |  FROM events),
        |s1 AS (SELECT event_id, x, y,
        |  (x | (x << 8)) & 16711935 AS sx, (y | (y << 8)) & 16711935 AS sy FROM b),
        |s2 AS (SELECT event_id, x, y,
        |  (sx | (sx << 4)) & 252645135 AS sx, (sy | (sy << 4)) & 252645135 AS sy FROM s1),
        |s3 AS (SELECT event_id, x, y,
        |  (sx | (sx << 2)) & 858993459 AS sx, (sy | (sy << 2)) & 858993459 AS sy FROM s2),
        |s4 AS (SELECT event_id, x, y,
        |  (sx | (sx << 1)) & 1431655765 AS sx, (sy | (sy << 1)) & 1431655765 AS sy FROM s3)
        |SELECT event_id, x, y, sx | (sy << 1) AS zval FROM s4
        |ORDER BY zval, event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // Deterministic per-key sample — the reproducible analog of the
    // reference's `--samples N` cap (`binance-di.py:111-115`) for
    // batch corpora: rank within each source by a content-independent
    // hash of the id and keep the first k. Re-running on the same
    // corpus (any partitioning, any cluster size) picks the SAME
    // rows — which `rand()`-sampling cannot promise — and adding
    // documents only perturbs the sample locally. One window shuffle
    // on source; at 100 TB the same shape runs per-partition-key.
    QueryDef("q79_per_key_sample",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("source"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        t(s, dir, "documents")
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 5)
          .select(col("source"), col("rn"), col("doc_id"), col("lang"))
          .orderBy(col("source"), col("rn"))
      },
      Some("""SELECT source, rn, doc_id, lang FROM (
        |  SELECT source, doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn
        |  FROM documents)
        |WHERE rn <= 5
        |ORDER BY source, rn""".stripMargin)),

    // ------------------------------------------------------------------
    // Weighted data mixture — training runs don't consume sources at
    // their natural rates; each source gets a sampling rate and the
    // selection must be reproducible across runs, engines, and
    // partitionings. Same md5-bucket recipe as q73's fixed split, but
    // with per-stratum rates: keep a doc iff its hash bucket falls
    // under its source's rate. Pure map + one hash-agg — join-free,
    // and adding a source never perturbs another source's selection.
    QueryDef("q86_mixture_sample",
      (s, dir) => {
        val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 15),
          16, 10).cast("long") % 100
        // per-source rate 20..97, derived from the source id (a real
        // pipeline reads these from a mixture config; the formula just
        // gives every stratum a distinct rate to exercise)
        val rate = lit(20) +
          (substring(col("source"), 4, 10).cast("int") * 7) % 78
        t(s, dir, "documents")
          .withColumn("kept", bucket < rate)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_total"),
            count_if(col("kept")).as("n_kept"),
            (count_if(col("kept")).cast("double") / count(lit(1)))
              .as("realized_rate"))
          .orderBy(col("source"))
      },
      Some("""SELECT source, count(*) AS n_total,
        |  count(*) FILTER (WHERE kept) AS n_kept,
        |  CAST(count(*) FILTER (WHERE kept) AS DOUBLE) / count(*)
        |    AS realized_rate
        |FROM (
        |  SELECT source,
        |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |      AS BIGINT) % 100
        |    < 20 + (CAST(substring(source, 4) AS INTEGER) * 7) % 78 AS kept
        |  FROM documents)
        |GROUP BY source
        |ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------------
    // Scalable global row numbering — "give every training example a
    // stable id". The naive `row_number() OVER (ORDER BY key)` plans
    // a SINGLE-partition window (the whole corpus through one task —
    // dead at 100 TB). The scalable equivalent: range-bucket the key,
    // rank WITHIN buckets (parallel), and add per-bucket offsets
    // computed from a bucket-count cumsum — a window over only
    // n_buckets rows, broadcast back. Same answer as the naive form,
    // which is exactly what the oracle runs.
    QueryDef("q95_global_index",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // FIXED bucket count (not fixed width): the offsets table and
        // its cumsum window stay nBuckets rows no matter the corpus
        // size. The width comes from a 1-row min/max agg — a
        // column-pruned pass; like zipWithIndex this is inherently a
        // two-pass algorithm, and re-scanning one pruned column beats
        // materializing the corpus.
        val nBuckets = 256L
        val docs = t(s, dir, "documents").select(col("doc_id"), col("source"))
        val Array(minId, maxId) = docs
          .agg(min(col("doc_id")), max(col("doc_id")))
          .head().toSeq.map(_.asInstanceOf[Long]).toArray
        val width = math.max(1L, (maxId - minId + nBuckets) / nBuckets)
        // Integer division, not (x / width).cast("long"): the double
        // form is only exact while id magnitudes stay under ~2^53;
        // DIV makes bucket assignment exact by construction.
        val bucketed = docs.withColumn("bucket",
          expr(s"(doc_id - ${minId}L) DIV ${width}L"))
        val offsets = bucketed.groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"))
          .withColumn("offset",
            coalesce(sum(col("n")).over(Window.orderBy(col("bucket"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("bucket"), col("offset"))
        val wInBucket = Window.partitionBy(col("bucket"))
          .orderBy(col("doc_id"))
        bucketed.join(broadcast(offsets), "bucket")
          .withColumn("idx",
            col("offset") + row_number().over(wInBucket) - 1)
          .select(col("doc_id"), col("source"), col("idx"))
          .orderBy(col("idx"))
      },
      Some("""SELECT doc_id, source,
        |  CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) - 1 AS idx
        |FROM documents
        |ORDER BY idx""".stripMargin)),

    // ------------------------------------------------------------------
    // Curriculum ordering — rank documents by a quality signal WITHIN
    // each source (percent_rank ∈ [0,1]), the sort key curriculum
    // training samples by ("easy/clean first"). Per-source windows
    // partition naturally, so unlike q95's global index this is one
    // ordinary partitioned window; the quality signal here is the
    // stopword-ratio × length heuristic from q31.
    QueryDef("q96_curriculum",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val tk = split(trim(lower(col("text"))), "\\s+")
        val stop = Seq("the", "a", "of", "and", "to")
        val w = Window.partitionBy(col("source"))
          .orderBy(col("quality").desc, col("doc_id"))
        t(s, dir, "documents")
          .withColumn("quality",
            (size(filter(tk, x => x.isInCollection(stop))).cast("double")
              / size(tk)) * least(size(tk), lit(400)).cast("double"))
          .select(col("source"), col("doc_id"), col("quality"),
            percent_rank().over(w).as("curriculum_pct"))
          .orderBy(col("source"), col("curriculum_pct"), col("doc_id"))
      },
      Some("""SELECT source, doc_id, quality,
        |  percent_rank() OVER (PARTITION BY source
        |    ORDER BY quality DESC, doc_id) AS curriculum_pct
        |FROM (
        |  SELECT source, doc_id,
        |    CAST(len(list_filter(tk, x -> x IN ('the','a','of','and','to')))
        |      AS DOUBLE) / len(tk) * least(len(tk), 400) AS quality
        |  FROM (SELECT source, doc_id,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS tk
        |    FROM documents))
        |ORDER BY source, curriculum_pct, doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // Sequence PACKING — fill fixed token-budget training sequences
    // (budget 256) by a deterministic doc order (md5 of doc_id: a
    // stable shuffle, the same reproducibility rule as q73's split).
    // A doc's bin = its exclusive cumulative token count div budget —
    // the standard streaming-pack rule (docs straddle boundaries;
    // offset_in_bin says where each starts). The global cumsum is the
    // q95 pattern, NOT a single-partition window: the md5-prefix
    // bucket (256 buckets) preserves the hash order, cumsums run
    // per-bucket in parallel, and only the 256-row bucket-total table
    // pays a global window before broadcasting back.
    QueryDef("q99_sequence_pack",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val budget = 256L
        val docs = t(s, dir, "documents")
          .select(col("doc_id"),
            size(split(trim(lower(col("text"))), "\\s+")).cast("long")
              .as("n_tokens"),
            md5(col("doc_id").cast("string")).as("h"))
          .withColumn("bucket", substring(col("h"), 1, 2))
        val offsets = docs.groupBy(col("bucket"))
          .agg(sum(col("n_tokens")).as("tot"))
          .withColumn("bucket_off",
            coalesce(sum(col("tot")).over(Window.orderBy(col("bucket"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("bucket"), col("bucket_off"))
        val wInBucket = Window.partitionBy(col("bucket"))
          .orderBy(col("h"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        docs.join(broadcast(offsets), "bucket")
          .withColumn("cum_before",
            col("bucket_off") + coalesce(sum(col("n_tokens"))
              .over(wInBucket), lit(0L)))
          .select(col("doc_id"), col("n_tokens"),
            // integer DIV, not double `/`: exact at any magnitude
            expr(s"cum_before DIV $budget").as("bin"),
            (col("cum_before") % budget).as("offset_in_bin"))
          .orderBy(col("bin"), col("offset_in_bin"), col("doc_id"))
      },
      Some("""WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+'))
        |      AS BIGINT) AS n_tokens,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_before
        |  FROM d)
        |SELECT doc_id, n_tokens,
        |  CAST(cum_before // 256 AS BIGINT) AS bin,
        |  CAST(cum_before % 256 AS BIGINT) AS offset_in_bin
        |FROM c
        |ORDER BY bin, offset_in_bin, doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // Packing-efficiency report — the systems readout on q99's
    // sequence packing: bins used, fill rate against capacity, and
    // how many documents straddle a bin boundary (each straddle is a
    // truncation-or-padding decision downstream). Same two-phase
    // cumsum as q99; the report is one more 1-row aggregate on top,
    // with the fill rate in ×10⁶ integer fixed point.
    QueryDef("q170_pack_efficiency",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val budget = 256L
        val docs = t(s, dir, "documents")
          .select(col("doc_id"),
            size(split(trim(lower(col("text"))), "\\s+")).cast("long")
              .as("n_tokens"),
            md5(col("doc_id").cast("string")).as("h"))
          .withColumn("bucket", substring(col("h"), 1, 2))
        val offsets = docs.groupBy(col("bucket"))
          .agg(sum(col("n_tokens")).as("tot"))
          .withColumn("bucket_off",
            coalesce(sum(col("tot")).over(Window.orderBy(col("bucket"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("bucket"), col("bucket_off"))
        val wInBucket = Window.partitionBy(col("bucket"))
          .orderBy(col("h"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        docs.join(broadcast(offsets), "bucket")
          .withColumn("cum_before",
            col("bucket_off") + coalesce(sum(col("n_tokens"))
              .over(wInBucket), lit(0L)))
          .groupBy()
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            (max(expr(s"(cum_before + n_tokens - 1) DIV $budget")) + 1)
              .as("n_bins"),
            count(when(expr(s"cum_before DIV $budget") =!=
              expr(s"(cum_before + n_tokens - 1) DIV $budget"), 1))
              .as("n_straddling"))
          .select(col("n_docs"), col("total_tokens"), col("n_bins"),
            col("n_straddling"),
            // total_tokens·10⁶ exceeds Long past ~9·10¹² corpus
            // tokens (~35 TB of text — inside the design envelope):
            // DECIMAL(38,0)/HUGEINT on both engines, the q137
            // overflow contract
            expr(s"CAST((CAST(total_tokens AS DECIMAL(38,0)) * 1000000L)" +
              s" div (CAST(n_bins AS DECIMAL(38,0)) * $budget)" +
              " AS BIGINT)").as("fill_fp"))
      },
      Some("""WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+'))
        |      AS BIGINT) AS n_tokens,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_before
        |  FROM d)
        |SELECT count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(max((cum_before + n_tokens - 1) // 256) + 1 AS BIGINT)
        |    AS n_bins,
        |  CAST(count(CASE WHEN cum_before // 256
        |    <> (cum_before + n_tokens - 1) // 256 THEN 1 END) AS BIGINT)
        |    AS n_straddling,
        |  CAST((CAST(sum(n_tokens) AS HUGEINT) * 1000000)
        |    // ((CAST(max((cum_before + n_tokens - 1) // 256) + 1
        |        AS HUGEINT)) * 256) AS BIGINT) AS fill_fp
        |FROM c""".stripMargin)),

    // ------------------------------------------------------------------
    // Token-budget corpus selection — take the best documents (q96's
    // quality signal) until a global token budget (¼ of the corpus)
    // is spent: the "data mixture under a compute budget" op. The
    // ordered prefix-sum uses the q95/q99 two-phase shape, but
    // bucketed on the ORDER KEY itself: quality lives in [0,400], so
    // 256 fixed-width quality ranges give contiguous buckets whose
    // ascending order IS quality-descending order — per-bucket token
    // subtotals cumsum in a 257-row window, broadcast back, and the
    // in-bucket window adds the remainder. No global single-partition
    // sort at any scale; equal-quality ties land in the same bucket
    // so the (quality DESC, doc_id) tiebreak stays entirely local.
    QueryDef("q110_token_budget",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val tk = split(trim(lower(col("text"))), "\\s+")
        val stop = Seq("the", "a", "of", "and", "to")
        val docs = t(s, dir, "documents")
          .select(col("doc_id"),
            size(tk).cast("long").as("n_tokens"),
            (size(filter(tk, x => x.isInCollection(stop))).cast("double")
              / size(tk) * least(size(tk), lit(400)).cast("double"))
              .as("quality"))
          // checkpointed: the budget action, the bucket-offsets agg and
          // the final join would otherwise each re-run the tokenize scan
          .localCheckpoint(false)
        val budget = docs.agg(sum(col("n_tokens"))).head().getLong(0) / 4
        val width = 400.0 / 256
        val bucketed = docs.withColumn("bucket",
          floor((lit(400.0) - col("quality")) / width).cast("long"))
        val offsets = bucketed.groupBy(col("bucket"))
          .agg(sum(col("n_tokens")).as("bt"))
          .withColumn("offset",
            coalesce(sum(col("bt")).over(Window.orderBy(col("bucket"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("bucket"), col("offset"))
        val wIn = Window.partitionBy(col("bucket"))
          .orderBy(col("quality").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        bucketed.join(broadcast(offsets), "bucket")
          .withColumn("cum", col("offset") + sum(col("n_tokens")).over(wIn))
          .filter(col("cum") <= budget)
          .select(col("doc_id"), col("n_tokens"), col("cum"))
          .orderBy(col("cum"))
      },
      Some("""WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(tk) AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(tk, x -> x IN ('the','a','of','and','to')))
        |      AS DOUBLE) / len(tk) * least(len(tk), 400) AS quality
        |  FROM (SELECT doc_id,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS tk
        |    FROM documents)),
        |b AS (SELECT CAST(sum(n_tokens) AS BIGINT) // 4 AS budget FROM d),
        |o AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum
        |  FROM d)
        |SELECT doc_id, n_tokens, cum
        |FROM o CROSS JOIN b WHERE cum <= budget ORDER BY cum""".stripMargin)),

    // ------------------------------------------------------------------
    // ABC / Pareto analysis — how much of revenue the top parts
    // carry: per-part revenue (exact DECIMAL→cents integer), global
    // cumulative share over the revenue-descending order via the
    // q95/q110 two-phase bucketed cumsum (range-bucket on the VALUE
    // key — never a single-partition window over all parts), then
    // the A/B/C class cut at 80%/95% cumulative share as integer
    // cross products (cum·100 vs total·80). Output: per-class part
    // counts and revenue share — the 80/20 readout.
    QueryDef("q169_pareto",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // checkpointed: the stats action below would otherwise run the
        // lineitem scan + hash-agg once for min/max/total and the main
        // plan a second time — the per-part table is 3000× smaller
        // than the scan, so materializing it costs less than one re-scan
        val rev = t(s, dir, "lineitem")
          .groupBy(col("l_partkey"))
          .agg(sum(money(col("l_extendedprice")) * 10000)
            .cast("long").as("cents"))
          .localCheckpoint(false)
        val Array(minC, maxC, total) = rev
          .agg(min(col("cents")), max(col("cents")), sum(col("cents")))
          .head().toSeq.map(_.asInstanceOf[Long]).toArray
        val nBuckets = 256L
        val width = math.max(1L, (maxC - minC + nBuckets) / nBuckets)
        // bucket 0 = HIGHEST revenue (descending order key)
        val bucketed = rev.withColumn("bucket",
          expr(s"(${maxC}L - cents) DIV ${width}L"))
        val offsets = bucketed.groupBy(col("bucket"))
          .agg(sum(col("cents")).as("bs"))
          .withColumn("offset",
            coalesce(sum(col("bs")).over(Window.orderBy(col("bucket"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("bucket"), col("offset"))
        val wIn = Window.partitionBy(col("bucket"))
          .orderBy(col("cents").desc, col("l_partkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        bucketed.join(broadcast(offsets), "bucket")
          .withColumn("cum", col("offset") + sum(col("cents")).over(wIn))
          .withColumn("class",
            when(col("cum") * 100 <= lit(total) * 80, "A")
              .when(col("cum") * 100 <= lit(total) * 95, "B")
              .otherwise("C"))
          .groupBy(col("class"))
          .agg(count(lit(1)).as("n_parts"), sum(col("cents")).as("cents"))
          .select(col("class"), col("n_parts"),
            (col("cents").cast("double") / 10000).as("revenue"),
            // divide-first form: cents·10⁶ overflows long at the ×10⁴
            // price scale, so share_fp = cents div (total div 10⁶) —
            // identical integer arithmetic in both engines
            expr(s"cents div (${total}L div 1000000L)").as("share_fp"))
          .orderBy(col("class"))
      },
      Some("""WITH rev AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(14,4)) * 10000)
        |      AS BIGINT) AS cents
        |  FROM lineitem GROUP BY l_partkey),
        |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM rev),
        |c AS (
        |  SELECT l_partkey, cents,
        |    CAST(sum(cents) OVER (ORDER BY cents DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM rev),
        |cl AS (
        |  SELECT CASE WHEN cum * 100 <= (SELECT total FROM tot) * 80
        |      THEN 'A'
        |    WHEN cum * 100 <= (SELECT total FROM tot) * 95 THEN 'B'
        |    ELSE 'C' END AS class, cents
        |  FROM c)
        |SELECT class, count(*) AS n_parts,
        |  CAST(sum(cents) AS DOUBLE) / 10000 AS revenue,
        |  CAST(sum(cents) AS BIGINT)
        |    // ((SELECT total FROM tot) // 1000000) AS share_fp
        |FROM cl GROUP BY class ORDER BY class""".stripMargin)),

    // ------------------------------------------------------------------
    // Deterministic EPOCH SHUFFLE — the dataloader-order op a training
    // run needs to be reproducible: epoch e's order is the rank of
    // md5(e:doc_id), so any worker on any cluster (or an auditor in a
    // different engine) derives the identical permutation with no
    // coordination and no persisted shuffle files. Global rank uses
    // q95's two-phase trick, but hash UNIFORMITY removes q95's min/max
    // pre-pass: fixed-width buckets over the known 2^60 hash space are
    // balanced by construction, so the only full-data ops are one
    // hash-agg (bucket counts) and one per-(epoch, bucket) window.
    // The head of each epoch's order ships with an ORDER-SENSITIVE
    // integer checksum over the WHOLE permutation — Σ(pos+1)·(doc_id
    // mod 1000003), exact in a long through sf1 scale (~1.4e18 max;
    // a production audit would fold mod 2^61-1) — so the oracle pins
    // every position, not just the sampled head.
    QueryDef("q180_epoch_shuffle",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val nEpochs = 3
        val docs = t(s, dir, "documents").select(col("doc_id"))
          .withColumn("epoch",
            explode(array((0 until nEpochs).map(lit): _*)))
          .withColumn("h",
            conv(substring(md5(concat(col("epoch").cast("string"), lit(":"),
              col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long"))
          // 2^60 hash space / 256 buckets = 2^52 per bucket
          .withColumn("bucket", expr("h DIV 4503599627370496"))
        val offsets = docs.groupBy(col("epoch"), col("bucket"))
          .agg(count(lit(1)).as("n"))
          .withColumn("offset",
            coalesce(sum(col("n")).over(Window.partitionBy(col("epoch"))
              .orderBy(col("bucket"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("epoch"), col("bucket"), col("offset"))
        val wInBucket = Window.partitionBy(col("epoch"), col("bucket"))
          .orderBy(col("h"), col("doc_id"))
        val ranked = docs.join(broadcast(offsets), Seq("epoch", "bucket"))
          .withColumn("pos",
            col("offset") + row_number().over(wInBucket) - 1)
        val stats = ranked.groupBy(col("epoch"))
          .agg(count(lit(1)).as("n_docs"),
            sum((col("pos") + 1) * (col("doc_id") % 1000003))
              .as("order_checksum"))
        ranked.filter(col("pos") < 5)
          .join(broadcast(stats), Seq("epoch"))
          .select(col("epoch"), col("pos"), col("doc_id"),
            col("n_docs"), col("order_checksum"))
          .orderBy(col("epoch"), col("pos"))
      },
      Some("""WITH e AS (SELECT * FROM (VALUES (0),(1),(2)) t(epoch)),
        |sk AS (SELECT epoch, doc_id,
        |        CAST(('0x' || substring(md5(CAST(epoch AS VARCHAR) || ':'
        |          || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |       FROM documents CROSS JOIN e),
        |rk AS (SELECT epoch, doc_id,
        |        row_number() OVER (PARTITION BY epoch ORDER BY h, doc_id)
        |          - 1 AS pos FROM sk),
        |st AS (SELECT epoch, count(*) AS n_docs,
        |        CAST(sum((pos + 1) * (doc_id % 1000003)) AS BIGINT)
        |          AS order_checksum FROM rk GROUP BY 1)
        |SELECT rk.epoch, rk.pos, rk.doc_id, st.n_docs, st.order_checksum
        |FROM rk JOIN st ON rk.epoch = st.epoch
        |WHERE rk.pos < 5
        |ORDER BY rk.epoch, rk.pos""".stripMargin)),

    // ------------------------------------------------------------------
    // Small-file compaction planner — the storage-side sibling of
    // q99's training-sequence packing. A crawl ingest leaves behind
    // many under-sized files (modeled here as per-(source, doc_id
    // DIV 32) groups with byte sizes from n_chars); the planner
    // assigns whole input files, in file_id order, to target-sized
    // output files by their starting byte offset (first-fit in
    // order — each output overflows by at most one input file). The
    // prefix sum is the two-phase bucketed form: bucket = file_id DIV
    // 256 preserves order, so per-bucket subtotals from one hash-agg
    // compose through a per-source window over ~n_files/256 rows —
    // never a single-partition window over the file catalog (which at
    // 100 TB is millions of rows even though the DATA never moves:
    // compaction planning reads only the catalog).
    QueryDef("q184_compaction_plan",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val target = 65536L
        val files = t(s, dir, "documents")
          .groupBy(col("source"), expr("doc_id DIV 32").as("file_id"))
          .agg(sum(col("n_chars")).as("bytes"),
            count(lit(1)).as("n_docs"))
        val buckets = files
          .groupBy(col("source"), expr("file_id DIV 256").as("bkt"))
          .agg(sum(col("bytes")).as("tot"))
          .withColumn("bkt_off",
            coalesce(sum(col("tot")).over(Window.partitionBy(col("source"))
              .orderBy(col("bkt"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("source"), col("bkt"), col("bkt_off"))
        val wIn = Window.partitionBy(col("source"), col("bkt"))
          .orderBy(col("file_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        files.withColumn("bkt", expr("file_id DIV 256"))
          .join(broadcast(buckets), Seq("source", "bkt"))
          .withColumn("cum_before",
            col("bkt_off") + coalesce(sum(col("bytes")).over(wIn), lit(0L)))
          .withColumn("out_file", expr(s"cum_before DIV $target"))
          .groupBy(col("source"), col("out_file"))
          .agg(count(lit(1)).as("n_files"), sum(col("n_docs")).as("n_docs"),
            sum(col("bytes")).as("bytes"))
          .orderBy(col("source"), col("out_file"))
      },
      Some("""WITH f AS (
        |  SELECT source, doc_id // 32 AS file_id,
        |    CAST(sum(n_chars) AS BIGINT) AS bytes,
        |    CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY source, doc_id // 32),
        |c AS (
        |  SELECT source, file_id, bytes, n_docs,
        |    coalesce(sum(bytes) OVER (PARTITION BY source ORDER BY file_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_before
        |  FROM f)
        |SELECT source, CAST(cum_before // 65536 AS BIGINT) AS out_file,
        |  CAST(count(*) AS BIGINT) AS n_files,
        |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
        |  CAST(sum(bytes) AS BIGINT) AS bytes
        |FROM c GROUP BY source, cum_before // 65536
        |ORDER BY source, out_file""".stripMargin)),

    // ------------------------------------------------------------------
    // File-skipping stats index — the zone-map simulation that closes
    // the layout story: per-file min/max column stats (the file
    // catalog a lakehouse keeps; files modeled as the q184 groups)
    // evaluated against a range predicate, reporting how many files a
    // scan PRUNES without opening vs how many docs it must actually
    // read. This is the quantitative readout behind q77's z-order and
    // ScaleReadSpec's pruning proofs: at 100 TB the difference
    // between n_docs_scanned and n_docs_matching is the I/O a better
    // layout (tighter per-file ranges) eliminates. One scan, two
    // hash-aggs, all integers.
    QueryDef("q188_file_skip_index",
      (s, dir) => {
        val lo = 900L; val hi = 1200L
        val files = t(s, dir, "documents")
          .groupBy(col("source"), expr("doc_id DIV 32").as("file_id"))
          .agg(min(col("n_chars")).as("mn"), max(col("n_chars")).as("mx"),
            count(lit(1)).as("n_docs"),
            count(when(col("n_chars").between(lo, hi), 1)).as("n_match"))
        files
          .withColumn("skipped",
            (col("mx") < lo || col("mn") > hi).cast("long"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_files"),
            sum(col("skipped")).as("n_files_skipped"),
            sum(when(col("skipped") === 0, col("n_docs"))
              .otherwise(lit(0L))).as("n_docs_scanned"),
            sum(col("n_match")).as("n_docs_matching"))
          .orderBy(col("source"))
      },
      Some("""WITH f AS (
        |  SELECT source, doc_id // 32 AS file_id,
        |    min(n_chars) AS mn, max(n_chars) AS mx,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(count(CASE WHEN n_chars BETWEEN 900 AND 1200 THEN 1 END)
        |      AS BIGINT) AS n_match
        |  FROM documents GROUP BY source, doc_id // 32)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_files,
        |  CAST(sum(CASE WHEN mx < 900 OR mn > 1200 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_files_skipped,
        |  CAST(sum(CASE WHEN mx < 900 OR mn > 1200 THEN 0 ELSE n_docs END)
        |    AS BIGINT) AS n_docs_scanned,
        |  CAST(sum(n_match) AS BIGINT) AS n_docs_matching
        |FROM f GROUP BY source ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------------
    // Stratified eval-split quota via largest-remainder (Hamilton)
    // allocation — how a 5% eval budget is split across (source,
    // lang) strata so that Σ quota = budget EXACTLY and each
    // stratum's share is within one doc of proportional (floor
    // quotas first, then +1 to the strata with the largest
    // remainders). Naive round(n·p) drifts from the budget by up to
    // one doc per stratum. The ideal-share product n_docs·budget is
    // computed in DECIMAL(38,0)/HUGEINT on both engines: at 10^11
    // docs (100 TB of text) the long product would wrap silently in
    // Spark while DuckDB raised — the q137 overflow contract. The
    // windows run over the STRATA table (sources × langs — bounded
    // cardinality, like q99's 256-bucket offset window), never over
    // per-doc rows.
    QueryDef("q185_stratified_quota",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val wAll = Window.partitionBy()
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val strata = t(s, dir, "documents")
          .groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("n_docs"))
        val alloc = strata
          .withColumn("n_total", sum(col("n_docs")).over(wAll))
          .withColumn("budget", expr("n_total DIV 20"))
          .withColumn("base_quota", expr(
            "CAST(CAST(n_docs AS DECIMAL(38,0)) * budget DIV n_total AS BIGINT)"))
          .withColumn("rem", expr(
            "CAST(CAST(n_docs AS DECIMAL(38,0)) * budget % n_total AS BIGINT)"))
        alloc
          .withColumn("leftover",
            col("budget") - sum(col("base_quota")).over(wAll))
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("rem").desc, col("source"), col("lang"))))
          .withColumn("extra",
            when(col("rnk") <= col("leftover"), 1L).otherwise(0L))
          .select(col("source"), col("lang"), col("n_docs"),
            col("base_quota"), col("extra"),
            (col("base_quota") + col("extra")).as("quota"))
          .orderBy(col("source"), col("lang"))
      },
      Some("""WITH s AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY source, lang),
        |a AS (
        |  SELECT source, lang, n_docs,
        |    sum(n_docs) OVER () AS n_total,
        |    sum(n_docs) OVER () // 20 AS budget
        |  FROM s),
        |b AS (
        |  SELECT source, lang, n_docs, budget,
        |    CAST((CAST(n_docs AS HUGEINT) * budget) // n_total AS BIGINT)
        |      AS base_quota,
        |    CAST((CAST(n_docs AS HUGEINT) * budget) % n_total AS BIGINT)
        |      AS rem
        |  FROM a),
        |r AS (
        |  SELECT source, lang, n_docs, base_quota,
        |    budget - sum(base_quota) OVER () AS leftover,
        |    row_number() OVER (ORDER BY rem DESC, source, lang) AS rnk
        |  FROM b)
        |SELECT source, lang, n_docs, base_quota,
        |  CAST(CASE WHEN rnk <= leftover THEN 1 ELSE 0 END AS BIGINT)
        |    AS extra,
        |  CAST(base_quota + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END
        |    AS BIGINT) AS quota
        |FROM r ORDER BY source, lang""".stripMargin)),

    // ------------------------------------------------------------------
    // Weighted SYSTEMATIC sampling — select ~50 documents with
    // inclusion probability proportional to length (n_chars), the
    // deterministic alternative to Poisson/Bernoulli sampling every
    // reproducible-pipeline spec prefers: lay all docs on the
    // cumulative-weight axis in doc_id order and pick the doc under
    // every stride-th tick (stride = total_weight / 50). Selection is
    // pure integer arithmetic — a doc is picked iff its cumulative
    // interval (cum-w, cum] crosses a stride boundary — so the oracle
    // hash-matches, and unlike rand()-based sampling a re-run over
    // the same corpus returns the identical sample.
    //
    // Scale shape: the global cumulative sum uses q95's two-phase
    // bucketed prefix sum (a 256-row offsets table broadcast back; no
    // single-partition window), and the weight total is a 1-row agg
    // of that same offsets table — the corpus column is scanned for
    // weights exactly once.
    QueryDef("q191_systematic_sample",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val nBuckets = 256L
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        val Array(minId, maxId) = docs
          .agg(min(col("doc_id")), max(col("doc_id")))
          .head().toSeq.map(_.asInstanceOf[Long]).toArray
        val width = math.max(1L, (maxId - minId + nBuckets) / nBuckets)
        // Integer division, not (x / width).cast("long"): the double
        // form is only exact while id magnitudes stay under ~2^53;
        // DIV makes bucket assignment exact by construction.
        val bucketed = docs.withColumn("bucket",
          expr(s"(doc_id - ${minId}L) DIV ${width}L"))
        val perBucket = bucketed.groupBy(col("bucket"))
          .agg(sum(col("n_chars")).as("wsum"))
        val offsets = perBucket
          .withColumn("offset",
            coalesce(sum(col("wsum")).over(Window.orderBy(col("bucket"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("bucket"), col("offset"))
        val total = perBucket.agg(sum(col("wsum"))).head().getLong(0)
        val stride = math.max(1L, total / 50L)
        val wInBucket = Window.partitionBy(col("bucket"))
          .orderBy(col("doc_id"))
        bucketed.join(broadcast(offsets), "bucket")
          .withColumn("cum", col("offset") +
            sum(col("n_chars")).over(wInBucket
              .rowsBetween(Window.unboundedPreceding, 0)))
          .filter(expr(s"cum DIV ${stride}L > (cum - n_chars) DIV ${stride}L"))
          .select(col("doc_id"), col("source"), col("n_chars"), col("cum"),
            expr(s"cum DIV ${stride}L").as("slot"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH w AS (
        |  SELECT doc_id, source, n_chars,
        |    CAST(sum(n_chars) OVER (ORDER BY doc_id) AS BIGINT) AS cum
        |  FROM documents),
        |st AS (
        |  SELECT greatest(CAST(sum(n_chars) AS BIGINT) // 50, 1) AS stride
        |  FROM documents)
        |SELECT doc_id, source, n_chars, cum,
        |  CAST(cum // stride AS BIGINT) AS slot
        |FROM w, st
        |WHERE cum // stride > (cum - n_chars) // stride
        |ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // Rendezvous (highest-random-weight) sharding — the elastic
    // placement rule distributed stores use so that GROWING the shard
    // count moves only the documents that land on the NEW shard
    // (~1/(n+1) of the corpus), instead of rehash-scattering
    // everything the way `hash(id) % n` does. Each doc goes to the
    // shard with the highest md5(doc:shard) weight; the query assigns
    // under 8 and under 9 shards and reports per-shard occupancy and
    // move-ins — every n_moved_in for shards 0-7 is provably zero
    // (dropping a candidate never changes an argmax among the rest),
    // which the hash-compare against the oracle re-proves on real
    // data.
    //
    // Scale shape: embarrassingly parallel — |docs|×9 weight rows
    // built map-side from the instruction stream, one max_by
    // hash-agg keyed by doc, one |shards|-row rollup. No joins at
    // all; this is the shape that keeps placement recomputable by
    // any worker with no routing table.
    QueryDef("q199_rendezvous_shards",
      (s, dir) => {
        val weights = t(s, dir, "documents").select(col("doc_id"))
          .withColumn("shard", explode(sequence(lit(0), lit(8))))
          .withColumn("w", conv(substring(md5(
            concat(col("doc_id").cast("string"), lit(":"),
              col("shard").cast("string"))), 1, 15), 16, 10)
            .cast("long"))
        weights.groupBy(col("doc_id"))
          .agg(expr("max_by(shard, w)").as("a9"),
            expr("max_by(shard, CASE WHEN shard < 8 THEN w END)").as("a8"))
          .groupBy(col("a9").cast("long").as("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("a8") =!= col("a9"), 1L).otherwise(0L))
              .as("n_moved_in"))
          .orderBy(col("shard"))
      },
      Some("""WITH wts AS (
        |  SELECT doc_id, shard,
        |    CAST(('0x' || substring(md5(doc_id::VARCHAR || ':' ||
        |      shard::VARCHAR), 1, 15)) AS BIGINT) AS w
        |  FROM documents, (SELECT unnest(range(9)) AS shard)),
        |asg AS (
        |  SELECT doc_id, max_by(shard, w) AS a9,
        |    max_by(shard, CASE WHEN shard < 8 THEN w END) AS a8
        |  FROM wts GROUP BY 1)
        |SELECT CAST(a9 AS BIGINT) AS shard,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(*) FILTER (WHERE a8 <> a9) AS BIGINT) AS n_moved_in
        |FROM asg GROUP BY 1 ORDER BY shard""".stripMargin)),

    // ------------------------------------------------------------------
    // Priority sampling (Duffield-Lund-Thorup, JACM 2007) — the
    // weighted analog of q79's deterministic hash sample: each doc
    // gets priority w/u for a hash-uniform u, and the global top-k by
    // priority is a weighted-without-replacement sample whose
    // subset-sum estimates are provably near-optimal. The float
    // w/u ordering is replaced by the EXACT integer surrogate
    // (w << 40) DIV (h40 + 1) with h40 the top 40 bits of the 60-bit
    // md5 integer — same ordering (integer DIV is monotone in the
    // real ratio at fixed denominator-set), but pure int64 ops that
    // hash-match the oracle where ln()/pow() floats would not (the
    // catalog rule q122/q128 follow). Weights are capped at 10^6 so
    // w·2^40 stays under 2^63 at any corpus size. Scale shape:
    // TakeOrderedAndProject — per-partition top-k heaps, one k-row
    // collect, NO shuffle of the corpus; re-running on re-partitioned
    // data returns the identical sample.
    QueryDef("q219_priority_sample",
      (s, dir) => {
        // integer DIV, not `/`: the 60-bit hash exceeds double's 2^53
        // exact range, so a float division would misassign h40
        val h60 = conv(substring(md5(col("doc_id").cast("string")), 1, 15),
          16, 10).cast("long")
        t(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"),
            h60.as("h60"),
            expr("greatest(least(n_chars, 1000000), 1)").as("w"))
          .withColumn("h40", expr("h60 DIV 1048576"))
          .withColumn("priority",
            expr("(w * 1099511627776) DIV (h40 + 1)"))
          .select(col("doc_id"), col("source"), col("n_chars"),
            col("priority"))
          .orderBy(col("priority").desc, col("doc_id"))
          .limit(100)
      },
      Some("""WITH h AS (
        |  SELECT doc_id, source, n_chars,
        |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |      AS BIGINT) // 1048576 AS h40,
        |    greatest(least(n_chars, 1000000), 1) AS w
        |  FROM documents)
        |SELECT doc_id, source, n_chars,
        |  CAST(w * 1099511627776 // (h40 + 1) AS BIGINT) AS priority
        |FROM h
        |ORDER BY priority DESC, doc_id
        |LIMIT 100""".stripMargin)),

    // ------------------------------------------------------------------
    // Column shape profile for encoding decisions — the layout pass a
    // 100 TB writer runs before choosing parquet encodings: per
    // candidate column, cardinality, the heaviest value's share, and
    // Gini impurity 1 − Σp² (the log-free concentration measure — a
    // float-entropy Σp·log p would hash-diverge across engines, and
    // impurity induces the same dictionary-vs-plain decision). Σc² is
    // computed in DECIMAL(38,0) per the q137 overflow contract (c can
    // reach corpus size, so c² passes 2^63 at ~3×10⁹ rows); the final
    // share/impurity doubles are each ONE division of exact values.
    // Scale shape: one hash-agg per column (map-side partials), a
    // 1-row reduce each — the corpus is scanned once per column and
    // only the profiled column is read (column pruning reaches the
    // parquet scan).
    QueryDef("q221_column_impurity",
      (s, dir) => {
        def prof(df: DataFrame, cname: String): DataFrame =
          df.groupBy(col(cname).as("v"))
            .agg(count(lit(1)).as("c"))
            .agg(sum(col("c")).as("n"),
              count(lit(1)).as("n_distinct"),
              max(col("c")).as("top_c"),
              sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("sumsq"))
            .select(lit(cname).as("column_name"),
              col("n"), col("n_distinct"),
              (col("top_c").cast("double") / col("n").cast("double"))
                .as("top_share"),
              (lit(1.0) - col("sumsq").cast("double") /
                (col("n").cast("double") * col("n").cast("double")))
                .as("impurity"),
              when(col("n_distinct") * 20 <= col("n"), "dict")
                .otherwise("plain").as("encoding"))
        val docs = t(s, dir, "documents")
        prof(docs, "lang")
          .unionAll(prof(docs, "source"))
          .unionAll(prof(events(s, dir), "event_type"))
          .orderBy(col("column_name"))
      },
      Some("""WITH
        |p1 AS (SELECT 'lang' AS column_name, count(*) AS c
        |  FROM documents GROUP BY lang),
        |p2 AS (SELECT 'source' AS column_name, count(*) AS c
        |  FROM documents GROUP BY source),
        |p3 AS (SELECT 'event_type' AS column_name, count(*) AS c
        |  FROM events GROUP BY event_type),
        |u AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2
        |  UNION ALL SELECT * FROM p3)
        |SELECT column_name,
        |  CAST(sum(c) AS BIGINT) AS n,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_share,
        |  1.0 - CAST(CAST(sum(CAST(c AS HUGEINT) * c) AS DECIMAL(38,0))
        |      AS DOUBLE) /
        |    (CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE)) AS impurity,
        |  CASE WHEN count(*) * 20 <= CAST(sum(c) AS BIGINT)
        |    THEN 'dict' ELSE 'plain' END
        |    AS encoding
        |FROM u GROUP BY column_name
        |ORDER BY column_name""".stripMargin)),

    // ------------------------------------------------------------------
    // Hilbert-curve clustering address — q77's z-order companion on
    // the SAME (user bucket, minute bucket) dimensions, computed by
    // the native codegen'd [[graft.functions.HilbertIndex]]
    // expression (order-16 xy2d bit walk, §2.10 ladder rung (b): a
    // Catalyst Expression where built-in functions can't express the
    // iterative rotate). Sorting files by this address instead of
    // zval gives ~⅓ tighter per-file bounding boxes for the same
    // file count (HilbertSpec pins the locality win), i.e. fewer
    // row groups read per 2-D predicate at 100 TB. The oracle walks
    // the identical 16 rounds as a recursive CTE — pure integer
    // state, so the addresses hash-match exactly. Scale shape: per-
    // row integer bit math inside whole-stage codegen, then the same
    // total sort a clustering write would range-partition by.
    QueryDef("q225_hilbert_order",
      (s, dir) => {
        graft.functions.HilbertIndex.register(s)
        events(s, dir)
          .withColumn("x", col("user_id").bitwiseAND(lit(0xFFFFL)))
          .withColumn("y", expr("ts_ms DIV 60000").bitwiseAND(lit(0xFFFFL)))
          .select(col("event_id"), col("x"), col("y"),
            expr("hilbert_xy2d(x, y)").as("hval"))
          .orderBy(col("hval"), col("event_id"))
      },
      Some("""WITH RECURSIVE b AS (
        |  SELECT event_id, user_id & 65535 AS x,
        |    (epoch_ms(CAST(ts AS TIMESTAMP)) // 60000) & 65535 AS y
        |  FROM events),
        |hil AS (
        |  SELECT event_id, x AS x0, y AS y0, x, y,
        |    CAST(0 AS BIGINT) AS d, CAST(32768 AS BIGINT) AS s
        |  FROM b
        |  UNION ALL
        |  SELECT event_id, x0, y0,
        |    CASE WHEN ry = 0
        |      THEN (CASE WHEN rx = 1 THEN s - 1 - y ELSE y END)
        |      ELSE x END AS x,
        |    CASE WHEN ry = 0
        |      THEN (CASE WHEN rx = 1 THEN s - 1 - x ELSE x END)
        |      ELSE y END AS y,
        |    d + s * s * (CASE WHEN rx = 1 AND ry = 1 THEN 2
        |      WHEN rx = 1 THEN 3 WHEN ry = 1 THEN 1 ELSE 0 END) AS d,
        |    s // 2 AS s
        |  FROM (
        |    SELECT event_id, x0, y0, x, y, d, s,
        |      CASE WHEN (x & s) > 0 THEN 1 ELSE 0 END AS rx,
        |      CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END AS ry
        |    FROM hil WHERE s > 0))
        |SELECT event_id, x0 AS x, y0 AS y, d AS hval
        |FROM hil WHERE s = 0
        |ORDER BY hval, event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // α-temperature mixing weights — the multinomial sampling-rate
    // computation every multi-source pretraining run does (XLM-R /
    // mT5 style): raw source shares p_s = tokens_s/Σtokens get
    // smoothed to q_s ∝ p_s^α with α = ½, boosting the tail feeds a
    // proportional draw would starve. EXACT integer form: p^½ order-
    // statistics via isqrt — floor(sqrt(tokens)) is bit-identical
    // cross-engine below 2⁵² (IEEE sqrt is correctly rounded, floor
    // of it is exact for BIGINT magnitudes), weights normalized to
    // ppm by integer DIV, raw ppm reported beside so the flattening
    // is visible in the output itself. Grounds q185's quota split:
    // this query produces the target shares q185 allocates against.
    //
    // Scale shape: one narrow scan → per-source hash-agg (map-side
    // combinable) → arithmetic on the |sources| summary. The token
    // count reuses the same whitespace tokenizer contract as the
    // TextOps postings family.
    QueryDef("q248_mix_weights",
      (s, dir) => {
        val per = t(s, dir, "documents")
          .select(col("source"),
            size(split(trim(lower(col("text"))), "\\s+")).cast("long")
              .as("ntok"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("tokens"))
          .withColumn("sq",
            expr("CAST(floor(sqrt(CAST(tokens AS DOUBLE))) AS BIGINT)"))
        val Seq(totTok, totSq) = per
          .agg(sum(col("tokens")), sum(col("sq")))
          .head().toSeq.map(_.asInstanceOf[Long])
        per.select(col("source"), col("n_docs"), col("tokens"),
          expr(s"tokens * 1000000 DIV ${totTok}L").as("raw_ppm"),
          expr(s"sq * 1000000 DIV ${totSq}L").as("weight_ppm"))
          .orderBy(col("source"))
      },
      Some("""WITH per AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(regexp_split_to_array(trim(lower(text)),
        |      '\s+'))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY 1),
        |sq AS (
        |  SELECT source, n_docs, tokens,
        |    CAST(floor(sqrt(CAST(tokens AS DOUBLE))) AS BIGINT) AS sq
        |  FROM per),
        |tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS tt,
        |    CAST(sum(sq) AS BIGINT) AS ts FROM sq)
        |SELECT source, CAST(n_docs AS BIGINT) AS n_docs, tokens,
        |  CAST(tokens * 1000000 // (SELECT tt FROM tot) AS BIGINT)
        |    AS raw_ppm,
        |  CAST(sq * 1000000 // (SELECT ts FROM tot) AS BIGINT)
        |    AS weight_ppm
        |FROM sq ORDER BY source""".stripMargin))
  )
}
