package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{Envelope, Streams}

/** Streaming semantics (SURVEY.md §2.9) pinned with MemoryStream:
  * per-key sample limiting across micro-batches, watermarked tumbling
  * windows, and the stateful per-key counter.
  */
class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    q.processAllAvailable(); q.stop()
  }

  test("S3/T7 limitPerKeyStream caps each (stream,symbol) across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Envelope]
    val q = Streams.limitPerKeyStream(in.toDS(), 3)
      .writeStream.format("memory").queryName("limited")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    in.addData((1 to 5).map(i => Envelope("ticker", "BTC", s"a$i")))
    q.processAllAvailable()
    in.addData((1 to 5).map(i => Envelope("ticker", "BTC", s"b$i")) ++
      (1 to 2).map(i => Envelope("trades", "ETH", s"c$i")))
    drain(q)
    val got = spark.table("limited").as[Envelope].collect()
    assert(got.count(e => e.stream == "ticker") == 3) // capped across batches
    assert(got.count(e => e.stream == "trades") == 2) // under the cap
  }

  test("nearDupStream flags cross-batch simhash near-dups, respects TTL") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{SigDoc, DupHit}
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val base = 0x0123456789ABCDL        // arbitrary 56-bit signature
    val near = base ^ 0x29L             // 3 bits flipped → Hamming 3
    val far = base ^ 0x3FFFFFFF0L       // 30 bits flipped
    val in = MemoryStream[SigDoc]
    val q = Streams.nearDupStream(in.toDS(), ttlMs = 10 * 60 * 1000L)
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    // batch 1: the base doc and a far doc — no pairs yet
    in.addData(SigDoc(1L, base, t("2024-01-01 10:00:00")),
      SigDoc(3L, far, t("2024-01-01 10:00:00")))
    q.processAllAvailable()
    // batch 2: a near-dup arrives a minute later → must match doc 1
    // ACROSS the batch boundary (state, not in-batch comparison)
    in.addData(SigDoc(2L, near, t("2024-01-01 10:01:00")))
    q.processAllAvailable()
    // batch 3: same signature but past the 10-min TTL window → silent
    in.addData(SigDoc(5L, near, t("2024-01-01 10:30:00")))
    drain(q)
    val hits = spark.table("neardup").as[DupHit].collect()
    val pairs = hits.map(h => (h.doc_id, h.dup_of)).toSet
    assert(pairs == Set((2L, 1L)), s"got $pairs")
    assert(hits.forall(_.hamming == 3))
    // a pair sharing k bands emits k hits — ≥1 here, deduped by the
    // documented dedupStream composition downstream
    assert(hits.nonEmpty)
  }

  test("T2/T3 tumbling window with watermark emits closed windows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = in.toDF().toDF("ts", "symbol", "value")
    val q = Streams.tumblingCounts(df, "ts", "symbol", "1 minute", "1 minute")
      .writeStream.format("memory").queryName("tumbled")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    in.addData(
      (t("2024-01-01 00:00:10"), "BTC", 1.0),
      (t("2024-01-01 00:00:50"), "BTC", 2.0),
      (t("2024-01-01 00:01:10"), "BTC", 4.0))
    q.processAllAvailable()
    // advance watermark past the first window
    in.addData((t("2024-01-01 00:05:00"), "BTC", 8.0))
    drain(q)
    val rows = spark.table("tumbled")
      .select($"symbol", $"n", $"sum_value").collect()
    assert(rows.exists(r => r.getLong(1) == 2 && r.getDouble(2) == 3.0))
  }

  test("T3/T4 sessionizeStream closes on in-batch gap and on timeout") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, java.sql.Timestamp, Double)]
    val ds = in.toDF().toDF("key", "ts", "value")
      .as[graft.streaming.SessionEvent]
    val q = Streams.sessionizeStream(ds, gapMs = 30000L, watermark = "0 seconds")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // batch 1: one chain [00:00, 00:20], then an in-batch gap > 30s
    // opens a second chain at 01:00 — the first emits immediately
    in.addData(
      ("u1", t("2024-01-01 00:00:00"), 1.0),
      ("u1", t("2024-01-01 00:00:20"), 2.0),
      ("u1", t("2024-01-01 00:01:00"), 4.0))
    q.processAllAvailable()
    val afterBatch1 = spark.table("sessions")
      .as[graft.streaming.ClosedSession].collect()
    assert(afterBatch1.length == 1)
    assert(afterBatch1.head.n_events == 2 && afterBatch1.head.sum_value == 3.0)
    assert(afterBatch1.head.end_ms - afterBatch1.head.start_ms == 20000L)
    // batch 2: a far-future event for ANOTHER key advances the
    // watermark past 01:00+gap — u1's held session times out and emits
    in.addData(("u2", t("2024-01-01 01:00:00"), 0.0))
    q.processAllAvailable()
    in.addData(("u2", t("2024-01-01 02:00:00"), 0.0))
    drain(q)
    val all = spark.table("sessions")
      .as[graft.streaming.ClosedSession].collect().sortBy(_.start_ms)
    assert(all.exists(s => s.key == "u1" && s.n_events == 1 &&
      s.sum_value == 4.0), s"timeout session missing in ${all.toSeq}")
  }

  test("sessionizeStream: an out-of-order chain before the open session closes as ONE session") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, java.sql.Timestamp, Double)]
    val ds = in.toDF().toDF("key", "ts", "value")
      .as[graft.streaming.SessionEvent]
    val q = Streams.sessionizeStream(ds, gapMs = 30000L,
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("oosessions")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    in.addData(("u1", t("2024-01-01 12:00:00"), 1.0))
    q.processAllAvailable()
    // within the watermark but > gap BEFORE the open session's start:
    // must NOT be glued into [12:00, ...] (that session would carry a
    // 5-minute internal silence), and the two early events — within
    // gap of EACH OTHER — must merge into one session, not two
    // singletons
    in.addData(("u1", t("2024-01-01 11:55:00"), 8.0),
      ("u1", t("2024-01-01 11:55:10"), 2.0))
    drain(q)
    val rows = spark.table("oosessions")
      .as[graft.streaming.ClosedSession].collect()
    assert(rows.length == 1, rows.toSeq.toString)
    assert(rows.head.n_events == 2 && rows.head.sum_value == 10.0 &&
      rows.head.end_ms - rows.head.start_ms == 10000L, rows.toSeq.toString)
  }

  test("streaming MinHash band index: batch parity across chops, replay-safe") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{MinhashBand, BandCandidate}
    val prevProvider =
      spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // synthetic band rows: docs 1/2/3 collide in band 0 bucket "x"
      // (3 pairs), docs 1/2 ALSO collide in band 1 bucket "y" (the
      // same pair again, different band), doc 4 alone in band 0 "z"
      val rows = Seq(
        MinhashBand(1L, 0L, "x"), MinhashBand(2L, 0L, "x"),
        MinhashBand(3L, 0L, "x"), MinhashBand(1L, 1L, "y"),
        MinhashBand(2L, 1L, "y"), MinhashBand(4L, 0L, "z"))
      // the batch shadow over the same rows: the band self-join
      val expected = (for {
        a <- rows; b <- rows
        if a.band_id == b.band_id && a.bh == b.bh && a.doc_id < b.doc_id
      } yield (a.doc_id, b.doc_id, a.band_id)).toSet
      assert(expected.size == 4)   // fixture sanity: 3 + 1 collisions
      // chop patterns: all-at-once, row-by-row, split-mid-bucket
      val chops = Seq(Seq(rows), rows.map(Seq(_)),
        Seq(rows.take(2), rows.drop(2)))
      chops.zipWithIndex.foreach { case (batches, i) =>
        val in = MemoryStream[MinhashBand]
        val q = Streams.minhashDedupStream(in.toDS())
          .writeStream.format("memory").queryName(s"mhdedup$i")
          .outputMode("append").start()
        batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
        // replay EVERY row (at-least-once delivery): membership-gated
        // state must emit nothing new
        in.addData(rows: _*)
        drain(q)
        val got = spark.table(s"mhdedup$i").as[BandCandidate].collect()
          .map(c => (c.da, c.db, c.band_id))
        assert(got.length == got.toSet.size,
          s"chop $i: duplicate emissions (replay leaked)")
        assert(got.toSet == expected, s"chop $i: $got")
      }
      // bucket cap: with maxBucket = 2, doc 3 is refused by band 0
      // bucket "x" — only the first two members pair
      val in = MemoryStream[MinhashBand]
      val q = Streams.minhashDedupStream(in.toDS(), maxBucket = 2)
        .writeStream.format("memory").queryName("mhcap")
        .outputMode("append").start()
      in.addData(rows: _*)
      drain(q)
      val capped = spark.table("mhcap").as[BandCandidate].collect()
        .map(c => (c.da, c.db, c.band_id)).toSet
      assert(capped == Set((1L, 2L, 0L), (1L, 2L, 1L)), capped.toString)
    } finally spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass", prevProvider)
  }

  test("band-index lifecycle events: capped buckets checkable, drain rebuilds the index") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{BandEvent, MinhashBand}
    val prevProvider =
      spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // bucket "x": docs 1..4 arrive, cap 2 → admits {1,2}, capped
      // {3,4}, one pair; bucket "y": docs 5,6 — under cap, full parity
      val rows = Seq(
        MinhashBand(1L, 0L, "x"), MinhashBand(2L, 0L, "x"),
        MinhashBand(3L, 0L, "x"), MinhashBand(4L, 0L, "x"),
        MinhashBand(5L, 1L, "y"), MinhashBand(6L, 1L, "y"))
      val in = MemoryStream[MinhashBand]
      val q = Streams.bandIndexStream(in.toDS(), maxBucket = 2)
        .writeStream.format("memory").queryName("bandlife")
        .outputMode("append").start()
      in.addData(rows: _*)
      drain(q)
      def events = spark.table("bandlife").as[BandEvent].collect().toSeq
      val admits = events.filter(_.kind == "admit")
        .map(e => (e.da, e.band_id, e.bh)).toSet
      val cappedDocs = events.filter(_.kind == "capped")
        .map(e => (e.da, e.band_id, e.bh)).toSet
      val pairs = events.filter(_.kind == "pair")
        .map(e => (e.da, e.db, e.band_id)).toSet
      // the at-scale parity invariants (ADVICE r11): capped bucket —
      // |admits| == cap, admits ∪ capped == batch bucket, pairs are
      // exactly the admitted pairs; uncapped bucket — full parity
      assert(admits == Set((1L, 0L, "x"), (2L, 0L, "x"),
        (5L, 1L, "y"), (6L, 1L, "y")))
      assert(cappedDocs == Set((3L, 0L, "x"), (4L, 0L, "x")))
      assert(pairs == Set((1L, 2L, 0L), (5L, 6L, 1L)))
      // replay every row: pairs and admits are membership-gated
      // (exactly-once content); capped markers are diagnostic and
      // dedupe by key
      in.addData(rows: _*)
      drain(q)
      val replayed = events
      assert(replayed.filter(_.kind == "admit")
        .map(e => (e.da, e.band_id, e.bh)).toSet == admits)
      assert(replayed.count(_.kind == "admit") == admits.size)
      assert(replayed.count(_.kind == "pair") == pairs.size)
      assert(replayed.filter(_.kind == "capped")
        .map(e => (e.da, e.band_id, e.bh)).toSet == cappedDocs)
      // drain: empty standing ∪ admits rebuilds the capped index —
      // the smallest-`cap` members per bucket (doc-ordered arrival)
      val standing0 = Seq.empty[MinhashBand].toDS().toDF()
      val rebuilt = Streams.bandIndexFromEvents(standing0,
        spark.table("bandlife"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSet
      assert(rebuilt == admits.map { case (d, b, h) => (d, b, h) })
    } finally spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass", prevProvider)
  }

  test("band-index bootstrap from the standing index probes like the shard merge") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{BandEvent, MinhashBand}
    val prevProvider =
      spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // standing index: docs 1,2 share bucket (0,"x"); doc 5 alone in
      // (1,"y"). Arriving shard: doc 3 hits both buckets, doc 4 hits
      // (0,"x") — expected emissions are exactly the q265 delta legs:
      // vs_corpus probes + the within-shard pair, nothing standing
      val standing = Seq(
        MinhashBand(1L, 0L, "x"), MinhashBand(2L, 0L, "x"),
        MinhashBand(5L, 1L, "y")).toDS()
      val shard = Seq(
        MinhashBand(3L, 0L, "x"), MinhashBand(3L, 1L, "y"),
        MinhashBand(4L, 0L, "x"))
      val in = MemoryStream[MinhashBand]
      val q = Streams.bandIndexStreamFrom(standing, in.toDS())
        .writeStream.format("memory").queryName("bandboot")
        .outputMode("append").start()
      // two batches: doc 3 first, then doc 4 (cross-batch state)
      in.addData(shard.take(2): _*)
      q.processAllAvailable()
      in.addData(shard.drop(2): _*)
      drain(q)
      val events = spark.table("bandboot").as[BandEvent].collect().toSeq
      val pairs = events.filter(_.kind == "pair")
        .map(e => (e.da, e.db, e.band_id)).toSet
      assert(pairs == Set(
        (1L, 3L, 0L), (2L, 3L, 0L), (3L, 5L, 1L), // vs corpus
        (1L, 4L, 0L), (2L, 4L, 0L),               // vs corpus
        (3L, 4L, 0L)))                            // within shard
      // seeded members emitted nothing; only shard docs admit
      assert(events.filter(_.kind == "admit").map(_.da).toSet ==
        Set(3L, 4L))
      // drain closes the loop: standing ∪ admits == the index a
      // from-scratch batch build over base ∪ shard would produce
      val rebuilt = Streams.bandIndexFromEvents(standing.toDF(),
        spark.table("bandboot"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSet
      val fromScratch = (standing.collect() ++ shard)
        .map(b => (b.doc_id, b.band_id, b.bh)).toSet
      assert(rebuilt == fromScratch)
    } finally spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass", prevProvider)
  }

  test("bootstrap stream over the real corpus emits exactly q265's delta legs") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, count, lit}
    import graft.streaming.{BandEvent, MinhashBand}
    val prevProvider =
      spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // the SAME base/shard split as the batch merge (q265): stream
      // the shard's band rows into a processor seeded with the base
      // index — the emitted pair multiset must equal the merged
      // artifact's vs_corpus + within_shard legs, band-count for
      // band-count (streaming and batch maintenance agree on real
      // data, not just fixtures)
      val bands = graft.queries.TextOps.minhashBands(spark, sf())
      val isShard = graft.queries.TextOps.docBucket(col("doc_id")) >= 80
      val standing = bands.filter(!isShard).as[MinhashBand]
      val shard = bands.filter(isShard).as[MinhashBand].collect().toSeq
      val in = MemoryStream[MinhashBand]
      val q = Streams.bandIndexStreamFrom(standing, in.toDS())
        .writeStream.format("memory").queryName("bandcorpus")
        .outputMode("append").start()
      // feed the shard in two arbitrary chops (cross-batch state)
      val (h1, h2) = shard.splitAt(shard.size / 2)
      in.addData(h1: _*)
      q.processAllAvailable()
      in.addData(h2: _*)
      drain(q)
      val streamed = spark.table("bandcorpus").as[BandEvent]
        .filter(col("kind") === "pair")
        .groupBy(col("da"), col("db"))
        .agg(count(lit(1)).as("n_bands"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val batchLegs = SparkEntry
        .queries("q265_incremental_index_merge")(spark, sf())
        .filter(col("kind") =!= "standing")
        .select(col("da"), col("db"), col("n_bands"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(streamed == batchLegs)
    } finally spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass", prevProvider)
  }

  test("transformWithState CDC view: latest-wins, stale drops, tombstones") {
    implicit val sqlCtx = spark.sqlContext
    val prevProvider =
      spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    // transformWithState requires the RocksDB state store (also the
    // at-scale choice: state off-heap per executor, not JVM maps)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[graft.streaming.KeyedChange]
      val q = Streams.latestStateStream(in.toDS())
        .writeStream.format("memory").queryName("cdcview")
        .outputMode("update").start()
      import graft.streaming.KeyedChange
      in.addData(KeyedChange(1L, 100L, "upsert", 1.0),
        KeyedChange(1L, 200L, "upsert", 2.0),
        KeyedChange(2L, 100L, "upsert", 9.0))
      q.processAllAvailable()
      // stale change (older ts) must not regress key 1's view
      in.addData(KeyedChange(1L, 150L, "upsert", 7.0))
      q.processAllAvailable()
      // tombstone clears key 2
      in.addData(KeyedChange(2L, 300L, "delete", 0.0))
      q.processAllAvailable()
      // late upsert OLDER than the delete must NOT resurrect key 2
      // (the tombstone is retained state, not a bare clear)
      in.addData(KeyedChange(2L, 250L, "upsert", 5.0))
      drain(q)
      val rows = spark.table("cdcview")
        .as[graft.streaming.KeyedState].collect()
      // batch 1 emitted the merged newest per key; later batches
      // emitted nothing (stale drop, tombstone, post-delete stale)
      assert(rows.length == 2, rows.toSeq.toString)
      val k1 = rows.find(_.key == 1L).get
      assert(k1.ts_ms == 200L && k1.value == 2.0)
      assert(rows.find(_.key == 2L).get.value == 9.0)
    } finally spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass", prevProvider)
  }

  test("transformWithState funnel: converts within window, times out pending views") {
    implicit val sqlCtx = spark.sqlContext
    val prevProvider =
      spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Long, java.sql.Timestamp, String)]
      val ds = in.toDF().toDF("key", "ts", "kind")
        .as[graft.streaming.FunnelEvent]
      val q = Streams.funnelStream(ds, withinMs = 60000L,
          watermark = "5 minutes")
        .writeStream.format("memory").queryName("conversions")
        .outputMode("append").start()
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      // u1 converts within 60s; u2 views and never buys; u4's
      // purchase arrives BEFORE its view (cross-batch out-of-order)
      in.addData((1L, t("2024-01-01 12:00:00"), "view"),
        (1L, t("2024-01-01 12:00:30"), "purchase"),
        (2L, t("2024-01-01 12:00:10"), "view"),
        (4L, t("2024-01-01 12:05:00"), "purchase"))
      q.processAllAvailable()
      // the late view still converts against the buffered purchase —
      // output must not depend on which batch each side landed in
      in.addData((4L, t("2024-01-01 12:04:40"), "view"))
      q.processAllAvailable()
      // push the watermark far past every pending window (timers
      // fire, state GC'd), then a too-late purchase cannot convert
      in.addData((3L, t("2024-01-01 13:30:00"), "view"))
      q.processAllAvailable()
      in.addData((2L, t("2024-01-01 13:30:01"), "purchase"))
      drain(q)
      val rows = spark.table("conversions")
        .as[graft.streaming.Conversion].collect().sortBy(_.key)
      assert(rows.map(_.key).toSeq == Seq(1L, 4L), rows.toSeq.toString)
      assert(rows(0).latency_ms == 30000L)
      assert(rows(1).latency_ms == 20000L)
      // pin the timer GC itself: the state store reported removals
      // when the watermark passed the pending windows
      val removed = q.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsRemoved).sum
      assert(removed > 0, "expected timer-driven state GC to remove rows")
    } finally spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass", prevProvider)
  }

  test("transformWithState survives a checkpointed stop/restart (T6)") {
    implicit val sqlCtx = spark.sqlContext
    val prevProvider =
      spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-tws-ckpt").toString
      val in = MemoryStream[graft.streaming.KeyedChange]
      import graft.streaming.KeyedChange
      // memory sink can't recover from a checkpoint; foreachBatch can
      val got =
        new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double, Long)]
      def start() = Streams.latestStateStream(in.toDS())
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[graft.streaming.KeyedState],
           _: Long) =>
            batch.collect().foreach(s => got.add((s.ts_ms, s.value, s.n_changes)))
            ()
        }
        .start()
      val q1 = start()
      in.addData(KeyedChange(7L, 100L, "upsert", 1.0))
      q1.processAllAvailable()
      q1.stop()
      // restart from the same checkpoint: the RocksDB state must
      // come back, so a STALE change (older ts) is still rejected
      val q2 = start()
      in.addData(KeyedChange(7L, 50L, "upsert", 9.0))
      q2.processAllAvailable()
      in.addData(KeyedChange(7L, 200L, "upsert", 2.0))
      drain(q2)
      // emitted: (100, 1.0) before restart, (200, 2.0) after; the
      // stale (50, 9.0) emitted nothing because restored state won
      import scala.collection.JavaConverters._
      val rows = got.asScala.toSeq.sortBy(_._1)
      assert(rows.map(r => (r._1, r._2)) == Seq((100L, 1.0), (200L, 2.0)),
        rows.toString)
      assert(rows.last._3 == 3L) // stale change still counted
    } finally spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass", prevProvider)
  }

  test("T4 runningCountPerKey accumulates state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Envelope]
    val q = Streams.runningCountPerKey(in.toDS())
      .toDF("key", "n")
      .writeStream.format("memory").queryName("counts")
      .outputMode("update").start()
    in.addData(Seq.fill(4)(Envelope("ticker", "BTC", "x")))
    q.processAllAvailable()
    in.addData(Seq.fill(3)(Envelope("ticker", "BTC", "y")))
    drain(q)
    val last = spark.table("counts").filter($"key" === "ticker:BTC")
      .agg(max($"n")).head().getLong(0)
    assert(last == 7L)
  }

  test("stream-static enrichment joins each batch against the dim, no state") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Double)]
    val dim = Seq(("BTC", "Bitcoin"), ("ETH", "Ethereum"))
      .toDF("symbol", "asset_name")
    val q = Streams.streamStaticEnrich(
      in.toDF().toDF("symbol", "price"), dim, "symbol")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    in.addData(("BTC", 100.0), ("ETH", 50.0), ("DOGE", 0.1))
    drain(q)
    val rows = spark.table("enriched")
      .select($"symbol", $"asset_name", $"price").collect()
    assert(rows.length == 2) // inner join: unknown symbol dropped
    assert(rows.exists(r => r.getString(0) == "BTC"
      && r.getString(1) == "Bitcoin" && r.getDouble(2) == 100.0))
  }

  test("stream-static AS-OF enrich picks latest version at-or-before, across batches") {
    implicit val sqlCtx = spark.sqlContext
    // time-versioned dim: BTC listed at t=10 (v=1.0), re-rated at t=20
    // (v=2.0); ETH has one version at t=15
    val dim = Seq(("BTC", 10L, 1.0), ("BTC", 20L, 2.0), ("ETH", 15L, 3.0))
      .toDF("sym", "vts", "payload")
    val in = MemoryStream[(String, Long)]
    val q = Streams.asOfEnrichStream(in.toDF().toDF("sym", "ts"), dim,
      "sym", "sym", "ts", "vts", "payload")
      .writeStream.format("memory").queryName("asof_enriched")
      .outputMode("append").start()
    in.addData(("BTC", 5L), ("BTC", 10L), ("BTC", 25L))
    q.processAllAvailable()
    in.addData(("BTC", 15L), ("ETH", 14L), ("ETH", 16L), ("XRP", 99L))
    drain(q)
    val got = spark.table("asof_enriched")
      .select($"sym", $"ts", $"payload", $"asof_ts").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2),
        if (r.isNullAt(3)) null else r.getLong(3))).toSet
    assert(got == Set(
      ("BTC", 5L, null, null),      // before first version
      ("BTC", 10L, 1.0, 10L),       // tie admits the version
      ("BTC", 25L, 2.0, 20L),       // latest version wins
      ("BTC", 15L, 1.0, 10L),       // second batch, between versions
      ("ETH", 14L, null, null),
      ("ETH", 16L, 3.0, 15L),
      ("XRP", 99L, null, null)))    // unknown key null-extends

    // same semantics as the native batch operator on the same data
    val batchLeft = got.map(t => (t._1, t._2)).toSeq
      .toDF("sym", "ts")
    val batch = graft.plans.AsOfJoin.backward(batchLeft,
        dim.select($"sym".as("dsym"), $"vts", $"payload"),
        Seq("sym"), Seq("dsym"), "ts", "vts")
      .select($"sym", $"ts", $"payload", $"vts".as("asof_ts")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2),
        if (r.isNullAt(3)) null else r.getLong(3))).toSet
    assert(batch == got)
  }

  test("stream-stream join matches within the event-time range only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(java.sql.Timestamp, Long, String)]
    val buys = MemoryStream[(java.sql.Timestamp, Long, String)]
    val j = Streams.streamStreamJoin(
      clicks.toDF().toDF("ts", "user_id", "page"),
      buys.toDF().toDF("ts", "user_id", "item"),
      "user_id", "ts", within = "5 minutes")
      .selectExpr("l.user_id AS user_id", "page", "item")
    val q = j.writeStream.format("memory").queryName("joined")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    clicks.addData((t("2024-01-01 00:00:00"), 1L, "home"))
    buys.addData(
      (t("2024-01-01 00:03:00"), 1L, "in-range"),
      (t("2024-01-01 00:09:00"), 1L, "too-late"),
      (t("2024-01-01 00:03:30"), 2L, "wrong-user"))
    q.processAllAvailable(); q.stop()
    val items = spark.table("joined").select($"item").as[String].collect()
    assert(items.toSeq == Seq("in-range"))
  }

  test("streaming dedup drops repeated keys across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = in.toDF().toDF("ts", "id", "value")
    val q = Streams.dedupStream(df, "ts", Seq("id"), "10 minutes")
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    in.addData(
      (t("2024-01-01 00:00:01"), "a", 1.0),
      (t("2024-01-01 00:00:02"), "a", 2.0), // dup in-batch
      (t("2024-01-01 00:00:03"), "b", 3.0))
    q.processAllAvailable()
    in.addData((t("2024-01-01 00:00:04"), "a", 4.0)) // dup across batches
    q.processAllAvailable(); q.stop()
    val ids = spark.table("deduped").select($"id").as[String].collect()
    assert(ids.sorted.toSeq == Seq("a", "b"))
  }

  test("A7 streaming OHLCV matches the batch computation") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = in.toDF().toDF("ts", "symbol", "value")
    val q = Streams.ohlcvStream(df, "ts", "symbol", "1 minute", "1 minute")
      .writeStream.format("memory").queryName("candles")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    in.addData(
      (t("2024-01-01 00:00:05"), "BTC", 10.0),
      (t("2024-01-01 00:00:20"), "BTC", 30.0),
      (t("2024-01-01 00:00:40"), "BTC", 5.0),
      (t("2024-01-01 00:00:55"), "BTC", 20.0))
    q.processAllAvailable()
    in.addData((t("2024-01-01 00:05:00"), "BTC", 1.0))
    drain(q)
    val c = spark.table("candles").filter($"n_trades" === 4).head()
    assert(c.getAs[Double]("open") == 10.0)
    assert(c.getAs[Double]("high") == 30.0)
    assert(c.getAs[Double]("low") == 5.0)
    assert(c.getAs[Double]("close") == 20.0)
    assert(c.getAs[Double]("volume") == 65.0)
  }

  test("transformWithState heavy hitters: emit once per closed window") {
    implicit val sqlCtx = spark.sqlContext
    val prevProvider =
      spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(java.sql.Timestamp, String)]
      val ds = in.toDF().toDF("ts", "item")
        .as[graft.streaming.WindowedItem]
      val q = Streams.heavyHittersStream(ds, windowMs = 60000L, k = 2,
          watermark = "1 minute")
        .writeStream.format("memory").queryName("hh")
        .outputMode("append").start()
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      // window [12:00, 12:01): a×3, b×2, c×1 — split across batches
      in.addData((t("2024-01-01 12:00:01"), "a"),
        (t("2024-01-01 12:00:02"), "b"), (t("2024-01-01 12:00:03"), "a"))
      q.processAllAvailable()
      in.addData((t("2024-01-01 12:00:10"), "c"),
        (t("2024-01-01 12:00:11"), "a"), (t("2024-01-01 12:00:12"), "b"))
      q.processAllAvailable()
      // nothing emitted while the window is open
      assert(spark.table("hh").count() == 0)
      // advance the watermark past the window end → timer fires once
      in.addData((t("2024-01-01 12:05:00"), "z"))
      drain(q)
      val rows = spark.table("hh")
        .as[graft.streaming.WindowTopK].collect().sortBy(_.rank)
      assert(rows.length == 2, rows.toSeq.toString)
      assert(rows(0).item == "a" && rows(0).n == 3L)
      assert(rows(1).item == "b" && rows(1).n == 2L)
      assert(rows.forall(_.window_start_ms ==
        t("2024-01-01 12:00:00").getTime))
    } finally spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass", prevProvider)
  }

  test("sessionizeStream converges to the q229 batch shadow on real events") {
    implicit val sqlCtx = spark.sqlContext
    // the full sf0.001 events table, replayed in event-time order in
    // three micro-batches; watermark 0s (in-order feed ⇒ no drops)
    val rows = graft.queries.Q.events(spark, sf())
      .select(col("user_id"), col("ts_ms"), col("value"))
      .collect()
      .map(r => (r.getLong(0).toString,
        new java.sql.Timestamp(r.getLong(1)), r.getDouble(2)))
      .sortBy(r => (r._2.getTime, r._1))
    val in = MemoryStream[(String, java.sql.Timestamp, Double)]
    val ds = in.toDF().toDF("key", "ts", "value")
      .as[graft.streaming.SessionEvent]
    val q = Streams.sessionizeStream(ds, gapMs = 900000L,
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("sessionparity")
      .outputMode("append").start()
    rows.grouped((rows.length + 2) / 3).foreach { chunk =>
      in.addData(chunk.toSeq); q.processAllAvailable()
    }
    // two sentinel batches on a throwaway key: the first advances the
    // watermark past every open session's end + gap, the second runs
    // with that watermark so the event-time timers fire and the final
    // per-key sessions flush through the TIMEOUT path
    val maxMs = rows.map(_._2.getTime).max
    in.addData(("zz", new java.sql.Timestamp(maxMs + 3600000L), 0.0))
    q.processAllAvailable()
    in.addData(("zz", new java.sql.Timestamp(maxMs + 7200000L), 0.0))
    drain(q)
    val streamed = spark.table("sessionparity")
      .as[graft.streaming.ClosedSession].collect()
      .filter(_.key != "zz")
      .map(s => (s.key.toLong, s.start_ms, s.end_ms, s.n_events,
        math.rint(s.sum_value * 10000).toLong)).toSet
    val batch = SparkEntry.queries("q229_session_shadow")(spark, sf())
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        math.rint(r.getDouble(4) * 10000).toLong)).toSet
    assert(streamed == batch,
      s"stream-batch diff: ${(streamed diff batch) ++ (batch diff streamed)}")
  }

  test("funnelStream converges to the q228 batch shadow on real events") {
    implicit val sqlCtx = spark.sqlContext
    val prevProvider =
      spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // view/purchase events in event-time order: a view converts the
      // moment its earliest qualifying purchase arrives, which is
      // exactly q228's earliest-at-or-after attribution
      val rows = graft.queries.Q.events(spark, sf())
        .filter(col("event_type").isin("view", "purchase"))
        .select(col("user_id"), col("ts_ms"), col("event_type"))
        .collect()
        .map(r => (r.getLong(0), new java.sql.Timestamp(r.getLong(1)),
          r.getString(2)))
        .sortBy(r => (r._2.getTime, r._1))
      val in = MemoryStream[(Long, java.sql.Timestamp, String)]
      val ds = in.toDF().toDF("key", "ts", "kind")
        .as[graft.streaming.FunnelEvent]
      val q = Streams.funnelStream(ds, withinMs = 3600000L,
          watermark = "0 seconds")
        .writeStream.format("memory").queryName("funnelparity")
        .outputMode("append").start()
      rows.grouped((rows.length + 2) / 3).foreach { chunk =>
        in.addData(chunk.toSeq); q.processAllAvailable()
      }
      drain(q)
      val streamed = spark.table("funnelparity")
        .as[graft.streaming.Conversion].collect()
        .map(c => (c.key, c.view_ms, c.purchase_ms, c.latency_ms)).toSet
      val batch = SparkEntry.queries("q228_funnel_shadow")(spark, sf())
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(streamed == batch,
        s"stream-batch diff: ${(streamed diff batch) ++ (batch diff streamed)}")
    } finally spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass", prevProvider)
  }
}
