package graft

/** Portable-sketch guarantees (q175/q176/q177, sf0.001) — these three
  * are fully oracle-hash-checked (unlike the engine-internal q19/q56/
  * q76/q81/q93 sketches), so this spec pins the SKETCH guarantees the
  * hash can't express:
  *  - CMS (q175): never undercounts; overcount ≤ (d/w-scaled) slack;
  *  - HLL (q176): relative error well inside the m=16 envelope
  *    (σ ≈ 1.04/√16 = 26%);
  *  - KMV (q177): relative error inside the k=32 envelope
  *    (σ ≈ 1/√32 ≈ 18%).
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("q175 portable CMS never undercounts; overcount within 4*N/w") {
    val rows = SparkEntry.queries("q175_cms_portable")(spark, sf())
      .select($"key", $"n_exact", $"n_est")
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    val n = queries.Q.events(spark, sf()).count()
    rows.foreach { case (k, exact, est) =>
      assert(est >= exact, s"CMS undercounted '$k': $est < $exact")
      // expected overcount per row-hash is N/w; min over d=4 rows is
      // far tighter, so 4*N/w is a generous deterministic ceiling.
      assert(est - exact <= 4L * n / 1024L + 1L,
        s"CMS overcount for '$k' out of envelope: est=$est exact=$exact N=$n")
    }
  }

  test("q176 portable HLL estimates within 3 sigma of exact (m=16)") {
    val rows = SparkEntry.queries("q176_hll_portable")(spark, sf())
      .select($"grp", $"est_fp", $"n_exact")
      .as[(String, Long, Long)].collect()
    assert(rows.length == 3)
    rows.foreach { case (g, estFp, exact) =>
      val est = estFp / 1e6
      val rel = math.abs(est - exact) / exact.toDouble
      assert(rel <= 3 * 0.26, s"HLL for '$g' out of envelope: est=$est exact=$exact rel=$rel")
    }
  }

  test("q177 portable KMV estimates within 3 sigma of exact (k=32)") {
    val rows = SparkEntry.queries("q177_kmv_distinct")(spark, sf())
      .select($"grp", $"est_fp", $"n_exact")
      .as[(String, Long, Long)].collect()
    assert(rows.length == 5)
    rows.foreach { case (g, estFp, exact) =>
      val est = estFp / 1e3
      val rel = math.abs(est - exact) / exact.toDouble
      assert(rel <= 3 * 0.18, s"KMV for '$g' out of envelope: est=$est exact=$exact rel=$rel")
    }
  }

  test("q178 rolling merged-HLL estimates within 3 sigma of exact") {
    val rows = SparkEntry.queries("q178_rolling_hll_portable")(spark, sf())
      .select($"day", $"est_fp", $"n_exact")
      .as[(Long, Long, Long)].collect()
    assert(rows.length == 30)
    rows.foreach { case (d, estFp, exact) =>
      val est = estFp / 1e6
      val rel = math.abs(est - exact) / exact.toDouble
      assert(rel <= 3 * 0.26, s"rolling HLL day $d out of envelope: est=$est exact=$exact")
    }
  }

  test("q178 merged registers equal registers built from the raw window") {
    // Mergeability: max-merging per-day registers over [d-6, d] must
    // equal building registers from scratch over the union of those
    // days' events. Compare the resulting fixed-point sums (s_fp is a
    // bijection of the register vector given n_filled).
    import org.apache.spark.sql.functions._
    val q = SparkEntry.queries("q178_rolling_hll_portable")(spark, sf())
      .select($"day", $"s_fp".as("s_merged"))
    val ev = queries.Q.events(spark, sf())
      .select(expr("ts_ms DIV 86400000").as("day"),
        md5($"user_id".cast("string")).as("h"))
    val days = ev.select($"day").distinct()
    // from-scratch registers per window: re-bucket the raw rows
    val windowed = queries.SketchOps.hllRho(
        days.as("d").join(ev.as("e"),
            $"e.day".between($"d.day" - 6, $"d.day"))
          .select($"d.day".as("wday"), $"h"))
      .groupBy($"wday", $"bucket").agg(max($"rho").as("m"))
      .groupBy($"wday")
      .agg(count(lit(1)).as("n_filled"),
        sum(expr("CAST(power(2, 50 - m) AS BIGINT)")).as("s_filled"))
      .select($"wday".as("day"),
        ($"s_filled" + (lit(16L) - $"n_filled") * lit(1125899906842624L)).as("s_scratch"))
    val diverged = q.join(windowed, "day")
      .filter($"s_merged" =!= $"s_scratch").count()
    assert(diverged == 0, "merged rolling registers diverged from from-scratch registers")
  }

  test("q179 sampled percentiles approximate the full-data percentiles") {
    import org.apache.spark.sql.functions._
    val sampled = SparkEntry.queries("q179_sample_percentile")(spark, sf("sf0.01"))
      .select($"event_type", $"n_sample", $"n_total", $"p50_sample", $"p90_sample")
      .as[(String, Long, Long, Double, Double)].collect()
    val full = queries.Q.events(spark, sf("sf0.01"))
      .groupBy($"event_type")
      .agg(expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"),
        (max($"value") - min($"value")).as("range"))
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(sampled.length == 5)
    sampled.foreach { case (t, nS, nT, p50s, p90s) =>
      // hash-gated 10%: the realized rate should be near 10%
      assert(math.abs(nS.toDouble / nT - 0.1) < 0.05, s"$t sample rate ${nS.toDouble / nT}")
      val (p50, p90, range) = full(t)
      assert(math.abs(p50s - p50) <= 0.1 * range,
        s"$t sampled p50 $p50s too far from exact $p50 (range $range)")
      assert(math.abs(p90s - p90) <= 0.1 * range,
        s"$t sampled p90 $p90s too far from exact $p90 (range $range)")
    }
  }

  test("streaming portable HLL converges to the EXACT batch q176 state") {
    // Same rows, chopped into two micro-batches: the streaming
    // registers (ValueState updated via PortableHll) must land on
    // bit-identical (n_filled, v_zero, s_fp, est_fp) as the batch
    // DataFrame/oracle twin — parity is structural, both sides pin
    // the same specified hash and estimator.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import graft.streaming.{SketchObs, SketchEstimate, Streams}
    implicit val sqlCtx = spark.sqlContext
    val prevProvider =
      spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val obs = spark.read.parquet(s"${sf()}/lineitem.parquet")
        .select($"l_returnflag".as("grp"),
          $"l_partkey".cast("string").as("member"))
        .as[SketchObs].collect()
      val (first, second) = obs.splitAt(obs.length / 2)
      val updates = scala.collection.mutable.ArrayBuffer[(Long, SketchEstimate)]()
      val in = MemoryStream[SketchObs]
      val q = Streams.portableHllStream(in.toDS()).writeStream
        .outputMode("update")
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[SketchEstimate], id: Long) =>
          val rows = ds.collect()
          updates.synchronized { updates ++= rows.map((id, _)) }: Unit
        }
        .start()
      in.addData(first.toSeq)
      q.processAllAvailable()
      in.addData(second.toSeq)
      q.processAllAvailable()
      q.stop()
      val lastBatch = updates.map(_._1).max
      val streamed = updates.filter(_._1 == lastBatch).map(_._2)
        .map(e => e.grp -> ((e.n_filled, e.v_zero, e.s_fp, e.est_fp))).toMap
      val batch = SparkEntry.queries("q176_hll_portable")(spark, sf())
        .select($"grp", $"n_filled", $"v_zero", $"s_fp", $"est_fp")
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      assert(streamed == batch,
        s"stream state diverged from batch: stream=$streamed batch=$batch")
    } finally {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", prevProvider)
    }
  }

  test("streaming portable CMS cells converge to the EXACT batch counters") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{CmsCell, Streams}
    implicit val sqlCtx = spark.sqlContext
    val prevProvider =
      spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val keys = queries.Q.events(spark, sf())
        .select($"user_id".cast("string")).as[String].collect()
      val (first, second) = keys.splitAt(keys.length / 2)
      val cells = scala.collection.mutable.Map.empty[Long, Long]
      val in = MemoryStream[String]
      val q = Streams.portableCmsStream(in.toDS()).writeStream
        .outputMode("update")
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[CmsCell], _: Long) =>
          val rows = ds.collect()
          // update semantics: later batches overwrite a cell's count
          cells.synchronized { rows.foreach(r => cells(r.cell) = r.c) }: Unit
        }
        .start()
      in.addData(first.toSeq)
      q.processAllAvailable()
      in.addData(second.toSeq)
      q.processAllAvailable()
      q.stop()
      val batch = queries.SketchOps.cmsCounters(spark, sf())
        .select($"j", $"b", $"c").as[(Int, Long, Long)].collect()
        .map { case (j, b, c) => (j * 1024L + b) -> c }.toMap
      assert(cells.toMap == batch,
        s"streaming CMS cells diverged from batch counters " +
          s"(stream ${cells.size} cells, batch ${batch.size})")
    } finally {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", prevProvider)
    }
  }

  test("JVM-side PortableHll matches the SQL-side rho derivation on arbitrary strings") {
    // the streaming parity tests cover numeric keys from the real
    // tables; this pins the hash contract on adversarial member
    // strings (unicode, separators, empties-adjacent) so a UTF-8 or
    // casing drift in either twin fails at unit level.
    import org.apache.spark.sql.functions._
    val members = (1 to 100).map(i => s"m$i:${"αβγ€中".take(i % 6)}|${i * 31}")
    val df = members.toDF("member").withColumn("h", md5($"member"))
    val sqlSide = queries.SketchOps.hllRho(df)
      .select($"member", $"bucket", $"rho")
      .as[(String, Long, Int)].collect()
      .map(r => r._1 -> ((r._2.toInt, r._3))).toMap
    members.foreach { m =>
      assert(graft.functions.PortableHll.bucketRho(m) == sqlSide(m),
        s"JVM vs SQL (bucket, rho) diverged for '$m'")
    }
  }

  test("q177 sketch state is the true 32nd-smallest distinct hash") {
    // h_k in the output IS the sketch: cross-check it against a direct
    // computation with independent Spark ops (sort + row_number).
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val dh = spark.read.parquet(s"${sf()}/orders.parquet")
      .select($"o_orderpriority".as("grp"),
        conv(substring(md5($"o_custkey".cast("string")), 1, 13), 16, 10)
          .cast("long").as("h"))
      .distinct()
    val expected = dh
      .withColumn("r", row_number().over(Window.partitionBy($"grp").orderBy($"h")))
      .filter($"r" === 32).select($"grp", $"h".as("h_expected"))
    val got = SparkEntry.queries("q177_kmv_distinct")(spark, sf())
      .select($"grp", $"h_k")
    val joined = got.join(expected, "grp")
      .filter($"h_k" =!= $"h_expected").count()
    assert(joined == 0, "TopKMin 32nd element diverged from window rank-32")
  }

  test("streaming bitmap cells converge to the batch masks — exact " +
    "distinct, chopping- and replay-independent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{BitmapCell, KeyedId, Streams}
    implicit val sqlCtx = spark.sqlContext
    val prevProvider =
      spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val obs = queries.Q.events(spark, sf())
        .select($"event_type", $"user_id")
        .as[(String, Long)].collect().map(t => KeyedId(t._1, t._2))
      val (first, second) = obs.splitAt(obs.length / 2)
      val cells = scala.collection.mutable.Map.empty[(String, Long), Long]
      val in = MemoryStream[KeyedId]
      val q = Streams.bitmapDistinctStream(in.toDS()).writeStream
        .outputMode("update")
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[BitmapCell],
            _: Long) =>
          val rows = ds.collect()
          cells.synchronized {
            rows.foreach(r => cells((r.grp, r.chunk)) = r.mask) }: Unit
        }
        .start()
      in.addData(first.toSeq)
      q.processAllAvailable()
      // REPLAY a slice of batch 1 inside batch 2: OR-idempotence must
      // absorb the duplicates (at-least-once tolerance, the property
      // count-based state lacks)
      in.addData(second.toSeq ++ first.take(first.length / 3).toSeq)
      q.processAllAvailable()
      q.stop()
      val batch = obs.groupBy(o => (o.grp, o.id / 63))
        .map { case (k, os) =>
          k -> os.foldLeft(0L)((m, o) => m | (1L << (o.id % 63).toInt)) }
      assert(cells.toMap == batch,
        s"streaming masks diverged (stream ${cells.size} cells, " +
          s"batch ${batch.size})")
      // and the masks ARE the exact distinct
      val exact = obs.groupBy(_.grp).view.mapValues(_.map(_.id).distinct.size)
      val viaMasks = cells.toMap.groupBy(_._1._1).view
        .mapValues(_.values.map(java.lang.Long.bitCount(_).toLong).sum)
      exact.foreach { case (g, n) =>
        assert(viaMasks(g) == n.toLong, s"group $g: ${viaMasks(g)} != $n")
      }
    } finally {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", prevProvider)
    }
  }
}
