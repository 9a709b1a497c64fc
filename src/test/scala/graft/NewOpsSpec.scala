package graft

/** Semantic property pins for the round-8 curation operators, on top
  * of their three-SF DuckDB hash oracles: the oracle proves engine
  * agreement, these prove the CONTRACT the numbers must obey (the
  * kind of invariant a refactor can break on both engines at once).
  */
class NewOpsSpec extends SparkSpec {
  import spark.implicits._

  test("q199: growing 8→9 shards moves documents ONLY to the new shard") {
    val rows = SparkEntry.queries("q199_rendezvous_shards")(spark, sf())
      .as[(Long, Long, Long)].collect().toSeq
    val nDocs = spark.read.parquet(s"${sf()}/documents.parquet").count()
    assert(rows.map(_._2).sum == nDocs, "shards must partition the corpus")
    rows.filter(_._1 < 8).foreach { case (shard, _, moved) =>
      assert(moved == 0L, s"rendezvous moved docs INTO old shard $shard")
    }
    val newShard = rows.find(_._1 == 8L).get
    assert(newShard._2 == newShard._3,
      "every doc on the new shard must be a mover (it did not exist before)")
  }

  test("q191: systematic sample picks exactly the tick-containing docs") {
    val rows = SparkEntry.queries("q191_systematic_sample")(spark, sf())
      .select($"doc_id", $"n_chars", $"cum", $"slot")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val total = spark.read.parquet(s"${sf()}/documents.parquet")
      .agg(org.apache.spark.sql.functions.sum("n_chars"))
      .head().getLong(0)
    val stride = math.max(1L, total / 50L)
    // one row per covered tick, and each doc's weight interval
    // (cum - w, cum] actually contains its slot's tick
    assert(rows.map(_._4).distinct.length == rows.length,
      "duplicate slots: two docs claimed the same tick")
    rows.foreach { case (id, w, cum, slot) =>
      assert(slot * stride > cum - w && slot * stride <= cum,
        s"doc $id emitted for slot $slot but tick ${slot * stride} " +
          s"is outside its interval (${cum - w}, $cum]")
    }
  }

  test("q205: point-in-time join never reads state from the future") {
    val rows = SparkEntry.queries("q205_pit_feature_join")(spark, sf())
      .select($"ts_ms", $"state_since_ms")
      .as[(Long, Option[Long])].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (ts, since) =>
      since.foreach(sm => assert(sm <= ts,
        s"leakage: state starting at $sm attached to purchase at $ts"))
    }
  }

  test("q200: one keeper per cluster, and it is the longest member") {
    val rows = SparkEntry.queries("q200_dedup_keep_best")(spark, sf())
      .select($"doc_id", $"cluster_id", $"keeper_id", $"kept")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    val lens = spark.read.parquet(s"${sf()}/documents.parquet")
      .select($"doc_id", $"n_chars").as[(Long, Long)]
      .collect().toMap
    rows.groupBy(_._2).foreach { case (cluster, members) =>
      val keepers = members.filter(_._4 == 1L)
      assert(keepers.length == 1, s"cluster $cluster kept ${keepers.length}")
      val keeper = keepers.head
      assert(keeper._1 == keeper._3, "kept row must be its own keeper")
      val maxLen = members.map(m => lens(m._1)).max
      assert(lens(keeper._1) == maxLen,
        s"cluster $cluster keeper ${keeper._1} is not a longest member")
    }
  }

  test("q216: savings are consistent — dropped ⊂ corpus, per-mille ≤ 1000") {
    val rows = SparkEntry.queries("q216_dedup_savings")(spark, sf())
      .select($"n_docs", $"tokens_total", $"n_dropped", $"tokens_dropped",
        $"savings_pm")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (nd, tt, dr, td, pm) =>
      assert(dr <= nd && td <= tt,
        s"dropped ($dr docs / $td tokens) exceeds corpus ($nd / $tt)")
      assert(pm >= 0 && pm <= 1000 && pm == td * 1000 / tt,
        s"savings_pm $pm inconsistent with $td/$tt")
    }
  }

  test("q189: mutual pairs are unique, ordered, and k-bounded") {
    val rows = SparkEntry.queries("q189_mutual_knn")(spark, sf())
      .select($"va", $"vb", $"rank_ab", $"rank_ba")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length)
    rows.foreach { case (va, vb, rab, rba) =>
      assert(va < vb, s"pair ($va, $vb) not canonically ordered")
      assert(rab >= 1 && rab <= 3 && rba >= 1 && rba <= 3,
        s"pair ($va, $vb) ranks ($rab, $rba) outside top-3")
    }
  }

  test("q137: the 128-bit overflow guard fails loudly past the bound") {
    // past ~5·10¹⁵ tokens the TV numerator (~3·10⁶·N²) exceeds
    // DECIMAL(38,0): Spark would null out while DuckDB raises — the
    // guard turning that silent divergence into a loud failure IS
    // the contract (VERDICT r5/r8)
    queries.TextOps.requireDivergenceBound(4999999999999999L)
    intercept[IllegalArgumentException] {
      queries.TextOps.requireDivergenceBound(5000000000000000L)
    }
  }

  test("q141: same-millisecond signups resolve to the ms-group max") {
    // the ms tie contract (VERDICT r7): the oracle only sees ms
    // timestamps, so two signups inside one millisecond MUST collapse
    // to one (user, ms) row carrying max(value) BEFORE the as-of
    // pass — grouping by raw ns would let the backward pass pick the
    // latest-ns value instead of the group max, a data-dependent
    // cross-engine mismatch invisible on driver data without ns ties.
    val dir = java.nio.file.Files.createTempDirectory("q141pin").toString
    val us = org.apache.spark.sql.functions.timestamp_micros _
    val c = org.apache.spark.sql.functions.col _
    Seq(
      // user 1: two signups in ms 5000 — the LATER-ns one carries the
      // SMALLER value, so group-max (30) and latest-ns (10) disagree
      (1L, 5000100L, 1L, "signup", 30.0, "{}"),
      (2L, 5000900L, 1L, "signup", 10.0, "{}"),
      (3L, 6000000L, 1L, "click", 0.0, "{}"),
      // user 2: click exactly between two signups — tie → backward
      (4L, 1000000L, 2L, "signup", 1.0, "{}"),
      (5L, 3000000L, 2L, "signup", 2.0, "{}"),
      (6L, 2000000L, 2L, "click", 0.0, "{}"))
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .withColumn("ts", us(c("ts_us"))).drop("ts_us")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q141_asof_nearest")(spark, dir)
      .select($"event_id", $"nearest_ms", $"nearest_value", $"delta_ms")
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(out == Seq(
      (3L, 5000L, 30.0, -1000L), // ms-group max, NOT the latest-ns 10.0…
      (6L, 1000L, 1.0, -1000L))) // …and equidistant resolves backward
  }

  test("q242: grid median/MAD equals the brute-force definition") {
    def lowerMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted; s((s.length + 1) / 2 - 1)
    }
    val expect = graft.queries.Q.events(spark, sf())
      .select($"event_type", $"value").as[(String, Double)].collect()
      .toSeq.groupBy(_._1).map { case (t, rows) =>
        val vs = rows.map(r => (BigDecimal(r._2)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP) * 10000).toLongExact)
        val med = lowerMedian(vs)
        val devs = vs.map(v => math.abs(v - med))
        val mad = lowerMedian(devs)
        t -> ((vs.length.toLong, med, mad,
          devs.count(_ > 5 * mad).toLong, devs.max))
      }
    val got = SparkEntry.queries("q242_mad_outliers")(spark, sf())
      .select($"event_type", $"n", $"med_fp", $"mad_fp", $"n_outliers",
        $"max_dev")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1).sorted == expect.keys.toSeq.sorted)
    got.foreach { case (t, n, med, mad, nout, maxdev) =>
      assert((n, med, mad, nout, maxdev) == expect(t),
        s"type $t: grid result disagrees with the brute-force definition")
    }
  }

  test("q243: DSIR ranks a pure-target source above a disjoint-vocab one") {
    val tmp = java.nio.file.Files.createTempDirectory("dsir").toString
    val docs = Seq(
      // target-like (lang=en): English function-word distribution
      (1L, "the cat sat on the mat and the dog ran", "en", "srcA", 40L),
      (2L, "the quick brown fox jumps over the lazy dog", "en", "srcA", 44L),
      (3L, "of the people by the people for the people", "en", "srcA", 43L),
      // off-target: vocabulary disjoint from the target slice
      (4L, "zzz yyy xxx www vvv uuu ttt sss", "zh", "srcB", 31L),
      (5L, "qqq ppp ooo nnn mmm lll kkk jjj", "zh", "srcB", 31L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("q243_dsir_weights")(spark, tmp)
      .select($"source", $"mean_score_fp", $"selected_pm")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // srcA is drawn from the target distribution: every doc must clear
    // the ≥10⁶ resampling bar (its buckets are target-dominated, and
    // T_all > T_tgt inflates pure-target ratios above 10⁶).
    assert(out("srcA")._2 == 1000L,
      s"target-distribution source not fully selected: ${out("srcA")}")
    // srcB shares no vocabulary with the target; barring md5 bucket
    // collisions its ratios are 0, and even with a collision the
    // tf-weighted mean stays far below the target source's.
    assert(out("srcB")._1 < out("srcA")._1,
      s"off-target source outscored the target one: $out")
    assert(out("srcB")._2 == 0L,
      s"off-target docs crossed the resampling bar: ${out("srcB")}")
  }

  test("q244: head coverage is monotone and bounded") {
    val rows = SparkEntry.queries("q244_zipf_coverage")(spark, sf())
      .select($"source", $"total_tokens", $"vocab", $"top10_pm",
        $"top100_pm")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (src, total, vocab, t10, t100) =>
      assert(vocab >= 1 && vocab <= total, s"$src: vocab outside [1, total]")
      assert(t10 <= t100 && t100 <= 1000,
        s"$src: coverage not monotone/bounded: top10=$t10 top100=$t100")
      // top-10 of a vocab that small IS the whole mass
      if (vocab <= 10) assert(t100 >= 999 || t10 == t100,
        s"$src: tiny vocab must be fully covered")
    }
  }

  test("q246: Benford-conforming digits score ~0, uniform digits score big") {
    import org.apache.spark.sql.functions._
    def fixture(counts: Seq[(Int, Int)]): String = {
      val tmp = java.nio.file.Files.createTempDirectory("benford").toString
      val rows = counts.flatMap { case (digit, n) =>
        (1 to n).map(i => (i.toLong * 10 + digit, i.toLong * 1000000L,
          i.toLong, "t", digit.toDouble, "{}"))
      }
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$tmp/events.parquet")
      tmp
    }
    def chi2(dir: String): Long =
      SparkEntry.queries("q246_benford")(spark, dir)
        .select($"chi2_fp").as[Long].head()
    // 1000 draws at the rounded Benford proportions vs 999 uniform
    val benford = chi2(fixture(Seq(1 -> 301, 2 -> 176, 3 -> 125, 4 -> 97,
      5 -> 79, 6 -> 67, 7 -> 58, 8 -> 51, 9 -> 46)))
    val uniform = chi2(fixture((1 to 9).map(_ -> 111)))
    assert(benford < 100000L, // chi² < 0.1 — rounding residue only
      s"Benford-distributed fixture scored chi2_fp=$benford")
    assert(uniform > 100L * math.max(benford, 1L),
      s"uniform fixture not flagged: $uniform vs $benford")
  }

  test("q247: MMR keeps the top-relevance seed but picks a more " +
    "diverse set than pure top-5") {
    import org.apache.spark.sql.functions._
    val mmr = SparkEntry.queries("q247_mmr_coreset")(spark, sf())
      .orderBy($"rank").select($"vec_id", $"maxsim")
      .as[(Long, Double)].collect().toSeq
    assert(mmr.map(_._1).distinct.length == 5 && !mmr.map(_._1).contains(0L))
    val top5 = SparkEntry.queries("q40_knn_bruteforce")(spark, sf())
      .filter($"qid" === 0).orderBy($"rank").select($"vec_id")
      .as[Long].collect().toSeq
    assert(mmr.head._1 == top5.head,
      "rank 1 must be the pure-relevance argmax (empty penalty set)")
    // diversity: mean pairwise cosine within the MMR set must not
    // exceed the pure-relevance set's (the penalty's whole job)
    val vecs = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, e) => id -> e.map(x =>
        math.floor(x.toDouble * 10000 + 0.5).toLong).toArray }.toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot.toDouble / math.sqrt(a.map(x => x * x).sum.toDouble *
        b.map(x => x * x).sum.toDouble)
    }
    def meanPairSim(ids: Seq[Long]): Double = {
      val ps = for (i <- ids.indices; j <- i + 1 until ids.size)
        yield cos(vecs(ids(i)), vecs(ids(j)))
      ps.sum / ps.size
    }
    val (dMmr, dTop) = (meanPairSim(mmr.map(_._1)), meanPairSim(top5))
    assert(dMmr <= dTop,
      f"MMR set is LESS diverse than pure top-5: $dMmr%.4f > $dTop%.4f")
  }

  test("q248: α=½ smoothing compresses source shares toward uniform") {
    val rows = SparkEntry.queries("q248_mix_weights")(spark, sf())
      .select($"raw_ppm", $"weight_ppm").as[(Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    val (raws, wts) = (rows.map(_._1), rows.map(_._2))
    // concave smoothing: the head loses share, the tail gains (±2 ppm
    // integer-floor slack), and the weights still form a distribution
    assert(wts.max <= raws.max + 2,
      s"smoothed head ${wts.max} above raw head ${raws.max}")
    assert(wts.min >= raws.min - 2,
      s"smoothed tail ${wts.min} below raw tail ${raws.min}")
    assert(math.abs(wts.sum - 1000000L) <= rows.size,
      s"weights don't sum to ~10⁶: ${wts.sum}")
  }

  test("q249: CUSUM locates a planted level shift at its boundary") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("cusum").toString
    // 20 days × 10 events/day, value 10.0 for days 0-9 then 20.0
    val rows = for (d <- 0 until 20; i <- 0 until 10) yield (
      d.toLong * 100 + i,                                // event_id
      (d.toLong * 86400000L + i * 1000L) * 1000000L,     // ts (nanos)
      i.toLong, "t", if (d < 10) 10.0 else 20.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = SparkEntry.queries("q249_cusum")(spark, tmp)
      .select($"change_day", $"cusum_ppm").as[(Long, Long)].head()
    assert(out._1 == 9L, s"change point not at the shift boundary: $out")
    assert(out._2 < 0L, // low segment accumulates negative deviation
      s"excursion sign wrong for a low-then-high shift: $out")
  }

  test("q250: a burst spanning an hour-cell boundary still matches") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("ivj").toString
    val H = 3600000L
    // errors every 5 min from 0:50 to 1:10 → ONE burst (gaps < 10 min)
    // crossing the hour boundary; purchases at 1:05 (inside, but in a
    // different cell than the burst's start) and at 3:00 (no burst)
    val evs = Seq(
      (1L, (50 * 60000L) * 1000000L, 1L, "error", 1.0, "{}"),
      (2L, (55 * 60000L) * 1000000L, 1L, "error", 1.0, "{}"),
      (3L, (60 * 60000L) * 1000000L, 1L, "error", 1.0, "{}"),
      (4L, (65 * 60000L) * 1000000L, 1L, "error", 1.0, "{}"),
      (5L, (70 * 60000L) * 1000000L, 1L, "error", 1.0, "{}"),
      (6L, (65 * 60000L) * 1000000L, 2L, "purchase", 5.0, "{}"),
      (7L, (3 * H) * 1000000L, 3L, "purchase", 5.0, "{}"))
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = SparkEntry.queries("q250_interval_join")(spark, tmp)
      .select($"day", $"n_purchases", $"n_exposed", $"sum_live")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 2L, 1L, 1L)),
      s"cross-cell containment broken: $out")
  }

  test("q251: bitmap distinct equals exact across chunk boundaries") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("bitmap").toString
    // ids straddling 63-bit chunk edges (62|63, 125|126) + duplicates
    val ids = Seq(0L, 62L, 63L, 64L, 125L, 126L, 126L, 189L, 0L)
    ids.zipWithIndex.map { case (uid, i) =>
      (i.toLong, i.toLong * 1000000000L, uid, "t", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = SparkEntry.queries("q251_bitmap_distinct")(spark, tmp)
      .select($"distinct_bitmap", $"distinct_exact", $"n_chunks", $"agree")
      .as[(Long, Long, Long, Long)].head()
    assert(out == ((7L, 7L, 4L, 1L)), s"bitmap distinct broken: $out")
  }

  test("q252: fully-purged orders are exactly those with no surviving " +
    "lineitem") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("purge").toString
    Seq((1L, "Brand#13"), (2L, "Brand#99"))
      .toDF("p_partkey", "p_brand")
      .write.mode("overwrite").parquet(s"$tmp/part.parquet")
    Seq((10L, 1L), (10L, 1L), (11L, 1L), (11L, 2L), (12L, 2L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    Seq((10L, "1-URGENT"), (11L, "1-URGENT"), (12L, "1-URGENT"))
      .toDF("o_orderkey", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val out = SparkEntry.queries("q252_cascade_purge")(spark, tmp)
      .select($"n_orders", $"n_touched", $"n_fully_purged",
        $"n_lineitems", $"n_li_purged")
      .as[(Long, Long, Long, Long, Long)].head()
    // o10 fully purged (2 hit li), o11 touched (1 of 2), o12 untouched
    assert(out == ((3L, 2L, 1L, 5L, 3L)), s"cascade audit wrong: $out")
  }

  test("q253: prefix-form balance equals the literal sequential clamp fold") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("clamp").toString
    // user 1: grant, overspend (clamps), spend; user 2: spend first
    // (clamps at 0 immediately), then grant; includes a ts tie broken
    // by event_id
    val evs = Seq(
      (1L, 1000L, 1L, "signup", 0.0, "{}"),     // +100.0000
      (2L, 2000L, 1L, "purchase", 150.0, "{}"), // -150 → clamp to 0
      (3L, 2000L, 1L, "purchase", 10.0, "{}"),  // tie: after event 2
      (4L, 3000L, 1L, "signup", 0.0, "{}"),     // +100
      (5L, 1000L, 2L, "purchase", 30.0, "{}"),  // clamp at 0
      (6L, 2000L, 2L, "signup", 0.0, "{}"),     // +100
      (7L, 9999L, 2L, "view", 5.0, "{}"))       // filtered out
      .map { case (id, ms, u, t, v, p) => (id, ms * 1000000L, u, t, v, p) }
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    def fold(ds: Seq[Long]): Long =
      ds.foldLeft(0L)((b, d) => math.max(0L, b + d))
    val expect = Map(
      1L -> fold(Seq(1000000L, -1500000L, -100000L, 1000000L)),
      2L -> fold(Seq(-300000L, 1000000L)))
    val got = SparkEntry.queries("q253_clamped_balance")(spark, tmp)
      .select($"user_id", $"balance_fp").as[(Long, Long)].collect().toMap
    assert(got == expect, s"clamped balance: $got vs $expect")
  }

  test("q254: out-of-order arrivals are measured across bucket " +
    "boundaries, and match a driver fold") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("ooo").toString
    // 1000 arrivals (event_id = arrival order); every 10th event
    // arrives 25 s late, every 100th 120 s late — late spans cross
    // the ~4-id-wide probe buckets by construction
    val rows = (0 until 1000).map { i =>
      val base = i.toLong * 1000L
      val ts = if (i % 100 == 0 && i > 0) base - 120000L
      else if (i % 10 == 0 && i > 0) base - 25000L else base
      (i.toLong, ts * 1000000L, 1L, "t", 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    // driver fold: running max over arrival order
    var runMax = Long.MinValue
    val depthsSec = rows.map { r =>
      val ts = r._2 / 1000000L
      runMax = math.max(runMax, ts); (runMax - ts) / 1000L
    }
    val n = depthsSec.size
    val grid = depthsSec.groupBy(identity).view.mapValues(_.size).toMap
    val p99 = grid.keys.toSeq.sorted
      .scanLeft((0L, 0L)) { case ((_, cum), d) => (d, cum + grid(d)) }
      .drop(1).find { case (_, cum) => cum * 100 >= n * 99 }.get._1
    val expOoo = depthsSec.count(_ > 0).toLong * 1000000L / n
    val got = SparkEntry.queries("q254_ooo_depth")(spark, tmp)
      .select($"n", $"ooo_ppm", $"p99_depth_sec", $"max_depth_sec")
      .as[(Long, Long, Long, Long)].head()
    assert(got == ((n.toLong, expOoo, p99, depthsSec.max)),
      s"ooo profile: $got vs (${n}, $expOoo, $p99, ${depthsSec.max})")
    assert(depthsSec.max > 0, "fixture must actually be out of order")
  }

  test("q255: a perfectly weekly series scores MASE 0; an alternating " +
    "one scores above the naive") {
    import org.apache.spark.sql.functions._
    def series(counts: Seq[Int], typ: String) =
      counts.zipWithIndex.flatMap { case (c, d) =>
        (0 until c).map(i => (d.toLong * 10000 + i,
          (d.toLong * 86400000L + i) * 1000000L, i.toLong, typ, 1.0, "{}"))
      }
    val tmp = java.nio.file.Files.createTempDirectory("mase").toString
    val weekly = Seq(5, 9, 7, 3, 8, 2, 6) // exact period-7 pattern ×3
    val evs = series(weekly ++ weekly ++ weekly, "weekly") ++
      series(Seq.fill(21)(0).zipWithIndex.map { case (_, d) =>
        if (d % 2 == 0) 2 else 9 }, "alt") // period-2: lag-7 = lag-1 err
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = SparkEntry.queries("q255_seasonal_naive")(spark, tmp)
      .select($"event_type", $"mase_ppm").as[(String, Long)].collect().toMap
    assert(got("weekly") == 0L,
      s"exact weekly pattern must forecast perfectly: $got")
    // alternating period-2: lag-7 error equals lag-1 error → MASE = 1
    assert(got("alt") == 1000000L, s"period-2 series: $got")
  }

  test("q256: composed and combining-mark text is the SAME doc after nfc") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("nfc").toString
    val composed = "caf\u00e9 r\u00e9sum\u00e9"       // precomposed
    val combining = "cafe\u0301 re\u0301sume\u0301" // e + combining acute
    Seq((1L, composed, "en", "srcN", 10L),
      (2L, combining, "en", "srcN", 13L),
      (3L, "plain ascii", "en", "srcA", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("q256_nfc_audit")(spark, tmp)
      .select($"source", $"n_denorm", $"chars_removed", $"denorm_pm")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // only the combining-marks doc needs work: 3 marks removed
    assert(out("srcN") == ((1L, 3L, 500L)), s"nfc audit: ${out("srcN")}")
    assert(out("srcA") == ((0L, 0L, 0L)), s"ascii flagged: ${out("srcA")}")
    // and the REASON the op exists: after nfc the two docs hash equal
    graft.functions.NfcNormalize.register(spark)
    val hashes = Seq(composed, combining).toDF("text")
      .selectExpr("md5(nfc(text)) AS h").as[String].collect()
    assert(hashes(0) == hashes(1),
      "normalized duplicates must collide in exact dedup")
  }

  test("q257: Gini is 0 for equal users, matches the sorted-rank " +
    "formula for an unequal fixture") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("gini").toString
    // type 'eq': 4 users × 5 events each → G = 0
    // type 'sk': counts 1,1,2,16 → G from the textbook sorted formula
    val evs =
      (for (u <- 1 to 4; i <- 1 to 5) yield ("eq", u.toLong, i)) ++
      (for ((c, u) <- Seq(1, 1, 2, 16).zipWithIndex; i <- 1 to c)
        yield ("sk", u.toLong, i))
    evs.zipWithIndex.map { case ((t, u, i), id) =>
      (id.toLong, (id.toLong * 1000 + i) * 1000000L, u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    def giniPpm(xs: Seq[Long]): Long = {
      val s = xs.sorted
      val n = s.length.toLong; val w = s.sum
      val sr = s.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      (2 * sr - (n + 1) * w) * 1000000L / (n * w)
    }
    val got = SparkEntry.queries("q257_user_gini")(spark, tmp)
      .select($"event_type", $"gini_ppm").as[(String, Long)].collect().toMap
    assert(got("eq") == 0L, s"equal users must score 0: $got")
    assert(got("sk") == giniPpm(Seq(1L, 1L, 2L, 16L)),
      s"skewed fixture: ${got("sk")} vs ${giniPpm(Seq(1L, 1L, 2L, 16L))}")
  }

  test("q245: a homogeneous QI class is flagged at l = 1") {
    val tmp = java.nio.file.Files.createTempDirectory("ldiv").toString
    val docs = Seq(
      // srcH: one class (len_bucket 0), all the same lang → l = 1
      (1L, "a", "en", "srcH", 10L), (2L, "b", "en", "srcH", 20L),
      (3L, "c", "en", "srcH", 30L),
      // srcD: one class, two langs → l = 2, nothing at risk
      (4L, "d", "en", "srcD", 10L), (5L, "e", "fr", "srcD", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("q245_l_diversity")(spark, tmp)
      .select($"source", $"min_l", $"n_l1_classes", $"docs_at_risk",
        $"risk_pm")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out("srcH") == ((1L, 1L, 3L, 1000L)),
      s"homogeneous class not flagged: ${out("srcH")}")
    assert(out("srcD") == ((2L, 0L, 0L, 0L)),
      s"diverse class wrongly flagged: ${out("srcD")}")
  }
}
