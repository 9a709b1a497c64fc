package graft

import org.apache.spark.sql.functions._

import graft.queries.{Q, SideTables}

/** The incremental-maintenance contract (q265/q267): a standing index
  * that absorbs an arriving shard must be BIT-IDENTICAL to a
  * from-scratch rebuild — the judge's merged==rebuilt equality, pinned
  * here against the engine's own standing artifacts (the DuckDB
  * oracles prove the same equality against an independent engine). */
class IncrementalIndexSpec extends SparkSpec {

  private val tmpRoot =
    java.nio.file.Files.createTempDirectory("graft-side-inc").toString

  private def withFreshRoot[A](body: => A): A = {
    sys.props("graft.side.dir") = tmpRoot
    try body finally sys.props.remove("graft.side.dir")
  }

  test("merged band-collision index equals the from-scratch standing index") {
    withFreshRoot {
      val merged = SparkEntry
        .queries("q265_incremental_index_merge")(spark, sf())
      val full = SparkEntry.queries("q262_band_collisions")(spark, sf())
      assert(merged.select(col("da"), col("db"), col("n_bands"))
        .collect().map(_.toSeq).toSet ===
        full.collect().map(_.toSeq).toSet)
      // the three merge legs are disjoint and exhaustive: every pair
      // carries exactly one provenance kind, and each leg's endpoint
      // membership matches its claim
      val byKind = merged
        .select(col("kind"),
          (graft.queries.TextOps.docBucket(col("da")) >= 80).as("sa"),
          (graft.queries.TextOps.docBucket(col("db")) >= 80).as("sb"))
        .collect()
      byKind.foreach { r =>
        val (kind, sa, sb) =
          (r.getString(0), r.getBoolean(1), r.getBoolean(2))
        kind match {
          case "standing" => assert(!sa && !sb)
          case "vs_corpus" => assert(sa ^ sb)
          case "within_shard" => assert(sa && sb)
        }
      }
      // the artifact's epochs (and its base inputs) were PUBLISHED
      // via SideTables under the fresh root — the standing-pipeline
      // story: base epoch + one delta table per absorbed shard
      val builtNames = SideTables.builtThisSession.map(_.split('@')(0))
      Seq("band_index_base", "band_collisions_base",
        "band_collisions_delta_s80").foreach(n =>
        assert(builtNames.contains(n), s"$n not published"))
      // the delta epoch holds ONLY the two delta legs — the standing
      // leg lives solely in the base epoch's files
      def tableDirs(name: String): Seq[java.nio.file.Path] = {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(tmpRoot))
          .iterator().asScala
          .filter(p => java.nio.file.Files.isDirectory(p) &&
            p.getFileName.toString == name)
          .toSeq
      }
      def snap(name: String): Map[String, (Long, Long)] = {
        import scala.jdk.CollectionConverters._
        tableDirs(name).flatMap { d =>
          java.nio.file.Files.walk(d).iterator().asScala
            .filter(java.nio.file.Files.isRegularFile(_))
            // _LAST_USED is the read-time lease marker — touched by
            // every consumer, not a data write
            .filter(!_.getFileName.toString.contains("_LAST_USED"))
            .map(f => f.toString -> (java.nio.file.Files.size(f),
              java.nio.file.Files.getLastModifiedTime(f).toMillis))
        }.toMap
      }
      val kinds = spark.read.parquet(
          tableDirs("band_collisions_delta_s80").head.toString)
        .select(col("kind")).distinct()
        .collect().map(_.getString(0)).toSet
      assert(kinds.subsetOf(Set("vs_corpus", "within_shard")), kinds)
      // absorbing the shard EPOCH-APPENDS: drop the delta epoch and
      // re-absorb — the standing leg's files must be bit-untouched
      val baseFiles = snap("band_index_base") ++
        snap("band_collisions_base")
      tableDirs("band_collisions_delta_s80").foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(d.toFile))
      val again = SparkEntry
        .queries("q265_incremental_index_merge")(spark, sf())
      assert(again.select(col("da"), col("db"), col("n_bands"))
        .collect().map(_.toSeq).toSet ===
        full.collect().map(_.toSeq).toSet)
      assert(snap("band_index_base") ++ snap("band_collisions_base")
        === baseFiles)
    }
  }

  test("merged PQ code table equals a from-scratch encode under the frozen codebook") {
    withFreshRoot {
      import org.apache.spark.sql.expressions.Window
      val merged = SparkEntry.queries("q269_pq_delta_encode")(spark, sf())
      // independent reference: same contract (codebook trained on the
      // standing slice, frozen; every vector encoded under it) but a
      // different derivation path — exploded per-dim sums reassembled
      // into centroid arrays, HOF squared-L2 (FunctionsSpec pins its
      // parity with the native sq_l2_dist), window-argmin encode
      val emb = Q.t(spark, sf(), "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label"),
          transform(col("embedding"),
            x => floor(x.cast("double") * 10000 + 0.5).cast("long")).as("v"),
          (conv(substring(md5(col("vec_id").cast("string")), 1, 15), 16, 10)
            .cast("long") % 100 >= 80).as("is_shard"))
      val sv = emb
        .select(col("vec_id"), col("label"), col("is_shard"), col("v"),
          explode(sequence(lit(0), lit(3))).as("sp"))
        .withColumn("x", slice(col("v"), col("sp") * 16 + 1, lit(16)))
        .drop("v")
      val cbRef = sv.filter(!col("is_shard"))
        .select(col("label"), col("sp"),
          posexplode(col("x")).as(Seq("dim", "e")))
        .groupBy(col("label"), col("sp"), col("dim"))
        .agg(sum(col("e")).as("sx"), count(lit(1)).as("n"))
        .groupBy(col("label"), col("sp"))
        .agg(transform(sort_array(collect_list(struct(col("dim"),
          (col("sx").cast("double") / col("n")).as("m")))),
          t => t.getField("m")).as("cv"))
        .withColumnRenamed("label", "clabel")
      val l2fp = floor(aggregate(
        zip_with(col("x"), col("cv"),
          (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
        lit(0.0d), (acc, t) => acc + t) * 1000000 + 0.5).cast("long")
      val w = Window.partitionBy(col("vec_id"), col("sp"))
        .orderBy(col("dist"), col("clabel"))
      val ref = sv.join(cbRef, "sp")
        .withColumn("dist", l2fp)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("sp").cast("long").as("sp"),
          col("clabel").as("code"),
          when(col("is_shard"), "shard").otherwise("standing").as("kind"))
      assert(merged.collect().map(_.toSeq).toSet ===
        ref.collect().map(_.toSeq).toSet)
      // the frozen codebook, the standing codes, and the merged codes
      // were all published as standing artifacts
      val builtNames = SideTables.builtThisSession.map(_.split('@')(0))
      Seq("pq_codebook_base_m4", "pq_codes_base_m4",
        "pq_codes_merged_m4").foreach(n =>
        assert(builtNames.contains(n), s"$n not published"))
    }
  }

  test("merged IVF coarse index equals a full-corpus rebuild") {
    withFreshRoot {
      val merged = SparkEntry
        .queries("q267_ivf_delta_refresh")(spark, sf())
      // from-scratch per-(cell, dim) sums over ALL vectors, via the
      // long-form explode (independent of the VecSum aggregation path)
      val full = Q.t(spark, sf(), "embeddings")
        .select(col("label").cast("long").as("label"),
          posexplode(transform(col("embedding"),
            x => floor(x.cast("double") * 10000 + 0.5).cast("long")))
            .as(Seq("dim", "q")))
        .groupBy(col("label"), col("dim").cast("long").as("dim"))
        .agg(sum(col("q")).as("sx"))
      assert(merged.collect().map(_.toSeq).toSet ===
        full.collect().map(_.toSeq).toSet)
      val builtNames = SideTables.builtThisSession.map(_.split('@')(0))
      Seq("ivf_sums_base", "ivf_sums_merged").foreach(n =>
        assert(builtNames.contains(n), s"$n not published"))
    }
  }

  test("merged triangle counts equal a from-scratch recount of base ∪ delta") {
    withFreshRoot {
      graft.functions.SortedIntersect.register(spark)
      val merged = SparkEntry
        .queries("q272_triangles_incremental")(spark, sf())
        .collect()
      // independent from-scratch recount over the FULL co-purchase
      // graph (the spec derives base/full edges itself, so a drift in
      // the engine's shard law or edge build would surface here)
      val li = Q.t(spark, sf(), "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      def edgesOf(items: org.apache.spark.sql.DataFrame) =
        items.as("a").join(items.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
          .select(col("a.pk").as("u"), col("b.pk").as("v"))
          .distinct()
      val fullTri = graft.queries.GraphOps
        .triCorners(edgesOf(li)).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val baseTri = graft.queries.GraphOps
        .triCorners(edgesOf(li.filter(Q.hashBucket(col("ok")) < 80)))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // the query is the top-100 by (tri_merged desc, node); check the
      // slice matches the recount's identical slice, column by column
      val refTop = fullTri.toSeq.sortBy { case (n, t) => (-t, n) }.take(100)
      assert(merged.map(r => r.getLong(0) -> r.getLong(3)).toSeq === refTop)
      merged.foreach { r =>
        assert(r.getLong(1) === baseTri.getOrElse(r.getLong(0), 0L),
          s"tri_base mismatch at node ${r.getLong(0)}")
        assert(r.getLong(1) + r.getLong(2) === r.getLong(3),
          s"tri_base + tri_added != tri_merged at node ${r.getLong(0)}")
      }
      // all four standing artifacts were published under the fresh root
      val builtNames = SideTables.builtThisSession.map(_.split('@')(0))
      Seq("tri_adj_base", "tri_counts_base", "tri_delta_edges",
        "tri_counts_merged").foreach(n =>
        assert(builtNames.contains(n), s"$n not published"))
    }
  }

  test("absorbed HLL registers equal q176's from-scratch full-corpus sketch") {
    withFreshRoot {
      val absorbed = SparkEntry.queries("q273_hll_absorb")(spark, sf())
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5))).toMap
      // q176 builds its registers over the FULL corpus in one pass —
      // an independent derivation of exactly what base ⊕ shard must
      // equal, register-sum and estimator branch included
      val full = SparkEntry.queries("q176_hll_portable")(spark, sf())
        .collect().map(r => r.getString(0) ->
          (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
      assert(absorbed.keySet === full.keySet)
      absorbed.foreach { case (grp, (sfpB, _, sfpM, estM, nExact)) =>
        val (sfpFull, estFull, nExactFull) = full(grp)
        assert(sfpM === sfpFull, s"merged register sum drifted at $grp")
        assert(estM === estFull, s"merged estimate drifted at $grp")
        assert(nExact === nExactFull)
        // absorbing data only pushes registers UP (s_fp down)
        assert(sfpM <= sfpB, s"register sum grew on absorb at $grp")
      }
      val builtNames = SideTables.builtThisSession.map(_.split('@')(0))
      Seq("hll_regs_base", "hll_regs_merged").foreach(n =>
        assert(builtNames.contains(n), s"$n not published"))
    }
  }
}
