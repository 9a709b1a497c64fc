package graft

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.functions._

import graft.queries.{Q, SideTables}

/** The side-table cache-key and publish contracts (SideTables
  * scaladoc): the key is derived MECHANICALLY from the builder, so a
  * logic change can never silently serve a stale artifact, and the
  * publish path runs through the Hadoop FileSystem API so a
  * scheme-qualified (non-local-default) root works and rename
  * failures surface as the original error, never a misleading
  * missing-path read. */
class SideTablesSpec extends SparkSpec {

  private def docs = Q.t(spark, sf(), "documents")

  test("logicKey is stable across derivations and sessions") {
    val k1 = SideTables.logicKey(
      docs.groupBy(col("source")).agg(count(lit(1)).as("n")))
    val k2 = SideTables.logicKey(
      docs.groupBy(col("source")).agg(count(lit(1)).as("n")))
    assert(k1 === k2)
    // a fresh session re-analyzes from scratch: new exprIds, new
    // relation instances — the key must not move
    val s2 = spark.newSession()
    val k3 = SideTables.logicKey(
      Q.t(s2, sf(), "documents").groupBy(col("source"))
        .agg(count(lit(1)).as("n")))
    assert(k1 === k3)
  }

  test("logicKey detects a builder-logic change without any constant bump") {
    // the r11 advice scenario: widening a band (a plan literal) must
    // yield a fresh key mechanically
    def bands(width: Int) = graft.queries.TextOps.minhashSlotsPlan(spark, sf())
      .withColumn("band_id", expr(s"seed DIV $width"))
      .groupBy(col("doc_id"), col("band_id"))
      .agg(md5(array_join(transform(
        sort_array(collect_list(struct(col("seed"), col("mh")))),
        x => x.getField("mh").cast("string")), ",")).as("bh"))
    assert(SideTables.logicKey(bands(4)) !== SideTables.logicKey(bands(5)))
    // ...and so must a changed aggregate or output schema
    val a = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val b = docs.groupBy(col("source")).agg(sum(col("n_chars")).as("n"))
    assert(SideTables.logicKey(a) !== SideTables.logicKey(b))
  }

  test("logicKey distinguishes builders differing only in a hex-looking literal") {
    // the @hex strip (JVM object identities print Class@hashcode)
    // can swallow identifier@hex text inside STRING LITERALS too —
    // the exact-literal channel must keep such builders apart
    def f(owner: String) = docs.filter(col("source") === owner)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
    assert(SideTables.logicKey(f("svc@ca11ab")) !==
      SideTables.logicKey(f("svc@beef00")))
  }

  test("logicKey keeps operand identity and output names") {
    // canonicalized exprIds are plan-positional ordinals and must be
    // KEPT: these two self-join conditions differ ONLY by which
    // operand is on which side — stripping the ordinals would
    // collapse them to one key and serve a stale artifact with the
    // opposite pair orientation
    val lt = docs.as("a").join(docs.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
    val gt = docs.as("a").join(docs.as("b"),
        col("b.doc_id") < col("a.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
    assert(SideTables.logicKey(lt) !== SideTables.logicKey(gt))
    // alias names canonicalize away, so the output schema must carry
    // them: a renamed result column is a different artifact
    val n = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val m = docs.groupBy(col("source")).agg(count(lit(1)).as("m"))
    assert(SideTables.logicKey(n) !== SideTables.logicKey(m))
  }

  test("keyFor canonicalizes the dataset dir scheme-aware") {
    val build = docs.select(col("doc_id"))
    val plain = sf()
    // ../ collapsed: the same dataset spelled two ways is ONE key
    val dotted = new java.io.File(plain).getParent +
      "/../" + new java.io.File(new java.io.File(plain).getParent).getName +
      "/" + new java.io.File(plain).getName
    assert(SideTables.keyFor(spark, plain, "documents", build) ===
      SideTables.keyFor(spark, dotted, "documents", build))
  }

  test("logicKey folds scan paths, so upstream side-table keys propagate") {
    // same plan shape over two different parquet roots must key apart
    // (a downstream builder reading an upstream ARTIFACT inherits its
    // key through the artifact's path)
    val a = Q.t(spark, sf(), "documents").select(col("doc_id"))
    val b = Q.t(spark, sf("sf0.01"), "documents").select(col("doc_id"))
    assert(SideTables.logicKey(a) !== SideTables.logicKey(b))
  }

  test("keyFor separates datasets and sources") {
    val build = docs.select(col("doc_id"))
    val k1 = SideTables.keyFor(spark, sf(), "documents", build)
    val k2 = SideTables.keyFor(spark, sf("sf0.01"), "documents", build)
    assert(k1 !== k2)
  }

  test("getOrBuild publishes through an explicit file:-scheme Hadoop root") {
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft-side-spec")
    sys.props("graft.side.dir") = "file://" + tmpRoot.toString
    try {
      val before = SideTables.builtThisSession.size
      val got = SideTables.getOrBuild(spark, sf(), "spec_counts") {
        docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      }
      val expected = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n")).collect().map(_.toSeq).toSet
      assert(got.collect().map(_.toSeq).toSet === expected)
      assert(SideTables.builtThisSession.size === before + 1)
      // second read is a cache hit: no new build recorded
      val again = SideTables.getOrBuild(spark, sf(), "spec_counts") {
        docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      }
      assert(again.collect().map(_.toSeq).toSet === expected)
      assert(SideTables.builtThisSession.size === before + 1)
      // a changed builder under the same name is a MISS (fresh key)
      val changed = SideTables.getOrBuild(spark, sf(), "spec_counts") {
        docs.groupBy(col("source")).agg(sum(col("n_chars")).as("n"))
      }
      assert(changed.columns.toSeq === Seq("source", "n"))
      assert(SideTables.builtThisSession.size === before + 2)
    } finally {
      sys.props.remove("graft.side.dir")
      org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
    }
  }

  test("getOrBuildKeyed keys on the representative plan plus salt") {
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft-side-keyed")
    sys.props("graft.side.dir") = tmpRoot.toString
    try {
      val keyPlan = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val before = SideTables.builtThisSession.size
      var forced = 0
      def build = { forced += 1
        docs.groupBy(col("source")).agg(count(lit(1)).as("n")) }
      val got = SideTables.getOrBuildKeyed(spark, sf(), "keyed_counts",
        "documents", keyPlan, "eps=1")(build)
      assert(got.count() > 0)
      assert(forced === 1 && SideTables.builtThisSession.size === before + 1)
      // same (plan, salt): cache hit — the (iterative, expensive)
      // builder must NOT be forced again
      SideTables.getOrBuildKeyed(spark, sf(), "keyed_counts",
        "documents", keyPlan, "eps=1")(build).count()
      assert(forced === 1 && SideTables.builtThisSession.size === before + 1)
      // a driver-loop change (salt) re-keys even under an identical plan
      SideTables.getOrBuildKeyed(spark, sf(), "keyed_counts",
        "documents", keyPlan, "eps=2")(build).count()
      assert(forced === 2 && SideTables.builtThisSession.size === before + 2)
    } finally {
      sys.props.remove("graft.side.dir")
      org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
    }
  }

  test("vacuum retires unread artifacts and the next consumer rebuilds") {
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft-side-vac")
    sys.props("graft.side.dir") = tmpRoot.toString
    try {
      val fs = new Path(tmpRoot.toString)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      var builds = 0
      def get() = SideTables.getOrBuild(spark, sf(), "vac_counts") {
        builds += 1
        docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      }
      get().count()
      assert(builds === 1)
      val fresh = SideTables.getOrBuild(spark, sf(), "vac_fresh") {
        docs.select(col("doc_id")).limit(5)
      }
      fresh.count()
      // a young root survives a sweep with a 1-hour horizon
      assert(SideTables.vacuum(spark, 3600L * 1000).isEmpty)
      // backdate vac_counts (dir + last-used marker) past BOTH the
      // horizon and the read-lease floor (6 h)
      val old = System.currentTimeMillis - 7L * 3600L * 1000
      fs.listStatus(new Path(tmpRoot.toString)).foreach { keyDir =>
        fs.listStatus(keyDir.getPath)
          .filter(_.getPath.getName == "vac_counts").foreach { t =>
            fs.setTimes(new Path(t.getPath, "_LAST_USED"), old, -1)
            fs.setTimes(t.getPath, old, -1)
          }
      }
      val gone = SideTables.vacuum(spark, 3600L * 1000)
      assert(gone.exists(_.endsWith("vac_counts")), gone.toString)
      assert(!gone.exists(_.contains("vac_fresh")))
      // recently-read table still served from cache...
      assert(SideTables.getOrBuild(spark, sf(), "vac_fresh") {
        docs.select(col("doc_id")).limit(5)
      }.count() === 5)
      // ...and the vacuumed one transparently rebuilds
      get().count()
      assert(builds === 2)
    } finally {
      sys.props.remove("graft.side.dir")
      org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
    }
  }

  test("read-lease floor: a still-running reader's table survives an aggressive sweep") {
    // _LAST_USED is touched at PLAN time — a query that planned 30
    // minutes ago may still be mid-scan, so a sweep with a horizon
    // below the longest query runtime must NOT honor it literally:
    // the minAgeMs floor (default 6 h) clamps the effective horizon
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft-side-lease")
    sys.props("graft.side.dir") = tmpRoot.toString
    try {
      val fs = new Path(tmpRoot.toString)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      SideTables.getOrBuild(spark, sf(), "lease_t") {
        docs.select(col("doc_id")).limit(3)
      }.count()
      // the reader registered (planned) 30 minutes ago
      val planned = System.currentTimeMillis - 30L * 60 * 1000
      fs.listStatus(new Path(tmpRoot.toString)).foreach { keyDir =>
        fs.listStatus(keyDir.getPath).foreach { t =>
          fs.setTimes(new Path(t.getPath, "_LAST_USED"), planned, -1)
          fs.setTimes(t.getPath, planned, -1)
        }
      }
      // an operator's 1-minute horizon is clamped to the floor: the
      // running reader's table survives
      assert(SideTables.vacuum(spark, 60L * 1000).isEmpty)
      // only an explicit floor override lets the aggressive horizon
      // through (the deployment asserting no query runs that long)
      val gone = SideTables.vacuum(spark, 60L * 1000, minAgeMs = 0L)
      assert(gone.exists(_.endsWith("lease_t")), gone.toString)
    } finally {
      sys.props.remove("graft.side.dir")
      org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
    }
  }

  test("a tableDir without _SUCCESS is debris: the next build recovers") {
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft-side-deb")
    sys.props("graft.side.dir") = tmpRoot.toString
    try {
      val fs = new Path(tmpRoot.toString)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // count PUBLISHES, not calls: getOrBuild forces the block once
      // per call for its key plan, so a call-counter would tick on
      // cache hits too
      def builds = SideTables.builtThisSession
        .count(_.startsWith("deb_counts@"))
      def get() = SideTables.getOrBuild(spark, sf(), "deb_counts") {
        docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      }
      val expected = get().collect().map(_.toSeq).toSet
      assert(builds === 1)
      // simulate a crashed build / partial delete: the published dir
      // exists but its _SUCCESS is gone. Without the pre-rename
      // cleanup, the retry's rename nests its tmp INSIDE the debris
      // and every subsequent attempt fails forever.
      fs.listStatus(new Path(tmpRoot.toString)).foreach { keyDir =>
        fs.listStatus(keyDir.getPath)
          .filter(_.getPath.getName == "deb_counts")
          .foreach(t => fs.delete(new Path(t.getPath, "_SUCCESS"), false))
      }
      assert(get().collect().map(_.toSeq).toSet === expected)
      assert(builds === 2)
      // and the recovered dir is a clean publish (readable again, no
      // third build)
      assert(get().collect().map(_.toSeq).toSet === expected)
      assert(builds === 2)
    } finally {
      sys.props.remove("graft.side.dir")
      org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
    }
  }

  test("publish lost-race reads the winner; true failure surfaces") {
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft-side-pub")
    val fs = new Path(tmpRoot.toString)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // winner already published: a complete dir with _SUCCESS
    val tableDir = new Path(tmpRoot.toString, "k/table")
    fs.mkdirs(tableDir)
    fs.create(new Path(tableDir, "_SUCCESS")).close()
    fs.create(new Path(tableDir, "part-winner")).close()
    val tmp = new Path(tmpRoot.toString, "k/.table.tmp-spec")
    fs.mkdirs(tmp)
    fs.create(new Path(tmp, "part-loser")).close()
    // must not throw, must leave the winner's file in place, and must
    // leave no loser debris inside the published dir
    SideTables.publishForTest(fs, tmp, tableDir,
      new Path(tableDir, "_SUCCESS"))
    assert(fs.exists(new Path(tableDir, "part-winner")))
    assert(!fs.exists(new Path(tableDir, ".table.tmp-spec")))

    // rename that cannot succeed with NO winner present: destination
    // parent exists as a FILE, so the rename fails and no _SUCCESS
    // can appear — the publish must raise, not swallow
    val badParent = new Path(tmpRoot.toString, "blocked")
    fs.create(badParent).close()
    val tableDir2 = new Path(badParent, "table")
    val tmp2 = new Path(tmpRoot.toString, ".t2.tmp-spec")
    fs.mkdirs(tmp2)
    intercept[java.io.IOException] {
      SideTables.publishForTest(fs, tmp2, tableDir2,
        new Path(tableDir2, "_SUCCESS"))
    }
    org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
  }
}
