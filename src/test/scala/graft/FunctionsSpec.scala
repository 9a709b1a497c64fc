package graft

import org.apache.spark.sql.functions._
import graft.functions.CosineSimilarity

/** Native cosine Expression: parity with the higher-order-function
  * formulation (same left-to-right double accumulation), null
  * handling, and SQL registration.
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("codegen cosine matches the zip_with/aggregate formulation") {
    CosineSimilarity.register(spark)
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val pairs = emb.select($"vec_id", $"embedding")
      .crossJoin(emb.filter($"vec_id" < 3)
        .select($"vec_id".as("qid"), $"embedding".as("qv")))
      .filter($"vec_id" =!= $"qid")
    val hof = aggregate(
      zip_with($"qv", $"embedding", (a, b) => a.cast("double") * b),
      lit(0.0), (acc, x) => acc + x) /
      sqrt(aggregate($"qv", lit(0.0), (a, x) => a + x.cast("double") * x) *
        aggregate($"embedding", lit(0.0), (a, x) => a + x.cast("double") * x))
    val diff = pairs
      .select((CosineSimilarity.cosine_sim("qv", "embedding") - hof).as("d"))
      .agg(max(abs($"d"))).head().getDouble(0)
    assert(diff < 1e-12, s"max diff $diff")
  }

  test("codegen sq_l2_dist matches the zip_with/aggregate formulation exactly") {
    graft.functions.SquaredL2.register(spark)
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
      // mixed element types on purpose: long quantized vs float raw
      .select($"vec_id",
        transform($"embedding",
          x => floor(x.cast("double") * 10000 + 0.5).cast("long")).as("q"),
        $"embedding")
    val pairs = emb.crossJoin(emb.filter($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("qf")))
      .filter($"vec_id" =!= $"qid")
    val hof = aggregate(
      zip_with($"q", $"qf", (a, b) => (a.cast("double") - b.cast("double"))
        * (a.cast("double") - b.cast("double"))),
      lit(0.0), (acc, x) => acc + x)
    val diff = pairs
      .select((expr("sq_l2_dist(q, qf)") - hof).as("d"))
      .agg(max(abs($"d"))).head().getDouble(0)
    assert(diff == 0.0, s"max diff $diff") // identical IEEE op sequence
  }

  test("null input yields null, zero vector yields 0.0") {
    CosineSimilarity.register(spark)
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(2.0f, 1.0f))),
      (None, Some(Array(1.0f, 1.0f))),
      (Some(Array(0.0f, 0.0f)), Some(Array(1.0f, 1.0f))))
      .toDF("a", "b")
      .select(expr("cosine_sim(a, b)").as("c"))
    val rows = df.collect()
    assert(math.abs(rows(0).getDouble(0) - 0.8) < 1e-9)
    assert(rows(1).isNullAt(0))
    assert(rows(2).getDouble(0) == 0.0)
  }

  test("cosine_sim is callable from SQL after registration") {
    val s2 = spark.newSession()
    CosineSimilarity.register(s2)
    val r = s2.sql(
      "SELECT cosine_sim(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)), " +
        "array(CAST(1 AS FLOAT), CAST(0 AS FLOAT))) AS c").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
  }

  test("GraftExtensions injects every custom function into SQL") {
    import org.apache.spark.sql.SparkSession
    // getOrCreate returns the ACTIVE session (ignoring extensions)
    // unless cleared first; the new session shares the SparkContext,
    // so never stop it — restore the originals instead
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    try {
      val r = s2.sql(
        "SELECT cosine_sim(array(1L, 0L), array(1L, 0L)) AS c, " +
          "sq_l2_dist(array(0L, 3L), array(4L, 3L)) AS d, " +
          "sorted_common(array(1L, 3L, 5L), array(3L, 5L, 7L)) AS i").head()
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      assert(r.getDouble(1) == 16.0)
      assert(r.getSeq[Long](2) == Seq(3L, 5L))
      val g = s2.sql(
        "SELECT g.* FROM (SELECT array('a','b','c') AS tk) " +
          "LATERAL VIEW ngrams(tk, 2) g AS pos, gram").collect()
      assert(g.map(_.getString(1)).toSeq == Seq("a b", "b c"))
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }

  test("VecSum matches the exploded per-dimension sum formulation") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map(i =>
      (i % 7, Seq.fill(16)(rnd.nextLong() % 1000000L)))
    val df = rows.toDF("k", "v")
    val vs = udaf(new graft.functions.VecSum)
    val mine = df.groupBy($"k").agg(vs($"v").as("sv"))
    val ref = df
      .select($"k", posexplode($"v").as(Seq("dim", "x")))
      .groupBy($"k", $"dim").agg(sum($"x").as("sx"))
      .groupBy($"k")
      .agg(transform(sort_array(collect_list(struct($"dim", $"sx"))),
        c => c.getField("sx")).as("sv"))
    assert(mine.as("a").join(ref.as("b"), $"a.k" === $"b.k")
      .filter($"a.sv" =!= $"b.sv").count() == 0)
  }

  test("TopKByDesc matches the window row_number formulation") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 500).map(i =>
      (i % 9, rnd.nextInt(50).toDouble, i.toLong)) // deliberate value ties
    val df = rows.toDF("k", "v", "id")
    val topk = udaf(new graft.functions.TopKByDesc(4))
    val mine = df.groupBy($"k").agg(topk($"v", $"id").as("top"))
      .select($"k", posexplode($"top").as(Seq("i", "t")))
      .select($"k", ($"i" + 1).as("rank"), $"t._1".as("v"), $"t._2".as("id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"k").orderBy($"v".desc, $"id")
    val ref = df.withColumn("rank", row_number().over(w) - 0)
      .filter($"rank" <= 4).select($"k", $"rank".cast("int").as("rank"),
        $"v", $"id")
    assert(mine.as("a").join(ref.as("b"),
        $"a.k" === $"b.k" && $"a.rank" === $"b.rank")
      .filter($"a.v" =!= $"b.v" || $"a.id" =!= $"b.id").count() == 0)
    assert(mine.count() == ref.count())
  }

  test("sorted_common matches array_intersect on sorted distinct arrays") {
    graft.functions.SortedIntersect.register(spark)
    // randomized sorted distinct long arrays, fixed seed
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      def arr() = rnd.shuffle((0L to 60L).toList)
        .take(rnd.nextInt(30) + 1).distinct.sorted.toArray
      (arr(), arr())
    }
    val df = rows.toDF("a", "b")
      .select(expr("sorted_common(a, b)").as("mine"),
        sort_array(array_intersect(col("a"), col("b"))).as("ref"))
    assert(df.filter(col("mine") =!= col("ref")).count() == 0)
    // null propagation + empty intersection
    val edge = Seq(
      (Some(Array(1L, 2L)), None),
      (Some(Array(1L, 2L)), Some(Array(3L, 4L))))
      .toDF("a", "b").select(expr("sorted_common(a, b)").as("c")).collect()
    assert(edge(0).isNullAt(0))
    assert(edge(1).getSeq[Long](0).isEmpty)
  }

  test("minhash16 matches the relational shingle→explode→min build " +
    "row-for-row on real corpora") {
    import graft.queries.TextOps
    Seq("sf0.001", "sf0.01").foreach { sfName =>
      val dir = sf(sfName)
      val fused = TextOps.minhashSlots(spark, dir)
        .select($"doc_id", $"seed", $"mh")
        .as[(Long, Int, Long)].collect().toSet
      val relational = TextOps.minhashSlotsAgg(spark, dir)
        .select($"doc_id", $"seed", $"mh")
        .as[(Long, Int, Long)].collect().toSet
      assert(fused == relational,
        s"$sfName: fused native signatures diverge from the relational " +
          s"reference (${(fused -- relational).take(3)} vs " +
          s"${(relational -- fused).take(3)})")
    }
  }

  test("minhash16 edge contracts: short docs empty, whitespace quirks " +
    "match the SQL tokenizer") {
    graft.functions.MinHashSigs.register(spark)
    // docs shorter than one shingle → empty array (posexplode drops)
    val outs = Seq("", "one", "one two", "  one   two  ",
      "one two three", "a\tb c d") // tab is NOT trimmed, IS a splitter
      .toDF("text").select(expr("minhash16(text)").as("sig"))
      .as[Seq[Long]].collect()
    assert(outs(0).isEmpty && outs(1).isEmpty && outs(2).isEmpty &&
      outs(3).isEmpty)
    assert(outs(4).length == 16 && outs(5).length == 16)
    // parity with the SQL pipeline on the quirky strings too
    val viaSql = Seq("one two three", "a\tb c d").toDF("text")
      .selectExpr("explode(split(trim(lower(text)), '\\\\s+')) AS w")
      .count()
    assert(viaSql == 7L) // 3 + 4 tokens — same tokenizer both paths
  }

  test("shingles3 matches the windowed relational shingle build " +
    "row-for-row on real corpora") {
    import graft.queries.TextOps
    Seq("sf0.001", "sf0.01").foreach { sfName =>
      val dir = sf(sfName)
      val fused = TextOps.shingleRows(spark, dir)
        .select($"doc_id", $"s", $"sz")
        .as[(Long, String, Long)].collect().toSet
      val windowed = TextOps.shingleRowsWindowed(spark, dir)
        .select($"doc_id", $"s", $"sz")
        .as[(Long, String, Long)].collect().toSet
      assert(fused == windowed,
        s"$sfName: fused shingles diverge from the windowed reference " +
          s"(${(fused -- windowed).take(3)} vs ${(windowed -- fused).take(3)})")
    }
  }

  test("fused shingle build is a map-only scan: no Exchange, no Window") {
    // the whole point of Shingles3 over the windowed form — the
    // corpus's most shared base table materializes without a single
    // shuffle or sort; a regression back to window/distinct shapes
    // fails here before it costs anything at scale
    val plan = graft.queries.TextOps.shingleRows(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"shingleRows plans an Exchange — no longer map-only:\n$plan")
    assert(!plan.contains("Window"),
      s"shingleRows plans a Window — the fused expression is bypassed:\n$plan")
  }

  test("sorted_overlap counts exactly what sorted_common materializes, " +
    "and string order matches sort_array") {
    graft.functions.SortedOverlapCount.register(spark)
    graft.functions.SortedIntersect.register(spark)
    // long regime: count == size of the intersect form
    val longs = Seq(
      (Array(1L, 3L, 5L, 9L), Array(2L, 3L, 9L, 11L)),
      (Array(1L, 2L), Array(3L, 4L)),
      (Array.empty[Long], Array(1L)))
      .toDF("a", "b")
      .selectExpr("sorted_overlap(a, b) AS c", "size(sorted_common(a, b)) AS s")
      .as[(Int, Int)].collect()
    longs.foreach { case (c, s) => assert(c == s, s"$c != $s") }
    // string regime: merge order must agree with sort_array (UTF8
    // binary order), pinned against the built-in intersect on
    // adversarial strings (case, unicode, prefixes, empties)
    val words = Seq("b", "B", "ba", "b b", "β", "中", "", "b́")
    val df = Seq((words.take(6), words.drop(2))).toDF("ra", "rb")
      .selectExpr("sort_array(ra) AS a", "sort_array(rb) AS b")
      .selectExpr("sorted_overlap(a, b) AS c",
        "size(array_intersect(a, b)) AS s")
      .as[(Int, Int)].head()
    assert(df._1 == df._2, s"string overlap ${df._1} != intersect ${df._2}")
  }

  test("minhash16 stays inside whole-stage codegen") {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    assert(!classOf[CodegenFallback].isAssignableFrom(
      classOf[graft.functions.MinHashSigs]),
      "MinHashSigs is CodegenFallback — doGenCode is dead code")
    graft.functions.MinHashSigs.register(spark)
    val df = spark.read.parquet(s"${sf()}/documents.parquet")
      .selectExpr("minhash16(text) AS sig")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("minhash16("), s"expression missing from plan")
    assert(plan.linesIterator.filter(_.contains("minhash16("))
      .forall(_.trim.startsWith("*")),
      s"minhash16 line lacks the WholeStageCodegen marker:\n$plan")
  }
}
