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
}
