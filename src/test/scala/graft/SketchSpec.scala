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
}
