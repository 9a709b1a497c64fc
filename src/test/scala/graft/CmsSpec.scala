package graft

/** Count-min sketch guarantee (q76, sf0.001): CMS never undercounts,
  * and with ε = 0.001 the overcount is bounded by ε·N (N = total
  * token instances) with probability ≥ the configured 0.99 — checked
  * here deterministically because the seed is pinned, so the
  * hash layout (and therefore the estimate) is reproducible.
  */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  test("q76 CMS estimates: one-sided error within eps*N") {
    val rows = SparkEntry.queries("q76_cms_heavy_hitters")(spark, sf())
      .select($"token", $"n_exact", $"n_est")
      .as[(String, Long, Long)].collect()
    assert(rows.length == 20)
    import org.apache.spark.sql.functions._
    val totalTokens = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(explode(split(trim(lower($"text")), "\\s+")).as("token"))
      .count()
    rows.foreach { case (t, exact, est) =>
      assert(est >= exact, s"CMS undercounted '$t': $est < $exact")
      assert(est - exact <= (0.001 * totalTokens).ceil.toLong,
        s"CMS overcount for '$t' beyond eps*N: est=$est exact=$exact N=$totalTokens")
    }
  }
}
