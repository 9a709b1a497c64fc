package graft

import graft.queries.TextOps

/** q35's posting-list df cap: a stop-phrase shingle shared by every
  * doc must not materialize the quadratic all-pairs set (Σ df² with
  * one df = |docs| is the 100 TB blowup), while genuinely similar
  * pairs — which share discriminative, low-df shingles — survive.
  */
class JaccardCapSpec extends SparkSpec {
  import spark.implicits._

  test("df cap drops stop-shingles, keeps true near-dup pairs") {
    // docs 1,2 share three distinctive shingles; docs 3..40 are all
    // unique; EVERY doc contains the planted stop shingle
    val docs =
      Seq((1, Seq("u a b", "u b c", "u c d")),
          (2, Seq("u a b", "u b c", "u c d"))) ++
      (3 to 40).map(i => (i, Seq(s"only in $i", s"also in $i")))
    val ex = docs.flatMap { case (id, ss) =>
      ("the stop phrase" +: ss).map(sh => (id.toLong, sh, ss.size + 1L))
    }.toDF("doc_id", "s", "sz")

    // capped: only the true pair remains
    val capped = TextOps.jaccardPairs(ex, maxDf = 10, minJaccard = 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(capped == Seq((1L, 2L)))

    // uncapped, the stop shingle alone links every pair: C(40,2)
    // rows — exactly the blowup the cap exists to prevent
    val uncapped = TextOps.jaccardPairs(ex, maxDf = 1000000, minJaccard = 0.01).count()
    assert(uncapped == 40L * 39 / 2)

    // and the surviving pair's jaccard is computed from the capped
    // posting lists only: 3 shared / (4 + 4 - 3)
    val j = TextOps.jaccardPairs(ex, maxDf = 10, minJaccard = 0.01)
      .head().getDouble(2)
    assert(math.abs(j - 0.6) < 1e-12)
  }
}
