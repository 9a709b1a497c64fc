package graft

import org.apache.spark.sql.functions._

/** q186 within-doc repeated-span trim: the testdata corpus contains no
  * intra-document 8-gram repeats (the oracle run pins the pipeline but
  * its removable count is legitimately 0 there), so the interval-union
  * sweep semantics are pinned here on constructed fixtures — a clean
  * doc, a disjoint repeat, an OVERLAPPING repeat run (the case where
  * naive per-occurrence counting double-counts), and a doc shorter
  * than the gram width.
  */
class RepeatTrimSpec extends SparkSpec {
  import spark.implicits._

  test("q186: interval-union removable-token counts on fixtures") {
    val a = (1 to 8).map(i => s"a$i").mkString(" ")   // one 8-gram
    val b = (1 to 8).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      // s1: all tokens distinct — nothing removable
      (1L, (1 to 20).map(i => s"u$i").mkString(" "), "en", "s1"),
      // s2: A ... B ... A — the second A occurrence (8 tokens) removable
      (2L, s"$a $b $a", "en", "s2"),
      // s3: ten identical tokens — grams at pos 0,1,2 identical; dup
      // occurrences cover [1,9)∪[2,10) = [1,10) → 9 removable, not
      // the 16 a per-occurrence count would claim
      (3L, Seq.fill(10)("t").mkString(" "), "en", "s3"),
      // s4: shorter than the gram width — no grams at all
      (4L, "x y z", "en", "s4"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text"))
    val dir = java.nio.file.Files.createTempDirectory("graft-q186").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q186_repeat_span_trim")(spark, dir)
      .select($"source", $"n_docs", $"total_tokens", $"removable_tokens",
        $"removable_ppm")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("s1")._4 == 0L)
    assert(got("s2")._3 == 24L && got("s2")._4 == 8L)
    assert(got("s3")._3 == 10L && got("s3")._4 == 9L,
      s"overlap union wrong: ${got("s3")}")
    assert(got("s4")._4 == 0L)
    // ppm is the exact integer ratio
    assert(got("s3")._5 == 9L * 1000000L / 10L)
  }
}
