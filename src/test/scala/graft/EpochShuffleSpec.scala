package graft

/** q180 deterministic epoch shuffle: each epoch must be a permutation
  * of the same corpus (equal n_docs), epochs must actually differ
  * (different head order and different order-sensitive checksums),
  * and the whole thing must be reproducible run-to-run (hash-derived,
  * no rand()). The DuckDB oracle already pins positions + checksum
  * cross-engine; this spec pins the shuffle SEMANTICS.
  */
class EpochShuffleSpec extends SparkSpec {
  import spark.implicits._

  test("q180: epochs are distinct permutations, reproducibly") {
    def run() = SparkEntry.queries("q180_epoch_shuffle")(spark, sf())
      .select($"epoch", $"pos", $"doc_id", $"n_docs", $"order_checksum")
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    val rows = run()
    assert(rows.length == 15) // 3 epochs x head-5
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == Set(0, 1, 2))
    // same corpus size every epoch
    assert(byEpoch.values.flatMap(_.map(_._4)).toSet.size == 1)
    // orders genuinely differ: pairwise-distinct checksums and heads
    val checksums = byEpoch.view.mapValues(_.head._5).toMap
    assert(checksums.values.toSet.size == 3,
      s"epoch checksums collide: $checksums")
    val heads = byEpoch.view
      .mapValues(_.sortBy(_._2).map(_._3).toList).toMap
    assert(heads.values.toSet.size == 3, s"epoch head orders collide: $heads")
    // deterministic: a second evaluation is identical
    assert(run() == rows, "epoch shuffle not reproducible across runs")
  }
}
