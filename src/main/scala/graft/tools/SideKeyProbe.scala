package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.SideTables

/** Diagnostic: exercise every standing side-table artifact for a
  * dataset dir and report which were BUILT by this JVM vs served
  * from the persisted cache. Run twice (fresh JVM each time) against
  * the same `graft.side.dir`: the second run must print `built: 0` —
  * that is the cross-JVM stability contract of
  * [[SideTables.logicKey]] (a key that churned per JVM would rebuild
  * every artifact every run, silently reverting the cross-run cache
  * to first-touch cost).
  *
  * Usage: runMain graft.tools.SideKeyProbe <datasetDir> [sideRoot]
  */
object SideKeyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    args.lift(1).foreach(r => sys.props("graft.side.dir") = r)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("side-key-probe")
      .getOrCreate()
    // every catalog query that reads a persisted artifact — including
    // the incremental-maintenance rows (merged band/IVF/PQ tables and
    // the getOrBuildKeyed standing rank vector)
    val touching = Seq("q262_band_collisions", "q36_minhash_lsh",
      "q67_knn_ivf_probe", "q84_knn_pq",
      "q265_incremental_index_merge", "q267_ivf_delta_refresh",
      "q269_pq_delta_encode", "q270_pagerank_warm",
      "q271_pq_codebook_drift")
    touching.foreach { q =>
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      println(s"$q rows=$n")
    }
    val b = SideTables.builtThisSession
    println(s"built: ${b.size}")
    b.foreach(k => println(s"  $k"))
    spark.stop()
  }
}
