package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up probe data generator: replicates a driver testdata
  * directory `factor`× with disjoint key spaces, so the bench can be
  * run at sf1 (10× the largest driver SF) to catch superlinear
  * queries the sf0.1 bench can't see.
  *
  * Key remapping keeps every join's semantics and selectivity:
  * replica i shifts each entity key by i·BASE with bases chosen so no
  * remapped key space collides with another (including q120's
  * supplier+10⁹ offset trick). Fixed dims (region, nation) are shared,
  * matching how TPC-H scales. Two content columns are perturbed
  * per-replica so data structure scales LINEARLY instead of
  * replica-quadratically:
  *
  *  - `documents.text`: every token gets a replica prefix (replica 0
  *    keeps the original corpus verbatim) — otherwise each doc would
  *    have `factor−1` exact clones and every near-dup query's pair
  *    table would grow ~quadratically in the factor by construction,
  *    which is a property of cloned data, not of the queries.
  *  - `embeddings.embedding`: a per-replica random SIGN-FLIP mask —
  *    an isometry, so all within-replica dot products, norms, and
  *    near-dup structure are preserved exactly, while cross-replica
  *    copies of the same vector see ~half their coordinates negated
  *    and their cosine collapses toward 0. (A small additive jitter
  *    was tried first and proved insufficient: vectors stayed inside
  *    the near-dup cosine threshold and q60's pair output grew 197×
  *    for 10× data — a property of cloned data, not of the query.)
  *
  * Events keep their timestamps (density grows, the time range
  * doesn't — the realistic shape of a bigger day), with event ids and
  * user ids shifted.
  *
  * Usage: ScaleUp <srcDir> <outDir> <factor>
  */
object ScaleUp {

  private val OK = 10000000000L // orderkey (also event_id)
  private val CK = 10000000L    // custkey: max replica key stays < 10^9,
                                // disjoint from q120's supplier+10^9 space
  private val PK = 10000000L    // partkey
  private val SK = 1000000L     // suppkey: stays ≪ 10^9 pre-offset
  private val DK = 10000000L    // doc_id
  private val VK = 10000000L    // vec_id
  private val UK = 10000000L    // user_id

  def main(args: Array[String]): Unit = {
    val Array(src, out, fStr) = args
    val factor = fStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(tb: String) = spark.read.parquet(s"$src/$tb.parquet")
    def write(df: DataFrame, tb: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$tb.parquet")
    def shift(c: String, base: Long, i: Int) =
      (df: DataFrame) => df.withColumn(c, col(c) + lit(base * i))
    def rep(tb: String)(tx: Int => DataFrame => DataFrame): Unit =
      write((0 until factor).map(i => tx(i)(read(tb)))
        .reduce(_ unionByName _), tb)

    // fixed dims: shared, copied once
    Seq("region", "nation").foreach(tb => write(read(tb), tb))

    rep("customer")(i => shift("c_custkey", CK, i))
    rep("supplier")(i => shift("s_suppkey", SK, i))
    rep("part")(i => shift("p_partkey", PK, i))
    rep("orders")(i => df =>
      shift("o_custkey", CK, i)(shift("o_orderkey", OK, i)(df)))
    rep("lineitem")(i => df =>
      shift("l_suppkey", SK, i)(shift("l_partkey", PK, i)(
        shift("l_orderkey", OK, i)(df))))
    rep("events")(i => df =>
      shift("user_id", UK, i)(shift("event_id", OK, i)(df)))
    rep("documents")(i => df => {
      val shifted = shift("doc_id", DK, i)(df)
      if (i == 0) shifted
      else shifted
        .withColumn("text", array_join(
          transform(split(col("text"), " "),
            t => concat(lit(s"r$i"), t)), " "))
        .withColumn("n_chars", length(col("text")).cast("long"))
    })
    rep("embeddings")(i => df => {
      val shifted = shift("vec_id", VK, i)(df)
      if (i == 0) shifted
      else {
        // deterministic ±1 mask per (replica, dim): an avalanche-mixed
        // integer hash so no two replicas share a pattern (plain
        // (i+j) % k parities repeat every k replicas and would
        // re-create mutual near-dups between same-parity replicas)
        def bit(j: Int): Float = {
          var x = i * 1000003 + j
          x ^= x >>> 16; x *= 0x45d9f3b; x ^= x >>> 16
          if ((x & 1) == 0) 1f else -1f
        }
        val signs = typedLit(Array.tabulate(64)(bit))
        shifted.withColumn("embedding",
          transform(col("embedding"), (x, j) =>
            (x * element_at(signs, j + 1)).cast("float")))
      }
    })

    println(s"[scaleup] wrote ${factor}x of $src to $out")
    spark.stop()
  }
}
