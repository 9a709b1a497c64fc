package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Prof35 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(s"$label: ${(System.nanoTime()-t0)/1e9}s"); r }
    val tk = split(trim(lower(col("text"))), "\\s+")
    val sh = when(size(tk) >= 3,
      array_distinct(transform(sequence(lit(0), size(tk)-3),
        i => concat_ws(" ", element_at(tk, i+1), element_at(tk, i+2), element_at(tk, i+3)))))
      .otherwise(array().cast("array<string>"))
    val base = docs.select(col("doc_id"), sh.as("shingles"))
    time("shingle build+explode count") {
      println(base.select(explode(col("shingles"))).count())
    }
    val ex = base.select(col("doc_id"), size(col("shingles")).as("sz"), explode(col("shingles")).as("s"))
    time("materialize ex") { println(ex.count()) }
    val exc = ex.persist()
    time("persist ex") { println(exc.count()) }
    time("self join on persisted") {
      println(exc.as("a").join(exc.as("b"), col("a.s")===col("b.s") && col("a.doc_id")<col("b.doc_id")).count())
    }
    spark.stop()
  }
}
