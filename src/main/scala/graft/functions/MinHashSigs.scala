package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused 16-slot MinHash signature of a document's text — the
  * SURVEY.md §2.10 perf-escalation rung for the dedup family's
  * signature build. The relational formulation (shingle posexplode →
  * md5 → explode 16 seeds → groupBy(doc, seed) min) shuffles
  * 16·|shingle rows| records to assemble per-doc minima; this
  * Expression computes the same 16 minima in ONE compiled pass over
  * the document (tokenize → slide a 3-token window → md5 → 16
  * universal-hash mixes → running mins), so the signature table is
  * born fully formed with ZERO shuffles — at 100 TB the difference
  * between re-shuffling the tokenized corpus and a map-only scan.
  *
  * BIT-EXACT parity with the relational path (pinned by
  * `FunctionsSpec` on real corpora and relied on by the DuckDB
  * oracles, which derive the same signatures in SQL):
  *  - tokens: `split(trim(lower(text)), '\s+')` — UTF8String
  *    lowercase, UTF8String trim (ASCII space only), Java regex
  *    split with limit -1 (Spark's `split` keeps trailing empties);
  *  - shingles: consecutive token 3-grams joined with ' ' (duplicate
  *    shingles are harmless under min — the relational path's
  *    `distinct()` is a no-op for the signature);
  *  - h = low 31 bits of the first 15 hex chars of md5(shingle)
  *    (= first 7 bytes + the 8th byte's high nibble);
  *  - slot s ∈ [0,16): min of ((2s+1)·h + 7919·s) mod (2³¹−1).
  * Documents with fewer than 3 tokens return an EMPTY array
  * (posexplode then emits no rows — same outcome as the relational
  * path's empty group).
  *
  * The per-element work is MessageDigest-bound, so doGenCode emits a
  * static call rather than inlining MD5 — the expression still
  * participates in whole-stage codegen (no CodegenFallback, pinned
  * by PlanAuditSpec) and the fused loop lives in [[MinHashSigs.compute]].
  */
case class MinHashSigs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash16"

  override def nullSafeEval(input: Any): Any =
    MinHashSigs.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSigs$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigs {
  val Slots = 16
  private val Prime = 2147483647L // 2^31 - 1

  /** THE tokenizer contract of the text family, shared with
    * [[Shingles3]]: `split(trim(lower(text)), '\s+')` replicated
    * operation-for-operation — UTF8String lowercase (locale-free,
    * what Spark's `lower` runs), UTF8String trim (ASCII space only,
    * what SQL `trim` runs), Java regex split with limit -1 (Spark's
    * `split` keeps trailing empties). */
  def tokenize(text: UTF8String): Array[String] =
    text.toLowerCase.trim().toString.split("\\s+", -1)

  /** the fused tokenize → shingle → md5 → 16-way min pass.
    * Allocation discipline: one MessageDigest + one StringBuilder per
    * call (per ROW — the JIT scalarizes neither, but both are small;
    * a thread-local would break under codegen's row batching less
    * gracefully than this costs). */
  def compute(text: UTF8String): ArrayData = {
    val toks = tokenize(text)
    if (toks.length < 3) return new GenericArrayData(Array.empty[Long])
    val mins = Array.fill(Slots)(Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    val last = toks.length - 3
    while (i <= last) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1))
        .append(' ').append(toks(i + 2))
      val d = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      var h = 0L
      var j = 0
      while (j < 7) { h = (h << 8) | (d(j) & 0xFFL); j += 1 }
      h = (h << 4) | ((d(7) & 0xF0L) >> 4)
      h &= Prime // low 31 bits of the 60-bit hex prefix
      var s = 0
      while (s < Slots) {
        val v = ((2L * s + 1L) * h + 7919L * s) % Prime
        if (v < mins(s)) mins(s) = v
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** register `minhash16` in the session's function registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash16", exprs => MinHashSigs(exprs(0)), "built-in")

  /** Column-API entry point (requires `register(spark)` once). */
  def minhash16(textCol: String): Column = expr(s"minhash16($textCol)")
}
