package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Expression — the curation
  * step that must run BEFORE any content hashing: 'é' and
  * 'e'+U+0301 are the same text to a reader but different bytes to
  * md5, so un-normalized corpora leak visually-identical duplicates
  * straight through exact dedup (q30's content_hash, the minhash
  * family's shingle hashes). Spark ships no normalizer; this wraps
  * the JDK's `java.text.Normalizer` (Form.NFC — the same canonical
  * composition DuckDB's `nfc_normalize` applies, so the oracle
  * derives the identical transform in-database).
  *
  * Fast path: `Normalizer.isNormalized` is a cheap scan that returns
  * the INPUT UTF8String untouched for already-normalized text (all
  * of it, for ASCII corpora) — no per-row String materialization
  * unless composition actually has work to do.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  import java.text.Normalizer

  def compute(text: UTF8String): UTF8String = {
    val s = text.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) text
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  /** register `nfc` in the session's function registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc", exprs => NfcNormalize(exprs(0)), "built-in")

  /** Column-API entry point (requires `register(spark)` once). */
  def nfc(textCol: String): Column = expr(s"nfc($textCol)")
}
