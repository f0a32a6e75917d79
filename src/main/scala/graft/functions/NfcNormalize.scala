package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical decomposition + canonical
  * composition, UAX #15) as a native codegen'd expression — the first
  * step of any web-corpus scrub: the SAME user-visible text arrives
  * both composed (`café` as U+00E9) and decomposed (`e` + combining
  * U+0301), and every byte-level operator downstream (RollingHash
  * fingerprints, MinHash shingles, exact-hash dedup, winnowing) sees
  * the two as DIFFERENT documents unless the corpus is normalized
  * first. Spark has no built-in normalizer; a UDF would break
  * whole-stage codegen on the hottest scan in the pipeline — this is
  * one `java.text.Normalizer` call inside the generated code, with a
  * fast-path skip (`isNormalized`) that makes the overwhelmingly-
  * ASCII common case allocation-free.
  *
  * Oracle compatibility: NFC is a Unicode-standard function of the
  * input — DuckDB's `nfc_normalize` produces identical bytes, so
  * normalized text stays hash-comparable across engines (q260).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = NfcNormalize.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.nfc($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Shared by interpreted and generated paths. Already-normalized
    * input (all of ASCII) returns the SAME UTF8String — no decode, no
    * re-encode, no allocation beyond the `toString` check Normalizer
    * needs.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** DataFrame-API entry; session must carry [[GraftExtensions]]. */
  def of(text: Column): Column = call_function("graft_nfc", text)
}
