package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial rolling hash over a string's code points:
  * `acc = (acc * 31 + codePoint) mod 1e9+7`, one codegen'd pass.
  *
  * Same formula as the HOF formulation it replaces
  * (`aggregate(transform(split(text, ""), ascii), ...)`) and as the
  * DuckDB `list_reduce` oracle — the modulus keeps the accumulator
  * below 2^35, so the fold is exact in 64-bit on every engine. Why
  * custom: the HOF form materializes a per-CHARACTER array and runs an
  * interpreted fold over it (aggregate doesn't codegen); this is a
  * straight loop over the decoded string with no allocation, used by
  * document fingerprinting (q44), decontamination (q65/q106), the
  * multimodal checksum, and per-token feature hashing (q104).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = RollingHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.hash($c.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {

  final val Base = 31L
  final val Mod = 1000000007L

  /** The fold itself, shared by interpreted and generated code paths.
    * Iterates CODE POINTS (a supplementary character contributes its
    * one code point, matching `split(text, "")` + `ascii` and DuckDB's
    * `string_split('') -> ascii`). An empty string hashes to 0 — the
    * same value the HOF form produces (split("") = [""] and
    * ascii("") = 0 fold to 0).
    */
  def hash(s: String): Long = {
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * Base + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  /** DataFrame-API entry; session must carry [[GraftExtensions]]. */
  def of(text: Column): Column = call_function("graft_rolling_hash", text)
}
