package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.util.sketch.CountMinSketch

/** Count estimate of a key against a serialized Count-Min sketch (the
  * `binary` produced by Spark's public `count_min_sketch` aggregate).
  *
  * Why custom: Spark ships the CMS BUILDER in the function registry but
  * no reader — the sketch can be aggregated in SQL yet nothing can
  * probe it row-wise. This expression closes the loop, enabling the
  * sketch-prefilter pattern ([[graft.operators.Sketches.heavyHitters]]):
  * CMS never UNDERestimates, so `probe >= threshold` keeps every truly
  * heavy key and an exact rescore of the candidates equals the exact
  * answer.
  *
  * The sketch is a CONSTRUCTOR FIELD, not a child expression, for a
  * measured reason: a multi-MB sketch inside a `Literal` is rescanned
  * by the O(length) `Literal.hashCode`/`equals` every time an
  * analyzer/optimizer/AQE rule hashes the tree — a 14.5 MB sketch put
  * ~180 s of DRIVER time on a 10 s job (stage wall times stayed ~7 s).
  * As a field it hashes by array identity (O(1)), ships once in the
  * task binary, and deserializes once per JVM via the lazy val below —
  * no per-row or per-thread work at all. The function-registry form
  * still accepts any FOLDABLE binary expression and evaluates it to
  * the field at resolution time ([[GraftExtensions]]).
  *
  * Null semantics — `0` (never null) when the sketch is null/absent or
  * the key is null: a null key is never counted by the aggregate, so
  * "estimated count 0" is the consistent answer and threshold filters
  * drop it like the exact GROUP BY path these estimates prefilter for
  * (null keys excluded — see heavyHitters).
  */
case class CmsProbe(sketch: Array[Byte], child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType || child.dataType == StringType) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint or string key, got " +
          child.dataType.simpleString)
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms_probe"

  // Deserialized once per JVM that evaluates this expression (driver or
  // executor); CountMinSketch reads are immutable, so concurrent tasks
  // share it safely.
  @transient private lazy val parsed: CountMinSketch =
    if (sketch == null) null else CountMinSketch.readFrom(sketch)

  def probeLong(value: Long): Long =
    if (parsed == null) 0L
    else parsed.estimateCount(java.lang.Long.valueOf(value))

  def probeString(value: org.apache.spark.unsafe.types.UTF8String): Long =
    if (parsed == null) 0L else parsed.estimateCount(value.toString)

  private def isString = child.dataType == StringType

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val value = child.eval(input)
    if (value == null) return 0L
    if (isString) {
      probeString(value.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    } else {
      probeLong(value.asInstanceOf[Long])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCmsProbe", this, classOf[CmsProbe].getName)
    val c = child.genCode(ctx)
    val call = if (isString) "probeString" else "probeLong"
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = 0L;
        if (!${c.isNull}) {
          ${ev.value} = $ref.$call(${c.value});
        }""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): CmsProbe =
    copy(child = newChild)
}

object CmsProbe {

  /** DataFrame-API entry: constructs the expression DIRECTLY (no
    * registry round-trip), so the sketch bytes are a constructor field
    * from the first moment the plan exists — routing through
    * `call_function` + `lit(sketch)` would leave a multi-MB Literal in
    * the unresolved tree for every analyzer rule to hash until
    * ResolveFunctions folds it into the field (see class doc). `null`
    * sketch means "probe always 0". The SQL registry form
    * (`graft_cms_probe`, [[GraftExtensions]]) remains for SQL callers.
    */
  def of(sketch: Array[Byte], key: Column): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      CmsProbe(sketch, org.apache.spark.sql.graftshim.ColumnShim.expression(key)))
}
