package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a long key against a serialized Bloom-filter
  * sketch (the `binary` produced by Spark's `BloomFilterAggregate`,
  * which [[graft.functions.GraftExtensions]] registers as
  * `graft_bloom_agg`).
  *
  * Why custom: Spark's own `BloomFilterMightContain` only accepts a
  * FOLDABLE or scalar-subquery sketch (it exists for the optimizer's
  * runtime-filter rewrite) and returns NULL on null input, where this
  * pipeline needs false-on-null.
  *
  * The sketch is a CONSTRUCTOR FIELD, not a child expression, for a
  * measured reason (shared with [[CmsProbe]] — see its doc for the
  * numbers): a multi-MB sketch inside a `Literal` is rescanned by the
  * O(length) `Literal.hashCode`/`equals` every time an analyzer/
  * optimizer/AQE rule hashes the tree, turning a 10 s job into minutes
  * of driver time; and a sketch arriving through a JOIN value is
  * re-copied per row by `UnsafeRow.getBinary` (measured 596 s for a
  * 2.5 MB sketch × 2 M rows). As a field it hashes by array identity,
  * ships once in the task binary, and deserializes once per JVM. The
  * function-registry form accepts any FOLDABLE binary expression and
  * evaluates it to the field at resolution time.
  *
  * Null semantics — `false` (never null) when the sketch is
  * null/absent or the key is null, so a filter on `!probe` KEEPS those
  * rows: an empty build side aggregates to a NULL sketch and a null
  * key never anti-joins, which is exactly the keep path of the exact
  * `left_anti` decontamination this probe prefilters for (see
  * [[graft.text.CorpusClean.decontaminateBloom]]).
  */
case class BloomProbe(sketch: Array[Byte], child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint key, got ${child.dataType.simpleString}")
    }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_probe"

  // Deserialized once per JVM that evaluates this expression (driver or
  // executor); BloomFilter reads are immutable, so concurrent tasks
  // share it safely.
  @transient private lazy val parsed: BloomFilter =
    if (sketch == null) null
    else BloomFilter.readFrom(new java.io.ByteArrayInputStream(sketch))

  def probe(value: Long): Boolean =
    parsed != null && parsed.mightContainLong(value)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val value = child.eval(input)
    if (value == null) false
    else probe(value.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloomProbe", this, classOf[BloomProbe].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        boolean ${ev.value} = false;
        if (!${c.isNull}) {
          ${ev.value} = $ref.probe(${c.value});
        }""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}

object BloomProbe {

  /** DataFrame-API entry: constructs the expression DIRECTLY (no
    * registry round-trip), so the sketch bytes are a constructor field
    * from the first moment the plan exists — `call_function` +
    * `lit(sketch)` would leave a multi-MB Literal in the unresolved
    * tree for every analyzer rule to hash until ResolveFunctions folds
    * it (see [[CmsProbe]] doc). `null` sketch means "probe always
    * false". The SQL registry form (`graft_bloom_probe`,
    * [[GraftExtensions]]) remains for SQL callers.
    */
  def of(sketch: Array[Byte], key: Column): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      BloomProbe(sketch, org.apache.spark.sql.graftshim.ColumnShim.expression(key)))

  /** The matching sketch builder (Spark's internal `bloom_filter_agg`,
    * registered by [[GraftExtensions]]): an aggregate over a LONG column
    * returning the serialized filter this probe reads.
    */
  def agg(key: Column, expectedItems: Long, numBits: Long): Column =
    call_function("graft_bloom_agg", key, lit(expectedItems), lit(numBits))
}
