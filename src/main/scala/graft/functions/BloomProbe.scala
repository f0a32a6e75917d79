package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a long key against a serialized Bloom-filter
  * sketch (the `binary` produced by Spark's `BloomFilterAggregate`,
  * which [[graft.functions.GraftExtensions]] registers as
  * `graft_bloom_agg`).
  *
  * Why custom: Spark's own `BloomFilterMightContain` only accepts a
  * FOLDABLE or scalar-subquery sketch (it exists for the optimizer's
  * runtime-filter rewrite), so the one-row-sketch broadcast-join shape —
  * the natural DataFrame formulation of "build sketch once, probe every
  * row" — fails analysis. This probe accepts the sketch as an ordinary
  * attribute and caches the deserialized filter per thread, keyed on the
  * byte-array reference (a broadcast one-row sketch is the same array
  * for every row of a task, so each task deserializes exactly once).
  *
  * Null semantics — `false` (never null) when EITHER side is null, so a
  * filter on `!probe` KEEPS those rows: an empty build side aggregates
  * to a NULL sketch and a null key never anti-joins, which is exactly
  * the keep path of the exact `left_anti` decontamination this probe
  * prefilters for (see [[graft.text.CorpusClean.decontaminateBloom]]).
  */
case class BloomProbe(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary sketch, bigint key), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_probe"

  // One deserialized filter per thread, keyed on sketch CONTENT. The
  // cache must be thread-confined (the same expression object is shared
  // by every partition of a local run), and it cannot key on reference
  // identity: the sketch reaches the probe through an UnsafeRow join
  // value, and UnsafeRow.getBinary copies into a fresh array on every
  // access, so a reference key would never hit and the filter would
  // deserialize per row. Arrays.equals is O(len) with no allocation —
  // a length check then a memcmp-style sweep — vs readFrom's full
  // parse + bit-array copy, so the content check is the cheap path.
  @transient private lazy val cache =
    new ThreadLocal[(Array[Byte], BloomFilter)]

  def probe(bytes: Array[Byte], value: Long): Boolean = {
    val cached = cache.get()
    val bf =
      if (cached != null && ((cached._1 eq bytes) ||
          java.util.Arrays.equals(cached._1, bytes))) cached._2
      else {
        val parsed = BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
        cache.set((bytes, parsed))
        parsed
      }
    bf.mightContainLong(value)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val bytes = left.eval(input)
    if (bytes == null) return false
    val value = right.eval(input)
    if (value == null) return false
    probe(bytes.asInstanceOf[Array[Byte]], value.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloomProbe", this, classOf[BloomProbe].getName)
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(
      code = code"""
        ${l.code}
        ${r.code}
        boolean ${ev.value} = false;
        if (!${l.isNull} && !${r.isNull}) {
          ${ev.value} = $ref.probe(${l.value}, ${r.value});
        }""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomProbe =
    copy(left = newLeft, right = newRight)
}

object BloomProbe {

  /** DataFrame-API entry; session must carry [[GraftExtensions]]. */
  def of(sketch: Column, key: Column): Column =
    call_function("graft_bloom_probe", sketch, key)

  /** The matching sketch builder (Spark's internal `bloom_filter_agg`,
    * registered by [[GraftExtensions]]): an aggregate over a LONG column
    * returning the serialized filter this probe reads.
    */
  def agg(key: Column, expectedItems: Long, numBits: Long): Column =
    call_function("graft_bloom_agg", key, lit(expectedItems), lit(numBits))
}
