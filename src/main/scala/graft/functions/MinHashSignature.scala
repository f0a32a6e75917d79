package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression computing a k-wide MinHash signature from
  * an array of shingle strings in ONE pass: base-hash each shingle with
  * the same XXH64 the built-in `xxhash64` uses, then update k
  * permutation minima in a tight loop — with `doGenCode`, so the whole
  * signature stays inside whole-stage codegen.
  *
  * Why custom: the built-in route is k separate higher-order
  * `aggregate` folds, which are interpreted per element (HOFs don't
  * participate in codegen) and walk an expression tree k times per
  * row. This is the one hot path in the engine where built-ins
  * genuinely can't express the computation efficiently — exactly the
  * case SURVEY §7.3 reserves for a custom Expression.
  *
  * Permutations are (a_i*h + b_i) mod P with P prime and h pre-reduced
  * mod P, so no long overflow (ANSI-safe).
  */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {

  import MinHashSignature._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  private lazy val (permA, permB) = permConstants(k)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(j), Seed)
        val hm = ((h % P) + P) % P
        var i = 0
        while (i < k) {
          val v = (hm * permA(i) + permB(i)) % P
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("graftMinhashA", permA, "long[]")
    val bRef = ctx.addReferenceObj("graftMinhashB", permB, "long[]")
    val xxh = classOf[XXH64].getName
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, c => {
      val mins = ctx.freshName("mins")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val hm = ctx.freshName("hm")
      val v = ctx.freshName("v")
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $c.numElements(); $j++) {
         |  if (!$c.isNullAt($j)) {
         |    long $h = $xxh.hashUTF8String($c.getUTF8String($j), ${Seed}L);
         |    long $hm = (($h % ${P}L) + ${P}L) % ${P}L;
         |    for (int $i = 0; $i < $k; $i++) {
         |      long $v = ($hm * $aRef[$i] + $bRef[$i]) % ${P}L;
         |      if ($v < $mins[$i]) $mins[$i] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new $gad($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {

  /** Permutation modulus: prime, small enough that a*h+b stays in a
    * long. Shared by everything MinHash in this engine.
    */
  val P = 1000000007L

  /** XXH64 seed — same default as the built-in `xxhash64`. */
  val Seed = 42L

  /** Deterministic permutation constants in [1, P) / [0, P). */
  def permConstants(k: Int): (Array[Long], Array[Long]) = {
    val a = new Array[Long](k)
    val b = new Array[Long](k)
    var i = 0
    while (i < k) {
      a(i) = ((0x9E3779B97F4A7C15L * (i + 1)) & Long.MaxValue) % (P - 1) + 1
      b(i) = ((0xBF58476D1CE4E5B9L * (i + 3)) & Long.MaxValue) % P
      i += 1
    }
    (a, b)
  }

  /** DataFrame-API entry: k-wide MinHash signature of a shingle array.
    * Resolves through the function registry, so the session must carry
    * [[GraftExtensions]] (all graft entry points do).
    */
  def signature(shingles: Column, k: Int): Column =
    call_function("graft_minhash", shingles, lit(k))
}

/** SparkSessionExtensions entry point — makes `graft_minhash` available
  * both to SQL and to `call_function`. Wire it with
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(
        classOf[MinHashSignature].getName, null, "graft_minhash",
        "graft_minhash(shingles, k) - k-wide MinHash signature of a shingle array.",
        ""),
      { exprs: Seq[Expression] =>
        exprs match {
          case Seq(arr, k) => MinHashSignature(arr, intLit(k, "k"))
          case Seq(arr) => MinHashSignature(arr, 64)
          case other => throw new IllegalArgumentException(
            s"graft_minhash(array<string>[, k literal]) — got ${other.size} args")
        }
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(
        classOf[ArrayDot].getName, null, "graft_dot",
        "graft_dot(a, b) - dot product of two array<double> vectors.", ""),
      { exprs: Seq[Expression] =>
        exprs match {
          case Seq(a, b) => ArrayDot(a, b)
          case other => throw new IllegalArgumentException(
            s"graft_dot(a, b) — got ${other.size} args")
        }
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_srp_buckets"),
      new ExpressionInfo(
        classOf[SrpSignatures].getName, null, "graft_srp_buckets",
        "graft_srp_buckets(vec, bits, dim, tables) - multi-table SRP-LSH buckets.",
        ""),
      { exprs: Seq[Expression] =>
        exprs match {
          case Seq(vec, b, d, t) =>
            SrpSignatures(vec, intLit(b, "bits"), intLit(d, "dim"), intLit(t, "tables"))
          case other => throw new IllegalArgumentException(
            s"graft_srp_buckets(vec, bits, dim, tables) — got ${other.size} args")
        }
      }))
  }
}
