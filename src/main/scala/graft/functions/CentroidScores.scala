package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native coarse-quantizer scoring for IVF-style ANN: given a vector and
  * a FOLDABLE centroid matrix (array<array<double>>), emit
  * `array<double>` where element i = dot(vec, centroid_i) / |centroid_i|
  * — every centroid scored in one fused pass inside whole-stage codegen.
  *
  * Why custom: the composed formulation builds `nlist` separate
  * dot-against-literal-array expressions (nlist × dim literal nodes); at
  * nlist=16, dim=64 that is a 1024-literal tree that bloats codegen and
  * re-reads the vector per centroid. Here the matrix is evaluated ONCE at
  * plan time into a flat double[] (plus per-centroid norms) shipped as a
  * codegen reference object; each row is a single `nlist × dim` loop.
  *
  * Mirrors the reference's ANN coarse-quantization need; the scoring
  * formula (cosine with |vec| dropped — rank-invariant per row) matches
  * the prior composed implementation bit-for-bit (same multiply-add
  * order, same final division).
  */
case class CentroidScores(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_centroid_scores"

  // Evaluated once per plan: the matrix child must be foldable (a
  // literal), so this never touches row data.
  private lazy val (flat: Array[Double], norms: Array[Double], cdim: Int) = {
    require(right.foldable,
      "graft_centroid_scores: centroid matrix must be a literal")
    val m = right.eval(null).asInstanceOf[ArrayData]
    val nlist = m.numElements()
    val d = if (nlist > 0) m.getArray(0).numElements() else 0
    val f = new Array[Double](nlist * d)
    val nm = new Array[Double](nlist)
    var i = 0
    while (i < nlist) {
      val row = m.getArray(i)
      var acc = 0.0
      var j = 0
      while (j < d) {
        val v = row.getDouble(j)
        f(i * d + j) = v
        acc += v * v
        j += 1
      }
      nm(i) = math.sqrt(acc)
      i += 1
    }
    (f, nm, d)
  }

  override protected def nullSafeEval(input: Any, unused: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nlist = norms.length
    val n = math.min(cdim, arr.numElements())
    val out = new Array[Double](nlist)
    var ci = 0
    while (ci < nlist) {
      var acc = 0.0
      val base = ci * cdim
      var d = 0
      while (d < n) {
        acc += arr.getDouble(d) * flat(base + d)
        d += 1
      }
      out(ci) = acc / norms(ci)
      ci += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("graftCentroidFlat", flat, "double[]")
    val normRef = ctx.addReferenceObj("graftCentroidNorms", norms, "double[]")
    val gad = classOf[GenericArrayData].getName
    val nlist = norms.length
    // the matrix child is a literal — its generated value is ignored;
    // the baked-in reference arrays carry the data
    nullSafeCodeGen(ctx, ev, (vec, _) => {
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val ci = ctx.freshName("ci")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      s"""
         |double[] $out = new double[$nlist];
         |int $n = Math.min($cdim, $vec.numElements());
         |for (int $ci = 0; $ci < $nlist; $ci++) {
         |  double $acc = 0.0;
         |  int $base = $ci * $cdim;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $acc += $vec.getDouble($d) * $flatRef[$base + $d];
         |  }
         |  $out[$ci] = $acc / $normRef[$ci];
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CentroidScores =
    copy(left = newLeft, right = newRight)
}

object CentroidScores {
  /** DataFrame-API entry: `matrix` must be a literal
    * array<array<double>> (build it with `typedlit`). Session must carry
    * [[GraftExtensions]].
    */
  def scores(vec: Column, matrix: Column): Column =
    call_function("graft_centroid_scores", vec, matrix)
}
