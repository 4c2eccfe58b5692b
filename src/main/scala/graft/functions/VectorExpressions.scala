package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnExpr
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression for cosine similarity over `array<double>`.
  *
  * The composed-builtins formulation (zip_with → aggregate ×3) walks both
  * arrays three times through higher-order-function lambda dispatch; this
  * expression fuses dot product and both norms into ONE primitive loop and
  * participates in whole-stage codegen via [[doGenCode]] — the preferred
  * extension order from the build brief: builtin composition, then a native
  * Expression, before ever reaching for a UDF.
  *
  * Accumulation order (sequential, left-to-right, double) matches the
  * lambda formulation exactly, so results are bit-identical and the DuckDB
  * oracles keep passing.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity expects (array<double>, array<double>), got ($l, $r)")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i);
         |  double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The `nprobe` nearest centroid indices (squared L2) for an `array<double>`
  * vector — the IVF cell-assignment / probe primitive. Centroids are a
  * driver-side constant embedded via `addReferenceObj`, so codegen loops a
  * plain `double[][]` with no per-row allocation beyond the tiny result.
  */
case class NearestCentroids(
    child: Expression,
    centroids: Array[Array[Double]],
    nprobe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(centroids.nonEmpty && nprobe >= 1 && nprobe <= centroids.length,
    s"need 1 <= nprobe (${nprobe}) <= centroids (${centroids.length})")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids expects array<double>, got $t")
  }

  /** Selection-sort the best nprobe cells — nprobe and k are tiny. */
  private def nearest(v: ArrayData): Array[Int] = {
    val k = centroids.length
    val d = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cen = centroids(c)
      val n = math.min(v.numElements(), cen.length)
      var acc = 0.0; var i = 0
      while (i < n) { val diff = v.getDouble(i) - cen(i); acc += diff * diff; i += 1 }
      d(c) = acc; c += 1
    }
    val out = new Array[Int](nprobe)
    val taken = new Array[Boolean](k)
    var p = 0
    while (p < nprobe) {
      var best = -1; var bestD = Double.MaxValue; var j = 0
      while (j < k) {
        if (!taken(j) && d(j) < bestD) { best = j; bestD = d(j) }
        j += 1
      }
      taken(best) = true; out(p) = best; p += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      nearest(input.asInstanceOf[ArrayData]).map(Int.box))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nearestCentroids", this, classOf[NearestCentroids].getName)
    nullSafeCodeGen(ctx, ev, v => {
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.nullSafeEval($v);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level entry points for the native vector expressions. */
object VectorFunctions {
  /** Cosine similarity of two `array<double>` columns (codegen'd). */
  def cosineSim(a: Column, b: Column): Column =
    ColumnExpr.toColumn(CosineSimilarity(ColumnExpr.of(a), ColumnExpr.of(b)))

  /** Indices of the `nprobe` nearest centroids for each vector. */
  def nearestCentroids(v: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    ColumnExpr.toColumn(NearestCentroids(ColumnExpr.of(v), centroids, nprobe))

  /** Single cell assignment (nearest centroid index). */
  def cellOf(v: Column, centroids: Array[Array[Double]]): Column =
    org.apache.spark.sql.functions.element_at(nearestCentroids(v, centroids, 1), 1)
}
