package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.ColumnExpr
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert space-filling-curve index over k bucketed dimensions.
  *
  * The alternative multi-column clustering key to Z-order (`Maintain.ZOrder`):
  * where the z-curve's bit interleave has large jump discontinuities (each
  * carry across the top bit teleports across the keyspace), the Hilbert curve
  * moves one cell-edge per step, so consecutive curve positions are always
  * adjacent cells. Range-partitioning a rewrite on this key therefore yields
  * files whose min/max boxes on EVERY clustering column are at least as tight
  * as z-order's — the same property Delta's liquid clustering exploits.
  *
  * Index construction is John Skilling's public-domain transpose algorithm
  * ("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004): O(k·bits)
  * bit ops per row, no tables, no allocation beyond one k-long scratch array.
  */
object HilbertCurve {

  /** Hilbert curve position of cell `coords` (each in [0, 2^bits)) on the
    * k-dimensional curve of order `bits`. Mutates `coords` as scratch.
    * k·bits must be ≤ 63 so the index fits in a non-negative Long. */
  def index(coords: Array[Long], bits: Int): Long = {
    val n = coords.length
    if (n == 1) return coords(0) // 1-D curve is the identity
    val m = 1L << (bits - 1)
    // inverse-undo: top-down, exchange/invert low bits per the quadrant walk
    var q = m
    while (q > 1L) {
      val p = q - 1L
      var i = 0
      while (i < n) {
        if ((coords(i) & q) != 0L) coords(0) ^= p
        else {
          val t = (coords(0) ^ coords(i)) & p
          coords(0) ^= t; coords(i) ^= t
        }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { coords(i) ^= coords(i - 1); i += 1 }
    var t = 0L
    q = m
    while (q > 1L) {
      if ((coords(n - 1) & q) != 0L) t ^= q - 1L
      q >>= 1
    }
    i = 0
    while (i < n) { coords(i) ^= t; i += 1 }
    // transpose → index: MSB-first, dimension-major interleave
    var h = 0L
    var b = bits - 1
    while (b >= 0) {
      i = 0
      while (i < n) {
        h = (h << 1) | ((coords(i) >>> b) & 1L)
        i += 1
      }
      b -= 1
    }
    h
  }

  /** Inverse mapping (index → cell coordinates), used by tests to verify the
    * curve's defining adjacency property; same source algorithm. */
  def indexToCoords(h: Long, bits: Int, dims: Int): Array[Long] = {
    val x = new Array[Long](dims)
    if (dims == 1) { x(0) = h; return x }
    // de-interleave into transpose form
    var pos = dims * bits - 1
    var b = bits - 1
    while (b >= 0) {
      var i = 0
      while (i < dims) {
        x(i) |= ((h >>> pos) & 1L) << b
        pos -= 1
        i += 1
      }
      b -= 1
    }
    // Gray decode
    val top = 1L << bits
    var t = x(dims - 1) >> 1
    var i = dims - 1
    while (i > 0) { x(i) ^= x(i - 1); i -= 1 }
    x(0) ^= t
    // undo excess work
    var q = 2L
    while (q != top) {
      val p = q - 1L
      i = dims - 1
      while (i >= 0) {
        if ((x(i) & q) != 0L) x(0) ^= p
        else {
          t = (x(0) ^ x(i)) & p
          x(0) ^= t; x(i) ^= t
        }
        i -= 1
      }
      q <<= 1
    }
    x
  }

  /** Column form: `hilbert_index(bits, bucketCols...)` over LongType bucket
    * ids already clamped to [0, 2^bits). */
  def indexColumn(bits: Int, buckets: Seq[Column]): Column =
    ColumnExpr.toColumn(HilbertIndex(buckets.map(ColumnExpr.of), bits))
}

/** Catalyst expression wrapping [[HilbertCurve.index]]: one static call per
  * row inside whole-stage codegen (same extension tier as
  * [[CosineSimilarity]] — a native Expression, not a UDF). Null in any
  * dimension yields null (matching the z-value formulation, where a null
  * bucket nulls the whole interleave). */
case class HilbertIndex(children: Seq[Expression], bits: Int) extends Expression {

  require(bits >= 1 && bits <= 16, "hilbert bits must be in [1,16]")

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.isEmpty || children.size * bits > 63)
      TypeCheckResult.TypeCheckFailure(
        s"hilbert_index needs 1..${63 / bits} dimensions at $bits bits, got ${children.size}")
    else if (!children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckFailure(
        s"hilbert_index expects LongType buckets, got ${children.map(_.dataType).mkString(",")}")
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = {
    val arr = new Array[Long](children.size)
    var i = 0
    while (i < arr.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      arr(i) = v.asInstanceOf[Long]
      i += 1
    }
    HilbertCurve.index(arr, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    // one scratch array per operator instance, not per row (index() mutates
    // it, and every row overwrites all k slots before the call)
    val arr = ctx.addMutableState("long[]", "hilbertCoords",
      v => s"$v = new long[${children.size}];")
    val gather = evals.zipWithIndex.map { case (e, i) =>
      s"""
         |${e.code}
         |if (${e.isNull}) { ${ev.isNull} = true; break; }
         |$arr[$i] = ${e.value};
       """.stripMargin
    }.mkString("\n")
    ev.copy(
      code = code"""
        |boolean ${ev.isNull} = false;
        |long ${ev.value} = 0L;
        |do {
        |  $gather
        |  ${ev.value} = graft.functions.HilbertCurve.index($arr, $bits);
        |} while (false);
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}
