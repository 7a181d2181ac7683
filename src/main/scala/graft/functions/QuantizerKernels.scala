package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native nearest-cell kernel for the quantizer's assignment/probe paths
  * (round 14, guide §1.2 "per-task work" + §7.2 plan hygiene).
  *
  * The literal-expression form it replaces — `array_min(array(struct(-cos
  * to centroid 0), …))` with every 64-dim centroid inlined as an array
  * literal — had three measured pathologies at k=8 cells:
  *   1. the projection is ~4,000 expression nodes, too large for efficient
  *      codegen, so it fell to interpreted evaluation (≈1 s of single-task
  *      CPU per 2,000-row broadcast build);
  *   2. the optimizer's constraint propagation inferred
  *      `isnotnull(array_min(…).cell)` from the downstream cell equi-join
  *      and DUPLICATED the whole expression into a Filter below the
  *      Project — every row paid the assignment twice;
  *   3. the plan text carried k×dim doubles per REFERENCE (megabytes),
  *      slowing analysis, optimization and plan canonicalization.
  * Here the centroid matrix rides along as one reference object, the
  * argmin is a tight JVM loop, and the plan node is a single call.
  *
  * Bitwise contract (QuantizerKernelSpec pins kernel == literal SQL form on
  * both evaluation paths): the per-cell score is the serial-fold dot
  * product (DotProduct's exact op order) divided by
  * `sqrt(norm2) * sqrt(cn2)` with `sqrt(cn2)` precomputed via the same
  * `java.lang.Math.sqrt` that Catalyst's constant folding used, then
  * negated — and the (neg, cell) ordering replicates Spark's struct
  * ordering for doubles (`if (x == y) 0 else Double.compare(x, y)`, so
  * -0.0 == 0.0 and NaN sorts largest) with cell-ascending tiebreaks,
  * exactly what `array_min` / `array_sort` computed over the structs.
  *
  * `nProbe == 1` returns the single nearest cell id (IntegerType);
  * `nProbe > 1` returns the first nProbe cell ids ascending by (neg, cell)
  * (ArrayType(IntegerType)), the `slice(array_sort(…), 1, n)` twin.
  */
case class NearestCells(left: Expression, right: Expression,
    cells: IndexedSeq[Int], cvsFlat: IndexedSeq[Double], dim: Int,
    sqrtCn2s: IndexedSeq[Double], nProbe: Int, scalar: Boolean)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_nearest_cells requires (array<double>, double), got $l and $r")
    }

  override def dataType: DataType =
    if (scalar) IntegerType
    else ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_cells"

  @transient private lazy val cellArr: Array[Int] = cells.toArray
  @transient private lazy val cvArr: Array[Double] = cvsFlat.toArray
  @transient private lazy val sqArr: Array[Double] = sqrtCn2s.toArray

  /** Spark's double ordering (SQLOrderingUtil.compareDoubles). */
  private def cmp(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)

  private def negsOf(v: ArrayData, n2: Double): Array[Double] = {
    val k = cellArr.length
    val sn = java.lang.Math.sqrt(n2)
    val out = new Array[Double](k)
    val lim = math.min(dim, v.numElements())
    var c = 0
    while (c < k) {
      var s = 0.0
      var i = 0
      val off = c * dim
      while (i < lim) { s += v.getDouble(i) * cvArr(off + i); i += 1 }
      out(c) = -(s / (sn * sqArr(c)))
      c += 1
    }
    out
  }

  def pickOne(v: ArrayData, n2: Double): Int = {
    val negs = negsOf(v, n2)
    var best = 0
    var c = 1
    while (c < negs.length) {
      val d = cmp(negs(c), negs(best))
      if (d < 0 || (d == 0 && cellArr(c) < cellArr(best))) best = c
      c += 1
    }
    cellArr(best)
  }

  def pickMany(v: ArrayData, n2: Double): ArrayData = {
    val negs = negsOf(v, n2)
    val k = negs.length
    val idx = Array.range(0, k)
    // insertion sort by (neg, cell) — k is bounded by the LiteralMax guard
    var i = 1
    while (i < k) {
      val key = idx(i)
      var j = i - 1
      while (j >= 0 && {
          val d = cmp(negs(idx(j)), negs(key))
          d > 0 || (d == 0 && cellArr(idx(j)) > cellArr(key))
        }) { idx(j + 1) = idx(j); j -= 1 }
      idx(j + 1) = key
      i += 1
    }
    val n = math.min(nProbe, k)
    val out = new Array[Any](n)
    var t = 0
    while (t < n) { out(t) = cellArr(idx(t)); t += 1 }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n2 = b.asInstanceOf[Double]
    if (scalar) pickOne(v, n2) else pickMany(v, n2)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n2) => {
      val ref = ctx.addReferenceObj("nearestCells", this,
        classOf[NearestCells].getName)
      if (scalar) s"${ev.value} = $ref.pickOne($v, $n2);"
      else s"${ev.value} = $ref.pickMany($v, $n2);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): NearestCells =
    copy(left = newLeft, right = newRight)
}

object QuantizerKernels {
  /** Single nearest cell id (`nProbe == 1`, IntegerType) or the
    * first-nProbe cell ids (ArrayType), for rows with `v: array<double>`
    * and `norm2: double` columns. `nearestCellsArray` always returns the
    * array form, even for nProbe = 1 (the probe path explodes it). */
  def nearestCells(v: Column, norm2: Column, cells: Seq[Int],
      cvs: Seq[Array[Double]], sqrtCn2s: Seq[Double], nProbe: Int): Column =
    build(v, norm2, cells, cvs, sqrtCn2s, nProbe, scalar = nProbe == 1)

  def nearestCellsArray(v: Column, norm2: Column, cells: Seq[Int],
      cvs: Seq[Array[Double]], sqrtCn2s: Seq[Double], nProbe: Int): Column =
    build(v, norm2, cells, cvs, sqrtCn2s, nProbe, scalar = false)

  private def build(v: Column, norm2: Column, cells: Seq[Int],
      cvs: Seq[Array[Double]], sqrtCn2s: Seq[Double], nProbe: Int,
      scalar: Boolean): Column =
    Bridge.column(NearestCells(
      Bridge.expression(v), Bridge.expression(norm2),
      cells.toIndexedSeq,
      cvs.flatMap(_.toIndexedSeq).toIndexedSeq,
      if (cvs.isEmpty) 0 else cvs.head.length,
      sqrtCn2s.toIndexedSeq, nProbe, scalar))
}
