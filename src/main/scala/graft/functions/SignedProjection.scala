package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native ±1 random-projection kernel for v18 (round 14, guide §1.2/§7.2).
  *
  * Replaces the plan-time-folded flat expression — `rows` sums of `dim`
  * signed `element_at(q, d)` terms (512 expression nodes at 8×64) — whose
  * size pushed the projection out of efficient codegen and bloated
  * analysis/optimization per construction. The sign matrix rides along as
  * one reference object; each output element is the same signed sum over
  * BIGINT inputs, and 64-bit integer addition is associative even under
  * wraparound, so term order cannot change the value — the result is
  * bit-identical to the folded SQL form the v18 oracle still runs
  * (SignedProjectionSpec pins kernel == SQL on both evaluation paths).
  */
case class SignedProjection(child: Expression,
    signsFlat: IndexedSeq[Long], rows: Int, dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_signed_proj requires array<bigint>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_signed_proj"

  @transient private lazy val signArr: Array[Long] = signsFlat.toArray

  def project(q: ArrayData): ArrayData = {
    val out = new Array[Any](rows)
    val lim = math.min(dim, q.numElements())
    var k = 0
    while (k < rows) {
      var s = 0L
      var d = 0
      val off = k * dim
      while (d < lim) { s += signArr(off + d) * q.getLong(d); d += 1 }
      out(k) = s
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any =
    project(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, q => {
      val ref = ctx.addReferenceObj("signedProj", this,
        classOf[SignedProjection].getName)
      s"$ref.project($q)"
    })

  override protected def withNewChildInternal(newChild: Expression): SignedProjection =
    copy(child = newChild)
}

object SignedProjection {
  def of(q: Column, signs: Array[Array[Long]]): Column =
    Bridge.column(SignedProjection(Bridge.expression(q),
      signs.flatten.toIndexedSeq, signs.length,
      if (signs.isEmpty) 0 else signs.head.length))
}
