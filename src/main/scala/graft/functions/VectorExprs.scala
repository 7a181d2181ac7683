package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the serial-fold dot product of two
  * double arrays — the hot kernel of the similarity/dedup packs.
  *
  * Why a custom Expression rather than the Scala UDF in TextKernels: this
  * participates in whole-stage codegen (no UDF serialization boundary, no
  * per-element boxing — `ArrayData.getDouble` reads the unsafe buffer
  * directly), which is the preference order for extending Spark: built-in
  * function > native Expression > UDF. The fold order is the same serial
  * left-to-right accumulation as TextKernels.dotd and the DuckDB oracle's
  * list_reduce, so results stay bitwise identical (VectorExprsSpec pins
  * interpreted == codegen == UDF).
  *
  * Null elements inside the arrays are not expected (embeddings are dense);
  * like the SQL twin, length mismatch folds over the shorter prefix.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two array<double> inputs, got $l and $r")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** serial-fold dot product (codegen'd native expression). */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** cosine from precomputed squared norms: dot / (sqrt(na) * sqrt(nb)) —
    * the exact op order the oracle uses. */
  def cosine(va: Column, vb: Column, na: Column, nb: Column): Column =
    dot(va, vb) / (sqrt(na) * sqrt(nb))
}
