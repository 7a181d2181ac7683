package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** x17's content-defined-chunking boundary scan as a native codegen'd
  * kernel. Semantically IDENTICAL to the SQL it replaces (the DuckDB
  * oracle still runs that SQL):
  *
  *   concat(array(1), if(length(nt) < 9, array(),
  *     filter(transform(sequence(2, length(nt) - 7),
  *       p -> if(substring(md5(substring(nt, p, 8)), 1, 2) < '04', p, -1)),
  *       x -> x > 0)))
  *
  * i.e. position 1 plus every p in [2, len−7] whose 8-char window's md5
  * has first byte < 4 (hex "00".."03" < "04" ⇔ unsigned byte < 4 — hex
  * digits are ordered). The interpreted higher-order-function chain paid a
  * per-position lambda interpretation, a full 32-char hex string render
  * and a string compare; this kernel reuses one MessageDigest per task and
  * compares the first digest byte — the digested BYTES are the same UTF-8
  * window bytes `md5(substring(...))` hashes, so boundaries match exactly
  * (CdcStartsSpec pins kernel == SQL on random inputs; the x17 oracle pins
  * the whole chain).
  */
object CdcKernels {
  private val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** The boundary-position array for normalized text `nt`. */
  def starts(nt: UTF8String): GenericArrayData = {
    val bytes = nt.getBytes
    val nChars = nt.numChars()
    if (nChars < 9) return new GenericArrayData(Array[Int](1))
    val md = mdLocal.get()
    val out = new scala.collection.mutable.ArrayBuffer[Int](nChars / 32 + 4)
    out += 1
    if (bytes.length == nChars) {
      // pure ASCII (the normalized [a-z ] alphabet): char index == byte
      // index, so the window is a direct slice of the UTF-8 bytes
      var p = 2
      val last = nChars - 7
      while (p <= last) {
        md.reset()
        md.update(bytes, p - 1, 8)
        if ((md.digest()(0) & 0xff) < 4) out += p
        p += 1
      }
    } else {
      // non-ASCII fallback: substring by chars, then its UTF-8 bytes —
      // byte-identical to what md5(substring(nt, p, 8)) digests
      var p = 2
      val last = nChars - 7
      while (p <= last) {
        val win = nt.substringSQL(p, 8).getBytes
        md.reset()
        md.update(win)
        if ((md.digest()(0) & 0xff) < 4) out += p
        p += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}

case class CdcStarts(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_starts requires a string input, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_cdc_starts"

  override protected def nullSafeEval(s: Any): Any =
    CdcKernels.starts(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcKernels.starts($c)")

  override protected def withNewChildInternal(newChild: Expression): CdcStarts =
    copy(child = newChild)
}

object CdcStarts {
  def of(c: Column): Column = Bridge.column(CdcStarts(Bridge.expression(c)))
}
