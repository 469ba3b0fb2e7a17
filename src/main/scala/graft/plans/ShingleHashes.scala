package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_hashes(text, n)` — xxhash64 (Spark seed 42) of EVERY k-token
  * window (stride 1) as one codegen'd scalar: bit-identical to
  * `transform(shingles(text, n), w -> xxhash64(w))` (a text with fewer
  * than n tokens yields the single hash of the space-joined whole), which
  * the repeated-window detector evaluated as an interpreted
  * transform/slice/concat_ws tree per window per row. One StringBuilder is
  * reused across windows; the hash is Spark's own `XxHash64Function` over
  * the window string, so collision behavior and values are exactly those
  * of the Catalyst formulation. Parity asserted in TextOpsSpec.
  */
case class ShingleHashes(children: Seq[Expression]) extends Expression {

  private def textExpr = children.head

  override def nullable: Boolean = children.headOption.forall(_.nullable)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length == 2 && textExpr.dataType == StringType &&
      children(1).dataType == IntegerType && children(1).foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "shingle_hashes(text string, n int-literal)")

  @transient private lazy val n: Int =
    children(1).eval(null).asInstanceOf[Int]

  /** Window hashes for one document (public: called from generated code). */
  def hashes(text: UTF8String): GenericArrayData = {
    val toks = SqlText.tokens(text.toString)
    val sb = new java.lang.StringBuilder(64)
    if (toks.length < n) {
      sb.setLength(0)
      var t = 0
      while (t < toks.length) {
        if (t > 0) sb.append(' ')
        sb.append(toks(t))
        t += 1
      }
      new GenericArrayData(Array[Any](XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L)))
    } else {
      val m = toks.length - (n - 1)
      val out = new Array[Any](m)
      var i = 0
      while (i < m) {
        sb.setLength(0)
        var t = 0
        while (t < n) {
          if (t > 0) sb.append(' ')
          sb.append(toks(i + t))
          t += 1
        }
        out(i) = XxHash64Function.hash(
          UTF8String.fromString(sb.toString), StringType, 42L)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override def eval(input: InternalRow): Any = {
    val t = textExpr.eval(input)
    if (t == null) null else hashes(t.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashes", this, classOf[ShingleHashes].getName)
    val childGen = textExpr.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = ${childGen.isNull};
        org.apache.spark.sql.catalyst.util.GenericArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.hashes(${childGen.value});
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)

  override def prettyName: String = "shingle_hashes"
}
