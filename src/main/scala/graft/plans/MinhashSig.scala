package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `minhash_sig(text, k)` — the MinHash signature (K minima over a
  * Carter-Wegman 31-bit family applied to word-3-gram shingle hashes) as
  * ONE codegen'd scalar expression.
  *
  * Bit-identical to the Catalyst-expression formulation it replaces
  * (`aggregate` over `transform(shingles(text,3), s ->
  * pmod(xxhash64(s), 2^31-1))` — asserted on real fixture docs in
  * TextOpsSpec): same whitespace tokenization as `split(trim(text),
  * "\\s+")`, same shingle strings, Spark's own xxhash64 (seed 42) via
  * `XxHash64Function`, same `h_j(x) = (a_j x + b_j) mod (2^31-1)` family.
  * The higher-order-function tree is interpreted per shingle per row and
  * dominated the whole LSH dedup pipeline; this loop is reachable from
  * whole-stage codegen and does K updates per shingle in primitive
  * arrays.
  */
case class MinhashSig(children: Seq[Expression]) extends Expression {

  private def textExpr = children.head

  override def nullable: Boolean = children.headOption.forall(_.nullable)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length == 2 && textExpr.dataType == StringType &&
      children(1).dataType == IntegerType && children(1).foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "minhash_sig(text string, k int-literal)")

  private val P31 = 2147483647L
  @transient private lazy val k: Int =
    children(1).eval(null).asInstanceOf[Int]
  // identical parameter derivation to TextOps.aK/bK
  @transient private lazy val aArr: Array[Long] =
    Array.tabulate(k)(i => 2 * (1103515245L * (i + 1) % (P31 / 2)) + 1)
  @transient private lazy val bArr: Array[Long] =
    Array.tabulate(k)(i => 12345L * (i + 7) % P31)

  /** Signature for one document (public: called from generated code). */
  def sig(text: UTF8String): GenericArrayData = {
    val toks = SqlText.tokens(text.toString)
    val n = toks.length
    val acc = Array.fill(k)(Long.MaxValue)
    var i = 0
    val m = if (n < 3) 1 else n - 2
    val sb = new java.lang.StringBuilder(64)
    while (i < m) {
      sb.setLength(0)
      if (n < 3) {
        var t = 0
        while (t < n) { if (t > 0) sb.append(' '); sb.append(toks(t)); t += 1 }
      } else {
        sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ')
          .append(toks(i + 2))
      }
      val h = XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L)
      val x = ((h % P31) + P31) % P31 // pmod
      var j = 0
      while (j < k) {
        val hj = (aArr(j) * x + bArr(j)) % P31
        if (hj < acc(j)) acc(j) = hj
        j += 1
      }
      i += 1
    }
    new GenericArrayData(acc)
  }

  override def eval(input: InternalRow): Any = {
    val t = textExpr.eval(input)
    if (t == null) null else sig(t.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSig", this, classOf[MinhashSig].getName)
    val childGen = textExpr.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = ${childGen.isNull};
        org.apache.spark.sql.catalyst.util.GenericArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.sig(${childGen.value});
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)

  override def prettyName: String = "minhash_sig"
}
