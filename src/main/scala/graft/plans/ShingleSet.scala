package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Tokenization with exact `split(trim(text), "\\s+")` parity: SQL `trim`
  * strips ONLY space characters (Java's `String.trim` also eats tabs and
  * newlines) and Spark's `split` uses limit -1 (a trailing empty token
  * survives, which Java's default limit 0 drops). Shared by every native
  * kernel that mirrors the Catalyst tokenization.
  */
private[plans] object SqlText {
  private val Ws = java.util.regex.Pattern.compile("\\s+")
  def tokens(s: String): Array[String] = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    Ws.split(s.substring(from, to), -1)
  }
}

/** `shingle_set(text, n)` — the DISTINCT word-n-gram shingle array as one
  * codegen'd scalar: bit-identical to
  * `array_distinct(transform(sequence(...), i -> concat_ws(" ",
  * slice(tokens, i, n))))` (first-occurrence order preserved; a text
  * with fewer than n tokens collapses to the single space-joined token
  * string), which is interpreted per shingle per row. This is the exact
  * Jaccard verification kernel of the LSH dedup pipeline — computed
  * twice per candidate join. Parity asserted in TextOpsSpec.
  */
case class ShingleSet(children: Seq[Expression]) extends Expression {

  private def textExpr = children.head

  override def nullable: Boolean = children.headOption.forall(_.nullable)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length == 2 && textExpr.dataType == StringType &&
      children(1).dataType == IntegerType && children(1).foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "shingle_set(text string, n int-literal)")

  @transient private lazy val n: Int =
    children(1).eval(null).asInstanceOf[Int]

  /** Distinct shingles (public: called from generated code). */
  def set(text: UTF8String): GenericArrayData = {
    val toks = SqlText.tokens(text.toString)
    val seen = new java.util.LinkedHashSet[String]()
    if (toks.length < n) {
      seen.add(toks.mkString(" "))
    } else {
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      val m = toks.length - (n - 1)
      while (i < m) {
        sb.setLength(0)
        var t = 0
        while (t < n) {
          if (t > 0) sb.append(' ')
          sb.append(toks(i + t))
          t += 1
        }
        seen.add(sb.toString)
        i += 1
      }
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any = {
    val t = textExpr.eval(input)
    if (t == null) null else set(t.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleSet", this, classOf[ShingleSet].getName)
    val childGen = textExpr.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = ${childGen.isNull};
        org.apache.spark.sql.catalyst.util.GenericArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.set(${childGen.value});
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)

  override def prettyName: String = "shingle_set"
}
