package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Shared quantization for the codegen'd vector expressions: HALF_UP
  * `round(x * 2^20)` with Catalyst `Round`-on-double parity (the oracle
  * replays the same SQL `round`), identical to [[CentroidArgMax]].
  */
private[plans] object QuantizedVec {
  def qint(x: Double): Long = {
    val y = x * 1048576.0
    // non-finite parity with `round(y).cast(long)`: Catalyst Round passes
    // NaN/Inf through and the long cast maps NaN -> 0, +/-Inf -> saturate
    // (BigDecimal.valueOf would throw NumberFormatException instead)
    if (java.lang.Double.isFinite(y))
      java.math.BigDecimal.valueOf(y)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
    else if (java.lang.Double.isNaN(y)) 0L
    else if (y > 0) Long.MaxValue
    else Long.MinValue
  }

  def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  def isFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

/** `qdot(a, b)` — integer dot product of two 2^20-quantized float/double
  * vectors as one codegen'd scalar (replaces the interpreted
  * `aggregate(zip_with(...))` tree in `Ann.dotQ`, which evaluated a
  * lambda per element per row and dominated every similarity scoring
  * path). Null/edge semantics mirror the higher-order formulation:
  * null result on null inputs, length mismatch, or a null element.
  */
case class QuantizedDot(children: Seq[Expression]) extends Expression {

  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length == 2 && children.forall(c => QuantizedVec.elemOk(c.dataType)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "qdot(a array<float|double>, b array<float|double>)")

  @transient private lazy val aFloat = QuantizedVec.isFloat(children(0).dataType)
  @transient private lazy val bFloat = QuantizedVec.isFloat(children(1).dataType)

  /** boxed Long or null (public: called from generated code). */
  def dot(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += QuantizedVec.qint(x) * QuantizedVec.qint(y)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override def eval(input: InternalRow): Any = {
    val a = children(0).eval(input)
    if (a == null) return null
    val b = children(1).eval(input)
    if (b == null) return null
    val r = dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qdot", this, classOf[QuantizedDot].getName)
    val aGen = children(0).genCode(ctx)
    val bGen = children(1).genCode(ctx)
    val boxed = ctx.freshName("boxedDot")
    ev.copy(code =
      code"""
        ${aGen.code}
        ${bGen.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${aGen.isNull} && !${bGen.isNull}) {
          java.lang.Long $boxed = $ref.dot(${aGen.value}, ${bGen.value});
          if ($boxed != null) {
            ${ev.isNull} = false;
            ${ev.value} = $boxed.longValue();
          }
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)

  override def prettyName: String = "qdot"
}

/** `qnorm2(a)` — integer squared norm of a 2^20-quantized vector
  * (codegen'd replacement for `Ann.norm2Q`'s interpreted tree). Null on
  * null input or a null element.
  */
case class QuantizedNorm2(children: Seq[Expression]) extends Expression {

  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length == 1 && QuantizedVec.elemOk(children.head.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("qnorm2(a array<float|double>)")

  @transient private lazy val aFloat = QuantizedVec.isFloat(children.head.dataType)

  def norm2(a: ArrayData): java.lang.Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val q = QuantizedVec.qint(x)
      acc += q * q
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override def eval(input: InternalRow): Any = {
    val a = children.head.eval(input)
    if (a == null) return null
    val r = norm2(a.asInstanceOf[ArrayData])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qnorm2", this, classOf[QuantizedNorm2].getName)
    val aGen = children.head.genCode(ctx)
    val boxed = ctx.freshName("boxedNorm")
    ev.copy(code =
      code"""
        ${aGen.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${aGen.isNull}) {
          java.lang.Long $boxed = $ref.norm2(${aGen.value});
          if ($boxed != null) {
            ${ev.isNull} = false;
            ${ev.value} = $boxed.longValue();
          }
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)

  override def prettyName: String = "qnorm2"
}
