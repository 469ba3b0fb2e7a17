package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `ivf_best_cell(vec, cells, qcents, n2c)` — the IVF coarse quantizer's
  * hot loop as ONE codegen'd scalar expression: returns the cell id of
  * the nearest centroid by (cosine desc, cell asc).
  *
  * The equivalent `transform`+`array_max` formulation is interpreted
  * (higher-order functions have no codegen) and re-evaluates the centroid
  * structs per row — measured 4.6 s for 2 000x64-dim vectors at
  * local[32]; this expression does the same work in tight primitive-array
  * loops reachable from whole-stage codegen. At corpus scale the
  * assignment runs once per row per index build, so this is the
  * difference between an index build bound by the write and one bound by
  * expression interpretation.
  *
  * Exactness contract (the DuckDB oracle replays the same math):
  *  - quantization mirrors `round(x * 2^20)` with HALF_UP semantics via
  *    `BigDecimal.valueOf` — identical to Catalyst's `Round` on doubles,
  *    and the centroid-side quantization is DONE by Catalyst (the caller
  *    passes pre-quantized `qcents`), so both sides agree bit-for-bit;
  *  - the cosine is `dot / sqrt(n2v) / sqrt(n2c)` in that association
  *    order, matching `Ann.cosineQ`;
  *  - comparison uses `Double.compare` (NaN greatest), Spark's ordering.
  *
  * `cells`/`qcents`/`n2c` must be foldable array literals (one bounded
  * centroid table per query); vectors and centroids are assumed
  * equal-length with no null elements (the embedding-table contract).
  */
case class CentroidArgMax(children: Seq[Expression]) extends Expression {

  private def vecExpr = children.head

  // robust pre-type-check: an arity-0 call must reach checkInputDataTypes'
  // clear failure, not die in nullable/dataType resolution
  override def nullable: Boolean = children.headOption.forall(_.nullable)
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.length == 4 && QuantizedVec.elemOk(vecExpr.dataType) &&
      children.drop(1).forall(_.foldable) &&
      children(1).dataType == ArrayType(LongType, containsNull = false) &&
      // typedLit(Seq[Seq[Long]]) carries outer containsNull=true (inner
      // Seq is a reference type) — require the element shape, not the flag
      (children(2).dataType match {
        case ArrayType(ArrayType(LongType, false), _) => true
        case _ => false
      }) &&
      children(3).dataType == ArrayType(LongType, containsNull = false))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "ivf_best_cell(vec array<float|double>, cells array<bigint>, " +
        "qcents array<array<bigint>>, n2c array<bigint>) with foldable " +
        "centroid arguments")
  }

  @transient private lazy val cells: Array[Long] =
    children(1).eval(null).asInstanceOf[ArrayData].toLongArray()
  @transient private lazy val qcents: Array[Array[Long]] = {
    val ad = children(2).eval(null).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toLongArray())
  }
  @transient private lazy val n2c: Array[Long] =
    children(3).eval(null).asInstanceOf[ArrayData].toLongArray()
  @transient private lazy val isFloat = QuantizedVec.isFloat(vecExpr.dataType)

  /** HALF_UP `round(x * 2^20)` — Catalyst `Round` parity on doubles;
    * single shared definition (parity-critical) in [[QuantizedVec]].
    */
  private def qint(x: Double): Long = QuantizedVec.qint(x)

  /** Nearest cell id for one vector (public: called from generated code). */
  def bestCell(vec: ArrayData): Long = {
    if (qcents.isEmpty)
      throw new IllegalStateException(
        "ivf_best_cell: empty centroid table (corpus had no vectors?)")
    val n = vec.numElements()
    val q = new Array[Long](n)
    var n2v = 0L
    var i = 0
    while (i < n) {
      val d = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      val qi = qint(d)
      q(i) = qi
      n2v += qi * qi
      i += 1
    }
    val sn2v = Math.sqrt(n2v.toDouble)
    var bestIdx = -1
    var bestCos = 0.0
    var c = 0
    while (c < qcents.length) {
      val cv = qcents(c)
      var dot = 0L
      var j = 0
      val m = if (n < cv.length) n else cv.length
      while (j < m) { dot += q(j) * cv(j); j += 1 }
      val cos = dot.toDouble / sn2v / Math.sqrt(n2c(c).toDouble)
      if (bestIdx < 0) { bestIdx = c; bestCos = cos }
      else {
        val cmp = java.lang.Double.compare(cos, bestCos)
        if (cmp > 0 || (cmp == 0 && cells(c) < cells(bestIdx))) {
          bestIdx = c; bestCos = cos
        }
      }
      c += 1
    }
    cells(bestIdx)
  }

  override def eval(input: InternalRow): Any = {
    val v = vecExpr.eval(input)
    if (v == null) null else bestCell(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidArgMax", this,
      classOf[CentroidArgMax].getName)
    val childGen = vecExpr.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = ${childGen.isNull};
        long ${ev.value} = -1L;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.bestCell(${childGen.value});
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)

  override def prettyName: String = "ivf_best_cell"
}
