package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `lsh_bucket(vec, nPlanes)` — the random-hyperplane sign bucket as one
  * codegen'd scalar: bit-identical to `Ann.lshBucketColumns` (bit j =
  * sign of the quantized dot with plane j, whose component for dimension
  * i is `pmod(xxhash64(j, i), 2001) - 1000` — Spark's seed-chained
  * multi-argument xxhash64, replayed here via `XxHash64Function`), which
  * interprets nPlanes × dims lambda evaluations per row. Plane
  * components depend only on (plane, dimension), so they are computed
  * once per observed dimensionality and cached; each row then quantizes
  * once and does nPlanes dot products in primitive loops.
  */
case class LshBucket(children: Seq[Expression]) extends Expression {

  private def vecExpr = children.head

  override def nullable: Boolean = children.headOption.forall(_.nullable)
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length == 2 && QuantizedVec.elemOk(vecExpr.dataType) &&
      children(1).dataType == IntegerType && children(1).foldable && {
        // nPlanes bounds are an ANALYSIS error, not a row-eval crash:
        // <= 0 would cache an empty plane table (cur(0) AIOOBE on the
        // second row), > 63 wraps the 1L << j bucket bit
        val n = children(1).eval(null)
        n != null && n.asInstanceOf[Int] >= 1 && n.asInstanceOf[Int] <= 63
      })
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "lsh_bucket(vec array<float|double>, nPlanes int-literal in [1, 63])")

  @transient private lazy val nPlanes: Int =
    children(1).eval(null).asInstanceOf[Int]
  @transient private lazy val isFloat = QuantizedVec.isFloat(vecExpr.dataType)
  // planes(j)(i), grown on demand; plane components are pure in (j, i)
  @transient private var planes: Array[Array[Long]] = _

  private def planeComponent(j: Int, i: Long): Long = {
    // Spark xxhash64(j, i): seed 42, children hashed left to right
    val h1 = XxHash64Function.hash(j, IntegerType, 42L)
    val h = XxHash64Function.hash(i, LongType, h1)
    ((h % 2001L) + 2001L) % 2001L - 1000L // pmod
  }

  private def planesFor(dims: Int): Array[Array[Long]] = {
    val cur = planes
    if (cur != null && cur.length > 0 && cur(0).length >= dims) cur
    else {
      val next = Array.tabulate(nPlanes)(j =>
        Array.tabulate(dims)(i => planeComponent(j, i.toLong)))
      planes = next
      next
    }
  }

  /** Bucket id for one vector (public: called from generated code). */
  def bucket(vec: ArrayData): Long = {
    val n = vec.numElements()
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      // a null element nulls every plane's dot in the reference
      // formulation, zeroing the whole bucket — replicate
      if (vec.isNullAt(i)) return 0L
      val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      q(i) = QuantizedVec.qint(x)
      i += 1
    }
    val p = planesFor(n)
    var out = 0L
    var j = 0
    while (j < nPlanes) {
      val pj = p(j)
      var dot = 0L
      var k = 0
      while (k < n) { dot += q(k) * pj(k); k += 1 }
      if (dot >= 0) out += (1L << j)
      j += 1
    }
    out
  }

  override def eval(input: InternalRow): Any = {
    val v = vecExpr.eval(input)
    if (v == null) null else bucket(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshBucket", this, classOf[LshBucket].getName)
    val childGen = vecExpr.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = ${childGen.isNull};
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.bucket(${childGen.value});
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)

  override def prettyName: String = "lsh_bucket"
}
