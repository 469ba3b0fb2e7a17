package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `chunk_hashes(vec, nChunks)` — the cosine-near-dup candidate blocking
  * kernel as one codegen'd scalar: bit-identical to the Catalyst tree it
  * replaces in `Ann.cosineNearDups`
  * (`xxhash64(concat_ws(",", slice(transform(vec, qint), c*per+1, per)))`
  * per chunk c, per = ceil(len / nChunks)), which interprets a lambda
  * per element plus per-chunk slice/concat allocations. Here the vector
  * is quantized once in a primitive loop and each chunk renders its
  * decimal-joined string directly (concat_ws semantics: longs in decimal,
  * ',' separator, null elements SKIPPED) before one xxhash64 (seed 42,
  * Spark's) — reachable from whole-stage codegen.
  */
case class ChunkHashes(children: Seq[Expression]) extends Expression {

  private def vecExpr = children.head

  override def nullable: Boolean = children.headOption.forall(_.nullable)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length == 2 && QuantizedVec.elemOk(vecExpr.dataType) &&
      children(1).dataType == IntegerType && children(1).foldable && {
        val n = children(1).eval(null)
        n != null && n.asInstanceOf[Int] >= 1
      })
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "chunk_hashes(vec array<float|double>, nChunks positive int-literal)")

  @transient private lazy val nChunks: Int =
    children(1).eval(null).asInstanceOf[Int]
  @transient private lazy val isFloat = QuantizedVec.isFloat(vecExpr.dataType)

  /** Chunk hashes for one vector (public: called from generated code). */
  def hashes(vec: ArrayData): ArrayData = {
    val n = vec.numElements()
    // ceil(n / nChunks) like the Catalyst tree (DoubleType ceil -> int)
    val per = math.ceil(n.toDouble / nChunks).toInt
    val out = new Array[Long](nChunks)
    val sb = new java.lang.StringBuilder(per * 8)
    var c = 0
    while (c < nChunks) {
      sb.setLength(0)
      var i = c * per
      val end = math.min(i + per, n)
      var first = true
      while (i < end) {
        // concat_ws skips null elements entirely (no empty slot)
        if (!vec.isNullAt(i)) {
          if (!first) sb.append(',')
          val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
          sb.append(QuantizedVec.qint(x))
          first = false
        }
        i += 1
      }
      out(c) = XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L)
      c += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any = {
    val v = vecExpr.eval(input)
    if (v == null) null else hashes(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("chunkHashes", this, classOf[ChunkHashes].getName)
    val childGen = vecExpr.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = ${childGen.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.hashes(${childGen.value});
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)

  override def prettyName: String = "chunk_hashes"
}
