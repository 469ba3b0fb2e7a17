package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import graft.chunk.Gorilla

/** Catalyst `Generator` (explode-shaped) that decodes one Gorilla chunk
  * row into its points: `gorilla_explode(n, blob, crc)` -> rows
  * `(ts bigint, value double)`.
  *
  * Why a custom expression instead of the typed `flatMap` in
  * `ChunkWriter.decode`: a Generate node gives the optimizer something it
  * can see through. `PruneChunksByTime` rewrites time predicates on the
  * decoded `ts` into chunk-level `(t0, t_max)` predicates below the
  * Generate, which standard pushdown then carries into the Parquet scan —
  * row-group pruning on chunk stats, no blob ever decompressed for a
  * pruned range. The typed-flatMap path stays for Dataset users; both
  * decode identically (PlansSpec).
  *
  * Evaluation is interpreted per chunk row (`CodegenFallback`) — the codec
  * is bit-level scalar code that would not benefit from codegen, and each
  * call amortizes over up to `maxPoints` output rows.
  */
case class GorillaExplode(children: Seq[Expression])
    extends Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("ts", LongType, nullable = false),
    StructField("value", DoubleType, nullable = true)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = children.length == 3 &&
      children(0).dataType == IntegerType &&
      children(1).dataType == BinaryType &&
      children(2).dataType == IntegerType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "gorilla_explode(n int, blob binary, crc int) expected")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val nRaw = children(0).eval(input)
    val blobRaw = children(1).eval(input)
    val crcRaw = children(2).eval(input)
    // null input -> no rows, like the built-in generators (a nullable
    // chunk row must not NPE the query); CRC still guards non-null blobs
    if (nRaw == null || blobRaw == null || crcRaw == null)
      return Iterator.empty
    val n = nRaw.asInstanceOf[Int]
    val blob = blobRaw.asInstanceOf[Array[Byte]]
    val crc = crcRaw.asInstanceOf[Int]
    require(Gorilla.crc32(blob) == crc, "gorilla_explode: CRC mismatch")
    val (ts, vs) = Gorilla.decode(blob, n)
    ts.indices.iterator.map { i =>
      InternalRow(ts(i),
        if (java.lang.Double.isNaN(vs(i))) null else vs(i))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GorillaExplode =
    copy(children = newChildren)
}
