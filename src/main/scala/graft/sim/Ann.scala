package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - brute-force cosine top-k (the correctness baseline) — pure
  *    `zip_with`/`aggregate` expressions, no UDF, fully codegen'd;
  *  - LSH-bucketed approximate variant (the scale path): random-hyperplane
  *    sign buckets with multi-probe, so only a bucket's worth of vectors
  *    is scored per query. At 10^12 rows the bucket id becomes the shuffle
  *    / storage partition key.
  *
  * Exactness trick for the oracle: dot products are computed over
  * integer-quantized components (round(x * 2^20) as long) — products and
  * sums are then exact integers, so scores are bitwise identical across
  * engines and partitionings; the only float ops (sqrt + two divides)
  * have a fixed expression shape on both sides.
  */
object Ann {

  val Scale = 1048576L // 2^20

  private def qint(x: Column): Column =
    round(x.cast("double") * Scale).cast("long")

  /** Integer dot product of two float vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => qint(x) * qint(y)), lit(0L), _ + _)

  /** Integer squared norm. */
  def norm2Q(a: Column): Column =
    aggregate(transform(a, x => qint(x) * qint(x)), lit(0L), _ + _)

  def cosineQ(dot: Column, n2a: Column, n2b: Column): Column =
    dot.cast("double") / sqrt(n2a.cast("double")) / sqrt(n2b.cast("double"))

  /** Brute-force cosine top-k of `vectors` against the single query row
    * selected by `queryId`. Deterministic: rank orders by (cos desc, id).
    */
  def bruteForceTopK(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      queryId: Long,
      k: Int
  ): DataFrame = {
    val q = vectors.filter(col(idCol) === queryId)
      .select(col(vecCol).as("_qv"))
    val scored = vectors.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol),
        cosineQ(dotQ(col(vecCol), col("_qv")),
          norm2Q(col(vecCol)), norm2Q(col("_qv"))).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cos").desc, col(idCol))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane j, dim i):
    * an integer in [-1000, 1000] from a splitmix-style bit mix — no RNG
    * state, so every executor and every engine derives the same planes.
    */
  private def planeComponent(j: Int, i: Column): Column =
    pmod(xxhash64(lit(j), i), lit(2001L)) - 1000L

  /** Sign-bucket id from `nPlanes` hyperplanes (bit j = sign of the dot
    * product with plane j).
    */
  def lshBucket(vec: Column, nPlanes: Int): Column =
    (0 until nPlanes).map { j =>
      val dot = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => qint(x) * planeComponent(j, i.cast("long"))),
        lit(0L), _ + _)
      when(dot >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed ANN: score only vectors sharing the query's bucket or
    * any bucket at Hamming distance 1 (multi-probe). Returns the same
    * schema as bruteForceTopK; recall < 1 by design.
    */
  def lshTopK(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      queryId: Long,
      k: Int,
      nPlanes: Int = 8
  ): DataFrame = {
    val withBucket = vectors.withColumn("_bucket", lshBucket(col(vecCol), nPlanes))
    val q = withBucket.filter(col(idCol) === queryId)
      .select(col(vecCol).as("_qv"), col("_bucket").as("_qb"))
    val probes = broadcast(q.select(
      explode(array(
        (col("_qb") +: (0 until nPlanes).map(j =>
          col("_qb").bitwiseXOR(lit(1L << j)))): _*)).as("_bucket"),
      col("_qv")))
    val cand = withBucket.filter(col(idCol) =!= queryId)
      .join(probes, "_bucket")
    val scored = cand.select(col(idCol),
      cosineQ(dotQ(col(vecCol), col("_qv")),
        norm2Q(col(vecCol)), norm2Q(col("_qv"))).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cos").desc, col(idCol))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }
}
