package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sim.Ann

/** Similarity-search queries over the `embeddings` fixture. The
  * brute-force top-k is the oracle-checked baseline (integer-quantized
  * dot products make the scores bitwise cross-engine); the LSH variant is
  * the scale path, rows-only here with recall asserted in ScalaTest.
  */
object SimQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_brute" -> ((s, dir) =>
      Ann.bruteForceTopK(
        s.read.parquet(s"$dir/embeddings.parquet"),
        "vec_id", "embedding", queryId = 0L, k = 10)
        .select(col("vec_id"), col("cos"), col("rk").cast("long").as("rk"))),

    "q_ann_lsh" -> ((s, dir) =>
      Ann.lshTopK(
        s.read.parquet(s"$dir/embeddings.parquet"),
        "vec_id", "embedding", queryId = 0L, k = 10, nPlanes = 8)
        .select(col("vec_id"), col("cos"), col("rk").cast("long").as("rk")))
  )

  val oracleSql: Map[String, String] = Map(
    "q_ann_brute" ->
      """WITH ex AS (SELECT vec_id, UNNEST(embedding) AS e, generate_subscripts(embedding, 1) AS i FROM embeddings),
        |q AS (SELECT i, CAST(round(e * 1048576.0) AS BIGINT) AS qe FROM ex WHERE vec_id = 0),
        |v AS (SELECT vec_id, i, CAST(round(e * 1048576.0) AS BIGINT) AS ve FROM ex WHERE vec_id <> 0),
        |dots AS (SELECT v.vec_id, CAST(sum(v.ve * q.qe) AS BIGINT) AS dot,
        |                CAST(sum(v.ve * v.ve) AS BIGINT) AS n2v
        |         FROM v JOIN q USING (i) GROUP BY 1),
        |qn AS (SELECT CAST(sum(qe * qe) AS BIGINT) AS n2q FROM q),
        |scored AS (SELECT vec_id,
        |  CAST(dot AS DOUBLE) / sqrt(CAST(n2v AS DOUBLE)) / sqrt(CAST(n2q AS DOUBLE)) AS cos
        |  FROM dots, qn)
        |SELECT vec_id, cos, rk FROM (
        |  SELECT vec_id, cos, row_number() OVER (ORDER BY cos DESC, vec_id) AS rk
        |  FROM scored) r
        |WHERE rk <= 10""".stripMargin
  )
}
