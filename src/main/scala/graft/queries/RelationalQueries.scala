package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational coverage over the TPC-H-ish fixture tables: hash aggregation
  * with exact integer arithmetic, and a star-join with broadcast dims —
  * the small-dimension lookup the reference does with its areas table
  * (SURVEY.md §2.3 J5), at warehouse shape.
  *
  * Exactness: money columns are 2-decimal doubles; all sums run over
  * integer cents (and basis-point-scaled products), so results are
  * bitwise-identical to the oracle under any partitioning.
  */
object RelationalQueries {

  private def li(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/lineitem.parquet").select(
      col("l_orderkey"), col("l_returnflag"), col("l_linestatus"),
      col("l_shipdate"),
      round(col("l_quantity")).cast("long").as("qty"),
      round(col("l_extendedprice") * 100).cast("long").as("cents"),
      round(col("l_discount") * 100).cast("long").as("disc"),
      round(col("l_tax") * 100).cast("long").as("tax"))

  private val LI =
    "(SELECT l_orderkey, l_returnflag, l_linestatus, l_shipdate, " +
      "CAST(round(l_quantity) AS BIGINT) AS qty, " +
      "CAST(round(l_extendedprice*100) AS BIGINT) AS cents, " +
      "CAST(round(l_discount*100) AS BIGINT) AS disc, " +
      "CAST(round(l_tax*100) AS BIGINT) AS tax FROM lineitem)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-shaped pricing summary (exact integer arithmetic)
    "q1_pricing" -> ((s, dir) =>
      li(s, dir)
        .filter(col("l_shipdate") <= to_timestamp(lit("2001-09-01")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("qty")).as("sum_qty"),
          sum(col("cents")).as("sum_base_cents"),
          sum(col("cents") * (lit(100L) - col("disc"))).as("sum_disc_e4"),
          sum(col("cents") * (lit(100L) - col("disc")) * (lit(100L) + col("tax")))
            .as("sum_charge_e6"),
          count(lit(1)).as("n"))
        .withColumn("avg_qty", col("sum_qty").cast("double") / col("n"))
        .withColumn("avg_price",
          col("sum_base_cents").cast("double") / col("n") / lit(100.0))),

    // CO-LOCATED join via bucketing: both sides bucketBy(8) on the join
    // key, so the sort-merge join plans with ZERO exchanges (PlansSpec
    // asserts it with broadcast disabled). At 100 TB this is the shuffle
    // every repeated fact-to-fact join stops paying once the store is
    // bucketed — the same layout decision the pages store makes with
    // url-hash buckets. repartition(8, key) before the write uses the
    // same murmur3 hash as the bucket spec, so each bucket is exactly
    // one file and the sortBy order survives for the merge.
    "q_bucketed_join" -> ((s, dir) => {
      val root = Scratch.dir("bucketed")
      s.sql("DROP TABLE IF EXISTS g_orders_bkt")
      s.sql("DROP TABLE IF EXISTS g_lineitem_bkt")
      s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_orderpriority"))
        .repartition(8, col("o_orderkey"))
        .write.mode("overwrite").option("path", s"$root/orders")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("g_orders_bkt")
      li(s, dir).select(col("l_orderkey"), col("cents"), col("disc"))
        .repartition(8, col("l_orderkey"))
        .write.mode("overwrite").option("path", s"$root/lineitem")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("g_lineitem_bkt")
      s.table("g_lineitem_bkt")
        .join(s.table("g_orders_bkt"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("cents") * (lit(100L) - col("disc"))).as("revenue_e4"),
          count(lit(1)).as("n"))
    }),

    // star join: revenue by region/nation; nation+region are broadcast
    "q_region_revenue" -> ((s, dir) => {
      val orders = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"))
      val customer = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_nationkey"))
      val nation = s.read.parquet(s"$dir/nation.parquet")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      val region = s.read.parquet(s"$dir/region.parquet")
        .select(col("r_regionkey"), col("r_name"))
      li(s, dir)
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          sum(col("cents") * (lit(100L) - col("disc"))).as("revenue_e4"),
          count(lit(1)).as("n"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q1_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(sum(qty) AS BIGINT) AS sum_qty,
         |  CAST(sum(cents) AS BIGINT) AS sum_base_cents,
         |  CAST(sum(cents * (100 - disc)) AS BIGINT) AS sum_disc_e4,
         |  CAST(sum(cents * (100 - disc) * (100 + tax)) AS BIGINT) AS sum_charge_e6,
         |  count(*) AS n,
         |  CAST(sum(qty) AS DOUBLE) / count(*) AS avg_qty,
         |  CAST(sum(cents) AS DOUBLE) / count(*) / 100.0 AS avg_price
         |FROM $LI l WHERE l_shipdate <= TIMESTAMP '2001-09-01'
         |GROUP BY 1, 2""".stripMargin,

    "q_region_revenue" ->
      s"""SELECT r_name, n_name,
         |  CAST(sum(cents * (100 - disc)) AS BIGINT) AS revenue_e4, count(*) AS n
         |FROM $LI l
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY 1, 2""".stripMargin,

    // the physically co-located join must equal the plain shuffled join
    "q_bucketed_join" ->
      s"""SELECT o_orderpriority,
         |  CAST(sum(cents * (100 - disc)) AS BIGINT) AS revenue_e4, count(*) AS n
         |FROM $LI l JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1""".stripMargin
  )
}
