package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.rollup.TimeSeriesOps

/** Algebraic invariants of the tier rollup (SURVEY.md §5.2): chained
  * continuous aggregates equal direct aggregation, salted two-phase equals
  * direct, marker resample is deterministic.
  */
class TierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Seeded random points: dyadic values (k/256) so sums are exact. */
  private lazy val points = {
    val rnd = new java.util.Random(7)
    (1 to 20000).map { _ =>
      val series = s"s${rnd.nextInt(5)}"
      val ts = 1704067200L + rnd.nextInt(7 * 86400)
      val v = (rnd.nextInt(1 << 21) - (1 << 20)) / 256.0
      (series, ts, v)
    }.toDF("series", "ts", "v")
  }

  test("approx_count_distinct (HLL++) stays within 5% of exact distinct") {
    import org.apache.spark.sql.functions._
    val got = points.groupBy("series")
      .agg(countDistinct(col("ts")).as("exact"),
        approx_count_distinct(col("ts"), 0.01).as("approx"))
      .select("exact", "approx").as[(Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (exact, approx) =>
      assert(math.abs(approx - exact).toDouble / exact < 0.05,
        s"HLL drifted: exact=$exact approx=$approx")
    }
  }

  test("hourly chained from 15min partials == hourly computed directly") {
    val t15 = TimeSeriesOps.tier(points, Seq("series"), "ts", "v", 900)
    val chained = TimeSeriesOps.chainTier(t15, Seq("series"), 3600)
    val direct = TimeSeriesOps.tier(points, Seq("series"), "ts", "v", 3600)
    assert(chained.select("series", "bucket_ts", "n", "sum_v", "mean_v")
      .except(direct.select("series", "bucket_ts", "n", "sum_v", "mean_v"))
      .isEmpty)
    assert(chained.count() == direct.count())
  }

  test("daily chained through hourly == daily computed directly") {
    val t15 = TimeSeriesOps.tier(points, Seq("series"), "ts", "v", 900)
    val t1h = TimeSeriesOps.chainTier(t15, Seq("series"), 3600)
    val t1d = TimeSeriesOps.chainTier(t1h, Seq("series"), 86400)
    val direct = TimeSeriesOps.tier(points, Seq("series"), "ts", "v", 86400)
    assert(t1d.except(direct).isEmpty && t1d.count() == direct.count())
  }

  test("salted two-phase aggregation == direct aggregation, bitwise") {
    val direct = TimeSeriesOps.tier(points, Seq("series"), "ts", "v", 3600)
    val salted = TimeSeriesOps.saltedTier(points, Seq("series"), "ts", "v",
      3600, salts = 16, saltSource = "ts")
    assert(salted.except(direct).isEmpty && salted.count() == direct.count())
  }

  test("rollupMarkers: sorted deduped union; renderMarkers joins with ' | '") {
    val df = Seq(
      ("s", 0L, Seq("b_marker")),
      ("s", 900L, Seq.empty[String]),
      ("s", 1800L, Seq("a_marker", "b_marker"))
    ).toDF("series", "ts", "markers")
    val rolled = df.groupBy(col("series"))
      .agg(TimeSeriesOps.rollupMarkers(col("markers")).as("m"))
      .select(TimeSeriesOps.renderMarkers(col("m")))
      .as[String].head()
    assert(rolled == "a_marker | b_marker")
  }

  test("dedupe keeps exactly the highest-priority row per key") {
    val df = Seq(
      ("s", 0L, 1L, 10.0), ("s", 0L, 3L, 30.0), ("s", 0L, 2L, 20.0),
      ("s", 900L, 9L, 90.0)
    ).toDF("series", "ts", "prio", "v")
    val out = TimeSeriesOps.dedupe(df, Seq("series", "ts"), col("prio").desc)
      .select("series", "ts", "prio", "v").as[(String, Long, Long, Double)]
      .collect().sortBy(_._2).toSeq
    assert(out == Seq(("s", 0L, 3L, 30.0), ("s", 900L, 9L, 90.0)))
  }

  test("combineFirst: left wins, right patches, null-prop add matches pandas") {
    val l = Seq((0L, Some(1.0)), (1L, None), (2L, Some(3.0)))
      .toDF("k", "v")
    val r = Seq((1L, Some(20.0)), (2L, Some(30.0)), (3L, Some(40.0)))
      .toDF("k", "v")
    val out = TimeSeriesOps.combineFirst(l, r, Seq("k"), "v")
      .select("k", "v", "patched").as[(Long, Option[Double], Boolean)]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (0L, Some(1.0), false), (1L, Some(20.0), true),
      (2L, Some(3.0), false), (3L, Some(40.0), true)))
  }

  test("asofJoin: same-bucket tie, cross-empty-bucket carry, tolerance cutoff") {
    val left = Seq(
      ("k", 100L, "in_bucket"),     // obs 90 in same bucket
      ("k", 4000L, "tie"),          // obs exactly AT ts -> visible
      ("k", 5000L, "carried"),      // bucket 5; last obs in bucket 4 -> carry
      ("k", 99000L, "too_old"),     // gap 95000 > tolerance -> nulls
      ("x", 50L, "no_obs")          // key with no observations at all
    ).toDF("key", "ts", "tag")
    val right = Seq(("k", 90L, 1.0), ("k", 4000L, 2.0)).toDF("key", "rts", "v")
    val got = TimeSeriesOps.asofJoin(left, right, Seq("key"), "ts", "rts",
        Seq("v"), toleranceSec = 10000L, bucketSec = 1000L)
      .select("tag", "asof_ts", "asof_v")
      .as[(String, Option[Long], Option[Double])].collect().toSet
    assert(got == Set(
      ("in_bucket", Some(90L), Some(1.0)),
      ("tie", Some(4000L), Some(2.0)),
      ("carried", Some(4000L), Some(2.0)),
      ("too_old", None, None),
      ("no_obs", None, None)))
  }

  test("sessionize: 1-based per-key session_seq splits on gap > gapSec") {
    val ev = Seq(
      (1L, 0L, 10L), (1L, 1000L, 11L), (1L, 5000L, 12L), // gap 4000 > 1800
      (2L, 0L, 20L)
    ).toDF("user_id", "epoch_s", "event_id")
    val got = TimeSeriesOps.sessionize(ev, Seq("user_id"), "epoch_s",
        "event_id", gapSec = 1800L)
      .select("user_id", "event_id", "session_seq")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 1L), (1L, 11L, 1L), (1L, 12L, 2L), (2L, 20L, 1L)))
  }

  test("asofJoin == brute-force reference on 25 seeded random frames (property)") {
    val rnd = new scala.util.Random(20260817L)
    for (round <- 1 to 25) {
      val keys = Seq("k1", "k2", "k3")
      val left = (1 to 60).map { i =>
        (keys(rnd.nextInt(3)), rnd.nextInt(5000).toLong, i.toLong)
      }.toDF("key", "ts", "row_id")
      // unique (key, ts) on the right, as the contract requires
      val right = (1 to 40).map { _ =>
        (keys(rnd.nextInt(3)), rnd.nextInt(5000).toLong, (rnd.nextInt(1000) + 1).toDouble)
      }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
        .toDF("key", "rts", "v")
      val tol = 500L + rnd.nextInt(2000)
      val bucket = 100L + rnd.nextInt(900)
      val got = TimeSeriesOps.asofJoin(left, right, Seq("key"), "ts", "rts",
          Seq("v"), toleranceSec = tol, bucketSec = bucket)
        .select("row_id", "asof_ts", "asof_v")
        .as[(Long, Option[Long], Option[Double])].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      // brute force: per left row, the max right ts <= left ts, in tolerance
      val rightRows = right.as[(String, Long, Double)].collect()
      val leftRows = left.as[(String, Long, Long)].collect()
      leftRows.foreach { case (k, ts, id) =>
        val cand = rightRows.filter(r => r._1 == k && r._2 <= ts)
        val expect =
          if (cand.isEmpty) (None, None)
          else {
            val best = cand.maxBy(_._2)
            if (ts - best._2 <= tol) (Some(best._2), Some(best._3))
            else (None, None)
          }
        assert(got(id) == expect,
          s"round $round key=$k ts=$ts tol=$tol bucket=$bucket: got ${got(id)}, want $expect")
      }
    }
  }

  test("asofJoin: shuffle-carry fallback (high-cardinality guard) == broadcast path") {
    val rnd = new scala.util.Random(42L)
    val left = (1 to 300).map { i =>
      ("k" + rnd.nextInt(40), rnd.nextInt(5000).toLong, i.toLong)
    }.toDF("key", "ts", "row_id")
    val right = (1 to 200).map { _ =>
      ("k" + rnd.nextInt(40), rnd.nextInt(5000).toLong, (rnd.nextInt(1000) + 1).toDouble)
    }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq.toDF("key", "rts", "v")
    def run(maxRows: Long) = TimeSeriesOps.asofJoin(left, right, Seq("key"),
        "ts", "rts", Seq("v"), toleranceSec = 2000L, bucketSec = 500L,
        carryBroadcastMaxRows = maxRows)
      .select("row_id", "asof_ts", "asof_v")
      .as[(Long, Option[Long], Option[Double])].collect().sortBy(_._1).toSeq
    // maxRows=1 forces the probe below threshold -> shuffle join; -1 forces
    // broadcast; results must be identical
    val viaShuffle = run(1L)
    val viaBroadcast = run(-1L)
    assert(viaShuffle == viaBroadcast)
    // and the guarded plan carries no broadcast HINT: with Catalyst's own
    // size-based auto-broadcast off, the carry join must plan as a
    // shuffle join (at real scale the stats would make the same call)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = TimeSeriesOps.asofJoin(left, right, Seq("key"), "ts", "rts",
          Seq("v"), toleranceSec = 2000L, bucketSec = 500L,
          carryBroadcastMaxRows = 1L)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("asofJoin: caller columns colliding with helper names pass through intact") {
    // left already owns _ats/_is_l/_bkt-shaped names: helper prefix must
    // dodge them instead of withColumn-replacing caller data
    val left = Seq(
      ("k", 100L, 7L, 9L, "keep_me"),
      ("k", 4000L, 8L, 10L, "keep_too")
    ).toDF("key", "ts", "_ats", "_rv_v", "_bkt")
    val right = Seq(("k", 90L, 1.0), ("k", 4000L, 2.0)).toDF("key", "rts", "v")
    val got = TimeSeriesOps.asofJoin(left, right, Seq("key"), "ts", "rts",
        Seq("v"), toleranceSec = 10000L, bucketSec = 1000L)
      .select("ts", "_ats", "_rv_v", "_bkt", "asof_ts", "asof_v")
      .as[(Long, Long, Long, String, Option[Long], Option[Double])]
      .collect().toSet
    assert(got == Set(
      (100L, 7L, 9L, "keep_me", Some(90L), Some(1.0)),
      (4000L, 8L, 10L, "keep_too", Some(4000L), Some(2.0))))
    // output-name collision is a loud contract error, not silent replace
    val bad = left.withColumnRenamed("_bkt", "asof_ts")
    intercept[IllegalArgumentException] {
      TimeSeriesOps.asofJoin(bad, right, Seq("key"), "ts", "rts",
        Seq("v"), toleranceSec = 10000L)
    }
  }

  test("asofJoin plans broadcast carry, never a nested-loop inequality join") {
    val left = (1 to 100).map(i => ("k" + i % 4, i * 100L, i.toLong))
      .toDF("key", "ts", "row_id")
    val right = (1 to 50).map(i => ("k" + i % 4, i * 190L, i.toDouble))
      .toDF("key", "rts", "v")
    val plan = TimeSeriesOps.asofJoin(left, right, Seq("key"), "ts", "rts",
      Seq("v"), toleranceSec = 1000L, bucketSec = 500L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("rangeJoin == brute-force inequality join; plans equi-join, never nested-loop") {
    val rnd = new java.util.Random(11)
    val pts = (1 to 4000).map { i =>
      (s"k${rnd.nextInt(4)}", 1000L + rnd.nextInt(100000), i.toLong)
    }.toDF("k", "ts", "id")
    // seeded intervals: some multi-bucket, some sub-bucket, one empty,
    // plus exact-boundary cases around ts=1000
    val ivs = ((1 to 60).map { i =>
      val st = 1000L + rnd.nextInt(100000)
      (s"k${rnd.nextInt(4)}", st, st + 1 + rnd.nextInt(30000), i.toLong)
    } ++ Seq(("k0", 1000L, 1000L, 900L),      // empty: matches nothing
      ("k0", 1000L, 1001L, 901L),              // ts==start matches
      ("k1", 900L, 1000L, 902L)))              // ts==end does not
      .toDF("k", "start_ts", "end_ts", "iid")
    for (bucket <- Seq(1000L, 7777L, 200000L)) {
      val got = TimeSeriesOps.rangeJoin(pts, ivs, Seq("k"), "ts",
          "start_ts", "end_ts", bucket)
        .select("k", "id", "iid")
      val brute = pts.join(ivs, Seq("k"))
        .filter(col("start_ts") <= col("ts") && col("ts") < col("end_ts"))
        .select("k", "id", "iid")
      assert(got.except(brute).isEmpty && brute.except(got).isEmpty,
        s"bucket=$bucket diverges from brute force")
      assert(got.count() == brute.count(), s"bucket=$bucket dup/dropped rows")
    }
    val plan = TimeSeriesOps.rangeJoin(pts, ivs, Seq("k"), "ts",
        "start_ts", "end_ts", 7777L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("analytics queries: z-score, profile, correlation, coverage invariants") {
    import graft.queries.EventQueries
    val dir = SparkTestSession.sf0001

    // anomaly: baseline excludes the current bucket; z null below 3 obs
    // or at zero variance; z reproduces (v - mean)/sd from the partials
    val an = EventQueries.queries("q_anomaly")(spark, dir)
      .select("n", "wn", "ws", "wss", "z").collect()
    assert(an.nonEmpty)
    an.foreach { r =>
      val (n, wn) = (r.getLong(0), r.getLong(1))
      // an empty trailing window has null sums (count 0) — z must be null
      val (ws, wss) = if (wn == 0) (0L, 0L) else (r.getLong(2), r.getLong(3))
      assert(wn * wss - ws * ws >= 0, "Cauchy-Schwarz violated")
      val varOk = wn >= 3 && wss.toDouble - ws.toDouble * ws / wn > 0
      assert(r.isNullAt(4) == !varOk)
      if (varOk) {
        val expect = (n.toDouble - ws.toDouble / wn) /
          math.sqrt((wss.toDouble - ws.toDouble * ws / wn) / wn)
        assert(r.getDouble(4) == expect, "z must be bitwise the partials formula")
      }
    }

    // profile: 168 possible slots, totals conserve the hourly tier
    val prof = EventQueries.queries("q_seasonal_profile")(spark, dir)
    assert(prof.filter(col("hour_of_week") < 0 || col("hour_of_week") > 167).isEmpty)
    val total = prof.agg(sum("n")).head.getLong(0)
    val nEvents = spark.read.parquet(s"$dir/events.parquet").count()
    assert(total == nEvents, s"profile drops observations: $total != $nEvents")

    // correlation: |r| <= 1 (count vs volume on this fixture is positive)
    val rs = EventQueries.queries("q_corr_metrics")(spark, dir)
      .select("r").as[Double].collect()
    assert(rs.nonEmpty && rs.forall(r => r >= -1.0 && r <= 1.0))
    assert(rs.forall(_ > 0), "hourly count and cents volume should co-move")

    // coverage: between 1 and all 96 15-min buckets per day
    val cov = EventQueries.queries("q_coverage")(spark, dir)
    assert(cov.filter(col("buckets_present") < 1 ||
      col("buckets_present") > 96).isEmpty)
    assert(cov.filter(col("coverage") > 1.0).isEmpty)
  }
}
