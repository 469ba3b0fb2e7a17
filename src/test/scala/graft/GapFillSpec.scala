package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.gapfill.GapFill

/** Golden tests encoding the reference's pandas gap-fill semantics
  * (interpolate short interior gaps, ffill with limit, head/tail stay
  * null — SURVEY.md §2.5 W1/W2, §5.2).
  */
class GapFillSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** series "s": grid 0,900,..; None = missing observation. */
  private def frame(vals: Seq[Option[Double]]) =
    vals.zipWithIndex
      .map { case (v, i) => ("s", i * 900L, v) }
      .toDF("series", "ts", "v")

  private def collectFilled(df: org.apache.spark.sql.DataFrame): Seq[(Long, Option[Double], String)] =
    df.select(col("ts"), col("value_filled"),
        concat_ws("|", col("markers")).as("m"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getString(2)))
      .sortBy(_._1).toSeq

  test("linear interpolation: interior gap <= limit filled with exact slope, marker set") {
    val df = frame(Seq(Some(10.0), None, None, None, Some(50.0)))
    val out = GapFill.interpolate(df, Seq("series"), "ts", "v",
      maxGapPeriods = 3, markerExpr = lit("s_interp"))
    assert(collectFilled(out) == Seq(
      (0L, Some(10.0), ""),
      (900L, Some(20.0), "s_interp"),
      (1800L, Some(30.0), "s_interp"),
      (2700L, Some(40.0), "s_interp"),
      (3600L, Some(50.0), "")))
  }

  test("linear interpolation: gap longer than limit stays null") {
    val df = frame(Seq(Some(1.0), None, None, None, None, Some(6.0)))
    val out = GapFill.interpolate(df, Seq("series"), "ts", "v",
      maxGapPeriods = 3, markerExpr = lit("m"))
    assert(collectFilled(out).count(_._2.isDefined) == 2) // only endpoints
  }

  test("linear interpolation: gap == limit is filled (boundary)") {
    val df = frame(Seq(Some(0.0), None, None, None, Some(4.0)))
    val out = GapFill.interpolate(df, Seq("series"), "ts", "v",
      maxGapPeriods = 3, markerExpr = lit("m"))
    assert(collectFilled(out).forall(_._2.isDefined))
  }

  test("linear interpolation: head/tail gaps never filled (interior only)") {
    val df = frame(Seq(None, Some(2.0), Some(3.0), None))
    val out = GapFill.interpolate(df, Seq("series"), "ts", "v",
      maxGapPeriods = 5, markerExpr = lit("m"))
    assert(collectFilled(out) == Seq(
      (0L, None, ""), (900L, Some(2.0), ""),
      (1800L, Some(3.0), ""), (2700L, None, "")))
  }

  test("ffill: fills up to limit, stops after, head gap untouched") {
    val df = frame(Seq(None, Some(7.0), None, None, None, Some(9.0)))
    val out = GapFill.ffill(df, Seq("series"), "ts", "v",
      limit = 2, markerExpr = lit("f"))
    assert(collectFilled(out) == Seq(
      (0L, None, ""),
      (900L, Some(7.0), ""),
      (1800L, Some(7.0), "f"),
      (2700L, Some(7.0), "f"),
      (3600L, None, ""), // run position 3 > limit 2
      (4500L, Some(9.0), "")))
  }

  test("gapRuns: one row per null run with exact bounds") {
    val df = frame(Seq(None, Some(1.0), None, None, Some(2.0), None))
    val runs = GapFill.gapRuns(df, Seq("series"), "ts", "v")
      .select("gap_start", "gap_end", "gap_len")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(runs == Seq((0L, 0L, 1L), (1800L, 2700L, 2L), (4500L, 4500L, 1L)))
  }

  test("densify inserts missing grid ticks as nulls, per series bounds") {
    val df = Seq(("a", 0L, 1.0), ("a", 2700L, 2.0), ("b", 900L, 3.0))
      .toDF("series", "ts", "v")
    val dense = GapFill.densify(df, Seq("series"), "ts", 900L)
    val rows = dense.select("series", "ts", "v").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(rows == Seq(
      ("a", 0L, Some(1.0)), ("a", 900L, None), ("a", 1800L, None),
      ("a", 2700L, Some(2.0)), ("b", 900L, Some(3.0))))
  }

  test("dense-grid fast path == generic path for interpolate and ffill") {
    // a gnarly frame: head gap, interior gaps of several lengths, tail gap
    val df = frame(Seq(None, None, Some(4.0), None, Some(6.0), None, None,
      None, Some(2.0), None, None, None, None, None, Some(1.0), None))
    val cols = Seq("series", "ts", "value_filled", "markers").map(col)
    for (limit <- Seq(1, 2, 3, 5)) {
      val gi = GapFill.interpolate(df, Seq("series"), "ts", "v", limit, lit("m"))
      val di = GapFill.interpolate(df, Seq("series"), "ts", "v", limit, lit("m"),
        denseGridPeriod = Some(900L))
      assert(di.select(cols: _*).except(gi.select(cols: _*)).isEmpty &&
        di.count() == gi.count(), s"interpolate limit=$limit diverged")
      val gf = GapFill.ffill(df, Seq("series"), "ts", "v", limit, lit("m"))
      val dfst = GapFill.ffill(df, Seq("series"), "ts", "v", limit, lit("m"),
        denseGridPeriod = Some(900L))
      assert(dfst.select(cols: _*).except(gf.select(cols: _*)).isEmpty &&
        dfst.count() == gf.count(), s"ffill limit=$limit diverged")
    }
  }

  test("dense-path == generic path on 40 seeded random frames (property)") {
    val rnd = new java.util.Random(42)
    val cols = Seq("series", "ts", "value_filled", "markers").map(col)
    (1 to 40).foreach { trial =>
      val n = 3 + rnd.nextInt(20)
      val vals = Seq.fill(n)(
        if (rnd.nextDouble() < 0.45) None
        else Some((rnd.nextInt(4096) - 2048) / 256.0))
      val limit = 1 + rnd.nextInt(4)
      val df = frame(vals)
      val gi = GapFill.interpolate(df, Seq("series"), "ts", "v", limit, lit("m"))
      val di = GapFill.interpolate(df, Seq("series"), "ts", "v", limit, lit("m"),
        denseGridPeriod = Some(900L))
      assert(di.select(cols: _*).except(gi.select(cols: _*)).isEmpty &&
        di.count() == gi.count(),
        s"interpolate diverged: trial=$trial vals=$vals limit=$limit")
      val gf = GapFill.ffill(df, Seq("series"), "ts", "v", limit, lit("m"))
      val dfst = GapFill.ffill(df, Seq("series"), "ts", "v", limit, lit("m"),
        denseGridPeriod = Some(900L))
      assert(dfst.select(cols: _*).except(gf.select(cols: _*)).isEmpty &&
        dfst.count() == gf.count(),
        s"ffill diverged: trial=$trial vals=$vals limit=$limit")
    }
  }

  test("fused densify+interpolate == densify then interpolate, on 40 seeded random series (property)") {
    import org.apache.spark.sql.functions._
    val rnd = new java.util.Random(17)
    val cols = Seq("series", "ts", "v", "value_filled", "markers").map(col)
    (1 to 40).foreach { trial =>
      // sparse OBSERVATIONS on a 900s grid: random subset of ticks, all non-null
      val n = 2 + rnd.nextInt(12)
      val ticks = scala.util.Random.javaRandomToRandom(rnd)
        .shuffle((0 until 40).toList).take(n).sorted
      val obs = ticks.map(t => ("s", t * 900L, (rnd.nextInt(4096) - 2048) / 256.0))
        .toDF("series", "ts", "v")
      val limit = 1 + rnd.nextInt(6)
      val fused = GapFill.interpolateFused(obs, Seq("series"), "ts", "v",
        limit, lit("m"), 900L)
      val twoStep = GapFill.interpolate(
          GapFill.densify(obs, Seq("series"), "ts", 900L),
          Seq("series"), "ts", "v", limit, lit("m"), denseGridPeriod = Some(900L))
        .select(cols: _*)
      assert(fused.select(cols: _*).except(twoStep).isEmpty &&
        twoStep.except(fused.select(cols: _*)).isEmpty &&
        fused.count() == twoStep.count(),
        s"trial $trial (n=$n limit=$limit) diverged")
    }
  }

  test("interpolation is idempotent (filling a filled frame changes nothing)") {
    val df = frame(Seq(Some(1.0), None, Some(3.0), None, None, None, None, Some(8.0)))
    val once = GapFill.interpolate(df, Seq("series"), "ts", "v",
        maxGapPeriods = 2, markerExpr = lit("m"))
      .select(col("series"), col("ts"), col("value_filled").as("v"))
    val twice = GapFill.interpolate(once, Seq("series"), "ts", "v",
        maxGapPeriods = 2, markerExpr = lit("m"))
      .select(col("series"), col("ts"), col("value_filled").as("v"))
    assert(once.collect().map(_.toString).sorted.toSeq ==
      twice.collect().map(_.toString).sorted.toSeq)
  }
}
