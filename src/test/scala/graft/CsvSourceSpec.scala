package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.CsvSource
import java.nio.file.{Files, Paths}

/** S2 parity tests: EU decimal-comma numbers, multi-row headers,
  * coerce-to-null, ISO timestamps (OPSD read.py parser semantics).
  */
class CsvSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val csvPath = {
    val dir = Files.createTempDirectory(Paths.get("/root/repo/target"), "csv-test-")
    val f = dir.resolve("tso.csv")
    Files.writeString(f,
      """timestamp;DE_load;DE_wind
        |;actual;actual
        |2024-01-01T00:00:00Z;1.234,5;56,25
        |2024-01-01T00:15:00Z;2.000,0;n/a
        |2024-01-01T00:30:00Z;-17,5;0,125
        |""".stripMargin)
    f.toString
  }

  test("decimal-comma numbers parse exactly; unparseable coerces to null") {
    val df = CsvSource.readEuTimeSeries(spark, csvPath, headerRows = 2)
    assert(df.columns.toSeq == Seq("ts", "DE_load_actual", "DE_wind_actual"))
    val rows = df.orderBy("ts")
      .select("DE_load_actual", "DE_wind_actual")
      .collect()
      .map(r => (Option(r.get(0)), Option(r.get(1))))
      .toSeq
    assert(rows == Seq(
      (Some(1234.5), Some(56.25)),
      (Some(2000.0), None), // n/a -> null (to_numeric errors='coerce')
      (Some(-17.5), Some(0.125))))
  }

  test("timestamps parse as UTC instants") {
    val df = CsvSource.readEuTimeSeries(spark, csvPath, headerRows = 2)
    val ts = df.select(org.apache.spark.sql.functions.unix_timestamp($"ts"))
      .as[Long].collect().sorted.toSeq
    assert(ts == Seq(1704067200L, 1704068100L, 1704069000L))
  }
}
