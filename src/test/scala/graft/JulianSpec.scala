package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ColumnFns._

/** Julian-date Column functions vs a driver-side port of the reference
  * algorithm (coverage/utils/jdutil.py:56-127 date_to_jd, Duffet-Smith
  * formula): for Gregorian dates the epoch-offset form must agree
  * exactly, and the inverse must round-trip micros-exactly.
  */
class JulianSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** jdutil.date_to_jd ported verbatim (Gregorian branch; day may be
    * fractional). */
  private def dateToJd(year: Int, month: Int, day: Double): Double = {
    val (yearp, monthp) = if (month <= 2) (year - 1, month + 12) else (year, month)
    val a = math.floor(yearp / 100.0)
    val b = 2 - a + math.floor(a / 4.0) // post-1582 Gregorian branch
    val c = math.floor(365.25 * yearp) // yearp >= 0 here
    val d = math.floor(30.6001 * (monthp + 1))
    b + c + d + day + 1720994.5
  }

  test("julianDay matches the reference date_to_jd across 5 centuries") {
    // the jdutil docstring example: 1985-02-17 06:00 -> 2446113.75
    assert(dateToJd(1985, 2, 17.25) == 2446113.75)
    val dates = Seq(
      (1600, 3, 1), (1700, 1, 15), (1800, 12, 31), (1900, 2, 28),
      (1970, 1, 1), (1985, 2, 17), (2000, 2, 29), (2024, 7, 4), (2100, 3, 1))
    val df = dates.map { case (y, m, d) => f"$y%04d-$m%02d-$d%02d 06:00:00" }
      .toDF("s").select(col("s").cast("timestamp").as("ts"))
      .select(julianDay(col("ts")).as("jd"), modifiedJulianDay(col("ts")).as("mjd"))
    val got = df.collect().map(r => (r.getDouble(0), r.getDouble(1)))
    dates.zip(got).foreach { case ((y, m, d), (jd, mjd)) =>
      val want = dateToJd(y, m, d + 0.25)
      assert(jd == want, s"$y-$m-$d: jd $jd != reference $want")
      assert(mjd == want - 2400000.5)
    }
  }

  test("julianDayToTimestamp round-trips within the double-JD resolution (~40us)") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L
    val micros = (0 until 2000).map(i => base + i.toLong * 7919L * 1000003L)
    val bad = micros.toDF("us")
      .select(col("us"), unix_micros(
        julianDayToTimestamp(julianDay(timestamp_micros(col("us"))))).as("rt"))
      .filter(abs(col("us") - col("rt")) > 100L).count()
    assert(bad == 0L, s"$bad of ${micros.size} micros exceeded 100us JD round-trip error")
    // whole-second timestamps round-trip to the exact second
    val badSec = micros.map(m => m - m % 1000000L).distinct.toDF("us")
      .select(col("us"), unix_micros(
        julianDayToTimestamp(julianDay(timestamp_micros(col("us"))))).as("rt"))
      .filter(abs(col("us") - col("rt")) > 100L).count()
    assert(badSec == 0L)
  }
}
