package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reusable Column-algebra functions (no UDFs — everything stays inside
  * whole-stage codegen). Each cites the reference behavior it re-expresses.
  */
object ColumnFns {

  /** Great-circle distance in km (haversine).
    * Reference: utils/distance.py:21-63 (sin/cos/acos chain, R=6373 km)
    * used by the nearest-cell search Coverage.py:460-559. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(6373.0) * lit(2.0) * asin(sqrt(a))
  }

  /** Vector magnitude — reference: speed sqrt(u^2+v^2),
    * coverage/TimeCoverage.py:781-789. */
  def magnitude(u: Column, v: Column): Column = sqrt(u * u + v * v)

  /** Meteorological direction in degrees [0, 360) — reference:
    * `270 - atan2(v,u)*180/pi (mod 360)`, coverage/TimeCoverage.py:791-809. */
  def direction(u: Column, v: Column): Column =
    pmod(lit(270.0) - degrees(atan2(v, u)), lit(360.0))

  /** Whitespace-delimited token count (BPE-ish \S+ runs). */
  def tokenCount(text: Column): Column = regexp_count(text, lit("\\S+"))

  /** Document quality score in [0, 1]: length term (saturating at 100
    * tokens) x (1 - punctuation ratio), rounded to 6 decimals. The ONE
    * definition shared by q21 (per-doc scoring) and the q53 curation
    * pipeline's filter — their DuckDB oracles assume they agree. */
  def qualityScore(text: Column): Column = {
    val toks = tokenCount(text)
    val punct = regexp_count(text, lit("[\\p{Punct}]"))
    round(
      when(toks > 0,
        least(lit(1.0), toks.cast("double") / 100.0) *
          (lit(1.0) - least(lit(1.0),
            punct.cast("double") / greatest(toks.cast("double"), lit(1.0)))))
        .otherwise(0.0), 6)
  }

  /** Canonical-form document fingerprint: sha/md5 of
    * whitespace-collapsed, lower-cased text. */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Julian Day of a timestamp — the reference's date<->JD utilities
    * (coverage/utils/jdutil.py:20-127 mjd_to_jd/jd_to_mjd/date_to_jd).
    * For Gregorian dates (what a timestamp encodes) the Duffet-Smith
    * calendar formula the reference implements reduces to a pure epoch
    * offset: JD = unix_seconds/86400 + 2440587.5 (JD of 1970-01-01T00Z).
    * Pure Column arithmetic, codegen'd; JulianSpec proves parity with a
    * driver-side port of the reference algorithm across 500 years. */
  def julianDay(ts: Column): Column =
    unix_micros(ts.cast("timestamp")).cast("double") / lit(86400000000.0) +
      lit(2440587.5)

  /** Modified Julian Day (jdutil.py:20-36: MJD = JD - 2400000.5). */
  def modifiedJulianDay(ts: Column): Column =
    julianDay(ts) - lit(2400000.5)

  /** Inverse: timestamp from a Julian Day (jdutil.py:129-176
    * jd_to_date + :205-235 days_to_hmsm, as one epoch conversion).
    * A double JD near the current epoch resolves ~40 µs (ulp of
    * 2.46e6 days x 86400e6), so the round trip is sub-millisecond-
    * exact, not micros-exact — the same limit the reference's
    * day-fraction floats have (jdutil.py works in float days). */
  def julianDayToTimestamp(jd: Column): Column =
    timestamp_micros(
      round((jd - lit(2440587.5)) * lit(86400000000.0), 0).cast("long"))

}
