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

  /** Cosine similarity of two float-array columns via zip_with +
    * aggregate (codegen'd higher-order functions, no UDF). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0d), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** 64-bit SimHash of an array of token strings: per-token xxhash64,
    * sign-vote each bit. Built from explode-free higher-order funcs. */
  def simhash64(tokens: Column): Column = {
    // votes(bit) = sum over tokens of (bit set ? +1 : -1); simhash bit = votes > 0
    val bits = sequence(lit(0), lit(63))
    val votes = transform(bits, bit =>
      aggregate(tokens, lit(0),
        (acc, t) => acc +
          when(call_function("shiftright", xxhash64(t), bit).bitwiseAND(lit(1L)) === 1L, 1)
            .otherwise(-1)))
    aggregate(
      zip_with(votes, bits, (v, bit) =>
        when(v > 0, call_function("shiftleft", lit(1L), bit)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }
}
