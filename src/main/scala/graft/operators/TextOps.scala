package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.ColumnFns._

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: token counting, quality scoring, n-gram-heuristic
  * language ID, canonical fingerprinting. All pure Column algebra
  * (codegen'd), no UDFs.
  */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private def markers(text: Column, words: Seq[String]): Column =
    regexp_count(lower(text), lit("\\b(" + words.mkString("|") + ")\\b"))

  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "is", "of", "to", "in"),
    "fr" -> Seq("le", "la", "les", "et", "est", "des"),
    "de" -> Seq("der", "die", "und", "ist", "das", "ein"),
    "es" -> Seq("el", "los", "las", "es", "y", "una"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // token counting + per-language corpus stats
    "q20_text_tokens" -> ((s, dir) => {
      docs(s, dir)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(tokenCount(col("text"))).as("total_tokens"),
          round(avg(length(col("text"))), 4).as("avg_chars"))
    }),

    // quality scoring: length / punctuation ratio / stopword ratio
    "q21_text_quality" -> ((s, dir) => {
      val toks = tokenCount(col("text"))
      val punct = regexp_count(col("text"), lit("[\\p{Punct}]"))
      val stop = markers(col("text"), langMarkers("en"))
      docs(s, dir)
        .select(
          col("doc_id"),
          toks.cast("long").as("n_tokens"),
          punct.cast("long").as("n_punct"),
          stop.cast("long").as("n_stop"),
          round(
            when(toks > 0,
              least(lit(1.0), toks.cast("double") / 100.0) *
                (lit(1.0) - least(lit(1.0), punct.cast("double") / greatest(toks.cast("double"), lit(1.0)))))
              .otherwise(0.0), 6).as("quality"))
    }),

    // n-gram-heuristic language ID + confusion matrix vs the labeled lang
    "q22_text_langid" -> ((s, dir) => {
      val scored = docs(s, dir)
        .withColumn("s_en", markers(col("text"), langMarkers("en")))
        .withColumn("s_fr", markers(col("text"), langMarkers("fr")))
        .withColumn("s_de", markers(col("text"), langMarkers("de")))
        .withColumn("s_es", markers(col("text"), langMarkers("es")))
      scored
        .withColumn("pred",
          when(col("s_en") >= col("s_fr") && col("s_en") >= col("s_de") && col("s_en") >= col("s_es"), "en")
            .when(col("s_fr") >= col("s_de") && col("s_fr") >= col("s_es"), "fr")
            .when(col("s_de") >= col("s_es"), "de")
            .otherwise("es"))
        .groupBy(col("lang"), col("pred"))
        .agg(count(lit(1)).as("cnt"))
    }),

    // canonical-form fingerprint dedup groups (rolling-hash analogue;
    // md5 chosen for cross-engine reproducibility)
    "q23_fingerprint" -> ((s, dir) => {
      docs(s, dir)
        .groupBy(fingerprint(col("text")).as("fp"))
        .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("min_doc_id"))
    })
  )

  private def markersSql(expr: String, words: Seq[String]): String =
    s"length(regexp_extract_all(lower($expr), '\\b(${words.mkString("|")})\\b'))"

  val oracles: Map[String, String] = Map(
    "q20_text_tokens" ->
      s"""SELECT lang, count(*) AS n_docs,
          CAST(sum(length(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS total_tokens,
          round(avg(length(text)), 4) AS avg_chars
          FROM documents GROUP BY lang""",
    "q21_text_quality" ->
      s"""SELECT doc_id, n_tokens, n_punct, n_stop,
          round(CASE WHEN n_tokens > 0 THEN
            least(1.0, CAST(n_tokens AS DOUBLE) / 100.0) *
            (1.0 - least(1.0, CAST(n_punct AS DOUBLE) / greatest(CAST(n_tokens AS DOUBLE), 1.0)))
            ELSE 0.0 END, 6) AS quality
          FROM (SELECT doc_id,
            length(regexp_extract_all(text, '\\S+')) AS n_tokens,
            length(regexp_extract_all(text, '[[:punct:]]')) AS n_punct,
            ${markersSql("text", langMarkers("en"))} AS n_stop
          FROM documents)""",
    "q22_text_langid" ->
      s"""SELECT lang, pred, count(*) AS cnt FROM (
            SELECT lang,
              CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
                   WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
                   WHEN s_de >= s_es THEN 'de'
                   ELSE 'es' END AS pred
            FROM (SELECT lang,
              ${markersSql("text", langMarkers("en"))} AS s_en,
              ${markersSql("text", langMarkers("fr"))} AS s_fr,
              ${markersSql("text", langMarkers("de"))} AS s_de,
              ${markersSql("text", langMarkers("es"))} AS s_es
            FROM documents)) GROUP BY lang, pred""",
    "q23_fingerprint" ->
      """SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
         count(*) AS cnt, min(doc_id) AS min_doc_id
         FROM documents GROUP BY 1"""
  )
}
