package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Text-analysis operators for LLM-training-data pipelines, all pure
  * codegen'd column expressions (no UDFs) over the `documents` table.
  */
object TextAnalysis {

  /** Whitespace tokens, empties dropped (portable with
    * `list_filter(string_split_regex(...))`).
    */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= lit(""))

  /** BPE-ish lexer pattern: letter runs, digit runs, single punctuation.
    * ASCII-only so the Java and RE2 regex dialects agree.
    */
  val BpeIshPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Token counting: whitespace words, BPE-ish tokens, characters. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_words"),
      regexp_count(col("text"), lit(BpeIshPattern)).cast("long").as("n_bpeish"),
      char_length(col("text")).cast("long").as("n_chars_actual"))

  /** Language-marker stopword lists (tiny n-gram-profile stand-in; the
    * point is the distributed scoring shape, not linguistic accuracy).
    */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in"),
    "es" -> Seq("el", "la", "de", "que", "los", "y"),
    "fr" -> Seq("le", "et", "les", "des", "un", "une"),
    "de" -> Seq("der", "und", "die", "das", "ein", "nicht"))

  private def markerCount(ws: Column, markers: Seq[String]): Column = {
    val arr = array(markers.map(lit): _*)
    size(filter(ws, t => array_contains(arr, t))).cast("long")
  }

  /** Heuristic language ID: argmax over marker-hit counts with a fixed
    * priority order (en > es > fr > de), 'und' when all are zero.
    */
  def langId(docs: DataFrame): DataFrame = {
    val ws = tokens(col("text"))
    val withCounts = docs.select(
      col("doc_id") +: Markers.map { case (lang, ms) =>
        markerCount(ws, ms).as(s"n_$lang")
      }: _*)
    val Seq(en, es, fr, de) = Markers.map { case (l, _) => col(s"n_$l") }
    withCounts.withColumn(
      "lang_pred",
      when(en + es + fr + de === 0, lit("und"))
        .when(en >= es && en >= fr && en >= de, lit("en"))
        .when(es >= fr && es >= de, lit("es"))
        .when(fr >= de, lit("fr"))
        .otherwise(lit("de")))
  }

  /** Stopwords used by the quality score (the `en` marker list). */
  val Stopwords: Seq[String] = Markers.head._2

  /** Document quality scoring: length, punctuation ratio and stopword ratio
    * folded into a deterministic [0,1] score. Every term is a single
    * IEEE-deterministic expression so the oracle matches bit-for-bit.
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    val ws = tokens(col("text"))
    docs
      .select(
        col("doc_id"),
        char_length(col("text")).cast("long").as("n_chars_actual"),
        size(ws).cast("long").as("n_words"),
        size(array_distinct(ws)).cast("long").as("n_distinct_words"),
        regexp_count(col("text"), lit("[^A-Za-z0-9\\s]")).cast("long").as("n_punct"),
        markerCount(ws, Stopwords).as("n_stop"))
      .withColumn("rep_ratio",
        col("n_distinct_words").cast("double") / nullif(col("n_words"), lit(0L)))
      .withColumn("punct_ratio",
        col("n_punct").cast("double") / nullif(col("n_chars_actual"), lit(0L)))
      .withColumn("stop_ratio",
        col("n_stop").cast("double") / nullif(col("n_words"), lit(0L)))
      .withColumn(
        "quality",
        least(col("n_words").cast("double") / lit(50.0), lit(1.0)) * lit(0.5)
          + (lit(1.0) - col("punct_ratio")) * lit(0.3)
          + least(col("stop_ratio") * lit(5.0), lit(1.0)) * lit(0.2))
  }

  /** Rolling polynomial document fingerprint via the codegen'd
    * [[graft.functions.PolyFingerprint]] expression.
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      GraftFunctions.poly_fingerprint(col("text")).as("fp"),
      char_length(col("text")).cast("long").as("n_chars_actual"))
}
