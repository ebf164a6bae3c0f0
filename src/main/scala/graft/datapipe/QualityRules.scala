package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Published rule-based quality filters for pretraining corpora — the
  * heuristic stage that runs before any learned classifier:
  *
  *  - Gopher rules (Rae et al. 2021, "Scaling Language Models", Table A1):
  *    word-count bounds, mean-word-length bounds, symbol-to-word ratio,
  *    bullet/ellipsis line ratios, alphabetic-word ratio, stop-word
  *    presence.
  *  - C4 cleaning (Raffel et al. 2020, "Exploring the Limits of Transfer
  *    Learning"): line-level retention (terminal punctuation, minimum
  *    words per line) plus document-level drops (brace pages, boilerplate
  *    markers, minimum sentence count).
  *
  * Everything is a Column expression (split/filter/transform higher-order
  * functions — codegen, no UDFs), so at 100 TB the filter is a pure
  * scan+project with the pass/fail predicate pushable into downstream
  * plans. Ratios round to 6 decimals for engine-parity hashing.
  */
object QualityRules {

  private def r6(c: Column): Column = round(c, 6)

  /** Whitespace tokens of the document. */
  def words(text: Column): Column = split(trim(text), "\\s+")

  def nWords(text: Column): Column = size(words(text))

  /** Mean token length = non-whitespace chars / token count. */
  def meanWordLen(text: Column): Column =
    r6(length(regexp_replace(text, "\\s+", "")).cast("double") /
      nWords(text))

  /** Symbol-to-word ratio: '#' and "..." occurrences per word
    * (the Gopher symbol set).
    */
  def symbolRatio(text: Column): Column = {
    // literal (non-regex) replaces: identical left-to-right semantics
    // in every engine for the '...' overlap cases
    val hashes = length(text) - length(replace(text, lit("#"), lit("")))
    val ellipses =
      (length(text) - length(replace(text, lit("..."), lit("")))) / 3
    r6((hashes + ellipses).cast("double") / nWords(text))
  }

  private def lines(text: Column): Column = split(text, "\n")

  /** Fraction of lines starting with a bullet marker. */
  def bulletLineRatio(text: Column): Column =
    r6(size(filter(lines(text), l => l.rlike("^\\s*[-*•]")))
      .cast("double") / size(lines(text)))

  /** Fraction of lines ending with an ellipsis. */
  def ellipsisLineRatio(text: Column): Column =
    r6(size(filter(lines(text), l => l.rlike("(\\.\\.\\.|…)\\s*$")))
      .cast("double") / size(lines(text)))

  /** Fraction of tokens containing at least one alphabetic character. */
  def alphaWordRatio(text: Column): Column =
    r6(size(filter(words(text), w => w.rlike("[A-Za-z]")))
      .cast("double") / nWords(text))

  /** Gopher's stop-word presence: how many of the canonical eight occur
    * as standalone words.
    */
  val StopWords = Seq("the", "be", "to", "of", "and", "that", "have",
    "with")

  def stopwordHits(text: Column): Column =
    StopWords.map(w =>
      when(lower(text).rlike("\\b" + w + "\\b"), 1).otherwise(0))
      .reduce(_ + _)

  /** The full Gopher Table-A1 rule set as a pass/fail column plus the
    * individual metrics (so a pipeline can report WHY a doc dropped).
    */
  def gopherMetrics(df: DataFrame, text: Column): DataFrame =
    df.withColumn("n_words", nWords(text))
      .withColumn("mean_word_len", meanWordLen(text))
      .withColumn("symbol_ratio", symbolRatio(text))
      .withColumn("bullet_ratio", bulletLineRatio(text))
      .withColumn("ellipsis_ratio", ellipsisLineRatio(text))
      .withColumn("alpha_ratio", alphaWordRatio(text))
      .withColumn("stopword_hits", stopwordHits(text))
      .withColumn("gopher_pass",
        col("n_words").between(50, 100000) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("symbol_ratio") <= 0.1 &&
          col("bullet_ratio") <= 0.9 &&
          col("ellipsis_ratio") <= 0.3 &&
          col("alpha_ratio") >= 0.8 &&
          col("stopword_hits") >= 2)

  /** C4 line-level cleaning: keep lines that end in terminal punctuation
    * and carry at least `minLineWords` words; re-join the survivors.
    */
  def c4CleanText(text: Column, minLineWords: Int = 5): Column =
    array_join(
      filter(lines(text), l =>
        l.rlike("[.!?\"']\\s*$") &&
          size(split(trim(l), "\\s+")) >= minLineWords),
      "\n")

  /** C4 document-level filters over the CLEANED text: no code-brace
    * pages, no boilerplate markers, at least `minSentences` sentence
    * terminators left.
    */
  def c4Metrics(df: DataFrame, text: Column,
                minSentences: Int = 3,
                minLineWords: Int = 5): DataFrame = {
    val cleaned = c4CleanText(text, minLineWords)
    df.withColumn("clean_text", cleaned)
      .withColumn("n_sentences",
        length(col("clean_text")) -
          length(regexp_replace(col("clean_text"), "[.!?]", "")))
      .withColumn("c4_pass",
        !col("clean_text").contains("{") &&
          !lower(col("clean_text")).contains("lorem ipsum") &&
          col("n_sentences") >= minSentences &&
          length(col("clean_text")) > 0)
  }
}
