package graft.data

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: tokenization,
  * BPE-ish token counting, n-gram shingling, language-ID scoring, quality
  * features, and document fingerprinting. All are pure `functions._`
  * column expressions — codegen-friendly, no UDFs — so they stay inside
  * whole-stage codegen on a 100 TB scan.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** BPE-flavored token count: letter runs, digit runs, punctuation runs
    * (a portable simplification of GPT-2's pretokenizer regex). */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]+"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(BpePattern), lit(0))).cast("long")

  /** Word n-gram shingles, empty array when fewer than n words. */
  def shingles(words: Column, n: Int): Column =
    when(size(words) >= n,
      transform(sequence(lit(0), size(words) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(words, i + k + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  /** OpenRefine-style fingerprint: md5 of the sorted distinct token set —
    * canonicalizes word order and repetition for fuzzy-dup keying. */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** Count of words present in a fixed marker list. */
  def markerCount(words: Column, markers: Seq[String]): Column =
    size(filter(words, w => markers.map(m => w === m).reduce(_ || _))).cast("long")

  /** Deterministic language-ID heuristic: per-language marker-word counts,
    * argmax with a fixed preference order on ties. (With real corpora the
    * markers would be per-language character n-grams; the operator shape —
    * score vector + ordered argmax — is the same.) */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow"),
    "es" -> Seq("order", "sort", "table"),
    "zh" -> Seq("spark", "row", "data"),
    "fr" -> Seq("merge", "join", "key"),
    "de" -> Seq("batch", "stream", "window"))

  def langScores(words: Column): Seq[(String, Column)] =
    LangMarkers.map { case (lang, markers) => lang -> markerCount(words, markers) }

  /** Argmax over [[langScores]]: first language (in declaration order)
    * whose score is >= every later one. */
  def langId(words: Column): Column = {
    val scores = langScores(words)
    scores.zipWithIndex.foldRight(lit("und")) { case (((lang, score), i), elseCol) =>
      val rest = scores.drop(i + 1).map(_._2)
      val isMax = rest.foldLeft(lit(true))((acc, s) => acc && score >= s)
      when(isMax, lang).otherwise(elseCol)
    }
  }

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to")

  /** Quality features + a composite score; identical arithmetic is mirrored
    * in the DuckDB oracle so doubles match bit-for-bit. */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val w = tokens(text)
    val nWords = size(w).cast("long")
    val meanLen = aggregate(transform(w, x => length(x)), lit(0),
      (acc, l) => acc + l).cast("double") / nWords
    val stopRatio = markerCount(w, Stopwords).cast("double") / nWords
    val punct = size(regexp_extract_all(text, lit("[^a-z0-9\\s]"), lit(0))).cast("long")
    val score = stopRatio * lit(2.0) + meanLen * lit(0.01) +
      when(nWords >= 20 && nWords <= 400, 1.0).otherwise(0.0)
    Seq("n_words" -> nWords, "mean_word_len" -> meanLen,
      "stopword_ratio" -> stopRatio, "n_punct" -> punct, "quality_score" -> score)
  }
}
