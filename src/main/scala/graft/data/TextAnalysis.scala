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

  /** GPT-2-STYLE pretokenizer: contractions first, then space-prefixed
    * letter / digit / punctuation runs (the " word" leading-space
    * convention that makes BPE merges word-boundary-aware), then bare
    * whitespace runs. A portable subset of the published GPT-2 pattern:
    * no lookahead (DuckDB's RE2 lacks it), ASCII classes over
    * `lower(text)` instead of \p{L}/\p{N}, and an EXPLICIT whitespace
    * class instead of `\s` — Java's \s includes vertical tab \x0B where
    * RE2's does not, so a \s-based pattern would split differently
    * around VT on the two engines; with the explicit class, VT falls
    * into the punctuation complement on BOTH. Both engines' regexes are
    * leftmost-FIRST on alternation, so the piece boundaries agree
    * bit-for-bit. The alternatives are EXHAUSTIVE over all characters
    * (the punct class is the complement of letter/digit/listed
    * whitespace), which is what makes the split lossless: concatenating
    * the pretokens reproduces `lower(text)` exactly (property-tested
    * over arbitrary strings — including VT — in BpeTrainProps). */
  val BpePretokPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 \\t\\n\\r\\f]+|[ \\t\\n\\r\\f]+"

  def bpePretokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(BpePretokPattern), lit(0))

  /** GPT-2's byte↔unicode table (Radford et al. 2019 reference code,
    * `bytes_to_unicode`): every byte 0..255 maps to a PRINTABLE unicode
    * char — the 188 printable latin-1 bytes (33–126, 161–172, 174–255)
    * to themselves, the rest to consecutive code points from 256 up —
    * so byte-level BPE can treat arbitrary binary (any UTF-8 text) as a
    * string of visible atomic symbols. Bijective by construction: the
    * inverse recovers the exact byte sequence, which is what makes the
    * byte-level trainer LOSSLESS on any input (CJK, emoji, control
    * bytes) where a char-level alphabet would admit unseen atoms. */
  val ByteUnicode: IndexedSeq[String] = {
    val printable =
      ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    var n = 0
    (0 to 255).map { b =>
      if (printable(b)) new String(Character.toChars(b))
      else { val c = new String(Character.toChars(256 + n)); n += 1; c }
    }
  }

  /** Byte-level base symbols of a string: its UTF-8 bytes, each mapped
    * through [[ByteUnicode]] — the w0 alphabet of a GPT-2-style
    * byte-level BPE trainer. Portable to the oracle: both engines hex
    * the UTF-8 encoding (uppercase on both) and index the same table,
    * so the symbols agree byte for byte. Pure column expressions over
    * the vocab-sized word table — the per-element encode+hex is cheap
    * at word lengths and never touches the corpus. */
  def byteSyms(word: Column): Column = {
    val tbl = array(ByteUnicode.map(lit): _*)
    val h = hex(encode(word, "UTF-8"))
    when(length(h) >= 2,
      transform(sequence(lit(1), (length(h) / 2).cast("int")),
        i => element_at(tbl,
          conv(h.substr(i * 2 - 1, lit(2)), 16, 10).cast("int") + 1)))
      .otherwise(array().cast("array<string>"))
  }

  /** Word n-gram shingles, empty array when fewer than n words. Routes
    * through the one-pass compiled [[graft.functions.WordShingles]]
    * expression — the HOF form below is the semantic definition and
    * parity reference (the hottest interpreted spot of the text family:
    * it runs on every LSH/jaccard/bigram scan). */
  def shingles(words: Column, n: Int): Column = {
    graft.functions.WordShingleFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    graft.functions.WordShingleFunctions.word_shingles(words, n)
  }

  /** Composable-HOF form of [[shingles]]: the semantic definition, kept
    * as the parity reference (DataOpsSpec asserts bit-identical output)
    * and for sessions where registering functions is undesirable. */
  def shinglesHof(words: Column, n: Int): Column =
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

  /** Gopher-style quality rule set (Rae et al. 2021, "Scaling Language
    * Models", table A1 — the published heuristics, not any private list):
    * per-rule boolean flags plus the features they test, so a curation
    * pipeline can both filter (`passes_gopher`) and audit WHICH rule fired.
    * All pure column expressions — the whole rule set evaluates inside the
    * document scan, map-only at any corpus size. Thresholds are the
    * paper's; word-soup synthetic corpora trivially pass the symbol/bullet
    * rules, real corpora do not. */
  def gopherColumns(text: Column): Seq[(String, Column)] = {
    val w = tokens(text)
    val nWords = size(w).cast("long")
    val nd = nWords.cast("double")
    val meanLen = aggregate(transform(w, x => length(x)), lit(0),
      (acc, l) => acc + l).cast("double") / nd
    // '#' or '...' occurrences per word (the paper's symbol-to-word ratio)
    val symbolRatio =
      size(regexp_extract_all(text, lit("#|\\.\\.\\."), lit(0))).cast("double") / nd
    // fraction of words containing at least one alphabetic character —
    // case-insensitive ("The" is alphabetic; Gopher's rule means ANY letter)
    val alphaFrac =
      size(filter(w, x => x.rlike("(?i)[a-z]"))).cast("double") / nd
    // stopword hits are case-insensitive too ("The" counts as "the")
    val nStop = markerCount(transform(w, x => lower(x)), Stopwords)
    val rWords = nWords >= 50 && nWords <= 100000
    val rMeanLen = meanLen >= 3.0 && meanLen <= 10.0
    val rSymbol = symbolRatio <= 0.1
    val rAlpha = alphaFrac >= 0.8
    val rStop = nStop >= 2
    Seq(
      "n_words" -> nWords, "mean_word_len" -> meanLen,
      "symbol_ratio" -> symbolRatio, "alpha_frac" -> alphaFrac,
      "n_stopwords" -> nStop,
      "r_word_count" -> rWords, "r_mean_word_len" -> rMeanLen,
      "r_symbol_ratio" -> rSymbol, "r_alpha_words" -> rAlpha,
      "r_stopwords" -> rStop,
      "passes_gopher" -> (rWords && rMeanLen && rSymbol && rAlpha && rStop))
  }

  /** Per-document n-gram repetition stats (the Gopher/Rae "duplicate
    * n-gram fraction" + "top n-gram fraction" repetition signals): over a
    * gram array, the fraction of gram OCCURRENCES belonging to grams seen
    * ≥ 2× in the document, and the fraction taken by the single most
    * frequent gram. Pure HOFs — per-document local compute, no shuffle;
    * the inner count is O(distinct × total) per doc, fine for bounded
    * documents (the same stats for pathological multi-MB docs would use an
    * explode + (doc, gram) count aggregate instead). Zero grams → NULL
    * fractions (mirrored by the oracle). */
  def ngramRepStats(grams: Column, prefix: String): Seq[(String, Column)] = {
    val counts = transform(array_distinct(grams),
      g => size(filter(grams, x => x === g)))
    val total = size(grams).cast("long")
    val dupOcc = aggregate(counts, lit(0),
      (acc, c) => acc + when(c >= 2, c).otherwise(0)).cast("long")
    val top = array_max(counts).cast("long")
    val totD = total.cast("double")
    Seq(
      s"n_${prefix}grams" -> total,
      s"dup_${prefix}gram_frac" ->
        when(total > 0, dupOcc.cast("double") / totD),
      s"top_${prefix}gram_frac" ->
        when(total > 0, top.cast("double") / totD))
  }

  /** Hashed feature bucket of a token: the first 4 hex digits of its md5
    * as an integer, mod `buckets` — the fasttext-style feature hashing
    * trick, in the repo's portable-md5 arithmetic (both engines produce
    * identical buckets; no engine-private hash). */
  def hashBucket(tok: Column, buckets: Int): Column =
    conv(substring(md5(tok), 1, 4), 16, 10).cast("long") % buckets

  /** Linear text-classifier INFERENCE as a column expression (the shape of
    * a fasttext/logistic quality filter applied at corpus scale): each
    * token maps to a hashed feature bucket, each bucket carries a fixed
    * integer weight, the document score is the mean bucket weight. Weights
    * here are a deterministic function of the bucket (`b mod 7 − 3`) so an
    * oracle can replay inference exactly; a real deployment broadcasts a
    * trained weight array into the same expression (weights-as-literals,
    * like the k-means centroid fold). All-integer accumulation with one
    * final division — bit-identical across engines — and fully map-only:
    * model inference costs one scan, no shuffle, no UDF. */
  def linearScoreColumns(text: Column, buckets: Int = 64): Seq[(String, Column)] = {
    // compiled one-pass accumulation; [[linearScoreColumnsHof]] is the
    // composable definition (and the oracle's shape) — parity-spec'd
    graft.functions.TextExprFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    val w = tokens(text)
    val n = size(w).cast("long")
    val scoreSum = graft.functions.TextExprFunctions.hashed_weight_sum(w, buckets)
    val score = scoreSum.cast("double") / n.cast("double")
    Seq("n_tokens" -> n, "score_sum" -> scoreSum, "score" -> score,
      "label_positive" -> (score > 0.0))
  }

  /** Composable-HOF twin of [[linearScoreColumns]] — the semantic
    * definition, kept for the DataOpsSpec parity assertion; ~6
    * interpreted dispatches per token make it the slow form at scale. */
  def linearScoreColumnsHof(text: Column, buckets: Int = 64): Seq[(String, Column)] = {
    val w = tokens(text)
    val n = size(w).cast("long")
    val scoreSum = aggregate(w, lit(0L),
      (acc, tok) => acc + (hashBucket(tok, buckets) % 7 - 3))
    val score = scoreSum.cast("double") / n.cast("double")
    Seq("n_tokens" -> n, "score_sum" -> scoreSum, "score" -> score,
      "label_positive" -> (score > 0.0))
  }

  /** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken 2003,
    * "Winnowing: Local Algorithms for Document Fingerprinting"): over the
    * k-gram hash sequence `hashes`, slide a window of `w` consecutive
    * hashes and select each window's minimum (leftmost on ties — a fixed
    * deterministic tie rule both engines reproduce on hex strings);
    * returns the sorted distinct 0-based positions of the selected hashes.
    * Guarantees: any shared substring of length ≥ w + k − 1 yields at
    * least one shared fingerprint, and selection density is ~2/(w+1).
    * Pure HOFs — map-only inside the scan; fewer hashes than one window
    * selects the global minimum (the standard short-document rule), an
    * empty hash sequence selects nothing. */
  def winnowPositions(hashes: Column, w: Int): Column = {
    require(w >= 1, s"window must be >= 1, got $w")
    val n = size(hashes)
    val winners = transform(sequence(lit(0), n - w), p => {
      val win = slice(hashes, p + 1, lit(w))
      p + array_position(win, array_min(win)) - 1
    })
    when(n === 0, array().cast("array<long>"))
      .when(n < w, array(array_position(hashes, array_min(hashes)) - 1))
      .otherwise(array_sort(array_distinct(winners)))
  }

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
