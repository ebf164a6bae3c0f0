package graft.datapipe

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation: language ID (n-gram /
  * stopword heuristic), quality scoring, token counting, document
  * fingerprinting. All pure Column expressions (whole-stage codegen;
  * a 100 TB corpus pass is scan + project, no shuffle).
  */
object TextAnalysis {

  private val enStop = Seq("the", "a", "of", "and", "to", "in", "is", "on")

  def tokens(text: Column): Column = Dedup.tokens(text)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = tokenCountOf(tokens(text))
  def tokenCountOf(toks: Column): Column = size(toks)

  /** BPE-ish subword count estimate: words + extra splits for long words
    * (a ceil(len/4) heuristic per token — deterministic, no model).
    */
  def subwordCountEstimate(text: Column): Column =
    subwordCountOf(tokens(text))
  def subwordCountOf(toks: Column): Column =
    aggregate(toks, lit(0L),
      (acc, t) => acc + greatest(ceil(length(t) / 4.0), lit(1L)))

  /** Stopword ratio against a tiny English list. */
  def stopwordRatio(text: Column): Column = stopwordRatioOf(tokens(text))
  def stopwordRatioOf(toks: Column): Column =
    when(size(toks) > 0,
      round(size(filter(toks, t => t.isin(enStop.map(lit): _*)))
        .cast("double") / size(toks), 6))
      .otherwise(0.0)

  /** Heuristic language ID: English if stopword evidence, else unknown.
    * (The real n-gram profile table would be an enrichment join; the
    * pipeline shape — per-doc scoring against a broadcast profile — is
    * identical.)
    */
  def langIdHeuristic(text: Column): Column =
    langIdFrom(stopwordRatio(text))
  def langIdFrom(stopRatio: Column): Column =
    when(stopRatio > 0.05, "en").otherwise("und")

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      round((length(text) -
        length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") /
        length(text), 6))
      .otherwise(0.0)

  /** Mean token length (rounded parts => engine-identical doubles). */
  def meanTokenLen(text: Column): Column = meanTokenLenOf(tokens(text))
  def meanTokenLenOf(toks: Column): Column =
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / size(toks))
      .otherwise(0.0)

  /** Composite quality score in [0,1]: rewards mid-length docs, real
    * words, low punctuation noise. Deterministic arithmetic only.
    */
  def qualityScore(text: Column, nChars: Column): Column =
    qualityFrom(stopwordRatio(text), punctRatio(text), nChars)
  def qualityFrom(stopRatio: Column, punct: Column, nChars: Column): Column = {
    val lengthScore = least(nChars.cast("double") / 500.0, lit(1.0))
    val stopScore = least(stopRatio * 5.0, lit(1.0))
    val punctPenalty = greatest(lit(1.0) - punct * 4.0, lit(0.0))
    round((lengthScore + stopScore + punctPenalty) / 3.0, 6)
  }

  // ---- Repetition signals (Gopher-style quality rules) -----------------

  /** Fraction of tokens that are repeats of an earlier token. */
  def dupWordRatioOf(toks: Column): Column =
    when(size(toks) > 0,
      round((size(toks) - size(array_distinct(toks))).cast("double")
        / size(toks), 6))
      .otherwise(0.0)

  /** Share of the single most frequent item in the list (tokens or
    * n-grams). O(distinct × n) per doc — fine for document-sized lists;
    * the corpus pass is still scan+project.
    */
  def topShareOf(items: Column): Column =
    when(size(items) > 0,
      round(array_max(transform(array_distinct(items),
        d => size(filter(items, x => x === d)))).cast("double")
        / size(items), 6))
      .otherwise(0.0)

  /** Adjacent-token bigrams ("a b", "b c", ...); empty below 2 tokens. */
  def bigramsOf(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** Content fingerprint: md5 over normalized (lowercased, squeezed)
    * token stream — stable under whitespace/case jitter.
    */
  def fingerprint(text: Column): Column = fingerprintOf(tokens(text))
  def fingerprintOf(toks: Column): Column =
    md5(array_join(transform(toks, t => lower(t)), " "))

  /** Fixed-size overlapping character windows — RAG/context-window prep.
    * A doc of length L yields 1 chunk when L <= size, else
    * ceil((L-size)/stride)+1 with stride = size-overlap; the last chunk
    * may run short. Pure projection + posexplode: a 100 TB chunking
    * pass is scan + explode, no shuffle, no state.
    */
  def chunks(text: Column, size: Int, overlap: Int): Column = {
    require(overlap < size, "chunk overlap must be smaller than size")
    val stride = size - overlap
    val len = length(text)
    val n = when(len <= size, lit(1L)).otherwise(
      ceil((len - size).cast("double") / stride).cast("long") + 1L)
    transform(sequence(lit(0L), n - 1),
      i => text.substr((i * stride + 1).cast("int"), lit(size)))
  }
}
