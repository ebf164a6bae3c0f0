package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-level BPE tokenizer (GPT-2 family): train merge rules from a
  * corpus, encode/decode documents — the tokenization stage of a
  * training-data pipeline (token counting for packing/budget ops runs on
  * real token ids instead of the whitespace approximation in
  * TextAnalysis).
  *
  * Public-knowledge sources: the byte-pair-encoding algorithm (Sennrich
  * et al. 2016, "Neural Machine Translation of Rare Words with Subword
  * Units") and the GPT-2 byte-level variant (Radford et al. 2019 —
  * byte-to-unicode table + pre-tokenizer regex are from the paper's
  * published reference implementation description).
  *
  * Scale design (100 TB):
  *  - TRAIN is a distributed pre-token frequency count (one shuffle on
  *    the pre-token string) followed by a DRIVER-side merge loop over the
  *    bounded top-`maxWords` frequency table — the same
  *    bounded-codebook-on-driver stance as k-means ([[Ann]]): corpus
  *    size only affects the count stage, which Spark map-side combines.
  *  - ENCODE broadcasts the rank table (numMerges entries, ~KBs) and is
  *    a shuffle-free projection; a per-executor word→tokens cache
  *    exploits the Zipfian repetition of pre-tokens, so the merge loop
  *    runs roughly once per DISTINCT word per executor, not per token.
  */
object Bpe {

  /** GPT-2 bytes_to_unicode: map every byte to a printable unicode char
    * so merges operate on strings with no whitespace/control ambiguity.
    */
  private[datapipe] val byteToChar: Array[Char] = {
    val visible = (('!'.toInt to '~'.toInt) ++ (0xA1 to 0xAC) ++
      (0xAE to 0xFF)).toSet
    val out = new Array[Char](256)
    var n = 0
    (0 until 256).foreach { b =>
      if (visible(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
    }
    out
  }
  private[datapipe] val charToByte: Map[Char, Byte] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b.toByte }.toMap

  /** GPT-2 pre-tokenizer: contractions, letter runs, digit runs,
    * punctuation runs (each with an optional leading space), whitespace.
    */
  private[datapipe] val preTokenRe = java.util.regex.Pattern.compile(
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")

  private[graft] def preTokenize(text: String): Seq[String] = {
    val m = preTokenRe.matcher(text)
    val out = Seq.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** A pre-token as the byte-level char sequence merges operate on. */
  private[datapipe] def toByteChars(word: String): Vector[String] =
    word.getBytes("UTF-8").toVector.map(b =>
      byteToChar(b & 0xFF).toString)

  /** Learned tokenizer: ordered merge rules + the derived vocabulary
    * (256 byte symbols first, then one entry per merge). Serializable so
    * encode can broadcast it.
    */
  final case class Model(merges: Vector[(String, String)]) extends Serializable {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
    @transient lazy val vocab: Vector[String] =
      (0 until 256).map(b => byteToChar(b).toString).toVector ++
        merges.map { case (a, b) => a + b }
    @transient lazy val tokenId: Map[String, Int] =
      vocab.zipWithIndex.toMap

    /** Greedy BPE encode of one pre-token (GPT-2 encode loop): repeatedly
      * merge the lowest-rank adjacent pair until none remains.
      */
    def encodeWord(word: String): Vector[String] = {
      var parts = toByteChars(word)
      if (parts.length <= 1) return parts
      var done = false
      while (!done && parts.length > 1) {
        var best = Int.MaxValue
        var bestI = -1
        var i = 0
        while (i < parts.length - 1) {
          val r = ranks.getOrElse((parts(i), parts(i + 1)), Int.MaxValue)
          if (r < best) { best = r; bestI = i }
          i += 1
        }
        if (bestI < 0) done = true
        else {
          // merge EVERY occurrence of the winning pair left-to-right
          val (a, b) = (parts(bestI), parts(bestI + 1))
          val nb = Vector.newBuilder[String]
          var j = 0
          while (j < parts.length) {
            if (j < parts.length - 1 && parts(j) == a && parts(j + 1) == b) {
              nb += a + b; j += 2
            } else { nb += parts(j); j += 1 }
          }
          parts = nb.result()
        }
      }
      parts
    }

    def encode(text: String): Vector[Int] =
      preTokenize(text).iterator.flatMap(w => encodeWord(w))
        .map(tokenId).toVector

    def decode(ids: Seq[Int]): String = {
      val sb = new java.io.ByteArrayOutputStream()
      ids.foreach { id =>
        vocab(id).foreach(c => sb.write(charToByte(c) & 0xFF))
      }
      new String(sb.toByteArray, "UTF-8")
    }
  }

  /** Train `numMerges` BPE rules. Distributed word-frequency count, then
    * the classic merge loop on the driver over the top-`maxWords` table.
    * Deterministic: ties on pair count break on the lexicographically
    * smallest pair; the word table cut ties on the word string.
    */
  def train(df: DataFrame, textCol: Column, numMerges: Int,
            maxWords: Int = 50000): Model = {
    val pretok = udf((s: String) =>
      if (s == null) Array.empty[String] else preTokenize(s).toArray)
    val freqs: Array[(String, Long)] = df
      .select(explode(pretok(textCol)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

    // driver-side merge loop over (symbol-seq, count). The pair-count
    // table is maintained INCREMENTALLY: a merge only touches words that
    // contain the winning pair, so each iteration costs O(affected words)
    // instead of a full O(words × word-len) HashMap rebuild — same counts,
    // same (count desc, pair asc) winner, identical merge sequence.
    val words: Array[(Vector[String], Long)] =
      freqs.map { case (w, n) => (toByteChars(w), n) }
    val pairCounts = new java.util.HashMap[(String, String), Long]()
    def bump(parts: Vector[String], n: Long): Unit = {
      var i = 0
      while (i < parts.length - 1) {
        val p = (parts(i), parts(i + 1))
        val left = pairCounts.merge(p, n, _ + _)
        if (left == 0L) pairCounts.remove(p)
        i += 1
      }
    }
    words.foreach { case (parts, n) => bump(parts, n) }
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      if (pairCounts.isEmpty) exhausted = true
      else {
        var best: (String, String) = null
        var bestN = -1L
        pairCounts.forEach { (p, n) =>
          if (n > bestN || (n == bestN &&
              (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2))))
            { best = p; bestN = n }
        }
        merges += best
        val (a, b) = best
        var wi = 0
        while (wi < words.length) {
          val (parts, n) = words(wi)
          if (parts.length >= 2) {
            var has = false
            var j = 0
            while (!has && j < parts.length - 1) {
              if (parts(j) == a && parts(j + 1) == b) has = true
              j += 1
            }
            if (has) {
              bump(parts, -n)
              val nb = Vector.newBuilder[String]
              j = 0
              while (j < parts.length) {
                if (j < parts.length - 1 && parts(j) == a && parts(j + 1) == b) {
                  nb += a + b; j += 2
                } else { nb += parts(j); j += 1 }
              }
              val merged = nb.result()
              bump(merged, n)
              words(wi) = (merged, n)
            }
          }
          wi += 1
        }
        m += 1
      }
    }
    Model(merges.result())
  }

  /** Token ids per row — shuffle-free projection; `model` rides the
    * closure once (Spark broadcasts task binaries), and a per-executor
    * cache collapses repeated pre-tokens to a map lookup.
    */
  def encodeCol(model: Model, text: Column): Column = {
    val cache = new java.util.concurrent.ConcurrentHashMap[String, Vector[String]]()
    val f = udf { (s: String) =>
      if (s == null) Array.empty[Int]
      else preTokenize(s).iterator.flatMap { w =>
        var toks = cache.get(w)
        if (toks == null) {
          toks = model.encodeWord(w)
          if (cache.size < 200000) cache.put(w, toks)
        }
        toks
      }.map(model.tokenId).toArray
    }
    f(text)
  }

  /** Decode token ids back to text (byte-exact inverse of encodeCol). */
  def decodeCol(model: Model, ids: Column): Column = {
    val f = udf((a: Array[Int]) => if (a == null) null else model.decode(a))
    f(ids)
  }

  // ---- model files (the GPT-2 published format: merges.txt lists one
  // "a b" rule per line under a version header; vocab.json maps token
  // string -> id) so trained tokenizers interop with standard tooling --

  def save(model: Model, dir: String): Unit = {
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(d)
    val merges = ("#version: 0.2" +:
      model.merges.map { case (a, b) => s"$a $b" }).mkString("\n") + "\n"
    java.nio.file.Files.write(d.resolve("merges.txt"),
      merges.getBytes("UTF-8"))
    val vocab = model.vocab.zipWithIndex.map { case (t, i) =>
      "\"" + t.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\":" + i
    }.mkString("{", ",", "}")
    java.nio.file.Files.write(d.resolve("vocab.json"),
      vocab.getBytes("UTF-8"))
  }

  def load(dir: String): Model = {
    val lines = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "merges.txt")), "UTF-8")
      .split("\n").iterator
      .filter(l => l.nonEmpty && !l.startsWith("#version"))
    Model(lines.map { l =>
      val i = l.indexOf(' ')
      (l.substring(0, i), l.substring(i + 1))
    }.toVector)
  }
}
