package graft.datapipe

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("byte-to-unicode table matches the published GPT-2 mapping") {
    assert(Bpe.byteToChar('A'.toInt) == 'A')
    assert(Bpe.byteToChar('~'.toInt) == '~')
    // space -> Ġ (U+0120), newline -> Ċ (U+010A): the two famous ones
    assert(Bpe.byteToChar(32) == 'Ġ')
    assert(Bpe.byteToChar(10) == 'Ċ')
    // bijective: decode table inverts
    (0 until 256).foreach(b =>
      assert(Bpe.charToByte(Bpe.byteToChar(b)) == b.toByte))
  }

  test("pre-tokenizer splits like the GPT-2 pattern") {
    assert(Bpe.preTokenize("Hello world! it's 123") ==
      Seq("Hello", " world", "!", " it", "'s", " 123"))
    assert(Bpe.preTokenize("a  b") == Seq("a", " ", " b"))
    assert(Bpe.preTokenize("") == Seq())
  }

  test("training reproduces the classic Sennrich merge sequence") {
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).toDF("text")
    val model = Bpe.train(corpus, col("text"), numMerges = 4)
    assert(model.merges ==
      Vector(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    // the textbook outcome: "lowest" -> low + est
    assert(model.encodeWord("lowest") == Vector("low", "est"))
    // vocab = 256 byte symbols + the merges, ids stable
    assert(model.vocab.length == 260)
    assert(model.tokenId("low") == 259)
  }

  test("encode/decode roundtrip is byte-exact incl. multibyte UTF-8") {
    val corpus = Seq("héllo wörld", "héllo 世界", "tabs\tand\nnewlines")
      .toDF("text")
    val model = Bpe.train(corpus, col("text"), numMerges = 30)
    Seq("héllo wörld", "héllo 世界 héllo", "tabs\tand\nnewlines",
      "unseen züg 你好!").foreach { s =>
      assert(model.decode(model.encode(s)) == s, s"roundtrip of $s")
    }
  }

  test("encodeCol/decodeCol distribute; counts shrink with merges") {
    val docs = graft.Graft.table(spark, "/root/testdata/sf0.001", "documents")
    val model = Bpe.train(docs, col("text"), numMerges = 100)
    val out = docs
      .withColumn("ids", Bpe.encodeCol(model, col("text")))
      .withColumn("decoded", Bpe.decodeCol(model, col("ids")))
      .select(col("doc_id"), col("text"), col("decoded"),
        size(col("ids")).as("n"), octet_length(col("text")).as("bytes"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[String]("decoded") == r.getAs[String]("text"))
      assert(r.getAs[Int]("n") <= r.getAs[Int]("bytes"))
    }
    // merges must actually compress vs raw bytes in aggregate
    val totalTokens = out.map(_.getAs[Int]("n").toLong).sum
    val totalBytes = out.map(_.getAs[Int]("bytes").toLong).sum
    assert(totalTokens < totalBytes * 9 / 10,
      s"no compression: $totalTokens tokens vs $totalBytes bytes")
    // determinism: retraining yields the identical model
    val model2 = Bpe.train(docs, col("text"), numMerges = 100)
    assert(model2.merges == model.merges)
  }

  test("save/load roundtrips through the GPT-2 merges.txt format") {
    val corpus = Seq("low lower lowest", "newest widest\nnew line")
      .toDF("text")
    val model = Bpe.train(corpus, col("text"), numMerges = 20)
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    Bpe.save(model, dir)
    val loaded = Bpe.load(dir)
    assert(loaded.merges == model.merges)
    assert(loaded.vocab == model.vocab)
    val merges = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "merges.txt")), "UTF-8")
    assert(merges.startsWith("#version: 0.2\n"))
    val vocabJson = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "vocab.json")), "UTF-8")
    // vocab.json parses as JSON and inverts to the id order
    val parsed = graft.functions.JsonLite.parse(vocabJson)
      .asInstanceOf[java.util.Map[String, Any]]
    assert(parsed.size == model.vocab.size)
    assert(parsed.get(model.vocab.head) == 0L)
  }
}
